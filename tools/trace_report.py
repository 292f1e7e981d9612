"""Per-op device-time report for a ``jax.profiler`` trace directory.

Usage::

    python train.py ... --profile_dir /tmp/trace --profile_epoch 2
    python tools/trace_report.py /tmp/trace [--top 10]

Prints the top-N device ops by **self time** (an event's duration minus
the time covered by events nested inside it on the same track), so parent
fusions and the XLA ops inside them are never double-counted, plus the
total device busy time (union of intervals, same definition as
``bench._device_ms_from_trace``). This is the tool the BASELINE.md per-op
attribution tables are produced with.

The reference has no profiling story (single-GPU torch, no trace hooks);
this subsumes it: reference ``train.py`` only logs wall-clock per epoch.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_events(trace_dir: str):
    """All complete ('X') events + pid/tid names from every
    *.trace.json.gz under ``trace_dir``."""
    pid_names: dict = {}
    events = []
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        raise FileNotFoundError(
            f"no *.trace.json.gz under {trace_dir!r} — did the traced epoch "
            "run? (--profile_epoch defaults to 2: a 1-epoch run never "
            "triggers the trace)"
        )
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for e in data.get("traceEvents", []):
            ph = e.get("ph")
            if ph == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            elif ph == "X":
                events.append(e)
    return events, pid_names


def device_pids(pid_names: dict, events) -> set:
    dev = {p for p, name in pid_names.items()
           if any(tag in name.lower() for tag in ("tpu", "/device"))}
    if not dev:  # CPU backend: no device pid; use every pid seen
        dev = {e["pid"] for e in events}
    return dev


def self_times(events, pids) -> tuple[dict, float]:
    """Aggregate self time (us) by op name over the given pids.

    Events on one (pid, tid) track nest strictly (trace-viewer
    invariant), so a sorted sweep with a stack attributes each interval
    to the innermost op covering it.
    """
    import re

    # Excluded from op attribution (they'd swallow everything as parents
    # or, on their own track, double-report): bare-number dispatch-counter
    # umbrellas and whole-program jit_<name>(fingerprint) spans — programs
    # are reported separately by program_times(). '$file:line' events are
    # host python stack frames (CPU-backend fallback traces).
    non_op = re.compile(r"^\d+$|^jit_.*\(\d+\)$|^\$")
    by_track = collections.defaultdict(list)
    for e in events:
        if e["pid"] in pids and not non_op.search(e.get("name", "?")):
            ts = e.get("ts", 0)
            by_track[(e["pid"], e.get("tid", 0))].append(
                (ts, ts + e.get("dur", 0), e.get("name", "?"))
            )
    agg = collections.defaultdict(lambda: [0.0, 0])  # name -> [self_us, n]
    busy_spans = []
    for track in by_track.values():
        # parents first at equal start: longer duration first
        track.sort(key=lambda t: (t[0], -(t[1] - t[0])))
        stack = []  # (ts, te, name, child_us)
        for ts, te, name in track:
            busy_spans.append((ts, te))
            while stack and ts >= stack[-1][1]:
                s, t, n, child = stack.pop()
                agg[n][0] += (t - s) - child
                agg[n][1] += 1
                if stack:
                    stack[-1][3] += t - s
            stack.append([ts, te, name, 0.0])
        while stack:
            s, t, n, child = stack.pop()
            agg[n][0] += (t - s) - child
            agg[n][1] += 1
            if stack:
                stack[-1][3] += t - s

    # union busy time across the selected pids (same as bench.py)
    busy_spans.sort()
    busy, cur_s, cur_e = 0.0, None, None
    for s, t in busy_spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, t
        else:
            cur_e = max(cur_e, t)
    if cur_e is not None:
        busy += cur_e - cur_s
    return {k: (v[0], v[1]) for k, v in agg.items()}, busy


def program_times(events, pids) -> dict:
    """Whole-program spans on the device stream: ``jit_<name>(fp)`` ->
    (total_us, count). The per-step device time of a jitted function is
    total/count of its row — THE stable samples/sec denominator on a
    tunneled backend where wall clock includes dispatch latency."""
    import re

    prog = re.compile(r"^jit_(.+)\(\d+\)$")
    agg: dict = {}
    for e in events:
        if e["pid"] in pids:
            m = prog.match(e.get("name", "?"))
            if m:
                us, n = agg.get(m.group(1), (0.0, 0))
                agg[m.group(1)] = (us + e.get("dur", 0), n + 1)
    return agg


def report(trace_dir: str, top: int = 10, out=sys.stdout) -> list:
    events, pid_names = load_events(trace_dir)
    pids = device_pids(pid_names, events)
    progs = program_times(events, pids)
    if progs:
        print("programs (device span):", file=out)
        for name, (us, n) in sorted(progs.items(), key=lambda kv: -kv[1][0]):
            print(f"  {name:<40} {us / 1e3:>10.3f} ms total  "
                  f"{us / 1e3 / n:>10.3f} ms/call  x{n}", file=out)
    agg, busy_us = self_times(events, pids)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    width = max([len(n) for n, _ in rows] + [4])
    print(f"device busy: {busy_us / 1e3:.3f} ms "
          f"(union over {len(pids)} device pid(s))", file=out)
    print(f"{'op':<{width}}  {'self_ms':>10}  {'%busy':>6}  {'count':>7}",
          file=out)
    result = []
    for name, (self_us, n) in rows:
        pct = 100.0 * self_us / busy_us if busy_us else 0.0
        print(f"{name:<{width}}  {self_us / 1e3:>10.3f}  {pct:>5.1f}%  "
              f"{n:>7}", file=out)
        result.append({"op": name, "self_ms": round(self_us / 1e3, 3),
                       "pct_busy": round(pct, 1), "count": n})
    return result


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace_dir", help="directory passed to --profile_dir")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--json", action="store_true",
                    help="emit one JSON line instead of the table")
    args = ap.parse_args(argv)
    if args.json:
        import io

        rows = report(args.trace_dir, args.top, out=io.StringIO())
        print(json.dumps(rows))
    else:
        report(args.trace_dir, args.top)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
