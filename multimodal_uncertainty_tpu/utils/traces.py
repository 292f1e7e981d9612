"""Shared ``jax.profiler`` trace parsing: the ONE implementation of the
non-op filter, interval-union busy time, per-op self times, and program
spans used by bench.py, tools/trace_report.py, and the profile_* tools.

Why one implementation matters (r5 review finding): the dispatch-umbrella
filter is load-bearing for every device-time headline — on the tunneled
backend the bare-number umbrella tracks bridge inter-step dispatch gaps,
so a fix applied to one copy and not the other silently desyncs bench's
``device_trace_step_sps`` from trace_report's busy total (exactly how
r04's MMBT "476 sps" happened).

The reference has no profiling story (single-GPU torch, wall clock only:
``src/framework.py:69,89``); this subsumes it.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import re

# Excluded from op attribution / busy unions (they'd swallow everything as
# parents or, on their own track, double-report): bare-number
# dispatch-counter umbrellas, whole-program jit_<name>(fingerprint) spans
# (reported separately by program_times), and '$file:line' host python
# stack frames (CPU-backend fallback traces).
NON_OP_RE = re.compile(r"^\d+$|^jit_.*\(\d+\)$|^\$")


def load_events(trace_dir: str):
    """All complete ('X') events + pid names from every *.trace.json.gz
    under ``trace_dir``."""
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


def union_us(spans) -> float:
    """Total covered time of (ts, te) intervals — union, not sum: trace
    events nest (op hierarchies), so summing durations double-counts
    parents over children (measured ~3x inflation on the flagship step)."""
    spans.sort()
    total, cur_s, cur_e = 0.0, None, None
    for s, t in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, t
        else:
            cur_e = max(cur_e, t)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def self_times(events, pids) -> tuple:
    """Aggregate self time (us) by op name over the given pids, plus the
    union busy total.

    Events on one (pid, tid) track nest strictly (trace-viewer invariant),
    so a sorted sweep with a stack attributes each interval to the
    innermost op covering it. Returns ({name: (self_us, count)}, busy_us).
    """
    by_track = collections.defaultdict(list)
    for e in events:
        if e["pid"] in pids and not NON_OP_RE.search(e.get("name", "?")):
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

    busy = union_us(busy_spans)
    return {k: (v[0], v[1]) for k, v in agg.items()}, busy


def program_times(events, pids) -> dict:
    """Whole-program spans on the device stream: ``jit_<name>(fp)`` ->
    (total_us, count). The per-step device time of a jitted function is
    total/count of its row — THE stable samples/sec denominator on a
    tunneled backend where wall clock includes dispatch latency."""
    prog = re.compile(r"^jit_(.+)\(\d+\)$")
    agg: dict = {}
    for e in events:
        if e["pid"] in pids:
            m = prog.match(e.get("name", "?"))
            if m:
                us, n = agg.get(m.group(1), (0.0, 0))
                agg[m.group(1)] = (us + e.get("dur", 0), n + 1)
    return agg


def step_program(progs: dict):
    """Deterministic pick of THE train-step program among jit programs:
    the 'step'-named row with the LARGEST total device time (a trace can
    contain several step-like programs — eval_step, the warmup's
    donated/undonated variants; dict order is arbitrary). Returns
    (name, ms_per_call) or None."""
    rows = [(us, us / nc, n) for n, (us, nc) in progs.items() if "step" in n]
    if not rows:
        return None
    total, per_call, name = max(rows)
    return name, per_call / 1e3


def category_times(events, pids) -> dict:
    """The compiler's own ``hlo_category`` bucketing with bytes_accessed:
    {category: (total_us, total_bytes)} — the achieved-GB/s column of the
    BASELINE.md attribution tables."""
    cats: dict = {}
    for e in events:
        a = e.get("args", {})
        c = a.get("hlo_category")
        if e["pid"] in pids and c:
            us, byt = cats.get(c, (0.0, 0))
            cats[c] = (us + e.get("dur", 0),
                       byt + int(a.get("bytes_accessed", 0)))
    return cats


def device_busy_ms(trace_dir: str) -> float:
    """Device busy time (ms) in a trace dir: the union of op-level
    intervals on the busiest device pid (bench.py's device-trace
    headline)."""
    events, pid_names = load_events(trace_dir)
    intervals = collections.defaultdict(list)  # pid -> [(ts, te)]
    for e in events:
        if not NON_OP_RE.search(e.get("name", "?")):
            ts = e.get("ts", 0)
            intervals[e["pid"]].append((ts, ts + e.get("dur", 0)))
    busy = {pid: union_us(sp) for pid, sp in intervals.items()}
    dev = {p: v for p, v in busy.items() if p in device_pids(pid_names, events)}
    if not dev:
        dev = busy  # CPU backend: no device pid; report the busiest
    return max(dev.values()) / 1e3 if dev else 0.0
