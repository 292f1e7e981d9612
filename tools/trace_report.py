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

The parsing primitives live in ``multimodal_uncertainty_tpu.utils.traces``
(ONE implementation shared with bench.py — see that module's docstring for
why); this file is the CLI plus the step-attribution report the
profile_{mmbt,fusion}_step tools share.

The reference has no profiling story (single-GPU torch, no trace hooks);
this subsumes it: reference ``train.py`` only logs wall-clock per epoch.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_uncertainty_tpu.utils import traces  # noqa: E402

# back-compat re-exports (tests and the profile tools import these here)
load_events = traces.load_events
device_pids = traces.device_pids
self_times = traces.self_times
program_times = traces.program_times


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


def print_step_report(trace_dir: str, *, steps: int, batch: int,
                      flops: float, top: int = 20,
                      peak: float = 197e12, out=sys.stdout) -> float:
    """The step-attribution report profile_{mmbt,fusion}_step.py share:
    program spans, the honest per-step device time (the step program's own
    span — deterministically the LARGEST-total 'step' program, see
    traces.step_program), analytic-FLOPs MFU vs ``peak`` (default: v5e
    bf16 197 TF/s; 394 is the int8 figure), top-K ops by self time, and
    the hlo_category table with achieved GB/s (v5e HBM peak ~819 GB/s —
    categories at ~800+ are at memory speed-of-light).

    Returns the per-step device ms (the BASELINE.md headline number).
    """
    events, pid_names = load_events(trace_dir)
    pids = device_pids(pid_names, events)
    agg, busy_us = self_times(events, pids)
    progs = program_times(events, pids)
    picked = traces.step_program(progs)
    if picked is not None:
        name, step_ms = picked
        src = f"jit_{name} program span"
    else:
        step_ms = busy_us / 1e3 / steps
        src = "op-union busy"
    mfu = flops / (step_ms / 1e3) / peak
    for name, (us, nc) in sorted(progs.items(), key=lambda kv: -kv[1][0]):
        print(f"program jit_{name}: {us / 1e3 / nc:.3f} ms/call x{nc}",
              file=out)
    print(f"\ndevice step ({src}): {step_ms:.2f} ms/step  "
          f"-> {batch / (step_ms / 1e3):.1f} samples/s", file=out)
    print(f"op-level device busy: {busy_us / 1e3 / steps:.2f} ms/step",
          file=out)
    print(f"analytic train FLOPs/step: {flops / 1e12:.2f} TF  "
          f"MFU ~= {100 * mfu:.1f}% of bf16 peak ({peak / 1e12:.0f} TF/s)\n",
          file=out)

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    denom = steps * step_ms * 1e3  # % of the step program's device span
    print(f"{'op':<64}  {'self_ms/step':>12}  {'%step':>6}  {'count':>6}",
          file=out)
    for name, (self_us, n) in rows[:top]:
        print(f"{name[:64]:<64}  {self_us / 1e3 / steps:>12.3f}  "
              f"{100 * self_us / denom:>5.1f}%  {n:>6}", file=out)

    cats = traces.category_times(events, pids)
    print(f"\n{'hlo_category':<28}  {'ms/step':>8}  {'%step':>6}  "
          f"{'GB/step':>8}  {'GB/s':>7}", file=out)
    for c, (us, byt) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        bw = byt / 1e9 / (us / 1e6) if us else 0.0
        print(f"{c:<28}  {us / 1e3 / steps:>8.2f}  "
              f"{100 * us / denom:>5.1f}%  {byt / 1e9 / steps:>8.2f}  "
              f"{bw:>7.0f}", file=out)
    return step_ms


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
    main()
