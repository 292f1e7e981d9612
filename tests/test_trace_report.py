"""tools/trace_report.py: per-op self-time attribution from a trace dir.

Self time must subtract nested children (no parent/child double count),
host python frames ($file:line) are excluded, and the busy total is the
interval union — the same definition bench._device_ms_from_trace uses.
"""
import gzip
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import trace_report  # noqa: E402

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)


def _write_trace(tmp_path, events, pid_name="/device:TPU:0"):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    payload = {
        "traceEvents": [
            {"ph": "M", "name": "process_name", "pid": 1,
             "args": {"name": pid_name}},
            *events,
        ]
    }
    with gzip.open(d / "vm.trace.json.gz", "wt") as fh:
        json.dump(payload, fh)
    return str(tmp_path)


def test_self_time_subtracts_nested_children(tmp_path):
    # parent [0, 100] with children [10, 40] and [50, 70] -> self 50
    events = [
        {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.1", "ts": 0,
         "dur": 100},
        {"ph": "X", "pid": 1, "tid": 7, "name": "dot.1", "ts": 10, "dur": 30},
        {"ph": "X", "pid": 1, "tid": 7, "name": "dot.2", "ts": 50, "dur": 20},
    ]
    td = _write_trace(tmp_path, events)
    rows = trace_report.report(td, top=10, out=open(os.devnull, "w"))
    by_op = {r["op"]: r for r in rows}
    assert by_op["fusion.1"]["self_ms"] == pytest.approx(0.050)
    assert by_op["dot.1"]["self_ms"] == pytest.approx(0.030)
    assert by_op["dot.2"]["self_ms"] == pytest.approx(0.020)
    # busy union = 100us regardless of nesting
    _, busy = trace_report.self_times(
        [e for e in events], {1}
    )
    assert busy == pytest.approx(100.0)


def test_host_python_frames_excluded_and_union_across_tracks(tmp_path):
    events = [
        {"ph": "X", "pid": 1, "tid": 1, "name": "$train.py:12 step", "ts": 0,
         "dur": 1000},
        {"ph": "X", "pid": 1, "tid": 2, "name": "conv.3", "ts": 0, "dur": 60},
        # overlapping track: union busy = 100, not 160
        {"ph": "X", "pid": 1, "tid": 3, "name": "dot.9", "ts": 40, "dur": 60},
    ]
    td = _write_trace(tmp_path, events)
    rows = trace_report.report(td, top=10, out=open(os.devnull, "w"))
    names = {r["op"] for r in rows}
    assert "$train.py:12 step" not in names
    assert names == {"conv.3", "dot.9"}
    agg, busy = trace_report.self_times(events, {1})
    assert busy == pytest.approx(100.0)


def test_missing_trace_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        trace_report.report(str(tmp_path), top=5, out=open(os.devnull, "w"))
