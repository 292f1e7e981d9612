"""Sweep launcher (tools/sweep.py): grid expansion, skip/resume, summary."""
import json
import os
import subprocess
import sys

import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SWEEP = os.path.join(_REPO, "tools", "sweep.py")

# stub "training CLI": records its argv, writes an n_epochs-row history.csv
_STUB = """
import argparse, json, os
p = argparse.ArgumentParser()
p.add_argument("--save_path", required=True)
p.add_argument("--lr", type=float, default=0.1)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--n_epochs", type=int, default=2)
p.add_argument("--resume", action="store_true")
a = p.parse_args()
os.makedirs(a.save_path, exist_ok=True)
with open(os.path.join(a.save_path, "argv.json"), "w") as f:
    json.dump(vars(a), f)
import pandas as pd
pd.DataFrame({
    "epoch": list(range(1, a.n_epochs + 1)),
    "val_acc": [a.lr * a.seed * e for e in range(1, a.n_epochs + 1)],
}).to_csv(os.path.join(a.save_path, "history.csv"), index=False)
"""


def _run_sweep(tmp_path, *extra):
    stub = tmp_path / "stub_train.py"
    stub.write_text(_STUB)
    cmd = [
        sys.executable, _SWEEP, "--script", str(stub),
        "--base", "--n_epochs 2",
        "--grid", "lr=0.1,0.2", "seed=1,2",
        "--sweep_dir", str(tmp_path / "sweep"), "--n_epochs", "2", *extra,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout


def test_dry_run_lists_product(tmp_path):
    out = _run_sweep(tmp_path)
    lines = [l for l in out.splitlines() if "stub_train.py" in l]
    assert len(lines) == 4  # 2 lrs x 2 seeds
    assert any("--lr=0.1" in l and "--seed=2" in l for l in lines)


def test_run_skip_and_summarize(tmp_path):
    _run_sweep(tmp_path, "--run")
    sweep = tmp_path / "sweep"
    cells = sorted(os.listdir(sweep))
    assert cells == [
        "lr-0.1_seed-1", "lr-0.1_seed-2", "lr-0.2_seed-1", "lr-0.2_seed-2"
    ]
    # each cell got its own save_path and logs
    argv = json.load(open(sweep / "lr-0.2_seed-1" / "argv.json"))
    assert argv["lr"] == 0.2 and argv["seed"] == 1 and not argv["resume"]
    assert (sweep / "lr-0.1_seed-1" / "out.log").exists()

    # second invocation skips everything (complete by history rows)
    out = _run_sweep(tmp_path, "--run")
    assert out.count("skip (complete)") == 4

    # --resume + --force reruns and passes --resume through
    _run_sweep(tmp_path, "--run", "--force", "--resume")
    argv = json.load(open(sweep / "lr-0.2_seed-1" / "argv.json"))
    assert argv["resume"] is True

    # summary table: best val_acc per cell from the history contract
    out = _run_sweep(tmp_path, "--summarize", "val_acc")
    df = pd.read_csv(sweep / "sweep_summary.csv")
    assert len(df) == 4 and (df["status"] == "ok").all()
    row = df[(df["lr"] == 0.2) & (df["seed"] == 2)].iloc[0]
    assert row["best_val_acc"] == 0.8 and row["best_epoch"] == 2


def test_emit_script(tmp_path):
    out = _run_sweep(tmp_path, "--emit", str(tmp_path / "submit.sh"))
    assert "4 runs" in out
    script = (tmp_path / "submit.sh").read_text()
    assert script.count("stub_train.py") == 4
    assert "error.log" in script
