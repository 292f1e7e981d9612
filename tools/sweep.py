#!/usr/bin/env python3
"""Experiment sweep launcher.

The reference scales experiments by hand-pasted LSF commands (the ``bsub``
blocks at ``/root/reference/train.py:334-340`` and
``eval_transformer_robustness.py:140-166``) — one shell line per
(dataset x model_type x seed x lr) cell, save_path encoding the combo.
This tool is that workflow as a program: expand a grid into runs with
derived save_paths, execute them sequentially (TPU hosts are
single-tenant; chips don't share) or emit a submission script for any
scheduler, skip cells whose history.csv is already complete (sweeps are
resumable — pairs with the trainer's own --resume/preemption recovery),
and summarize best metrics per cell from the history.csv contract.

Examples::

    # 3 seeds x 3 model types of the fusion experiment, run here
    python tools/sweep.py --script train.py \
        --base "--framework flava --dataset hateful-meme-dataset --n_epochs 30" \
        --grid model_type=Vanilla,MultiHead,MIMO-shuffle-instance seed=1,2,3 \
        --sweep_dir $RESULTS_DIR/sweeps/fusion --run

    # same cells as a bash script for a scheduler wrapper
    ... --emit /tmp/submit.sh

    # after (or during) the sweep: best-epoch table
    ... --summarize val_acc
"""
from __future__ import annotations

import argparse
import itertools
import os
import shlex
import subprocess
import sys


def expand_grid(grid_specs):
    """['a=1,2', 'b=x'] -> [{'a':'1','b':'x'}, {'a':'2','b':'x'}]."""
    keys, values = [], []
    for spec in grid_specs:
        if "=" not in spec:
            raise SystemExit(f"--grid entries are key=v1,v2,...; got {spec!r}")
        k, v = spec.split("=", 1)
        keys.append(k)
        values.append(v.split(","))
    return [dict(zip(keys, combo)) for combo in itertools.product(*values)]


def cell_name(combo: dict) -> str:
    return "_".join(f"{k}-{v}" for k, v in combo.items()) or "single"


def build_runs(args):
    runs = []
    for combo in expand_grid(args.grid):
        save_path = os.path.join(args.sweep_dir, cell_name(combo))
        cmd = (
            [sys.executable, args.script]
            + shlex.split(args.base)
            + [f"--{k}={v}" for k, v in combo.items()]
            + ["--save_path", save_path]
        )
        runs.append((combo, save_path, cmd))
    return runs


def is_complete(save_path: str, n_epochs) -> bool:
    """A cell is done when its history.csv has n_epochs rows (or exists at
    all when the epoch count isn't derivable — early stopping makes 'rows
    == n_epochs' a sufficient but not necessary condition, so --force
    reruns)."""
    hist = os.path.join(save_path, "history.csv")
    if not os.path.exists(hist):
        return False
    if n_epochs is None:
        return True
    try:
        import pandas as pd

        return len(pd.read_csv(hist)) >= int(n_epochs)
    except Exception:
        return False


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--script", default="train.py",
                   help="training CLI to sweep (train.py, "
                        "train_fashionmnist.py, ...)")
    p.add_argument("--base", default="",
                   help="flags shared by every cell (one quoted string)")
    p.add_argument("--grid", nargs="+", default=[],
                   help="key=v1,v2,... per swept flag; cells = product")
    p.add_argument("--sweep_dir", required=True,
                   help="root; each cell trains under <root>/<k-v_k-v...>")
    p.add_argument("--n_epochs", type=int, default=None,
                   help="rows history.csv needs for a cell to count as "
                        "complete (skip logic); omit = any history counts")
    p.add_argument("--run", action="store_true", help="execute sequentially")
    p.add_argument("--force", action="store_true",
                   help="rerun cells that look complete")
    p.add_argument("--resume", action="store_true",
                   help="pass --resume to every executed cell (continue "
                        "preempted/killed runs mid-sweep)")
    p.add_argument("--emit", type=str, default=None,
                   help="write the commands as a bash script instead of "
                        "running")
    p.add_argument("--summarize", type=str, default=None, metavar="METRIC",
                   help="print best <METRIC> per completed cell and exit")
    args = p.parse_args()

    runs = build_runs(args)

    if args.summarize:
        import pandas as pd

        rows = []
        for combo, save_path, _ in runs:
            hist = os.path.join(save_path, "history.csv")
            if not os.path.exists(hist):
                rows.append({**combo, "status": "missing"})
                continue
            df = pd.read_csv(hist)
            if args.summarize not in df.columns:
                rows.append({**combo, "status": f"no {args.summarize}"})
                continue
            i = df[args.summarize].idxmax()
            rows.append({
                **combo, "status": "ok", "epochs": len(df),
                f"best_{args.summarize}": float(df[args.summarize][i]),
                "best_epoch": int(df["epoch"][i]),
            })
        out = pd.DataFrame(rows)
        print(out.to_string(index=False))
        csv_path = os.path.join(args.sweep_dir, "sweep_summary.csv")
        os.makedirs(args.sweep_dir, exist_ok=True)
        out.to_csv(csv_path, index=False)
        print(f"\nwrote {csv_path}")
        return

    todo = []
    for combo, save_path, cmd in runs:
        if not args.force and is_complete(save_path, args.n_epochs):
            print(f"skip (complete): {cell_name(combo)}")
            continue
        if args.resume and os.path.isdir(save_path):
            cmd = cmd + ["--resume"]
        todo.append((combo, save_path, cmd))

    if args.emit:
        with open(args.emit, "w") as f:
            f.write("#!/bin/bash\nset -e\n")
            for combo, save_path, cmd in todo:
                f.write(f"mkdir -p {shlex.quote(save_path)}\n")
                f.write(shlex.join(cmd) + f" > {shlex.quote(save_path)}/out.log"
                        f" 2> {shlex.quote(save_path)}/error.log\n")
        os.chmod(args.emit, 0o755)
        print(f"wrote {args.emit} ({len(todo)} runs)")
        return

    if not args.run:
        for _, _, cmd in todo:
            print(shlex.join(cmd))
        print(f"\n{len(todo)} runs (use --run to execute, --emit FILE for a "
              f"script)")
        return

    failures = []
    for i, (combo, save_path, cmd) in enumerate(todo, 1):
        os.makedirs(save_path, exist_ok=True)
        print(f"[{i}/{len(todo)}] {cell_name(combo)}", flush=True)
        with open(os.path.join(save_path, "out.log"), "w") as out, open(
            os.path.join(save_path, "error.log"), "w"
        ) as err:
            rc = subprocess.call(cmd, stdout=out, stderr=err)
        if rc != 0:
            print(f"  FAILED rc={rc} (see {save_path}/error.log)")
            failures.append(cell_name(combo))
    if failures:
        raise SystemExit(f"{len(failures)} cells failed: {failures}")
    print("sweep complete")


if __name__ == "__main__":
    main()
