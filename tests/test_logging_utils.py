"""Console-transcript capture (utils/logging_utils.py TeeLog).

The reference teed every training job's console next to its checkpoints
(src/utils.py redirection); here that is TeeLog, installed by both train
CLIs right after save_path exists. These tests pin the file-side line
discipline (CR-repaint collapsing) and the CLI wiring.
"""
import pytest
import os
import subprocess
import sys

from multimodal_uncertainty_tpu.utils.logging_utils import TeeLog

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tee_captures_both_streams_and_restores(tmp_path, capsys):
    log = tmp_path / "out.log"
    out0, err0 = sys.stdout, sys.stderr
    with TeeLog(str(log)):
        print("to stdout")
        print("to stderr", file=sys.stderr)
        assert sys.stdout is not out0  # mirrors installed
    assert sys.stdout is out0 and sys.stderr is err0  # restored
    text = log.read_text()
    assert "to stdout" in text and "to stderr" in text
    # the console still saw everything (tee, not redirect)
    cap = capsys.readouterr()
    assert "to stdout" in cap.out and "to stderr" in cap.err


def test_tee_collapses_progress_repaints(tmp_path):
    """The progress renderer repaints with \\r many times per step; the
    file keeps only each line's final state."""
    log = tmp_path / "out.log"
    with TeeLog(str(log)):
        for i in range(50):
            sys.stdout.write(f"\rEpoch 1/1 Step {i}/49: loss 1.0")
        sys.stdout.write("\n")
        print("Epoch 1/1 done")
    lines = log.read_text().splitlines()
    assert lines == ["Epoch 1/1 Step 49/49: loss 1.0", "Epoch 1/1 done"]


def test_tee_install_is_idempotent_and_appends(tmp_path):
    log = tmp_path / "out.log"
    t = TeeLog(str(log)).install()
    t.install()  # second install: no double-wrap
    print("first run")
    t.uninstall()
    t.uninstall()  # idempotent
    with TeeLog(str(log)):
        print("second run")  # append mode: restarts extend the transcript
    lines = log.read_text().splitlines()
    assert lines == ["first run", "second run"]


@pytest.mark.slow  # excluded from the quick tier
def test_train_cli_writes_out_log_and_profile_trace(tmp_path):
    """train_fashionmnist.py mirrors its console into save_path/out.log,
    and --profile_dir/--profile_epoch (real CLI flags since round 5)
    capture a jax.profiler trace of the chosen epoch."""
    save = tmp_path / "run"
    prof = tmp_path / "trace"
    env = {
        **os.environ,
        "MMU_PLATFORM": "cpu",
        "PYTHONPATH": _REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "train_fashionmnist.py"),
         "--synthetic", "--model_type", "MultiHead",
         "--save_path", str(save), "--sample_size", "32",
         # n_epochs=2 trains ONE epoch (reference quirk: epochs = n_epochs-1)
         "--n_epochs", "2", "--batch_size", "16", "--lr", "0.05",
         "--profile_dir", str(prof), "--profile_epoch", "1"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    log = save / "out.log"
    assert log.exists()
    text = log.read_text()
    assert "Epoch 1/1" in text  # the final epoch summary line made it
    assert "\r" not in text  # repaints collapsed
    # the profiler wrote a trace (plugins/profile/<ts>/*.xplane.pb) that
    # tools/trace_report.py can consume
    traces = list(prof.rglob("*.xplane.pb")) + list(prof.rglob("*.json.gz"))
    assert traces, f"no trace files under {prof}"
