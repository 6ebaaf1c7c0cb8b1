"""tools/eval_report.py must fail LOUDLY when a gate crashes (VERDICT r2
weak #3: a child rc=1 used to become '(skipped)' in EVAL.md and the report
exited 0, certifying a broken artifact)."""
import csv
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _fake_run_dir(tmp_path):
    run = tmp_path / "logs" / "t1_dh_stand" / "FakeRun"
    run.mkdir(parents=True)
    with open(run / "metrics.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "iteration", "mean_episode_length", "mean_episode_reward",
            "mean_step_reward", "terrain_level", "max_command_x",
            "estimator_loss"])
        w.writeheader()
        for i in range(3):
            w.writerow({"iteration": i, "mean_episode_length": 100 + i,
                        "mean_episode_reward": 1.0, "mean_step_reward": 0.01,
                        "terrain_level": 0.0, "max_command_x": 0.5,
                        "estimator_loss": 0.1})
    # a checkpoint dir that is NOT a valid orbax checkpoint -> export crashes
    (run / "model_7").mkdir()
    (run / "model_7" / "junk").write_text("not a checkpoint")
    return run


def test_eval_report_propagates_gate_failure(tmp_path):
    run = _fake_run_dir(tmp_path)
    out = tmp_path / "eval_out"
    env = dict(os.environ, JAX_PLATFORMS="cpu", TI5_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "tools/eval_report.py", "--run", str(run),
         "--out", str(out), "--skip_play", "--skip_sim2sim"],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=600)
    assert r.returncode != 0, f"eval_report exited 0 over a crashed gate:\n{r.stdout}"
    assert "EVAL FAILED" in r.stderr
    md = (out / "EVAL.md").read_text()
    assert "FAILED" in md          # gate table row
    assert "## FAILURES" in md     # log-tail section
    assert "(skipped)" not in md   # the round-2 lie must be gone
