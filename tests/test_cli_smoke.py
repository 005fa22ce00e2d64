"""End-to-end CLI smoke: train.py -> eval.py --link (tiny config, CPU).

The only coverage of the script-level plumbing (arg parsing, checkpoint
round-trip, the single-pass linked+unlinked eval output contract) — the
component logic underneath has its own unit tests.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _has_cv2():
    try:
        import cv2  # noqa: F401
        return True
    except ImportError:
        return False


def _run(cmd, devices=1):
    # DTT_PLATFORM (not JAX_PLATFORMS): the machine's sitecustomize
    # force-registers the axon TPU platform over JAX_PLATFORMS=cpu; the
    # entry scripts honor DTT_PLATFORM via jax.config.update, which wins
    # (dtt/utils/platform.py) — keeps this test genuinely CPU/deterministic
    env = dict(os.environ,
               XLA_FLAGS=f"--xla_force_host_platform_device_count={devices}",
               DTT_PLATFORM="cpu")
    proc = subprocess.run([sys.executable] + cmd, cwd=ROOT, env=env,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:]
    return proc.stdout


@pytest.mark.slow
def test_train_then_eval_link_single_pass(tmp_path):
    out = str(tmp_path / "run")
    _run(["train.py", "--synthetic", "--config", "configs/tiny_synth.yml",
          "--out", out,
          "--set", "train.total_steps=3", "train.checkpoint_every=3",
          "train.log_every=1"])
    assert os.path.exists(os.path.join(out, "LATEST"))

    stdout = _run(["eval.py", "--synthetic", "--checkpoint", out,
                   "--synthetic-snippets", "1", "--link"])
    line = [l for l in stdout.strip().splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    # single-pass contract: linked mAP, unlinked mAP, and uplift together
    assert {"mAP", "mAP_nolink", "link_uplift", "protocol"} <= result.keys()
    assert result["protocol"] == "devkit"

    # same checkpoint through the data-parallel eval path (frames sharded
    # over a 4-device mesh, eval.py --parallel): identical output contract
    stdout = _run(["eval.py", "--synthetic", "--checkpoint", out,
                   "--synthetic-snippets", "1", "--link", "--parallel"],
                  devices=4)
    line = [l for l in stdout.strip().splitlines() if l.startswith("{")][-1]
    par = json.loads(line)
    assert {"mAP", "mAP_nolink", "link_uplift", "protocol"} <= par.keys()

    # demo.py renders annotated frames from the same checkpoint (skip the
    # step, not the test, when cv2 is absent — demo.py imports it to draw)
    if not _has_cv2():
        pytest.skip("cv2 not installed; train/eval stages already passed")
    demo_out = str(tmp_path / "demo")
    _run(["demo.py", "--synthetic", "--checkpoint", out, "--out", demo_out,
          "--link", "--score-thresh", "0.0"])
    pngs = [f for f in os.listdir(demo_out) if f.endswith((".png", ".jpg"))]
    assert pngs, "demo wrote no annotated frames"
