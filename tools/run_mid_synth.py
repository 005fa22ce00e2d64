#!/usr/bin/env python
"""Synthetic accuracy evidence: mid-size from-scratch training (round-1
VERDICT task 5).

Trains configs/mid_synth.yml (ResNet-50, half-flagship canvas, frozen-BN
affines calibrated from data — see dtt/utils/calibrate.py) on synthetic VID
on the real TPU, then evaluates detection mAP with and without tube
linking. The run is the no-real-data substitute for the reference's manual
"train and watch mAP" validation loop (SURVEY.md §4): it demonstrates the
flagship training path (RPN + OHEM + tracking losses, SGD schedule,
checkpointing) actually learns detection at depth, not just the tiny test
backbone.

Usage (on TPU; ~15 min):  python tools/run_mid_synth.py [--out DIR]
                          [--steps N] [--skip-train]
Prints one JSON line: {"mAP_link": ..., "mAP_nolink": ..., "uplift": ...}
and exits nonzero if mAP_link < 0.7 or linking hurt.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str]) -> str:
    print("+ " + " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=ROOT, stdout=subprocess.PIPE, text=True)
    sys.stdout.write(proc.stdout)
    proc.check_returncode()
    return proc.stdout


def last_json(out: str) -> dict:
    for line in reversed(out.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError("no JSON line in output")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/mid_synth")
    p.add_argument("--steps", type=int, default=None,
                   help="override train.total_steps")
    p.add_argument("--snippets", type=int, default=8)
    p.add_argument("--skip-train", action="store_true",
                   help="evaluate an existing --out checkpoint only")
    args = p.parse_args()

    if not args.skip_train:
        cmd = [sys.executable, "train.py", "--synthetic",
               "--config", "configs/mid_synth.yml",
               "--calibrate-bn", "--out", args.out]
        if args.steps:
            cmd += ["--set", f"train.total_steps={args.steps}"]
        run(cmd)

    eval_cmd = [sys.executable, "eval.py", "--synthetic",
                "--checkpoint", args.out,
                "--synthetic-snippets", str(args.snippets), "--link"]
    res = last_json(run(eval_cmd))  # one pass reports both mAPs
    nolink, link = res["mAP_nolink"], res["mAP"]

    verdict = {"mAP_link": round(link, 4), "mAP_nolink": round(nolink, 4),
               "uplift": round(link - nolink, 4)}
    print(json.dumps(verdict))
    if link < 0.7:
        sys.exit(f"FAIL: mAP with linking {link:.4f} < 0.7")
    if link < nolink:
        sys.exit(f"FAIL: linking hurt mAP ({link:.4f} < {nolink:.4f})")
    print("PASS: mAP >= 0.7 and linking did not hurt")


if __name__ == "__main__":
    main()
