#!/usr/bin/env python
"""Flagship-config accuracy evidence (round-2 VERDICT task 1).

Trains configs/flagship_synth.yml — the UNMODIFIED production model graph:
ResNet-101 dilated backbone, 31-way heads, 608x1088 canvas, frozen_stages=2,
full anchor lattice, OHEM + tracking losses — from scratch on synthetic VID
on the real TPU, then evaluates detection mAP with and without tube linking
using the stock eval.py. The run is the no-real-data substitute for the
reference's "train and watch mAP" validation loop (SURVEY.md §4) at the
FULL flagship scale (the mid_synth run de-risked depth, not this graph).

Training uses --device-render (dtt.data.device_synth): scene parameters
upload as KB and canvases are drawn on-chip, so the run is compute-bound
(~0.35 s/step) instead of tunnel-transfer-bound (~0.8 s/step); evaluation
renders on the host through the standard image path — the device renderer
is pixel-parity-tested against it (tests/test_device_synth.py).

Usage (on TPU; ~2.5 h):  python tools/run_flagship_synth.py [--out DIR]
                         [--steps N] [--resume] [--skip-train]
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
    p.add_argument("--out", default="/tmp/flagship_synth")
    p.add_argument("--steps", type=int, default=None,
                   help="override train.total_steps")
    # 32 snippets ~= 64 object tracks over 30 classes; the old 8-snippet
    # default (~16 tracks) made per-class AP a coin flip (one missed track
    # = -7 points of mAP)
    p.add_argument("--snippets", type=int, default=32)
    p.add_argument("--resume", action="store_true",
                   help="continue training an existing --out checkpoint")
    p.add_argument("--skip-train", action="store_true",
                   help="evaluate an existing --out checkpoint only")
    args = p.parse_args()

    if not args.skip_train:
        cmd = [sys.executable, "train.py", "--synthetic", "--device-render",
               "--config", "configs/flagship_synth.yml", "--out", args.out]
        cmd += ["--resume"] if args.resume else ["--calibrate-bn"]
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
    print("PASS: flagship mAP >= 0.7 and linking did not hurt")


if __name__ == "__main__":
    main()
