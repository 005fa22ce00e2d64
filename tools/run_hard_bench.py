#!/usr/bin/env python
"""The linking benchmark: demonstrate tube linking/rescoring recovering mAP
on detector-breaking video (VERDICT round-4 task 3; D&T paper §3.4/Tables
2-3 — the reference's test-path tube rescoring is the capability this
measures).

Evaluates an existing checkpoint on the HARD synthetic stream
(dtt/data/synthetic_hard.py: occlusion windows, flickering distractors,
noise bursts, confusable textures) at one or more hardness operating
points, and records, per point:

  * detection mAP without linking      (mAP_nolink, from the same pass)
  * detection mAP with tube linking    (mAP)
  * temporally-strided testing, tau=2  (separate pass, --tau 2 --link)

Writes the verdict JSON next to the checkpoint (durable artifact — VERDICT
round-4 task 6) and exits nonzero unless, at some operating point with
no-link mAP in [0.5, 0.9], linking recovers >= --min-uplift (default
+0.02) and tau=2 stays within --tau-tolerance of tau=1 linked mAP.

Usage (on TPU, after tools/run_mid_synth.py --out runs/mid_synth):
  python tools/run_hard_bench.py --checkpoint runs/mid_synth [--frames 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str]) -> dict:
    print("+ " + " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=ROOT, stdout=subprocess.PIPE, text=True)
    sys.stdout.write(proc.stdout)
    proc.check_returncode()
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError("no JSON line in eval output")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--snippets", type=int, default=8)
    p.add_argument("--frames", type=int, default=16,
                   help="frames per snippet (>= occlusion window + context)")
    p.add_argument("--min-uplift", type=float, default=0.02)
    p.add_argument("--tau-tolerance", type=float, default=0.015)
    p.add_argument("--visibility", type=float, nargs=2, default=None,
                   help="probe a single operating point instead of the sweep")
    p.add_argument("--out-json", default=None,
                   help="default: <checkpoint>/hard_bench.json")
    args = p.parse_args()

    base = [sys.executable, "eval.py", "--synthetic-hard",
            "--checkpoint", args.checkpoint,
            "--synthetic-snippets", str(args.snippets),
            "--synthetic-frames", str(args.frames), "--link"]

    # hardness ladder: defaults first; easier points only if the default
    # lands below the informative no-link band
    points = ([{"visibility": tuple(args.visibility)}] if args.visibility
              else [{},                                  # Hardness() defaults
                    {"visibility": (0.35, 0.6)},
                    {"visibility": (0.5, 0.75), "noise_sigma": 20.0}])

    results = []
    for pt in points:
        flags = []
        if "visibility" in pt:
            flags += ["--hard-visibility", str(pt["visibility"][0]),
                      str(pt["visibility"][1])]
        if "noise_sigma" in pt:
            flags += ["--hard-noise-sigma", str(pt["noise_sigma"])]
        r1 = run(base + flags)                       # tau=1, link + nolink
        r2 = run(base + flags + ["--tau", "2"])      # tau=2 strided + link
        entry = {"point": pt, "mAP_nolink": r1["mAP_nolink"],
                 "mAP_link": r1["mAP"],
                 "uplift": round(r1["mAP"] - r1["mAP_nolink"], 4),
                 "mAP_tau2_link": r2["mAP"],
                 "tau2_delta": round(r2["mAP"] - r1["mAP"], 4)}
        results.append(entry)
        print(json.dumps(entry), flush=True)
        if 0.5 <= entry["mAP_nolink"] <= 0.9:
            break                                    # informative point found

    verdict = {"checkpoint": args.checkpoint, "frames": args.frames,
               "snippets": args.snippets, "results": results}
    out = args.out_json or os.path.join(args.checkpoint, "hard_bench.json")
    with open(out, "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps({"hard_bench": out}))

    ok = [r for r in results
          if 0.5 <= r["mAP_nolink"] <= 0.9
          and r["uplift"] >= args.min_uplift
          and abs(r["tau2_delta"]) <= args.tau_tolerance + r["uplift"]]
    if not ok:
        sys.exit(f"FAIL: no operating point with no-link mAP in [0.5, 0.9], "
                 f"uplift >= {args.min_uplift} and tau=2 within tolerance: "
                 f"{json.dumps(results)}")
    print(f"PASS: linking recovers {ok[0]['uplift']:+.4f} mAP at no-link "
          f"{ok[0]['mAP_nolink']:.4f}; tau=2 delta {ok[0]['tau2_delta']:+.4f}")


if __name__ == "__main__":
    main()
