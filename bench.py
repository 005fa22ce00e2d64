"""Benchmark: D&T frame-pair inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full flagship pipeline in video mode — per-frame ResNet-101
features shared across adjacent pairs (dtt.eval.inference.make_video_step),
RPN + proposal NMS, R-FCN PSRoI heads, 3-scale correlation, tracking head,
per-class decode+NMS, all batched across the frame chunk — at the
production 608x1088 canvas. This is the deployment shape for VID snippets.
Round-2 state: batch-folded PSRoI gathers, banded-matmul (MXU) correlation,
multi-select while-loop NMS, 16-pair chunks -> 142.8 pairs/s/chip
(round 1: 101.9 at 8-pair chunks with vmapped gathers + pallas
correlation).

Timing methodology: this machine's tunneled TPU runtime defers programs
until a result is demanded, so every timed call fetches a scalar reduction
of the outputs (forcing execution) and the tunnel's host<->device sync
latency is measured separately and subtracted (dtt/utils/timing.py).

Baseline: the reference (Feynman27/pytorch-detect-to-track) publishes no
throughput and the paper reports ~7 fps on a Titan X (D&T paper §4).
BASELINE.json's north star is ">=5x A100-PyTorch frame-pairs/sec". With no
measurable reference on this machine we use an *assumed* A100 reference of
15 frame-pairs/sec (Titan-X 7 fps scaled ~2x to A100-class hardware for
this CUDA-era code, which does not saturate modern GPUs). vs_baseline =
measured / 15.0.
"""

import json
import time

import numpy as np

ASSUMED_A100_REFERENCE_PAIRS_PER_SEC = 15.0
CHUNK = 97  # frames per step -> CHUNK-1 frame pairs. Round-4 sweep
            # (direct pool, NMS width 32, forced-fetch): 17fr 163.9,
            # 33fr 196.1, 49fr 201.4, 65fr 206.5, 97fr 217.4 (peak),
            # 129fr 212.8, 161fr 169.0 pairs/s — larger chunks win on
            # early-stage batch efficiency, not dispatch (<=4 ms/chunk).


def main():
    from dtt.utils.platform import apply_platform_request
    apply_platform_request()  # honor DTT_PLATFORM before first backend use
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from dtt.core.config import Config
    from dtt.eval.inference import make_video_step
    from dtt.models.dnt import make_model
    from dtt.utils.timing import sync_latency

    cfg = Config()
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    model = make_model(cfg.model)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(CHUNK, h, w, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), frames[None, :2])
    im_hw = jnp.asarray([h, w], jnp.float32)
    step = make_video_step(cfg, model, CHUNK)

    # step is TWO jitted programs (EvalConfig.split_video_step: the
    # correlation compiles ~2.5x slower sharing a program with the backbone,
    # BASELINE.md round 5). Do NOT wrap it in an outer jit — that re-inlines
    # both into the slow single program. The scalar force is its own tiny
    # program over the device-resident outputs (full-tensor reductions, so
    # nothing can be sliced away).
    @jax.jit
    def force(out):
        return (jnp.sum(out.scores) + jnp.sum(out.boxes) * 1e-6
                + jnp.sum(out.tracked) * 1e-6)

    def infer(params, frames):
        return force(step(params, frames, im_hw, jnp.float32(1.0)))

    float(infer(params, frames))  # compile + warm
    lat = sync_latency()

    # 6 staged variants: 16 float32 97-frame chunks would be ~12 GB of HBM
    # (RESOURCE_EXHAUSTED); 6 x 770 MB leaves room for the step workspace.
    # Two timed passes over them give 12 samples like before.
    variants = [frames + np.float32(i) * 1e-6 for i in range(6)]
    jax.block_until_ready(variants)  # inputs prepared outside the timed window
    times = []
    for f in variants + variants:
        t0 = time.perf_counter()
        float(infer(params, f))            # scalar fetch forces execution
        times.append(time.perf_counter() - t0)
    times.sort()
    # tunnel sync latency is noisy (+/-10 ms); the low quartile of forced
    # calls minus the low sync estimate is the stable device time
    dt = max(times[len(times) // 4] - lat, 1e-9)
    pairs_per_sec = (CHUNK - 1) / dt

    print(json.dumps({
        "metric": "dnt_inference_frame_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "frame-pairs/sec/chip (ResNet-101 D&T video mode, 608x1088, incl. NMS+decode)",
        "vs_baseline": round(pairs_per_sec / ASSUMED_A100_REFERENCE_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
