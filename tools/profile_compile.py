"""Compile-ceiling profiler: train-step compile time / program size vs config.

Round-1 finding (BASELINE.md): flagship batch-16 + remat hit the axon
tunnel's HTTP 413 upload limit / remote-compiler 500s — the compiled program
is simply too large. model.scan_blocks collapses each ResNet stage's
identical blocks into ONE scanned body, shrinking the StableHLO program by
~an order of magnitude; this tool measures it.

Run on the TPU host (each flagship compile is minutes cold):
  python tools/profile_compile.py --batch 8 16 --remat --scan
Prints one line per (batch, remat, scan) combination: lowering size,
compile wall time, or the failure.
"""

import argparse
import time

from dtt.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dtt.core.config import Config  # noqa: E402
from dtt.data.synthetic import synthetic_batch  # noqa: E402
from dtt.train.trainer import create_train_state, make_train_step  # noqa: E402


def measure(batch: int, remat: bool, scan: bool):
    cfg = Config()
    cfg = cfg.replace(model=cfg.model.replace(remat=remat, scan_blocks=scan),
                      train=cfg.train.replace(batch_size_per_chip=batch))
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    sample = jnp.zeros((1, 2, h, w, 3), jnp.float32)
    t0 = time.perf_counter()
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), sample)
    t_init = time.perf_counter() - t0

    data = synthetic_batch(np.random.RandomState(0), batch, h, w,
                           cfg.model.num_classes, cfg.input.max_gt_boxes)
    step = make_train_step(cfg, model, (h // 16, w // 16))
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    lowered = step.lower(state, data, key)
    hlo_bytes = len(lowered.as_text())
    t_lower = time.perf_counter() - t0

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    state2, metrics = compiled(state, data, key)
    total = float(metrics["total"])
    t_run = time.perf_counter() - t0
    del state2
    return dict(init_s=round(t_init, 1), lower_s=round(t_lower, 1),
                hlo_mb=round(hlo_bytes / 1e6, 1),
                compile_s=round(t_compile, 1), first_step_s=round(t_run, 1),
                loss=round(total, 3))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, nargs="+", default=[8])
    p.add_argument("--remat", action="store_true")
    p.add_argument("--no-remat", action="store_true",
                   help="also measure remat=False")
    p.add_argument("--scan", action="store_true")
    p.add_argument("--no-scan", action="store_true",
                   help="also measure scan_blocks=False")
    args = p.parse_args()
    remats = ([True] if args.remat else []) + ([False] if args.no_remat or not args.remat else [])
    scans = ([True] if args.scan else []) + ([False] if args.no_scan or not args.scan else [])

    for batch in args.batch:
        for remat in remats:
            for scan in scans:
                tag = f"batch={batch} remat={remat} scan={scan}"
                try:
                    r = measure(batch, remat, scan)
                    print(f"{tag}: {r}", flush=True)
                except Exception as e:  # 413 / 500 / OOM — record, keep going
                    print(f"{tag}: FAILED {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
