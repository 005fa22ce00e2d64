"""Profiling tool (run on the TPU host): train-step batch scaling

Uses deferral-proof forced-fetch timing (see dtt/utils/timing.py and
CLAUDE.md). Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_train_scaling.py
"""
from dtt.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp, time
from dtt.core.config import Config
from dtt.data.synthetic import synthetic_batch
from dtt.train.trainer import create_train_state, make_train_step

cfg = Config()
h, w = cfg.input.canvas_height, cfg.input.canvas_width
for B in (1, 2, 4, 8):
    try:
        batch = synthetic_batch(np.random.RandomState(0), B, h, w,
                                cfg.model.num_classes, cfg.input.max_gt_boxes)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch["images"][:1])
        step = make_train_step(cfg, model, (h//16, w//16))
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(m)
        print(f"B={B}: compile+1 {time.perf_counter()-t0:.0f}s", flush=True)
        t0 = time.perf_counter(); n = 10
        for i in range(n):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / n
        print(f"B={B}: {dt*1e3:.0f} ms/step -> {B/dt:.1f} pairs/s/chip", flush=True)
        del state, step, batch, model
    except Exception as e:
        print(f"B={B}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
