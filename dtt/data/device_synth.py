"""On-device synthetic canvas rendering (jit-safe, uint8).

The 1-core host + ~40 MB/s H2D tunnel make image upload the training
bottleneck (BASELINE.md: flagship batches crawl at ~10 pairs/s while the
pure device step runs 25 pairs/s). Synthetic scenes are fully described by
a few KB of object parameters, so this module rebuilds the canvases ON the
chip inside the jitted train step: the host samples boxes/classes
(dtt.data.synthetic.sample_params_batch, ~KB upload) and `render_pairs`
draws the SAME uint8 pixels the host renderer would — uniform-integer
background in [23, 37] (jax PRNG instead of numpy, identical distribution)
and the shared class-coded texture formula (synthetic.object_texture),
parity-tested pixel-exact on the object interiors (tests/test_device_synth.py).

Rendering cost is a G-step fori_loop of fused elementwise VPU work per
canvas — negligible next to the backbone — and it turns flagship synthetic
training from transfer-bound back into compute-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _texture(cls, yy, xx):
    """jnp twin of dtt.data.synthetic.object_texture at absolute coords.

    cls is a traced int32 scalar; channel selection becomes a where() over
    the 3-channel axis instead of python indexing."""
    digits = jnp.stack([jnp.mod(cls, 4), jnp.mod(cls // 4, 4),
                        jnp.mod(cls // 16, 4)])
    base = 40.0 + 70.0 * digits.astype(jnp.float32)
    period = jnp.maximum(4 + cls, 4).astype(jnp.float32)
    stripe = 20.0 * jnp.sin(2.0 * jnp.pi * (yy + xx) / period)
    return base[None, None, :] + stripe[:, :, None]       # (H, W, 3) float32


def render_frame(boxes, labels, valid, background):
    """One uint8 canvas from (G, 4) boxes / (G,) labels / (G,) valid.

    Matches the host renderer's conventions exactly: boxes are rounded
    half-to-even then clamped to the canvas, degenerate boxes are skipped,
    textures are round()ed and clipped to [0, 255], and objects are drawn
    in slot order (later slots overwrite earlier ones on overlap).
    """
    height, width = background.shape[0], background.shape[1]
    yy = jnp.arange(height, dtype=jnp.float32)[:, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, :]

    def draw(g, canvas):
        b = jnp.round(boxes[g].astype(jnp.float32))
        x1 = jnp.maximum(b[0], 0.0)
        y1 = jnp.maximum(b[1], 0.0)
        x2 = jnp.minimum(b[2], width - 1.0)
        y2 = jnp.minimum(b[3], height - 1.0)
        cls = labels[g].astype(jnp.int32)
        patch = jnp.clip(jnp.round(_texture(cls, yy, xx)), 0.0, 255.0
                         ).astype(jnp.uint8)
        mask = ((xx >= x1) & (xx <= x2) & (yy >= y1) & (yy <= y2)
                & (x2 > x1) & (y2 > y1) & valid[g])
        return jnp.where(mask[:, :, None], patch, canvas)

    return jax.lax.fori_loop(0, boxes.shape[0], draw, background)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def render_pairs(gt_boxes, gt_labels, gt_valid, key, height: int, width: int):
    """uint8 canvases (B, 2, H, W, 3) for a batch of frame pairs.

    gt_boxes (B, 2, G, 4), gt_labels (B, G) shared across the pair,
    gt_valid (B, 2, G). `key` draws the background (uniform ints [23, 37],
    the host generator's distribution).
    """
    b = gt_boxes.shape[0]
    background = jax.random.randint(
        key, (b, 2, height, width, 3), 23, 38, jnp.int32).astype(jnp.uint8)
    labels2 = jnp.broadcast_to(gt_labels[:, None, :], gt_valid.shape)
    return jax.vmap(jax.vmap(render_frame))(gt_boxes, labels2, gt_valid,
                                            background)


def make_pair_render_fn(height: int, width: int):
    """(batch_dict, key) -> images, for make_train_step(render_fn=...)."""
    def render(batch, key):
        return render_pairs(batch["gt_boxes"], batch["gt_labels"],
                            batch["gt_valid"], key, height, width)
    return render
