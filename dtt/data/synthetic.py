"""Synthetic mini-VID: moving textured rectangles with track identities.

Test/integration substitute for ImageNet VID (SURVEY.md §4): known geometry
and motion lets training and tracking be validated end-to-end without the
real corpus. Frames are BGR uint8-range float arrays (pre-normalization);
ground truth follows the track-aligned layout the target layers expect.
"""

from __future__ import annotations

import numpy as np


def _noise(rng: np.random.RandomState, shape) -> np.ndarray:
    """float32-native gaussian noise: RandomState.randn emits float64 and
    dominates host time at production canvases (the generator runs every
    training step); Generator supports dtype=float32 directly."""
    gen = np.random.default_rng(rng.randint(1 << 31))
    return gen.standard_normal(shape, dtype=np.float32)


def _draw_object(img, box, cls, rng):
    """Class-coded texture so classes are separable by appearance."""
    x1, y1, x2, y2 = [int(round(v)) for v in box]
    h, w = img.shape[:2]
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(x2, w - 1), min(y2, h - 1)
    if x2 <= x1 or y2 <= y1:
        return
    base = np.zeros((y2 - y1 + 1, x2 - x1 + 1, 3), np.float32)
    base[..., cls % 3] = 80.0 + 40.0 * (cls % 5)
    base[..., (cls + 1) % 3] = 30.0 * ((cls // 3) % 4)
    yy = np.arange(y1, y2 + 1)[:, None]
    xx = np.arange(x1, x2 + 1)[None, :]
    stripe = 20.0 * np.sin(2 * np.pi * (yy + xx) / max(4 + cls, 4))
    patch = base + stripe[..., None]
    if img.dtype == np.uint8:  # avoid negative-value wraparound
        patch = np.clip(np.round(patch), 0, 255)
    img[y1:y2 + 1, x1:x2 + 1] = patch


def synthetic_pair(rng: np.random.RandomState, height: int, width: int,
                   num_classes: int, max_gt: int, num_objects: int | None = None,
                   max_shift: float = 12.0, uint8: bool = False):
    """One frame pair with translated objects.

    Returns dict:
      images: (2, H, W, 3) float32 (or uint8 canvas if `uint8`)
      gt_boxes: (2, G, 4) track-aligned
      gt_labels: (G,) class ids in [1, num_classes-1]
      gt_valid: (2, G) bool
      im_scale: () float32
    """
    g = max_gt
    n = num_objects if num_objects is not None else rng.randint(1, 4)
    n = min(n, g)
    if uint8:
        # uint8-native background (~N(30, 4) quantized): avoids any
        # full-canvas float pass on the generator's critical path
        gen = np.random.default_rng(rng.randint(1 << 31))
        images = gen.integers(23, 38, (2, height, width, 3),
                              dtype=np.uint8)  # ~mean 30, spread ~4
    else:
        images = np.full((2, height, width, 3), 30.0, np.float32)
        images += _noise(rng, (2, height, width, 3)) * 4.0

    gt_boxes = np.zeros((2, g, 4), np.float32)
    gt_valid = np.zeros((2, g), bool)
    gt_labels = np.zeros((g,), np.int32)

    for i in range(n):
        bw = rng.uniform(width * 0.15, width * 0.45)
        bh = rng.uniform(height * 0.15, height * 0.45)
        x1 = rng.uniform(0, width - bw - max_shift - 1)
        y1 = rng.uniform(0, height - bh - max_shift - 1)
        cls = rng.randint(1, num_classes)
        dx = rng.uniform(-max_shift, max_shift)
        dy = rng.uniform(-max_shift, max_shift)
        box_t = np.array([x1, y1, x1 + bw, y1 + bh], np.float32)
        box_tau = np.clip(box_t + np.array([dx, dy, dx, dy], np.float32),
                          0, [width - 1, height - 1, width - 1, height - 1])
        _draw_object(images[0], box_t, cls, rng)
        _draw_object(images[1], box_tau, cls, rng)
        gt_boxes[0, i] = box_t
        gt_boxes[1, i] = box_tau
        gt_labels[i] = cls
        gt_valid[:, i] = True

    return {
        "images": images,
        "gt_boxes": gt_boxes,
        "gt_labels": gt_labels,
        "gt_valid": gt_valid,
        "im_scale": np.float32(1.0),
        "im_size": np.array([height, width], np.float32),
    }


def synthetic_batch(rng: np.random.RandomState, batch: int, height: int,
                    width: int, num_classes: int, max_gt: int,
                    pixel_means=(102.98, 115.95, 122.77), uint8: bool = False):
    """Stacked batch dict for the train step.

    uint8=True builds quantized un-normalized canvases natively in uint8 —
    no full-canvas float passes on the host (the generator runs every train
    step and the 1-core host is the throughput bound) and 4x fewer H2D
    bytes; the train step normalizes on device (normalize_device_images).
    Default emits host-mean-subtracted float32 (the reference semantics).
    """
    samples = [synthetic_pair(rng, height, width, num_classes, max_gt,
                              uint8=uint8)
               for _ in range(batch)]
    out = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    if not uint8:
        out["images"] = out["images"] - np.asarray(pixel_means, np.float32)
    return out


def synthetic_snippet(rng: np.random.RandomState, num_frames: int, height: int,
                      width: int, num_classes: int, max_gt: int,
                      num_objects: int = 2, max_step: float = 6.0):
    """A T-frame snippet with constant-velocity objects (for linking tests).

    Returns images (T, H, W, 3), gt_boxes (T, G, 4), gt_labels (G,),
    gt_valid (T, G).
    """
    g = max_gt
    n = min(num_objects, g)
    images = np.full((num_frames, height, width, 3), 30.0, np.float32)
    images += _noise(rng, (num_frames, height, width, 3)) * 4.0
    gt_boxes = np.zeros((num_frames, g, 4), np.float32)
    gt_valid = np.zeros((num_frames, g), bool)
    gt_labels = np.zeros((g,), np.int32)

    for i in range(n):
        bw = rng.uniform(width * 0.15, width * 0.35)
        bh = rng.uniform(height * 0.15, height * 0.35)
        x1 = rng.uniform(max_step * num_frames, width - bw - max_step * num_frames - 1)
        y1 = rng.uniform(max_step * num_frames, height - bh - max_step * num_frames - 1)
        vx = rng.uniform(-max_step, max_step)
        vy = rng.uniform(-max_step, max_step)
        cls = rng.randint(1, num_classes)
        gt_labels[i] = cls
        for t in range(num_frames):
            box = np.array([x1 + vx * t, y1 + vy * t,
                            x1 + bw + vx * t, y1 + bh + vy * t], np.float32)
            box = np.clip(box, 0, [width - 1, height - 1, width - 1, height - 1])
            _draw_object(images[t], box, cls, rng)
            gt_boxes[t, i] = box
            gt_valid[t, i] = True
    return images, gt_boxes, gt_labels, gt_valid
