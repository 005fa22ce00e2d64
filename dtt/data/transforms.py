"""Host-side image/blob transforms.

Equivalent of the reference's blob pipeline
(ref: lib/roi_data_layer/minibatch.py + lib/model/utils/blob.py): BGR pixel
order, Caffe pixel-mean subtraction, shorter-side-600 resize — but padded to
ONE fixed canvas so every batch has an identical static shape (the TPU
contract), instead of the reference's per-batch max-shape padding.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from dtt.core.config import InputConfig


def load_image_bgr(path: str) -> np.ndarray:
    """Read an image as float32 BGR HWC (cv2 reads BGR natively)."""
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img.astype(np.float32)
    from PIL import Image  # fallback: RGB -> BGR
    img = np.asarray(Image.open(path).convert("RGB"), np.float32)
    return img[:, :, ::-1].copy()


def canvas_scale(h: int, w: int, cfg: InputConfig) -> float:
    """Resize scale for an (h, w) image: shorter side to target, capped so
    the long side also fits the canvas (reference MAX_SIZE behavior).
    Pure function of the image DIMENSIONS — streaming eval derives the
    snippet scale from the annotation header without decoding any frame."""
    scale = cfg.target_short_side / min(h, w)
    return min(scale, cfg.canvas_height / h, cfg.canvas_width / w)


def resize_to_canvas(img: np.ndarray, cfg: InputConfig, normalize: bool = True
                     ) -> tuple[np.ndarray, float]:
    """Shorter-side resize, mean-subtract, place top-left on a ZERO canvas.

    Returns (canvas image, scale). The scale is capped so the long side also
    fits the canvas (reference MAX_SIZE behavior). Padding stays exactly 0
    *after* normalization — the reference's im_list_to_blob pads zeros after
    mean subtraction, and the native C++ path does the same; normalizing the
    whole canvas instead would put -pixel_mean in the padding.
    """
    h, w = img.shape[:2]
    scale = canvas_scale(h, w, cfg)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    if _HAS_CV2:
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    else:  # pragma: no cover
        yy = (np.arange(nh) / scale).astype(np.int64).clip(0, h - 1)
        xx = (np.arange(nw) / scale).astype(np.int64).clip(0, w - 1)
        resized = img[yy][:, xx]
    if normalize:
        resized = resized - np.asarray(cfg.pixel_means, np.float32)
    canvas = np.zeros((cfg.canvas_height, cfg.canvas_width, 3), np.float32)
    canvas[:nh, :nw] = resized
    return canvas, float(scale)


def normalize(img: np.ndarray, cfg: InputConfig) -> np.ndarray:
    return img - np.asarray(cfg.pixel_means, np.float32)


def flip_image_and_boxes(img: np.ndarray, boxes: np.ndarray
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Horizontal flip (roidb 'flipped' augmentation)."""
    w = img.shape[1]
    out = img[:, ::-1].copy()
    if boxes.size:
        flipped = boxes.copy()
        flipped[:, 0] = w - 1.0 - boxes[:, 2]
        flipped[:, 2] = w - 1.0 - boxes[:, 0]
        boxes = flipped
    return out, boxes


def prepare_frame(path: str, cfg: InputConfig, flip: bool = False,
                  use_native: bool = True) -> tuple[np.ndarray, float]:
    """One frame -> (normalized canvas, scale).

    Fast path: the fused C++ pipeline (dtt/data/native.py) decodes JPEG at
    DCT-domain scale and performs resize+flip+mean-subtract+pad in a single
    pass — one core on this host makes the 4-pass cv2/numpy route the
    bottleneck. Falls back transparently to cv2/numpy.
    """
    if use_native and path.lower().endswith((".jpeg", ".jpg")):
        from dtt.data import native
        if native.available():
            try:
                with open(path, "rb") as f:
                    return native.decode_resize_normalize(f.read(), cfg, flip)
            except ValueError:
                pass  # corrupt/odd jpeg: fall through to cv2
    img = load_image_bgr(path)
    if flip:
        img = img[:, ::-1]
    return resize_to_canvas(img, cfg)


def prepare_pair(entry: dict, cfg: InputConfig) -> dict:
    """roidb entry -> train-batch sample (track-aligned gt layout).

    Output arrays: images (2, H, W, 3) normalized; gt_boxes (2, G, 4) where
    slot g is the same trackid in both frames; gt_labels (G,);
    gt_valid (2, G); im_scale ().
    """
    g_max = cfg.max_gt_boxes
    images = []
    scale = None
    raw_annots = entry["annots"]

    # track-align gt slots by trackid
    tids: list[int] = []
    for ann in raw_annots:
        for tid in ann["trackids"]:
            if int(tid) not in tids:
                tids.append(int(tid))
    tids = tids[:g_max]
    slot_of = {tid: i for i, tid in enumerate(tids)}

    gt_boxes = np.zeros((2, g_max, 4), np.float32)
    gt_labels = np.zeros((g_max,), np.int32)
    gt_valid = np.zeros((2, g_max), bool)
    im_size = np.zeros((2,), np.float32)  # true (h, w) extent on the canvas

    for f in range(2):
        ann = raw_annots[f]
        boxes = ann["boxes"].copy()
        flipped = bool(entry.get("flipped"))
        if flipped and boxes.size:
            w_img = ann["width"]
            fl = boxes.copy()
            fl[:, 0] = w_img - 1.0 - boxes[:, 2]
            fl[:, 2] = w_img - 1.0 - boxes[:, 0]
            boxes = fl
        canvas, scale = prepare_frame(entry["paths"][f], cfg, flip=flipped)
        images.append(canvas)
        if f == 0:
            im_size = np.array([round(ann["height"] * scale),
                                round(ann["width"] * scale)], np.float32)
        else:
            # frames of a VID snippet share dimensions; a mismatch would make
            # the single per-pair im_size silently wrong for one frame
            assert (ann["height"], ann["width"]) == (
                raw_annots[0]["height"], raw_annots[0]["width"]), (
                "frame pair with mismatched image extents")
        for b, lab, tid in zip(boxes, ann["labels"], ann["trackids"]):
            slot = slot_of.get(int(tid))
            if slot is None:
                continue
            gt_boxes[f, slot] = b * scale
            gt_labels[slot] = lab
            gt_valid[f, slot] = True

    return {
        "images": np.stack(images),
        "gt_boxes": gt_boxes,
        "gt_labels": gt_labels,
        "gt_valid": gt_valid,
        "im_scale": np.float32(scale),
        # true image extent on the padded canvas: anchors/negatives beyond it
        # are padding, not background (see dtt/train/losses.py)
        "im_size": im_size,
    }


def prepare_image(path: str, cfg: InputConfig) -> tuple[np.ndarray, float]:
    """Single eval image -> (normalized canvas, scale)."""
    return prepare_frame(path, cfg)
