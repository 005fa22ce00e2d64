"""Streaming (memory-bounded) snippet evaluation over a long on-disk snippet.

Round-2 gap: eval stacked every decoded frame of a snippet before inference
— tens of GB for real ImageNet VID snippets. The chunked evaluators now pull
frames through LazyFrames; these tests pin decode-once behavior, the bounded
cache, and bit-identical outputs vs the stacked path, over a 220-frame fake
ILSVRC snippet (reference streams its test_net.py frame loop the same way).
"""

import argparse
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

from dtt.core.config import load_config
from dtt.data.transforms import prepare_image
from dtt.eval.inference import LazyFrames, evaluate_snippet_video, make_video_step
from dtt.train.trainer import create_train_state

import eval as eval_script

T_LEN = 220


def _write_xml(path, width, height, objects):
    root = ET.Element("annotation")
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "width").text = str(width)
    ET.SubElement(size, "height").text = str(height)
    for wnid, tid, box in objects:
        o = ET.SubElement(root, "object")
        ET.SubElement(o, "trackid").text = str(tid)
        ET.SubElement(o, "name").text = wnid
        bb = ET.SubElement(o, "bndbox")
        for k, v in zip(("xmin", "ymin", "xmax", "ymax"), box):
            ET.SubElement(bb, k).text = str(v)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ET.ElementTree(root).write(path)


@pytest.fixture(scope="module")
def long_snippet_tree(tmp_path_factory):
    """One fake ILSVRC val snippet with 220 frames (64x96, scale 1.0)."""
    from dtt.data.imagenet_vid import VID_CLASSES
    root = str(tmp_path_factory.mktemp("ilsvrc"))
    wnid = VID_CLASSES[0][0]
    rng = np.random.RandomState(7)
    h, w = 64, 96
    for t in range(T_LEN):
        img = rng.randint(20, 40, (h, w, 3)).astype(np.uint8)
        x = 10 + (t % 40)
        img[20:44, x:x + 24] = (200, 80, 40)
        d = os.path.join(root, "Data", "VID", "val", "snip_long")
        os.makedirs(d, exist_ok=True)
        cv2.imwrite(os.path.join(d, f"{t:06d}.JPEG"), img)
        _write_xml(os.path.join(root, "Annotations", "VID", "val",
                                "snip_long", f"{t:06d}.xml"),
                   w, h, [(wnid, 0, [x, 20, x + 23, 43])])
    return root


def test_lazyframes_decode_once_bounded_cache(long_snippet_tree):
    cfg = load_config("configs/tiny_synth.yml")
    args = argparse.Namespace(dataset="imagenet_vid_val",
                              data_root=long_snippet_tree, max_snippets=None)
    (name, frames, im_hw, scale, (gt_boxes, gt_labels, gt_valid)), = list(
        eval_script.snippet_stream_vid(cfg, args))
    assert isinstance(frames, LazyFrames)
    assert frames.shape == (T_LEN, 64, 96, 3)
    assert scale == 1.0 and im_hw == (64, 96)
    assert gt_boxes.shape[0] == T_LEN and gt_valid.all()

    # sequential chunked access with one frame of overlap: every frame
    # decodes exactly once and the cache never grows past its cap
    f = 9
    start = 0
    while start < T_LEN:
        for i in range(start, start + f):
            frames[min(i, T_LEN - 1)]
        start += f - 1
    assert frames.decode_count == T_LEN
    assert frames.peak_cached <= 8


def test_streamed_eval_matches_stacked(long_snippet_tree):
    """evaluate_snippet_video(LazyFrames) == evaluate_snippet_video(ndarray)
    bit-for-bit, while holding at most a handful of frames in memory."""
    cfg = load_config("configs/tiny_synth.yml")
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    import jax.numpy as jnp
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), jnp.zeros((1, 2, h, w, 3), jnp.float32))
    video_step = make_video_step(cfg, model, frames_per_chunk=9)

    args = argparse.Namespace(dataset="imagenet_vid_val",
                              data_root=long_snippet_tree, max_snippets=None)
    (_, lazy, im_hw, scale, _), = list(
        eval_script.snippet_stream_vid(cfg, args))
    # independent stacked decode of the same snippet (the round-2 path)
    stacked = np.stack([prepare_image(p, cfg.input)[0] for p in lazy.paths])

    sub = 40  # first chunks only: full 220 frames x compiled step is slow
    out_lazy = evaluate_snippet_video(
        cfg, video_step, state.params,
        LazyFrames(lazy.paths[:sub], cfg.input), im_hw=im_hw, scale=scale)
    out_stacked = evaluate_snippet_video(
        cfg, video_step, state.params, stacked[:sub], im_hw=im_hw,
        scale=scale)
    for a, b in zip(out_lazy, out_stacked):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
