"""Data layer tests over a synthetic mini-ILSVRC tree."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dtt.core.config import InputConfig
from dtt.data.imagenet_vid import (CLASS_NAMES, VID_CLASSES, ImagenetDET,
                                   ImagenetVID, parse_vid_xml)
from dtt.data.imdb import combined_roidb, get_dataset, list_datasets
from dtt.data.loader import PairLoader, device_prefetch
from dtt.data.transforms import prepare_image, prepare_pair


def write_xml(path, width, height, objects):
    root = ET.Element("annotation")
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "width").text = str(width)
    ET.SubElement(size, "height").text = str(height)
    for wnid, tid, box in objects:
        o = ET.SubElement(root, "object")
        ET.SubElement(o, "trackid").text = str(tid)
        ET.SubElement(o, "name").text = wnid
        bb = ET.SubElement(o, "bndbox")
        ET.SubElement(bb, "xmax").text = str(box[2])
        ET.SubElement(bb, "xmin").text = str(box[0])
        ET.SubElement(bb, "ymax").text = str(box[3])
        ET.SubElement(bb, "ymin").text = str(box[1])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ET.ElementTree(root).write(path)


@pytest.fixture
def mini_ilsvrc(tmp_path):
    """2 VID snippets (3 + 2 frames) and 2 DET images."""
    root = str(tmp_path)
    wnid_a = VID_CLASSES[0][0]   # airplane
    wnid_b = VID_CLASSES[6][0]   # car
    rng = np.random.RandomState(0)

    for s, nframes in [("snip_a", 3), ("snip_b", 2)]:
        for t in range(nframes):
            img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
            d = os.path.join(root, "Data", "VID", "train", s)
            os.makedirs(d, exist_ok=True)
            cv2.imwrite(os.path.join(d, f"{t:06d}.JPEG"), img)
            objs = [(wnid_a, 0, [10 + 5 * t, 20, 60 + 5 * t, 70])]
            if s == "snip_a" and t < 2:   # track 1 leaves after frame 1
                objs.append((wnid_b, 1, [80, 40, 120, 90]))
            write_xml(os.path.join(root, "Annotations", "VID", "train", s,
                                   f"{t:06d}.xml"), 160, 120, objs)

    for i in range(2):
        img = (rng.rand(100, 140, 3) * 255).astype(np.uint8)
        d = os.path.join(root, "Data", "DET", "train", "fold")
        os.makedirs(d, exist_ok=True)
        cv2.imwrite(os.path.join(d, f"det_{i}.JPEG"), img)
        objs = [(wnid_b, 0, [5, 5, 50, 60])]
        if i == 1:  # second DET image also has a non-VID class to be skipped
            objs.append(("n99999999", 0, [1, 1, 20, 20]))
        write_xml(os.path.join(root, "Annotations", "DET", "train", "fold",
                               f"det_{i}.xml"), 140, 100, objs)
    return root


def test_class_table():
    assert len(VID_CLASSES) == 30
    assert len(CLASS_NAMES) == 31
    assert CLASS_NAMES[0] == "__background__"
    assert len({w for w, _ in VID_CLASSES}) == 30


def test_parse_xml(mini_ilsvrc):
    ann = parse_vid_xml(os.path.join(mini_ilsvrc, "Annotations", "VID",
                                     "train", "snip_a", "000000.xml"))
    assert ann["width"] == 160 and ann["height"] == 120
    assert ann["boxes"].shape == (2, 4)
    np.testing.assert_array_equal(ann["labels"], [1, 7])
    np.testing.assert_array_equal(ann["trackids"], [0, 1])


def test_vid_roidb_pairs(mini_ilsvrc):
    ds = ImagenetVID(root=mini_ilsvrc, split="train", use_flipped=False)
    assert len(ds.snippets) == 2
    roidb = ds.roidb()
    # snip_a: 2 pairs, snip_b: 1 pair
    assert len(roidb) == 3
    for e in roidb:
        assert len(e["paths"]) == 2 and not e["flipped"]
    ds_f = ImagenetVID(root=mini_ilsvrc, split="train", use_flipped=True)
    assert len(ds_f.roidb()) == 6


def test_det_roidb_identity_pairs(mini_ilsvrc):
    ds = ImagenetDET(root=mini_ilsvrc, split="train", use_flipped=False)
    roidb = ds.roidb()
    assert len(roidb) == 2
    assert roidb[0]["paths"][0] == roidb[0]["paths"][1]
    # non-VID class object was skipped
    assert all(e["annots"][0]["boxes"].shape[0] == 1 for e in roidb)


def test_registry(mini_ilsvrc):
    assert "imagenet_vid_train" in list_datasets()
    roidb = combined_roidb("imagenet_vid_train+imagenet_det_train",
                           root=mini_ilsvrc, use_flipped=False)
    assert len(roidb) == 5


def test_prepare_pair_track_alignment(mini_ilsvrc):
    ds = ImagenetVID(root=mini_ilsvrc, split="train", use_flipped=False)
    cfg = InputConfig(target_short_side=96, canvas_height=96, canvas_width=128,
                      max_gt_boxes=4)
    entry = [e for e in ds.roidb()
             if e["paths"][0].endswith("snip_a/000001.JPEG")][0]
    s = prepare_pair(entry, cfg)
    assert s["images"].shape == (2, 96, 128, 3)
    # frame t has tracks {0,1}; frame t+1 only {0} -> slot 1 invalid at τ
    assert s["gt_valid"][0, 0] and s["gt_valid"][0, 1]
    assert s["gt_valid"][1, 0] and not s["gt_valid"][1, 1]
    np.testing.assert_array_equal(s["gt_labels"][:2], [1, 7])
    # boxes scaled by im_scale
    scale = float(s["im_scale"])
    np.testing.assert_allclose(s["gt_boxes"][0, 0],
                               np.array([15, 20, 65, 70]) * scale, rtol=1e-5)


def test_prepare_pair_flip(mini_ilsvrc):
    ds = ImagenetVID(root=mini_ilsvrc, split="train", use_flipped=True)
    cfg = InputConfig(target_short_side=96, canvas_height=96, canvas_width=128,
                      max_gt_boxes=4)
    pair = [(a, b) for a, b in zip(ds.roidb()[::2], ds.roidb()[1::2])][0]
    s0, s1 = prepare_pair(pair[0], cfg), prepare_pair(pair[1], cfg)
    w_img = 160  # original width; flip happens pre-resize
    scale = float(s0["im_scale"])
    b0 = s0["gt_boxes"][0, 0] / scale
    b1 = s1["gt_boxes"][0, 0] / scale
    np.testing.assert_allclose(b1[0], w_img - 1 - b0[2], rtol=1e-5)
    np.testing.assert_allclose(b1[2], w_img - 1 - b0[0], rtol=1e-5)


def test_loader_batches(mini_ilsvrc):
    ds = ImagenetVID(root=mini_ilsvrc, split="train", use_flipped=True)
    cfg = InputConfig(target_short_side=96, canvas_height=96, canvas_width=128,
                      max_gt_boxes=4)
    loader = PairLoader(ds.roidb(), cfg, batch_size=2, num_workers=2,
                        loop=False)
    batches = list(loader)
    assert len(batches) == 3  # 6 entries / batch 2
    for b in batches:
        assert b["images"].shape == (2, 2, 96, 128, 3)
        assert b["gt_boxes"].shape == (2, 2, 4, 4)
        assert b["gt_valid"].any()
    loader.stop()


def test_device_prefetch(mini_ilsvrc):
    ds = ImagenetVID(root=mini_ilsvrc, split="train", use_flipped=False)
    cfg = InputConfig(target_short_side=96, canvas_height=96, canvas_width=128,
                      max_gt_boxes=4)
    loader = PairLoader(ds.roidb(), cfg, batch_size=1, num_workers=1,
                        loop=False)
    n = 0
    import jax.numpy as jnp
    # single-device contract: HOST batches (the jitted call's inline-arg
    # upload beats per-array device_put on the tunnel), cast applied
    for batch in device_prefetch(loader, size=2,
                                 cast={"images": jnp.bfloat16}):
        assert isinstance(batch["images"], np.ndarray)
        assert batch["images"].dtype == jnp.bfloat16
        n += 1
    assert n == 3
    loader.stop()


def test_device_prefetch_mesh_places_on_device(mini_ilsvrc):
    import jax
    from dtt.parallel.mesh import data_mesh
    ds = ImagenetVID(root=mini_ilsvrc, split="train", use_flipped=False)
    cfg = InputConfig(target_short_side=96, canvas_height=96, canvas_width=128,
                      max_gt_boxes=4)
    loader = PairLoader(ds.roidb(), cfg, batch_size=1,
                        num_workers=1, loop=False)
    mesh = data_mesh(jax.devices()[:1])
    seen = 0
    for batch in device_prefetch(loader, mesh=mesh, size=2):
        assert hasattr(batch["images"], "sharding")  # on-device, sharded
        seen += 1
    assert seen >= 1
    loader.stop()


def test_prepare_image(mini_ilsvrc):
    cfg = InputConfig(target_short_side=96, canvas_height=96, canvas_width=128,
                      max_gt_boxes=4)
    img, scale = prepare_image(
        os.path.join(mini_ilsvrc, "Data", "VID", "train", "snip_a",
                     "000000.JPEG"), cfg)
    assert img.shape == (96, 128, 3)
    assert 0 < scale <= 1.0


def test_combined_roidb_tags_sources(mini_ilsvrc):
    roidb = combined_roidb("imagenet_vid_train+imagenet_det_train",
                           root=mini_ilsvrc, use_flipped=False)
    srcs = {e["source"] for e in roidb}
    assert srcs == {"imagenet_vid_train", "imagenet_det_train"}


def _mix_fraction(roidb, det_fraction, n_batches=60, batch=8):
    def prep(entry, cfg):
        return {"is_det": np.float32("det" in entry["source"])}
    loader = PairLoader(roidb, InputConfig(), batch, seed=0, num_workers=1,
                        prepare_fn=prep, det_fraction=det_fraction)
    it = iter(loader)
    total = sum(float(next(it)["is_det"].sum()) for _ in range(n_batches))
    loader.stop()
    return total / (n_batches * batch)


def test_pair_loader_det_fraction_mixture():
    """input.det_fraction controls the realized DET:VID batch mixture
    (round-2 gap: DET ~10x VID made naive concatenation mostly identity
    pairs — D&T paper §3.4 balances the sources)."""
    roidb = ([{"source": "imagenet_vid_train"}] * 20
             + [{"source": "imagenet_det_train"}] * 200)
    # natural concatenation: dominated by DET (~0.91)
    assert _mix_fraction(roidb, det_fraction=-1.0) > 0.8
    # balanced knob: ~requested fraction
    got = _mix_fraction(roidb, det_fraction=0.25)
    assert 0.17 < got < 0.33, got
    # single-source roidb: knob is a no-op, not a crash
    assert _mix_fraction([{"source": "imagenet_vid_train"}] * 30, 0.5) == 0.0
