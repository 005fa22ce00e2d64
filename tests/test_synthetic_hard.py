"""Hard-synthetic generator regression tests (VERDICT round-4 task 3).

Pin the generator's failure modes: occlusion windows really blend toward
the background, distractors are never ground truth, noise bursts hit the
planned frames, degradations leave GT untouched, and alpha=1/mix=0 renders
bit-identically to the clean generator's draw."""

import numpy as np

from dtt.data.synthetic import _background, _draw_object
from dtt.data.synthetic_hard import (Hardness, _draw_blended,
                                     render_hard_snippet,
                                     sample_hard_snippet,
                                     synthetic_hard_snippet)

H, W, NCLS, MAXG = 128, 192, 10, 6


def _gen(seed=0, frames=8, hard=Hardness(), num_objects=2):
    rng = np.random.RandomState(seed)
    return synthetic_hard_snippet(rng, frames, H, W, NCLS, MAXG,
                                  num_objects=num_objects, hard=hard)


def test_contract_shapes_and_determinism():
    imgs, gtb, gtl, gtv = _gen(seed=7)
    assert imgs.shape == (8, H, W, 3) and imgs.dtype == np.uint8
    assert gtb.shape == (8, MAXG, 4) and gtv.shape == (8, MAXG)
    imgs2, gtb2, gtl2, gtv2 = _gen(seed=7)
    np.testing.assert_array_equal(imgs, imgs2)
    np.testing.assert_array_equal(gtb, gtb2)


def test_clean_draw_parity():
    """alpha=1, mix=0 blended draw == the clean generator's _draw_object."""
    rng = np.random.RandomState(3)
    a = _background(rng, (H, W, 3))
    b = a.copy()
    box = np.array([20.3, 30.7, 90.2, 80.1], np.float32)
    _draw_object(a, box, 5)
    _draw_blended(b, box, 5, alpha=1.0)
    np.testing.assert_array_equal(a, b)


def test_occlusion_window_blends_toward_background():
    """During a planned low-visibility window the object's pixels sit
    between background and full texture; outside it they match the clean
    texture levels."""
    hard = Hardness(occlusion_prob=1.0, visibility=(0.2, 0.2),
                    noise_frac=0.0, distractors=0, confusion_mix=(0.0, 0.0),
                    size_range=(0.3, 0.4))
    rng = np.random.RandomState(11)
    gtb, gtl, gtv, plan = sample_hard_snippet(rng, 8, H, W, NCLS, MAXG,
                                              num_objects=1, hard=hard)
    vis = plan["visibility"][:, 0]
    occluded = np.nonzero(vis < 1.0)[0]
    assert occluded.size >= 2, "occlusion_prob=1 must plan a window"
    imgs = render_hard_snippet(np.random.RandomState(12), gtb, gtl, gtv,
                               plan, H, W, hard)

    def center_mean(t):
        x1, y1, x2, y2 = gtb[t, 0].astype(int)
        cy, cx = (y1 + y2) // 2, (x1 + x2) // 2
        return imgs[t, cy - 2:cy + 3, cx - 2:cx + 3].mean()

    t_occ, t_vis = occluded[0], np.nonzero(vis == 1.0)[0][0]
    full = center_mean(t_vis)
    faint = center_mean(t_occ)
    bg = 30.0  # background mean
    # faint frame must sit clearly between background and full visibility
    assert abs(faint - bg) < abs(full - bg) * 0.5
    assert abs(faint - bg) > 2.0  # but the object IS still there


def test_ground_truth_untouched_by_degradations():
    """Occluded frames keep their GT boxes (VID annotates occlusions) and
    distractors never enter GT."""
    hard = Hardness(occlusion_prob=1.0, distractors=6)
    rng = np.random.RandomState(5)
    gtb, gtl, gtv, plan = sample_hard_snippet(rng, 8, H, W, NCLS, MAXG,
                                              num_objects=2, hard=hard)
    assert gtv[:, :2].all(), "objects stay valid through occlusion windows"
    assert int(gtv[0].sum()) == 2, "distractors must not add GT slots"
    assert len(plan["distractors"]) == 6


def test_noise_burst_hits_planned_frames_only():
    hard = Hardness(noise_frac=0.25, noise_sigma=40.0, distractors=0,
                    occlusion_prob=0.0, confusion_mix=(0.0, 0.0))
    rng = np.random.RandomState(9)
    gtb, gtl, gtv, plan = sample_hard_snippet(rng, 8, H, W, NCLS, MAXG,
                                              num_objects=1, hard=hard)
    assert plan["noise_ts"].size == 2
    imgs = render_hard_snippet(np.random.RandomState(10), gtb, gtl, gtv,
                               plan, H, W, hard)
    clean = render_hard_snippet(np.random.RandomState(10), gtb, gtl, gtv,
                                {**plan, "noise_ts": plan["noise_ts"][:0],
                                 "noise_seeds": plan["noise_seeds"][:0]},
                                H, W, hard)
    for t in range(8):
        diff = (imgs[t].astype(np.int32) - clean[t].astype(np.int32))
        if t in plan["noise_ts"]:
            assert np.abs(diff).mean() > 10.0
        else:
            assert np.abs(diff).max() == 0


def test_confusion_mix_shifts_texture():
    """A confusion-blended object's channel levels move toward the other
    class's lattice point (eroding the >=70 separation)."""
    hard = Hardness(confusion_mix=(0.4, 0.4), occlusion_prob=0.0,
                    noise_frac=0.0, distractors=0, size_range=(0.3, 0.4))
    rng = np.random.RandomState(21)
    gtb, gtl, gtv, plan = sample_hard_snippet(rng, 4, H, W, NCLS, MAXG,
                                              num_objects=1, hard=hard)
    assert plan["confusion"][0] == 0.4
    assert plan["confuse_cls"][0] != gtl[0] and plan["confuse_cls"][0] >= 1
    imgs = render_hard_snippet(np.random.RandomState(22), gtb, gtl, gtv,
                               plan, H, W, hard)
    pure = render_hard_snippet(np.random.RandomState(22), gtb, gtl, gtv,
                               {**plan, "confusion": plan["confusion"] * 0},
                               H, W, hard)
    x1, y1, x2, y2 = gtb[0, 0].astype(int)
    cy, cx = (y1 + y2) // 2, (x1 + x2) // 2
    assert np.any(imgs[0, cy, cx] != pure[0, cy, cx])


def test_distractors_flicker():
    """Every distractor lives <= distractor_life frames (temporally
    inconsistent by construction — no tube can claim it)."""
    hard = Hardness(distractor_life=(1, 2), distractors=5)
    rng = np.random.RandomState(31)
    _, _, _, plan = sample_hard_snippet(rng, 12, H, W, NCLS, MAXG,
                                        num_objects=1, hard=hard)
    for (t0, life, box, cls, alpha) in plan["distractors"]:
        assert 1 <= life <= 2
        assert 0 <= t0 and t0 + life <= 12
        assert 1 <= cls < NCLS and 0.5 <= alpha <= 0.85
