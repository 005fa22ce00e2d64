"""Profiling tool (run on the TPU host): incremental cost of each inference pipeline stage

Uses deferral-proof forced-fetch timing (see dtt/utils/timing.py and
CLAUDE.md). Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_pipeline.py
"""
from dtt.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp, time
from dtt.core.config import Config
from dtt.core.anchors import grid_anchors_for
from dtt.models.dnt import (make_model, DnT, detect_frames_batched,
                            track_rois_batched, decode_detections_batched)
from dtt.models.rpn import proposal_layer
from dtt.ops.psroi import psroi_pool
from dtt.utils.timing import sync_latency

cfg = Config(); mcfg = cfg.model
h, w = cfg.input.canvas_height, cfg.input.canvas_width
model = make_model(mcfg)
rng = np.random.RandomState(0)
F = 9
frames = jnp.asarray(rng.randn(F, h, w, 3).astype(np.float32))
params = jax.jit(model.init)(jax.random.PRNGKey(0), frames[None, :2])
anchors = jnp.asarray(grid_anchors_for(mcfg.anchors, h//16, w//16))
im_hw = jnp.asarray([h, w], jnp.float32)
ecfg = cfg.eval

def timed(name, fn):
    fn_j = jax.jit(fn)
    float(fn_j(params, frames))
    lat = sync_latency()
    ts = []
    for i in range(10):
        f = frames + np.float32(i*1e-6)
        t0 = time.perf_counter(); float(fn_j(params, f)); ts.append(time.perf_counter()-t0)
    ts.sort()
    print(f"{name}: {(ts[2]-lat)*1e3:.1f} ms", flush=True)

def feats_only(params, frames):
    feats = model.apply(params, frames, method=DnT.frame_features)
    return sum(jnp.sum(x) for x in [feats.rpn_cls, feats.rpn_bbox, feats.cls_maps, feats.bbox_maps]) * 1e-9

def feats_track(params, frames):
    feats = model.apply(params, frames, method=DnT.frame_features)
    f_t = jax.tree.map(lambda x: x[:-1], feats)
    f_tau = jax.tree.map(lambda x: x[1:], feats)
    tm = model.apply(params, f_t, f_tau, method=DnT.track_psmaps)
    return (jnp.sum(tm) + jnp.sum(feats.cls_maps)) * 1e-9

def plus_proposals(params, frames):
    feats = model.apply(params, frames, method=DnT.frame_features)
    f_t = jax.tree.map(lambda x: x[:-1], feats)
    def one(rc, rb):
        return proposal_layer(rc, rb, anchors, im_hw[0], im_hw[1], 1.0, mcfg.rpn, False)
    props = jax.vmap(one)(f_t.rpn_cls, f_t.rpn_bbox)
    return (jnp.sum(props.rois) + jnp.sum(jnp.where(props.valid, props.scores, 0.))) * 1e-9

def plus_heads(params, frames):
    feats = model.apply(params, frames, method=DnT.frame_features)
    f_t = jax.tree.map(lambda x: x[:-1], feats)
    props, det = detect_frames_batched(mcfg, f_t, anchors, im_hw[0], im_hw[1], 1.0)
    return (jnp.sum(det.cls_prob) + jnp.sum(det.bbox_pred)) * 1e-9

def full(params, frames):
    feats = model.apply(params, frames, method=DnT.frame_features)
    f_t = jax.tree.map(lambda x: x[:-1], feats)
    f_tau = jax.tree.map(lambda x: x[1:], feats)
    tm = model.apply(params, f_t, f_tau, method=DnT.track_psmaps)
    props, det = detect_frames_batched(mcfg, f_t, anchors, im_hw[0], im_hw[1], 1.0)
    deltas = track_rois_batched(mcfg, tm, det.rois)
    b, s, v, tr = decode_detections_batched(mcfg, det, im_hw[0], im_hw[1],
                                            ecfg.score_thresh, ecfg.nms_thresh,
                                            ecfg.max_per_class, track_deltas=deltas)
    return (jnp.sum(s) + jnp.sum(b)*1e-6 + jnp.sum(tr)*1e-6)

timed("A features only (9 frames)", feats_only)
timed("B + correlation/track maps", feats_track)
timed("C features + proposal NMS (8 frames)", plus_proposals)
timed("D features + proposals + psroi heads", plus_heads)
timed("E FULL video step", full)
