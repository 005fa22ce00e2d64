#!/usr/bin/env python
"""Decompose the proposal-NMS stage (round-4 stage table: +15.5 ms/32 frames
against a ~0 SoL; VERDICT round-4 weak #3).

Per-frame the stage is: softmax + decode/clip/min-size over 31k anchors,
top_k(31k -> pre_nms_top_n_test), multi-select while-loop NMS to 300
(dtt/models/rpn.py proposal_layer), vmapped over F-1 frames. Probes isolate:

  N0  decode + clip + min-size + score mask  (no top_k, no NMS)
  N1  N0 + top_k(31k -> k_pre)
  N2  full proposal_layer                    (N2 - N1 = the NMS while-loop)

across k_pre in --kpre and select_block in --blocks. Inputs are staged
random RPN maps; box statistics differ from trained maps (trip counts can
shift) so treat deltas, not absolutes, as the signal — the in-situ number
stays profile_video33's D stage.

Run on the TPU host: python tools/profile_proposal_nms.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dtt.core import boxes as box_ops
    from dtt.core.anchors import grid_anchors_for
    from dtt.core.config import Config
    from dtt.models.rpn import proposal_layer
    from dtt.utils.timing import chained_time

    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--kpre", type=int, nargs="*", default=[6000, 3000, 1000])
    p.add_argument("--blocks", type=int, nargs="*", default=[32])
    p.add_argument("--only", default=None)
    args = p.parse_args()

    cfg = Config()
    mcfg = cfg.model
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    fh, fw = h // 16, w // 16
    a = mcfg.anchors.num_anchors
    anchors = jnp.asarray(grid_anchors_for(mcfg.anchors, fh, fw))
    print(f"backend={jax.default_backend()} frames={args.frames} "
          f"anchors={anchors.shape[0]}")
    rng = np.random.RandomState(0)
    f = args.frames
    # score scale ~ trained logits; deltas small so decoded boxes overlap
    # heavily like real proposals do
    rpn_cls = jnp.asarray(rng.randn(f, fh, fw, 2 * a).astype(np.float32) * 2)
    rpn_bbox = jnp.asarray(rng.randn(f, fh, fw, 4 * a).astype(np.float32) * 0.2)
    im_hw = jnp.asarray([h, w], jnp.float32)

    def t(name, fn):
        if args.only and args.only not in name:
            return None
        ms = chained_time(fn, iters=args.iters, args=(rpn_cls, rpn_bbox)) * 1e3
        print(f"{name:46s} {ms:8.2f} ms /{f} frames", flush=True)
        return ms

    def n0(c, rpn_cls, rpn_bbox):
        def one(rc, rb):
            logits = rc.reshape(-1, 2)
            fg = jax.nn.softmax(logits, axis=-1)[:, 1]
            props = box_ops.decode_boxes(anchors, rb.reshape(-1, 4))
            props = box_ops.clip_boxes(props, im_hw[0], im_hw[1])
            ws = props[:, 2] - props[:, 0] + 1.0
            hs = props[:, 3] - props[:, 1] + 1.0
            keep = (ws >= mcfg.rpn.min_size) & (hs >= mcfg.rpn.min_size)
            return jnp.where(keep, fg, -1.0), props

        s, b = jax.vmap(one)(rpn_cls + c * 1e-12, rpn_bbox)
        return jnp.sum(s) * 1e-9 + jnp.sum(b) * 1e-12 + c * 1e-9

    t("N0 softmax+decode+clip+minsize", n0)

    for k_pre in args.kpre:
        def n1(c, rpn_cls, rpn_bbox, k_pre=k_pre):
            def one(rc, rb):
                logits = rc.reshape(-1, 2)
                fg = jax.nn.softmax(logits, axis=-1)[:, 1]
                props = box_ops.decode_boxes(anchors, rb.reshape(-1, 4))
                props = box_ops.clip_boxes(props, im_hw[0], im_hw[1])
                ws = props[:, 2] - props[:, 0] + 1.0
                hs = props[:, 3] - props[:, 1] + 1.0
                keep = (ws >= mcfg.rpn.min_size) & (hs >= mcfg.rpn.min_size)
                s = jnp.where(keep, fg, -1.0)
                ts_, ti = jax.lax.top_k(s, k_pre)
                return ts_, props[ti]

            s, b = jax.vmap(one)(rpn_cls + c * 1e-12, rpn_bbox)
            return jnp.sum(s) * 1e-9 + jnp.sum(b) * 1e-12 + c * 1e-9

        t(f"N1 + top_k(31k->{k_pre})", n1)

        for blk in args.blocks:
            rcfg = mcfg.rpn.replace(pre_nms_top_n_test=k_pre,
                                    nms_select_block=blk)

            def n2(c, rpn_cls, rpn_bbox, rcfg=rcfg):
                def one(rc, rb):
                    return proposal_layer(rc, rb, anchors, im_hw[0], im_hw[1],
                                          1.0, rcfg, False)

                props = jax.vmap(one)(rpn_cls + c * 1e-12, rpn_bbox)
                return (jnp.sum(props.rois) * 1e-9
                        + jnp.sum(jnp.where(props.valid, props.scores, 0.0))
                        * 1e-9 + c * 1e-9)

            t(f"N2 full k_pre={k_pre} block={blk}", n2)


if __name__ == "__main__":
    main()
