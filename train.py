#!/usr/bin/env python
"""Train the D&T model (TPU-native equivalent of the reference trainval_net.py).

Examples:
  # synthetic smoke run (no dataset needed):
  python train.py --synthetic --set train.total_steps=50 model.backbone=tiny

  # ImageNet VID + DET joint training, data-parallel over all chips.
  # NOTE: like the reference, the flagship config assumes an ImageNet-
  # pretrained backbone (--pretrained resnet101.pth); with frozen stages +
  # frozen BN a randomly-initialized ResNet-101 cannot learn detection.
  python train.py --dataset imagenet_vid_train+imagenet_det_train \
      --data-root /data/ILSVRC2015 --pretrained resnet101.pth --out runs/dnt
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train Detect&Track (TPU)")
    p.add_argument("--config", default=None, help="YAML config")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VAL",
                   help="dotted config overrides")
    p.add_argument("--dataset", default="imagenet_vid_train",
                   help="'+'-joined registered dataset names")
    p.add_argument("--data-root", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated mini-VID (no dataset required)")
    p.add_argument("--device-render", action="store_true",
                   help="with --synthetic: upload only KB-scale scene "
                        "parameters and draw the canvases on device inside "
                        "the train step (dtt.data.device_synth) — removes "
                        "the H2D image-upload bottleneck")
    p.add_argument("--out", default="runs/dtt")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --out")
    p.add_argument("--pretrained", default=None, metavar="PTH",
                   help="torchvision/caffe-style ResNet .pth for the backbone")
    p.add_argument("--calibrate-bn", action="store_true",
                   help="estimate the frozen-BN affines from one data batch "
                        "(LSUV-style); substitute for pretrained running "
                        "stats when training from scratch")
    p.add_argument("--num-workers", type=int, default=8)
    args = p.parse_args()
    if args.device_render and not args.synthetic:
        p.error("--device-render only applies to --synthetic training "
                "(real datasets upload decoded frames)")
    return args


def main():
    args = parse_args()
    from dtt.utils.platform import apply_platform_request
    apply_platform_request()  # honor DTT_PLATFORM before first backend use
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dtt.core.config import load_config, save_config
    from dtt.data.loader import PairLoader, device_prefetch
    from dtt.data.synthetic import synthetic_batch
    from dtt.train.checkpoint import (latest_checkpoint, restore_checkpoint,
                                      save_checkpoint)
    from dtt.train.trainer import (create_train_state, make_data_mesh,
                                   make_parallel_train_step, make_train_step,
                                   shard_batch)

    cfg = load_config(args.config, args.set)
    os.makedirs(args.out, exist_ok=True)
    save_config(cfg, os.path.join(args.out, "config.yml"))

    n_dev = jax.device_count()
    batch = cfg.train.batch_size_per_chip * n_dev
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    print(f"devices={n_dev} ({jax.default_backend()}), "
          f"global batch={batch} frame-pairs, canvas={h}x{w}")

    # ---- data ----
    render_fn = None
    if args.synthetic:
        rng = np.random.RandomState(cfg.train.seed)
        n_obj = cfg.input.synthetic_objects

        if args.device_render:
            from dtt.data.device_synth import make_pair_render_fn
            from dtt.data.synthetic import sample_params_batch
            render_fn = make_pair_render_fn(h, w)

            def batches():
                while True:
                    # scene params only (~KB); canvases drawn on device
                    yield sample_params_batch(rng, batch, h, w,
                                              cfg.model.num_classes,
                                              cfg.input.max_gt_boxes,
                                              num_objects=n_obj)
        else:
            def batches():
                while True:
                    # uint8 canvases: 4x fewer H2D bytes, normalized on device
                    # (exact — see dtt.models.dnt.normalize_device_images)
                    yield synthetic_batch(rng, batch, h, w,
                                          cfg.model.num_classes,
                                          cfg.input.max_gt_boxes,
                                          cfg.input.pixel_means, uint8=True,
                                          num_objects=n_obj)
        stream = batches()
        loader = None
    else:
        from dtt.data.imdb import combined_roidb
        import dtt.data.imagenet_vid  # noqa: F401  (registers datasets)
        assert args.data_root, "--data-root required without --synthetic"
        roidb = combined_roidb(args.dataset, root=args.data_root,
                               use_flipped=cfg.input.use_flipped)
        print(f"roidb: {len(roidb)} frame-pair entries from {args.dataset}")
        loader = PairLoader(roidb, cfg.input, batch,
                            seed=cfg.train.seed, num_workers=args.num_workers,
                            det_fraction=cfg.input.det_fraction)
        stream = iter(loader)

    # ---- model/state ----
    sample = jnp.zeros((1, 2, h, w, 3), jnp.float32)
    model, state = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed),
                                      sample)
    if args.pretrained:
        from dtt.utils.torch_import import import_pretrained_backbone
        state = state._replace(
            params=import_pretrained_backbone(args.pretrained, state.params))
        print(f"loaded pretrained backbone from {args.pretrained}")
    if args.calibrate_bn:
        from dtt.utils.calibrate import calibrate_model_backbone
        if render_fn is not None:
            # device-render batches carry no pixels; host-render one batch
            # of the same distribution for the calibration pass
            calib = synthetic_batch(np.random.RandomState(cfg.train.seed + 7),
                                    batch, h, w, cfg.model.num_classes,
                                    cfg.input.max_gt_boxes,
                                    cfg.input.pixel_means, uint8=True,
                                    num_objects=cfg.input.synthetic_objects)
        else:
            calib = next(stream)
        imgs = calib["images"]
        if imgs.dtype == np.uint8:  # normalize on host for the calibration pass
            imgs = imgs.astype(np.float32) - np.asarray(cfg.input.pixel_means,
                                                        np.float32)
        state = state._replace(
            params=calibrate_model_backbone(cfg, state.params, imgs))
        print("calibrated frozen-BN affines from one batch "
              f"({imgs.shape[0] * 2} frames)")
    if args.resume:
        ck = latest_checkpoint(args.out)
        if ck:
            state = restore_checkpoint(ck, state)
            print(f"resumed from {ck} at step {int(state.step)}")

    mesh = make_data_mesh() if n_dev > 1 else None
    if mesh is not None:
        step_fn = make_parallel_train_step(cfg, model, (h // 16, w // 16),
                                           mesh, render_fn=render_fn)
    else:
        step_fn = make_train_step(cfg, model, (h // 16, w // 16),
                                  render_fn=render_fn)

    # Transfer-aware casting: synthetic batches already ship uint8 (device
    # normalization); for the real loader, bf16 image transfer is lossless
    # for a bf16-compute backbone (its first op is the same cast) and halves
    # the H2D bytes — the tunnel upload, not the device step, bounds
    # training throughput on this machine.
    cast = ({"images": jnp.bfloat16}
            if cfg.model.dtype == "bfloat16" and not args.synthetic else None)
    stream = device_prefetch(stream, mesh=mesh, size=2, cast=cast)

    # ---- loop ----
    from dtt.utils.logging import MetricLogger
    key = jax.random.PRNGKey(cfg.train.seed + 1)
    logger = MetricLogger(args.out, run_name=cfg.exp_name)
    t0 = time.perf_counter()
    # host-side step counter: fetching int(state.step) every iteration would
    # block on the ~25 ms tunnel sync per step and serialize dispatch
    step = int(state.step)
    timer_step = None  # set after the first (compile) step for honest pairs/s
    for batch_np in stream:
        if step >= cfg.train.total_steps:
            break
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch_np, sub)
        step += 1
        if timer_step is None:
            jax.block_until_ready(metrics)
            timer_step, t0 = step, time.perf_counter()
        if step % cfg.train.log_every == 0 or step == 1:
            jax.block_until_ready(metrics)
            dt = time.perf_counter() - t0
            pps = (step - timer_step) * batch / max(dt, 1e-9)
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            line = logger.log(step, {"pairs_per_sec": round(pps, 2), **m})
            print(json.dumps(line))
        if step % cfg.train.checkpoint_every == 0:
            path = save_checkpoint(args.out, state, cfg)
            print(f"checkpoint: {path}")

    save_checkpoint(args.out, state, cfg)
    if loader is not None:
        loader.stop()
    print(f"done at step {step}")


if __name__ == "__main__":
    main()
