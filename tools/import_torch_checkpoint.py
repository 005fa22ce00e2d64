#!/usr/bin/env python
"""Convert a reference PyTorch D&T checkpoint into a dtt run directory.

One-command cross-framework parity entry point: the day a real reference
checkpoint (ref: trainval_net.py torch.save) is available, run

  python tools/import_torch_checkpoint.py --pth dnt.pth --out runs/imported
  python eval.py --checkpoint runs/imported --dataset imagenet_vid_val \
      --data-root /data/ILSVRC2015 --link

and the resulting mAP is directly comparable to the reference's. The name
map lives in dtt.utils.torch_import.NAME_CANDIDATES; `--backbone-only`
falls back to importing just the ResNet trunk (e.g. for a torchvision
resnet101.pth).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pth", required=True, help="reference .pth checkpoint")
    p.add_argument("--out", required=True, help="dtt run dir to create")
    p.add_argument("--config", default=None, help="dtt YAML config")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VAL")
    p.add_argument("--backbone-only", action="store_true")
    p.add_argument("--non-strict", action="store_true",
                   help="ignore unmatched reference keys")
    args = p.parse_args()

    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from dtt.core.config import load_config, save_config
    from dtt.train.checkpoint import save_checkpoint
    from dtt.train.trainer import create_train_state
    from dtt.utils.torch_import import (import_full_checkpoint,
                                        import_resnet_backbone, load_pth)

    cfg = load_config(args.config, args.set)
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    sample = jnp.zeros((1, 2, h, w, 3), jnp.float32)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), sample)

    sd = load_pth(args.pth)
    if args.backbone_only:
        params = import_resnet_backbone(sd, state.params,
                                        strict=not args.non_strict)
    else:
        params = import_full_checkpoint(sd, state.params, cfg.model,
                                        strict=not args.non_strict)
    state = state._replace(params=params)

    os.makedirs(args.out, exist_ok=True)
    save_config(cfg, os.path.join(args.out, "config.yml"))
    path = save_checkpoint(args.out, state, cfg)
    print(f"imported {args.pth} -> {path}")


if __name__ == "__main__":
    main()
