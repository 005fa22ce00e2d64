"""Dataset registry.

Equivalent of the reference's imdb base + factory
(ref: lib/datasets/imdb.py, lib/datasets/factory.py): names map to dataset
builders; `combined_roidb`-style concatenation is a list merge of roidb
entries.
"""

from __future__ import annotations

from typing import Callable, Dict, List

_REGISTRY: Dict[str, Callable] = {}


def register_dataset(name: str):
    def deco(fn):
        if name in _REGISTRY:
            raise KeyError(f"dataset {name!r} already registered")
        _REGISTRY[name] = fn
        return fn
    return deco


def get_dataset(name: str, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def list_datasets() -> List[str]:
    return sorted(_REGISTRY)


def combined_roidb(names, **kwargs) -> list:
    """Concatenate the roidbs of '+'-joined dataset names
    (ref: combined_roidb('imagenet_vid_train+imagenet_det_train')).

    Every entry is tagged with its source dataset name so the loader can
    rebalance the mixture (input.det_fraction): DET-train is ~10x larger
    than VID-train's pair set, so naive concatenation would make training
    mostly identity pairs — the D&T recipe balances the two sources
    (paper §3.4)."""
    roidb = []
    for name in names.split("+"):
        name = name.strip()
        ds = get_dataset(name, **kwargs)
        entries = ds.roidb()
        for e in entries:
            e["source"] = name
        roidb.extend(entries)
    return roidb
