import dataclasses

import pytest

from dtt.core.config import Config, load_config


def test_defaults_hashable():
    cfg = Config()
    hash(cfg)  # frozen dataclasses are jit-static-safe
    assert cfg.model.num_classes == 31
    assert cfg.model.roi.ps_grid == 7
    assert cfg.model.track.num_corr_channels == 81
    assert cfg.model.anchors.num_anchors == 12


def test_overrides():
    cfg = load_config(overrides=["model.roi.ps_grid=3", "train.learning_rate=0.01",
                                 "model.anchors.scales=[8,16,32]"])
    assert cfg.model.roi.ps_grid == 3
    assert cfg.train.learning_rate == 0.01
    assert cfg.model.anchors.scales == (8, 16, 32)
    assert cfg.model.anchors.num_anchors == 9


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        load_config(overrides=["model.bogus=1"])


def test_yaml_roundtrip(tmp_path):
    from dtt.core.config import save_config
    cfg = Config().replace(exp_name="x")
    p = tmp_path / "c.yml"
    save_config(cfg, str(p))
    cfg2 = load_config(str(p))
    assert dataclasses.asdict(cfg2) == dataclasses.asdict(cfg)
