"""Config serialization / overrides (SURVEY.md C15).

Regression: PEP 563 string annotations made from_dict skip nested dataclass
reconstruction (caught by the CLI verify drive)."""

import pytest

from tpuseg.core import Config, ModelConfig, TrainConfig


def test_json_roundtrip_reconstructs_nested_dataclasses():
    cfg = Config()
    back = Config.from_json(cfg.to_json())
    assert isinstance(back.train, TrainConfig)
    assert isinstance(back.model, ModelConfig)
    assert back == cfg


def test_tuples_survive_roundtrip():
    back = Config.from_json(Config().to_json())
    assert back.model.features == Config().model.features
    assert isinstance(back.model.features, tuple)
    assert isinstance(back.data.patch_size, tuple)


def test_dotted_override():
    cfg = Config().override(**{"train.lr": 9e-4, "model.features": [8, 16],
                               "postproc.method": "flood"})
    assert cfg.train.lr == 9e-4
    assert cfg.model.features == (8, 16)
    assert cfg.postproc.method == "flood"
    assert isinstance(cfg.train, TrainConfig)  # nested types preserved


def test_unknown_override_key_raises():
    with pytest.raises(KeyError):
        Config().override(**{"train.does_not_exist": 1})
