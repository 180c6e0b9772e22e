"""Config system tests: CfgNode semantics + reference YAML compatibility."""

import pytest

from nerfmeshes_tpu.config import (
    CfgNode,
    flatten_dict,
    get_default_cfg,
    load_config,
    nest_dict,
)

REF_CONFIGS = "/root/reference/config"


def test_attribute_access_and_nesting():
    cfg = CfgNode({"a": {"b": {"c": 3}}, "d": "x"})
    assert cfg.a.b.c == 3
    assert cfg.d == "x"
    cfg.a.b.c = 5
    assert cfg["a"]["b"]["c"] == 5


def test_freeze_defrost():
    cfg = CfgNode({"a": {"b": 1}})
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.a.b = 2
    cfg.defrost()
    cfg.a.b = 2
    assert cfg.a.b == 2


def test_merge_type_coercion():
    cfg = CfgNode({"lr": 0.1, "steps": 10, "flag": False})
    cfg.merge_from_other_cfg(CfgNode({"lr": 1, "steps": 20.0, "flag": True}))
    assert isinstance(cfg.lr, float) and cfg.lr == 1.0
    assert isinstance(cfg.steps, int) and cfg.steps == 20


def test_merge_unknown_key_raises():
    cfg = CfgNode({"a": 1})
    with pytest.raises(KeyError):
        cfg.merge_from_other_cfg(CfgNode({"b": 2}))


def test_merge_from_list():
    cfg = CfgNode({"optim": {"lr": 0.1}, "name": "x"})
    cfg.merge_from_list(["optim.lr", "0.5", "name", "y"])
    assert cfg.optim.lr == 0.5
    assert cfg.name == "y"


def test_renamed_and_deprecated_keys():
    cfg = CfgNode({"new_key": 1})
    cfg.register_deprecated_key("old_gone")
    cfg.register_renamed_key("old_key", "new_key")
    cfg.merge_from_list(["old_gone", "5"])  # silently skipped
    assert cfg.new_key == 1
    with pytest.raises(KeyError):
        cfg.merge_from_list(["old_key", "5"])


def test_yaml_roundtrip(tmp_path):
    cfg = CfgNode({"a": {"b": 1.5}, "c": [1, 2, 3]})
    p = tmp_path / "cfg.yml"
    cfg.save(str(p))
    loaded = CfgNode.load_yaml(str(p))
    assert loaded.to_dict() == cfg.to_dict()


def test_flatten_nest_roundtrip():
    d = {"a": {"b": {"c": 1}, "d": 2}, "e": "x"}
    flat = flatten_dict(d)
    assert flat == {"a.b.c": 1, "a.d": 2, "e": "x"}
    assert nest_dict(flat) == d


@pytest.mark.parametrize(
    "name",
    [
        "nerf-synthetic-lego.yml",
        "nerf-synthetic-materials.yml",
        "nerf-synthetic-mic.yml",
        "nerf-colmap-fern.yml",
        "buff-synthetic-lego.yml",
        "buff-colmap-fern.yml",
    ],
)
def test_reference_configs_merge_clean(name):
    """Every shipped reference experiment YAML must merge onto our schema."""
    cfg = load_config(f"{REF_CONFIGS}/{name}")
    assert cfg.experiment.model in ("NeRFModel", "BuFFModel")
    assert cfg.nerf.train.num_coarse > 0
    assert cfg.models.coarse.hidden_size > 0
    if name.startswith("buff"):
        assert cfg.tree.max_voxel_count > 0


def test_default_cfg_complete():
    cfg = get_default_cfg()
    # Spot-check the schema keys the training system depends on.
    assert cfg.nerf.train.num_random_rays == 2048
    assert cfg.scheduler.options.gamma == 0.1
    assert cfg.models.use_fine is True
    assert cfg.dataset.caching.sample_all is True
