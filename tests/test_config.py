from openglue_tpu.core.config import Config, load_config, merge_configs, save_config


def test_attribute_and_key_access():
    cfg = Config({"train": {"lr": 1e-4, "sched": {"gamma": 0.9}}})
    assert cfg.train.lr == 1e-4
    assert cfg["train"]["sched"]["gamma"] == 0.9
    cfg.train.lr = 2e-4
    assert cfg["train"]["lr"] == 2e-4


def test_dotted_get():
    cfg = Config({"a": {"b": {"c": 3}}})
    assert cfg.get("a.b.c") == 3
    assert cfg.get("a.b.missing", 7) == 7
    assert cfg.get("missing") is None


def test_deep_merge_overrides_scalars_merges_dicts():
    base = Config({"train": {"lr": 1e-4, "epochs": 100}, "gpus": [0, 1]})
    override = Config({"train": {"lr": 5e-5}, "gpus": [2]})
    merged = merge_configs(base, override)
    assert merged.train.lr == 5e-5
    assert merged.train.epochs == 100
    assert merged.gpus == [2]
    # base untouched
    assert base.train.lr == 1e-4


def test_yaml_roundtrip(tmp_path):
    cfg = Config({"superglue": {"otp": {"num_iters": 20, "reg": 1.0}}})
    path = tmp_path / "cfg.yaml"
    save_config(cfg, path)
    loaded = load_config(path)
    assert loaded.to_dict() == cfg.to_dict()
