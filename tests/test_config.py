import pytest

from hvt import config as C


def test_defaults_match_reference_schema():
    cfg = C.loads()
    # Reference configs.py defaults.
    assert cfg.model.name == "resnet50"
    assert cfg.model.variant == "full-tuning"
    assert cfg.train_dataset.crop_size == 224
    assert cfg.train_dataset.global_batch_size == 2048
    assert cfg.optim.name == "DecoupledSGDW"
    assert cfg.optim.lr == pytest.approx(2.048)
    assert cfg.scheduler.args == {"t_warmup": "8ep", "alpha_f": 0.0}
    assert cfg.max_duration == "90ep"
    assert cfg.grad_accum == "auto"
    assert cfg.hierarchy.variant == ""


def test_layered_merge_right_wins():
    cfg = C.loads(
        {"optim": {"lr": 2.0, "momentum": 0.9}, "run_name": "a"},
        {"optim": {"lr": 0.5}},
    )
    assert cfg.optim.lr == 0.5
    assert cfg.optim.momentum == 0.9
    assert cfg.run_name == "a"
    # untouched defaults survive
    assert cfg.optim.weight_decay == pytest.approx(5e-4)


def test_lists_replace_not_concat():
    cfg = C.loads(
        {"algorithms": [{"cls": "BlurPool"}, {"cls": "EMA"}]},
        {"algorithms": [{"cls": "GradientClipping", "args": {"clipping_threshold": 2.0}}]},
    )
    assert len(cfg.algorithms) == 1
    assert cfg.algorithms[0].cls == "GradientClipping"
    assert cfg.algorithms[0].args == {"clipping_threshold": 2.0}


def test_unknown_key_rejected():
    with pytest.raises(C.ConfigError, match="unknown key"):
        C.loads({"optim": {"learning_rate": 0.1}})


def test_type_coercion_int_to_float_and_tuple():
    cfg = C.loads({"optim": {"lr": 2}, "train_dataset": {"channel_mean": [0.1, 0.2, 0.3]}})
    assert isinstance(cfg.optim.lr, float)
    assert cfg.train_dataset.channel_mean == (0.1, 0.2, 0.3)


def test_interpolation():
    cfg = C.loads(
        {
            "machine": {"save_root": "/tmp/save"},
            "model": {"pretrained_checkpoint": "/ckpts/r50.ckpt"},
            "algorithms": [
                {
                    "cls": "PretrainedBackbone",
                    "args": {
                        "checkpoint": "${model.pretrained_checkpoint}",
                        "local_cache": "${machine.save_root}",
                        "strict": False,
                    },
                }
            ],
        }
    )
    assert cfg.algorithms[0].args["checkpoint"] == "/ckpts/r50.ckpt"
    assert cfg.algorithms[0].args["local_cache"] == "/tmp/save"


def test_override_sentinel_detected():
    cfg = C.loads({"model": {"pretrained_checkpoint": "OVERRIDE"}})
    with pytest.raises(C.ConfigError, match="OVERRIDE"):
        C.assert_no_override(cfg)
    cfg2 = C.loads({"model": {"pretrained_checkpoint": "/real/path"}})
    C.assert_no_override(cfg2)


def test_yaml_roundtrip(tmp_path):
    f = tmp_path / "exp.yaml"
    f.write_text("optim:\n  lr: 0.25\nrun_name: yam\n")
    cfg = C.load(machine=None, exps=[str(f)])
    assert cfg.optim.lr == 0.25
    assert cfg.run_name == "yam"
    # to_yaml emits something loadable
    import yaml

    assert yaml.safe_load(C.to_yaml(cfg))["optim"]["lr"] == 0.25


def test_reference_yaml_layers_load():
    """The reference's own config composition should merge cleanly."""
    import pathlib

    ref = pathlib.Path("/root/reference/configs")
    if not ref.exists():
        pytest.skip("reference configs not mounted")
    cfg = C.load(
        machine=str(ref / "machines" / "strawberry0.yaml"),
        exps=[
            str(ref / "pretrain" / "inat21.yaml"),
            str(ref / "pretrain" / "inat21_rand_species.yaml"),
            str(ref / "pretrain" / "r50_multitask_base.yaml"),
        ],
    )
    assert cfg.hierarchy.variant == "multitask"
    assert cfg.hierarchy.multitask_coeffs == [8, 5.65, 4, 2.82, 2, 1.41, 1]
    assert cfg.max_duration == "36ep"
    assert cfg.train_dataset.path == "rand-species-pretrain"
    assert cfg.train_dataset.channel_mean == (0.4638, 0.4806, 0.3765)
    assert "rand-species-pretrain" in cfg.machine.datasets
    assert len(cfg.algorithms) == 6
