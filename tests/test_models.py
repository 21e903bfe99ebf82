import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvt import config as C
from hvt.models import build_model
from hvt.models import resnet as R


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def r50_vars():
    model = R.resnet50(1000, dtype=jnp.float32)
    return model, model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=True)


def test_resnet50_param_count_matches_torch(r50_vars):
    # torchvision resnet50 (1000 classes) has exactly 25,557,032 trainable params.
    _, variables = r50_vars
    assert _count(variables["params"]) == 25_557_032


def test_resnet50_forward_shapes(r50_vars):
    model, variables = r50_vars
    x = jnp.zeros((2, 64, 64, 3))
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 1000)
    assert logits.dtype == jnp.float32
    feats = model.apply(variables, x, train=False, features_only=True)
    assert feats.shape == (2, 2048)


def test_resnet50_batchstats_update(r50_vars):
    model, variables = r50_vars
    x = jnp.ones((2, 64, 64, 3))
    _, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
    leaves_before = jax.tree.leaves(variables["batch_stats"])
    leaves_after = jax.tree.leaves(mut["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_before, leaves_after)
    )


def test_multitask_head_returns_list():
    model = R.resnet_micro((2, 3, 5))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=True)
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False)
    assert isinstance(out, list) and len(out) == 3
    assert [o.shape[-1] for o in out] == [2, 3, 5]


def test_blurpool_same_output_shape():
    a = R.resnet_micro(10)
    b = R.resnet_micro(10, blurpool=True)
    va = a.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=True)
    vb = b.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=True)
    x = jnp.zeros((2, 32, 32, 3))
    assert a.apply(va, x, train=False).shape == b.apply(vb, x, train=False).shape
    # blurpool adds no parameters (fixed binomial filter)
    assert _count(va["params"]) == _count(vb["params"])


def test_bn_scale_init_reference_quirk():
    """Reference models.py:211-213 initializes BN scale ~ U(0,1)."""
    model = R.resnet_micro(10, bn_scale_init="uniform01")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=True)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    scales = [
        np.asarray(leaf)
        for path, leaf in flat
        if str(path[-1]) == ".scale" or getattr(path[-1], "key", "") == "scale"
    ]
    assert scales, "no BN scale leaves found"
    allvals = np.concatenate([s.ravel() for s in scales])
    assert allvals.min() >= 0.0 and allvals.max() <= 1.0
    assert allvals.std() > 0.05  # not constant ones


def test_factory_variants_and_errors():
    cfg = C.loads({"model": {"name": "resnet_micro"}})
    m = build_model(cfg, 10)
    assert isinstance(m, R.BasicResNet)

    bad = C.loads({"model": {"name": "resnet_micro", "variant": "linear-probing"}})
    with pytest.raises(ValueError, match="variant"):
        build_model(bad, 10)

    with pytest.raises(ValueError, match="multitask"):
        build_model(C.loads({"model": {"name": "resnet_micro"}}), (2, 3))

    cfg_mt = C.loads(
        {"model": {"name": "resnet_micro"}, "hierarchy": {"variant": "multitask"}}
    )
    m2 = build_model(cfg_mt, (2, 3))
    assert m2.num_classes == (2, 3)


def test_factory_open_name_escape_hatch():
    """'module:symbol' resolves a builder by import — the analog of the
    reference accepting any timm string (reference models.py:16-25)."""
    cfg = C.loads({"model": {"name": "hvt.models.resnet:resnet_micro"}})
    m = build_model(cfg, 10)
    assert isinstance(m, R.BasicResNet)
    assert m.num_classes == 10

    with pytest.raises(ValueError, match="cannot import"):
        build_model(C.loads({"model": {"name": "no.such.module:thing"}}), 10)
    with pytest.raises(ValueError, match="not a callable"):
        build_model(
            C.loads({"model": {"name": "hvt.models.resnet:BN_SCALE_INITS"}}), 10
        )
    with pytest.raises(ValueError, match="unknown model"):
        build_model(C.loads({"model": {"name": "resnet_nano"}}), 10)


def test_factory_blurpool_from_algorithms():
    cfg = C.loads(
        {"model": {"name": "resnet_micro"}, "algorithms": [{"cls": "BlurPool"}]}
    )
    assert build_model(cfg, 10).blurpool


def test_space_to_depth_stem_equivalent():
    """stem_s2d computes the identical function with the identical kernel."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    plain = R.ConvBN(8, 7, stride=2, dtype=jnp.float32,
                     bn_scale_init=R.BN_SCALE_INITS["ones"])
    s2d = R.SpaceToDepthStem(8, dtype=jnp.float32,
                             bn_scale_init=R.BN_SCALE_INITS["ones"])
    vp = plain.init(jax.random.key(0), x, True)
    vs = {
        "params": {"kernel": vp["params"]["Conv_0"]["kernel"],
                    "BatchNorm_0": vp["params"]["BatchNorm_0"]},
        "batch_stats": {"BatchNorm_0": vp["batch_stats"]["BatchNorm_0"]},
    }
    np.testing.assert_allclose(
        np.asarray(plain.apply(vp, x, False)),
        np.asarray(s2d.apply(vs, x, False)),
        atol=1e-5,
    )
    # full model with the flag runs and keeps shapes
    model = R.resnet50(10, stem_s2d=True, dtype=jnp.float32)
    v = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    assert model.apply(v, jnp.zeros((2, 64, 64, 3)), train=False).shape == (2, 10)


def test_grouped_batch_norm_semantics():
    """bn_groups emulates the reference's per-GPU DDP BatchNorm: per-group
    training stats, pooled running moments, nn.BatchNorm-identical tree."""
    import flax.linen as nn

    from hvt.models.common import GroupedBatchNorm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(8, 4, 4, 5)).astype(np.float32))

    # groups=1 == nn.BatchNorm (training path)
    g1 = GroupedBatchNorm(groups=1, use_running_average=False, dtype=jnp.float32)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.float32)
    v1 = g1.init(jax.random.key(0), x)
    vr = ref.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(vr)
    y1, s1 = g1.apply(v1, x, mutable=["batch_stats"])
    yr, sr = ref.apply(vr, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(yr), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1["batch_stats"]["mean"]),
        np.asarray(sr["batch_stats"]["mean"]), atol=1e-6,
    )

    # groups=4: each group normalized by its own stats
    g4 = GroupedBatchNorm(groups=4, use_running_average=False, dtype=jnp.float32)
    y4, s4 = g4.apply(v1, x, mutable=["batch_stats"])
    xg = np.asarray(x).reshape(4, 2, 4, 4, 5)
    for gi in range(4):
        mu = xg[gi].mean(axis=(0, 1, 2))
        var = xg[gi].var(axis=(0, 1, 2))
        want = (xg[gi] - mu) / np.sqrt(var + 1e-5)
        got = np.asarray(y4).reshape(4, 2, 4, 4, 5)[gi]
        np.testing.assert_allclose(got, want, atol=1e-4)
    # pooled running moments equal the global-batch update
    np.testing.assert_allclose(
        np.asarray(s4["batch_stats"]["mean"]),
        np.asarray(sr["batch_stats"]["mean"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s4["batch_stats"]["var"]),
        np.asarray(sr["batch_stats"]["var"]), rtol=1e-3,
    )

    # eval path ignores groups entirely
    e1 = GroupedBatchNorm(groups=1, use_running_average=True,
                          dtype=jnp.float32).apply(v1, x)
    e4 = GroupedBatchNorm(groups=4, use_running_average=True,
                          dtype=jnp.float32).apply(v1, x)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e4))


def test_resnet_bn_groups_checkpoint_compatible():
    from hvt.models import resnet as R

    m1 = R.resnet_micro(4, dtype=jnp.float32, bn_scale_init="ones")
    m4 = R.resnet_micro(4, dtype=jnp.float32, bn_scale_init="ones", bn_groups=4)
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    v1 = m1.init(jax.random.key(0), x, train=False)
    v4 = m4.init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v4)
    # same variables, eval mode: identical output (running-stats path)
    np.testing.assert_allclose(
        np.asarray(m1.apply(v1, x, train=False)),
        np.asarray(m4.apply(v1, x, train=False)),
    )


def test_registry_wider_families():
    """resnet34/101/152 and swinv2_large construct with the right geometry."""
    from hvt import config as C
    from hvt.models import build_model, factory

    for name, feats in [("resnet34", 512), ("resnet101", 2048),
                        ("resnet152", 2048), ("swinv2_large", 1536)]:
        cfg = C.loads({"model": {"name": name}})
        m = build_model(cfg, 10)
        assert m.num_features == feats, name
    assert factory._registry()["resnet101"](10).stage_sizes == (3, 4, 23, 3)
    assert factory._registry()["resnet152"](10).stage_sizes == (3, 8, 36, 3)


def test_swin_variants_trace_at_native_resolutions():
    """Every Swin registry entry traces (init + train grad) at its native
    image size with the Pallas dispatch forced on — catches window/grid
    divisibility and kernel BlockSpec shape breaks without TPU hardware.
    Non-divisible combinations raise a clear error, not a reshape failure."""
    import jax.numpy as jnp

    from hvt.models import swinv2
    from hvt.ops import window_attention as wa_mod

    orig = wa_mod._pallas_available
    wa_mod._pallas_available = lambda: True
    try:
        for name, img in [
            ("swinv2_tiny", 224),
            ("swinv2_small", 224),
            ("swinv2_base", 224),
            ("swinv2_large", 224),
            ("swinv2_large_window12_192", 192),
            ("swinv2_tiny_window8_256", 256),
        ]:
            model = getattr(swinv2, name)(10)
            x = jnp.zeros((2, img, img, 3), jnp.bfloat16)
            v = jax.eval_shape(
                lambda m=model, x=x: m.init(jax.random.key(0), x, train=False)
            )

            def loss(p, x, m=model):
                out = m.apply({"params": p}, x, train=True,
                              rngs={"dropout": jax.random.key(1)})
                return jnp.sum(out.astype(jnp.float32) ** 2)

            jax.eval_shape(jax.grad(loss), v["params"], x)

        with pytest.raises(ValueError, match="not divisible by window_size"):
            model = swinv2.swinv2_large(10)  # window 7 at 192: 48 % 7 != 0
            x = jnp.zeros((2, 192, 192, 3), jnp.bfloat16)
            jax.eval_shape(lambda: model.init(jax.random.key(0), x, train=False))
    finally:
        wa_mod._pallas_available = orig


def test_resnet_torch_state_dict_roundtrip(tmp_path):
    """hvt ResNet variables → timm-named torch state dict → back: exact
    inverse, both block families, running stats included."""
    import jax

    from hvt.models import torch_compat as TC

    for name in ("resnet_micro_bottleneck", "resnet_micro"):
        model = build_model(C.loads({"model": {"name": name}}), 6)
        v = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)), train=False)
        params = jax.device_get(v["params"])
        stats = jax.device_get(v["batch_stats"])

        sd = TC.export_resnet_state_dict(params, stats)
        # timm naming conventions present
        assert "conv1.weight" in sd and "bn1.running_mean" in sd
        assert "fc.weight" in sd
        assert any(k.startswith("layer1.0.conv1") for k in sd)
        assert any("downsample.0.weight" in k for k in sd)

        p2, s2 = TC.convert_resnet_state_dict(sd)

        def flat(tree, prefix=""):
            out = {}
            for k, val in tree.items():
                if isinstance(val, dict):
                    out.update(flat(val, f"{prefix}{k}/"))
                else:
                    out[f"{prefix}{k}"] = np.asarray(val)
            return out

        fa, fb = flat(params), flat(p2)
        assert set(fa) == set(fb), name
        for k in fa:
            np.testing.assert_array_equal(fa[k], fb[k], err_msg=f"{name}:{k}")
        sa, sb = flat(stats), flat(s2)
        assert set(sa) == set(sb)
        for k in sa:
            np.testing.assert_array_equal(sa[k], sb[k], err_msg=f"{name}:{k}")


def test_resnet_torch_pt_loads_via_torch_uri(tmp_path):
    """save_resnet_checkpoint output loads back through the family-detecting
    torch:// loader and through load_pretrained's merge (stats included)."""
    import jax

    from hvt.models import torch_compat as TC
    from hvt.train import checkpoint as ckpt_lib

    model = build_model(C.loads({"model": {"name": "resnet_micro"}}), 6)
    v = model.init(jax.random.key(1), jnp.zeros((2, 32, 32, 3)), train=False)
    params = jax.device_get(v["params"])
    # make the stats distinguishable from a fresh init
    stats = jax.tree.map(lambda a: np.asarray(a) + 0.25,
                         jax.device_get(v["batch_stats"]))

    path = tmp_path / "r.pt"
    TC.save_resnet_checkpoint(params, stats, str(path))
    p2, s2 = TC.load_torch_variables(f"torch://{path}")
    np.testing.assert_allclose(
        np.asarray(s2["stem"]["BatchNorm_0"]["mean"]),
        np.asarray(stats["stem"]["BatchNorm_0"]["mean"]), rtol=1e-6,
    )

    # full pretrained merge: fresh variables pick up weights AND stats;
    # the head stays local (shape may differ downstream).
    fresh = model.init(jax.random.key(2), jnp.zeros((2, 32, 32, 3)), train=False)
    merged_p, merged_s = ckpt_lib.load_pretrained(
        f"torch://{path}",
        jax.device_get(fresh["params"]),
        jax.device_get(fresh["batch_stats"]),
    )
    np.testing.assert_allclose(
        np.asarray(merged_p["stem"]["Conv_0"]["kernel"]),
        np.asarray(params["stem"]["Conv_0"]["kernel"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(merged_s["stage1_block0"]["conv1"]["BatchNorm_0"]["var"]),
        np.asarray(stats["stage1_block0"]["conv1"]["BatchNorm_0"]["var"]),
        rtol=1e-6,
    )
    # head untouched (fresh)
    np.testing.assert_array_equal(
        np.asarray(merged_p["head"]["kernel"]),
        np.asarray(jax.device_get(fresh["params"]["head"]["kernel"])),
    )


def test_resnet_s2d_stem_conversion():
    """stem_s2d models use the flat stem/kernel path; conversion handles it
    in both directions with the identical (7,7,3,w) kernel."""
    import jax

    from hvt.models import torch_compat as TC

    model = build_model(
        C.loads({"model": {"name": "resnet_micro_bottleneck",
                           "args": {"stem_s2d": True}}}), 4
    )
    v = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)), train=False)
    params = jax.device_get(v["params"])
    stats = jax.device_get(v["batch_stats"])
    assert "kernel" in params["stem"]  # flat s2d param path

    sd = TC.export_resnet_state_dict(params, stats)
    assert sd["conv1.weight"].shape == (8, 3, 7, 7)
    p2, _ = TC.convert_resnet_state_dict(sd, stem_s2d=True)
    np.testing.assert_array_equal(
        np.asarray(params["stem"]["kernel"]), p2["stem"]["kernel"]
    )


def test_resnet_multitask_head_torch_roundtrip():
    """Multitask (tuple num_classes) heads export as fc.heads.{t} — the
    reference's surgery naming (reference hierarchy.py:50-62) — and convert
    back exactly."""
    import jax

    from hvt.models import torch_compat as TC

    cfg = C.loads({"model": {"name": "resnet_micro"},
                   "hierarchy": {"variant": "multitask"}})
    model = build_model(cfg, (2, 3, 5))
    v = model.init(jax.random.key(0), jnp.zeros((2, 32, 32, 3)), train=False)
    params = jax.device_get(v["params"])
    stats = jax.device_get(v["batch_stats"])

    sd = TC.export_resnet_state_dict(params, stats)
    assert "fc.heads.0.weight" in sd and "fc.heads.2.bias" in sd
    assert "fc.weight" not in sd
    p2, _ = TC.convert_resnet_state_dict(sd)
    np.testing.assert_array_equal(
        np.asarray(params["head"]["tier1"]["kernel"]),
        p2["head"]["tier1"]["kernel"],
    )
