"""ConvNeXt family tests: flax implementation vs the HF transformers oracle.

The reference resolves ConvNeXt names through timm (reference
models.py:16-25); hvt.models.convnext is a native flax implementation.
`transformers`' ConvNextForImageClassification (torch, CPU,
config-instantiated — no network) is an independent implementation of the
same architecture, used as the numerical oracle: same weights ⇒ same logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hvt import config as C
from hvt.models import build_model
from hvt.models import convnext as X
from hvt.models import torch_compat

transformers = pytest.importorskip("transformers")

DEPTHS = (1, 1, 2, 1)
DIMS = (16, 32, 64, 128)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    cfg = transformers.ConvNextConfig(
        num_channels=3,
        hidden_sizes=list(DIMS),
        depths=list(DEPTHS),
        num_labels=7,
        image_size=32,
    )
    tm = transformers.ConvNextForImageClassification(cfg).eval()
    fm = X.ConvNeXt(num_classes=7, depths=DEPTHS, dims=DIMS, dtype=jnp.float32)
    params = torch_compat.convert_convnext_state_dict(tm.state_dict())
    return tm, fm, params


def test_logits_match_hf_oracle(pair):
    tm, fm, params = pair
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).logits.numpy()
    out = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_features_are_pooled_prelogits(pair):
    tm, fm, params = pair
    x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    feats = np.asarray(
        fm.apply({"params": params}, jnp.asarray(x), features_only=True)
    )
    assert feats.shape == (2, DIMS[-1]) and feats.dtype == np.float32
    with torch.no_grad():
        ref = tm.convnext(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(feats, ref.pooler_output.numpy(), atol=2e-5)


def test_timm_layout_converts_to_same_tree(pair):
    """timm key names (stem.{0,1}, stages.{s}.blocks.{i}.conv_dw/.mlp.fc*/
    .gamma, head.norm/head.fc) convert to the same tree as the HF layout."""
    tm, _, params_hf = pair
    sd = {k: v for k, v in tm.state_dict().items()}
    timm_sd = {
        "stem.0.weight": sd["convnext.embeddings.patch_embeddings.weight"],
        "stem.0.bias": sd["convnext.embeddings.patch_embeddings.bias"],
        "stem.1.weight": sd["convnext.embeddings.layernorm.weight"],
        "stem.1.bias": sd["convnext.embeddings.layernorm.bias"],
        "head.norm.weight": sd["convnext.layernorm.weight"],
        "head.norm.bias": sd["convnext.layernorm.bias"],
        "head.fc.weight": sd["classifier.weight"],
        "head.fc.bias": sd["classifier.bias"],
    }
    for s, depth in enumerate(DEPTHS):
        hp = f"convnext.encoder.stages.{s}"
        if s > 0:
            for j, part in ((0, "downsampling_layer.0"), (1, "downsampling_layer.1")):
                timm_sd[f"stages.{s}.downsample.{j}.weight"] = sd[f"{hp}.{part}.weight"]
                timm_sd[f"stages.{s}.downsample.{j}.bias"] = sd[f"{hp}.{part}.bias"]
        for i in range(depth):
            p, q = f"stages.{s}.blocks.{i}", f"{hp}.layers.{i}"
            timm_sd[f"{p}.conv_dw.weight"] = sd[f"{q}.dwconv.weight"]
            timm_sd[f"{p}.conv_dw.bias"] = sd[f"{q}.dwconv.bias"]
            timm_sd[f"{p}.norm.weight"] = sd[f"{q}.layernorm.weight"]
            timm_sd[f"{p}.norm.bias"] = sd[f"{q}.layernorm.bias"]
            timm_sd[f"{p}.mlp.fc1.weight"] = sd[f"{q}.pwconv1.weight"]
            timm_sd[f"{p}.mlp.fc1.bias"] = sd[f"{q}.pwconv1.bias"]
            timm_sd[f"{p}.mlp.fc2.weight"] = sd[f"{q}.pwconv2.weight"]
            timm_sd[f"{p}.mlp.fc2.bias"] = sd[f"{q}.pwconv2.bias"]
            timm_sd[f"{p}.gamma"] = sd[f"{q}.layer_scale_parameter"]

    params_timm = torch_compat.convert_convnext_state_dict(timm_sd)
    flat_timm = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree.leaves_with_path(params_timm)
    }
    flat_hf = jax.tree.leaves_with_path(params_hf)
    assert len(flat_hf) == len(flat_timm)
    for path, leaf in flat_hf:
        np.testing.assert_array_equal(leaf, flat_timm[jax.tree_util.keystr(path)])


def test_multitask_head_returns_list():
    model = X.convnext_micro((2, 3, 5), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)))
    assert isinstance(out, list) and [o.shape[-1] for o in out] == [2, 3, 5]


def test_train_mode_drop_path_and_grads_finite():
    model = X.convnext_micro(4, drop_path_rate=0.2, dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3)), train=True,
    )
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 32, 32, 3)), jnp.float32
    )
    y = jnp.array([0, 1, 2, 3])

    def loss_fn(params):
        logits = model.apply(
            {"params": params}, x, train=True,
            rngs={"dropout": jax.random.key(3)},
        )
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(4), y])

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))


def test_factory_and_tp_shardings():
    cfg = C.loads(
        {"model": {"name": "convnext_micro", "args": {"dtype": "float32"}}}
    )
    model = build_model(cfg, 6)
    assert isinstance(model, X.ConvNeXt)

    from hvt import parallel

    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    devices = jax.devices("cpu")[:4]
    mesh = jax.sharding.Mesh(
        np.array(devices).reshape(2, 2), (parallel.DATA_AXIS, parallel.MODEL_AXIS)
    )
    sh = parallel.tp_shardings(mesh, variables["params"])
    flat = {
        jax.tree_util.keystr(p): s for p, s in jax.tree.leaves_with_path(sh)
    }
    fc1 = [s for p, s in flat.items() if "fc1" in p and "kernel" in p]
    assert fc1 and all("model" in str(s.spec) for s in fc1)
    # Layer-scale gamma is 1-D → optimizer no-decay grouping exempts it.
    gammas = [p for p in flat if p.endswith("gamma']")]
    assert gammas


def test_trainer_fit_convnext_micro(tmp_path):
    """End-to-end: the Trainer's jitted step trains a ConvNeXt on the
    2-device CPU mesh (AdamW + label smoothing)."""
    from hvt import parallel
    from hvt.train.loop import Trainer

    cfg = C.loads({
        "run_name": "convnext_micro_smoke",
        "max_duration": "3ba",
        "seed": 0,
        "model": {"name": "convnext_micro",
                  "args": {"dtype": "float32", "drop_path_rate": 0.1}},
        "machine": {"save_root": str(tmp_path)},
        "train_dataset": {
            "source": "synthetic", "synthetic_num_classes": 4,
            "synthetic_num_samples": 24, "crop_size": 32,
            "global_batch_size": 8, "drop_last": True, "shuffle": True,
        },
        "eval_dataset": {
            "source": "synthetic", "synthetic_num_classes": 4,
            "synthetic_num_samples": 8, "crop_size": 32,
            "global_batch_size": 8,
        },
        "optim": {"name": "adamw", "lr": 1e-3, "weight_decay": 0.05},
        "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
        "algorithms": [{"cls": "LabelSmoothing", "args": {"smoothing": 0.1}}],
        "save": {"interval": None, "num_checkpoints_to_keep": 1, "wandb": False},
        "loader": {"num_workers": 1, "prefetch_batches": 1},
    })
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(2), log_interval=2)
    metrics = tr.fit()
    assert np.isfinite(metrics["cross-entropy"])
    assert int(tr.state.step) == 3
    tr.close()


def test_analytic_flops_convnext_tiny_magnitude():
    model = X.convnext_tiny(1000)
    flops = X.analytic_flops(model, 224)
    # ConvNeXt-T at 224² ≈ 4.5 GMACs (paper convention).
    assert 4e9 < flops < 5e9
