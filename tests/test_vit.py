"""ViT family tests: flax implementation vs the HF transformers torch oracle.

The reference resolves ViT names through timm (reference models.py:16-25);
hvt.models.vit is a native flax implementation. `transformers`'
ViTForImageClassification (torch, CPU, config-instantiated — no network) is
an independent implementation of the same architecture, used here as the
numerical oracle: same weights ⇒ same logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hvt import config as C
from hvt.models import build_model
from hvt.models import torch_compat
from hvt.models import vit as V

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    cfg = transformers.ViTConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=8,
        num_labels=7,
        layer_norm_eps=1e-6,
    )
    tm = transformers.ViTForImageClassification(cfg).eval()
    fm = V.VisionTransformer(
        num_classes=7, patch_size=8, embed_dim=64, depth=3, num_heads=4,
        mlp_ratio=2.0, dtype=jnp.float32,
    )
    params = torch_compat.convert_vit_state_dict(tm.state_dict())
    return tm, fm, params


def test_logits_match_hf_oracle(pair):
    tm, fm, params = pair
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).logits.numpy()
    out = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_features_are_prelogits_cls_token(pair):
    tm, fm, params = pair
    x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    feats = np.asarray(
        fm.apply({"params": params}, jnp.asarray(x), features_only=True)
    )
    assert feats.shape == (2, 64) and feats.dtype == np.float32
    with torch.no_grad():
        ref = tm.vit(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(feats, ref.last_hidden_state[:, 0].numpy(),
                               atol=2e-5)


def test_timm_layout_converts_to_same_tree(pair):
    """The timm key layout (fused qkv, blocks.{i}.*) converts to the exact
    same parameter tree as the HF layout of the same weights."""
    tm, _, params_hf = pair
    sd = {k: v for k, v in tm.state_dict().items()}
    timm_sd = {}
    for i in range(3):
        hp = f"vit.encoder.layer.{i}"
        timm_sd[f"blocks.{i}.norm1.weight"] = sd[f"{hp}.layernorm_before.weight"]
        timm_sd[f"blocks.{i}.norm1.bias"] = sd[f"{hp}.layernorm_before.bias"]
        timm_sd[f"blocks.{i}.norm2.weight"] = sd[f"{hp}.layernorm_after.weight"]
        timm_sd[f"blocks.{i}.norm2.bias"] = sd[f"{hp}.layernorm_after.bias"]
        timm_sd[f"blocks.{i}.attn.qkv.weight"] = torch.cat(
            [sd[f"{hp}.attention.attention.{n}.weight"]
             for n in ("query", "key", "value")], dim=0)
        timm_sd[f"blocks.{i}.attn.qkv.bias"] = torch.cat(
            [sd[f"{hp}.attention.attention.{n}.bias"]
             for n in ("query", "key", "value")], dim=0)
        timm_sd[f"blocks.{i}.attn.proj.weight"] = sd[
            f"{hp}.attention.output.dense.weight"]
        timm_sd[f"blocks.{i}.attn.proj.bias"] = sd[
            f"{hp}.attention.output.dense.bias"]
        timm_sd[f"blocks.{i}.mlp.fc1.weight"] = sd[f"{hp}.intermediate.dense.weight"]
        timm_sd[f"blocks.{i}.mlp.fc1.bias"] = sd[f"{hp}.intermediate.dense.bias"]
        timm_sd[f"blocks.{i}.mlp.fc2.weight"] = sd[f"{hp}.output.dense.weight"]
        timm_sd[f"blocks.{i}.mlp.fc2.bias"] = sd[f"{hp}.output.dense.bias"]
    timm_sd["cls_token"] = sd["vit.embeddings.cls_token"]
    timm_sd["pos_embed"] = sd["vit.embeddings.position_embeddings"]
    timm_sd["patch_embed.proj.weight"] = sd[
        "vit.embeddings.patch_embeddings.projection.weight"]
    timm_sd["patch_embed.proj.bias"] = sd[
        "vit.embeddings.patch_embeddings.projection.bias"]
    timm_sd["norm.weight"] = sd["vit.layernorm.weight"]
    timm_sd["norm.bias"] = sd["vit.layernorm.bias"]
    timm_sd["head.weight"] = sd["classifier.weight"]
    timm_sd["head.bias"] = sd["classifier.bias"]

    params_timm = torch_compat.convert_vit_state_dict(timm_sd)
    flat_hf = jax.tree.leaves_with_path(params_hf)
    flat_timm = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree.leaves_with_path(params_timm)
    )
    assert len(flat_hf) == len(flat_timm)
    for path, leaf in flat_hf:
        np.testing.assert_array_equal(leaf, flat_timm[jax.tree_util.keystr(path)])


def test_multitask_head_and_avg_pool():
    model = V.vit_micro((2, 3, 5), dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)))
    assert isinstance(out, list) and [o.shape[-1] for o in out] == [2, 3, 5]

    avg = V.vit_micro(4, pool="avg", dtype=jnp.float32)
    va = avg.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    assert avg.apply(va, jnp.zeros((2, 32, 32, 3))).shape == (2, 4)


def test_train_mode_drop_path_and_grads_finite():
    model = V.vit_micro(4, drop_path_rate=0.2, dtype=jnp.float32)
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
    cfg = C.loads({"model": {"name": "vit_micro", "args": {"dtype": "float32"}}})
    model = build_model(cfg, 6)
    assert isinstance(model, V.VisionTransformer)
    assert model.no_weight_decay_substrings == ("pos_embed", "cls_token")

    # The mlp/fc1|fc2 paths pick up Megatron TP over the model axis.
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


def test_trainer_fit_vit_micro(tmp_path):
    """End-to-end: the Trainer's jitted step trains a ViT on the 2-device
    CPU mesh (AdamW + label smoothing, the transformer recipe shape)."""
    from hvt import parallel
    from hvt.train.loop import Trainer

    cfg = C.loads({
        "run_name": "vit_micro_smoke",
        "max_duration": "3ba",
        "seed": 0,
        "model": {"name": "vit_micro",
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


def test_analytic_flops_vit_b16_magnitude():
    model = V.vit_base_patch16_224(1000)
    flops = V.analytic_flops(model, 224)
    # ViT-B/16 at 224² ≈ 17.6 GMACs (paper convention).
    assert 16e9 < flops < 19e9


def test_flash_wrapper_padding_matches_plain_path(monkeypatch):
    """_attend_flash pads 197 → 256 with segment-id walls and slices back;
    with the kernel itself replaced by a reference einsum that honours
    segment_ids, the flash-routed Attention must equal the plain path
    EXACTLY (same weights, f32). Pins the padding/mask/slice logic the
    chip-only Mosaic kernel rides on."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from hvt.models import vit as V

    def ref_flash(q, k, v, ab=None, segment_ids=None, *, causal=False,
                  sm_scale=1.0, block_sizes=None, debug=False):
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm_scale
        if segment_ids is not None:
            mask = segment_ids.q[:, None, :, None] == segment_ids.kv[
                :, None, None, :
            ]
            attn = jnp.where(mask, attn, -1e30)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            q.dtype
        )
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

    monkeypatch.setattr(fa, "flash_attention", ref_flash)

    mod_plain = V.Attention(dim=32, num_heads=2, dtype=jnp.float32,
                            use_flash=False)
    mod_flash = V.Attention(dim=32, num_heads=2, dtype=jnp.float32,
                            use_flash=True)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 197, 32)), jnp.float32
    )
    variables = mod_plain.init(jax.random.key(0), x)
    a = mod_plain.apply(variables, x)
    b = mod_flash.apply(variables, x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
