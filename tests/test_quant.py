"""int8 PTQ serving path (hvt/ops/quant.py + export_serving --quantize).

Contract under test: (a) the int8 graph computes exactly the math the
float fake-quant simulation describes, (b) quantized logits track full
precision closely on both model families, (c) the classifier head and
non-layer matmuls stay full precision, (d) the artifact path composes —
quantized exports are plain portable HLO with the manifest marking the
scheme, and (e) --native + --quantize is rejected up front.
"""

import json
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvt import config as C
from hvt.ops import quant
from hvt.tools import export_serving


def _cfg(tmp_path, extra=None):
    layers = [
        {
            "run_name": "quant-test",
            "seed": 0,
            "model": {"name": "resnet_micro", "args": {"dtype": "float32"}},
            "machine": {"save_root": str(tmp_path)},
            "precision": {"compute_dtype": "float32"},
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    ]
    if extra:
        layers.append(extra)
    return C.loads(*layers)


def _forward(cfg, num_classes=4):
    from hvt.data import DevicePrep
    from hvt.models import build_model

    prep = DevicePrep.from_config(cfg.eval_dataset, cfg.precision)
    model = build_model(cfg, num_classes)
    variables = model.init(
        jax.random.key(cfg.seed),
        prep.normalize(jnp.zeros((2, 32, 32, 3), jnp.uint8)),
        train=False,
    )

    def forward(images):
        return model.apply(variables, prep.normalize(images), train=False)

    return forward


def test_quantize_weight_roundtrip():
    """Per-output-channel symmetric absmax: int8 values, per-channel scale,
    dequantization error bounded by scale/2 elementwise."""
    w = jax.random.normal(jax.random.key(0), (3, 3, 8, 16)) * jnp.arange(
        1, 17
    )  # channels at very different magnitudes
    q, scale = quant.quantize_weight(w, reduce_axes=(0, 1, 2))
    assert q.dtype == jnp.int8 and scale.shape == (1, 1, 1, 16)
    deq = q.astype(jnp.float32) * scale
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(scale) / 2 + 1e-6).all()
    # absmax hits ±127 exactly in every channel
    assert (np.abs(np.asarray(q)).max(axis=(0, 1, 2)) == 127).all()

    xq, sx = quant.quantize_act(jnp.linspace(-3.0, 5.0, 64))
    assert xq.dtype == jnp.int8 and np.asarray(xq).max() == 127
    assert sx == pytest.approx(5.0 / 127.0)


def test_int8_graph_matches_float_simulation(tmp_path):
    """The int8 lowering is bit-equivalent to the float fake-quant oracle
    (int8 products summed over the micro model's fan-ins are exact in f32)."""
    fwd = _forward(_cfg(tmp_path))
    imgs = jax.random.randint(jax.random.key(1), (4, 32, 32, 3), 0, 256,
                              jnp.uint8)
    got = np.asarray(jax.jit(quant.wrap_int8(fwd))(imgs))
    oracle = np.asarray(jax.jit(quant.wrap_int8(fwd, simulate=True))(imgs))
    np.testing.assert_array_equal(got, oracle)


def test_int8_tracks_full_precision_and_spares_head(tmp_path):
    """Quantized logits stay close to fp (random-init micro net), and the
    lowered module shows int8 convs but a full-precision head dense."""
    fwd = _forward(_cfg(tmp_path))
    imgs = jax.random.randint(jax.random.key(2), (4, 32, 32, 3), 0, 256,
                              jnp.uint8)
    fp = np.asarray(fwd(imgs))
    q8 = np.asarray(jax.jit(quant.wrap_int8(fwd))(imgs))
    cos = (fp * q8).sum(1) / (
        np.linalg.norm(fp, axis=1) * np.linalg.norm(q8, axis=1)
    )
    assert (cos > 0.999).all()
    assert (fp.argmax(1) == q8.argmax(1)).all()

    mlir = jax.jit(quant.wrap_int8(fwd)).lower(imgs).as_text()
    conv_lines = [l for l in mlir.splitlines() if "stablehlo.convolution" in l]
    assert conv_lines and all("i8" in l for l in conv_lines)
    # resnet_micro's only Dense is the head — skipped by default, so no
    # int8 dot_general anywhere.
    dot_lines = [l for l in mlir.splitlines() if "stablehlo.dot_general" in l]
    assert dot_lines and not any(re.search(r"xi8>", l) for l in dot_lines)

    # ... and with the skip removed the head quantizes too.
    mlir_all = jax.jit(quant.wrap_int8(fwd, skip=())).lower(imgs).as_text()
    assert any(
        re.search(r"xi8>", l)
        for l in mlir_all.splitlines()
        if "stablehlo.dot_general" in l
    )


def test_int8_artifact_roundtrip(tmp_path):
    """--quantize int8 exports a symbolic-batch artifact that (a) stays
    Mosaic-free, (b) carries int8 tensors, (c) marks the manifest, and
    (d) reproduces the in-process quantized forward exactly."""
    cfg = _cfg(tmp_path)
    out = export_serving.export_artifact(
        cfg, tmp_path / "artifact", batch=0, platforms=("cpu",),
        quantize="int8",
    )
    exported, manifest = export_serving.load(out)
    assert manifest["quantization"] == "int8"
    mlir = exported.mlir_module()
    assert "mosaic" not in mlir.lower() and "tpu.custom_call" not in mlir
    assert re.search(r"tensor<[0-9x?]*xi8>", mlir)

    imgs = np.random.default_rng(0).integers(
        0, 256, (3, 32, 32, 3), dtype=np.uint8
    )
    want = np.asarray(
        jax.jit(quant.wrap_int8(_forward(cfg)))(jnp.asarray(imgs))
    )
    got = np.asarray(exported.call(imgs))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    summary = export_serving.verify_artifact(out)
    assert summary["status"] == "ok" and summary["quantization"] == "int8"


def test_swin_int8_artifact(tmp_path):
    """SwinV2's Dense-heavy body quantizes (int8 dot_generals present) and
    the quantized artifact executes with finite logits near fp."""
    cfg = _cfg(
        tmp_path,
        {"model": {"name": "swinv2_micro", "args": {"dtype": "float32"}}},
    )
    out = export_serving.export_artifact(
        cfg, tmp_path / "sw8", batch=2, platforms=("cpu",), quantize="int8"
    )
    exported, manifest = export_serving.load(out)
    assert manifest["quantization"] == "int8"
    mlir = exported.mlir_module()
    assert any(
        re.search(r"xi8>", l)
        for l in mlir.splitlines()
        if "stablehlo.dot_general" in l
    )

    imgs = np.random.default_rng(1).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8
    )
    q8 = np.asarray(exported.call(imgs))
    fp = np.asarray(_forward(cfg)(jnp.asarray(imgs)))
    assert np.isfinite(q8).all()
    cos = (fp * q8).sum(1) / (
        np.linalg.norm(fp, axis=1) * np.linalg.norm(q8, axis=1)
    )
    assert (cos > 0.99).all()


@pytest.mark.parametrize(
    "name", ["vit_micro", "convnext_micro", "efficientnet_micro"]
)
def test_new_family_int8_artifact(tmp_path, name):
    """The interceptor-based PTQ rewrite is family-generic: ViT, ConvNeXt
    and EfficientNet (incl. its depthwise convs — feature_group_count rides
    through _quant_conv) quantize and track fp."""
    cfg = _cfg(
        tmp_path,
        {"model": {"name": name, "args": {"dtype": "float32"}}},
    )
    out = export_serving.export_artifact(
        cfg, tmp_path / "nf8", batch=2, platforms=("cpu",), quantize="int8"
    )
    exported, manifest = export_serving.load(out)
    assert manifest["quantization"] == "int8"
    mlir = exported.mlir_module()
    # ViT/ConvNeXt lower their Dense layers to int8 dot_generals;
    # EfficientNet (all-conv) lowers to int8 convolutions.
    assert any(
        re.search(r"xi8>", l)
        for l in mlir.splitlines()
        if "stablehlo.dot_general" in l or "stablehlo.convolution" in l
    )

    imgs = np.random.default_rng(1).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8
    )
    q8 = np.asarray(exported.call(imgs))
    fp = np.asarray(_forward(cfg)(jnp.asarray(imgs)))
    assert np.isfinite(q8).all()
    cos = (fp * q8).sum(1) / (
        np.linalg.norm(fp, axis=1) * np.linalg.norm(q8, axis=1)
    )
    assert (cos > 0.99).all()


def test_calibrated_static_scales(tmp_path):
    """--calibrate N: static activation scales from real eval batches —
    the absmax reductions leave the graph, every quantized layer gets a
    scale, the artifact executes close to the dynamic one, and layers
    missing from a partial scale dict fall back to dynamic."""
    cfg = _cfg(tmp_path)
    dyn = export_serving.export_artifact(
        cfg, tmp_path / "dyn", batch=2, platforms=("cpu",), quantize="int8"
    )
    cal = export_serving.export_artifact(
        cfg, tmp_path / "cal", batch=2, platforms=("cpu",), quantize="int8",
        calibrate=1,
    )
    dyn_exp, dyn_manifest = export_serving.load(dyn)
    cal_exp, cal_manifest = export_serving.load(cal)
    assert dyn_manifest["activation_scales"] == {"mode": "dynamic"}
    assert cal_manifest["activation_scales"]["batches"] == 1
    assert cal_manifest["activation_scales"]["layers"] >= 6  # all the convs

    # the calibrated graph dropped the per-layer absmax reductions
    n_reduce = lambda m: m.count("stablehlo.reduce")
    assert n_reduce(cal_exp.mlir_module()) < n_reduce(dyn_exp.mlir_module())

    imgs = np.random.default_rng(3).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8
    )
    a = np.asarray(dyn_exp.call(imgs))
    b = np.asarray(cal_exp.call(imgs))
    # same int8 scheme, scales from the same distribution — close logits
    assert np.isfinite(b).all()
    cos = (a * b).sum(1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )
    assert (cos > 0.999).all()

    # library-level: a partial scale dict mixes static and dynamic layers
    from hvt.ops import quant

    fwd = _forward(cfg)
    scales = quant.collect_act_scales(fwd, [jnp.asarray(imgs)])
    assert all(s > 0 for s in scales.values())
    one_key = sorted(scales)[0]
    partial = jax.jit(
        quant.wrap_int8(fwd, act_scales={one_key: scales[one_key]})
    )(jnp.asarray(imgs))
    assert np.isfinite(np.asarray(partial)).all()

    # calibrate without quantize is a usage error
    with pytest.raises(ValueError, match="requires --quantize"):
        export_serving.build_exported(cfg, batch=2, platforms=("cpu",),
                                      calibrate=2)


def test_live_int8_predict_matches_artifact(tmp_path):
    """predict(quantize="int8") — the no-export accuracy A/B — reproduces
    the int8 artifact's records; quantize composes nowhere it shouldn't."""
    from hvt.downstream import predict as predict_lib

    cfg = _cfg(tmp_path)
    art = export_serving.export_artifact(
        cfg, tmp_path / "a8", batch=0, platforms=("cpu",), quantize="int8"
    )
    live = list(predict_lib.predict(cfg, topk=2, quantize="int8"))
    via_art = list(predict_lib.predict(cfg, topk=2, artifact=str(art)))
    assert len(live) == len(via_art) == 8
    for a, b in zip(live, via_art):
        assert a["class_ids"] == b["class_ids"]
        assert a["probs"] == pytest.approx(b["probs"], abs=1e-6)

    with pytest.raises(ValueError, match="fixed at export"):
        next(iter(predict_lib.predict(cfg, quantize="int8",
                                      artifact=str(art))))
    with pytest.raises(ValueError, match="expected int8"):
        next(iter(predict_lib.predict(cfg, quantize="int4")))

    # The HTTP engine takes the same knob (serve.py --quantize, config mode).
    from hvt.downstream import serve as serve_lib

    engine = serve_lib.InferenceEngine(cfg, topk=2, batch=1, quantize="int8")
    try:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(0).integers(0, 256, (40, 40, 3),
                                              dtype=np.uint8)
        ).save(buf, format="PNG")
        rec = engine.predict_image(buf.getvalue(), topk=2)
        assert len(rec["class_ids"]) == 2
    finally:
        engine.close()


def test_live_calibrated_matches_calibrated_artifact(tmp_path):
    """predict(quantize="int8", calibrate=N) — the live twin of
    ``export_serving --calibrate N`` (the measured production recipe,
    BENCH.md: dynamic absmax costs R50 −33% vs static) — reproduces the
    calibrated artifact's records: both calibrate over the same first-N
    eval batches, so the scales and the int8 math agree."""
    from hvt.downstream import predict as predict_lib

    cfg = _cfg(tmp_path)
    art = export_serving.export_artifact(
        cfg, tmp_path / "c8", batch=0, platforms=("cpu",), quantize="int8",
        calibrate=1,
    )
    live = list(predict_lib.predict(cfg, topk=2, quantize="int8",
                                    calibrate=1))
    via_art = list(predict_lib.predict(cfg, topk=2, artifact=str(art)))
    assert len(live) == len(via_art) == 8
    for a, b in zip(live, via_art):
        assert a["class_ids"] == b["class_ids"]
        # jit vs exported-module lowerings fuse differently; the records
        # agree to float noise, not bitwise (probs are rounded to 6dp).
        assert a["probs"] == pytest.approx(b["probs"], abs=2e-5)

    # usage errors: calibrate without int8, calibrate with an artifact
    with pytest.raises(ValueError, match="requires quantize"):
        next(iter(predict_lib.predict(cfg, calibrate=2)))

    # The HTTP engine takes the same knob (serve.py --calibrate).
    from hvt.downstream import serve as serve_lib

    engine = serve_lib.InferenceEngine(cfg, topk=2, batch=1,
                                       quantize="int8", calibrate=1)
    try:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(0).integers(0, 256, (40, 40, 3),
                                              dtype=np.uint8)
        ).save(buf, format="PNG")
        rec = engine.predict_image(buf.getvalue(), topk=2)
        assert len(rec["class_ids"]) == 2
    finally:
        engine.close()
    with pytest.raises(ValueError, match="requires quantize"):
        serve_lib.InferenceEngine(cfg, topk=2, batch=1, calibrate=1)


def test_quantize_native_incompatible(tmp_path):
    cfg = _cfg(tmp_path)
    with pytest.raises(ValueError, match="incompatible with --native"):
        export_serving.build_exported(
            cfg, batch=4, platforms=("tpu",), native=True, quantize="int8"
        )
    with pytest.raises(ValueError, match="expected int8"):
        export_serving.build_exported(cfg, batch=4, platforms=("cpu",),
                                      quantize="int4")


def test_cli_quantize_flag(tmp_path, monkeypatch):
    import io
    import sys

    cfg_yaml = tmp_path / "exp.yaml"
    cfg_yaml.write_text(json.dumps({
        "run_name": "quant-cli",
        "model": {"name": "resnet_micro", "args": {"dtype": "float32"}},
        "machine": {"save_root": str(tmp_path)},
        "precision": {"compute_dtype": "float32"},
        "eval_dataset": {
            "source": "synthetic", "synthetic_num_classes": 3,
            "synthetic_num_samples": 4, "crop_size": 32,
            "global_batch_size": 4,
        },
        "loader": {"num_workers": 1, "prefetch_batches": 1},
    }))
    machine_yaml = tmp_path / "machine.yaml"
    machine_yaml.write_text(json.dumps({"machine": {"save_root": str(tmp_path)}}))
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    export_serving.main(
        ["--machine", str(machine_yaml), "--exp", str(cfg_yaml),
         "--output", str(tmp_path / "art"),
         "--batch", "1", "--platforms", "cpu", "--quantize", "int8"]
    )
    summary = json.loads(buf.getvalue())
    assert summary["quantization"] == "int8"
    manifest = json.loads(
        (tmp_path / "art" / export_serving.MANIFEST_NAME).read_text()
    )
    assert manifest["quantization"] == "int8"
