"""StableHLO serving export (hvt/tools/export_serving.py).

The exported artifact must (a) replay the exact eval forward with weights
baked in, (b) support a symbolic batch dimension, (c) contain no Mosaic
custom calls (portability contract), and (d) carry a usable manifest.
"""

import json

import jax.numpy as jnp
import numpy as np

from hvt import config as C
from hvt.tools import export_serving


def _cfg(tmp_path, extra=None):
    layers = [
        {
            "run_name": "export-test",
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


def test_resnet_dynamic_batch_roundtrip(tmp_path):
    """Symbolic-batch export: one artifact serves any batch, and its logits
    match the live model bit-for-bit-else-eps (same init seed)."""
    import jax

    from hvt.data import DevicePrep
    from hvt.models import build_model

    cfg = _cfg(tmp_path)
    out = export_serving.export_artifact(
        cfg, tmp_path / "artifact", batch=0, platforms=("cpu",)
    )
    exported, manifest = export_serving.load(out)

    # Portability contract: plain XLA StableHLO, no Mosaic custom calls.
    mlir = exported.mlir_module()
    assert "tpu.custom_call" not in mlir and "mosaic" not in mlir.lower()

    rng = np.random.default_rng(0)
    prep = DevicePrep.from_config(cfg.eval_dataset, cfg.precision)
    model = build_model(cfg, 4)
    for batch in (1, 3):
        images = rng.integers(0, 256, (batch, 32, 32, 3), dtype=np.uint8)
        got = np.asarray(exported.call(images))
        assert got.shape == (batch, 4)
        variables = model.init(
            jax.random.key(cfg.seed),
            prep.normalize(jnp.zeros((2, 32, 32, 3), jnp.uint8)),
            train=False,
        )
        want = np.asarray(
            model.apply(variables, prep.normalize(jnp.asarray(images)),
                        train=False)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # non-positive batch means symbolic, in the spec AND the manifest
    _, neg_manifest = export_serving.build_exported(
        cfg, batch=-1, platforms=("cpu",)
    )
    assert neg_manifest["input"]["shape"][0] == "b"

    assert manifest["model"] == "resnet_micro"
    assert manifest["multitask"] is False
    assert manifest["num_classes"] == 4
    assert manifest["input"]["shape"] == ["b", 32, 32, 3]
    assert manifest["preprocessing"]["crop_size"] == 32


def test_swin_multitask_fixed_batch(tmp_path):
    """Multitask SwinV2 exports a per-tier logits tuple at a pinned batch,
    with the pallas/fused paths forced off in the artifact."""
    cfg = _cfg(
        tmp_path,
        {
            "model": {"name": "swinv2_micro", "args": {"dtype": "float32"}},
            "hierarchy": {"variant": "multitask",
                          "multitask_coeffs": [1, 1, 1, 1, 1, 1, 1]},
        },
    )
    out = export_serving.export_artifact(
        cfg, tmp_path / "artifact", batch=2, platforms=("cpu",)
    )
    exported, manifest = export_serving.load(out)
    assert "mosaic" not in exported.mlir_module().lower()

    images = np.zeros((2, 32, 32, 3), np.uint8)
    tiers = exported.call(images)
    assert isinstance(tiers, tuple) and len(tiers) == 7
    assert manifest["multitask"] is True
    assert [t.shape[-1] for t in tiers] == manifest["num_classes"]
    assert manifest["input"]["shape"][0] == 2
    assert manifest["output"].startswith("per-tier")


def test_native_export_embeds_mosaic_kernels(tmp_path):
    """--native keeps the fused Pallas kernels in the artifact: the module
    carries tpu_custom_call ops (lowered from a CPU process — export is
    lowering, not compilation), the manifest marks the matched-TPU
    contract, and the symbolic-batch / non-tpu-platform combinations are
    rejected up front."""
    import pytest
    from jax import export as jax_export

    cfg = _cfg(
        tmp_path,
        {"model": {"name": "swinv2_micro", "args": {"dtype": "float32"}}},
    )
    exported, manifest = export_serving.build_exported(
        cfg, batch=8, platforms=("tpu",), native=True
    )
    mlir = exported.mlir_module()
    assert "tpu_custom_call" in mlir  # Mosaic kernels really embedded
    assert manifest["native"] is True
    assert manifest["platforms"] == ["tpu"]
    assert manifest["input"]["shape"][0] == 8
    # The serialized form roundtrips with the safety check disabled on the
    # producer side (the consumer needs no flag: checks ride the artifact).
    again = jax_export.deserialize(bytearray(exported.serialize()))
    assert again.in_avals[0].shape[0] == 8

    with pytest.raises(ValueError, match="static batch"):
        export_serving.build_exported(cfg, batch=0, platforms=("tpu",),
                                      native=True)
    with pytest.raises(ValueError, match="platforms tpu"):
        export_serving.build_exported(cfg, batch=8, platforms=("tpu", "cpu"),
                                      native=True)

    # The portable path is unchanged: same config, no Mosaic calls.
    portable, p_manifest = export_serving.build_exported(
        cfg, batch=8, platforms=("cpu",)
    )
    assert "tpu_custom_call" not in portable.mlir_module()
    assert p_manifest["native"] is False


def test_cli_writes_artifact(tmp_path, monkeypatch):
    """The module CLI writes the artifact pair and prints a JSON summary."""
    import io
    import sys

    cfg_yaml = tmp_path / "exp.yaml"
    cfg_yaml.write_text(
        json.dumps(
            {
                "run_name": "export-cli",
                "model": {"name": "resnet_micro", "args": {"dtype": "float32"}},
                "machine": {"save_root": str(tmp_path)},
                "precision": {"compute_dtype": "float32"},
                "eval_dataset": {
                    "source": "synthetic", "synthetic_num_classes": 3,
                    "synthetic_num_samples": 4, "crop_size": 32,
                    "global_batch_size": 4,
                },
                "loader": {"num_workers": 1, "prefetch_batches": 1},
            }
        )
    )
    machine_yaml = tmp_path / "machine.yaml"
    machine_yaml.write_text(json.dumps({"machine": {"save_root": str(tmp_path)}}))
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    export_serving.main(
        ["--machine", str(machine_yaml), "--exp", str(cfg_yaml),
         "--output", str(tmp_path / "art"),
         "--batch", "1", "--platforms", "cpu"]
    )
    summary = json.loads(buf.getvalue())
    assert summary["classes"] >= 0 and summary["bytes"] > 0
    assert (tmp_path / "art" / export_serving.ARTIFACT_NAME).exists()
    assert (tmp_path / "art" / export_serving.MANIFEST_NAME).exists()


def test_serve_from_artifact(tmp_path):
    """The HTTP server rides the exported artifact directly — no model
    code or checkpoint at serving time — with the same response contract
    as config-mode serving."""
    import io as io_lib
    import threading
    import urllib.request

    import pytest
    from PIL import Image

    from hvt.downstream import serve as serve_lib

    names = [
        "00001_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_badius",
        "00002_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_cooperii",
    ]
    root = tmp_path / "ds"
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for name in names:
            d = root / split / name
            d.mkdir(parents=True)
            Image.fromarray(
                rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
            ).save(d / "0.jpg")

    cfg = C.loads(
        {
            "run_name": "export-serve",
            "seed": 0,
            "model": {"name": "resnet_micro", "args": {"dtype": "float32"}},
            "machine": {"datasets": {"fix": str(root)},
                        "save_root": str(tmp_path / "runs")},
            "precision": {"compute_dtype": "float32"},
            "eval_dataset": {"path": "fix", "crop_size": 32, "resize_size": 34,
                             "global_batch_size": 4},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    art = export_serving.export_artifact(
        cfg, tmp_path / "artifact", batch=0, platforms=("cpu",)
    )

    engine = serve_lib.InferenceEngine.from_artifact(art, batch=2, topk=2)
    server = serve_lib.make_server(engine, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["model"] == "resnet_micro"
        assert health["classes"] == 2

        buf = io_lib.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"{base}/predict?topk=2", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            rec = json.loads(r.read())
        assert rec["classes"][0] in names
        assert len(rec["class_ids"]) == 2
        assert abs(sum(rec["probs"]) - 1.0) < 1e-3  # 2 classes, full mass
    finally:
        server.shutdown()
        engine.close()

    # A batch-pinned artifact refuses a mismatched server batch, clearly —
    # and the default batch=0 auto-adopts the pinned shape.
    pinned = export_serving.export_artifact(
        cfg, tmp_path / "artifact-pinned", batch=4, platforms=("cpu",)
    )
    with pytest.raises(ValueError, match="pinned to 4"):
        serve_lib.InferenceEngine.from_artifact(pinned, batch=2)
    auto = serve_lib.InferenceEngine.from_artifact(pinned, topk=2)
    try:
        assert auto.batch == 4
    finally:
        auto.close()


def test_export_uses_ema_weights_from_checkpoint(tmp_path):
    """Export from a trained checkpoint resolves EMA weights (like predict/
    serve): the EMA artifact and raw-weights artifact produce different
    logits, and each matches its in-process weight source."""
    import jax

    from hvt import parallel
    from hvt.train.loop import Trainer

    cfg = C.loads(
        {
            "run_name": "export-ema",
            "max_duration": "3ba",
            "grad_accum": 1,
            "seed": 0,
            "model": {"name": "resnet_micro", "args": {"dtype": "float32"}},
            "machine": {"save_root": str(tmp_path)},
            "precision": {"compute_dtype": "float32"},
            "train_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 24, "crop_size": 32,
                "global_batch_size": 8,
            },
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "optim": {"name": "sgd", "lr": 0.05, "momentum": 0.9,
                      "weight_decay": 0.0},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "algorithms": [
                {"cls": "EMA", "args": {"half_life": "2ba",
                                        "update_interval": "1ba"}},
            ],
            "save": {"interval": None, "num_checkpoints_to_keep": 1,
                     "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(1), log_interval=10)
    tr.fit()
    tr.close()

    load_cfg = C.loads(
        C.to_dict(cfg), {"load_path": str(tmp_path / "export-ema" / "checkpoints")}
    )
    ema_exp, ema_manifest = export_serving.build_exported(
        load_cfg, use_ema=True, batch=2, platforms=("cpu",)
    )
    raw_exp, raw_manifest = export_serving.build_exported(
        load_cfg, use_ema=False, batch=2, platforms=("cpu",)
    )
    assert ema_manifest["ema_weights"] and not raw_manifest["ema_weights"]

    images = np.random.default_rng(1).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8
    )
    ema_logits = np.asarray(ema_exp.call(images))
    raw_logits = np.asarray(raw_exp.call(images))
    assert (ema_logits != raw_logits).any()  # EMA and raw weights diverge

    # The EMA artifact matches applying the checkpoint's EMA weights live.
    from hvt.data import DevicePrep
    from hvt.models import build_model
    from hvt.train import checkpoint as checkpoint_lib

    raw = checkpoint_lib.load_raw(str(tmp_path / "export-ema" / "checkpoints"))
    assert raw.get("ema_params") is not None
    model = build_model(load_cfg, 4)
    prep = DevicePrep.from_config(load_cfg.eval_dataset, load_cfg.precision)
    want = np.asarray(
        model.apply(
            {"params": raw["ema_params"],
             "batch_stats": raw.get("ema_batch_stats") or raw["batch_stats"]},
            prep.normalize(jax.numpy.asarray(images)),
            train=False,
        )
    )
    np.testing.assert_allclose(ema_logits, want, rtol=1e-5, atol=1e-5)


def test_predict_from_artifact_matches_live(tmp_path):
    """predict(artifact=...) replays the exported forward over the eval
    split and reproduces the live model's records exactly (same init
    weights); pinned-batch and crop mismatches error clearly."""
    import pytest

    from hvt.downstream import predict as predict_lib

    cfg = _cfg(tmp_path)
    art = export_serving.export_artifact(
        cfg, tmp_path / "artifact", batch=0, platforms=("cpu",)
    )
    live = list(predict_lib.predict(cfg, topk=2))
    via_artifact = list(predict_lib.predict(cfg, topk=2, artifact=str(art)))
    assert len(live) == len(via_artifact) == 8
    for a, b in zip(live, via_artifact):
        assert a["class_ids"] == b["class_ids"]
        assert a["probs"] == pytest.approx(b["probs"], abs=1e-6)
        assert a["label"] == b["label"]

    pinned = export_serving.export_artifact(
        cfg, tmp_path / "artifact-pinned", batch=4, platforms=("cpu",)
    )
    with pytest.raises(ValueError, match="pinned to 4"):
        next(iter(predict_lib.predict(cfg, topk=2, artifact=str(pinned))))


def test_batch_bucket_artifact(tmp_path):
    """--batch 1,4: the directory carries one export per bucket, the engine
    dispatches each request group at the smallest bucket that fits, and a
    single request's answer matches the single-export artifact's."""
    import threading

    import pytest

    from hvt.downstream import predict as predict_lib
    from hvt.downstream import serve as serve_lib

    cfg = _cfg(tmp_path)
    out = export_serving.export_artifact(
        cfg, tmp_path / "buckets", batch=[4, 1], platforms=("cpu",)
    )
    manifest = json.loads((out / export_serving.MANIFEST_NAME).read_text())
    assert manifest["batch_buckets"] == [1, 4]  # sorted
    assert set(manifest["files"]) == {"1", "4"}
    for name in manifest["files"].values():
        assert (out / name).exists()
    # the single-export loader refuses the bucket layout, clearly
    with pytest.raises(ValueError, match="load_all"):
        export_serving.load(out)
    buckets, _ = export_serving.load_all(out)
    assert sorted(buckets) == [1, 4]
    assert buckets[1].in_avals[0].shape[0] == 1
    assert buckets[4].in_avals[0].shape[0] == 4

    # engine: bucket dispatch is observable through the step table
    engine = serve_lib.InferenceEngine.from_artifact(out, topk=2)
    try:
        assert [s for s, _ in engine._steps] == [1, 4]
        assert engine.batch == 4

        # one request → the batch-1 bucket produces the same record the
        # batch-1 single-export artifact would
        import io as io_lib

        from PIL import Image

        rng = np.random.default_rng(0)
        buf = io_lib.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(buf, format="PNG")  # PNG: lossless, decode-identical
        rec = engine.predict_image(buf.getvalue(), topk=2)
        assert len(rec["class_ids"]) == 2
    finally:
        engine.close()

    # an explicit cap must name a bucket
    with pytest.raises(ValueError, match="buckets"):
        serve_lib.InferenceEngine.from_artifact(out, batch=3)
    capped = serve_lib.InferenceEngine.from_artifact(out, batch=1, topk=2)
    try:
        assert [s for s, _ in capped._steps] == [1]
    finally:
        capped.close()

    # predict: the loader batch must name a bucket
    cfg4 = _cfg(tmp_path, {"eval_dataset": {"global_batch_size": 4}})
    recs = list(predict_lib.predict(cfg4, topk=2, artifact=str(out)))
    assert len(recs) == 8
    # a loader batch between buckets pads up to the smallest fit (3 → 4)
    cfg3 = _cfg(tmp_path, {"eval_dataset": {"global_batch_size": 3,
                                            "synthetic_num_samples": 6}})
    recs3 = list(predict_lib.predict(cfg3, topk=2, artifact=str(out)))
    assert len(recs3) == 6
    # same images → same records as the exact-bucket run, order-preserved
    for a, b in zip(recs3, recs):
        assert a["class_ids"] == b["class_ids"]
    # beyond the largest bucket there is nothing to pad into
    cfg9 = _cfg(tmp_path, {"eval_dataset": {"global_batch_size": 9,
                                            "synthetic_num_samples": 9}})
    with pytest.raises(ValueError, match="largest batch bucket"):
        next(iter(predict_lib.predict(cfg9, topk=2, artifact=str(out))))


def test_native_bucket_artifact(tmp_path):
    """--native composes with batch buckets: every bucket file embeds the
    Mosaic custom calls and the manifest carries both contracts."""
    from jax import export as jax_export

    cfg = _cfg(
        tmp_path,
        {"model": {"name": "swinv2_micro", "args": {"dtype": "float32"}}},
    )
    out = export_serving.export_artifact(
        cfg, tmp_path / "native-buckets", batch=[2, 8],
        platforms=("tpu",), native=True,
    )
    manifest = json.loads((out / export_serving.MANIFEST_NAME).read_text())
    assert manifest["native"] is True
    assert manifest["batch_buckets"] == [2, 8]
    for b, name in manifest["files"].items():
        exported = jax_export.deserialize(
            bytearray((out / name).read_bytes())
        )
        assert exported.in_avals[0].shape[0] == int(b)
        assert "tpu_custom_call" in exported.mlir_module()


def test_review_hardening(tmp_path):
    """Self-review fixes: (a) a tpu-only (native) artifact refuses to serve
    on a CPU backend with a clear message, (b) an empty --batch is a usage
    error, (c) device-RA depth 0 parses to a true no-op, (d) native export
    restores the process kernel-mesh global."""
    import pytest

    from hvt import parallel
    from hvt.downstream import serve as serve_lib
    from hvt.train.algorithms import parse_algorithms

    cfg = _cfg(
        tmp_path,
        {"model": {"name": "swinv2_micro", "args": {"dtype": "float32"}}},
    )
    out = export_serving.export_artifact(
        cfg, tmp_path / "native", batch=4, platforms=("tpu",), native=True
    )
    with pytest.raises(ValueError, match="backend is 'cpu'"):
        serve_lib.InferenceEngine.from_artifact(out)
    from hvt.downstream import predict as predict_lib

    cfg4 = _cfg(tmp_path, {"eval_dataset": {"global_batch_size": 4}})
    with pytest.raises(ValueError, match="backend is 'cpu'"):
        next(iter(predict_lib.predict(cfg4, topk=2, artifact=str(out))))

    with pytest.raises(SystemExit):
        export_serving.main(
            ["--machine", "/dev/null", "--output", str(tmp_path / "x"),
             "--batch", ","]
        )

    ra0 = C.loads({"algorithms": [
        {"cls": "RandAugment", "args": {"depth": 0, "device": True}}]})
    assert parse_algorithms(ra0).randaugment_device is None

    # the export trace must not clobber a live process's kernel mesh
    mesh = parallel.cpu_mesh(1)
    parallel.set_kernel_mesh(mesh)
    try:
        export_serving.build_exported(cfg, batch=2, platforms=("tpu",),
                                      native=True)
        assert parallel.declared_kernel_mesh() is mesh
    finally:
        parallel.set_kernel_mesh(None)


def test_verify_artifact(tmp_path):
    """--verify executes every bucket on a compatible backend and only
    loads (without executing) artifacts lowered for other platforms."""
    cfg = _cfg(tmp_path)
    out = export_serving.export_artifact(
        cfg, tmp_path / "v", batch=[1, 4], platforms=("cpu",)
    )
    summary = export_serving.verify_artifact(out)
    assert summary["status"] == "ok"
    assert summary["buckets"] == [1, 4] and summary["executed"]

    sym = export_serving.export_artifact(
        cfg, tmp_path / "v-sym", batch=0, platforms=("cpu",)
    )
    assert export_serving.verify_artifact(sym)["buckets"] == ["symbolic"]

    native = export_serving.export_artifact(
        _cfg(tmp_path, {"model": {"name": "swinv2_micro",
                                  "args": {"dtype": "float32"}}}),
        tmp_path / "v-native", batch=2, platforms=("tpu",), native=True,
    )
    s = export_serving.verify_artifact(native)
    assert not s["executed"] and s["status"].startswith("ok (loaded")

    # CLI form prints the JSON summary
    import io
    import sys as sys_mod
    buf = io.StringIO()
    real = sys_mod.stdout
    sys_mod.stdout = buf
    try:
        export_serving.main(["--verify", str(out)])
    finally:
        sys_mod.stdout = real
    assert json.loads(buf.getvalue())["status"] == "ok"
