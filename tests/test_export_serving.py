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
