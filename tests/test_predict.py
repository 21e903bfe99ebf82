"""Batch-inference entry (hvt/downstream/predict.py)."""

import json

import numpy as np
import pytest

from hvt import config as C
from hvt import parallel


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """A 2-step synthetic resnet_micro run with a saved checkpoint."""
    from hvt.train.loop import Trainer

    save_root = tmp_path_factory.mktemp("runs")
    cfg = C.loads(
        {
            "run_name": "pred-src",
            "max_duration": "2ba",
            "grad_accum": 1,
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"save_root": str(save_root)},
            "train_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 16, "crop_size": 32,
                "global_batch_size": 8, "drop_last": True, "shuffle": True,
            },
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 12, "crop_size": 32,
                "global_batch_size": 8,
            },
            "optim": {"name": "sgd", "lr": 0.01, "momentum": 0.9,
                      "weight_decay": 0.0},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "algorithms": [
                {"cls": "EMA", "args": {"half_life": "4ba", "update_interval": "1ba"}},
            ],
            "save": {"interval": None, "num_checkpoints_to_keep": 1, "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(1), log_interval=10)
    tr.fit()
    tr.close()
    ckpt_dir = f"{save_root}/pred-src/checkpoints"
    return cfg, ckpt_dir


def test_predict_from_checkpoint(trained_run, tmp_path):
    from hvt.downstream import predict as predict_lib

    cfg, ckpt_dir = trained_run
    pred_cfg = C.loads(C.to_dict(cfg), {"load_path": ckpt_dir})
    out = tmp_path / "preds.jsonl"
    summary = predict_lib.run(pred_cfg, str(out), topk=3)
    assert summary["count"] == 12  # full eval split, padding dropped
    rows = [json.loads(line) for line in out.read_text().splitlines()]
    assert len(rows) == 12
    for rec in rows:
        assert len(rec["class_ids"]) == 3
        assert len(rec["probs"]) == 3
        assert all(0 <= c < 4 for c in rec["class_ids"])
        # top-k probabilities are sorted and valid
        assert rec["probs"] == sorted(rec["probs"], reverse=True)
        assert 0.0 < sum(rec["probs"]) <= 1.0 + 1e-6
        assert isinstance(rec["label"], int)
    # top-1 accuracy consistent with the rows
    top1 = sum(r["label"] == r["class_ids"][0] for r in rows) / len(rows)
    assert summary["top1"] == pytest.approx(top1)


def test_predict_ema_vs_raw_weights_differ(trained_run):
    from hvt.downstream import predict as predict_lib

    cfg, ckpt_dir = trained_run
    pred_cfg = C.loads(C.to_dict(cfg), {"load_path": ckpt_dir})
    ema = [r["probs"][0] for r in predict_lib.predict(pred_cfg, topk=1)]
    raw = [r["probs"][0] for r in predict_lib.predict(
        pred_cfg, topk=1, use_ema=False
    )]
    assert len(ema) == len(raw) == 12
    # EMA weights lag the raw weights after 2 steps — outputs must differ.
    assert any(abs(a - b) > 1e-9 for a, b in zip(ema, raw))


def test_predict_multitask_uses_fine_tier(tmp_path):
    """Multitask model (tuple num_classes): predictions come from the last
    (species) tier and labels arrive as the 7-tier vector."""
    from hvt.downstream import predict as predict_lib

    cfg = C.loads(
        {
            "run_name": "pred-mt",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "hierarchy": {"variant": "multitask",
                          "multitask_coeffs": [1, 1, 1, 1, 1, 1, 1]},
            "machine": {"save_root": str(tmp_path)},
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    rows = list(predict_lib.predict(cfg, topk=2))
    assert len(rows) == 8
    for rec in rows:
        assert isinstance(rec["label"], list) and len(rec["label"]) == 7
        assert len(rec["class_ids"]) == 2


def test_predict_folder_dataset_reports_paths(tmp_path):
    """On an ImageFolder dataset every row carries the source file path, in
    the loader's deterministic (unshuffled) order."""
    from PIL import Image

    from hvt.downstream import predict as predict_lib

    names = [
        "00000_animalia_chordata_aves_passeriformes_corvidae_corvus_corax",
        "00001_animalia_chordata_aves_passeriformes_corvidae_corvus_cornix",
    ]
    rng = np.random.default_rng(0)
    for split, k in [("val", 3)]:
        for name in names:
            d = tmp_path / "ds" / split / name
            d.mkdir(parents=True)
            for i in range(k):
                Image.fromarray(
                    rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
                ).save(d / f"{i}.jpg")
    # the folder scanner requires a train split too
    for name in names:
        d = tmp_path / "ds" / "train" / name
        d.mkdir(parents=True)
        Image.fromarray(
            rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
        ).save(d / "0.jpg")

    cfg = C.loads(
        {
            "run_name": "pred-folder",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"datasets": {"fix": str(tmp_path / "ds")},
                        "save_root": str(tmp_path / "runs")},
            "eval_dataset": {"path": "fix", "crop_size": 32, "resize_size": 34,
                             "global_batch_size": 4},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    rows = list(predict_lib.predict(cfg, topk=1))
    assert len(rows) == 6
    seen = [r["path"] for r in rows]
    assert len(set(seen)) == 6
    for r in rows:
        assert r["path"].endswith(".jpg")
        # the label matches the class directory in the path
        assert names[r["label"]] in r["path"]
        assert r["classes"][0] in names


def test_predict_hierarchical_top_down_consistent(tmp_path):
    """Constrained decoding: every tier's prediction must be a child of the
    previous tier's prediction, and the fine-tier id matches class_ids[0]."""
    from hvt import hierarchy as hierarchy_lib
    from hvt.downstream import predict as predict_lib

    cfg = C.loads(
        {
            "run_name": "pred-hier",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "hierarchy": {"variant": "multitask",
                          "multitask_coeffs": [1, 1, 1, 1, 1, 1, 1]},
            "machine": {"save_root": str(tmp_path)},
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 6,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    rows = list(predict_lib.predict(cfg, topk=2, hierarchical=True))
    assert len(rows) == 8

    from hvt.data import build_loader

    loader, _ = build_loader(cfg, is_train=False)
    lookups = hierarchy_lib.parent_lookup_from_classes(loader.dataset.classes)
    for rec in rows:
        tiers = rec["tier_ids"]
        assert len(tiers) == 7
        for t in range(1, 7):
            assert lookups[t - 1][tiers[t]] == tiers[t - 1], (t, tiers)
        assert rec["class_ids"][0] == tiers[-1]

    # flat decode must raise without a multitask model
    flat = C.loads(C.to_dict(cfg), {"hierarchy": {"variant": "",
                                                  "multitask_coeffs": []}})
    with pytest.raises(ValueError, match="multitask"):
        list(predict_lib.predict(flat, hierarchical=True))

    # Branch-limited top-k: every returned entry lies in the predicted
    # parent's branch (no ~0-probability out-of-branch padding), so rows may
    # carry fewer than k entries when the branch is small.
    deep_rows = list(predict_lib.predict(cfg, topk=5, hierarchical=True))
    for rec in deep_rows:
        parent = rec["tier_ids"][-2]
        assert 1 <= len(rec["class_ids"]) <= 5
        assert len(rec["classes"]) == len(rec["probs"]) == len(rec["class_ids"])
        for cid in rec["class_ids"]:
            assert lookups[-1][cid] == parent, (cid, parent)


def test_predict_hierarchical_rejects_bad_class_names(tmp_path, monkeypatch):
    """--hierarchical on class names that aren't taxonomy-formatted fails with
    a clear message instead of building a garbage parent lookup."""
    from hvt.downstream import predict as predict_lib

    cfg = C.loads(
        {
            "run_name": "pred-badnames",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "hierarchy": {"variant": "multitask",
                          "multitask_coeffs": [1, 1, 1, 1, 1, 1, 1]},
            "machine": {"save_root": str(tmp_path)},
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )

    real_build_loader = predict_lib.build_loader

    def renamed_loader(config, is_train):
        import dataclasses

        loader, info = real_build_loader(config, is_train=is_train)
        loader.dataset = dataclasses.replace(
            loader.dataset, classes=[f"not-a-taxon-{i}" for i in range(4)]
        )
        return loader, info

    monkeypatch.setattr(predict_lib, "build_loader", renamed_loader)
    with pytest.raises(ValueError, match="taxonomy-formatted"):
        list(predict_lib.predict(cfg, hierarchical=True))
