import numpy as np
import pytest
from PIL import Image

from hvt import config as C
from hvt import hierarchy as H
from hvt.downstream import centroid as centroid_lib
from hvt.downstream import features as F

NAMES = [
    "00001_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_badius",
    "00002_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_cooperii",
    "00003_animalia_chordata_aves_accipitriformes_pandionidae_pandion_haliaetus",
    "00004_plantae_tracheophyta_pinopsida_pinales_pinaceae_pinus_strobus",
]


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("downstream-ds")
    rng = np.random.default_rng(0)
    for split, k in [("train", 5), ("val", 2)]:
        for name in NAMES:
            d = root / split / name
            d.mkdir(parents=True)
            for i in range(k):
                Image.fromarray(
                    rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
                ).save(d / f"{i}.jpg")
    return root


def _probe_config(root, save_root, variant="linear-probe",
                  model="resnet_micro", model_args=None):
    return C.loads(
        {
            "run_name": "probe_test",
            "seed": 0,
            "model": {"name": model, "variant": variant,
                      "args": model_args or {}},
            "machine": {"datasets": {"fix": str(root)}, "save_root": str(save_root)},
            "train_dataset": {"path": "fix", "crop_size": 32, "resize_size": 34,
                              "global_batch_size": 4},
            "eval_dataset": {"path": "fix", "crop_size": 32, "resize_size": 34,
                             "global_batch_size": 4},
            "loader": {"num_workers": 1},
        }
    )


def test_extract_features_and_cache(ds_root, tmp_path):
    cfg = _probe_config(ds_root, tmp_path)
    feats, labels = F.extract_features(cfg, is_train=True, kind="linear-probe")
    assert feats.shape == (20, 16)  # resnet_micro: width 8, 2 stages -> 16
    assert labels.shape == (20,)
    # cache hit second time (file mtime unchanged, same values)
    import os

    cache = F.cache_path(cfg, "linear-probe", True)
    assert os.path.isfile(cache)
    feats2, _ = F.extract_features(cfg, is_train=True, kind="linear-probe")
    np.testing.assert_array_equal(feats, feats2)


def test_cached_features_decode_no_images(ds_root, tmp_path, monkeypatch):
    """On a cache hit no image is opened at all — labels come from the folder
    scan, not a decode pass (the reference decodes the whole split for labels,
    reference linear_probe.py:129-141)."""
    cfg = _probe_config(ds_root, tmp_path)
    feats, labels = F.extract_features(cfg, is_train=True, kind="linear-probe")

    def boom(*a, **k):
        raise AssertionError("image decode attempted on a feature-cache hit")

    monkeypatch.setattr("PIL.Image.open", boom)
    monkeypatch.setattr("hvt.data.native.load_batch", boom)
    feats2, labels2 = F.extract_features(cfg, is_train=True, kind="linear-probe")
    np.testing.assert_array_equal(feats, feats2)
    np.testing.assert_array_equal(labels, labels2)
    # label order still matches the feature extraction order (seeded epoch 0)
    assert labels2.shape == (20,)


def test_extract_features_hierarchical_labels(ds_root, tmp_path):
    cfg = _probe_config(ds_root, tmp_path, variant="simpleshot")
    _, labels = F.extract_features(
        cfg, is_train=False, kind="simpleshot", hierarchical_labels=True
    )
    assert labels.shape == (8, 7)


def test_center_and_l2_normalize():
    x = np.asarray([[1.0, 3.0], [2.0, 2.0]])
    c = F.center(x)
    np.testing.assert_allclose(c, [[0.5, 1.5], [1.0, 1.0]])  # divide-by-mean quirk
    n = F.l2_normalize(x)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0)


def test_linear_probe_end_to_end(ds_root, tmp_path):
    import linear_probe

    cfg = _probe_config(ds_root, tmp_path, variant="linear-probing")
    metrics = linear_probe.main(cfg)
    assert 0.0 <= metrics["acc@1"] <= 1.0
    assert "tree-dist" in metrics


def test_linear_probe_dinov2_end_to_end(ds_root, tmp_path):
    """The frozen-feature story on the DINOv2 family: features_only returns
    the concat[cls, mean-patch] vector (2*embed_dim) and the sklearn probe
    consumes it end-to-end — the reference's timm-backbone linear-probe
    workload (reference linear_probe.py:43-255) on the modern SSL
    backbone."""
    import linear_probe

    feat_cfg = _probe_config(
        ds_root, tmp_path, model="dinov2_micro",
        model_args={"dtype": "float32"},
    )
    feats, _ = F.extract_features(feat_cfg, is_train=True, kind="linear-probe")
    assert feats.shape == (20, 64)  # 2 * embed_dim(32)

    cfg = _probe_config(
        ds_root, tmp_path, variant="linear-probing",
        model="dinov2_micro", model_args={"dtype": "float32"},
    )
    metrics = linear_probe.main(cfg)
    assert 0.0 <= metrics["acc@1"] <= 1.0


def test_simpleshot_dinov2_end_to_end(ds_root, tmp_path):
    """SimpleShot on DINOv2's concat[cls, mean-patch] features: l2_normalize
    and the nearest-centroid consume the 2*embed_dim width end-to-end
    (reference simpleshot.py:139-154 with a timm SSL backbone instead of
    the R50)."""
    import simpleshot

    feat_cfg = _probe_config(
        ds_root, tmp_path, variant="simpleshot-l2n",
        model="dinov2_micro", model_args={"dtype": "float32"},
    )
    feats, _ = F.extract_features(feat_cfg, is_train=True, kind="simpleshot")
    assert feats.shape == (20, 64)  # 2 * embed_dim(32)
    metrics = simpleshot.main(feat_cfg)
    assert 0.0 <= metrics["acc@1"] <= 1.0
    assert "tree-dist" in metrics

    # The CL2N variant is degenerate here BY DESIGN (the reference's
    # center() divides by the per-example mean, which is float-epsilon
    # for post-LayerNorm features): pin the quirk so it reads as a
    # documented property, not a surprise.
    row_means = feats.mean(axis=1)
    assert np.abs(row_means).max() < 1e-6
    centered = F.center(feats)
    assert not np.isfinite(centered).all()


def test_simpleshot_dinov2_hierarchical_end_to_end(ds_root, tmp_path):
    """The parent-constrained top-down centroid on DINOv2's 2*D features
    (VERDICT r4 item 8: non-ResNet feature widths through the full
    hierarchical SimpleShot path)."""
    import simpleshot

    cfg = C.loads(
        C.to_dict(
            _probe_config(
                ds_root, tmp_path, variant="simpleshot",
                model="dinov2_micro", model_args={"dtype": "float32"},
            )
        ),
        {"simpleshot": {"hierarchical": True}},
    )
    metrics = simpleshot.main(cfg)
    assert 0.0 <= metrics["acc@1"] <= 1.0
    assert "tree-dist" in metrics


def test_simpleshot_flat_end_to_end(ds_root, tmp_path):
    import simpleshot

    cfg = _probe_config(ds_root, tmp_path, variant="simpleshot-cl2n")
    metrics = simpleshot.main(cfg)
    assert 0.0 <= metrics["acc@1"] <= 1.0


def test_simpleshot_hierarchical_end_to_end(ds_root, tmp_path):
    import simpleshot

    cfg = C.loads(
        C.to_dict(_probe_config(ds_root, tmp_path, variant="simpleshot")),
        {"simpleshot": {"hierarchical": True}},
    )
    metrics = simpleshot.main(cfg)
    assert 0.0 <= metrics["acc@1"] <= 1.0
    assert "tree-dist" in metrics


def test_variant_validation(ds_root, tmp_path):
    import linear_probe
    import simpleshot

    cfg = _probe_config(ds_root, tmp_path, variant="full-tuning")
    with pytest.raises(ValueError):
        linear_probe.main(cfg)
    with pytest.raises(ValueError):
        simpleshot.main(cfg)


# --- hierarchical nearest centroid ----------------------------------------


def _toy_taxonomy():
    names = [
        "00000_a_p0_c0_o0_f0_g0_s0",
        "00001_a_p0_c0_o0_f0_g0_s1",
        "00002_a_p1_c1_o1_f1_g1_s2",
        "00003_b_p2_c2_o2_f2_g2_s3",
    ]
    table, num_classes = H.assign_tier_indices(names)
    # parent lookups from the table
    lookups = []
    for t in range(1, H.N_TIERS):
        vec = np.zeros((num_classes[t],), dtype=np.int64)
        vec[table[:, t]] = table[:, t - 1]
        lookups.append(vec)
    return table, num_classes, lookups


def test_hierarchical_centroid_fit_predict_recovers_clusters():
    table, num_classes, lookups = _toy_taxonomy()
    rng = np.random.default_rng(0)
    # 4 species clusters in 2D, far apart
    centers = np.asarray([[0, 0], [10, 0], [0, 10], [10, 10]], dtype=np.float64)
    X, y = [], []
    for s in range(4):
        pts = centers[s] + 0.1 * rng.normal(size=(20, 2))
        X.append(pts)
        y.append(np.tile(table[s], (20, 1)))
    X, y = np.concatenate(X), np.concatenate(y)

    clf = centroid_lib.HierarchicalNearestCentroid(lookups).fit(X, y)
    preds = clf.predict(centers + 0.05)
    np.testing.assert_array_equal(preds, table)


def test_hierarchical_centroid_parent_constraint_binds():
    """A point nearest to species s2 overall, but whose kingdom prediction is
    'a'... the constraint must keep predictions consistent with the
    predicted ancestor path."""
    table, num_classes, lookups = _toy_taxonomy()
    # Train clusters: species 0/1 near origin (kingdom a), species 3 at (6,0)
    # (kingdom b), species 2 (kingdom a, phylum p1) at (100,100) far away.
    X = np.asarray(
        [[0, 0], [0, 1], [100, 100], [6, 0]], dtype=np.float64
    )
    y = table.copy()
    clf = centroid_lib.HierarchicalNearestCentroid(lookups).fit(
        np.repeat(X, 2, axis=0), np.repeat(y, 2, axis=0)
    )
    # Query at (3.4, 0): kingdom centroids are a=(33.3,33.7), b=(6,0) →
    # nearest kingdom is b → species must be s3 even though s0/s1 are closer.
    preds = clf.predict(np.asarray([[3.4, 0.0]]))
    assert preds[0, 0] == table[3, 0]  # kingdom b
    assert preds[0, -1] == table[3, -1]  # species s3 (constraint binds)


def test_hierarchical_centroid_matches_bruteforce_topdown():
    table, num_classes, lookups = _toy_taxonomy()
    rng = np.random.default_rng(1)
    X = rng.normal(size=(50, 3))
    y = table[rng.integers(0, 4, size=50)]
    clf = centroid_lib.HierarchicalNearestCentroid(lookups).fit(X, y)
    queries = rng.normal(size=(10, 3))
    preds = clf.predict(queries)

    # Brute-force oracle: top-down constrained argmin per example.
    for qi, q in enumerate(queries):
        prev = None
        for t in range(H.N_TIERS):
            present = clf.classes_[t]
            cents = clf.centroids_[t]
            d = np.linalg.norm(cents - q, axis=1)
            if t > 0:
                parents = lookups[t - 1][present]
                ok = parents == prev
                if ok.any():
                    d = np.where(ok, d, np.inf)
            choice = present[np.argmin(d)]
            assert preds[qi, t] == choice, (qi, t)
            prev = choice


def test_hierarchical_centroid_requires_two_classes():
    table, num_classes, lookups = _toy_taxonomy()
    X = np.zeros((4, 2))
    y = np.tile(table[0], (4, 1))  # single class everywhere
    with pytest.raises(ValueError):
        centroid_lib.HierarchicalNearestCentroid(lookups).fit(X, y)


def test_pretrained_backbone_transfers_batch_stats(ds_root, tmp_path):
    """ckpt:// pretrained loading carries BatchNorm running statistics, not
    just weights — a frozen backbone must normalize with the trained stats
    (the reference loads the full torch state dict, models.py:155-205)."""
    import jax

    from hvt import parallel
    from hvt.train.loop import Trainer

    cfg = C.loads(
        {
            "run_name": "bs-src",
            "max_duration": "3ba",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"datasets": {"fix": str(ds_root)},
                        "save_root": str(tmp_path)},
            "train_dataset": {"path": "fix", "crop_size": 32, "resize_size": 34,
                              "global_batch_size": 8, "drop_last": True,
                              "shuffle": True},
            "eval_dataset": {"path": "fix", "crop_size": 32, "resize_size": 34,
                             "global_batch_size": 8},
            "optim": {"name": "sgd", "lr": 0.05, "momentum": 0.9,
                      "weight_decay": 0.0},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "algorithms": [],
            "save": {"interval": None, "num_checkpoints_to_keep": 1,
                     "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(1), log_interval=10)
    tr.fit()
    trained_stats = jax.device_get(tr.state.batch_stats)
    tr.close()
    ckpts = f"{tmp_path}/bs-src/checkpoints"

    # The downstream feature path picks up the running stats with the params.
    import jax.numpy as jnp

    probe_cfg = C.loads(
        C.to_dict(_probe_config(ds_root, tmp_path / "probe")),
        {"algorithms": [{"cls": "PretrainedBackbone",
                         "args": {"checkpoint": ckpts}}]},
    )
    from hvt.models import build_model

    model = build_model(C.loads(C.to_dict(probe_cfg),
                                {"hierarchy": {"variant": ""}}), 2)
    variables = model.init(
        jax.random.key(0), jnp.zeros((2, 32, 32, 3)), train=False
    )
    params, stats = F.load_pretrained_variables(
        probe_cfg, jax.device_get(variables["params"]),
        jax.device_get(variables["batch_stats"]),
    )
    got = np.asarray(stats["stem"]["BatchNorm_0"]["mean"])
    want = np.asarray(trained_stats["stem"]["BatchNorm_0"]["mean"])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # and they genuinely differ from the fresh init (zeros)
    assert np.abs(want).max() > 1e-4

    # The Trainer's PretrainedBackbone path transfers them too.
    ft_cfg = C.loads(
        C.to_dict(cfg),
        {"run_name": "bs-ft",
         "algorithms": [{"cls": "PretrainedBackbone",
                         "args": {"checkpoint": ckpts}}]},
    )
    tr2 = Trainer(ft_cfg, mesh=parallel.cpu_mesh(1), log_interval=10)
    got2 = np.asarray(
        jax.device_get(tr2.state.batch_stats)["stem"]["BatchNorm_0"]["mean"]
    )
    np.testing.assert_allclose(got2, want, rtol=1e-6)
    tr2.close()
