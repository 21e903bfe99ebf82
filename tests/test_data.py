import numpy as np
import pytest
from PIL import Image

from hvt import config as C
from hvt.data import device as D
from hvt.data import folder as F
from hvt.data import loader as L
from hvt.data import synthetic as S
from hvt.data import transforms as T

NAMES = [
    "00001_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_badius",
    "00002_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_cooperii",
    "00003_plantae_tracheophyta_pinopsida_pinales_pinaceae_pinus_strobus",
]


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("inat-fixture")
    rng = np.random.default_rng(0)
    counts = {"train": 4, "val": 2}
    for split, k in counts.items():
        for name in NAMES:
            d = root / split / name
            d.mkdir(parents=True)
            for i in range(k):
                arr = rng.integers(0, 256, size=(40, 48, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"img{i}.jpg")
    return root


def test_scan_flat(image_root):
    ds = F.scan_image_folder(image_root, "train")
    assert len(ds) == 12
    assert ds.num_classes == 3
    assert ds.labels.shape == (12,)
    assert sorted(set(ds.labels.tolist())) == [0, 1, 2]


def test_scan_hierarchical(image_root):
    ds = F.scan_image_folder(image_root, "train", hierarchical=True)
    assert ds.labels.shape == (12, 7)
    assert ds.num_classes == (2, 2, 2, 2, 2, 2, 3)
    assert ds.hierarchical


def test_train_transform_shape_and_determinism(image_root):
    tf = T.TrainTransform(crop_size=32)
    img = Image.open(F.scan_image_folder(image_root, "train").paths[0])
    a = tf(img, np.random.default_rng((1, 2, 3)))
    b = tf(img, np.random.default_rng((1, 2, 3)))
    c = tf(img, np.random.default_rng((9, 9, 9)))
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)  # overwhelmingly likely


def test_eval_transform_center_crop(image_root):
    tf = T.EvalTransform(crop_size=32, resize_size=36)
    img = Image.open(F.scan_image_folder(image_root, "val").paths[0])
    out = tf(img)
    assert out.shape == (32, 32, 3)


def test_randaugment_runs():
    img = Image.fromarray(np.random.default_rng(0).integers(0, 256, (32, 32, 3), dtype=np.uint8))
    rng = np.random.default_rng(0)
    for _ in range(20):  # hit many ops
        out = T.rand_augment(img, rng, depth=2, severity=9)
        assert out.size == (32, 32)


def _loader(image_root, bs, **kw):
    ds = F.scan_image_folder(image_root, "train")
    tf = T.TrainTransform(crop_size=24)
    return L.Loader(ds, tf, bs, seed=7, num_workers=2, **kw)


def test_loader_epoch_shapes_and_padding(image_root):
    loader = _loader(image_root, bs=5, shuffle=True, drop_last=False)
    assert loader.batches_per_epoch == 3  # ceil(12 / 5)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    for b in batches[:-1]:
        assert b.images.shape == (5, 24, 24, 3)
        assert b.mask.sum() == 5
    last = batches[-1]
    assert last.mask.sum() == 2  # 12 = 5 + 5 + 2
    assert (last.images[2:] == 0).all()  # padded rows zeroed


def test_loader_drop_last(image_root):
    loader = _loader(image_root, bs=5, shuffle=False, drop_last=True)
    assert loader.batches_per_epoch == 2
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert all(b.mask.sum() == 5 for b in batches)


def test_loader_deterministic_and_epoch_varies(image_root):
    loader = _loader(image_root, bs=4, shuffle=True, drop_last=True)
    a1 = [b.images.copy() for b in loader.epoch(0)]
    a2 = [b.images.copy() for b in loader.epoch(0)]
    b1 = [b.images.copy() for b in loader.epoch(1)]
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a1, b1))


def test_loader_host_sharding_partition(image_root):
    ds = F.scan_image_folder(image_root, "train")
    tf = T.TrainTransform(crop_size=24)
    seen = []
    for pidx in range(2):
        loader = L.Loader(
            ds, tf, 3, shuffle=True, drop_last=True, seed=3,
            num_workers=1, process_index=pidx, process_count=2,
        )
        idxs = np.concatenate([loader._epoch_indices(0)])
        seen.append(set(idxs.tolist()))
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == 12


def test_synthetic_dataset_hierarchical():
    ds = S.build_synthetic(num_samples=10, num_leaf_classes=8, crop_size=16, hierarchical=True)
    assert ds.labels.shape == (10, 7)
    assert ds.num_classes == (2, 4, 8, 8, 8, 8, 8)
    img1, img2 = ds.load(3), ds.load(3)
    np.testing.assert_array_equal(img1, img2)
    assert img1.shape == (16, 16, 3)


def test_build_loader_from_config(image_root):
    cfg = C.loads(
        {
            "machine": {"datasets": {"fixture": str(image_root)}},
            "train_dataset": {
                "path": "fixture",
                "crop_size": 24,
                "global_batch_size": 4,
                "shuffle": True,
                "drop_last": True,
            },
            "loader": {"num_workers": 2},
        }
    )
    loader, info = L.build_loader(cfg, is_train=True, process_index=0, process_count=1)
    assert info.num_classes == 3
    batch = next(iter(loader.epoch(0)))
    assert batch.images.shape == (4, 24, 24, 3)
    assert batch.labels.dtype == np.int32


def test_build_loader_eval_builds_tree_dists(image_root):
    cfg = C.loads(
        {
            "is_train": False,
            "machine": {"datasets": {"fixture": str(image_root)}},
            "eval_dataset": {"path": "fixture", "crop_size": 24, "global_batch_size": 2},
        }
    )
    loader, info = L.build_loader(cfg, is_train=False, process_index=0, process_count=1)
    assert info.tree_dists is not None
    assert info.tree_dists.shape == (3, 3)
    assert info.tree_dists[0, 1] == 1  # same genus (accipiter)
    assert info.tree_dists[0, 2] == 7  # different kingdom


# --- device prep -----------------------------------------------------------


def test_normalize_values():
    import jax.numpy as jnp

    prep = D.DevicePrep(mean=(127.5, 127.5, 127.5), std=(127.5, 127.5, 127.5), compute_dtype=jnp.float32)
    x = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    x[..., 0] = 255
    out = np.asarray(prep.normalize(jnp.asarray(x)))
    np.testing.assert_allclose(out[..., 0], 1.0)
    np.testing.assert_allclose(out[..., 1], -1.0)


def test_scale_channel_stats():
    m, s = D.scale_channel_stats((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    assert m == (127.5, 127.5, 127.5)
    assert s == (63.75, 63.75, 63.75)
    m2, s2 = D.scale_channel_stats((127.5,) * 3, (63.75,) * 3)
    assert m2 == (127.5,) * 3  # already scaled: unchanged


def test_smooth_and_prepare_targets():
    import jax.numpy as jnp

    labels = jnp.asarray([[0, 1], [1, 0]], dtype=jnp.int32)  # (B=2, tiers=2)
    out = D.prepare_targets(labels, (2, 3), smoothing=0.1)
    assert isinstance(out, list) and len(out) == 2
    np.testing.assert_allclose(np.asarray(out[0][0]), [0.95, 0.05], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]).sum(axis=-1), 1.0, atol=1e-6)

    flat = D.prepare_targets(jnp.asarray([2]), 4, smoothing=0.0)
    np.testing.assert_allclose(np.asarray(flat), [[0, 0, 1, 0]])


def test_mixup_and_cutmix_preserve_target_mass():
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)
    images = jnp.ones((4, 8, 8, 3), dtype=jnp.float32)
    onehot = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 4)
    for fn in (D.mixup, D.cutmix):
        mixed, targets = fn(key, images, onehot)
        assert mixed.shape == images.shape
        np.testing.assert_allclose(np.asarray(targets).sum(axis=-1), 1.0, atol=1e-5)
    # multitask list targets
    mixed, targets = D.mixup(key, images, [onehot, onehot])
    assert isinstance(targets, list) and len(targets) == 2


def test_progressive_resize_static_shape():
    import jax.numpy as jnp

    x = jnp.zeros((2, 224, 224, 3))
    y = D.progressive_resize(x, 0.5)
    assert y.shape == (2, 112, 112, 3)
    assert D.progressive_resize(x, 1.0) is x


def test_loader_surfaces_worker_errors(tmp_path):
    """A failed decode raises in the consumer instead of silently truncating
    the epoch."""
    import numpy as np
    from PIL import Image as PILImage

    from hvt.data import folder as folder_lib
    from hvt.data import loader as loader_lib
    from hvt.data import transforms as T

    cls = "00001_animalia_chordata_mammalia_rodentia_muridae_mus_musculus"
    d = tmp_path / "train" / cls
    d.mkdir(parents=True)
    for i in range(3):
        PILImage.fromarray(
            np.zeros((16, 16, 3), np.uint8)
        ).save(d / f"ok{i}.png")  # png => PIL path (no native fallback)
    (d / "broken.png").write_bytes(b"this is not an image")

    ds = folder_lib.scan_image_folder(str(tmp_path), "train")
    loader = loader_lib.Loader(
        ds, T.EvalTransform(crop_size=16, resize_size=20), 2,
        num_workers=1, prefetch_batches=1,
    )
    with pytest.raises(RuntimeError, match="data loader worker failed"):
        for _ in loader.epoch(0):
            pass


def test_loader_early_exit_retires_producer(tmp_path):
    """Abandoning an epoch mid-iteration must not leak a blocked producer."""
    import threading

    import numpy as np
    from PIL import Image as PILImage

    from hvt.data import folder as folder_lib
    from hvt.data import loader as loader_lib
    from hvt.data import transforms as T

    cls = "00001_animalia_chordata_mammalia_rodentia_muridae_mus_musculus"
    d = tmp_path / "train" / cls
    d.mkdir(parents=True)
    for i in range(12):
        PILImage.fromarray(np.zeros((16, 16, 3), np.uint8)).save(d / f"{i}.png")

    ds = folder_lib.scan_image_folder(str(tmp_path), "train")
    loader = loader_lib.Loader(
        ds, T.EvalTransform(crop_size=16, resize_size=20), 2,
        num_workers=1, prefetch_batches=1,
    )
    before = threading.active_count()
    for _ in loader.epoch(0):
        break  # abandon after the first batch
    import gc

    gc.collect()  # close the abandoned generator deterministically
    import time

    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_random_resized_crop_distribution():
    """The crop sampler follows torchvision's RandomResizedCrop law
    (SURVEY.md §7 parity hard part): area fraction ~ U(0.08, 1), aspect
    ratio log-uniform in [3/4, 4/3], position uniform."""
    rng = np.random.default_rng(0)
    W = H = 100
    fracs, aspects, lefts = [], [], []
    for _ in range(4000):
        left, top, cw, ch = T.sample_crop_box(W, H, rng)
        assert 0 <= left <= W - cw and 0 <= top <= H - ch
        fracs.append(cw * ch / (W * H))
        aspects.append(cw / ch)
        lefts.append(left / max(W - cw, 1))
    fracs, aspects = np.asarray(fracs), np.asarray(aspects)
    # Area fraction is drawn U(0.08, 1) but crops whose (area, aspect) pair
    # exceeds the image are rejected and retried — exactly torchvision's
    # acceptance law, which thins large areas (mean ≈ 0.476 on a square
    # image, not the naive 0.54). Below frac 0.7 acceptance is ~certain, so
    # the histogram there must be flat.
    assert abs(fracs.mean() - 0.476) < 0.02
    assert fracs.min() < 0.12 and fracs.max() > 0.95
    hist, _ = np.histogram(fracs[fracs < 0.7], bins=8, range=(0.08, 0.7))
    assert hist.min() > 0.8 * hist.mean()
    # aspect ratio: log-uniform in [3/4, 4/3] → E[log] = 0, full support
    logs = np.log(aspects)
    assert abs(logs.mean()) < 0.02
    assert aspects.min() < 0.78 and aspects.max() > 1.28
    assert aspects.min() > 0.70 and aspects.max() < 1.40  # int rounding slack
    # position uniform across the valid range
    assert abs(np.mean(lefts) - 0.5) < 0.03


def test_random_resized_crop_fallback_clamps_ratio():
    """An extreme-aspect image exhausts the 10 attempts and takes the
    ratio-clamped center-crop fallback (torchvision semantics)."""
    rng = np.random.default_rng(1)
    # 300x40: in_ratio 7.5 >> 4/3 → fallback crop (40*4/3, 40), centered
    left, top, cw, ch = T.sample_crop_box(300, 40, rng, scale=(0.95, 1.0))
    assert (cw, ch) == (int(round(40 * 4 / 3)), 40)
    assert left == (300 - cw) // 2 and top == 0


def test_loader_native_failure_slot_falls_back_to_pil(image_root, monkeypatch):
    """When the native batch decoder reports a failed slot, the loader
    re-decodes exactly that slot through PIL (hvt/data/loader.py
    _native_batch_images) instead of yielding a black image."""
    from hvt.data import loader as loader_lib
    from hvt.data import native as native_lib
    from hvt.data.folder import scan_image_folder

    ds = scan_image_folder(image_root, "train")
    tf = T.TrainTransform(crop_size=24, resize_size=26)
    if not native_lib.available():
        pytest.skip("native decoder not built")

    real = native_lib.load_batch

    def failing_first_slot(paths, seeds, **kw):
        images, failures = real(paths, seeds, **kw)
        images[0] = 0  # simulate a slot the native core could not decode
        return images, failures + 1

    monkeypatch.setattr(loader_lib.native_lib, "load_batch", failing_first_slot)
    loader = loader_lib.Loader(ds, tf, 4, shuffle=False, drop_last=True,
                               num_workers=1, prefetch_batches=1)
    assert loader.use_native
    batch = next(iter(loader.epoch(0)))
    # the failed slot was PIL-decoded: not all-zero, matches direct decode
    assert batch.images[0].any()
    rng = np.random.default_rng((0, 0, int(loader.epoch_indices(0)[0])))
    want = loader_lib._decode_folder_sample(ds, int(loader.epoch_indices(0)[0]), tf, rng)
    np.testing.assert_array_equal(batch.images[0], want)


def test_native_path_applies_post_ops(image_root):
    """RandAugment/ColOut no longer disqualify the native decode path: the
    C++ core decodes+crops, then post_augment runs on the small arrays.
    Deterministic per (seed, epoch); differs from the augment-free batch."""
    from hvt.data import loader as loader_lib
    from hvt.data import native as native_lib
    from hvt.data.folder import scan_image_folder

    if not native_lib.available():
        pytest.skip("native decoder not built")
    ds = scan_image_folder(image_root, "train")
    tf_aug = T.TrainTransform(crop_size=24, resize_size=26,
                              randaugment_depth=1, randaugment_severity=9,
                              colout_p=(0.05, 0.05))
    tf_plain = T.TrainTransform(crop_size=24, resize_size=26)

    aug = loader_lib.Loader(ds, tf_aug, 4, shuffle=False, drop_last=True,
                            num_workers=1, prefetch_batches=1)
    assert aug.use_native  # the hot-recipe transform keeps the native core
    plain = loader_lib.Loader(ds, tf_plain, 4, shuffle=False, drop_last=True,
                              num_workers=1, prefetch_batches=1)

    a1 = next(iter(aug.epoch(0))).images
    a2 = next(iter(aug.epoch(0))).images
    np.testing.assert_array_equal(a1, a2)  # deterministic
    p = next(iter(plain.epoch(0))).images
    assert not np.array_equal(a1, p)  # augmentation actually applied
    assert a1.shape == p.shape  # ColOut resizes back to crop_size


def test_device_colout_laws():
    """Device ColOut (hvt/data/device.py): constant images stay constant
    through drop+resize, p=0 is identity, keys are deterministic, samples
    draw independent indices."""
    import jax
    import jax.numpy as jnp

    from hvt.data import device as device_prep

    key = jax.random.key(0)
    images = jnp.full((3, 32, 32, 3), 77, jnp.uint8)
    out = device_prep.colout(key, images, 0.15, 0.15)
    assert out.shape == images.shape and out.dtype == jnp.uint8
    # bilinear resize of a constant field is the same constant
    np.testing.assert_array_equal(np.asarray(out), 77)

    # p=0 → identity (no resize pass at all)
    same = device_prep.colout(key, images, 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(images))

    # p=1 keeps at least one row/col (host-path guard, transforms.colout)
    survived = device_prep.colout(key, images, 1.0, 1.0)
    assert survived.shape == images.shape

    # deterministic per key; different keys differ on structured input
    rng = np.random.default_rng(0)
    struct = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))
    a = np.asarray(device_prep.colout(jax.random.key(1), struct, 0.2, 0.2))
    b = np.asarray(device_prep.colout(jax.random.key(1), struct, 0.2, 0.2))
    c = np.asarray(device_prep.colout(jax.random.key(2), struct, 0.2, 0.2))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()
    # per-sample independence: the two rows of the batch get different drops
    two_same = jnp.stack([struct[0], struct[0]])
    d = np.asarray(device_prep.colout(jax.random.key(3), two_same, 0.2, 0.2))
    assert (d[0] != d[1]).any()


def test_device_colout_routing():
    """algorithms routing: ColOut device=true lands in StepSettings (and is
    skipped by the host transform); host mode is unchanged."""
    from hvt.data.loader import build_transform
    from hvt.train.algorithms import parse_algorithms

    base = {
        "run_name": "x",
        "model": {"name": "resnet_micro"},
        "machine": {"save_root": "/tmp"},
        "train_dataset": {"source": "synthetic", "synthetic_num_classes": 2,
                          "synthetic_num_samples": 4, "crop_size": 32,
                          "global_batch_size": 4},
    }
    dev_cfg = C.loads(base, {"algorithms": [
        {"cls": "ColOut", "args": {"p_row": 0.15, "p_col": 0.1, "device": True}}]})
    algos = parse_algorithms(dev_cfg)
    assert algos.colout_device == (0.15, 0.1)
    assert build_transform(dev_cfg, is_train=True).colout_p is None

    host_cfg = C.loads(base, {"algorithms": [
        {"cls": "ColOut", "args": {"p_row": 0.15, "p_col": 0.1}}]})
    algos = parse_algorithms(host_cfg)
    assert algos.colout_device is None
    assert build_transform(host_cfg, is_train=True).colout_p == (0.15, 0.1)


def test_device_randaugment_pointwise_ops_match_pil():
    """Every pointwise device-RA op (hvt/data/randaugment.py) reproduces
    PIL's law bit-exactly — the host path's own ops (transforms.py
    RANDAUGMENT_OPS) are thin PIL wrappers, so PIL is the oracle."""
    import jax.numpy as jnp
    from PIL import ImageEnhance, ImageOps

    from hvt.data import randaugment as R

    rng = np.random.default_rng(0)
    b, h, w = 4, 33, 29
    imgs = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    imgs[1] = rng.integers(90, 130, (h, w, 3), dtype=np.uint8)  # low range
    imgs[2] = 7  # constant (autocontrast/equalize identity branches)
    x = jnp.asarray(imgs)

    def check(dev, pil_fn):
        got = np.asarray(dev)
        want = np.stack([
            np.asarray(pil_fn(Image.fromarray(imgs[i])), dtype=np.uint8)
            for i in range(b)
        ])
        np.testing.assert_array_equal(got, want)

    sev = 9
    check(R.autocontrast(x), ImageOps.autocontrast)
    check(R.equalize(x), ImageOps.equalize)
    check(R.posterize(x, sev),
          lambda im: ImageOps.posterize(im, max(1, 8 - int(sev / 10 * 4))))
    check(R.solarize(x, sev),
          lambda im: ImageOps.solarize(im, 256 - int(sev / 10 * 256)))
    # enhance family at interpolation, extrapolation, and the 0.05 floor
    for f in (0.19, 1.0, 1.81, 0.05):
        fac = jnp.full((b,), f, jnp.float32)
        check(R.color(x, fac), lambda im: ImageEnhance.Color(im).enhance(f))
        check(R.contrast(x, fac),
              lambda im: ImageEnhance.Contrast(im).enhance(f))
        check(R.brightness(x, fac),
              lambda im: ImageEnhance.Brightness(im).enhance(f))
        check(R.sharpness(x, fac),
              lambda im: ImageEnhance.Sharpness(im).enhance(f))


def test_device_randaugment_geometric_ops_match_pil():
    """The five geometric device-RA ops reproduce PIL's affine matrices and
    resampling law (black outside mapped centers, edge-clamped taps,
    truncating store); residual is ≤1 grey level from float32 coordinate
    arithmetic (PIL computes in double)."""
    import jax.numpy as jnp

    from hvt.data import randaugment as R

    rng = np.random.default_rng(1)
    b, h, w = 3, 33, 29
    imgs = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    x = jnp.asarray(imgs)
    sev = 9
    lvl = sev / 10

    def warp_dev(op_idx, sign):
        op = np.full((b,), op_idx, np.int32)
        s = np.full((b,), sign, np.float32)
        return np.asarray(
            R._bilinear_warp(x, R._affine_matrices(
                jnp.asarray(op), jnp.asarray(s), sev, h, w))
        )

    def want(pil_fn):
        return np.stack([
            np.asarray(pil_fn(Image.fromarray(imgs[i])), dtype=np.uint8)
            for i in range(b)
        ])

    aff = Image.AFFINE
    bil = Image.BILINEAR
    cases = [
        (4, 1.0, lambda im: im.rotate(lvl * 30.0, bil)),
        (4, -1.0, lambda im: im.rotate(-lvl * 30.0, bil)),
        (5, 1.0, lambda im: im.transform(
            im.size, aff, (1, lvl * 0.3, 0, 0, 1, 0), bil)),
        (6, -1.0, lambda im: im.transform(
            im.size, aff, (1, 0, 0, -lvl * 0.3, 1, 0), bil)),
        (7, 1.0, lambda im: im.transform(
            im.size, aff, (1, 0, lvl * 0.45 * w, 0, 1, 0), bil)),
        (8, -1.0, lambda im: im.transform(
            im.size, aff, (1, 0, 0, 0, 1, -lvl * 0.45 * h), bil)),
    ]
    for op_idx, sign, pil_fn in cases:
        got, exp = warp_dev(op_idx, sign), want(pil_fn)
        diff = np.abs(got.astype(int) - exp.astype(int))
        assert diff.max() <= 1, (op_idx, sign, diff.max())
        assert (diff > 0).mean() < 0.01  # f32 rounding only

    # identity matrices (non-geometric rows) pass through exactly
    ident = np.asarray(
        R._bilinear_warp(x, R._affine_matrices(
            jnp.zeros((b,), jnp.int32), jnp.ones((b,), jnp.float32),
            sev, h, w))
    )
    np.testing.assert_array_equal(ident, imgs)


def test_device_randaugment_dispatch():
    """rand_augment: depth 0 is identity, shapes/dtype static, keys are
    deterministic, per-sample ops are independent, and depth composes."""
    import jax
    import jax.numpy as jnp

    from hvt.data import randaugment as R

    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 256, (8, 24, 24, 3), dtype=np.uint8))

    assert R.rand_augment(jax.random.key(0), imgs, depth=0) is imgs

    out = R.rand_augment(jax.random.key(0), imgs, depth=1, severity=9)
    assert out.shape == imgs.shape and out.dtype == jnp.uint8
    again = R.rand_augment(jax.random.key(0), imgs, depth=1, severity=9)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(again))
    other = R.rand_augment(jax.random.key(1), imgs, depth=1, severity=9)
    assert (np.asarray(out) != np.asarray(other)).any()

    # identical rows drift apart: op choice is per-sample
    two = jnp.stack([imgs[0], imgs[0], imgs[0], imgs[0]])
    d = np.asarray(R.rand_augment(jax.random.key(3), two, depth=1))
    assert any((d[0] != d[i]).any() for i in range(1, 4))

    # depth 2 differs from depth 1 under the same key
    deep = R.rand_augment(jax.random.key(0), imgs, depth=2, severity=9)
    assert (np.asarray(deep) != np.asarray(out)).any()


def test_device_randaugment_routing():
    """algorithms routing: RandAugment device=true lands in StepSettings
    (and the host transform delivers bare crops); host mode unchanged."""
    from hvt.data.loader import build_transform
    from hvt.train.algorithms import parse_algorithms

    base = {
        "run_name": "x",
        "model": {"name": "resnet_micro"},
        "machine": {"save_root": "/tmp"},
        "train_dataset": {"source": "synthetic", "synthetic_num_classes": 2,
                          "synthetic_num_samples": 4, "crop_size": 32,
                          "global_batch_size": 4},
    }
    dev_cfg = C.loads(base, {"algorithms": [
        {"cls": "RandAugment",
         "args": {"depth": 2, "severity": 7, "device": True}}]})
    algos = parse_algorithms(dev_cfg)
    assert algos.randaugment_device == (2, 7, True)
    assert build_transform(dev_cfg, is_train=True).randaugment_depth == 0

    host_cfg = C.loads(base, {"algorithms": [
        {"cls": "RandAugment", "args": {"depth": 2, "severity": 7}}]})
    algos = parse_algorithms(host_cfg)
    assert algos.randaugment_device is None
    tf = build_transform(host_cfg, is_train=True)
    assert tf.randaugment_depth == 2 and tf.randaugment_severity == 7


def test_device_equalize_compare_matches_sort_and_pil():
    """equalize's two histogram routes (sort+searchsorted for CPU,
    compare-reduce for TPU — hvt/data/randaugment.py equalize) agree
    bit-exactly with each other and with PIL on random, low-range, and
    constant images."""
    import jax.numpy as jnp
    from PIL import ImageOps

    from hvt.data import randaugment as R

    rng = np.random.default_rng(5)
    b, h, w = 4, 31, 27
    imgs = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    imgs[1] = rng.integers(100, 112, (h, w, 3), dtype=np.uint8)
    imgs[2] = 0
    imgs[3] = 255
    x = jnp.asarray(imgs)

    got_sort = np.asarray(R.equalize(x, method="sort"))
    got_cmp = np.asarray(R.equalize(x, method="compare"))
    np.testing.assert_array_equal(got_sort, got_cmp)
    want = np.stack([
        np.asarray(ImageOps.equalize(Image.fromarray(imgs[i])), np.uint8)
        for i in range(b)
    ])
    np.testing.assert_array_equal(got_cmp, want)


def test_fast_geometric_ops_match_gather_and_pil():
    """The banded static-shift geometric ops (shear/translate, the
    stratified TPU path) reproduce the gather warp's outputs (within the
    ±1 float32-vs-float64 coordinate residual) and PIL's, under the same
    bounds the gather path is pinned to."""
    import jax.numpy as jnp

    from hvt.data import randaugment as R

    rng = np.random.default_rng(6)
    b, h, w = 3, 33, 29
    imgs = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    x = jnp.asarray(imgs)
    sev = 9
    lvl = sev / 10
    aff, bil = Image.AFFINE, Image.BILINEAR

    cases = [  # (op index, PIL twin per sign)
        (5, "shear_x", lambda s, im: im.transform(
            im.size, aff, (1, s * lvl * 0.3, 0, 0, 1, 0), bil)),
        (6, "shear_y", lambda s, im: im.transform(
            im.size, aff, (1, 0, 0, s * lvl * 0.3, 1, 0), bil)),
        (7, "translate_x", lambda s, im: im.transform(
            im.size, aff, (1, 0, s * lvl * 0.45 * w, 0, 1, 0), bil)),
        (8, "translate_y", lambda s, im: im.transform(
            im.size, aff, (1, 0, 0, 0, 1, s * lvl * 0.45 * h), bil)),
    ]
    for op_idx, name, pil_fn in cases:
        for sgn in (1.0, -1.0):
            sign = jnp.full((b,), sgn, jnp.float32)
            fast = np.asarray(R._apply_op_static(
                name, x, sign, jnp.ones((b,), jnp.float32), sev))
            gather = np.asarray(R._bilinear_warp(x, R._affine_matrices(
                jnp.full((b,), op_idx, jnp.int32), sign, sev, h, w)))
            dg = np.abs(fast.astype(int) - gather.astype(int))
            assert dg.max() <= 1 and (dg > 0).mean() < 0.01, (name, sgn)
            want = np.stack([
                np.asarray(pil_fn(sgn, Image.fromarray(imgs[i])), np.uint8)
                for i in range(b)
            ])
            dp = np.abs(fast.astype(int) - want.astype(int))
            assert dp.max() <= 1 and (dp > 0).mean() < 0.01, (name, sgn)


def test_paeth_rotation_law():
    """The Paeth 3-shear rotation (stratified TPU path): the shear
    coordinate maps compose to exactly the rotation matrix; the black
    footprint matches PIL's; the interior deviates only by the documented
    chained-lerp smoothing (bounded below; small on smooth content)."""
    import jax.numpy as jnp

    from hvt.data import randaugment as R

    # (a) coordinate algebra: Sx(a)·Sy(b)·Sx(a) == R(theta)
    for theta in (0.31, -0.47, 0.05):
        a, bsh = -np.tan(theta / 2), np.sin(theta)
        sx = np.array([[1, a], [0, 1]])
        sy = np.array([[1, 0], [bsh, 1]])
        rot = np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]])
        np.testing.assert_allclose(sx @ sy @ sx, rot, atol=1e-12)

    rng = np.random.default_rng(7)
    b, h, w = 2, 33, 29
    noise = rng.integers(0, 256, (1, h, w, 3), dtype=np.uint8)
    gy, gx = np.mgrid[0:h, 0:w]
    smooth = np.stack([gx * 4 + gy * 3] * 3, -1).astype(np.uint8)  # ≤ 208
    imgs = np.concatenate([noise, smooth[None]], axis=0)
    x = jnp.asarray(imgs)
    sev = 9
    lvl = sev / 10

    for sgn in (1.0, -1.0):
        sign = jnp.full((b,), sgn, jnp.float32)
        fast = np.asarray(R._apply_op_static(
            "rotate", x, sign, jnp.ones((b,), jnp.float32), sev))
        want = np.stack([
            np.asarray(Image.fromarray(imgs[i]).rotate(
                sgn * lvl * 30.0, Image.BILINEAR), np.uint8)
            for i in range(b)
        ])
        # black footprint: both are exactly 0 outside the rotation map
        gxc, gyc = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        th = sgn * lvl * 30.0 * np.pi / 180.0
        u, v = gxc - w / 2.0, gyc - h / 2.0
        xsrc = np.cos(th) * u - np.sin(th) * v + w / 2.0
        ysrc = np.sin(th) * u + np.cos(th) * v + h / 2.0
        outside = ~((xsrc >= 0) & (xsrc < w) & (ysrc >= 0) & (ysrc < h))
        assert (fast[:, outside] == 0).all()
        assert (want[:, outside] == 0).all()
        # smooth content: chained lerps track direct bilerp closely
        ds = np.abs(fast[1].astype(int) - want[1].astype(int))[~outside]
        assert ds.max() <= 8 and ds.mean() < 1.0, (sgn, ds.max(), ds.mean())
        # noise content: bounded, and strongly correlated
        dn = np.abs(fast[0].astype(int) - want[0].astype(int))[~outside]
        assert dn.mean() < 16.0, (sgn, dn.mean())
        cc = np.corrcoef(fast[0][~outside].ravel().astype(float),
                         want[0][~outside].ravel().astype(float))[0, 1]
        assert cc > 0.9, cc


def test_stratified_randaugment_dispatch():
    """The stratified policy: deterministic under a key, static
    shape/dtype, varies across keys, handles B < 13 and B ≥ 13, and
    depth composes."""
    import jax
    import jax.numpy as jnp

    from hvt.data import randaugment as R

    rng = np.random.default_rng(8)
    for b in (5, 26):
        imgs = jnp.asarray(
            rng.integers(0, 256, (b, 24, 24, 3), dtype=np.uint8))
        out = R.rand_augment(jax.random.key(0), imgs, depth=1, severity=9)
        assert out.shape == imgs.shape and out.dtype == jnp.uint8
        again = R.rand_augment(jax.random.key(0), imgs, depth=1, severity=9)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(again))
        other = R.rand_augment(jax.random.key(1), imgs, depth=1, severity=9)
        assert (np.asarray(out) != np.asarray(other)).any()
        deep = R.rand_augment(jax.random.key(0), imgs, depth=2, severity=9)
        assert (np.asarray(deep) != np.asarray(out)).any()
