"""Native C++ decode core vs the PIL pipeline."""

import numpy as np
import pytest
from PIL import Image

from hvt.data import native
from hvt.data import transforms as T

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decoder not built (no g++/libjpeg)"
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(80, 100), (64, 64), (200, 150)]):
        # smooth gradient images compress losslessly-ish -> tight comparisons
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack(
            [(yy * 255 / h), (xx * 255 / w), ((yy + xx) * 255 / (h + w))], axis=-1
        ).astype(np.uint8)
        p = root / f"img{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_eval_decode_close_to_pil(jpegs):
    out, failures = native.load_batch(
        jpegs, None, is_train=False, resize_size=48, out_size=40
    )
    assert failures == 0
    assert out.shape == (3, 40, 40, 3)

    tf = T.EvalTransform(crop_size=40, resize_size=48)
    for i, p in enumerate(jpegs):
        with Image.open(p) as img:
            want = tf(img)
        # independent resampling implementations on JPEG data: allow small
        # per-pixel deviation, tight mean deviation
        diff = np.abs(out[i].astype(int) - want.astype(int))
        assert diff.mean() < 6.0, diff.mean()


def test_train_decode_deterministic_per_seed(jpegs):
    a, _ = native.load_batch(jpegs, [7, 8, 9], is_train=True, resize_size=-1, out_size=32)
    b, _ = native.load_batch(jpegs, [7, 8, 9], is_train=True, resize_size=-1, out_size=32)
    c, _ = native.load_batch(jpegs, [1, 2, 3], is_train=True, resize_size=-1, out_size=32)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (3, 32, 32, 3)
    # crops come from the source image: values within observed range
    assert a.max() > 0


def test_failure_slots_counted(jpegs, tmp_path):
    bad = str(tmp_path / "missing.jpg")
    out, failures = native.load_batch(
        [jpegs[0], bad], None, is_train=False, resize_size=48, out_size=32
    )
    assert failures == 1
    assert out[0].any()
    assert not out[1].any()


def test_loader_uses_native_and_matches_mask(tmp_path):
    from hvt.data import folder as F
    from hvt.data import loader as L

    rng = np.random.default_rng(0)
    name = "00001_a_b_c_d_e_f_g"
    for split in ("train", "val"):
        d = tmp_path / split / name
        d.mkdir(parents=True)
        for i in range(6):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(d / f"{i}.jpg")

    ds = F.scan_image_folder(tmp_path, "train")
    loader = L.Loader(ds, T.TrainTransform(crop_size=32), 4, shuffle=True,
                      drop_last=False, seed=1, num_workers=2)
    assert loader.use_native
    batches = list(loader.epoch(0))
    assert batches[0].images.shape == (4, 32, 32, 3)
    assert batches[-1].mask.sum() == 2

    # RandAugment no longer forfeits the native core: it applies after the
    # crop, so the loader keeps native decode+crop and runs post_augment over
    # the small arrays (tests/test_data.py covers the hybrid output).
    loader2 = L.Loader(ds, T.TrainTransform(crop_size=32, randaugment_depth=1), 4,
                       seed=1, num_workers=2)
    assert loader2.use_native

    # Non-JPEG sources are the remaining genuine PIL fallback.
    png_dir = tmp_path / "png" / name
    png_dir.mkdir(parents=True)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(png_dir / f"{i}.png")
    ds_png = F.scan_image_folder(tmp_path / "png", ".")
    loader3 = L.Loader(ds_png, T.TrainTransform(crop_size=32), 4,
                       seed=1, num_workers=2)
    assert not loader3.use_native
    b = next(iter(loader3.epoch(0)))
    assert b.images.shape == (4, 32, 32, 3)


def test_decode_eval_buffer_matches_file_path(tmp_path):
    """The serving-path in-memory decode (hvt_decode_eval_buffer) is
    bit-identical to the loader's file-path eval decode, and non-JPEG
    bytes return None (PIL fallback contract in serve.predict_image)."""
    import io

    from PIL import Image

    from hvt.data import native

    if not native.available():
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (375, 500, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    data = buf.getvalue()
    p = tmp_path / "x.jpg"
    p.write_bytes(data)

    mem = native.decode_eval(data, resize_size=256, out_size=224)
    file_out, fails = native.load_batch(
        [str(p)], None, is_train=False, resize_size=256, out_size=224,
        num_threads=1,
    )
    assert fails == 0 and mem is not None
    np.testing.assert_array_equal(mem, file_out[0])

    png = io.BytesIO()
    Image.fromarray(img).save(png, format="PNG")
    assert native.decode_eval(png.getvalue(), resize_size=256,
                              out_size=224) is None
