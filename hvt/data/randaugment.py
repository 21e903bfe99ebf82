"""Device-side RandAugment — the full 13-op policy inside the compiled step.

The reference's recipes request RandAugment (configs/recipes/hot.yaml:44-47)
through Composer, which would run PIL ops on the host dataloader workers;
hvt's host path does the same (hvt/data/transforms.py rand_augment). On a
TPU host the PIL pass costs ~1-2 ms/img/core and bounds input-bound
training, so — like ColOut (hvt/data/device.py colout) — RandAugment gets
an opt-in device mode (``{cls: RandAugment, args: {device: true}}``): the
whole policy runs as batched jnp ops fused into the train step, and the
host pipeline delivers bare crops.

Law parity with the host path (same op set, same severity laws, same
uniform op choice and sign flips — transforms.py RANDAUGMENT_OPS order):

* pointwise ops (autocontrast, equalize, posterize, solarize, color,
  contrast, brightness, sharpness) reproduce PIL's integer/float laws
  bit-exactly (tests/test_data.py pins each against PIL);
* geometric ops (rotate, shear x/y, translate x/y) reproduce PIL's
  output→input affine matrices AND its resampling law (probed
  empirically: black fill when the mapped corner-space center leaves the
  image, edge-clamped bilinear taps otherwise, truncating store) —
  residual is ±1 on ~0.1% of pixels from float32 vs double coordinate
  arithmetic (tests pin max diff ≤ 1);
* RNG streams are jax PRNG, not the host numpy streams — per-sample op
  choice is distribution-equivalent, not stream-equivalent.

TPU shape notes: one inverse-affine gather pass covers all five geometric
ops (per-sample 2×3 matrices, identity for non-geometric rows — exact
pass-through at integer coordinates); the pointwise candidates are
elementwise/reduction passes XLA fuses; per-sample selection is a
``where`` over the batch dim. Everything is static-shaped.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Index order MUST match the host policy (transforms.py RANDAUGMENT_OPS).
OP_NAMES = (
    "autocontrast", "equalize", "posterize", "solarize", "rotate",
    "shear_x", "shear_y", "translate_x", "translate_y", "color",
    "contrast", "brightness", "sharpness",
)
_MAX_SEVERITY = 10  # transforms.py _MAX_SEVERITY


# ---------------------------------------------------------------------------
# Pointwise ops (exact PIL laws, batched)
# ---------------------------------------------------------------------------


def autocontrast(x: jax.Array) -> jax.Array:
    """Per-channel min/max stretch (PIL ImageOps.autocontrast, cutoff=0).

    PIL builds ``lut[ix] = int(ix*scale + offset)`` with scale=255/(hi-lo),
    offset=-lo*scale; every pixel lies in [lo, hi], where that float law
    equals the exact integer ``255*(ix-lo) // (hi-lo)``."""
    xi = x.astype(jnp.int32)
    lo = xi.min(axis=(1, 2), keepdims=True)
    hi = xi.max(axis=(1, 2), keepdims=True)
    span = hi - lo
    stretched = (255 * (xi - lo)) // jnp.maximum(span, 1)
    return jnp.where(span > 0, stretched, xi).astype(jnp.uint8)


def equalize(x: jax.Array) -> jax.Array:
    """Per-channel histogram equalization (PIL ImageOps.equalize law:
    step = (total - last_nonzero_bin) // 255; lut[i] = (step//2 +
    cumsum_{j<i} h[j]) // step; identity when ≤1 nonzero bin or step==0).

    The histogram comes from sort + searchsorted rather than a 256-level
    compare-reduce: ``cum[v] = #pixels < v`` IS the exclusive prefix sum
    the LUT needs, and sorting HW uint8 values costs ~50× less than the
    broadcast compare (measured 15.4 s → 0.2 s/batch on the 1-core CPU
    host at b64·224²)."""
    b, h, w, c = x.shape
    xi = x.astype(jnp.int32)
    xp = xi.transpose(0, 3, 1, 2).reshape(b, c, h * w)  # (B, C, HW)
    xs = jnp.sort(xp, axis=-1)
    levels = jnp.arange(256, dtype=jnp.int32)
    # cum[v] = #pixels < v == exclusive prefix sum of the histogram.
    cum_ex = jax.vmap(jax.vmap(
        lambda a: jnp.searchsorted(a, levels, side="left")
    ))(xs).astype(jnp.int32)
    total = jnp.full((b, c, 1), h * w, jnp.int32)
    hist = jnp.diff(jnp.concatenate([cum_ex, total], axis=-1), axis=-1)

    nz = hist > 0
    n_nonzero = nz.sum(axis=-1)  # (B, C)
    last_idx = 255 - jnp.argmax(nz[..., ::-1], axis=-1)
    last = jnp.take_along_axis(hist, last_idx[..., None], axis=-1)[..., 0]
    step = (h * w - last) // 255  # (B, C)

    lut = (step[..., None] // 2 + cum_ex) // jnp.maximum(step[..., None], 1)
    lut = jnp.clip(lut, 0, 255)
    identity = jnp.broadcast_to(levels, lut.shape)
    use_id = (n_nonzero <= 1) | (step == 0)
    lut = jnp.where(use_id[..., None], identity, lut)

    out = jnp.take_along_axis(lut, xp, axis=-1)  # (B, C, HW)
    return out.reshape(b, c, h, w).transpose(0, 2, 3, 1).astype(jnp.uint8)


def posterize(x: jax.Array, severity: int) -> jax.Array:
    """Keep the top ``bits`` bits (PIL ImageOps.posterize; host law
    bits = 8 - int(sev/10*4), floored at 1 — transforms.py _posterize)."""
    bits = max(1, 8 - int(severity / _MAX_SEVERITY * 4))
    mask = (0xFF << (8 - bits)) & 0xFF
    return (x.astype(jnp.int32) & mask).astype(jnp.uint8)


def solarize(x: jax.Array, severity: int) -> jax.Array:
    """Invert pixels ≥ threshold (PIL ImageOps.solarize; host law
    threshold = 256 - int(sev/10*256) — transforms.py _solarize)."""
    threshold = 256 - int(severity / _MAX_SEVERITY * 256)
    xi = x.astype(jnp.int32)
    return jnp.where(xi < threshold, xi, 255 - xi).astype(jnp.uint8)


def _grayscale(x: jax.Array) -> jax.Array:
    """PIL convert("L") integer law: (19595R + 38470G + 7471B + 2^15) >> 16."""
    xi = x.astype(jnp.int32)
    return (
        19595 * xi[..., 0] + 38470 * xi[..., 1] + 7471 * xi[..., 2] + 32768
    ) >> 16


def _blend(degenerate: jax.Array, image: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL Image.blend / ImageEnhance law: float32
    ``in1 + factor*(in2 - in1)``, clipped to [0, 255], truncated to uint8.
    ``factor`` is per-sample (B,) — PIL enhance supports extrapolation >1."""
    f = factor.astype(jnp.float32)[:, None, None, None]
    v = degenerate.astype(jnp.float32) + f * (
        image.astype(jnp.float32) - degenerate.astype(jnp.float32)
    )
    return jnp.clip(v, 0.0, 255.0).astype(jnp.uint8)


def color(x: jax.Array, factor: jax.Array) -> jax.Array:
    """Saturation (PIL ImageEnhance.Color): blend with the grayscale image."""
    gray = _grayscale(x)[..., None].astype(jnp.uint8)
    return _blend(jnp.broadcast_to(gray, x.shape), x, factor)


def contrast(x: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL ImageEnhance.Contrast: blend with the solid round-half-up mean of
    the grayscale image (ImageStat mean + 0.5, truncated)."""
    b, h, w, _ = x.shape
    gsum = _grayscale(x).sum(axis=(1, 2))  # (B,) int32, exact
    total = h * w
    mean = (2 * gsum + total) // (2 * total)  # floor(gsum/total + 0.5)
    deg = jnp.broadcast_to(
        mean[:, None, None, None].astype(jnp.uint8), x.shape
    )
    return _blend(deg, x, factor)


def brightness(x: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL ImageEnhance.Brightness: blend with black."""
    return _blend(jnp.zeros_like(x), x, factor)


def sharpness(x: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL ImageEnhance.Sharpness: blend with the SMOOTH-filtered image
    (3×3 kernel [[1,1,1],[1,5,1],[1,1,1]]/13; PIL leaves the 1-px border
    unfiltered)."""
    xf = x.astype(jnp.float32)
    p = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = (
        p[:, :-2, :-2] + p[:, :-2, 1:-1] + p[:, :-2, 2:]
        + p[:, 1:-1, :-2] + 5.0 * p[:, 1:-1, 1:-1] + p[:, 1:-1, 2:]
        + p[:, 2:, :-2] + p[:, 2:, 1:-1] + p[:, 2:, 2:]
    )
    sm = jnp.clip(jnp.floor(acc / 13.0 + 0.5), 0.0, 255.0)
    # border pixels stay unfiltered (PIL copies them through)
    bi, hi = x.shape[1], x.shape[2]
    row = jnp.arange(bi)[None, :, None]
    col = jnp.arange(hi)[None, None, :]
    interior = (
        (row > 0) & (row < bi - 1) & (col > 0) & (col < hi - 1)
    )[..., None]
    deg = jnp.where(interior, sm, xf).astype(jnp.uint8)
    return _blend(deg, x, factor)


# ---------------------------------------------------------------------------
# Geometric ops: one batched inverse-affine bilinear pass
# ---------------------------------------------------------------------------


def _bilinear_warp(x: jax.Array, mats: jax.Array) -> jax.Array:
    """Sample ``x`` (B,H,W,C uint8) at per-sample output→input affine maps
    ``mats`` (B,6) = (a,b,c,d,e,f): source = (a·xo+b·yo+c, d·xo+e·yo+f) in
    PIL's pixel-corner coordinates (evaluated at output pixel centers
    xo+0.5). PIL's edge law (probed empirically, pinned by
    tests/test_data.py): a pixel whose mapped center falls outside
    [0,W)×[0,H) is black; in-bounds centers bilinear-sample with
    edge-clamped (replicate) taps."""
    b, h, w, c = x.shape
    yo, xo = jnp.mgrid[0:h, 0:w]
    xo = xo.astype(jnp.float32) + 0.5
    yo = yo.astype(jnp.float32) + 0.5
    a, bb, cc, d, e, f = (mats[:, i][:, None, None] for i in range(6))
    xs = a * xo + bb * yo + cc  # PIL corner space
    ys = d * xo + e * yo + f
    valid = ((xs >= 0) & (xs < w) & (ys >= 0) & (ys < h))[..., None]
    xs = xs - 0.5  # → source index space
    ys = ys - 0.5

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    xf = x.astype(jnp.float32)

    def tap(yi, xi):
        return jax.vmap(lambda im, yy, xx: im[yy, xx])(
            xf, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)
        )

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    out = (
        (1 - wy) * ((1 - wx) * v00 + wx * v01)
        + wy * ((1 - wx) * v10 + wx * v11)
    )
    # PIL truncates the bilinear result (no +0.5; pinned empirically).
    out = jnp.clip(jnp.floor(out), 0.0, 255.0)
    return jnp.where(valid, out, 0.0).astype(jnp.uint8)


def _affine_matrices(op: jax.Array, sign: jax.Array, severity: int,
                     h: int, w: int) -> jax.Array:
    """Per-sample PIL-convention affine matrices for ops 4-8; identity for
    every other op (exact pass-through under _bilinear_warp)."""
    lvl = severity / _MAX_SEVERITY
    theta = sign * (lvl * 30.0) * (math.pi / 180.0)  # rotate (host _rotate)
    shear = sign * (lvl * 0.3)  # _shear_x/_shear_y
    tx = sign * (lvl * 0.45 * w)  # _translate_x
    ty = sign * (lvl * 0.45 * h)  # _translate_y

    one = jnp.ones_like(sign)
    zero = jnp.zeros_like(sign)
    a, b_, c_, d, e, f = one, zero, zero, zero, one, zero

    # PIL Image.rotate(angle) negates the angle before building the
    # output→input matrix about the center (w/2, h/2): with φ = -θ the
    # matrix is [cosθ, -sinθ, c; sinθ, cosθ, f].
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = w / 2.0, h / 2.0
    rot = op == 4
    a = jnp.where(rot, cos, a)
    b_ = jnp.where(rot, -sin, b_)
    c_ = jnp.where(rot, cx - cos * cx + sin * cy, c_)
    d = jnp.where(rot, sin, d)
    e = jnp.where(rot, cos, e)
    f = jnp.where(rot, cy - sin * cx - cos * cy, f)

    b_ = jnp.where(op == 5, shear, b_)  # shear_x: (1, v, 0, 0, 1, 0)
    d = jnp.where(op == 6, shear, d)  # shear_y: (1, 0, 0, v, 1, 0)
    c_ = jnp.where(op == 7, tx, c_)  # translate_x: (1, 0, v, 0, 1, 0)
    f = jnp.where(op == 8, ty, f)  # translate_y: (1, 0, 0, 0, 1, v)

    return jnp.stack([a, b_, c_, d, e, f], axis=1)


# ---------------------------------------------------------------------------
# The policy
# ---------------------------------------------------------------------------


def _apply_one(x: jax.Array, op: jax.Array, sign: jax.Array,
               severity: int) -> jax.Array:
    """One RandAugment step: per-sample op ∈ [0, 13), per-sample sign."""
    b, h, w, _ = x.shape
    lvl = severity / _MAX_SEVERITY

    out = _bilinear_warp(x, _affine_matrices(op, sign, severity, h, w))

    # PIL enhance factor law (transforms.py _enhance): 1 + ±(lvl·0.9),
    # floored at 0.05.
    factor = jnp.maximum(0.05, 1.0 + sign * (lvl * 0.9))
    pointwise = (
        (0, autocontrast(x)),
        (1, equalize(x)),
        (2, posterize(x, severity)),
        (3, solarize(x, severity)),
        (9, color(x, factor)),
        (10, contrast(x, factor)),
        (11, brightness(x, factor)),
        (12, sharpness(x, factor)),
    )
    for idx, cand in pointwise:
        out = jnp.where((op == idx)[:, None, None, None], cand, out)
    return out


def rand_augment(key: jax.Array, images: jax.Array, depth: int = 1,
                 severity: int = 9) -> jax.Array:
    """Device-side RandAugment over a uint8 NHWC batch.

    Each of the ``depth`` rounds picks one of the 13 ops uniformly per
    sample (host law: transforms.py rand_augment) with an independent
    sign flip for the signed magnitudes. Static shapes throughout; the
    recipes' depth=1, severity=9 costs one warp pass + the fused
    pointwise candidates per step."""
    if depth <= 0:
        return images
    if images.dtype != jnp.uint8:
        raise ValueError(
            f"device RandAugment operates on uint8 pixel batches "
            f"(pre-normalization), got {images.dtype}"
        )
    n = len(OP_NAMES)
    for _ in range(int(depth)):
        key, kop, ksign = jax.random.split(key, 3)
        op = jax.random.randint(kop, (images.shape[0],), 0, n)
        sign = jnp.where(
            jax.random.bernoulli(ksign, 0.5, (images.shape[0],)), 1.0, -1.0
        ).astype(jnp.float32)
        images = _apply_one(images, op, sign, severity)
    return images
