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

TPU shape notes (chip-probed at b256·224², see BENCH.md "device RA"):

* the default policy is **stratified**: a random permutation assigns each
  of the 13 ops a static slice of ~B/13 images, so every op computes on
  1/13th of the batch instead of all candidates on all images (the MoE
  capacity trick with exact capacity). Per-image op marginals stay
  uniform up to ≤1/B (the B mod 13 remainder images always land on the
  first ops in OP_NAMES order); ops are no longer independent across
  images within a step. ``stratified=False`` restores the iid
  all-candidates + ``where`` policy (the exactness oracle).
* the geometric ops avoid XLA's general gather (which scalarizes on TPU:
  764 ms/b256 measured) — per-row/column constant shifts resolve their
  static integer offsets at compile time: a masked sum of aligned
  windows when offsets are few (translate), a barrel shifter
  (ceil(log₂ max-shift) roll+select passes, _barrel_select) when many
  (shears, rotation passes — the run-per-offset version measured
  106 ms/b19 for rotate; the barrel 22 ms), plus one 2-tap lerp
  (``_shift_x_rows``/``_shift_y_cols``) — exact for shear/translate;
  rotation is the Paeth 3-shear decomposition on a padded canvas with
  the exact rotation footprint masked at the end (law deviation vs
  PIL's direct bilinear: 3 chained 1-D lerps instead of one 2-D bilerp
  — the black region is exact, the interior slightly smoother; pinned
  by tests/test_data.py). The iid path keeps the exact per-sample
  gather warp.
* ``equalize`` dispatches by backend: a 256-lane compare-reduce
  histogram on accelerators (TPU sort over 50k-px rows measured
  667 ms/b256; the compare-reduce is a fused VPU pass), sort +
  searchsorted on CPU (where the compare costs 50× more than sort on
  the 1-core host).

Everything is static-shaped.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

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


def equalize(x: jax.Array, method: str = "auto") -> jax.Array:
    """Per-channel histogram equalization (PIL ImageOps.equalize law:
    step = (total - last_nonzero_bin) // 255; lut[i] = (step//2 +
    cumsum_{j<i} h[j]) // step; identity when ≤1 nonzero bin or step==0).

    Two routes to ``cum[v] = #pixels < v`` (the exclusive prefix sum the
    LUT needs), dispatched by trace-time backend when ``method="auto"``:

    * ``"sort"`` (CPU default): sort + searchsorted — sorting HW uint8
      values costs ~50× less than the broadcast compare on the 1-core
      CPU host (measured 15.4 s → 0.2 s/batch at b64·224²).
    * ``"compare"`` (accelerator default): a fused 256-lane
      compare-reduce — TPU's bitonic sort over 50k-px rows measured
      667 ms/b256·224² while the compare-reduce is one VPU pass over the
      uint8 pixels with the 256 levels on the lane dim; the final LUT
      application is a compare-sum too (TPU's 256-entry gather would
      scalarize).

    ``"auto"`` consults the declared kernel mesh first (the Trainer sets it
    before tracing, so an explicit CPU mesh picks "sort" even when the
    process-default platform is a TPU) and only falls back to
    ``jax.default_backend()`` outside a Trainer — never initialize the
    default backend from inside a mesh-pinned trace (on this machine the
    default platform is a force-registered TPU plugin whose client init
    can hang when the tunnel is down; see CLAUDE.md)."""
    if method == "auto":
        from hvt import parallel

        mesh = parallel.declared_kernel_mesh()
        platform = (
            mesh.devices.flat[0].platform
            if mesh is not None
            else jax.default_backend()
        )
        method = "sort" if platform == "cpu" else "compare"
    b, h, w, c = x.shape
    levels = jnp.arange(256, dtype=jnp.int32)

    if method == "sort":
        xi = x.astype(jnp.int32)
        xp = xi.transpose(0, 3, 1, 2).reshape(b, c, h * w)  # (B, C, HW)
        xs = jnp.sort(xp, axis=-1)
        # cum[v] = #pixels < v == exclusive prefix sum of the histogram.
        cum_ex = jax.vmap(jax.vmap(
            lambda a: jnp.searchsorted(a, levels, side="left")
        ))(xs).astype(jnp.int32)
    elif method == "compare":
        # (B,H,W,C,256) compare fused into the (1,2) reduce: pixels stay
        # uint8 and NHWC (no transpose), levels ride the 256-wide lane dim.
        lev_u8 = levels.astype(jnp.uint8)
        cum_ex = (x[..., None] < lev_u8).sum(
            axis=(1, 2), dtype=jnp.int32
        )  # (B, C, 256)
    else:
        raise ValueError(f"unknown equalize method {method!r}")

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
    lut = jnp.where(use_id[..., None], identity, lut)  # (B, C, 256)

    if method == "sort":
        xp = x.astype(jnp.int32).transpose(0, 3, 1, 2).reshape(b, c, h * w)
        out = jnp.take_along_axis(lut, xp, axis=-1)  # (B, C, HW)
        return out.reshape(b, c, h, w).transpose(0, 2, 3, 1).astype(jnp.uint8)
    # compare: LUT lookup as a masked lane-reduce (no gather on TPU).
    onehot = x[..., None] == levels.astype(jnp.uint8)  # (B,H,W,C,256)
    out = (onehot * lut[:, None, None, :, :]).sum(axis=-1, dtype=jnp.int32)
    return out.astype(jnp.uint8)


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
# Gather-free geometric ops: banded static shifts (the TPU path)
#
# XLA lowers the general per-pixel gather in _bilinear_warp to scalar
# dynamic-slices on TPU (764 ms at b256·224² measured). Every geometric op
# in the policy except rotation maps each output ROW (or column) to a
# single source row with a constant fractional x (or y) shift, and with a
# static severity and enumerable sign the integer part of that shift is a
# compile-time constant per row — so the whole op decomposes into a few
# dozen static slices of an edge-padded image plus a per-row lerp weight.
# Rotation is the Paeth 3-shear decomposition of the same machinery.
# ---------------------------------------------------------------------------


def _runs(k: np.ndarray):
    """Contiguous runs of equal value in a 1-D integer array →
    [(start, end, value)]. The shifts below are monotone in the row/column
    index, so runs are the natural banding."""
    k = np.asarray(k)
    idx = np.flatnonzero(np.diff(k)) + 1
    starts = np.concatenate([[0], idx])
    ends = np.concatenate([idx, [len(k)]])
    return [(int(s), int(e), int(k[s])) for s, e in zip(starts, ends)]


def _barrel_select(xt: jax.Array, s: np.ndarray, band_axis: int
                   ) -> jax.Array:
    """Shift row/column ``i`` of ``xt`` (major-axis-first layout) left by the
    static per-band amount ``s[i] ≥ 0`` along the major axis, in
    ``ceil(log2(max(s)+1))`` full-array roll+select passes (a barrel
    shifter with compile-time select masks). Wrap-around garbage from
    ``jnp.roll`` stays beyond the region later sliced out as long as the
    caller padded by ≥ max(s)+1 (see _shift_x_rows)."""
    bits = int(max(1, math.ceil(math.log2(int(s.max()) + 1)))) if s.max() > 0 else 0
    shape = [1] * xt.ndim
    shape[band_axis] = len(s)
    for j in range(bits):
        mask = ((s >> j) & 1).astype(bool)
        if not mask.any():
            continue
        mask_j = jnp.asarray(mask).reshape(shape)
        xt = jnp.where(mask_j, jnp.roll(xt, -(1 << j), axis=0), xt)
    return xt


def _shift_x_rows(xf: jax.Array, shift: np.ndarray, fill: bool = True
                  ) -> jax.Array:
    """Resample ``xf`` (N,H,W,C float32) at source index xs = xo + shift[yo]
    (a per-row constant x-shift) with the exact _bilinear_warp law
    restricted to ys == yo: 2-tap lerp, edge-clamped taps, black where the
    mapped corner-space center xo+0.5+shift leaves [0, W). ``shift`` is a
    static float64 (H,) array, so integer offsets are compile-time
    constants — no gather."""
    n, h, w, c = xf.shape
    shift = np.asarray(shift, np.float64)
    k = np.floor(shift).astype(np.int64)
    frac = (shift - k).astype(np.float32)
    left = max(0, -int(k.min()))
    right = max(0, int(k.max()) + 1)
    pad = jnp.pad(xf, ((0, 0), (0, 0), (left, right), (0, 0)), mode="edge")
    # All offset machinery runs with W moved to the MAJOR axis: static
    # slices/rolls of the tiled lane/sublane dims at arbitrary offsets
    # make XLA emit misaligned-window fusions (52 ms/pass for a 19-image
    # Paeth pass, 73% of the op, chip-profiled); major-axis windows are
    # tile-aligned reads. Two relayout transposes + aligned passes win.
    xt = jnp.moveaxis(pad, 2, 0)  # (W+pads, N, H, C)
    runs = _runs(k)
    s = (k + left).astype(np.int64)  # per-row shift into the padded frame
    bits = int(math.ceil(math.log2(int(s.max()) + 1))) if s.max() > 0 else 0
    if len(runs) <= bits + 1:
        # Few distinct offsets (translate: 1): a masked sum of static
        # aligned windows costs one pass per run.
        acc = jnp.zeros((w,) + (n, h, c), xf.dtype)
        for r0, r1, kk in runs:
            a = xt[left + kk:left + kk + w]
            b = xt[left + kk + 1:left + kk + 1 + w]
            band = (np.arange(h) >= r0) & (np.arange(h) < r1)
            wgt = np.where(band, frac, 0.0).astype(np.float32)
            cwgt = np.where(band, 1.0 - frac, 0.0).astype(np.float32)
            acc = acc + (jnp.asarray(cwgt)[None, None, :, None] * a
                         + jnp.asarray(wgt)[None, None, :, None] * b)
        out = jnp.moveaxis(acc, 0, 2)  # (N, H, W, C)
    else:
        # Many offsets (shears, Paeth rotation passes: ~0.3·W distinct
        # values): the run loop pays one full-canvas pass per offset
        # (106 ms/b19 for rotate, chip-measured). A barrel shifter does it
        # in ceil(log2(max_shift)) roll+select passes; the +1 lerp tap is
        # one more static roll of the shifted result. Wrap garbage from
        # roll lands at indices ≥ Wp − s[y] ≥ w (Wp − w = left + right >
        # max(s)), outside the slice kept below.
        at = _barrel_select(xt, s, band_axis=2)  # (Wp, N, H, C)
        a = at[:w]
        b = jnp.roll(at, -1, axis=0)[:w]
        wgt = jnp.asarray(frac)[None, None, :, None]
        out = jnp.moveaxis((1.0 - wgt) * a + wgt * b, 0, 2)
    if fill:
        xo = np.arange(w, dtype=np.float64) + 0.5
        valid = ((xo[None, :] + shift[:, None]) >= 0.0) & (
            (xo[None, :] + shift[:, None]) < w)
        out = out * jnp.asarray(valid, xf.dtype)[None, :, :, None]
    return out


def _shift_y_cols(xf: jax.Array, shift: np.ndarray, fill: bool = True
                  ) -> jax.Array:
    """The y-axis twin of _shift_x_rows: source ys = yo + shift[xo], a
    per-column constant y-shift. Exactly the x-shift of the HW-transposed
    image (the law is symmetric in the axes), so it IS that — the logical
    swapaxes folds into _shift_x_rows's own relayout."""
    return _shift_x_rows(xf.swapaxes(1, 2), shift, fill).swapaxes(1, 2)


def _rotate_paeth(xf: jax.Array, sgn: float, severity: int) -> jax.Array:
    """Rotation as the Paeth 3-shear decomposition: with a = -tan(θ/2) and
    b = sinθ the per-axis shears Sx(a)·Sy(b)·Sx(a) compose to exactly the
    output→input rotation map _affine_matrices builds for op 4 (the
    coordinate algebra is checked in tests/test_data.py). Each pass is a
    banded static shift on a zero-padded canvas sized so rotated content
    never clips mid-pass; the exact rotation footprint (PIL's black
    region, computed in float64) is applied at the end. Law deviation vs
    the gather path: three chained 1-D lerps instead of one 2-D bilerp —
    interiors are slightly smoother; the black region is exact."""
    n, h, w, c = xf.shape
    theta = sgn * (severity / _MAX_SEVERITY * 30.0) * (math.pi / 180.0)
    a = -math.tan(theta / 2.0)
    b = math.sin(theta)
    # Canvas margin: content grows |a|·h/2 in x (pass 1), then
    # |b|·(w/2 + g1) in y (pass 2), then |a|·(h/2 + g2) in x (pass 3).
    g1 = abs(a) * h / 2.0
    g2 = abs(b) * (w / 2.0 + g1)
    g3 = abs(a) * (h / 2.0 + g2)
    m = int(math.ceil(max(g1 + g3, g2))) + 1
    cx, cy = m + w / 2.0, m + h / 2.0
    # Replicate-pad the canvas: mid-pass taps that leave the content
    # approximate PIL's edge-clamped taps (zero padding would fade the
    # content boundary toward black); everything outside the exact
    # footprint is masked off below regardless.
    canvas = jnp.pad(xf, ((0, 0), (m, m), (m, m), (0, 0)), mode="edge")
    ys = np.arange(h + 2 * m, dtype=np.float64) + 0.5
    xs = np.arange(w + 2 * m, dtype=np.float64) + 0.5
    sh_rows = a * (ys - cy)
    sh_cols = b * (xs - cx)
    t = _shift_x_rows(canvas, sh_rows, fill=False)
    t = _shift_y_cols(t, sh_cols, fill=False)
    t = _shift_x_rows(t, sh_rows, fill=False)
    t = t[:, m:m + h, m:m + w, :]
    # Exact rotation footprint, float64 (PIL computes in double).
    gx, gy = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    u, v = gx - w / 2.0, gy - h / 2.0
    xsrc = math.cos(theta) * u - math.sin(theta) * v + w / 2.0
    ysrc = math.sin(theta) * u + math.cos(theta) * v + h / 2.0
    valid = (xsrc >= 0) & (xsrc < w) & (ysrc >= 0) & (ysrc < h)
    return t * jnp.asarray(valid, xf.dtype)[None, :, :, None]


def _signed_variants(x: jax.Array, sign: jax.Array, fn,
                     flip_axis: int = 2) -> jax.Array:
    """Geometric dispatch for the stratified path: the shift arrays above
    need a static sign. A mirror conjugates the sign exactly —
    ``F ∘ op₊ ∘ F = op₋`` for every op here (the bilinear taps, edge
    clamp, and black-fill window all mirror with the image; rotation
    reverses orientation under a reflection) — so the op is computed ONCE
    at +severity on mirror-adjusted inputs instead of twice
    (chip-measured ~2× on the geometric ops, which dominate the policy).
    ``flip_axis``: 2 (W) for x-ops and rotation, 1 (H) for y-ops.
    Quantize once with the warp law (floor, clip, uint8)."""
    xf = x.astype(jnp.float32)
    pos_mask = (sign > 0)[:, None, None, None]
    xin = jnp.where(pos_mask, xf, jnp.flip(xf, axis=flip_axis))
    out = fn(xin, 1.0)
    out = jnp.where(pos_mask, out, jnp.flip(out, axis=flip_axis))
    return jnp.clip(jnp.floor(out), 0.0, 255.0).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# The policy
# ---------------------------------------------------------------------------


def _apply_op_static(name: str, x: jax.Array, sign: jax.Array,
                     factor: jax.Array, severity: int) -> jax.Array:
    """Apply one statically-known op to its stratified slice."""
    _, h, w, _ = x.shape
    lvl = severity / _MAX_SEVERITY
    if name == "autocontrast":
        return autocontrast(x)
    if name == "equalize":
        return equalize(x)
    if name == "posterize":
        return posterize(x, severity)
    if name == "solarize":
        return solarize(x, severity)
    if name == "color":
        return color(x, factor)
    if name == "contrast":
        return contrast(x, factor)
    if name == "brightness":
        return brightness(x, factor)
    if name == "sharpness":
        return sharpness(x, factor)
    ys = np.arange(h, dtype=np.float64) + 0.5
    xs = np.arange(w, dtype=np.float64) + 0.5
    if name == "rotate":
        return _signed_variants(
            x, sign, lambda xf, s: _rotate_paeth(xf, s, severity))
    if name == "shear_x":
        return _signed_variants(
            x, sign, lambda xf, s: _shift_x_rows(xf, s * (lvl * 0.3) * ys))
    if name == "shear_y":
        return _signed_variants(
            x, sign, lambda xf, s: _shift_y_cols(xf, s * (lvl * 0.3) * xs),
            flip_axis=1)
    if name == "translate_x":
        return _signed_variants(
            x, sign,
            lambda xf, s: _shift_x_rows(xf, np.full(h, s * lvl * 0.45 * w)))
    if name == "translate_y":
        return _signed_variants(
            x, sign,
            lambda xf, s: _shift_y_cols(xf, np.full(w, s * lvl * 0.45 * h)),
            flip_axis=1)
    raise ValueError(f"unknown op {name!r}")


def _apply_stratified(x: jax.Array, key: jax.Array, severity: int
                      ) -> jax.Array:
    """One stratified RandAugment round: a random permutation deals each op
    a static slice of ~B/13 images (uniform per-image op marginals up to
    the ≤1/B remainder bias; ops are not independent across images), each
    op computes only on its slice, and the inverse permutation restores
    batch order. All slice boundaries are compile-time constants."""
    b = x.shape[0]
    n = len(OP_NAMES)
    kperm, ksign = jax.random.split(key)
    perm = jax.random.permutation(kperm, b)
    sign = jnp.where(
        jax.random.bernoulli(ksign, 0.5, (b,)), 1.0, -1.0
    ).astype(jnp.float32)
    lvl = severity / _MAX_SEVERITY
    factor = jnp.maximum(0.05, 1.0 + sign * (lvl * 0.9))
    xp = jnp.take(x, perm, axis=0)

    sizes = [b // n + (1 if i < b % n else 0) for i in range(n)]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    pieces = []
    for i, name in enumerate(OP_NAMES):
        if sizes[i] == 0:
            continue
        sl = slice(int(offs[i]), int(offs[i + 1]))
        pieces.append(
            _apply_op_static(name, xp[sl], sign[sl], factor[sl], severity))
    out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)
    return jnp.take(out, jnp.argsort(perm), axis=0)


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
                 severity: int = 9, stratified: bool = True) -> jax.Array:
    """Device-side RandAugment over a uint8 NHWC batch.

    Each of the ``depth`` rounds assigns one of the 13 ops per sample
    (host law: transforms.py rand_augment) with an independent sign flip
    for the signed magnitudes. ``stratified=True`` (the default, and the
    TPU-fast path) deals ops via a random permutation into static per-op
    slices so each op computes on ~B/13 images; ``stratified=False`` is
    the iid all-candidates policy with per-sample gather warps (the
    exactness oracle; slow on TPU). Static shapes throughout."""
    if depth <= 0:
        return images
    if images.dtype != jnp.uint8:
        raise ValueError(
            f"device RandAugment operates on uint8 pixel batches "
            f"(pre-normalization), got {images.dtype}"
        )
    n = len(OP_NAMES)
    for _ in range(int(depth)):
        if stratified:
            key, kr = jax.random.split(key)
            images = _apply_stratified(images, kr, severity)
            continue
        key, kop, ksign = jax.random.split(key, 3)
        op = jax.random.randint(kop, (images.shape[0],), 0, n)
        sign = jnp.where(
            jax.random.bernoulli(ksign, 0.5, (images.shape[0],)), 1.0, -1.0
        ).astype(jnp.float32)
        images = _apply_one(images, op, sign, severity)
    return images
