"""Per-op chip timing probe for device RandAugment.

Times each RandAugment op and the full policy (stratified and iid) on the
default backend at a production shape, with a host-fetch barrier after
every timed window (``jax.block_until_ready`` returns early on the axon
TPU runtime — see CLAUDE.md). The numbers that motivated the stratified
redesign are recorded in BENCH.md ("device-side RandAugment").

Usage::

    python -m hvt.tools.ra_probe [--batch 256] [--size 224] [--iters 5]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from hvt.data import randaugment as ra


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    b, h, w = args.batch, args.size, args.size
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    key = jax.random.key(0)
    print(f"backend={jax.default_backend()} shape=({b},{h},{w},3)")

    def timed(name, fn, inp=imgs, iters=args.iters):
        f = jax.jit(fn)
        out = f(inp)  # compile
        float(jnp.sum(out.astype(jnp.float32)))  # barrier
        t0 = time.perf_counter()
        x = inp
        for _ in range(iters):
            x = f(x)
        float(jnp.sum(x.astype(jnp.float32)))  # barrier
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:28s} {dt * 1e3:9.2f} ms/call")

    sev = 9
    fac = jnp.full((b,), 1.5, jnp.float32)
    mats = ra._affine_matrices(
        jnp.full((b,), 4), jnp.ones((b,)), sev, h, w)
    # Geometric ops only ever run on their stratified ~B/13 slice — time
    # them at that shape (the full-batch Paeth canvas chain exceeds HBM
    # at b256 and never occurs in the policy).
    ns = max(1, b // len(ra.OP_NAMES))
    sl = imgs[:ns]
    sgn_s = jnp.where(
        jnp.arange(ns) % 2 == 0, 1.0, -1.0).astype(jnp.float32)
    fac_s = fac[:ns]

    timed("autocontrast", ra.autocontrast)
    timed("posterize", lambda x: ra.posterize(x, sev))
    timed("solarize", lambda x: ra.solarize(x, sev))
    timed("color", lambda x: ra.color(x, fac))
    timed("contrast", lambda x: ra.contrast(x, fac))
    timed("brightness", lambda x: ra.brightness(x, fac))
    timed("sharpness", lambda x: ra.sharpness(x, fac))
    timed("equalize[auto]", ra.equalize, iters=2)
    timed("equalize[compare]", lambda x: ra.equalize(x, "compare"), iters=2)
    timed("warp[gather]", lambda x: ra._bilinear_warp(x, mats), iters=2)
    timed(f"rotate[paeth b={ns}]", lambda x: ra._apply_op_static(
        "rotate", x, sgn_s, fac_s, sev), inp=sl, iters=2)
    timed(f"shear_x[banded b={ns}]", lambda x: ra._apply_op_static(
        "shear_x", x, sgn_s, fac_s, sev), inp=sl, iters=2)
    timed(f"translate_x[banded b={ns}]", lambda x: ra._apply_op_static(
        "translate_x", x, sgn_s, fac_s, sev), inp=sl, iters=2)
    timed("full_ra[stratified]", lambda x: ra.rand_augment(key, x), iters=2)
    timed("full_ra[iid]", lambda x: ra.rand_augment(
        key, x, stratified=False), iters=2)


if __name__ == "__main__":
    main()
