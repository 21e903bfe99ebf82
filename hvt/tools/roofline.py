"""Device characterization: matmul roofline + HBM bandwidth probes.

Measures what the chip actually delivers (the numbers BENCH.md's roofline
table cites), with the methodology this runtime requires:

* every timed region ends in a host fetch of a value data-dependent on all
  the work (``jax.block_until_ready`` returns early on the axon runtime),
* K ops are chained inside ONE compiled program per fetch, so the tunnel's
  ~0.1-0.3 s host-fetch latency is amortized instead of counted K times —
  the round-1 probe timed one matmul per fetch and under-reported compute
  by ~5x (BENCH.md round-1 said 17 TF/s while the R50 train step implied
  ~30 TF/s; both numbers are re-derived consistently here).

Usage: python -m hvt.tools.roofline [--sizes 1024,2048,4096,8192] [--chain 32]
Prints one JSON line per probe.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _barrier(x) -> float:
    """True device barrier: host fetch of a scalar depending on the work."""
    return float(jnp.sum(x).astype(jnp.float32))


def matmul_tflops(n: int, chain: int, dtype=jnp.bfloat16, repeats: int = 3) -> dict:
    """Chained n×n matmuls in one program; returns best-of-repeats TF/s."""

    @jax.jit
    def run(a, b):
        c = a
        for _ in range(chain):
            c = c @ b
        return c

    key = jax.random.key(0)
    a = jax.random.normal(key, (n, n), dtype)
    b = jax.random.normal(jax.random.key(1), (n, n), dtype)
    # Scale so the chain doesn't overflow bf16.
    b = b / jnp.sqrt(jnp.float32(n)).astype(dtype)

    _barrier(run(a, b))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _barrier(run(a, b))
        best = min(best, time.perf_counter() - t0)
    flops = 2.0 * chain * n**3
    return {
        "probe": f"matmul_bf16_{n}",
        "chain": chain,
        "seconds": round(best, 4),
        "tflops": round(flops / best / 1e12, 2),
    }


def hbm_bandwidth_gbs(mb: int = 512, chain: int = 16, repeats: int = 3) -> dict:
    """Read bandwidth via chained full-array reductions.

    A chained elementwise program fuses into ONE kernel (a single HBM pass,
    whatever the chain length), so it cannot measure bandwidth. K reductions
    of the same array with loop-variant scalings cannot be fused or CSE'd —
    each reads the full array from HBM.
    """
    n = mb * 2**20 // 2  # bf16 elements
    x = jnp.ones((n,), jnp.bfloat16)

    @jax.jit
    def run(x):
        total = jnp.float32(0.0)
        for i in range(chain):
            total = total + jnp.sum(x.astype(jnp.float32) * jnp.float32(i + 1))
        return total

    float(run(x))  # reduction output is already a host-fetchable scalar
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    bytes_read = float(chain) * n * 2
    return {
        "probe": f"hbm_read_{mb}MB",
        "chain": chain,
        "seconds": round(best, 4),
        "gbs": round(bytes_read / best / 1e9, 1),
    }


def hbm_copy_gbs(mb: int = 256, chain: int = 16, repeats: int = 3) -> dict:
    """Streaming read+write bandwidth via a sequential elementwise loop.

    ``fori_loop`` executes its body kernel once per iteration — each
    iteration reads the full array and writes a new one (2 passes), and the
    loop-carried dependency stops cross-iteration fusion. This bounds what a
    pure data-movement pass achieves; if the reduction probe reports much
    less, reductions are VPU-throughput-bound, not HBM-bound.
    """
    n = mb * 2**20 // 2  # bf16 elements
    x = jnp.ones((n,), jnp.bfloat16)

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(
            0, chain, lambda i, v: v * jnp.bfloat16(1.0000001), x
        )

    _barrier(run(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _barrier(run(x))
        best = min(best, time.perf_counter() - t0)
    bytes_moved = float(chain) * n * 2 * 2  # read + write per iteration
    return {
        "probe": f"hbm_copy_{mb}MB",
        "chain": chain,
        "seconds": round(best, 4),
        "gbs": round(bytes_moved / best / 1e9, 1),
    }


def bn_stats_gbs(repeats: int = 3, chain: int = 8) -> dict:
    """BatchNorm-statistics-shaped reduction: per-channel sum and sum-of-
    squares over (B,H,W) of a bf16 NHWC activation (the shape of R50's
    ``convert_reduce_fusion`` passes, ~47%% of the round-1 step profile).
    Reports achieved read GB/s so it can be compared against hbm_copy.
    """
    b, h, w, c = 256, 56, 56, 64  # R50 stage-1 activation at batch 256
    x = jnp.ones((b, h, w, c), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(i, acc):
            xs = x.astype(jnp.float32) * (1.0 + acc[0, 0])
            return jnp.stack([jnp.sum(xs, (0, 1, 2)), jnp.sum(xs * xs, (0, 1, 2))])

        return jax.lax.fori_loop(0, chain, body, jnp.zeros((2, c), jnp.float32))

    _barrier(run(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _barrier(run(x))
        best = min(best, time.perf_counter() - t0)
    bytes_read = float(chain) * x.size * 2
    return {
        "probe": f"bn_stats_{b}x{h}x{w}x{c}",
        "chain": chain,
        "seconds": round(best, 4),
        "gbs": round(bytes_read / best / 1e9, 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="1024,2048,4096,8192")
    parser.add_argument("--chain", type=int, default=32)
    parser.add_argument("--mb", type=int, default=256)
    args = parser.parse_args()

    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "platform": dev.platform}))
    for n in [int(s) for s in args.sizes.split(",")]:
        print(json.dumps(matmul_tflops(n, args.chain)), flush=True)
    print(json.dumps(hbm_bandwidth_gbs(args.mb)), flush=True)
    print(json.dumps(hbm_copy_gbs(args.mb)), flush=True)
    print(json.dumps(bn_stats_gbs()), flush=True)


if __name__ == "__main__":
    main()
