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


if __name__ == "__main__":
    main()
