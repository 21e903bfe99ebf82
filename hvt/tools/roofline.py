"""Device characterization: matmul roofline + HBM bandwidth probes.

The reference has no analog (its only performance instrumentation is
Composer's SpeedMonitor, reference main.py:91-96); this tool exists because
hvt owns its kernels and needs measured per-device ceilings to reason about
them (BENCH.md).

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


def _sig(x: float, digits: int = 4) -> float:
    """Round to significant digits: tiny rates (contended-CPU test runs)
    must not round to 0.0 — tests assert positivity."""
    return float(f"{x:.{digits}g}")


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
        "tflops": _sig(flops / best / 1e12),
    }


def hbm_bandwidth_gbs(mb: int = 512, chain: int = 16, repeats: int = 3) -> dict:
    """Read bandwidth via chained full-array reductions.

    A chained elementwise program fuses into ONE kernel (a single HBM pass,
    whatever the chain length), so it cannot measure bandwidth. K reductions
    of the same array with loop-variant scalings cannot be fused or CSE'd —
    each reads the full array from HBM.

    CAVEAT: this wall-clock number is a *lower bound* — per-measurement
    dispatch/fetch latency on the tunneled runtime floors it well under the
    true rate (see traced_hbm_probes, which measures ~750 GB/s for the same
    pass by op self-time).
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
        "gbs": _sig(bytes_read / best / 1e9),
    }


def hbm_copy_gbs(mb: int = 256, chain: int = 16, repeats: int = 3) -> dict:
    """Streaming read+write bandwidth via a sequential elementwise loop.

    ``fori_loop`` executes its body kernel once per iteration — each
    iteration reads the full array and writes a new one (2 passes), and the
    loop-carried dependency stops cross-iteration fusion.

    CAVEAT: wall-clock lower bound, like hbm_bandwidth_gbs — trust
    traced_hbm_probes for the true per-op rate.
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
        "gbs": _sig(bytes_moved / best / 1e9),
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
        "gbs": _sig(bytes_read / best / 1e9),
    }


def traced_hbm_probes(mb: int = 392, repeats: int = 3) -> list[dict]:
    """Profiler-timed bandwidth — the only trustworthy methodology for
    sub-100 ms regions on this runtime.

    Wall-clock probes here include ~10-30 ms of dispatch/host-fetch latency
    per measurement, which floors any small probe: chained-reduce "read
    bandwidth" probes on this device measured 25-150 GB/s by wall clock while
    the very same reduce fusion self-times at ~750 GB/s in the xplane trace
    (≈ v5e's 819 GB/s spec). This probe runs one big reduction pass and one
    big elementwise copy pass a few times under ``jax.profiler`` and reports
    op *self time* from the device plane via hvt.tools.profile_summary.
    """
    import tempfile

    from hvt.tools import profile_summary

    n = mb * 2**20 // 2  # bf16 elements
    c = 256
    x = jnp.ones((n // c, c), jnp.bfloat16)

    reduce_pass = jax.jit(
        lambda x: jnp.sum(x.astype(jnp.float32) * jnp.float32(1.0000001))
    )
    copy_pass = jax.jit(lambda x: x * jnp.bfloat16(1.001953125))

    float(reduce_pass(x))
    _barrier(copy_pass(x))
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        for _ in range(repeats):
            float(reduce_pass(x))
            _barrier(copy_pass(x))
        jax.profiler.stop_trace()
        xspace, _ = profile_summary._load_xspace(td)
        times = profile_summary.device_op_times(xspace)

    results = []
    # The two dominant ops in this program are our passes; identify them by
    # the bytes their HLO strings mention.
    ranked = sorted(
        times.items(), key=lambda kv: -profile_summary.hlo_bytes(kv[0])
    )[:2]
    for name, (ms, cnt) in ranked:
        nb = profile_summary.hlo_bytes(name)
        per_ms = ms / max(cnt, 1)
        kind = "reduce" if "reduce" in name else "copy"
        results.append({
            "probe": f"hbm_traced_{kind}_{mb}MB",
            "op_ms": round(per_ms, 3),
            "gbs": _sig(nb / (per_ms / 1e3) / 1e9),
        })
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="1024,2048,4096,8192")
    parser.add_argument("--chain", type=int, default=32)
    parser.add_argument("--mb", type=int, default=256)
    parser.add_argument("--no-trace", action="store_true",
                        help="skip the profiler-timed HBM probes")
    args = parser.parse_args()

    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "platform": dev.platform}))
    for n in [int(s) for s in args.sizes.split(",")]:
        print(json.dumps(matmul_tflops(n, args.chain)), flush=True)
    print(json.dumps(hbm_bandwidth_gbs(args.mb)), flush=True)
    print(json.dumps(hbm_copy_gbs(args.mb)), flush=True)
    print(json.dumps(bn_stats_gbs()), flush=True)
    if not args.no_trace and dev.platform in ("tpu", "axon"):
        for row in traced_hbm_probes():
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
