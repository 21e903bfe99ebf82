"""Environment health check: is this host ready to train/serve?

The reference has no analog (its environment assumptions live in slurm
scripts, reference slurm/train.bash); hvt targets tunneled/pooled TPU
runtimes where the failure modes are operational, not pythonic:

* a wedged device tunnel hangs *backend initialization itself*, so any
  naive ``jax.devices()`` probe blocks forever — the device check here
  runs in a SUBPROCESS under a hard timeout and reports "unreachable"
  instead of hanging the caller;
* ``block_until_ready`` can return before device completion on remote
  runtimes, so the probe's timed region ends in a host fetch of a value
  data-dependent on the work (the same rule bench.py and
  hvt.tools.roofline follow);
* the native decode core is built lazily on first use — a missing
  toolchain silently degrades the input path to PIL (~2x slower per
  core), which this check surfaces up front;
* a cold persistent compile cache means the first train step costs
  minutes of XLA compilation on modest hosts.

Usage:
  python -m hvt.tools.doctor [--platform NAME] [--timeout SECS] [--json]

Prints one line per check (ok / warn / FAIL + detail); exits non-zero iff
any check FAILs. ``--json`` prints a single JSON object instead.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import pathlib
import shutil
import subprocess
import sys
import time
from typing import Optional

OK, WARN, FAIL = "ok", "warn", "FAIL"

# One compiled matmul chain + host fetch, run in a throwaway interpreter so
# a hung backend init cannot take the doctor down with it. Prints one JSON
# line on success; any hang is converted to a timeout by the parent.
_PROBE_SRC = """
import json, sys, time
import jax, jax.numpy as jnp
platform = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1] != "-" else None
if platform:
    jax.config.update("jax_platforms", platform)
t0 = time.perf_counter()
devs = jax.devices()
x = jnp.full((256, 256), 0.5, jnp.bfloat16)
y = x
for _ in range(4):
    y = y @ x
total = float(y.sum())  # host fetch: the only true barrier on this runtime
print(json.dumps({
    "platform": devs[0].platform,
    "device_kind": devs[0].device_kind,
    "n_devices": len(devs),
    "seconds": round(time.perf_counter() - t0, 2),
    "fetch_ok": total == total,
}))
"""


def check_device(platform: Optional[str], timeout: float) -> dict:
    """Probe the default (or named) backend from a subprocess with a hard
    timeout: a wedged tunnel shows up as 'unreachable', never as a hang."""
    cmd = [sys.executable, "-c", _PROBE_SRC, platform or "-"]
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout
        )
    except subprocess.TimeoutExpired:
        return {
            "status": FAIL,
            "detail": (
                f"no response in {timeout:.0f}s — backend init or dispatch "
                "is hung (wedged device tunnel?); retry later, nothing "
                "local fixes it. CPU-only work can proceed by pinning "
                "jax_platforms=cpu before any device use."
            ),
        }
    last = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    try:
        info = json.loads(last)
    except ValueError:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
        return {"status": FAIL, "detail": "probe crashed: " + " | ".join(tail)}
    info["status"] = OK if info.pop("fetch_ok", False) else FAIL
    info["wall_seconds"] = round(time.perf_counter() - t0, 2)
    return info


def check_native() -> dict:
    """Native decode core: toolchain, build/load, and a real JPEG
    round-trip through the in-memory eval entry serve.py uses."""
    from hvt.data import native

    if os.environ.get("HVT_NATIVE", "1") == "0":
        return {"status": WARN, "detail": "disabled via HVT_NATIVE=0"}
    if not native.available():
        gxx = shutil.which("g++")
        return {
            "status": WARN,
            "detail": "unavailable (%s) — loader falls back to PIL decode"
            % ("build/load failed; see [hvt.native] messages above"
               if gxx else "no g++ on PATH"),
        }
    try:
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (64, 48), (200, 30, 90)).save(buf, format="JPEG")
        img = native.decode_eval(buf.getvalue(), resize_size=32, out_size=24)
        assert img.shape == (24, 24, 3) and img.any()
    except Exception as e:  # noqa: BLE001 — any failure is the finding
        return {"status": FAIL, "detail": f"loaded but round-trip failed: {e}"}
    return {"status": OK, "detail": "built, loaded, JPEG round-trip ok"}


def check_compile_cache() -> dict:
    from hvt.utils import compile_cache

    cache_dir = compile_cache.enable()
    if cache_dir is None:
        return {"status": WARN, "detail": "disabled (HVT_COMPILE_CACHE=off)"}
    p = pathlib.Path(cache_dir)
    if not os.access(p, os.W_OK):
        return {"status": FAIL, "detail": f"{p} not writable"}
    entries = [f for f in p.glob("*") if f.is_file()]
    mb = sum(f.stat().st_size for f in entries) / 2**20
    detail = f"{p} — {len(entries)} entries, {mb:.0f} MB"
    if not entries:
        detail += " (cold: first run of each entry point compiles from scratch)"
    return {"status": OK, "detail": detail}


def check_versions() -> dict:
    import jax

    try:
        import flax

        flax_v = flax.__version__
    except Exception:  # pragma: no cover
        flax_v = "missing"
    return {
        "status": OK,
        "detail": (
            f"python {sys.version.split()[0]}, jax {jax.__version__}, "
            f"flax {flax_v}"
        ),
    }


def check_host() -> dict:
    ncpu = os.cpu_count() or 1
    flags = os.environ.get("XLA_FLAGS", "")
    detail = f"{ncpu} cpu cores"
    if "xla_force_host_platform_device_count" in flags:
        detail += f"; XLA_FLAGS={flags}"
    status = OK if ncpu >= 4 else WARN
    if ncpu < 4:
        detail += (
            " — host-side decode/augment will bottleneck training; "
            "consider device-side RA/ColOut (BENCH.md) or more cores"
        )
    return {"status": status, "detail": detail}


def run(platform: Optional[str] = None, timeout: float = 120.0) -> dict:
    checks = {
        "versions": check_versions(),
        "host": check_host(),
        "device": check_device(platform, timeout),
        "native_decode": check_native(),
        "compile_cache": check_compile_cache(),
    }
    worst = FAIL if any(c["status"] == FAIL for c in checks.values()) else (
        WARN if any(c["status"] == WARN for c in checks.values()) else OK
    )
    return {"status": worst, "checks": checks}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--platform", default=None,
                        help="probe this backend (default: the runtime's "
                             "default platform order)")
    parser.add_argument("--timeout", type=float, default=120.0,
                        help="device-probe budget in seconds (first compile "
                             "on a cold cache can take ~40s)")
    parser.add_argument("--json", action="store_true", dest="as_json",
                        help="print one JSON object instead of a table")
    args = parser.parse_args(argv)
    report = run(args.platform, args.timeout)
    if args.as_json:
        print(json.dumps(report))
    else:
        for name, c in report["checks"].items():
            extra = {k: v for k, v in c.items() if k not in ("status", "detail")}
            detail = c.get("detail") or json.dumps(extra)
            print(f"[{c['status']:>4}] {name:14s} {detail}")
        print(f"[{report['status']:>4}] overall")
    return 1 if report["status"] == FAIL else 0


if __name__ == "__main__":
    sys.exit(main())
