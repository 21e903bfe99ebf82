"""Summarize a jax.profiler trace: per-op device time, grouped and ranked.

The reference has no analog (no tracer at all, SURVEY.md §5); this is the
observability half of owning the training loop and kernels.

The trainer can capture traces (HVT_PROFILE_DIR, hvt/train/loop.py) but this
image has no tensorboard profile plugin to read them; this tool parses the
.xplane.pb directly via TensorFlow's bundled xplane protobuf and prints the
device-plane breakdown that drives the roofline analysis in BENCH.md.

Usage:
    python -m hvt.tools.profile_summary <dir-or-.xplane.pb> [--top 30]
    python -m hvt.tools.profile_summary <dir> --group   # by op family

Op families group fusion names like "convert_reduce_fusion.123" under
"convert_reduce_fusion" so the big buckets (convolution, reduce, copy,
custom-call/Pallas) are comparable run to run.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re


def _load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    if os.path.isdir(path):
        hits = sorted(
            glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
        )
        if not hits:
            raise FileNotFoundError(f"no *.xplane.pb under {path}")
        path = hits[-1]
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace, path


_FAMILY = re.compile(r"^(.*?)[.\d]*$")

_SHAPE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]")
_DTYPE_BYTES = {
    "bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1,
}


def hlo_bytes(name: str) -> int:
    """Total bytes of every shape mentioned in an HLO op string (operands +
    outputs as printed). Divided by the op's self time this gives effective
    HBM bandwidth — the roofline per-op diagnostic (BENCH.md)."""
    total = 0
    for dt, dims in _SHAPE.findall(name):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def family(name: str) -> str:
    """fusion.123 / %fusion.4 / 'copy-start.930 = ' → fusion / copy-start."""
    base = name.split("(")[0].split(" = ")[0].split("=")[0].strip().strip("%")
    m = _FAMILY.match(base)
    return m.group(1).rstrip(".") if m else base


def device_op_times(
    xspace, include_async: bool = False
) -> dict[str, tuple[float, int]]:
    """op name → (total self duration ms, count) over all device planes.

    Uses the bottom (leaf) lines of TPU/device planes; host planes are
    skipped. Durations are summed across occurrences and cores.
    """
    totals: dict[str, list[float]] = collections.defaultdict(lambda: [0.0, 0])
    for plane in xspace.planes:
        pname = plane.name.lower()
        if not ("tpu" in pname or "device" in pname or "/device:" in pname):
            continue
        if "host" in pname:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; step/module lines aggregate.
            # Async lines (DMA copy-start/done) overlap compute — their
            # durations span until completion, so summing them alongside
            # compute self-times double-counts; selected via include_async.
            if "step" in lname or "module" in lname:
                continue
            if ("async" in lname) != include_async:
                continue
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                name = meta.name if meta else str(ev.metadata_id)
                t = totals[name]
                t[0] += ev.duration_ps / 1e9  # ps → ms
                t[1] += 1
    return {k: (v[0], v[1]) for k, v in totals.items()}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("path")
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--group", action="store_true",
                        help="aggregate by op family instead of exact name")
    parser.add_argument("--async", dest="async_", action="store_true",
                        help="show the async (DMA) line instead of compute")
    parser.add_argument("--gbs", action="store_true",
                        help="annotate rows with HLO bytes and effective GB/s "
                             "(per occurrence; exact names only, not --group)")
    parser.add_argument("--steps", type=int, default=1,
                        help="profiled step count, to report per-step times")
    args = parser.parse_args()

    xspace, path = _load_xspace(args.path)
    times = device_op_times(xspace, include_async=args.async_)
    if not times:
        print(f"no device events found in {path}")
        return
    if args.group:
        grouped: dict[str, list[float]] = collections.defaultdict(lambda: [0.0, 0])
        for name, (ms, n) in times.items():
            g = grouped[family(name)]
            g[0] += ms
            g[1] += n
        times = {k: (v[0], v[1]) for k, v in grouped.items()}

    total = sum(ms for ms, _ in times.values())
    steps = max(args.steps, 1)
    print(f"# {path}")
    print(f"# total device time: {total:.2f} ms"
          + (f" ({total / steps:.2f} ms/step)" if steps > 1 else ""))
    for name, (ms, n) in sorted(times.items(), key=lambda kv: -kv[1][0])[: args.top]:
        row = f"{ms / steps:10.3f} ms {100 * ms / total:5.1f}%  x{n:<5d}"
        if args.gbs and not args.group:
            nb = hlo_bytes(name)
            gbs = nb * (n / steps) / (ms / steps / 1e3) / 1e9 if ms else 0.0
            row += f" {nb / 2**20:9.1f} MiB {gbs:6.0f} GB/s "
        print(f"{row} {name}")


if __name__ == "__main__":
    main()
