"""R50 step HBM traffic, audited: optimized-HLO bytes vs the once-per-tensor floor.

Closes the round-4 gap in the roofline defense (VERDICT r4 item 6): BENCH.md
showed hvt moves 1.54x fewer bytes/image than the reference's torch program
(`hvt.tools.torch_traffic`), but never compared the measured program against a
*theoretical* count-each-tensor-once minimum, so "74 GB/step is the floor"
was asserted, not audited.

This tool derives the measured side from the program itself, not a pass
model: it lowers the exact bench.py R50 train step, compiles it for the
current backend, and walks the **optimized HLO entry computation** — every
instruction's operand + output shapes are, under XLA's execution model, real
HBM reads and writes (fusion internals never materialize; anything at the
top level does). Grouped by op family and joined with profiler self-times
(pass a trace dir captured with HVT_PROFILE_DIR or jax.profiler) this yields
bytes/step, ms/step and effective GB/s per family, plus the total to set
against `torch_traffic.floor()`'s count-each-tensor-once minimum.

Scope notes, printed with the table:
* `conditional` bodies (the EMA cond) are not walked — the update branch
  moves ~3 passes over the 44 M-param f32 EMA tree once per 20 steps
  (~26 MB/step amortized, <0.1% of the step).
* view-only ops (parameter/constant/get-tuple-element/tuple/bitcast) and
  the `-done` halves of async pairs count zero bytes.
* a `while` in the entry would execute its body per trip; the bench step
  at microbatch=1 has none (the tool asserts this).

Usage:
    python -m hvt.tools.traffic_audit [--trace DIR] [--batch 256] [--json]
Reference: reference main.py:104-131 (the train step being audited);
BENCH.md "Roofline accounting" / "bytes/image vs the torch program".
"""

from __future__ import annotations

import argparse
import collections
import json
import re

import numpy as np

from hvt.tools.profile_summary import _SHAPE, _DTYPE_BYTES, family

# Ops whose "operands" are views or metadata, not HBM passes.
_FREE_OPCODES = {
    "parameter", "constant", "get-tuple-element", "tuple", "bitcast",
    "after-all", "partition-id", "replica-id",
}

# The opcode is the FIRST lowercase word directly before a '(' — dtype
# tokens are followed by '[', layout tokens (T/S/E) are uppercase, and
# metadata (which can contain 'jit(...)' strings) comes later in the line.
_OPCODE = re.compile(r"([a-z][a-z\-]+)\(")
_OPNAME = re.compile(r"^\s*(?:ROOT\s+)?(%[\w.\-]+)\s*=")


def shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def entry_lines(hlo_text: str) -> list[str]:
    """The instruction lines of the ENTRY computation only."""
    lines, inside, depth = [], False, 0
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY "):
            inside = True
            depth = line.count("{") - line.count("}")
            continue
        if inside:
            depth += line.count("{") - line.count("}")
            if depth <= 0:
                break
            lines.append(line)
    return lines


_SPACE = re.compile(r"S\(\d+\)")
_NAME_REF = re.compile(r"%[\w.\-]+")


def _split_elements(spec: str) -> list[tuple[str, int]]:
    """Top-level tuple elements of an output spec → [(text, paren_depth)].

    Depth > 0 marks elements inside a nested paren group — async-start
    prints its aliased operands that way; they are views, not traffic."""
    spec = spec.strip()
    if not spec.startswith("("):
        return [(spec, 0)]
    spec = spec[1:-1] if spec.endswith(")") else spec[1:]
    elems, buf, depth = [], [], 0
    for ch in spec:
        if ch == "," and depth == 0:
            elems.append("".join(buf))
            buf = []
            continue
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        buf.append(ch)
    if buf:
        elems.append("".join(buf))
    return [(e.strip(), 1 if e.strip().startswith("(") else 0)
            for e in elems]


def _hbm_bytes_of_spec(spec: str) -> int:
    """Bytes of the output elements resident in HBM (default memory space):
    skips nested-paren aliased groups and anything laid out in S(n)
    (VMEM/SMEM — writes there don't cross HBM)."""
    total = 0
    for elem, aliased in _split_elements(spec):
        if aliased or _SPACE.search(elem):
            continue
        total += shape_bytes(elem)
    return total


def audit_hlo(hlo_text: str) -> dict:
    """name -> (family, hbm_bytes) for every traffic-bearing entry op.

    Two passes: the first builds a symbol table of every op's printed
    output (compiled HLO prints operands as bare %names, so reads are
    resolved through the producers' definitions); the second charges each
    op its HBM writes (non-S(n) output elements) plus one HBM read per
    operand whose producer's output lives in HBM. Async `-start` ops are
    charged their destination size as the read (a DMA slice reads only the
    slice) and the space rule prices the write; `-done` halves are views.
    """
    defs: list[tuple[str, str, str, str]] = []  # name, opcode, spec, args
    whiles = conds = 0
    for raw in entry_lines(hlo_text):
        line = raw.split(", metadata=")[0]
        nm = _OPNAME.search(line)
        if not nm:
            continue
        rhs = line[line.index("=") + 1:]
        m = _OPCODE.search(rhs)
        if not m:
            continue
        opcode = m.group(1)
        spec = rhs[: m.start()].strip()
        # operand region: balanced parens after the opcode
        start = m.end() - 1
        depth, end = 0, len(rhs)
        for i in range(start, len(rhs)):
            if rhs[i] == "(":
                depth += 1
            elif rhs[i] == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        args = rhs[start + 1: end]
        defs.append((nm.group(1), opcode, spec, args))

    # pass 1: what each name's output occupies, and where
    out_hbm: dict[str, int] = {}
    for name, opcode, spec, _args in defs:
        out_hbm[name] = _hbm_bytes_of_spec(spec)

    ops: dict[str, tuple[str, int]] = {}
    for name, opcode, spec, args in defs:
        if opcode == "while":
            whiles += 1
        if opcode == "conditional":
            conds += 1
            continue  # branch bodies not walked; see module docstring
        if opcode in _FREE_OPCODES or opcode.endswith("-done"):
            continue
        fam = family(name.lstrip("%"))
        if opcode == "copy-start":
            # output tuple (dest, src-alias, context): each HBM-side end of
            # the DMA is one pass (1x for VMEM evictions/prefetches, 2x for
            # HBM->HBM layout copies).
            data = [e for e, al in _split_elements(spec)
                    if not al and "u32" not in e and "s32" not in e]
            ops[name] = (fam, sum(shape_bytes(e) for e in data
                                  if not _SPACE.search(e)))
            continue
        if opcode.endswith("-start"):
            # async slice/gather: ((src aliases), dest, context) — the DMA
            # reads dest-sized bytes from the HBM source and writes them to
            # dest (free if dest sits in VMEM).
            dest = [e for e, al in _split_elements(spec)
                    if not al and "u32" not in e and "s32" not in e]
            db = sum(shape_bytes(e) for e in dest)
            src_hbm = any(out_hbm.get(r, 0) > 0
                          for r in _NAME_REF.findall(args))
            ops[name] = (fam, (db if src_hbm else 0) + sum(
                shape_bytes(e) for e in dest if not _SPACE.search(e)))
            continue
        writes = _hbm_bytes_of_spec(spec)
        reads = sum(out_hbm.get(ref, 0) for ref in _NAME_REF.findall(args))
        ops[name] = (fam, writes + reads)
    return {"ops": ops, "whiles": whiles, "conditionals": conds}


def semantic_bucket(name: str, op_name: str) -> str:
    """Map an entry op to the training-step phase it implements, via the
    JAX-level op_name XLA carries in metadata (jvp(...) = forward,
    transpose(jvp(...)) = backward)."""
    if "copy-start" in name or "slice-start" in name:
        return "spill/prefetch DMA"
    if "transpose(jvp" in op_name:
        if "conv_general_dilated" in op_name or "/Conv" in op_name:
            return "conv backward"
        if "select_and_scatter" in op_name or "/max" in op_name:
            return "pool backward"
        if "BatchNorm" in op_name or "reduce_sum" in op_name:
            return "BN backward reduce"
        if "/add" in op_name:
            return "residual backward"
        return "other backward"
    if "jvp(" in op_name:
        if "conv_general_dilated" in op_name or "/Conv" in op_name:
            return "conv forward"
        if "/add" in op_name:
            return "residual add fwd"
        if "relu" in op_name or "/max" in op_name:
            return "relu/pool fwd"
        if "BatchNorm" in op_name:
            return "BN fwd"
        return "other forward"
    return "optimizer/loss/other"


def op_names_from_metadata(hlo_text: str) -> dict[str, str]:
    out = {}
    for raw in entry_lines(hlo_text):
        nm = _OPNAME.search(raw)
        if not nm:
            continue
        m = re.search(r'op_name="([^"]+)"', raw)
        out[nm.group(1)] = m.group(1) if m else ""
    return out


def trace_ms_by_name(trace_dir: str) -> dict[str, float]:
    """op name (%foo.N) -> total self ms from a profiler trace."""
    from hvt.tools.profile_summary import _load_xspace, device_op_times

    xspace, _ = _load_xspace(trace_dir)
    out: dict[str, float] = collections.defaultdict(float)
    for name, (ms, _n) in device_op_times(xspace).items():
        key = name.split(" = ")[0].strip().lstrip("%")
        out["%" + key] += ms
    return dict(out)


def build_and_compile(batch: int, image_size: int = 224, classes: int = 10000):
    """The exact bench.py R50 recipe step, lowered + compiled here."""
    import jax
    import jax.numpy as jnp

    from hvt import config as config_lib
    from hvt import objectives, parallel
    from hvt.data import DevicePrep
    from hvt.models import build_model
    from hvt.train import optim as optim_lib
    from hvt.train import schedule as schedule_lib
    from hvt.train import state as state_lib
    from hvt.train import step as step_lib
    from hvt.train.algorithms import parse_algorithms

    cfg = config_lib.loads({
        "model": {"name": "resnet50", "args": {"stem_s2d": True}},
        "optim": {"name": "DecoupledSGDW", "lr": 2.048, "momentum": 0.875,
                  "weight_decay": 5.0e-4},
        "algorithms": [
            {"cls": "EMA", "args": {"half_life": "100ba",
                                    "update_interval": "20ba"}},
            {"cls": "LabelSmoothing", "args": {"smoothing": 0.08}},
            {"cls": "GradientClipping",
             "args": {"clipping_type": "norm", "clipping_threshold": 2.0}},
        ],
    })
    algos = parse_algorithms(cfg)
    mesh = parallel.make_mesh(cfg.mesh)
    parallel.set_kernel_mesh(mesh)
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
    model = build_model(cfg, classes)
    tx = optim_lib.build_optimizer(
        cfg.optim, schedule_lib.cosine_with_warmup(100, 10_000, 0.0),
        grad_clip_norm=algos.grad_clip_norm,
        no_decay_substrings=getattr(model, "no_weight_decay_substrings", ()),
    )
    settings = step_lib.StepSettings(
        num_classes=classes, smoothing=algos.label_smoothing, ema=algos.ema,
    )
    train_step = step_lib.build_train_step(
        model, objectives.soft_cross_entropy, tx, prep, settings)
    state = jax.jit(
        lambda: state_lib.create(
            model, tx, jax.random.key(0),
            prep.normalize(jnp.zeros((2, image_size, image_size, 3),
                                     jnp.uint8)),
            ema=True,
        ),
        out_shardings=parallel.replicated(mesh),
    )()
    sharded = parallel.batch_sharding(mesh)
    images = jax.device_put(np.zeros(
        (batch, image_size, image_size, 3), np.uint8), sharded)
    labels = jax.device_put(np.zeros((batch,), np.int32), sharded)
    mask = jax.device_put(np.ones((batch,), np.float32), sharded)
    rng = jax.jit(lambda: jax.random.key(0),
                  out_shardings=parallel.replicated(mesh))()
    lowered = train_step.lower(state, images, labels, mask, rng, scale=1.0)
    return lowered.compile().as_text()


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--trace", default=None,
                    help="profiler trace dir for per-family ms (optional)")
    ap.add_argument("--trace-steps", type=int, default=10)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    from hvt.utils import compile_cache

    compile_cache.enable()
    hlo = build_and_compile(args.batch)
    audit = audit_hlo(hlo)
    assert audit["whiles"] == 0, "entry has a while loop; bytes under-counted"

    ms_by_name = trace_ms_by_name(args.trace) if args.trace else {}
    fam_bytes: dict[str, int] = collections.defaultdict(int)
    fam_ms: dict[str, float] = collections.defaultdict(float)
    for name, (fam, nb) in audit["ops"].items():
        fam_bytes[fam] += nb
        if name in ms_by_name:
            fam_ms[fam] += ms_by_name[name] / args.trace_steps

    total = sum(fam_bytes.values())

    from hvt.tools.torch_traffic import floor

    _, fl, fl_opt, fl_total = floor(args.batch)

    rows = []
    for fam, nb in sorted(fam_bytes.items(), key=lambda kv: -kv[1]):
        ms = fam_ms.get(fam, 0.0)
        # async families (-start) log ~0 self-time: the DMA overlaps
        # compute, so an "effective rate" would be meaningless noise.
        timed = ms > 0.05
        rows.append({
            "family": fam,
            "gib_per_step": round(nb / 2**30, 2),
            "ms_per_step": round(ms, 2) if timed else None,
            "eff_gbs": round(nb / 1e9 / (ms / 1e3), 0) if timed else None,
        })

    op_names = op_names_from_metadata(hlo)
    buckets: dict[str, int] = collections.defaultdict(int)
    for name, (_fam, nb) in audit["ops"].items():
        buckets[semantic_bucket(name, op_names.get(name, ""))] += nb

    out = {
        "batch": args.batch,
        "measured_gib_per_step": round(total / 2**30, 2),
        "measured_mib_per_image": round(total / args.batch / 2**20, 1),
        "floor_gib_per_step": round(fl_total / 2**30, 2),
        "measured_over_floor": round(total / fl_total, 2),
        "floor_families": {k: round(v / 2**30, 2) for k, v in fl.items()},
        "floor_optimizer_gib": round(fl_opt / 2**30, 2),
        "families": rows[: args.top],
        "semantic_buckets": {k: round(v / 2**30, 2) for k, v in
                             sorted(buckets.items(), key=lambda kv: -kv[1])},
        "conditionals_excluded": audit["conditionals"],
    }
    if args.json:
        print(json.dumps(out))
        return
    print(f"# optimized-HLO traffic, R50 bench step, batch {args.batch}")
    print(f"measured {out['measured_gib_per_step']} GiB/step "
          f"({out['measured_mib_per_image']} MiB/image)   "
          f"floor {out['floor_gib_per_step']} GiB/step   "
          f"ratio {out['measured_over_floor']}x")
    for r in rows[: args.top]:
        ms = f"{r['ms_per_step']:7.2f} ms {r['eff_gbs']:5.0f} GB/s" \
            if r["ms_per_step"] else " " * 21
        print(f"  {r['gib_per_step']:8.2f} GiB {ms}  {r['family']}")
    print("# by training-step phase (metadata op_name)")
    for k, v in out["semantic_buckets"].items():
        print(f"  {v:8.2f} GiB  {k}")
    print(f"floor families: " + ", ".join(
        f"{k}={v:.2f}" for k, v in out["floor_families"].items())
        + f", optimizer={out['floor_optimizer_gib']:.2f} GiB")


if __name__ == "__main__":
    main()
