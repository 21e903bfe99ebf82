"""Saved-residual audit: what AD will keep for the backward pass, by dtype.

The reference has no analog (no tracer at all, SURVEY.md §5). This is the
tool behind BENCH.md's "bytes/step" dtype audit: it traces the train-step
loss for a model config with ``jax.ad_checkpoint.print_saved_residuals`` and
summarizes the residual tensors AD schedules for the backward — totals by
dtype and the largest individual tensors, with their source lines.

Interpretation caveat (measured, BENCH.md round 3): these are *AD-level*
residuals, before XLA optimizes the program — XLA may convert, fuse, or
rematerialize them (it converts flax BatchNorm's f32 saves to bf16 on TPU).
A large f32 entry here is a *lead* to check against the compiled HLO /
profiler (hvt.tools.profile_summary --gbs), not a measured cost.

Usage:
    python -m hvt.tools.residuals --model resnet50 --batch 8 --crop 224
    python -m hvt.tools.residuals --model swinv2_tiny --num-classes 1000 \
        --arg use_pallas=false
"""

from __future__ import annotations

import argparse
import collections
import contextlib
import dataclasses
import io
import re

_DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "i32": 4, "u32": 4, "i64": 8, "u8": 1,
    "i8": 1, "bool": 1, "key<fry>": 8,
}
_SHAPE = re.compile(r"^([\w<>]+)\[([\d,]*)\]")


@dataclasses.dataclass
class Residual:
    dtype: str
    shape: str
    nbytes: int
    where: str


def parse_residual_lines(text: str) -> list[Residual]:
    """print_saved_residuals output → typed entries (inputs/params excluded:
    they are resident regardless of what AD saves)."""
    out = []
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln or "from the argument" in ln:
            continue
        m = _SHAPE.match(ln)
        if not m:
            continue
        dtype, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        nbytes = n * _DTYPE_BYTES.get(dtype, 4)
        where = ln.split(" output of ", 1)[-1][:120]
        out.append(Residual(dtype, f"{dtype}[{dims}]", nbytes, where))
    return out


def audit_model(model_name: str, *, batch: int, crop: int, num_classes: int,
                smoothing: float = 0.08, model_args: dict | None = None):
    """→ list[Residual] saved by AD for the model's train-step loss."""
    import jax
    import jax.numpy as jnp

    from hvt import config as config_lib
    from hvt import objectives
    from hvt.data import DevicePrep
    from hvt.data import device as device_prep
    from hvt.models import build_model
    from jax.ad_checkpoint import print_saved_residuals

    cfg = config_lib.loads({"model": {"name": model_name,
                                      "args": dict(model_args or {})}})
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
    model = build_model(cfg, num_classes)
    x0 = prep.normalize(jnp.zeros((2, crop, crop, 3), jnp.uint8))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x0, train=True)
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def loss_fn(params, batch_stats, images, labels):
        x = prep.normalize(images)
        targets = device_prep.prepare_targets(labels, num_classes, smoothing)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            out, _ = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
        else:
            out = model.apply(variables, x, train=True,
                              rngs={"dropout": jax.random.key(0)})
        return objectives.soft_cross_entropy(out, targets, None)

    images = jax.ShapeDtypeStruct((batch, crop, crop, 3), jnp.uint8)
    labels = jax.ShapeDtypeStruct((batch,), jnp.int32)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        print_saved_residuals(loss_fn, params, batch_stats, images, labels)
    return parse_residual_lines(buf.getvalue())


def summarize(residuals: list[Residual], batch: int, top: int = 10) -> str:
    by_dtype = collections.Counter()
    count = collections.Counter()
    for r in residuals:
        by_dtype[r.dtype] += r.nbytes
        count[r.dtype] += 1
    lines = [f"# saved residuals for backward (batch {batch}; AD level — "
             "check compiled HLO before acting)"]
    total = sum(by_dtype.values())
    for dt, nb in by_dtype.most_common():
        lines.append(
            f"{dt:>6}: {nb / 1e6:9.1f} MB in {count[dt]:4d} tensors "
            f"({nb / batch / 1e6:7.2f} MB/image)"
        )
    lines.append(f" total: {total / 1e6:9.1f} MB ({total / batch / 1e6:.2f} MB/image)")
    lines.append("# largest tensors:")
    for r in sorted(residuals, key=lambda r: -r.nbytes)[:top]:
        lines.append(f"{r.nbytes / 1e6:9.2f} MB  {r.shape:<24} {r.where}")
    return "\n".join(lines)


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--model", default="resnet50")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--crop", type=int, default=224)
    parser.add_argument("--num-classes", type=int, default=10000)
    parser.add_argument("--smoothing", type=float, default=0.08)
    parser.add_argument("--top", type=int, default=10)
    parser.add_argument(
        "--arg", action="append", default=[],
        help="model.args entries as key=value (true/false/int/float coerced)",
    )
    args = parser.parse_args()

    model_args = {}
    for kv in args.arg:
        k, _, v = kv.partition("=")
        if v.lower() in ("true", "false"):
            model_args[k] = v.lower() == "true"
        else:
            try:
                model_args[k] = int(v)
            except ValueError:
                try:
                    model_args[k] = float(v)
                except ValueError:
                    model_args[k] = v

    residuals = audit_model(
        args.model, batch=args.batch, crop=args.crop,
        num_classes=args.num_classes, smoothing=args.smoothing,
        model_args=model_args,
    )
    print(summarize(residuals, args.batch, args.top))


if __name__ == "__main__":
    main()
