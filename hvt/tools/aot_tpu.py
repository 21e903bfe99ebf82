"""AOT multi-chip TPU compile check + per-device memory analysis.

The driver's `dryrun_multichip` proves the sharded train step *executes*
on virtual CPU devices; this tool proves the same layouts **compile for
real TPUs** — against an abstract topology description
(``jax.experimental.topologies``, e.g. ``v5e:2x4`` = 8 chips), no
hardware needed — and reports XLA's per-device HBM analysis for each.
This is the TPU-native analog of the reference running under the
composer launcher on its 4-GPU node (reference slurm/train.bash:14-16):
the sharding/collective story validated at the real target's lowering.

Layouts (mirroring __graft_entry__.dryrun_multichip):

* ``dp``   — pure data parallelism, R50 multitask.
* ``zero`` — dp + ZeRO-1 optimizer-state sharding; reports BOTH the
  first-step executable (replicated params in) and the steady-state one
  (params stored data-sharded, all-gathered in-graph — what every
  subsequent step runs; see BENCH.md "ZeRO-1 on-TPU memory analysis").
* ``tp``   — data x model, SwinV2 with dense(TP fc1/fc2)+MoE(EP w1/w2)
  interleaved.
* ``sp``   — data x spatial, R50 with H-sharded images (conv halos).
* ``pp``   — data x pipe, SwinV2 GPipe trunk.

Usage::

    python -m hvt.tools.aot_tpu                       # micro models, fast
    python -m hvt.tools.aot_tpu --layouts dp,zero --model resnet50 \
        --classes 10000 --img 224 --batch 2048        # production scale

Prints one JSON line per layout with the memory analysis in MiB.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from hvt import config as config_lib
from hvt import objectives, parallel
from hvt.data import DevicePrep
from hvt.models import build_model
from hvt.train import optim as optim_lib
from hvt.train import schedule as schedule_lib
from hvt.train import state as state_lib
from hvt.train import step as step_lib


def topology_devices(name: str):
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu", topology_name=name)
    return np.asarray(topo.devices)


def _mem_dict(compiled) -> dict:
    m = compiled.memory_analysis()
    mib = lambda b: round(float(b) / 2**20, 1)  # noqa: E731
    return {
        "argument_mib": mib(m.argument_size_in_bytes),
        "output_mib": mib(m.output_size_in_bytes),
        "temp_mib": mib(m.temp_size_in_bytes),
        "alias_mib": mib(m.alias_size_in_bytes),
        "live_mib": mib(
            m.argument_size_in_bytes + m.output_size_in_bytes
            + m.temp_size_in_bytes - m.alias_size_in_bytes
        ),
        # Exact bytes for the contract assertions (micro models round to
        # 0.0 MiB on the CPU gate).
        "argument_bytes": int(m.argument_size_in_bytes),
        "alias_bytes": int(m.alias_size_in_bytes),
    }


def lower_layout(
    devices,
    *,
    model_cfg: dict,
    optim_cfg: dict | None = None,
    num_classes=1000,
    img: int = 32,
    global_batch: int = 16,
    data: int = -1,
    model_axis: int = 1,
    spatial: int = 1,
    pipe: int = 1,
    zero: bool = False,
    multitask: bool = False,
    steady: bool = False,
):
    """Lower + compile the full train step for one layout; returns
    (first_mem, steady_mem|None)."""
    n = len(devices)
    if data == -1:
        data = n // (model_axis * spatial * pipe)
    mesh = jax.sharding.Mesh(
        np.asarray(devices).reshape(data, spatial, model_axis, pipe),
        (parallel.DATA_AXIS, parallel.SPATIAL_AXIS, parallel.MODEL_AXIS,
         parallel.PIPE_AXIS),
    )
    layers = {
        "model": dict(model_cfg),
        "optim": optim_cfg
        or {"name": "DecoupledAdamW", "lr": 1e-3, "weight_decay": 0.05},
    }
    if multitask:
        layers["hierarchy"] = {
            "variant": "multitask",
            "multitask_coeffs": [8, 5.65, 4, 2.82, 2, 1.41, 1],
        }
        num_classes = tuple([2] * 6 + [num_classes]) if isinstance(
            num_classes, int
        ) else num_classes
    cfg = config_lib.loads(layers)
    model = build_model(cfg, num_classes)
    prep = DevicePrep.from_config(cfg.train_dataset, cfg.precision)
    tx = optim_lib.build_optimizer(
        cfg.optim, schedule_lib.cosine_with_warmup(10, 100, 0.0),
        no_decay_substrings=tuple(
            getattr(model, "no_weight_decay_substrings", ())
        ),
    )
    if multitask:
        coeffs = tuple(cfg.hierarchy.multitask_coeffs)

        def objective(outputs, targets, mask=None):
            return objectives.multitask_cross_entropy(
                outputs, targets, coeffs, mask
            )
    else:
        objective = objectives.soft_cross_entropy
    init = lambda: state_lib.create(  # noqa: E731
        model, tx, jax.random.key(0),
        prep.normalize(jnp.zeros((2, img, img, 3), jnp.uint8)), ema=False)
    abs_state = jax.eval_shape(init)
    sh = parallel.tp_shardings(mesh, abs_state, zero=zero)
    out_sh = None
    if zero:
        # The Trainer's ZeRO-1 contract (hvt/train/loop.py): sharded
        # update math + pinned output state layout.
        tx = parallel.constrain_tx_updates(
            tx, parallel.zero_update_shardings(mesh, abs_state.params)
        )
        out_sh = sh
    st = step_lib.build_train_step(
        model, objective, tx, prep,
        step_lib.StepSettings(num_classes=num_classes),
        out_state_shardings=out_sh,
    )
    state_abs = jax.tree.map(
        lambda s, d: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=d),
        abs_state, sh)
    mk = lambda shape, dt, s: jax.ShapeDtypeStruct(shape, dt, sharding=s)  # noqa: E731
    imgs = mk((global_batch, img, img, 3), jnp.uint8,
              parallel.image_sharding(mesh))
    if multitask:
        lbls = mk((global_batch, len(cfg.hierarchy.multitask_coeffs)),
                  jnp.int32, parallel.batch_sharding(mesh))
    else:
        lbls = mk((global_batch,), jnp.int32, parallel.batch_sharding(mesh))
    msk = mk((global_batch,), jnp.float32, parallel.batch_sharding(mesh))
    key = jax.eval_shape(lambda: jax.random.key(0))
    rng = mk(key.shape, key.dtype, parallel.replicated(mesh))

    compiled = st.lower(state_abs, imgs, lbls, msk, rng, scale=1.0).compile()
    first = _mem_dict(compiled)
    steady_mem = None
    fixed_point = None
    if steady:
        out_state_sh = compiled.output_shardings[0]
        steady_abs = jax.tree.map(
            lambda s, d: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=d),
            abs_state, out_state_sh)
        steady_compiled = st.lower(
            steady_abs, imgs, lbls, msk, rng, scale=1.0
        ).compile()
        steady_mem = _mem_dict(steady_compiled)
        # GSPMD layout fixed point, asserted on the shardings themselves
        # (not just the memory proxy): feeding the first executable's
        # output state layout back in must reproduce itself — otherwise
        # every steady step recompiles / re-lays-out state (the round-4
        # ZeRO drift bug).
        steady_out = steady_compiled.output_shardings[0]
        fixed_point = all(
            jax.tree.leaves(
                jax.tree.map(
                    lambda a, b, s: a.is_equivalent_to(b, len(s.shape)),
                    out_state_sh, steady_out, abs_state,
                )
            )
        )
    return first, steady_mem, fixed_point


def run_layouts(devices, layouts, *, scale: dict | None = None):
    """Compile each named layout; yields (name, result dict)."""
    n = len(devices)
    s = scale or {}
    classes = s.get("classes", 8)
    img = s.get("img", 32)
    gb = s.get("batch", 2 * n)
    half = dict(model_axis=2) if n % 2 == 0 and n > 1 else {}

    defs = {
        "dp": dict(
            model_cfg={"name": s.get("model", "resnet_micro")},
            num_classes=classes, img=img, global_batch=gb, multitask=True,
        ),
        "zero": dict(
            model_cfg={"name": s.get("model", "resnet_micro")},
            num_classes=classes, img=img, global_batch=gb, zero=True,
            steady=True,
        ),
        "tp": dict(
            model_cfg={
                "name": s.get("swin_model", "swinv2_micro"),
                "args": {"use_pallas": False, "fuse": False,
                         "moe_experts": 2, "moe_from_stage": 1,
                         "moe_every": 1},
            },
            num_classes=classes, img=img, global_batch=gb, **half,
        ),
        "sp": dict(
            model_cfg={"name": s.get("model", "resnet_micro")},
            num_classes=classes, img=img, global_batch=gb,
            **(dict(spatial=2) if n % 2 == 0 and n > 1 else {}),
        ),
        "pp": dict(
            model_cfg={
                "name": s.get("swin_model", "swinv2_micro_deep"),
                "args": {"use_pallas": False, "fuse": False, "pipe": 2},
            },
            num_classes=classes, img=img, global_batch=gb,
            **(dict(pipe=2) if n % 2 == 0 and n > 1 else {}),
        ),
    }
    for name in layouts:
        first, steady, fixed_point = lower_layout(devices, **defs[name])
        out = {"layout": name, "first": first}
        if steady is not None:
            out["steady"] = steady
            out["layout_fixed_point"] = fixed_point
        yield name, out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--topology", default="v5e:2x4")
    p.add_argument("--layouts", default="dp,zero,tp,sp,pp")
    p.add_argument("--model", default=None, help="conv-family model name")
    p.add_argument("--swin-model", default=None)
    p.add_argument("--classes", type=int, default=None)
    p.add_argument("--img", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    args = p.parse_args(argv)

    devices = topology_devices(args.topology)
    scale = {
        k: v
        for k, v in (
            ("model", args.model), ("swin_model", args.swin_model),
            ("classes", args.classes), ("img", args.img),
            ("batch", args.batch),
        )
        if v is not None
    }
    for name, out in run_layouts(
        devices, [l.strip() for l in args.layouts.split(",") if l.strip()],
        scale=scale,
    ):
        out["topology"] = args.topology
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
