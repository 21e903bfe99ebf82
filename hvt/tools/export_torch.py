"""Export an hvt training checkpoint to the reference torch format.

The reverse of the ``swin://``/``torch://`` import path: the reference (and
the Microsoft tooling it vendored, reference swinv2.py:870-895) reads ``.pt``
files holding ``{"model": state_dict}``; this tool converts an hvt Orbax
training checkpoint back to that layout — SwinV2 in the Microsoft naming,
ResNet in the timm ``conv1/bn1/layer{s}.{b}/fc`` naming with BatchNorm
running statistics included — so a user moving between the frameworks can
take hvt-trained weights into their torch stack.

Usage:
    python -m hvt.tools.export_torch <checkpoint-uri> <out.pt> [--raw]

``checkpoint-uri`` accepts a checkpoints dir, a step dir, or a
``ckpt://path:step`` URI (hvt.train.checkpoint). EMA weights are exported
when present (matching how the Trainer evaluates); ``--raw`` exports the raw
parameters instead.
"""

from __future__ import annotations

import argparse


def export(uri: str, out: str, use_ema: bool = True) -> dict:
    from hvt.models import torch_compat
    from hvt.train import checkpoint as checkpoint_lib

    raw = checkpoint_lib.load_raw(uri)
    params = raw.get("params")
    stats = raw.get("batch_stats") or {}
    ema = use_ema and raw.get("ema_params") is not None
    if ema:
        params = raw["ema_params"]
        stats = raw.get("ema_batch_stats") or stats
    if params is None:
        raise ValueError(f"checkpoint {uri!r} carries no params")
    if "patch_embed" in params:  # SwinV2 family (LayerNorm — no batch stats)
        keys = torch_compat.save_swin_checkpoint(params, out)
        family = "swinv2"
    elif "stem" in params:  # ResNet family — running stats travel along
        keys = torch_compat.save_resnet_checkpoint(params, stats, out)
        family = "resnet"
    else:
        raise ValueError(
            "torch export covers the SwinV2 family (the reference's swin:// "
            "format, reference swinv2.py:870-895) and the ResNet family "
            "(timm conv1/bn1/layer{s} naming); this checkpoint matches "
            f"neither (top-level keys: {sorted(params)[:8]})"
        )
    return {"keys": keys, "family": family,
            "source": "ema_params" if ema else "params"}


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("checkpoint")
    parser.add_argument("out")
    parser.add_argument("--raw", action="store_true",
                        help="export raw params even when EMA weights exist")
    args = parser.parse_args()
    info = export(args.checkpoint, args.out, use_ema=not args.raw)
    print(f"wrote {args.out}: {info['family']}, {info['keys']} tensors "
          f"from {info['source']}")


if __name__ == "__main__":
    main()
