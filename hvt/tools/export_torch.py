"""Export an hvt SwinV2 training checkpoint to the reference torch format.

The reverse of the ``swin://`` import path: the reference (and the Microsoft
tooling it vendored, reference swinv2.py:870-895) reads ``.pt`` files holding
``{"model": state_dict}``; this tool converts an hvt Orbax training
checkpoint's Swin parameters back to that layout, so a user moving between
the frameworks can take hvt-trained weights into their torch stack.

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
    if use_ema and raw.get("ema_params") is not None:
        params = raw["ema_params"]
    if params is None:
        raise ValueError(f"checkpoint {uri!r} carries no params")
    if not any(k.startswith("stage") or k == "patch_embed" for k in params):
        raise ValueError(
            "torch export currently covers the SwinV2 family (the reference's "
            "swin:// format, reference swinv2.py:870-895); this checkpoint "
            f"doesn't look like one (top-level keys: {sorted(params)[:8]})"
        )
    torch_compat.save_swin_checkpoint(params, out)
    return {"keys": len(torch_compat.export_swin_state_dict(params)),
            "source": "ema_params" if (use_ema and raw.get("ema_params") is not None)
            else "params"}


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("checkpoint")
    parser.add_argument("out")
    parser.add_argument("--raw", action="store_true",
                        help="export raw params even when EMA weights exist")
    args = parser.parse_args()
    info = export(args.checkpoint, args.out, use_ema=not args.raw)
    print(f"wrote {args.out}: {info['keys']} tensors from {info['source']}")


if __name__ == "__main__":
    main()
