"""Report the SwinV2 per-stage kernel routing for a model/flag combination.

No reference counterpart (the reference has a single cuDNN path). hvt's
SwinBlock picks between three lowerings per component (SwinBlock._fused_call,
hvt/models/swinv2.py): the fused Pallas block halves when the resident set
fits VMEM, the packed-qkv Pallas kernels, or the plain XLA lowering.
This tool makes that decision table inspectable without a trace, so a perf
report ("stage 4 is slow") can be matched to the route it actually took.

Usage:
    python -m hvt.tools.kernel_routing [--model swinv2_tiny] [--crop 224]
        [--no-fuse] [--no-fuse-attn-train] [--no-fallback-xla] [--eval]
"""

from __future__ import annotations

import argparse


def stage_table(
    model_name: str,
    crop: int,
    *,
    fuse: bool = True,
    fuse_attn_train: bool = True,
    fallback_xla: bool = True,
    fuse_mlp_chunked: bool = True,
    train: bool = True,
) -> list[dict]:
    """→ one row per stage: shapes, fits-VMEM verdicts, chosen routes."""
    from hvt.models import swinv2
    from hvt.ops import fused_halves_pallas as fh

    model = getattr(swinv2, model_name)(10)
    rows = []
    res = crop // model.patch_size
    for stage, (depth, heads) in enumerate(zip(model.depths, model.num_heads)):
        c = int(model.embed_dim * 2**stage)
        window = min(model.window_size, res)
        n = window * window
        hidden = int(c * model.mlp_ratio)
        divisible = res % window == 0
        attn_fits = fh.fits_vmem(c, heads, n, train=train)
        mlp_fits = fh.fits_vmem(c, heads, n, mlp_hidden=hidden, train=train)

        if not (fuse and divisible):
            attn_route = "packed-pallas"
            mlp_route = "xla"
        else:
            fuse_attn = (not train or fuse_attn_train) and attn_fits
            if fuse_attn:
                attn_route = "fused-half"
            elif fallback_xla:
                attn_route = "xla"
            else:
                attn_route = "packed-pallas"
            if mlp_fits:
                mlp_route = "fused-half"
            else:
                k = fh.mlp_chunks(c, hidden, train=train) if fuse_mlp_chunked else 0
                mlp_route = f"fused-chunked-{k}" if k > 1 else "xla"
        rows.append({
            "stage": stage,
            "blocks": depth,
            "resolution": res,
            "window": window,
            "tokens": n,
            "c": c,
            "heads": heads,
            "mlp_hidden": hidden,
            "attn_fits_vmem": attn_fits,
            "mlp_fits_vmem": mlp_fits,
            "attn": attn_route,
            "mlp": mlp_route,
        })
        if stage < len(model.depths) - 1:
            res //= 2
    return rows


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--model", default="swinv2_tiny")
    parser.add_argument("--crop", type=int, default=224)
    parser.add_argument("--no-fuse", action="store_true")
    parser.add_argument("--no-fuse-attn-train", action="store_true")
    parser.add_argument("--no-fallback-xla", action="store_true")
    parser.add_argument("--eval", action="store_true",
                        help="report the eval-forward routing instead of train")
    args = parser.parse_args()

    rows = stage_table(
        args.model, args.crop,
        fuse=not args.no_fuse,
        fuse_attn_train=not args.no_fuse_attn_train,
        fallback_xla=not args.no_fallback_xla,
        train=not args.eval,
    )
    mode = "eval" if args.eval else "train"
    print(f"# {args.model} @ {args.crop}px — {mode} kernel routing")
    print("# serving artifacts: portable export forces every route to xla; "
          "--native keeps the eval routing below (run with --eval)")
    header = (
        f"{'stage':>5} {'blocks':>6} {'res':>4} {'win':>4} {'C':>5} "
        f"{'heads':>5} {'attn route':>14} {'mlp route':>11}  fits(attn/mlp)"
    )
    print(header)
    for r in rows:
        print(
            f"{r['stage']:>5} {r['blocks']:>6} {r['resolution']:>4} "
            f"{r['window']:>4} {r['c']:>5} {r['heads']:>5} "
            f"{r['attn']:>14} {r['mlp']:>11}  "
            f"{str(r['attn_fits_vmem']).lower()}/{str(r['mlp_fits_vmem']).lower()}"
        )


if __name__ == "__main__":
    main()
