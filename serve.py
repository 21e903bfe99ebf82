"""Inference-server entry point (no reference counterpart — completes the
deployment story next to predict.py's batch mode).

Usage:

    python serve.py --machine configs/machines/local.yaml \
        --exp <pretrain layers...> [--port 8000] [--topk 5] \
        [--raw-weights] [--hierarchical]

Then:

    curl -s localhost:8000/healthz
    curl -s --data-binary @image.jpg localhost:8000/predict?topk=3

Weights resolve exactly as in predict.py (``load_path`` hvt checkpoint with
EMA preferred, or the pretrained-backbone URIs).
"""

import argparse
import sys

from hvt import config as config_lib
from hvt.downstream import serve as serve_lib

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    artifact_mode = any(
        a == "--artifact" or a.startswith("--artifact=") for a in sys.argv
    )
    if artifact_mode:
        # Artifact serving needs no config tree or dataset — only the
        # exported directory (hvt/tools/export_serving.py).
        parser.add_argument("--artifact", required=True,
                            help="StableHLO serving-artifact directory")
    else:
        config_lib.add_exp_args(parser)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--batch", type=int, default=0,
                        help="compiled batch shape (requests pad into it); "
                             "0 = auto: a pinned artifact's batch, all of a "
                             "bucket artifact's buckets, else 1")
    parser.add_argument("--raw-weights", action="store_true")
    parser.add_argument("--hierarchical", action="store_true")
    parser.add_argument("--quantize", choices=["int8"], default=None,
                        help="config mode only: serve the live forward "
                             "through w8a8 PTQ (hvt/ops/quant.py); "
                             "for artifacts, export with --quantize int8")
    parser.add_argument("--calibrate", type=int, default=0, metavar="N",
                        help="with --quantize int8: static activation "
                             "scales from N eval batches instead of "
                             "in-graph dynamic absmax (the measured "
                             "production recipe, BENCH.md)")
    args = parser.parse_args()
    from hvt.utils import compile_cache

    compile_cache.enable()  # server restarts skip the forward's compile
    if not artifact_mode and args.calibrate and args.quantize != "int8":
        parser.error("--calibrate requires --quantize int8")
    if artifact_mode:
        if getattr(args, "calibrate", 0):
            parser.error(
                "--calibrate has no effect with --artifact: calibration "
                "was fixed at export time (re-export with --calibrate N)"
            )
        if args.quantize:
            parser.error(
                "--quantize has no effect with --artifact: quantization "
                "was fixed at export time (re-export with --quantize int8)"
            )
        if args.raw_weights:
            parser.error(
                "--raw-weights has no effect with --artifact: the weight "
                "choice was fixed at export time (re-export with "
                "--raw-weights instead)"
            )
        serve_lib.serve_artifact(
            args.artifact,
            host=args.host,
            port=args.port,
            topk=args.topk,
            batch=args.batch,
            hierarchical=args.hierarchical,
        )
    else:
        config = config_lib.load(machine=args.machine, exps=args.exp)
        serve_lib.serve(
            config,
            host=args.host,
            port=args.port,
            topk=args.topk,
            batch=args.batch,
            use_ema=not args.raw_weights,
            hierarchical=args.hierarchical,
            quantize=args.quantize,
            calibrate=args.calibrate,
        )
