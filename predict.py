"""Batch-inference entry point (no reference counterpart — the reference's
downstream paths are linear_probe.py / simpleshot.py; this serves the same
checkpoints for production prediction).

Usage:

    python predict.py --machine configs/machines/local.yaml \
        --exp configs/pretrain/debug_synthetic.yaml \
        --output preds.jsonl [--topk 5] [--raw-weights]

Writes one JSON line per image of the eval split: top-k class names/ids,
probabilities, the folder label, and the file path. Weights come from
``load_path`` (full hvt checkpoint; EMA weights by default) or the
pretrained-backbone URIs — see hvt/downstream/predict.py.
"""

import argparse

from hvt import config as config_lib
from hvt.downstream import predict as predict_lib

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    config_lib.add_exp_args(parser)
    parser.add_argument("--output", default=None, help="JSONL path (default: stdout)")
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--raw-weights", action="store_true",
                        help="use raw (non-EMA) weights from the checkpoint")
    parser.add_argument("--hierarchical", action="store_true",
                        help="multitask models: top-down parent-constrained "
                             "decode; rows gain per-tier predictions")
    parser.add_argument("--limit-batches", type=int, default=None)
    parser.add_argument("--artifact", default=None,
                        help="StableHLO serving-artifact directory "
                             "(hvt.tools.export_serving); replaces the "
                             "model + checkpoint, config supplies the "
                             "dataset")
    parser.add_argument("--quantize", choices=["int8"], default=None,
                        help="run the live forward through w8a8 "
                             "PTQ (hvt/ops/quant.py) — the no-export "
                             "accuracy A/B for --quantize int8 artifacts")
    parser.add_argument("--calibrate", type=int, default=0, metavar="N",
                        help="with --quantize int8: static activation "
                             "scales from the first N eval batches "
                             "instead of in-graph dynamic absmax")
    args = parser.parse_args()
    from hvt.utils import compile_cache

    compile_cache.enable()  # repeated batch-inference runs skip the compile
    if args.calibrate and args.quantize != "int8":
        parser.error("--calibrate requires --quantize int8")
    if args.artifact and args.calibrate:
        parser.error("--calibrate has no effect with --artifact: "
                     "calibration was fixed at export time (re-export "
                     "with --calibrate N instead)")
    if args.artifact and args.raw_weights:
        parser.error("--raw-weights has no effect with --artifact: the "
                     "weight choice was fixed at export time")
    if args.artifact and args.quantize:
        parser.error("--quantize has no effect with --artifact: "
                     "quantization was fixed at export time (re-export "
                     "with --quantize int8 instead)")
    config = config_lib.load(machine=args.machine, exps=args.exp)
    predict_lib.run(
        config,
        args.output,
        topk=args.topk,
        use_ema=not args.raw_weights,
        hierarchical=args.hierarchical,
        limit_batches=args.limit_batches,
        artifact=args.artifact,
        quantize=args.quantize,
        calibrate=args.calibrate,
    )
