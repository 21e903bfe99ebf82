"""Generate sweep trial configs (reference sweep.py).

    python sweep.py --sweep configs/pretrain/r50_cross_entropy_sweep.yaml \
        --count 50 --output configs/sweeps
"""

import argparse

from hvt.sweep.generate import write_trials


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sweep", required=True, help="Config with sweep options.")
    parser.add_argument("--count", type=int, default=50, help="Number of trials.")
    parser.add_argument("--output", required=True, help="Output directory.")
    parser.add_argument("--seed", type=int, default=0, help="Shuffle seed.")
    args = parser.parse_args()

    out_dir = write_trials(args.sweep, args.count, args.output, seed=args.seed)
    print(f"Wrote trial configs to {out_dir}")


if __name__ == "__main__":
    main()
