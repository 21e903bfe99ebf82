"""Pre-warm a dataset's tree-distance cache
(reference tools/build_tree_dist_matrix.py:10-27).

    python -m hvt.tools.build_tree_dist_matrix --input <dataset-dir>
"""

import argparse

from hvt import hierarchy


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--input", required=True, help="Dataset dir with train/ and val/."
    )
    args = parser.parse_args()
    matrix = hierarchy.build_tree_dist_matrix(args.input)
    print(f"tree-dist matrix: {matrix.shape} cached under {args.input}")


if __name__ == "__main__":
    main()
