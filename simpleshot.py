"""SimpleShot nearest-centroid few-shot evaluation (reference simpleshot.py).

Frozen features → optional center()/l2_normalize() → nearest-centroid (flat)
or parent-constrained top-down hierarchical nearest-centroid.

    python simpleshot.py --machine m.yaml --exp e1.yaml e2.yaml
"""

import argparse

import numpy as np
import sklearn.neighbors

from hvt import config as config_lib
from hvt import hierarchy
from hvt.downstream import centroid as centroid_lib
from hvt.downstream import features as F
from hvt.utils.logging import publish_run_metrics


def main(config: config_lib.Config) -> dict:
    if not config.model.variant.startswith("simpleshot"):
        raise ValueError(
            f"model.variant must be a simpleshot variant, got {config.model.variant!r}"
        )
    from hvt.utils import compile_cache

    compile_cache.enable()

    hier = config.simpleshot.hierarchical
    train_features, train_classes = F.extract_features(
        config, is_train=True, kind="simpleshot", hierarchical_labels=hier
    )
    print("Loaded train features.")
    test_features, test_classes = F.extract_features(
        config, is_train=False, kind="simpleshot", hierarchical_labels=hier
    )
    print("Loaded test features.")

    # Variant shorthands imply the normalizations (reference configs name
    # simpleshot-l2n / simpleshot-cl2n, models.py:46-47).
    centered = config.simpleshot.centered or config.model.variant == "simpleshot-cl2n"
    l2n = config.simpleshot.l2_normalized or config.model.variant in (
        "simpleshot-l2n",
        "simpleshot-cl2n",
    )
    if centered:
        train_features = F.center(train_features)
        test_features = F.center(test_features)
    if l2n:
        train_features = F.l2_normalize(train_features)
        test_features = F.l2_normalize(test_features)

    if hier:
        lookups = hierarchy.build_parent_label_lookup(
            config.machine.datasets[config.train_dataset.path]
        )
        clf = centroid_lib.HierarchicalNearestCentroid(lookups)
    else:
        clf = sklearn.neighbors.NearestCentroid()

    clf.fit(train_features, train_classes)
    preds = clf.predict(test_features)

    if hier:
        # Species tier only for metrics (reference simpleshot.py:190-198).
        assert test_classes.shape[1] == hierarchy.N_TIERS
        test_classes = test_classes[:, -1]
        preds = preds[:, -1]

    metrics = {"acc@1": float(np.sum(preds == test_classes) / len(test_classes))}
    if config.eval_dataset.path:
        tree_dists = hierarchy.build_tree_dist_matrix(
            config.machine.datasets[config.eval_dataset.path]
        )
        metrics["tree-dist"] = F.tree_distance(test_classes, preds, tree_dists=tree_dists)

    for key, value in metrics.items():
        print(f"{key}: {value:.4f}")

    publish_run_metrics(config, metrics, prefix="simpleshot")
    return metrics


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    config_lib.add_exp_args(parser)
    args = parser.parse_args()
    main(config_lib.load(machine=args.machine, exps=args.exp))
