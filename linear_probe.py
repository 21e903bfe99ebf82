"""Linear probing on frozen TPU-extracted features (reference linear_probe.py).

Features come from the frozen pretrained backbone on TPU (cached as .npy);
the classifier is sklearn logistic regression with a small grid search
(reference linear_probe.py:189-198 — CPU-side and tiny, kept as-is by design).

    python linear_probe.py --machine m.yaml --exp e1.yaml e2.yaml
"""

import argparse

import numpy as np
import sklearn.linear_model
import sklearn.model_selection
import sklearn.pipeline
import sklearn.preprocessing

from hvt import config as config_lib
from hvt import hierarchy
from hvt.downstream import features as F
from hvt.utils.logging import publish_run_metrics


def build_linear_model(n_jobs: int = 8):
    """GridSearchCV(StandardScaler → SGDClassifier(log_loss)), alpha grid
    matching reference linear_probe.py:189-198."""
    return sklearn.model_selection.GridSearchCV(
        sklearn.pipeline.make_pipeline(
            sklearn.preprocessing.StandardScaler(),
            sklearn.linear_model.SGDClassifier(loss="log_loss"),
        ),
        {"sgdclassifier__alpha": [0.0001, 0.01, 1.0]},
        n_jobs=n_jobs,
        verbose=1,
    )


def main(config: config_lib.Config) -> dict:
    # Accept the reference configs' 'linear-probing' spelling too
    # (SURVEY.md §2.4 quirk 4: configs say linear-probing, code wants
    # linear-probe).
    if config.model.variant not in ("linear-probe", "linear-probing"):
        raise ValueError(f"model.variant must be linear-probe, got {config.model.variant!r}")
    from hvt.utils import compile_cache

    compile_cache.enable()
    config = config_lib.loads(
        config_lib.to_dict(config), {"model": {"variant": "linear-probe"}}
    )

    train_features, train_classes = F.extract_features(
        config, is_train=True, kind="linear-probe"
    )
    print("Loaded train features.")
    test_features, test_classes = F.extract_features(
        config, is_train=False, kind="linear-probe"
    )
    print("Loaded test features.")

    # Shuffle training rows (reference linear_probe.py:209-213, seeded here).
    order = np.random.default_rng(config.seed).permutation(len(train_features))
    train_features, train_classes = train_features[order], train_classes[order]

    clf = build_linear_model()
    clf.fit(train_features, train_classes)
    preds = clf.predict(test_features)

    metrics = {"acc@1": float(np.sum(preds == test_classes) / len(test_classes))}
    if config.eval_dataset.path:
        tree_dists = hierarchy.build_tree_dist_matrix(
            config.machine.datasets[config.eval_dataset.path]
        )
        metrics["tree-dist"] = F.tree_distance(test_classes, preds, tree_dists=tree_dists)

    for key, value in metrics.items():
        print(f"{key}: {value:.4f}")

    publish_run_metrics(config, metrics, prefix="linear-probe")
    return metrics


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    config_lib.add_exp_args(parser)
    args = parser.parse_args()
    main(config_lib.load(machine=args.machine, exps=args.exp))
