"""Hierarchical nearest-centroid classification (SimpleShot, hierarchical).

Rebuild of the reference's HierarchicalNearestCentroid
(reference hierarchy.py:488-619): fit per-tier euclidean centroids, then
predict top-down — unconstrained argmin at the kingdom tier, and at each
deeper tier the nearest centroid *whose parent matches the previous tier's
prediction*.

The reference implements the constrained argmin by argsorting all distances
and scanning for the first parent match (reference hierarchy.py:582-597,
chunked through sklearn). Here it is a masked argmin — one vectorized pass:
add +inf to centroids with the wrong parent and argmin. If a predicted
parent has no child centroid present (possible on k-shot subsets), the
unconstrained argmin is used — the same fallback the reference's
``argmax``-on-no-match produces.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

_CHUNK = 4096


def _pairwise_sq_dists(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Squared euclidean distances (B, n_centroids); monotone in euclidean."""
    x2 = np.sum(x * x, axis=1, keepdims=True)
    c2 = np.sum(c * c, axis=1)
    return x2 + c2 - 2.0 * (x @ c.T)


class HierarchicalNearestCentroid:
    """fit(X, y) with y (N, n_tiers) global tier indices; predict(X) returns
    (N, n_tiers) global tier indices."""

    def __init__(self, lookup_vecs: Sequence[np.ndarray]):
        # lookup_vecs[t-1][child_global_idx] = parent_global_idx
        # (hvt.hierarchy.build_parent_label_lookup).
        self.lookup_vecs = [np.asarray(v) for v in lookup_vecs]

    def fit(self, X: np.ndarray, y: np.ndarray) -> "HierarchicalNearestCentroid":
        X = np.asarray(X, dtype=np.float64)
        n_samples, _ = X.shape
        _, n_tiers = y.shape

        # classes_[t]: sorted global indices present at tier t
        # (the reference's LabelEncoder step, hierarchy.py:513-518).
        self.classes_ = [np.unique(y[:, t]) for t in range(n_tiers)]
        if any(c.size < 2 for c in self.classes_):
            raise ValueError(
                "All levels need > 1 class; got %s" % [c.size for c in self.classes_]
            )

        self.centroids_ = []
        for t, present in enumerate(self.classes_):
            cents = np.empty((present.size, X.shape[1]), dtype=np.float64)
            for enc, cls in enumerate(present):
                cents[enc] = X[y[:, t] == cls].mean(axis=0)
            self.centroids_.append(cents)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        if not hasattr(self, "centroids_"):
            raise RuntimeError("not fitted")
        X = np.asarray(X, dtype=np.float64)
        n = X.shape[0]
        n_tiers = len(self.classes_)
        preds = np.empty((n, n_tiers), dtype=np.int64)

        for start in range(0, n, _CHUNK):
            chunk = X[start : start + _CHUNK]
            prev = None
            for t in range(n_tiers):
                dists = _pairwise_sq_dists(chunk, self.centroids_[t])
                if t > 0:
                    parents = self.lookup_vecs[t - 1][self.classes_[t]]  # (n_present,)
                    allowed = parents[None, :] == prev[:, None]
                    any_allowed = allowed.any(axis=1, keepdims=True)
                    masked = np.where(allowed | ~any_allowed, dists, np.inf)
                else:
                    masked = dists
                enc = np.argmin(masked, axis=1)
                tier_pred = self.classes_[t][enc]
                preds[start : start + len(chunk), t] = tier_pred
                prev = tier_pred
        return preds
