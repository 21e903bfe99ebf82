"""Quasi-random hyperparameter search via shuffled Halton sequences.

Same capability as the reference's halton module (reference halton.py:23-340,
itself from mlcommons/algorithmic-efficiency, after Bousquet et al.,
arXiv:1706.03200): each dimension is a shuffled Van der Corput sequence with
a distinct prime base, digit permutation, and random shift; the first `skip`
points are discarded; points map to log/linear continuous ranges or discrete
choice lists.

Own implementation, vectorized; deterministic-testing seams match the
reference's (explicit `primes` and per-dimension digit `permutations`,
SURVEY.md §4), plus a `seed` for the final shuffle (the reference uses the
unseeded global numpy RNG there, reference halton.py:203).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import numpy as np


def generate_primes(n: int) -> list[int]:
    """All primes < n (standard sieve)."""
    if n < 3:
        return []
    sieve = np.ones(n, dtype=bool)
    sieve[:2] = False
    for p in range(2, int(n**0.5) + 1):
        if sieve[p]:
            sieve[p * p :: p] = False
    return [int(p) for p in np.nonzero(sieve)[0]]


def van_der_corput(
    num_samples: int,
    base: int,
    *,
    permutation: Optional[Sequence[int]] = None,
    shift: Optional[float] = None,
) -> np.ndarray:
    """Shuffled Van der Corput sequence for indices 1..num_samples.

    The digit permutation and shift default to the reference's construction:
    RandomState(base)-shuffled digits 1..base-1 with 0 fixed, then a uniform
    shift from the same stream (reference halton.py:62-90).
    """
    if base < 2 or any(base % i == 0 for i in range(2, int(base**0.5) + 1)):
        raise ValueError(f"base must be prime, got {base}")

    rng = np.random.RandomState(base)
    if permutation is None:
        tail = list(range(1, base))
        rng.shuffle(tail)
        permutation = np.asarray([0] + tail)
    else:
        permutation = np.asarray(permutation)
        if len(permutation) != base:
            raise ValueError(f"permutation must have length base={base}")
    if shift is None:
        shift = float(rng.random_sample())

    idx = np.arange(1, num_samples + 1, dtype=np.int64)
    values = np.zeros(num_samples, dtype=np.float64)
    denom = float(base)
    while idx.any():
        values += permutation[idx % base] / denom
        idx //= base
        denom *= base
    return np.mod(values + shift, 1.0)


def halton_sequence(
    num_samples: int,
    num_dims: int,
    *,
    skip: int = 100,
    shuffle: bool = True,
    seed: Optional[int] = 0,
    primes: Optional[Sequence[int]] = None,
    permutations: Optional[Sequence[Sequence[int]]] = None,
) -> np.ndarray:
    """(num_samples, num_dims) array of quasi-random points in [0, 1)."""
    if skip < 0:
        raise ValueError("skip must be non-negative")
    if primes is None:
        # The reference takes its bases from the tail of the primes-below-1000
        # list (reference halton.py:171-177) — larger bases decorrelate dims.
        pool = generate_primes(1000)
        while len(pool) < num_dims + 1:
            pool = generate_primes(2 * (pool[-1] + 1) if pool else 1000)
        primes = pool[-num_dims - 1 : -1]
    if len(primes) != num_dims:
        raise ValueError(f"need {num_dims} primes, got {len(primes)}")

    cols = []
    for d in range(num_dims):
        perm = permutations[d] if permutations is not None else None
        col = van_der_corput(num_samples + skip, primes[d], permutation=perm)
        cols.append(col[skip:])
    points = np.stack(cols, axis=1)

    if shuffle:
        np.random.default_rng(seed).shuffle(points, axis=0)
    return points


# ---------------------------------------------------------------------------
# Search-space sampling
# ---------------------------------------------------------------------------


def _continuous(point: float, lo: float, hi: float, scaling: str) -> float:
    if scaling == "log":
        return lo * math.exp(point * math.log(hi / lo))
    if scaling in ("linear", "uniform"):
        return point * (hi - lo) + lo
    raise ValueError(f"scaling must be log/linear/uniform, got {scaling!r}")


def _discrete(point: float, choices: Sequence[Any]) -> Any:
    return choices[min(int(point * len(choices)), len(choices) - 1)]


# -- reference-API helpers (reference halton.py:233-304) --------------------

import collections as _collections
import functools as _functools

_DiscretePoints = _collections.namedtuple("_DiscretePoints", "feasible_points")


def discrete(feasible_points: Sequence[Any]) -> _DiscretePoints:
    return _DiscretePoints(list(feasible_points))


def interval(start, end) -> tuple:
    return (start, end)


def loguniform(name: str, range_endpoints: tuple):
    lo, hi = range_endpoints
    return _functools.partial(
        lambda nm, l, h, point: (nm, _continuous(point, l, h, "log")), name, lo, hi
    )


def uniform(name: str, search_points):
    if isinstance(search_points, _DiscretePoints):
        return _functools.partial(
            lambda nm, pts, point: (nm, _discrete(point, pts)),
            name, search_points.feasible_points,
        )
    lo, hi = search_points
    return _functools.partial(
        lambda nm, l, h, point: (nm, _continuous(point, l, h, "linear")), name, lo, hi
    )


def zipit(generator_fns_or_sweeps: Sequence, length: int) -> list[dict[str, Any]]:
    """Zip per-dimension generators/sweep lists over a shared Halton sequence
    (reference halton.py:261-304)."""
    points = halton_sequence(length, len(generator_fns_or_sweeps))
    sweep = []
    for trial_idx in range(length):
        trial = {}
        for dim, gen in enumerate(generator_fns_or_sweeps):
            if callable(gen):
                name, value = gen(points[trial_idx, dim])
            else:
                if trial_idx >= len(gen):
                    break
                (name, value), = list(gen[trial_idx].items())
            trial[name] = value
        sweep.append(trial)
    return sweep


def generate_search(
    search_space: dict[str, dict], num_trials: int, *, seed: Optional[int] = 0
) -> list[dict[str, Any]]:
    """Quasi-random trials over a search space (reference halton.py:307-340).

    Leaf specs: {"min": x, "max": y, "scaling": "log"|"uniform"|"linear"} or
    {"choices": [...]}.
    """
    names = list(search_space)
    points = halton_sequence(num_trials, len(names), seed=seed)

    trials = []
    for row in points:
        trial = {}
        for name, point in zip(names, row):
            spec = search_space[name]
            if "choices" in spec:
                trial[name] = _discrete(point, spec["choices"])
            else:
                trial[name] = _continuous(
                    point, spec["min"], spec["max"], spec.get("scaling", "log")
                )
        trials.append(trial)
    return trials
