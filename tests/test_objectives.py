import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from hvt import config as C
from hvt import hierarchy as H
from hvt import objectives as O
from hvt.data import device as D


def test_soft_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=(8,))
    onehot = np.eye(11, dtype=np.float32)[labels]

    ours = float(O.soft_cross_entropy(jnp.asarray(logits), jnp.asarray(onehot)))
    theirs = float(TF.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_soft_cross_entropy_with_smoothing_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(6, 9)).astype(np.float32)
    labels = rng.integers(0, 9, size=(6,))
    onehot = jnp.asarray(np.eye(9, dtype=np.float32)[labels])
    smoothed = D.smooth_labels(onehot, 0.08)

    ours = float(O.soft_cross_entropy(jnp.asarray(logits), smoothed))
    theirs = float(
        TF.cross_entropy(torch.tensor(logits), torch.tensor(labels), label_smoothing=0.08)
    )
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_soft_cross_entropy_mask():
    logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])
    onehot = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    mask = jnp.asarray([1.0, 0.0])  # second (wrong) example masked out
    assert float(O.soft_cross_entropy(logits, onehot, mask)) < 0.01


def test_multitask_cross_entropy_matches_torch_sum():
    """Reference hierarchy.py:76-94: dot(coeffs, per-tier CE)."""
    rng = np.random.default_rng(2)
    coeffs = [8.0, 2.0, 1.0]
    sizes = [3, 5, 7]
    logits = [rng.normal(size=(4, n)).astype(np.float32) for n in sizes]
    labels = [rng.integers(0, n, size=(4,)) for n in sizes]
    targets = [jnp.asarray(np.eye(n, dtype=np.float32)[la]) for n, la in zip(sizes, labels)]

    ours = float(
        O.multitask_cross_entropy([jnp.asarray(lg) for lg in logits], targets, coeffs)
    )
    theirs = sum(
        c * float(TF.cross_entropy(torch.tensor(lg), torch.tensor(la)))
        for c, lg, la in zip(coeffs, logits, labels)
    )
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_multitask_arity_checked():
    with pytest.raises(AssertionError):
        O.multitask_cross_entropy(
            [jnp.zeros((2, 3))], [jnp.zeros((2, 3)), jnp.zeros((2, 3))], [1.0, 1.0]
        )


# --- HXE -------------------------------------------------------------------

FLAT_NAMES = [f"{i:05d}_k{i}_p{i}_c{i}_o{i}_f{i}_g{i}_s{i}" for i in range(6)]

TREE_NAMES = [
    "00000_a_x_c0_o0_f0_g0_s0",
    "00001_a_x_c0_o0_f0_g0_s1",
    "00002_a_x_c1_o1_f1_g1_s2",
    "00003_b_y_c2_o2_f2_g2_s3",
]


def test_hxe_degenerate_tree_equals_flat_ce():
    """When every class has a unique path at every tier, uniform HXE telescopes
    to plain species cross-entropy."""
    cfg = C.loads({"hierarchy": {"variant": "hxe", "hxe_tree_weights": "uniform"}})
    loss = O.HXELoss.from_config(cfg.hierarchy, FLAT_NAMES)

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(5, 6)).astype(np.float32))
    labels = rng.integers(0, 6, size=(5,))
    onehot = jnp.asarray(np.eye(6, dtype=np.float32)[labels])

    assert float(loss(logits, onehot)) == pytest.approx(
        float(O.soft_cross_entropy(logits, onehot)), rel=1e-5
    )


def _hxe_reference(logits, label, table, weights):
    """Straightforward numpy HXE for one example."""
    p = np.exp(logits - logits.max())
    p = p / p.sum()
    total = 0.0
    prev_logp = 0.0
    for t in range(table.shape[1]):
        anc = table[label, t]
        mass = p[table[:, t] == anc].sum()
        logp = np.log(mass)
        total -= weights[t] * (logp - prev_logp)
        prev_logp = logp
    return total


@pytest.mark.parametrize("variant,alpha", [("uniform", 0.0), ("exponential", 0.3)])
def test_hxe_matches_numpy_reference(variant, alpha):
    cfg = C.loads(
        {"hierarchy": {"variant": "hxe", "hxe_tree_weights": variant, "hxe_alpha": alpha}}
    )
    loss = O.HXELoss.from_config(cfg.hierarchy, TREE_NAMES)
    table, _ = H.assign_tier_indices(TREE_NAMES)
    weights = O.hxe_tier_weights(variant, alpha)

    rng = np.random.default_rng(4)
    logits = rng.normal(size=(3, 4)).astype(np.float32)
    labels = np.asarray([0, 2, 3])
    onehot = np.eye(4, dtype=np.float32)[labels]

    expected = np.mean(
        [_hxe_reference(logits[i], labels[i], table, weights) for i in range(3)]
    )
    got = float(loss(jnp.asarray(logits), jnp.asarray(onehot)))
    assert got == pytest.approx(float(expected), rel=1e-4)


def test_hxe_exponential_weights_shape():
    w = O.hxe_tier_weights("exponential", 0.5)
    assert w.shape == (7,)
    assert w[-1] == pytest.approx(1.0)  # species height 0
    assert np.all(np.diff(w) > 0)  # deeper tiers weigh more
    with pytest.raises(ValueError):
        O.hxe_tier_weights("nope", 0.1)


def test_build_objective_selects(tmp_path):
    from hvt.data.folder import DatasetInfo

    flat = C.loads({})
    assert O.build_objective(flat, DatasetInfo(5), None) is O.soft_cross_entropy

    mt = C.loads(
        {"hierarchy": {"variant": "multitask", "multitask_coeffs": [1, 1, 1, 1, 1, 1, 1]}}
    )
    fn = O.build_objective(mt, DatasetInfo((2,) * 7), None)
    out = [jnp.zeros((2, 2))] * 7
    tgt = [jnp.asarray([[1.0, 0.0], [0.0, 1.0]])] * 7
    assert float(fn(out, tgt)) == pytest.approx(7 * np.log(2), rel=1e-5)

    hxe = C.loads({"hierarchy": {"variant": "hxe"}})
    loss = O.build_objective(hxe, DatasetInfo(4), TREE_NAMES)
    assert isinstance(loss, O.HXELoss)
    with pytest.raises(ValueError):
        O.build_objective(hxe, DatasetInfo(4), None)
