import numpy as np
import pytest

from hvt import hierarchy as H

# A tiny hand-built taxonomy. Note 'accipitriformes' repeats under two
# different classes — the parse must disambiguate (reference hierarchy.py:242-263).
NAMES = [
    "00001_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_badius",
    "00002_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_cooperii",
    "00003_animalia_chordata_aves_accipitriformes_pandionidae_pandion_haliaetus",
    "00004_animalia_chordata_reptilia_accipitriformes_fakefam_fakegen_fakesp",
    "00005_animalia_arthropoda_insecta_odonata_aeshnidae_anax_junius",
    "00006_plantae_tracheophyta_pinopsida_pinales_pinaceae_pinus_strobus",
]
LABELS = [H.HierarchicalLabel.parse(n) for n in NAMES]


def test_parse_prefix_disambiguation():
    a = LABELS[0]
    assert a.number == 1
    assert a.kingdom == "animalia"
    assert a.phylum == "animalia-chordata"
    assert a.order == "animalia-chordata-aves-accipitriformes"
    # Same order word under reptilia is a different node.
    r = LABELS[3]
    assert r.order == "animalia-chordata-reptilia-accipitriformes"
    assert a.order != r.order


def test_parse_rejects_wrong_arity():
    with pytest.raises(ValueError):
        H.HierarchicalLabel.parse("00001_animalia_chordata")


def test_cleaned_roundtrip():
    lab = LABELS[0]
    assert lab.cleaned.startswith("00001_animalia_animalia-chordata_")
    assert len(lab.clean_tiers) == H.N_TIERS


def test_dist_hand_computed():
    a, b, c, d, e, f = LABELS
    assert a.dist(a) == 0
    assert a.dist(b) == 1  # same genus
    assert a.dist(c) == 3  # same order (accipitriformes under aves)
    assert a.dist(d) == 5  # aves vs reptilia diverge at class; deepest shared tier is phylum
    assert a.dist(e) == 6  # same kingdom only
    assert a.dist(f) == 7  # different kingdoms


def test_dist_symmetry():
    for x in LABELS:
        for y in LABELS:
            assert x.dist(y) == y.dist(x)


def test_tree_dist_matrix_matches_pairwise():
    mat = H.tree_dist_matrix(LABELS)
    assert mat.dtype == np.uint8
    n = len(LABELS)
    for i in range(n):
        for j in range(n):
            assert mat[i, j] == LABELS[i].dist(LABELS[j]), (i, j)


def _make_dataset(tmp_path, names, splits=("train", "val")):
    for split in splits:
        for name in names:
            (tmp_path / split / name).mkdir(parents=True, exist_ok=True)
    return tmp_path


def test_build_tree_dist_matrix_cache(tmp_path):
    root = _make_dataset(tmp_path, NAMES)
    m1 = H.build_tree_dist_matrix(root)
    assert (root / H.TREE_DIST_CACHE).is_file()
    m2 = H.build_tree_dist_matrix(root)  # cache hit
    np.testing.assert_array_equal(m1, m2)
    assert (np.diagonal(m1) == 0).all()


def test_assign_tier_indices():
    table, num_classes = H.assign_tier_indices(sorted(NAMES))
    assert table.shape == (6, H.N_TIERS)
    # kingdoms: animalia(0), plantae(1) in first-seen order over sorted names
    assert num_classes[0] == 2
    assert table[0, 0] == 0 and table[5, 0] == 1
    # species are all distinct
    assert num_classes[-1] == 6
    assert sorted(table[:, -1]) == list(range(6))
    # the two 'accipitriformes' orders are distinct indices
    orders = table[:, 3]
    assert orders[0] == orders[1] == orders[2]  # aves accipitriformes shared
    assert orders[3] != orders[0]


def test_parent_lookup_docstring_example(tmp_path):
    # Reference hierarchy.py:429-445 example, padded to 7 tiers.
    names = [
        "00001_animalia_chordata_aves_o1_f1_g1_s1",
        "00002_animalia_chordata_reptila_o2_f2_g2_s2",
        "00003_plantae_bush_leafy_o3_f3_g3_s3",
        "00004_plantae_tree_spiny_o4_f4_g4_s4",
    ]
    root = _make_dataset(tmp_path, names)
    vecs = H.build_parent_label_lookup(root)
    assert len(vecs) == H.N_TIERS - 1
    # phylum -> kingdom: chordata(0)->animalia(0), bush(1)->plantae(1), tree(2)->plantae(1)
    np.testing.assert_array_equal(vecs[0], [0, 1, 1])
    # class -> phylum: aves->chordata, reptila->chordata, leafy->bush, spiny->tree
    np.testing.assert_array_equal(vecs[1], [0, 0, 1, 2])


def test_leaf_count_lookup():
    lut = H.LeafCountLookup(LABELS)
    assert lut.total == 6
    label, tier, count = lut.closest(3)
    # aves subtree has 3 species
    assert count == 3
    assert (label, tier) == ("animalia-chordata-aves", "cls")
    label, tier, count = lut.closest(0.5)
    assert count == 3
    with pytest.raises(ValueError):
        lut.closest(1.5)


def test_union_labels(tmp_path):
    root = _make_dataset(tmp_path, NAMES[:3], splits=("train",))
    _make_dataset(tmp_path, NAMES[3:], splits=("val",))
    labels = H.union_labels(root)
    assert [l.raw for l in labels] == sorted(NAMES)
