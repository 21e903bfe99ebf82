import numpy as np
import pytest
import yaml
from PIL import Image

from hvt.sweep import generate as G
from hvt.sweep import halton as HA


# --- halton ----------------------------------------------------------------


def test_van_der_corput_identity_permutation():
    # With identity digit permutation and zero shift, base 2 gives the
    # classic sequence 1/2, 1/4, 3/4, 1/8, ...
    seq = HA.van_der_corput(4, 2, permutation=[0, 1], shift=0.0)
    np.testing.assert_allclose(seq, [0.5, 0.25, 0.75, 0.125])


def test_van_der_corput_rejects_composite_base():
    with pytest.raises(ValueError):
        HA.van_der_corput(4, 9)


def test_halton_sequence_shape_range_and_determinism():
    a = HA.halton_sequence(32, 3, seed=1)
    b = HA.halton_sequence(32, 3, seed=1)
    c = HA.halton_sequence(32, 3, seed=2)
    assert a.shape == (32, 3)
    assert (a >= 0).all() and (a < 1).all()
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_halton_low_discrepancy():
    # Quasi-random: every third of [0,1) gets roughly a third of the points.
    pts = HA.halton_sequence(300, 2, seed=0)
    for d in range(2):
        counts, _ = np.histogram(pts[:, d], bins=3, range=(0, 1))
        assert counts.min() > 70, counts


def test_generate_search_log_and_choices():
    space = {
        "optim.lr": {"min": 1e-3, "max": 1.0, "scaling": "log"},
        "optim.momentum": {"choices": [0, 0.875, 0.9, 0.95]},
    }
    trials = HA.generate_search(space, 40, seed=0)
    assert len(trials) == 40
    lrs = np.asarray([t["optim.lr"] for t in trials])
    assert (lrs >= 1e-3).all() and (lrs <= 1.0).all()
    # log scaling: roughly half the samples below the geometric mean
    below = (lrs < np.sqrt(1e-3 * 1.0)).mean()
    assert 0.3 < below < 0.7
    moms = {t["optim.momentum"] for t in trials}
    assert moms <= {0, 0.875, 0.9, 0.95}
    assert len(moms) > 1


def test_generate_search_bad_scaling():
    with pytest.raises(ValueError):
        HA.generate_search({"x": {"min": 0, "max": 1, "scaling": "cubic"}}, 4)


# --- sweep generation ------------------------------------------------------

SWEEP = {
    "run_name": "r50_sweep",
    "optim": {
        "lr": {"min": 1.0e-3, "max": 1.0, "scaling": "log"},
        "momentum": {"choices": [0, 0.875]},
    },
}


def test_to_search_space_flattens():
    space = G.to_search_space({k: v for k, v in SWEEP.items() if k != "run_name"})
    assert set(space) == {"optim.lr", "optim.momentum"}


def test_generate_trials_halton_mode():
    name, configs = G.generate_trials(SWEEP, count=7)
    assert name == "r50_sweep"
    assert len(configs) == 7
    for i, cfg in enumerate(configs):
        assert cfg["seed"] == i
        assert cfg["run_name"] == f"r50_sweep-{i}"
        assert cfg["save"] == {"interval": None, "wandb": False}
        assert 1e-3 <= cfg["optim"]["lr"] <= 1.0

    # usable as a config layer
    from hvt import config as C

    merged = C.loads(configs[0])
    assert merged.run_name == "r50_sweep-0"


def test_generate_trials_grid_mode():
    sweep = {
        "run_name": "grid",
        "optim": {"weight_decay": {"choices": [1e-4, 1e-3]},
                  "momentum": {"choices": [0.9, 0.95]}},
    }
    _, configs = G.generate_trials(sweep, count=50)
    assert len(configs) == 4  # full grid (4 < 50)
    combos = {(c["optim"]["weight_decay"], c["optim"]["momentum"]) for c in configs}
    assert len(combos) == 4


def test_write_trials_reads_reference_sweep_yaml(tmp_path):
    # The reference's own sweep config should work end-to-end.
    _, configs = G.generate_trials(
        yaml.safe_load(open("/root/reference/configs/pretrain/r50_cross_entropy_sweep.yaml")),
        count=50,
    )
    assert len(configs) == 6  # 6 choices -> grid
    sweep_file = tmp_path / "sweep.yaml"
    sweep_file.write_text(yaml.safe_dump(SWEEP))
    out = G.write_trials(str(sweep_file), 5, str(tmp_path / "out"))
    files = sorted(out.glob("*.yaml"))
    assert len(files) == 5
    assert yaml.safe_load(files[0].read_text())["run_name"].startswith("r50_sweep-")


# --- dataset tools ---------------------------------------------------------

NAMES = [
    "00001_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_badius",
    "00002_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_cooperii",
    "00003_animalia_chordata_aves_accipitriformes_pandionidae_pandion_haliaetus",
    "00004_plantae_tracheophyta_pinopsida_pinales_pinaceae_pinus_strobus",
    "00005_plantae_tracheophyta_pinopsida_pinales_pinaceae_pinus_resinosa",
]


@pytest.fixture()
def tool_root(tmp_path):
    rng = np.random.default_rng(0)
    for split, k in [("train", 4), ("val", 2)]:
        for name in NAMES:
            d = tmp_path / "ds" / split / name
            d.mkdir(parents=True)
            for i in range(k):
                Image.fromarray(
                    rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
                ).save(d / f"{i}.jpg")
    return tmp_path / "ds"


def test_rand_split_species(tool_root, tmp_path):
    from hvt.tools import rand_split

    downstream = rand_split.choose_downstream(tool_root, "species", 0.4, seed=42)
    assert len(downstream) == 2  # int(5 * 0.4)
    out = tmp_path / "split"
    rand_split.copy_data(tool_root, out / "downstream", downstream)
    rand_split.copy_data(tool_root, out / "pretrain", set(NAMES) - downstream)
    got = {p.name for p in (out / "downstream" / "train").iterdir()}
    assert got == downstream
    got_pre = {p.name for p in (out / "pretrain" / "train").iterdir()}
    assert got_pre == set(NAMES) - downstream
    # seeded: same split again
    assert rand_split.choose_downstream(tool_root, "species", 0.4, seed=42) == downstream


def test_rand_split_subtree(tool_root):
    from hvt.tools import rand_split

    downstream = rand_split.choose_downstream(tool_root, "subtree", 0.4, seed=42)
    # closest node to 2 species: pinus genus (2 species) or pandionidae(1)...
    # must be a single consistent subtree
    labels = [n for n in NAMES if n in downstream]
    assert len(labels) >= 1


def test_low_data_split_shots(tool_root, tmp_path):
    from hvt.tools import low_data_split

    paths, classes = low_data_split.load_split(tool_root / "train")
    assert len(paths) == 20
    few_p, few_c = low_data_split.few_shot_split(paths, classes, shots=2)
    assert len(few_p) == 10  # 2 per class
    import collections

    assert all(v == 2 for v in collections.Counter(few_c).values())

    out = tmp_path / "low"
    low_data_split.save_split(few_p, few_c, out / "train")
    copied = sum(1 for cls in (out / "train").iterdir() for _ in cls.iterdir())
    assert copied == 10


def test_low_data_split_fraction(tool_root):
    from hvt.tools import low_data_split

    paths, classes = low_data_split.load_split(tool_root / "train")
    sub_p, sub_c = low_data_split.stratified_split(paths, classes, 0.5)
    assert len(sub_p) == 10
    import collections

    assert all(v == 2 for v in collections.Counter(sub_c).values())


def test_measure_mean_std(tool_root):
    from hvt.tools import measure_mean_std

    mean, std = measure_mean_std.load_statistics(
        str(tool_root / "train"), size=16, num_workers=2
    )
    # uniform random uint8 sources: mean ~0.5; JPEG smoothing lowers the std
    # from the ideal 0.289 — accept a sanity band.
    assert np.all(np.abs(mean - 0.5) < 0.05)
    assert np.all((std > 0.1) & (std < 0.35))


def test_build_tree_dist_matrix_cli(tool_root, capsys, monkeypatch):
    from hvt.tools import build_tree_dist_matrix

    monkeypatch.setattr(
        "sys.argv", ["build_tree_dist_matrix", "--input", str(tool_root)]
    )
    build_tree_dist_matrix.main()
    assert (tool_root / "tree_dist_cache.npy").is_file()
    assert "(5, 5)" in capsys.readouterr().out


def test_halton_reference_api_helpers():
    """uniform/loguniform/discrete/interval/zipit (reference halton.py:233-304)."""
    gens = [
        HA.loguniform("lr", HA.interval(1e-3, 1.0)),
        HA.uniform("momentum", HA.discrete([0.9, 0.95])),
        HA.uniform("frac", HA.interval(0.0, 1.0)),
    ]
    trials = HA.zipit(gens, 20)
    assert len(trials) == 20
    for t in trials:
        assert 1e-3 <= t["lr"] <= 1.0
        assert t["momentum"] in (0.9, 0.95)
        assert 0.0 <= t["frac"] <= 1.0
    # sweep-list passthrough
    fixed = [{"wd": 1e-4}, {"wd": 1e-3}]
    trials2 = HA.zipit([fixed, HA.uniform("m", HA.discrete([1, 2]))], 2)
    assert [t["wd"] for t in trials2] == [1e-4, 1e-3]


def test_toolkit_count_summary_and_run_jobs(tmp_path):
    from hvt.tools import toolkit

    summary = toolkit.CountSummary.of(["a", "a", "a", "b", "c", "c"])
    assert summary.smallest == ("b", 1)
    assert summary.largest == ("a", 3)
    assert summary.mean == 2.0
    assert summary.num_classes == 3
    assert "min=1" in str(summary) and "max=3" in str(summary)

    hits = []
    n = toolkit.run_jobs([lambda i=i: hits.append(i) for i in range(7)], label="x")
    assert n == 7 and sorted(hits) == list(range(7))
    assert toolkit.run_jobs([], label="empty") == 0

    # first exception propagates
    def boom():
        raise RuntimeError("job failed")

    import pytest

    with pytest.raises(RuntimeError, match="job failed"):
        toolkit.run_jobs([boom], label="boom")

    log = toolkit.tool_logger("unittest", tmp_path)
    log.info("hello toolkit")
    assert "hello toolkit" in (tmp_path / "unittest.log").read_text()


def test_tpu_vm_submitter_command(tmp_path, monkeypatch, capsys):
    import submit_tpu_vm as sub

    cmd = sub.build_command(
        "my-v5e", "us-west4-a", "m.yaml", ["a.yaml", "b.yaml"],
        project="proj-1", env={"HVT_MULTIHOST": "1"},
    )
    assert cmd[:6] == ["gcloud", "compute", "tpus", "tpu-vm", "ssh", "my-v5e"]
    assert "--zone=us-west4-a" in cmd and "--project=proj-1" in cmd
    assert "--worker=all" in cmd
    inner = [c for c in cmd if c.startswith("--command=")][0]
    assert "HVT_MULTIHOST=1 python main.py --machine m.yaml --exp a.yaml b.yaml" in inner

    with __import__("pytest").raises(ValueError):
        sub.build_command("t", "z", "m.yaml", [])

    # dry-run sweep over a config dir: one printed command per trial
    (tmp_path / "t0.yaml").write_text("run_name: t0\n")
    (tmp_path / "t1.yaml").write_text("run_name: t1\n")
    monkeypatch.setattr(
        "sys.argv",
        ["submit_tpu_vm", "--tpu", "t", "--zone", "z", "--machine", "m.yaml",
         "--exp", "base.yaml", "--exp-dir", str(tmp_path)],
    )
    sub.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2 and all("gcloud" in line for line in out)
    assert all("base.yaml" in line for line in out)
