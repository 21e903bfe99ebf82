"""Auxiliary subsystems: FLOPs accounting, memory stats, checkpoint URIs,
Swin activation outputs (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvt.models import resnet as R
from hvt.models import swinv2 as S
from hvt.train import checkpoint as ckpt
from hvt.utils.logging import SpeedMonitor, memory_stats


def test_resnet50_analytic_flops():
    model = R.resnet50(1000, dtype=jnp.float32)
    flops = R.analytic_flops(model, 224)
    # ResNet-50 @224 is ~4.1 GFLOPs (multiply-add counted as 2)
    assert 3.5e9 < flops < 4.8e9, flops


def test_resnet_flops_scale_with_resolution():
    model = R.resnet50(1000)
    assert R.analytic_flops(model, 224) > 3.5 * R.analytic_flops(model, 112)


def test_memory_stats_shape():
    stats = memory_stats()
    # cpu backend may not expose memory stats; the call must not crash and
    # values, if present, are non-negative floats
    for v in stats.values():
        assert isinstance(v, float) and v >= 0


def test_speed_monitor():
    import time

    mon = SpeedMonitor(window_size=10, num_chips=4)
    assert mon.metrics() == {}
    for _ in range(5):
        mon.batch_end(64)
        time.sleep(0.002)
    m = mon.metrics()
    assert m["samples_per_sec"] > 0
    assert m["samples_per_sec_per_chip"] == pytest.approx(m["samples_per_sec"] / 4)


def test_wandb_uri_parse_and_error():
    with pytest.raises(ValueError):
        ckpt.resolve_wandb_uri("notwandb://x")
    with pytest.raises(RuntimeError, match="wandb"):
        ckpt.resolve_wandb_uri("wandb://org/proj/name:latest?ep36.pt")


def test_ckpt_uri_parse():
    path, step = ckpt.parse_checkpoint_uri("ckpt:///a/b:36")
    assert str(path) == "/a/b" and step == 36
    path, step = ckpt.parse_checkpoint_uri("/plain/path")
    assert str(path) == "/plain/path" and step is None


def test_swin_output_activations():
    model = S.swinv2_micro(4, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    feats, acts = model.apply(
        variables, x, train=False, features_only=True, output_activations=True
    )
    assert feats.shape == (1, 32)  # embed 16, 2 stages -> 32
    assert len(acts) == 2
    # stage 0 output is post-merge (downsampled, doubled channels)
    assert acts[0].shape[-1] == 32


# --- wandb story (mocked package) -------------------------------------------


class _FakeRun:
    def __init__(self, **kw):
        self.kw = kw
        self.entity = "ent"
        self.project = "proj"
        self.id = "run123"
        self.logged = []
        self.artifacts = []
        self.config = type("Cfg", (), {"update": lambda self, d: None})()
        self.finished = False

    def log(self, record, step=None):
        self.logged.append((step, record))

    def log_artifact(self, artifact, aliases=None):
        self.artifacts.append((artifact, list(aliases or [])))

    def finish(self):
        self.finished = True


class _FakeArtifact:
    def __init__(self, name, type, metadata=None):
        self.name, self.type, self.metadata = name, type, metadata
        self.dirs, self.files = [], []

    def add_dir(self, p):
        self.dirs.append(p)

    def add_file(self, p, name=None):
        self.files.append((p, name))


class _FakeWandb:
    Artifact = _FakeArtifact

    def __init__(self):
        self.runs = []

    def init(self, **kw):
        run = _FakeRun(**kw)
        self.runs.append(run)
        return run


def _patch_wandb(monkeypatch):
    import hvt.utils.logging as L

    fake = _FakeWandb()
    monkeypatch.setattr(L, "wandb", fake)
    monkeypatch.setattr(L, "_HAS_WANDB", True)
    return fake


def test_runlogger_wandb_metrics_and_artifact(tmp_path, monkeypatch):
    from hvt.utils.logging import RunLogger

    fake = _patch_wandb(monkeypatch)
    logger = RunLogger(tmp_path, "myrun", use_wandb=True,
                       wandb_entity="e", wandb_project="p", tags=["t"])
    assert logger.run_info == {"entity": "ent", "project": "proj", "run_id": "run123"}
    logger.log(3, {"acc@1": 0.5}, prefix="eval")
    (ckdir := tmp_path / "checkpoints" / "7").mkdir(parents=True)
    # The uploader skips .txt files and symlinks like the reference's
    # (reference monkey_patch.py:76-80); everything else uploads with
    # directory-relative names.
    (ckdir / "weights.ckpt").write_bytes(b"w")
    (sub := ckdir / "state").mkdir()
    (sub / "opt.msgpack").write_bytes(b"o")
    (ckdir / "notes.txt").write_text("skip me")
    (ckdir / "latest-link").symlink_to(ckdir / "weights.ckpt")
    assert logger.log_artifact(
        ckdir, name="myrun-checkpoints", aliases=["latest", "ep1-ba7"],
        metadata={"step": 7},
    )
    # whole-artifact skip rules: a .txt or symlink top-level path is refused
    (txt := tmp_path / "alone.txt").write_text("x")
    assert not logger.log_artifact(txt, name="nope")
    logger.close()

    run = fake.runs[0]
    assert run.logged and run.logged[0][1]["eval/acc@1"] == 0.5
    artifact, aliases = run.artifacts[0]
    assert aliases == ["latest", "ep1-ba7"]
    assert artifact.name == "myrun-checkpoints"
    assert artifact.dirs == []  # files added individually (skip rules apply)
    assert sorted(name for _, name in artifact.files) == [
        "state/opt.msgpack", "weights.ckpt",
    ]
    assert len(run.artifacts) == 1  # the .txt upload was refused
    assert artifact.metadata["step"] == 7 and "timestamp" in artifact.metadata
    assert run.finished


def test_runlogger_nonzero_rank_no_run(tmp_path, monkeypatch):
    from hvt.utils.logging import RunLogger

    fake = _patch_wandb(monkeypatch)
    logger = RunLogger(tmp_path, "myrun", rank=1, use_wandb=True)
    assert not fake.runs  # only rank 0 creates the run
    assert not logger.log_artifact(tmp_path, name="x")  # clean no-op
    logger.close()


def test_runlogger_warns_without_wandb_package(tmp_path):
    from hvt.utils.logging import RunLogger, _HAS_WANDB

    if _HAS_WANDB:
        pytest.skip("wandb installed in this environment")
    with pytest.warns(UserWarning, match="wandb"):
        logger = RunLogger(tmp_path, "r", use_wandb=True)
    logger.close()


def test_broadcast_small_json_single_world():
    from hvt import parallel

    obj = {"entity": "e", "run_id": "abc"}
    assert parallel.broadcast_small_json(obj, world=1) is obj


def test_trainer_uploads_checkpoint_artifacts(tmp_path, monkeypatch):
    """save.wandb: true uploads every checkpoint with latest/ep{N}-ba{M}
    aliases (reference monkey_patch.py:33-91)."""
    from hvt import config as C
    from hvt import parallel
    from hvt.train.loop import Trainer

    fake = _patch_wandb(monkeypatch)
    cfg = C.loads(
        {
            "run_name": "artifacts",
            "max_duration": "2ba",
            "model": {"name": "resnet_micro"},
            "machine": {"save_root": str(tmp_path)},
            "train_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 16, "crop_size": 32,
                "global_batch_size": 8, "drop_last": True, "shuffle": True,
            },
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "optim": {"name": "DecoupledSGDW", "lr": 0.05, "momentum": 0.9,
                      "weight_decay": 1e-4},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "save": {"interval": None, "num_checkpoints_to_keep": 1, "wandb": True},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(2), log_interval=10)
    tr.fit()
    tr.close()
    run = fake.runs[0]
    # final save at step 2 = epoch 1 boundary (2 steps/epoch)
    artifact, aliases = run.artifacts[-1]
    assert artifact.name == "artifacts-checkpoints"
    assert aliases == ["latest", "ep1-ba2"]
