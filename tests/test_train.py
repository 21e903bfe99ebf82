import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hvt import config as C
from hvt import metrics as M
from hvt import parallel
from hvt.train import optim as optim_lib
from hvt.train import schedule as S
from hvt.train.ema import EmaConfig, update as ema_update


# --- schedule --------------------------------------------------------------


def test_parse_duration():
    assert S.parse_duration("36ep") == S.Duration(36, "ep")
    assert S.parse_duration("100ba") == S.Duration(100, "ba")
    assert S.parse_duration(5) == S.Duration(5, "ba")
    assert S.parse_duration("0.4dur").to_steps(10, total_steps=100) == 40
    with pytest.raises(ValueError):
        S.parse_duration("10min")
    assert S.Duration(8, "ep").to_steps(100) == 800


def test_cosine_with_warmup_values():
    sched = S.cosine_with_warmup(warmup_steps=10, total_steps=110, alpha_f=0.0)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(0.5)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(60)) == pytest.approx(0.5, abs=1e-6)  # cosine midpoint
    assert float(sched(110)) == pytest.approx(0.0, abs=1e-6)

    alpha = S.cosine_with_warmup(10, 110, alpha_f=0.1)
    assert float(alpha(110)) == pytest.approx(0.1, abs=1e-6)


def test_constant_with_warmup_values():
    sched = S.constant_with_warmup(warmup_steps=4)
    assert float(sched(2)) == pytest.approx(0.5)
    assert float(sched(4)) == 1.0
    assert float(sched(400)) == 1.0


def test_build_multiplier_schedule_from_config():
    cfg = C.loads({"scheduler": {"args": {"t_warmup": "2ep", "alpha_f": 0.0}}})
    sched = S.build_multiplier_schedule(cfg.scheduler, steps_per_epoch=5, total_steps=50)
    assert float(sched(10)) == pytest.approx(1.0)  # end of 2-epoch warmup

    cfg2 = C.loads(
        {"scheduler": {"name": "ConstantWithWarmupScheduler", "args": {"t_warmup": "1ep"}}}
    )
    sched2 = S.build_multiplier_schedule(cfg2.scheduler, 5, 50)
    assert float(sched2(30)) == 1.0


# --- optimizers ------------------------------------------------------------


def _flat_params():
    return {
        "dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))},
        "bn": {"scale": jnp.ones((3,))},
    }


def test_decay_mask_ndim_rule():
    mask = optim_lib.decay_mask(_flat_params())
    assert mask["dense"]["kernel"] is True or mask["dense"]["kernel"] == True  # noqa: E712
    assert not mask["dense"]["bias"]
    assert not mask["bn"]["scale"]


def test_decay_mask_extra_substrings():
    params = {"attn": {"logit_scale": jnp.ones((2, 2))}, "mlp": {"kernel": jnp.ones((2, 2))}}
    mask = optim_lib.decay_mask(params, extra_no_decay=("logit_scale",))
    assert not mask["attn"]["logit_scale"]
    assert mask["mlp"]["kernel"]


def test_decoupled_sgdw_decay_scales_with_multiplier_not_lr():
    """Composer DecoupledSGDW: decay per step = wd * multiplier(step) — not
    wd * lr. With lr=2.0 and zero grads, one step shrinks params by exactly
    wd * mult."""
    cfg = C.loads({"optim": {"name": "DecoupledSGDW", "lr": 2.0, "momentum": 0.0,
                              "weight_decay": 0.1}})
    mult = lambda step: jnp.asarray(0.5)  # constant multiplier  # noqa: E731
    tx = optim_lib.build_optimizer(cfg.optim, mult)
    params = {"w": jnp.ones((2, 2))}
    state = tx.init(params)
    grads = {"w": jnp.zeros((2, 2))}
    updates, _ = tx.update(grads, state, params)
    import optax

    new = optax.apply_updates(params, updates)
    # decay = wd * mult = 0.05 (NOT wd * lr * mult = 0.1)
    np.testing.assert_allclose(np.asarray(new["w"]), 0.95, rtol=1e-6)


def test_sgd_nesterov_coupled_decay_matches_torch():
    import torch

    cfg = C.loads({"optim": {"name": "sgd", "lr": 0.1, "momentum": 0.9,
                              "weight_decay": 0.01}})
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
    w0 = np.ones((2, 2), dtype=np.float32) * 0.5
    g = np.full((2, 2), 0.3, dtype=np.float32)

    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    import optax

    for _ in range(3):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, nesterov=True, weight_decay=0.01)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5)


def test_adamw_matches_torch():
    import optax
    import torch

    cfg = C.loads({"optim": {"name": "adamw", "lr": 0.01, "weight_decay": 0.05}})
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
    w0 = np.linspace(-1, 1, 6, dtype=np.float32).reshape(2, 3)
    g = np.full((2, 3), 0.2, dtype=np.float32)

    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for _ in range(4):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.AdamW([tw], lr=0.01, weight_decay=0.05)
    for _ in range(4):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-4)


def test_grad_clip_applied():
    cfg = C.loads({"optim": {"name": "DecoupledSGDW", "lr": 1.0, "momentum": 0.0,
                              "weight_decay": 0.0}})
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0), grad_clip_norm=1.0)
    params = {"w": jnp.zeros((4,4))}
    state = tx.init(params)
    big = {"w": jnp.full((4, 4), 100.0)}
    updates, _ = tx.update(big, state, params)
    import optax

    assert float(optax.global_norm(updates)) == pytest.approx(1.0, rel=1e-5)


# --- EMA -------------------------------------------------------------------


def test_ema_config_and_update():
    cfg = EmaConfig.from_args({"half_life": "100ba", "update_interval": "20ba"})
    assert cfg.decay == pytest.approx(0.5 ** 0.2)

    ema = {"w": jnp.zeros((2,))}
    new = {"w": jnp.ones((2,))}
    on = ema_update(cfg, jnp.asarray(0), ema, new)  # step 0 → update fires
    np.testing.assert_allclose(np.asarray(on["w"]), 1 - cfg.decay, rtol=1e-6)
    off = ema_update(cfg, jnp.asarray(1), ema, new)  # step 1 → identity
    np.testing.assert_allclose(np.asarray(off["w"]), 0.0)
    assert ema_update(cfg, jnp.asarray(0), None, new) is None


# --- metrics ---------------------------------------------------------------


def test_batch_stats_and_accumulator():
    logits = jnp.asarray([
        [5.0, 1.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 5.0, 4.0, 3.0, 2.0, 1.0],
        [0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
    ])
    labels = jnp.asarray([0, 2, 0])
    mask = jnp.asarray([1.0, 1.0, 0.0])  # last row padded
    tree = jnp.asarray(np.arange(36).reshape(6, 6), dtype=jnp.uint8)

    stats = M.batch_stats(logits, labels, mask, tree_dists=tree)
    assert float(stats["count"]) == 2.0
    assert float(stats["correct@1"]) == 1.0  # only row 0 correct
    assert float(stats["correct@5"]) == 2.0  # row 1 target=2 in top-5
    # tree dist: row0 pred 0 target 0 -> 0; row1 pred 1 target 2 -> tree[1,2]=8
    assert float(stats["tree_dist_sum"]) == 8.0

    acc = M.MetricAccumulator()
    acc.update(stats)
    acc.update(stats)
    out = acc.compute()
    assert out["acc@1"] == pytest.approx(0.5)
    assert out["acc@5"] == pytest.approx(1.0)
    assert out["tree-dist"] == pytest.approx(4.0)


def test_batch_stats_multitask_uses_last_tier():
    outputs = [jnp.asarray([[9.0, 0.0]]), jnp.asarray([[0.0, 9.0, 0.0]])]
    labels = jnp.asarray([[0, 1]])
    stats = M.batch_stats(outputs, labels, jnp.asarray([1.0]))
    assert float(stats["correct@1"]) == 1.0


def test_accuracy_topk_numpy():
    out = np.asarray([[0.1, 0.9], [0.8, 0.2]])
    assert M.accuracy_topk(out, np.asarray([1, 0])) == 1.0
    assert M.accuracy_topk(out, np.asarray([0, 1])) == 0.0


# --- end-to-end micro training --------------------------------------------


@pytest.fixture(scope="module")
def micro_config(tmp_path_factory):
    save_root = tmp_path_factory.mktemp("runs")
    return C.loads(
        {
            "run_name": "micro",
            "max_duration": "4ba",
            "grad_accum": 1,
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"save_root": str(save_root)},
            "train_dataset": {
                "source": "synthetic",
                "synthetic_num_classes": 4,
                "synthetic_num_samples": 32,
                "crop_size": 32,
                "global_batch_size": 8,
                "drop_last": True,
                "shuffle": True,
            },
            "eval_dataset": {
                "source": "synthetic",
                "synthetic_num_classes": 4,
                "synthetic_num_samples": 16,
                "crop_size": 32,
                "global_batch_size": 8,
            },
            "optim": {"name": "DecoupledSGDW", "lr": 0.05, "momentum": 0.9,
                      "weight_decay": 1e-4},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "algorithms": [
                {"cls": "EMA", "args": {"half_life": "4ba", "update_interval": "2ba"}},
                {"cls": "LabelSmoothing", "args": {"smoothing": 0.08}},
                {"cls": "GradientClipping",
                 "args": {"clipping_type": "norm", "clipping_threshold": 2.0}},
            ],
            "save": {"interval": None, "num_checkpoints_to_keep": 1, "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )


def test_trainer_fit_and_resume(micro_config):
    from hvt.train.loop import Trainer

    mesh = parallel.cpu_mesh(2)
    tr = Trainer(micro_config, mesh=mesh, log_interval=2)
    assert tr.total_steps == 4
    metrics = tr.fit()
    assert np.isfinite(metrics["cross-entropy"])
    assert int(tr.state.step) == 4
    assert tr.state.ema_params is not None
    step_dir = tr.checkpointer.latest_step()
    assert step_dir == 4
    tr.close()

    # Resume from the saved checkpoint into a fresh trainer.
    resumed_cfg = C.loads(
        C.to_dict(micro_config),
        {"load_path": str(
            __import__("pathlib").Path(micro_config.machine.save_root) / "micro" / "checkpoints"
        )},
    )
    tr2 = Trainer(resumed_cfg, mesh=mesh, log_interval=2)
    assert int(tr2.state.step) == 4
    # params actually restored (differ from fresh init)
    fresh = Trainer(micro_config, mesh=mesh, log_interval=2)
    l2 = jax.tree.leaves(tr2.state.params)
    lf = jax.tree.leaves(fresh.state.params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(l2, lf))
    tr2.close()
    fresh.close()


def test_eval_only_run(micro_config):
    """is_train: false runs a single evaluation (reference main.py:129-131)."""
    from hvt.train.loop import Trainer

    cfg = C.loads(C.to_dict(micro_config), {"is_train": False, "run_name": "evalonly"})
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(2), log_interval=2)
    metrics = tr.fit()
    assert int(tr.state.step) == 0  # no training happened
    assert "acc@1" in metrics and "tree-dist" in metrics  # eval-only adds tree-dist
    tr.close()


def test_eval_interval_in_batches(micro_config):
    """eval_interval "2ba" evaluates every 2 optimizer steps (Composer honors
    the full time grammar, reference main.py:109)."""
    from hvt.train.loop import Trainer

    cfg = C.loads(
        C.to_dict(micro_config),
        {"run_name": "evalba", "eval_interval": "2ba"},
    )
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(2), log_interval=2)
    calls = []
    inner = tr.evaluate
    tr.evaluate = lambda: (calls.append(int(tr.state.step)), inner())[1]
    tr.fit()
    tr.close()
    # pre-train eval at step 0, then every 2 steps; no duplicate final eval.
    assert calls == [0, 2, 4]


def test_basic_resnet_warns_on_stochastic_depth():
    from hvt.models import build_model

    cfg = C.loads(
        {
            "model": {"name": "resnet18"},
            "algorithms": [{"cls": "StochasticDepth", "args": {"drop_rate": 0.2}}],
        }
    )
    with pytest.warns(UserWarning, match="ignores stochastic_depth_rate"):
        build_model(cfg, 10)


def test_unknown_model_error_names_reference_contract():
    from hvt.models import build_model

    # vit/convnext/efficientnet/regnet/dinov2 joined the registry in
    # round 4 — use a name that stays timm-only (DenseNet has no hvt
    # implementation).
    cfg = C.loads({"model": {"name": "densenet121"}})
    with pytest.raises(ValueError, match="timm"):
        build_model(cfg, 10)


def test_mid_epoch_resume_bitwise_exact(micro_config):
    """Interrupt at step k mid-epoch, resume, and match the uninterrupted
    run bit for bit (Composer resumes at the batch, reference main.py:118)."""
    import pathlib

    from hvt.train.loop import Trainer

    mesh = parallel.cpu_mesh(2)
    # 32 samples / batch 8 = 4 steps per epoch. All runs share max_duration
    # (the schedule depends on it); run A checkpoints every 3 steps, and we
    # resume from its step-6 (mid-epoch-2) checkpoint — a preemption at k=6.
    part = C.loads(
        C.to_dict(micro_config),
        {
            "run_name": "interrupted",
            "max_duration": "8ba",
            "save": {"interval": "3ba", "num_checkpoints_to_keep": 5},
        },
    )
    tr_a = Trainer(part, mesh=mesh, log_interval=10)
    assert tr_a.steps_per_epoch == 4
    tr_a.fit()
    tr_a.close()

    ckpts = pathlib.Path(part.machine.save_root) / "interrupted" / "checkpoints"
    assert (ckpts / "6").is_dir(), "expected a mid-epoch checkpoint at step 6"
    resumed = C.loads(
        C.to_dict(micro_config),
        {"run_name": "resumed", "max_duration": "8ba",
         "load_path": f"ckpt://{ckpts}:6"},
    )
    tr_b = Trainer(resumed, mesh=mesh, log_interval=10)
    assert int(tr_b.state.step) == 6
    tr_b.fit()
    assert int(tr_b.state.step) == 8
    tr_b.close()

    straight = C.loads(
        C.to_dict(micro_config), {"run_name": "straight", "max_duration": "8ba"}
    )
    tr_c = Trainer(straight, mesh=mesh, log_interval=10)
    tr_c.fit()
    assert int(tr_c.state.step) == 8

    for name, resumed_tree, straight_tree in (
        ("params", tr_b.state.params, tr_c.state.params),
        ("batch_stats", tr_b.state.batch_stats, tr_c.state.batch_stats),
        ("ema_params", tr_b.state.ema_params, tr_c.state.ema_params),
    ):
        for a, b in zip(jax.tree.leaves(resumed_tree), jax.tree.leaves(straight_tree)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), f"{name} diverged"
    tr_c.close()


def test_choose_grad_accum_doubles_until_fit():
    from hvt.train import microbatch

    # fake: memory halves with each doubling of accum
    measure = lambda a: 100 // a  # noqa: E731
    assert microbatch.choose_grad_accum(measure, 64, limit_bytes=110) == 1
    assert microbatch.choose_grad_accum(measure, 64, limit_bytes=60) == 2
    assert microbatch.choose_grad_accum(measure, 64, limit_bytes=28) == 4
    # no limit info -> don't split
    assert microbatch.choose_grad_accum(measure, 64, limit_bytes=None) == 1
    # no analysis available -> accept current candidate
    assert microbatch.choose_grad_accum(lambda a: None, 64, limit_bytes=10) == 1
    # candidates must divide the batch: batch 12 skips 8, lands on... none >4
    with pytest.raises(MemoryError):
        microbatch.choose_grad_accum(lambda a: 10**9, 4, limit_bytes=100)


def test_choose_grad_accum_respects_divisibility():
    from hvt.train import microbatch

    calls = []

    def measure(a):
        calls.append(a)
        return 100 if a < 16 else 1

    # batch 48: candidates 1,2,4,8,16 all divide 48 except 32; 16 divides 48
    assert microbatch.choose_grad_accum(measure, 48, limit_bytes=50) == 16
    assert calls == [1, 2, 4, 8, 16]


def test_tensor_parallel_invariance(tmp_path):
    """A (2 data x 2 model) mesh with the TP rules trains identically to a
    (4 data x 1) DP-only mesh — tensor parallelism is mathematically exact,
    XLA just partitions the matmuls (hvt.parallel.TP_RULES)."""
    from hvt.train.loop import Trainer

    def build(run_name, model_axis):
        cfg = C.loads(
            {
                "run_name": run_name,
                "max_duration": "2ba",
                "seed": 3,
                "model": {"name": "swinv2_micro", "args": {"dtype": "float32"}},
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
                "optim": {"name": "DecoupledAdamW", "lr": 1e-3,
                          "weight_decay": 0.01},
                "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
                "save": {"interval": None, "num_checkpoints_to_keep": 1,
                         "wandb": False},
                "loader": {"num_workers": 1, "prefetch_batches": 1},
            }
        )
        return Trainer(cfg, mesh=parallel.cpu_mesh(4, model=model_axis),
                       log_interval=10)

    dp = build("tp_dp", 1)
    tp = build("tp_tp", 2)

    # TP actually sharded the MLP kernels over the model axis.
    flat = jax.tree_util.tree_flatten_with_path(tp.state.params)[0]
    fc1 = [s for p, s in flat if "fc1" in "/".join(str(k) for k in p)
           and "kernel" in "/".join(str(k) for k in p)]
    assert fc1 and all("model" in str(s.sharding.spec) for s in fc1)

    m_dp = dp.fit()
    m_tp = tp.fit()
    assert m_dp["cross-entropy"] == pytest.approx(m_tp["cross-entropy"], rel=1e-5)
    for a, b in zip(jax.tree.leaves(dp.state.params), jax.tree.leaves(tp.state.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )
    dp.close()
    tp.close()


def test_trainer_learns_separable_task(tmp_path):
    """End-to-end learning signal: the full Trainer (loader → augment →
    jitted step → metrics) drives a micro model to high accuracy on a
    trivially separable color-classification ImageFolder. Guards against
    sign/wiring bugs that leave every step finite but learning-free."""
    from PIL import Image

    from hvt.train.loop import Trainer

    names = [
        "00001_animalia_chordata_aves_a_b_c_red",
        "00002_animalia_chordata_aves_a_b_c_green",
        "00003_animalia_chordata_aves_a_b_c_blue",
        "00004_animalia_chordata_aves_a_b_c_gray",
    ]
    colors = [(220, 30, 30), (30, 220, 30), (30, 30, 220), (128, 128, 128)]
    rng = np.random.default_rng(0)
    for split, k in [("train", 16), ("val", 4)]:
        for name, color in zip(names, colors):
            d = tmp_path / "ds" / split / name
            d.mkdir(parents=True)
            for i in range(k):
                img = np.asarray(color, np.int16)[None, None, :] + rng.integers(
                    -25, 25, (24, 24, 3)
                )
                Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                    d / f"{i}.jpg"
                )

    cfg = C.loads(
        {
            "run_name": "learns",
            "max_duration": "15ep",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"datasets": {"fix": str(tmp_path / "ds")},
                        "save_root": str(tmp_path / "runs")},
            "train_dataset": {"path": "fix", "crop_size": 24, "resize_size": -1,
                              "global_batch_size": 16, "drop_last": True,
                              "shuffle": True},
            "eval_dataset": {"path": "fix", "crop_size": 24, "resize_size": 26,
                             "global_batch_size": 16},
            "optim": {"name": "sgd", "lr": 0.05, "momentum": 0.9,
                      "weight_decay": 1e-4},
            "scheduler": {"args": {"t_warmup": "4ba", "alpha_f": 0.0}},
            "algorithms": [],
            "save": {"interval": None, "num_checkpoints_to_keep": 1,
                     "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
            "eval_interval": "15ep",
        }
    )
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(2), log_interval=20)
    metrics = tr.fit()
    tr.close()
    assert metrics["acc@1"] >= 0.9, metrics
    assert metrics["cross-entropy"] < 1.0, metrics


def test_auto_resume_picks_up_own_checkpoints(micro_config):
    """auto_resume: re-submitting the identical config resumes from the run's
    own latest checkpoint instead of restarting (idempotent recovery; the
    reference's recovery is manual load_path re-submission, SURVEY.md §5)."""
    from hvt.train.loop import Trainer

    cfg = C.loads(C.to_dict(micro_config),
                  {"run_name": "autoresume", "auto_resume": True,
                   "max_duration": "2ba"})
    tr = Trainer(cfg, mesh=parallel.cpu_mesh(1), log_interval=10)
    assert int(tr.state.step) == 0  # nothing to resume yet
    tr.fit()
    tr.close()

    # identical re-submission continues at step 2 and trains to 4
    cfg2 = C.loads(C.to_dict(cfg), {"max_duration": "4ba"})
    tr2 = Trainer(cfg2, mesh=parallel.cpu_mesh(1), log_interval=10)
    assert int(tr2.state.step) == 2
    tr2.fit()
    assert int(tr2.state.step) == 4
    tr2.close()

    # load_path wins over auto_resume (explicit beats implicit)
    other = str(
        __import__("pathlib").Path(cfg.machine.save_root) / "autoresume" / "checkpoints"
    )
    cfg3 = C.loads(C.to_dict(cfg), {"run_name": "autoresume2",
                                    "load_path": other})
    tr3 = Trainer(cfg3, mesh=parallel.cpu_mesh(1), log_interval=10)
    assert int(tr3.state.step) == 4  # the other run's latest (step 4)
    tr3.close()


def test_pretrained_load_adapts_stem_layout(monkeypatch):
    """A plain-stem checkpoint loads into a space-to-depth model and vice
    versa — the s2d stem keeps the standard (7,7,3,w) kernel under a flat
    param path (hvt/models/resnet.py SpaceToDepthStem), so the pretrained
    path remaps it instead of silently leaving the stem at init."""
    from hvt.models import build_model
    from hvt.train import checkpoint as ckpt_lib

    plain = build_model(
        C.loads({"model": {"name": "resnet_micro_bottleneck"}}), 4
    )
    s2d = build_model(
        C.loads({"model": {"name": "resnet_micro_bottleneck",
                           "args": {"stem_s2d": True}}}), 4
    )
    x = jnp.zeros((2, 32, 32, 3))
    vp = jax.device_get(plain.init(jax.random.key(0), x, train=False))
    vs = jax.device_get(s2d.init(jax.random.key(1), x, train=False))

    # plain checkpoint → s2d model
    monkeypatch.setattr(ckpt_lib, "load_raw",
                        lambda uri: {"params": vp["params"]})
    merged, _ = ckpt_lib.load_pretrained("x", vs["params"], None)
    np.testing.assert_array_equal(
        np.asarray(merged["stem"]["kernel"]),
        np.asarray(vp["params"]["stem"]["Conv_0"]["kernel"]),
    )

    # s2d checkpoint → plain model
    monkeypatch.setattr(ckpt_lib, "load_raw",
                        lambda uri: {"params": vs["params"]})
    merged2, _ = ckpt_lib.load_pretrained("x", vp["params"], None)
    np.testing.assert_array_equal(
        np.asarray(merged2["stem"]["Conv_0"]["kernel"]),
        np.asarray(vs["params"]["stem"]["kernel"]),
    )


def test_sigterm_preempts_saves_and_auto_resumes(tmp_path):
    """Preemption-safe training: SIGTERM mid-run finishes the in-flight
    step, checkpoints, and returns; an idempotent resubmission with
    auto_resume picks up at that step and completes (the spot-TPU-VM /
    SLURM preemption contract — beyond parity, reference has none)."""
    import signal

    from hvt.train.loop import Trainer

    cfg = C.loads(
        {
            "run_name": "preempt",
            "max_duration": "6ba",
            "grad_accum": 1,
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"save_root": str(tmp_path)},
            "train_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 48, "crop_size": 32,
                "global_batch_size": 8,
            },
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "optim": {"name": "DecoupledSGDW", "lr": 0.05, "momentum": 0.9,
                      "weight_decay": 1e-4},
            "scheduler": {"args": {"t_warmup": "1ba", "alpha_f": 0.0}},
            "save": {"interval": None, "num_checkpoints_to_keep": 2,
                     "wandb": False},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    mesh = parallel.cpu_mesh(2)
    tr = Trainer(cfg, mesh=mesh, log_interval=10)
    assert tr.total_steps == 6

    # Deliver a real SIGTERM from inside the 2nd train step (synchronous in
    # the main thread, so the handler runs before the loop's flag check).
    orig_step, calls = tr.train_step, 0

    def stepping(*args, **kwargs):
        nonlocal calls
        calls += 1
        if calls == 2:
            signal.raise_signal(signal.SIGTERM)
        return orig_step(*args, **kwargs)

    tr.train_step = stepping
    before_handler = signal.getsignal(signal.SIGTERM)
    tr.fit()
    assert int(tr.state.step) == 2  # stopped after the in-flight step
    assert tr.checkpointer.latest_step() == 2
    tr.close()
    # The handler was uninstalled on return (restored exactly).
    assert signal.getsignal(signal.SIGTERM) == before_handler

    # Idempotent resubmission: same config + auto_resume completes the run.
    resumed = C.loads(C.to_dict(cfg), {"auto_resume": True})
    tr2 = Trainer(resumed, mesh=mesh, log_interval=10)
    assert int(tr2.state.step) == 2
    metrics = tr2.fit()
    assert int(tr2.state.step) == 6
    assert tr2.checkpointer.latest_step() == 6
    assert np.isfinite(metrics["cross-entropy"])
    tr2.close()


def test_cross_topology_checkpoint_restore(micro_config):
    """A checkpoint written under one mesh topology restores under another
    (Orbax stores global arrays; the restore target's shardings drive the
    resharding): TP=2-sharded SwinV2 state -> pure-DP mesh, and that DP
    checkpoint -> back onto a TP mesh. Production reality: save/restore
    must not pin the run to its original device layout."""
    from hvt.train.loop import Trainer

    swin = C.loads(
        C.to_dict(micro_config),
        {
            "run_name": "topo_tp",
            "max_duration": "2ba",
            "model": {"name": "swinv2_micro"},
            "algorithms": [
                {"cls": "LabelSmoothing", "args": {"smoothing": 0.08}},
            ],
            "optim": {"name": "DecoupledAdamW", "lr": 1e-3,
                      "weight_decay": 0.05},
            "save": {"interval": "2ba", "num_checkpoints_to_keep": 2},
        },
    )
    tp_mesh = parallel.cpu_mesh(4, model=2)
    tr_a = Trainer(swin, mesh=tp_mesh, log_interval=10)
    # Sanity: the TP rules actually sharded the MLP.
    specs = {
        str(leaf.sharding.spec)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            tr_a.state.params
        )[0]
        if "fc1" in "/".join(str(p) for p in path)
    }
    assert any("model" in s for s in specs), specs
    tr_a.fit()
    final_a = jax.tree.map(np.asarray, jax.device_get(tr_a.state.params))
    tr_a.close()

    import pathlib

    ckpts = pathlib.Path(swin.machine.save_root) / "topo_tp" / "checkpoints"
    assert (ckpts / "2").is_dir()

    # TP-sharded checkpoint -> pure-DP mesh.
    dp_cfg = C.loads(
        C.to_dict(swin),
        {"run_name": "topo_dp", "load_path": f"ckpt://{ckpts}:2"},
    )
    dp_mesh = parallel.cpu_mesh(4)
    tr_b = Trainer(dp_cfg, mesh=dp_mesh, log_interval=10)
    assert int(tr_b.state.step) == 2
    final_b = jax.tree.map(np.asarray, jax.device_get(tr_b.state.params))
    for a, b in zip(jax.tree.leaves(final_a), jax.tree.leaves(final_b)):
        assert np.array_equal(a, b), "TP->DP restore changed parameter values"
    tr_b.close()

    # The same checkpoint -> a fresh TP mesh (resharded back).
    tp_cfg = C.loads(
        C.to_dict(swin),
        {"run_name": "topo_tp2", "load_path": f"ckpt://{ckpts}:2"},
    )
    tr_c = Trainer(tp_cfg, mesh=parallel.cpu_mesh(4, model=2), log_interval=10)
    assert int(tr_c.state.step) == 2
    final_c = jax.tree.map(np.asarray, jax.device_get(tr_c.state.params))
    for a, c in zip(jax.tree.leaves(final_a), jax.tree.leaves(final_c)):
        assert np.array_equal(a, c), "DP->TP restore changed parameter values"
    tr_c.close()
