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
