"""Family-scale training parity vs torch (SURVEY.md §7 "Numerical parity").

test_torch_parity.py pins the conv/BN/SGD/label-smoothing composition on a
generic TinyNet; these tests pin the *model families* themselves:

* the ResNet block family **including BlurPool** (anti-aliased stem maxpool,
  blurred strided convs, blurred downsample shortcut — Composer's BlurPool
  surgery, reference algorithmic.py:11-17) trained for 10 steps against a
  hand-built torch twin — losses, final parameters, and BN running stats;
* the SwinV2 family: hvt's flax module and the reference's own vendored torch
  module (reference swinv2.py:390-436) driven through 5 AdamW steps from
  identical weights — per-step loss trajectories and final parameters.

Both run at f32 on CPU (tests/conftest.py pins the cpu backend; on the axon
TPU f32 matmuls take bf16 MXU passes, so parity must be checked here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn.functional as TF

from hvt import config as C
from hvt import objectives
from hvt.models import resnet as R
from hvt.train import optim as optim_lib

CLASSES = 4


# --------------------------------------------------------------------------
# ResNet family + BlurPool
# --------------------------------------------------------------------------


class TorchBlur(torch.nn.Module):
    """Depthwise 3×3 binomial blur — the torch twin of resnet.blur_2d."""

    def __init__(self, channels: int, stride: int = 1):
        super().__init__()
        k = torch.tensor([1.0, 2.0, 1.0])
        k2 = torch.outer(k, k)
        k2 = (k2 / k2.sum()).expand(channels, 1, 3, 3).clone()
        self.register_buffer("weight", k2)
        self.stride = stride
        self.channels = channels

    def forward(self, x):
        return TF.conv2d(
            x, self.weight, stride=self.stride, padding=1, groups=self.channels
        )


class TorchMicroBlurResNet(torch.nn.Module):
    """Torch twin of resnet_micro(blurpool=True): BasicResNet((1, 1), width 8)
    with the BlurPool rewrites (stride-1 maxpool + blurred subsample; blur
    before every strided conv, including the downsample shortcut)."""

    def __init__(self):
        super().__init__()
        bn = lambda c: torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)  # noqa: E731
        self.stem_conv = torch.nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
        self.stem_bn = bn(8)
        self.pool_blur = TorchBlur(8, stride=2)
        # stage1_block0: 8 -> 8, stride 1 (no blur triggered)
        self.b1_conv1 = torch.nn.Conv2d(8, 8, 3, padding=1, bias=False)
        self.b1_bn1 = bn(8)
        self.b1_conv2 = torch.nn.Conv2d(8, 8, 3, padding=1, bias=False)
        self.b1_bn2 = bn(8)
        # stage2_block0: 8 -> 16, stride 2, blurred
        self.b2_blur = TorchBlur(8, stride=1)
        self.b2_conv1 = torch.nn.Conv2d(8, 16, 3, stride=2, padding=1, bias=False)
        self.b2_bn1 = bn(16)
        self.b2_conv2 = torch.nn.Conv2d(16, 16, 3, padding=1, bias=False)
        self.b2_bn2 = bn(16)
        self.ds_blur = TorchBlur(8, stride=1)
        self.ds_conv = torch.nn.Conv2d(8, 16, 1, stride=2, bias=False)
        self.ds_bn = bn(16)
        self.head = torch.nn.Linear(16, CLASSES)

    def forward(self, x):
        x = torch.relu(self.stem_bn(self.stem_conv(x)))
        x = TF.max_pool2d(x, 3, stride=1, padding=1)
        x = self.pool_blur(x)
        y = torch.relu(self.b1_bn1(self.b1_conv1(x)))
        y = self.b1_bn2(self.b1_conv2(y))
        x = torch.relu(y + x)
        sc = self.ds_bn(self.ds_conv(self.ds_blur(x)))
        y = torch.relu(self.b2_bn1(self.b2_conv1(self.b2_blur(x))))
        y = self.b2_bn2(self.b2_conv2(y))
        x = torch.relu(y + sc)
        x = x.mean(dim=(2, 3))
        return self.head(x)


def _copy_convbn(tconv, tbn, fparams, fstats=None):
    with torch.no_grad():
        tconv.weight.copy_(
            torch.tensor(np.asarray(fparams["Conv_0"]["kernel"]).transpose(3, 2, 0, 1))
        )
        tbn.weight.copy_(torch.tensor(np.asarray(fparams["BatchNorm_0"]["scale"])))
        tbn.bias.copy_(torch.tensor(np.asarray(fparams["BatchNorm_0"]["bias"])))


def test_resnet_blurpool_family_ten_steps_match_torch():
    STEPS, B = 10, 8
    LR, MOM, WD, SMOOTH = 0.05, 0.9, 0.01, 0.1
    rng = np.random.default_rng(0)
    data = [
        (
            rng.normal(size=(B, 32, 32, 3)).astype(np.float32),
            rng.integers(0, CLASSES, (B,), dtype=np.int64),
        )
        for _ in range(STEPS)
    ]

    model = R.resnet_micro(CLASSES, blurpool=True, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(data[0][0]), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    cfg = C.loads({"optim": {"name": "sgd", "lr": LR, "momentum": MOM,
                             "weight_decay": WD}})
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"],
            )
            onehot = jax.nn.one_hot(labels, CLASSES)
            smoothed = onehot * (1 - SMOOTH) + SMOOTH / CLASSES
            loss = objectives.soft_cross_entropy(
                logits, smoothed, jnp.ones((labels.shape[0],))
            )
            return loss, upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    tnet = TorchMicroBlurResNet()
    _copy_convbn(tnet.stem_conv, tnet.stem_bn, params["stem"])
    b1 = params["stage1_block0"]
    _copy_convbn(tnet.b1_conv1, tnet.b1_bn1, b1["conv1"])
    _copy_convbn(tnet.b1_conv2, tnet.b1_bn2, b1["conv2"])
    b2 = params["stage2_block0"]
    _copy_convbn(tnet.b2_conv1, tnet.b2_bn1, b2["conv1"])
    _copy_convbn(tnet.b2_conv2, tnet.b2_bn2, b2["conv2"])
    _copy_convbn(tnet.ds_conv, tnet.ds_bn, b2["downsample"])
    with torch.no_grad():
        tnet.head.weight.copy_(torch.tensor(np.asarray(params["head"]["kernel"]).T))
        tnet.head.bias.copy_(torch.tensor(np.asarray(params["head"]["bias"])))

    # forward parity before training (eval mode: fresh running stats)
    tnet.eval()
    with torch.no_grad():
        want = tnet(torch.tensor(data[0][0].transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(data[0][0]), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    tnet.train()

    # reference no-decay grouping (reference optim.py:48-58)
    decay, no_decay = [], []
    for name, p in tnet.named_parameters():
        (no_decay if (p.ndim <= 1 or name.endswith(".bias")) else decay).append(p)
    topt = torch.optim.SGD(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=LR, momentum=MOM, nesterov=True,
    )

    losses_j, losses_t = [], []
    for images, labels in data:
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(images), jnp.asarray(labels)
        )
        losses_j.append(float(loss))

        topt.zero_grad()
        logits = tnet(torch.tensor(images.transpose(0, 3, 1, 2)))
        tloss = TF.cross_entropy(logits, torch.tensor(labels),
                                 label_smoothing=SMOOTH)
        tloss.backward()
        topt.step()
        losses_t.append(float(tloss.detach()))

    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-3, atol=1e-3)

    # Final parameters + BN running statistics agree. Momentum accumulates
    # f32 reduction-order differences over 10 steps, so the state tolerance
    # is looser than the per-step loss one (losses pin the dynamics).
    np.testing.assert_allclose(
        np.asarray(params["stem"]["Conv_0"]["kernel"]).transpose(3, 2, 0, 1),
        tnet.stem_conv.weight.detach().numpy(), rtol=2e-3, atol=4e-3,
    )
    np.testing.assert_allclose(
        np.asarray(params["stage2_block0"]["downsample"]["Conv_0"]["kernel"])
        .transpose(3, 2, 0, 1),
        tnet.ds_conv.weight.detach().numpy(), rtol=2e-3, atol=4e-3,
    )
    np.testing.assert_allclose(
        np.asarray(batch_stats["stage2_block0"]["conv1"]["BatchNorm_0"]["mean"]),
        tnet.b2_bn1.running_mean.numpy(), rtol=2e-3, atol=4e-3,
    )
    np.testing.assert_allclose(
        np.asarray(batch_stats["stage2_block0"]["conv1"]["BatchNorm_0"]["var"]),
        tnet.b2_bn1.running_var.numpy(), rtol=4e-3, atol=4e-3,
    )


# --------------------------------------------------------------------------
# SwinV2 family: optimizer-driven trajectory vs the reference torch module
# --------------------------------------------------------------------------


def test_swin_five_adamw_steps_match_reference():
    import test_swinv2 as TS

    STEPS, B = 5, 4
    LR, WD = 1e-3, 0.05
    ref, ours, params = TS._make_pair(num_classes=CLASSES, seed=1)
    ref.train()  # all drop rates are 0 — deterministic either way

    rng = np.random.default_rng(3)
    data = [
        (
            rng.normal(size=(B, TS.IMG, TS.IMG, 3)).astype(np.float32),
            rng.integers(0, CLASSES, (B,), dtype=np.int64),
        )
        for _ in range(STEPS)
    ]

    no_decay_subs = tuple(getattr(ours, "no_weight_decay_substrings", ()))
    cfg = C.loads({"optim": {"name": "adamw", "lr": LR, "weight_decay": WD}})
    tx = optim_lib.build_optimizer(
        cfg.optim, lambda s: jnp.asarray(1.0), no_decay_substrings=no_decay_subs
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, images, labels):
        def loss_fn(p):
            logits = ours.apply(
                {"params": p}, images, train=True,
                rngs={"dropout": jax.random.key(0)},
            )
            onehot = jax.nn.one_hot(labels, CLASSES)
            return objectives.soft_cross_entropy(
                logits, onehot, jnp.ones((labels.shape[0],))
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    # torch twin optimizer with the reference's no-decay grouping
    # (reference optim.py:48-58 + swinv2.py:810-816 keyword exemptions)
    skip_names = set(ref.no_weight_decay())
    skip_keywords = set(ref.no_weight_decay_keywords())
    decay, no_decay = [], []
    for name, p in ref.named_parameters():
        if (
            p.ndim <= 1
            or name.endswith(".bias")
            or name in skip_names
            or any(k in name for k in skip_keywords)
        ):
            no_decay.append(p)
        else:
            decay.append(p)
    topt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=LR,
    )

    losses_j, losses_t = [], []
    for images, labels in data:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images), jnp.asarray(labels)
        )
        losses_j.append(float(loss))

        topt.zero_grad()
        logits = ref(torch.tensor(images.transpose(0, 3, 1, 2)))
        tloss = TF.cross_entropy(logits, torch.tensor(labels))
        tloss.backward()
        topt.step()
        losses_t.append(float(tloss.detach()))

    # per-step trajectories agree at f32 (directive: <= 1e-3 relative)
    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-3, atol=1e-3)

    # final parameters agree on representative tensors across the net
    sd = ref.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]).T,
        sd["head.weight"].numpy(), rtol=2e-3, atol=2e-4,
    )
    got_qkv = np.asarray(params["stage0_block0"]["attn"]["qkv_kernel"]).T
    np.testing.assert_allclose(
        got_qkv, sd["layers.0.blocks.0.attn.qkv.weight"].numpy(),
        rtol=2e-3, atol=1e-3,
    )


# --------------------------------------------------------------------------
# Convergence-horizon parity: 300 steps on a learnable fixture dataset
# --------------------------------------------------------------------------


import pytest  # noqa: E402


@pytest.mark.slow
def test_resnet_blurpool_300_step_convergence_matches_torch():
    """Convergence-horizon parity (round-3 verdict #2): the 10-step test
    above pins the dynamics; this pins that the stacks stay matched over a
    horizon where BN-running-stat, momentum, and weight-decay differences
    would compound — the strongest available proxy for the north star's
    0.2% top-1 parity (BASELINE.json) in a no-dataset environment.

    Composition matches the reference hot loop (reference main.py:104-131):
    SGD+nesterov+decoupled-style grouping, BN, label smoothing, BlurPool.
    Fixture: 64 images of 4 classes, class = smoothed gaussian prototype +
    noise — learnable, so both stacks traverse descent, convergence, and a
    long BN-stat-accumulation tail.

    Measured drift at 300 steps (PARITY.md "convergence horizon"):
    per-step |Δloss| ≤ 3.6e-7, per-window mean |Δ| ≤ 1e-5, BN running-var
    max rel drift 0.8%. Tolerances below carry ~10× margin over measured.
    """
    from scipy.ndimage import gaussian_filter

    STEPS, B, N = 300, 8, 64
    LR, MOM, WD, SMOOTH = 0.05, 0.9, 1e-4, 0.1
    rng = np.random.default_rng(42)
    protos = rng.normal(size=(CLASSES, 32, 32, 3)).astype(np.float32)
    protos = np.stack([gaussian_filter(p, sigma=(4, 4, 0)) for p in protos]) * 4.0
    labels_all = np.arange(N) % CLASSES
    images_all = (
        protos[labels_all]
        + 0.3 * rng.normal(size=(N, 32, 32, 3))
    ).astype(np.float32)

    model = R.resnet_micro(CLASSES, blurpool=True, dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.asarray(images_all[:B]), train=False
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    cfg = C.loads({"optim": {"name": "sgd", "lr": LR, "momentum": MOM,
                             "weight_decay": WD}})
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"],
            )
            onehot = jax.nn.one_hot(labels, CLASSES)
            smoothed = onehot * (1 - SMOOTH) + SMOOTH / CLASSES
            loss = objectives.soft_cross_entropy(
                logits, smoothed, jnp.ones((labels.shape[0],))
            )
            return loss, upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    tnet = TorchMicroBlurResNet()
    _copy_convbn(tnet.stem_conv, tnet.stem_bn, params["stem"])
    b1 = params["stage1_block0"]
    _copy_convbn(tnet.b1_conv1, tnet.b1_bn1, b1["conv1"])
    _copy_convbn(tnet.b1_conv2, tnet.b1_bn2, b1["conv2"])
    b2 = params["stage2_block0"]
    _copy_convbn(tnet.b2_conv1, tnet.b2_bn1, b2["conv1"])
    _copy_convbn(tnet.b2_conv2, tnet.b2_bn2, b2["conv2"])
    _copy_convbn(tnet.ds_conv, tnet.ds_bn, b2["downsample"])
    with torch.no_grad():
        tnet.head.weight.copy_(
            torch.tensor(np.asarray(params["head"]["kernel"]).T)
        )
        tnet.head.bias.copy_(torch.tensor(np.asarray(params["head"]["bias"])))
    tnet.train()

    decay, no_decay = [], []
    for name, p in tnet.named_parameters():
        (no_decay if (p.ndim <= 1 or name.endswith(".bias")) else decay).append(p)
    topt = torch.optim.SGD(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=LR, momentum=MOM, nesterov=True,
    )

    losses_j, losses_t = [], []
    for s in range(STEPS):
        idx = (np.arange(B) + s * B) % N
        images, labels = images_all[idx], labels_all[idx]
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state,
            jnp.asarray(images), jnp.asarray(labels),
        )
        losses_j.append(float(loss))
        topt.zero_grad()
        logits = tnet(torch.tensor(images.transpose(0, 3, 1, 2)))
        tloss = TF.cross_entropy(logits, torch.tensor(labels),
                                 label_smoothing=SMOOTH)
        tloss.backward()
        topt.step()
        losses_t.append(float(tloss.detach()))

    losses_j, losses_t = np.array(losses_j), np.array(losses_t)
    # per-50-step-window mean losses agree (drift does not compound)
    for w0 in range(0, STEPS, 50):
        wj = losses_j[w0:w0 + 50].mean()
        wt = losses_t[w0:w0 + 50].mean()
        assert abs(wj - wt) < 5e-3, (w0, wj, wt)

    # final train accuracy over the whole fixture agrees (eval mode)
    tnet.eval()
    with torch.no_grad():
        pred_t = (
            tnet(torch.tensor(images_all.transpose(0, 3, 1, 2)))
            .argmax(1).numpy()
        )
    pred_j = np.asarray(
        model.apply({"params": params, "batch_stats": batch_stats},
                    jnp.asarray(images_all), train=False)
    ).argmax(1)
    acc_j = (pred_j == labels_all).mean()
    acc_t = (pred_t == labels_all).mean()
    assert abs(acc_j - acc_t) <= 0.02, (acc_j, acc_t)
    assert acc_j > 0.9, acc_j  # the fixture is learnable — both converged

    # BN running statistics stayed matched over the full horizon
    np.testing.assert_allclose(
        np.asarray(batch_stats["stage2_block0"]["conv1"]["BatchNorm_0"]["mean"]),
        tnet.b2_bn1.running_mean.numpy(), atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(batch_stats["stage2_block0"]["conv1"]["BatchNorm_0"]["var"]),
        tnet.b2_bn1.running_var.numpy(), rtol=5e-2, atol=5e-3,
    )


@pytest.mark.slow
def test_swin_300_step_convergence_matches_reference():
    """Convergence-horizon parity for the flagship transformer (VERDICT r4
    item 2): the 5-step test above pins the AdamW dynamics; this pins that
    the hvt flax stack and the reference's own vendored torch module
    (reference swinv2.py:390-436) stay matched over a horizon where AdamW
    second moments, weight decay, label smoothing, and the cosine-attention
    ``logit_scale`` clamp (reference swinv2.py:229-231) would compound.

    Composition matches the reference transformer recipe (reference
    main.py:104-131 + configs/recipes/swinv2_hot.yaml): AdamW with the
    keyword no-decay exemptions + label smoothing. Fixture: the same
    learnable smoothed-gaussian-prototype dataset as the ResNet test.

    The clamp is deliberately made to BIND: head 0 of stage0_block0 starts
    above log(1/0.01), so its forward is clamped and its gradient gated to
    zero from step 0 (it must stay frozen bit-for-bit in both stacks),
    while head 1 starts just below and trains through the identity region.

    What is (and is not) assertable at this horizon: the reference
    zero-inits the res-post-norm gammas (reference swinv2.py:441-445), so
    every block wakes up from an exactly-disconnected state and early
    logit_scale/qkv gradients are float-epsilon noise that AdamW
    normalizes to full lr-size steps (m/sqrt(v) is sign-like) — element
    trajectories are chaotic even though the LOSS dynamics are not.
    Measured drift at 300 steps (PARITY.md "convergence horizon", SwinV2
    row): per-window mean |dloss| <= 2.1e-3, clamped head bitwise frozen
    in both stacks, free-head trajectories within 0.067, final accuracy
    1.0 both — while per-element qkv drift reaches ~50% relative, which
    is the chaotic regime doing what it does, not a stack mismatch.
    Tolerances below carry 2-5x margin over measured.
    """
    import test_swinv2 as TS
    from scipy.ndimage import gaussian_filter

    STEPS, B, N = 300, 8, 64
    LR, WD, SMOOTH = 1e-3, 0.05, 0.1
    CLAMP = float(np.log(1.0 / 0.01))

    ref, ours, params = TS._make_pair(num_classes=CLASSES, seed=11)
    ref.train()  # all drop rates are 0 — deterministic either way

    # Pin head 0 above the clamp, head 1 just below (heads axis leads the
    # (heads, 1, 1) logit_scale).
    ls_init = np.array([CLAMP + 0.05, CLAMP - 0.10], np.float32).reshape(2, 1, 1)
    with torch.no_grad():
        ref.layers[0].blocks[0].attn.logit_scale.copy_(torch.tensor(ls_init))
    params["stage0_block0"]["attn"]["logit_scale"] = jnp.asarray(ls_init)

    rng = np.random.default_rng(42)
    protos = rng.normal(size=(CLASSES, TS.IMG, TS.IMG, 3)).astype(np.float32)
    protos = np.stack([gaussian_filter(p, sigma=(4, 4, 0)) for p in protos]) * 4.0
    labels_all = np.arange(N) % CLASSES
    images_all = (
        protos[labels_all] + 0.3 * rng.normal(size=(N, TS.IMG, TS.IMG, 3))
    ).astype(np.float32)

    no_decay_subs = tuple(ours.no_weight_decay_substrings)
    cfg = C.loads({"optim": {"name": "adamw", "lr": LR, "weight_decay": WD}})
    tx = optim_lib.build_optimizer(
        cfg.optim, lambda s: jnp.asarray(1.0), no_decay_substrings=no_decay_subs
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, images, labels):
        def loss_fn(p):
            logits = ours.apply(
                {"params": p}, images, train=True,
                rngs={"dropout": jax.random.key(0)},
            )
            onehot = jax.nn.one_hot(labels, CLASSES)
            smoothed = onehot * (1 - SMOOTH) + SMOOTH / CLASSES
            return objectives.soft_cross_entropy(
                logits, smoothed, jnp.ones((labels.shape[0],))
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    # torch twin optimizer with the reference's no-decay grouping
    # (reference optim.py:48-58 + swinv2.py:810-816 keyword exemptions)
    skip_names = set(ref.no_weight_decay())
    skip_keywords = set(ref.no_weight_decay_keywords())
    decay, no_decay = [], []
    for name, p in ref.named_parameters():
        if (
            p.ndim <= 1
            or name.endswith(".bias")
            or name in skip_names
            or any(k in name for k in skip_keywords)
        ):
            no_decay.append(p)
        else:
            decay.append(p)
    topt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=LR,
    )

    losses_j, losses_t = [], []
    ls_j, ls_t = [], []
    for s in range(STEPS):
        idx = (np.arange(B) + s * B) % N
        images, labels = images_all[idx], labels_all[idx]
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images), jnp.asarray(labels)
        )
        losses_j.append(float(loss))
        ls_j.append(
            np.asarray(params["stage0_block0"]["attn"]["logit_scale"]).ravel()
        )

        topt.zero_grad()
        logits = ref(torch.tensor(images.transpose(0, 3, 1, 2)))
        tloss = TF.cross_entropy(logits, torch.tensor(labels),
                                 label_smoothing=SMOOTH)
        tloss.backward()
        topt.step()
        losses_t.append(float(tloss.detach()))
        ls_t.append(
            ref.layers[0].blocks[0].attn.logit_scale.detach().numpy().ravel()
        )

    losses_j, losses_t = np.array(losses_j), np.array(losses_t)
    ls_j, ls_t = np.array(ls_j), np.array(ls_t)

    # per-50-step-window mean losses agree (drift does not compound;
    # measured max 2.1e-3, in the steep-descent window)
    for w0 in range(0, STEPS, 50):
        wj = losses_j[w0:w0 + 50].mean()
        wt = losses_t[w0:w0 + 50].mean()
        assert abs(wj - wt) < 1e-2, (w0, wj, wt)

    # the clamped head stayed frozen bit-for-bit in BOTH stacks (zero
    # gradient through the clamp -> AdamW moments never leave zero)...
    assert (ls_j[:, 0] == ls_init[0, 0, 0]).all()
    assert (ls_t[:, 0] == ls_init[0, 0, 0]).all()
    # ...while the free head genuinely trained in both, ending close
    # (measured: moved 0.076/0.066, final |d| 0.0097, max traj |d| 0.066
    # — the AdamW sign-noise walk bounds the gap, it cannot be exact)
    assert np.abs(ls_j[-1, 1] - ls_init[1, 0, 0]) > 0.02
    assert np.abs(ls_t[-1, 1] - ls_init[1, 0, 0]) > 0.02
    assert np.abs(ls_j[-1, 1] - ls_t[-1, 1]) < 0.03
    assert np.abs(ls_j[:, 1] - ls_t[:, 1]).max() < 0.15

    # final train accuracy over the whole fixture agrees (eval mode)
    ref.eval()
    with torch.no_grad():
        pred_t = (
            ref(torch.tensor(images_all.transpose(0, 3, 1, 2)))
            .argmax(1).numpy()
        )
    pred_j = np.asarray(
        ours.apply({"params": params}, jnp.asarray(images_all), train=False)
    ).argmax(1)
    acc_j = (pred_j == labels_all).mean()
    acc_t = (pred_t == labels_all).mean()
    assert abs(acc_j - acc_t) <= 0.02, (acc_j, acc_t)
    assert acc_j > 0.9, acc_j  # the fixture is learnable — both converged

    # final parameters: the head (fed by converged, loss-relevant
    # features) and the res-post-norm gammas (the wake-up trajectory the
    # zero-init makes load-bearing) stay close; deep qkv elements are
    # chaotic (measured ~50% relative) and deliberately NOT pinned —
    # PARITY.md quantifies all three.
    sd = ref.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]).T,
        sd["head.weight"].numpy(), atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(params["stage0_block0"]["norm1"]["scale"]),
        sd["layers.0.blocks.0.norm1.weight"].numpy(), atol=8e-2,
    )


# --------------------------------------------------------------------------
# ViT / ConvNeXt: 5 AdamW steps vs the HF transformers torch twins
# --------------------------------------------------------------------------
#
# The logits-parity tests (test_vit.py / test_convnext.py) pin the forward;
# these pin the *training composition* — gradients, the no-decay grouping,
# and torch-AdamW-compatible updates — for the round-4 timm-zoo families
# (reference models.py:16-25 resolves these names via timm).


def _hf_twin_adamw(ref, wd, lr, extra_no_decay=()):
    decay, no_decay = [], []
    for name, p in ref.named_parameters():
        if (
            p.ndim <= 1
            or name.endswith(".bias")
            or any(k in name for k in extra_no_decay)
        ):
            no_decay.append(p)
        else:
            decay.append(p)
    return torch.optim.AdamW(
        [{"params": decay, "weight_decay": wd},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=lr,
    )


def _five_adamw_steps(ours, params, ref, topt, img=32):
    STEPS, B = 5, 4
    rng = np.random.default_rng(7)
    data = [
        (
            rng.normal(size=(B, img, img, 3)).astype(np.float32),
            rng.integers(0, CLASSES, (B,), dtype=np.int64),
        )
        for _ in range(STEPS)
    ]

    no_decay_subs = tuple(getattr(ours, "no_weight_decay_substrings", ()))
    cfg = C.loads({"optim": {"name": "adamw", "lr": 1e-3, "weight_decay": 0.05}})
    tx = optim_lib.build_optimizer(
        cfg.optim, lambda s: jnp.asarray(1.0), no_decay_substrings=no_decay_subs
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, images, labels):
        def loss_fn(p):
            logits = ours.apply(
                {"params": p}, images, train=True,
                rngs={"dropout": jax.random.key(0)},
            )
            onehot = jax.nn.one_hot(labels, CLASSES)
            return objectives.soft_cross_entropy(
                logits, onehot, jnp.ones((labels.shape[0],))
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    losses_j, losses_t = [], []
    for images, labels in data:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images), jnp.asarray(labels)
        )
        losses_j.append(float(loss))

        topt.zero_grad()
        logits = ref(torch.tensor(images.transpose(0, 3, 1, 2))).logits
        tloss = TF.cross_entropy(logits, torch.tensor(labels))
        tloss.backward()
        topt.step()
        losses_t.append(float(tloss.detach()))

    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-3, atol=1e-3)
    return params


def test_vit_five_adamw_steps_match_hf_twin():
    transformers = pytest.importorskip("transformers")
    from hvt.models import torch_compat
    from hvt.models import vit as V

    torch.manual_seed(11)
    cfg = transformers.ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8,
        num_labels=CLASSES, layer_norm_eps=1e-6,
    )
    ref = transformers.ViTForImageClassification(cfg).train()
    ours = V.VisionTransformer(
        num_classes=CLASSES, patch_size=8, embed_dim=64, depth=2,
        num_heads=4, mlp_ratio=2.0, dtype=jnp.float32,
    )
    params = torch_compat.convert_vit_state_dict(ref.state_dict())
    # HF names the pos embed "position_embeddings"; hvt's substrings name
    # the flax leaves ("pos_embed", "cls_token") — map for the twin.
    topt = _hf_twin_adamw(
        ref, wd=0.05, lr=1e-3,
        extra_no_decay=("cls_token", "position_embeddings"),
    )
    params = _five_adamw_steps(ours, params, ref, topt)

    sd = ref.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]).T,
        sd["classifier.weight"].numpy(), rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(params["block0"]["mlp"]["fc1"]["kernel"]).T,
        sd["vit.encoder.layer.0.intermediate.dense.weight"].numpy(),
        rtol=2e-3, atol=1e-3,
    )


def test_convnext_five_adamw_steps_match_hf_twin():
    transformers = pytest.importorskip("transformers")
    from hvt.models import convnext as X
    from hvt.models import torch_compat

    torch.manual_seed(13)
    cfg = transformers.ConvNextConfig(
        num_channels=3, hidden_sizes=[16, 32, 64, 128], depths=[1, 1, 2, 1],
        num_labels=CLASSES, image_size=32,
    )
    ref = transformers.ConvNextForImageClassification(cfg).train()
    ours = X.ConvNeXt(
        num_classes=CLASSES, depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
        dtype=jnp.float32,
    )
    params = torch_compat.convert_convnext_state_dict(ref.state_dict())
    topt = _hf_twin_adamw(ref, wd=0.05, lr=1e-3)
    params = _five_adamw_steps(ours, params, ref, topt)

    sd = ref.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]).T,
        sd["classifier.weight"].numpy(), rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(params["stage2_block0"]["mlp"]["fc1"]["kernel"]).T,
        sd["convnext.encoder.stages.2.layers.0.pwconv1.weight"].numpy(),
        rtol=2e-3, atol=1e-3,
    )


def test_efficientnet_five_adamw_steps_match_hf_twin():
    """EfficientNet training-composition parity: unlike ViT/ConvNeXt this
    threads BatchNorm running statistics through training, so the twin's
    torch BN momenta are set to 0.01 (torch's inverted convention of the
    family's keep-99%-of-running TF rule, which hvt implements as flax
    momentum 0.99 — hvt/models/efficientnet.py docstring). Pins gradients
    through SE/depthwise/BN, the no-decay grouping, AdamW updates, AND the
    running-stat trajectories."""
    transformers = pytest.importorskip("transformers")
    from hvt.models import efficientnet as E
    from hvt.models import torch_compat

    torch.manual_seed(17)
    hf_cfg = transformers.EfficientNetConfig(
        width_coefficient=1.0, depth_coefficient=1.0,
        kernel_sizes=[3, 5], in_channels=[32, 16], out_channels=[16, 24],
        strides=[1, 2], num_block_repeats=[1, 2], expand_ratios=[1, 6],
        hidden_dim=1280, num_labels=CLASSES, image_size=32,
        drop_connect_rate=0.0, dropout_rate=0.0,
    )
    ref = transformers.EfficientNetForImageClassification(hf_cfg).train()
    gen = torch.Generator().manual_seed(18)
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0.0, 0.1, generator=gen)
    for mod in ref.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.momentum = 0.01  # torch-inverted keep-99% (flax 0.99)

    ours = E.EfficientNet(
        num_classes=CLASSES, stem_channels=32, top_channels=1280,
        kernels=(3, 5), in_ch=(32, 16), out_ch=(16, 24), strides=(1, 2),
        repeats=(1, 2), expands=(1, 6), drop_connect_rate=0.0,
        dropout_rate=0.0, dtype=jnp.float32,
    )
    params, batch_stats = torch_compat.convert_efficientnet_state_dict(
        ref.state_dict()
    )

    cfg = C.loads({"optim": {"name": "adamw", "lr": 1e-3, "weight_decay": 0.05}})
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels):
        def loss_fn(p):
            logits, mut = ours.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"],
            )
            onehot = jax.nn.one_hot(labels, CLASSES)
            loss = objectives.soft_cross_entropy(
                logits, onehot, jnp.ones((labels.shape[0],))
            )
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates), new_stats, new_opt, loss
        )

    STEPS, B = 5, 4
    rng = np.random.default_rng(7)
    losses_j, losses_t = [], []
    topt = _hf_twin_adamw(ref, wd=0.05, lr=1e-3)
    for _ in range(STEPS):
        images = rng.normal(size=(B, 32, 32, 3)).astype(np.float32)
        labels = rng.integers(0, CLASSES, (B,), dtype=np.int64)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(images),
            jnp.asarray(labels),
        )
        losses_j.append(float(loss))

        topt.zero_grad()
        logits = ref(torch.tensor(images.transpose(0, 3, 1, 2))).logits
        tloss = TF.cross_entropy(logits, torch.tensor(labels))
        tloss.backward()
        topt.step()
        losses_t.append(float(tloss.detach()))

    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-3, atol=1e-3)
    # Running statistics stayed matched across the five training steps.
    _, ref_stats = torch_compat.convert_efficientnet_state_dict(
        ref.state_dict()
    )
    for (kp, a), b in zip(
        jax.tree_util.tree_leaves_with_path(batch_stats),
        jax.tree.leaves(ref_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_regnet_five_adamw_steps_match_hf_twin():
    """RegNet-Y training-composition parity: like EfficientNet this threads
    BatchNorm running statistics through training, but at torch's default
    momentum (0.1 inverted == flax 0.9, hvt/models/regnet.py). Pins
    gradients through the grouped 3x3 conv, SE, the projection shortcut,
    the no-decay grouping, AdamW updates, AND the running-stat
    trajectories."""
    import pytest
    transformers = pytest.importorskip("transformers")
    from hvt.models import regnet as RG
    from hvt.models import torch_compat

    torch.manual_seed(23)
    hf_cfg = transformers.RegNetConfig(
        num_channels=3, embedding_size=8, hidden_sizes=[16, 24],
        depths=[1, 2], groups_width=8, layer_type="y", num_labels=CLASSES,
    )
    ref = transformers.RegNetForImageClassification(hf_cfg).train()
    gen = torch.Generator().manual_seed(24)
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0.0, 0.1, generator=gen)

    ours = RG.RegNetY(
        num_classes=CLASSES, depths=(1, 2), widths=(16, 24), group_width=8,
        stem_channels=8, dtype=jnp.float32,
    )
    params, batch_stats = torch_compat.convert_regnet_state_dict(
        ref.state_dict()
    )

    cfg = C.loads({"optim": {"name": "adamw", "lr": 1e-3, "weight_decay": 0.05}})
    tx = optim_lib.build_optimizer(cfg.optim, lambda s: jnp.asarray(1.0))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels):
        def loss_fn(p):
            logits, mut = ours.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"],
            )
            onehot = jax.nn.one_hot(labels, CLASSES)
            loss = objectives.soft_cross_entropy(
                logits, onehot, jnp.ones((labels.shape[0],))
            )
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates), new_stats, new_opt, loss
        )

    STEPS, B = 5, 4
    rng = np.random.default_rng(25)
    losses_j, losses_t = [], []
    topt = _hf_twin_adamw(ref, wd=0.05, lr=1e-3)
    for _ in range(STEPS):
        images = rng.normal(size=(B, 32, 32, 3)).astype(np.float32)
        labels = rng.integers(0, CLASSES, (B,), dtype=np.int64)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jnp.asarray(images),
            jnp.asarray(labels),
        )
        losses_j.append(float(loss))

        topt.zero_grad()
        logits = ref(torch.tensor(images.transpose(0, 3, 1, 2))).logits
        tloss = TF.cross_entropy(logits, torch.tensor(labels))
        tloss.backward()
        topt.step()
        losses_t.append(float(tloss.detach()))

    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-3, atol=1e-3)
    # Running statistics stayed matched across the five training steps.
    _, ref_stats = torch_compat.convert_regnet_state_dict(ref.state_dict())
    for (kp, a), b in zip(
        jax.tree_util.tree_leaves_with_path(batch_stats),
        jax.tree.leaves(ref_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_dinov2_five_adamw_steps_match_hf_twin():
    """DINOv2 training-composition parity (ViT + LayerScale + the
    concat[cls, mean-patch] head): 5 AdamW steps vs the HF twin pin
    gradients through the LayerScale lambdas and the fused-qkv
    conversion."""
    import pytest
    transformers = pytest.importorskip("transformers")
    from hvt.models import dinov2 as D
    from hvt.models import torch_compat

    torch.manual_seed(31)
    cfg = transformers.Dinov2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        mlp_ratio=2, image_size=32, patch_size=8, num_labels=CLASSES,
        layer_norm_eps=1e-6, layerscale_value=1.0,
    )
    ref = transformers.Dinov2ForImageClassification(cfg).train()
    ours = D.Dinov2(
        num_classes=CLASSES, patch_size=8, embed_dim=64, depth=2,
        num_heads=4, mlp_ratio=2.0, dtype=jnp.float32,
    )
    params = torch_compat.convert_dinov2_state_dict(ref.state_dict())
    topt = _hf_twin_adamw(
        ref, wd=0.05, lr=1e-3,
        extra_no_decay=("cls_token", "position_embeddings"),
    )
    params = _five_adamw_steps(ours, params, ref, topt)

    sd = ref.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]).T,
        sd["classifier.weight"].numpy(), rtol=2e-3, atol=2e-4,
    )
    # LayerScale lambdas trained and stayed matched.
    np.testing.assert_allclose(
        np.asarray(params["block0"]["ls1"]),
        sd["dinov2.encoder.layer.0.layer_scale1.lambda1"].numpy(),
        rtol=2e-3, atol=2e-4,
    )
