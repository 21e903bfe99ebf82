"""End-to-end training parity vs torch: same weights, data, and recipe.

The per-component cross-checks (losses, optimizers, the SwinV2 module) pin
pieces; this pins their composition — conv padding semantics, BatchNorm
batch/running statistics, no-decay parameter grouping, momentum-SGD, and
label-smoothed CE — by training the same tiny conv-BN network for several
steps in both frameworks and comparing loss trajectories and final state.
This is the test-level backing for the north star's "top-1 within 0.2%"
criterion (SURVEY.md §6/§7): if step-for-step training matches at f32 on a
small net, recipe-level divergence can only come from scale effects that
PARITY.md quantifies separately (BN sharding, bf16).

Known benign deviation: torch updates running_var with the *unbiased* batch
variance while flax uses the biased one — a factor n/(n-1) ≈ 1.0005 at this
test's n=2048 normalization elements, inside the tolerance.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from hvt import config as C
from hvt import objectives
from hvt.train import optim as optim_lib

STEPS = 5
B, H, W = 8, 16, 16
CLASSES = 4
LR, MOMENTUM, WD, SMOOTH = 0.05, 0.9, 0.01, 0.1


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train):
        for i, (feat, stride) in enumerate([(8, 1), (16, 2)]):
            x = nn.Conv(feat, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(CLASSES, name="head")(x)


class TorchTinyNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
        self.bn0 = torch.nn.BatchNorm2d(8, eps=1e-5, momentum=0.1)
        self.conv1 = torch.nn.Conv2d(8, 16, 3, stride=2, padding=1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(16, eps=1e-5, momentum=0.1)
        self.head = torch.nn.Linear(16, CLASSES)

    def forward(self, x):
        x = torch.relu(self.bn0(self.conv0(x)))
        x = torch.relu(self.bn1(self.conv1(x)))
        x = x.mean(dim=(2, 3))
        return self.head(x)


def test_five_training_steps_match_torch():
    rng = np.random.default_rng(0)
    data = [
        (
            rng.normal(size=(B, H, W, 3)).astype(np.float32),
            rng.integers(0, CLASSES, (B,), dtype=np.int64),
        )
        for _ in range(STEPS)
    ]

    # --- hvt side -----------------------------------------------------------
    model = TinyNet()
    variables = model.init(jax.random.key(0), jnp.asarray(data[0][0]), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    cfg = C.loads({"optim": {"name": "sgd", "lr": LR, "momentum": MOMENTUM,
                              "weight_decay": WD}})
    tx = optim_lib.build_optimizer(
        cfg.optim, lambda s: jnp.asarray(1.0),
        no_decay_substrings=(),
    )
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
        import optax

        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    # --- torch side, weights copied from the flax init ----------------------
    tnet = TorchTinyNet()
    with torch.no_grad():
        tnet.conv0.weight.copy_(torch.tensor(
            np.asarray(params["conv0"]["kernel"]).transpose(3, 2, 0, 1)))
        tnet.conv1.weight.copy_(torch.tensor(
            np.asarray(params["conv1"]["kernel"]).transpose(3, 2, 0, 1)))
        tnet.head.weight.copy_(torch.tensor(
            np.asarray(params["head"]["kernel"]).T))
        tnet.head.bias.copy_(torch.tensor(np.asarray(params["head"]["bias"])))
    # Mirror the reference's no-decay grouping (1-D params and biases get
    # wd=0, reference optim.py:48-58 — hvt's optimizer applies the same rule).
    decay = [tnet.conv0.weight, tnet.conv1.weight, tnet.head.weight]
    no_decay = [tnet.bn0.weight, tnet.bn0.bias, tnet.bn1.weight,
                tnet.bn1.bias, tnet.head.bias]
    topt = torch.optim.SGD(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=LR, momentum=MOMENTUM, nesterov=True,  # hvt "sgd" = reference SGD(nesterov)
    )

    losses_j, losses_t = [], []
    for images, labels in data:
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

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-4, atol=2e-4)

    # Final parameters and BatchNorm running statistics agree.
    np.testing.assert_allclose(
        np.asarray(params["conv0"]["kernel"]).transpose(3, 2, 0, 1),
        tnet.conv0.weight.detach().numpy(), rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]).T,
        tnet.head.weight.detach().numpy(), rtol=2e-3, atol=2e-4,
    )
    bn0 = batch_stats["bn0"]
    np.testing.assert_allclose(
        np.asarray(bn0["mean"]), tnet.bn0.running_mean.numpy(),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(bn0["var"]), tnet.bn0.running_var.numpy(),
        rtol=2e-3, atol=2e-3,
    )
