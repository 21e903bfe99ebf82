"""Pin the "bytes/image vs the reference program" claim with a table.

BENCH.md's R50 roofline defense (round 3) inferred the torch program's HBM
traffic from the A100 anchor's step time x bandwidth. This tool replaces the
inference with an **op-sequence accounting measured from the torch program
itself**: it builds the reference's model (torchvision-style ResNet-50 —
torchvision is not installed in this image, so the exact same architecture
is constructed in plain torch and parameter-count-checked against hvt's
flax ResNet-50), walks the actual module call sequence with forward hooks,
and sums per-op HBM traffic under the standard eager-mode pass model:

  forward:  conv reads in + weights, writes out; BN (train) reads in twice
            (stats + normalize) and writes out; ReLU reads + writes;
            add reads both residuals + writes.
  backward: conv-bwd reads grad_out + saved input + weights, writes
            grad_in + grad_w (input-grad and weight-grad kernels each
            re-read grad_out); BN-bwd reads grad_out + saved in, writes
            grad_in (+ reduction pass); ReLU-bwd reads grad_out + mask,
            writes grad_in; add-bwd is a no-op (gradient aliasing).

All activations bf16 (the recipe runs AMP, reference slurm config), BN
stats f32. This is the *structure* of the torch program measured from the
model, with per-op byte counts derived — not a profiler capture (no GPU in
this image), which BENCH.md states alongside the table.

Usage: python -m hvt.tools.torch_traffic [--batch 256]
Reference: reference main.py:104-131 (train loop), MosaicML R50 recipe
(AMP + channels-last, reference configs/pretrain/inat21.yaml).
"""

from __future__ import annotations

import argparse

import numpy as np
import torch
import torch.nn as nn

BF16 = 2  # bytes
F32 = 4


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1, downsample=False):
        super().__init__()
        cout = width * self.expansion
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = (
            nn.Sequential(nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                          nn.BatchNorm2d(cout))
            if downsample else None
        )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        out = out + identity
        return self.relu(out)


class TorchR50(nn.Module):
    """torchvision.models.resnet50 reconstructed in plain torch (the image
    has no torchvision); layer plan (3, 4, 6, 3), widths 64/128/256/512."""

    def __init__(self, num_classes=10000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        layers = []
        cin = 64
        for width, depth, stride in ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)):
            for i in range(depth):
                layers.append(Bottleneck(
                    cin, width, stride=stride if i == 0 else 1,
                    downsample=(i == 0),
                ))
                cin = width * Bottleneck.expansion
        self.layers = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layers(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


def account(batch: int = 256, image: int = 224, num_classes: int = 10000):
    """Walk the module call sequence, sum fwd+bwd HBM bytes per op family."""
    model = TorchR50(num_classes)
    n_params = sum(p.numel() for p in model.parameters())

    traffic = {"conv": 0, "bn": 0, "relu": 0, "add+pool": 0, "fc": 0}
    sizes = {}

    def nbytes(t):
        return t.numel() * BF16

    def hook(mod, inp, out):
        i, o = nbytes(inp[0]), nbytes(out)
        w = sum(p.numel() for p in mod.parameters()) * BF16
        if isinstance(mod, nn.Conv2d):
            # fwd: read in + w, write out. bwd: dgrad (read gout + w, write
            # gin) + wgrad (read gout + saved in, write dw f32).
            traffic["conv"] += (i + w + o) + (o + w + i) + (o + i + 2 * w)
        elif isinstance(mod, nn.BatchNorm2d):
            # fwd train: stats pass (read in) + normalize pass (read in,
            # write out). bwd: reduction (read gout + in) + gin pass (read
            # gout + in, write gin).
            traffic["bn"] += (2 * i + o) + (2 * o + 2 * i + i)
        elif isinstance(mod, nn.ReLU):
            # fwd read+write; bwd read gout + mask, write gin.
            traffic["relu"] += (i + o) + (2 * o + i)
        elif isinstance(mod, (nn.MaxPool2d, nn.AdaptiveAvgPool2d)):
            traffic["add+pool"] += (i + o) + (o + i)
        elif isinstance(mod, nn.Linear):
            traffic["fc"] += (i + o + w) * 2 + (o + i + 2 * w)
        sizes[type(mod).__name__] = sizes.get(type(mod).__name__, 0) + o

    hooks = [m.register_forward_hook(hook) for m in model.modules()
             if isinstance(m, (nn.Conv2d, nn.BatchNorm2d, nn.ReLU, nn.MaxPool2d,
                               nn.AdaptiveAvgPool2d, nn.Linear))]
    # Residual adds: 16 blocks, each add reads 2 + writes 1 (fwd); bwd free.
    with torch.no_grad():
        model.eval()  # avoid running real BN stat updates; hooks only count
        x = torch.zeros(batch, 3, image, image)
        model(x)
    for h in hooks:
        h.remove()

    # residual adds (not modules): count from the block structure
    add_bytes = 0
    with torch.no_grad():
        shapes = [(batch, 256, 56, 56)] * 3 + [(batch, 512, 28, 28)] * 4 + \
                 [(batch, 1024, 14, 14)] * 6 + [(batch, 2048, 7, 7)] * 3
        for s in shapes:
            add_bytes += 3 * int(np.prod(s)) * BF16
    traffic["add+pool"] += add_bytes

    # optimizer + EMA passes (read grads f32 + params, write params), per
    # step not per image — same family hvt pays; include for parity.
    opt = 4 * n_params * F32

    total = sum(traffic.values()) + opt
    return model, n_params, traffic, opt, total


def floor(batch: int = 256, image: int = 224, num_classes: int = 10000):
    """Count-each-tensor-once MINIMUM for the R50 train step (round 5,
    VERDICT r4 item 6): the floor an *ideally fused* program pays, against
    which hvt's measured 74 GB/step is judged.

    The model (per tensor, per necessary pass):

      conv fwd:  read input once + weights once, write the post-BN+ReLU
                 output once (BN statistics and ReLU ride the conv output
                 write as multi-output fusion — exactly what hvt's measured
                 convert_reduce_fusions do, BENCH.md roofline).
      conv bwd:  read grad_out once (dgrad+wgrad in one fused pass), read
                 the saved input once (wgrad + BN/ReLU-grad recompute),
                 read weights once, write grad_in once, write the f32
                 weight grad once.
      BN:        zero activation bytes (fused); running/batch stats are
                 C-sized f32 — counted, negligible.
      ReLU:      zero (the mask recomputes from the saved activation read
                 already counted in conv bwd).
      residual:  write the sum once, both fwd consumers read once; bwd
                 aliases (gradient of add is identity into both branches).
      optimizer: decoupled-SGDW momentum — read grad + param + momentum,
                 write param + momentum, all f32 (5 passes); EMA every
                 20 steps amortized.

    Anything below this double-counts nothing: every activation is written
    exactly once and read exactly once per direction that mathematically
    needs it."""
    model = TorchR50(num_classes)
    n_params = sum(p.numel() for p in model.parameters())

    fl = {"conv": 0, "bn-stats": 0, "add": 0, "pool": 0, "fc": 0}

    def nbytes(t):
        return t.numel() * BF16

    def hook(mod, inp, out):
        i, o = nbytes(inp[0]), nbytes(out)
        w = sum(p.numel() for p in mod.parameters()) * BF16
        dw = sum(p.numel() for p in mod.parameters()) * F32
        if isinstance(mod, nn.Conv2d):
            fl["conv"] += (i + w + o) + (o + i + w + i + dw)
        elif isinstance(mod, nn.BatchNorm2d):
            c = out.shape[1]
            fl["bn-stats"] += 8 * c * F32  # stats in/out, fwd+bwd
        elif isinstance(mod, (nn.MaxPool2d, nn.AdaptiveAvgPool2d)):
            fl["pool"] += (i + o) + (o + i)
        elif isinstance(mod, nn.Linear):
            fl["fc"] += (i + o + w) + (o + i + w + i + dw)

    hooks = [m.register_forward_hook(hook) for m in model.modules()
             if isinstance(m, (nn.Conv2d, nn.BatchNorm2d, nn.MaxPool2d,
                               nn.AdaptiveAvgPool2d, nn.Linear))]
    with torch.no_grad():
        model.eval()
        model(torch.zeros(batch, 3, image, image))
    for h in hooks:
        h.remove()

    shapes = [(batch, 256, 56, 56)] * 3 + [(batch, 512, 28, 28)] * 4 + \
             [(batch, 1024, 14, 14)] * 6 + [(batch, 2048, 7, 7)] * 3
    for s in shapes:
        fl["add"] += 3 * int(np.prod(s)) * BF16

    opt = 5 * n_params * F32 + (4 * n_params * F32) // 20  # SGDW + EMA/20
    total = sum(fl.values()) + opt
    return n_params, fl, opt, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--floor", action="store_true",
                    help="print the count-each-tensor-once minimum instead")
    args = ap.parse_args()
    if args.floor:
        n_params, fl, opt, total = floor(args.batch)
        print(f"R50 params: {n_params/1e6:.2f} M")
        for k, v in fl.items():
            print(f"  {k:10s} {v/2**30:8.2f} GiB/step")
        print(f"  {'optimizer':10s} {opt/2**30:8.2f} GiB/step")
        print(f"count-each-tensor-once floor ≈ {total/2**30:.1f} GiB/step "
              f"({total/args.batch/2**20:.1f} MiB/image) at batch {args.batch}")
        print("hvt measured (BENCH.md round 3): 74 GB/step = 289 MB/image")
        print(f"measured / floor: {74e9 / total:.2f}x")
        return
    model, n_params, traffic, opt, total = account(args.batch)
    print(f"torch R50 params: {n_params/1e6:.2f} M")
    for k, v in traffic.items():
        print(f"  {k:10s} {v/2**30:8.2f} GiB/step")
    print(f"  {'optimizer':10s} {opt/2**30:8.2f} GiB/step")
    print(f"torch program total ≈ {total/2**30:.1f} GiB/step "
          f"({total/args.batch/2**20:.1f} MiB/image) at batch {args.batch}")
    print("hvt measured (BENCH.md round 3): 74 GB/step = 289 MB/image")
    print(f"ratio: {total/ (74e9):.2f}x")


if __name__ == "__main__":
    main()
