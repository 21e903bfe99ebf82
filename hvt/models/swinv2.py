"""SwinV2 in flax.linen — TPU-first rebuild of the vendored reference model.

Architecture parity with reference swinv2.py:43-868 (itself vendored from
microsoft/Swin-Transformer and modified for hierarchical heads):

* cosine attention with learnable per-head ``logit_scale`` clamped at
  log(100) (reference swinv2.py:135-138,228-231),
* continuous relative position bias: 2-layer MLP (512 hidden, ReLU, output
  bias-free) over log-spaced relative coordinates, 16·sigmoid scaled
  (reference swinv2.py:141-190,233-247),
* qkv projection with q/v bias only (k bias-free)
  (reference swinv2.py:192-219),
* shifted windows via cyclic roll + precomputed additive masks
  (reference swinv2.py:357-388,399-429),
* res-post-norm with zero-initialized norm scale/bias so each block starts
  as identity (reference swinv2.py:431-434,603-608),
* patch merging 2×2 gather → Linear(4C→2C, no bias) → LayerNorm
  (reference swinv2.py:475-496); patch embed as a strided conv
  (reference swinv2.py:640-657),
* head: Dense, or MultitaskHead when num_classes is a tuple
  (reference swinv2.py:784-795).

TPU-first differences: NHWC token layout end-to-end (no B,L,C round-trips),
the window-attention inner loop lives in hvt.ops.window_attention (jnp
reference or fused Pallas kernel), resolutions are derived from the input
shape (one compiled program per progressive-resize bucket), and per-stage
``jax.checkpoint`` replaces torch activation checkpointing
(reference swinv2.py:584-585).

Weight init parity: Dense trunc_normal(0.02) + zero bias, LayerNorm ones
(reference swinv2.py:801-808), respostnorm zeros.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hvt.models.heads import MultitaskHead
from hvt.ops import window_attention as wa

trunc02 = nn.initializers.truncated_normal(stddev=0.02)
zeros_init = nn.initializers.zeros
ones_init = nn.initializers.ones


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, kernel_init=trunc02,
                     bias_init=zeros_init, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.out, dtype=self.dtype, kernel_init=trunc02,
                     bias_init=zeros_init, name="fc2")(x)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    pretrained_window: int = 0
    dtype: Any = None
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW·B, N, C); mask: (nW, N, N) additive or None."""
        nwb, n, c = x.shape
        head_dim = c // self.num_heads

        qkv_kernel = self.param("qkv_kernel", trunc02, (c, 3 * c))
        q_bias = self.param("q_bias", zeros_init, (c,))
        v_bias = self.param("v_bias", zeros_init, (c,))
        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(10.0), jnp.float32),
            (self.num_heads, 1, 1),
        )
        cpb_w1 = self.param("cpb_w1", trunc02, (2, 512))
        cpb_b1 = self.param("cpb_b1", zeros_init, (512,))
        cpb_w2 = self.param("cpb_w2", trunc02, (512, self.num_heads))

        del head_dim  # head split happens inside window_attention_qkv
        qkv = x.astype(self.dtype) @ qkv_kernel.astype(self.dtype)
        bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = qkv + bias.astype(qkv.dtype)

        coords = jnp.asarray(
            wa.relative_coords_table(self.window, self.pretrained_window)
        )
        rel_index = jnp.asarray(wa.relative_position_index(self.window))
        rel_bias = wa.cpb_bias(cpb_w1, cpb_b1, cpb_w2, coords, rel_index, self.num_heads)

        out = wa.window_attention_qkv(
            qkv, logit_scale, rel_bias, mask,
            num_heads=self.num_heads, use_pallas=self.use_pallas,
        )  # (nwb, N, C) — packed layout in and out, no head-split transpose
        out = nn.Dense(c, dtype=self.dtype, kernel_init=trunc02,
                       bias_init=zeros_init, name="proj")(out)
        return out


from hvt.models.common import drop_path  # noqa: E402  (shared with ResNet)


def _drop_path_traced(x, rate, deterministic: bool, rng):
    """drop_path with a *traced* rate (the pipelined trunk stacks per-block
    stochastic-depth rates into an array so the vmapped stages stay
    homogeneous — module attributes must be identical across stages)."""
    if deterministic:
        return x
    keep = 1.0 - rate.astype(jnp.float32)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep.astype(x.dtype), jnp.zeros_like(x))


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    pretrained_window: int = 0
    dtype: Any = None
    use_pallas: bool = True
    # Route both block halves through the mega-fused Pallas kernels
    # (hvt.ops.swin_block_pallas); parameter tree is identical to the
    # standard path, so the flag can be flipped on existing checkpoints.
    fuse: bool = False
    # Fuse the attention half in TRAINING too (see _fused_call gating).
    # Default ON: measured +3.9% end-to-end (778 -> 808 img/s, BENCH.md
    # round 3) — the fused half absorbs the qkv/proj layout copies XLA
    # inserts around the packed-attention custom calls.
    fuse_attn_train: bool = True
    # When a fused component does NOT fit VMEM (SwinV2-T stage 4, C=768),
    # route its attention through the plain XLA lowering instead of the
    # packed Pallas kernels — the custom calls pay layout copies at their
    # boundary (BENCH.md round 3) that XLA's own fusion can avoid.
    # Default ON: measured +2.4% train (813.7 -> 833.3 img/s) and +3.8%
    # eval forward (2478 -> 2572) on the dev chip at SwinV2-T b128/b64.
    fallback_xla: bool = True
    # NHWC direct-windowing for the fused attention half (round 5): the
    # kernel's BlockSpec gathers windows straight from the (rolled) NHWC
    # feature map, so the XLA window_partition/window_reverse transposes —
    # the boundary layout copies, 13.7 ms/step at b128 (BENCH.md round 4)
    # — never exist, in forward or backward. A/B knob for the chip
    # measurement; falls back to the windowed entry when off.
    fuse_nhwc: bool = True
    # Chunked fused MLP for big-C stages (round 5): when the fused MLP's
    # resident set exceeds VMEM, stream the 4C hidden dim in K chunks
    # (fh.mlp_half_chunked) instead of falling back to XLA. Off = the
    # round-4 fallback routing.
    fuse_mlp_chunked: bool = True
    # Fused residual + stochastic depth for the NHWC attention half
    # (round 5): the kernel epilogue computes x + s·branch with the
    # per-image drop-path scale s, so the XLA-side drop-path+add pass over
    # the feature map (and the layout flips XLA wraps around that boundary
    # op) disappears in forward AND backward. Only active on the
    # fuse_nhwc route; A/B knob for the chip measurement.
    fuse_resid: bool = True
    # Mixture-of-experts MLP (hvt.ops.moe, Swin-MoE style): >0 replaces
    # this block's dense MLP with `moe_experts` expert MLPs, top-1 routed
    # with static capacity. Expert weights shard over the mesh's `model`
    # axis (expert parallelism). Requires the unfused path (fuse=False).
    moe_experts: int = 0
    moe_capacity: float = 1.25
    moe_aux_weight: float = 0.01

    @nn.compact
    def __call__(self, x, deterministic: bool = True, drop_path_rate=None):
        """x: (B, H, W, C) token grid.

        ``drop_path_rate``: optional *traced* stochastic-depth rate that
        overrides the static attribute — used by the pipelined trunk, where
        the vmapped stages must be attribute-identical and per-block rates
        arrive as data (hvt.models.swinv2 pipe>1). The fused Pallas path
        does not accept it (the trunk forces fuse=False)."""
        b, h, w, c = x.shape
        window, shift = self.window, self.shift
        if min(h, w) <= window:
            # window larger than resolution → global attention, no shift
            # (reference swinv2.py:328-334)
            window, shift = min(h, w), 0

        if self.fuse and h % window == 0 and w % window == 0:
            if drop_path_rate is not None:
                raise ValueError(
                    "traced drop_path_rate requires the unfused path "
                    "(pipelined trunks set fuse=False)"
                )
            if self.moe_experts:
                raise ValueError(
                    "MoE blocks require the unfused path (set fuse=False "
                    "for models with moe_experts > 0)"
                )
            return self._fused_call(x, window, shift, deterministic)

        shortcut = x
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        x_windows = wa.window_partition(x, window)  # (nW·B, w², C)

        mask = None
        if shift > 0:
            mask = jnp.asarray(wa.shift_attn_mask((h, w), window, shift))

        attn = WindowAttention(
            dim=c,
            window=window,
            num_heads=self.num_heads,
            pretrained_window=self.pretrained_window,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="attn",
        )(x_windows, mask)

        x = wa.window_reverse(attn, window, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))

        # res-post-norm, zero-init (reference swinv2.py:431,603-608)
        x = nn.LayerNorm(epsilon=1e-5, scale_init=zeros_init, bias_init=zeros_init,
                         dtype=self.dtype, name="norm1")(x)
        if drop_path_rate is None:
            use_dp = self.drop_path_rate > 0.0 and not deterministic
            dp = functools.partial(drop_path, rate=self.drop_path_rate)
        else:
            use_dp = not deterministic
            dp = functools.partial(_drop_path_traced, rate=drop_path_rate)
        rng = self.make_rng("dropout") if use_dp else None
        x = shortcut + dp(x, deterministic=deterministic, rng=rng)

        if self.moe_experts:
            from hvt.ops.moe import MoeMlp

            y = MoeMlp(
                num_experts=self.moe_experts,
                hidden=int(c * self.mlp_ratio),
                out=c,
                capacity_factor=self.moe_capacity,
                aux_weight=self.moe_aux_weight,
                dtype=self.dtype,
                name="moe",
            )(x, deterministic)
        else:
            y = Mlp(hidden=int(c * self.mlp_ratio), out=c, dtype=self.dtype,
                    name="mlp")(x, deterministic)
        y = nn.LayerNorm(epsilon=1e-5, scale_init=zeros_init, bias_init=zeros_init,
                         dtype=self.dtype, name="norm2")(y)
        rng = self.make_rng("dropout") if use_dp else None
        return x + dp(y, deterministic=deterministic, rng=rng)

    def _fused_call(self, x, window: int, shift: int, deterministic: bool):
        """Fused-half path via hvt.ops.fused_halves_pallas.

        Differentiable end-to-end (the kernels carry fused backward
        kernels), so this is the production training path on TPU. Per
        component gating, from measured behavior (BENCH.md):

        * MLP half: fused whenever its resident set fits VMEM — wins both
          training (-24%) and eval (-37%) at stage-1 shapes.
        * Attention half: fused for eval only — for training the packed
          attention kernels + XLA matmuls tie it, and they keep the big
          qkv/proj matmuls on well-shaped MXU tiles.

        Components that do not fit (SwinV2-T stage 4, C=768) fall back to
        the standard path. Submodules are materialized with dummy calls
        where needed purely to create the identical parameter tree, so the
        flag can be flipped on existing checkpoints. Roll, partition,
        drop-path and residual adds stay in XLA. LayerNorm runs inside the
        kernels pre-window-reverse, which is exact: LN is per-token and
        window_reverse/roll only permute tokens (reference swinv2.py:431).
        """
        from hvt.ops import fused_halves_pallas as fh

        b, h, w, c = x.shape
        n = window * window
        hidden = int(c * self.mlp_ratio)
        from hvt import ops as ops_pkg

        interpret = (
            not ops_pkg.tpu_lowering_forced()
            and jax.default_backend() not in ("tpu",)
            and not any(d.platform in ("tpu", "axon") for d in jax.devices())
        )
        train = not deterministic
        # Attention half in training: the kernel-local comparison was a wash
        # (BENCH.md round 2: 11.7 vs 11.4 ms value+grad), but end-to-end the
        # packed-kernel path pays ~19 ms/step of XLA layout copies around the
        # custom calls (qkv/proj relayouts, profiler round 3) that the fused
        # half absorbs — A/B'd on-chip via fuse_attn_train.
        fuse_attn = (not train or self.fuse_attn_train) and fh.fits_vmem(
            c, self.num_heads, n, train=train
        )
        fuse_mlp = fh.fits_vmem(c, self.num_heads, n, mlp_hidden=hidden, train=train)

        attn_mod = WindowAttention(
            dim=c, window=window, num_heads=self.num_heads,
            pretrained_window=self.pretrained_window, dtype=self.dtype,
            # In the fused branch this module is only invoked on a (1, N, C)
            # dummy to materialize the parameter tree — route that dummy off
            # the Pallas path: under a multi-chip mesh the kernels wrap in a
            # data-axis shard_map, and a leading dim of 1 is not divisible
            # by the data axis (crashes at trace time on real pods).
            use_pallas=(
                self.use_pallas and not fuse_attn and not self.fallback_xla
            ),
            name="attn",
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, scale_init=zeros_init,
                             bias_init=zeros_init, dtype=self.dtype, name="norm1")
        mlp_mod = Mlp(hidden=hidden, out=c, dtype=self.dtype, name="mlp")
        norm2 = nn.LayerNorm(epsilon=1e-5, scale_init=zeros_init,
                             bias_init=zeros_init, dtype=self.dtype, name="norm2")

        # --- attention half ---
        shortcut = x
        shifted = jnp.roll(x, (-shift, -shift), (1, 2)) if shift > 0 else x
        mask = jnp.asarray(wa.shift_attn_mask((h, w), window, shift)) if shift > 0 else None

        if fuse_attn:
            _ = attn_mod(jnp.zeros((1, n, c), x.dtype))
            ap = attn_mod.variables["params"]
            _ = norm1(jnp.zeros((1, c), x.dtype))
            n1 = norm1.variables["params"]
            coords = jnp.asarray(
                wa.relative_coords_table(window, self.pretrained_window)
            )
            rel_index = jnp.asarray(wa.relative_position_index(window))
            bias = wa.cpb_bias(
                ap["cpb_w1"], ap["cpb_b1"], ap["cpb_w2"], coords, rel_index,
                self.num_heads,
            )
            qkv_bias = jnp.concatenate(
                [ap["q_bias"], jnp.zeros_like(ap["q_bias"]), ap["v_bias"]]
            )
            if self.fuse_nhwc and self.fuse_resid:
                # Direct windowing + fused residual: the kernel returns
                # shifted_x + s·branch (s = per-image drop-path scale);
                # rolls commute with the add, so un-rolling the SUM below
                # lands exactly on shortcut + drop_path(un-rolled branch).
                use_dp = self.drop_path_rate > 0.0 and not deterministic
                rng = self.make_rng("dropout") if use_dp else None
                if use_dp:
                    keep = 1.0 - self.drop_path_rate
                    m = jax.random.bernoulli(rng, keep, (b, 1, 1, 1))
                    s = m.reshape(b).astype(jnp.float32) / keep
                else:
                    s = jnp.ones((b,), jnp.float32)
                rows8 = -(-window // 8) * 8  # kernels slice (g, ws, 1)
                out = fh.attention_half_nhwc_spmd(
                    shifted, ap["qkv_kernel"], qkv_bias, ap["logit_scale"],
                    bias, mask, ap["proj"]["kernel"], ap["proj"]["bias"],
                    n1["scale"], n1["bias"], window, self.num_heads,
                    interpret,
                    dp=jnp.broadcast_to(s[:, None, None], (b, rows8, 128)),
                )
                x = (
                    jnp.roll(out, (shift, shift), (1, 2)) if shift > 0
                    else out
                )
                return self._mlp_half_fused(
                    x, b, h, w, c, hidden, fuse_mlp, mlp_mod, norm2,
                    deterministic, interpret, train,
                )
            if self.fuse_nhwc:
                # Direct windowing: no window_partition/window_reverse —
                # the kernel's BlockSpec gathers windows from `shifted`.
                branch = fh.attention_half_nhwc_spmd(
                    shifted, ap["qkv_kernel"], qkv_bias, ap["logit_scale"],
                    bias, mask, ap["proj"]["kernel"], ap["proj"]["bias"],
                    n1["scale"], n1["bias"], window, self.num_heads,
                    interpret,
                )
            else:
                branch_w = fh.attention_half_spmd(
                    wa.window_partition(shifted, window),
                    ap["qkv_kernel"], qkv_bias, ap["logit_scale"],
                    bias, mask, ap["proj"]["kernel"], ap["proj"]["bias"],
                    n1["scale"], n1["bias"], self.num_heads, interpret,
                )
                branch = wa.window_reverse(branch_w, window, h, w)
        else:
            branch_w = attn_mod(wa.window_partition(shifted, window), mask)
            branch = wa.window_reverse(branch_w, window, h, w)

        if shift > 0:
            branch = jnp.roll(branch, (shift, shift), (1, 2))
        if not fuse_attn:
            branch = norm1(branch)
        use_dp = self.drop_path_rate > 0.0 and not deterministic
        rng = self.make_rng("dropout") if use_dp else None
        x = shortcut + drop_path(branch, self.drop_path_rate, deterministic, rng)
        return self._mlp_half_fused(
            x, b, h, w, c, hidden, fuse_mlp, mlp_mod, norm2, deterministic,
            interpret, train,
        )

    def _mlp_half_fused(self, x, b, h, w, c, hidden, fuse_mlp, mlp_mod,
                        norm2, deterministic, interpret, train):
        """MLP half of the fused route (shared tail — the fused-residual
        attention path returns through here after folding its residual
        into the kernel epilogue). Big-C stages whose fused resident set
        does not fit VMEM stream the hidden dim in chunks instead of
        falling back to XLA (round 5; fh.mlp_half_chunked)."""
        from hvt.ops import fused_halves_pallas as fh

        mlp_k = (
            0 if (fuse_mlp or not self.fuse_mlp_chunked)
            else fh.mlp_chunks(c, hidden, train=train)
        )
        resid_mlp = (
            fuse_mlp and self.fuse_resid
            and fh.mlp_resid_images_per_block(b * h * w, h * w, c, hidden) > 0
        )
        if fuse_mlp or mlp_k > 1:
            _ = mlp_mod(jnp.zeros((1, c), x.dtype))
            mp = mlp_mod.variables["params"]
            _ = norm2(jnp.zeros((1, c), x.dtype))
            n2 = norm2.variables["params"]
            args = (
                x.reshape(b * h * w, c),
                mp["fc1"]["kernel"], mp["fc1"]["bias"],
                mp["fc2"]["kernel"], mp["fc2"]["bias"],
                n2["scale"], n2["bias"],
            )
            if resid_mlp:
                # Fused residual + stochastic depth (round 5): the kernel
                # returns x + s·branch over image-aligned row blocks.
                use_dp = self.drop_path_rate > 0.0 and not deterministic
                rng = self.make_rng("dropout") if use_dp else None
                if use_dp:
                    keep = 1.0 - self.drop_path_rate
                    m = jax.random.bernoulli(rng, keep, (b, 1, 1, 1))
                    s = m.reshape(b).astype(jnp.float32) / keep
                else:
                    s = jnp.ones((b,), jnp.float32)
                out = fh.mlp_half_spmd(
                    *args, interpret, tpi=h * w,
                    dp=jnp.broadcast_to(s[:, None, None], (b, 8, 128)),
                )
                return out.reshape(b, h, w, c)
            if fuse_mlp:
                branch2 = fh.mlp_half_spmd(*args, interpret)
            else:
                branch2 = fh.mlp_half_chunked_spmd(*args, mlp_k, interpret)
            branch2 = branch2.reshape(b, h, w, c)
        else:
            branch2 = norm2(mlp_mod(x, deterministic))
        use_dp = self.drop_path_rate > 0.0 and not deterministic
        rng = self.make_rng("dropout") if use_dp else None
        return x + drop_path(branch2, self.drop_path_rate, deterministic, rng)


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """(B, H, W, C) → (B, H/2, W/2, 2C) (reference swinv2.py:475-496)."""
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, f"odd resolution {h}x{w}"
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # concat order matches the reference: (0,0), (1,0), (0,1), (1,1)
        x = jnp.concatenate(
            [x[:, :, 0, :, 0], x[:, :, 1, :, 0], x[:, :, 0, :, 1], x[:, :, 1, :, 1]],
            axis=-1,
        )
        x = nn.Dense(2 * c, use_bias=False, dtype=self.dtype, kernel_init=trunc02,
                     name="reduction")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class _PairChain(nn.Module):
    """One pipeline stage: ``n_blocks`` consecutive SwinBlocks (the usual
    no-shift/shift alternation, so ``n_blocks`` must be even for the chain
    to be phase-identical across stages). Per-block stochastic-depth rates
    arrive traced (``dpr``: (n_blocks,)) — under ``nn.vmap`` over stages the
    module attributes are shared, so anything stage-varying must be data.

    Pipeline stages run inside a vmapped region GSPMD partitions over the
    ``pipe`` mesh axis; Mosaic custom calls cannot be partitioned there, so
    the chain always uses the plain-XLA block lowering."""

    num_heads: int
    window: int
    n_blocks: int
    mlp_ratio: float = 4.0
    pretrained_window: int = 0
    dtype: Any = None
    # Static: whether the trunk's stochastic-depth schedule is nonzero.
    # False (drop_path_rate=0 configs) skips the traced bernoulli/where
    # path entirely instead of drawing dropout rng for a rate-0 mask
    # (advisor finding, round 3).
    traced_dp: bool = True

    @nn.compact
    def __call__(self, x, dpr, deterministic: bool = True):
        for i in range(self.n_blocks):
            x = SwinBlock(
                dim=x.shape[-1],
                num_heads=self.num_heads,
                window=self.window,
                shift=0 if i % 2 == 0 else self.window // 2,
                mlp_ratio=self.mlp_ratio,
                pretrained_window=self.pretrained_window,
                dtype=self.dtype,
                use_pallas=False,
                fuse=False,
                name=f"block{i}",
            )(x, deterministic,
              drop_path_rate=dpr[i] if self.traced_dp else None)
        return x


class SwinTransformerV2(nn.Module):
    num_classes: Union[int, tuple[int, ...]] = 1000
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    pretrained_window_sizes: Sequence[int] = (0, 0, 0, 0)
    dtype: Any = jnp.bfloat16
    # Window-blocked fused attention kernel (hvt.ops.window_attention_pallas):
    # +8% eval forward, +2% training end-to-end vs the XLA lowering on the
    # dev chip (BENCH.md). Auto-falls back to the jnp reference off-TPU;
    # disable via model.args.use_pallas=false.
    use_pallas: bool = True
    # Mega-fused block halves (see SwinBlock.fuse); same parameter tree.
    fuse: bool = False
    # Fuse the attention half during training too (SwinBlock._fused_call);
    # measured +3.9% train throughput (BENCH.md round 3).
    fuse_attn_train: bool = True
    # Non-fitting fused components (stage 4) fall back to XLA attention
    # instead of the packed Pallas kernels (SwinBlock.fallback_xla).
    # Default ON (measured win, see SwinBlock.fallback_xla / BENCH.md).
    fallback_xla: bool = True
    # NHWC direct-windowing for fused attention (SwinBlock.fuse_nhwc,
    # round 5): windows gathered by the kernel BlockSpec, no
    # window_partition/reverse transposes.
    fuse_nhwc: bool = True
    # Chunked fused MLP for big-C stages (SwinBlock.fuse_mlp_chunked).
    fuse_mlp_chunked: bool = True
    # Fused residual + stochastic depth in the NHWC attention-half
    # epilogue (SwinBlock.fuse_resid, round 5).
    fuse_resid: bool = True
    remat: bool = False
    # Pipeline parallelism (mesh: {pipe: N}): split the deepest stage's
    # blocks into `pipe` pipeline stages. Stage params are stacked with a
    # leading stage dim (sharded over the mesh's `pipe` axis — each rank
    # stores 1/pipe of the trunk) and a statically-unrolled GPipe schedule
    # feeds `pipe_microbatches` microbatches through; the per-tick stage
    # shift lowers to ICI collective-permutes under GSPMD. Requires the
    # plain-XLA lowering (use_pallas/fuse false) and
    # depths[pipe_stage] % (2*pipe) == 0. The parameter tree changes
    # (stacked trunk) — see stack_pipe_params/unstack_pipe_params for
    # checkpoint conversion.
    pipe: int = 1
    # Microbatches in flight; 0 → `pipe` (minimum that fills the pipeline).
    # Larger values shrink the (pipe-1)/(M+pipe-1) bubble at the cost of
    # smaller per-tick matmuls. The batch must be divisible by it.
    pipe_microbatches: int = 0
    # Which stage to pipeline; -1 → the deepest stage (ties → later stage).
    pipe_stage: int = -1
    # Mixture-of-experts (Swin-MoE style, hvt.ops.moe): >0 replaces the
    # dense MLP with `moe_experts` expert MLPs in every `moe_every`-th
    # block (the second of each pair by default) of stages >=
    # `moe_from_stage`. Expert weights shard over the mesh's `model` axis
    # (expert parallelism — TP_RULES); the Switch load-balancing aux loss
    # is sown and added to the training objective by the train step.
    moe_experts: int = 0
    moe_from_stage: int = 2
    moe_every: int = 2
    moe_capacity: float = 1.25
    moe_aux_weight: float = 0.01

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    @property
    def no_weight_decay_substrings(self) -> tuple[str, ...]:
        """Optimizer no-decay names (reference swinv2.py:810-816)."""
        return ("absolute_pos_embed", "cpb_", "logit_scale")

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        features_only: bool = False,
        output_activations: bool = False,
    ):
        """output_activations=True additionally returns the per-stage token
        grids (reference swinv2.py:818-840 forward_features)."""
        b = x.shape[0]
        x = x.astype(self.dtype)
        # Patch embed: strided conv + optional norm (reference swinv2.py:640-657).
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=trunc02,
            bias_init=zeros_init,
            name="patch_embed",
        )(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        if self.ape:
            hp, wp = x.shape[1], x.shape[2]
            pos = self.param(
                "absolute_pos_embed", trunc02, (1, hp, wp, self.embed_dim)
            )
            x = x + pos.astype(x.dtype)

        # Stochastic-depth decay schedule (reference swinv2.py:752-755).
        total_depth = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_depth)

        block_cls = (
            nn.remat(SwinBlock, static_argnums=(2,)) if self.remat else SwinBlock
        )
        pipelined_stage = self._pipe_stage_index() if self.pipe > 1 else None
        if pipelined_stage is not None and self.moe_experts:
            raise ValueError(
                "pipe > 1 and moe_experts > 0 are mutually exclusive for "
                "now (the pipelined trunk's vmapped chains do not carry "
                "MoE blocks)"
            )

        activations = []
        block_idx = 0
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            if stage == pipelined_stage:
                x = self._pipelined_stage(
                    x, heads, depth, dpr[block_idx : block_idx + depth], train
                )
                block_idx += depth
                if stage < len(self.depths) - 1:
                    x = PatchMerging(dim=x.shape[-1], dtype=self.dtype,
                                     name=f"stage{stage}_merge")(x)
                if output_activations:
                    activations.append(x)
                continue
            for i in range(depth):
                block_moe = (
                    self.moe_experts
                    if (
                        self.moe_experts
                        and stage >= self.moe_from_stage
                        and i % self.moe_every == self.moe_every - 1
                    )
                    else 0
                )
                x = block_cls(
                    dim=x.shape[-1],
                    num_heads=heads,
                    window=self.window_size,
                    shift=0 if i % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path_rate=float(dpr[block_idx]),
                    pretrained_window=self.pretrained_window_sizes[stage],
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    # The fused MLP-half kernel is dense — MoE blocks take
                    # the unfused path (their attention may still fuse via
                    # the plain SwinBlock gating on non-MoE blocks only).
                    fuse=self.fuse and not block_moe,
                    fuse_attn_train=self.fuse_attn_train,
                    fallback_xla=self.fallback_xla,
                    fuse_nhwc=self.fuse_nhwc,
                    fuse_mlp_chunked=self.fuse_mlp_chunked,
                    fuse_resid=self.fuse_resid,
                    moe_experts=block_moe,
                    moe_capacity=self.moe_capacity,
                    moe_aux_weight=self.moe_aux_weight,
                    name=f"stage{stage}_block{i}",
                )(x, not train)
                block_idx += 1
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim=x.shape[-1], dtype=self.dtype,
                                 name=f"stage{stage}_merge")(x)
            if output_activations:
                activations.append(x)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x.reshape(b, -1, x.shape[-1]), axis=1)  # token avgpool
        x = x.astype(jnp.float32)
        if features_only:
            return (x, activations) if output_activations else x

        if isinstance(self.num_classes, tuple):
            return MultitaskHead(self.num_classes, dtype=jnp.float32, name="head")(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32, kernel_init=trunc02,
                        bias_init=zeros_init, name="head")(x)

    def _pipe_stage_index(self) -> int:
        """The stage carried by the pipeline: explicit ``pipe_stage``, or the
        deepest stage (later stage wins ties — deeper in the net, where the
        channel width carries most of the FLOPs)."""
        if self.pipe_stage >= 0:
            return self.pipe_stage
        depths = list(self.depths)
        best = max(depths)
        return len(depths) - 1 - depths[::-1].index(best)

    def _pipelined_stage(self, x, heads: int, depth: int, dpr_slice, train: bool):
        """GPipe over the stage's blocks, in the GSPMD-native stacked-stage
        formulation (the scaling-book / maxtext pipeline recipe, not a
        hand-written send/recv scheduler):

        * the stage's blocks are grouped into ``pipe`` chains whose params
          are stacked with a leading stage dim by ``nn.vmap`` — sharded over
          the mesh's ``pipe`` axis (hvt.parallel.TP_RULES ``pipe_trunk``
          rules), each rank stores and computes only its own chain;
        * a state buffer (pipe, microbatch, H, W, C) holds each stage's
          in-flight microbatch; every tick applies all chains in lockstep
          (one vmapped call) and shifts the buffer one stage down — under
          GSPMD the shift is an ICI collective-permute;
        * the schedule is statically unrolled (M + pipe - 1 ticks, python
          loop): all indices are static, no lax.scan, no dynamic slicing.

        Bubble ticks flow REAL data (microbatch 0) through not-yet-fed
        stages — never zeros, which would NaN the cosine-attention q/k
        normalization (0/0) and poison every param gradient downstream of a
        bubble via 0 * NaN. Bubble outputs are never collected, so their
        cotangents are exactly zero (see the `state` init below).
        Numerics match the sequential stage bit-for-bit in eval mode
        (tests/test_pipeline.py); in training the stochastic-depth draws
        differ from the sequential path (split rngs per stage), same
        distribution."""
        from hvt import parallel

        P = self.pipe
        if depth % (2 * P):
            raise ValueError(
                f"pipelined stage depth {depth} must divide into {P} "
                f"phase-aligned chains (depth % (2*pipe) == 0)"
            )
        n_blocks = depth // P
        M = self.pipe_microbatches or P
        b, h, w, c = x.shape
        if b % M:
            raise ValueError(
                f"batch {b} not divisible by pipe_microbatches={M}"
            )
        bm = b // M

        dpr_stage = jnp.asarray(np.asarray(dpr_slice, np.float32).reshape(P, n_blocks))
        # remat applies to the pipelined trunk too — it carries the deepest
        # (most activation-heavy) stage, so skipping it here would forfeit
        # most of the rematerialisation saving (advisor finding, round 3).
        chain_cls = (
            nn.remat(_PairChain, static_argnums=(3,)) if self.remat else _PairChain
        )
        stage_cls = nn.vmap(
            chain_cls,
            in_axes=(0, 0, None),
            out_axes=0,
            axis_size=P,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )
        trunk = stage_cls(
            num_heads=heads,
            window=self.window_size,
            n_blocks=n_blocks,
            mlp_ratio=self.mlp_ratio,
            pretrained_window=self.pretrained_window_sizes[self._pipe_stage_index()],
            dtype=self.dtype,
            traced_dp=self.drop_path_rate > 0.0,
            name="pipe_trunk",
        )

        microbatches = x.reshape(M, bm, h, w, c)
        # Bubble slots hold REAL data (microbatch 0), not zeros: bubble
        # lineages never reach a collected output, so their cotangents are
        # exactly zero — but only if every value on them stays finite. A
        # zero buffer NaNs the cosine-attention q/k normalization (0/0),
        # and 0 * NaN poisons the param gradients of every block a bubble
        # passes through.
        state = parallel.pipe_constraint(jnp.repeat(microbatches[:1], P, axis=0))
        det = not train
        outputs = []
        for t in range(M + P - 1):
            # Feed the next microbatch at stage 0 (garbage re-feed of the
            # last microbatch during drain ticks — never collected).
            feed = microbatches[min(t, M - 1)]
            state = parallel.pipe_constraint(
                jnp.concatenate([feed[None], state[1:]], axis=0)
            )
            y = parallel.pipe_constraint(trunk(state, dpr_stage, det))
            if t >= P - 1:
                outputs.append(y[P - 1])
            # Shift one stage down: stage s's next input is stage s-1's
            # output (slot 0 is overwritten by the next feed).
            state = jnp.concatenate([y[:1], y[:-1]], axis=0)
        return jnp.concatenate(outputs, axis=0)


def _pipe_layout(model: "SwinTransformerV2") -> tuple[int, int, int, int]:
    """(stage index, stage depth, pipe, blocks per chain) of a pipelined model."""
    ps = model._pipe_stage_index()
    depth = model.depths[ps]
    return ps, depth, model.pipe, depth // model.pipe


def unstack_pipe_params(model: "SwinTransformerV2", params):
    """Pipelined param tree → the sequential (pipe=1) tree.

    ``pipe_trunk/block{j}`` leaves carry a leading stage dim; chain r's
    block j is the sequential ``stage{ps}_block{r*nb+j}``. Checkpoints
    trained under a pipe mesh convert to single-chip/pure-DP layouts with
    this (the pipe analog of the cross-topology restore test)."""
    ps, depth, pipe, nb = _pipe_layout(model)
    p = dict(params)
    trunk = p.pop("pipe_trunk")
    for r in range(pipe):
        for j in range(nb):
            p[f"stage{ps}_block{r * nb + j}"] = jax.tree.map(
                lambda a, r=r: a[r], trunk[f"block{j}"]
            )
    return p


def stack_pipe_params(model: "SwinTransformerV2", params):
    """Sequential (pipe=1) param tree → the pipelined tree (inverse of
    unstack_pipe_params); finetune a pretrained checkpoint under a pipe
    mesh by restacking its trunk."""
    ps, depth, pipe, nb = _pipe_layout(model)
    p = dict(params)
    blocks = [p.pop(f"stage{ps}_block{i}") for i in range(depth)]
    p["pipe_trunk"] = {
        f"block{j}": jax.tree.map(
            lambda *xs: jnp.stack(xs), *[blocks[r * nb + j] for r in range(pipe)]
        )
        for j in range(nb)
    }
    return p


def _variant(embed_dim, depths, num_heads, window_size):
    def build(
        num_classes,
        *,
        blurpool: bool = False,  # accepted for factory uniformity; swin has no blurpool
        dtype: Any = jnp.bfloat16,
        **kwargs,
    ):
        del blurpool
        kwargs.pop("bn_scale_init", None)
        if isinstance(dtype, str):
            dtype = jnp.dtype(dtype)
        return SwinTransformerV2(
            num_classes=num_classes,
            embed_dim=embed_dim,
            depths=depths,
            num_heads=num_heads,
            window_size=window_size,
            dtype=dtype,
            **kwargs,
        )

    return build


# Reference defaults: depths [2,2,6,2], heads [3,6,12,24], window 7
# (reference swinv2.py:706-708).
swinv2_tiny = _variant(96, (2, 2, 6, 2), (3, 6, 12, 24), 7)
swinv2_tiny_window8_256 = _variant(96, (2, 2, 6, 2), (3, 6, 12, 24), 8)
swinv2_tiny_window16_256 = _variant(96, (2, 2, 6, 2), (3, 6, 12, 24), 16)
swinv2_small = _variant(96, (2, 2, 18, 2), (3, 6, 12, 24), 7)
swinv2_base = _variant(128, (2, 2, 18, 2), (4, 8, 16, 32), 7)
swinv2_large = _variant(192, (2, 2, 18, 2), (6, 12, 24, 48), 7)
# Canonical SwinV2-L geometry at 192 px (stage grids 48/24/12/6 need
# window 12; window 7 only divides the 224-px grids).
swinv2_large_window12_192 = _variant(192, (2, 2, 18, 2), (6, 12, 24, 48), 12)
swinv2_micro = _variant(16, (1, 1), (2, 4), 4)  # tests only
# tests only: a pipeline-able micro (deep stage divides into 2 chains)
swinv2_micro_deep = _variant(16, (2, 4), (2, 4), 4)


def analytic_flops(model: SwinTransformerV2, img_size: int) -> int:
    """Analytic FLOPs accounting (reference swinv2.py:847-867)."""
    flops = 0
    res = img_size // model.patch_size
    dim = model.embed_dim
    # patch embed
    flops += res * res * dim * 3 * model.patch_size**2
    if model.patch_norm:
        flops += res * res * dim
    for stage, (depth, heads) in enumerate(zip(model.depths, model.num_heads)):
        window = min(model.window_size, res)
        n = window * window
        n_windows = (res * res) / n
        for _ in range(depth):
            # norms
            flops += 2 * dim * res * res
            # qkv + proj
            per_window = n * dim * 3 * dim + n * dim * dim
            # attn matmuls
            per_window += 2 * heads * n * n * (dim // heads)
            flops += int(n_windows * per_window)
            # mlp
            flops += int(2 * res * res * dim * dim * model.mlp_ratio)
        if stage < len(model.depths) - 1:
            flops += (res // 2) * (res // 2) * 4 * dim * 2 * dim
            flops += res * res * dim // 2
            res //= 2
            dim *= 2
    flops += dim * res * res  # final norm
    ncls = model.num_classes
    if isinstance(ncls, tuple):
        flops += sum(model.num_features * n for n in ncls)
    else:
        flops += model.num_features * ncls
    return flops
