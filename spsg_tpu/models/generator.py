"""Two-branch volumetric generator (Flax rebuild of reference
torch/model.py:167-396).

Architecture (see reference model.png): a geometry encoder-decoder over the
truncated-SDF channel producing occupancy + refined SDF, and a color/semantics
encoder-decoder over masked colors that consumes the geometry decoder's
features (``pass_geo_feats``) and a U-Net skip (``encoded_half``), with
nearest-neighbor x2 upsampling. Heads: color (3ch, clamped to [-1,1]) and
semantics (14ch logits).

TPU-first differences from the reference:
  * channel-last NDHWC layout (B, Z, Y, X, C) so XLA tiles convs onto the MXU;
  * fully shape-polymorphic (the reference's ``update_sizes`` is unnecessary —
    any multiple-of-4 volume works);
  * optional bfloat16 compute with float32 params/BN statistics.

Parity notes: conv->LeakyReLU(0.2)->BatchNorm ordering, BatchNorm
momentum/eps = torch defaults (0.1/1e-5 -> flax momentum 0.9), torch
kaiming-uniform(a=sqrt(5)) init, per-layer kernel sizes kz/dilations as built
at model.py:183-191 for a z-extent > 1.

The reference's ``Conv3`` helper sets ``BatchNorm3d(momentum=0.8)``
(model.py:116) but the live Generator never instantiates Conv3 — every
actual block is a plain nn.Sequential with default-momentum
``nn.BatchNorm3d`` (model.py:194-325), so flax momentum 0.9 is the correct
parity value (audited round 4). torch additionally updates running_var with
the UNBIASED batch variance where flax uses biased — a factor N/(N-1) with
N ~ 1e6 voxels at the flagship shapes, i.e. negligible by design.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_CLASSES = 14


def torch_kernel_init():
    # torch Conv3d default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


COMPACT_RESID_NAME = "spsg_conv_compact"


def _compact_tag(x):
    """Tag a conv output for compact-residual checkpointing.

    On TPU, XLA stores every conv activation with the channel dim padded to
    the full 128-lane tile — a ~6.4x memory blowup at nf=20 that makes the
    full train step peak at 11.8 GB for batch 2 (tools/memcheck.py,
    docs/DESIGN.md round-3 findings). Collapsing the last two dims makes the
    minor dim a large multiple (X*C or Y*X) that tiles without padding, so a
    residual saved in this shape is stored compact.

    This is a pure tag: a reshape pair XLA folds away, plus a
    jax.ad_checkpoint.checkpoint_name that has NO effect unless the caller
    wraps the model apply in jax.checkpoint(policy=
    save_only_these_names(COMPACT_RESID_NAME)) (training/step.py,
    TrainConfig.compact_resid). Under that policy the tagged (compact) conv
    outputs are the ONLY saved residuals: convs are never recomputed in the
    backward (their outputs are saved), while the cheap elementwise
    act/BN/upsample chain replays from them."""
    from jax.ad_checkpoint import checkpoint_name

    s = x.shape
    c = checkpoint_name(
        x.reshape(s[:-2] + (s[-2] * s[-1],)), COMPACT_RESID_NAME
    )
    return c.reshape(s)


class _ConvChannelsFirst(nn.Module):
    """NCDHW conv with nn.Conv-identical parameters (kernel (kz,ky,kx,I,O),
    bias (O,), same init) so checkpoints are layout-agnostic. Channel-first
    is 1.56x faster than NDHWC in an isolated same-C conv stack
    (tools/layout_probe.py: 138 vs 216 ms, 6-conv nf=20, fwd+bwd, bf16,
    v5e) but measured ~4% SLOWER in the full model end-to-end (strided
    convs, varying C, upsampling and the entry/exit transposes eat the
    win), so it is OFF by default — kept as a verified experiment knob
    (docs/DESIGN.md layout experiments)."""

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int]
    padding: list
    kernel_dilation: Tuple[int, int, int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[1]
        kernel = self.param(
            "kernel",
            torch_kernel_init(),
            self.kernel_size + (in_ch, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        # dtype=None must match nn.Conv's promotion (input+f32 kernel -> f32):
        # the output heads deliberately pass no dtype so they compute in f32
        # even in bf16 runs
        cdt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(cdt),
            jnp.transpose(kernel.astype(cdt), (4, 3, 0, 1, 2)),
            self.strides,
            self.padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )
        return y + bias.astype(y.dtype)[None, :, None, None, None]


class _ConvPallas(nn.Module):
    """3x3x3 stride-1 conv via the Pallas im2col kernel (ops/pallas_conv.py)
    with nn.Conv-identical parameters; falls into interpreter mode off-TPU."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_conv import conv3x3

        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init(), (3, 3, 3, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        # match nn.Conv's dtype=None promotion (see _ConvChannelsFirst)
        cdt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        y = conv3x3(x.astype(cdt), kernel.astype(cdt))
        return y + bias.astype(y.dtype)


class _ConvFolded(nn.Module):
    """Odd-kernel stride-1 conv via the output-folded matmul formulation
    (ops/folded_conv.py): a (gy, gx) block of output pixels per MXU row, so
    the matmul's lane dim is gy*gx*features instead of features (the nf=20
    "conv ceiling", docs/DESIGN.md §5). nn.Conv-identical parameters."""

    features: int
    fold: Tuple[int, int]
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.folded_conv import conv_folded

        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init(),
            self.kernel_size + (in_ch, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        # match nn.Conv's dtype=None promotion (see _ConvChannelsFirst)
        cdt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        y = conv_folded(x.astype(cdt), kernel.astype(cdt), self.fold)
        return y + bias.astype(y.dtype)


class _ConvZslab(nn.Module):
    """Any-shape conv via the z-slab rank-4 formulation
    (ops/zslab_conv.py): kz kernel taps fold into the channel dim and the
    whole layer runs as ONE 2D conv with batch B*Zo — XLA's rank-4 conv
    path measured 15.17 effective TFLOP/s fwd+bwd vs 2.35 for the rank-5
    lowering at the generator's operating point (tools/conv_probe.py,
    docs/evidence/bench_r4/conv_probe.log). nn.Conv-identical parameters."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    dilation: Tuple[int, int, int] = (1, 1, 1)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.zslab_conv import conv3d_zslab

        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init(),
            self.kernel_size + (in_ch, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        # match nn.Conv's dtype=None promotion (see _ConvChannelsFirst)
        cdt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        y = conv3d_zslab(
            x.astype(cdt), kernel.astype(cdt),
            self.strides, self.padding, self.dilation,
        )
        return y + bias.astype(y.dtype)


class _ConvPallasFused(nn.Module):
    """Fused 3x3x3 conv + bias + LeakyReLU(0.2) + BN batch statistics via
    ops/pallas_conv.conv3x3_act_stats, with nn.Conv-identical parameters.
    Returns (y_act, sum, sumsq); the stats feed _StatsBatchNorm so the
    activation is read/written exactly once (the round-3 trace showed the
    separate BN statistic reductions' tiny per-channel DMAs dominating the
    geo-step op histogram, docs/DESIGN.md §5)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_conv import conv3x3_act_stats

        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init(), (3, 3, 3, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        cdt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        return conv3x3_act_stats(x.astype(cdt), kernel.astype(cdt), bias)


class _StatsBatchNorm(nn.Module):
    """BatchNorm that consumes externally computed batch statistics (the
    fused conv kernel's sum/sumsq). Variable tree and semantics identical to
    flax nn.BatchNorm (scale/bias params; batch_stats mean/var; biased
    variance E[x^2]-E[x]^2; running = m*old + (1-m)*batch)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, s, ss, n, use_running_average: bool):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda *a: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda *a: jnp.ones(c, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = s / n
            var = jnp.maximum(ss / n - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * jax.lax.stop_gradient(mean)
                ra_var.value = m * ra_var.value + (1 - m) * jax.lax.stop_gradient(var)
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        x, mean, var, sc, bi = (a.astype(dt) for a in (x, mean, var, scale, bias))
        mul = jax.lax.rsqrt(var + self.epsilon) * sc
        return (x - mean) * mul + bi


class ConvBlock(nn.Module):
    """Conv3d -> optional LeakyReLU(0.2) -> optional BatchNorm (reference
    ordering inside every nn.Sequential of model.py). With
    ``channels_first`` the block computes in NCDHW (same parameters); with
    ``pallas_conv`` eligible convs (3x3x3, stride 1, dilation 1, NDHWC) use
    the Pallas im2col kernel; ``fused_conv`` additionally fuses bias +
    LeakyReLU + BN-statistics into that kernel (one pass over the
    activation)."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    act: bool = True
    bn: bool = True
    dtype: Optional[jnp.dtype] = None
    channels_first: bool = False
    pallas_conv: bool = False
    fused_conv: bool = False
    folded_conv: bool = False
    zslab_conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        pad = [(self.padding, self.padding)] * 3
        eligible = (
            not self.channels_first
            and self.kernel == (3, 3, 3)
            and self.stride == 1
            and self.padding == 1
            and self.dilation == 1
        )
        if self.fused_conv and eligible and self.act and self.bn:
            y, s, ss = _ConvPallasFused(
                self.features, dtype=self.dtype, name="Conv_0"
            )(x)
            # tag the activation AND the tiny stats so compact-resid
            # checkpointing never re-runs the conv kernel in the backward
            y = _compact_tag(y)
            from jax.ad_checkpoint import checkpoint_name

            s = checkpoint_name(s, COMPACT_RESID_NAME)
            ss = checkpoint_name(ss, COMPACT_RESID_NAME)
            n = y.shape[0] * y.shape[1] * y.shape[2] * y.shape[3]
            return _StatsBatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="BatchNorm_0"
            )(y, s, ss, n, use_running_average=not train)
        use_pallas = self.pallas_conv and eligible
        # zslab eligibility is universal for NDHWC (any kernel/stride/
        # dilation); explicit pallas/fused requests keep precedence on
        # their eligible subset
        use_zslab = self.zslab_conv and not self.channels_first and not use_pallas
        # folded eligibility is wider than Pallas': any odd SAME kernel
        # (the 5x5x5 full-res geo_0a/encoder_0a are the worst lane-fill
        # offenders: 125*C taps onto 10/20 of 128 lanes)
        fold = (1, 1)
        if (
            self.folded_conv
            and not use_pallas
            and not use_zslab
            and not self.channels_first
            and self.stride == 1
            and self.dilation == 1
            and all(k % 2 == 1 for k in self.kernel)
            and self.padding == self.kernel[0] // 2
            and self.kernel[0] == self.kernel[1] == self.kernel[2]
        ):
            from ..ops.folded_conv import pick_fold

            fold = pick_fold(
                x.shape[2], x.shape[3], self.features, k=self.kernel[0]
            )
        if use_pallas:
            x = _ConvPallas(self.features, dtype=self.dtype, name="Conv_0")(x)
        elif use_zslab:
            x = _ConvZslab(
                self.features,
                kernel_size=self.kernel,
                strides=(self.stride,) * 3,
                padding=(self.padding,) * 3,
                dilation=(self.dilation,) * 3,
                dtype=self.dtype,
                name="Conv_0",
            )(x)
        elif fold != (1, 1):
            x = _ConvFolded(
                self.features, fold=fold, kernel_size=self.kernel,
                dtype=self.dtype, name="Conv_0",
            )(x)
        elif self.channels_first:
            x = _ConvChannelsFirst(
                self.features,
                kernel_size=self.kernel,
                strides=(self.stride,) * 3,
                padding=pad,
                kernel_dilation=(self.dilation,) * 3,
                dtype=self.dtype,
                name="Conv_0",  # parameter path identical to the NDHWC nn.Conv
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=self.kernel,
                strides=(self.stride,) * 3,
                padding=pad,
                kernel_dilation=(self.dilation,) * 3,
                kernel_init=torch_kernel_init(),
                dtype=self.dtype,
            )(x)
        x = _compact_tag(x)
        if self.act:
            x = nn.leaky_relu(x, negative_slope=0.2)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, axis=1 if self.channels_first else -1,
            )(x)
        return x


def upsample2x(x):
    """Nearest-neighbor x2 in all three spatial dims (reference
    F.interpolate(scale_factor=2, mode='nearest'), model.py:358)."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    x = jnp.repeat(x, 2, axis=3)
    return x


def upsample2x_cf(x):
    """Channel-first variant: spatial dims are axes 2..4."""
    x = jnp.repeat(x, 2, axis=2)
    x = jnp.repeat(x, 2, axis=3)
    x = jnp.repeat(x, 2, axis=4)
    return x


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    nf: int = 20  # reference --nf_gen default (train.py:96)
    nf_in_geo: int = 1
    nf_in_color: int = 4  # 3 + input mask channel (train.py:153)
    pass_geo_feats: bool = True
    truncation: float = 3.0
    max_dilation: int = 1
    input_mask: bool = True  # nf_in_color > 3 (model.py:172)
    num_classes: int = NUM_CLASSES
    dtype: Optional[str] = None  # 'bfloat16' for MXU-friendly compute
    # compute the whole network in NCDHW; parameters and the (channel-last)
    # call signature are unchanged, so checkpoints and callers are
    # layout-agnostic. Faster in a conv micro-probe, ~4% slower in the real
    # model (docs/DESIGN.md layout experiments) -> default off
    channels_first: bool = False
    # route eligible 3x3x3 stride-1 convs through the Pallas im2col kernel
    # (ops/pallas_conv.py); parameters are identical to the nn.Conv path
    pallas_conv: bool = False
    # fuse bias + LeakyReLU(0.2) + BN batch statistics into the Pallas conv
    # kernel for eligible blocks (one pass over the activation; the separate
    # BN statistic reductions disappear). Parameters/batch_stats trees are
    # identical to the plain path (tests/test_model.py)
    fused_conv: bool = False
    # compute eligible 3x3x3 stride-1 convs as output-folded matmuls
    # (ops/folded_conv.py): a (gy, gx) pixel block per MXU row widens the
    # lane dim to gy*gx*features — the space-to-depth answer to the nf=20
    # conv ceiling (20/128 lanes filled). Parameters identical to nn.Conv.
    folded_conv: bool = False
    # compute EVERY conv as a z-slab rank-4 conv (ops/zslab_conv.py): the
    # kz kernel taps fold into the channel dim and the layer runs as one
    # 2D conv with batch B*Zo — XLA's rank-4 path measured 6.4x faster
    # fwd+bwd than its rank-5 lowering at the generator's operating point
    # (tools/conv_probe.py). Parameters identical to nn.Conv.
    zslab_conv: bool = False
    # rematerialize activations in the backward pass (jax.checkpoint per
    # conv block): trades ~30% more FLOPs for large activation-memory savings
    # — enables bigger batches on one chip
    remat: bool = False


class Generator(nn.Module):
    cfg: GeneratorConfig = GeneratorConfig()

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array,
        pred_color: bool,
        pred_sdf: bool = True,
        pred_semantic: bool = False,
        train: bool = True,
    ):
        """Args: x (B,Z,Y,X,4) = [tsdf, color x3]; mask (B,Z,Y,X,1).
        Returns (occ_logits (B,Z,Y,X,1), sdf (B,Z,Y,X,1), color, semantic)
        — color/semantic are None unless requested (reference forward,
        model.py:345-396)."""
        cfg = self.cfg
        nf = cfg.nf
        cf = cfg.channels_first
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
        d = cfg.max_dilation
        dil = [min(2, d), min(4, d), min(8, d), min(16, d)]
        Block = (
            nn.remat(ConvBlock, static_argnums=(2,)) if cfg.remat else ConvBlock
        )
        if cf:
            Block = functools.partial(Block, channels_first=True)
        if cfg.pallas_conv:
            Block = functools.partial(Block, pallas_conv=True)
        if cfg.fused_conv:
            Block = functools.partial(Block, fused_conv=True)
        if cfg.folded_conv:
            Block = functools.partial(Block, folded_conv=True)
        if cfg.zslab_conv:
            Block = functools.partial(Block, zslab_conv=True)
        # layout helpers: preprocessing stays channel-last (cheap elementwise);
        # branches run in the configured layout; outputs return channel-last
        chax = 1 if cf else -1
        cat = lambda *xs: jnp.concatenate(xs, axis=chax)
        up = upsample2x_cf if cf else upsample2x
        tr_in = (lambda t: jnp.transpose(t, (0, 4, 1, 2, 3))) if cf else (lambda t: t)
        tr_out = (lambda t: jnp.transpose(t, (0, 2, 3, 4, 1))) if cf else (lambda t: t)

        if cfg.input_mask:
            x = jnp.concatenate([x, mask], axis=-1)
        x_geo = x[..., :1]
        # zero out truncated-empty voxels (model.py:352). The reference's
        # in-place masking mutates x's first channel through the view, so the
        # zeroed SDF also reaches the decoder's final concat (model.py:384).
        x_geo = jnp.where(jnp.abs(x_geo) >= cfg.truncation - 0.01, 0.0, x_geo)
        x = jnp.concatenate([x_geo, x[..., 1:]], axis=-1)
        if dtype is not None:
            x_geo = x_geo.astype(dtype)
        x_geo = tr_in(x_geo)

        # === geometry branch (model.py:194-242) ===
        g = Block(nf // 2, (5, 5, 5), 1, 2, dtype=dtype, name="geo_0a")(x_geo, train)
        g = Block(nf, (4, 4, 4), 2, 1, dtype=dtype, name="geo_0b")(g, train)
        g = Block(nf, (3, 3, 3), 1, 1, dtype=dtype, name="geo_0c")(g, train)
        g = Block(2 * nf, (4, 4, 4), 2, 1, dtype=dtype, name="geo_1a")(g, train)
        g = Block(2 * nf, (3, 3, 3), 1, 1, dtype=dtype, name="geo_1b")(g, train)
        g = Block(2 * nf, (3, 3, 3), 1, 1, dtype=dtype, name="geo_1c")(g, train)
        g = Block(
            2 * nf, (3, 3, 3), 1, dil[0], dilation=dil[0], dtype=dtype, name="geo_1d"
        )(g, train)
        g = up(g)
        g = Block(nf, (3, 3, 3), 1, 1, dtype=dtype, name="geo_2a")(g, train)
        g = Block(nf, (3, 3, 3), 1, 1, dtype=dtype, name="geo_2b")(g, train)
        geo = up(g)

        occ = Block(nf // 2, (3, 3, 3), 1, 1, dtype=dtype, name="geo_occ_a")(geo, train)
        out_occ = Block(1, (3, 3, 3), 1, 1, act=False, bn=False, name="geo_occ_b")(
            occ, train
        )
        s = Block(nf // 2, (3, 3, 3), 1, 1, dtype=dtype, name="geo_3a")(geo, train)
        s = Block(nf // 2, (3, 3, 3), 1, 1, dtype=dtype, name="geo_3b")(s, train)
        out_sdf = Block(1, (3, 3, 3), 1, 1, act=False, bn=False, name="geo_3c")(s, train)

        out_color = None
        out_semantic = None
        if pred_color or pred_semantic:
            # === color/semantics branch (model.py:244-325, 364-394) ===
            x_color = x[..., 1:4] * 2.0 - 1.0
            if cfg.input_mask:
                m = x[..., 4:]
                masked_x = x_color * (1.0 - m) + m
                enc_in = jnp.concatenate([masked_x, m], axis=-1)
            else:
                enc_in = x_color
            if dtype is not None:
                enc_in = enc_in.astype(dtype)
            e = Block(nf, (5, 5, 5), 1, 2, dtype=dtype, name="encoder_0a")(tr_in(enc_in), train)
            e = Block(2 * nf, (4, 4, 4), 2, 1, dtype=dtype, name="encoder_0b")(e, train)
            e = Block(2 * nf, (3, 3, 3), 1, 1, dtype=dtype, name="encoder_0c")(e, train)
            if cfg.pass_geo_feats:
                pg = Block(nf, (4, 4, 4), 2, 1, dtype=dtype, name="encoder_geo")(
                    geo, train
                )
                e = cat(e, pg)
            encoded_half = e
            e = Block(5 * nf, (4, 4, 4), 2, 1, dtype=dtype, name="encoder_1a")(e, train)
            e = Block(5 * nf, (3, 3, 3), 1, 1, dtype=dtype, name="encoder_1b")(e, train)
            e = Block(5 * nf, (3, 3, 3), 1, 1, dtype=dtype, name="encoder_1c")(e, train)
            dec = up(e)
            dec = Block(2 * nf, (3, 3, 3), 1, 1, dtype=dtype, name="decoder_2a")(dec, train)
            dec = Block(2 * nf, (3, 3, 3), 1, 1, dtype=dtype, name="decoder_2b")(dec, train)
            dec = Block(2 * nf, (3, 3, 3), 1, 1, dtype=dtype, name="decoder_2c")(dec, train)
            dec = cat(dec, encoded_half)
            dec = up(dec)
            dec = Block(2 * nf, (3, 3, 3), 1, 1, dtype=dtype, name="decoder_3a")(dec, train)
            dec = Block(2 * nf, (3, 3, 3), 1, 1, dtype=dtype, name="decoder_3b")(dec, train)
            dec = Block(nf, (3, 3, 3), 1, 1, dtype=dtype, name="decoder_3c")(dec, train)
            dec = Block(nf, (3, 3, 3), 1, 1, dtype=dtype, name="decoder_3d")(dec, train)
            dec = Block(nf, (3, 3, 3), 1, 1, act=False, bn=False, dtype=dtype, name="decoder_3e")(
                dec, train
            )
            dec = cat(dec, tr_in(x).astype(dec.dtype))

            if pred_color:
                c = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=dtype, name="color_head_bn0", axis=chax,
                )(dec)
                c = nn.leaky_relu(c, 0.2)
                c = Block(nf, (3, 3, 3), 1, 1, dtype=dtype, name="color_head_a")(c, train)
                c = Block(nf // 2, (3, 3, 3), 1, 1, dtype=dtype, name="color_head_b")(c, train)
                c = Block(3, (3, 3, 3), 1, 1, act=False, bn=False, name="color_head_c")(
                    c, train
                )
                out_color = jnp.clip(c, -1.0, 1.0)

            if pred_semantic:
                t = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=dtype, name="semantic_head_bn0", axis=chax,
                )(dec)
                t = nn.leaky_relu(t, 0.2)
                t = Block(nf, (3, 3, 3), 1, 1, dtype=dtype, name="semantic_head_a")(t, train)
                t = Block(nf, (3, 3, 3), 1, 1, dtype=dtype, name="semantic_head_b")(t, train)
                out_semantic = Block(
                    cfg.num_classes, (3, 3, 3), 1, 1, act=False, bn=False, name="semantic_head_c"
                )(t, train)

        out_occ = tr_out(out_occ).astype(jnp.float32)
        out_sdf = tr_out(out_sdf).astype(jnp.float32)
        if out_color is not None:
            out_color = tr_out(out_color).astype(jnp.float32)
        if out_semantic is not None:
            out_semantic = tr_out(out_semantic).astype(jnp.float32)
        return out_occ, out_sdf, out_color, out_semantic


def count_params(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
