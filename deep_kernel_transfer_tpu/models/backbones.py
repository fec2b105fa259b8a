"""Flax backbones — TPU-native rebuild of the reference backbone zoo.

Re-implements the capability surface of reference backbone.py: Conv4/Conv4S/
Conv6 (+ NoPool "NP" variants for RelationNet), ResNet10/18/34/50/101, the
Conv3 QMUL regression trunk, the 2-layer MLP sines feature net, and the
weight-norm cosine head `distLinear`.

TPU-first design choices (NOT a torch translation):
  * NHWC layout throughout (XLA's preferred conv layout on TPU).
  * Fan-in normal init matching reference backbone.py:13-20 so training
    dynamics are comparable.
  * BatchNorm follows the reference's torch semantics: batch statistics +
    running-average updates during training (per-episode under vmap, with
    the per-episode updates averaged), running averages at eval
    (model.eval() in every reference test path); MAML alone always uses
    batch statistics (its BatchNorm2d_fw hack, reference backbone.py:94-102).
  * No python control flow on traced values; every module is jit-safe.

MAML "fast weights" (reference backbone.py:54-102 Linear_fw/Conv2d_fw/
BatchNorm2d_fw) need NO special layers here: in JAX the inner loop is
jax.grad over the parameter pytree, so every backbone is automatically
"fast-weight capable" (see methods/maml.py).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

ModuleDef = Any

# single source of truth lives in data/transforms.py (the host f32 path);
# the native C++ path pins the same values (src/image_pipeline.cc kMean/kStd).
# Kept as PYTHON tuples, not jnp arrays: module-level jnp constants leak
# tracers if the module is first imported inside a jit trace (CLAUDE.md;
# same rule as device_aug._LUMA_W) and force backend init at import time.
from ..data.transforms import IMAGENET_MEAN as _MEAN_NP, IMAGENET_STD as _STD_NP

IMAGENET_MEAN = tuple(float(v) for v in _MEAN_NP)
IMAGENET_STD = tuple(float(v) for v in _STD_NP)


def preprocess_input(x: Array, imagenet: bool = True) -> Array:
    """Device-side input normalisation for uint8 image batches.

    TPU-first data path: the host ships raw uint8 (4x less host->device
    traffic than normalised f32); the trunk normalises on device. float
    inputs pass through untouched (assumed already normalised), keeping
    every existing caller unchanged."""
    if not jnp.issubdtype(x.dtype, jnp.integer):
        return x
    x = x.astype(jnp.float32) / 255.0
    if imagenet:
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x


def _conv_fanin_init(key, shape, dtype=jnp.float32):
    """Normal(0, sqrt(2/n)) with n = kh*kw*out_channels.

    Matches reference backbone.py:13-17 (note: torch shape is [out,in,kh,kw],
    flax HWIO is [kh,kw,in,out] — n uses kh*kw*out)."""
    kh, kw, _, out = shape
    n = kh * kw * out
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / n)


class EpisodicBatchNorm(nn.Module):
    """BatchNorm with torch-compatible running statistics.

    Train mode (`use_running_average=False`): normalises by the current
    batch statistics and updates the "batch_stats" running averages with
    torch's convention (new = (1-m)*old + m*batch, m=0.1, UNBIASED running
    variance) — the caller must apply with mutable=["batch_stats"] and
    merge the updates. Eval mode uses the running averages, matching the
    reference's model.eval() test protocol (e.g. reference
    methods/DKT.py:245-247); MAML instead always runs train-mode
    (reference BatchNorm2d_fw, backbone.py:94-102) and discards updates.

    Statistics are kept in f32 regardless of input dtype (bf16 accumulation
    over ~1e5 elements loses BN precision in the mixed-precision trunk).

    ep_groups > 1 (train mode): the leading batch axis is ep_groups
    episodes laid out contiguously, and statistics are computed PER
    EPISODE — the same per-episode semantics as vmapping the trunk over
    the episode axis, but computed as grouped reductions on the flat
    batch so the convolutions stay un-vmapped (measured: the episodic
    vmap structure costs ~29% of the ResNet10@224 fwd+bwd, DESIGN.md §1).
    The running-average update matches the vmapped path + merge_stats
    exactly: per-episode updates averaged over episodes.
    """

    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = False,
                 ep_groups: int = 1) -> Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        xf = x.astype(jnp.float32)
        grouped = (not use_running_average) and ep_groups > 1
        if grouped:
            assert x.shape[0] % ep_groups == 0, (x.shape, ep_groups)
            xg = xf.reshape((ep_groups, x.shape[0] // ep_groups)
                            + x.shape[1:])
            axes = tuple(range(1, xg.ndim - 1))  # per-episode stats [G, C]
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            src = xg if grouped else xf
            if not grouped:
                axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(src, axis=axes)
            if x.dtype == jnp.float32:
                bshape = mean.shape[:-1] + (1,) * (src.ndim - mean.ndim) \
                    + (features,)
                var = jnp.mean(jnp.square(src - mean.reshape(bshape)),
                               axis=axes)
            else:
                # bf16 trunk: one-pass E[x^2]-m^2 lets XLA compute both
                # statistics in a single multi-output reduction fusion —
                # one HBM read of the activation tensor instead of two
                # (measured -2.4 ms fwd on the 84px block). The f32
                # accumulators are 2^16 finer than the bf16 data, so the
                # cancellation this form risks is harmless here; the f32
                # exact-parity path keeps the two-pass form.
                ex2 = jnp.mean(jnp.square(src), axis=axes)
                var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = (xg[0].size if grouped else xf.size) / features
                unbiased = var * (n / max(n - 1.0, 1.0))
                m = self.momentum
                new_mean = mean.mean(axis=0) if grouped else mean
                new_var = unbiased.mean(axis=0) if grouped else unbiased
                ra_mean.value = (1.0 - m) * ra_mean.value + m * new_mean
                ra_var.value = (1.0 - m) * ra_var.value + m * new_var
        if grouped:
            bshape = (ep_groups,) + (1,) * (xg.ndim - 2) + (features,)
            y = (xg - mean.reshape(bshape)) * jax.lax.rsqrt(
                var.reshape(bshape) + self.epsilon)
            y = y.reshape(xf.shape)
        else:
            y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


class ConvBlock(nn.Module):
    """3x3 conv + BN + ReLU (+ optional 2x2 maxpool) — reference backbone.py:105-132."""

    out_dim: int
    pool: bool = True
    padding: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 ep_groups: int = 1) -> Array:
        x = nn.Conv(
            self.out_dim,
            (3, 3),
            padding=self.padding,
            kernel_init=_conv_fanin_init,
            use_bias=True,
        )(x)
        x = EpisodicBatchNorm()(x, use_running_average=not train,
                                ep_groups=ep_groups)
        x = nn.relu(x)
        if self.pool:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class ConvNet(nn.Module):
    """Conv4/Conv6 trunk (reference backbone.py:250-268). Input NHWC.

    feat dim: 84x84 input, 4 pools -> 5x5x64 = 1600 (matches reference 1600)."""

    depth: int
    flatten: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 ep_groups: int = 1) -> Array:
        x = preprocess_input(x)
        for i in range(self.depth):
            x = ConvBlock(64, pool=(i < 4))(x, train, ep_groups)
        if self.flatten:
            x = x.reshape(x.shape[:-3] + (-1,))
        return x


class ConvNetNopool(nn.Module):
    """RelationNet trunk: pooling+valid padding only in first two blocks
    (reference backbone.py:270-285); output keeps spatial dims [19,19,64]."""

    depth: int

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 ep_groups: int = 1) -> Array:
        x = preprocess_input(x)
        for i in range(self.depth):
            x = ConvBlock(64, pool=(i in (0, 1)),
                          padding=0 if i in (0, 1) else 1)(x, train,
                                                           ep_groups)
        return x


class ConvNetS(nn.Module):
    """Omniglot trunk: single input channel, 28x28 -> 1x1x64 = 64 features
    (reference backbone.py:287-310)."""

    depth: int
    flatten: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 ep_groups: int = 1) -> Array:
        x = preprocess_input(x)
        x = x[..., :1]  # use only the first channel (reference backbone.py:307)
        for i in range(self.depth):
            x = ConvBlock(64, pool=(i < 4))(x, train, ep_groups)
        if self.flatten:
            x = x.reshape(x.shape[:-3] + (-1,))
        return x


class ConvNetSNopool(nn.Module):
    """Omniglot RelationNet trunk -> [5,5,64] maps (reference backbone.py:312-328)."""

    depth: int

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 ep_groups: int = 1) -> Array:
        x = preprocess_input(x)
        x = x[..., :1]
        for i in range(self.depth):
            x = ConvBlock(64, pool=(i in (0, 1)),
                          padding=0 if i in (0, 1) else 1)(x, train,
                                                           ep_groups)
        return x


class SimpleBlock(nn.Module):
    """ResNet basic block (reference backbone.py:135-185)."""

    out_dim: int
    half_res: bool

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 ep_groups: int = 1) -> Array:
        ura = not train
        in_dim = x.shape[-1]
        stride = 2 if self.half_res else 1
        h = nn.Conv(
            self.out_dim, (3, 3), strides=stride, padding=1,
            use_bias=False, kernel_init=_conv_fanin_init,
        )(x)
        h = EpisodicBatchNorm()(h, use_running_average=ura,
                                ep_groups=ep_groups)
        h = nn.relu(h)
        h = nn.Conv(
            self.out_dim, (3, 3), padding=1, use_bias=False,
            kernel_init=_conv_fanin_init,
        )(h)
        h = EpisodicBatchNorm()(h, use_running_average=ura,
                                ep_groups=ep_groups)
        if in_dim != self.out_dim:
            s = nn.Conv(
                self.out_dim, (1, 1), strides=stride, padding=0,
                use_bias=False, kernel_init=_conv_fanin_init,
            )(x)
            s = EpisodicBatchNorm()(s, use_running_average=ura,
                                    ep_groups=ep_groups)
        else:
            s = x
        return nn.relu(h + s)


class BottleneckBlock(nn.Module):
    """ResNet bottleneck block (reference backbone.py:190-247).

    Parity notes (deliberate, NOT bugs): unlike SimpleBlock, the
    reference's bottleneck shortcut has NO BatchNorm (backbone.py:235,
    `short_out = self.shortcut(x)`), and its 3x3 conv KEEPS the bias
    (backbone.py:207, no bias=False) — both quirks are reproduced here so
    parameter trees match the reference layout."""

    out_dim: int
    half_res: bool

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 ep_groups: int = 1) -> Array:
        ura = not train
        in_dim = x.shape[-1]
        bottleneck = self.out_dim // 4
        stride = 2 if self.half_res else 1
        h = nn.Conv(bottleneck, (1, 1), use_bias=False, kernel_init=_conv_fanin_init)(x)
        h = EpisodicBatchNorm()(h, use_running_average=ura,
                                ep_groups=ep_groups)
        h = nn.relu(h)
        h = nn.Conv(
            bottleneck, (3, 3), strides=stride, padding=1,
            kernel_init=_conv_fanin_init,
        )(h)
        h = EpisodicBatchNorm()(h, use_running_average=ura,
                                ep_groups=ep_groups)
        h = nn.relu(h)
        h = nn.Conv(self.out_dim, (1, 1), use_bias=False, kernel_init=_conv_fanin_init)(h)
        h = EpisodicBatchNorm()(h, use_running_average=ura,
                                ep_groups=ep_groups)
        if in_dim != self.out_dim:
            s = nn.Conv(
                self.out_dim, (1, 1), strides=stride, padding=0,
                use_bias=False, kernel_init=_conv_fanin_init,
            )(x)
        else:
            s = x
        return nn.relu(h + s)


class ResNet(nn.Module):
    """ResNet trunk for 224x224 inputs (reference backbone.py:330-376)."""

    block: Callable[..., nn.Module]
    num_layers: Sequence[int]
    out_dims: Sequence[int]
    flatten: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 ep_groups: int = 1) -> Array:
        x = preprocess_input(x)
        x = nn.Conv(
            64, (7, 7), strides=2, padding=3, use_bias=False,
            kernel_init=_conv_fanin_init,
        )(x)
        x = EpisodicBatchNorm()(x, use_running_average=not train,
                                ep_groups=ep_groups)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(4):
            for j in range(self.num_layers[i]):
                half_res = (i >= 1) and (j == 0)
                x = self.block(self.out_dims[i], half_res)(x, train,
                                                           ep_groups)
        if self.flatten:
            x = jnp.mean(x, axis=(-3, -2))  # global avg pool (7x7)
        return x


class Conv3(nn.Module):
    """QMUL regression trunk: 3 dilated strided convs -> 2916 features
    (reference backbone.py:379-402). 100x100 input -> 9x9x36 = 2916."""

    # declared normalisation law, honoured by methods/base.apply_trunk's
    # pre-cast uint8 path (every other trunk uses ImageNet stats)
    imagenet_norm = False

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        del train  # no BN in this trunk
        # QMUL uses bare ToTensor (no ImageNet stats, reference
        # data/qmul_loader.py): uint8 -> [0, 1] only
        x = preprocess_input(x, imagenet=False)
        for i in range(3):
            x = nn.Conv(
                36, (3, 3), strides=2, padding="VALID",
                kernel_dilation=2, kernel_init=_conv_fanin_init,
            )(x)
            x = nn.relu(x)
        return x.reshape(x.shape[:-3] + (-1,))


class MLP2(nn.Module):
    """Sines feature net: Linear(1,40)+ReLU, Linear(40,40)+ReLU
    (reference sines/train_DKT.py:113-124)."""

    width: int = 40

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        del train  # no BN in this trunk
        x = nn.relu(nn.Dense(self.width)(x))
        x = nn.relu(nn.Dense(self.width)(x))
        return x


class DistLinear(nn.Module):
    """Weight-normalised cosine classifier head (Baseline++;
    reference backbone.py:22-44). scores = scale * cos(x, w_c) with a
    class-wise learnable norm g_c (the WeightNorm 'g' component)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        v = self.param(
            "v", nn.initializers.lecun_normal(), (in_dim, self.out_dim)
        )
        g = self.param("g", nn.initializers.ones, (self.out_dim,))
        x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x_n = x / (x_norm + 1e-5)
        v_norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        w = v / (v_norm + 1e-5) * g  # weight-norm: direction * learnable norm
        cos_dist = x_n @ w
        scale_factor = 2.0 if self.out_dim <= 200 else 10.0
        return scale_factor * cos_dist


# ---------------------------------------------------------------------------
# Registry — mirrors io_utils.model_dict (reference io_utils.py:7-15) plus the
# regression backbones.
# ---------------------------------------------------------------------------


def Conv4():
    return ConvNet(depth=4)


def Conv6():
    return ConvNet(depth=6)


def Conv4NP():
    return ConvNetNopool(depth=4)


def Conv6NP():
    return ConvNetNopool(depth=6)


def Conv4S():
    return ConvNetS(depth=4)


def Conv4SNP():
    return ConvNetSNopool(depth=4)


def ResNet10(flatten=True):
    return ResNet(SimpleBlock, [1, 1, 1, 1], [64, 128, 256, 512], flatten)


def ResNet18(flatten=True):
    return ResNet(SimpleBlock, [2, 2, 2, 2], [64, 128, 256, 512], flatten)


def ResNet34(flatten=True):
    return ResNet(SimpleBlock, [3, 4, 6, 3], [64, 128, 256, 512], flatten)


def ResNet50(flatten=True):
    return ResNet(BottleneckBlock, [3, 4, 6, 3], [256, 512, 1024, 2048], flatten)


def ResNet101(flatten=True):
    return ResNet(BottleneckBlock, [3, 4, 23, 3], [256, 512, 1024, 2048], flatten)


model_dict = {
    "Conv4": Conv4,
    "Conv4S": Conv4S,
    "Conv6": Conv6,
    "ResNet10": ResNet10,
    "ResNet18": ResNet18,
    "ResNet34": ResNet34,
    "ResNet50": ResNet50,
    "ResNet101": ResNet101,
    # regression backbones (reference train_regression.py:24, sines)
    "Conv3": Conv3,
    "MLP2": MLP2,
}

# Feature dims for flattened trunks (reference backbone.py:264,304,368)
feat_dims = {
    "Conv4": 1600,
    "Conv4S": 64,
    "Conv6": 1600,
    "ResNet10": 512,
    "ResNet18": 512,
    "ResNet34": 512,
    "ResNet50": 2048,
    "ResNet101": 2048,
    "Conv3": 2916,
    "MLP2": 40,
}

# Unpooled [H, W, C] map shapes (NHWC; reference keeps [C,H,W]) for 84x84 in.
np_feat_shapes = {
    "Conv4NP": (19, 19, 64),
    "Conv6NP": (19, 19, 64),
    "Conv4SNP": (5, 5, 64),
}
