"""Shared building blocks for the SRCNN / HighResNet family, TPU-native NHWC.

Capability parity with the live subset of ssr/archs/arch_util.py (per
SURVEY.md §2.4): OneHot, DoubleConv2d (reflect pad + PReLU + Dropout 0.5),
ResidualBlock, DenseBlock, FusionBlock, RecursiveFusion (weight-shared across
levels!), ConvTransposeBlock, PixelShuffleBlock.

Reference quirk preserved: RecursiveFusion re-uses the SAME FusionBlock
instance at every pairwise level (arch_util.py:331-335), so the levels share
weights — reproduced here by calling one submodule repeatedly.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pixelshuffle import pixel_shuffle


def reflect_conv(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    strides=(1, 1),
    dtype=jnp.float32,
) -> jax.Array:
    """'same' conv with reflect padding (torch padding_mode='reflect')."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    # Asymmetric right-pad for even kernels matches torch 'same'.
    ph2, pw2 = kh - 1 - ph, kw - 1 - pw
    xp = jnp.pad(x, ((0, 0), (ph, ph2), (pw, pw2), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        xp.astype(dtype), kernel.astype(dtype), strides, [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


class PReLU(nn.Module):
    """Single-parameter PReLU (torch nn.PReLU() default, init 0.25)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("weight", nn.initializers.constant(0.25), (1,), jnp.float32)
        a = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class ReflectConv(nn.Module):
    """Conv2d with reflect 'same' padding and torch-compatible param names."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return reflect_conv(x, kernel, bias, dtype=self.dtype)


class DoubleConv2d(nn.Module):
    """Two reflect-padded convs, each followed by PReLU and Dropout(0.5)."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ReflectConv(self.features, self.kernel_size, dtype=self.dtype, name="conv1")(x)
        x = PReLU(name="prelu1")(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = ReflectConv(self.features, self.kernel_size, dtype=self.dtype, name="conv2")(x)
        x = PReLU(name="prelu2")(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return x


class ResidualBlock(nn.Module):
    """DoubleConv2d with an additive skip."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return x + DoubleConv2d(self.features, self.kernel_size, self.dtype, name="body")(x, train)


class DenseBlock(nn.Module):
    """DoubleConv2d with a concat skip (channel axis)."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = DoubleConv2d(self.features, self.kernel_size, self.dtype, name="body")(x, train)
        return jnp.concatenate([x, y], axis=-1)


class OneHot(nn.Module):
    """One-hot encode an integer mask: [..., H, W, 1] -> [..., H, W, num_classes]."""

    num_classes: int

    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(jnp.int32)[..., 0]
        return jax.nn.one_hot(x, self.num_classes, dtype=jnp.float32)


class FusionBlock(nn.Module):
    """Fuses pairs of revisits: [B, T, H, W, C] -> [B, T//2, H, W, C]."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, t, h, w, c = x.shape
        half = t // 2
        first, second = x[:, :half], x[:, half:]
        # Channel-concat pairs, matching torch cat([first, second], dim=-3).
        pair = jnp.concatenate(
            [first.reshape(b * half, h, w, c), second.reshape(b * half, h, w, c)],
            axis=-1,
        )
        y = ResidualBlock(2 * self.features, self.kernel_size, self.dtype, name="residual")(pair, train)
        y = ReflectConv(self.features, self.kernel_size, dtype=self.dtype, name="proj")(y)
        y = PReLU(name="prelu")(y)
        return y.reshape(b, half, h, w, self.features)


class RecursiveFusion(nn.Module):
    """log2(T) pairwise fusions with a single (shared-weight) FusionBlock."""

    features: int
    kernel_size: int = 3
    revisits: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, t, h, w, c = x.shape
        # Zero-pad revisits to the next power of two (arch_util.py:337-373).
        pow2 = 1
        while pow2 < t:
            pow2 *= 2
        if pow2 != t:
            pad = jnp.zeros((b, pow2 - t, h, w, c), dtype=x.dtype)
            x = jnp.concatenate([x, pad], axis=1)
        fuse = FusionBlock(self.features, self.kernel_size, self.dtype, name="fuse")
        while x.shape[1] > 1:
            x = fuse(x, train)
        return x[:, 0]


class ConvTransposeBlock(nn.Module):
    """ConvTranspose2d (stride=zoom, VALID) + conv + conv upsampler.

    Torch-equivalent output size: (in-1)*stride + k (arch_util.py:432-463).
    """

    features_in: int
    features_out: int
    kernel_size: int = 3
    sr_kernel_size: int = 3
    zoom_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "deconv_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, k, self.features_in, self.features_in),
            jnp.float32,
        )
        bias = self.param("deconv_bias", nn.initializers.zeros, (self.features_in,), jnp.float32)
        y = jax.lax.conv_transpose(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=(self.zoom_factor, self.zoom_factor),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )
        y = y + bias.astype(self.dtype)
        y = PReLU(name="prelu1")(y)
        y = ReflectConv(self.features_in, self.kernel_size, dtype=self.dtype, name="conv1")(y)
        y = PReLU(name="prelu2")(y)
        y = ReflectConv(self.features_out, self.sr_kernel_size, dtype=self.dtype, name="conv2")(y)
        y = PReLU(name="prelu3")(y)
        return y


class PixelShuffleBlock(nn.Module):
    """PixelShuffle(zoom) + two reflect convs with PReLUs (arch_util.py:564-598)."""

    features_in: int
    features_out: int
    sr_kernel_size: int = 1
    zoom_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        shuffled_ch = self.features_in // (self.zoom_factor**2)
        y = pixel_shuffle(x, self.zoom_factor)
        y = ReflectConv(shuffled_ch, self.sr_kernel_size, dtype=self.dtype, name="conv1")(y)
        y = PReLU(name="prelu1")(y)
        y = ReflectConv(self.features_out, self.sr_kernel_size, dtype=self.dtype, name="conv2")(y)
        y = PReLU(name="prelu2")(y)
        return y


class ResidualBlockNoBN(nn.Module):
    """conv-relu-conv with scaled residual (arch_util.py:647-671)."""

    num_feat: int = 64
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(self.num_feat, (3, 3), padding=1, name="conv1", dtype=self.dtype)(x)
        y = jax.nn.relu(y)
        y = nn.Conv(self.num_feat, (3, 3), padding=1, name="conv2", dtype=self.dtype)(y)
        return x + y * jnp.asarray(self.res_scale, y.dtype)


class Upsample(nn.Module):
    """Pixel-shuffle upsampler for 2^n and 3 scales (arch_util.py:674-693)."""

    scale: int
    num_feat: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = self.scale
        if (s & (s - 1)) == 0:  # power of two
            n_stages = s.bit_length() - 1
            for i in range(n_stages):
                x = nn.Conv(4 * self.num_feat, (3, 3), padding=1,
                            name=f"conv{i}", dtype=self.dtype)(x)
                x = pixel_shuffle(x, 2)
        elif s == 3:
            x = nn.Conv(9 * self.num_feat, (3, 3), padding=1, name="conv0",
                        dtype=self.dtype)(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f"scale {s} not supported (2^n and 3 only)")
        return x


def trunc_normal_init(std: float = 1.0, mean: float = 0.0, a: float = -2.0, b: float = 2.0):
    """Truncated-normal initializer (arch_util.py:817-878 semantics)."""

    def init(key, shape, dtype=jnp.float32):
        lo = (a - mean) / std
        hi = (b - mean) / std
        return jax.random.truncated_normal(key, lo, hi, shape, dtype) * std + mean

    return init


class DCNv2Pack(nn.Module):
    """Modulated deformable conv with self-generated offsets (arch_util.py:788-814).

    The offset/mask conv takes auxiliary features; offsets are clipped-free but
    a >50px mean magnitude is the reference's instability warning sign.
    """

    features: int
    kernel_size: int = 3
    deformable_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, feat: jax.Array) -> jax.Array:
        from ..ops.warp import deform_conv2d

        k = self.kernel_size
        n_taps = k * k * self.deformable_groups
        conv_offset = nn.Conv(3 * n_taps, (k, k), padding=(k - 1) // 2,
                              name="conv_offset", dtype=self.dtype,
                              kernel_init=nn.initializers.zeros)(feat)
        o1, o2, mask = jnp.split(conv_offset, 3, axis=-1)
        # mmcv DCNv2Pack feeds cat((o1, o2)) to a kernel that reads the flat
        # channel stream as interleaved (dy, dx) pairs per tap — i.e. tap k's
        # (dy, dx) are channels (2k, 2k+1) of the concatenation.
        offsets = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(mask)
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return deform_conv2d(x, offsets, kernel, bias, mask,
                             stride=1, padding=(k - 1) // 2)
