"""Multi-frame ESRGAN generator (RRDBNet), TPU-native.

Capability parity with the reference generator `SSR_RRDBNet`
(ssr/archs/rrdbnet_arch.py:92-137): a time series of Sentinel-2 frames is
channel-stacked into the first conv, runs through num_block Residual-in-Residual
Dense Blocks, and is upsampled x4 (x8/x16 add stages; x1/x2 fold space into
channels via pixel-unshuffle first).

TPU-first design notes:
- NHWC layout; the dense-concat chains keep the growing feature dim on the TPU
  lane axis so every 3x3 conv lowers to MXU matmuls.
- The 23-block trunk is an `nn.scan` over a single RRDB program: one trace, one
  compiled block body — compile time is O(1) in num_block instead of O(n).
- Optional per-block rematerialisation (`remat=True`) trades FLOPs for HBM so
  large global batches fit during GAN training.
- Residual scaling (0.2) and nearest x2 upsampling match torch semantics
  exactly for checkpoint-parity with released .pth weights.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import ARCH_REGISTRY
from ..ops.pixelshuffle import pixel_unshuffle
from ..ops.resize import upsample_nearest


def _scaled_kaiming(scale: float):
    """Kaiming-normal (fan_in, gain sqrt(2)) scaled by `scale`.

    Mirrors the x0.1-scaled init the reference applies to dense-block convs
    (ssr/archs/arch_util.py:600-628) — important for from-scratch training
    stability of the very deep dense trunk.
    """
    base = nn.initializers.variance_scaling(2.0 * scale * scale, "fan_in", "normal")
    return base


def lrelu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


class _ConvParams(nn.Module):
    """Declares a conv's kernel+bias without an op, so forward strategy is free.

    Param paths match nn.Conv ({name}/kernel, {name}/bias) so checkpoint
    import/export is unchanged regardless of the forward used.
    """

    in_ch: int
    out_ch: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", _scaled_kaiming(self.init_scale), (3, 3, self.in_ch, self.out_ch),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,), jnp.float32)
        return kernel, bias


def _conv2d(x, kernel, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _tag_conv(x):
    """checkpoint_name tag on conv outputs — a no-op unless the trunk runs
    under the 'conv_outs' remat policy (save convs, recompute the cheap
    lrelu/concat/slice chains in the backward pass)."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "rdb_conv")


class ResidualDenseBlock(nn.Module):
    """5-conv dense block with 0.2-scaled residual.

    MXU-efficiency note (the reason this isn't five nn.Conv calls): the naive
    dense chain runs four convs with only num_grow_ch(=32) output channels —
    a quarter of the 128-wide MXU. Since conv_i(concat(x, x1, ..)) is a sum of
    per-slice convs, the forward instead batches, for each already-available
    tensor x_j, the contributions to ALL later convs into one conv with
    64..192 output channels (`fused=True`, default). Identical parameters,
    identical math (bias added once in the first partial), ~2x MXU utilisation
    on the trunk. `fused=False` keeps the literal chain for debugging.
    """

    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: Any = jnp.float32
    fused: bool = True
    rdb_impl: str = "xla"  # 'xla' | 'pallas' (fused VMEM kernel, inference)
    rdb_tile: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        nf, g = self.num_feat, self.num_grow_ch
        kbs = [
            _ConvParams(nf + i * g, g if i < 4 else nf, name=f"conv{i + 1}")()
            for i in range(5)
        ]
        if self.rdb_impl == "pallas" and x.shape[0] % self.rdb_tile == 0:
            from ..ops.pallas.rdb import rdb_pallas

            return rdb_pallas(
                x, [k for k, _ in kbs], [b for _, b in kbs], nf, g,
                tile=self.rdb_tile,
            )
        if not self.fused:
            def conv(i, h):
                k, b = kbs[i]
                return _tag_conv(_conv2d(h, k, self.dtype) + b.astype(self.dtype))

            x1 = lrelu(conv(0, x))
            x2 = lrelu(conv(1, jnp.concatenate([x, x1], axis=-1)))
            x3 = lrelu(conv(2, jnp.concatenate([x, x1, x2], axis=-1)))
            x4 = lrelu(conv(3, jnp.concatenate([x, x1, x2, x3], axis=-1)))
            x5 = conv(4, jnp.concatenate([x, x1, x2, x3, x4], axis=-1))
            return x5 * jnp.asarray(0.2, x5.dtype) + x

        # fused: partial-product batching over the dense concat structure.
        def w_slice(i, j):
            """conv_i kernel slice consuming x_j (j=0 is x, j>=1 is x_j)."""
            k = kbs[i][0]
            lo = nf + (j - 1) * g if j >= 1 else 0
            hi = nf if j == 0 else lo + g
            return k[:, :, lo:hi, :]

        def partial(j, h):
            """conv of x_j against all later convs' slices, outputs packed."""
            w = jnp.concatenate([w_slice(i, j) for i in range(j, 5)], axis=-1)
            out = _conv2d(h, w, self.dtype)
            if j == 0:  # biases applied exactly once
                b = jnp.concatenate([kb[1] for kb in kbs], axis=-1)
                out = out + b.astype(self.dtype)
            return _tag_conv(out)

        def take(p, j, i):
            """slice conv_i's packed contribution out of partial Pj."""
            off = (i - j) * g
            size = g if i < 4 else nf
            return jax.lax.dynamic_slice_in_dim(p, off, size, axis=-1)

        p0 = partial(0, x)
        x1 = lrelu(take(p0, 0, 0))
        p1 = partial(1, x1)
        x2 = lrelu(take(p0, 0, 1) + take(p1, 1, 1))
        p2 = partial(2, x2)
        x3 = lrelu(take(p0, 0, 2) + take(p1, 1, 2) + take(p2, 2, 2))
        p3 = partial(3, x3)
        x4 = lrelu(take(p0, 0, 3) + take(p1, 1, 3) + take(p2, 2, 3) + take(p3, 3, 3))
        p4 = partial(4, x4)
        x5 = (take(p0, 0, 4) + take(p1, 1, 4) + take(p2, 2, 4)
              + take(p3, 3, 4) + p4)
        return x5 * jnp.asarray(0.2, x5.dtype) + x


class RRDB(nn.Module):
    """Residual-in-Residual Dense Block: 3 RDBs + 0.2-scaled outer residual."""

    num_feat: int
    num_grow_ch: int = 32
    dtype: Any = jnp.float32
    rdb_impl: str = "xla"
    remat_rdb: bool = False  # remat at RDB granularity (1/3 of a block)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cls = nn.remat(ResidualDenseBlock) if self.remat_rdb \
            else ResidualDenseBlock
        rdb = lambda name: cls(
            self.num_feat, self.num_grow_ch, self.dtype, rdb_impl=self.rdb_impl,
            name=name,
        )
        out = rdb("rdb1")(x)
        out = rdb("rdb2")(out)
        out = rdb("rdb3")(out)
        return out * jnp.asarray(0.2, out.dtype) + x


class _ScannedRRDB(nn.Module):
    """scan-compatible wrapper: (carry, _) -> (carry, None).

    remat modes (round-4 bwd-traffic experiment, BENCH_NOTES roofline):
      False        save everything XLA wants (baseline)
      True/'block' jax.checkpoint around the whole RRDB — bwd recomputes the
                   full block from its input (max recompute, min stash)
      'rdb'        checkpoint each ResidualDenseBlock — stash 3 [B,32,32,64]
                   inputs per block, recompute one RDB at a time
      'conv_outs'  checkpoint the block but SAVE the tagged conv outputs
                   (the MXU results) — bwd recomputes only the cheap
                   lrelu/concat/slice chains, never a convolution
    """

    num_feat: int
    num_grow_ch: int
    dtype: Any
    remat: Any
    rdb_impl: str = "xla"

    @nn.compact
    def __call__(self, x, _):
        mode = self.remat
        remat_rdb = False
        if mode in (True, "block"):
            block_cls = nn.remat(RRDB)
        elif mode == "conv_outs":
            block_cls = nn.remat(
                RRDB,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "rdb_conv"),
            )
        elif mode == "rdb":
            block_cls = RRDB
            remat_rdb = True
        elif mode in (False, None):
            block_cls = RRDB
        else:
            raise ValueError(
                f"remat must be False/True/'block'/'rdb'/'conv_outs', "
                f"got {mode!r}")
        x = block_cls(self.num_feat, self.num_grow_ch, self.dtype,
                      rdb_impl=self.rdb_impl, remat_rdb=remat_rdb,
                      name="block")(x)
        return x, None


@ARCH_REGISTRY.register("SSR_RRDBNet")
class RRDBNet(nn.Module):
    """ESRGAN generator over channel-stacked multi-frame input.

    Input:  [B, 32, 32, num_in_ch]   (num_in_ch = n_frames * 3 for TCI input)
    Output: [B, 32*scale, 32*scale, num_out_ch]
    """

    num_in_ch: int
    num_out_ch: int
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    dtype: Any = jnp.float32
    remat: Any = False  # False | True | "block" | "rdb" | "conv_outs"
    rdb_impl: str = "xla"
    #: scan unroll factor for the trunk. 1 = rolled loop (fast compile; per
    #: block weight dynamic-slices). num_block = fully unrolled (slower
    #: compile, amortised by the persistent cache; lets XLA fuse across block
    #: boundaries and constant-fold weight slices — inference throughput).
    trunk_unroll: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.scale == 2:
            feat_in = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            feat_in = pixel_unshuffle(x, 4)
        else:
            feat_in = x
        conv = lambda name, feats: nn.Conv(feats, (3, 3), padding=1, name=name, dtype=self.dtype)

        feat = conv("conv_first", self.num_feat)(feat_in)

        trunk = nn.scan(
            _ScannedRRDB,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_block,
            unroll=self.trunk_unroll,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )(self.num_feat, self.num_grow_ch, self.dtype, self.remat,
          rdb_impl=self.rdb_impl, name="body")
        body_feat, _ = trunk(feat, None)
        body_feat = conv("conv_body", self.num_feat)(body_feat)
        feat = feat + body_feat

        feat = lrelu(conv("conv_up1", self.num_feat)(upsample_nearest(feat, 2)))
        feat = lrelu(conv("conv_up2", self.num_feat)(upsample_nearest(feat, 2)))
        if self.scale in (8, 16):
            feat = lrelu(conv("conv_up3", self.num_feat)(upsample_nearest(feat, 2)))
            if self.scale == 16:
                feat = lrelu(conv("conv_up4", self.num_feat)(upsample_nearest(feat, 2)))

        out = conv("conv_last", self.num_out_ch)(lrelu(conv("conv_hr", self.num_feat)(feat)))
        return out
