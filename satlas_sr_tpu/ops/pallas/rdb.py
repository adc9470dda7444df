"""Pallas TPU kernel: fused Residual Dense Block.

The RRDBNet trunk (23 x 3 RDBs — the hot path, SURVEY.md §3.5) is, under
plain XLA, a chain where every conv input/output round-trips HBM; profiling
shows ~half the step time in HBM-bound elementwise/data-movement fusions
between convs. This kernel runs an ENTIRE RDB for a tile of images inside
VMEM:

- 3x3 convs become 9 shifted matmuls on (T*32*32, Cin) x (Cin, Cout) blocks —
  MXU-shaped, f32 accumulation;
- the dense-concat structure uses the partial-product form (contributions of
  each ready tensor to all later convs batched into one matmul, N = 64..192
  instead of 32);
- LeakyReLUs and the 0.2-scaled residual never leave VMEM.

HBM traffic per tile: read x once, read the (restructured) weights, write the
output — versus ~12 intermediate round-trips in the unfused graph.

Inference-path kernel (no custom VJP yet); training keeps the XLA graph.

STATUS (measured on v5e-1): correct (parity test vs the conv graph), but
currently SLOWER than the XLA lowering — Mosaic keeps the nine shifted patch
views plus f32 accumulators live, capping the image tile at 2 (VMEM OOM at 4+)
which starves the MXU (M=2048 rows/matmul). The XLA path (rdb_impl='xla',
default) runs the flagship at ~2900 img/s; this kernel at ~3x less. Kept as an
off-by-default option.

Variants tried and their failure modes (for the next iteration):
- width-shift channel concat (3 matmuls, K=3*Cin): Mosaic cannot concatenate
  sublane-offset views along the lane dim ("tpu.concatenate" layout error);
- explicit VMEM scratch refs for the partials (tile 4/8): still stack-OOMs —
  the per-(dy,dx) patch reshapes are materialised as SSA values regardless;
- fori_loop over taps with pl.ds dynamic offsets: Mosaic cannot statically
  prove the slice bound (dy = k//3 in [0,3)) -> compile error.
- lax.switch over 9 static-slice branches inside fori_loop: still stack-OOMs
  even at tile 2 — Mosaic's allocator reserves all branch bodies.
- TRANSPOSED layout (C, H+2, T*W): dy taps become cheap sublane-offset views;
  dx handled by 3 pltpu.roll lane-rotated buffers (roll must run in f32 —
  "Rotate with non-32-bit data"); K-packing the 3 dx variants along C gives
  one K=3*Cin matmul per dy. Best measured: 478 rdb-calls/s at batch 256
  (T=4 + scratch partial refs; SSA partials 436; T=8 still VMEM-OOM) vs the
  XLA conv graph's ~862 equivalent. Closed 2x of the gap but XLA's conv
  emitter still wins — its tap handling beats the 3-matmul decomposition.
Also measured: int8 convs on these shapes give <=15% over bf16 (not
MXU-peak-bound), so quantisation is not the lever either.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_vmem(h, w, t, hw, f32=jnp.float32):
    """3x3 same-conv of (T, H, W, Cin) against (3, 3, Cin, Cout), in-registers.

    Zero-pads spatially via concat, then accumulates 9 shifted matmuls.
    (A width-shift channel-concat variant — 3 matmuls with K=3*Cin — was
    tried, but Mosaic cannot concatenate sublane-offset views along the lane
    dim; kept the 9-matmul form which compiles.)
    """
    cin = h.shape[-1]
    cout = w.shape[-1]
    zrow = jnp.zeros((t, 1, hw, cin), h.dtype)
    hp = jnp.concatenate([zrow, h, zrow], axis=1)
    zcol = jnp.zeros((t, hw + 2, 1, cin), h.dtype)
    hp = jnp.concatenate([zcol, hp, zcol], axis=2)
    acc = jnp.zeros((t * hw * hw, cout), f32)
    for dy in range(3):
        for dx in range(3):
            patch = hp[:, dy : dy + hw, dx : dx + hw, :].reshape(t * hw * hw, cin)
            acc = acc + jnp.dot(patch, w[dy, dx], preferred_element_type=f32)
    return acc.reshape(t, hw, hw, cout)


def _rdb_kernel(x_ref, w0_ref, w1_ref, w2_ref, w3_ref, w4_ref, b_ref, out_ref,
                *, t: int, hw: int, nf: int, g: int):
    x = x_ref[...]
    dtype = x.dtype

    def lrelu(v):
        # max(v, 0.2v) == leaky_relu(v, 0.2); avoids bf16 vector compares,
        # which the Mosaic target does not support.
        return jnp.maximum(v, jnp.asarray(0.2, v.dtype) * v)

    def take(p, j, i):
        off = (i - j) * g
        size = g if i < 4 else nf
        return jax.lax.slice_in_dim(p, off, off + size, axis=-1)

    # partial 0: x's contributions to all five convs (+ all biases, once)
    p0 = _conv3x3_vmem(x, w0_ref[...], t, hw) + b_ref[...].astype(jnp.float32)
    p0 = p0.astype(dtype)
    x1 = lrelu(take(p0, 0, 0))
    p1 = _conv3x3_vmem(x1, w1_ref[...], t, hw).astype(dtype)
    x2 = lrelu(take(p0, 0, 1) + take(p1, 1, 1))
    p2 = _conv3x3_vmem(x2, w2_ref[...], t, hw).astype(dtype)
    x3 = lrelu(take(p0, 0, 2) + take(p1, 1, 2) + take(p2, 2, 2))
    p3 = _conv3x3_vmem(x3, w3_ref[...], t, hw).astype(dtype)
    x4 = lrelu(take(p0, 0, 3) + take(p1, 1, 3) + take(p2, 2, 3) + take(p3, 3, 3))
    p4 = _conv3x3_vmem(x4, w4_ref[...], t, hw).astype(dtype)
    x5 = take(p0, 0, 4) + take(p1, 1, 4) + take(p2, 2, 4) + take(p3, 3, 4) + p4
    out_ref[...] = x5 * jnp.asarray(0.2, dtype) + x


def restructure_weights(kernels: Sequence[jax.Array], biases: Sequence[jax.Array],
                        nf: int, g: int):
    """Per-conv kernels (3,3,cin_i,cout_i) -> partial-product weight tensors."""

    def w_slice(i, j):
        k = kernels[i]
        lo = nf + (j - 1) * g if j >= 1 else 0
        hi = nf if j == 0 else lo + g
        return k[:, :, lo:hi, :]

    ws = [
        jnp.concatenate([w_slice(i, j) for i in range(j, 5)], axis=-1)
        for j in range(5)
    ]
    b = jnp.concatenate(biases, axis=-1)
    return ws, b


def rdb_pallas(x: jax.Array, kernels: Sequence[jax.Array],
               biases: Sequence[jax.Array], nf: int, g: int,
               tile: int = 8, interpret: bool = False) -> jax.Array:
    """Apply a fused RDB: x [B, H, W, nf] -> [B, H, W, nf].

    B must be divisible by `tile` (callers pad); H == W (32 in production).
    """
    b, h, w, c = x.shape
    assert h == w and c == nf, (x.shape, nf)
    assert b % tile == 0, f"batch {b} not divisible by tile {tile}"
    ws, bias = restructure_weights(kernels, biases, nf, g)
    ws = [wt.astype(x.dtype) for wt in ws]
    bias = bias.astype(jnp.float32)

    kernel = functools.partial(_rdb_kernel, t=tile, hw=h, nf=nf, g=g)
    grid = (b // tile,)
    x_spec = pl.BlockSpec((tile, h, w, nf), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec(wt.shape, lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM)
        for wt in ws
    ]
    b_spec = pl.BlockSpec(bias.shape, lambda i: (0,), memory_space=pltpu.VMEM)
    flops = 2 * b * h * w * 9 * (nf * (4 * g + nf) + g * (3 * g + nf)
                                 + g * (2 * g + nf) + g * (g + nf) + g * nf)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec, *w_specs, b_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=x.size * 4,
                                      transcendentals=0),
        interpret=interpret,
    )(x, *ws, bias)
