"""Round-2 inference sweep on the real chip: XLA-level variants.

Variants: trunk_unroll (1/4/23), batch (256/512), fused vs unfused RDB.
Plus a layout microbench: time to stream [B,32,32,C] elementwise chains for
C in {32,64,128} — if time is flat in C, XLA pads the minor dim to 128 lanes
and the RDB's 32/64-channel activations pay 4x/2x HBM waste.

Usage: python scripts/infer_sweep_r2.py [variant ...]
  variants: base u4 u23 b512 b512u23 unfused micro
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def timeit(fn, x, iters=12, trials=4, warmup=3):
    for _ in range(warmup):
        fn(x).block_until_ready()
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(x)
        y.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def build(batch=256, unroll=1, fused=True):
    import jax
    import jax.numpy as jnp

    import satlas_sr_tpu.archs.rrdbnet as R

    R.ResidualDenseBlock.__dataclass_fields__["fused"].default = fused
    model = R.RRDBNet(num_in_ch=24, num_out_ch=3, scale=4, num_feat=64,
                      num_block=23, num_grow_ch=32, dtype=jnp.bfloat16,
                      trunk_unroll=unroll)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 24)))
    variables = jax.device_put(jax.tree.map(lambda v: v.astype(jnp.bfloat16), variables))

    @jax.jit
    def fwd(x):
        y = model.apply(variables, x.astype(jnp.bfloat16) / 255.0)
        return (jnp.clip(y.astype(jnp.float32), 0, 1) * 255).astype(jnp.uint8)

    x = jax.device_put((np.random.RandomState(0).rand(batch, 32, 32, 24) * 255)
                       .astype(np.uint8))
    R.ResidualDenseBlock.__dataclass_fields__["fused"].default = True
    return fwd, x, batch


def run_variant(name):
    import jax
    import jax.numpy as jnp

    if name == "micro":
        # elementwise streaming time vs channel count (layout padding probe)
        for c in (32, 64, 128, 256):
            x = jax.device_put(np.random.rand(256, 32, 32, c).astype(np.float32))
            xb = x.astype(jnp.bfloat16)

            @jax.jit
            def chain(v):
                for _ in range(8):
                    v = v * jnp.asarray(1.0001, v.dtype) + jnp.asarray(0.0001, v.dtype)
                return v

            dt = timeit(chain, xb, iters=30, trials=4)
            gb = 256 * 32 * 32 * c * 2 * 2 * 8 / 1e9  # r+w per link, 8 links
            print(f"micro C={c:4d}: {dt * 1e6:8.1f} us  eff-BW {gb / dt:7.1f} GB/s",
                  flush=True)
        return

    cfg = {
        "base": dict(batch=256, unroll=1),
        "u4": dict(batch=256, unroll=4),
        "u23": dict(batch=256, unroll=23),
        "b512": dict(batch=512, unroll=1),
        "b512u23": dict(batch=512, unroll=23),
        "unfused": dict(batch=256, unroll=1, fused=False),
    }[name]
    fwd, x, batch = build(**cfg)
    t0 = time.perf_counter()
    dt = timeit(fwd, x)
    print(f"{name:8s} {cfg}: {batch / dt:8.1f} img/s  ({dt * 1e3:.1f} ms/iter, "
          f"first-run total {time.perf_counter() - t0:.0f}s)", flush=True)


def main():
    from satlas_sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print("devices:", jax.devices(), flush=True)
    variants = sys.argv[1:] or ["micro", "base", "u4", "u23", "b512"]
    for v in variants:
        run_variant(v)


if __name__ == "__main__":
    main()
