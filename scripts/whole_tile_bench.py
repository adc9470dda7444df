"""Whole-tile inference perf on the real chip.

Runs the flagship esrgan_8S2-shaped generator over WHOLE [B, 512, 512, 24]
tiles (one 2048x2048 seamless SR output each) and reports throughput in
chunk-equivalents/s — 1 tile = 256 of the 32x32 chunks the chunked path
(bench.py headline) feeds, so the number is directly comparable to its img/s.

Usage: python scripts/whole_tile_bench.py [batches=1,2] [iters=4]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main():
    import jax
    import jax.numpy as jnp

    from satlas_sr_tpu.archs.rrdbnet import RRDBNet
    from satlas_sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    batches = [int(b) for b in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["1", "2"])]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    model = RRDBNet(num_in_ch=24, num_out_ch=3, scale=4, num_feat=64,
                    num_block=23, num_grow_ch=32, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 24)))
    variables = jax.device_put(jax.tree.map(
        lambda v: v.astype(jnp.bfloat16) if jnp.issubdtype(v.dtype, jnp.floating) else v,
        variables))

    @jax.jit
    def fwd(x):
        y = model.apply(variables, x.astype(jnp.bfloat16) / 255.0)
        return (jnp.clip(y.astype(jnp.float32), 0, 1) * 255).astype(jnp.uint8)

    for batch in batches:
        x = (np.random.RandomState(0).rand(batch, 512, 512, 24) * 255).astype(np.uint8)
        t0 = time.perf_counter()
        fwd(x).block_until_ready()
        print(f"batch={batch}: first call {time.perf_counter() - t0:.1f}s", flush=True)
        best = 0.0
        for _trial in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = fwd(x)
            y.block_until_ready()
            dt = time.perf_counter() - t0
            best = max(best, batch * iters / dt)
        print(f"whole-tile batch={batch}: {best:6.2f} tiles(2048)/s = "
              f"{best * 256:8.1f} chunk-equiv/s (best of 3)", flush=True)


if __name__ == "__main__":
    main()
