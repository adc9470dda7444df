"""Perf sweep on the real chip: RDB forward variants x batch sizes.

Usage: python scripts/perf_sweep.py [fused,unfused] [128,256]
"""

import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main():
    import jax
    import jax.numpy as jnp

    from satlas_sr_tpu.archs.rrdbnet import RRDBNet

    fused_opts = (sys.argv[1].split(",") if len(sys.argv) > 1 else ["fused", "unfused"])
    batches = [int(b) for b in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["128", "256"])]

    for fused_name in fused_opts:
        fused = fused_name == "fused"
        # monkeypatch default through a wrapper module wiring
        import satlas_sr_tpu.archs.rrdbnet as R

        orig = R.ResidualDenseBlock.__dataclass_fields__["fused"].default
        R.ResidualDenseBlock.__dataclass_fields__["fused"].default = fused

        model = RRDBNet(num_in_ch=24, num_out_ch=3, scale=4, num_feat=64,
                        num_block=23, num_grow_ch=32, dtype=jnp.bfloat16)
        variables = jax.device_put(model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 24))))

        @jax.jit
        def fwd(x):
            y = model.apply(variables, x.astype(jnp.bfloat16) / 255.0)
            return (jnp.clip(y.astype(jnp.float32), 0, 1) * 255).astype(jnp.uint8)

        for batch in batches:
            x = (np.random.RandomState(0).rand(batch, 32, 32, 24) * 255).astype(np.uint8)
            for _ in range(3):
                fwd(x).block_until_ready()
            best = 0.0
            iters = 12
            for _trial in range(4):
                t0 = time.perf_counter()
                for _ in range(iters):
                    y = fwd(x)
                y.block_until_ready()
                dt = time.perf_counter() - t0
                best = max(best, batch * iters / dt)
            print(f"{fused_name:8s} batch={batch:4d}: {best:9.1f} img/s (best of 4)",
                  flush=True)
        R.ResidualDenseBlock.__dataclass_fields__["fused"].default = orig


if __name__ == "__main__":
    main()
