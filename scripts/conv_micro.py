"""Microbenchmark individual conv shapes from the RRDBNet forward."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main():
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    shapes = [
        # (H, Cin, Cout) from the trunk and tail
        (32, 64, 32), (32, 96, 32), (32, 128, 32), (32, 160, 32), (32, 192, 64),
        (32, 64, 192), (32, 32, 160),   # fused variants
        (64, 64, 64), (128, 64, 64), (128, 64, 3),
    ]
    rng = np.random.RandomState(0)
    for h, cin, cout in shapes:
        x = jnp.asarray(rng.rand(B, h, h, cin).astype(np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.rand(3, 3, cin, cout).astype(np.float32), jnp.bfloat16)

        @jax.jit
        def f(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        f(x, w).block_until_ready()
        best = 0.0
        iters = 30
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = f(x, w)
            y.block_until_ready()
            dt = time.perf_counter() - t0
            best = max(best, iters / dt)
        flops = 2 * B * h * h * 9 * cin * cout
        tf = flops * best / 1e12
        print(f"H={h:3d} {cin:3d}->{cout:3d}: {best:8.1f} conv/s  {tf:7.1f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
