"""Measure halo-chunked inference throughput vs the chunked baseline.

VERDICT r2 next #8 'done' criterion: seam-free halo mode must land within
~15% of chunked tiles/s. Production shapes: esrgan_8S2 RRDBNet (24 in-ch,
64 feat, 23 blocks), 512x512-LR tiles (16x16 grid of 32x32 chunks), scale 4.

- chunked: batches of 256 32x32 chunks (the bench.py headline path)
- halo:    4 pieces of (256+8)=264 per tile (corner pieces — a 2x2 split has
           no interior pieces), cropped to 256-interiors
Analytic overhead: 4*264^2 / 512^2 = 1.063x input pixels.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main():
    from satlas_sr_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from satlas_sr_tpu.inference import InferenceEngine
    from satlas_sr_tpu.utils.model_utils import build_network
    from satlas_sr_tpu.infer import load_infer_variables

    n_tiles = 8

    opt = {
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 24, "num_out_ch": 3,
                      "scale": 4, "num_feat": 64, "num_block": 23,
                      "num_grow_ch": 32},
        "scale": 4, "path": {}, "n_lr_images": 8, "compute_dtype": "bfloat16",
    }
    model = build_network(opt)
    variables = load_infer_variables(opt, model, 8, use_3d=False)
    rng = np.random.RandomState(0)
    canvases = [rng.randint(0, 256, (512, 512, 24)).astype(np.uint8)
                for _ in range(n_tiles)]

    reps = int(os.environ.get("HALO_BENCH_REPS", "6"))

    def device_time(engine, batches):
        """Steady-state DEVICE time for one pass over `batches` (inputs made
        device-resident first, best-of-reps): the host/tunnel transfer side is
        identical infrastructure for both modes, and the hosted tunnel's
        bandwidth varies run-to-run, so the 15%-of-chunked criterion is judged
        on device compute like bench.py's headline."""
        devs = [engine._put(b) for b in batches]
        for d in devs:
            engine._run(engine.variables, d).block_until_ready()  # compile
        # the tunnel pipelines dispatches deeply and lies on short loops
        # (BENCH_NOTES measurement caveat) — keep >=10 s of device work per
        # trial, bench.py-style: same resident inputs, block the last output
        inner = max(1, int(10.0 / (0.09 * len(batches))))
        import jax.numpy as jnp

        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            y = None
            for _ in range(inner):
                for d in devs:
                    y = engine._run(engine.variables, d)
            # block_until_ready proved unreliable through the tunnel for this
            # call pattern (returned in ms for ~10 s of device work); fetching
            # a device-computed scalar cannot lie, and the single device
            # stream executes in order so the last output completing implies
            # all of them did
            float(jnp.max(y.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / inner)
        return best

    # -- chunked baseline: 256 chunks/tile at batch 256
    eng_c = InferenceEngine(model, variables, batch_size=256,
                            matmul_precision="default", use_mesh=False)
    chunks = [c.reshape(16, 32, 16, 32, 24).transpose(0, 2, 1, 3, 4)
              .reshape(256, 32, 32, 24) for c in canvases]
    dt = device_time(eng_c, chunks)
    chunked_tps = n_tiles / dt
    print(f"chunked: {chunked_tps:.3f} 2048-tiles/s "
          f"({chunked_tps * 256:.0f} chunk-img/s)", flush=True)

    # production halo mode: sliding 32x32 windows, stride 32-2*halo —
    # the SAME shape as chunked, so the per-pixel rate holds; overhead is
    # only the window-count ratio ((32/(32-2h))^2 = 1.78x at h=4)
    from satlas_sr_tpu.infer_grid import _window_starts

    for h in (6, 4):
        starts = _window_starts(512, 32, 32 - 2 * h)
        wins = []
        for c in canvases:
            for si in starts:
                for sj in starts:
                    wins.append(c[si:si + 32, sj:sj + 32])
        eng_w = InferenceEngine(model, variables, batch_size=256,
                                matmul_precision="default", use_mesh=False)
        batches = [np.stack(wins[k:k + 256]) for k in range(0, len(wins), 256)]
        dt = device_time(eng_w, batches)
        tps = n_tiles / dt
        print(f"halo sliding-32 h={h} ({len(starts) ** 2} win/tile): "
              f"{tps:.3f} 2048-tiles/s = {100 * tps / chunked_tps:.1f}% of chunked",
              flush=True)


if __name__ == "__main__":
    main()
