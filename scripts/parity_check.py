"""Checkpoint-parity harness for released reference weights.

Usage:
  python scripts/parity_check.py <esrgan_checkpoint.pth> [n_frames] [param_key]

Given a released .pth (esrgan_{1,2,4,8,16}S2.pth — reference README.md:66-73),
this loads the weights into our RRDBNet AND into the independent torch
functional oracle (tests/torch_oracles.py), runs both on the same inputs, and
reports agreement: max abs diff and the PSNR between the two implementations'
uint8 outputs. Passing means the released checkpoint produces bit-comparable
SR imagery through this framework — the PSNR-parity precondition of
BASELINE.json's north star.

Runs on CPU (float64-exact conv semantics); add a data_dir of [T*32, 32, 3]
pngs as a 4th arg to check on real Sentinel-2 chips instead of random input.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir, "tests"))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    import torch

    from satlas_sr_tpu.archs import RRDBNet
    from satlas_sr_tpu.utils import torch_io
    from torch_oracles import rrdbnet_forward

    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    ckpt = sys.argv[1]
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    param_key = sys.argv[3] if len(sys.argv) > 3 else "params_ema"
    data_dir = sys.argv[4] if len(sys.argv) > 4 else None

    state = torch_io.load_torch_state_dict(ckpt, param_key)
    num_block = 1 + max(
        int(k.split(".")[1]) for k in state if k.startswith("body.")
    )
    num_in_ch = state["conv_first.weight"].shape[1]
    num_feat = state["conv_first.weight"].shape[0]
    num_grow_ch = state["body.0.rdb1.conv1.weight"].shape[0]
    print(f"checkpoint: {ckpt} key={param_key} blocks={num_block} "
          f"in_ch={num_in_ch} feat={num_feat} grow={num_grow_ch}")
    assert num_in_ch == n_frames * 3, (
        f"n_frames={n_frames} inconsistent with checkpoint in_ch={num_in_ch}"
    )

    variables = torch_io.rrdbnet_from_torch(state, num_block=num_block)
    model = RRDBNet(num_in_ch=num_in_ch, num_out_ch=3, scale=4,
                    num_feat=num_feat, num_block=num_block,
                    num_grow_ch=num_grow_ch)

    if data_dir:
        from satlas_sr_tpu.utils.infer_utils import format_s2naip_batch
        import glob

        pngs = sorted(glob.glob(os.path.join(data_dir, "**", "*.png"), recursive=True))[:8]
        inputs, _ = format_s2naip_batch(pngs, n_frames)
        x = inputs.astype(np.float32) / 255.0
    else:
        x = np.random.RandomState(0).rand(4, 32, 32, num_in_ch).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        y_jax = np.asarray(model.apply(variables, jnp.asarray(x)))

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}
    with torch.no_grad():
        y_torch = rrdbnet_forward(
            sd, torch.from_numpy(x.transpose(0, 3, 1, 2)), num_block, 4
        ).numpy().transpose(0, 2, 3, 1)

    diff = np.abs(y_jax - y_torch)
    a8 = (np.clip(y_jax, 0, 1) * 255).round()
    b8 = (np.clip(y_torch, 0, 1) * 255).round()
    mse = np.mean((a8 - b8) ** 2)
    psnr = float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)
    print(f"max abs diff (float): {diff.max():.3e}")
    print(f"uint8 output agreement PSNR: {psnr:.2f} dB "
          f"(inf = bit-identical after quantisation)")
    ok = diff.max() < 1e-4
    print("PARITY:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
