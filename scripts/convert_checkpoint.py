"""Convert checkpoints between the native msgpack and reference .pth formats.

Usage:
  python scripts/convert_checkpoint.py to_pth   <in.msgpack> <out.pth> <arch_type>
  python scripts/convert_checkpoint.py from_pth <in.pth> <out.msgpack> <arch_type> [param_key] [num_block]

arch_type: SSR_RRDBNet | SSR_UNetDiscriminatorSN | SRCNN | HighResNet | OSMObjDiscriminator
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main():
    if len(sys.argv) < 5:
        print(__doc__)
        sys.exit(1)
    mode, src, dst, arch = sys.argv[1:5]

    from satlas_sr_tpu.utils import torch_io
    from satlas_sr_tpu.utils.checkpoint import load_pytree, save_pytree

    if arch not in torch_io._FROM_TORCH:
        print(f"unknown arch_type {arch!r}; supported: "
              f"{' | '.join(sorted(torch_io._FROM_TORCH))}")
        sys.exit(1)

    if mode == "to_pth":
        variables = load_pytree(src)

        def fn(v):
            # raises a KeyError naming the supported archs on an unknown type
            return torch_io.export_torch_state(arch, v)

        out = {}
        for key in ("params", "params_ema"):
            if key in variables:
                sub = {"params": variables[key]}
                if "spectral" in variables:
                    sub["spectral"] = variables["spectral"]
                out[key] = fn(sub)
        if not out:  # bare variables dict
            out["params"] = fn(variables)
        import numpy as np
        import torch

        torch.save(
            {k: {n: torch.from_numpy(np.ascontiguousarray(v)) for n, v in t.items()}
             for k, t in out.items()},
            dst,
        )
        print(f"wrote {dst} with keys {sorted(out)}")
    elif mode == "from_pth":
        param_key = sys.argv[5] if len(sys.argv) > 5 else "params_ema"
        arch_opt = {}
        if len(sys.argv) > 6:
            arch_opt["num_block"] = int(sys.argv[6])
        variables = torch_io.import_torch_checkpoint(arch, src, arch_opt, param_key)
        save_pytree(dst, variables)
        print(f"wrote {dst}")
    else:
        print(__doc__)
        sys.exit(1)


if __name__ == "__main__":
    main()
