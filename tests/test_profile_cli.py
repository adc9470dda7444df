"""Profile CLI: trace capture + summary on tiny synthetic programs.

CPU traces carry no 'XLA Ops' device thread (host TraceMe events only), so
on this suite the CLI exercises capture + the graceful no-device-timeline
fallback; the TPU summary path shares its parse logic with
scripts/train_phase_profile.py, which produced the BENCH_NOTES roofline.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from satlas_sr_tpu.archs import RRDBNet
from satlas_sr_tpu.utils import torch_io


def _tiny_infer_cfg(tmp_path):
    model = RRDBNet(num_in_ch=6, num_out_ch=3, num_feat=8, num_block=1,
                    num_grow_ch=4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 6)))
    wpath = str(tmp_path / "w.pth")
    torch_io.save_torch_state_dict(wpath, torch_io.rrdbnet_to_torch(v),
                                   "params_ema")
    cfg = {
        "data_dir": str(tmp_path), "save_path": str(tmp_path / "o"),
        "n_lr_images": 2, "scale": 4, "batch_size": 2,
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 6, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
        "path": {"pretrain_network_g": wpath, "param_key_g": "params_ema"},
    }
    p = tmp_path / "infer.yml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_profile_infer_mode(tmp_path, capsys):
    from satlas_sr_tpu.profile import main

    out = str(tmp_path / "trace")
    rc = main(["-opt", _tiny_infer_cfg(tmp_path), "--steps", "2",
               "--out", out])
    assert rc == 0
    traces = glob.glob(os.path.join(out, "**", "*.trace.json.gz"),
                       recursive=True)
    assert traces, "no trace captured"
    text = capsys.readouterr().out
    assert "compiled infer program" in text
    # CPU: graceful fallback; TPU: the per-op table
    assert ("XProf/TensorBoard" in text) or ("ms/step device time" in text)


def test_profile_train_mode(tmp_path, capsys):
    from satlas_sr_tpu.profile import main

    cfg = {
        "name": "prof", "model_type": "L2Model", "scale": 4, "num_gpu": 1,
        "manual_seed": 0, "is_train": True, "rank": 0, "world_size": 1,
        "datasets": {"train": {"n_s2_images": 2, "use_3d": True,
                               "batch_size_per_gpu": 2}},
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1,
                      "output_size": 128, "zoom_factor": 4,
                      "sr_kernel_size": 1},
        "path": {}, "val": None, "logger": {},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-4},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100],
                                "gamma": 0.5},
                  "total_iter": 2, "warmup_iter": -1},
    }
    p = tmp_path / "train.yml"
    p.write_text(yaml.safe_dump(cfg))
    out = str(tmp_path / "trace")
    rc = main(["-opt", str(p), "--steps", "2", "--out", out])
    assert rc == 0
    assert glob.glob(os.path.join(out, "**", "*.trace.json.gz"),
                     recursive=True)
    assert "compiled train step" in capsys.readouterr().out
