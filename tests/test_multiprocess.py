"""Real multi-process (multi-host analog) training smoke test.

Launches TWO OS processes that initialize jax.distributed over localhost,
form a 4-device global mesh (2 virtual CPU devices per process), feed
disjoint per-process batch shards through the model's shard_batch path
(make_array_from_process_local_data), and run one full L2 train step with
compiler-inserted cross-process collectives. Both processes must report the
identical global loss — the TPU-native equivalent of the reference's
DDP/NCCL multi-node training (SURVEY.md §5.8).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid)
sys.path.insert(0, os.environ["SSR_REPO"])
import numpy as np
from satlas_sr_tpu.models import build_model
from satlas_sr_tpu.parallel.mesh import is_main_process

opt = {
    "name": "mp", "model_type": "L2Model", "scale": 4, "manual_seed": 0,
    "is_train": True, "datasets": {},
    "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                  "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                  "kernel_size": 3, "residual_layers": 1, "output_size": 128,
                  "zoom_factor": 4, "sr_kernel_size": 1},
    "path": {},
    "train": {"optim_g": {"type": "Adam", "lr": 1e-3, "betas": [0.9, 0.99]},
              "scheduler": {"type": "MultiStepLR", "milestones": [100], "gamma": 0.5},
              "total_iter": 1, "warmup_iter": -1},
    "logger": {"print_freq": 1, "save_checkpoint_freq": 100},
}
model = build_model(opt)
# per-process local shard: 2 samples each (global batch 4), DIFFERENT data
rng = np.random.RandomState(100 + pid)
batch = {
    "lr": (rng.rand(2, 2, 32, 32, 3) * 255).astype(np.uint8),
    "hr": (rng.rand(2, 128, 128, 3) * 255).astype(np.uint8),
}
logs = model.train_iter(batch, 1)
print(f"RESULT {pid} tot_loss={float(logs['tot_loss']):.8f} "
      f"main={is_main_process()} devices={jax.device_count()}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["SSR_REPO"] = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    results = {}
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        results[pid] = line
    # 4-device global mesh seen by both processes
    assert "devices=4" in results[0] and "devices=4" in results[1]
    # rank gating: exactly one main process
    assert "main=True" in results[0] and "main=False" in results[1]
    # the global loss (mean over BOTH shards via collectives) matches exactly
    loss0 = results[0].split("tot_loss=")[1].split()[0]
    loss1 = results[1].split("tot_loss=")[1].split()[0]
    assert loss0 == loss1, (loss0, loss1)
