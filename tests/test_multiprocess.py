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


_VAL_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]; data_root = sys.argv[4]
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
from satlas_sr_tpu.data import SequentialEvalLoader, build_dataset

opt = {
    "name": "mpval", "model_type": "L2Model", "scale": 4, "manual_seed": 0,
    "is_train": True, "datasets": {},
    "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                  "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                  "kernel_size": 3, "residual_layers": 1, "output_size": 128,
                  "zoom_factor": 4, "sr_kernel_size": 1},
    "path": {},
    "train": {"optim_g": {"type": "Adam", "lr": 1e-3, "betas": [0.9, 0.99]},
              "scheduler": {"type": "MultiStepLR", "milestones": [100], "gamma": 0.5},
              "total_iter": 1, "warmup_iter": -1},
    "val": {"metrics": {"psnr": {"type": "calculate_psnr", "crop_border": 4,
                                 "test_y_channel": False}}},
    "logger": {"print_freq": 1, "save_checkpoint_freq": 100},
}
model = build_model(opt)
ds = build_dataset({"name": "val", "type": "S2NAIPDataset", "phase": "test",
                    "scale": 4, "sentinel2_path": data_root + "/sentinel2",
                    "naip_path": data_root + "/naip", "n_s2_images": 2,
                    "use_shuffle": False, "use_3d": True})
loader = SequentialEvalLoader(ds, batch_size=1, rank=pid, world=nprocs)

# count this rank's real (non-padding) samples to prove disjoint sharding
local = sum(int(b["valid"].sum()) for b in loader)
res = model.validation(loader, current_iter=1, save_img=False, dataset_name="val")
print(f"RESULT {pid} local={local} psnr={res['psnr']:.6f}", flush=True)
"""


def _make_val_tree(root, n=5):
    import numpy as np

    from satlas_sr_tpu.utils.imgio import write_png

    rng = np.random.RandomState(7)
    for c in range(n):
        chip = f"{500 + c}_{600 + c}"
        write_png(str(root / "naip" / chip / f"{chip}.png"),
                  (rng.rand(128, 128, 3) * 254 + 1).astype(np.uint8))
        write_png(str(root / "sentinel2" / chip / "tci.png"),
                  (rng.rand(2 * 32, 32, 3) * 254 + 1).astype(np.uint8))


def test_two_process_sharded_validation(tmp_path):
    """Process-sharded validation: ranks do disjoint work, metric averages are
    reduced across processes, and match a single-process run (VERDICT r1 #4)."""
    _make_val_tree(tmp_path, n=5)

    # single-process expected value (8-device CPU mesh from conftest)
    from satlas_sr_tpu.data import SequentialEvalLoader, build_dataset
    from satlas_sr_tpu.models import build_model

    opt = {
        "name": "spval", "model_type": "L2Model", "scale": 4, "manual_seed": 0,
        "is_train": True, "datasets": {},
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1, "output_size": 128,
                      "zoom_factor": 4, "sr_kernel_size": 1},
        "path": {},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-3, "betas": [0.9, 0.99]},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100], "gamma": 0.5},
                  "total_iter": 1, "warmup_iter": -1},
        "val": {"metrics": {"psnr": {"type": "calculate_psnr", "crop_border": 4,
                                     "test_y_channel": False}}},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 100},
    }
    model = build_model(opt)
    ds = build_dataset({"name": "val", "type": "S2NAIPDataset", "phase": "test",
                        "scale": 4, "sentinel2_path": str(tmp_path / "sentinel2"),
                        "naip_path": str(tmp_path / "naip"), "n_s2_images": 2,
                        "use_shuffle": False, "use_3d": True})
    expected = model.validation(SequentialEvalLoader(ds, batch_size=1),
                                current_iter=1, save_img=False, dataset_name="val")["psnr"]

    port = _free_port()
    worker = tmp_path / "val_worker.py"
    worker.write_text(_VAL_WORKER)
    env = dict(os.environ)
    env["SSR_REPO"] = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    results = {}
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        results[pid] = [l for l in out.splitlines() if l.startswith("RESULT")][0]
    # disjoint shards covering all 5 samples: 3 + 2
    locals_ = sorted(int(r.split("local=")[1].split()[0]) for r in results.values())
    assert locals_ == [2, 3], results
    # both ranks report the same reduced average, equal to single-process
    psnrs = [float(r.split("psnr=")[1]) for r in results.values()]
    assert abs(psnrs[0] - psnrs[1]) < 1e-9, results
    assert abs(psnrs[0] - expected) < 1e-3, (psnrs, expected)


_FLAKY_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]; data_root = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid)
sys.path.insert(0, os.environ["SSR_REPO"])
import numpy as np
from satlas_sr_tpu.registry import METRIC_REGISTRY
from satlas_sr_tpu.models import build_model
from satlas_sr_tpu.data import SequentialEvalLoader, build_dataset

@METRIC_REGISTRY.register("calculate_flaky")
def calculate_flaky(img, img2, **kwargs):
    # simulates a metric tower whose weights are missing on ONE host only
    if pid == 1:
        raise RuntimeError("tower weights unavailable on this host")
    return float(np.mean(np.abs(img.astype(np.float64) - img2.astype(np.float64))))

opt = {
    "name": "mpflaky", "model_type": "L2Model", "scale": 4, "manual_seed": 0,
    "is_train": True, "datasets": {},
    "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                  "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                  "kernel_size": 3, "residual_layers": 1, "output_size": 128,
                  "zoom_factor": 4, "sr_kernel_size": 1},
    "path": {},
    "train": {"optim_g": {"type": "Adam", "lr": 1e-3, "betas": [0.9, 0.99]},
              "scheduler": {"type": "MultiStepLR", "milestones": [100], "gamma": 0.5},
              "total_iter": 1, "warmup_iter": -1},
    "val": {"metrics": {"psnr": {"type": "calculate_psnr", "crop_border": 4,
                                 "test_y_channel": False},
                        "flaky": {"type": "calculate_flaky"}}},
    "logger": {"print_freq": 1, "save_checkpoint_freq": 100},
}
model = build_model(opt)
ds = build_dataset({"name": "val", "type": "S2NAIPDataset", "phase": "test",
                    "scale": 4, "sentinel2_path": data_root + "/sentinel2",
                    "naip_path": data_root + "/naip", "n_s2_images": 2,
                    "use_shuffle": False, "use_3d": True})
loader = SequentialEvalLoader(ds, batch_size=1, rank=pid, world=nprocs)
res = model.validation(loader, current_iter=1, save_img=False, dataset_name="val")
print(f"RESULT {pid} psnr={res['psnr']:.6f} flaky={res['flaky']:.6f}", flush=True)
"""


def test_two_process_validation_with_rank_local_metric_failure(tmp_path):
    """A metric that raises on one rank's ENTIRE shard must not misalign the
    cross-process reduce (VERDICT r2 weak #4): the run completes, both ranks
    report identical averages, psnr is unaffected, and the flaky metric's
    average covers exactly the healthy rank's shard."""
    _make_val_tree(tmp_path, n=5)

    port = _free_port()
    worker = tmp_path / "flaky_worker.py"
    worker.write_text(_FLAKY_WORKER)
    env = dict(os.environ)
    env["SSR_REPO"] = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    results = {}
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        results[pid] = [l for l in out.splitlines() if l.startswith("RESULT")][0]
    psnrs = [float(r.split("psnr=")[1].split()[0]) for r in results.values()]
    flakys = [float(r.split("flaky=")[1]) for r in results.values()]
    # both ranks agree on BOTH metrics (no vector misalignment)
    assert abs(psnrs[0] - psnrs[1]) < 1e-9, results
    assert abs(flakys[0] - flakys[1]) < 1e-9, results
    # flaky is a real per-pixel MAE from rank 0's healthy shard — nonzero,
    # not a failure-diluted average over the global count
    assert flakys[0] > 1.0, results


_SPATIAL_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]; spatial = int(sys.argv[4])
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

opt = {
    "name": "mpsp", "model_type": "L2Model", "scale": 4, "manual_seed": 0,
    "is_train": True, "datasets": {}, "spatial_shards": spatial,
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
rng = np.random.RandomState(100 + pid)
batch = {
    "lr": (rng.rand(2, 2, 32, 32, 3) * 255).astype(np.uint8),
    "hr": (rng.rand(2, 128, 128, 3) * 255).astype(np.uint8),
}
try:
    logs = model.train_iter(batch, 1)
except ValueError as e:
    assert "spatial sharding" in str(e), e
    print(f"RESULT {pid} REFUSED", flush=True)
else:
    print(f"RESULT {pid} tot_loss={float(logs['tot_loss']):.8f}", flush=True)
"""


def _launch_spatial(tmp_path, spatial):
    port = _free_port()
    worker = tmp_path / f"sp_worker_{spatial}.py"
    worker.write_text(_SPATIAL_WORKER)
    env = dict(os.environ)
    env["SSR_REPO"] = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), str(spatial)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    results = {}
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        results[pid] = [l for l in out.splitlines() if l.startswith("RESULT")][0]
    return results


def test_two_process_spatial_training(tmp_path):
    """Multi-host spatial sharding (VERDICT r2 next #7): with 'space' groups
    inside each host (spatial_shards=2, 2 local devices) the dp x sp train
    step runs and both ranks report the identical global loss, equal to a
    single-process run over the same global batch. With spatial_shards=4 the
    'space' groups would span hosts — refused loudly, never silently
    degraded."""
    results = _launch_spatial(tmp_path, spatial=2)
    losses = [r.split("tot_loss=")[1] for r in results.values()]
    assert losses[0] == losses[1], results

    # single-process expected value over the SAME global batch (conftest's
    # 8-device CPU mesh; mesh_2d(2) -> dp=4 x sp=2)
    import numpy as np

    from satlas_sr_tpu.models import build_model

    opt = {
        "name": "mpsp_ref", "model_type": "L2Model", "scale": 4,
        "manual_seed": 0, "is_train": True, "rank": 0, "world_size": 1,
        "seed_with_rank": 0, "datasets": {}, "spatial_shards": 2,
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1, "output_size": 128,
                      "zoom_factor": 4, "sr_kernel_size": 1},
        "path": {},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-3, "betas": [0.9, 0.99]},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100],
                                "gamma": 0.5},
                  "total_iter": 1, "warmup_iter": -1},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 100},
    }
    model = build_model(opt)
    parts = [np.random.RandomState(100 + pid) for pid in range(2)]
    batch = {
        "lr": np.concatenate([(r.rand(2, 2, 32, 32, 3) * 255).astype(np.uint8)
                              for r in parts]),
        "hr": np.concatenate([(r.rand(2, 128, 128, 3) * 255).astype(np.uint8)
                              for r in parts]),
    }
    # NOTE: each worker draws lr THEN hr from its own seed — replicate that
    expected = float(model.train_iter(
        {"lr": batch["lr"], "hr": batch["hr"]}, 1)["tot_loss"])
    assert abs(float(losses[0]) - expected) < 1e-5, (losses, expected)


def test_two_process_spatial_spanning_hosts_refused(tmp_path):
    results = _launch_spatial(tmp_path, spatial=4)
    assert all("REFUSED" in r for r in results.values()), results


_INFER_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]; work = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid)
sys.path.insert(0, os.environ["SSR_REPO"])
import yaml
from satlas_sr_tpu.infer import run_inference

opt = yaml.safe_load(open(os.path.join(work, "infer_opt.yml")))
opt["save_path"] = os.path.join(work, "out_2proc")
n = run_inference(opt, save_lr=False, rank=pid, world=nprocs)
print(f"RESULT {pid} wrote={n}", flush=True)
"""


def test_two_process_distributed_inference_bit_identical(tmp_path):
    """REAL 2-process distributed inference (ADVICE r2 medium): each rank
    builds a process-LOCAL engine mesh, runs its contiguous corpus shard
    independently (different batch counts allowed), and the union of outputs
    is bit-identical to a single-process run."""
    import numpy as np
    import yaml

    from satlas_sr_tpu.infer import run_inference
    from satlas_sr_tpu.utils.imgio import read_png, write_png

    rng = np.random.RandomState(3)
    for c in range(5):
        chip = f"{400 + c}_{500 + c}"
        write_png(str(tmp_path / "s2" / chip / "tci.png"),
                  (rng.rand(64, 32, 3) * 254 + 1).astype(np.uint8))
    opt = {
        "name": "mpinfer", "scale": 4, "manual_seed": 0,
        "data_dir": str(tmp_path / "s2"), "n_lr_images": 2, "batch_size": 2,
        "save_path": str(tmp_path / "out_1proc"),
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1, "output_size": 128,
                      "zoom_factor": 4, "sr_kernel_size": 1},
        "path": {},
    }
    with open(tmp_path / "infer_opt.yml", "w") as f:
        yaml.safe_dump(opt, f)

    n1 = run_inference(dict(opt), save_lr=False)
    assert n1 == 5

    port = _free_port()
    worker = tmp_path / "infer_worker.py"
    worker.write_text(_INFER_WORKER)
    env = dict(os.environ)
    env["SSR_REPO"] = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    wrote = {}
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        wrote[pid] = int(line.split("wrote=")[1])
    assert sorted(wrote.values()) == [2, 3], wrote  # contiguous 3 + 2 split

    for i in range(5):
        a = read_png(str(tmp_path / "out_1proc" / str(i) / "sr.png"))
        b = read_png(str(tmp_path / "out_2proc" / str(i) / "sr.png"))
        np.testing.assert_array_equal(a, b)


_PREEMPT_WORKER = r"""
import os, signal, sys, threading, time
pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]; work = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid)
sys.path.insert(0, os.environ["SSR_REPO"])
from satlas_sr_tpu.train import train_pipeline

metrics = os.path.join(work, "experiments", "mp_preempt", "metrics.jsonl")

def fire():
    deadline = time.time() + 300
    while time.time() < deadline:
        try:
            if os.path.getsize(metrics) > 0:
                break
        except OSError:
            pass
        time.sleep(0.2)
    if pid == 1:  # signal lands ONLY on the non-saving rank
        os.kill(os.getpid(), signal.SIGTERM)

threading.Thread(target=fire, daemon=True).start()
train_pipeline(work, argv=["-opt", os.path.join(work, "opt.yml"), "--launcher", "jax"])
print(f"DONE {pid}", flush=True)
"""


def test_two_process_preemption_agreement(tmp_path):
    """SIGTERM on ONE rank stops BOTH at the same iteration (the stop flag is
    all-gathered every iter): rank 0 — which never saw the signal — writes the
    preemption state, and neither rank deadlocks in the step collectives."""
    import yaml

    _make_val_tree(tmp_path, n=4)
    opt = {
        "name": "mp_preempt", "model_type": "L2Model", "scale": 4,
        "manual_seed": 0,
        "datasets": {
            "train": {
                "name": "train", "type": "S2NAIPDataset",
                "sentinel2_path": str(tmp_path / "sentinel2"),
                "naip_path": str(tmp_path / "naip"),
                "n_s2_images": 2, "use_3d": True, "use_shuffle": True,
                "batch_size_per_gpu": 1, "num_worker_per_gpu": 1,
            },
        },
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1, "output_size": 128,
                      "zoom_factor": 4, "sr_kernel_size": 1},
        "path": {"resume_state": None},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-3, "betas": [0.9, 0.99]},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100], "gamma": 0.5},
                  "total_iter": 100000, "warmup_iter": -1},
        "val": None,
        "logger": {"print_freq": 1, "save_checkpoint_freq": 100000},
    }
    with open(tmp_path / "opt.yml", "w") as f:
        yaml.safe_dump(opt, f)

    port = _free_port()
    worker = tmp_path / "preempt_worker.py"
    worker.write_text(_PREEMPT_WORKER)
    env = dict(os.environ)
    env["SSR_REPO"] = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"DONE {pid}" in out, out[-2000:]
    states = list((tmp_path / "experiments" / "mp_preempt" / "training_states").glob("*.state"))
    assert states, "rank 0 did not write the preemption state"
    assert max(int(p.stem) for p in states) >= 1


_RESUME_BCAST_WORKER = r"""
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
from satlas_sr_tpu.train import _broadcast_resume_decision

# Divergent local views: rank 0 found a state, rank 1 found none. Every
# rank must leave with rank 0's decision or the exp-dir archive barrier
# deadlocks / resume iterations desync.
local = "training_states/120.state" if pid == 0 else None
agreed = _broadcast_resume_decision(local)
print(f"RESULT {pid} agreed={agreed}", flush=True)
"""


def test_two_process_resume_decision_follows_rank0(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker_bcast.py"
    worker.write_text(_RESUME_BCAST_WORKER)
    env = dict(os.environ)
    env["SSR_REPO"] = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        assert line.endswith("agreed=training_states/120.state"), line
