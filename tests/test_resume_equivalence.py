"""Resume-equivalence: save/resume is invisible to the training trajectory.

The strongest invariant over the checkpoint/optimizer/scheduler/EMA/RNG
plumbing: training N iters straight must produce EXACTLY the same state as
training k, stopping, and resuming to N. Any state component that doesn't
round-trip (dropout RNG, optimizer moments, schedule step, EMA) or any
data-stream misalignment breaks bit-equality here.

This is deliberately stronger than the reference: basicsr's resume restarts
its within-epoch data position, so a resumed reference run diverges from the
uninterrupted one. Our loader fast-forwards the sampler and the draw-ordinal
salts to the resume iteration (samplers are pure functions of (seed, epoch),
so the skip is O(1) arithmetic — data/sampler.py iter_from).

Also pins the loader's batch ORDER: completed batches are re-sequenced so
multi-worker thread scheduling cannot reorder the training stream (torch
DataLoader semantics, which basicsr relies on for its determinism).
"""

import itertools
import time

import numpy as np
import pytest
import yaml

import jax

from satlas_sr_tpu.data.loader import PrefetchLoader
from satlas_sr_tpu.data.sampler import (EnlargedShuffleSampler,
                                        WeightedInfiniteSampler)
from satlas_sr_tpu.utils.checkpoint import load_pytree
from tests.test_training import _esrgan_opt, _make_tree


@pytest.mark.parametrize("sampler_fn", [
    lambda: EnlargedShuffleSampler(13, seed=7, ratio=2),
    lambda: EnlargedShuffleSampler(13, seed=7, rank=1, world_size=3, ratio=2),
    lambda: WeightedInfiniteSampler(np.arange(1, 14), seed=7, chunk=16),
    lambda: WeightedInfiniteSampler(np.arange(1, 14), seed=7, rank=2,
                                    world_size=3, chunk=16),
])
@pytest.mark.parametrize("skip", [0, 1, 7, 29])
def test_sampler_iter_from_matches_skipping(sampler_fn, skip):
    full = list(itertools.islice(iter(sampler_fn()), 60))
    resumed = list(itertools.islice(sampler_fn().iter_from(skip), 60 - skip))
    assert resumed == full[skip:]


class _IdentityDataset:
    """sample() returns its (index, salt) so batch contents are observable."""

    def sample(self, index, salt):
        # stagger work so completion order differs from dispatch order
        time.sleep(0.001 * (index % 7))
        return {"index": np.int64(index), "salt": np.int64(salt)}


def test_loader_preserves_batch_order_across_workers():
    ds = _IdentityDataset()
    loader = PrefetchLoader(ds, list(range(64)), batch_size=4, num_workers=4)
    batches = list(loader)
    idx = [b["index"].tolist() for b in batches]
    assert idx == [list(range(i, i + 4)) for i in range(0, 64, 4)]
    salts = [b["salt"].tolist() for b in batches]
    assert salts == idx  # draw ordinal == position in the stream


def test_loader_start_sample_fast_forwards_indices_and_salts():
    ds = _IdentityDataset()
    sampler = EnlargedShuffleSampler(32, seed=3)
    full = [b for _, b in zip(range(6), PrefetchLoader(
        ds, sampler, batch_size=4, num_workers=2))]
    resumed = [b for _, b in zip(range(3), PrefetchLoader(
        ds, EnlargedShuffleSampler(32, seed=3), batch_size=4, num_workers=2,
        start_sample=12))]
    for got, want in zip(resumed, full[3:]):
        assert got["index"].tolist() == want["index"].tolist()
        assert got["salt"].tolist() == want["salt"].tolist()


def _l2_cli_opt(name, s2, naip, total_iter, ckpt_freq):
    return {
        "name": name,
        "model_type": "L2Model",
        "scale": 4,
        "num_gpu": 1,
        "manual_seed": 11,
        "datasets": {
            "train": {
                "name": "train", "type": "S2NAIPDataset", "sentinel2_path": s2,
                "naip_path": naip, "n_s2_images": 2, "use_3d": True,
                "use_shuffle": True, "batch_size_per_gpu": 2,
                "num_worker_per_gpu": 2,  # exercise the re-sequencer
            },
        },
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1,
                      "output_size": 128, "zoom_factor": 4, "sr_kernel_size": 1},
        "path": {"resume_state": None},
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-3, "weight_decay": 0,
                        "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [4],
                          "gamma": 0.5},
            "total_iter": total_iter,
            "warmup_iter": -1,
        },
        "val": None,
        "logger": {"print_freq": 1, "save_checkpoint_freq": ckpt_freq,
                   "use_tb_logger": False},
    }


def _run(tmp_path, opt, resume=False):
    from satlas_sr_tpu.train import train_pipeline

    opt_path = tmp_path / f"{opt['name']}_{opt['train']['total_iter']}.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    argv = ["-opt", str(opt_path)] + (["--auto_resume"] if resume else [])
    train_pipeline(str(tmp_path), argv=argv)


def test_resume_is_bit_identical_to_straight_run(tmp_path, rng):
    """6 iters straight == 3 iters + resume + 3 iters, bit for bit.

    Crosses an epoch boundary (4 samples, batch 2 -> 2 iters/epoch) and an
    lr milestone (iter 4), so the sampler fast-forward arithmetic, schedule
    step count, optimizer moments, EMA-free L2 state and dropout RNG are all
    on the hook."""
    s2, naip = _make_tree(tmp_path, rng)

    _run(tmp_path, _l2_cli_opt("straight", s2, naip, total_iter=6,
                               ckpt_freq=3))
    _run(tmp_path, _l2_cli_opt("resumed", s2, naip, total_iter=3,
                               ckpt_freq=3))
    _run(tmp_path, _l2_cli_opt("resumed", s2, naip, total_iter=6,
                               ckpt_freq=3), resume=True)

    exp = tmp_path / "experiments"
    a = load_pytree(str(exp / "straight" / "training_states" / "6.state"))
    b = load_pytree(str(exp / "resumed" / "training_states" / "6.state"))

    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    wa = load_pytree(str(exp / "straight" / "models" / "net_g_latest.msgpack"))
    wb = load_pytree(str(exp / "resumed" / "models" / "net_g_latest.msgpack"))
    for la, lb in zip(jax.tree.leaves(wa), jax.tree.leaves(wb)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_preemption_is_bit_identical_to_straight_run(tmp_path, rng):
    """SIGTERM at an ARBITRARY iteration + auto-resume == never preempted.

    The preemption save runs at the loop boundary after the signal, so
    whatever iteration k it lands on, the resumed trajectory must rejoin
    the uninterrupted one exactly — the property that makes preemptible
    TPU fleets trajectory-transparent."""
    import os as os_mod
    import signal as signal_mod
    import threading
    import time as time_mod

    s2, naip = _make_tree(tmp_path, rng)

    opt = _l2_cli_opt("preempted", s2, naip, total_iter=100000,
                      ckpt_freq=100000)
    exp = tmp_path / "experiments" / "preempted"
    metrics = exp / "metrics.jsonl"

    def fire_when_training():
        deadline = time_mod.time() + 300
        while time_mod.time() < deadline:
            if metrics.exists() and metrics.read_text().strip():
                break
            time_mod.sleep(0.2)
        os_mod.kill(os_mod.getpid(), signal_mod.SIGTERM)

    watcher = threading.Thread(target=fire_when_training, daemon=True)
    watcher.start()
    _run(tmp_path, opt)
    watcher.join(timeout=10)

    states = list((exp / "training_states").glob("*.state"))
    assert states, "preemption produced no training state"
    k = max(int(p.stem) for p in states)
    total = k + 3

    _run(tmp_path, _l2_cli_opt("preempted", s2, naip, total_iter=total,
                               ckpt_freq=total), resume=True)
    _run(tmp_path, _l2_cli_opt("pstraight", s2, naip, total_iter=total,
                               ckpt_freq=total))

    a = load_pytree(str(tmp_path / "experiments" / "pstraight" /
                        "training_states" / f"{total}.state"))
    b = load_pytree(str(exp / "training_states" / f"{total}.state"))
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def _esrgan_cli_opt(tmp_path, s2, naip, name, total_iter):
    opt = _esrgan_opt(tmp_path, s2, naip)
    opt["name"] = name
    opt["num_gpu"] = 1
    opt["manual_seed"] = 5
    del opt["train"]["perceptual_opt"]  # keep the CPU step light
    opt["datasets"]["train"]["batch_size_per_gpu"] = 1
    opt["datasets"]["train"]["num_worker_per_gpu"] = 2
    opt["train"]["total_iter"] = total_iter
    opt["path"] = {"resume_state": None}
    opt["logger"]["save_checkpoint_freq"] = 2
    opt["val"] = None
    for k in ("is_train", "rank", "world_size", "seed_with_rank"):
        opt.pop(k, None)
    return opt


def test_esrgan_resume_is_bit_identical(tmp_path, rng):
    """Same invariant over the GAN state: EMA, spectral-norm u/v, BOTH
    optimizer moments and the D stream must round-trip exactly."""
    s2, naip = _make_tree(tmp_path, rng)

    _run(tmp_path, _esrgan_cli_opt(tmp_path, s2, naip, "gstraight", 4))
    _run(tmp_path, _esrgan_cli_opt(tmp_path, s2, naip, "gresumed", 2))
    _run(tmp_path, _esrgan_cli_opt(tmp_path, s2, naip, "gresumed", 4),
         resume=True)

    exp = tmp_path / "experiments"
    a = load_pytree(str(exp / "gstraight" / "training_states" / "4.state"))
    b = load_pytree(str(exp / "gresumed" / "training_states" / "4.state"))
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
