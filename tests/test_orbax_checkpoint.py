"""Orbax checkpoint backend (`train.checkpoint_backend: orbax`).

Pins backend selection, the save/resume round trip (state equality with the
in-memory model), committed-step auto-discovery (tmp dirs from interrupted
writes are invisible), final-save dedup, and the full train CLI with
--auto_resume. Native-backend semantics these mirror:
tests/test_training.py::test_esrgan_train_step_and_resume and
test_train_cli_esrgan_with_auto_resume.
"""

import os

import numpy as np
import pytest
import yaml

from test_training import _esrgan_opt, _make_tree

pytest.importorskip("orbax.checkpoint")


def _orbax_opt(tmp_path, s2, naip):
    opt = _esrgan_opt(tmp_path, s2, naip)
    opt["train"]["checkpoint_backend"] = "orbax"
    return opt


def test_invalid_backend_rejected(tmp_path, rng):
    from satlas_sr_tpu.models import build_model

    s2, naip = _make_tree(tmp_path, rng)
    opt = _esrgan_opt(tmp_path, s2, naip)
    opt["train"]["checkpoint_backend"] = "s3"
    with pytest.raises(ValueError, match="checkpoint_backend"):
        build_model(opt)


def test_orbax_save_resume_roundtrip(tmp_path, rng):
    import jax

    from satlas_sr_tpu.models import build_model

    s2, naip = _make_tree(tmp_path, rng)
    opt = _orbax_opt(tmp_path, s2, naip)
    model = build_model(opt)
    batch = {
        "lr": (rng.rand(2, 32, 32, 6) * 255).astype(np.uint8),
        "hr": (rng.rand(2, 128, 128, 3) * 255).astype(np.uint8),
    }
    model.train_iter(batch, 1)
    model.train_iter(batch, 2)
    model.save(epoch=0, current_iter=2)
    model._orbax_io().wait()  # async commit must land before we look

    root = os.path.join(opt["path"]["training_states"], "orbax")
    assert os.path.isdir(os.path.join(root, "2"))
    # reference-format .pth mirror still written (backend-independent interop)
    assert os.path.exists(os.path.join(opt["path"]["models"], "net_g_2.pth"))

    model2 = build_model(opt)
    info = model2.resume_training("orbax:2")
    assert info["iter"] == 2 and info["epoch"] == 0
    for section in ("g", "d"):
        a = jax.device_get(model.state[section]["params"])
        b = jax.device_get(model2.state[section]["params"])
        pairs = zip(jax.tree.leaves(a), jax.tree.leaves(b))
        assert all(np.allclose(x, y) for x, y in pairs), section
    # optimizer state also survives (a resume that only restored params
    # would still pass the check above)
    oa = jax.device_get(model.state["g"]["opt"])
    ob = jax.device_get(model2.state["g"]["opt"])
    assert all(np.allclose(x, y)
               for x, y in zip(jax.tree.leaves(oa), jax.tree.leaves(ob)))
    logs = model2.train_iter(batch, 3)
    assert np.isfinite(logs["l_g_pix"])


def test_orbax_final_save_dedups_current_step(tmp_path, rng):
    from satlas_sr_tpu.models import build_model
    from satlas_sr_tpu.utils.orbax_io import latest_committed_step

    s2, naip = _make_tree(tmp_path, rng)
    opt = _orbax_opt(tmp_path, s2, naip)
    model = build_model(opt)
    batch = {
        "lr": (rng.rand(2, 32, 32, 6) * 255).astype(np.uint8),
        "hr": (rng.rand(2, 128, 128, 3) * 255).astype(np.uint8),
    }
    model.train_iter(batch, 1)
    model.save(epoch=0, current_iter=1)
    # the end-of-training save(-1, -1) resolves to the same step: skipped
    model.save(epoch=0, current_iter=-1)
    model._orbax_io().wait()
    root = os.path.join(opt["path"]["training_states"], "orbax")
    assert latest_committed_step(root) == 1
    steps = [n for n in os.listdir(root) if n.isdigit()]
    assert steps == ["1"]
    # the dedup skips only the orbax write — the final save's *_latest.pth
    # mirror (an alias the periodic save never produced, and one the native
    # backend always guarantees) must still appear
    assert os.path.exists(os.path.join(opt["path"]["models"], "net_g_latest.pth"))


def test_orbax_backend_refused_when_not_importable(tmp_path, rng, monkeypatch):
    # Missing orbax must fail at model BUILD, not save_checkpoint_freq
    # iterations into the run (the lazy _orbax_io import site).
    import importlib.util

    from satlas_sr_tpu.models import build_model

    real_find_spec = importlib.util.find_spec
    monkeypatch.setattr(
        importlib.util, "find_spec",
        lambda name, *a, **k: None if name == "orbax.checkpoint"
        else real_find_spec(name, *a, **k))
    s2, naip = _make_tree(tmp_path, rng)
    opt = _orbax_opt(tmp_path, s2, naip)
    with pytest.raises(ValueError, match="orbax-checkpoint package"):
        build_model(opt)


def test_discovery_sees_only_committed_steps(tmp_path):
    from satlas_sr_tpu.train import find_resume_state
    from satlas_sr_tpu.utils.orbax_io import latest_committed_step

    root = tmp_path / "training_states" / "orbax"
    os.makedirs(root / "3")
    os.makedirs(root / "7")
    # interrupted write: orbax tmp suffix — must stay invisible
    os.makedirs(root / "9.orbax-checkpoint-tmp-1234")
    os.makedirs(root / "not_a_step")
    assert latest_committed_step(str(root)) == 7

    opt = {
        "auto_resume": True,
        "train": {"checkpoint_backend": "orbax"},
        "path": {"training_states": str(tmp_path / "training_states")},
    }
    assert find_resume_state(opt) == "orbax:7"
    opt["train"]["checkpoint_backend"] = "native"
    assert find_resume_state(opt) is None  # native path ignores orbax dirs


def test_wait_propagates_commit_failure(tmp_path, rng):
    """finish_checkpoints() must RAISE when the async commit failed — a
    preemption save that silently vanished would auto-resume from a stale
    step. Only the atexit drain (where raising is impossible) may swallow."""
    from satlas_sr_tpu.models import build_model

    s2, naip = _make_tree(tmp_path, rng)
    opt = _orbax_opt(tmp_path, s2, naip)
    model = build_model(opt)
    io = model._orbax_io()

    class _Boom(Exception):
        pass

    def _fail():
        raise _Boom("background write failed")

    orig = io._mgr.wait_until_finished
    io._mgr.wait_until_finished = _fail
    try:
        with pytest.raises(_Boom):
            model.finish_checkpoints()
        # the atexit path reports instead of raising
        io._wait_at_exit()
    finally:
        io._mgr.wait_until_finished = orig


def test_train_cli_orbax_auto_resume(tmp_path, rng):
    """Full CLI: orbax checkpoints at save_checkpoint_freq, then
    --auto_resume continues from the committed step."""
    import json

    from satlas_sr_tpu.train import train_pipeline

    s2, naip = _make_tree(tmp_path, rng)
    opt = _orbax_opt(tmp_path, s2, naip)
    opt["name"] = "cli_esrgan_orbax"
    opt["num_gpu"] = 1
    opt["train"]["total_iter"] = 2
    del opt["train"]["perceptual_opt"]  # keep the CPU step light
    opt["datasets"]["train"]["batch_size_per_gpu"] = 1
    opt["path"] = {"resume_state": None}
    opt["logger"]["save_checkpoint_freq"] = 2
    opt.pop("is_train", None)
    opt.pop("rank", None)
    opt.pop("world_size", None)
    opt.pop("seed_with_rank", None)
    opt["val"] = None

    opt_path = tmp_path / "opt.yml"
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)

    train_pipeline(str(tmp_path), argv=["-opt", str(opt_path)])
    exp = tmp_path / "experiments" / "cli_esrgan_orbax"
    assert (exp / "training_states" / "orbax" / "2").is_dir()
    # no native .state files in orbax mode
    assert not list((exp / "training_states").glob("*.state"))

    opt["train"]["total_iter"] = 3
    with open(opt_path, "w") as f:
        yaml.safe_dump(opt, f)
    train_pipeline(str(tmp_path), argv=["-opt", str(opt_path), "--auto_resume"])
    lines = [json.loads(l) for l in open(exp / "metrics.jsonl").read().splitlines()]
    assert any(l["iter"] == 3 for l in lines)  # continued, not restarted
    assert (exp / "training_states" / "orbax" / "3").is_dir()
