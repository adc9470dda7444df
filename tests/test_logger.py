"""Logging surface tests: MessageLogger formatting/sinks + AvgTimer."""

import json
import time

import numpy as np

from satlas_sr_tpu.utils.logger import AvgTimer, MessageLogger


def test_message_logger_jsonl_and_format(tmp_path, capsys):
    opt = {
        "name": "exp_name_that_is_quite_long_indeed",
        "train": {"total_iter": 1000},
        "logger": {"print_freq": 1},
        "path": {"log": str(tmp_path)},
    }
    ml = MessageLogger(opt, start_iter=0)
    import jax.numpy as jnp

    ml({"epoch": 1, "iter": 10, "lrs": [1e-4, 2e-4], "time": 0.5, "data_time": 0.1,
        "l_g_pix": jnp.asarray(0.25), "psnr": 31.5})
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[-1]["iter"] == 10
    assert abs(lines[-1]["l_g_pix"] - 0.25) < 1e-9
    assert abs(lines[-1]["psnr"] - 31.5) < 1e-9


def test_message_logger_eta_format(tmp_path):
    """ETA renders actual elapsed days — strftime's %j is 1-based day-of-year,
    which displayed every sub-day ETA as '001 d ...'."""
    import logging

    records = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = _Capture()
    logging.getLogger("satlas_sr_tpu").addHandler(handler)
    try:
        opt = {
            "name": "eta_exp",
            "train": {"total_iter": 200},
            "logger": {"print_freq": 1},
            "path": {"log": str(tmp_path)},
        }
        ml = MessageLogger(opt, start_iter=0)
        ml.start_time = time.time() - 100  # 100 iters in 100 s -> 1 s/iter
        ml({"epoch": 1, "iter": 100, "lrs": [1e-4], "time": 1.0, "data_time": 0.1})
        msg = records[-1]
        assert "eta: 00:0" in msg and " d " not in msg  # ~100 s, no day prefix

        opt["train"]["total_iter"] = 200_000  # eta ~199900 s = 2 d 07:31:40
        ml2 = MessageLogger(opt, start_iter=0)
        ml2.start_time = time.time() - 100
        ml2({"epoch": 1, "iter": 100, "lrs": [1e-4], "time": 1.0, "data_time": 0.1})
        assert "eta: 2 d 07:" in records[-1]
    finally:
        logging.getLogger("satlas_sr_tpu").removeHandler(handler)


def test_avg_timer():
    t = AvgTimer()
    t.start()
    time.sleep(0.02)
    t.record()
    assert 0.01 < t.get_avg_time() < 1.0


def test_convert_checkpoint_roundtrip(tmp_path, rng):
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    from satlas_sr_tpu.archs import RRDBNet
    from satlas_sr_tpu.utils.checkpoint import load_pytree, save_pytree

    model = RRDBNet(num_in_ch=6, num_out_ch=3, num_feat=8, num_block=1, num_grow_ch=4)
    variables = jax.device_get(model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 6))))
    msgpack_path = tmp_path / "net.msgpack"
    save_pytree(str(msgpack_path), variables)

    pth_path = tmp_path / "net.pth"
    env = {"JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    r1 = subprocess.run(
        [sys.executable, "scripts/convert_checkpoint.py", "to_pth",
         str(msgpack_path), str(pth_path), "SSR_RRDBNet"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r1.returncode == 0, r1.stderr[-500:]
    back_path = tmp_path / "back.msgpack"
    r2 = subprocess.run(
        [sys.executable, "scripts/convert_checkpoint.py", "from_pth",
         str(pth_path), str(back_path), "SSR_RRDBNet", "params", "1"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r2.returncode == 0, r2.stderr[-500:]
    back = load_pytree(str(back_path))
    same = jax.tree.map(lambda a, b: bool(np.allclose(a, b)),
                        variables["params"], back["params"])
    assert all(jax.tree.leaves(same))


def test_init_wandb_logger_offline_defaults(monkeypatch):
    """logger.wandb config keys drive a real wandb.init with OFFLINE mode by
    default, resume via resume_id, and sync_tensorboard (VERDICT r2 next #9 /
    reference train.py:12)."""
    import sys
    import types

    from satlas_sr_tpu.utils.logger import init_wandb_logger

    calls = {}

    fake = types.ModuleType("wandb")

    def init(**kwargs):
        calls.update(kwargs)
        return "run"

    fake.init = init
    monkeypatch.setitem(sys.modules, "wandb", fake)
    monkeypatch.delenv("WANDB_MODE", raising=False)

    opt = {"name": "exp1",
           "logger": {"wandb": {"project": "ssr", "resume_id": "abc123"}}}
    run = init_wandb_logger(opt)
    assert run == "run"
    assert calls["project"] == "ssr"
    assert calls["id"] == "abc123" and calls["resume"] == "allow"
    assert calls["mode"] == "offline" and calls["sync_tensorboard"] is True
    assert calls["name"] == "exp1"

    # no project configured -> no init
    calls.clear()
    assert init_wandb_logger({"name": "x", "logger": {}}) is None
    assert not calls


def test_get_root_logger_attaches_file_handler_late(tmp_path):
    """An early get_root_logger() (e.g. find_resume_state warning about a
    torn .state) must not cost the run its log file: a later call WITH
    log_file still attaches the FileHandler."""
    import logging

    from satlas_sr_tpu.utils.logger import get_root_logger

    early = get_root_logger()  # stdout-only, possibly pre-existing
    log_file = str(tmp_path / "late.log")
    logger = get_root_logger(log_file)
    assert logger is early
    added = [h for h in logger.handlers
             if isinstance(h, logging.FileHandler)
             and h.baseFilename == log_file]
    assert added
    try:
        logger.info("late-attach works")
        added[0].flush()
        assert "late-attach works" in open(log_file).read()
        # idempotent: same path never double-attaches
        get_root_logger(log_file)
        assert len([h for h in logger.handlers
                    if isinstance(h, logging.FileHandler)
                    and h.baseFilename == log_file]) == 1
    finally:
        logger.removeHandler(added[0])
        added[0].close()
