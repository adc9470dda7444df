"""Checkpoint inspector CLI (satlas_sr_tpu.ckpt)."""

import json

import numpy as np
import pytest

from satlas_sr_tpu.ckpt import inspect, main, summarize_tree
from satlas_sr_tpu.utils.checkpoint import save_pytree


def _net_tree():
    return {
        "params": {"conv": {"kernel": np.zeros((3, 3, 4, 8), np.float32),
                            "bias": np.zeros((8,), np.float32)}},
        "params_ema": {"conv": {"kernel": np.ones((3, 3, 4, 8), np.float32),
                                "bias": np.ones((8,), np.float32)}},
    }


def test_native_checkpoint_report(tmp_path):
    p = str(tmp_path / "net_g_10.msgpack")
    save_pytree(p, _net_tree())
    info = inspect(p)
    assert info["format"] == "native-msgpack"
    assert info["status"] == "ok"
    assert info["integrity"] == "crc-footer"
    c = info["collections"]
    assert c["params"]["tensors"] == 2
    assert c["params"]["params"] == 3 * 3 * 4 * 8 + 8
    assert c["params_ema"]["bytes"] == (3 * 3 * 4 * 8 + 8) * 4


def test_corrupt_checkpoint_flagged(tmp_path, capsys):
    p = str(tmp_path / "net.msgpack")
    save_pytree(p, _net_tree())
    blob = bytearray(open(p, "rb").read())
    blob[10] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    info = inspect(p)
    assert info["status"] == "CORRUPT"
    assert main([p]) == 1
    assert "CORRUPT" in capsys.readouterr().out


def test_training_state_step_and_optax_lists(tmp_path):
    p = str(tmp_path / "5.state")
    save_pytree(p, {
        "step": np.int32(5),
        "g": {"params": {"w": np.zeros((2, 2), np.float32)}},
        "opt": [{"mu": {"w": np.zeros((2, 2), np.float32)}}, {}],
    })
    info = inspect(p)
    assert info["status"] == "ok"
    assert info["step"] == 5
    # flax msgpack restores lists as {"0": ...} dicts
    assert any(l["path"].startswith("opt.0") or l["path"].startswith("opt[0]")
               for l in info["leaves"] if "shape" in l)


def test_torch_pth_report(tmp_path):
    torch = pytest.importorskip("torch")
    p = str(tmp_path / "net_g.pth")
    torch.save({"params": {"conv_first.weight": torch.zeros(8, 4, 3, 3)},
                "params_ema": {"conv_first.weight": torch.ones(8, 4, 3, 3)}},
               p)
    info = inspect(p)
    assert info["format"] == "torch-pth"
    assert info["status"] == "ok"
    assert info["param_keys"] == ["params", "params_ema"]
    assert info["collections"]["params"]["params"] == 8 * 4 * 3 * 3


def test_orbax_root_listing(tmp_path):
    root = tmp_path / "orbax"
    for step in ("100", "200"):
        (root / step).mkdir(parents=True)
    (root / "300.orbax-checkpoint-tmp-123").mkdir()
    info = inspect(str(root))
    assert info["format"] == "orbax-root"
    assert info["committed_steps"] == [100, 200]
    assert info["latest_step"] == 200
    assert info["in_flight"] == ["300.orbax-checkpoint-tmp-123"]


def test_main_json_and_missing(tmp_path, capsys):
    p = str(tmp_path / "net.msgpack")
    save_pytree(p, _net_tree())
    assert main([p, "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "ok"
    assert main([str(tmp_path / "nope.msgpack")]) == 1


def test_summarize_skips_non_tensor_leaves():
    s = summarize_tree({"a": {"name": "hello", "w": np.zeros(3, np.float32)}})
    assert s["collections"]["a"]["tensors"] == 1
    assert any("value" in l for l in s["leaves"])
