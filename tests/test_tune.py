"""Autotuner CLI (satlas_sr_tpu.tune): candidate grid + measured report.

The tuner productizes the batch/remat/accum throughput sweeps (BENCH_NOTES
round-4 remat table): given any train config it measures the real jitted
train step per candidate and emits ranked results + force_yml overrides.
"""

import json

import numpy as np
import pytest


ESRGAN_YML = """\
name: tune_test_esrgan
model_type: SSRESRGANModel
scale: 4
manual_seed: 0
l1_gt_usm: true
percep_gt_usm: true
gan_gt_usm: false
feed_disc_lr: true
datasets:
  train:
    name: train
    type: S2NAIPDataset
    n_s2_images: 2
    batch_size_per_gpu: 4
network_g:
  type: SSR_RRDBNet
  num_in_ch: 6
  num_out_ch: 3
  num_feat: 8
  num_block: 1
  num_grow_ch: 4
network_d:
  type: SSR_UNetDiscriminatorSN
  num_in_ch: 9
  num_feat: 4
path:
  pretrain_network_g: /nonexistent/must_be_ignored.pth
train:
  ema_decay: 0.9
  optim_g: {type: Adam, lr: 1.0e-3, betas: [0.9, 0.99]}
  optim_d: {type: Adam, lr: 1.0e-4, betas: [0.9, 0.99]}
  scheduler: {type: MultiStepLR, milestones: [400000], gamma: 0.5}
  total_iter: 10
  warmup_iter: -1
  pixel_opt: {type: L1Loss, loss_weight: 1.0, reduction: mean}
  gan_opt:
    type: GANLoss
    gan_type: vanilla
    real_label_val: 1.0
    fake_label_val: 0.0
    loss_weight: 0.1
  net_d_iters: 1
  net_d_init_iters: 0
logger: {print_freq: 1000, save_checkpoint_freq: 100000}
"""

SRCNN_YML = """\
name: tune_test_srcnn
model_type: L2Model
scale: 4
manual_seed: 0
datasets:
  train:
    name: train
    type: S2NAIPDataset
    n_s2_images: 2
    batch_size_per_gpu: 4
    use_3d: true
network_g:
  type: SRCNN
  in_channels: 3
  mask_channels: 0
  hidden_channels: 16
  out_channels: 3
  kernel_size: 3
  residual_layers: 1
  output_size: 128
  revisits: 2
  zoom_factor: 4
  sr_kernel_size: 1
path: {}
train:
  optim_g: {type: Adam, lr: 1.0e-4, weight_decay: 0, betas: [0.9, 0.99]}
  scheduler: {type: MultiStepLR, milestones: [400000], gamma: 0.5}
  total_iter: 10
  warmup_iter: -1
  pixel_opt: {type: L1Loss, loss_weight: 1.0, reduction: mean}
logger: {print_freq: 1000, save_checkpoint_freq: 100000}
"""


def _run(tmp_path, yml, argv_extra):
    from satlas_sr_tpu.tune import main

    cfg = tmp_path / "cfg.yml"
    cfg.write_text(yml)
    out = tmp_path / "tune.json"
    rc = main(["-opt", str(cfg), "--iters", "2", "--trials", "1",
               "--out", str(out)] + argv_extra)
    return rc, (json.loads(out.read_text()) if out.exists() else None)


def test_tune_esrgan_reports_and_recommends(tmp_path):
    rc, rep = _run(tmp_path, ESRGAN_YML, ["--batches", "2,4",
                                          "--remat", "false"])
    assert rc == 0
    cands = rep["candidates"]
    assert [c["batch"] for c in cands] == [2, 4]
    assert all(c["ok"] and c["samples_per_s"] > 0 and c["accum"] == 1
               for c in cands)
    best = rep["best"]
    assert best == max(cands, key=lambda c: c["samples_per_s"])
    # the recommended overrides must round-trip through the real option
    # parser (the exact string `train.py --force_yml` would receive)
    from satlas_sr_tpu.utils.options import parse_options

    opt, _ = parse_options(
        str(tmp_path), is_train=True,
        argv=["-opt", str(tmp_path / "cfg.yml"), "--force_yml"]
        + rep["recommended_force_yml"])
    assert opt["datasets"]["train"]["batch_size_per_gpu"] == best["batch"]
    assert opt["train"]["accum_steps"] == best["accum"]


def test_tune_effective_batch_holds_optimizer_batch(tmp_path):
    rc, rep = _run(tmp_path, ESRGAN_YML, ["--batches", "2,3,4",
                                          "--remat", "false",
                                          "--effective_batch", "4"])
    assert rc == 0
    got = {(c["batch"], c["accum"]) for c in rep["candidates"]}
    assert got == {(2, 2), (4, 1)}  # 3 skipped: not a divisor of 4


def test_tune_srcnn_l2_model(tmp_path):
    rc, rep = _run(tmp_path, SRCNN_YML, ["--batches", "2"])
    assert rc == 0
    (cand,) = rep["candidates"]
    assert cand["ok"] and cand["samples_per_s"] > 0
    # non-RRDB generator: no remat axis, config value passes through
    assert cand["remat"] is False


def test_tune_candidate_grid_unit():
    from satlas_sr_tpu.tune import build_candidates

    opt = {"network_g": {"type": "SSR_RRDBNet"}, "train": {}}
    cands = build_candidates(opt, [16, 32], None, None)
    assert {(c["batch"], c["remat"]) for c in cands} == {
        (16, False), (32, False), (32, "rdb")}
    # explicit remat list: full cartesian grid
    cands = build_candidates(opt, [16, 32], [False, "rdb"], None)
    assert len(cands) == 4
    # non-RRDB: remat axis collapses to the config's own setting
    opt = {"network_g": {"type": "SRCNN"}, "train": {"accum_steps": 2}}
    cands = build_candidates(opt, [16, 32], None, None)
    assert [(c["batch"], c["remat"], c["accum"]) for c in cands] == [
        (16, False, 2), (32, False, 2)]


def test_tune_failed_candidate_is_recorded_not_fatal(tmp_path, monkeypatch):
    """One infeasible candidate (e.g. OOM) must not kill the sweep."""
    import satlas_sr_tpu.tune as tune_mod

    real = tune_mod.measure_candidate

    def flaky(opt, cand, iters, trials):
        if cand["batch"] == 2:
            row = dict(cand)
            row["ok"] = False
            row["error"] = "RESOURCE_EXHAUSTED: simulated OOM"
            return row
        return real(opt, cand, iters, trials)

    monkeypatch.setattr(tune_mod, "measure_candidate", flaky)
    rc, rep = _run(tmp_path, ESRGAN_YML, ["--batches", "2,4",
                                          "--remat", "false"])
    assert rc == 0  # at least one candidate succeeded
    by_batch = {c["batch"]: c for c in rep["candidates"]}
    assert not by_batch[2]["ok"] and "OOM" in by_batch[2]["error"]
    assert by_batch[4]["ok"]
    assert rep["best"]["batch"] == 4


def test_tune_dtype_axis_unit():
    """--dtypes sweeps compute_dtype as a candidate axis (round 5) and the
    recommendation carries it as a force_yml override."""
    from satlas_sr_tpu.tune import build_candidates, recommend_force_yml

    opt = {"network_g": {"type": "SSR_RRDBNet"}, "train": {}}
    cands = build_candidates(opt, [16], None, 32,
                             dtypes=["float32", "bfloat16"])
    assert [(c["batch"], c["accum"], c["dtype"]) for c in cands] == [
        (16, 2, "float32"), (16, 2, "bfloat16")]
    fy = recommend_force_yml(cands[1])
    assert "compute_dtype=bfloat16" in fy
    # no dtype axis -> no dtype key, no dtype override (config's own rules)
    cands = build_candidates(opt, [16], None, None)
    assert all("dtype" not in c for c in cands)
    assert not any(s.startswith("compute_dtype")
                   for s in recommend_force_yml(cands[0]))
