"""Golden-path workflow test: the full user journey on one corpus.

fetch (local mirror) -> doctor -> scan_data -> train -> test -> infer,
all against the SAME synthetic S2-NAIP artifact. Each tool is unit-tested
elsewhere; this chain pins the seams between them — fetch's extraction
produces exactly the layout the dataset discovers, the doctor blesses
exactly what the trainer accepts, the trained checkpoint feeds the test
and infer CLIs unchanged. (The reference documents this journey as README
prose; nothing upstream verifies the steps compose.)
"""

import io
import json
import os
import tarfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import yaml

from satlas_sr_tpu.utils.imgio import read_png, write_png


def _corpus_tar(rng, chips=3, frames=3):
    """A small_val_set-shaped tar: {set}/naip/... + {set}/sentinel2/..."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        for c in range(chips):
            chip = f"{500 + c}_{600 + c}"
            naip = (rng.rand(128, 128, 3) * 254 + 1).astype(np.uint8)
            write_png(os.path.join(td, f"naip/{chip}/{chip}.png"), naip)
            s2 = (rng.rand(frames * 32, 32, 3) * 254 + 1).astype(np.uint8)
            write_png(os.path.join(td, f"sentinel2/{chip}/tci.png"), s2)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for root, _, files in os.walk(td):
                for f in files:
                    full = os.path.join(root, f)
                    rel = os.path.join("small_val_set",
                                       os.path.relpath(full, td))
                    tf.add(full, arcname=rel)
        return buf.getvalue()


class _Srv(BaseHTTPRequestHandler):
    def do_GET(self):
        body = self.server.files.get(self.path)
        if body is None:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def test_golden_path(tmp_path, rng, monkeypatch, capsys):
    # ---- 1. fetch from a local mirror ------------------------------------
    from satlas_sr_tpu import fetch

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Srv)
    srv.files = {"/small_val.tar": _corpus_tar(rng)}
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        monkeypatch.setitem(
            fetch.REGISTRY, "small_val_set",
            {"urls": [f"http://127.0.0.1:{srv.server_address[1]}/small_val.tar"],
             "kind": "tar", "about": "golden-path corpus"})
        data_root = tmp_path / "data"
        assert fetch.main(["get", "small_val_set",
                           "--dest", str(data_root)]) == 0
    finally:
        srv.shutdown()
        srv.server_close()
    s2 = str(data_root / "small_val_set" / "sentinel2")
    naip = str(data_root / "small_val_set" / "naip")
    assert os.path.isdir(s2) and os.path.isdir(naip)

    # ---- 2. the train config, doctor-blessed ------------------------------
    exp = tmp_path / "exp"
    opt = {
        "name": "golden", "model_type": "L2Model", "scale": 4, "num_gpu": 1,
        "manual_seed": 0, "is_train": True, "rank": 0, "world_size": 1,
        "datasets": {"train": {
            "name": "train", "type": "S2NAIPDataset", "phase": "train",
            "scale": 4, "sentinel2_path": s2, "naip_path": naip,
            "n_s2_images": 2, "use_3d": True, "use_shuffle": True,
            "batch_size_per_gpu": 2, "num_worker_per_gpu": 1}},
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1,
                      "output_size": 128, "zoom_factor": 4,
                      "sr_kernel_size": 1},
        "path": {"experiments_root": str(exp),
                 "models": str(exp / "models"),
                 "training_states": str(exp / "training_states"),
                 "visualization": str(exp / "visualization"),
                 "log": str(exp)},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 1000},
        "val": None,
        "train": {"optim_g": {"type": "Adam", "lr": 1e-4},
                  "scheduler": {"type": "MultiStepLR", "milestones": [1000],
                                "gamma": 0.5},
                  "total_iter": 2, "warmup_iter": -1},
    }
    from satlas_sr_tpu.doctor import run_doctor

    assert run_doctor(dict(opt), check_runtime=False) == 0

    # ---- 3. pre-scan agrees the corpus is fully trainable ------------------
    from satlas_sr_tpu.data.loader import build_dataset
    from satlas_sr_tpu.scan_data import scan_dataset

    ds = build_dataset(dict(opt["datasets"]["train"]))
    report = scan_dataset(ds)
    assert report["chips_scanned"] == 3 and report["chips_unusable"] == 0

    # ---- 4. train two steps, checkpoint ------------------------------------
    from satlas_sr_tpu.models import build_model
    from satlas_sr_tpu.data.loader import PrefetchLoader
    from satlas_sr_tpu.data.sampler import build_sampler

    model = build_model(opt)
    sampler = build_sampler(ds, opt["datasets"]["train"], seed=0, rank=0,
                            world_size=1)
    loader = PrefetchLoader(ds, sampler, batch_size=2, num_workers=1)
    it = iter(loader)
    for step in (1, 2):
        model.train_iter(next(it), step)
    loader.stop()
    model.save(epoch=0, current_iter=2)
    model.finish_checkpoints()
    ckpt = str(exp / "models" / "net_g_2.pth")
    assert os.path.exists(ckpt)

    # ---- 5. test CLI evaluates the trained checkpoint ----------------------
    from satlas_sr_tpu.test import test_pipeline

    test_opt = {
        "name": "golden_eval", "model_type": "L2Model", "scale": 4,
        "num_gpu": 1, "manual_seed": 0, "datasets": {},
        "test_datasets": {"test": {
            "name": "test", "type": "S2NAIPDataset", "phase": "test",
            "scale": 4, "sentinel2_path": s2, "naip_path": naip,
            "n_s2_images": 2, "use_3d": True, "use_shuffle": False}},
        "network_g": dict(opt["network_g"]),
        "path": {"pretrain_network_g": ckpt, "param_key_g": "params",
                 "strict_load_g": True, "resume_state": None},
        "test": {"save_img": False,
                 "metrics": {"psnr": {"type": "calculate_psnr",
                                      "crop_border": 4,
                                      "test_y_channel": False}}},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 1000},
    }
    cfg = tmp_path / "eval.yml"
    cfg.write_text(yaml.safe_dump(test_opt))
    results = test_pipeline(str(tmp_path), argv=["-opt", str(cfg)])
    assert np.isfinite(results["test"]["psnr"])

    # results.json was written machine-readable
    rj = json.load(open(str(tmp_path / "results" / "golden_eval" /
                            "results.json")))
    assert rj["weights"] == ckpt and "psnr" in rj["results"]["test"]

    # ---- 6. GT-free inference with the same checkpoint ---------------------
    from satlas_sr_tpu.infer import run_inference

    infer_opt = {
        "data_dir": s2, "save_path": str(tmp_path / "sr_out"),
        "n_lr_images": 2, "scale": 4, "batch_size": 4,
        "network_g": dict(opt["network_g"]),
        "path": {"pretrain_network_g": ckpt, "param_key_g": "params",
                 "strict_load_g": True},
    }
    assert run_inference(infer_opt) == 3
    sr = read_png(str(tmp_path / "sr_out" / "0" / "sr.png"))
    assert sr.shape == (128, 128, 3)
