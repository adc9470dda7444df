"""docs/API.md honesty tests: every snippet on that page runs as written.

Each test mirrors one documented snippet (tiny shapes for CI); if a
signature or entry point drifts, the corresponding test — and therefore
the doc — breaks loudly.
"""

import numpy as np
import pytest

from satlas_sr_tpu.utils.imgio import write_png


# --------------------------------------------------------------- inference


def _tiny_infer_opt(weights_path=None):
    opt = {
        "scale": 4, "n_lr_images": 2,
        "network_g": {"type": "SSR_RRDBNet", "num_in_ch": 6, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "num_grow_ch": 4},
        "path": {},
    }
    if weights_path:
        opt["path"] = {"pretrain_network_g": weights_path,
                       "param_key_g": "params_ema"}
    return opt


def test_api_doc_inference_snippet(tmp_path):
    import jax
    import jax.numpy as jnp

    from satlas_sr_tpu.infer import load_infer_variables
    from satlas_sr_tpu.inference import InferenceEngine
    from satlas_sr_tpu.utils import torch_io
    from satlas_sr_tpu.utils.model_utils import build_network, uses_3d_input

    # weights in reference .pth format, as the doc's opt["path"] expects
    opt = _tiny_infer_opt()
    m = build_network(opt)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 6)))
    wpath = str(tmp_path / "net_g.pth")
    torch_io.save_torch_state_dict(
        wpath, torch_io.rrdbnet_to_torch(v), "params_ema")

    opt = _tiny_infer_opt(wpath)
    model = build_network(opt)
    use_3d = uses_3d_input(opt["network_g"]["type"])
    assert use_3d is False
    variables = load_infer_variables(opt, model, opt["n_lr_images"], use_3d)

    engine = InferenceEngine(model, variables, batch_size=8, use_3d=use_3d,
                             n_frames=opt["n_lr_images"])
    batch = np.zeros((8, 32, 32, 6), np.uint8)
    sr = engine.run(batch)
    assert sr.shape == (8, 128, 128, 3) and sr.dtype == np.uint8

    outs = list(engine.run_many(iter([batch, batch]), depth=3))
    assert len(outs) == 2 and outs[0].shape == (8, 128, 128, 3)


def test_api_doc_export_snippet(tmp_path):
    from satlas_sr_tpu.export import ExportedEngine, export_artifact

    path = str(tmp_path / "model.ssrx")
    export_artifact(_tiny_infer_opt(), path, batch_size=4,
                    platforms=("cpu",), check=True)
    eng = ExportedEngine(path)
    sr = eng.run(np.zeros((4, 32, 32, 6), np.uint8))
    assert sr.shape == (4, 128, 128, 3) and sr.dtype == np.uint8


# ---------------------------------------------------------------- training


def _make_tree(root, rng, chips=3, frames=3):
    for c in range(chips):
        chip = f"{100 + c}_{200 + c}"
        naip = (rng.rand(128, 128, 3) * 254 + 1).astype(np.uint8)
        write_png(str(root / "naip" / chip / f"{chip}.png"), naip)
        img = (rng.rand(frames * 32, 32, 3) * 254 + 1).astype(np.uint8)
        write_png(str(root / "sentinel2" / chip / "tci.png"), img)
    return str(root / "sentinel2"), str(root / "naip")


def test_api_doc_training_snippet(tmp_path, rng):
    from satlas_sr_tpu.models import build_model

    name = "api_doc_l2"
    opt = {
        "name": name, "model_type": "L2Model", "scale": 4, "num_gpu": 1,
        "manual_seed": 0, "is_train": True, "rank": 0, "world_size": 1,
        "seed_with_rank": 0, "datasets": {"train": {"n_s2_images": 2}},
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1,
                      "output_size": 128, "zoom_factor": 4,
                      "sr_kernel_size": 1},
        "path": {"experiments_root": str(tmp_path / name),
                 "models": str(tmp_path / name / "models"),
                 "training_states": str(tmp_path / name / "training_states"),
                 "visualization": str(tmp_path / name / "visualization"),
                 "log": str(tmp_path / name)},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 1000},
        "val": None,
        "train": {"optim_g": {"type": "Adam", "lr": 1e-4, "weight_decay": 0,
                              "betas": [0.9, 0.99]},
                  "scheduler": {"type": "MultiStepLR", "milestones": [1000],
                                "gamma": 0.5},
                  "total_iter": 4, "warmup_iter": -1},
    }
    model = build_model(opt)
    model.load_pretrained()  # no path configured: a documented no-op
    batch = {"lr": (rng.rand(2, 2, 32, 32, 3) * 255).astype(np.uint8),
             "hr": (rng.rand(2, 128, 128, 3) * 255).astype(np.uint8)}
    model.train_iter(batch, 1)
    assert np.isfinite(model.log_dict["tot_loss"])
    model.save(epoch=0, current_iter=1)
    model.finish_checkpoints()
    state = str(tmp_path / name / "training_states" / "1.state")
    info = build_model(opt).resume_training(state)
    assert info["iter"] == 1


# --------------------------------------------------------------------- data


def test_api_doc_data_snippet(tmp_path, rng):
    from satlas_sr_tpu.data.loader import PrefetchLoader, build_dataset
    from satlas_sr_tpu.data.sampler import build_sampler

    s2, naip = _make_tree(tmp_path, rng)
    dataset_opt = {"type": "S2NAIPDataset", "phase": "train", "scale": 4,
                   "sentinel2_path": s2, "naip_path": naip, "n_s2_images": 2,
                   "use_shuffle": True}
    ds = build_dataset(dataset_opt)
    sampler = build_sampler(ds, dataset_opt, seed=10, rank=0, world_size=1)
    loader = PrefetchLoader(ds, sampler, batch_size=2, num_workers=1)
    it = iter(loader)
    batch = next(it)
    assert batch["lr"].shape == (2, 32, 32, 6)
    assert batch["hr"].shape == (2, 128, 128, 3)
    loader.stop()


# ------------------------------------------------------------------ metrics


def test_api_doc_metrics_snippet(rng):
    from satlas_sr_tpu.metrics import calculate_metric

    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    psnr = calculate_metric({"img": img, "img2": img},
                            {"type": "calculate_psnr", "crop_border": 4})
    assert psnr == float("inf")


# ----------------------------------------------------------------- torch_io


def test_api_doc_torch_io_snippet(tmp_path):
    import jax
    import jax.numpy as jnp

    from satlas_sr_tpu.archs import RRDBNet
    from satlas_sr_tpu.utils import torch_io

    m = RRDBNet(num_in_ch=6, num_out_ch=3, num_feat=8, num_block=1,
                num_grow_ch=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 6)))
    pth = str(tmp_path / "w.pth")
    torch_io.save_torch_state_dict(
        pth, torch_io.rrdbnet_to_torch(v), "params_ema")

    variables = torch_io.import_torch_checkpoint(
        "SSR_RRDBNet", pth,
        arch_opt={"num_feat": 8, "num_block": 1, "num_grow_ch": 4},
        param_key="params_ema")
    flat_a = jax.tree_util.tree_leaves(variables["params"])
    flat_b = jax.tree_util.tree_leaves(v["params"])
    assert all(np.allclose(a, b, atol=1e-6) for a, b in zip(flat_a, flat_b))


# --------------------------------------------------------------------- mesh


def test_api_doc_mesh_snippet(rng):
    from satlas_sr_tpu.parallel.mesh import data_mesh, mesh_2d, shard_batch

    mesh = data_mesh()
    assert mesh.devices.size >= 1
    batch = {"lr": (rng.rand(8, 32, 32, 6) * 255).astype(np.uint8),
             "hr": (rng.rand(8, 128, 128, 3) * 255).astype(np.uint8)}
    sharded = shard_batch(mesh, batch)
    assert sharded["lr"].shape == (8, 32, 32, 6)
    mesh2 = mesh_2d(2)
    assert set(mesh2.axis_names) == {"data", "space"}


# --------------------------------------------------- fetch registry / config


def test_api_doc_fetch_and_options_snippets(tmp_path):
    from satlas_sr_tpu.fetch import REGISTRY, fetch_artifact  # noqa: F401
    from satlas_sr_tpu.utils.options import yaml_load

    assert "esrgan_8S2" in REGISTRY
    opt = yaml_load("options/esrgan_s2naip_urban.yml")
    assert opt["model_type"] == "SSRESRGANModel"
