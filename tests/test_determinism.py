"""Determinism guarantees: same seed -> bit-identical training trajectories.

The reference offers no such guarantee (process-global `random`, cudnn
benchmark autotuning); here the whole step is a pure function of
(state, batch), the dataset RNG is (seed, epoch, index)-derived, and samplers
are seeded streams — so two runs with the same config must match exactly.
"""

import numpy as np

from satlas_sr_tpu.utils.imgio import write_png


def _make_tree(root, rng, chips=3, frames=4):
    for c in range(chips):
        chip = f"{700 + c}_{100 + c}"
        write_png(str(root / "naip" / chip / f"{chip}.png"),
                  (rng.rand(128, 128, 3) * 254 + 1).astype(np.uint8))
        write_png(str(root / "sentinel2" / chip / "tci.png"),
                  (rng.rand(frames * 32, 32, 3) * 254 + 1).astype(np.uint8))
    return str(root / "sentinel2"), str(root / "naip")


def test_l2_training_is_deterministic(tmp_path, rng):
    from satlas_sr_tpu.models import build_model

    s2, naip = _make_tree(tmp_path, rng)
    opt = {
        "name": "det", "model_type": "L2Model", "scale": 4, "manual_seed": 7,
        "is_train": True,
        "datasets": {"train": {"name": "train", "type": "S2NAIPDataset",
                               "phase": "train", "sentinel2_path": s2,
                               "naip_path": naip, "n_s2_images": 2, "use_3d": True}},
        "network_g": {"type": "SRCNN", "in_channels": 3, "mask_channels": 0,
                      "revisits": 2, "hidden_channels": 16, "out_channels": 3,
                      "kernel_size": 3, "residual_layers": 1, "output_size": 128,
                      "zoom_factor": 4, "sr_kernel_size": 1},
        "path": {},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-3, "betas": [0.9, 0.99]},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100], "gamma": 0.5},
                  "total_iter": 2, "warmup_iter": -1},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 1000},
    }
    batch = {
        "lr": (rng.rand(2, 2, 32, 32, 3) * 255).astype(np.uint8),
        "hr": (rng.rand(2, 128, 128, 3) * 255).astype(np.uint8),
    }

    def run():
        model = build_model(opt)
        logs = [model.train_iter(batch, i + 1) for i in range(2)]
        return logs

    a, b = run(), run()
    for la, lb in zip(a, b):
        for k in la:
            assert la[k] == lb[k], (k, la[k], lb[k])


def test_dataset_stream_is_deterministic(tmp_path, rng):
    from satlas_sr_tpu.data import S2NAIPDataset

    s2, naip = _make_tree(tmp_path, rng)
    opt = {"phase": "train", "sentinel2_path": s2, "naip_path": naip,
           "n_s2_images": 2, "scale": 4}
    d1 = S2NAIPDataset(dict(opt))
    d2 = S2NAIPDataset(dict(opt))
    for i in range(3):
        np.testing.assert_array_equal(d1[i]["lr"], d2[i]["lr"])
        np.testing.assert_array_equal(d1[i]["hr"], d2[i]["hr"])
