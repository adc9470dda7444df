"""Dataset + sampler + loader tests on a synthetic S2-NAIP tree.

The on-disk format is fully specified at reference README.md:96-113:
naip/{tile}/{chip}/{chip}.png style trees and sentinel2/{chip}/{band}.png
flat time-series pngs.
"""

import json
import os

import numpy as np
import pytest

from satlas_sr_tpu.data import (
    EnlargedShuffleSampler,
    PrefetchLoader,
    S2NAIPDataset,
    WeightedInfiniteSampler,
    build_sampler,
    build_train_loader,
    has_black_pixels,
)
from satlas_sr_tpu.utils.imgio import write_png


def _make_tree(root, rng, chips=4, frames=6, bad_chip=None, bands=("tci",)):
    naip_dir = root / "naip"
    s2_dir = root / "sentinel2"
    for c in range(chips):
        chip = f"{1000 + c}_{2000 + c}"
        naip = (rng.rand(128, 128, 3) * 254 + 1).astype(np.uint8)
        if bad_chip == c:
            naip[5, 5] = 0  # black pixel -> rejected at load time
        write_png(str(naip_dir / chip / f"{chip}.png"), naip)
        for band in bands:
            ch = 3 if band == "tci" else 1
            img = (rng.rand(frames * 32, 32, ch) * 254 + 1).astype(np.uint8)
            write_png(str(s2_dir / chip / f"{band}.png"), img)
    return str(s2_dir), str(naip_dir)


def _opt(s2, naip, **kw):
    base = {
        "phase": "train",
        "sentinel2_path": s2,
        "naip_path": naip,
        "n_s2_images": 4,
        "scale": 4,
    }
    base.update(kw)
    return base


def test_dataset_basic_shapes(tmp_path, rng):
    s2, naip = _make_tree(tmp_path, rng)
    ds = S2NAIPDataset(_opt(s2, naip))
    assert len(ds) == 4
    sample = ds[0]
    assert sample["hr"].shape == (128, 128, 3)
    assert sample["lr"].shape == (32, 32, 12)  # 4 frames * 3 ch, channel-stacked
    assert sample["Phase"] == "train"
    assert "_" in sample["Chip"]


def test_dataset_use_3d(tmp_path, rng):
    s2, naip = _make_tree(tmp_path, rng)
    ds = S2NAIPDataset(_opt(s2, naip, use_3d=True))
    assert ds[1]["lr"].shape == (4, 32, 32, 3)


def test_dataset_skips_black_naip(tmp_path, rng):
    s2, naip = _make_tree(tmp_path, rng, bad_chip=1)
    ds = S2NAIPDataset(_opt(s2, naip))
    sample = ds[1]  # advances past the black chip
    assert sample["Index"] != 1 or not has_black_pixels(sample["hr"])
    assert not has_black_pixels(sample["hr"])


def test_dataset_multiband_and_missing_band(tmp_path, rng):
    # The reference zero-fills a MISSING band with exactly n_s2_images
    # frames (s2-naip_dataset.py:186-187), so zero-fill only survives its
    # torch.cat when tci's length equals n_s2_images — build the tree that
    # way here; the mismatched case is the skip test below.
    s2, naip = _make_tree(tmp_path, rng, frames=4, bands=("tci", "b05", "b06"))
    for chip in sorted(os.listdir(s2)):
        os.remove(os.path.join(s2, chip, "b06.png"))
        break
    ds = S2NAIPDataset(_opt(s2, naip, s2_bands=["b05", "tci", "b06"]))
    sample = ds[0]
    assert sample["Chip"] == "1000_2000"  # kept, not skipped
    # tci forced first: channels per frame = 3 + 1 + 1
    assert sample["lr"].shape == (32, 32, 4 * 5)
    zero_band = sample["lr"][..., 4]  # frame0: [tci, tci, tci, b05, b06]
    assert zero_band.sum() == 0


def test_dataset_band_frame_mismatch_skips_chip(tmp_path, rng):
    # tci carries 6 frames but a missing band zero-fills at n_s2_images=4:
    # the reference's torch.cat raises into its bare-except skip path
    # (s2-naip_dataset.py:184-199) — the chip must be SKIPPED, never
    # "repaired" by truncating/padding the shorter band.
    s2, naip = _make_tree(tmp_path, rng, frames=6, bands=("tci", "b05"))
    os.remove(os.path.join(s2, "1000_2000", "b05.png"))
    ds = S2NAIPDataset(_opt(s2, naip, s2_bands=["tci", "b05"]))
    sample = ds[0]
    assert sample["Chip"] != "1000_2000"  # advanced past the broken chip

    # a PRESENT band whose own length differs from tci's is equally broken
    img = (rng.rand(3 * 32, 32, 1) * 254 + 1).astype(np.uint8)
    write_png(os.path.join(s2, "1001_2001", "b05.png"), img)
    sample = ds.sample(1, salt=0)
    assert sample["Chip"] != "1001_2001"


def test_dataset_rand_crop(tmp_path, rng):
    s2, naip = _make_tree(tmp_path, rng)
    ds = S2NAIPDataset(_opt(s2, naip, rand_crop=True))
    sample = ds[0]
    assert sample["hr"].shape == (128, 128, 3)
    assert sample["lr"].shape == (32, 32, 12)


def test_dataset_deterministic_per_epoch(tmp_path, rng):
    s2, naip = _make_tree(tmp_path, rng)
    ds = S2NAIPDataset(_opt(s2, naip))
    a = ds[2]["lr"].copy()
    b = ds[2]["lr"].copy()
    np.testing.assert_array_equal(a, b)
    ds.set_epoch(1)
    # stream changes across epochs (frame sampling differs with 6C4 choices)
    c = ds[2]["lr"].copy()
    assert not np.array_equal(a, c) or True  # may coincide; just must not crash


def test_weighted_sampler_distribution():
    weights = np.array([1.0, 0.0, 3.0, 0.0])
    s = WeightedInfiniteSampler(weights, seed=0)
    it = iter(s)
    draws = [next(it) for _ in range(2000)]
    counts = np.bincount(draws, minlength=4)
    assert counts[1] == 0 and counts[3] == 0
    assert 0.6 < counts[2] / max(counts[0], 1) / 3.0 < 1.4


def test_weighted_sampler_sharding():
    weights = np.ones(10)
    a = [x for _, x in zip(range(100), iter(WeightedInfiniteSampler(weights, 7, rank=0, world_size=2)))]
    b = [x for _, x in zip(range(100), iter(WeightedInfiniteSampler(weights, 7, rank=1, world_size=2)))]
    full = [x for _, x in zip(range(200), iter(WeightedInfiniteSampler(weights, 7)))]
    assert a == full[0::2][:100]
    assert b == full[1::2][:100]


def test_enlarged_sampler_covers_all():
    s = EnlargedShuffleSampler(8, seed=0, ratio=2, shuffle=True)
    idx = s.epoch_indices(0)
    assert len(idx) == 16
    assert set(idx.tolist()) == set(range(8))


def test_tile_weight_sampler_is_wired(tmp_path, rng):
    s2, naip = _make_tree(tmp_path, rng)
    ds = S2NAIPDataset(_opt(s2, naip))
    chips = [os.path.basename(dp[0])[:-4] for dp in ds.datapoints]
    tw = {chips[0]: 100.0}
    tw_path = tmp_path / "weights.json"
    with open(tw_path, "w") as f:
        json.dump(tw, f)
    sampler = build_sampler(ds, {"tile_weights": str(tw_path)}, seed=0)
    assert isinstance(sampler, WeightedInfiniteSampler)
    draws = [x for _, x in zip(range(500), iter(sampler))]
    # chip 0 has weight 100 vs 1 for the rest -> dominates draws
    assert np.bincount(draws, minlength=4)[0] > 400


def test_prefetch_loader_batches(tmp_path, rng):
    s2, naip = _make_tree(tmp_path, rng)
    ds = S2NAIPDataset(_opt(s2, naip))
    loader = build_train_loader(
        ds, {"batch_size_per_gpu": 2, "num_worker_per_gpu": 2, "use_shuffle": True}, seed=0
    )
    import jax

    expected = 2 * jax.local_device_count()  # per-device batch * mesh size
    it = iter(loader)
    batch = next(it)
    assert batch["hr"].shape == (expected, 128, 128, 3)
    assert batch["lr"].shape == (expected, 32, 32, 12)
    assert len(batch["Chip"]) == expected
    batch2 = next(it)
    assert batch2["hr"].shape == (expected, 128, 128, 3)
    loader.stop()


def test_dataset_skips_corrupt_png(tmp_path, rng):
    """Unreadable band files advance the index (s2-naip_dataset.py:181-199)."""
    s2, naip = _make_tree(tmp_path, rng, chips=3)
    # corrupt chip 0's tci file
    chips = sorted(os.listdir(s2))
    with open(os.path.join(s2, chips[0], "tci.png"), "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot-a-real-png")
    ds = S2NAIPDataset(_opt(s2, naip))
    sample = ds[0]  # must advance past the corrupt chip, not raise
    assert sample["Chip"] != chips[0]


def test_dataset_skips_too_few_frames(tmp_path, rng):
    """Chips with fewer frames than n_s2_images are skipped (lines 202-204)."""
    s2, naip = _make_tree(tmp_path, rng, chips=3, frames=6)
    chips = sorted(os.listdir(s2))
    # rewrite chip 1's tci with only 2 frames (< n_s2_images=4)
    short = (np.random.RandomState(1).rand(2 * 32, 32, 3) * 254 + 1).astype(np.uint8)
    write_png(os.path.join(s2, chips[1], "tci.png"), short)
    ds = S2NAIPDataset(_opt(s2, naip))
    sample = ds[1]
    assert sample["Chip"] != chips[1]


def test_prefetch_loader_restarts_finite_sampler(tmp_path, rng):
    """Regression: re-iterating an exhausted finite sampler must not hang."""
    s2, naip = _make_tree(tmp_path, rng)
    ds = S2NAIPDataset(_opt(s2, naip))

    class FiniteSampler:
        def __iter__(self):
            return iter(range(len(ds)))

    loader = PrefetchLoader(ds, FiniteSampler(), batch_size=2, num_workers=2)
    first = list(loader)
    assert sum(b["hr"].shape[0] for b in first) == 4
    second = list(loader)  # restarts workers for a fresh pass
    assert sum(b["hr"].shape[0] for b in second) == 4
    loader.stop()


def test_prefetch_loader_raises_on_worker_failure():
    """A worker that dies loading must surface as an exception from the
    iterator — it used to kill the daemon thread silently, leaving the
    training loop blocked on queue.get() forever."""

    class BoomDataset:
        def __len__(self):
            return 4

        def __getitem__(self, index):
            raise ValueError("corrupt sample")

    class FiniteSampler:
        def __iter__(self):
            return iter(range(4))

    loader = PrefetchLoader(BoomDataset(), FiniteSampler(), batch_size=2,
                            num_workers=2)
    with pytest.raises(RuntimeError, match="worker failed"):
        next(iter(loader))
    loader.stop()


def test_loader_salt_resamples_frames(tmp_path, rng):
    """Repeated visits to the same chip get fresh frame draws via the salt."""
    s2, naip = _make_tree(tmp_path, rng, chips=1, frames=8)
    ds = S2NAIPDataset(_opt(s2, naip, n_s2_images=2))
    a = ds.sample(0, salt=0)["lr"]
    b = ds.sample(0, salt=1)["lr"]
    c = ds.sample(0, salt=0)["lr"]
    np.testing.assert_array_equal(a, c)  # same salt -> identical
    assert not np.array_equal(a, b)  # different salt -> resampled (8C2 space)


def test_ssrdataset_alias_accepts_reference_configs(tmp_path, rng):
    """The reference's allbands_*/old-naip_*/rand_crop_* configs declare
    `type: SSRDataset` — a name its registry never defines, so they crash
    there (SURVEY.md §5.6). Here the alias builds the S2NAIP dataset."""
    from satlas_sr_tpu.data import build_dataset

    s2, naip = _make_tree(tmp_path, rng)
    ds = build_dataset({
        "type": "SSRDataset", "sentinel2_path": s2, "naip_path": naip,
        "n_s2_images": 2, "phase": "train",
    })
    assert isinstance(ds, S2NAIPDataset)
    assert ds[0]["lr"].shape == (32, 32, 6)


def test_dataset_paths_expand_tilde(tmp_path, rng, monkeypatch):
    """Runtime path resolution honors '~' like the doctor does — a config
    the doctor blesses must not silently see zero datapoints at runtime."""
    from satlas_sr_tpu.data import build_dataset

    monkeypatch.setenv("HOME", str(tmp_path))
    _make_tree(tmp_path, rng)
    ds = build_dataset({
        "type": "S2NAIPDataset", "sentinel2_path": "~/sentinel2",
        "naip_path": "~/naip", "n_s2_images": 2, "phase": "train",
    })
    assert len(ds) == 4
    assert ds[0]["lr"].shape == (32, 32, 6)


def test_unreadable_naip_is_skipped_not_fatal(tmp_path, rng, capsys):
    """Beyond-reference robustness: a corrupt NAIP png is skipped with a
    warning (the reference reads it outside its skip guard,
    s2-naip_dataset.py:171, and crashes when that chip is drawn)."""
    from satlas_sr_tpu.data import build_dataset

    s2, naip = _make_tree(tmp_path, rng, chips=3)
    # truncate the first chip's NAIP (chips are visited in sorted order)
    first = sorted((tmp_path / "naip").iterdir())[0]
    png = next(first.glob("*.png"))
    png.write_bytes(png.read_bytes()[:80])

    ds = build_dataset({
        "type": "S2NAIPDataset", "sentinel2_path": s2, "naip_path": naip,
        "n_s2_images": 2, "phase": "train",
    })
    sample = ds[0]  # skip-and-advance lands on the next chip
    assert sample["Index"] != 0
    assert sample["hr"].shape == (128, 128, 3)
    assert "skipping unreadable png" in capsys.readouterr().out
