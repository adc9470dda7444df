"""Host-side helpers for GT-free inference.

Parity with ssr/utils/infer_utils.py:
- format_s2naip_data (infer_utils.py:6-39): reshape a flat [T*32, 32, 3] png
  to frames, split good/bad frames by the *inference* black predicate (any
  zero element — numpy `[0,0,0] in ts` semantics, deliberately different from
  training's channel-sum test; SURVEY.md §2.8), sample n good-first, stack to
  a channel-stacked model input.
- stitch (infer_utils.py:41-60): assemble a grid of {i}_{j}.png chunks into a
  single image, vectorised on the host.

TPU-first deviation: formatting is batch-oriented. format_s2naip_batch
prepares many pngs into one uint8 [B, 32, 32, T*3] array so a single jitted
device program does /255 normalisation and the forward pass (uint8 over PCIe,
not float32 — 4x less host->device traffic than the reference's per-png loop).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .imgio import read_png, write_png


def select_frames(
    frame_is_bad: np.ndarray, n_images: int, rng: np.random.RandomState
) -> List[int]:
    """Pick n frame indices, sampling valid frames first (reference policy)."""
    goods = [i for i, bad in enumerate(frame_is_bad) if not bad]
    bads = [i for i, bad in enumerate(frame_is_bad) if bad]
    if len(goods) >= n_images:
        idx = rng.choice(len(goods), size=n_images, replace=False)
        return [goods[i] for i in idx]
    need = n_images - len(goods)
    extra = rng.choice(len(bads), size=need, replace=False)
    return goods + [bads[i] for i in extra]


def format_s2naip_data(
    s2_data: np.ndarray, n_s2_images: int, rng: np.random.RandomState | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """[T*32, 32, 3] uint8 -> ([32, 32, T*3] uint8 channel-stacked, first frame).

    Inference black-frame predicate: a frame is bad if ANY element is zero
    (numpy membership semantics of the reference, infer_utils.py:17).
    """
    rng = rng or np.random.RandomState(0)
    chunks = s2_data.reshape(-1, 32, 32, 3)
    preview = chunks[0]
    frame_is_bad = (chunks == 0).any(axis=(1, 2, 3))
    indices = select_frames(frame_is_bad, n_s2_images, rng)
    picked = chunks[indices]  # [T, 32, 32, 3]
    stacked = np.concatenate(list(picked), axis=-1)  # [32, 32, T*3]
    return stacked, preview


def format_s2naip_batch(
    pngs: Sequence[str], n_s2_images: int, seed: int = 0, workers: int = 4,
    index_offset: int = 0, indices: Optional[Sequence[int]] = None,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Decode + format many pngs into one [B, 32, 32, T*3] uint8 batch.

    Decode is ONE native call per batch (pngio_read_many: a C++ thread pool
    inside the extension — no per-file Python/ctypes overhead); formatting is
    numpy on the decoded arrays. Falls back to a Python thread pool driving
    single-file reads when the batched native entry point is unavailable.

    Frame-selection RNG is seeded by the GLOBAL image index
    (seed + index_offset + i, or seed + indices[i] when explicit per-image
    indices are given — the skip_existing resume path, where the surviving
    corpus is no longer contiguous), so a corpus formats identically
    regardless of how it is batched or filtered.
    """
    from .native_png import read_png_many

    decoded = None
    try:
        decoded = read_png_many(list(pngs))
    except Exception:
        decoded = None

    def fmt(i, arr):
        gi = indices[i] if indices is not None else index_offset + i
        rng = np.random.RandomState(seed + gi)
        return format_s2naip_data(arr, n_s2_images, rng)

    if decoded is not None:
        results = [
            fmt(i, arr if arr is not None else read_png(pngs[i]))
            for i, arr in enumerate(decoded)
        ]
    else:
        from concurrent.futures import ThreadPoolExecutor

        def load(args):
            i, path = args
            return fmt(i, read_png(path))

        if len(pngs) > 1 and workers > 1:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                results = list(pool.map(load, enumerate(pngs)))
        else:
            results = [load(x) for x in enumerate(pngs)]
    inputs = [r[0] for r in results]
    previews = [r[1] for r in results]
    return np.stack(inputs), previews


def assemble_tile(
    tile_dir: str, n_s2_images: int, seed: int = 0, grid_size: int = 16,
    index_map: dict | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Assemble a tile's {i}_{j}.png chunk grid into ONE whole-tile input.

    Whole-tile mode (beyond the reference, which only chunk-and-stitches —
    ssr/infer_grid.py:41-66): each 32x32 chunk's frames are selected with the
    same good-first policy as format_s2naip_data, then placed at
    (i*32, j*32) in a [grid*32, grid*32, T*3] canvas. The generator is fully
    convolutional, so running it once on the canvas yields a SEAMLESS SR tile
    (chunked inference has zero-pad context at every interior chunk edge).

    Returns (canvas, preview) — preview is each chunk's first frame, i.e. the
    whole-tile analog of stitched_s2.png.

    `index_map` (path -> global corpus index) makes frame selection match the
    chunked CLI exactly, which seeds each chunk's RNG by its position in the
    sorted recursive glob; without it the RNG is seeded by the in-tile index.
    """
    from .native_png import read_png_many

    paths = [
        os.path.join(tile_dir, f"{i}_{j}.png")
        for i in range(grid_size)
        for j in range(grid_size)
    ]
    try:
        decoded = read_png_many(paths)
    except Exception:
        decoded = [None] * len(paths)
    size = grid_size * 32
    canvas = np.zeros((size, size, 3 * n_s2_images), np.uint8)
    preview = np.zeros((size, size, 3), np.uint8)
    for k, path in enumerate(paths):
        arr = decoded[k] if decoded[k] is not None else read_png(path)
        idx = index_map[path] if index_map is not None else k
        rng = np.random.RandomState(seed + idx)
        stacked, first = format_s2naip_data(arr, n_s2_images, rng)
        i, j = divmod(k, grid_size)
        canvas[i * 32:(i + 1) * 32, j * 32:(j + 1) * 32] = stacked
        preview[i * 32:(i + 1) * 32, j * 32:(j + 1) * 32] = first
    return canvas, preview


def stitch(
    chunks_dir: str,
    img_size: int,
    save_path: str,
    scale: int = 4,
    grid_size: int = 16,
    sentinel2: bool = False,
) -> None:
    """Assemble {i}_{j}.png chunks for i,j in [0, grid_size) into one image."""
    chunk = img_size // grid_size
    canvas = np.zeros((img_size, img_size, 3), dtype=np.uint8)
    for i in range(grid_size):
        for j in range(grid_size):
            tile = read_png(os.path.join(chunks_dir, f"{i}_{j}.png"))
            if sentinel2:
                tile = tile.reshape(-1, 32, 32, 3)[0]
            canvas[i * chunk : (i + 1) * chunk, j * chunk : (j + 1) * chunk] = tile
    write_png(save_path, canvas)


def normalize_bands(s2_bands) -> List[str]:
    """Band list with tci forced to the front (the training loader's rule,
    data/s2naip.py; reference s2-naip_dataset.py:73-75)."""
    bands = [str(b) for b in (s2_bands or ["tci"])]
    if "tci" in bands:
        bands.remove("tci")
    return ["tci"] + bands


def channels_per_frame(s2_bands) -> int:
    """Per-frame channel count for a band list: tci carries 3, others 1
    (reference s2-naip_dataset.py:184-199)."""
    return 2 + len(normalize_bands(s2_bands))


def load_band_stack(chip_dir: str, bands: Sequence[str]) -> np.ndarray:
    """Dataset-layout chip dir ({chip_dir}/{band}.png) -> [T, 32, 32, C_total].

    Band semantics mirror the training loader (data/s2naip.py _load_bands;
    reference s2-naip_dataset.py:184-199): tci is 3-channel and REQUIRED,
    other bands are 1-channel, a missing band file zero-fills at tci's frame
    count. Where training silently skips a chip whose bands disagree on frame
    count, GT-free inference raises — there is no next chip to advance to.
    """
    tci_path = os.path.join(chip_dir, "tci.png")
    tci = read_png(tci_path)  # raises when missing/undecodable
    if tci.shape[0] % 32 != 0 or tci.shape[1] != 32 or tci.shape[-1] != 3:
        raise ValueError(f"{tci_path}: expected [T*32, 32, 3], got {tci.shape}")
    n_frames = tci.shape[0] // 32
    per_band = [tci.reshape(n_frames, 32, 32, 3)]
    for band in bands:
        if band == "tci":
            continue
        path = os.path.join(chip_dir, f"{band}.png")
        if not os.path.exists(path):
            per_band.append(np.zeros((n_frames, 32, 32, 1), np.uint8))
            continue
        img = read_png(path)
        if img.shape[0] % 32 != 0 or img.shape[1] != 32:
            raise ValueError(f"{path}: expected [T*32, 32, C], got {img.shape}")
        if img.shape[0] // 32 != n_frames:
            raise ValueError(
                f"{path}: {img.shape[0] // 32} frames but tci has {n_frames}")
        per_band.append(img.reshape(n_frames, 32, 32, img.shape[-1]))
    return np.concatenate(per_band, axis=-1)


def format_s2naip_multiband(
    chip_dir: str, bands: Sequence[str], n_s2_images: int,
    rng: np.random.RandomState | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Chip dir -> ([32, 32, T*C_total] channel-stacked uint8, tci preview).

    Frame goodness is judged on tci with the INFERENCE predicate (any zero
    element — format_s2naip_data above); selected frames carry all bands.
    """
    rng = rng or np.random.RandomState(0)
    stack = load_band_stack(chip_dir, bands)
    tci = stack[..., :3]
    frame_is_bad = (tci == 0).any(axis=(1, 2, 3))
    indices = select_frames(frame_is_bad, n_s2_images, rng)
    picked = stack[indices]  # [T, 32, 32, C_total]
    return np.concatenate(list(picked), axis=-1), stack[0, ..., :3]


def format_s2naip_multiband_batch(
    chip_dirs: Sequence[str], bands: Sequence[str], n_s2_images: int,
    seed: int = 0, index_offset: int = 0,
    indices: Optional[Sequence[int]] = None,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Many chip dirs -> ([B, 32, 32, T*C_total] uint8, tci previews).

    Same global-index RNG seeding contract as format_s2naip_batch: the
    formatted corpus is invariant to batch size, process sharding and
    skip_existing filtering.
    """
    inputs, previews = [], []
    for i, chip_dir in enumerate(chip_dirs):
        gi = indices[i] if indices is not None else index_offset + i
        rng = np.random.RandomState(seed + gi)
        x, preview = format_s2naip_multiband(chip_dir, bands, n_s2_images, rng)
        inputs.append(x)
        previews.append(preview)
    return np.stack(inputs), previews
