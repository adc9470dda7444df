"""PNG read/write for the host-side pipeline.

Images are RGB uint8 HWC end-to-end (the reference's skimage/tensor2img paths
net out to RGB files as well). The native C++ decode path (native/pngio.cpp)
is used when built — it releases the GIL and decodes with libpng directly;
PIL is the fallback.
"""

from __future__ import annotations

import os

import numpy as np


def _native_lib():
    from . import native_png

    return native_png if native_png.available() else None


def _native_or_none():
    # The native module is optional (build.sh not run, stale .so, broken
    # libpng): any failure here means "fall back to PIL", never an error.
    try:
        return _native_lib()
    except Exception:
        return None


def read_png(path: str) -> np.ndarray:
    """Read a PNG into an HWC uint8 array (grayscale -> HW1)."""
    native = _native_or_none()
    if native is not None:
        arr = native.read_png(path)
        if arr is not None:
            return arr
    from PIL import Image

    with Image.open(path) as im:
        if im.mode not in ("RGB", "L", "RGBA"):
            im = im.convert("RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    return np.ascontiguousarray(arr)


def read_png_bytes(data: bytes, max_pixels: int = 0) -> np.ndarray:
    """Decode in-memory PNG bytes to an HWC uint8 array (grayscale -> HW1).

    Serving-path helper (satlas_sr_tpu/serve.py): requests arrive as bytes,
    not files. The native GIL-free libpng codec (native/pngio.cpp
    pngio_decode) is used when built — the HTTP host's core stays free for
    request plumbing while decode runs native; PIL is the fallback.

    `max_pixels > 0` bounds the decoded size from the (cheap, header-only)
    open BEFORE pixel data is decompressed — a small PNG body can inflate to
    hundreds of MB, so servers must cap it pre-decode.
    """
    native = _native_or_none()
    if native is not None:
        # ImageTooLarge propagates (request error, not a codec gap). The C
        # codec strips every alpha source (incl. palette tRNS): gray/RGB only.
        arr = native.decode_png_bytes(data, max_pixels=max_pixels)
        if arr is not None:
            return arr
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        if max_pixels and im.size[0] * im.size[1] > max_pixels:
            raise ValueError(
                f"image {im.size} exceeds {max_pixels} pixel limit")
        if im.mode not in ("RGB", "L", "RGBA"):
            im = im.convert("RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    return np.ascontiguousarray(arr)


def encode_png_bytes(img: np.ndarray) -> bytes:
    """Encode an HWC uint8 array as PNG bytes (in memory).

    Native libpng at zlib level 1 when built (the same throughput-over-ratio
    choice as write_png — serving responses are transient, not archives);
    PIL fallback otherwise."""
    native = _native_or_none()
    if native is not None:
        out = native.encode_png_bytes(img)
        if out is not None:
            return out
    import io

    from PIL import Image

    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def write_png(path: str, img: np.ndarray) -> None:
    """Write an HWC uint8 array as a PNG (creates parent dirs)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    native = _native_or_none()
    if native is not None and native.write_png(path, img):
        return
    from PIL import Image

    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    Image.fromarray(img).save(path)
