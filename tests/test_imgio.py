"""In-memory PNG codec tests: native libpng bytes path vs PIL.

The serving daemon decodes untrusted request bytes and encodes responses via
utils.imgio.{read_png_bytes,encode_png_bytes}; these pin the native
(native/pngio.cpp pngio_decode/pngio_encode) and PIL paths to identical
pixels, the header-stage max_pixels bound, and silent fallback on malformed
input. Reference counterpart: none — ssr has no bytes codec (its CLIs only
touch files via skimage, ssr/infer.py:42-54).
"""

import io

import numpy as np
import pytest
from PIL import Image

from satlas_sr_tpu.utils import native_png
from satlas_sr_tpu.utils.imgio import encode_png_bytes, read_png_bytes

RNG = np.random.RandomState(7)

needs_native = pytest.mark.skipif(
    not native_png.available(), reason="native _pngio.so not built")


def _pil_bytes(img: np.ndarray, mode=None) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img, mode).save(buf, format="PNG")
    return buf.getvalue()


def test_bytes_roundtrip_rgb_matches_pil():
    img = (RNG.rand(96, 64, 3) * 255).astype(np.uint8)
    data = encode_png_bytes(img)
    # Any compliant decoder must recover the exact pixels.
    assert np.array_equal(np.asarray(Image.open(io.BytesIO(data))), img)
    assert np.array_equal(read_png_bytes(data), img)


def test_bytes_roundtrip_grayscale():
    gray = (RNG.rand(40, 56) * 255).astype(np.uint8)
    data = encode_png_bytes(gray[..., None])
    out = read_png_bytes(data)
    assert out.shape == (40, 56, 1)
    assert np.array_equal(out[..., 0], gray)


def test_bytes_decode_strips_alpha_and_palette():
    rgba = (RNG.rand(24, 24, 4) * 255).astype(np.uint8)
    assert np.array_equal(read_png_bytes(_pil_bytes(rgba, "RGBA")),
                          rgba[..., :3])
    pal = Image.fromarray((RNG.rand(16, 16, 3) * 255).astype(np.uint8)).quantize(32)
    buf = io.BytesIO()
    pal.save(buf, format="PNG")
    assert np.array_equal(read_png_bytes(buf.getvalue()),
                          np.asarray(pal.convert("RGB")))


def test_palette_trns_decodes_to_rgb_on_all_paths(tmp_path):
    # A palette+tRNS PNG is PALETTE color_type (no alpha mask bit) yet
    # expands to RGBA in libpng; the codec must strip the derived alpha so
    # 4 channels never escape — the file path (imgio.read_png) used to
    # return HW4 here while the bytes path returned HW3.
    pal = Image.fromarray((RNG.rand(16, 16, 3) * 255).astype(np.uint8)).quantize(32)
    buf = io.BytesIO()
    pal.save(buf, format="PNG", transparency=0)
    data = buf.getvalue()
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))[..., :3]

    assert np.array_equal(read_png_bytes(data), want)
    p = tmp_path / "trns.png"
    p.write_bytes(data)
    from satlas_sr_tpu.utils.imgio import read_png
    assert np.array_equal(read_png(str(p)), want)


def test_bytes_decode_max_pixels_raises_before_decode():
    img = np.zeros((128, 128, 3), np.uint8)
    data = encode_png_bytes(img)
    with pytest.raises(ValueError, match="pixel limit"):
        read_png_bytes(data, max_pixels=100)
    # At exactly the bound it decodes.
    assert read_png_bytes(data, max_pixels=128 * 128).shape == (128, 128, 3)


@needs_native
def test_native_decode_malformed_returns_none_silently(capfd):
    good = native_png.encode_png_bytes(np.zeros((8, 8, 3), np.uint8))
    assert native_png.decode_png_bytes(good[:20]) is None
    assert native_png.decode_png_bytes(b"not a png at all") is None
    # Serving decodes untrusted bytes: no stderr chatter per bad request.
    captured = capfd.readouterr()
    assert "libpng" not in captured.err


@needs_native
def test_native_decode_strips_16bit_to_high_byte():
    # PIL can't write 16-bit RGB; a 16-bit gray file exercises strip-16.
    g16 = (RNG.rand(12, 12) * 65535).astype(np.uint16)
    buf = io.BytesIO()
    Image.fromarray(g16, "I;16").save(buf, format="PNG")
    nat = native_png.decode_png_bytes(buf.getvalue())
    assert nat is not None and nat.shape == (12, 12, 1)
    # libpng strip-16 keeps the high byte.
    assert np.array_equal(nat[..., 0], (g16 >> 8).astype(np.uint8))


@needs_native
def test_native_decode_malformed_does_not_leak():
    # Regression: pngio_decode's pre-fix error path free()d an indeterminate
    # (register-restored nullptr) pointer after libpng's longjmp, leaking the
    # full pixel buffer per truncated-IDAT request — ~150 MB over the 200
    # decodes below. Subprocess-isolated so the parent's RSS peak (earlier
    # tests, JAX compiles) can't mask the delta: maxrss only ratchets up.
    import subprocess
    import sys

    script = """
import resource
import numpy as np
from satlas_sr_tpu.utils import native_png
img = np.random.RandomState(0).randint(0, 255, (512, 512, 3)).astype(np.uint8)
good = native_png.encode_png_bytes(img)
bad = good[: len(good) // 2]
assert native_png.decode_png_bytes(bad) is None  # warm + sanity
rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
for _ in range(200):
    assert native_png.decode_png_bytes(bad) is None
rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print((rss1 - rss0) // 1024)
"""
    out = subprocess.run([sys.executable, "-c", script], check=True,
                         capture_output=True, text=True)
    grown_mb = int(out.stdout.strip())
    assert grown_mb < 25, f"truncated-IDAT decodes leaked {grown_mb} MB"


@needs_native
def test_native_decode_fuzz_corrupted_bytes():
    # The serving daemon feeds UNTRUSTED request bytes straight into the C
    # decoder; seeded corruption sweep (truncations, bit flips, chunk
    # splices, garbage-after-magic) must never crash or raise anything but
    # ImageTooLarge. A 4000-case sweep ran clean offline; 800 here keeps the
    # suite fast while still covering every corruption mode x corpus image.
    rng = np.random.RandomState(42)
    imgs = [rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
            rng.randint(0, 255, (1, 1, 3)).astype(np.uint8),
            rng.randint(0, 255, (257, 31)).astype(np.uint8)]
    corpora = [native_png.encode_png_bytes(im) for im in imgs]
    for trial in range(800):
        base = bytearray(corpora[trial % len(corpora)])
        mode = trial % 4
        if mode == 0:
            base = base[: rng.randint(1, len(base))]
        elif mode == 1:
            for _ in range(rng.randint(1, 8)):
                base[rng.randint(len(base))] ^= 1 << rng.randint(8)
        elif mode == 2:
            i = rng.randint(len(base))
            j = rng.randint(len(base))
            base[i:i + 16] = base[j:j + 16]
        else:
            base = (bytearray(bytes.fromhex("89504e470d0a1a0a"))
                    + bytearray(rng.bytes(rng.randint(8, 512))))
        try:
            native_png.decode_png_bytes(bytes(base), max_pixels=1 << 20)
        except native_png.ImageTooLarge:
            pass  # bit flips can inflate the header dims: a request error


@needs_native
def test_native_encode_level_trades_size():
    img = np.asarray(Image.radial_gradient("L").resize((128, 128)))[..., None]
    img = np.repeat(img, 3, axis=-1)
    fast = native_png.encode_png_bytes(img, level=1)
    small = native_png.encode_png_bytes(img, level=9)
    assert len(small) <= len(fast)
    for data in (fast, small):
        assert np.array_equal(np.asarray(Image.open(io.BytesIO(data))), img)
