import numpy as np
import pytest

from who_owns_mass_processing_spark import codecs


def _img(seed=0, shape=(40, 56, 3)):
    return np.random.default_rng(seed).integers(0, 256, shape).astype(np.uint8)


def test_png_roundtrip_lossless():
    px = _img()
    assert (codecs.png_decode(codecs.png_encode(px)) == px).all()


def test_png_decode_filtered_rows():
    # exercise the filter-1/2 decode paths with a hand-built PNG
    import struct
    import zlib

    px = _img(1, (4, 4, 3))
    h, w = px.shape[:2]
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        line = px[y].reshape(-1)
        if y % 2 == 0:  # Up filter
            raw.append(2)
            raw.extend(((line.astype(np.int32) - prev) % 256).astype(np.uint8).tobytes())
        else:  # None
            raw.append(0)
            raw.extend(line.tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        codecs.PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._chunk(b"IEND", b"")
    )
    assert (codecs.png_decode(data) == px).all()


@pytest.mark.parametrize("quality", [75, 85, 95])
def test_qjp_lossy_psnr_above_40(quality):
    px = _img(2)
    out = codecs.qjp_decode(codecs.qjp_encode(px, quality))
    assert codecs.psnr(px, out) >= 40.0


def test_psnr_identical_is_inf():
    px = _img(3)
    assert codecs.psnr(px, px) == float("inf")


def test_phash_stable_under_small_noise():
    rng = np.random.default_rng(4)
    low = rng.integers(0, 256, (8, 8, 3)).astype(np.float64)
    base = np.repeat(np.repeat(low, 8, axis=0), 8, axis=1).clip(0, 255).astype(np.uint8)
    noised = (base.astype(np.float64) + rng.normal(0, 2, base.shape)).clip(0, 255).astype(np.uint8)
    d = codecs.hamming64(codecs.phash64(base), codecs.phash64(noised))
    assert d <= 6


def test_phash_distinguishes_distinct_images():
    rng = np.random.default_rng(5)
    dists = []
    for i in range(20):
        a = np.repeat(np.repeat(rng.integers(0, 256, (8, 8, 3)), 8, 0), 8, 1).astype(np.uint8)
        b = np.repeat(np.repeat(rng.integers(0, 256, (8, 8, 3)), 8, 0), 8, 1).astype(np.uint8)
        dists.append(codecs.hamming64(codecs.phash64(a), codecs.phash64(b)))
    assert np.median(dists) > 20


def test_decode_image_sniffs_magic():
    px = _img(6)
    assert (codecs.decode_image(codecs.png_encode(px)) == px).all()
    assert codecs.decode_image(codecs.qjp_encode(px, 90)).shape == px.shape
    with pytest.raises((NotImplementedError, ValueError)):
        codecs.decode_image(b"\x00\x01garbage", "tiff")
