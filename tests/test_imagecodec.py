"""Dependency-free image codecs (BMP / PPM / PGM) + the real-decode stage.

The reference decodes uploaded images with PIL; this engine carries its own
stdlib/numpy codecs for the uncompressed formats so REAL decode runs in this
container (the same tier as the stdlib WAV / PDF-text-layer paths).  These
tests pin byte-exact round-trips, loud rejection of malformed input, and the
pipeline's agreement with an independent per-image recompute.
"""

from __future__ import annotations

import numpy as np
import pytest

from ocr_engine_ray.functions import imagecodec as ic


def _rng_image(seed: int, w: int, h: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# odd widths exercise the 4-byte BMP row padding (w*3 % 4 != 0)
@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 7), (64, 48), (255, 31)])
def test_bmp_roundtrip(w, h):
    arr = _rng_image(w * 1000 + h, w, h)
    out = ic.decode_bmp(ic.encode_bmp(arr))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, arr)


@pytest.mark.parametrize("w,h", [(1, 1), (5, 7), (255, 31)])
def test_ppm_roundtrip(w, h):
    arr = _rng_image(w * 7 + h, w, h)
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(arr)), arr)


def test_pgm_decodes_to_grey_rgb():
    grey = np.arange(24, dtype=np.uint8).reshape(4, 6)
    blob = b"P5\n6 4\n255\n" + grey.tobytes()
    out = ic.decode_pgm(blob)
    assert out.shape == (4, 6, 3)
    assert np.array_equal(out[:, :, 0], grey)
    assert np.array_equal(out[:, :, 1], grey)
    assert np.array_equal(out[:, :, 2], grey)


def test_bmp_top_down_rows():
    """Negative biHeight = top-down row order; decoder must not flip."""
    arr = _rng_image(3, 5, 4)
    blob = bytearray(ic.encode_bmp(arr[::-1]))  # encoded bottom-up of flipped
    # patch height to -4 (top-down) at BITMAPINFOHEADER offset 14+8
    import struct

    struct.pack_into("<i", blob, 14 + 8, -4)
    # bottom-up encoding of arr[::-1] re-read top-down is arr[::-1] reversed
    # back: rows stored first-on-disk are arr[::-1]'s LAST row == arr[0]
    out = ic.decode_bmp(bytes(blob))
    assert np.array_equal(out, arr)


def test_pnm_header_comments_and_whitespace():
    arr = _rng_image(9, 3, 2)
    blob = b"P6 # comment\n# another\n 3\t2 # dims\n255\n" + arr.tobytes()
    assert np.array_equal(ic.decode_ppm(blob), arr)


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"BM",
        b"P6\n3 2\n255\n" + b"\x00" * 5,  # truncated pixels
        b"P6\n3 2\n65535\n" + b"\x00" * 18,  # unsupported maxval
        b"P6\n-3 2\n255\n",  # bad token (negative -> non-digit)
        b"NOTANIMAGE",
    ],
)
def test_malformed_rejected(blob):
    with pytest.raises((ValueError, NotImplementedError)):
        ic.decode_image(blob)


def test_bmp_unsupported_variants_rejected():
    arr = _rng_image(1, 4, 4)
    blob = bytearray(ic.encode_bmp(arr))
    import struct

    struct.pack_into("<H", blob, 14 + 14, 32)  # bpp = 32
    with pytest.raises(ValueError, match="bpp=32"):
        ic.decode_bmp(bytes(blob))
    blob = bytearray(ic.encode_bmp(arr))
    struct.pack_into("<I", blob, 14 + 16, 1)  # BI_RLE8 compression
    with pytest.raises(ValueError, match="compression=1"):
        ic.decode_bmp(bytes(blob))
    with pytest.raises(ValueError, match="truncated"):
        ic.decode_bmp(ic.encode_bmp(arr)[:-1])


def test_sniff_image():
    arr = _rng_image(0, 2, 2)
    assert ic.sniff_image(ic.encode_bmp(arr)) == "bmp"
    assert ic.sniff_image(ic.encode_ppm(arr)) == "ppm"
    assert ic.sniff_image(b"P5\n1 1\n255\n\x00") == "pgm"
    assert ic.sniff_image(b"\x89PNG\r\n\x1a\nxxxx") == "png"
    assert ic.sniff_image(b"\xff\xd8\xff\xe0") == "jpeg"
    assert ic.sniff_image(b"nope") is None


def test_pattern_image_arithmetic():
    arr = ic.pattern_image(seed=7, w=4, h=3)
    assert arr.shape == (3, 4, 3)
    for y in range(3):
        for x in range(4):
            for c in range(3):
                assert arr[y, x, c] == (7 + 5 * y + 3 * x + 11 * c) % 256


def test_decode_image_dispatch_matches_codecs():
    arr = _rng_image(42, 6, 5)
    assert np.array_equal(ic.decode_image(ic.encode_bmp(arr)), arr)
    assert np.array_equal(ic.decode_image(ic.encode_ppm(arr)), arr)


def test_pipeline_matches_independent_recompute(ray_session, sf_dir):
    """Ray pipeline (encode -> REAL decode -> diag stats) == a from-scratch
    per-image recompute straight from the pattern arithmetic (no codecs)."""
    import pyarrow.parquet as pq

    from ocr_engine_ray import spec
    from ocr_engine_ray.pipelines.extract_stats import image_decode_stats

    got = image_decode_stats(sf_dir).to_pandas()

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    expected = {}
    for d in doc_ids.column("doc_id").to_pylist():
        d = int(d)
        if not (80 <= d % 100 < 90):
            continue
        for i in range(d % 4 + 1):
            s = spec.h32(d + i, 577) % 256
            w = 64 + spec.h32(d + i, 377) % 192
            h = 48 + spec.h32(d + i, 477) % 160
            fmt = ("bmp", "ppm", "pgm")[(d + i) % 3]
            y = np.arange(h, dtype=np.int64)
            x = y % w
            if fmt == "pgm":
                diag = int((3 * ((s + 5 * y + 3 * x) % 256)).sum())
            else:
                diag = int(
                    sum(((s + 5 * y + 3 * x + 11 * c) % 256).sum() for c in range(3))
                )
            expected[(d, i)] = (fmt, w, h, diag)

    assert len(got) == len(expected)
    for row in got.itertuples(index=False):
        fmt, w, h, diag = expected[(row.doc_id, row.media_idx)]
        assert (row.fmt, row.width, row.height, row.diag_sum) == (fmt, w, h, diag)
