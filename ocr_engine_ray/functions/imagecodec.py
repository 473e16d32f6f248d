"""Pure-stdlib/numpy image codecs (BMP 24-bit, PPM/PGM binary).

The reference decodes uploaded images with PIL (`ocr_any.py` image branch);
this container ships no imaging library, so the engine carries its own
dependency-free decoders for the uncompressed formats a pipeline can always
fall back to — the same pattern as the stdlib ``wave`` audio path.  PNG/JPEG
stay behind the PIL seam in ``stages/multimodal.py``.

Formats:

* **BMP** — 24-bit uncompressed ``BITMAPINFOHEADER``, bottom-up or top-down
  row order, 4-byte-padded rows (the only BMP variant worth writing; the
  decoder validates and rejects everything else loudly).
* **PPM (P6) / PGM (P5)** — binary NetPBM with maxval 255.

All decoders return ``uint8`` RGB arrays of shape ``(h, w, 3)`` (PGM is
expanded to grey RGB) and raise ``ValueError`` on truncated or malformed
input — never garbage pixels.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # 40-byte BITMAPINFOHEADER


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3) uint8`` RGB array as a bottom-up 24-bit BMP."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"encode_bmp needs (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    # RGB -> BGR, bottom row first
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    data_offset = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    payload = rows.tobytes()
    head = _BMP_FILE_HDR.pack(b"BM", data_offset + len(payload), 0, 0, data_offset)
    info = _BMP_INFO_HDR.pack(40, w, h, 1, 24, 0, len(payload), 2835, 2835, 0, 0)
    return head + info + payload


def decode_bmp(blob: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an ``(h, w, 3) uint8`` RGB array.

    Accepts bottom-up (positive height) and top-down (negative height) rows;
    raises ``ValueError`` on any other variant or on truncation.
    """
    if len(blob) < _BMP_FILE_HDR.size + 4 or blob[:2] != b"BM":
        raise ValueError("not a BMP (bad magic or truncated header)")
    _, _file_size, _, _, data_offset = _BMP_FILE_HDR.unpack_from(blob, 0)
    (hdr_size,) = struct.unpack_from("<I", blob, _BMP_FILE_HDR.size)
    if hdr_size < 40 or len(blob) < _BMP_FILE_HDR.size + hdr_size:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    (_, w, h_signed, planes, bpp, compression, *_rest) = _BMP_INFO_HDR.unpack_from(
        blob, _BMP_FILE_HDR.size
    )
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (planes={planes} bpp={bpp} compression={compression});"
            " only 24-bit BI_RGB is supported"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    row_bytes = (w * 3 + 3) & ~3
    need = data_offset + row_bytes * h
    if len(blob) < need:
        raise ValueError(f"truncated BMP pixel data ({len(blob)} < {need} bytes)")
    rows = np.frombuffer(blob, dtype=np.uint8, count=row_bytes * h, offset=data_offset)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


# ---------------------------------------------------------------------------
# NetPBM: PPM (P6) / PGM (P5), binary, maxval 255
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3) uint8`` RGB array as a binary P6 PPM."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"encode_ppm needs (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _pnm_header(blob: bytes, magic: bytes) -> tuple[int, int, int]:
    """Parse ``magic w h maxval`` with whitespace/comments; return
    (width, height, pixel-data offset)."""
    if blob[:2] != magic:
        raise ValueError(f"not a {magic.decode()} file")
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(blob):
            raise ValueError("truncated PNM header")
        c = blob[pos : pos + 1]
        if c == b"#":  # comment to end of line
            nl = blob.find(b"\n", pos)
            if nl < 0:
                raise ValueError("truncated PNM comment")
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(blob) and not blob[end : end + 1].isspace():
                end += 1
            tok = blob[pos:end]
            if not tok.isdigit():
                raise ValueError(f"bad PNM header token {tok!r}")
            fields.append(int(tok))
            pos = end
    if pos >= len(blob) or not blob[pos : pos + 1].isspace():
        raise ValueError("PNM header not terminated by whitespace")
    pos += 1  # exactly one whitespace byte before pixel data
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PNM maxval {maxval} (only 255)")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNM dimensions {w}x{h}")
    return w, h, pos


def decode_ppm(blob: bytes) -> np.ndarray:
    """Decode a binary P6 PPM into an ``(h, w, 3) uint8`` RGB array."""
    w, h, off = _pnm_header(blob, b"P6")
    need = off + w * h * 3
    if len(blob) < need:
        raise ValueError(f"truncated PPM pixel data ({len(blob)} < {need} bytes)")
    return (
        np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=off)
        .reshape(h, w, 3)
        .copy()
    )


def decode_pgm(blob: bytes) -> np.ndarray:
    """Decode a binary P5 PGM into an ``(h, w, 3) uint8`` grey-RGB array."""
    w, h, off = _pnm_header(blob, b"P5")
    need = off + w * h
    if len(blob) < need:
        raise ValueError(f"truncated PGM pixel data ({len(blob)} < {need} bytes)")
    grey = np.frombuffer(blob, dtype=np.uint8, count=w * h, offset=off).reshape(h, w)
    return np.repeat(grey[:, :, None], 3, axis=2)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

#: magic-byte sniffing for the formats the engine can meet in the wild;
#: 'png'/'jpeg'/'gif' are recognized (for routing/telemetry) even though
#: decoding them needs the PIL seam.
_MAGIC = [
    (b"BM", "bmp"),
    (b"P6", "ppm"),
    (b"P5", "pgm"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
]


def sniff_image(blob: bytes) -> str | None:
    """Best-effort format sniff from magic bytes; None if unrecognized."""
    for magic, name in _MAGIC:
        if blob[: len(magic)] == magic:
            return name
    return None


def decode_image(blob: bytes) -> np.ndarray:
    """Decode any supported image blob to ``(h, w, 3) uint8`` RGB.

    BMP/PPM/PGM decode here with zero dependencies; PNG/JPEG/GIF route
    through PIL when it is installed and raise ``NotImplementedError``
    otherwise (the same env-gated seam as ``stages.multimodal``).
    """
    fmt = sniff_image(blob)
    if fmt == "bmp":
        return decode_bmp(blob)
    if fmt == "ppm":
        return decode_ppm(blob)
    if fmt == "pgm":
        return decode_pgm(blob)
    if fmt in ("png", "jpeg", "gif"):
        try:
            import io

            from PIL import Image
        except ImportError:
            raise NotImplementedError(
                f"decoding {fmt} requires PIL, which is not installed; "
                "BMP/PPM/PGM decode natively"
            ) from None
        with Image.open(io.BytesIO(blob)) as im:
            return np.asarray(im.convert("RGB"))
    raise ValueError("unrecognized image format (no known magic bytes)")


# ---------------------------------------------------------------------------
# Deterministic test pattern (SQL-reproducible pixels)
# ---------------------------------------------------------------------------


def pattern_image(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB gradient: ``px[y, x, c] = (seed + 5y + 3x + 11c) % 256``.

    Every pixel is plain integer arithmetic, so any per-pixel statistic of a
    decoded pattern image can be recomputed wholesale in ANSI SQL — the
    image-modality analog of the h32 count arithmetic used by the text
    stand-ins.
    """
    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((seed + 5 * y + 3 * x + 11 * c) % 256).astype(np.uint8)
