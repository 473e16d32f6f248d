"""Multimodal (image/audio/video/document) stage plumbing.

Media are opaque references (``media_ref``; at scale, ``binary`` columns or
object-store URIs) with typed metadata.  Decode kernels come in three
tiers:

- **REAL and live in this container** (stdlib-only): `docx_parse_opc`
  (zipfile + ElementTree OPC walk), `PdfTextExtractor` /
  `functions.pdftext` (ISO-32000-subset text layer), `AudioFramer`'s WAV
  header parse (stdlib ``wave``);
- **REAL but env-gated** on libraries this container doesn't ship:
  `rasterize_pdf_pages` (fitz), `MediaDecoder._decode_real` (PIL),
  `docx_image_parts` (python-docx) — working implementations behind
  ``NotImplementedError`` seams with importorskip'd tests;
- **deterministic stand-ins** used by the SQL-gated pipelines:
  metadata as pure arithmetic of the media ref (SQL-reproducible:
  ``320 + h32(doc_num, 77+idx) % 1280`` etc.).

``frame_sample_plan`` / ``audio_window_plan`` are the exact-integer plan
arithmetic every stage shares regardless of tier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import spec, synth

MEDIA_META_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_idx", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("format", pa.string()),
    ]
)

try:  # pragma: no cover - PIL absent in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

try:  # pragma: no cover - PyMuPDF absent in this container
    import fitz  # noqa: F401

    _HAVE_FITZ = True
except ImportError:
    _HAVE_FITZ = False

try:  # pragma: no cover - python-docx absent in this container
    import docx  # noqa: F401

    _HAVE_DOCX = True
except ImportError:
    _HAVE_DOCX = False


def rasterize_pdf_pages(blob: bytes, *, zoom: float = 2.5) -> list[dict]:
    """Env-gated REAL PDF rasterization — the kernel a `MediaDecoder`-style
    actor pool would run per PDF payload.  Matches the reference semantics
    (ocr_any.py:308-320): open the document, render every page through a
    ``fitz.Matrix(zoom, zoom)`` pixmap with ``alpha=False`` (RGB8), pages
    numbered from 1.  Returns one dict per page:
    ``{page, width, height, rgb}`` where ``rgb`` is the raw RGB byte
    buffer (len == width*height*3) ready for a downstream OCR model stage.

    Raises ``NotImplementedError`` when PyMuPDF is absent (this container);
    exercised by the ``pytest.importorskip("fitz")`` test, which activates
    the moment the dependency exists."""
    if not _HAVE_FITZ:
        raise NotImplementedError(
            "Real PDF rasterization requires PyMuPDF (fitz), which is not "
            "available in this environment; the pipelines use the "
            "deterministic media_page stand-in instead."
        )
    import fitz

    doc = fitz.open(stream=blob, filetype="pdf")
    try:
        mat = fitz.Matrix(zoom, zoom)
        pages = []
        for i, page in enumerate(doc, start=1):
            pix = page.get_pixmap(matrix=mat, alpha=False)
            pages.append(
                {
                    "page": i,
                    "width": int(pix.width),
                    "height": int(pix.height),
                    "rgb": bytes(pix.samples),
                }
            )
        return pages
    finally:
        doc.close()


def docx_image_parts(blob: bytes) -> list[dict]:
    """Env-gated REAL DOCX embedded-image extraction — the OPC
    image-relationship walk of the reference (ocr_any.py:361-385): iterate
    the document part's relationships, keep ``RELATIONSHIP_TYPE.IMAGE``
    targets, and surface each image part's bytes with its extension-derived
    MIME (`functions.model.mime_from_docx_ext` — the same ext→MIME table the
    reference spells inline).  Returns one dict per image relationship, in
    relationship order: ``{idx, ext, mime, blob}``.

    Raises ``NotImplementedError`` when python-docx is absent (this
    container); exercised by the ``pytest.importorskip("docx")`` test."""
    if not _HAVE_DOCX:
        raise NotImplementedError(
            "Real DOCX image extraction requires python-docx, which is not "
            "available in this environment; the pipelines use the "
            "deterministic media_docx stand-in instead."
        )
    import io

    from docx import Document
    from docx.opc.constants import RELATIONSHIP_TYPE as RT

    from ..functions.model import mime_from_docx_ext

    d = Document(io.BytesIO(blob))
    out = []
    idx = 0
    for rel in d.part.rels.values():
        if rel.reltype == RT.IMAGE:
            # Externally-linked pictures (INCLUDEPICTURE) have no target
            # part to dereference — target_part raises for external mode.
            if rel.is_external:
                continue
            part = rel.target_part
            ext = (part.partname.ext or "").lower().lstrip(".")
            out.append(
                {
                    "idx": idx,
                    "ext": ext,
                    "mime": mime_from_docx_ext(ext),
                    "blob": part.blob,
                }
            )
            idx += 1
    return out


_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_IMAGE_RELTYPE = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships/image"
)


def _opc_para_text(p) -> str:
    """Visible text of one ``w:p``: all ``w:t`` runs concatenated, ``w:tab``
    as a tab, ``w:br``/``w:cr`` as a newline (python-docx run semantics,
    hyperlink runs included)."""
    out: list[str] = []
    for node in p.iter():
        tag = node.tag
        if tag == _W_NS + "t":
            out.append(node.text or "")
        elif tag == _W_NS + "tab":
            out.append("\t")
        elif tag in (_W_NS + "br", _W_NS + "cr"):
            out.append("\n")
    return "".join(out)


def docx_parse_opc(blob: bytes) -> dict:
    """REAL DOCX parsing on the stdlib only (zipfile + ElementTree — a
    .docx is a zip of OPC XML parts, so no python-docx is needed), LIVE in
    this container: the working counterpart of the env-gated
    `docx_image_parts`, with the reference's structure (ocr_any.py:349-359
    text walk, ocr_any.py:361-385 image-relationship walk):

    - ``paragraphs``: body-level ``w:p`` text in document order (table
      cells excluded, as in ``Document.paragraphs``);
    - ``tables``: body-level ``w:tbl`` as rows x cells, each cell the
      ``"\\n"``-join of its paragraphs (``Cell.text`` semantics; nested
      content flattens into its cell);
    - ``images``: the document part's image relationships in rels-XML
      order, external-target (INCLUDEPICTURE) entries skipped, each as
      ``{idx, ext, mime, blob}`` with the same ext→MIME table as the
      reference (`functions.model.mime_from_docx_ext`).

    Feed the text parts to `functions.lines.docx_to_text` for the
    reference's flatten.
    """
    import io
    import posixpath
    import xml.etree.ElementTree as ET
    import zipfile

    from ..functions.model import mime_from_docx_ext

    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        body = ET.fromstring(zf.read("word/document.xml")).find(_W_NS + "body")
        paragraphs: list[str] = []
        tables: list[list[list[str]]] = []
        if body is not None:
            for child in body:
                if child.tag == _W_NS + "p":
                    paragraphs.append(_opc_para_text(child))
                elif child.tag == _W_NS + "tbl":
                    tables.append(
                        [
                            [
                                "\n".join(
                                    _opc_para_text(p)
                                    for p in tc.iter(_W_NS + "p")
                                )
                                for tc in tr.findall(_W_NS + "tc")
                            ]
                            for tr in child.findall(_W_NS + "tr")
                        ]
                    )
        images: list[dict] = []
        rels_name = "word/_rels/document.xml.rels"
        if rels_name in zf.namelist():
            idx = 0
            for rel in ET.fromstring(zf.read(rels_name)).findall(
                _REL_NS + "Relationship"
            ):
                if rel.get("Type") != _IMAGE_RELTYPE:
                    continue
                if (rel.get("TargetMode") or "").lower() == "external":
                    continue
                target = rel.get("Target") or ""
                part = posixpath.normpath(posixpath.join("word", target))
                ext = posixpath.splitext(part)[1].lower().lstrip(".")
                images.append(
                    {
                        "idx": idx,
                        "ext": ext,
                        "mime": mime_from_docx_ext(ext),
                        "blob": zf.read(part),
                    }
                )
                idx += 1
    return {"paragraphs": paragraphs, "tables": tables, "images": images}


def docx_extract_text(blob: bytes) -> str:
    """Reference-flattened text of real DOCX bytes: `docx_parse_opc` +
    `functions.lines.docx_to_text` (ocr_any.py:349-359)."""
    from ..functions.lines import docx_to_text

    d = docx_parse_opc(blob)
    return docx_to_text(d["paragraphs"], d["tables"])


def fake_image_meta(media_ref: str) -> tuple[int, int, str]:
    """Deterministic stand-in image metadata (arithmetic in doc_num —
    reproducible in ANSI SQL)."""
    doc_id, idx = synth.parse_media_ref(media_ref)
    num = synth.doc_num_from_id(doc_id)
    w = 320 + spec.h32(num, 77 + idx) % 1280
    h = 240 + spec.h32(num, 177 + idx) % 800
    return w, h, "png"


class MediaDecoder:
    """Actor-pool decode stage: ``map_batches(MediaDecoder, concurrency=N)``.

    ``use_fake=True`` (default here) uses the deterministic stand-in;
    ``use_fake=False`` requires PIL and real bytes.
    """

    def __init__(self, use_fake: bool = True):
        self.use_fake = use_fake
        if not use_fake and not _HAVE_PIL:
            raise NotImplementedError(
                "Real image decode requires PIL, which is not available in "
                "this environment; construct MediaDecoder(use_fake=True)."
            )

    def _decode_real(self, blob: bytes) -> tuple[int, int, str]:
        """Real PIL decode — env-gated (PIL absent in this container), but a
        working implementation, activated the moment deps exist; exercised
        by the ``pytest.importorskip("PIL")`` test in
        tests/test_artifact_roundtrip.py."""
        import io

        from PIL import Image

        with Image.open(io.BytesIO(blob)) as im:
            return int(im.width), int(im.height), (im.format or "unknown").lower()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        if self.use_fake:
            blobs = [None] * len(refs)
        else:
            # Real decode consumes the opaque binary payload column.
            if "media_blob" not in batch.column_names:
                raise ValueError(
                    "MediaDecoder(use_fake=False) requires a media_blob "
                    "binary column carrying the image bytes"
                )
            blobs = batch.column("media_blob").to_pylist()
        w, h, fmt, mi = [], [], [], []
        for ref, blob in zip(refs, blobs):
            wi, hi, f = (
                fake_image_meta(ref) if self.use_fake else self._decode_real(blob)
            )
            w.append(wi)
            h.append(hi)
            fmt.append(f)
            mi.append(synth.parse_media_ref(ref)[1])
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "media_ref": pa.array(refs, pa.string()),
                "media_idx": pa.array(mi, pa.int32()),
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "format": pa.array(fmt, pa.string()),
            },
            schema=MEDIA_META_SCHEMA,
        )


PIXEL_STATS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_idx", pa.int64()),
        ("fmt", pa.string()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("diag_sum", pa.int64()),
    ]
)


def synth_pattern_blob(doc_id: int, media_idx: int) -> bytes:
    """Deterministic REAL image bytes for the image-band sidecar: a
    `functions.imagecodec.pattern_image` gradient encoded as BMP / PPM / PGM
    by ``(doc_id + media_idx) % 3``.  Dimensions and seed are h32 arithmetic
    so any pixel statistic of the decoded array is ANSI-SQL-recomputable."""
    from ..functions import imagecodec as ic

    seed = spec.h32(doc_id + media_idx, 577) % 256
    w = 64 + spec.h32(doc_id + media_idx, 377) % 192
    h = 48 + spec.h32(doc_id + media_idx, 477) % 160
    fmt_id = (doc_id + media_idx) % 3
    if fmt_id == 2:  # PGM carries the grey (channel-0) plane only
        grey = ic.pattern_image(seed, w, h)[:, :, 0]
        return b"P5\n%d %d\n255\n" % (w, h) + grey.tobytes()
    arr = ic.pattern_image(seed, w, h)
    return ic.encode_bmp(arr) if fmt_id == 0 else ic.encode_ppm(arr)


class ImagePixelDecoder:
    """REAL, dependency-free image decode stage (actor pool).

    Consumes ``(doc_id, media_idx, image_blob)`` rows, decodes the binary
    payload with the stdlib/numpy codecs (`functions.imagecodec` — BMP, PPM,
    PGM live in this container; PNG/JPEG via the PIL seam), and emits pixel
    statistics: dimensions plus ``diag_sum``, the exact int64 sum of the RGB
    values along the wrapped diagonal ``px[y, y % w, :]``.  The diagonal
    touches every row at a varying column, so row-padding or channel-order
    bugs in a decoder shift it — it is a decode-correctness witness, not
    just metadata.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import imagecodec as ic

        ids = batch.column("doc_id").to_pylist()
        idxs = batch.column("media_idx").to_pylist()
        blobs = batch.column("image_blob").to_pylist()
        fmt, width, height, diag = [], [], [], []
        for blob in blobs:
            arr = ic.decode_image(blob)
            h, w = arr.shape[:2]
            y = np.arange(h, dtype=np.int64)
            vals = arr[y, y % w, :].astype(np.int64).sum()
            fmt.append(ic.sniff_image(blob))
            width.append(w)
            height.append(h)
            diag.append(int(vals))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "media_idx": pa.array(idxs, pa.int64()),
                "fmt": pa.array(fmt, pa.string()),
                "width": pa.array(width, pa.int64()),
                "height": pa.array(height, pa.int64()),
                "diag_sum": pa.array(diag, pa.int64()),
            },
            schema=PIXEL_STATS_SCHEMA,
        )


def thumbnail_dims(width: int, height: int, max_side: int = 256) -> tuple[int, int]:
    """Deterministic resize plan (the compute stub for an image-resize stage)."""
    if width <= max_side and height <= max_side:
        return width, height
    if width >= height:
        return max_side, max(1, round(height * max_side / width))
    return max(1, round(width * max_side / height)), max_side


def frame_sample_plan(n_frames: int, fps_in: float, fps_out: float) -> np.ndarray:
    """Deterministic frame-sampling plan for a video stage: indices of frames
    to keep when resampling fps_in → fps_out."""
    if fps_out <= 0 or fps_in <= 0:
        raise ValueError(f"fps must be positive (fps_in={fps_in}, fps_out={fps_out})")
    if fps_out >= fps_in or n_frames == 0:
        return np.arange(n_frames)
    step = fps_in / fps_out
    idx = np.round(np.arange(0, n_frames, step)).astype(np.int64)
    return idx[idx < n_frames]


def audio_window_plan(
    n_samples: int, sample_rate: int, *, win_ms: int = 25, hop_ms: int = 10
) -> np.ndarray:
    """Deterministic STFT/fbank framing plan for an audio feature stage:
    (start, length) sample offsets of every analysis window — the windowing
    arithmetic a real frontend (kaldi/torchaudio fbank) applies before the
    FFT, kept as exact integers so the plan is unit-testable without any
    audio lib.  Frames are emitted while the window START is inside the
    signal; the tail window is truncated to the remaining samples (the
    'center=False, pad=False with partial tail' convention).

    Returns an (n_frames, 2) int64 array of (start, length)."""
    if sample_rate <= 0 or win_ms <= 0 or hop_ms <= 0:
        raise ValueError(
            f"positive rate/window/hop required (rate={sample_rate}, "
            f"win_ms={win_ms}, hop_ms={hop_ms})"
        )
    if n_samples <= 0:
        return np.empty((0, 2), dtype=np.int64)
    win = max(1, sample_rate * win_ms // 1000)
    hop = max(1, sample_rate * hop_ms // 1000)
    starts = np.arange(0, n_samples, hop, dtype=np.int64)
    lengths = np.minimum(win, n_samples - starts)
    return np.stack([starts, lengths], axis=1)


AUDIO_META_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_samples", pa.int64()),
        ("sample_rate", pa.int64()),
        ("n_frames", pa.int64()),
        ("framed_samples", pa.int64()),
    ]
)

AUDIO_FAKE_RATE = 16000
AUDIO_FAKE_SALT = 501
AUDIO_FAKE_BASE = 8000  # >= 0.5 s
AUDIO_FAKE_SPAN = 160000  # up to +10 s


def fake_audio_samples(doc_num: int) -> int:
    """Deterministic stand-in audio length (arithmetic in doc_num —
    reproducible in ANSI SQL like `fake_image_meta`)."""
    return AUDIO_FAKE_BASE + spec.h32(doc_num, AUDIO_FAKE_SALT) % AUDIO_FAKE_SPAN


class AudioFramer:
    """Actor-pool audio feature-framing stage:
    ``map_batches(AudioFramer, concurrency=N)``.

    The decode kernel is REAL when fed WAV payloads — stdlib ``wave``
    parses the header (no external audio lib needed) — and the framing
    arithmetic (`audio_window_plan`, the windowing every STFT/fbank
    frontend applies) runs on either path.  ``use_fake=True`` derives the
    sample count arithmetically from doc_id (the sandbox corpus carries no
    audio bytes), keeping the stage SQL-reproducible for the gate; a real
    deployment passes ``use_fake=False`` with a ``media_blob`` binary
    column.  Output schema is identical on both paths (`AUDIO_META_SCHEMA`).
    """

    def __init__(self, use_fake: bool = True, *, win_ms: int = 25, hop_ms: int = 10):
        self.use_fake = use_fake
        self.win_ms = win_ms
        self.hop_ms = hop_ms

    @staticmethod
    def _decode_real(blob: bytes) -> tuple[int, int]:
        """Parse (n_samples, sample_rate) from WAV bytes — stdlib-only, so
        this path is live (tested) even in this container."""
        import io
        import wave

        with wave.open(io.BytesIO(blob), "rb") as w:
            return int(w.getnframes()), int(w.getframerate())

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        if self.use_fake:
            decoded = [
                (fake_audio_samples(int(d)), AUDIO_FAKE_RATE) for d in doc_ids
            ]
        else:
            if "media_blob" not in batch.column_names:
                raise ValueError(
                    "AudioFramer(use_fake=False) requires a media_blob "
                    "binary column carrying the WAV bytes"
                )
            decoded = [
                self._decode_real(b) for b in batch.column("media_blob").to_pylist()
            ]
        ns, rates, nf, fs = [], [], [], []
        for n_samples, rate in decoded:
            plan = audio_window_plan(
                n_samples, rate, win_ms=self.win_ms, hop_ms=self.hop_ms
            )
            ns.append(n_samples)
            rates.append(rate)
            nf.append(len(plan))
            fs.append(int(plan[:, 1].sum()) if len(plan) else 0)
        return pa.table(
            {
                "doc_id": pa.array([int(d) for d in doc_ids], pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "n_frames": pa.array(nf, pa.int64()),
                "framed_samples": pa.array(fs, pa.int64()),
            },
            schema=AUDIO_META_SCHEMA,
        )


VIDEO_META_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_frames", pa.int64()),
        ("fps_in", pa.float64()),
        ("n_kept", pa.int64()),
        ("first_kept", pa.int64()),
        ("last_kept", pa.int64()),
    ]
)

VIDEO_FAKE_FPS = 30.0
VIDEO_FAKE_SALT = 601
VIDEO_FAKE_BASE = 24  # >= 0.8 s of 30 fps video
VIDEO_FAKE_SPAN = 976  # up to ~33 s
VIDEO_TARGET_FPS = 4.0  # step 7.5 — exact in binary, so the SQL twin's
#                         round_even(i * 7.5) is bit-identical to np.round


def fake_video_frames(doc_num: int) -> int:
    """Deterministic stand-in video frame count (SQL-reproducible h32
    arithmetic, like `fake_audio_samples`)."""
    return VIDEO_FAKE_BASE + spec.h32(doc_num, VIDEO_FAKE_SALT) % VIDEO_FAKE_SPAN


class VideoFrameSampler:
    """Actor-pool frame-sampling stage: ``map_batches(VideoFrameSampler,
    concurrency=N)`` — computes the `frame_sample_plan` resample (which
    frame indices survive an fps_in -> fps_out decimation) per video
    attachment and emits the plan totals.

    A real deployment would pass ``use_fake=False`` plus a container
    prober in ``_probe_real`` (ffprobe/pyav — not in this container, so
    that seam raises ``NotImplementedError`` honestly); the plan
    arithmetic, batching and output schema — the Ray-side plumbing — are
    identical on both paths and are what this stage pins down.
    """

    def __init__(
        self,
        use_fake: bool = True,
        *,
        fps_out: float = VIDEO_TARGET_FPS,
    ):
        self.use_fake = use_fake
        self.fps_out = fps_out

    @staticmethod
    def _probe_real(blob: bytes) -> tuple[int, float]:
        """(n_frames, fps) of a real container — needs pyav/ffprobe."""
        raise NotImplementedError(
            "Real video probing needs pyav/ffprobe, which this container "
            "does not ship; construct VideoFrameSampler(use_fake=True)."
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        if self.use_fake:
            probed = [(fake_video_frames(d), VIDEO_FAKE_FPS) for d in doc_ids]
        else:
            if "media_blob" not in batch.column_names:
                raise ValueError(
                    "VideoFrameSampler(use_fake=False) requires a media_blob "
                    "binary column carrying the video bytes"
                )
            probed = [
                self._probe_real(b) for b in batch.column("media_blob").to_pylist()
            ]
        nf, fps, nk, fk, lk = [], [], [], [], []
        for n_frames, fps_in in probed:
            idx = frame_sample_plan(n_frames, fps_in, self.fps_out)
            nf.append(n_frames)
            fps.append(fps_in)
            nk.append(len(idx))
            fk.append(int(idx[0]) if len(idx) else -1)
            lk.append(int(idx[-1]) if len(idx) else -1)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_frames": pa.array(nf, pa.int64()),
                "fps_in": pa.array(fps, pa.float64()),
                "n_kept": pa.array(nk, pa.int64()),
                "first_kept": pa.array(fk, pa.int64()),
                "last_kept": pa.array(lk, pa.int64()),
            },
            schema=VIDEO_META_SCHEMA,
        )


PDF_TEXT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_pages", pa.int64()),
        ("has_text_layer", pa.bool_()),
        ("text", pa.string()),
    ]
)


class PdfTextExtractor:
    """Actor-pool text-layer drain stage:
    ``map_batches(PdfTextExtractor, concurrency=N)`` over a table carrying
    PDF bytes in ``media_blob`` — the REAL stdlib kernel
    (`functions.pdftext.pdf_extract_text`), live in this container.  Rows
    whose PDF has no selectable layer come back with
    ``has_text_layer=False`` and empty text: the downstream filter sends
    exactly those to the expensive OCR pool (the fitz-gated raster seam),
    which is the whole point of draining first."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.pdftext import pdf_extract_text

        doc_ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        if "media_blob" not in batch.column_names:
            raise ValueError(
                "PdfTextExtractor requires a media_blob binary column "
                "carrying the PDF bytes"
            )
        n_pages, has_text, texts = [], [], []
        for blob in batch.column("media_blob").to_pylist():
            try:
                pages = pdf_extract_text(blob or b"")
            except Exception:
                pages = []
            n_pages.append(len(pages))
            joined = "\n".join(p for p in pages if p.strip())
            has_text.append(bool(joined))
            texts.append(joined)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_pages": pa.array(n_pages, pa.int64()),
                "has_text_layer": pa.array(has_text, pa.bool_()),
                "text": pa.array(texts, pa.string()),
            },
            schema=PDF_TEXT_SCHEMA,
        )


AHASH_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_idx", pa.int64()),
        ("ahash_hi", pa.int64()),
        ("ahash_lo", pa.int64()),
    ]
)


def ahash_bits(grey: "np.ndarray") -> tuple[int, int]:
    """64-bit average hash of a (h, w) int grid, split into two int32
    halves (bit 63 would flip an int64 negative).  Cell (i, j) covers the
    pixels with ``y·8 // h == i`` and ``x·8 // w == j``; bit = 1 iff the
    cell mean exceeds the global mean, compared cross-multiplied in exact
    integers (cell_sum · N > total_sum · cell_n) — no float division."""
    h, w = grey.shape
    g = grey.astype(np.int64)
    ci = (np.arange(h, dtype=np.int64) * 8) // h
    cj = (np.arange(w, dtype=np.int64) * 8) // w
    cell = np.zeros((8, 8), dtype=np.int64)
    cnt = np.zeros((8, 8), dtype=np.int64)
    idx = (ci[:, None] * 8 + cj[None, :]).ravel()
    np.add.at(cell.ravel(), idx, g.ravel())
    np.add.at(cnt.ravel(), idx, 1)
    tot, n = int(g.sum()), h * w
    bits = (cell * n > tot * cnt).ravel().astype(np.int64)
    pows = np.int64(1) << np.arange(32, dtype=np.int64)
    lo = int((bits[:32] * pows).sum())
    hi = int((bits[32:] * pows).sum())
    return hi, lo


class ImageAHasher:
    """Actor-pool stage: decode ``(doc_id, media_idx, image_blob)`` rows
    for real (stdlib/numpy codecs) and emit the 64-bit average hash as
    two int32 halves — the perceptual-dedup signature over pixels, not
    bytes (re-encoded copies collide; byte-level dedup would miss them).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import imagecodec as ic

        ids = batch.column("doc_id").to_pylist()
        idxs = batch.column("media_idx").to_pylist()
        blobs = batch.column("image_blob").to_pylist()
        his, los = [], []
        for blob in blobs:
            arr = ic.decode_image(blob)
            hi, lo = ahash_bits(arr[:, :, 0])
            his.append(hi)
            los.append(lo)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "media_idx": pa.array(idxs, pa.int64()),
                "ahash_hi": pa.array(his, pa.int64()),
                "ahash_lo": pa.array(los, pa.int64()),
            },
            schema=AHASH_SCHEMA,
        )


AUDIO_FP_SEED_SALT = 701
AUDIO_FP_WIN = 400  # 25 ms @ 16 kHz
AUDIO_FP_HOP = 160  # 10 ms @ 16 kHz
AUDIO_FP_FRAMES = 33  # 32 energy deltas → one int32-safe fingerprint


def synth_wav_blob(doc_num: int) -> bytes:
    """Deterministic REAL WAV bytes for the audio band: int16 samples
    ``s(t) = (seed + 7t) % 65536 − 32768`` with ``seed = h32(doc, 701) %
    256`` — the modular ramp is SQL-recomputable, and the narrow seed
    space plants same-prefix recordings across documents (different
    lengths, identical opening — the truncated-copy dedup case)."""
    import io
    import wave

    seed = spec.h32(doc_num, AUDIO_FP_SEED_SALT) % 256
    n = fake_audio_samples(doc_num)
    t = np.arange(n, dtype=np.int64)
    samples = ((seed + 7 * t) % 65536 - 32768).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(AUDIO_FAKE_RATE)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


class AudioFingerprinter:
    """Actor-pool stage: REAL stdlib-WAV decode → energy-contour
    fingerprint.  Frame i (of the first 33) spans samples
    ``[i·160, i·160+400)``; bit i = 1 iff energy(i+1) > energy(i)
    (exact |int| sums) — the sign-of-delta contour every audio
    fingerprinting lineage (Haitsma–Kalker / Shazam-style) builds on,
    robust to truncation because only the opening second is hashed."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        ids = batch.column("doc_id").to_pylist()
        blobs = batch.column("media_blob").to_pylist()
        fps, oks = [], []
        need = (AUDIO_FP_FRAMES - 1) * AUDIO_FP_HOP + AUDIO_FP_WIN
        for blob in blobs:
            with wave.open(io.BytesIO(blob), "rb") as w:
                raw = w.readframes(w.getnframes())
            s = np.frombuffer(raw, dtype=np.int16).astype(np.int64)
            if len(s) < need:
                fps.append(0)
                oks.append(False)
                continue
            e = np.array(
                [
                    int(np.abs(s[i * AUDIO_FP_HOP : i * AUDIO_FP_HOP + AUDIO_FP_WIN]).sum())
                    for i in range(AUDIO_FP_FRAMES)
                ],
                dtype=np.int64,
            )
            bits = e[1:] > e[:-1]
            fp = 0
            for k in range(AUDIO_FP_FRAMES - 1):
                if bits[k]:
                    fp |= 1 << k
            fps.append(fp)
            oks.append(True)
        return pa.table(
            {
                "doc_id": pa.array([int(d) for d in ids], pa.int64()),
                "fp": pa.array(fps, pa.int64()),
                "fp_ok": pa.array(oks, pa.bool_()),
            }
        )
