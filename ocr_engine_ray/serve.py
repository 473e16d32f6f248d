"""Service-mode HTTP surface — the reference's request/response contract
(`app.py:663-750` ``POST /parse``, `app.py:157-178` API-key auth,
`app.py:739-750` ``GET /health``) over this engine's per-document
extraction path, on the standard library only (no FastAPI in this
environment).

Scope and honesty:

- The request contract is a full mirror: multipart ``files`` +
  ``langs`` + ``fields_to_extract`` form fields with the reference's
  normalization rules (single ``langs`` value splits on ``[,\\s]+`` and
  pads with ``en``; ``fields_to_extract`` splits on ``[,\\n;]+``; invalid
  langs → 400; missing fields → 400), API key via ``X-API-Key`` or
  ``Authorization: Bearer`` against ``SECRET_API_KEY`` (unset → 503,
  wrong → 401), and the response is ``{filename: minified-fields-JSON}``.
- Text-bearing uploads (``.txt`` / ``.html``) run the REAL engine path:
  the span assembly + interpretation of `oracle.extract_document`, with
  the requested labels applied as a field vocabulary
  (`oracle.vocab_fields_document` — the same semantics the gated
  ``vocab_fields_digest`` query pins).
- Media uploads (pdf / image / docx) need an OCR backend the sandbox does
  not ship; rather than return the deterministic stand-in for a REAL
  user file, those respond 501 with the reason.  The env-gated real
  decode kernels (`stages.multimodal.rasterize_pdf_pages` /
  `docx_image_parts`) are the integration point when the deps exist.

The batch engine (``__ray_entry__`` / the pipelines) is the scale path;
this module exists for request/response parity and never touches Ray.
"""

from __future__ import annotations

import hmac
import json
import os
import uuid
from email.parser import BytesParser
from email.policy import default as _email_policy
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from . import oracle, spec
from .functions.textproc import (
    detect_type,
    label_to_key,
    split_field_labels,
    split_langs,
)


def _normalize_langs(values: list[str], n_files: int) -> list[str]:
    """app.py:689-699 — one shared rule with the batch pipelines: a single
    value splits via `textproc.split_langs`; repeated values lowercase,
    pad with the default lang, truncate."""
    if len(values) == 1:
        return split_langs(values[0], n_files)
    langs = [v.strip().lower() for v in values if v and v.strip()]
    if len(langs) < n_files:
        langs += [spec.DEFAULT_LANG] * (n_files - len(langs))
    return langs[:n_files]


def _upload_kind(filename: str, blob: bytes) -> str:
    """Text-bearing extensions route to the inline-span kinds; everything
    else through the reference's pdf/docx/image classifier."""
    ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
    if ext in ("txt", "text", "md"):
        return spec.KIND_TEXT
    if ext in ("htm", "html"):
        return spec.KIND_HTML
    return detect_type(filename, blob[:8])


def parse_upload(filename: str, blob: bytes, lang: str, fields: list[str]) -> dict:
    """The `parse_file` analog (app.py:647-659): classify → extract →
    interpret with the requested labels as the field vocabulary.  Raises
    NotImplementedError for media kinds that need a real OCR backend."""
    kind = _upload_kind(filename, blob)
    if kind == "docx":
        # REAL DOCX intake (process_docx_structured, ocr_any.py:386-400):
        # the stdlib OPC parser flattens selectable text, which runs the
        # same vocab-fields interpretation as inline text.  Embedded
        # images would additionally be OCR'd and merged in the reference
        # (ocr_any.py:361-385) — that needs a vision backend this
        # environment does not ship, so a docx WITH images is refused
        # honestly rather than answered partially.
        from .stages.multimodal import docx_parse_opc

        from .functions.lines import docx_to_text

        d = docx_parse_opc(blob)
        if d["images"]:
            raise NotImplementedError(
                f"{filename}: docx contains {len(d['images'])} embedded "
                "image(s); merging their fields needs the vision OCR "
                "backend this environment does not ship (text-only docx "
                "parses fully)."
            )
        text = docx_to_text(d["paragraphs"], d["tables"])
        kind = spec.KIND_TEXT
    elif kind == "pdf":
        # Text-layer drain (beyond the reference, which OCRs every PDF —
        # app.py:645-656): PDFs with a selectable layer parse for real via
        # the stdlib content-stream reader (`functions/pdftext.py`);
        # scanned PDFs still need the fitz-gated raster + OCR pool.
        from .functions.pdftext import pdf_extract_text

        pages = pdf_extract_text(blob)
        if not any(p.strip() for p in pages):
            raise NotImplementedError(
                f"{filename}: PDF has no selectable text layer; rasterizing "
                "it needs the fitz/OCR backend this environment does not "
                "ship (text-layer PDFs parse fully)."
            )
        text = "\n".join(p for p in pages if p)
        kind = spec.KIND_TEXT
    elif kind not in spec.INLINE_KINDS:
        # Image uploads: the pixels DECODE for real here (stdlib/numpy
        # BMP/PPM/PGM codecs; PNG/JPEG behind the PIL seam) — what's
        # missing is the vision OCR that turns pixels into text, so the
        # refusal reports the decoded geometry to prove intake worked.
        decoded = ""
        try:
            from .functions.imagecodec import decode_image, sniff_image

            arr = decode_image(blob)
            decoded = (
                f" (decoded {sniff_image(blob)} {arr.shape[1]}x{arr.shape[0]} "
                "successfully — only the OCR step is missing)"
            )
        except (ValueError, NotImplementedError):
            pass
        raise NotImplementedError(
            f"{kind} uploads need an OCR backend (Vision/PIL/fitz) that this "
            "environment does not ship; text/html/docx/text-layer-PDF "
            f"uploads run the full extraction path.{decoded}"
        )
    else:
        text = blob.decode("utf-8", errors="replace")
    doc = {
        "doc_id": filename,
        "spans": [{"kind": kind, "text": text, "media_ref": None, "offset": 0}],
    }
    vocab = {label_to_key(lbl): lbl for lbl in fields}
    return json.loads(oracle.vocab_fields_document(doc, vocab))


class _Handler(BaseHTTPRequestHandler):
    server_version = "ocr-engine-ray/1.0"

    def log_message(self, fmt, *args):  # quiet by default; tests capture codes
        pass

    # ------------------------------------------------------------- helpers
    def _send_json(self, code: int, obj) -> None:
        body = json.dumps(obj, ensure_ascii=False).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _auth(self) -> bool:
        """app.py:157-178: 503 when the server has no key, 401 on mismatch."""
        secret = os.environ.get("SECRET_API_KEY", "")
        supplied = (self.headers.get("X-API-Key") or "").strip()
        if not supplied:
            bearer = (self.headers.get("Authorization") or "").strip()
            if bearer.lower().startswith("bearer "):
                supplied = bearer[7:].strip()
        if not secret:
            self._send_json(503, {"detail": "Server not configured with SECRET_API_KEY"})
            return False
        if not supplied or not hmac.compare_digest(supplied, secret):
            self._send_json(401, {"detail": "Invalid or missing API key"})
            return False
        return True

    # -------------------------------------------------------------- routes
    def do_GET(self) -> None:
        if self.path != "/health":
            self._send_json(404, {"detail": "Not found"})
            return
        from .stages import multimodal as mm

        self._send_json(
            200,
            {
                "ok": bool(os.environ.get("SECRET_API_KEY")),
                "auth": bool(os.environ.get("SECRET_API_KEY")),
                "engine": "ray-data",
                "decode": {
                    "pil": mm._HAVE_PIL,
                    "fitz": mm._HAVE_FITZ,
                    # DOCX text/image-part parsing is the stdlib OPC walk
                    # (docx_parse_opc) — live unconditionally
                    "docx": True,
                },
            },
        )

    def do_POST(self) -> None:
        if self.path != "/parse":
            self._send_json(404, {"detail": "Not found"})
            return
        if not self._auth():
            return
        req_id = str(uuid.uuid4())[:8]
        ctype = self.headers.get("Content-Type", "")
        if "multipart/form-data" not in ctype:
            self._send_json(400, {"detail": "Expected multipart/form-data"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(length)
            msg = BytesParser(policy=_email_policy).parsebytes(
                b"Content-Type: " + ctype.encode("latin-1") + b"\r\n\r\n" + raw
            )
        except (ValueError, UnicodeEncodeError) as e:
            # a malformed Content-Length / Content-Type must answer 400,
            # not drop the connection with a traceback
            self._send_json(400, {"detail": f"Malformed request: {e}"})
            return
        files: list[tuple[str, bytes]] = []
        langs_raw: list[str] = []
        fields_raw: list[str] = []
        for part in msg.iter_parts():
            name = part.get_param("name", header="content-disposition")
            filename = part.get_filename()
            payload = part.get_payload(decode=True) or b""
            if name == "files" and filename:
                files.append((filename, payload))
            elif name == "langs":
                langs_raw.append(payload.decode("utf-8", errors="replace"))
            elif name == "fields_to_extract":
                fields_raw.append(payload.decode("utf-8", errors="replace"))

        if not files:
            # FastAPI's required `files` list answers 422 on absence
            # (app.py:666-670); mirror with a 400-class error, not 200 {}
            self._send_json(400, {"detail": "files is required and cannot be empty."})
            return
        langs = _normalize_langs(langs_raw, len(files))
        bad = [l for l in langs if l not in spec.VALID_LANGS]
        if bad:
            self._send_json(
                400, {"detail": f"Invalid language(s): {bad}. Use 'en' or 'hi'."}
            )
            return
        fields = split_field_labels(fields_raw)
        if not fields:
            self._send_json(
                400,
                {"detail": "fields_to_extract must contain at least one non-empty label."},
            )
            return

        result: dict[str, str] = {}
        for (filename, blob), lang in zip(files, langs):
            try:
                parsed = parse_upload(filename, blob, lang, fields)
            except NotImplementedError as e:
                # the reference also aborts the request on a per-file parse
                # error (app.py:728-731 re-raises); name the file so the
                # client knows which upload sank the batch
                self._send_json(
                    501, {"detail": str(e), "file": filename, "req_id": req_id}
                )
                return
            result[filename] = json.dumps(parsed, ensure_ascii=False)
        self._send_json(200, result)


def serve(host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Build (but do not run) the server; ``port=0`` picks a free port.
    Call ``serve_forever()`` on the result, or drive it from a thread in
    tests via ``handle_request`` / ``serve_forever`` + ``shutdown``.
    The one runnable entry point is the CLI: ``python -m ocr_engine_ray
    serve [--host H] [--port P]``."""
    return ThreadingHTTPServer((host, port), _Handler)
