"""Real PDF text-layer extraction: documents are BUILT as structurally
valid PDFs here (stdlib writer with a proper xref) and parsed back —
uncompressed and zlib-compressed streams, escapes, kerning arrays, hex
strings, multi-stream pages."""

from __future__ import annotations

import zlib

from ocr_engine_ray.functions.pdftext import (
    _literal_string,
    pdf_extract_text,
    pdf_has_text_layer,
)


def _build_pdf(page_streams: list[list[tuple[bytes, bool]]]) -> bytes:
    """page_streams: per page, a list of (content_bytes, compress) streams.
    Emits a classic xref PDF: catalog(1) -> pages(2) -> page objects ->
    content objects."""
    objs: dict[int, bytes] = {}
    n_pages = len(page_streams)
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    next_id = 3 + n_pages
    for i, streams in enumerate(page_streams):
        ids = []
        for data, compress in streams:
            body = zlib.compress(data) if compress else data
            filt = b"/Filter /FlateDecode " if compress else b""
            objs[next_id] = (
                b"<< " + filt + f"/Length {len(body)} >>".encode()
                + b"\nstream\n" + body + b"\nendstream"
            )
            ids.append(next_id)
            next_id += 1
        if len(ids) == 1:
            contents = f"/Contents {ids[0]} 0 R".encode()
        else:
            contents = (
                b"/Contents [" + " ".join(f"{c} 0 R" for c in ids).encode() + b"]"
            )
        objs[3 + i] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            + contents + b" >>"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {max(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in sorted(objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {max(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def test_uncompressed_tj_and_kerning_array():
    content = (
        b"BT /F1 12 Tf 72 720 Td (Hello ) Tj "
        b"[(Wo) -120 (rld)] TJ ET"
    )
    pdf = _build_pdf([[(content, False)]])
    assert pdf_extract_text(pdf) == ["Hello World"]
    assert pdf_has_text_layer(pdf)


def test_flate_escapes_hex_and_lines():
    content = (
        rb"BT (paren \( pair \) and back\\slash and \101 octal) Tj "
        rb"0 -14 Td (second line) Tj "
        rb"T* <48692100> Tj ET"
    )
    pdf = _build_pdf([[(content, True)]])
    assert pdf_extract_text(pdf) == [
        "paren ( pair ) and back\\slash and A octal\nsecond line\nHi!\x00"
    ]


def test_multi_page_and_contents_array():
    p1 = [(b"BT (alpha) Tj ET", True)]
    p2 = [(b"BT (beta) Tj ET", False), (b"BT (gamma) ' ET", True)]
    pdf = _build_pdf([p1, p2])
    assert pdf_extract_text(pdf) == ["alpha", "beta\ngamma"]


def test_nested_parens_and_quote_ops():
    content = b"BT (outer (inner) tail) Tj (x) ' ET"
    pdf = _build_pdf([[(content, False)]])
    assert pdf_extract_text(pdf) == ["outer (inner) tail\nx"]


def test_scanned_pdf_reports_no_text_layer():
    # a page whose only content is a drawing (no BT/ET text)
    pdf = _build_pdf([[(b"q 1 0 0 1 0 0 cm /Im0 Do Q", True)]])
    assert pdf_extract_text(pdf) == [""]
    assert not pdf_has_text_layer(pdf)
    assert not pdf_has_text_layer(b"not a pdf at all")


def test_literal_string_parser_edges():
    s, end = _literal_string(b"(a\\nb)", 0)
    assert s == b"a\nb" and end == 6
    s, _ = _literal_string(b"(line\\\ncont)", 0)
    assert s == b"linecont"
    s, _ = _literal_string(b"(\\053)", 0)
    assert s == b"+"


def test_agrees_with_pypdf_if_available():
    import pytest

    pypdf = pytest.importorskip("pypdf")
    import io

    pdf = _build_pdf([[(b"BT (check) Tj ET", True)]])
    reader = pypdf.PdfReader(io.BytesIO(pdf))
    assert reader.pages[0].extract_text().strip() == "check"
    assert pdf_extract_text(pdf) == ["check"]


def test_ray_actor_pool_drain_stage(ray_session):
    """100 real PDFs (mixed text-layer / scanned) through the actor-pool
    stage: per-row text equality vs the sequential kernel, and the
    has_text_layer routing split."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_engine_ray.stages.multimodal import PdfTextExtractor

    blobs, want = [], []
    for i in range(100):
        if i % 3 == 2:  # scanned
            b = _build_pdf([[(b"q /Im0 Do Q", True)]])
            want.append((i, 1, False, ""))
        else:
            b = _build_pdf(
                [[(f"BT (doc {i} line one) Tj 0 -14 Td (line two) Tj ET".encode(),
                   i % 2 == 0)]]
            )
            want.append((i, 1, True, f"doc {i} line one\nline two"))
        blobs.append(b)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100), pa.int64()),
                "media_blob": pa.array(blobs, pa.binary()),
            }
        )
    )
    out = ds.map_batches(
        PdfTextExtractor, concurrency=2, batch_size=16, batch_format="pyarrow"
    ).take_all()
    got = sorted(
        (r["doc_id"], r["n_pages"], r["has_text_layer"], r["text"]) for r in out
    )
    assert got == want
