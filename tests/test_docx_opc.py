"""Real DOCX parsing (stdlib OPC path): documents are BUILT as genuine
.docx zip packages here and parsed back — the decode kernel is live in this
container, no python-docx needed."""

from __future__ import annotations

import io
import zipfile

from ocr_engine_ray.stages.multimodal import docx_extract_text, docx_parse_opc

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
R = "http://schemas.openxmlformats.org/package/2006/relationships"
CT = "http://schemas.openxmlformats.org/package/2006/content-types"


def _p(text_runs: str) -> str:
    return f'<w:p xmlns:w="{W}">{text_runs}</w:p>'


def _t(s: str) -> str:
    return f'<w:r><w:t xml:space="preserve">{s}</w:t></w:r>'


def _build_docx(
    body_xml: str, rels_xml: str = "", media: dict[str, bytes] | None = None
) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            f'<?xml version="1.0"?><Types xmlns="{CT}">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Default Extension="png" ContentType="image/png"/>'
            '<Default Extension="jpg" ContentType="image/jpeg"/>'
            '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
            "</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{R}">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "word/document.xml",
            f'<?xml version="1.0"?><w:document xmlns:w="{W}">'
            f"<w:body>{body_xml}</w:body></w:document>",
        )
        if rels_xml:
            zf.writestr(
                "word/_rels/document.xml.rels",
                f'<?xml version="1.0"?><Relationships xmlns="{R}">{rels_xml}'
                "</Relationships>",
            )
        for name, blob in (media or {}).items():
            zf.writestr(name, blob)
    return buf.getvalue()


def test_paragraph_runs_tabs_breaks_hyperlinks():
    body = (
        _p(_t("Hello ") + _t("world"))
        + _p("<w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r>")
        + _p(
            '<w:r><w:t>see </w:t></w:r><w:hyperlink xmlns:w="'
            + W
            + '"><w:r><w:t>the link</w:t></w:r></w:hyperlink>'
        )
        + _p("")  # empty paragraph survives parse, drops in flatten
    )
    d = docx_parse_opc(_build_docx(body))
    assert d["paragraphs"] == ["Hello world", "a\tb\nc", "see the link", ""]
    assert d["tables"] == [] and d["images"] == []


def test_tables_and_flatten():
    tbl = (
        f'<w:tbl xmlns:w="{W}">'
        "<w:tr><w:tc>" + _p(_t("n1")) + _p(_t("n2")) + "</w:tc>"
        "<w:tc>" + _p(_t(" v1 ")) + "</w:tc></w:tr>"
        "<w:tr><w:tc>" + _p(_t("")) + "</w:tc><w:tc>" + _p(_t(" ")) + "</w:tc></w:tr>"
        "</w:tbl>"
    )
    body = _p(_t("intro")) + tbl + _p(_t("  ")) + _p(_t("outro"))
    d = docx_parse_opc(_build_docx(body))
    assert d["paragraphs"] == ["intro", "  ", "outro"]
    # multi-paragraph cell joins with \n (Cell.text semantics)
    assert d["tables"] == [[["n1\nn2", " v1 "], ["", " "]]]
    # reference flatten: blank paragraph dropped, cells stripped and
    # " | "-joined, all-empty row dropped
    assert (
        docx_extract_text(_build_docx(body)) == "intro\noutro\nn1\nn2 | v1"
    )


def test_image_relationships():
    rels = (
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="media/image1.png"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        '<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="http://x/pic.png" TargetMode="External"/>'
        '<Relationship Id="rId4" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="media/photo.jpg"/>'
    )
    media = {
        "word/media/image1.png": b"\x89PNG-fake-1",
        "word/media/photo.jpg": b"\xff\xd8-fake-2",
    }
    d = docx_parse_opc(_build_docx(_p(_t("x")), rels, media))
    assert [(i["idx"], i["ext"], i["mime"]) for i in d["images"]] == [
        (0, "png", "image/png"),
        (1, "jpg", "image/jpeg"),
    ]
    assert d["images"][0]["blob"] == b"\x89PNG-fake-1"
    assert d["images"][1]["blob"] == b"\xff\xd8-fake-2"


def test_agrees_with_python_docx_if_available():
    """When python-docx exists, the stdlib walk must agree with it on
    paragraphs, tables and image parts (importorskip'd in this container)."""
    import pytest

    docx = pytest.importorskip("docx")

    body = (
        _p(_t("alpha"))
        + f'<w:tbl xmlns:w="{W}"><w:tr><w:tc>'
        + _p(_t("c1"))
        + "</w:tc><w:tc>"
        + _p(_t("c2"))
        + "</w:tc></w:tr></w:tbl>"
        + _p(_t("omega"))
    )
    blob = _build_docx(body)
    ours = docx_parse_opc(blob)
    theirs = docx.Document(io.BytesIO(blob))
    assert [p.text for p in theirs.paragraphs] == ours["paragraphs"]
    assert [
        [[c.text for c in row.cells] for row in t.rows] for t in theirs.tables
    ] == ours["tables"]
