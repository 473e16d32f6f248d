"""End-to-end tests for the stdlib service surface (serve.py) — the
reference's /parse + /health + API-key contract (app.py:663-750,
157-178) driven over a real socket with urllib."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from ocr_engine_ray import oracle, serve
from ocr_engine_ray.functions.textproc import label_to_key

API_KEY = "test-key-123"


@pytest.fixture()
def server(monkeypatch):
    monkeypatch.setenv("SECRET_API_KEY", API_KEY)
    httpd = serve.serve(port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.server_close()


def _multipart(parts: list[tuple[str, str | None, bytes]]) -> tuple[bytes, str]:
    """parts: (field_name, filename | None, payload)."""
    boundary = "testboundary123"
    out = []
    for name, filename, payload in parts:
        out.append(f"--{boundary}\r\n".encode())
        disp = f'Content-Disposition: form-data; name="{name}"'
        if filename is not None:
            disp += f'; filename="{filename}"'
        out.append(disp.encode() + b"\r\n\r\n")
        out.append(payload + b"\r\n")
    out.append(f"--{boundary}--\r\n".encode())
    return b"".join(out), f"multipart/form-data; boundary={boundary}"


def _post(url: str, body: bytes, ctype: str, key: str | None = API_KEY):
    req = urllib.request.Request(url + "/parse", data=body, method="POST")
    req.add_header("Content-Type", ctype)
    if key is not None:
        req.add_header("X-API-Key", key)
    return urllib.request.urlopen(req)


class TestServe:
    def test_health(self, server):
        with urllib.request.urlopen(server + "/health") as r:
            h = json.loads(r.read())
        assert h["ok"] is True and h["engine"] == "ray-data"
        assert set(h["decode"]) == {"pil", "fitz", "docx"}

    def test_auth_missing_key_401(self, server):
        body, ctype = _multipart([("fields_to_extract", None, b"name")])
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, body, ctype, key=None)
        assert e.value.code == 401

    def test_auth_unconfigured_503(self, server, monkeypatch):
        monkeypatch.delenv("SECRET_API_KEY")
        body, ctype = _multipart([("fields_to_extract", None, b"name")])
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, body, ctype)
        assert e.value.code == 503

    def test_bad_lang_400(self, server):
        body, ctype = _multipart(
            [
                ("files", "a.txt", b"Name: Alice"),
                ("langs", None, b"fr"),
                ("fields_to_extract", None, b"name"),
            ]
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, body, ctype)
        assert e.value.code == 400

    def test_missing_fields_400(self, server):
        body, ctype = _multipart([("files", "a.txt", b"Name: Alice")])
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, body, ctype)
        assert e.value.code == 400

    def test_media_upload_501(self, server):
        body, ctype = _multipart(
            [
                ("files", "scan.pdf", b"%PDF-1.4 fake"),
                ("langs", None, b"en"),
                ("fields_to_extract", None, b"name"),
            ]
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, body, ctype)
        assert e.value.code == 501

    def test_parse_txt_and_html_matches_oracle(self, server):
        txt = b"Invoice Number: 42\nCustomer Name: Alice Smith\nTotal: 99"
        html = b"<html><body><p>Customer Name: Bob</p><p>Total: 7</p></body></html>"
        body, ctype = _multipart(
            [
                ("files", "a.txt", txt),
                ("files", "b.html", html),
                ("langs", None, b"en, en"),
                ("fields_to_extract", None, b"Customer Name, Total;Invoice Number"),
            ]
        )
        with _post(server, body, ctype) as r:
            out = json.loads(r.read())
        assert set(out) == {"a.txt", "b.html"}
        labels = ["Customer Name", "Total", "Invoice Number"]
        vocab = {label_to_key(lbl): lbl for lbl in labels}
        for fname, raw, kind in [("a.txt", txt, "text"), ("b.html", html, "html")]:
            doc = {
                "doc_id": fname,
                "spans": [
                    {
                        "kind": kind,
                        "text": raw.decode(),
                        "media_ref": None,
                        "offset": 0,
                    }
                ],
            }
            want = json.loads(oracle.vocab_fields_document(doc, vocab))
            assert json.loads(out[fname]) == want
        # sanity: the txt doc actually extracted the requested fields
        got = json.loads(out["a.txt"])
        assert got.get("customer_name") == "Alice Smith"

    def test_no_files_400(self, server):
        body, ctype = _multipart(
            [("langs", None, b"en"), ("fields_to_extract", None, b"name")]
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, body, ctype)
        assert e.value.code == 400

    def test_malformed_content_length_400_not_reset(self, server):
        import http.client

        host, port = server.replace("http://", "").split(":")
        conn = http.client.HTTPConnection(host, int(port), timeout=5)
        conn.putrequest("POST", "/parse", skip_host=False)
        conn.putheader("X-API-Key", API_KEY)
        conn.putheader("Content-Type", "multipart/form-data; boundary=b")
        conn.putheader("Content-Length", "abc")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        conn.close()

    def test_media_501_names_the_file(self, server):
        body, ctype = _multipart(
            [
                ("files", "ok.txt", b"Name: X"),
                ("files", "scan.pdf", b"%PDF-1.4"),
                ("langs", None, b"en,en"),
                ("fields_to_extract", None, b"name"),
            ]
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, body, ctype)
        assert e.value.code == 501
        assert json.loads(e.value.read())["file"] == "scan.pdf"

    def test_parse_real_docx_matches_oracle(self, server):
        """A genuine .docx zip package (built by the OPC test helpers) runs
        the REAL stdlib parse + the same vocab-fields path as inline text."""
        from tests.test_docx_opc import _build_docx, _p, _t

        W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
        body_xml = (
            _p(_t("Customer Name: Carol Jones"))
            + f'<w:tbl xmlns:w="{W}"><w:tr>'
            + "<w:tc>" + _p(_t("Total")) + "</w:tc>"
            + "<w:tc>" + _p(_t("123")) + "</w:tc></w:tr></w:tbl>"
        )
        blob = _build_docx(body_xml)
        body, ctype = _multipart(
            [
                ("files", "c.docx", blob),
                ("langs", None, b"en"),
                ("fields_to_extract", None, b"Customer Name, Total"),
            ]
        )
        with _post(server, body, ctype) as r:
            out = json.loads(r.read())
        labels = ["Customer Name", "Total"]
        vocab = {label_to_key(lbl): lbl for lbl in labels}
        flat = "Customer Name: Carol Jones\nTotal | 123"
        doc = {
            "doc_id": "c.docx",
            "spans": [
                {"kind": "text", "text": flat, "media_ref": None, "offset": 0}
            ],
        }
        want = json.loads(oracle.vocab_fields_document(doc, vocab))
        assert json.loads(out["c.docx"]) == want
        assert json.loads(out["c.docx"]).get("customer_name") == "Carol Jones"

    def test_docx_with_images_501(self, server):
        from tests.test_docx_opc import _build_docx, _p, _t

        rels = (
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/image" Target="media/i.png"/>'
        )
        blob = _build_docx(_p(_t("x")), rels, {"word/media/i.png": b"png"})
        body, ctype = _multipart(
            [
                ("files", "d.docx", blob),
                ("fields_to_extract", None, b"name"),
            ]
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, body, ctype)
        assert e.value.code == 501
        detail = json.loads(e.value.read())
        assert "image" in detail["detail"]

    def test_parse_text_layer_pdf(self, server):
        """A genuine PDF with a selectable text layer (built by the pdftext
        test writer) parses through the same vocab-fields path."""
        from tests.test_pdftext import _build_pdf

        blob = _build_pdf(
            [[(b"BT (Customer Name: Dana Wu) Tj 0 -14 Td (Total: 55) Tj ET", True)]]
        )
        body, ctype = _multipart(
            [
                ("files", "e.pdf", blob),
                ("fields_to_extract", None, b"Customer Name, Total"),
            ]
        )
        with _post(server, body, ctype) as r:
            out = json.loads(r.read())
        got = json.loads(out["e.pdf"])
        assert got.get("customer_name") == "Dana Wu"
        assert got.get("total") == "55"

    def test_scanned_pdf_501(self, server):
        from tests.test_pdftext import _build_pdf

        blob = _build_pdf([[(b"q /Im0 Do Q", True)]])  # image-only page
        body, ctype = _multipart(
            [("files", "scan.pdf", blob), ("fields_to_extract", None, b"name")]
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, body, ctype)
        assert e.value.code == 501
        assert "text layer" in json.loads(e.value.read())["detail"]
