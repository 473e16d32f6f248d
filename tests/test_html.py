"""HTML main-content extraction: spec cases + oracle/pipeline agreement."""

from __future__ import annotations

from ocr_engine_ray import oracle, synth
from ocr_engine_ray.functions.html import extract_main_text


class TestHtmlExtract:
    def test_script_style_head_removed(self):
        raw = (
            "<html><head><title>T</title><style>p{}</style></head>"
            "<body><script>var a='<p>x</p>';</script><p>keep me</p></body></html>"
        )
        assert extract_main_text(raw) == "keep me"

    def test_nav_header_footer_aside_removed(self):
        raw = (
            "<body><nav><a href='/'>h</a></nav><header><h1>big</h1></header>"
            "<p>content</p><aside>side</aside><footer>foot</footer></body>"
        )
        assert extract_main_text(raw) == "content"

    def test_comments_removed(self):
        assert extract_main_text("<p>a</p><!-- <p>ghost</p> --><p>b</p>") == "a\nb"

    def test_block_tags_become_newlines(self):
        assert extract_main_text("<div>a</div><h2>b</h2><li>c</li>") == "a\nb\nc"

    def test_inline_tags_stripped_in_place(self):
        assert extract_main_text("<p>a <b>bold</b> and <i>ital</i></p>") == "a bold and ital"

    def test_entities_unescaped(self):
        assert extract_main_text("<p>a &amp; b &lt;c&gt; &#39;d&#39;</p>") == "a & b <c> 'd'"

    def test_whitespace_collapsed(self):
        assert extract_main_text("<p>a\n\t  b   c</p>") == "a b c"

    def test_link_dense_block_dropped(self):
        raw = "<div><a href='/1'>more links</a> <a href='/2'>even more</a></div><p>real text stays</p>"
        assert extract_main_text(raw) == "real text stays"

    def test_low_link_density_block_kept(self):
        raw = "<p>lots of ordinary prose with one <a href='/x'>link</a> inside it</p>"
        assert extract_main_text(raw) == "lots of ordinary prose with one link inside it"

    def test_empty(self):
        assert extract_main_text("") == ""
        assert extract_main_text("<div><nav>x</nav></div>") == ""

    def test_wrap_roundtrip_lossless(self):
        chunks = ["alpha beta gamma", "delta epsilon"]
        raw = synth.html_wrap("doc-x", chunks)
        assert extract_main_text(raw) == "alpha beta gamma\ndelta epsilon"

    def test_oracle_and_pipeline_agree(self):
        cases = [
            synth.html_wrap("d", ["one two", "three"]),
            "<p>a</p><!--c--><div><a href='x'>l</a><a href='y'>m</a></div>",
            "<body><aside><p>x<aside>y</aside></p></aside><p>z</p></body>",
            "<p>&nbsp;spaced&nbsp;</p>",
            "plain text no tags",
        ]
        for raw in cases:
            assert extract_main_text(raw) == oracle.html_extract(raw), raw


class TestMalformedMarkupParity:
    def test_unterminated_container_tag(self):
        """Regression: the oracle's container regex lacked the [^>]*>
        opening-tag terminator the pipeline requires, so malformed markup
        ('<nav foo </nav>') removed different ranges on the two sides."""
        from ocr_engine_ray.functions.html import extract_main_text

        cases = [
            "<nav foo </nav> CONTENT <nav>x</nav>",
            "<script no-close> a </script>b<style media </style>c",
            "<aside <aside> inner </aside> tail",
            "< notatag > but < still >",
        ]
        for c in cases:
            assert oracle.html_extract(c) == extract_main_text(c), c

    def test_fuzz_parity_on_taggy_text(self):
        """Randomized tag soup: both sides must agree byte-for-byte."""
        import random

        from ocr_engine_ray.functions.html import extract_main_text

        rng = random.Random(20260817)
        frags = [
            "<nav>", "</nav>", "<nav ", "<p>", "</p>", "<script>", "</script>",
            "text", "more words", "<a href='x'>", "</a>", "<!-- c -->", "<",
            ">", "<div class='y'>", "</div>", "&amp;", "\n",
        ]
        for _ in range(200):
            doc = " ".join(rng.choice(frags) for _ in range(rng.randint(1, 25)))
            assert oracle.html_extract(doc) == extract_main_text(doc), doc
