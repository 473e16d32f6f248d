"""jusText-style block boilerplate strip (pipelines/decontam.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.decontam import (
    JUSTEXT_BLOCK_WORDS,
    justext_boilerplate,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def planted_sf(tmp_path):
    """One doc exercising every class transition, plus degenerate docs."""
    good = " ".join(["the word"] * 10)  # 20 tokens, 10 stopwords → good
    bad = " ".join(["word"] * 20)  # 0 stopwords → bad
    near = "the " + " ".join(["word"] * 19)  # 1 stopword, 20 tokens → near
    texts = {
        # blocks: good, near(→promoted), bad, near(not adjacent to good)
        0: f"{good} {near} {bad} {near}",
        # short tail block: 24 tokens → blocks of 20 + 4; the 4-token
        # tail is 'short' even though it is 100% stopwords
        1: f"{bad} the the the the",
        2: "",  # zero tokens → no output row
        3: "the a to of",  # single short block → counted, never good
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestJustext:
    def test_planted_classes(self, planted_sf):
        rows = {
            r["doc_id"]: (
                r["n_blocks"],
                r["n_good"],
                r["n_promoted"],
                r["kept_words"],
            )
            for r in justext_boilerplate(planted_sf).take_all()
        }
        # doc 0: good + promoted-near + bad + lone near → 2 good blocks
        assert rows[0] == (4, 2, 1, 40)
        # doc 1: bad block + short stopword tail → nothing kept
        assert rows[1] == (2, 0, 0, 0)
        # doc 2 dropped (no tokens)
        assert 2 not in rows
        # doc 3: one short block, counted but never good
        assert rows[3] == (1, 0, 0, 0)

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = justext_boilerplate(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = con.execute(e.oracle_sql()["justext_boilerplate"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # non-degenerate: the corpus must produce good, promoted AND
        # dropped blocks or the thresholds have drifted
        assert 0 < got.n_good.sum() < got.n_blocks.sum()
        assert got.n_promoted.sum() > 0

    def test_block_size_constant(self):
        assert JUSTEXT_BLOCK_WORDS == 20
