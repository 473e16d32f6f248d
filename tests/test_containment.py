"""Asymmetric n-gram containment pairs (pipelines/dedup.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.dedup import containment_pairs

SF = "/root/testdata/sf0.001"

QUOTE = "alpha bravo charlie delta echo foxtrot golf hotel"
FILLER = " ".join(f"w{i}" for i in range(60))


@pytest.fixture()
def planted_sf(tmp_path):
    """A short doc fully quoted inside a long one: containment ≈ 1 in one
    direction, Jaccard far below any dedup threshold."""
    texts = {
        0: QUOTE,  # contained doc
        1: f"{FILLER} {QUOTE}",  # container (quotes doc 0 verbatim)
        2: "completely unrelated content about different things",
        3: QUOTE,  # exact dup of 0 → mutual containment with 0 and 1
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
class TestContainment:
    def test_planted_quote_is_asymmetric(self, planted_sf):
        pairs = {
            (r["a"], r["b"]) for r in containment_pairs(planted_sf).take_all()
        }
        # the quote is contained in the long doc, never the reverse
        assert (0, 1) in pairs and (1, 0) not in pairs
        assert (3, 1) in pairs and (1, 3) not in pairs
        # exact dups contain each other
        assert (0, 3) in pairs and (3, 0) in pairs
        assert not any(2 in p for p in pairs)

    def test_block_split_invariance(self, planted_sf):
        one = containment_pairs(planted_sf, block_rows=1024).take_all()
        many = containment_pairs(planted_sf, block_rows=2).take_all()
        assert one == many

    def test_matches_registered_twin_at_sf0001(self):
        import __ray_entry__ as e

        got = containment_pairs(SF).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        want = con.execute(e.oracle_sql()["containment_pairs"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert len(got) > 0
