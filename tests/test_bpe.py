"""BPE trainer tests: hand-computed merges, the frequency-floor bound, and
pipeline == independent-oracle equality on a planted corpus."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_engine_ray import oracle_dedup as od
from ocr_engine_ray.pipelines import bpe


class TestMergeLoop:
    def test_hand_computed(self):
        # "low" x5, "lower" x2: first merge is (l,o) count 7, then (lo,w) 7,
        # then (low,</w>) 5, then (low,e) 2 ...
        merges = bpe.merge_loop([("low", 5), ("lower", 2)], 4)
        assert [(m[1], m[2], m[4]) for m in merges] == [
            ("l", "o", 7),
            ("lo", "w", 7),
            ("low", "</w>", 5),
            # remaining pairs all count 2 -> ('e','r') wins lexicographically
            ("e", "r", 2),
        ]

    def test_tie_break_lexicographic(self):
        # "ab" and "cd" both count 1 -> ('a','b') wins the tie
        merges = bpe.merge_loop([("ab", 1), ("cd", 1)], 1)
        assert (merges[0][1], merges[0][2]) == ("a", "b")

    def test_exhausts_pairs(self):
        merges = bpe.merge_loop([("ab", 3)], 10)
        # a+b, ab+</w> -> then single symbols only
        assert len(merges) == 2


class TestBpeTrain:
    def _write(self, tmp_path, texts):
        rows = [
            {"doc_id": i, "text": t, "lang": "en", "source": "s",
             "n_chars": len(t)}
            for i, t in enumerate(texts)
        ]
        d = tmp_path / "bpe"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        return str(d)

    def test_matches_independent_oracle(self, ray_session, tmp_path):
        sf = self._write(
            tmp_path,
            ["low low low lower lowest", "newer newest new", "Low LOWER",
             "", "wide wider widest wide wide"],
        )
        t = bpe.bpe_train(sf, num_merges=20)
        pipe = list(zip(t.column("rank").to_pylist(), t.column("left").to_pylist(),
                        t.column("right").to_pylist(),
                        t.column("pair_count").to_pylist()))
        assert pipe == od.bpe_merges(sf, 20)

    def test_vocab_bound_changes_merges_deterministically(self, ray_session, tmp_path):
        """The frequency floor is part of the operator contract: both sides
        apply the same (count DESC, word ASC) top-V cut."""
        sf = self._write(
            tmp_path,
            ["aaa aaa aaa bbb bbb ccc", "ddd eee fff ggg hhh iii jjj"],
        )
        t = bpe.bpe_train(sf, num_merges=5, max_vocab_words=2)
        pipe = list(zip(t.column("rank").to_pylist(), t.column("left").to_pylist(),
                        t.column("right").to_pylist(),
                        t.column("pair_count").to_pylist()))
        assert pipe == od.bpe_merges(sf, 5, max_vocab_words=2)
        # only aaa(3) and bbb(2) survive the cut: ('a','a') = 2 adjacent
        # positions x freq 3 = 6
        assert (pipe[0][1], pipe[0][2], pipe[0][3]) == ("a", "a", 6)


class TestApplyMerges:
    def test_hand_computed(self):
        # train on "low"x5 + "lower"x2 (see TestMergeLoop): merges are
        # (l,o) (lo,w) (low,</w>) (e,r) -> "low" = [low</w>] = 1 subword,
        # "lower" = [low, er, </w>] = 3, unseen "wide" stays chars+eow = 5.
        merges = bpe.merge_loop([("low", 5), ("lower", 2)], 4)
        ranks = {(m[1], m[2]): m[0] for m in merges}
        assert bpe.apply_merges("low", ranks) == 1
        assert bpe.apply_merges("lower", ranks) == 3
        assert bpe.apply_merges("wide", ranks) == 5
        assert bpe.apply_merges("", ranks) == 1  # bare </w>

    def test_lowest_rank_first(self):
        # ranks: (a,b)=0, (b,c)=1.  "abc" must merge (a,b) first -> [ab, c,
        # </w>] = 3 even though (b,c) also matches initially.
        ranks = {("a", "b"): 0, ("b", "c"): 1}
        assert bpe.apply_merges("abc", ranks) == 3

    def test_left_to_right_single_pass(self):
        # (a,a)=0 over "aaa": one pass merges positions 0-1 -> [aa, a];
        # no (aa,a) rule so stop at 3 symbols incl. </w>.
        assert bpe.apply_merges("aaa", {("a", "a"): 0}) == 3


class TestBpeEncode:
    def _write(self, tmp_path, texts):
        rows = [
            {"doc_id": i, "text": t, "lang": "en", "source": "s",
             "n_chars": len(t or "")}
            for i, t in enumerate(texts)
        ]
        d = tmp_path / "bpe_enc"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        return str(d)

    def test_matches_independent_oracle(self, ray_session, tmp_path):
        sf = self._write(
            tmp_path,
            ["low low low lower lowest", "newer newest new", "Low LOWER",
             "", None, "wide wider widest wide wide"],
        )
        got = sorted(
            (r["doc_id"], r["n_words"], r["n_subwords"])
            for r in bpe.bpe_encode_stats(sf, num_merges=10).take_all()
        )
        assert got == od.bpe_encode_rows(sf, 10)
        # null/empty docs survive with zero counts
        assert (3, 0, 0) in got and (4, 0, 0) in got

    def test_digest_matches_oracle(self, ray_session, tmp_path):
        sf = self._write(tmp_path, ["low lower", "low low wide"])
        dig = bpe.bpe_encode_digest(sf, num_merges=6).column("digest")[0].as_py()
        assert dig == od.bpe_encode_digest(od.bpe_encode_rows(sf, 6))
