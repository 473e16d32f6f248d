"""ED-Join fuzzy similarity join: banded-DP unit tests vs a from-scratch
full-matrix Levenshtein, planted corpora (shorts, duplicates, unicode),
and bucket invariance.  The sf-scale twin equality runs via
scripts/compare_oracle.py (`fuzzy_customer_pairs`)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.fuzzy import banded_levenshtein, fuzzy_name_pairs


def _full_lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(prev + (ca != cb), dp[j] + 1, dp[j - 1] + 1)
    return dp[len(b)]


def _banded(a: str, b: str, k: int) -> int:
    lmax = max(len(a), len(b), 1)

    def mat(s):
        m = np.zeros((1, lmax), np.int32)
        cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        m[0, : len(cp)] = cp.astype(np.int32)
        return m

    return int(
        banded_levenshtein(
            mat(a), np.array([len(a)]), mat(b), np.array([len(b)]), k
        )[0]
    )


class TestBandedDP:
    @pytest.mark.parametrize(
        "a,b",
        [
            ("kitten", "sitting"),
            ("flaw", "lawn"),
            ("", ""),
            ("", "ab"),
            ("ab", ""),
            ("abc", "abc"),
            ("abc", "axc"),
            ("abc", "abcd"),
            ("abcd", "abc"),
            ("aaaa", "aaab"),
            ("münchen", "munchen"),
        ],
    )
    @pytest.mark.parametrize("k", [1, 2, 3])
    def test_matches_full_matrix(self, a, b, k):
        want = _full_lev(a, b)
        got = _banded(a, b, k)
        assert got == min(want, k + 1)

    def test_random_agreement(self):
        rng = np.random.RandomState(7)
        alphabet = "abcx"
        for _ in range(300):
            a = "".join(rng.choice(list(alphabet), rng.randint(0, 9)))
            b = "".join(rng.choice(list(alphabet), rng.randint(0, 9)))
            for k in (1, 2):
                assert _banded(a, b, k) == min(_full_lev(a, b), k + 1), (a, b, k)


class TestFuzzyJoin:
    def _write(self, tmp_path, names):
        rows = [{"c_custkey": i, "c_name": s} for i, s in enumerate(names)]
        d = tmp_path / "fz"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "customer.parquet"))
        return str(d)

    def _naive(self, names, k):
        out = []
        for i, a in enumerate(names):
            for j in range(i + 1, len(names)):
                b = names[j]
                if a is None or b is None:
                    continue
                d = _full_lev(a, b)
                if d <= k:
                    out.append((i, j, d))
        return sorted(out)

    def test_planted_corpus(self, ray_session, tmp_path):
        names = [
            "alpha", "alphc", "alpxa",  # within 1 of each other
            "beta", "betas", "bet",     # inserts/deletes
            "a", "b", "ab", "",          # prefix-exempt shorts
            "alpha",                      # exact duplicate (dist 0)
            None,                         # NULL excluded like SQL
            "gamma",
        ]
        sf = self._write(tmp_path, names)
        got = sorted(
            (r["a_key"], r["b_key"], r["dist"])
            for r in fuzzy_name_pairs(sf, k=1).take_all()
        )
        assert got == self._naive(names, 1)

    def test_k2_and_bucket_invariance(self, ray_session, tmp_path):
        names = ["spark", "spank", "shark", "sharp", "spam", "sp", "s", "spars"]
        sf = self._write(tmp_path, names)
        got = sorted(
            (r["a_key"], r["b_key"], r["dist"])
            for r in fuzzy_name_pairs(sf, k=2).take_all()
        )
        assert got == self._naive(names, 2)
        alt = sorted(
            (r["a_key"], r["b_key"], r["dist"])
            for r in fuzzy_name_pairs(sf, k=2, num_buckets=3).take_all()
        )
        assert alt == got
