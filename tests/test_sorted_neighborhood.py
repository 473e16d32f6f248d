"""Sorted-neighborhood blocking + Jaro-Winkler verify."""

from __future__ import annotations

import itertools
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_engine_ray.pipelines.fuzzy import (
    damerau_levenshtein,
    jaro_winkler,
    sorted_neighborhood_damerau,
    sorted_neighborhood_pairs,
)

SF = "/root/testdata/sf0.001"


def test_jaro_winkler_matches_duckdb():
    """Fuzz-pin `jaro_winkler` to DuckDB's double, including the
    empty-string and no-match edge cases the Winkler boost rides on."""
    con = duckdb.connect()
    rng = random.Random(7)
    words = ["cold", "small", "large", "blue", "red", "widget", "bolt", "rod"]
    pairs = list(itertools.combinations([f"{a} {b}" for a in words[:4] for b in words[4:]], 2))
    pairs += [("", ""), ("", "a"), ("abc", ""), ("martha", "marhta"), ("dwayne", "duane")]
    for _ in range(400):
        a = "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 12)))
        pairs.append((a, b))
    for a, b in pairs:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == want, (a, b)


def _write_parts(d, names):
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(len(names)), pa.int64()),
                "p_name": pa.array(names, pa.string()),
            }
        ),
        str(d / "part.parquet"),
    )
    return str(d)


def _naive(names, window=8, tau=0.92):
    ranked = sorted((n, k) for k, n in enumerate(names))
    out = []
    for i in range(len(ranked)):
        for j in range(i + 1, min(i + window + 1, len(ranked))):
            if jaro_winkler(ranked[i][0], ranked[j][0]) >= tau:
                out.append((ranked[i][1], ranked[j][1]))
    return sorted(out)


@pytest.mark.usefixtures("ray_session")
class TestSortedNeighborhood:
    def test_matches_naive_reference(self, tmp_path):
        names = [
            "cold widget", "cold widgets", "small bolt", "small bolts",
            "large rod", "large rods", "blue gear", "blue gears",
            "cold widget", "small bolt",
        ]
        sf = _write_parts(tmp_path / "a", names)
        got = [(r["a"], r["b"]) for r in sorted_neighborhood_pairs(sf).take_all()]
        assert got == _naive(names)

    def test_segment_replication_boundary(self, tmp_path):
        # seg_size smaller than the corpus forces cross-segment windows;
        # result must be segment-size invariant
        names = [f"name {chr(97 + i)}" for i in range(30)]
        sf = _write_parts(tmp_path / "b", names)
        big = [(r["a"], r["b"]) for r in sorted_neighborhood_pairs(sf).take_all()]
        small = [
            (r["a"], r["b"])
            for r in sorted_neighborhood_pairs(sf, seg_size=7).take_all()
        ]
        assert big == small == _naive(names)

    def test_prefix_bucket_invariance(self, tmp_path):
        names = ["aa x", "ab x", "ba x", "bb x", "aa y", "ab y"] * 3
        sf = _write_parts(tmp_path / "c", names)
        a = [
            (r["a"], r["b"])
            for r in sorted_neighborhood_pairs(sf, prefix_bytes=1).take_all()
        ]
        b = [
            (r["a"], r["b"])
            for r in sorted_neighborhood_pairs(sf, prefix_bytes=3).take_all()
        ]
        assert a == b == _naive(names)

    def test_window_bounds_pairs(self, tmp_path):
        # identical names beyond window distance must NOT pair
        names = ["same name"] * 12
        sf = _write_parts(tmp_path / "d", names)
        got = [
            (r["a"], r["b"])
            for r in sorted_neighborhood_pairs(sf, window=2).take_all()
        ]
        assert got == _naive(names, window=2)
        assert len(got) == 11 + 10  # rank deltas 1 and 2 only

    def test_gate_data_margin(self):
        # the tau decision margin on real gate data dwarfs double noise
        t = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey", "p_name"])
        ranked = sorted(
            zip(t.column("p_name").to_pylist(), t.column("p_partkey").to_pylist())
        )
        margin = min(
            abs(jaro_winkler(ranked[i][0], ranked[j][0]) - 0.92)
            for i in range(len(ranked))
            for j in range(i + 1, min(i + 9, len(ranked)))
        )
        assert margin > 1e-6


def test_damerau_matches_duckdb():
    """Fuzz-pin the Lowrance-Wagner implementation to DuckDB's
    UNRESTRICTED damerau_levenshtein (dl('ca','abc') == 2, not OSA's 3)."""
    con = duckdb.connect()
    rng = random.Random(5)
    cases = [("ca", "abc"), ("ab", "ba"), ("", ""), ("a", ""), ("abcdef", "abdcfe")]
    for _ in range(600):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 9)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 9)))
        cases.append((a, b))
    for a, b in cases:
        want = con.execute(
            "select damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)
    assert damerau_levenshtein("ca", "abc") == 2  # the unrestricted marker


@pytest.mark.usefixtures("ray_session")
def test_damerau_variant_matches_naive(tmp_path):
    names = ["cold widget", "cold widgte", "dold widget", "other thing",
             "cold widget", "smal bolt", "small bolt"]
    sf = _write_parts(tmp_path / "dl", names)
    got = [(r["a"], r["b"]) for r in sorted_neighborhood_damerau(sf).take_all()]
    ranked = sorted((n, k) for k, n in enumerate(names))
    want = []
    for i in range(len(ranked)):
        for j in range(i + 1, min(i + 9, len(ranked))):
            if damerau_levenshtein(ranked[i][0], ranked[j][0]) <= 2:
                want.append((ranked[i][1], ranked[j][1]))
    assert got == sorted(want)


def test_batch_kernels_bit_identical_to_scalar():
    """The vectorized pair kernels (`jaro_winkler_batch`,
    `damerau_levenshtein_batch`) must agree BIT-FOR-BIT with the scalar
    functions (which are themselves fuzz-pinned to DuckDB above) — the
    >= tau / <= max_dist decisions in `sorted_neighborhood_pairs` ride on
    exact equality, not closeness."""
    import numpy as np

    from ocr_engine_ray.pipelines.fuzzy import (
        _code_matrix,
        damerau_levenshtein_batch,
        jaro_winkler_batch,
    )

    rng = random.Random(99)
    words = ["goldenrod", "lavender", "spring", "chocolate", "lace", "puff"]
    pairs = []
    for _ in range(800):
        a = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 11)))
        b = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 11)))
        pairs.append((a, b))
    for _ in range(400):  # realistic multi-word names + small edits
        a = " ".join(rng.choice(words) for _ in range(rng.randint(1, 4)))
        bl = list(a)
        for _ in range(rng.randint(0, 3)):
            if not bl:
                break
            p = rng.randrange(len(bl))
            op = rng.choice("idst")
            if op == "i":
                bl.insert(p, rng.choice("abcde"))
            elif op == "d":
                del bl[p]
            elif op == "t" and p + 1 < len(bl):
                bl[p], bl[p + 1] = bl[p + 1], bl[p]
            else:
                bl[p] = rng.choice("abcde")
        pairs.append((a, "".join(bl)))
    A = [p[0] for p in pairs]
    B = [p[1] for p in pairs]
    al = np.array([len(s) for s in A], np.int64)
    bl_ = np.array([len(s) for s in B], np.int64)
    am = _code_matrix(A, int(al.max()))
    bm = _code_matrix(B, int(bl_.max()))
    jw = jaro_winkler_batch(am, al, bm, bl_)
    dl = damerau_levenshtein_batch(am, al, bm, bl_, chunk=257)
    for i, (a, b) in enumerate(pairs):
        assert jw[i] == jaro_winkler(a, b), (a, b)  # bitwise, no tolerance
        assert dl[i] == damerau_levenshtein(a, b), (a, b)
