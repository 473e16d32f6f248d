"""Fuzzy (edit-distance) similarity self-join — the entity-resolution /
record-linkage primitive (ED-Join, Xiao et al. 2008, public): find all pairs
of rows whose string key is within Levenshtein distance ``k``.

Distributed shape:

1. one pass counts global q-gram document frequencies — the gram space is
   bounded by |alphabet|^q (≈8.8k for ASCII bigrams), so the rank table is
   a legitimately tiny ``ray.put`` broadcast at ANY corpus size;
2. each string emits only its ``k·q+1`` RAREST gram elements (multiset
   elements ``(gram, occurrence#)``, ranked by global (df, gram, occ)) —
   the prefix filter: two strings with edit distance ≤ k must share at
   least one element of each other's prefix, because ≤ k edits can destroy
   at most k·q gram occurrences.  Strings too short to own ``k·q+1`` grams
   emit ALL their elements plus a dedicated short-bucket row (they are at
   most ``q(k+1)-1`` chars long, so that bucket is alphabet-bounded);
3. ONE gram-bucket shuffle pairs prefix-sharers per element (sizes logged —
   prefix buckets are df-ranked SMALL by construction, the reason ED-Join
   beats naive gram joins on skewed prefixes).  Each row carries its full
   4-slot prefix vector, and a pair is kept only in the bucket of its
   MINIMUM shared prefix element — the ownership test replaces the old
   second (pair-bucket) shuffle and its global dedupe outright;
4. the verify runs in the same kernel: the closed-form prefix/suffix test
   for k = 1 (`edit_distance_le1_batch`, exact) or a BANDED Levenshtein DP
   (width 2k+1) vectorized across the bucket's candidate pairs for k ≥ 2,
   over a codepoint matrix built once per DISTINCT name, after the free
   |len(a)-len(b)| ≤ k pre-filter.

Exact: no capping anywhere — every surviving pair is verified by the DP,
and the DuckDB twin recomputes the whole join wholesale with its built-in
``levenshtein`` (codepoint semantics on both sides).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..sources.tables import sf_table

logger = logging.getLogger(__name__)

# int64 element encoding: rank<<20 | occurrence#; the SHORT marker sorts
# above every real element (so two short strings sharing a real gram verify
# in that gram's bucket, not the short bucket) and the PAD sentinel above
# everything.
_SHORT_INT = 1 << 62  # plain Python ints: the bucket mix multiplies past
_PAD_INT = (1 << 63) - 1  # int64 range, which must not demote to float64


def _grams(s: str, q: int) -> list[str]:
    return [s[i : i + q] for i in range(len(s) - q + 1)]


def banded_levenshtein(
    a_codes: np.ndarray, a_len: np.ndarray, b_codes: np.ndarray, b_len: np.ndarray, k: int
) -> np.ndarray:
    """Vectorized banded edit distance over P pairs: ``a_codes``/``b_codes``
    are (P, Lmax) int32 codepoint matrices (0-padded), lengths (P,).
    Returns per-pair distance, or k+1 when the true distance exceeds k."""
    P = len(a_len)
    if P == 0:
        return np.empty(0, np.int64)
    big = np.int64(k + 1)
    w = 2 * k + 1
    # dp[p, c] = edit distance at (row i, col j=i+c-k); out-of-band = big
    dp = np.full((P, w), big, np.int64)
    for c in range(k, w):  # row 0: dp[0][j] = j for j <= k
        j = c - k
        dp[:, c] = np.where(j <= b_len, j, big)
    out = np.where(a_len == 0, np.minimum(b_len, big), big).astype(np.int64)
    max_i = int(a_len.max())
    rows = np.arange(P)
    for i in range(1, max_i + 1):
        prev = dp
        dp = np.full((P, w), big, np.int64)
        ai = a_codes[:, i - 1]  # (P,)
        for c in range(w):
            j = i + c - k
            if j < 0:
                continue
            jj = j  # target column in b (1-based)
            valid = (jj >= 0) & (jj <= b_len) & (i <= a_len)
            if jj == 0:
                dp[:, c] = np.where(valid, np.minimum(np.int64(i), big), big)
                continue
            bj = b_codes[:, jj - 1] if jj - 1 < b_codes.shape[1] else np.zeros(P, np.int32)
            sub = prev[:, c] + (ai != bj)  # diag: same c (j-1 = (i-1)+c-k)
            dele = prev[:, c + 1] + 1 if c + 1 < w else np.full(P, big)
            ins = dp[:, c - 1] + 1 if c - 1 >= 0 else np.full(P, big)
            v = np.minimum(np.minimum(sub, dele), ins)
            dp[:, c] = np.where(valid, np.minimum(v, big), big)
        done = a_len == i
        if done.any():
            c_end = b_len[done] - i + k  # j = len(b)
            ok = (c_end >= 0) & (c_end < w)
            res = np.full(int(done.sum()), big, np.int64)
            res[ok] = dp[rows[done][ok], c_end[ok]]
            out[done] = res
    return np.minimum(out, big)


def edit_distance_le1_batch(
    a_codes: np.ndarray, a_len: np.ndarray, b_codes: np.ndarray, b_len: np.ndarray
) -> np.ndarray:
    """Exact Levenshtein verify for the k=1 case, closed form: ed(a,b) <= 1
    iff the common prefix plus the (non-overlapping) common suffix covers
    all but at most one substitution (equal lengths) or all of the shorter
    string (lengths differing by one).  Returns 0, 1 or 2 (2 = "> 1") per
    pair in a handful of O(P·L) vector ops — no DP loop.  Fuzz-pinned
    equal to `banded_levenshtein(·, k=1)` in tests/test_fuzzy.py."""
    P = len(a_len)
    if P == 0:
        return np.empty(0, np.int64)
    L = a_codes.shape[1]
    mn = np.minimum(a_len, b_len)
    tgrid = np.arange(L)[None, :]
    diff = (a_codes != b_codes) | (tgrid >= mn[:, None])
    any_d = diff.any(axis=1)
    cp = np.where(any_d, np.argmax(diff, axis=1), mn)
    ia = np.maximum(a_len[:, None] - 1 - tgrid, 0)
    ib = np.maximum(b_len[:, None] - 1 - tgrid, 0)
    va = np.take_along_axis(a_codes, ia, axis=1)
    vb = np.take_along_axis(b_codes, ib, axis=1)
    sdiff = (va != vb) | (tgrid >= mn[:, None])
    any_s = sdiff.any(axis=1)
    cs = np.where(any_s, np.argmax(sdiff, axis=1), mn)
    cs = np.minimum(cs, mn - cp)  # prefix and suffix may not overlap
    ld = np.abs(a_len - b_len)
    eq = (a_len == b_len) & (cp >= a_len)
    one = np.where(a_len == b_len, cp + cs >= a_len - 1, (ld == 1) & (cp + cs >= mn))
    return np.where(eq, 0, np.where(one, 1, 2)).astype(np.int64)


def _deletion_pairs_k1(
    src: rd.Dataset, *, key: str, name: str, B: int
) -> rd.Dataset:
    """FastSS deletion-neighborhood candidate join + exact closed-form
    verify for the k=1 case (see `fuzzy_name_pairs` docstring).  Two
    shuffles: a variant-key bucket groupby generates candidate pairs
    (names ride along), a pair bucket dedupes globally and verifies with
    `edit_distance_le1_batch`."""
    import zlib

    def variant_rows(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_pylist()
        names = batch.column(name).to_pylist()
        o_bkt, o_h, o_k, o_n = [], [], [], []
        for kk, s in zip(keys, names):
            if s is None:  # SQL levenshtein(NULL, ·) is NULL -> excluded
                continue
            enc = s.encode("utf-8")
            hs = {zlib.crc32(enc)}
            for i in range(len(s)):
                hs.add(zlib.crc32((s[:i] + s[i + 1 :]).encode("utf-8")))
            for h in hs:
                o_bkt.append(h % B)
                o_h.append(h)
                o_k.append(kk)
                o_n.append(s)
        return pa.table(
            {
                "bkt": pa.array(o_bkt, pa.int64()),
                "h": pa.array(o_h, pa.int64()),
                "key": pa.array(o_k, pa.int64()),
                "name": pa.array(o_n, pa.string()),
            }
        )

    def pair_up(group: pa.Table) -> pa.Table:
        keys = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        code = group.column("h").combine_chunks().to_numpy(zero_copy_only=False)
        names_arr = group.column("name").combine_chunks()
        order = np.argsort(code, kind="stable")
        oc = code[order]
        starts = np.flatnonzero(np.r_[True, oc[1:] != oc[:-1]])
        ends = np.r_[starts[1:], len(oc)]
        I_parts, J_parts = [], []
        for s0, s1 in zip(starts, ends):
            m = int(s1 - s0)
            if m < 2:
                continue
            if m > 4096:
                logger.warning(
                    "deletion-key bucket %d holds %d strings — %d pairs",
                    int(oc[s0]), m, m * (m - 1) // 2,
                )
            idx = order[s0:s1]
            ii, jj = np.triu_indices(m, 1)
            I_parts.append(idx[ii])
            J_parts.append(idx[jj])
        if not I_parts:
            return pa.table(
                {
                    "pbkt": pa.array([], pa.int64()),
                    "a_key": pa.array([], pa.int64()),
                    "b_key": pa.array([], pa.int64()),
                    "a_name": pa.array([], pa.string()),
                    "b_name": pa.array([], pa.string()),
                }
            )
        I = np.concatenate(I_parts)
        J = np.concatenate(J_parts)
        ka, kb = keys[I], keys[J]
        swap = ka > kb
        Ia = np.where(swap, J, I)
        Jb = np.where(swap, I, J)
        ka2, kb2 = keys[Ia], keys[Jb]
        keep = ka2 != kb2
        Ia, Jb, ka2, kb2 = Ia[keep], Jb[keep], ka2[keep], kb2[keep]
        # in-bucket pre-dedup (same pair via several variant keys)
        if len(ka2):
            pairs = np.empty(len(ka2), dtype=[("a", np.int64), ("b", np.int64)])
            pairs["a"], pairs["b"] = ka2, kb2
            _, first = np.unique(pairs, return_index=True)
            Ia, Jb, ka2, kb2 = Ia[first], Jb[first], ka2[first], kb2[first]
        return pa.table(
            {
                "pbkt": pa.array((ka2 * 1000003 + kb2) % B),
                "a_key": pa.array(ka2, pa.int64()),
                "b_key": pa.array(kb2, pa.int64()),
                "a_name": names_arr.take(pa.array(Ia)),
                "b_name": names_arr.take(pa.array(Jb)),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        a_k = group.column("a_key").combine_chunks().to_numpy(zero_copy_only=False)
        b_k = group.column("b_key").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(a_k):
            return pa.table(
                {
                    "a_key": pa.array([], pa.int64()),
                    "b_key": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        pairs = np.empty(len(a_k), dtype=[("a", np.int64), ("b", np.int64)])
        pairs["a"], pairs["b"] = a_k, b_k
        _, first = np.unique(pairs, return_index=True)
        a_k, b_k = a_k[first], b_k[first]
        first_pa = pa.array(first)
        both = pc.dictionary_encode(
            pa.concat_arrays(
                [
                    group.column("a_name").combine_chunks().take(first_pa),
                    group.column("b_name").combine_chunks().take(first_pa),
                ]
            )
        )
        idx = np.asarray(both.indices, dtype=np.int64)
        a_idx, b_idx = idx[: len(a_k)], idx[len(a_k) :]
        dic = both.dictionary.to_pylist()
        d_len = np.array([len(s) for s in dic], np.int64)
        a_len, b_len = d_len[a_idx], d_len[b_idx]
        lf = np.abs(a_len - b_len) <= 1
        a_k, b_k = a_k[lf], b_k[lf]
        a_idx, b_idx, a_len, b_len = a_idx[lf], b_idx[lf], a_len[lf], b_len[lf]
        if not len(a_k):
            return pa.table(
                {
                    "a_key": pa.array([], pa.int64()),
                    "b_key": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        dmat = _code_matrix(dic, int(d_len.max()))
        dist = edit_distance_le1_batch(dmat[a_idx], a_len, dmat[b_idx], b_len)
        ok = dist <= 1
        return pa.table(
            {
                "a_key": pa.array(a_k[ok]),
                "b_key": pa.array(b_k[ok]),
                "dist": pa.array(dist[ok]),
            }
        )

    return (
        src.map_batches(variant_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(pair_up, batch_format="pyarrow")
        .groupby("pbkt")
        .map_groups(verify, batch_format="pyarrow")
    )


def fuzzy_name_pairs(
    sf_dir: str,
    *,
    k: int = 1,
    q: int = 2,
    table: str = "customer",
    key: str = "c_custkey",
    name: str = "c_name",
    num_buckets: int = 32,
) -> rd.Dataset:
    """All (a_key, b_key, dist) with ``levenshtein(a.name, b.name) <= k``
    and a_key < b_key.  Exact SQL twin in ``__ray_entry__.oracle_sql()``.

    Candidate strategy by ``k`` (the output is identical either way —
    both schemes generate a SUPERSET of the true pairs and the verify is
    exact):

    - ``k == 1``: FastSS deletion-neighborhood join (Bocek et al. 2007,
      public) — each string emits crc32 keys for itself and its
      ``len(s)`` single-deletion variants; ed(a,b) ≤ 1 implies a shared
      key (substitution at p: del_p(a) == del_p(b)); CRC collisions only
      admit extra candidates.  On uniform corpora (TPC-H names) this cuts
      candidates ~10× vs the gram prefix filter (q-grams of templated
      strings are all common).  Emits O(len) rows per string — the right
      trade for name-length ER keys; long-document joins belong to the
      trigram PPJoin family.
    - ``k >= 2``: ED-Join gram prefix filter (deletion neighborhoods grow
      combinatorially with k), single-shuffle min-shared-element form.
    """
    B = num_buckets
    P = k * q + 1  # prefix length
    S = P + 1  # prefix-vector slots (P elements + the SHORT marker)
    src = sf_table(sf_dir, table, columns=[key, name])
    if k == 1:
        return _deletion_pairs_k1(src, key=key, name=name, B=B)

    # -- pass 1: global gram document frequencies (alphabet-bounded) --------
    def gram_df(batch: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for s in batch.column(name).to_pylist():
            if s is not None:
                cnt.update(set(_grams(s, q)))
        return pa.table(
            {
                "gram": pa.array(list(cnt.keys()), pa.string()),
                "df": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    df_rows = (
        src.map_batches(gram_df, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("df", alias_name="df"))
        .take_all()
    )
    rank_of = {
        r["gram"]: i
        for i, r in enumerate(sorted(df_rows, key=lambda r: (r["df"], r["gram"])))
    }
    rank_ref = ray.put(rank_of)

    # -- pass 2: emit prefix elements (element = gram + occurrence#) --------
    # Every row ALSO carries the string's full prefix as a fixed
    # ``S = P+1``-slot int64 vector (elements encode as rank<<20 | occ;
    # _SHORT_INT for the prefix-exempt marker; _PAD_INT pads — P real
    # elements at most, plus one slot so short strings fit all elements
    # AND the SHORT marker).  A candidate pair is then
    # verified ONLY in the bucket of the MINIMUM shared prefix element —
    # every other shared element sees the same minimum and drops the pair —
    # so the old second (pair-bucket) shuffle and its global dedupe
    # disappear: ONE elem-bucket shuffle runs candidate generation,
    # min-element ownership filtering and the vectorized verify in place.
    def prefix_rows(batch: pa.Table) -> pa.Table:
        ranks = ray.get(rank_ref)
        keys = batch.column(key).to_pylist()
        names = batch.column(name).to_pylist()
        e_bkt, e_key, e_elem, e_name = [], [], [], []
        e_pfx = [[] for _ in range(S)]
        for kk, s in zip(keys, names):
            if s is None:  # SQL levenshtein(NULL, ·) is NULL -> excluded
                continue
            gs = _grams(s, q)
            occ: dict[str, int] = {}
            elems = []
            for g in gs:
                o = occ.get(g, 0)
                occ[g] = o + 1
                elems.append((ranks[g] << 20) | min(o, (1 << 20) - 1))
            elems.sort()
            pick = elems[:P]
            if len(gs) <= k * q:  # prefix-exempt: all elements + short bucket
                pick = elems + [_SHORT_INT]
            pfx = (pick + [_PAD_INT] * S)[:S]
            for e in pick:
                # Fibonacci-mix, HIGH bits: the low bits of both the
                # encode (occurrence#) and the product are occ-dominated,
                # so either ``e % B`` or low-bit mixing would collapse
                # every row into one bucket
                e_bkt.append(((e * 0x9E3779B97F4A7C15 % (1 << 64)) >> 32) % B)
                e_key.append(kk)
                e_elem.append(e)
                e_name.append(s)
                for t in range(S):
                    e_pfx[t].append(pfx[t])
        return pa.table(
            {
                "bkt": pa.array(e_bkt, pa.int64()),
                "key": pa.array(e_key, pa.int64()),
                "elem": pa.array(e_elem, pa.int64()),
                "name": pa.array(e_name, pa.string()),
                **{
                    f"p{t}": pa.array(e_pfx[t], pa.int64()) for t in range(S)
                },
            }
        )

    _EMPTY_OUT = pa.table(
        {
            "a_key": pa.array([], pa.int64()),
            "b_key": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        }
    )

    # -- per elem bucket: pair generation + ownership filter + verify -------
    # Fully vectorized: pair indices from per-run triu_indices, the
    # min-shared-element ownership test as 16 vector compares over the two
    # 4-slot prefix vectors, and the distance verify over a codepoint
    # matrix built once per DISTINCT name (names repeat across thousands
    # of candidates on uniform corpora).  No Python statement executes per
    # candidate pair.
    def pair_verify(group: pa.Table) -> pa.Table:
        keys = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        code = group.column("elem").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(code, kind="stable")
        oc = code[order]
        starts = np.flatnonzero(np.r_[True, oc[1:] != oc[:-1]])
        ends = np.r_[starts[1:], len(oc)]
        I_parts, J_parts = [], []
        for s0, s1 in zip(starts, ends):
            m = int(s1 - s0)
            if m < 2:
                continue
            if m > 4096:
                logger.warning(
                    "fuzzy prefix bucket %d holds %d strings — verifying %d pairs",
                    int(oc[s0]), m, m * (m - 1) // 2,
                )
            idx = order[s0:s1]
            ii, jj = np.triu_indices(m, 1)
            I_parts.append(idx[ii])
            J_parts.append(idx[jj])
        if not I_parts:
            return _EMPTY_OUT
        I = np.concatenate(I_parts)
        J = np.concatenate(J_parts)
        elem_of_pair = code[I]  # == code[J]: pairs form inside one elem run
        # ownership: verify only where this elem is the pair's MIN shared
        # prefix element (unique per pair -> no duplicates anywhere)
        pfx = np.stack(
            [
                group.column(f"p{t}").combine_chunks().to_numpy(zero_copy_only=False)
                for t in range(S)
            ],
            axis=1,
        )
        A4, B4 = pfx[I], pfx[J]
        shared_min = np.full(len(I), _PAD_INT, np.int64)
        for a_slot in range(S):
            av = A4[:, a_slot]
            hit = (av[:, None] == B4).any(axis=1) & (av != _PAD_INT)
            shared_min = np.minimum(shared_min, np.where(hit, av, _PAD_INT))
        own = shared_min == elem_of_pair
        keep = own & (keys[I] != keys[J])
        I, J = I[keep], J[keep]
        if not len(I):
            return _EMPTY_OUT
        swap = keys[I] > keys[J]
        Ia = np.where(swap, J, I)
        Jb = np.where(swap, I, J)
        # verify on a once-per-distinct-name codepoint matrix
        names_enc = pc.dictionary_encode(group.column("name").combine_chunks())
        nidx = np.asarray(names_enc.indices, dtype=np.int64)
        dic = names_enc.dictionary.to_pylist()
        d_len = np.array([len(s) for s in dic], np.int64)
        a_idx, b_idx = nidx[Ia], nidx[Jb]
        a_len, b_len = d_len[a_idx], d_len[b_idx]
        lf = np.abs(a_len - b_len) <= k  # free length filter
        Ia, Jb = Ia[lf], Jb[lf]
        a_idx, b_idx, a_len, b_len = a_idx[lf], b_idx[lf], a_len[lf], b_len[lf]
        if not len(Ia):
            return _EMPTY_OUT
        dmat = _code_matrix(dic, int(d_len.max()))
        if k == 1:
            dist = edit_distance_le1_batch(dmat[a_idx], a_len, dmat[b_idx], b_len)
        else:
            dist = banded_levenshtein(dmat[a_idx], a_len, dmat[b_idx], b_len, k)
        ok = dist <= k
        return pa.table(
            {
                "a_key": pa.array(keys[Ia[ok]], pa.int64()),
                "b_key": pa.array(keys[Jb[ok]], pa.int64()),
                "dist": pa.array(dist[ok]),
            }
        )

    return (
        src.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(pair_verify, batch_format="pyarrow")
    )


def entity_golden_records(
    sf_dir: str, *, k: int = 1, num_buckets: int = 32
) -> rd.Dataset:
    """Entity resolution end-to-end: fuzzy-match pairs → transitive
    closure → one GOLDEN RECORD per duplicate cluster — the dedupe-the-
    customer-file capability on top of `fuzzy_name_pairs` (blocked
    prefix-filter Levenshtein join) and `graph.connected_components`.

    The canonical key is the cluster's MIN custkey (exactly the CC
    cluster_id), the golden name is that record's name (deterministic —
    no arbitrary survivorship), and n_members counts the cluster.  Only
    multi-member clusters appear (singletons have nothing to merge).

    Scale shape: the pair join and CC carry all the data movement (both
    already bucketed); the name attach is a bucketed co-partition hash
    join on ``c_custkey % num_buckets`` (the `joins.brand_volume` idiom —
    NO driver-side name dict, so the dim side never materializes outside
    the cluster), and the final groupby moves cluster-count rows.
    Returns (canonical_key, n_members, canonical_name) sorted by
    canonical_key; twin is the recursive-CTE closure SQL (the
    `embedding_near_dup_clusters` pattern).
    """
    import pandas as pd

    from ..sources.tables import sf_table
    from .graph import connected_components

    pairs = fuzzy_name_pairs(sf_dir, k=k, num_buckets=num_buckets)

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch.column("a_key"), "b": batch.column("b_key")}
        )

    cc = connected_components(pairs.map_batches(to_edges, batch_format="pyarrow"))

    from ray.data.aggregate import Count

    agg = cc.groupby("cluster_id").aggregate(Count(alias_name="n_members"))
    cust = sf_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    B = num_buckets

    def cluster_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("cluster_id").cast(pa.int64())
        return pa.table(
            {
                "bkt": pa.array(
                    keys.to_numpy(zero_copy_only=False) % B
                ).cast(pa.int32()),
                "key": keys,
                "n_members": batch.column("n_members").cast(pa.int64()),
                "c_name": pa.nulls(batch.num_rows, pa.string()),
            }
        )

    def dim_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("c_custkey").cast(pa.int64())
        return pa.table(
            {
                "bkt": pa.array(
                    keys.to_numpy(zero_copy_only=False) % B
                ).cast(pa.int32()),
                "key": keys,
                # Count() rows are never null -> n_members is the side marker
                "n_members": pa.nulls(batch.num_rows, pa.int64()),
                "c_name": batch.column("c_name"),
            }
        )

    both = agg.map_batches(cluster_side, batch_format="pyarrow").union(
        cust.map_batches(dim_side, batch_format="pyarrow")
    )

    _EMPTY = pd.DataFrame(
        {
            "canonical_key": pd.Series([], dtype="int64"),
            "n_members": pd.Series([], dtype="int64"),
            # "string" (not object): Ray's block-size estimator can't
            # np.vectorize over an EMPTY object column (log-spam per task)
            "canonical_name": pd.Series([], dtype="string"),
        }
    )

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0 or "n_members" not in group.columns:
            return _EMPTY  # typed empty: no schema-drift RefBundles
        clusters = group[group["n_members"].notna()][["key", "n_members"]]
        dim = group[group["n_members"].isna()][["key", "c_name"]]
        if clusters.empty:
            return _EMPTY
        j = clusters.merge(dim, on="key", how="inner")
        return pd.DataFrame(
            {
                "canonical_key": j["key"].astype("int64"),
                "n_members": j["n_members"].astype("int64"),
                "canonical_name": j["c_name"].astype("object"),
            }
        )

    return (
        both.groupby("bkt")
        .map_groups(join_bucket, batch_format="pandas")
        .sort("canonical_key")
    )


# --- Sorted-neighborhood blocking + Jaro-Winkler ---------------------------


def jaro_winkler(a: str, b: str) -> float:
    """Jaro-Winkler similarity with DuckDB-matching semantics (verified by
    `tests/test_sorted_neighborhood.py` fuzz vs ``jaro_winkler_similarity``):
    either side empty → 0.0; Winkler prefix boost (scale 0.1, prefix ≤ 4)
    applied only when jaro > 0.7; ASCII/codepoint comparison."""
    l1, l2 = len(a), len(b)
    if l1 == 0 or l2 == 0:
        return 0.0
    md = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i in range(l1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and a[i] == b[j]:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3
    if j > 0.7:
        p = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            p += 1
        j = j + 0.1 * p * (1 - j)
    return j


def damerau_levenshtein(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (Lowrance & Wagner 1975) with
    DuckDB-matching semantics — fuzz-pinned equal to DuckDB's
    ``damerau_levenshtein`` over 1500 random cases in
    `tests/test_sorted_neighborhood.py` (DuckDB is NOT the restricted
    OSA variant: dl('ca','abc') = 2)."""
    la, lb = len(a), len(b)
    maxd = la + lb
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxd
    for i in range(la + 1):
        d[i + 1][0] = maxd
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxd
        d[1][j + 1] = j
    da: dict[str, int] = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _code_matrix(strs: list[str], lmax: int) -> np.ndarray:
    """(N, lmax) int32 codepoint matrix, 0-padded (0 never occurs in text)."""
    m = np.zeros((len(strs), max(lmax, 1)), np.int32)
    for i, s in enumerate(strs):
        cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        m[i, : len(cp)] = cp.astype(np.int32)
    return m


def jaro_winkler_batch(
    a_codes: np.ndarray, a_len: np.ndarray, b_codes: np.ndarray, b_len: np.ndarray
) -> np.ndarray:
    """Vectorized Jaro-Winkler over P pairs — bit-identical to the scalar
    `jaro_winkler` (asserted by the fuzz test in
    tests/test_sorted_neighborhood.py): the greedy first-unmatched-in-window
    match scan runs as a (char position × window offset) loop of O(P)
    vector steps, and every float expression keeps the scalar's exact
    operation order, so the IEEE results (and any >= tau decisions) agree
    bit-for-bit."""
    P = len(a_len)
    if P == 0:
        return np.empty(0, np.float64)
    l1 = a_len.astype(np.int64)
    l2 = b_len.astype(np.int64)
    La, Lb = a_codes.shape[1], b_codes.shape[1]
    md = np.maximum(np.maximum(l1, l2) // 2 - 1, 0)
    md_max = int(md.max())
    m1 = np.zeros((P, max(La, 1)), bool)
    m2 = np.zeros((P, max(Lb, 1)), bool)
    i_max = int(l1.max()) if P else 0
    for i in range(i_max):
        found = np.zeros(P, bool)
        ai = a_codes[:, i]
        live = i < l1
        for d in range(-md_max, md_max + 1):
            j = i + d
            if j < 0 or j >= Lb:
                continue
            cand = (
                live
                & ~found
                & (j < l2)
                & (np.abs(d) <= md)
                & ~m2[:, j]
                & (ai == b_codes[:, j])
            )
            if cand.any():
                m1[cand, i] = True
                m2[cand, j] = True
                found |= cand
    m = m1.sum(axis=1).astype(np.int64)
    # transpositions: compact each side's matched chars in order, compare
    Lm = max(La, Lb, 1)
    seq_a = np.zeros((P, Lm), np.int32)
    seq_b = np.zeros((P, Lm), np.int32)
    ra, ca = np.nonzero(m1)
    pos_a = np.cumsum(m1, axis=1) - 1
    seq_a[ra, pos_a[ra, ca]] = a_codes[ra, ca]
    rb, cb = np.nonzero(m2)
    pos_b = np.cumsum(m2, axis=1) - 1
    seq_b[rb, pos_b[rb, cb]] = b_codes[rb, cb]
    valid = np.arange(Lm)[None, :] < m[:, None]
    t = ((seq_a != seq_b) & valid).sum(axis=1) // 2
    mf = m.astype(np.float64)
    l1s = np.maximum(l1, 1)
    l2s = np.maximum(l2, 1)
    ms = np.maximum(m, 1)
    j = (mf / l1s + mf / l2s + (mf - t) / ms) / 3
    # Winkler prefix boost (scale 0.1, prefix <= 4), only when jaro > 0.7
    pre_w = min(4, La, Lb)
    if pre_w > 0:
        eq4 = (a_codes[:, :pre_w] == b_codes[:, :pre_w]) & (
            np.arange(pre_w)[None, :] < np.minimum(l1, l2)[:, None]
        )
        p = np.cumprod(eq4, axis=1).sum(axis=1)
    else:
        p = np.zeros(P, np.int64)
    j = np.where(j > 0.7, j + 0.1 * p * (1 - j), j)
    return np.where((m > 0) & (l1 > 0) & (l2 > 0), j, 0.0)


def damerau_levenshtein_batch(
    a_codes: np.ndarray,
    a_len: np.ndarray,
    b_codes: np.ndarray,
    b_len: np.ndarray,
    chunk: int = 4096,
) -> np.ndarray:
    """Vectorized unrestricted Damerau-Levenshtein (Lowrance & Wagner 1975)
    over P pairs — exact-integer, asserted equal to the scalar
    `damerau_levenshtein` by the fuzz test.  The (P, la+2, lb+2) DP cube is
    processed one a-row at a time with the classic running-minimum trick
    for the sequential insertion chain; the chunk size caps the cube at
    ~50 MB per call."""
    P = len(a_len)
    out = np.empty(P, np.int64)
    for s in range(0, P, chunk):
        e = min(s + chunk, P)
        out[s:e] = _dl_chunk(a_codes[s:e], a_len[s:e], b_codes[s:e], b_len[s:e])
    return out


def _dl_chunk(
    a_codes: np.ndarray, la: np.ndarray, b_codes: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    P = len(la)
    if P == 0:
        return np.empty(0, np.int64)
    la = la.astype(np.int64)
    lb = lb.astype(np.int64)
    La = int(la.max())
    Lb = int(lb.max())
    maxd = (la + lb).astype(np.int32)
    D = np.zeros((P, La + 2, Lb + 2), np.int32)
    D[:, 0, :] = maxd[:, None]
    D[:, :, 0] = maxd[:, None]
    D[:, 1:, 1] = np.arange(La + 1, dtype=np.int32)[None, :]
    D[:, 1, 1:] = np.arange(Lb + 1, dtype=np.int32)[None, :]
    flat = D.reshape(P, -1)
    stride = Lb + 2
    jcols = np.arange(1, Lb + 1, dtype=np.int32)  # b position j (1-based)
    # da_for_b[p, j] = last row i' (so far) with a[i'-1] == b[j-1]
    da_for_b = np.zeros((P, Lb + 1), np.int32)
    for i in range(1, La + 1):
        ai = a_codes[:, i - 1]
        match = (
            (b_codes[:, :Lb] == ai[:, None])
            & (jcols[None, :] <= lb[:, None])
            & (i <= la)[:, None]
        )
        # l = db: last matched column BEFORE j in this row (exclusive max)
        mj = np.where(match, jcols[None, :], np.int32(0))
        run = np.maximum.accumulate(mj, axis=1)
        db_at = np.concatenate(
            [np.zeros((P, 1), np.int32), run[:, :-1]], axis=1
        )
        k = da_for_b[:, 1:]  # (P, Lb), row of last a-occurrence of b[j-1]
        cost = (~match).astype(np.int32)
        prev = D[:, i, :]
        sub = prev[:, 1 : Lb + 1] + cost
        dele = prev[:, 2 : Lb + 2] + 1
        Dkl = np.take_along_axis(flat, (k * stride + db_at).astype(np.int64), axis=1)
        trans = Dkl + (np.int32(i) - k - 1) + (jcols[None, :] - db_at - 1) + 1
        cn = np.minimum(np.minimum(sub, dele), trans)
        # insertion chain d[j+1] = min(cn[j], d[j]+1), d[1] = i, via
        # running min of (value - column)
        acc = np.concatenate(
            [np.full((P, 1), i - 1, np.int32), cn - (jcols[None, :] + 1)], axis=1
        )
        u = np.minimum.accumulate(acc, axis=1)[:, 1:]
        D[:, i + 1, 2 : Lb + 2] = u + (jcols[None, :] + 1)
        da_for_b[:, 1:][match] = np.int32(i)
    idx = ((la + 1) * stride + (lb + 1)).astype(np.int64)
    return np.take_along_axis(flat, idx[:, None], axis=1)[:, 0].astype(np.int64)


def sorted_neighborhood_pairs(
    sf_dir: str,
    *,
    window: int = 8,
    tau: float = 0.92,
    table: str = "part",
    key: str = "p_partkey",
    name: str = "p_name",
    prefix_bytes: int = 2,
    seg_size: int = 4096,
    metric: str = "jw",
    max_dist: int = 2,
) -> rd.Dataset:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995, public): rank
    every row by its sort key, slide a ``window``-row neighborhood down the
    ranked order, and keep pairs with ``jaro_winkler(name_a, name_b) >=
    tau`` — the classic O(n·w) entity-resolution alternative to the q-gram
    prefix filter in `fuzzy_name_pairs`.

    Distributed shape (two passes, no global sort):

    1. RANK — order-preserving prefix bucketing: rows group by the first
       ``prefix_bytes`` of the name (lexicographically consistent with the
       full (name, key) order), per-bucket counts give exclusive driver
       offsets (bucket-count-sized broadcast — the `rank_by_quality`
       two-pass shape), and each bucket sorts locally to assign global
       ranks.  Skewed-prefix corpora (every name sharing one prefix) want
       the sampled range-boundary variant (`range_partition_plan` is the
       planner for it); the bucket kernel logs oversized buckets.
    2. PAIR — ranks chunk into ``seg_size`` segments; a row also replicates
       into the PREVIOUS segment when ``rank % seg_size < window`` so every
       (r, r+Δ≤window) pair co-locates; the segment kernel pairs each owned
       row with its ``window`` successors and verifies Jaro-Winkler ≥ tau.

    Decision exactness: `jaro_winkler` is fuzz-pinned equal to DuckDB's
    double; the gate-data margin ``min |jw − tau|`` is 0.0145 at sf0.01 /
    sf0.1 (measured), dwarfing any last-ulp concern.  Returns (a, b) key
    pairs in rank order (a the lower rank), sorted.
    """
    src = sf_table(sf_dir, table, columns=[key, name])

    def bucketize(batch: pa.Table) -> pa.Table:
        names = batch.column(name).to_pylist()
        return pa.table(
            {
                "pfx": pa.array(
                    [(n or "")[:prefix_bytes] for n in names], pa.string()
                ),
                "key": batch.column(key).cast(pa.int64()),
                "nm": pa.array([n or "" for n in names], pa.string()),
            }
        )

    from ray.data.aggregate import Count

    rows = src.map_batches(bucketize, batch_format="pyarrow").materialize()
    parts = rows.groupby("pfx").aggregate(Count(alias_name="n")).take_all()
    offsets: dict[str, int] = {}
    acc = 0
    for r in sorted(parts, key=lambda r: r["pfx"]):
        offsets[r["pfx"]] = acc
        acc += r["n"]
    off_ref = ray.put(offsets)

    def rank_and_emit(group: pa.Table) -> pa.Table:
        off = ray.get(off_ref)[group.column("pfx")[0].as_py()]
        ks = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        nm = group.column("nm").to_pylist()
        order = sorted(range(len(ks)), key=lambda i: (nm[i], ks[i]))
        seg, rk, key_o, nm_o = [], [], [], []
        for local, i in enumerate(order):
            r = off + local
            # every segment that owns a rank in [r-window, r] needs this
            # row (covers window > seg_size too)
            for s in range(max(0, (r - window) // seg_size), r // seg_size + 1):
                seg.append(s)
                rk.append(r)
                key_o.append(int(ks[i]))
                nm_o.append(nm[i])
        return pa.table(
            {
                "seg": pa.array(seg, pa.int64()),
                "rk": pa.array(rk, pa.int64()),
                "key": pa.array(key_o, pa.int64()),
                "nm": pa.array(nm_o, pa.string()),
            }
        )

    ranked = rows.groupby("pfx").map_groups(rank_and_emit, batch_format="pyarrow")

    def pair_kernel(group: pa.Table) -> pa.Table:
        # Candidate window pairs are generated vectorized (one arange per
        # rank offset), then verified in ONE batched distance-kernel call —
        # `jaro_winkler_batch` / `damerau_levenshtein_batch` are fuzz-pinned
        # bit-identical to the scalar kernels, so every >= tau / <= max_dist
        # decision matches the per-pair loop exactly.
        seg = group.column("seg")[0].as_py()
        rk = group.column("rk").combine_chunks().to_numpy(zero_copy_only=False)
        ks = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        nm = group.column("nm").to_pylist()
        order = np.argsort(rk, kind="stable")
        rk, ks = rk[order], ks[order]
        nm = [nm[i] for i in order]
        n = len(rk)
        owned = (rk // seg_size) == seg
        ii_parts, jj_parts = [], []
        for o in range(1, window + 1):
            if o >= n:
                break
            t = np.arange(n - o)
            keep = owned[t] & (rk[t + o] <= rk[t] + window)
            if keep.any():
                ii_parts.append(t[keep])
                jj_parts.append(t[keep] + o)
        if not ii_parts:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        ii = np.concatenate(ii_parts)
        jj = np.concatenate(jj_parts)
        lens = np.array([len(s) for s in nm], np.int64)
        codes = _code_matrix(nm, int(lens.max()) if n else 0)
        if metric == "jw":
            sim = jaro_winkler_batch(codes[ii], lens[ii], codes[jj], lens[jj])
            hit = sim >= tau
        else:
            dist = damerau_levenshtein_batch(
                codes[ii], lens[ii], codes[jj], lens[jj]
            )
            hit = dist <= max_dist
        return pa.table(
            {
                "a": pa.array(ks[ii[hit]], pa.int64()),
                "b": pa.array(ks[jj[hit]], pa.int64()),
            }
        )

    return (
        ranked.groupby("seg")
        .map_groups(pair_kernel, batch_format="pyarrow")
        .sort(["a", "b"])
    )


def sorted_neighborhood_damerau(sf_dir: str, **kwargs) -> rd.Dataset:
    """`sorted_neighborhood_pairs` with the TYPO model instead of the
    Jaro-Winkler one: keep window pairs within unrestricted
    Damerau-Levenshtein distance ``max_dist`` (default 2) — transposition
    -aware, all-integer verify (no float margin to reason about at all).
    Twin: the same rank-window self-join over DuckDB's own
    ``damerau_levenshtein``."""
    return sorted_neighborhood_pairs(sf_dir, metric="damerau", **kwargs)
