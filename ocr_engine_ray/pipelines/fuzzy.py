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
   beats naive gram joins on skewed prefixes); a pair-bucket shuffle
   dedupes candidates that share several prefix elements;
4. the verify stage runs a BANDED Levenshtein DP (width 2k+1) vectorized
   across each bucket's candidate pairs (numpy rows over codepoint
   matrices — O(pairs · maxlen · (2k+1)), never the full O(n·m) table),
   after the free |len(a)-len(b)| ≤ k pre-filter.

Exact: no capping anywhere — every surviving pair is verified by the DP,
and the DuckDB twin recomputes the whole join wholesale with its built-in
``levenshtein`` (codepoint semantics on both sides).
"""

from __future__ import annotations

import logging
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..sources.tables import sf_table

logger = logging.getLogger(__name__)

_SHORT = "\x00short\x00"  # dedicated bucket element for prefix-exempt strings


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
    and a_key < b_key.  Exact SQL twin in ``__ray_entry__.oracle_sql()``."""
    B = num_buckets
    P = k * q + 1  # prefix length
    src = sf_table(sf_dir, table, columns=[key, name])

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
    def prefix_rows(batch: pa.Table) -> pa.Table:
        ranks = ray.get(rank_ref)
        keys = batch.column(key).to_pylist()
        names = batch.column(name).to_pylist()
        e_bkt, e_key, e_elem, e_name = [], [], [], []
        for kk, s in zip(keys, names):
            if s is None:  # SQL levenshtein(NULL, ·) is NULL -> excluded
                continue
            gs = _grams(s, q)
            occ: dict[str, int] = {}
            elems = []
            for g in gs:
                o = occ.get(g, 0)
                occ[g] = o + 1
                elems.append((ranks[g], o, f"{g}\x1f{o}"))
            elems.sort()
            pick = [e for _, _, e in elems[:P]]
            if len(gs) <= k * q:  # prefix-exempt: all elements + short bucket
                pick = [e for _, _, e in elems] + [_SHORT]
            for e in pick:
                e_bkt.append(zlib.crc32(e.encode()) % B)
                e_key.append(kk)
                e_elem.append(e)
                e_name.append(s)
        return pa.table(
            {
                "bkt": pa.array(e_bkt, pa.int64()),
                "key": pa.array(e_key, pa.int64()),
                "elem": pa.array(e_elem, pa.string()),
                "name": pa.array(e_name, pa.string()),
            }
        )

    # -- per element: candidate pairs (both sides hold the element) ---------
    def pair_up(group: pa.Table) -> pa.Table:
        elems = group.column("elem").to_pylist()
        keys = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        names = group.column("name").to_pylist()
        enc = pc.dictionary_encode(group.column("elem").combine_chunks())
        code = np.asarray(enc.indices, dtype=np.int64)
        order = np.argsort(code, kind="stable")
        oc = code[order]
        starts = np.flatnonzero(np.r_[True, oc[1:] != oc[:-1]])
        ends = np.r_[starts[1:], len(oc)]
        a_k, b_k, a_n, b_n = [], [], [], []
        for s0, s1 in zip(starts, ends):
            m = s1 - s0
            if m < 2:
                continue
            if m > 4096:
                logger.warning(
                    "fuzzy prefix bucket %r holds %d strings — verifying %d pairs",
                    elems[order[s0]], m, m * (m - 1) // 2,
                )
            idx = order[s0:s1]
            ii, jj = np.triu_indices(m, 1)
            ka, kb = keys[idx[ii]], keys[idx[jj]]
            swap = ka > kb
            ka2 = np.where(swap, kb, ka)
            kb2 = np.where(swap, ka, kb)
            keep = ka2 != kb2
            for x, y in zip(ka2[keep], kb2[keep]):
                a_k.append(int(x))
                b_k.append(int(y))
            ni = [names[t] for t in idx]
            for t_i, t_j, sw, kp in zip(ii, jj, swap, keep):
                if not kp:
                    continue
                if sw:
                    a_n.append(ni[t_j]); b_n.append(ni[t_i])
                else:
                    a_n.append(ni[t_i]); b_n.append(ni[t_j])
        pb = [(a * 1000003 + b) % B for a, b in zip(a_k, b_k)]
        return pa.table(
            {
                "pbkt": pa.array(pb, pa.int64()),
                "a_key": pa.array(a_k, pa.int64()),
                "b_key": pa.array(b_k, pa.int64()),
                "a_name": pa.array(a_n, pa.string()),
                "b_name": pa.array(b_n, pa.string()),
            }
        )

    # -- per pair bucket: dedupe + banded-DP verify --------------------------
    def verify(group: pa.Table) -> pa.Table:
        a_k = group.column("a_key").combine_chunks().to_numpy(zero_copy_only=False)
        b_k = group.column("b_key").combine_chunks().to_numpy(zero_copy_only=False)
        a_n = group.column("a_name").to_pylist()
        b_n = group.column("b_name").to_pylist()
        _, first = np.unique(
            np.stack([a_k, b_k], axis=1), axis=0, return_index=True
        )
        a_k, b_k = a_k[first], b_k[first]
        a_n = [a_n[i] for i in first]
        b_n = [b_n[i] for i in first]
        a_len = np.array([len(s) for s in a_n], np.int64)
        b_len = np.array([len(s) for s in b_n], np.int64)
        lf = np.abs(a_len - b_len) <= k  # free length filter
        a_k, b_k, a_len, b_len = a_k[lf], b_k[lf], a_len[lf], b_len[lf]
        a_n = [s for s, m in zip(a_n, lf) if m]
        b_n = [s for s, m in zip(b_n, lf) if m]
        if not len(a_k):
            return pa.table(
                {
                    "a_key": pa.array([], pa.int64()),
                    "b_key": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        lmax = int(max(a_len.max(), b_len.max()))

        def mat(strs: list[str]) -> np.ndarray:
            m = np.zeros((len(strs), lmax), np.int32)
            for i, s in enumerate(strs):
                cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
                m[i, : len(cp)] = cp.astype(np.int32)
            return m

        dist = banded_levenshtein(mat(a_n), a_len, mat(b_n), b_len, k)
        ok = dist <= k
        return pa.table(
            {
                "a_key": pa.array(a_k[ok]),
                "b_key": pa.array(b_k[ok]),
                "dist": pa.array(dist[ok]),
            }
        )

    return (
        src.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(pair_up, batch_format="pyarrow")
        .groupby("pbkt")
        .map_groups(verify, batch_format="pyarrow")
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
    already bucketed); the name attach is a dim-table broadcast (customer
    is the canonical broadcast side everywhere in `joins`), and the final
    groupby moves cluster-count rows.  Returns (canonical_key, n_members,
    canonical_name) sorted by canonical_key; twin is the recursive-CTE
    closure SQL (the `embedding_near_dup_clusters` pattern).
    """
    import ray

    from ..sources.tables import sf_table
    from .graph import connected_components

    pairs = fuzzy_name_pairs(sf_dir, k=k, num_buckets=num_buckets)

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"a": batch.column("a_key"), "b": batch.column("b_key")}
        )

    cc = connected_components(pairs.map_batches(to_edges, batch_format="pyarrow"))

    cust = sf_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    names: dict[int, str] = {}
    for r in cust.take_all():  # dim-sized, the broadcast-join budget
        names[r["c_custkey"]] = r["c_name"]
    nref = ray.put(names)

    from ray.data.aggregate import Count

    agg = cc.groupby("cluster_id").aggregate(Count(alias_name="n_members"))

    def finish(batch: pa.Table, *, ref) -> pa.Table:
        nm = ray.get(ref)
        keys = batch.column("cluster_id").to_pylist()
        return pa.table(
            {
                "canonical_key": pa.array(keys, pa.int64()),
                "n_members": batch.column("n_members").cast(pa.int64()),
                "canonical_name": pa.array([nm[k] for k in keys], pa.string()),
            }
        )

    return (
        agg.map_batches(finish, batch_format="pyarrow", fn_kwargs={"ref": nref})
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
        seg = group.column("seg")[0].as_py()
        rk = group.column("rk").combine_chunks().to_numpy(zero_copy_only=False)
        ks = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        nm = group.column("nm").to_pylist()
        order = np.argsort(rk, kind="stable")
        rk, ks = rk[order], ks[order]
        nm = [nm[i] for i in order]
        a_out, b_out = [], []
        for i in range(len(rk)):
            if rk[i] // seg_size != seg:
                continue  # replica owned by the previous segment
            for j in range(i + 1, len(rk)):
                if rk[j] > rk[i] + window:
                    break
                if (
                    jaro_winkler(nm[i], nm[j]) >= tau
                    if metric == "jw"
                    else damerau_levenshtein(nm[i], nm[j]) <= max_dist
                ):
                    a_out.append(int(ks[i]))
                    b_out.append(int(ks[j]))
        return pa.table(
            {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())}
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
