"""Distributed table profiler — per-column null counts + EXACT distinct
counts (the Deequ / Great-Expectations stats-collection pass every lakehouse
ingestion pipeline runs before trusting a new drop).

Scale shape (one corpus pass, ONE shuffle, no per-column scans):

1. one ``map_batches`` pass computes, per column: the batch null/row
   partials (tiny ``kind=0`` rows) and the batch-DISTINCT value keys
   (``kind=1`` rows) — values are canonicalized to their Arrow string cast
   (injective, deterministic); keys longer than 32 chars are md5-hashed so
   the shuffle never moves payload-sized strings, while numeric/date
   columns pay no hashing at all.  Batch-local dedupe is the map-side
   combine, so a column with heavy value repetition ships each value once
   per block, not once per row;
2. the ``(column, key)`` stream shuffles ONCE by key hash bucket; each
   bucket counts its distinct (column, key) pairs with one ``np.unique``
   and emits |columns|-sized partials;
3. the driver folds B×|columns| scalars.  No column data ever reaches the
   driver.

Exactness: short keys are the values themselves (collision-free); long
strings are exact up to md5 collisions (2^-128 — the same accepted
equivalence every content-addressed store relies on).  The DuckDB twin
recomputes ``count(DISTINCT col)`` wholesale.  High-cardinality
columns dominate the shuffle by construction (they ARE the data); the key
space is uniform md5, so bucket skew is impossible even when value skew is
extreme — this is the profiler's advantage over a naive per-column
``groupby(col)``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources.tables import sf_table

_PROFILE_BUCKETS = 64


def profile_columns(
    sf_dir: str, *, table: str = "lineitem", num_buckets: int = _PROFILE_BUCKETS
) -> rd.Dataset:
    """Profile every column of ``table``: returns (col_name, n_rows, n_nulls,
    n_distinct) sorted by column name.  Exact SQL twin (a UNION ALL of
    per-column aggregates) in ``__ray_entry__.oracle_sql()``."""
    ds = sf_table(sf_dir, table)
    cols = sorted(ds.schema().names)
    col_idx = {c: i for i, c in enumerate(cols)}
    B = num_buckets

    def partials(batch: pa.Table) -> pa.Table:
        kind, cid, bkt, key, nulls, rows = [], [], [], [], [], []
        n = batch.num_rows
        for c in batch.column_names:
            i = col_idx[c]
            col = batch.column(c)
            # the per-column stats partial (one tiny row)
            kind.append(np.array([0], np.int64))
            cid.append(np.array([i], np.int64))
            bkt.append(np.array([-1], np.int64))
            key.append([""])
            nulls.append(np.array([col.null_count], np.int64))
            rows.append(np.array([n], np.int64))
            # batch-local distinct keys (map-side combine); nulls excluded
            # to match SQL count(DISTINCT col).  Short values key by their
            # (injective, deterministic) Arrow string cast — no hashing at
            # all for numeric/date columns; only strings longer than 32
            # chars pay an md5, capping the shuffle width on text columns.
            # The 'r:'/'h:' prefixes keep the two key spaces disjoint.
            uniq = pc.unique(pc.drop_null(col.combine_chunks()))
            as_str = pc.cast(uniq, pa.string()).to_pylist()
            ks = [
                "r:" + s
                if len(s) <= 32
                else "h:" + hashlib.md5(s.encode("utf-8")).hexdigest()
                for s in as_str
            ]
            m = len(ks)
            kind.append(np.ones(m, np.int64))
            cid.append(np.full(m, i, np.int64))
            bkt.append(
                np.array([zlib.crc32(k.encode()) % B for k in ks], np.int64)
            )
            key.append(ks)
            nulls.append(np.zeros(m, np.int64))
            rows.append(np.zeros(m, np.int64))
        return pa.table(
            {
                "kind": pa.array(np.concatenate(kind)),
                "cid": pa.array(np.concatenate(cid)),
                "bkt": pa.array(np.concatenate(bkt)),
                "key": pa.array([k for ks in key for k in ks], pa.string()),
                "nulls": pa.array(np.concatenate(nulls)),
                "rows": pa.array(np.concatenate(rows)),
            }
        )

    mat = ds.map_batches(partials, batch_format="pyarrow").materialize()

    # null/row partials: tiny (blocks × columns), folded on the driver
    stats = mat.filter(expr="kind == 0").take_all()
    n_rows = np.zeros(len(cols), np.int64)
    n_nulls = np.zeros(len(cols), np.int64)
    for r in stats:
        n_rows[r["cid"]] += r["rows"]
        n_nulls[r["cid"]] += r["nulls"]

    # ONE key-bucket shuffle; per bucket: distinct (cid, key) pairs
    def bucket_distinct(group: pa.Table) -> pa.Table:
        g = group.filter(pc.equal(group.column("kind"), 1))
        if g.num_rows == 0:
            return pa.table(
                {"cid": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        cid = g.column("cid").combine_chunks().to_numpy(zero_copy_only=False)
        keys = g.column("key").to_pylist()
        pairs = np.unique(np.array([f"{c}|{k}" for c, k in zip(cid, keys)]))
        pcid = np.array([int(p.split("|", 1)[0]) for p in pairs], np.int64)
        u, cnt = np.unique(pcid, return_counts=True)
        return pa.table(
            {"cid": pa.array(u, pa.int64()), "n": pa.array(cnt.astype(np.int64))}
        )

    parts = (
        mat.filter(expr="kind == 1")
        .groupby("bkt")
        .map_groups(bucket_distinct, batch_format="pyarrow")
        .take_all()
    )  # ≤ B × |columns| scalars
    n_distinct = np.zeros(len(cols), np.int64)
    for r in parts:
        n_distinct[r["cid"]] += r["n"]

    out = pa.table(
        {
            "col_name": pa.array(cols, pa.string()),
            "n_rows": pa.array(n_rows),
            "n_nulls": pa.array(n_nulls),
            "n_distinct": pa.array(n_distinct),
        }
    )
    return rd.from_arrow(out)


HIST_BINS = 16


def profile_histograms(
    sf_dir: str,
    *,
    table: str = "lineitem",
    cols: tuple[str, ...] = ("l_quantity", "l_extendedprice", "l_discount"),
    nbins: int = HIST_BINS,
) -> rd.Dataset:
    """Equi-width value histograms per numeric column — the profiler's
    second pass (distribution shape next to `profile_columns`' null/
    distinct counts; zone-map and skew decisions read these).

    Bucketing happens on the EXACT integer cents grid (``q = round(x·100)``
    half-away, then ``bin = (q - min) * nbins // (max - min + 1)`` — pure
    int64 on both sides), so no histogram boundary can drift between the
    distributed pass and the SQL twin the way float `width_bucket` edges
    do.  Two column-pruned passes: (1) per-batch (col, min, max) partials →
    a 2·|cols|·blocks-row fold on the driver; (2) per-batch ``np.bincount``
    per column against the broadcast bounds → (col, bin, n) partials → one
    tiny groupby.  The corpus never shuffles.

    Returns (col_name, bin, lo_q, hi_q, n) sorted by (col_name, bin) —
    lo_q/hi_q are the bin's inclusive integer-cents bounds, derived from
    the same arithmetic.
    """
    import ray
    from ray.data.aggregate import Sum

    ds = sf_table(sf_dir, table, columns=list(cols))

    def qcol(batch: pa.Table, name: str) -> np.ndarray:
        col = batch.column(name)
        col = col.filter(pc.is_valid(col))
        if len(col) == 0:
            return np.array([], dtype=np.int64)
        # RoundOptions built per call: pyarrow option objects don't pickle,
        # and this helper is captured by the shipped batch closures
        q = pc.round(
            pc.multiply(col.cast(pa.float64()), pa.scalar(100.0)),
            options=pc.RoundOptions(round_mode="half_towards_infinity"),
        ).cast(pa.int64())
        return q.to_numpy(zero_copy_only=False)

    def minmax_partials(batch: pa.Table) -> pa.Table:
        names, lo, hi = [], [], []
        for c in cols:
            q = qcol(batch, c)
            if len(q):
                names.append(c)
                lo.append(int(q.min()))
                hi.append(int(q.max()))
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
            }
        )

    bounds: dict[str, tuple[int, int]] = {}
    for r in ds.map_batches(minmax_partials, batch_format="pyarrow").take_all():
        c = r["col_name"]
        cur = bounds.get(c)
        bounds[c] = (
            r["lo"] if cur is None else min(cur[0], r["lo"]),
            r["hi"] if cur is None else max(cur[1], r["hi"]),
        )
    bref = ray.put(bounds)

    def bin_partials(batch: pa.Table, *, ref) -> pa.Table:
        b = ray.get(ref)
        names, bins, ns = [], [], []
        for c in cols:
            if c not in b:
                continue
            q = qcol(batch, c)
            if not len(q):
                continue
            lo, hi = b[c]
            binv = (q - lo) * nbins // (hi - lo + 1)
            cnt = np.bincount(binv, minlength=nbins)
            nz = np.nonzero(cnt)[0]
            names.extend([c] * len(nz))
            bins.extend(nz.tolist())
            ns.extend(cnt[nz].tolist())
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "bin": pa.array(bins, pa.int64()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(bin_partials, batch_format="pyarrow", fn_kwargs={"ref": bref})
        .groupby(["col_name", "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        cn = batch.column("col_name").to_pylist()
        bn = batch.column("bin").to_numpy(zero_copy_only=False)
        lo = np.array([bounds[c][0] for c in cn], dtype=np.int64)
        hi = np.array([bounds[c][1] for c in cn], dtype=np.int64)
        width = hi - lo + 1
        # bin b covers q in [lo + ceil(b*width/nbins), lo + ceil((b+1)*width/nbins) - 1]
        lo_q = lo + (bn * width + nbins - 1) // nbins
        hi_q = lo + ((bn + 1) * width + nbins - 1) // nbins - 1
        return pa.table(
            {
                "col_name": batch.column("col_name"),
                "bin": batch.column("bin"),
                "lo_q": pa.array(lo_q),
                "hi_q": pa.array(hi_q),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(["col_name", "bin"])


# ---------------------------------------------------------------------------
# Robust (median/MAD) outlier profiling
# ---------------------------------------------------------------------------


def _grid_kth2(values: np.ndarray, counts: np.ndarray, n: int) -> int:
    """2× the multiset median from a SORTED value histogram — the exact
    identity ``2·median = v[(n-1)//2] + v[n//2]`` (both parities), so the
    result stays on the integer grid."""
    cum = np.cumsum(counts)
    lo = int(values[np.searchsorted(cum, (n - 1) // 2 + 1)])
    hi = int(values[np.searchsorted(cum, n // 2 + 1)])
    return lo + hi


def price_outliers(sf_dir: str, *, num_buckets: int = 16) -> rd.Dataset:
    """Robust per-brand price-outlier profile: median and MAD (median
    absolute deviation) of part retail prices per brand on the EXACT
    integer grid, and the count of parts beyond the classic 3×MAD fence.
    Medians live on the doubled grid (``med2 = 2·median`` of cents is
    always an integer; ``mad4 = 4·MAD`` likewise), so the fence test
    ``|x − med| > 3·MAD`` becomes the pure-integer ``2·dev2 > 3·mad4`` —
    no float touches any comparison, and the DuckDB ``median()`` twin
    matches bit-for-bit.

    Scale shape: per-batch (brand, cents) histogram partials pre-combine
    map-side; ONE brand-bucket shuffle carries histogram rows (distinct
    price points per brand, never parts); the per-brand kernel does two
    weighted selections + one weighted fence count over its histogram —
    value-grid-sized work regardless of corpus size.

    Returns (p_brand, n_parts, med2_cents, mad4_cents, n_outliers)
    sorted by p_brand.
    """
    import functools

    parts = sf_table(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def hist_rows(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["p_retailprice"].to_numpy() * 100).astype(np.int64)
        df = df.assign(cents=cents)
        g = (
            df.groupby(["p_brand", "cents"], sort=False)
            .size()
            .reset_index(name="n")
        )
        brands = g["p_brand"].astype(str)
        bkt = np.array(
            [zlib.crc32(b.encode("utf-8")) % num_buckets for b in brands],
            dtype=np.int64,
        )
        return pa.table(
            {
                "bkt": pa.array(bkt),
                "p_brand": pa.array(brands, pa.string()),
                "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            }
        )

    def brand_stats(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        out = {
            "p_brand": [],
            "n_parts": [],
            "med2_cents": [],
            "mad4_cents": [],
            "n_outliers": [],
        }
        for brand, bg in df.groupby("p_brand", sort=False):
            # fold duplicate (cents) partials across batches
            vals, inv = np.unique(bg["cents"].to_numpy(), return_inverse=True)
            cnt = np.zeros(len(vals), np.int64)
            np.add.at(cnt, inv, bg["n"].to_numpy())
            n = int(cnt.sum())
            med2 = _grid_kth2(vals, cnt, n)
            dev2 = np.abs(vals * 2 - med2)
            dvals, dinv = np.unique(dev2, return_inverse=True)
            dcnt = np.zeros(len(dvals), np.int64)
            np.add.at(dcnt, dinv, cnt)
            mad4 = _grid_kth2(dvals, dcnt, n)
            n_out = int(cnt[2 * dev2 > 3 * mad4].sum())
            out["p_brand"].append(str(brand))
            out["n_parts"].append(n)
            out["med2_cents"].append(med2)
            out["mad4_cents"].append(mad4)
            out["n_outliers"].append(n_out)
        return pa.table(
            {
                "p_brand": pa.array(out["p_brand"], pa.string()),
                "n_parts": pa.array(out["n_parts"], pa.int64()),
                "med2_cents": pa.array(out["med2_cents"], pa.int64()),
                "mad4_cents": pa.array(out["mad4_cents"], pa.int64()),
                "n_outliers": pa.array(out["n_outliers"], pa.int64()),
            }
        )

    return (
        parts.map_batches(hist_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(brand_stats, batch_format="pyarrow")
        .sort("p_brand")
    )


def _grid_kth(values: np.ndarray, counts: np.ndarray, k: int) -> int:
    """The k-th smallest (1-based) element of the multiset encoded by a
    SORTED value histogram."""
    cum = np.cumsum(counts)
    return int(values[np.searchsorted(cum, k)])


WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorized_pricing(sf_dir: str, *, num_buckets: int = 16) -> rd.Dataset:
    """Winsorized revenue per returnflag: extended-price cents clipped at
    the exact in-group p05/p95 values before summing — the robust
    aggregate that keeps a fat-tailed metric reportable (the standard
    trim/winsorize feature-engineering step).  Percentile rank is pinned
    to ``k = max(1, ceil(q·N))``-th smallest (no interpolation), so both
    sides select the same grid element regardless of percentile-function
    conventions.

    Scale shape: per-batch (flag, cents) histogram partials pre-combine
    map-side; ONE flag-bucket shuffle carries histogram rows; the
    per-flag kernel does two rank selections and one weighted clip-sum
    over its histogram — value-grid-sized work regardless of corpus size
    (the `price_outliers` pattern).

    Returns (l_returnflag, n_items, p05_cents, p95_cents,
    winsorized_sum_cents, n_clipped_lo, n_clipped_hi) sorted by flag.
    """
    import math

    li = sf_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])

    def hist_rows(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        df = df.assign(cents=cents)
        g = (
            df.groupby(["l_returnflag", "cents"], sort=False)
            .size()
            .reset_index(name="n")
        )
        flags = g["l_returnflag"].astype(str)
        bkt = np.array(
            [zlib.crc32(f.encode("utf-8")) % num_buckets for f in flags],
            dtype=np.int64,
        )
        return pa.table(
            {
                "bkt": pa.array(bkt),
                "l_returnflag": pa.array(flags, pa.string()),
                "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            }
        )

    def flag_stats(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        out: dict[str, list] = {
            "l_returnflag": [],
            "n_items": [],
            "p05_cents": [],
            "p95_cents": [],
            "winsorized_sum_cents": [],
            "n_clipped_lo": [],
            "n_clipped_hi": [],
        }
        for flag, fg in df.groupby("l_returnflag", sort=False):
            vals, inv = np.unique(fg["cents"].to_numpy(), return_inverse=True)
            cnt = np.zeros(len(vals), np.int64)
            np.add.at(cnt, inv, fg["n"].to_numpy())
            n = int(cnt.sum())
            k_lo = max(1, math.ceil(WINSOR_LO * n))
            k_hi = max(1, math.ceil(WINSOR_HI * n))
            lo = _grid_kth(vals, cnt, k_lo)
            hi = _grid_kth(vals, cnt, k_hi)
            clipped = np.clip(vals, lo, hi)
            out["l_returnflag"].append(str(flag))
            out["n_items"].append(n)
            out["p05_cents"].append(lo)
            out["p95_cents"].append(hi)
            out["winsorized_sum_cents"].append(int((clipped * cnt).sum()))
            out["n_clipped_lo"].append(int(cnt[vals < lo].sum()))
            out["n_clipped_hi"].append(int(cnt[vals > hi].sum()))
        return pa.table(
            {
                "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
                "n_items": pa.array(out["n_items"], pa.int64()),
                "p05_cents": pa.array(out["p05_cents"], pa.int64()),
                "p95_cents": pa.array(out["p95_cents"], pa.int64()),
                "winsorized_sum_cents": pa.array(
                    out["winsorized_sum_cents"], pa.int64()
                ),
                "n_clipped_lo": pa.array(out["n_clipped_lo"], pa.int64()),
                "n_clipped_hi": pa.array(out["n_clipped_hi"], pa.int64()),
            }
        )

    return (
        li.map_batches(hist_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(flag_stats, batch_format="pyarrow")
        .sort("l_returnflag")
    )


BENFORD_EXPECTED_PPM = tuple(
    int(np.round(np.log10(1.0 + 1.0 / d) * 1_000_000)) for d in range(1, 10)
)


def benford_audit(sf_dir: str) -> rd.Dataset:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data / unit-mixing screen an ingestion pipeline runs on
    money columns.  First significant digit is taken from the exact
    integer cents' decimal string (no float log10 near power-of-ten
    boundaries), counted map-side, folded in one 9-row aggregate.

    Returns (digit, n, observed_ppm, expected_ppm) for digits 1..9 —
    observed_ppm = ⌊n·10⁶/N⌋ exact integer; expected_ppm is the Benford
    constant round_even(log10(1+1/d)·10⁶).
    """
    from ray.data.aggregate import Sum

    orders = sf_table(sf_dir, "orders", columns=["o_totalprice"])

    def digits(batch: pa.Table) -> pa.Table:
        cents = np.round(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        cents = cents[cents > 0]
        # leading digit by repeated integer division — vectorized (the
        # float log10 path drifts at power-of-ten boundaries; a per-row
        # str() loop is a hot-path Python loop)
        first = cents.copy()
        for _ in range(18):  # int64 has at most 19 digits
            big = first >= 10
            if not big.any():
                break
            first[big] //= 10
        d, n = np.unique(first, return_counts=True)
        return pa.table(
            {"digit": pa.array(d), "n": pa.array(n.astype(np.int64))}
        )

    agg = (
        orders.map_batches(digits, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    by_digit = {int(r["digit"]): int(r["n"]) for r in agg}
    total = sum(by_digit.values())
    ds = list(range(1, 10))
    ns = [by_digit.get(d, 0) for d in ds]
    return rd.from_arrow(
        pa.table(
            {
                "digit": pa.array(ds, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "observed_ppm": pa.array(
                    [n * 1_000_000 // max(total, 1) for n in ns], pa.int64()
                ),
                "expected_ppm": pa.array(list(BENFORD_EXPECTED_PPM), pa.int64()),
            }
        )
    )


def pearson_price_qty(sf_dir: str, *, chunk: int = 8192) -> rd.Dataset:
    """Pearson correlation between quantity and extended price per
    returnflag, computed from EXACT integer moment sums (n, Σx, Σy, Σx²,
    Σy², Σxy on the cents grid) — the mergeable-moments pattern: partials
    combine associatively and commutatively, so batching and merge order
    cannot move the result (unlike incremental float covariance, which is
    order-sensitive).  Floats appear exactly once, in the final
        r = (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²)·(n·Σy² − Σy²))
    evaluated with the identical operand order as the HUGEINT twin, then
    quantized to ppm — bit-identical on both sides.

    Scale shape: per-batch int64 moment partials (squares are summed in
    ``chunk``-row slices so no int64 addition can overflow, then carried
    as arbitrary-precision Python ints serialized as decimal strings);
    the driver folds batches×flags tiny rows.  Returns
    (l_returnflag, n, corr_ppm) sorted by flag.
    """
    li = sf_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = np.round(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        y = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        flags = df["l_returnflag"].astype(str).to_numpy()
        out: dict[str, list] = {k: [] for k in ("flag", "n", "sx", "sy", "sxx", "syy", "sxy")}
        for f in np.unique(flags):
            sel = flags == f
            fx, fy = x[sel], y[sel]
            n = int(sel.sum())
            sx, sy = int(fx.sum()), int(fy.sum())
            sxx = syy = sxy = 0
            for i in range(0, n, chunk):  # overflow-safe int64 slices
                cx, cy = fx[i : i + chunk], fy[i : i + chunk]
                sxx += int((cx * cx).sum())
                syy += int((cy * cy).sum())
                sxy += int((cx * cy).sum())
            out["flag"].append(str(f))
            out["n"].append(str(n))
            out["sx"].append(str(sx))
            out["sy"].append(str(sy))
            out["sxx"].append(str(sxx))
            out["syy"].append(str(syy))
            out["sxy"].append(str(sxy))
        return pa.table(
            {
                "flag": pa.array(out["flag"], pa.string()),
                "n": pa.array(out["n"], pa.string()),
                "sx": pa.array(out["sx"], pa.string()),
                "sy": pa.array(out["sy"], pa.string()),
                "sxx": pa.array(out["sxx"], pa.string()),
                "syy": pa.array(out["syy"], pa.string()),
                "sxy": pa.array(out["sxy"], pa.string()),
            }
        )

    import math

    rows = li.map_batches(partials, batch_format="pyarrow").take_all()
    acc: dict[str, list[int]] = {}
    for r in rows:
        a = acc.setdefault(r["flag"], [0, 0, 0, 0, 0, 0])
        for i, k in enumerate(("n", "sx", "sy", "sxx", "syy", "sxy")):
            a[i] += int(r[k])
    flags = sorted(acc)
    ns, corr = [], []
    for f in flags:
        n, sx, sy, sxx, syy, sxy = acc[f]
        num = n * sxy - sx * sy
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        if varx == 0 or vary == 0:
            corr.append(0)
        else:
            r_val = float(num) / math.sqrt(float(varx) * float(vary))
            corr.append(int(np.round(r_val * 1_000_000)))
        ns.append(n)
    return rd.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(flags, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "corr_ppm": pa.array(corr, pa.int64()),
            }
        )
    )


def gini_by_segment(sf_dir: str, *, num_buckets: int = 64, chunk: int = 8192) -> rd.Dataset:
    """Revenue-concentration (Gini coefficient) per customer market segment
    over per-customer order revenue — the inequality/concentration report
    every marketplace profile runs.  With revenues sorted ascending and
    1-based ranks i,
        G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx),
    computed from EXACT integer-cents sums (rank products chunk-summed in
    int64 slices, carried as Python ints), ONE float division at the end,
    quantized to ppm — the `pearson_price_qty` mergeable-exact contract.

    Scale shape: one custkey-keyed aggregate (map-side combined) folds
    orders to per-customer revenue; segment attaches via the broadcast
    customer dim (the `mktsegment_revenue` join side); ranking is the
    two-pass order-preserving value-bucket prefix sum (`rank_by_quality`
    shape — per-(segment, bucket) counts give exclusive rank offsets, each
    bucket ranks locally), so no global sort and no driver-side data path.
    Ties (equal cents) cannot move Σi·x, so any tie order is exact; the
    pinned order (cents, custkey) matches the twin's row_number anyway.
    Returns (c_mktsegment, n_customers, sum_cents, gini_ppm) sorted by
    segment.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    from .analytics import _cents
    from .joins import _get_broadcast

    orders = sf_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def rev_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": batch.column("o_custkey").cast(pa.int64()),
                "cents": _cents(batch.column("o_totalprice")),
            }
        )
        agg = pa.TableGroupBy(t, "k").aggregate([("cents", "sum")])
        return pa.table(
            {"k": agg.column("k"), "cents": agg.column("cents_sum").cast(pa.int64())}
        )

    rev = (
        orders.map_batches(rev_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("k")
        .aggregate(Sum("cents", alias_name="cents"))
    )

    cust = sf_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).take_all()
    seg_of = {r["c_custkey"]: r["c_mktsegment"] for r in cust}
    seg_ref = ray.put(seg_of)

    # pass 1a: attach segment + compute the global max for order-preserving
    # value buckets (cents · B // (max+1) keeps bucket order == value order).
    def attach(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lookup = _get_broadcast(seg_ref)
        keys = pd.Series(batch.column("k").to_numpy(zero_copy_only=False))
        segs = keys.map(lookup)
        hit = segs.notna().to_numpy()
        if not hit.all():
            batch = batch.filter(pa.array(hit))
            segs = segs[hit]
        return pa.table(
            {
                "seg": pa.array(segs, pa.string()),
                "k": batch.column("k"),
                "cents": batch.column("cents"),
            }
        )

    tagged = rev.map_batches(attach, batch_format="pyarrow").materialize()
    mx = tagged.max("cents") or 0

    def bucketize(batch: pa.Table) -> pa.Table:
        c = batch.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        bkt = (c.astype(np.int64) * num_buckets) // (int(mx) + 1)
        return batch.append_column("bkt", pa.array(np.clip(bkt, 0, num_buckets - 1)))

    bucketed = tagged.map_batches(bucketize, batch_format="pyarrow").materialize()
    parts = (
        bucketed.groupby(["seg", "bkt"]).aggregate(Count(alias_name="n")).take_all()
    )
    offsets: dict[tuple[str, int], int] = {}
    acc: dict[str, int] = {}
    for r in sorted(parts, key=lambda r: (r["seg"], r["bkt"])):
        offsets[(r["seg"], r["bkt"])] = acc.get(r["seg"], 0)
        acc[r["seg"]] = acc.get(r["seg"], 0) + int(r["n"])
    off_ref = ray.put(offsets)

    def rank_partial(group: pa.Table) -> pa.Table:
        off = _get_broadcast(off_ref)
        seg = group.column("seg")[0].as_py()
        base = off[(seg, group.column("bkt")[0].as_py())]
        c = group.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        k = group.column("k").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((k, c))
        xs = c[order].astype(np.int64)
        n = len(xs)
        ranks = base + np.arange(1, n + 1, dtype=np.int64)
        six = 0
        for i in range(0, n, chunk):  # overflow-safe int64 slices
            six += int((ranks[i : i + chunk] * xs[i : i + chunk]).sum())
        return pa.table(
            {
                "seg": pa.array([seg], pa.string()),
                "n": pa.array([str(n)], pa.string()),
                "sx": pa.array([str(int(xs.sum()))], pa.string()),
                "six": pa.array([str(six)], pa.string()),
            }
        )

    rows = (
        bucketed.groupby(["seg", "bkt"])
        .map_groups(rank_partial, batch_format="pyarrow")
        .take_all()  # ≤ segments × buckets rows
    )
    fold: dict[str, list[int]] = {}
    for r in rows:
        a = fold.setdefault(r["seg"], [0, 0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["sx"])
        a[2] += int(r["six"])
    segs = sorted(fold)
    out_n, out_sx, out_g = [], [], []
    for s in segs:
        n, sx, six = fold[s]
        num = 2 * six - (n + 1) * sx
        den = n * sx
        g = 0 if den == 0 else int(np.round(float(num) / float(den) * 1_000_000))
        out_n.append(n)
        out_sx.append(sx)
        out_g.append(g)
    return rd.from_arrow(
        pa.table(
            {
                "c_mktsegment": pa.array(segs, pa.string()),
                "n_customers": pa.array(out_n, pa.int64()),
                "sum_cents": pa.array(out_sx, pa.int64()),
                "gini_ppm": pa.array(out_g, pa.int64()),
            }
        )
    )


def herfindahl_by_nation(sf_dir: str, *, chunk: int = 8192) -> rd.Dataset:
    """Market concentration (Herfindahl-Hirschman index) of supplier
    revenue within each nation — the antitrust-style concentration screen
    that complements `gini_by_segment` (Gini measures inequality of the
    distribution, HHI the dominance of its top): with per-supplier revenue
    shares s_i,  HHI = Σ s_i² = Σ cents_i² / (Σ cents)².

    All sums are EXACT integers (squares chunk-summed in int64 slices and
    carried as Python-int decimal strings — cents² overflows int64 at any
    real revenue); the single float division happens once per nation with
    the same operand order as the HUGEINT twin, quantized to ppm (10 000
    ppm = the DOJ's "highly concentrated" 0.25 line would be 250 000).

    Scale shape: one suppkey-keyed aggregate (map-side combined) folds
    lineitem to per-supplier revenue; nation attaches via the broadcast
    supplier+nation dims; per-nation (n, Σx, Σx²) partials are
    nations-sized strings folded on the driver.  Returns
    (n_name, n_suppliers, sum_cents, hhi_ppm) sorted by nation name.
    """
    import ray
    from ray.data.aggregate import Sum

    from .analytics import _cents
    from .joins import _get_broadcast

    li = sf_table(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice"])

    def rev_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": batch.column("l_suppkey").cast(pa.int64()),
                "cents": _cents(batch.column("l_extendedprice")),
            }
        )
        agg = pa.TableGroupBy(t, "k").aggregate([("cents", "sum")])
        return pa.table(
            {"k": agg.column("k"), "cents": agg.column("cents_sum").cast(pa.int64())}
        )

    rev = (
        li.map_batches(rev_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("k")
        .aggregate(Sum("cents", alias_name="cents"))
    )

    supp = sf_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).take_all()
    nat = sf_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).take_all()
    nname = {r["n_nationkey"]: r["n_name"] for r in nat}
    nation_of = {r["s_suppkey"]: nname[r["s_nationkey"]] for r in supp}
    nat_ref = ray.put(nation_of)

    def nation_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lookup = _get_broadcast(nat_ref)
        keys = pd.Series(batch.column("k").to_numpy(zero_copy_only=False))
        nats_s = keys.map(lookup)
        hit = nats_s.notna().to_numpy()
        nats = nats_s.to_numpy()
        c = batch.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        out = {"nation": [], "n": [], "sx": [], "sxx": []}
        for name in np.unique(nats[hit].astype(str)) if hit.any() else []:
            sel = hit & (nats == name)
            xs = c[sel].astype(np.int64)
            # cents² exceeds int64 PER ELEMENT (3e9² ≈ 9e18 ≈ int64 max):
            # object dtype squares in arbitrary precision — this runs on
            # the suppliers-sized aggregate, not the row stream.
            xo = xs.astype(object)
            sxx = int((xo * xo).sum())
            out["nation"].append(str(name))
            out["n"].append(int(sel.sum()))
            out["sx"].append(str(int(xs.sum())))
            out["sxx"].append(str(sxx))
        return pa.table(
            {
                "nation": pa.array(out["nation"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "sx": pa.array(out["sx"], pa.string()),
                "sxx": pa.array(out["sxx"], pa.string()),
            }
        )

    rows = rev.map_batches(nation_partial, batch_format="pyarrow").take_all()
    fold: dict[str, list[int]] = {}
    for r in rows:
        a = fold.setdefault(r["nation"], [0, 0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["sx"])
        a[2] += int(r["sxx"])
    names = sorted(fold)
    out_n, out_sx, out_h = [], [], []
    for nm in names:
        n, sx, sxx = fold[nm]
        h = 0 if sx == 0 else int(np.round(float(sxx) / float(sx * sx) * 1_000_000))
        out_n.append(n)
        out_sx.append(sx)
        out_h.append(h)
    return rd.from_arrow(
        pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "n_suppliers": pa.array(out_n, pa.int64()),
                "sum_cents": pa.array(out_sx, pa.int64()),
                "hhi_ppm": pa.array(out_h, pa.int64()),
            }
        )
    )


# --- Pareto-frontier (skyline) selection ------------------------------------
def quality_pareto_frontier(sf_dir: str) -> rd.Dataset:
    """Distributed skyline query (Börzsönyi et al. 2001) over two exact
    integer quality axes: MAXIMIZE vocabulary richness (distinct
    lowercased tokens) while MINIMIZING length (token count) — the
    "most signal per token" frontier a curation pass samples from.  A doc
    is dominated iff some other doc has ``dt ≥`` and ``nw ≤`` with at
    least one strict; duplicates of a frontier point all survive.

    Two-phase distributed skyline: every batch computes its LOCAL skyline
    (a globally non-dominated point is never dominated inside its own
    batch, so skyline(corpus) ⊆ ∪ skyline(batch)); only those candidates
    — bounded by the distinct length values per batch, not batch rows —
    move through the single-group fold where the same exact sweep runs
    once more.  No corpus shuffle, no driver loop.  Returns
    (doc_id, n_words, n_distinct) sorted by doc_id — byte-identical to
    the DuckDB ``NOT EXISTS`` twin.
    """
    docs = sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def axes(batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import WS_SPLIT, explode_tokens

        ids = batch.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        m = len(ids)
        rows, codes, _ = explode_tokens(
            batch.column("text").to_pylist(), pattern=WS_SPLIT, lower=True
        )
        nw = np.bincount(rows, minlength=m).astype(np.int64)
        if len(rows):
            width = int(codes.max()) + 1
            uniq = np.unique(rows * width + codes)
            dt = np.bincount(uniq // width, minlength=m).astype(np.int64)
        else:
            dt = np.zeros(m, dtype=np.int64)
        t = pa.table(
            {
                "g": pa.array(np.zeros(m, dtype=np.int64)),
                "doc_id": pa.array(ids, pa.int64()),
                "nw": pa.array(nw),
                "dt": pa.array(dt),
            }
        )
        return _skyline(t)

    def _skyline(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        nw = t.column("nw").combine_chunks().to_numpy(zero_copy_only=False)
        dt = t.column("dt").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(ids):
            return t
        # sweep lengths ascending: a point survives iff its dt equals its
        # length-group max AND that max strictly exceeds every smaller
        # length's group max (equal dt at smaller nw dominates strictly)
        order = np.lexsort((-dt, nw))
        snw, sdt = nw[order], dt[order]
        new = np.concatenate([[True], snw[1:] != snw[:-1]])
        gmax = sdt[new]  # first row per nw group is its max dt
        prev = np.concatenate([[np.iinfo(np.int64).min], np.maximum.accumulate(gmax)[:-1]])
        gkeep = gmax > prev
        gid = np.cumsum(new) - 1
        keep_sorted = gkeep[gid] & (sdt == gmax[gid])
        keep = np.zeros(len(ids), dtype=bool)
        keep[order] = keep_sorted
        return pa.table(
            {
                "g": t.column("g").filter(pa.array(keep)),
                "doc_id": pa.array(ids[keep], pa.int64()),
                "nw": pa.array(nw[keep]),
                "dt": pa.array(dt[keep]),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        sky = _skyline(group)
        return pa.table(
            {
                "doc_id": sky.column("doc_id"),
                "n_words": sky.column("nw"),
                "n_distinct": sky.column("dt"),
            }
        )

    return (
        docs.map_batches(axes, batch_format="pyarrow")
        .groupby("g")
        .map_groups(finish, batch_format="pyarrow")
        .sort("doc_id")
    )


def ols_chars_per_token(sf_dir: str, *, chunk: int = 8192) -> rd.Dataset:
    """Per-source simple linear regression of document length (``n_chars``)
    on token count — distributed OLS via SUFFICIENT STATISTICS, the
    textbook mergeable-moments fit (the same pattern as
    `pearson_price_qty`): each batch emits exact integer
    (n, Σx, Σy, Σx², Σxy) partials per source, partials fold
    associatively, and floats appear exactly once in the closed forms

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)
        intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − Σx²)

    evaluated with identical operand order as the HUGEINT twin and
    quantized to ppm (round half-even) — bit-identical on both sides.
    Returns (source, n, slope_ppm, intercept_ppm) sorted by source.
    """
    import math  # noqa: F401  (operand-order parity with pearson)

    docs = sf_table(sf_dir, "documents", columns=["source", "text", "n_chars"])

    def partials(batch: pa.Table) -> pa.Table:
        x = np.asarray(
            pc.count_substring_regex(
                pc.fill_null(batch.column("text").combine_chunks(), ""), r"\S+"
            ),
            dtype=np.int64,
        )
        y = batch.column("n_chars").combine_chunks().to_numpy(zero_copy_only=False)
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        out: dict[str, list] = {k: [] for k in ("source", "n", "sx", "sy", "sxx", "sxy")}
        for s in np.unique(src):
            sel = src == s
            fx, fy = x[sel], y[sel]
            n = int(sel.sum())
            sxx = sxy = 0
            for i in range(0, n, chunk):  # overflow-safe int64 slices
                cx, cy = fx[i : i + chunk], fy[i : i + chunk]
                sxx += int((cx * cx).sum())
                sxy += int((cx * cy).sum())
            out["source"].append(str(s))
            out["n"].append(str(n))
            out["sx"].append(str(int(fx.sum())))
            out["sy"].append(str(int(fy.sum())))
            out["sxx"].append(str(sxx))
            out["sxy"].append(str(sxy))
        return pa.table({k: pa.array(v, pa.string()) for k, v in out.items()})

    rows = docs.map_batches(partials, batch_format="pyarrow").take_all()
    acc: dict[str, list[int]] = {}
    for r in rows:
        a = acc.setdefault(r["source"], [0, 0, 0, 0, 0])
        for i, k in enumerate(("n", "sx", "sy", "sxx", "sxy")):
            a[i] += int(r[k])
    srcs = sorted(acc)
    ns, slopes, intercepts = [], [], []
    for s in srcs:
        n, sx, sy, sxx, sxy = acc[s]
        den = n * sxx - sx * sx
        if den == 0:
            slopes.append(0)
            intercepts.append(0)
        else:
            slopes.append(
                int(np.round(float(n * sxy - sx * sy) / float(den) * 1_000_000))
            )
            intercepts.append(
                int(np.round(float(sy * sxx - sx * sxy) / float(den) * 1_000_000))
            )
        ns.append(n)
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "slope_ppm": pa.array(slopes, pa.int64()),
                "intercept_ppm": pa.array(intercepts, pa.int64()),
            }
        )
    )


def ols2_chars_fit(sf_dir: str, *, chunk: int = 8192) -> rd.Dataset:
    """GLOBAL two-feature linear model ``n_chars ~ b0 + b1·n_tokens +
    b2·n_vowel_groups`` fit in closed form from the 3×3 normal equations —
    the multivariate extension of `ols_chars_per_token`, i.e. distributed
    multiple regression via exact integer sufficient statistics.

    One corpus pass emits the nine exact partial sums
    (n, Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y) per batch as
    decimal strings (Python-int exact — products overflow int64 at corpus
    scale); the driver folds them and solves by CRAMER'S RULE with the
    SAME determinant expansion as the HUGEINT twin:

        det  = n·(Σx1²·Σx2² − Σx1x2²) − Σx1·(Σx1·Σx2² − Σx1x2·Σx2)
                 + Σx2·(Σx1·Σx1x2 − Σx1²·Σx2)

    and each coefficient = det_i/det evaluated as ONE double divide
    (both sides cast the exact integers to double first), ppm-quantized
    half-even.  Degenerate design (det = 0) → all coefficients 0 on both
    sides.  Features are pure RE2 counters: x1 = ``\\S+`` tokens,
    x2 = ``[aeiouyAEIOUY]+`` vowel groups.
    """
    docs = sf_table(sf_dir, "documents", columns=["text", "n_chars"])

    def partials(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column("text").combine_chunks(), "")
        x1 = np.asarray(pc.count_substring_regex(texts, r"\S+"), dtype=np.int64)
        x2 = np.asarray(
            pc.count_substring_regex(texts, r"[aeiouyAEIOUY]+"), dtype=np.int64
        )
        y = batch.column("n_chars").combine_chunks().to_numpy(zero_copy_only=False)
        sums = {k: 0 for k in ("x1", "x2", "y", "x11", "x22", "x12", "x1y", "x2y")}
        n = len(x1)
        for i in range(0, n, chunk):  # overflow-safe int64 slices
            a, b, c = x1[i : i + chunk], x2[i : i + chunk], y[i : i + chunk]
            sums["x1"] += int(a.sum())
            sums["x2"] += int(b.sum())
            sums["y"] += int(c.sum())
            sums["x11"] += int((a * a).sum())
            sums["x22"] += int((b * b).sum())
            sums["x12"] += int((a * b).sum())
            sums["x1y"] += int((a * c).sum())
            sums["x2y"] += int((b * c).sum())
        cols = {"n": pa.array([str(n)], pa.string())}
        for k, v in sums.items():
            cols[k] = pa.array([str(v)], pa.string())
        return pa.table(cols)

    rows = docs.map_batches(partials, batch_format="pyarrow").take_all()
    acc = {k: 0 for k in ("n", "x1", "x2", "y", "x11", "x22", "x12", "x1y", "x2y")}
    for r in rows:
        for k in acc:
            acc[k] += int(r[k])
    n, sx1, sx2, sy = acc["n"], acc["x1"], acc["x2"], acc["y"]
    s11, s22, s12, s1y, s2y = acc["x11"], acc["x22"], acc["x12"], acc["x1y"], acc["x2y"]
    det = (
        n * (s11 * s22 - s12 * s12)
        - sx1 * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s12 - s11 * sx2)
    )
    if det == 0:
        b0 = b1 = b2 = 0
    else:
        det0 = (
            sy * (s11 * s22 - s12 * s12)
            - sx1 * (s1y * s22 - s12 * s2y)
            + sx2 * (s1y * s12 - s11 * s2y)
        )
        det1 = (
            n * (s1y * s22 - s12 * s2y)
            - sy * (sx1 * s22 - s12 * sx2)
            + sx2 * (sx1 * s2y - s1y * sx2)
        )
        det2 = (
            n * (s11 * s2y - s1y * s12)
            - sx1 * (sx1 * s2y - s1y * sx2)
            + sy * (sx1 * s12 - s11 * sx2)
        )
        b0 = int(np.round(float(det0) / float(det) * 1_000_000))
        b1 = int(np.round(float(det1) / float(det) * 1_000_000))
        b2 = int(np.round(float(det2) / float(det) * 1_000_000))
    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "b0_ppm": pa.array([b0], pa.int64()),
                "b1_ppm": pa.array([b1], pa.int64()),
                "b2_ppm": pa.array([b2], pa.int64()),
            }
        )
    )


DD_GAMMA = 1.02  # 2% relative-error DDSketch buckets
DD_QS = (50, 95, 99)


def ddsketch_quantiles(sf_dir: str) -> rd.Dataset:
    """DDSketch approximate quantiles (Masson, Rim & Lee, VLDB 2019) of
    ``l_extendedprice`` per return flag — the MERGEABLE quantile sketch
    for metric pipelines: bucket ``b(x) = ceil(ln(x)/ln(γ))`` is a pure
    function of the value (γ = 1.02 → 2% relative error), so per-batch
    partial counts fold with plain integer addition in any order — unlike
    t-digest/GK, whose merge is order-sensitive and therefore untwinnable.

    The estimate for quantile q is the standard DDSketch midpoint
    ``2·γ^b / (γ+1)`` of the first bucket whose cumulative count reaches
    ``floor(1 + q·(n−1))``, evaluated as ONE double expression with the
    twin's operand order and quantized half-even to 4 decimals.  The
    ln/pow calls are the same libm on both sides — the `source_jsd_matrix`
    float-grid contract.

    Scale shape: one pass emits per-batch (flag, bucket, n) partials
    (map-side combine — ≤ flags × few-hundred buckets per batch), a tiny
    groupby folds them, and the quantile walk runs on the driver over the
    bucket-table (constant-size at any corpus).  Returns
    (l_returnflag, q_pct, n, est_q4) sorted.
    """
    from ray.data.aggregate import Sum

    li = sf_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    lng = np.log(DD_GAMMA)

    def partials(batch: pa.Table) -> pa.Table:
        x = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        b = np.ceil(np.log(x) / lng).astype(np.int64)
        fenc = pc.dictionary_encode(batch.column("l_returnflag").combine_chunks())
        fi = np.asarray(fenc.indices, dtype=np.int64)
        nb = int(b.max() - b.min()) + 1 if len(b) else 1
        key = fi * nb + (b - (b.min() if len(b) else 0))
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "l_returnflag": pa.array(
                    [fenc.dictionary[int(k // nb)].as_py() for k in uk], pa.string()
                ),
                "bucket": pa.array(
                    [int(k % nb) + (int(b.min()) if len(b) else 0) for k in uk],
                    pa.int64(),
                ),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    tab = (
        li.map_batches(partials, batch_format="pyarrow")
        .groupby(["l_returnflag", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # flags × O(ln(max/min)/ln γ) buckets: constant-size
    )
    by_flag: dict[str, list[tuple[int, int]]] = {}
    for r in tab:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (int(r["bucket"]), int(r["n"]))
        )
    flags, qs, ns, ests = [], [], [], []
    for f in sorted(by_flag):
        buckets = sorted(by_flag[f])
        n = sum(c for _, c in buckets)
        for q in DD_QS:
            rank = int(1 + (q / 100.0) * (n - 1))  # floor(1 + q(n-1))
            cum = 0
            est_b = buckets[-1][0]
            for b, c in buckets:
                cum += c
                if cum >= rank:
                    est_b = b
                    break
            v = 2.0 * float(DD_GAMMA) ** est_b / (DD_GAMMA + 1.0) * 10_000.0
            flags.append(f)
            qs.append(q)
            ns.append(n)
            ests.append(int(np.round(v)))
    return rd.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(flags, pa.string()),
                "q_pct": pa.array(qs, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "est_q4": pa.array(ests, pa.int64()),
            }
        )
    )


def quantile_sketch_eval(sf_dir: str) -> pa.Table:
    """Offline accuracy eval of the DDSketch path vs EXACT quantiles —
    the quantile counterpart of `ann_eval_digest` / `dedup_eval_digest`:
    for each (return flag, q ∈ {50, 95, 99}) report the exact type-1
    quantile, the sketch estimate, the relative error and whether it
    honors the sketch's (γ−1)/(γ+1) ≈ 9901 ppm guarantee.

    Exact side: per-(flag, cents) counts (prices are 2-decimal, so cents
    are exact int64) fold in one groupby; each flag's quantile walk runs
    INSIDE its group kernel over the distinct-cents histogram (constant
    per flag at any corpus — the `price_outliers` histogram-select
    shape), so only flags × quantiles rows reach the driver.  The error
    is ONE double expression mirrored in the twin; the bound check is an
    integer comparison.  Returns (l_returnflag, q_pct, n, exact_cents,
    est_q4, rel_err_ppm, within_bound) sorted.
    """
    QS = [(50, 0.5), (95, 0.95), (99, 0.99)]
    BOUND_PPM = 9901  # (γ−1)/(γ+1) at γ = 1.02, floored to ppm

    sk = {
        (r["l_returnflag"], r["q_pct"]): (r["n"], r["est_q4"])
        for r in ddsketch_quantiles(sf_dir).take_all()
    }

    li = sf_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])

    _FLAG_BASE = 1_000_000_000  # composite key: ord(flag)·1e9 + cents

    def cents_rows(batch: pa.Table) -> pa.Table:
        # map-side combine onto ONE integer key (ord(flag)·1e9 + cents):
        # the string+int groupby.aggregate on ~distinct-price keys was the
        # measured 10 s hotspot; the integer-key reduceat fold is the
        # fold.py fast path
        p = batch.column("l_extendedprice").combine_chunks().to_numpy(zero_copy_only=False)
        c = np.round(p * 100.0).astype(np.int64)
        fenc = pc.dictionary_encode(batch.column("l_returnflag").combine_chunks())
        fi = np.asarray(fenc.indices, dtype=np.int64)
        fords = np.array(
            [ord(f) for f in fenc.dictionary.to_pylist()], dtype=np.int64
        )
        key = fords[fi] * _FLAG_BASE + c
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"k": pa.array(uk), "n_part": pa.array(cnt.astype(np.int64))}
        )

    from .fold import fold_int_sums_by_key

    folded = fold_int_sums_by_key(
        li.map_batches(cents_rows, batch_format="pyarrow"),
        key="k",
        cols=["n_part"],
    )

    def flag_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("k").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "f": pa.array((k // _FLAG_BASE).astype(np.int64)),
                "c": pa.array((k % _FLAG_BASE).astype(np.int64)),
                "n": batch.column("n_part"),
            }
        )

    counted = folded.map_batches(flag_rows, batch_format="pyarrow")

    def walk(group: pa.Table) -> pa.Table:
        flag = chr(group.column("f")[0].as_py())
        c = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        n = group.column("n").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        c, n = c[order], n[order]
        cum = np.cumsum(n)
        tot = int(cum[-1])
        rows = []
        for q_pct, qf in QS:
            k = int(np.floor(1 + qf * (tot - 1)))
            ix = int(np.searchsorted(cum, k))
            rows.append((q_pct, tot, int(c[ix])))
        return pa.table(
            {
                "l_returnflag": pa.array([flag] * len(rows), pa.string()),
                "q_pct": pa.array([r[0] for r in rows], pa.int64()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "exact_cents": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    exact = (
        counted.groupby("f")
        .map_groups(walk, batch_format="pyarrow")
        .take_all()
    )  # flags × quantiles rows
    out = {"l_returnflag": [], "q_pct": [], "n": [], "exact_cents": [],
           "est_q4": [], "rel_err_ppm": [], "within_bound": []}
    for r in sorted(exact, key=lambda r: (r["l_returnflag"], r["q_pct"])):
        key = (r["l_returnflag"], r["q_pct"])
        n_sk, est = sk[key]
        assert n_sk == r["n"]
        # one double expression, twin operand order
        err = int(
            np.round(
                abs(est / 10000.0 - r["exact_cents"] / 100.0)
                / (r["exact_cents"] / 100.0)
                * 1000000.0
            )
        )
        out["l_returnflag"].append(key[0])
        out["q_pct"].append(key[1])
        out["n"].append(r["n"])
        out["exact_cents"].append(r["exact_cents"])
        out["est_q4"].append(est)
        out["rel_err_ppm"].append(err)
        out["within_bound"].append(1 if err <= BOUND_PPM else 0)
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "q_pct": pa.array(out["q_pct"], pa.int64()),
            "n": pa.array(out["n"], pa.int64()),
            "exact_cents": pa.array(out["exact_cents"], pa.int64()),
            "est_q4": pa.array(out["est_q4"], pa.int64()),
            "rel_err_ppm": pa.array(out["rel_err_ppm"], pa.int64()),
            "within_bound": pa.array(out["within_bound"], pa.int64()),
        }
    )
