"""Mergeable sketches — HyperLogLog distinct counting (pure numpy).

Sketches are the scale answer to exact distinct counts: each batch emits ONE
fixed-size register array, registers merge with an elementwise max (fully
associative/commutative), and the shuffle moves ``blocks × 2^p`` bytes
instead of the corpus.  Standard HLL (Flajolet et al. 2007) with the usual
small-range linear-counting correction.
"""

from __future__ import annotations

import hashlib

import numpy as np

P = 12  # 2^12 registers → ~1.6% standard error
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def hll_sketch(values: list[str]) -> np.ndarray:
    """Build a register array (uint8[M]) from string values."""
    regs = np.zeros(M, dtype=np.uint8)
    for v in values:
        h = int.from_bytes(
            hashlib.blake2b((v or "").encode("utf-8"), digest_size=8).digest(), "big"
        )
        idx = h >> (64 - P)
        rest = h & ((1 << (64 - P)) - 1)
        # rank = position of the leftmost 1-bit in the remaining 64-P bits
        rank = (64 - P) - rest.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def hll_sketch_md5(values: list[str]) -> np.ndarray:
    """`hll_sketch` with the md5-64 hash (first 8 digest bytes, big-endian)
    instead of blake2b — the hash a DuckDB twin can recompute verbatim
    (``('0x' || substr(md5(v), 1, 16))::UBIGINT``), so the approx-distinct
    gate runs against a COMPUTED oracle rather than a pinned literal.
    Blake2b consumers keep their existing pins untouched."""
    regs = np.zeros(M, dtype=np.uint8)
    for v in values:
        h = int.from_bytes(hashlib.md5((v or "").encode("utf-8")).digest()[:8], "big")
        idx = h >> (64 - P)
        rest = h & ((1 << (64 - P)) - 1)
        rank = (64 - P) - rest.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def hll_count(regs: np.ndarray) -> int:
    """Rounded HLL estimate on the EXACT-integer grid: the harmonic sum
    folds as ``S = Σ 2^(53-r)`` in arbitrary-precision ints (merge-order
    invariant by construction), and the float tail is the literal
    expression below, op-for-op identical to the SQL twin.  DuckDB ``ln``
    matches libm ``math.log`` on every possible linear-counting argument
    and the floor(+0.5) margin is ≥ 1e-4 (both measured in
    tests/test_digest_dedup.py), so the twin is bit-reproducible."""
    import math

    S = sum(1 << (53 - int(r)) for r in regs)  # 53 = (64 - P) + 1, P = 12
    raw = (0.7213 / (1 + 1.079 / 4096.0)) * 4096 * 4096 * 9007199254740992.0 / float(S)
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * 4096 and zeros:
        return math.floor(4096.0 * math.log(4096.0 / zeros) + 0.5)
    return math.floor(raw + 0.5)


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(M, dtype=np.uint8)
    for s in sketches:
        np.maximum(out, s, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * M * M / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)  # linear counting for small cardinalities
    return float(est)


# ---------------------------------------------------------------------------
# Bloom filter (vectorized membership for broadcast candidate sets)
# ---------------------------------------------------------------------------


class IntBloom:
    """Fixed-size Bloom filter over int64 ids, numpy end-to-end.

    The scale representation for broadcast candidate sets (e.g. the MinHash
    verify prune): ~1.44·log2(1/fp) bits per element regardless of id width,
    vs 8 bytes per element for the sorted-array set.  False positives only
    admit extra rows into a downstream filter-by-request stage (wasted work,
    never a correctness change); false negatives are impossible.

    Hash family: double hashing h_i(x) = h1(x) + i·h2(x) (Kirsch &
    Mitzenmacher 2006) over two splitmix64-style mixes — k probes from two
    multiplies, fully vectorized over the query array.
    """

    _C1 = np.uint64(0x9E3779B97F4A7C15)
    _C2 = np.uint64(0xC2B2AE3D27D4EB4F)

    def __init__(self, bits: np.ndarray, k: int):
        self.bits = bits  # uint8 bit array, length m/8
        self.k = k
        self.m = np.uint64(len(bits) * 8)

    @staticmethod
    def sized_for(n: int, *, fp_rate: float = 1e-3) -> tuple[int, int]:
        """(m_bits, k) for an expected ``n`` elements — shared by the local
        `from_ids` build and the distributed chunked-OR build (which sizes
        from an n UPPER BOUND, e.g. 2×pairs; oversizing only lowers the
        false-positive rate)."""
        n = max(1, n)
        m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2) ** 2)))
        m = max(64, (m + 7) // 8 * 8)  # byte-align
        k = max(1, round(m / n * np.log(2)))
        return m, k

    @classmethod
    def from_ids(cls, ids: np.ndarray, *, fp_rate: float = 1e-3) -> "IntBloom":
        m, k = cls.sized_for(len(ids), fp_rate=fp_rate)
        bloom = cls(np.zeros(m // 8, dtype=np.uint8), k)
        bloom._add(np.asarray(ids, dtype=np.int64))
        return bloom

    @staticmethod
    def positions_for(x: np.ndarray, m_bits: int, k: int) -> np.ndarray:
        """(k × n) bit positions for int64 ids — pure function of (m, k), so
        distributed partial builds and the final broadcast filter agree."""
        u = np.asarray(x, dtype=np.int64).astype(np.uint64)
        h1 = u * IntBloom._C1
        h1 ^= h1 >> np.uint64(31)
        h2 = (u ^ (u >> np.uint64(33))) * IntBloom._C2
        h2 ^= h2 >> np.uint64(29)
        h2 |= np.uint64(1)  # odd step → full-period probing
        i = np.arange(k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)

    def _positions(self, x: np.ndarray) -> np.ndarray:
        return self.positions_for(x, int(self.m), self.k)

    def _add(self, x: np.ndarray) -> None:
        pos = self._positions(x).ravel()
        np.bitwise_or.at(self.bits, (pos >> 3).astype(np.int64), (1 << (pos & 7)).astype(np.uint8))

    def contains(self, x: np.ndarray) -> np.ndarray:
        """Vectorized membership mask for an int64 array (no false negatives)."""
        x = np.asarray(x, dtype=np.int64)
        if len(x) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(x)
        byte = self.bits[(pos >> 3).astype(np.int64)]
        hit = (byte >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)


# ---------------------------------------------------------------------------
# HyperBall spec (Boldi, Rosa & Vigna 2011): the shared REGISTER CONTRACT for
# the neighborhood-function estimator in pipelines/graph.py and its
# sequential twin in oracle_dedup.py — p = 7 keeps per-node sketches at 128
# bytes (HyperBall's own design point trades register width for the O(V·m)
# per-round exchange).
# ---------------------------------------------------------------------------

HB_P = 7
HB_M = 1 << HB_P
HB_ALPHA = 0.7213 / (1 + 1.079 / HB_M)


def hb_node_register(node: int) -> tuple[int, int]:
    """(register index, rank) of a node id under the HyperBall hash rule —
    blake2b-64 over the decimal id, the `hll_sketch` convention."""
    h = int.from_bytes(
        hashlib.blake2b(str(node).encode("utf-8"), digest_size=8).digest(), "big"
    )
    idx = h >> (64 - HB_P)
    rest = h & ((1 << (64 - HB_P)) - 1)
    return idx, (64 - HB_P) - rest.bit_length() + 1


def hb_estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Rounded-integer HLL estimates per ROW of a (n, HB_M) uint8 register
    matrix — row-contiguous numpy reductions, so each row's float path is
    bit-identical to estimating that row alone (the determinism contract
    both sides rely on)."""
    r = regs.astype(np.float64)
    est = HB_ALPHA * HB_M * HB_M / np.power(2.0, -r).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * HB_M) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = HB_M * np.log(HB_M / np.maximum(zeros, 1).astype(np.float64))
    est = np.where(small, lin, est)
    return np.array([int(round(float(v))) for v in est], dtype=np.int64)
