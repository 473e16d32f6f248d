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
