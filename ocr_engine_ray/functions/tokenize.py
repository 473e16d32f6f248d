"""The one Arrow token-explode primitive behind every batch tokenizer.

Four hot paths (repetition stats, word-n-gram hashing, SimHash features,
the \\S+ token exploders) need the same sequence: RE2 split →
``list_flatten`` → ``dictionary_encode`` → row-repeat → drop the ''
edge artifacts.  Splitting on the complement class and dropping '' is
exactly ``re.findall`` of the token class (property-tested at each
consumer); keeping ONE copy means a future fix (null handling, the
indices cast, a class change) lands everywhere at once — the same
single-copy rule as the RE2-ASCII token classes themselves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2 complements: \w and \s as DuckDB evaluates them (ASCII; Python's
# classes are Unicode-wide — see functions/textstats.py).
WORD_SPLIT = "[^0-9A-Za-z_]+"
WS_SPLIT = "[ \t\n\f\r]+"


def explode_tokens(
    texts: list[str | None], *, pattern: str, lower: bool
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Occurrence-level tokens of a whole batch as ``(row_idx, dict_code,
    dictionary)``, order-preserving (row-major, positional).  Lowercasing
    happens in Python ``str.lower`` (utf8proc case folding could drift on
    exotic Unicode from the per-doc reference loops these replaced)."""
    n = len(texts)
    if n == 0:
        e = np.empty(0, np.int64)
        return e, e.copy(), pa.array([], pa.string())
    if lower:
        arr = pa.array([(t or "").lower() for t in texts], pa.string())
    else:
        arr = pa.array([(t or "") for t in texts], pa.string())
    toks = pc.split_pattern_regex(arr, pattern)
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    flat = pc.list_flatten(toks)
    enc = pc.dictionary_encode(flat)
    codes = np.asarray(enc.indices, dtype=np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = np.asarray(pc.not_equal(flat, ""), dtype=bool)
    return rows[keep], codes[keep], enc.dictionary
