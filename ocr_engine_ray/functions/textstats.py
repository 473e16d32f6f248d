"""Text analysis primitives for large-scale training-data pipelines.

Language-ID (stopword/script heuristic), quality scoring, token counting
(whitespace + a BPE-ish regex), and document fingerprinting (md5 of the
normalized text — SQL-reproducible — plus a winnowing rolling-hash variant).
All are pure per-text functions with vectorized batch wrappers in
``ocr_engine_ray.pipelines.textstats``.
"""

from __future__ import annotations

import hashlib
import re

# ALL classes here are spelled out in ASCII to match how DuckDB's RE2
# evaluates them ('\s' = [\t\n\f\r ], '\d' = [0-9], '\w' = [0-9A-Za-z_]);
# Python's are Unicode-wide, and every one of these feeds a hash-compared
# SQL twin (fingerprints, doc_stats, quality) — same lesson as WS_RE.
# BPE-ish pre-tokenizer (GPT-2 style word/number/punct split, simplified):
BPE_ISH_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^ \t\n\f\rA-Za-z0-9]+")
WS_RE = re.compile(r"[ \t\n\f\r]+")
PUNCT_RE = re.compile(r"[^0-9A-Za-z_ \t\n\f\r]")  # RE2 [^\w\s]
DIGIT_RE = re.compile(r"[0-9]")
_ALPHA_TOKEN_RE = re.compile(r"[A-Za-z]+")  # SQL '^[A-Za-z]+$' via fullmatch

# Tiny deterministic stopword profiles (enough to separate the driver corpus
# labels; NOT a general langid — the scale path would load fastText-style
# profiles in an actor's __init__).
STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"},
    "es": {"el", "la", "de", "que", "los", "una", "por", "con", "para"},
    "fr": {"le", "la", "et", "les", "des", "une", "est", "pour", "dans"},
}
_CJK_RE = re.compile(r"[一-鿿]")
_DEVANAGARI_RE = re.compile(r"[ऀ-ॿ]")


def normalize_text(text: str) -> str:
    """lower + collapse whitespace runs to single space + strip — matches the
    SQL ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` exactly
    (RE2 whitespace class; space-only strip like SQL ``trim``)."""
    return WS_RE.sub(" ", (text or "").lower()).strip(" ")


def fingerprint_md5(text: str) -> str:
    """Content fingerprint: md5 hex of normalized text (SQL: ``md5(...)``)."""
    return hashlib.md5(normalize_text(text).encode("utf-8")).hexdigest()


def token_count_ws(text: str) -> int:
    """Whitespace token count."""
    t = (text or "").strip()
    return len(t.split()) if t else 0


def token_count_bpe_ish(text: str) -> int:
    """BPE-ish pre-token count (letters / digit runs / punct runs)."""
    return len(BPE_ISH_RE.findall(text or ""))


def langid(text: str) -> str:
    """Heuristic language ID: script check first (CJK → zh, Devanagari → hi),
    then stopword-profile voting; ties and no-signal default to 'en'."""
    t = text or ""
    if _CJK_RE.search(t):
        return "zh"
    if _DEVANAGARI_RE.search(t):
        return "hi"
    words = normalize_text(t).split(" ")
    best, best_score = "en", 0
    for lang in ("en", "de", "es", "fr"):  # fixed order → deterministic ties
        sw = STOPWORDS[lang]
        score = sum(1 for w in words if w in sw)
        if score > best_score:
            best, best_score = lang, score
    return best


def quality_signals(text: str) -> dict:
    """Quality-scoring signals (length / punct / stopword ratios)."""
    t = text or ""
    n_chars = len(t)
    # RE2-\S tokenization and ASCII-alpha test, matching the SQL twin's
    # regexp_extract_all(text, '\S+') / '^[A-Za-z]+$' exactly.
    toks = [w for w in WS_RE.split(t) if w]
    n_tokens = len(toks)
    n_alpha_tokens = sum(1 for w in toks if _ALPHA_TOKEN_RE.fullmatch(w))
    sw = STOPWORDS["en"]
    n_stop = sum(1 for w in toks if w.lower() in sw)
    n_punct = len(PUNCT_RE.findall(t))
    n_digit = len(DIGIT_RE.findall(t))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (sum(len(w) for w in toks) / n_tokens) if n_tokens else 0.0,
        "alpha_ratio": (n_alpha_tokens / n_tokens) if n_tokens else 0.0,
        "stopword_ratio": (n_stop / n_tokens) if n_tokens else 0.0,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "digit_ratio": (n_digit / n_chars) if n_chars else 0.0,
    }


def quality_score(text: str) -> float:
    """Composite [0,1] quality score: rewards mid-length docs with alpha
    tokens and some stopwords; punishes punct/digit-heavy text.  Deterministic
    and monotone in its signals — a heuristic filter, not a model."""
    s = quality_signals(text)
    length_ok = min(1.0, s["n_tokens"] / 20.0) * (1.0 if s["n_tokens"] <= 5000 else 0.5)
    score = (
        0.35 * length_ok
        + 0.30 * s["alpha_ratio"]
        + 0.20 * min(1.0, s["stopword_ratio"] * 4)
        + 0.15 * (1.0 - min(1.0, s["punct_ratio"] * 5 + s["digit_ratio"] * 2))
    )
    return round(min(1.0, max(0.0, score)), 6)


# ---------------------------------------------------------------------------
# Winnowing fingerprint (rolling hash) — near-dup-robust document sketch
# ---------------------------------------------------------------------------
_B = 1000003
_MASK = (1 << 64) - 1


def rolling_hashes(text: str, k: int = 8) -> list[int]:
    """64-bit polynomial rolling hashes of all k-grams of normalized text."""
    s = normalize_text(text)
    if len(s) < k:
        return [_poly_hash(s)] if s else []
    out = []
    h = _poly_hash(s[:k])
    out.append(h)
    top = pow(_B, k - 1, 1 << 64)
    for i in range(k, len(s)):
        h = ((h - ord(s[i - k]) * top) * _B + ord(s[i])) & _MASK
        out.append(h)
    return out


def _poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * _B + ord(ch)) & _MASK
    return h


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> list[int]:
    """Winnowing (Schleimer et al., SIGMOD'03): min hash per sliding window,
    deduped — a compact, position-robust document fingerprint."""
    hs = rolling_hashes(text, k)
    if not hs:
        return []
    if len(hs) <= window:
        return [min(hs)]
    out: list[int] = []
    last = -1
    for i in range(len(hs) - window + 1):
        w = hs[i : i + window]
        m = min(w)
        j = i + w.index(m)
        if j != last:
            out.append(m)
            last = j
    return out


def _poly_pows(k: int) -> "object":
    import numpy as np

    p = np.empty(k, dtype=np.uint64)
    b = 1
    for i in range(k):  # exact Python ints masked — no scalar-overflow warning
        p[i] = b
        b = (b * _B) & _MASK
    return p


def rolling_hashes_np(text: str, k: int = 8) -> "object":
    """`rolling_hashes` vectorized — value-identical (property-tested):
    H_i = Σ_j ord(s[i+j])·B^{k-1-j} mod 2^64, evaluated directly with k
    shifted multiply-adds in uint64 wraparound arithmetic instead of the
    per-char rolling recurrence (same value mod 2^64 by construction).
    Returns a uint64 numpy array."""
    import numpy as np

    s = normalize_text(text)
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    # surrogatepass: lone surrogates still have an ord(); the scalar
    # reference hashes them, so the vectorized path must not raise
    c = np.frombuffer(
        s.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
    ).astype(np.uint64)
    if n < k:
        pows = _poly_pows(n)
        return np.array([(c * pows[::-1]).sum()], dtype=np.uint64)
    w = n - k + 1
    pows = _poly_pows(k)
    h = np.zeros(w, dtype=np.uint64)
    for j in range(k):
        h += c[j : w + j] * pows[k - 1 - j]
    return h


def winnow_fingerprint_np(text: str, k: int = 8, window: int = 16) -> "object":
    """`winnow_fingerprint` vectorized — value-identical (property-tested):
    sliding-window leftmost argmin via one stride-tricks view; the
    keep-if-position-changed dedupe becomes a run mask because the leftmost
    minimum position is non-decreasing as the window slides.  Returns a
    uint64 numpy array (order preserved)."""
    import numpy as np

    hs = rolling_hashes_np(text, k)
    if not len(hs):
        return hs
    if len(hs) <= window:
        return np.array([hs.min()], dtype=np.uint64)
    v = np.lib.stride_tricks.sliding_window_view(hs, window)
    jrel = np.argmin(v, axis=1)  # first occurrence == leftmost tie-break
    j = jrel + np.arange(len(v), dtype=np.int64)
    m = v[np.arange(len(v)), jrel]
    mask = np.concatenate([[True], j[1:] != j[:-1]])
    return m[mask]
