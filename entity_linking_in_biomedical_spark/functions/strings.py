"""Pairwise string-similarity features.

The reference scores candidate pairs with BERT cross-encoders
(src/models/affinity_models.py:41-42,75-76). Per the north star we
replace that with cheap, deterministic features — Jaro-Winkler,
normalized Levenshtein, TF-IDF char-n-gram cosine, embedding dot —
combined by a calibrated logistic score.

Levenshtein is a Spark built-in (kept JVM-side in operators/scoring).
Jaro-Winkler and the IDF-weighted gram cosine have no built-in, so they
live here in two forms:

- scalar reference implementations (jaro_winkler, tfidf_cosine) — the
  ground truth used by unit tests and the single-node pandas oracle;
- numpy BATCH kernels (jaro_winkler_batch, tfidf_cosine_batch) — the
  production path inside the scoring pandas UDF: the whole Arrow batch
  is processed with array ops (padded codepoint matrices for JW; packed
  gram codes + one global sorted intersect for the cosine), no per-row
  Python loop. Equality with the scalar kernels is asserted by
  tests/test_functions.py over random pairs.

The Arrow batch is the reference's own batch dimension
(candidate_generator.py:102-105).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    match_window = max(la, lb) // 2 - 1
    if match_window < 0:
        match_window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - match_window)
        hi = min(lb, i + match_window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ca:
                a_flags[i] = b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    j = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler similarity; JW("MARTHA","MARHTA") == 0.9611."""
    j = jaro(a, b)
    if j <= 0.7:
        return j
    prefix = 0
    for ca, cb in zip(a[:max_prefix], b[:max_prefix]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def _grams(s: str, n: int = 3) -> list[str]:
    if len(s) < n:
        return [s] if s else []
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def tfidf_cosine(a: str, b: str, idf: dict[str, float], default_idf: float = 1.0, n: int = 3) -> float:
    """IDF-weighted char-n-gram cosine. ``idf`` is a (broadcast) dict
    fit on the entity-name corpus — the Spark analogue of the
    reference's sklearn TfidfVectorizer fit over mentions ∪ entities
    (candidate_generator.py:75-87)."""
    ca, cb = Counter(_grams(a, n)), Counter(_grams(b, n))
    if not ca or not cb:
        return 0.0
    dot = 0.0
    for g, fa in ca.items():
        fb = cb.get(g)
        if fb:
            w = idf.get(g, default_idf)
            dot += fa * fb * w * w
    na = math.sqrt(sum((f * idf.get(g, default_idf)) ** 2 for g, f in ca.items()))
    nb = math.sqrt(sum((f * idf.get(g, default_idf)) ** 2 for g, f in cb.items()))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (na * nb)


# ---------------------------------------------------------------------------
# numpy batch kernels (the vectorized production path)
# ---------------------------------------------------------------------------


def _codepoint_matrix(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(N, Lmax) uint32 codepoint matrix (0-padded) + per-row lengths.
    utf-32-le gives exactly one uint32 per codepoint, so lengths match
    Python len()."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    lmax = max(1, int(lens.max()) if n else 1)
    m = np.zeros((n, lmax), dtype=np.uint32)
    # ONE bulk encode of the whole batch, then a vectorized scatter into
    # the padded matrix (a per-row encode loop measured ~2x slower)
    flat = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32)
    if len(flat):
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        rows = np.repeat(np.arange(n), lens)
        cols = np.arange(len(flat)) - starts
        m[rows, cols] = flat
    return m, lens


def jaro_winkler_batch(
    a: list[str], b: list[str], p: float = 0.1, max_prefix: int = 4
) -> np.ndarray:
    """Vectorized Jaro-Winkler over a batch of pairs. Same algorithm as
    the scalar jaro_winkler (greedy windowed matching, transposition
    count, prefix boost) but the position loop runs ONCE over the
    batch's max length with array ops per step, instead of per row —
    O(Lmax) numpy passes of (N x Lmax) boolean work."""
    n = len(a)
    if n == 0:
        return np.zeros(0)
    a = ["" if x is None else x for x in a]
    b = ["" if x is None else x for x in b]
    am, la = _codepoint_matrix(a)
    bm, lb = _codepoint_matrix(b)
    lmax_a, lmax_b = am.shape[1], bm.shape[1]
    mw = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    aflag = np.zeros((n, lmax_a), dtype=bool)
    bflag = np.zeros((n, lmax_b), dtype=bool)
    matches = np.zeros(n, dtype=np.int64)
    jcols = np.arange(lmax_b)
    rows = np.arange(n)
    for i in range(lmax_a):
        active = i < la
        if not active.any():
            break
        lo = np.maximum(0, i - mw)
        hi = np.minimum(lb, i + mw + 1)
        cand = (
            (jcols >= lo[:, None])
            & (jcols < hi[:, None])
            & ~bflag
            & (bm == am[:, i][:, None])
            & active[:, None]
        )
        j = cand.argmax(axis=1)  # first True per row (greedy, as scalar)
        ok = cand[rows, j]
        bflag[rows[ok], j[ok]] = True
        aflag[rows[ok], i] = True
        matches += ok

    # transpositions: matched chars in a-order vs b-order; np.nonzero is
    # row-major, and per-row match counts are equal on both sides, so
    # the row index arrays align element-for-element
    ra, ca = np.nonzero(aflag)
    rb, cb = np.nonzero(bflag)
    t_each = (am[ra, ca] != bm[rb, cb]).astype(np.int64)
    t = (np.bincount(ra, weights=t_each, minlength=n) // 2).astype(np.int64)

    m = matches.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j3 = (m / la + m / lb + (m - t) / m) / 3.0
    j3 = np.where(matches > 0, j3, 0.0)
    # exact equality (incl. "" == "") short-circuits to 1.0, as scalar
    eq = np.fromiter((x == y for x, y in zip(a, b)), dtype=bool, count=n)
    j3 = np.where(eq, 1.0, j3)

    # common-prefix boost, only above the 0.7 gate (as scalar)
    prefix = np.zeros(n, dtype=np.int64)
    still = np.ones(n, dtype=bool)
    for i in range(min(max_prefix, lmax_a, lmax_b)):
        still = still & (i < la) & (i < lb) & (am[:, i] == bm[:, i])
        prefix += still
    jw = np.where(j3 > 0.7, j3 + prefix * p * (1.0 - j3), j3)
    return np.where(eq, 1.0, jw)


# gram codes: up to 3 codepoints (21 bits each) packed into an int64,
# left-aligned so shorter-than-n grams (whole short strings) cannot
# collide with real n-grams
_GRAM_SHIFT = 21
_GRAM_MAXN = 3


def pack_gram_code(g: str) -> int:
    """Pack a gram string (len <= 3) into its int64 code (left-aligned
    over exactly _GRAM_MAXN 21-bit slots)."""
    if len(g) > _GRAM_MAXN:
        raise ValueError(f"gram {g!r} longer than {_GRAM_MAXN} codepoints")
    code = 0
    for i in range(_GRAM_MAXN):
        c = ord(g[i]) if i < len(g) else 0
        code = (code << _GRAM_SHIFT) | c
    return code


def pack_vocab(idf: dict[str, float]) -> tuple[np.ndarray, np.ndarray]:
    """idf dict -> (sorted int64 code array, aligned idf array) for
    vectorized searchsorted lookup inside the batch kernel. Grams longer
    than 3 codepoints are not supported (the engine uses n=3)."""
    codes = np.fromiter((pack_gram_code(g) for g in idf), dtype=np.int64, count=len(idf))
    vals = np.fromiter(idf.values(), dtype=np.float64, count=len(idf))
    order = np.argsort(codes)
    return codes[order], vals[order]


def _gram_codes_flat(
    strs: list[str], n: int
) -> tuple[np.ndarray, np.ndarray]:
    """All gram codes of a batch as flat (row_idx, code) arrays —
    mirrors _grams: a sliding window of n codepoints; strings shorter
    than n contribute themselves; empty strings contribute nothing."""
    if n > _GRAM_MAXN:
        raise ValueError(
            f"gram length {n} exceeds the int64 packing limit {_GRAM_MAXN}"
        )
    m, lens = _codepoint_matrix(strs)
    nrows, lmax = m.shape
    if lmax < n:
        m = np.pad(m, ((0, 0), (0, n - lmax)))
        lmax = n
    w = lmax - n + 1
    codes = np.zeros((nrows, w), dtype=np.int64)
    for k in range(n):
        codes = (codes << _GRAM_SHIFT) | m[:, k : k + w].astype(np.int64)
    # left-align to _GRAM_MAXN slots so codes match pack_gram_code for
    # every n <= _GRAM_MAXN (n=2 codes were right-aligned before, so
    # every vocab lookup silently missed)
    codes <<= _GRAM_SHIFT * (_GRAM_MAXN - n)
    # valid windows: i <= len - n; short non-empty strings get window 0
    # (their zero-padded whole-string code — identical to pack_gram_code)
    wi = np.arange(w)
    valid = wi[None, :] <= (lens[:, None] - n)
    valid[:, 0] |= lens > 0
    r, c = np.nonzero(valid)
    return r, codes[r, c]


def _rle_by_row_code(r: np.ndarray, codes: np.ndarray):
    """(row, code) multiset -> unique (row, code, count), sorted."""
    order = np.lexsort((codes, r))
    r, codes = r[order], codes[order]
    if len(r) == 0:
        return r, codes, np.zeros(0, dtype=np.int64)
    new = np.empty(len(r), dtype=bool)
    new[0] = True
    new[1:] = (r[1:] != r[:-1]) | (codes[1:] != codes[:-1])
    idx = np.nonzero(new)[0]
    counts = np.diff(np.append(idx, len(r)))
    return r[idx], codes[idx], counts


def tfidf_cosine_batch(
    a: list[str],
    b: list[str],
    vocab_codes: np.ndarray,
    vocab_idf: np.ndarray,
    default_idf: float = 1.0,
    n: int = 3,
) -> np.ndarray:
    """Vectorized IDF-weighted char-n-gram cosine over a batch of pairs.
    One global sorted-intersect replaces the per-row Counter loop: both
    sides' (row, gram) multisets are run-length encoded, gram codes map
    to batch-local dense ids, and np.intersect1d on row*V+id keys yields
    every pair's common grams in a single call."""
    nb_ = len(a)
    if nb_ == 0:
        return np.zeros(0)
    a = ["" if x is None else x for x in a]
    b = ["" if x is None else x for x in b]
    ra, ca_ = _gram_codes_flat(a, n)
    rb, cb_ = _gram_codes_flat(b, n)
    ra, ca_, cnt_a = _rle_by_row_code(ra, ca_)
    rb, cb_, cnt_b = _rle_by_row_code(rb, cb_)

    def idf_of(codes: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(vocab_codes, codes)
        pos = np.minimum(pos, max(len(vocab_codes) - 1, 0))
        if len(vocab_codes) == 0:
            return np.full(len(codes), default_idf)
        hit = vocab_codes[pos] == codes
        return np.where(hit, vocab_idf[pos], default_idf)

    wa, wb = idf_of(ca_), idf_of(cb_)
    na = np.sqrt(np.bincount(ra, weights=(cnt_a * wa) ** 2, minlength=nb_))
    nbn = np.sqrt(np.bincount(rb, weights=(cnt_b * wb) ** 2, minlength=nb_))

    # batch-local dense gram ids -> one int64 key per (row, gram)
    all_codes = np.unique(np.concatenate([ca_, cb_])) if len(ca_) + len(cb_) else np.zeros(0, dtype=np.int64)
    v = max(len(all_codes), 1)
    key_a = ra * v + np.searchsorted(all_codes, ca_)
    key_b = rb * v + np.searchsorted(all_codes, cb_)
    common, ia, ib = np.intersect1d(key_a, key_b, assume_unique=True, return_indices=True)
    contrib = cnt_a[ia] * cnt_b[ib] * wa[ia] * wb[ib]
    dot = np.bincount(ra[ia], weights=contrib, minlength=nb_)
    denom = na * nbn
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = dot / denom
    return np.where(denom > 0, cos, 0.0)


def monge_elkan_batch(
    a_tokens: list[list[str]], b_tokens: list[list[str]]
) -> np.ndarray:
    """Asymmetric Monge-Elkan similarity over a batch of pre-tokenized
    pairs: for pair i, the mean over a's tokens of the best (max)
    Jaro-Winkler against any of b's tokens — the standard multiword-
    name comparator (Monge & Elkan 1996; "john s smith" vs "smith,
    john" style reorderings that whole-string JW misses and the word
    channel only catches on exact token sorts).

    Vectorization: ALL (a_token, b_token) combinations of the whole
    batch go through ONE jaro_winkler_batch call (the expensive padded-
    matrix kernel); the per-pair reduce is a cheap grouped max + exact
    mean. Cross-engine determinism: each per-token max is rounded to 9
    decimals and the mean is computed as an EXACT decimal sum divided
    by the token count (the decimal(38,9) aggregate idiom of
    operators/classifier.py), so a SQL twin summing the same rounded
    maxima in any order reproduces every score bit-for-bit — a plain
    float sum would depend on token order. Empty a -> 0.0; empty b ->
    max is 0.0 per token (JW's empty-side convention).
    """
    from decimal import ROUND_HALF_UP, Decimal

    n = len(a_tokens)
    if n == 0:
        return np.zeros(0)
    flat_a: list[str] = []
    flat_b: list[str] = []
    pair_of: list[int] = []
    atok_of: list[int] = []
    for i, (ats, bts) in enumerate(zip(a_tokens, b_tokens)):
        for ai, ta in enumerate(ats):
            if not bts:
                continue
            for tb in bts:
                flat_a.append(ta)
                flat_b.append(tb)
                pair_of.append(i)
                atok_of.append(ai)
    out = np.zeros(n)
    if flat_a:
        jw = jaro_winkler_batch(flat_a, flat_b)
        width = max(atok_of) + 1
        key = np.array(pair_of, dtype=np.int64) * width + np.array(
            atok_of, dtype=np.int64
        )
        order = np.argsort(key, kind="stable")
        key_s, jw_s = key[order], jw[order]
        grp_start = np.r_[True, key_s[1:] != key_s[:-1]]
        maxima = np.maximum.reduceat(jw_s, np.flatnonzero(grp_start))
        max_pair = (key_s[grp_start] // width).astype(np.int64)
        sums: dict[int, Decimal] = {}
        for p, mx in zip(max_pair.tolist(), maxima.tolist()):
            q = Decimal(repr(mx)).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
            sums[p] = sums.get(p, Decimal(0)) + q
        for i in range(n):
            na = len(a_tokens[i])
            if na:
                # tokens of a with empty b contribute 0 to the sum but
                # still count in the mean's denominator
                out[i] = float(sums.get(i, Decimal(0))) / na
    return out


def monge_elkan(a_tokens: list[str], b_tokens: list[str]) -> float:
    """Scalar twin of :func:`monge_elkan_batch` (unit-test ground
    truth)."""
    return float(monge_elkan_batch([a_tokens], [b_tokens])[0])
