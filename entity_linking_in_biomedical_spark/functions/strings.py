"""Pairwise string-similarity features.

The reference scores candidate pairs with BERT cross-encoders
(src/models/affinity_models.py:41-42,75-76). Per the north star we
replace that with cheap, deterministic features — Jaro-Winkler,
normalized Levenshtein, TF-IDF char-n-gram cosine, embedding dot —
combined by a calibrated logistic score.

Levenshtein is a Spark built-in (kept JVM-side in operators/scoring).
Jaro-Winkler and the IDF-weighted gram cosine have no built-in, so they
live here as plain-Python batch kernels invoked from an Arrow pandas
UDF (one Python call per ~10k-row Arrow batch — the reference's own
batch dimension, candidate_generator.py:102-105).
"""

from __future__ import annotations

import math
from collections import Counter


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
