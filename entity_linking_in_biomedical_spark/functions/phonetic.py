"""American (NARA) Soundex as a pure codegen column expression plus its
DuckDB SQL twin — the classic phonetic blocking key for name-based
entity resolution (Christen 2012 ch. 4: Soundex blocks "Robert" with
"Rupert", catching the spelling-variant matches that exact/norm-key
channels miss and that the reference's char-TF-IDF blocking
(reference ``src/models/candidate_generator.py:89-127``) only finds at
full similarity-join cost).

Both engines evaluate the SAME algorithm built from the same constants
(`_ALPHA`/`_CODES`/`_COLLAPSE_PASSES`), so cross-engine parity is by
construction rather than by emulating someone else's edge cases:

1. strip non-letters, uppercase; empty -> ''.
2. code EVERY letter: AEIOUY->0, HW->7 (sentinel), B FPV->1,
   CGJKQSXZ->2, DT->3, L->4, MN->5, R->6.
3. delete the 7s FIRST — the NARA rule that two same-code letters
   separated by H or W collapse to one code (Ashcraft -> A261), while
   a vowel between them keeps both (Tymczak -> T522): vowels stay as
   0s and break adjacency, H/W vanish and don't.
4. collapse adjacent duplicate digits. RE2 (the DuckDB oracle) has no
   backreferences, so BOTH engines collapse via `_COLLAPSE_PASSES`
   rounds of replace(dd -> d) per digit — each pass at least halves a
   run, so 5 passes collapse runs up to 2^5 = 32 codes, far beyond any
   real token (longer inputs degrade gracefully: a residual duplicate
   digit, identically on both engines).
5. drop the leading code — the first letter is kept as a letter, and
   a second letter sharing its code is absorbed by step 4 (Pfister ->
   P236) — unless the first letter is H/W, whose code already vanished
   in step 3 (Honeyman -> H555).
6. delete the 0s, keep 3 digits, right-pad with 0 (Wu -> W000).

NULL propagates to NULL; strings with no letters map to ''.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
# A..Z -> digit, with 7 the H/W sentinel deleted before collapsing
_CODES = "01230127022455012623017202"
_COLLAPSE_PASSES = 5  # collapses duplicate runs up to 2^5 = 32 codes
_DIGITS = "0123456"

assert len(_CODES) == 26 and _CODES[_ALPHA.index("H")] == _CODES[_ALPHA.index("W")] == "7"


def soundex(col: Column | str) -> Column:
    """Soundex code of a name/token as a single codegen expression —
    chained translate/replace/substr, no UDF, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(F.upper(c), "[^A-Z]", "")
    first = F.substring(u, 1, 1)
    seq = F.replace(F.translate(u, _ALPHA, _CODES), F.lit("7"), F.lit(""))
    for _ in range(_COLLAPSE_PASSES):
        for d in _DIGITS:
            seq = F.replace(seq, F.lit(d + d), F.lit(d))
    rest = F.when(first.isin("H", "W"), seq).otherwise(
        seq.substr(F.lit(2), F.length(seq))
    )
    digits = F.replace(rest, F.lit("0"), F.lit(""))
    out = F.rpad(F.concat(first, F.substring(digits, 1, 3)), 4, "0")
    return F.when(u == "", F.lit("")).otherwise(out)


def soundex_sql(expr: str) -> str:
    """The DuckDB twin of :func:`soundex` over SQL expression ``expr``,
    generated from the same constants (oracle use; see module doc)."""
    u = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    seq = f"replace(translate({u}, '{_ALPHA}', '{_CODES}'), '7', '')"
    for _ in range(_COLLAPSE_PASSES):
        for d in _DIGITS:
            seq = f"replace({seq}, '{d}{d}', '{d}')"
    first = f"substr({u}, 1, 1)"
    rest = f"(case when {first} in ('H', 'W') then {seq} else substr({seq}, 2) end)"
    digits = f"replace({rest}, '0', '')"
    out = f"rpad({first} || substr({digits}, 1, 3), 4, '0')"
    return f"(case when {u} = '' then '' else {out} end)"
