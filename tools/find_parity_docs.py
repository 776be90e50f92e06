#!/usr/bin/env python
"""Find shipped st21pv documents whose `.context`/`.txt` artifacts can be
reconstructed BYTE-EXACTLY by the engine's regex tokenizer/sentencizer.

The raw PubTator corpus is not shipped (data/raw/ST21pv holds only PMID
lists), so end-to-end byte parity is evidenced the inverse way: rebuild
a PubTator document from the processed artifacts (the `.context` bytes
depend only on token sequences + mention spans, not original spacing),
run it through the preprocess plan's per-document kernel, and compare
bytes. A doc passes iff the regex tokenizer/sentencizer reproduces the
reference's stanza tokenization for it exactly — the passing set is the
stanza-parity fixture list for tests/test_preprocess.py.

Reconstruction:
  - sentences = unique block token lists in order of first appearance,
    title := first sentence, abstract := rest (joined with ' ',
    abstract base = len(title)+1 — the PubTator offset convention)
  - mention i (block i, .txt line i): B-tagged token position + the
    surface's token count from the `.txt` line
Run: python tools/find_parity_docs.py [--limit N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_linking_in_biomedical_spark.plans.preprocess import (
    _doc_blocks,
    regex_sentencizer,
    regex_tokenizer,
)

REF = "/root/reference/data/processed/st21pv"


def parse_context(path: str) -> list[list[tuple[str, str]]]:
    blocks, cur = [], []
    for line in open(path, encoding="utf-8").read().split("\n"):
        if line == "":
            if cur:
                blocks.append(cur)
            cur = []
        else:
            tok, tag = line.split("\t")
            cur.append((tok, tag))
    if cur:
        blocks.append(cur)
    return blocks


def parse_txt(path: str) -> list[tuple[str, str]]:
    out = []
    for line in open(path, encoding="utf-8").read().split("\n"):
        if line:
            cui, _, surf = line.partition("||")
            out.append((cui, surf))
    return out


def reconstruct(doc_id: str, split: str):
    """-> (spans, cuis, shipped_context_bytes, shipped_txt_bytes) or a
    (None, reason) pair when this doc cannot be reconstructed."""
    cpath = os.path.join(REF, split, f"{doc_id}.context")
    tpath = os.path.join(REF, split, f"{doc_id}.txt")
    blocks = parse_context(cpath)
    txt = parse_txt(tpath)
    if len(blocks) != len(txt):
        return None, "block/txt count mismatch"

    # unique sentences in order of first appearance
    sents: list[tuple[str, ...]] = []
    seen: dict[tuple[str, ...], int] = {}
    for b in blocks:
        toks = tuple(t for t, _ in b)
        if toks not in seen:
            seen[toks] = len(sents)
            sents.append(toks)

    # char layout: title = sentence 0, abstract = rest joined by ' ',
    # abstract base = len(title)+1 (PubTator offset convention)
    sent_texts = [" ".join(s) for s in sents]
    bases = [0]
    if len(sent_texts) > 1:
        bases.append(len(sent_texts[0]) + 1)
        for st in sent_texts[1:-1]:
            bases.append(bases[-1] + len(st) + 1)
    title = sent_texts[0]
    abstract = " ".join(sent_texts[1:])

    def tok_starts(toks: tuple[str, ...]) -> list[int]:
        starts, pos = [], 0
        for t in toks:
            starts.append(pos)
            pos += len(t) + 1
        return starts

    mentions = []  # (abs_start, surface, cui)
    for b, (cui, surf) in zip(blocks, txt):
        toks = tuple(t for t, _ in b)
        si = seen[toks]
        b_pos = [i for i, (_, tag) in enumerate(b) if tag.startswith("B:")]
        if len(b_pos) != 1:
            return None, f"{len(b_pos)} B tags in one block"
        j = b_pos[0]
        stoks = [t for t, _ in regex_tokenizer(surf)]
        if list(toks[j : j + len(stoks)]) != stoks:
            return None, "surface tokens do not match block at B position"
        if " ".join(stoks) != surf:
            return None, "surface spacing not single-space (txt parity impossible)"
        mentions.append((bases[si] + tok_starts(toks)[j], surf, cui))

    mentions.sort(key=lambda m: m[0])
    spans = [
        {"kind": "text", "text": title, "media_ref": None, "offset": 0},
        {
            "kind": "text",
            "text": abstract,
            "media_ref": None,
            "offset": len(title) + 1,
        },
    ] + [
        {"kind": "mention", "text": s, "media_ref": f"cui://{c}", "offset": o}
        for o, s, c in mentions
    ]
    cuis = [c for _, _, c in mentions]
    return (
        spans,
        cuis,
        open(cpath, encoding="utf-8").read(),
        open(tpath, encoding="utf-8").read(),
    ), None


def render(res: dict) -> tuple[str, str]:
    ctx = "".join(
        "\n".join(f"{t['token']}\t{t['tag']}" for t in b["tokens"]) + "\n\n"
        for b in res["blocks"]
    )
    txt = "\n".join(f"{m['cui']}||{m['surface']}" for m in res["mentions"])
    return ctx, txt


def check(doc_id: str, split: str):
    rec, why = reconstruct(doc_id, split)
    if rec is None:
        return False, why
    spans, cuis, want_ctx, want_txt = rec
    res = _doc_blocks(spans, cuis, regex_tokenizer, regex_sentencizer)
    got_ctx, got_txt = render(res)
    if got_txt != want_txt:
        return False, "txt bytes differ"
    if got_ctx != want_ctx:
        return False, "context bytes differ"
    return True, "ok"


def main() -> None:
    limit = None
    if "--limit" in sys.argv:
        limit = int(sys.argv[sys.argv.index("--limit") + 1])
    reasons: dict[str, int] = {}
    passing: list[tuple[str, str]] = []
    n = 0
    for split in ("train", "test"):
        for f in sorted(os.listdir(os.path.join(REF, split))):
            if not f.endswith(".context"):
                continue
            doc_id = f[: -len(".context")]
            n += 1
            ok, why = check(doc_id, split)
            reasons[why] = reasons.get(why, 0) + 1
            if ok:
                passing.append((split, doc_id))
            if limit and n >= limit:
                break
    print(f"scanned {n} docs; {len(passing)} byte-exact")
    for why, c in sorted(reasons.items(), key=lambda kv: -kv[1]):
        print(f"  {c:5d}  {why}")
    print("passing:", passing[:40])


if __name__ == "__main__":
    main()
