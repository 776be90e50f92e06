"""Deterministic synthetic corpus generator (FIXTURES.md §1-5).

Produces the authoritative input shape from the driver's input_hint:

    documents: doc_id string,
               spans array<struct<kind,text,media_ref,offset>>

plus ``entities`` (cui, sem_type, synonyms), ``labels`` ground truth,
``abbr_map``, ``split_ids`` and per-string embeddings. Seeded
``random.Random`` only — two calls with the same args are identical.

Generator mirrors the reference corpus's statistical shape: mention
surfaces are entity synonyms with controlled corruption (typos at
Levenshtein distance 1-2, case flips, short-form abbreviations — the
Ab3P analogue, medmention_preprocess.py:124-181), ~5% NIL mentions,
~30% of docs carry interleaved media spans, and a few docs carry
overlapping mention offsets to exercise the overlap-dedup sweep
(medmention_preprocess.py:59-70).
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field

_WORDS = (
    "carcinoma lymphoma melanoma gene protein receptor kinase tumor cell "
    "factor syndrome disease acid enzyme antibody therapy clinical trial "
    "mutation pathway signal membrane plasma serum hepatic renal cardiac "
    "neural cortex tissue biopsy lesion chronic acute benign malignant "
    "alpha beta gamma delta inhibitor agonist channel transporter domain"
).split()

_SEMTYPES = ["Disease", "Gene", "Chemical", "Anatomy", "Procedure"]

_FILLER = (
    "patients were treated with standard of care and followed for months "
    "results indicate a significant association between expression and outcome"
).split()


@dataclass
class SynthCorpus:
    documents: list[dict] = field(default_factory=list)  # {doc_id, spans:[{kind,text,media_ref,offset}]}
    entities: list[dict] = field(default_factory=list)  # {cui, sem_type, synonyms}
    labels: list[dict] = field(default_factory=list)  # {doc_id, span_seq, cui_gold, cluster_id}
    abbr_map: list[dict] = field(default_factory=list)  # {doc_id, abbr, long_form}
    split_ids: list[dict] = field(default_factory=list)  # {doc_id}
    embeddings: dict[str, list[float]] = field(default_factory=dict)  # norm_key -> unit vec

    DOCUMENTS_SCHEMA = (
        "doc_id string, spans array<struct<"
        "kind:string, text:string, media_ref:string, offset:int>>"
    )
    ENTITIES_SCHEMA = "cui string, sem_type string, synonyms array<string>"
    LABELS_SCHEMA = "doc_id string, span_seq int, cui_gold string, cluster_id string"
    ABBR_SCHEMA = "doc_id string, abbr string, long_form string"
    SPLIT_SCHEMA = "doc_id string"

    def to_spark(self, spark):
        docs = spark.createDataFrame(
            [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in self.documents],
            self.DOCUMENTS_SCHEMA,
        )
        ents = spark.createDataFrame(
            [(e["cui"], e["sem_type"], e["synonyms"]) for e in self.entities],
            self.ENTITIES_SCHEMA,
        )
        labels = spark.createDataFrame(
            [(l["doc_id"], l["span_seq"], l["cui_gold"], l["cluster_id"]) for l in self.labels],
            self.LABELS_SCHEMA,
        )
        abbr = spark.createDataFrame(
            [(a["doc_id"], a["abbr"], a["long_form"]) for a in self.abbr_map] or [("", "", "")],
            self.ABBR_SCHEMA,
        )
        if not self.abbr_map:
            abbr = abbr.limit(0)
        split = spark.createDataFrame([(s["doc_id"],) for s in self.split_ids], self.SPLIT_SCHEMA)
        return docs, ents, labels, abbr, split

    def embeddings_df(self, spark):
        """(norm string, embedding array<double>) lookup for the dense
        dot-product scoring feature."""
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(self.embeddings.items())],
            "norm string, embedding array<double>",
        )


def _unit_vec(rng: random.Random, dim: int) -> list[float]:
    v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def _perturb(vec: list[float], rng: random.Random, noise: float) -> list[float]:
    v = [x + rng.gauss(0.0, noise) for x in vec]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def _typo(s: str, rng: random.Random) -> str:
    """Corruption at Levenshtein distance 1-2."""
    ops = rng.randint(1, 2)
    s = list(s)
    for _ in range(ops):
        if len(s) < 4:
            break
        i = rng.randrange(1, len(s) - 1)
        op = rng.random()
        if op < 0.4:  # swap adjacent
            s[i], s[i - 1] = s[i - 1], s[i]
        elif op < 0.7:  # delete
            del s[i]
        else:  # substitute
            s[i] = rng.choice("abcdefghijklmnopqrstuvwxyz")
    return "".join(s)


def synth_corpus(
    n_docs: int = 100,
    n_entities: int = 60,
    seed: int = 42,
    emb_dim: int = 32,
    nil_rate: float = 0.05,
    corrupt_rate: float = 0.35,
    media_doc_rate: float = 0.3,
    overlap_doc_rate: float = 0.05,
) -> SynthCorpus:
    rng = random.Random(seed)
    c = SynthCorpus()

    # --- entity dictionary -------------------------------------------------
    # synonym norms are globally unique across entities: two concepts
    # sharing an identical normalized surface would make the gold labels
    # themselves ambiguous (any linker must pick one)
    ent_vecs: dict[str, list[float]] = {}
    used_norms: set[str] = set()
    for i in range(n_entities):
        cui = f"C{i + 1:07d}"
        canonical = None
        for _ in range(50):
            base = rng.sample(_WORDS, rng.randint(2, 3))
            cand = " ".join(base)
            if _nk(cand) not in used_norms:
                canonical = cand
                break
        assert canonical is not None, "word pool exhausted; raise pool size"
        syns = {canonical}
        used_norms.add(_nk(canonical))
        for _ in range(rng.randint(0, 5)):
            kind = rng.random()
            if kind < 0.4 and len(base) > 1:
                s = " ".join(reversed(base))
            elif kind < 0.7:
                s = (rng.choice(_WORDS) + " " + canonical).strip()
            else:
                s = "".join(w[0] for w in base).upper() + str(i % 10) + str(rng.randint(0, 9))
            if _nk(s) not in used_norms:
                used_norms.add(_nk(s))
                syns.add(s)
        c.entities.append(
            {"cui": cui, "sem_type": rng.choice(_SEMTYPES), "synonyms": sorted(syns)}
        )
        ent_vecs[cui] = _unit_vec(rng, emb_dim)
        for s in syns:
            c.embeddings[_nk(s)] = _perturb(ent_vecs[cui], rng, 0.02)

    # --- documents ---------------------------------------------------------
    for d in range(n_docs):
        doc_id = f"D{d + 1:07d}"
        spans: list[dict] = []
        offset = 0
        has_media = rng.random() < media_doc_rate
        want_overlap = rng.random() < overlap_doc_rate
        n_spans = rng.randint(3, 15)
        seq = 0
        for _ in range(n_spans):
            r = rng.random()
            if has_media and r < 0.15:
                spans.append(
                    {
                        "kind": "media",
                        "text": "",
                        "media_ref": f"img://{doc_id}/{seq}",
                        "offset": offset,
                    }
                )
                offset += 1
            elif r < 0.55:
                txt = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(3, 8)))
                spans.append({"kind": "text", "text": txt, "media_ref": None, "offset": offset})
                offset += len(txt) + 1
            else:
                if rng.random() < nil_rate:
                    surface = "zz" + "".join(rng.choice("qxzjvw") for _ in range(6))
                    cui = None
                    c.embeddings.setdefault(_nk(surface), _unit_vec(rng, emb_dim))
                else:
                    ent = rng.choice(c.entities)
                    cui = ent["cui"]
                    surface = rng.choice(ent["synonyms"])
                    if rng.random() < corrupt_rate:
                        mode = rng.random()
                        if mode < 0.5:
                            surface = _typo(surface, rng)
                        elif mode < 0.8:
                            surface = surface.upper() if rng.random() < 0.5 else surface.title()
                        c.embeddings.setdefault(
                            _nk(surface), _perturb(ent_vecs[cui], rng, 0.05)
                        )
                spans.append(
                    {"kind": "mention", "text": surface, "media_ref": None, "offset": offset}
                )
                c.labels.append(
                    {
                        "doc_id": doc_id,
                        "span_seq": len(spans) - 1,
                        "cui_gold": cui,
                        "cluster_id": cui if cui else f"NIL_{doc_id}_{len(spans) - 1}",
                    }
                )
                offset += len(surface) + 1
                # occasionally an overlapping duplicate mention right after
                if want_overlap and rng.random() < 0.5:
                    dup = surface[: max(3, len(surface) // 2)]
                    spans.append(
                        {
                            "kind": "mention",
                            "text": dup,
                            "media_ref": None,
                            # overlaps the previous mention's [offset, offset+len) range
                            "offset": offset - len(surface) - 1 + 1,
                        }
                    )
                    c.labels.append(
                        {
                            "doc_id": doc_id,
                            "span_seq": len(spans) - 1,
                            "cui_gold": None,
                            "cluster_id": f"OVERLAP_{doc_id}_{len(spans) - 1}",
                        }
                    )
                    c.embeddings.setdefault(_nk(dup), _unit_vec(rng, emb_dim))
                    want_overlap = False
            seq += 1
        c.documents.append({"doc_id": doc_id, "spans": spans})
        if rng.random() < 0.2:
            c.abbr_map.append(
                {"doc_id": doc_id, "abbr": "EGFR", "long_form": "epidermal growth factor receptor"}
            )
        if rng.random() < 0.5:
            c.split_ids.append({"doc_id": doc_id})
    return c


def _nk(s: str) -> str:
    """Python twin of functions.normalize.norm_key."""
    import re

    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


def synth_pubtator_lines(
    n_docs: int = 1000, n_entities: int = 200, seed: int = 7
) -> list[str]:
    """Deterministic synthetic PubTator corpus (title/abstract lines +
    tab-separated annotations) for benchmarking the E1 preprocess plan
    (plans/preprocess.pubtator_to_context) at scale. Text is built so
    the regex tokenizer/sentencizer round-trips exactly: words carry no
    punctuation, every sentence ends '.' and starts uppercase, every
    mention begins on a token boundary."""
    rng = random.Random(seed)
    ents = []
    for i in range(n_entities):
        name = " ".join(rng.sample(_WORDS, rng.randint(1, 3)))
        ents.append((f"C{i + 1:07d}", name))

    lines: list[str] = []
    for d in range(n_docs):
        doc_id = str(10_000_000 + d)
        anns: list[tuple[int, int, str, str]] = []

        def sentence(base: int) -> str:
            parts: list[str] = []
            pos = base
            for t in range(rng.randint(4, 10)):
                first = t == 0
                if rng.random() < 0.25:
                    cui, name = ents[rng.randrange(len(ents))]
                    surf = name.title() if first else name
                    anns.append((pos, pos + len(surf), surf, cui))
                    parts.append(surf)
                    pos += len(surf) + 1
                else:
                    w = rng.choice(_FILLER)
                    parts.append(w.capitalize() if first else w)
                    pos += len(parts[-1]) + 1
            return " ".join(parts) + "."

        title = sentence(0)
        base = len(title) + 1
        abs_sents = []
        for _ in range(rng.randint(2, 6)):
            s = sentence(base)
            abs_sents.append(s)
            base += len(s) + 1
        lines.append(f"{doc_id}|t|{title}")
        lines.append(f"{doc_id}|a|{' '.join(abs_sents)}")
        for s, e, surf, cui in sorted(anns):
            lines.append(f"{doc_id}\t{s}\t{e}\t{surf}\tX\tT000:{cui}")
        lines.append("")
    return lines
