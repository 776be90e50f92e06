"""PySpark-native biomedical entity-resolution engine.

A from-scratch rebuild of the *capabilities* of
dinhngoc267/Entity-Linking-in-Biomedical as an idiomatic Spark
DataFrame pipeline:

  1. blocking      — normalized-surface keys + char-n-gram MinHash/LSH
                     (replaces the reference's brute-force TF-IDF cosine
                     top-k join, src/models/candidate_generator.py:89-127)
  2. pair scoring  — Arrow-vectorized pandas UDFs computing Jaro-Winkler,
                     Levenshtein, TF-IDF cosine and embedding dot-product,
                     combined into a calibrated logistic match score
                     (replaces the BERT cross-encoder heads,
                     src/models/affinity_models.py)
  3. clustering    — large-star/small-star connected components over the
                     match graph (the reference stops at pairwise scores;
                     transitive clustering is mandated by the north rule)

Everything is DataFrame/Catalyst-first: JVM-side column expressions for
normalization, n-grams and MinHash; pandas UDFs only where semantics
require Python (Jaro-Winkler, span-array rewrites); zero per-row Python
UDFs; zero RDD usage.
"""

__version__ = "0.1.0"
