"""Soundex phonetic key: canonical NARA vectors + Spark/DuckDB twin
parity (functions/phonetic.py builds both from one constant table)."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.functions.phonetic import (
    soundex,
    soundex_sql,
)

# the canonical published test vectors, including the H/W rule
# (Ashcraft: s,c separated by h -> one code; Tymczak: vowel separates,
# both kept) and H/W-initial names (Honeyman, Washington, Wu)
VECTORS = [
    ("Robert", "R163"),
    ("Rupert", "R163"),
    ("Ashcraft", "A261"),
    ("Ashcroft", "A261"),
    ("Tymczak", "T522"),
    ("Pfister", "P236"),
    ("Honeyman", "H555"),
    ("Jackson", "J250"),
    ("Washington", "W252"),
    ("Lee", "L000"),
    ("Gutierrez", "G362"),
    ("Wu", "W000"),
    ("o'Brien-42", "O165"),  # punctuation/digits stripped
    ("12345", ""),  # no letters
    ("", ""),
    (None, None),
]


def test_soundex_canonical_vectors(spark):
    df = spark.createDataFrame([(n,) for n, _ in VECTORS], "name string")
    got = [r["sx"] for r in df.select(soundex("name").alias("sx")).collect()]
    assert got == [want for _, want in VECTORS]


def test_soundex_duckdb_twin_matches_vectors():
    con = duckdb.connect()
    for name, want in VECTORS:
        got = con.execute(
            f"select {soundex_sql('name')} from (select ? as name)", [name]
        ).fetchone()[0]
        assert got == want, (name, got, want)


def test_soundex_cross_engine_random_differential(spark):
    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyzAEIOUHW '-0"
    names = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got_spark = [r["sx"] for r in df.select(soundex("name").alias("sx")).collect()]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"select {soundex_sql('name')} from (select ? as name)", [n]
        ).fetchone()[0]
        for n in names
    ]
    assert got_spark == got_duck
