"""Corpus-preparation queries: quality filter, PII scrub,
decontamination, sequence packing (llm/corpus.py operators).

The last mile of a training-data pipeline after dedup: drop
degenerate-repetition docs (Gopher/C4 heuristics), scrub PII, remove
benchmark contamination, and pack what's left into fixed token
budgets. Every query is oracle-backed — the operators were designed
so all arithmetic is integers or a single integer division, making
results engine-exact (see llm/corpus.py module docstring).

Benchmark split for the decontamination probe: ``doc_id % 97 = 0`` is
the "benchmark" set, everything else is training data — a
deterministic stand-in for a real eval-set manifest. 3-gram overlap
is used at test scale (the synthetic vocabulary is small; real
pipelines use 8-13 grams — the operator takes ``n``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..llm.corpus import (
    EMAIL_RE,
    PHONE_RE,
    decontaminate,
    pack_sequences,
    redact_pii,
    repetition_stats,
    stratified_sample,
)
from ..sources.testdata import load_table
from . import query

_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
)


@query(
    "t_repetition_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS w FROM documents
    ), words AS (
      SELECT doc_id, unnest(w) AS word FROM toks
    ), wc AS (
      SELECT doc_id, word, COUNT(*) AS n FROM words GROUP BY 1, 2
    ), stats AS (
      SELECT doc_id,
             CAST(SUM(n) AS BIGINT) AS n_words,
             CAST(MAX(n) AS BIGINT) AS max_word_n,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(length(word) * n) AS BIGINT) AS char_mass
      FROM wc GROUP BY 1
    )
    SELECT doc_id,
           n_words,
           CAST(max_word_n AS DOUBLE) / CAST(n_words AS DOUBLE) AS max_word_frac,
           CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS distinct_word_frac,
           CAST(char_mass AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
           (CAST(max_word_n AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.10
            AND CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.5
            AND CAST(char_mass AS DOUBLE) / CAST(n_words AS DOUBLE) >= 3.0
            AND CAST(char_mass AS DOUBLE) / CAST(n_words AS DOUBLE) <= 10.0) AS keep
    FROM stats ORDER BY doc_id
    """,
)
def t_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality signals + keep verdict per doc."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    return repetition_stats(d).orderBy("doc_id")


@query(
    "t_pii_redaction",
    oracle=f"""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(length(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g')) AS clean_hash
    FROM documents ORDER BY doc_id
    """,
)
def t_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub probe: per-doc email/phone counts + redacted-text hash.

    The hash pins the EXACT redacted output across engines (the
    testdata contains no PII, so counts are 0 and hash == md5(text) —
    planted-PII behavior is pinned in tests/test_corpus_ops.py).
    """
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    r = redact_pii(d)
    return r.select(
        "doc_id", "n_emails", "n_phones", F.md5(col("redacted")).alias("clean_hash")
    ).orderBy("doc_id")


@query(
    "d_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS w FROM documents
    ), grams_l AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_transform(range(1, len(w) - 1),
                                      i -> md5(array_to_string(list_slice(w, i, i + 2), ' ')))
                  ELSE [] END AS gl
      FROM toks
    ), grams AS (
      SELECT doc_id, unnest(gl) AS ngram_hash FROM grams_l
    ), bench AS (
      SELECT DISTINCT ngram_hash FROM grams WHERE doc_id % 97 = 0
    )
    SELECT g.doc_id, CAST(COUNT(DISTINCT g.ngram_hash) AS BIGINT) AS n_shared
    FROM grams g JOIN bench b USING (ngram_hash)
    WHERE g.doc_id % 97 <> 0
    GROUP BY 1 ORDER BY doc_id
    """,
)
def d_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing a 3-gram with
    the ``doc_id % 97 = 0`` benchmark split, with shared-gram counts."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    train = d.filter(col("doc_id") % 97 != 0)
    bench = d.filter(col("doc_id") % 97 == 0)
    return decontaminate(train, bench, n=3).orderBy("doc_id")


@query(
    "t_sequence_packing",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 4
                  AS INT) AS shard,
             md5(CAST(doc_id AS VARCHAR)) AS _ord
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(floor(COALESCE(SUM(n_tokens) OVER (
                  PARTITION BY shard ORDER BY _ord
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512)
                AS BIGINT) AS pack_id,
           n_tokens
    FROM base ORDER BY doc_id
    """,
)
def t_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard + greedy 512-token packing per document."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text"])
    return pack_sequences(d, budget=512, n_shards=4).orderBy("doc_id")


@query(
    "t_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 20 ORDER BY doc_id
    """,
)
def t_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible eval-set draw: 20 docs per language by md5 rank."""
    d = load_table(spark, sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    return stratified_sample(d, ["lang"], 20).select("doc_id", "lang", "source").orderBy(
        "doc_id"
    )
