"""Train/eval n-gram decontamination.

Benchmark contamination checks (GPT-3 §C, PaLM, Llama: "remove eval docs
sharing an n-gram with the training set") are a standard step of any
large-scale training-data pipeline. The operator flags every eval document
that shares at least one lowercase word n-gram with ANY training document
and reports how much of it is contaminated:

    (id_col, n_grams, n_hits, contam_ppm)   for docs with n_hits > 0

``contam_ppm = n_hits * 1_000_000 div n_grams`` — integer-exact (same
rationale as ops/text.tf_idf_top_terms: cross-engine bit-stable, no float).

Scale shape (the part that must survive 100 TB):
- each side tokenizes/shingles NARROW (staged token array → one
  ``word_ngrams`` transform → ``array_distinct`` → explode);
- grams travel as 60-bit uniform hashes, never as strings — the shuffle
  payload is 8 bytes/gram and the join key cannot skew;
- the train gram set is reduced by an algebraic distinct (map-side
  combine collapses repeated grams per partition before the exchange);
- the hit check is a LEFT SEMI join: eval grams are typically orders of
  magnitude fewer than train grams, so AQE broadcasts the eval side and
  the 100 TB train relation is never shuffled at all; per-doc counting
  then groups on the uniform doc id.

Beyond-reference op; oracle gate ``decontam_ngram_overlap`` replays it in
DuckDB via the ``sql_*`` twins below (md5 family, functions/phash.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column

from ..functions import phash
from .text import word_ngrams


def _with_distinct_grams(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """Stage tokens as a REAL column before the ``word_ngrams`` HOF — an
    inline ``split`` would be re-evaluated once per gram position when
    CollapseProject inlines it into the transform lambda (CLAUDE.md)."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    return (docs.withColumn("_toks", toks)
            .withColumn("_grams", F.array_distinct(word_ngrams(F.col("_toks"), n))))


def _gram_hash(gram: Column, hash_family: str) -> Column:
    if hash_family == "md5":
        return phash.phash60(gram)
    if hash_family == "xxhash64":
        return F.xxhash64(gram)
    raise ValueError(f"unknown hash family {hash_family!r}; "
                     f"expected one of {phash.FAMILIES}")


def ngram_contamination(train: DataFrame, eval_docs: DataFrame, *,
                        n: int = 5, text_col: str = "text",
                        id_col: str = "doc_id",
                        hash_family: str = "xxhash64") -> DataFrame:
    """Eval documents sharing ≥1 lowercase word ``n``-gram with the train
    corpus, with distinct-gram hit counts (see module docstring)."""
    train_grams = (_with_distinct_grams(train, text_col, n)
                   .select(F.explode("_grams").alias("_gram"))
                   .select(_gram_hash(F.col("_gram"), hash_family)
                           .alias("gram_h"))
                   .distinct())
    eval_grams = (_with_distinct_grams(eval_docs, text_col, n)
                  .withColumn("n_grams", F.size("_grams").cast("long"))
                  .where(F.col("n_grams") > 0)
                  .select(F.col(id_col), F.col("n_grams"),
                          F.explode("_grams").alias("_gram"))
                  .withColumn("gram_h",
                              _gram_hash(F.col("_gram"), hash_family)))
    hits = (eval_grams
            .join(train_grams, "gram_h", "left_semi")
            .groupBy(id_col, "n_grams")
            .agg(F.count("*").alias("n_hits")))
    return hits.select(
        id_col, "n_grams", "n_hits",
        F.expr("n_hits * 1000000 div n_grams").alias("contam_ppm"))


# --- DuckDB oracle twins (kept adjacent so Spark and SQL cannot drift) -----------

def sql_distinct_grams(text_expr: str, n: int) -> str:
    """DuckDB expression: distinct lowercase word n-grams of ``text_expr``."""
    return (rf"list_distinct(list_transform("
            rf"range(0, greatest(len(list_filter(string_split_regex("
            rf"trim(lower({text_expr})), '\s+'), t -> t <> '')) - {n} + 1, 0)), "
            rf"i -> array_to_string(list_filter(string_split_regex("
            rf"trim(lower({text_expr})), '\s+'), t -> t <> '')"
            rf"[i + 1 : i + {n}], ' ')))")


def sql_ngram_contamination(train_rel: str, eval_rel: str, *, n: int = 5,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> str:
    """Oracle twin of :func:`ngram_contamination` (md5 family).

    ``train_rel`` / ``eval_rel`` are relation expressions (table names or
    parenthesized subqueries) with ``id_col`` and ``text_col`` columns.
    """
    grams = sql_distinct_grams(text_col, n)
    return rf"""
WITH tg AS (
  SELECT DISTINCT ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram_h
  FROM (SELECT unnest({grams}) AS g FROM {train_rel})),
eg AS (
  SELECT {id_col}, n_grams, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gram_h
  FROM (SELECT {id_col}, len({grams})::BIGINT AS n_grams,
               unnest({grams}) AS g
        FROM {eval_rel})
  WHERE n_grams > 0),
h AS (
  SELECT {id_col}, n_grams, COUNT(*) AS n_hits
  FROM eg WHERE gram_h IN (SELECT gram_h FROM tg)
  GROUP BY {id_col}, n_grams)
SELECT {id_col}, n_grams, n_hits, n_hits * 1000000 // n_grams AS contam_ppm
FROM h
"""
