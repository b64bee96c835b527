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
from .text import ngrams_fold


def _with_distinct_grams(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct lowercase word n-grams via the fold form: the token array
    sits in the fold's ARGUMENT position, so no optimizer rewrite can make
    it re-evaluate per gram (ngrams_fold docstring; the staged-column +
    ``word_ngrams`` variant measured 5× slower here once CollapseProject
    inlined the split into the explode path)."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    return docs.withColumn("_grams", F.array_distinct(ngrams_fold(toks, n)))


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


def source_overlap_matrix(docs: DataFrame, *, n: int = 3,
                          group_col: str = "source",
                          text_col: str = "text",
                          hash_family: str = "xxhash64") -> DataFrame:
    """Pairwise n-gram Jaccard between corpus partitions (sources, dumps,
    snapshots) — the standard "how much does CC-2023 overlap CC-2024"
    diagnostic before mixing corpora.

    Integer-exact: ``jaccard_ppm = n_common·10⁶ div (n_a + n_b − n_common)``.
    Scale shape: per-group distinct gram sets travel as (group, 60-bit
    hash) rows — ONE algebraic distinct; the intersection self-join keys on
    the uniform hash (group count is small, so the pair fan-out per gram is
    bounded by groups²); outputs are groups²-sized. Returns
    ``(src_a, src_b, n_a, n_b, n_common, jaccard_ppm)`` for src_a < src_b.
    """
    grams = (_with_distinct_grams(docs, text_col, n)
             .select(F.col(group_col).alias("g"),
                     F.explode("_grams").alias("_gram"))
             .select("g", _gram_hash(F.col("_gram"), hash_family)
                     .alias("gram_h"))
             .distinct())
    # r6: per-gram group buckets instead of a gram self-join — the join's
    # two legs each re-ran the whole tokenize+shingle+distinct pipeline
    # (same fix as dedup.band_bucket_pairs). Bucket arrays are bounded by
    # the (small) group count; sizes and pair counts both read the buckets,
    # and the identical groupBy(gram_h) Exchange below them is reused.
    buckets = (grams.groupBy("gram_h")
               .agg(F.sort_array(F.collect_list("g")).alias("_gs")))
    sizes = (buckets.select(F.explode("_gs").alias("g"))
             .groupBy("g").agg(F.count("*").alias("n_set")))
    pair_arr = F.flatten(F.transform(
        F.col("_gs"),
        lambda x, i: F.transform(
            F.slice(F.col("_gs"), i + 2, F.size(F.col("_gs"))),
            lambda y: F.struct(x.alias("src_a"), y.alias("src_b")))))
    inter = (buckets.where(F.size("_gs") > 1)
             .select(F.explode(pair_arr).alias("_p"))
             .groupBy("_p.src_a", "_p.src_b")
             .agg(F.count("*").alias("n_common")))
    roles = inter.select(
        "src_a", "src_b", "n_common",
        F.explode(F.array("src_a", "src_b")).alias("g"))
    sized = (roles.join(sizes, "g")
             .groupBy("src_a", "src_b", "n_common")
             .agg(F.max(F.when(F.col("g") == F.col("src_a"),
                               F.col("n_set"))).alias("n_a"),
                  F.max(F.when(F.col("g") == F.col("src_b"),
                               F.col("n_set"))).alias("n_b")))
    return sized.select("src_a", "src_b", "n_a", "n_b", "n_common",
                        F.expr("n_common * 1000000 div (n_a + n_b - n_common)")
                        .alias("jaccard_ppm"))


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


def sql_source_overlap_matrix(rel: str = "documents", *, n: int = 3,
                              group_col: str = "source",
                              text_col: str = "text") -> str:
    """Oracle twin of :func:`source_overlap_matrix` (md5 family)."""
    grams = sql_distinct_grams(text_col, n)
    return rf"""
WITH g AS (
  SELECT DISTINCT {group_col} AS grp,
         ('0x' || substr(md5(gm), 1, 15))::BIGINT AS gram_h
  FROM (SELECT {group_col}, unnest({grams}) AS gm FROM {rel})),
sizes AS (SELECT grp, COUNT(*) AS n_set FROM g GROUP BY grp),
inter AS (
  SELECT a.grp AS src_a, b.grp AS src_b, COUNT(*) AS n_common
  FROM g a JOIN g b ON a.gram_h = b.gram_h AND a.grp < b.grp
  GROUP BY a.grp, b.grp)
SELECT src_a, src_b, sa.n_set AS n_a, sb.n_set AS n_b, n_common,
       n_common * 1000000 // (sa.n_set + sb.n_set - n_common) AS jaccard_ppm
FROM inter
JOIN sizes sa ON sa.grp = src_a
JOIN sizes sb ON sb.grp = src_b
"""
