"""Text analysis for large-scale training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

Everything is a pure column expression (whole-stage codegen; no UDFs), so
each metric is a narrow map over the documents table — no shuffle, scales
linearly with input bytes, and is expressible 1:1 in ANSI SQL for the DuckDB
oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --- token counting ----------------------------------------------------------

def token_count(text: Column) -> Column:
    """Whitespace tokens."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


BPE_ISH_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored proxy: letter runs, single digits, single punctuation —
    the standard pre-tokenizer shape (GPT-2-style regex, simplified)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 0))


# --- quality scoring ----------------------------------------------------------

STOPWORDS_EN = ("the", "of", "and", "to", "in", "a", "is", "that", "for", "it")


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / word-shape ratios (the usual
    Gopher/C4-style filters)."""
    n_chars = F.length(text)
    tokens = token_count(text)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_upper = F.length(text) - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    n_digit = F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))
    stop_re = r"(?i)\b(" + "|".join(STOPWORDS_EN) + r")\b"
    n_stop = F.size(F.regexp_extract_all(text, F.lit(stop_re), 0))
    safe = F.greatest(n_chars, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": tokens,
        "punct_ratio": n_punct / safe,
        "upper_ratio": n_upper / safe,
        "digit_ratio": n_digit / safe,
        "stopword_ratio": n_stop.cast("double") / F.greatest(tokens, F.lit(1)),
        "mean_word_len": n_chars.cast("double") / F.greatest(tokens, F.lit(1)),
    }


def quality_score(text: Column) -> Column:
    """Scalar [0,1] quality heuristic: rewards stopword presence and sane
    word length, penalizes punctuation/digit noise."""
    f = quality_features(text)
    score = (
        F.lit(0.5)
        + F.least(f["stopword_ratio"], F.lit(0.4))
        - F.least(f["punct_ratio"], F.lit(0.3))
        - F.least(f["digit_ratio"], F.lit(0.2))
        - F.when((f["mean_word_len"] < 3) | (f["mean_word_len"] > 12),
                 F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return F.least(F.greatest(score, F.lit(0.0)), F.lit(1.0))


# --- language identification ---------------------------------------------------

#: tiny per-language stopword sets for the n-gram/stopword-voting heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "fr": ("le", "la", "les", "est", "une", "dans"),
    "es": ("el", "los", "las", "es", "una", "por"),
}


def lang_scores(text: Column) -> dict[str, Column]:
    out = {}
    for lang, words in LANG_MARKERS.items():
        rx = r"(?i)\b(" + "|".join(words) + r")\b"
        out[lang] = F.size(F.regexp_extract_all(text, F.lit(rx), 0))
    return out


def lang_id(text: Column) -> Column:
    """argmax over marker-hit counts, 'und' when nothing matches.

    Deterministic tie-break: language name ascending (matches the SQL oracle
    formulation: ORDER BY hits DESC, lang ASC LIMIT 1).
    """
    scores = lang_scores(text)
    pairs = F.array(*[F.struct(cnt.alias("hits"), F.lit(lang).alias("lang"))
                      for lang, cnt in sorted(scores.items())])
    red = F.reduce(
        pairs,
        F.struct(F.lit(-1).alias("hits"), F.lit("").alias("lang")),
        lambda acc, p: F.when(
            (p["hits"] > acc["hits"]), F.struct(p["hits"].alias("hits"), p["lang"].alias("lang"))
        ).otherwise(acc),
    )
    return F.when(red["hits"] <= 0, F.lit("und")).otherwise(red["lang"])


# --- repetition signals (Gopher-style duplicate-fraction filters) ---------------
#
# Rau et al.'s Gopher quality rules drop documents whose content is dominated
# by repeated lines / n-grams. The duplicate-FRACTION form used here —
# (occurrences − distinct) / occurrences — needs no per-key counting at all:
# it is a pure array expression (size + array_distinct + array_join), so the
# whole signal stays inside whole-stage codegen with zero shuffle and has an
# exact 1:1 DuckDB formulation (len/list_distinct/array_to_string) for the
# oracle gate. Reference repo has no equivalent (beyond-reference op).

def tokens_ws(text: Column) -> Column:
    """Whitespace tokens as an array (empty text → [''], like DuckDB's
    regexp_split_to_array — callers' duplicate fractions are 0 either way)."""
    return F.split(F.trim(text), r"\s+")


def word_ngrams(tokens: Column, n: int) -> Column:
    """Space-joined word n-grams; fewer than n tokens → empty array.

    ``tokens`` should be a staged column, not an inline ``split(...)`` —
    expressions referenced inside higher-order-function lambdas are
    re-evaluated per element when CollapseProject inlines them (CLAUDE.md).
    """
    if n < 2:
        return tokens
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.concat_ws(" ", *[F.get(tokens, i + j) for j in range(n)]))
    return F.when(F.size(tokens) >= n, grams) \
            .otherwise(F.array().cast("array<string>"))


def ngrams_fold(tokens: Column, n: int) -> Column:
    """Space-joined word n-grams via ONE aggregate fold with ``tokens`` in
    ARGUMENT position — the CollapseProject-immune shape (CLAUDE.md): HOF
    arguments evaluate once per row even when the optimizer inlines their
    producer, while :func:`word_ngrams`'s positional-``get`` lambda
    re-evaluates an inlined token expression per gram (measured 5× on the
    decontamination plan, same failure class as the 64× MinHash case).
    Use THIS when the token array is not already a multi-referenced staged
    column; ``word_ngrams`` remains for callers whose surrounding
    expressions reference the staged array several times."""
    if n < 2:
        return tokens
    empty = F.array().cast("array<string>")
    init = F.struct(empty.alias("buf"), empty.alias("out"))

    def merge(acc: Column, x: Column) -> Column:
        buf = F.concat(acc["buf"], F.array(x))
        full = F.size(buf) == n
        out = F.when(full, F.concat(acc["out"],
                                    F.array(F.concat_ws(" ", buf)))) \
               .otherwise(acc["out"])
        return F.struct(
            F.when(full, F.slice(buf, 2, n - 1)).otherwise(buf).alias("buf"),
            out.alias("out"))

    return F.aggregate(tokens, init, merge, lambda acc: acc["out"])


def duplicate_fraction(arr: Column) -> Column:
    """(occurrences − distinct values) / occurrences; 0.0 on empty."""
    n = F.size(arr)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(arr))).cast("double") / n)


def duplicate_char_fraction(arr: Column) -> Column:
    """Character-weighted variant: fraction of characters belonging to
    excess (duplicate) occurrences. Join order is irrelevant to a length
    sum, so array_distinct's ordering never matters cross-engine."""
    total = F.length(F.array_join(arr, ""))
    dist = F.length(F.array_join(F.array_distinct(arr), ""))
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        (total - dist).cast("double") / total)


def split_lines(text: Column) -> Column:
    """Trimmed non-empty lines."""
    return F.filter(F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
                    lambda x: x != "")


def repetition_features(tokens: Column, lines: Column | None = None,
                        ) -> dict[str, Column]:
    """Duplicate-fraction repetition signals over staged token/line arrays."""
    out = {
        "dup_token_frac": duplicate_fraction(tokens),
        "dup_token_char_frac": duplicate_char_fraction(tokens),
        "dup_2gram_frac": duplicate_fraction(word_ngrams(tokens, 2)),
        "dup_3gram_frac": duplicate_fraction(word_ngrams(tokens, 3)),
    }
    if lines is not None:
        out["dup_line_frac"] = duplicate_fraction(lines)
        out["dup_line_char_frac"] = duplicate_char_fraction(lines)
    return out


# --- PII / URL scrubbing ---------------------------------------------------------
#
# C4/Dolma-style pre-training scrub: emails, URLs, bare IPv4s replaced by
# typed placeholder tokens. Patterns are deliberately RE2-compatible (no
# lookaround, no backreferences) so the SAME pattern string runs in Java
# regex (Spark) and RE2 (DuckDB oracle / many scrubbing services).
# Replacement order matters and is part of the contract: URLs first (an
# email-shaped substring inside a URL is part of the URL), then emails,
# then bare IPv4s. Pure regexp_replace chain — narrow, zero shuffle.

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_pii(text: Column) -> Column:
    """Replace every PII_PATTERNS match with its placeholder, in order."""
    out = text
    for _, rx, repl in PII_PATTERNS:
        out = F.regexp_replace(out, rx, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per kind, counted SEQUENTIALLY on the progressively
    scrubbed text so they agree exactly with what scrub_pii replaces
    (an email inside a URL counts as the URL, not both)."""
    out: dict[str, Column] = {}
    cur = text
    for kind, rx, repl in PII_PATTERNS:
        out[f"n_{kind}"] = F.size(F.regexp_extract_all(cur, F.lit(rx), 0))
        cur = F.regexp_replace(cur, rx, repl)
    return out


# --- corpus vocabulary stats -----------------------------------------------------

def term_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus term frequencies: explode whitespace tokens → groupBy(term).

    The classic word-count shape. At 100 TB this is ONE shuffle whose
    map side is collapsed by partial aggregation (hash-aggregate combine),
    so hot terms ("the") ship one partial row per input partition, not one
    row per occurrence — no salting needed for an algebraic count. The
    explode itself is narrow.
    """
    term = F.explode(tokens_ws(F.col(text_col))).alias("term")
    return (docs.select(term).where(F.col("term") != "")
            .groupBy("term").agg(F.count("*").alias("n")))


def top_terms(docs: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """Top-k terms with a total order (n DESC, term ASC) so boundary ties
    resolve identically in any engine — the k+1'th term is deterministic."""
    return (term_counts(docs, text_col)
            .orderBy(F.desc("n"), F.asc("term")).limit(k))


def gopher_filter(docs: DataFrame, *, text_col: str = "text",
                  min_tokens: int = 20, max_tokens: int = 100_000,
                  ) -> DataFrame:
    """The Gopher-style quality DECISION (not just the features): adds a
    ``reject_reason`` column — null means kept; otherwise the FIRST failing
    rule in documented order:

      n_tokens   outside [min_tokens, max_tokens]
      word_len   mean chars/token outside [3, 12]
      punct      punctuation > 20% of characters
      digit      digits > 15% of characters
      stopwords  fewer than 2 English stopword hits
      repetition duplicate word-3-gram fraction > 30%

    Every threshold compares CROSS-MULTIPLIED INTEGER counts
    (``n_punct·100 > 20·n_chars``), never a float ratio — ratio floats are
    IEEE-identical cross-engine but integer compares make that a
    non-question at the exact boundary. One narrow projection, zero
    shuffle; counts staged as real columns so the CASE reads attributes.
    """
    t = F.col(text_col)
    toks = tokens_ws(t)
    grams = ngrams_fold(F.filter(toks, lambda x: x != ""), 3)
    stop_re = r"(?i)\b(" + "|".join(STOPWORDS_EN) + r")\b"
    staged = docs.select(
        "*",
        F.length(t).cast("long").alias("_nc"),
        token_count(t).cast("long").alias("_nt"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", "")))
        .cast("long").alias("_np"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", "")))
        .cast("long").alias("_nd"),
        F.size(F.regexp_extract_all(t, F.lit(stop_re), 0))
        .cast("long").alias("_ns"),
        F.size(grams).cast("long").alias("_g"),
        F.size(F.array_distinct(grams)).cast("long").alias("_gd"))
    reason = (
        # a NULL text yields NULL staged counts, which would make every
        # branch below NULL — indistinguishable from 'kept' (ADVICE r5):
        # reject null documents explicitly instead of silently passing them
        F.when(t.isNull(), "n_tokens")
        .when((F.col("_nt") < min_tokens) | (F.col("_nt") > max_tokens),
              "n_tokens")
        .when((F.col("_nc") < 3 * F.col("_nt"))
              | (F.col("_nc") > 12 * F.col("_nt")), "word_len")
        .when(F.col("_np") * 100 > 20 * F.col("_nc"), "punct")
        .when(F.col("_nd") * 100 > 15 * F.col("_nc"), "digit")
        .when(F.col("_ns") < 2, "stopwords")
        .when((F.col("_g") - F.col("_gd")) * 10 > 3 * F.col("_g"),
              "repetition"))
    return (staged.withColumn("reject_reason", reason)
            .drop("_nc", "_nt", "_np", "_nd", "_ns", "_g", "_gd"))


def tf_idf_top_terms(docs: DataFrame, k: int = 3, *, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Top-k characteristic terms per document by an integer-exact
    tf-idf-style score: ``score_ppm = tf * 1_000_000 div df``.

    The score deliberately uses integer division instead of ``tf·ln(N/df)``
    — the RANKING it induces per document is the same for any monotone idf,
    and integer arithmetic is bit-identical across engines (a float ``ln``
    differs in ulps between JVM and DuckDB, which would poison the value
    hash at rank boundaries). Output: ``(id_col, term, tf, df, score_ppm)``
    under the total order (score_ppm DESC, term ASC) per document.

    Scale: two algebraic-count shuffles (per-doc tf, vocabulary df) — the
    df side is vocabulary-sized, so AQE broadcasts the join back; the
    per-document top-k window partitions on the (uniform) document id.
    Beyond-reference op.
    """
    term = F.explode(tokens_ws(F.col(text_col))).alias("term")
    tf = (docs.select(F.col(id_col), term).where(F.col("term") != "")
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (tf.join(df_tbl, "term")
              .withColumn("score_ppm", F.expr("tf * 1000000 div df")))
    w = Window.partitionBy(id_col).orderBy(F.desc("score_ppm"), F.asc("term"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .select(id_col, "term", "tf", "df", "score_ppm"))


#: (label, numerator, denominator) — quantile ranks as RATIONALS: the rank
#: ceil(q·n) computed as (n·num + den − 1) div den is integer-exact, while
#: float q·n misrounds at boundaries (0.9·10 = 9.000000000000002 → ceil 10)
QUANTILES: tuple[tuple[str, int, int], ...] = (
    ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def group_quantiles(df: DataFrame, value_col: str, group_col: str,
                    order_col: str,
                    quantiles: tuple[tuple[str, int, int], ...] = QUANTILES,
                    ) -> DataFrame:
    """Exact discrete quantiles per group: the value at 1-based sorted rank
    ``ceil(q·count)`` (classic percentile_disc), rank arithmetic in exact
    integers (see QUANTILES). ``order_col`` breaks ties among equal values
    so the picked ROW is deterministic (the picked VALUE already is).

    Scale note: exact quantiles sort within each group (one shuffle + a
    per-group window). That is the right tool for gate-style determinism
    and for bounded-cardinality groups (languages, sources); for quantiles
    over ungrouped 100 TB columns use ``approx_percentile`` — documented
    trade, not a hidden one.

    Returns ``(group_col, q, {value_col})`` — one row per group × quantile.
    """
    w = Window.partitionBy(group_col).orderBy(value_col, order_col)
    ranked = (df
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("_cnt", F.count("*").over(
                  Window.partitionBy(group_col))))
    qs = F.explode(F.array(*[
        F.struct(F.lit(lbl).alias("q"),
                 F.lit(num).cast("long").alias("_num"),
                 F.lit(den).cast("long").alias("_den"))
        for lbl, num, den in quantiles])).alias("_q")
    return (ranked.select(group_col, value_col, "_rn", "_cnt", qs)
            .where(F.col("_rn") == F.expr(
                "(_cnt * _q._num + _q._den - 1) div _q._den"))
            .select(group_col, F.col("_q.q").alias("q"), value_col))


def sql_group_quantiles(rel: str, value_col: str, group_col: str,
                        order_col: str,
                        quantiles: tuple[tuple[str, int, int], ...] = QUANTILES,
                        ) -> str:
    """DuckDB oracle twin of :func:`group_quantiles`."""
    qrows = ", ".join(f"('{lbl}', {num}, {den})" for lbl, num, den in quantiles)
    return rf"""
WITH ranked AS (
  SELECT {group_col}, {value_col},
         ROW_NUMBER() OVER (PARTITION BY {group_col}
           ORDER BY {value_col}, {order_col}) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS cnt
  FROM {rel}),
qs(q, num, den) AS (VALUES {qrows})
SELECT {group_col}, q, {value_col}
FROM ranked CROSS JOIN qs
WHERE rn = (cnt * num + den - 1) // den
"""


# --- document fingerprinting ----------------------------------------------------

FNV_MOD = 2147483647  # 2^31 - 1


def fingerprint(text: Column) -> Column:
    """Order-sensitive polynomial rolling hash of the character stream,
    mod 2^31-1 — a deterministic content fingerprint computable identically
    in any engine (``list_reduce`` in DuckDB), unlike engine-native hash().
    """
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * 31 + F.coalesce(F.ascii(c), F.lit(0)), F.lit(FNV_MOD)),
    )


def document_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All metrics in one narrow projection."""
    t = F.col(text_col)
    feats = quality_features(t)
    return docs.select(
        "*",
        feats["n_tokens"].alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )
