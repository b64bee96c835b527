"""Deterministic sampling and split assignment for training-data pipelines.

At 100 TB a sample/split decision must be

- a pure narrow column expression — no shuffle, no RNG state, no seed
  coordination across 1000 executors (``F.rand()`` is per-task-attempt:
  a retried task resamples different rows, which silently corrupts a
  train/test split);
- stable under retries, resume, repartitioning and engine migration —
  the decision is a function of the ROW, not of the execution; and
- auditable: any engine must be able to replay "why is doc 42 in val?".

All three fall out of hashing a stable row id with a salt and comparing
against integer thresholds computed in exact arithmetic:

    u = hash60(salt \\x01 id)            uniform in [0, 2^60)
    split_i  ⇔  T_{i-1} <= u < T_i      T_i = round(cum_weight_i · 2^60)

Thresholds are exact Python ints (no float accumulates on the data path),
so splits are disjoint and exhaustive by construction. Hash families follow
the repo-wide rule (functions/phash.py): ``xxhash64`` for production hot
paths, ``md5`` for oracle-gated queries (DuckDB can replay the md5 digest
bit-for-bit; the ``sql_*`` twins below build that replay so the Spark
expression and its oracle cannot drift).

Reference parity note: the reference converter has no sampling surface —
this module is part of the "beyond the reference" training-data operator
set (docs/PARITY.md "Beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.phash import FAMILIES, HEX60, hex_to_long

#: the hash domain: u ∈ [0, 2^60) in both families (md5: 15 hex chars;
#: xxhash64: masked to the low 60 bits)
U60 = 1 << 60
_MASK60 = U60 - 1
#: joins salt and id inside the hash input; cannot occur in either part
_SEP = "\x01"


def sample_u60(id_col: Column, salt: str, family: str = "xxhash64") -> Column:
    """Uniform bigint in ``[0, 2^60)`` derived from (salt, id).

    The id column is rendered to its canonical string so both engines hash
    identical bytes (bigint → decimal digits renders the same everywhere).
    """
    if family not in FAMILIES:
        raise ValueError(f"unknown hash family {family!r}; use one of {FAMILIES}")
    key = F.concat_ws(_SEP, F.lit(salt), id_col.cast("string"))
    if family == "md5":
        return hex_to_long(F.substring(F.md5(key), 1, HEX60))
    return F.xxhash64(key).bitwiseAND(F.lit(_MASK60))


def split_thresholds(splits: tuple[tuple[str, float], ...]) -> list[tuple[str, int]]:
    """Exact integer upper thresholds for cumulative split weights.

    Weights must sum to 1 (±1e-9). The LAST split's threshold is pinned to
    2^60 exactly so the partition is exhaustive no matter how the float
    weights round."""
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w <= 0 for _, w in splits):
        raise ValueError("split weights must be positive")
    names = [n for n, _ in splits]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names in {names}")
    out: list[tuple[str, int]] = []
    cum = 0.0
    for i, (name, w) in enumerate(splits):
        cum += w
        t = U60 if i == len(splits) - 1 else int(round(cum * U60))
        out.append((name, t))
    return out


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.98), ("val", 0.01), ("test", 0.01)),
    salt: str = "split",
    family: str = "xxhash64",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split, deterministically.

    Narrow map — zero Exchange; the assignment survives repartitioning,
    task retries, resume, and re-runs on different cluster sizes."""
    u = sample_u60(F.col(id_col), salt, family)
    expr: Column | None = None
    ths = split_thresholds(splits)
    # chain from the last bucket down so each WHEN only needs its upper bound
    for name, t in reversed(ths):
        lit = F.lit(name)
        expr = lit if expr is None else F.when(u < F.lit(t), lit).otherwise(expr)
    assert expr is not None
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "strat",
    family: str = "xxhash64",
) -> DataFrame:
    """Keep each row with a per-stratum probability, deterministically.

    The standard corpus-rebalancing move (downsample the dominant language
    / source while keeping the tail): row kept iff
    ``u60(salt, id) < rate[stratum] · 2^60``. Pure narrow filter — the
    stratum column rides along in the row, so there is no join and no
    shuffle regardless of stratum skew. ``rates`` here is a literal map
    compiled into the plan (fine up to thousands of strata — it is one
    CASE chain); for a stratum table that itself must be data-driven,
    broadcast-join the rates frame on ``stratum_col`` first and compare
    against its threshold column — same filter, one broadcast, still no
    Exchange on the corpus side."""
    for k, r in list(rates.items()) + [("<default>", default_rate)]:
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {r}")
    u = sample_u60(F.col(id_col), salt, family)
    th: Column = F.lit(int(round(default_rate * U60)))
    for k, r in sorted(rates.items()):
        th = F.when(F.col(stratum_col) == k, F.lit(int(round(r * U60)))).otherwise(th)
    return df.where(u < th)


def mixture_rates(df: DataFrame, stratum_col: str,
                  target_ppm: dict[str, int] | None = None) -> DataFrame:
    """Per-stratum DOWNSAMPLING rates that move the corpus toward a target
    mixture — the arithmetic behind every "rebalance the language/source
    mix" step, as one algebraic aggregation.

    ``target_ppm`` maps stratum → desired share in parts-per-million
    (defaults to uniform across observed strata; must sum to ≤ 1e6).
    Downsampling-only semantics (no upsampling): the stratum whose
    count/target ratio is SMALLEST is the binding one and keeps rate 1.0;
    every other stratum is cut to match it:

        keep_i  =  target_i · min_j(count_j / target_j)
        rate_i  =  keep_i / count_i          (exact integer ppm)

    All arithmetic is integer and EXACT: the binding stratum is the argmin
    of the fraction count/target found by cross-multiplied comparison
    (``n_y·t_x < n_x·t_y`` — no pre-divided ratio, whose floor would lose
    the binding stratum's own rate-1.0 exactness; products stay ≤
    n·10⁶ < 2^63 up to 10¹² rows). ``n_keep = t_i·n_b div t_b`` is ≤ n_i
    by the argmin property and equals n_b exactly on the binding stratum.
    Returns ``(stratum_col, n_rows, rate_ppm, n_keep)`` — feed
    ``rate_ppm/1e6`` into :func:`stratified_sample`.

    Scale: one algebraic count shuffle; everything after is strata-sized
    (the argmin anti-join and the broadcast are over the aggregate, never
    the corpus).
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n_rows"))
    if target_ppm is None:
        # uniform target: one strata-sized Spark ACTION at plan-BUILD time
        # (ADVICE r5: callers should know this API is eager, and any oracle
        # replaying the uniform default hardcodes the observed stratum
        # count — the gate's SQL pins n_strata_uniform=5 for documents.lang,
        # which this count reproduces at every scale factor of the
        # deterministic testdata generator)
        n_strata = counts.select(F.count("*")).first()[0]
        if n_strata == 0:
            raise ValueError("empty input: no strata observed")
        tgt = F.lit(1_000_000 // n_strata).cast("long")
    else:
        if sum(target_ppm.values()) > 1_000_000:
            raise ValueError("target_ppm shares sum past 1e6")
        tgt = F.lit(None).cast("long")
        for k, v in sorted(target_ppm.items()):
            tgt = F.when(F.col(stratum_col) == k, F.lit(int(v))).otherwise(tgt)
    with_t = (counts.withColumn("_tgt", tgt)
              .where(F.col("_tgt").isNotNull() & (F.col("_tgt") > 0)))
    # binding stratum = exact argmin of n/t (cross-multiplied; ties to the
    # lexicographically smallest stratum) via one strata-sized anti-join
    x = with_t.select(F.col(stratum_col).alias("_s"),
                      F.col("n_rows").alias("_n"), F.col("_tgt").alias("_t"))
    y = x.select(F.col("_s").alias("_s2"), F.col("_n").alias("_n2"),
                 F.col("_t").alias("_t2"))
    better = (F.col("_n2") * F.col("_t") < F.col("_n") * F.col("_t2")) | \
             ((F.col("_n2") * F.col("_t") == F.col("_n") * F.col("_t2"))
              & (F.col("_s2") < F.col("_s")))
    binding = (x.join(y, better, "left_anti")
               .select(F.col("_n").alias("_nb"), F.col("_t").alias("_tb")))
    return (with_t.crossJoin(F.broadcast(binding))
            .withColumn("n_keep", F.expr("least(n_rows, _tgt * _nb div _tb)"))
            .withColumn("rate_ppm", F.expr("n_keep * 1000000 div n_rows"))
            .select(stratum_col, "n_rows", "rate_ppm", "n_keep"))


def sql_mixture_rates(rel: str, stratum_col: str, *,
                      n_strata_uniform: int) -> str:
    """DuckDB oracle twin (uniform-target form)."""
    tgt = 1_000_000 // n_strata_uniform
    return rf"""
WITH c AS (SELECT {stratum_col} AS s, COUNT(*) AS n, {tgt} AS t FROM {rel}
           GROUP BY {stratum_col}),
b AS (SELECT x.n AS nb, x.t AS tb FROM c x
      WHERE NOT EXISTS (SELECT 1 FROM c y
        WHERE (y.n * x.t < x.n * y.t)
           OR (y.n * x.t = x.n * y.t AND y.s < x.s)))
SELECT s AS {stratum_col}, n AS n_rows,
       least(n, t * nb // tb) * 1000000 // n AS rate_ppm,
       least(n, t * nb // tb) AS n_keep
FROM c CROSS JOIN b
"""


def bottom_k_sample(df: DataFrame, k: int, salt: str, *,
                    id_col: str = "doc_id",
                    family: str = "xxhash64") -> DataFrame:
    """Deterministic FIXED-SIZE sample: the ``k`` rows whose salted 60-bit
    hash is smallest (ties by id). Unlike rate-based ``hash_split`` this
    pins the sample SIZE exactly; unlike ``df.sample`` it is a pure
    function of (salt, ids) — stable under retries, resume and
    repartitioning, and DuckDB-replayable in the md5 family.

    Scale: ``orderBy(u).limit(k)`` compiles to TakeOrderedAndProject —
    per-partition top-k heaps merged on the driver, k rows of driver
    memory, NO full sort shuffle. Growing the corpus only rotates members
    in/out via the hash order (bottom-k sets are mergeable across shards).
    """
    if k <= 0:
        raise ValueError(f"need k > 0, got {k}")
    u = sample_u60(F.col(id_col), salt, family)
    return (df.withColumn("_u", u)
            .orderBy("_u", id_col).limit(k)
            .drop("_u"))


# --- DuckDB twins (oracle SQL fragments; md5 family only) --------------------

def sql_u60(id_expr: str, salt: str) -> str:
    """DuckDB replay of ``sample_u60(..., family='md5')``."""
    key = f"concat_ws(chr(1), '{salt}', CAST({id_expr} AS VARCHAR))"
    return f"('0x' || substr(md5({key}), 1, {HEX60}))::BIGINT"


def sql_split_case(id_expr: str, salt: str,
                   splits: tuple[tuple[str, float], ...]) -> str:
    """DuckDB CASE expression matching ``hash_split`` assignment."""
    u = sql_u60(id_expr, salt)
    ths = split_thresholds(splits)
    parts = [f"WHEN {u} < {t} THEN '{name}'" for name, t in ths[:-1]]
    return "CASE " + " ".join(parts) + f" ELSE '{ths[-1][0]}' END"


def sql_stratified_where(id_expr: str, stratum_expr: str, salt: str,
                         rates: dict[str, float], default_rate: float) -> str:
    """DuckDB WHERE predicate matching ``stratified_sample``."""
    u = sql_u60(id_expr, salt)
    whens = " ".join(
        f"WHEN {stratum_expr} = '{k}' THEN {int(round(r * U60))}"
        for k, r in sorted(rates.items()))
    th = f"CASE {whens} ELSE {int(round(default_rate * U60))} END"
    return f"{u} < {th}"
