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
