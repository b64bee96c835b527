"""As-of join — for each left row, attach the most recent right row with
``right.time <= left.time`` (inclusive) per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do), and the naive formulation
(range join + per-left top-1) explodes: every left row matches its entire
right history before the window prunes it. The scalable composition used
here is the **union + running-last** pattern:

    1. tag right rows, project their payload into one struct column;
    2. union with the left rows (payload = null);
    3. one window per key ordered by (time, right-before-left at ties,
       deterministic right tiebreak): ``last(payload, ignorenulls=True)``
       over ``rowsBetween(unboundedPreceding, currentRow)``;
    4. keep the left rows; explode the matched struct.

Cost at 100 TB: exactly ONE shuffle of (left ∪ right) keyed by the join key
— the same lower bound as a plain equi-join — and a per-partition sort. No
range-explosion, no skew beyond what the key distribution already has
(salt-able the usual way if one key is hot). Compare: a backward-looking
range join materializes O(matches) intermediate rows; this materializes
O(left + right).

Semantics match DuckDB's ``ASOF LEFT JOIN`` (greatest right.time <=
left.time); when several right rows share that time, the one with the
greatest ``tiebreak`` payload field wins (DuckDB leaves this unspecified —
callers who need oracle-stable output should dedupe or rely on unique
(key, time) pairs, as the gate query's events table has).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_is_right"
_PAY = "__asof_payload"


def asof_join(left: DataFrame, right: DataFrame, *, on: Sequence[str] | str,
              left_time: str, right_time: str,
              right_cols: Sequence[str], prefix: str = "asof_",
              strict: bool = False) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``right_cols`` of the most
    recent ``right`` row at or before (``strict`` ⇒ strictly before) the
    left row's time, per ``on`` key; nulls when no prior right row exists.

    Output columns: all of ``left``'s, then ``{prefix}{time}`` and
    ``{prefix}{c}`` for each payload column.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(
        F.col(right_time).alias("t"),
        *[F.col(c).alias(c) for c in right_cols])
    # NULL-time right rows would sort FIRST under the ascending window
    # (nulls-first) and become the baseline match for every left row of
    # their key; DuckDB ASOF JOIN (the semantic target and the oracle)
    # never matches NULL times — drop them before the union. NULL-time
    # left rows keep DuckDB's behavior too: no right row satisfies
    # t <= NULL, and since they sort first and rights are filtered,
    # their running-last is null.
    r = right.where(F.col(right_time).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__asof_t"),
        payload.alias(_PAY),
        F.lit(1).alias(_TAG))
    l = left.select(
        "*",
        F.col(left_time).alias("__asof_t"),
        F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
        F.lit(0).alias(_TAG))
    u = l.unionByName(r, allowMissingColumns=True)

    # rights sort before lefts at equal time for inclusive semantics, after
    # for strict; among equal-time rights the struct itself (time, then
    # payload fields in order) is the deterministic tiebreak
    tag_order = F.col(_TAG).desc() if not strict else F.col(_TAG).asc()
    w = (Window.partitionBy(*keys)
         .orderBy(F.col("__asof_t").asc(), tag_order, F.col(_PAY).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("__m", F.last(_PAY, ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__m")["t"].alias(f"{prefix}{right_time}"))
    out_cols += [F.col("__m")[c].alias(f"{prefix}{c}") for c in right_cols]
    return matched.where(F.col(_TAG) == 0).select(*out_cols)
