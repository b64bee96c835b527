"""Corpus snapshot diff — the incremental-crawl delta.

Re-crawls and dataset refreshes need "what changed since the last
snapshot" before any expensive reprocessing: only ADDED/CHANGED documents
re-enter the pipeline, REMOVED ones are tombstoned downstream. One full
outer join on the (uniform) document id, content compared by digest:

    status ∈ {added, removed, changed, unchanged}

Scale: a single equi-join shuffle on the id; both sides reduced to
(id, digest) before the exchange so the join payload is 2 small columns,
not document bodies. Beyond-reference op; gate ``snapshot_diff`` replays
it 1:1 in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, *,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """``(id_col, status)`` for every id present in either snapshot."""
    o = old.select(F.col(id_col), F.md5(F.col(text_col)).alias("_ho"))
    n = new.select(F.col(id_col), F.md5(F.col(text_col)).alias("_hn"))
    joined = o.join(n, id_col, "full_outer")
    status = (F.when(F.col("_ho").isNull(), "added")
              .when(F.col("_hn").isNull(), "removed")
              .when(F.col("_ho") != F.col("_hn"), "changed")
              .otherwise("unchanged"))
    return joined.select(id_col, status.alias("status"))


def sql_snapshot_diff(old_rel: str, new_rel: str, *,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """DuckDB oracle twin of :func:`snapshot_diff`."""
    return rf"""
WITH o AS (SELECT {id_col}, md5({text_col}) AS ho FROM {old_rel}),
n AS (SELECT {id_col}, md5({text_col}) AS hn FROM {new_rel})
SELECT COALESCE(o.{id_col}, n.{id_col}) AS {id_col},
       CASE WHEN o.ho IS NULL THEN 'added'
            WHEN n.hn IS NULL THEN 'removed'
            WHEN o.ho <> n.hn THEN 'changed'
            ELSE 'unchanged' END AS status
FROM o FULL OUTER JOIN n ON o.{id_col} = n.{id_col}
"""
