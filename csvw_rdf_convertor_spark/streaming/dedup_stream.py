"""Streaming exact dedup for continuous corpus ingestion (§2.9 widening).

Batch dedup (ops/dedup.py) assumes the corpus is at rest; a crawl/firehose
needs duplicates dropped AS DOCUMENTS ARRIVE with bounded state. This is
Structured Streaming's ``dropDuplicatesWithinWatermark``: the dedup key is
the content digest, state holds one entry per distinct digest seen within
the watermark horizon, and entries older than the watermark are evicted —
so state size is bounded by the distinct-content arrival rate × horizon,
never by corpus size (the property that keeps this viable on an unbounded
100 TB/day feed; an unwatermarked ``dropDuplicates`` would grow state
forever).

Semantics: a duplicate arriving within ``watermark`` of the first sighting
is dropped; one arriving later than the horizon is re-emitted (the standard
trade: exactness inside the horizon, bounded memory outside). Exact batch
dedup over the merged output remains available downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENT_SCHEMA = "doc_id long, text string, ts timestamp"


def read_documents_stream(spark: SparkSession, path: str,
                          max_files_per_trigger: int = 16) -> DataFrame:
    return (spark.readStream.schema(DOCUMENT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def stream_dedup_exact(docs: DataFrame, *, text_col: str = "text",
                       ts_col: str = "ts",
                       watermark: str = "1 hour") -> DataFrame:
    """First sighting of each content digest within the watermark horizon
    passes; later copies are dropped. Digest = md5 of the raw text (same
    key as ops/dedup.exact_duplicates, so batch and stream agree on what
    'duplicate' means)."""
    return (docs
            .withColumn("content_md5", F.md5(F.col(text_col)))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_md5"]))


def run_to_parquet(deduped: DataFrame, out_dir: str, checkpoint: str):
    """Drain whatever is available exactly once into parquet (availableNow:
    terminates when caught up; the checkpoint makes restarts idempotent)."""
    return (deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
