"""Streaming exact dedup (streaming/dedup_stream.py): duplicates within the
watermark horizon are dropped across micro-batches; state is keyed by
content digest, not doc id."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.streaming import dedup_stream as ds


def _write(spark, d_in, rows):
    (spark.createDataFrame(rows, ds.DOCUMENT_SCHEMA)
     .coalesce(1).write.mode("append").parquet(d_in))


def test_stream_dedup_within_watermark(spark, tmp_path):
    d_in = str(tmp_path / "in")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    # batch 1: two distinct docs + an in-batch duplicate of doc 1
    _write(spark, d_in, [
        (1, "alpha beta", t0),
        (2, "gamma delta", t0 + dt.timedelta(minutes=1)),
        (3, "alpha beta", t0 + dt.timedelta(minutes=2)),
    ])
    # batch 2 (separate file → separate micro-batch): a cross-batch
    # duplicate of doc 2 within the horizon, plus one genuinely new doc
    _write(spark, d_in, [
        (4, "gamma delta", t0 + dt.timedelta(minutes=10)),
        (5, "epsilon zeta", t0 + dt.timedelta(minutes=11)),
    ])

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = ds.read_documents_stream(spark, d_in, max_files_per_trigger=1)
    q = ds.run_to_parquet(
        ds.stream_dedup_exact(stream, watermark="1 hour"), out, ckpt)
    q.awaitTermination(120)

    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    # doc 3 (in-batch dup) and doc 4 (cross-batch dup) are dropped
    assert got == {1, 2, 5}

    # restart on the same checkpoint with no new input: exactly-once holds
    q2 = ds.run_to_parquet(
        ds.stream_dedup_exact(
            ds.read_documents_stream(spark, d_in, max_files_per_trigger=1),
            watermark="1 hour"), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 3


def test_stream_dedup_key_is_content_not_id(spark, tmp_path):
    d_in = str(tmp_path / "in")
    t0 = dt.datetime(2024, 6, 1)
    # same doc_id, different content → BOTH survive
    _write(spark, d_in, [(7, "first version", t0),
                         (7, "second version", t0 + dt.timedelta(minutes=1))])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = ds.run_to_parquet(
        ds.stream_dedup_exact(ds.read_documents_stream(spark, d_in)),
        out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2
