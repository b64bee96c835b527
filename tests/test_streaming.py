"""Structured Streaming coverage (§2.9): the batch mapping bound to
readStream/writeStream, and a watermarked windowed aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.kg.synth import alias_dictionary, synth_transcripts
from csvw_rdf_convertor_spark.streaming import transcripts_stream as ts


@pytest.fixture(scope="module")
def transcripts_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    synth_transcripts(spark, n_convs=20, max_len=30).write.mode("overwrite").parquet(d)
    return d


def test_stream_turn_triples_matches_batch(spark, transcripts_dir, tmp_path):
    stream = ts.read_transcripts_stream(spark, transcripts_dir,
                                        max_files_per_trigger=2)
    triples = ts.stream_turn_triples(stream)
    assert triples.isStreaming
    out = str(tmp_path / "out")
    q = ts.run_to_parquet(triples, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    batch = ts.stream_turn_triples(spark.read.parquet(transcripts_dir))
    got = spark.read.parquet(out)
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0


def test_stream_restart_is_exactly_once(spark, transcripts_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = ts.read_transcripts_stream(spark, transcripts_dir)
    q = ts.run_to_parquet(ts.stream_turn_triples(stream), out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # restart with the same checkpoint: no new input → no duplicates
    q2 = ts.run_to_parquet(ts.stream_turn_triples(
        ts.read_transcripts_stream(spark, transcripts_dir)), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_windowed_mention_counts_with_watermark(spark, transcripts_dir, tmp_path):
    aliases = [a for _, _, al in alias_dictionary() for a in al]
    stream = ts.read_transcripts_stream(spark, transcripts_dir)
    agg = ts.stream_mention_counts(stream, aliases, window="1 hour",
                                   watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("mention_counts")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from mention_counts").collect()
    # append mode emits only windows older than the watermark; the synthetic
    # corpus spans days, so most windows close
    assert len(rows) > 0
    assert all(r.n >= 1 and r.window_start < r.window_end for r in rows)
