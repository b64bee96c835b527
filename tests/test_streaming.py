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


def test_stateful_sessionization(spark, tmp_path):
    """applyInPandasWithState sessionizer: a conversation's session is
    emitted once no turn arrives within the gap of EVENT time. Timeouts
    fire on the trigger AFTER the watermark passes them, so the input is
    staged as three files drained one per micro-batch (file source orders
    by modification time): conv-A's turns, then two watermark-advancing
    markers hours later."""
    import datetime as dt
    import time

    d_in = str(tmp_path / "in")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_file(rows):
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts timestamp") \
            .coalesce(1).write.mode("append").parquet(d_in)
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    write_file([("conv-A", i, "user", f"t{i}", None,
                 t0 + dt.timedelta(seconds=20 * i)) for i in range(3)])
    write_file([("conv-B", 0, "user", "later", None,
                 t0 + dt.timedelta(hours=3))])
    write_file([("conv-C", 0, "user", "latest", None,
                 t0 + dt.timedelta(hours=6))])

    sessions = ts.stream_conversation_sessions(
        ts.read_transcripts_stream(spark, d_in, max_files_per_trigger=1),
        gap_minutes=30, watermark="10 minutes")
    q = (sessions.writeStream.format("memory").queryName("sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = {r.conv_id: r for r in spark.sql("select * from sessions").collect()}
    # conv-A's gap timeout (t0+40s+30min) < watermark after file 2 → fires
    # during file 3's trigger; B and C are still open when input drains
    assert "conv-A" in rows and "conv-C" not in rows
    a = rows["conv-A"]
    assert a.n_turns == 3
    assert a.started == t0 and a.ended == t0 + dt.timedelta(seconds=40)
