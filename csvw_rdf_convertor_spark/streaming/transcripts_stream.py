"""Structured Streaming variant of the transcripts→triples mapping.

The reference is pull-stream but not event-time streaming (SURVEY.md §2.9):
its only stream state is the sliding quad window, which full-relation joins
subsume in batch. The engine is batch-first per the north rule; this module
is the streaming entry for continuous ingestion — the SAME mapping plan
(plans/csvw2rdf.py is narrow: projections + explode, fully streaming-
compatible) bound to ``readStream``/``writeStream``:

- ``stream_turn_triples``  file/Kafka source → triples sink (append mode,
  no state, exactly the batch plan);
- ``stream_mention_counts`` event-time windowed aggregation with a
  watermark for late turns — the canonical stateful operator shape
  (watermark bounds state; late data beyond it is dropped deterministically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.csvw2rdf import table_to_triples
from ..kg.pipeline import transcripts_table_spec

TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
                     "tool string, ts timestamp")


def read_transcripts_stream(spark: SparkSession, path: str,
                            max_files_per_trigger: int = 16) -> DataFrame:
    return (spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def stream_turn_triples(transcripts: DataFrame) -> DataFrame:
    """Streaming triples: stateless narrow mapping — identical semantics to
    the batch plan (per-turn text equality invariant holds per micro-batch).
    """
    df = transcripts.select(
        F.col("conv_id"),
        F.col("turn_idx").cast("string").alias("turn_idx"),
        F.col("role"), F.col("text"),
        F.coalesce(F.col("tool"), F.lit("")).alias("tool"),
        F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")).alias("ts"),
    )
    return table_to_triples(df, transcripts_table_spec(), minimal=True)


def stream_mention_counts(transcripts: DataFrame, aliases: list[str], *,
                          window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Windowed mention counts with late-data handling: turns arriving more
    than ``watermark`` after the max seen event time are dropped; everything
    else updates its window's state exactly once (append output mode)."""
    pattern = "(?i)\\b(" + "|".join(aliases) + ")\\b"
    mentions = (transcripts
                .withWatermark("ts", watermark)
                .select(F.col("ts"),
                        F.explode(F.regexp_extract_all(
                            "text", F.lit(pattern), 1)).alias("mention")))
    return (mentions
            .groupBy(F.window("ts", window).alias("w"),
                     F.lower(F.col("mention")).alias("mention_norm"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "mention_norm", "n"))


SESSION_SCHEMA = ("conv_id string, n_turns bigint, started timestamp, "
                  "ended timestamp")
_SESSION_STATE_SCHEMA = "n_turns bigint, started timestamp, ended timestamp"


def stream_conversation_sessions(transcripts: DataFrame, *,
                                 gap_minutes: int = 30,
                                 watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): conversation
    sessionization. Per ``conv_id`` the state holds (n_turns, started,
    ended); a session is emitted when no turn arrives for ``gap_minutes``
    of EVENT time (event-time timeout — the watermark both bounds state and
    drives timeout firing, so late turns beyond it can't reopen a session).

    This is the reference-lacking operator class the engine adds for
    continuous transcript ingestion: the batch engine has no notion of
    'conversation ended'; the stream decides it deterministically from
    event time. State per key is O(1) — three scalars — so executor state
    store size is bounded by live conversations, not turns."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000

    def sessionize(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, started, ended = state.get
            state.remove()
            yield pd.DataFrame({"conv_id": [key[0]], "n_turns": [n],
                                "started": [started], "ended": [ended]})
            return
        n_new, lo, hi = 0, None, None
        for pdf in pdfs:
            if pdf.empty:
                continue
            n_new += len(pdf)
            mn, mx = pdf["ts"].min(), pdf["ts"].max()
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        if n_new == 0:
            return
        if state.exists:
            n, started, ended = state.get
            lo = min(lo, started)
            hi = max(hi, ended)
            n_new += n
        state.update((n_new, lo, hi))
        state.setTimeoutTimestamp(int(pd.Timestamp(hi).timestamp() * 1000) + gap_ms)
        return

    return (transcripts
            .withWatermark("ts", watermark)
            .groupBy("conv_id")
            .applyInPandasWithState(
                sessionize, SESSION_SCHEMA, _SESSION_STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))


def run_to_parquet(triples_stream: DataFrame, out_dir: str, checkpoint: str,
                   once: bool = True):
    """Sink: partitioned parquet with a streaming checkpoint (exactly-once
    file sink). ``availableNow`` drains all pending input then stops."""
    w = (triples_stream.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint)
         .outputMode("append"))
    if once:
        w = w.trigger(availableNow=True)
    return w.start()
