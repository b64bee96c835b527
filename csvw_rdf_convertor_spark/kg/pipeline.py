"""End-to-end transcripts→KG pipeline: mapping → mentions → linking →
canonicalization → materialize, resumable from per-partition checkpoints.

The turn/conversation triples are produced by the SAME CSVW mapping engine
used for tables (plans/csvw2rdf.py) — the transcripts table is just another
CSVW-style table whose descriptor uses URI templates over (conv_id,
turn_idx) and virtual membership columns (SURVEY.md §7.1.4; FIXTURES.md F4).

Scale contract (north rule):
- partitioning: output + checkpoints keyed by ``bucket =
  pmod(xxhash64(conv_id), n_buckets)`` — conversations never straddle
  buckets, so a resumed run is exactly-once per conversation;
- row numbering is per-conv (turn_idx is data, not a global sort) — the
  whole mapping stage is narrow, no shuffle;
- hot-conversation skew: algebraic aggregations (linking support counts,
  CC min-labels) rely on map-side partial aggregation — the built-in
  two-stage combine that splits hot keys across input partitions (an
  explicit salt layer measured 4.5× slower, see linking.link_exact);
  joins lean on AQE skew-split; the LSH band joins use uniform hash keys;
- resumability: a manifest parquet records (bucket, counts, finished_at);
  rerun anti-joins completed buckets before any work happens, so a killed
  run resumes where it stopped with no duplicate triples;
- in production the sinks are partitioned Iceberg tables (snapshot commits
  give the same atomicity); in this sandbox they are partitioned parquet
  behind the same writer seam.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ntriples import to_ntriples_lines
from ..functions.terms import TRIPLE_COLS, skolem
from ..plans.csvw2rdf import table_to_triples
from ..spec import RDF, XSD, parse_descriptor
from . import cc, linking
from . import mentions as mentions_mod
from .synth import alias_dictionary

KG = "https://kg.example.org/ns#"

#: CSVW-style descriptor for the transcripts table — the "mapping program".
TRANSCRIPTS_DESCRIPTOR = {
    "url": "urn:transcripts",
    "tableSchema": {
        "aboutUrl": "urn:conv:{conv_id}#turn-{turn_idx}",
        "columns": [
            # suppressed physical column: template-visible, emits no triple
            {"name": "conv_id", "suppressOutput": True},
            {"name": "role", "propertyUrl": KG + "role"},
            {"name": "text", "propertyUrl": KG + "text", "datatype": "string"},
            {"name": "tool", "propertyUrl": KG + "tool", "null": [""]},
            {"name": "ts", "propertyUrl": KG + "ts",
             "datatype": {"base": "dateTime"}},
            {"name": "turn_idx", "propertyUrl": KG + "turnIndex",
             "datatype": "integer"},
            # virtual: turn —kg:inConversation→ conv node
            {"name": "in_conv", "virtual": True,
             "propertyUrl": KG + "inConversation", "valueUrl": "urn:conv:{conv_id}"},
            # virtual: conv typing (repeated per turn; the triples DF is a set)
            {"name": "conv_type", "virtual": True, "aboutUrl": "urn:conv:{conv_id}",
             "propertyUrl": "rdf:type", "valueUrl": KG + "Conversation"},
            {"name": "turn_type", "virtual": True,
             "propertyUrl": "rdf:type", "valueUrl": KG + "Turn"},
        ],
    },
}


def transcripts_table_spec():
    return parse_descriptor(TRANSCRIPTS_DESCRIPTOR).tables[0]


def turn_triples(transcripts: DataFrame,
                 passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Per-turn triples via the csvw2rdf engine. The cell pipeline consumes
    string lexicals: ts is pre-rendered ISO-8601 UTC (deterministic — the
    session TZ is pinned to UTC). ``passthrough`` columns (e.g. the
    partition bucket) ride through the mapping unchanged."""
    df = transcripts.select(
        *passthrough,
        F.col("conv_id"),
        F.col("turn_idx").cast("string").alias("turn_idx"),
        F.col("role"),
        F.col("text"),
        F.coalesce(F.col("tool"), F.lit("")).alias("tool"),
        F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")).alias("ts"),
    )
    # turn_idx is data-provided ordering — the mapping adds no shuffle
    return table_to_triples(df, transcripts_table_spec(), minimal=True,
                            passthrough=passthrough)


def _mention_triple_array(mention_col, entity_col, score4_col, turn_iri, m_node):
    """``score4_col`` is the ALREADY-rendered 4-decimal score string — the
    caller stages it (with the skolem and turn IRI) as a real column so the
    5-way fan-out references attributes (r6 staging, see mention_triples)."""
    def t(subj, pred, obj, kind, dtype=""):
        if isinstance(obj, str):
            obj = F.lit(obj)
        return F.struct(subj.alias("subj"), F.lit(pred).alias("pred"),
                        obj.alias("obj_lex"), F.lit(kind).alias("obj_kind"),
                        F.lit(dtype).alias("obj_dtype"), F.lit("").alias("obj_lang"),
                        F.lit("").alias("graph"))

    return F.array(
        t(turn_iri, KG + "mentions", m_node, "bnode"),
        t(m_node, RDF + "type", KG + "Mention", "iri"),
        t(m_node, KG + "surfaceForm", mention_col, "literal"),
        t(m_node, KG + "linkedTo", entity_col, "iri"),
        t(m_node, KG + "linkScore", score4_col, "literal", XSD + "double"),
    )


def mention_triples(linked: DataFrame, canon: DataFrame,
                    passthrough: list[str] = ()) -> DataFrame:
    """Triples for linked mentions with canonicalized entity ids.

    mention node = deterministic skolem of (conv, turn, match ordinal) (T9).
    ``canon`` (node → canonical, from connected components) is small →
    broadcast left join + coalesce. ``passthrough`` columns (e.g. the
    partition bucket) are carried through the explode.
    """
    # stage the multiply-referenced terms as REAL columns before the 5-way
    # triple fan-out: the mention skolem (sha2) and turn IRI are referenced
    # by every struct in the array, and inside the Generate's fused
    # expression each reference re-evaluates (r6: ~1.3× on this stage;
    # same staging rule as plans/csvw2rdf.py stage 3). CollapseProject
    # keeps the projection: the producers are non-cheap and multi-referenced.
    resolved = (linked.join(F.broadcast(canon),
                            linked.entity_id == canon.node, "left")
                .select(*passthrough, "mention", "link_score",
                        F.concat(F.lit("urn:conv:"), F.col("conv_id"),
                                 F.lit("#turn-"),
                                 F.col("turn_idx").cast("string")).alias("_turn_iri"),
                        skolem("mention", F.col("conv_id"), F.col("turn_idx"),
                               F.col("match_i")).alias("_m_node"),
                        F.coalesce("canonical", "entity_id").alias("entity_final"),
                        F.format_number(F.col("link_score"), 4).alias("_score4")))
    arr = _mention_triple_array(F.col("mention"), F.col("entity_final"),
                                F.col("_score4"), F.col("_turn_iri"),
                                F.col("_m_node"))
    cols = [F.col(c) for c in passthrough] + [F.explode(arr).alias("t")]
    return resolved.select(*cols).select(*passthrough, "t.*")


@dataclass
class RunMetrics:
    buckets_done: int
    buckets_skipped: int
    turns: int
    mentions: int
    links: int
    triples: int
    wall_s: float


def run(transcripts: DataFrame, out_dir: str, *,
        dictionary: list[tuple[str, str, list[str]]] | None = None,
        n_buckets: int = 8, resume: bool = True,
        write_nt: bool = False) -> RunMetrics:
    """Materialize the KG for every bucket not yet in the manifest.

    Layout under ``out_dir``:
      triples/   parquet partitioned by bucket (prod: Iceberg table)
      ntriples/  optional N-Triples text
      manifest/  parquet (bucket, n_turns, n_mentions, n_links, n_triples,
                 finished_at) — per-partition checkpoint + lineage + metrics
    """
    t0 = time.time()
    spark = transcripts.sparkSession
    dictionary = dictionary or alias_dictionary()
    bucket = F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")

    done: set[int] = set()
    manifest_path = f"{out_dir}/manifest"
    if resume:
        try:
            done = {r.bucket for r in
                    spark.read.parquet(manifest_path).select("bucket").collect()}
        except Exception:
            done = set()

    # Repartition the SMALL transcript rows by bucket BEFORE the mapping
    # fans them out into ~10× more triple rows: the narrow mapping preserves
    # partitioning, so the write needs no triples-wide shuffle at all — the
    # engine's single biggest memory-bandwidth term at high core counts
    # (round-2 scaling fix). One file per bucket per side still holds
    # (each task owns exactly one bucket).
    todo = transcripts.withColumn("bucket", bucket)
    if done:
        todo = todo.where(~F.col("bucket").isin(*done))
    todo = todo.repartition(n_buckets, "bucket").cache()

    # -- stage 1: CSVW-style mapping (narrow) + mention detection (narrow) ---
    turns = turn_triples(todo, passthrough=("bucket",))
    # persist: detection (pandas) and linking feed both the triple write and
    # the metrics aggregation — without this each action re-runs them
    ments = mentions_mod.detect_mentions(todo, dictionary).persist()
    aliases = linking.alias_table(spark, dictionary)
    linked = linking.link(ments, aliases).withColumn("bucket", bucket).persist()
    edges = cc.link_graph_edges(linked, aliases)
    labels = cc.connected_components(edges)
    canon = cc.canonical_mapping(labels.where(~F.col("node").startswith("sf:")))
    m_triples = mention_triples(linked, canon, passthrough=["bucket"])

    # mention triples are orders of magnitude fewer than turn triples —
    # repartitioning ONLY them keeps the bucket-partitioned write while
    # shuffling mention-scale bytes instead of corpus-scale triples
    all_triples = (turns.select("bucket", *TRIPLE_COLS)
                   .unionByName(m_triples.select("bucket", *TRIPLE_COLS)
                                .repartition(n_buckets, "bucket")))
    # dynamic partition overwrite = idempotent per-bucket commit (the parquet
    # stand-in for an Iceberg partition-overwrite snapshot): a re-run of a
    # bucket replaces its files instead of appending duplicates
    (all_triples.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("bucket").parquet(f"{out_dir}/triples"))
    if write_nt:
        # same dynamic partition overwrite as the parquet sink — a resumed/
        # retried run REPLACES a bucket's NT files instead of appending
        # duplicates (exactly-once per bucket holds for both sinks)
        (to_ntriples_lines(all_triples, keep=["bucket"])
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket").text(f"{out_dir}/ntriples"))

    # -- stage 3: manifest (checkpoint + lineage + metrics) -------------------
    # ONE aggregation job for turn/mention/link counts (tagged union instead
    # of three groupBys + joins), plus a zero-column scan of the sink for the
    # committed triple counts (parquet footers only).
    tagged = (todo.select("bucket", F.lit("turn").alias("kind"))
              .unionByName(ments.withColumn("bucket", bucket)
                           .select("bucket", F.lit("mention").alias("kind")))
              .unionByName(linked.select("bucket", F.lit("link").alias("kind"))))
    counts = (tagged.groupBy("bucket").agg(
        F.sum(F.when(F.col("kind") == "turn", 1).otherwise(0)).alias("n_turns"),
        F.sum(F.when(F.col("kind") == "mention", 1).otherwise(0)).alias("n_mentions"),
        F.sum(F.when(F.col("kind") == "link", 1).otherwise(0)).alias("n_links")))
    triple_counts = (spark.read.parquet(f"{out_dir}/triples")
                     .where(~F.col("bucket").isin(*done) if done else F.lit(True))
                     .groupBy("bucket").agg(F.count("*").alias("n_triples")))
    manifest = (counts.join(triple_counts, "bucket", "left").na.fill(0)
                .withColumn("finished_at", F.current_timestamp()))
    manifest.write.mode("append").parquet(manifest_path)
    todo.unpersist()
    ments.unpersist()
    linked.unpersist()

    rows = spark.read.parquet(manifest_path).collect()
    new_rows = [r for r in rows if r.bucket not in done]
    return RunMetrics(
        buckets_done=len(new_rows),
        buckets_skipped=len(done),
        turns=sum(r.n_turns for r in new_rows),
        mentions=sum(r.n_mentions for r in new_rows),
        links=sum(r.n_links for r in new_rows),
        triples=sum(r.n_triples for r in new_rows),
        wall_s=time.time() - t0,
    )
