"""Deterministic synthetic transcript corpus (FIXTURES.md F4).

Generated *distributed* — ``spark.range`` + hash-based pseudo-randomness, no
driver-side loops, no ``Date.now``-style nondeterminism — so the same
(n_convs, seed) yields byte-identical data at any parallelism. Conversation
lengths are Zipf-ish to exercise the hot-``conv_id`` skew path the north rule
calls out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: (entity_id, canonical_name, aliases...) — the broadcast alias dictionary.
#: Deterministic synthetic entities; a handful of deliberately ambiguous
#: aliases ("mercury") exercise candidate scoring.
def alias_dictionary(n_entities: int = 40) -> list[tuple[str, str, list[str]]]:
    base = [
        ("planet", ["Mercury", "Venus", "Jupiter", "Saturn", "Neptune"]),
        ("metal", ["mercury", "iron", "copper", "silver", "titanium"]),
        ("city", ["Paris", "Berlin", "Prague", "Vienna", "Lisbon"]),
        ("tool", ["spark", "hammer", "wrench", "compiler", "profiler"]),
    ]
    out: list[tuple[str, str, list[str]]] = []
    for i in range(n_entities):
        kind, names = base[i % len(base)]
        name = names[(i // len(base)) % len(names)]
        canonical = f"{kind}/{name.lower()}-{i}"
        aliases = [name, name.upper(), f"{name} {i}", f"the {name.lower()}"]
        out.append((f"ent:{canonical}", name, aliases))
    return out


def _u(seed: int, *cols) -> F.Column:
    """Uniform [0,1) from a hash — deterministic, partition-independent."""
    return (F.pmod(F.hash(F.lit(seed), *cols), F.lit(1_000_000)).cast("double")
            / 1_000_000.0)


def synth_transcripts(spark: SparkSession, n_convs: int = 200, seed: int = 42,
                      max_len: int = 400, skew: float = 1.2) -> DataFrame:
    """Transcripts DF with schema per ``input_hint``: (conv_id, turn_idx,
    role, text, tool, ts). conv lengths ~ Zipf(skew) capped at max_len."""
    aliases = [a for _, _, al in alias_dictionary() for a in al]
    alias_arr = F.array(*[F.lit(a) for a in aliases])

    convs = spark.range(n_convs).withColumnRenamed("id", "cid")
    # Zipf-ish: conv 0 gets max_len, tail gets short conversations
    length = F.greatest(
        F.lit(2),
        F.least(F.lit(max_len),
                (F.lit(float(max_len)) / F.pow(F.col("cid") + 1, F.lit(skew))).cast("int") + 2),
    )
    turns = (
        convs.withColumn("n_turns", length)
        .withColumn("turn_idx", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)))
    )
    u_role = _u(seed, F.col("cid"), F.col("turn_idx"), F.lit(1))
    u_m1 = F.pmod(F.hash(F.lit(seed), F.col("cid"), F.col("turn_idx"), F.lit(2)),
                  F.lit(len(aliases))) + 1
    u_m2 = F.pmod(F.hash(F.lit(seed), F.col("cid"), F.col("turn_idx"), F.lit(3)),
                  F.lit(len(aliases))) + 1
    role = (
        F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .when(u_role < 0.2, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )
    mention1 = F.element_at(alias_arr, u_m1)
    mention2 = F.element_at(alias_arr, u_m2)
    text = F.concat(
        F.lit("turn "), F.col("turn_idx").cast("string"),
        F.lit(" discusses "), mention1,
        F.when(_u(seed, F.col("cid"), F.col("turn_idx"), F.lit(4)) < 0.5,
               F.concat(F.lit(" and "), mention2)).otherwise(F.lit("")),
        F.lit(" in conversation."),
    )
    return turns.select(
        F.concat(F.lit("conv-"), F.col("cid").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool",
               F.concat(F.lit("tool-"), (u_m1 % 5).cast("string"))).alias("tool"),
        (F.timestamp_seconds(F.lit(1700000000) + F.col("cid") * 86400
                             + F.col("turn_idx") * 60)).alias("ts"),
    )
