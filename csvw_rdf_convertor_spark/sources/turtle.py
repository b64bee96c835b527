"""Turtle-equivalent serialization: prefix-compacted flat triples.

The reference's pretty-Turtle writer buffers quads and looks up prefixes
(optionally via the prefix.cc web service — loaders/serialize.ts:39-96,
loaders/prefix-lookup.ts:17-100). A buffered pretty-printer is inherently
driver-side; the distributed equivalent is *prefixed flat Turtle*: each
triple on its own line with prefixed names from a broadcast prefix map —
valid Turtle, stays a pure projection.

Prefix candidates (A7) come from a distributed distinct over IRI namespaces
(split at '#' or the last '/'), merged with the RDFa defaults on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..spec import PREFIXES, XSD
from .. functions.ntriples import escape_literal

_NS_RE = r"^(.*[#/])([A-Za-z_][\w.-]*)$"


def namespace_candidates(triples: DataFrame, min_count: int = 2) -> DataFrame:
    """A7: distinct IRI namespaces with usage counts (prefix-lookup.ts:79-100)."""
    iris = (triples.select(F.col("pred").alias("iri"))
            .unionAll(triples.where(F.col("obj_kind") == "iri")
                      .select(F.col("obj_lex").alias("iri")))
            .unionAll(triples.where(~F.col("subj").startswith("_:"))
                      .select(F.col("subj").alias("iri"))))
    ns = iris.select(F.regexp_extract("iri", _NS_RE, 1).alias("ns"))
    return (ns.where(F.col("ns") != "").groupBy("ns")
            .agg(F.count("*").alias("n_uses"))
            .where(F.col("n_uses") >= min_count))


def build_prefix_map(triples: DataFrame, max_prefixes: int = 64) -> dict[str, str]:
    """prefix → namespace map: well-known RDFa prefixes + generated ``ns<i>``
    for frequent namespaces (driver-side tiny result)."""
    known = {v: k for k, v in PREFIXES.items()}
    rows = (namespace_candidates(triples).orderBy(F.desc("n_uses"))
            .limit(max_prefixes).collect())
    out: dict[str, str] = {}
    i = 0
    for r in rows:
        if r.ns in known:
            out[known[r.ns]] = r.ns
        else:
            out[f"ns{i}"] = r.ns
            i += 1
    return out


def _compact_term(iri: Column, prefix_map: dict[str, str]) -> Column:
    """IRI → prefixed name when a prefix matches and the local part is a
    valid PN_LOCAL (conservative: word chars only); else <iri>."""
    out = F.concat(F.lit("<"), iri, F.lit(">"))
    for pfx, ns in sorted(prefix_map.items(), key=lambda kv: -len(kv[1])):
        local = F.substring(iri, len(ns) + 1, 2048)
        ok = iri.startswith(ns) & local.rlike(r"^[A-Za-z_][\w.-]*$")
        out = F.when(ok, F.concat(F.lit(pfx + ":"), local)).otherwise(out)
    return out


def to_turtle_lines(triples: DataFrame,
                    prefix_map: dict[str, str] | None = None) -> tuple[list[str], DataFrame]:
    """Returns (@prefix header lines, DF of one Turtle statement per line)."""
    pm = prefix_map if prefix_map is not None else build_prefix_map(triples)
    header = [f"@prefix {p}: <{ns}> ." for p, ns in sorted(pm.items())]

    s = F.when(F.col("subj").startswith("_:"), F.col("subj")) \
         .otherwise(_compact_term(F.col("subj"), pm))
    p = F.when(F.col("pred") == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
               F.lit("a")).otherwise(_compact_term(F.col("pred"), pm))
    lit_body = F.concat(F.lit('"'), escape_literal(F.col("obj_lex")), F.lit('"'))
    o = (
        F.when(F.col("obj_kind") == "iri", _compact_term(F.col("obj_lex"), pm))
        .when(F.col("obj_kind") == "bnode", F.col("obj_lex"))
        .when(F.col("obj_lang") != "", F.concat(lit_body, F.lit("@"), F.col("obj_lang")))
        .when((F.col("obj_dtype") != "") & (F.col("obj_dtype") != XSD + "string"),
              F.concat(lit_body, F.lit("^^"), _compact_term(F.col("obj_dtype"), pm)))
        .otherwise(lit_body)
    )
    lines = triples.select(F.concat_ws(" ", s, p, o, F.lit(".")).alias("line"))
    return header, lines


def write_turtle(triples: DataFrame, path: str,
                 prefix_map: dict[str, str] | None = None) -> None:
    """Header as part-00000-like prefix file + distributed statement lines.
    (A single .ttl file would force coalesce(1); keep it distributed and let
    consumers cat header + parts — same contract as any Spark text sink.)"""
    header, lines = to_turtle_lines(triples, prefix_map)
    spark = triples.sparkSession
    spark.createDataFrame([(h,) for h in header], "line string") \
        .coalesce(1).write.mode("overwrite").text(f"{path}/_prefixes")
    lines.write.mode("overwrite").text(f"{path}/statements")
