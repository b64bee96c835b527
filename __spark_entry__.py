"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the transcripts→KG pipeline (CSVW-style mapping
+ mention detection) over transcripts derived from the sf0.001 events table.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data operators; EVERY query has a DuckDB
oracle (including skolemized blank nodes reproduced via sha256, MinHash/
SimHash/hyperplane-LSH signatures via the engine-portable md5-derived
hashing in ``functions/phash.py``, the pandas-UDF mention extraction via
the identical RE2-compatible regex, and connected components via a
recursive-CTE min-label fixpoint).

Column-name discipline: every computed column is aliased identically in the
Spark plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.kg import linking, pipeline
from csvw_rdf_convertor_spark.kg import mentions as mentions_mod
from csvw_rdf_convertor_spark.kg.synth import alias_dictionary
from csvw_rdf_convertor_spark.ops import asof, dedup, similarity, text as text_ops
from csvw_rdf_convertor_spark.ops import chunk as chunk_ops
from csvw_rdf_convertor_spark.ops import decontam
from csvw_rdf_convertor_spark.ops import kmeans as kmeans_ops
from csvw_rdf_convertor_spark.ops import winnow as winnow_ops
from csvw_rdf_convertor_spark.ops import sample as sample_ops
from csvw_rdf_convertor_spark.ops import sketch as sketch_ops
from csvw_rdf_convertor_spark.plans.csvw2rdf import table_to_triples
from csvw_rdf_convertor_spark.plans import rdf2csvw
from csvw_rdf_convertor_spark.spec import (DatatypeSpec, parse_descriptor,
                                           with_order)

XSD = "http://www.w3.org/2001/XMLSchema#"
CSVW = "http://www.w3.org/ns/csvw#"
RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
KG = pipeline.KG

TRIPLE_OUT = ["subj", "pred", "obj_lex", "obj_kind", "obj_dtype", "obj_lang"]


def _tune(spark: SparkSession) -> SparkSession:
    """Runtime-settable confs the engine wants regardless of who built the
    session: small codegen methods (the wide cell pipeline otherwise exceeds
    janino's 64 KB limit and falls back to interpreted, ~3× slower) and a
    pinned UTC session TZ for timestamp-lexical determinism."""
    spark.conf.set("spark.sql.codegen.methodSplitThreshold", "256")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def _p(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _tune(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# transcripts derived deterministically from events (shared Spark + SQL)
# --------------------------------------------------------------------------

def _transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _p(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    role = (F.when(F.col("event_type") == "click", F.lit("user"))
            .when(F.col("event_type") == "view", F.lit("assistant"))
            .otherwise(F.lit("tool")))
    return ev.select(
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(F.lit("event "), F.col("event_type"), F.lit(" value "),
                 F.col("value").cast("decimal(18,2)").cast("string")).alias("text"),
        F.when(role == "tool", F.col("event_type")).alias("tool"),
        F.col("ts"),
    )


_TRANSCRIPTS_CTE = """
transcripts AS (
  SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         CASE WHEN event_type = 'click' THEN 'user'
              WHEN event_type = 'view' THEN 'assistant'
              ELSE 'tool' END AS role,
         'event ' || event_type || ' value ' ||
             CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS text,
         CASE WHEN event_type NOT IN ('click','view') THEN event_type END AS tool,
         ts
  FROM events)
"""

#: SQL fragment reproducing functions/terms.skolem(...) for the oracle
def _sk_sql(*parts: str) -> str:
    joined = " || chr(1) || ".join(parts)
    return f"'_:sk' || substr(sha256({joined}), 1, 32)"


# --------------------------------------------------------------------------
# CSVW → RDF queries
# --------------------------------------------------------------------------

def q_csvw2rdf_minimal_nation(spark, sf_dir):
    """T1–T5 + P5(int): minimal-mode mapping of the nation table."""
    desc = {
        "url": "urn:nation",
        "tableSchema": {
            "aboutUrl": "#nation-{n_nationkey}",
            "columns": [
                {"name": "n_nationkey", "datatype": "integer"},
                {"name": "n_name", "datatype": "string"},
                {"name": "n_regionkey", "datatype": "integer"},
            ],
        },
    }
    table = with_order(parse_descriptor(desc).tables[0], "n_nationkey")
    return table_to_triples(_p(spark, sf_dir, "nation"), table).select(*TRIPLE_OUT)


SQL_MINIMAL_NATION = f"""
WITH n AS (SELECT CAST(n_nationkey AS VARCHAR) AS k,
                  n_name AS nm, CAST(n_regionkey AS VARCHAR) AS rk FROM nation)
SELECT 'urn:nation#nation-' || k AS subj, 'urn:nation#n_nationkey' AS pred,
       k AS obj_lex, 'literal' AS obj_kind, '{XSD}integer' AS obj_dtype, '' AS obj_lang FROM n
UNION ALL
SELECT 'urn:nation#nation-' || k, 'urn:nation#n_name', nm, 'literal', '', '' FROM n
UNION ALL
SELECT 'urn:nation#nation-' || k, 'urn:nation#n_regionkey', rk, 'literal',
       '{XSD}integer', '' FROM n
"""


def q_csvw2rdf_normalized_descriptor(spark, sf_dir):
    """S3: the same nation mapping, but the descriptor arrives in messy
    JSON-LD surface form — full-IRI and csvw:-prefixed keys, @value
    wrappers, singleton arrays — and is funnelled through
    descriptor_norm.normalize_descriptor (the reference's jsonld
    expand→compact round-trip, descriptor.ts:28-104) before compilation.
    Oracle = the canonical compact mapping's SQL: proves normalization is
    semantics-preserving end-to-end in the gated path."""
    from csvw_rdf_convertor_spark.descriptor_norm import normalize_descriptor
    from csvw_rdf_convertor_spark.spec import CSVW

    desc = {
        "@context": "http://www.w3.org/ns/csvw",
        CSVW + "url": {"@value": "urn:nation"},
        "csvw:tableSchema": {
            "csvw:aboutUrl": "#nation-{n_nationkey}",
            CSVW + "column": [
                {"csvw:name": ["n_nationkey"],
                 "csvw:datatype": {"@value": "integer"}},
                {CSVW + "name": "n_name", "csvw:datatype": "string"},
                {"csvw:name": "n_regionkey", CSVW + "datatype": "integer"},
            ],
        },
    }
    table = with_order(parse_descriptor(normalize_descriptor(desc)).tables[0],
                       "n_nationkey")
    return table_to_triples(_p(spark, sf_dir, "nation"), table).select(*TRIPLE_OUT)


def q_csvw2rdf_datetime_orders(spark, sf_dir):
    """P6: dateTime parsing + ISO canonicalization of order dates."""
    desc = {
        "url": "urn:orders",
        "tableSchema": {
            "aboutUrl": "#order-{o_orderkey}",
            "columns": [
                {"name": "o_orderkey", "suppressOutput": True},
                {"name": "o_orderdate", "datatype": "datetime",
                 "propertyUrl": "urn:orders#placed"},
            ],
        },
    }
    df = _p(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"))
    table = with_order(parse_descriptor(desc).tables[0], "o_orderkey")
    return table_to_triples(df, table).select(*TRIPLE_OUT)


SQL_DATETIME_ORDERS = f"""
SELECT 'urn:orders#order-' || CAST(o_orderkey AS VARCHAR) AS subj,
       'urn:orders#placed' AS pred,
       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS obj_lex,
       'literal' AS obj_kind, '{XSD}dateTime' AS obj_dtype, '' AS obj_lang
FROM orders
"""


def q_csvw2rdf_standard_region(spark, sf_dir):
    """T7/T2/T9/W1: standard-mode scaffolding with skolemized row nodes,
    including rowTitles → csvw:title (convertor.ts:650-667)."""
    desc = {
        "url": "urn:region",
        "tableSchema": {
            "aboutUrl": "#r-{r_regionkey}",
            "rowTitles": ["r_name"],
            "columns": [
                {"name": "r_regionkey", "datatype": "integer"},
                {"name": "r_name", "datatype": "string"},
            ],
        },
    }
    table = with_order(parse_descriptor(desc).tables[0], "r_regionkey")
    return table_to_triples(_p(spark, sf_dir, "region"), table,
                            minimal=False).select(*TRIPLE_OUT)


_SK_TABLE = _sk_sql("'urn:region'", "'table'")
_SK_ROW = _sk_sql("'urn:region'", "'row'", "CAST(rn AS VARCHAR)")
SQL_STANDARD_REGION = f"""
WITH r AS (SELECT CAST(r_regionkey AS VARCHAR) AS k, r_name AS nm,
                  row_number() OVER (ORDER BY r_regionkey) AS rn FROM region)
SELECT 'urn:region#r-' || k AS subj, 'urn:region#r_regionkey' AS pred,
       k AS obj_lex, 'literal' AS obj_kind, '{XSD}integer' AS obj_dtype, '' AS obj_lang FROM r
UNION ALL SELECT 'urn:region#r-' || k, 'urn:region#r_name', nm, 'literal', '', '' FROM r
UNION ALL SELECT {_SK_TABLE}, '{CSVW}row', {_SK_ROW}, 'bnode', '', '' FROM r
UNION ALL SELECT {_SK_ROW}, '{RDFNS}type', '{CSVW}Row', 'iri', '', '' FROM r
UNION ALL SELECT {_SK_ROW}, '{CSVW}rownum', CAST(rn AS VARCHAR), 'literal',
       '{XSD}integer', '' FROM r
UNION ALL SELECT {_SK_ROW}, '{CSVW}url', 'urn:region#row=' || CAST(rn + 1 AS VARCHAR),
       'iri', '', '' FROM r
UNION ALL SELECT {_SK_ROW}, '{CSVW}describes', 'urn:region#r-' || k, 'iri', '', '' FROM r
UNION ALL SELECT {_SK_ROW}, '{CSVW}title', nm, 'literal', '', '' FROM r
UNION ALL SELECT {_SK_TABLE}, '{RDFNS}type', '{CSVW}Table', 'iri', '', ''
UNION ALL SELECT {_SK_TABLE}, '{CSVW}url', 'urn:region', 'iri', '', ''
UNION ALL SELECT '_:skgroup', '{RDFNS}type', '{CSVW}TableGroup', 'iri', '', ''
UNION ALL SELECT '_:skgroup', '{CSVW}table', {_SK_TABLE}, 'bnode', '', ''
"""


def q_csvw2rdf_list_split(spark, sf_dir):
    """P4/T5: separator cell fan-out (p_type words → one triple per token)."""
    desc = {
        "url": "urn:part",
        "tableSchema": {
            "aboutUrl": "#part-{p_partkey}",
            "columns": [
                {"name": "p_partkey", "suppressOutput": True},
                {"name": "p_type", "separator": " ", "datatype": "token",
                 "propertyUrl": "urn:part#typeWord"},
            ],
        },
    }
    df = _p(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("p_partkey"), "p_type")
    table = with_order(parse_descriptor(desc).tables[0], "p_partkey")
    return table_to_triples(df, table).select(*TRIPLE_OUT)


SQL_LIST_SPLIT = f"""
SELECT 'urn:part#part-' || CAST(p_partkey AS VARCHAR) AS subj,
       'urn:part#typeWord' AS pred, u.w AS obj_lex,
       'literal' AS obj_kind, '{XSD}token' AS obj_dtype, '' AS obj_lang
FROM part, UNNEST(string_split(p_type, ' ')) AS u(w)
"""


def q_csvw2rdf_rdf_list(spark, sf_dir):
    """T6: ordered separator cell → rdf:first/rest chain of skolem nodes."""
    desc = {
        "url": "urn:part",
        "tableSchema": {
            "aboutUrl": "#part-{p_partkey}",
            "columns": [
                {"name": "p_partkey", "suppressOutput": True},
                {"name": "p_type", "separator": " ", "ordered": True,
                 "datatype": "token", "propertyUrl": "urn:part#typeList"},
            ],
        },
    }
    df = _p(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("p_partkey"), "p_type",
        F.col("p_partkey").alias("ord"))  # numeric ordering for skolem rows
    table = with_order(parse_descriptor(desc).tables[0], "ord")
    return table_to_triples(df, table).select(*TRIPLE_OUT)


_SK_NODE = _sk_sql("'urn:part'", "'list'", "'p_type'",
                   "CAST(rn AS VARCHAR)", "CAST(i AS VARCHAR)")
_SK_NODE_NEXT = _sk_sql("'urn:part'", "'list'", "'p_type'",
                        "CAST(rn AS VARCHAR)", "CAST(i + 1 AS VARCHAR)")
_SK_NODE0 = _sk_sql("'urn:part'", "'list'", "'p_type'",
                    "CAST(rn AS VARCHAR)", "'0'")
SQL_RDF_LIST = f"""
WITH p AS (SELECT CAST(p_partkey AS VARCHAR) AS k,
                  string_split(p_type, ' ') AS l,
                  row_number() OVER (ORDER BY CAST(p_partkey AS BIGINT)) AS rn
           FROM part),
items AS (SELECT k, rn, l, unnest(range(len(l))) AS i, unnest(l) AS w FROM p)
SELECT 'urn:part#part-' || k AS subj, 'urn:part#typeList' AS pred,
       {_SK_NODE0} AS obj_lex, 'bnode' AS obj_kind, '' AS obj_dtype, '' AS obj_lang
FROM p WHERE len(l) > 0
UNION ALL
SELECT {_SK_NODE}, '{RDFNS}first', w, 'literal', '{XSD}token', '' FROM items
UNION ALL
SELECT {_SK_NODE}, '{RDFNS}rest',
       CASE WHEN i = len(l) - 1 THEN '{RDFNS}nil' ELSE {_SK_NODE_NEXT} END,
       CASE WHEN i = len(l) - 1 THEN 'iri' ELSE 'bnode' END, '', '' FROM items
"""


def q_rdf_list_linearize(spark, sf_dir):
    """Inverse of T6 (beyond the reference — its rdf2csvw TODOs rdf lists):
    pointer-doubling linearization of rdf:first/rest chains back to ordered
    cells (plans/rdf2csvw.linearize_rdf_lists)."""
    from csvw_rdf_convertor_spark.plans.rdf2csvw import linearize_rdf_lists
    triples = q_csvw2rdf_rdf_list(spark, sf_dir)
    items = linearize_rdf_lists(triples)
    return (items.groupBy("head").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "obj_lex"))),
                lambda s: s.obj_lex), " ").alias("cell"),
        F.count("*").cast("bigint").alias("n_items"))
        .select(F.col("head").alias("list_head"), "cell", "n_items"))


SQL_RDF_LIST_LINEARIZE = f"""
WITH p AS (SELECT string_split(p_type, ' ') AS l,
                  row_number() OVER (ORDER BY CAST(p_partkey AS BIGINT)) AS rn
           FROM part)
SELECT {_SK_NODE0} AS list_head, array_to_string(l, ' ') AS cell,
       CAST(len(l) AS BIGINT) AS n_items
FROM p WHERE len(l) > 0
"""


def q_cell_bool_null_default(spark, sf_dir):
    """P2/P3/P7: boolean format 'Y|N', nulls suppressing triples, defaults."""
    desc = {
        "url": "urn:events",
        "tableSchema": {
            "aboutUrl": "#e-{event_id}",
            "columns": [
                {"name": "event_id", "suppressOutput": True},
                {"name": "is_click", "datatype": {"base": "boolean", "format": "Y|N"},
                 "null": ["?"], "propertyUrl": "urn:events#isClick"},
            ],
        },
    }
    df = _p(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("event_id"),
        F.when(F.col("event_type") == "click", F.lit("Y"))
         .when(F.col("event_type") == "error", F.lit("?"))  # → null, no triple
         .otherwise(F.lit("N")).alias("is_click"))
    table = with_order(parse_descriptor(desc).tables[0], "event_id")
    return table_to_triples(df, table).select(*TRIPLE_OUT)


SQL_CELL_BOOL = f"""
SELECT 'urn:events#e-' || CAST(event_id AS VARCHAR) AS subj,
       'urn:events#isClick' AS pred,
       CASE WHEN event_type = 'click' THEN 'true' ELSE 'false' END AS obj_lex,
       'literal' AS obj_kind, '{XSD}boolean' AS obj_dtype, '' AS obj_lang
FROM events WHERE event_type <> 'error'
"""


def q_uri_template_encoding(spark, sf_dir):
    """T1: percent-encoding in simple expansion ({c_name} has '#' and
    spaces), plus the RFC 6570 prefix modifier ({c_mktsegment:4} truncates
    before encoding) and explode modifier ({c_name*} — identical to simple
    for string-valued row-record vars) through a virtual column's valueUrl
    (ref convertor.ts:1225-1232 uses full parseTemplate().expand)."""
    desc = {
        "url": "urn:cust",
        "tableSchema": {
            "aboutUrl": "#cust-{c_name}",
            "columns": [
                {"name": "c_name", "suppressOutput": True},
                {"name": "c_mktsegment", "propertyUrl": "urn:cust#segment"},
                {"name": "seg_link", "virtual": True,
                 "propertyUrl": "urn:cust#segShort",
                 "valueUrl": "urn:seg:{c_mktsegment:4}/{c_name*}"},
            ],
        },
    }
    df = _p(spark, sf_dir, "customer").select("c_name", "c_mktsegment")
    table = with_order(parse_descriptor(desc).tables[0], "c_name")
    return table_to_triples(df, table).select("subj", "pred", "obj_lex")


SQL_URI_ENCODING = """
WITH enc AS (
  SELECT replace(replace(c_name, '#', '%23'), ' ', '%20') AS name_enc,
         c_mktsegment FROM customer)
SELECT 'urn:cust#cust-' || name_enc AS subj,
       'urn:cust#segment' AS pred, c_mktsegment AS obj_lex
FROM enc
UNION ALL
SELECT 'urn:cust#cust-' || name_enc,
       'urn:cust#segShort',
       'urn:seg:' || substr(c_mktsegment, 1, 4) || '/' || name_enc
FROM enc
"""


def _nation_quads(spark, sf_dir):
    """Nation triples with a named-graph column (parity of the nationkey
    splits them across two graphs) — shared input of the writer gates."""
    tri = q_csvw2rdf_minimal_nation(spark, sf_dir)
    k = F.regexp_extract("subj", r"nation-(\d+)$", 1).cast("int")
    return tri.withColumn(
        "graph", F.concat(F.lit("urn:g"), (k % 2).cast("string")))


def q_trig_roundtrip(spark, sf_dir):
    """S5 writers under the hash gate: nation quads → pretty TriG document
    (driver-side, fixture-scale by design — loaders/serialize.ts:44-60) →
    reparse with the TriG parser → triples DF. Oracle = the mapping SQL
    with the same graph assignment: proves writer+parser are a lossless
    pair on named graphs, typed literals and prefix compaction."""
    import os
    import tempfile

    from csvw_rdf_convertor_spark.sources.turtle import to_pretty_trig
    from csvw_rdf_convertor_spark.sources.turtle_parse import read_turtle

    doc = to_pretty_trig(_nation_quads(spark, sf_dir))
    path = os.path.join(tempfile.mkdtemp(prefix="trig_rt_"), "doc.trig")
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
    return read_turtle(spark, path).select(*TRIPLE_OUT, "graph")


def q_jsonld_write_roundtrip(spark, sf_dir):
    """S5 writers under the hash gate, JSON-LD direction: the same nation
    quads → compacted JSON-LD document (loaders/serialize.ts:62-66) →
    reparse with the JSON-LD reader → triples DF."""
    import os
    import tempfile

    from csvw_rdf_convertor_spark.sources.jsonld import read_jsonld
    from csvw_rdf_convertor_spark.sources.jsonld_write import to_jsonld

    doc = to_jsonld(_nation_quads(spark, sf_dir))
    path = os.path.join(tempfile.mkdtemp(prefix="jsonld_rt_"), "doc.jsonld")
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
    return read_jsonld(spark, path).select(*TRIPLE_OUT, "graph")


def q_rdfxml_write_roundtrip(spark, sf_dir):
    """S5 writers under the hash gate, RDF/XML direction — BEYOND the
    reference (its N3 route writes Turtle for 'rdfxml',
    rdf-serialization.ts:1-8): nation triples (default graph — RDF/XML has
    no named graphs, the writer refuses them) → real RDF/XML document →
    reparse with sources/rdfxml.py → triples DF."""
    import os
    import tempfile

    from csvw_rdf_convertor_spark.sources.rdfxml import read_rdfxml
    from csvw_rdf_convertor_spark.sources.rdfxml_write import to_rdfxml

    tri = q_csvw2rdf_minimal_nation(spark, sf_dir) \
        .withColumn("graph", F.lit(""))
    doc = to_rdfxml(tri)
    path = os.path.join(tempfile.mkdtemp(prefix="rdfxml_rt_"), "doc.rdf")
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
    return read_rdfxml(spark, path).select(*TRIPLE_OUT, "graph")


SQL_RDFXML_ROUNDTRIP = f"""
WITH t AS ({SQL_MINIMAL_NATION})
SELECT subj, pred, obj_lex, obj_kind, obj_dtype, obj_lang, '' AS graph
FROM t
"""


SQL_WRITER_ROUNDTRIP = f"""
WITH t AS ({SQL_MINIMAL_NATION})
SELECT subj, pred, obj_lex, obj_kind, obj_dtype, obj_lang,
       'urn:g' || CAST(CAST(regexp_extract(subj, 'nation-(\\d+)$', 1) AS INT)
                       % 2 AS VARCHAR) AS graph
FROM t
"""


def q_kg_turn_triples(spark, sf_dir):
    """North-rule mapping stage: transcripts (derived from events) →
    per-turn triples via the CSVW engine (URI templates, virtual membership
    column, datatype coercion)."""
    tr = _transcripts_from_events(spark, sf_dir)
    return pipeline.turn_triples(tr).select(*TRIPLE_OUT)


SQL_KG_TURNS = f"""
WITH {_TRANSCRIPTS_CTE},
t AS (SELECT 'urn:conv:' || conv_id || '#turn-' || CAST(turn_idx AS VARCHAR) AS turn,
             'urn:conv:' || conv_id AS conv, * FROM transcripts)
SELECT turn AS subj, '{KG}role' AS pred, role AS obj_lex,
       'literal' AS obj_kind, '' AS obj_dtype, '' AS obj_lang FROM t
UNION ALL SELECT turn, '{KG}text', text, 'literal', '', '' FROM t
UNION ALL SELECT turn, '{KG}tool', tool, 'literal', '', '' FROM t WHERE tool IS NOT NULL
UNION ALL SELECT turn, '{KG}ts', strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z',
       'literal', '{XSD}dateTime', '' FROM t
UNION ALL SELECT turn, '{KG}turnIndex', CAST(turn_idx AS VARCHAR), 'literal',
       '{XSD}integer', '' FROM t
UNION ALL SELECT turn, '{KG}inConversation', conv, 'iri', '', '' FROM t
UNION ALL SELECT conv, '{RDFNS}type', '{KG}Conversation', 'iri', '', '' FROM t
UNION ALL SELECT turn, '{RDFNS}type', '{KG}Turn', 'iri', '', '' FROM t
"""


# --------------------------------------------------------------------------
# joins / aggregations / windows / set ops (SURVEY.md §2.4–2.7)
# --------------------------------------------------------------------------

def q_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the canonical agg benchmark (decimal-exact sums)."""
    li = _p(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
                 F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
                 F.sum(d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d("l_discount")))
                  .cast("double").alias("sum_disc_price"),
                 F.count("*").alias("count_order")))


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_q3_top_orders(spark, sf_dir):
    """J1 + A: 3-way join, grouped revenue, deterministic top-10."""
    cust = _p(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _p(spark, sf_dir, "orders")
    li = _p(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    rev = (li.join(orders, li.l_orderkey == orders.o_orderkey)
           .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
           .groupBy("o_orderkey", "o_orderpriority")
           .agg(F.sum(d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d("l_discount")))
                .cast("double").alias("revenue")))
    return rev.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)


SQL_Q3 = """
SELECT o_orderkey, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


def q_j2_left_join_optional(spark, sf_dir):
    """J2: OPTIONAL semantics — customers left-joined to their order counts."""
    cust = _p(spark, sf_dir, "customer")
    orders = _p(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return (cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_customers"),
                 F.sum(F.when(F.col("n_orders").isNull(), 1).otherwise(0))
                  .cast("long").alias("n_without_orders")))


SQL_J2 = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN n_orders IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders
FROM customer LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def q_j3_distinct_seed(spark, sf_dir):
    """J3: all-optional guard — DISTINCT subject seed, then left joins."""
    orders = _p(spark, sf_dir, "orders")
    seed = orders.select("o_custkey").distinct()
    urgent = (orders.where(F.col("o_orderpriority") == "1-URGENT")
              .groupBy("o_custkey").agg(F.count("*").alias("n_urgent")))
    big = (orders.where(F.col("o_totalprice") > 100000)
           .groupBy("o_custkey").agg(F.count("*").alias("n_big")))
    return (seed.join(urgent, "o_custkey", "left").join(big, "o_custkey", "left")
            .select("o_custkey",
                    F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
                    F.coalesce("n_big", F.lit(0)).alias("n_big")))


SQL_J3 = """
SELECT s.o_custkey,
       COALESCE(u.n_urgent, 0) AS n_urgent, COALESCE(b.n_big, 0) AS n_big
FROM (SELECT DISTINCT o_custkey FROM orders) s
LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
           WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) u
  ON s.o_custkey = u.o_custkey
LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_big FROM orders
           WHERE o_totalprice > 100000 GROUP BY o_custkey) b
  ON s.o_custkey = b.o_custkey
"""


def q_j5_fk_anti_join(spark, sf_dir):
    """J5: row-level FK violation check via left_anti (customers w/o orders)."""
    cust = _p(spark, sf_dir, "customer")
    orders = _p(spark, sf_dir, "orders")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .groupBy("c_mktsegment").agg(F.count("*").alias("n_orphans")))


SQL_J5 = """
SELECT c_mktsegment, COUNT(*) AS n_orphans
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
"""


def q_a1_type_grouping(spark, sf_dir):
    """A1: one group per 'type' — rdf:type analogue over order priorities."""
    tr = q_csvw2rdf_minimal_nation(spark, sf_dir)  # reuse triples DF
    return rdf2csvw.subjects_by_type(
        tr.withColumn("graph", F.lit(""))
    ).groupBy("type_iri").agg(F.count("*").alias("n_subjects"))


SQL_A1 = """
-- nation triples contain no rdf:type → every subject lands in unknown_type
SELECT 'unknown_type' AS type_iri, COUNT(DISTINCT n_nationkey) AS n_subjects FROM nation
"""


def q_a2_multivalue(spark, sf_dir):
    """A2: multi-valued predicate detection (>1 value per subject)."""
    orders = _p(spark, sf_dir, "orders")
    return (orders.groupBy("o_custkey").agg(F.count("*").alias("n"))
            .groupBy().agg(
                F.max("n").alias("max_per_subject"),
                F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("long")
                 .alias("n_multivalued")))


SQL_A2 = """
SELECT MAX(n) AS max_per_subject,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multivalued
FROM (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey)
"""


def q_a3_collect_set_merge(spark, sf_dir):
    """A3: per-group observed-value sets (datatype-merge input shape)."""
    orders = _p(spark, sf_dir, "orders")
    return (orders.groupBy("o_orderstatus")
            .agg(F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",")
                 .alias("priorities")))


SQL_A3 = """
SELECT o_orderstatus,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities
FROM orders GROUP BY o_orderstatus
"""


def q_a4_minmax_lcp(spark, sf_dir):
    """A4: min/max per group (LCP-of-set = LCP(min,max) trick)."""
    part = _p(spark, sf_dir, "part")
    return (part.groupBy("p_brand")
            .agg(F.min("p_name").alias("lo"), F.max("p_name").alias("hi")))


SQL_A4 = "SELECT p_brand, MIN(p_name) AS lo, MAX(p_name) AS hi FROM part GROUP BY p_brand"


def q_a7_prefix_extract(spark, sf_dir):
    """A7: distinct namespace-prefix extraction (regexp on first token)."""
    part = _p(spark, sf_dir, "part")
    return (part.select(F.regexp_extract("p_type", r"^(\w+)", 1).alias("prefix"))
            .distinct())


SQL_A7 = "SELECT DISTINCT regexp_extract(p_type, '^(\\w+)', 1) AS prefix FROM part"


def q_w1_rownum_per_group(spark, sf_dir):
    """W1: per-partition row numbering — top-3 orders per customer."""
    orders = _p(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                                F.asc("o_orderkey"))
    return (orders.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "rn"))


SQL_W1 = """
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) WHERE rn <= 3
"""


def q_w2_event_deltas(spark, sf_dir):
    """W: lag window — mean seconds between consecutive events per type."""
    ev = _p(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ-safe (UTC session)
    delta = us - F.lag(us).over(w)
    return (ev.withColumn("delta_us", delta)
            .where(F.col("delta_us").isNotNull())
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("delta_us") / (F.count("*") * F.lit(1000000.0)), 4)
                  .alias("mean_delta_s")))


SQL_W2 = """
SELECT event_type, COUNT(*) AS n,
       ROUND(SUM(delta_us) / (COUNT(*) * 1000000.0), 4) AS mean_delta_s
FROM (SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id) AS delta_us
      FROM events)
WHERE delta_us IS NOT NULL GROUP BY event_type
"""


def q_u1_union_distinct(spark, sf_dir):
    """U1–U3: union + distinct (the graph-union shape)."""
    c = _p(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _p(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


SQL_U1 = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL SELECT s_nationkey FROM supplier) ORDER BY nationkey
"""


# --------------------------------------------------------------------------
# text analysis / dedup / similarity
# --------------------------------------------------------------------------

def q_text_token_counts(spark, sf_dir):
    docs = _p(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text_ops.token_count(F.col("text")).alias("n_tokens"),
        text_ops.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"))


SQL_TOKEN_COUNTS = rf"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens
FROM documents
"""


def q_text_quality(spark, sf_dir):
    docs = _p(spark, sf_dir, "documents")
    f = text_ops.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        F.round(f["punct_ratio"], 6).alias("punct_ratio"),
        F.round(f["stopword_ratio"], 6).alias("stopword_ratio"))


SQL_TEXT_QUALITY = rf"""
SELECT doc_id, length(text) AS n_chars,
       ROUND((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
             / GREATEST(length(text), 1)::DOUBLE, 6) AS punct_ratio,
       ROUND(len(regexp_extract_all(text,
                 '(?i)\b(the|of|and|to|in|a|is|that|for|it)\b'))::DOUBLE
             / GREATEST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END, 1), 6)
           AS stopword_ratio
FROM documents
"""


def q_text_lang_id(spark, sf_dir):
    docs = _p(spark, sf_dir, "documents")
    return (docs.select(text_ops.lang_id(F.col("text")).alias("lang_pred"))
            .groupBy("lang_pred").agg(F.count("*").alias("n_docs")))


_LANG_VALUES = ", ".join(
    "('%s', '(?i)\\b(%s)\\b')" % (lang, "|".join(words))
    for lang, words in sorted(text_ops.LANG_MARKERS.items()))
SQL_LANG_ID = f"""
WITH m(lang, rx) AS (VALUES {_LANG_VALUES}),
hits AS (SELECT d.doc_id, m.lang, len(regexp_extract_all(d.text, m.rx)) AS h
         FROM documents d CROSS JOIN m),
best AS (SELECT doc_id, lang, h,
                row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang ASC) rk
         FROM hits)
SELECT CASE WHEN h <= 0 THEN 'und' ELSE lang END AS lang_pred,
       COUNT(*) AS n_docs
FROM best WHERE rk = 1 GROUP BY 1
"""


def q_text_fingerprint(spark, sf_dir):
    docs = _p(spark, sf_dir, "documents")
    return docs.select("doc_id",
                       text_ops.fingerprint(F.col("text")).alias("fingerprint"))


SQL_FINGERPRINT = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 2147483647) AS fingerprint
FROM documents
"""


def q_text_repetition(spark, sf_dir):
    """Gopher-style duplicate-fraction repetition signals (pure array
    exprs; tokens staged as a real column so the n-gram HOF lambdas never
    re-evaluate the split — CLAUDE.md CollapseProject rule)."""
    docs = _p(spark, sf_dir, "documents")
    staged = docs.select("doc_id",
                         text_ops.tokens_ws(F.col("text")).alias("toks"))
    r = text_ops.repetition_features(F.col("toks"))
    return staged.select(
        "doc_id",
        F.round(r["dup_token_frac"], 6).alias("dup_token_frac"),
        F.round(r["dup_token_char_frac"], 6).alias("dup_token_char_frac"),
        F.round(r["dup_2gram_frac"], 6).alias("dup_2gram_frac"),
        F.round(r["dup_3gram_frac"], 6).alias("dup_3gram_frac"))


SQL_TEXT_REPETITION = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
), g AS (
  SELECT doc_id, toks,
         list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1]) AS g2,
         list_transform(generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS g3
  FROM t
)
SELECT doc_id,
  ROUND(CASE WHEN len(toks) = 0 THEN 0.0
        ELSE (len(toks) - len(list_distinct(toks)))::DOUBLE / len(toks) END, 6)
    AS dup_token_frac,
  ROUND(CASE WHEN length(array_to_string(toks, '')) = 0 THEN 0.0
        ELSE (length(array_to_string(toks, ''))
              - length(array_to_string(list_distinct(toks), '')))::DOUBLE
             / length(array_to_string(toks, '')) END, 6)
    AS dup_token_char_frac,
  ROUND(CASE WHEN len(g2) = 0 THEN 0.0
        ELSE (len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2) END, 6)
    AS dup_2gram_frac,
  ROUND(CASE WHEN len(g3) = 0 THEN 0.0
        ELSE (len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3) END, 6)
    AS dup_3gram_frac
FROM g
"""


def q_text_scrub_pii(spark, sf_dir):
    """PII scrub gate. The synthetic corpus contains no PII, so (like the
    dedup_exact salt) every 10th doc gets a deterministic injected email +
    URL + IPv4 in BOTH engines; the gate verifies sequential match counts
    and the md5 of the fully scrubbed text."""
    docs = _p(spark, sf_dir, "documents")
    injected = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(F.col("text"),
                 F.lit(" contact bob"), F.col("doc_id").cast("string"),
                 F.lit("@example.com via https://ex.org/d?id="),
                 F.col("doc_id").cast("string"),
                 F.lit(" or 10.0.0."), (F.col("doc_id") % 256).cast("string")),
    ).otherwise(F.col("text"))
    staged = docs.select("doc_id", injected.alias("t"))
    c = text_ops.pii_counts(F.col("t"))
    return staged.select(
        "doc_id",
        c["n_url"].alias("n_url"),
        c["n_email"].alias("n_email"),
        c["n_ipv4"].alias("n_ipv4"),
        F.md5(text_ops.scrub_pii(F.col("t"))).alias("scrubbed_md5"))


_PII_RX = {kind: rx for kind, rx, _ in text_ops.PII_PATTERNS}
SQL_SCRUB_PII = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN
           text || ' contact bob' || doc_id || '@example.com via '
                || 'https://ex.org/d?id=' || doc_id
                || ' or 10.0.0.' || (doc_id % 256)
         ELSE text END AS t
  FROM documents
), s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '{_PII_RX["url"]}')) AS n_url,
         regexp_replace(t, '{_PII_RX["url"]}', '<URL>', 'g') AS t1
  FROM d
), s2 AS (
  SELECT doc_id, n_url,
         len(regexp_extract_all(t1, '{_PII_RX["email"]}')) AS n_email,
         regexp_replace(t1, '{_PII_RX["email"]}', '<EMAIL>', 'g') AS t2
  FROM s1
)
SELECT doc_id, n_url, n_email,
       len(regexp_extract_all(t2, '{_PII_RX["ipv4"]}')) AS n_ipv4,
       md5(regexp_replace(t2, '{_PII_RX["ipv4"]}', '<IP>', 'g')) AS scrubbed_md5
FROM s2
"""


def q_text_term_counts(spark, sf_dir):
    """Corpus vocabulary stats: top-50 terms under the deterministic
    (n DESC, term ASC) total order."""
    docs = _p(spark, sf_dir, "documents")
    return text_ops.top_terms(docs, 50)


SQL_TERM_COUNTS = r"""
SELECT term, COUNT(*) AS n
FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      FROM documents)
WHERE term <> ''
GROUP BY term
ORDER BY n DESC, term ASC
LIMIT 50
"""


def q_dedup_exact(spark, sf_dir):
    """The raw corpus has no exact duplicates at small SF, which made this
    gate a trivially-empty assertion (VERDICT r3 #8) — so the query salts a
    deterministic duplicate injection (every 25th doc re-added under a
    shifted id) into BOTH sides; the gate now verifies real groups."""
    docs = _p(spark, sf_dir, "documents").select("doc_id", "text")
    salted = (docs.where(F.col("doc_id") % 25 == 0)
              .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000)))
    return dedup.exact_duplicates(docs.unionByName(salted))


SQL_DEDUP_EXACT = """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
)
SELECT md5(text) AS content_md5, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
FROM d GROUP BY md5(text) HAVING COUNT(*) > 1
"""


def q_dedup_normalized(spark, sf_dir):
    """Salted like q_dedup_exact, but the injected copies are whitespace-
    perturbed (leading/trailing + doubled inner spaces) — NOT exact dups,
    so the gate verifies the token-sort normalization actually collapses
    them (every 25th doc, offset 7)."""
    docs = _p(spark, sf_dir, "documents").select("doc_id", "text")
    salted = (docs.where(F.col("doc_id") % 25 == 7)
              .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
              .withColumn("text", F.concat(
                  F.lit("  "), F.regexp_replace("text", " ", "  "),
                  F.lit(" "))))
    return dedup.normalized_duplicates(docs.unionByName(salted))


SQL_DEDUP_NORMALIZED = r"""
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         '  ' || replace(text, ' ', '  ') || ' ' AS text
  FROM documents WHERE doc_id % 25 = 7
)
SELECT md5(array_to_string(list_sort(string_split_regex(lower(trim(text)), '\s+')), ' '))
           AS norm_sig,
       COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
FROM d GROUP BY 1 HAVING COUNT(*) > 1
"""


def q_dedup_minhash_pairs(spark, sf_dir):
    """MinHash-LSH near-dup pairs (portable md5-derived permutations — the
    DuckDB oracle computes bit-identical signatures, bands and pairs)."""
    docs = _p(spark, sf_dir, "documents")
    return dedup.minhash_near_duplicates(docs, threshold=0.6,
                                         hash_family="md5")


def _sql_minhash_pairs(threshold: float = 0.6, n_perm: int = 64,
                       n_bands: int = 16) -> str:
    """Full SQL replica of ops/dedup.minhash_near_duplicates: word-3-shingles
    → one md5 per shingle → sig_j = min(h1 + j*h2) → 16 band keys → pair
    join → exact Jaccard (functions/phash.py documents the h1/h2 split)."""
    rpb = n_perm // n_bands
    sig_items = ",\n      ".join(
        f"list_min(list_transform(hx, h -> ('0x'||substr(h,1,13))::BIGINT"
        f" + {j} * ('0x'||substr(h,14,13))::BIGINT))"
        for j in range(1, n_perm + 1))
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT id, {b} AS band, ('0x' || substr(md5("
        + " || ',' || ".join(f"CAST(sig[{b * rpb + r + 1}] AS VARCHAR)"
                             for r in range(rpb))
        + "), 1, 15))::BIGINT AS band_key FROM s"
        for b in range(n_bands))
    return rf"""
WITH nz AS MATERIALIZED (
  SELECT * FROM (
    SELECT doc_id AS id,
           list_distinct(list_transform(
             range(0, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 3, 0) + 1),
             i -> array_to_string(string_split_regex(trim(lower(text)), '\s+')[i+1:i+3], ' '))) AS sh
    FROM documents)
  WHERE len(sh) > 0),
s AS MATERIALIZED (
  SELECT id, [{sig_items}] AS sig
  FROM (SELECT id, list_transform(sh, x -> md5(x)) AS hx FROM nz)),
bands AS MATERIALIZED (
  {band_rows}),
cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
         FROM bands l JOIN bands r
           ON l.band = r.band AND l.band_key = r.band_key AND l.id < r.id),
p AS (SELECT c.id_a, c.id_b,
             len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(a.sh || b.sh)) AS jacc
      FROM cand c JOIN nz a ON c.id_a = a.id JOIN nz b ON c.id_b = b.id)
SELECT id_a, id_b, ROUND(jacc, 6) AS jacc FROM p WHERE jacc >= {threshold}
"""


SQL_DEDUP_MINHASH = _sql_minhash_pairs()


def q_dedup_simhash(spark, sf_dir):
    """SimHash groups (portable md5-nibble bit hashing, hex-string output)."""
    docs = _p(spark, sf_dir, "documents")
    return dedup.simhash_duplicates(docs, hash_family="md5")


def _sql_simhash() -> str:
    """SQL replica of ops/dedup.simhash_hex: bit i of a token = bit (i mod 4)
    of hex nibble (i div 4) of md5(token); doc bit = sign of the ±1 sum."""
    def bit(i: int) -> str:
        return (f"(CASE WHEN coalesce(list_sum(list_transform(hx, h -> "
                f"((('0x'||substr(h,{i // 4 + 1},1))::BIGINT >> {i % 4}) & 1)"
                f" * 2 - 1)), 0) > 0 THEN 1 ELSE 0 END)")

    chars = []
    for n in range(16):
        val = " + ".join(f"{1 << b} * {bit(4 * n + b)}" for b in range(4))
        chars.append(f"substr('0123456789abcdef', 1 + {val}, 1)")
    sim = "\n       || ".join(chars)
    return rf"""
WITH t AS (
  SELECT doc_id,
         list_transform(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                    x -> x <> ''), x -> md5(x)) AS hx
  FROM documents),
h AS (SELECT doc_id, {sim} AS simhash FROM t)
SELECT simhash, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
FROM h GROUP BY simhash HAVING COUNT(*) > 1
"""


SQL_DEDUP_SIMHASH = _sql_simhash()


def q_dedup_ngram_jaccard(spark, sf_dir):
    """EXACT n-gram Jaccard pairs ≥ 0.6 via lossless prefix filtering
    (ops/dedup.ngram_jaccard_pairs) — the brute-force oracle proves recall."""
    docs = _p(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.6, hash_family="md5")


def _sql_ngram_jaccard(threshold: float = 0.6) -> str:
    """Brute-force all-pairs exact Jaccard (prefix filtering is lossless, so
    the exhaustive pair set is identical)."""
    return rf"""
WITH nz AS MATERIALIZED (
  SELECT * FROM (
    SELECT doc_id AS id,
           list_distinct(list_transform(
             range(0, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 3, 0) + 1),
             i -> array_to_string(string_split_regex(trim(lower(text)), '\s+')[i+1:i+3], ' '))) AS sh
    FROM documents)
  WHERE len(sh) > 0)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(a.sh || b.sh)), 6) AS jacc
FROM nz a JOIN nz b ON a.id < b.id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / len(list_distinct(a.sh || b.sh)) >= {threshold}
"""


SQL_DEDUP_NGRAM_JACCARD = _sql_ngram_jaccard()


def q_dedup_minhash_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: the minhash pair graph (same parameters as
    dedup_minhash_pairs) collapsed by connected components — the actual
    dedup decision (keep one representative per cluster), not just the
    pair list. cluster_rep = lexicographic min id of the component."""
    docs = _p(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(docs, threshold=0.6,
                                          hash_family="md5")
    return dedup.near_dup_clusters(pairs)


SQL_DEDUP_MINHASH_CLUSTERS = f"""
WITH RECURSIVE pairs AS MATERIALIZED ({_sql_minhash_pairs()}),
e0 AS (SELECT CAST(id_a AS VARCHAR) AS src, CAST(id_b AS VARCHAR) AS dst
       FROM pairs),
edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node)
SELECT node, MIN(lab) AS cluster_rep FROM reach GROUP BY node
"""


def q_text_chunk_windows(spark, sf_dir):
    """Sliding token windows (size 16, overlap 4) — context-length packing
    / RAG chunking. Pure narrow fan-out, zero shuffle (ops/chunk.py); the
    window text travels as md5 so the gate payload stays compact."""
    docs = _p(spark, sf_dir, "documents")
    ch = chunk_ops.chunk_documents(docs, size=16, overlap=4)
    return ch.select("doc_id", "chunk_idx", "n_tokens",
                     F.md5("chunk_text").alias("chunk_md5"))


SQL_TEXT_CHUNK_WINDOWS = (
    "SELECT doc_id, chunk_idx, n_tokens, md5(chunk_text) AS chunk_md5 "
    f"FROM ({chunk_ops.sql_chunk_documents('documents', size=16, overlap=4)})")


def q_text_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (ops/chunk.cdc_chunks): k=8 rolling-gram
    boundaries mod 64, min chunk 16 chars — shift-resilient storage-dedup
    units, one argument-position fold, zero shuffle."""
    docs = _p(spark, sf_dir, "documents")
    return chunk_ops.cdc_chunks(docs, k=8, boundary_bits=6, min_size=16,
                                hash_family="md5")


SQL_TEXT_CDC_CHUNKS = chunk_ops.sql_cdc_chunks(
    "documents", k=8, boundary_bits=6, min_size=16)


def q_text_gopher_filter(spark, sf_dir):
    """Gopher-style quality filter DECISION (ops/text.gopher_filter):
    per-reject-reason counts, assignments pinned via sum(doc_id); every
    threshold an integer cross-multiplication."""
    docs = _p(spark, sf_dir, "documents")
    return (text_ops.gopher_filter(docs)
            .groupBy(F.coalesce(F.col("reject_reason"), F.lit("kept"))
                     .alias("reason"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").alias("sum_id")))


_GOPHER_STOP_RE = r"(?i)\b(" + "|".join(text_ops.STOPWORDS_EN) + r")\b"
SQL_TEXT_GOPHER_FILTER = rf"""
WITH f AS (
  SELECT doc_id,
         length(text) AS nc,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS nt,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
           AS np,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS nd,
         len(regexp_extract_all(text, '{_GOPHER_STOP_RE}')) AS ns,
         len(g) AS go, len(list_distinct(g)) AS gd
  FROM (SELECT doc_id, text,
               list_transform(
                 range(0, greatest(len(list_filter(
                   string_split_regex(trim(text), '\s+'), t -> t <> '')) - 2,
                   0)),
                 i -> array_to_string(list_filter(
                   string_split_regex(trim(text), '\s+'), t -> t <> '')
                   [i + 1 : i + 3], ' ')) AS g
        FROM documents)),
r AS (
  SELECT doc_id, CASE
    WHEN nt < 20 OR nt > 100000 THEN 'n_tokens'
    WHEN nc < 3 * nt OR nc > 12 * nt THEN 'word_len'
    WHEN np * 100 > 20 * nc THEN 'punct'
    WHEN nd * 100 > 15 * nc THEN 'digit'
    WHEN ns < 2 THEN 'stopwords'
    WHEN (go - gd) * 10 > 3 * go THEN 'repetition'
    ELSE 'kept' END AS reason
  FROM f)
SELECT reason, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_id
FROM r GROUP BY reason
"""


def q_text_tfidf_topk(spark, sf_dir):
    """Top-3 characteristic terms per document by the integer-exact
    tf-idf-style score (ops/text.tf_idf_top_terms; see its docstring for
    why the score avoids float ln)."""
    docs = _p(spark, sf_dir, "documents")
    return text_ops.tf_idf_top_terms(docs, 3)


SQL_TEXT_TFIDF_TOPK = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\s+'),
                            t -> t <> '')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
sc AS (SELECT t.doc_id, t.term, t.tf, d.df, t.tf * 1000000 // d.df AS score_ppm
       FROM tf t JOIN df d USING (term)),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        ORDER BY score_ppm DESC, term ASC) AS rn FROM sc)
SELECT doc_id, term, tf, df, score_ppm FROM r WHERE rn <= 3
"""


def q_winnow_near_dup(spark, sf_dir):
    """Winnowing-based near-dup pairs (ops/winnow.winnow_near_duplicates):
    ≥20 shared selected fingerprints, hub fingerprints (df > 50) dropped
    before the pair join — the MOSS similarity decision."""
    docs = _p(spark, sf_dir, "documents")
    return winnow_ops.winnow_near_duplicates(
        docs, k=8, w=4, min_shared=20, max_df=50, hash_family="md5")


SQL_WINNOW_NEAR_DUP = winnow_ops.sql_winnow_near_duplicates(
    "documents", k=8, w=4, min_shared=20, max_df=50)


def q_text_length_quantiles(spark, sf_dir):
    """Exact per-language token-length quantiles (p50/p90/p99) with
    integer-rational rank math — ops/text.group_quantiles."""
    docs = _p(spark, sf_dir, "documents")
    with_n = docs.select(
        "lang", "doc_id",
        text_ops.token_count(F.col("text")).cast("long").alias("n_tokens"))
    return text_ops.group_quantiles(with_n, "n_tokens", "lang", "doc_id")


SQL_TEXT_LENGTH_QUANTILES = text_ops.sql_group_quantiles(
    r"""(SELECT lang, doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
         FROM documents)""",
    "n_tokens", "lang", "doc_id")


def q_kmeans_quantized(spark, sf_dir):
    """Integer-exact quantized Lloyd's k-means (ops/kmeans.py): 2 full
    iterations from the hash-seeded start, final assignment replayed
    bit-for-bit by the DuckDB CTE chain — an ITERATIVE algorithm under the
    value-hash gate, possible only because every step is integer-exact."""
    emb = _p(spark, sf_dir, "embeddings")
    return kmeans_ops.kmeans_quantized(emb, k=4, n_iter=2)


SQL_KMEANS_QUANTIZED = kmeans_ops.sql_kmeans_quantized(
    "embeddings", k=4, n_iter=2, dim=64)


def q_text_pack_sequences(spark, sf_dir):
    """GPT-style concat-and-split sequence packing (per-shard layout,
    context 128, one EOS separator per doc — ops/chunk.pack_sequences);
    documents straddling a pack boundary appear once per pack touched."""
    docs = _p(spark, sf_dir, "documents")
    return chunk_ops.pack_sequences(docs, context_len=128, shard_size=64,
                                    sep_tokens=1)


SQL_TEXT_PACK_SEQUENCES = chunk_ops.sql_pack_sequences(
    "documents", context_len=128, shard_size=64, sep_tokens=1)


#: decontamination gate split: train = doc_id%10 in 0..7, eval = the 8..9
#: holdout PLUS salted verbatim copies of every 25th train doc (guaranteed
#: fully-contaminated rows, same salting idiom as the dedup gates)
_DECON_TRAIN_SQL = "(SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8)"
_DECON_EVAL_SQL = ("(SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8"
                   " UNION ALL SELECT doc_id + 1000000 AS doc_id, text"
                   " FROM documents WHERE doc_id % 10 < 8 AND doc_id % 25 = 0)")


def q_decontam_ngram_overlap(spark, sf_dir):
    """Train/eval 5-gram decontamination (ops/decontam.py): flag eval docs
    sharing any lowercase word 5-gram with the train split, with
    distinct-gram hit fractions."""
    docs = _p(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 10 < 8)
    eval_docs = (docs.where(F.col("doc_id") % 10 >= 8)
                 .unionByName(
                     train.where(F.col("doc_id") % 25 == 0)
                     .withColumn("doc_id",
                                 F.col("doc_id") + F.lit(1_000_000))))
    return decontam.ngram_contamination(train, eval_docs, n=5,
                                        hash_family="md5")


SQL_DECONTAM_NGRAM_OVERLAP = decontam.sql_ngram_contamination(
    _DECON_TRAIN_SQL, _DECON_EVAL_SQL, n=5)


def q_decontam_source_overlap(spark, sf_dir):
    """Pairwise 3-gram Jaccard between the corpus's `source` partitions
    (ops/decontam.source_overlap_matrix) — the before-you-mix-corpora
    diagnostic; integer-exact ppm."""
    docs = _p(spark, sf_dir, "documents")
    return decontam.source_overlap_matrix(docs, n=3, group_col="source",
                                          hash_family="md5")


SQL_DECONTAM_SOURCE_OVERLAP = decontam.sql_source_overlap_matrix(
    "documents", n=3, group_col="source")


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) fingerprints: k=8 char-grams, window w=4, min
    selection — ops/winnow.py (one CollapseProject-immune aggregate fold)."""
    docs = _p(spark, sf_dir, "documents")
    return winnow_ops.winnow_fingerprints(docs, k=8, w=4, hash_family="md5")


SQL_WINNOW_FINGERPRINTS = winnow_ops.sql_winnow_fingerprints(
    "documents", k=8, w=4)


#: deterministic-split gate parameters (ops/sample.py) — weights chosen so
#: every split is non-empty at sf0.01 (~460 docs)
_SPLITS = (("train", 0.9), ("val", 0.05), ("test", 0.05))
#: downsample the dominant language, keep the tail (corpus rebalancing)
_STRAT_RATES = {"en": 0.3}


def q_sample_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment by salted id hash
    (ops/sample.hash_split): a pure narrow expression — stable under
    retries/resume/repartitioning, unlike F.rand(). Aggregated per
    (split, lang) so the gate pins every row's assignment via sum(doc_id)."""
    docs = _p(spark, sf_dir, "documents")
    return (sample_ops.hash_split(docs, "doc_id", _SPLITS,
                                  salt="split", family="md5")
            .groupBy("split", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").alias("sum_id")))


SQL_SAMPLE_HASH_SPLIT = f"""
SELECT {sample_ops.sql_split_case('doc_id', 'split', _SPLITS)} AS split,
       lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_id
FROM documents GROUP BY 1, 2
"""


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-stratum downsampling (ops/sample.stratified_sample):
    keep 30% of 'en' docs, 100% of the tail languages — the standard
    training-mix rebalancing filter, as one narrow CASE-threshold compare."""
    docs = _p(spark, sf_dir, "documents")
    return (sample_ops.stratified_sample(docs, "doc_id", "lang", _STRAT_RATES,
                                         default_rate=1.0,
                                         salt="strat", family="md5")
            .groupBy("lang")
            .agg(F.count("*").alias("n_kept"),
                 F.sum("doc_id").alias("sum_id")))


SQL_SAMPLE_STRATIFIED = f"""
SELECT lang, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_id
FROM documents
WHERE {sample_ops.sql_stratified_where('doc_id', 'lang', 'strat',
                                       _STRAT_RATES, 1.0)}
GROUP BY lang
"""


def q_sample_bottom_k(spark, sf_dir):
    """Deterministic fixed-SIZE sample (ops/sample.bottom_k_sample): the 25
    orders with the smallest salted 60-bit hash — TakeOrdered, no full
    sort shuffle; pure function of (salt, ids)."""
    orders = _p(spark, sf_dir, "orders")
    return (sample_ops.bottom_k_sample(orders, 25, "bk",
                                       id_col="o_orderkey", family="md5")
            .select("o_orderkey", "o_custkey", "o_orderpriority"))


SQL_SAMPLE_BOTTOM_K = f"""
SELECT o_orderkey, o_custkey, o_orderpriority
FROM orders
ORDER BY {sample_ops.sql_u60('o_orderkey', 'bk')}, o_orderkey
LIMIT 25
"""


def q_events_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (ops/events.session_stats): per-user
    30-minute-gap sessions with integer-microsecond rollups."""
    from csvw_rdf_convertor_spark.ops import events as events_ops
    ev = _p(spark, sf_dir, "events")
    return events_ops.session_stats(ev, gap_minutes=30)


def q_events_funnel(spark, sf_dir):
    """Strictly-ordered earliest-match funnel view→click→purchase
    (ops/events.funnel): per-user steps_completed."""
    from csvw_rdf_convertor_spark.ops import events as events_ops
    ev = _p(spark, sf_dir, "events")
    return events_ops.funnel(ev, ["view", "click", "purchase"])


def q_events_retention(spark, sf_dir):
    """Weekly retention triangle (ops/events.retention_cohorts): cohort by
    first-event week, distinct active users per week offset."""
    from csvw_rdf_convertor_spark.ops import events as events_ops
    ev = _p(spark, sf_dir, "events")
    return events_ops.retention_cohorts(ev)


def _events_sql():
    from csvw_rdf_convertor_spark.ops import events as events_ops
    return (events_ops.sql_session_stats("events", gap_minutes=30),
            events_ops.sql_funnel("events", ["view", "click", "purchase"]),
            events_ops.sql_retention_cohorts("events"))


SQL_EVENTS_SESSIONIZE, SQL_EVENTS_FUNNEL, SQL_EVENTS_RETENTION = _events_sql()


#: snapshot-diff gate: "new" = documents with every 10th text perturbed,
#: every 25th dropped, and 20 fresh ids appended — deterministic in both
#: engines
_SNAP_NEW_SQL = """(
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 3 THEN text || ' [edited]' ELSE text END
           AS text
  FROM documents WHERE doc_id % 25 <> 7
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         'fresh doc ' || CAST(doc_id + 2000000 AS VARCHAR) AS text
  FROM documents WHERE doc_id % 25 = 0)"""


def q_snapshot_diff(spark, sf_dir):
    """Incremental-crawl delta (ops/snapshot.snapshot_diff): old = the
    documents table, new = deterministic perturbation (edits, deletions,
    additions); one id-keyed digest join."""
    from csvw_rdf_convertor_spark.ops.snapshot import snapshot_diff
    docs = _p(spark, sf_dir, "documents").select("doc_id", "text")
    new = (docs.where(F.col("doc_id") % 25 != 7)
           .withColumn("text", F.when(F.col("doc_id") % 10 == 3,
                                      F.concat(F.col("text"),
                                               F.lit(" [edited]")))
                       .otherwise(F.col("text")))
           .unionByName(
               docs.where(F.col("doc_id") % 25 == 0)
               .select((F.col("doc_id") + 2_000_000).alias("doc_id"),
                       F.concat(F.lit("fresh doc "),
                                (F.col("doc_id") + 2_000_000)
                                .cast("string")).alias("text"))))
    return snapshot_diff(docs, new)


from csvw_rdf_convertor_spark.ops.snapshot import sql_snapshot_diff

SQL_SNAPSHOT_DIFF = sql_snapshot_diff("documents", _SNAP_NEW_SQL)


def q_sample_mixture_rates(spark, sf_dir):
    """Downsampling rates toward a uniform language mixture
    (ops/sample.mixture_rates): the binding stratum keeps rate 1e6 ppm,
    every other is cut to match — all-integer arithmetic."""
    docs = _p(spark, sf_dir, "documents")
    return sample_ops.mixture_rates(docs, "lang")


SQL_SAMPLE_MIXTURE_RATES = sample_ops.sql_mixture_rates(
    "documents", "lang", n_strata_uniform=5)


def q_sketch_theta_distinct(spark, sf_dir):
    """Deterministic distinct-count sketch (ops/sketch.theta_distinct):
    estimate the corpus's distinct-term count from the 2^-2 hash-threshold
    survivor set — bit-identical in both engines (no RNG, no floats)."""
    docs = _p(spark, sf_dir, "documents")
    terms = (docs.select(F.explode(text_ops.tokens_ws(F.col("text")))
                         .alias("term"))
             .where(F.col("term") != ""))
    return sketch_ops.theta_distinct(terms, "term", b=2, hash_family="md5")


SQL_SKETCH_THETA_DISTINCT = sketch_ops.sql_theta_distinct(
    r"""(SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                   t -> t <> '')) AS term FROM documents)""",
    "term", b=2)


def q_dedup_simhash_hamming(spark, sf_dir):
    """SimHash near-dup pairs at Hamming ≤ 3 via pigeonhole banding (k+1
    hex slices) + exact verify (ops/dedup.simhash_hamming_pairs)."""
    docs = _p(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs(docs, k=3, hash_family="md5")


def _sql_simhash_hamming(k: int = 3) -> str:
    """Brute-force oracle: same md5 simhash CTE, all-pairs Hamming via
    per-nibble XOR popcount (banding is a recall-lossless optimization, so
    the exhaustive result is identical)."""
    head = _sql_simhash().split("SELECT simhash")[0]
    ham = " + ".join(
        f"bit_count(xor(('0x'||substr(a.simhash,{i},1))::BIGINT, "
        f"('0x'||substr(b.simhash,{i},1))::BIGINT))"
        for i in range(1, 17))
    return f"""{head}
SELECT a.doc_id AS id_a, b.doc_id AS id_b, ({ham})::INTEGER AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE ({ham}) <= {k}
"""


SQL_DEDUP_SIMHASH_HAMMING = _sql_simhash_hamming()


def q_sim_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-5 for 10 deterministic query vectors."""
    emb = _p(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = similarity.brute_force_topk(emb, queries, k=5)
    return out.select("query_id", "vec_id", "rank", F.round("cos", 4).alias("cos"))


SQL_SIM_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(range(1, len(e.embedding) + 1),
                            i -> e.embedding[i]::DOUBLE * q.q_vec[i]::DOUBLE)),
             (a, b) -> a + b)
         / NULLIF(
            sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(e.embedding) + 1),
                                i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)),
                 (a, b) -> a + b))
          * sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(q.q_vec) + 1),
                                i -> q.q_vec[i]::DOUBLE * q.q_vec[i]::DOUBLE)),
                 (a, b) -> a + b)), 0) AS cos
  FROM embeddings e CROSS JOIN q),
ranked AS (SELECT query_id, vec_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, vec_id ASC) AS rank
           FROM scored)
SELECT query_id, vec_id, CAST(rank AS INT) AS rank, ROUND(cos, 4) AS cos
FROM ranked WHERE rank <= 5
"""


def q_sim_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH approximate top-k. The ±1 plane matrix is derived
    driver-side from md5 (similarity.plane_matrix) and embedded as literals
    in BOTH the Spark plan and the oracle SQL — identical buckets, identical
    rescoring fold."""
    emb = _p(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.lsh_topk(emb, queries, k=5, n_planes=6, dim=64)


def _sql_lsh_topk(k: int = 5, n_planes: int = 6, dim: int = 64) -> str:
    planes = similarity.plane_matrix(n_planes, dim, seed=7)
    bits = []
    for p, row in enumerate(planes):
        lst = "[" + ",".join(str(float(r)) for r in row) + "]"
        proj = (f"list_reduce(list_prepend(0.0::DOUBLE, list_transform("
                f"range(1, {dim + 1}), i -> embedding[i]::DOUBLE * ({lst})[i])),"
                f" (a, b) -> a + b)")
        bits.append(f"(CASE WHEN {proj} > 0 THEN 1 ELSE 0 END)"
                    f" * {1 << (n_planes - 1 - p)}")
    bucket = "(" + "\n         + ".join(bits) + ")"
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS q_vec, bucket
      FROM e WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(range(1, {dim + 1}),
                            i -> e.embedding[i]::DOUBLE * q.q_vec[i]::DOUBLE)),
             (a, b) -> a + b)
         / NULLIF(
            sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, {dim + 1}),
                                i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)),
                 (a, b) -> a + b))
          * sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, {dim + 1}),
                                i -> q.q_vec[i]::DOUBLE * q.q_vec[i]::DOUBLE)),
                 (a, b) -> a + b)), 0) AS cos
  FROM e JOIN q ON e.bucket = q.bucket),
ranked AS (SELECT query_id, vec_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, vec_id ASC) AS rank
           FROM scored)
SELECT query_id, vec_id, ROUND(cos, 6) AS cos, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


SQL_SIM_LSH_TOPK = _sql_lsh_topk()


def _dd_cos(a: str, b: str, dim: int) -> str:
    """DuckDB cosine between two FLOAT[] expressions — the same sequential
    left fold (list_reduce with a 0.0 prepend) the Spark `similarity.cosine`
    expression uses, so both engines produce bit-identical doubles."""
    def _dot(x: str, y: str) -> str:
        return (f"list_reduce(list_prepend(0.0::DOUBLE, list_transform("
                f"range(1, {dim + 1}), i -> {x}[i]::DOUBLE * {y}[i]::DOUBLE)),"
                f" (a, b) -> a + b)")
    return f"({_dot(a, b)} / NULLIF(sqrt({_dot(a, a)}) * sqrt({_dot(b, b)}), 0))"


def q_sim_ivf_topk(spark, sf_dir):
    """IVF approximate top-k: deterministic md5-sampled centroids, argmax-
    cosine cell assignment, probe the 4 nearest cells, exact rescore."""
    emb = _p(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4)


def _sql_ivf_topk(k: int = 5, n_cells: int = 16, n_probe: int = 4,
                  dim: int = 64) -> str:
    return f"""
WITH cents AS MATERIALIZED (
  SELECT vec_id AS cent_id, embedding AS cent_vec
  FROM embeddings
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT, vec_id
  LIMIT {n_cells}),
assigned AS (
  SELECT vec_id, vec, cell FROM (
    SELECT e.vec_id, e.embedding AS vec, c.cent_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {_dd_cos('e.embedding', 'c.cent_vec', dim)} DESC,
                        c.cent_id ASC) AS rk
    FROM embeddings e CROSS JOIN cents c)
  WHERE rk = 1),
q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
      WHERE vec_id < 10),
probes AS (
  SELECT query_id, q_vec, cell FROM (
    SELECT q.query_id, q.q_vec, c.cent_id AS cell,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY {_dd_cos('q.q_vec', 'c.cent_vec', dim)} DESC,
                        c.cent_id ASC) AS pr
    FROM q CROSS JOIN cents c)
  WHERE pr <= {n_probe}),
scored AS (
  SELECT p.query_id, a.vec_id, {_dd_cos('a.vec', 'p.q_vec', dim)} AS cos
  FROM assigned a JOIN probes p ON a.cell = p.cell),
ranked AS (SELECT query_id, vec_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, vec_id ASC) AS rank
           FROM scored)
SELECT query_id, vec_id, ROUND(cos, 6) AS cos, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


SQL_SIM_IVF_TOPK = _sql_ivf_topk()


def q_events_asof_join(spark, sf_dir):
    """As-of join (ops/asof.py): each purchase event picks up the most
    recent click at-or-before it by the same user — the union+running-last
    composition (one equi-key shuffle, no range explosion). Oracle: DuckDB's
    native ASOF LEFT JOIN."""
    ev = _p(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase") \
                  .select("event_id", "user_id", "ts", "value")
    clicks = ev.where(F.col("event_type") == "click")
    out = asof.asof_join(purchases, clicks, on="user_id",
                         left_time="ts", right_time="ts",
                         right_cols=["event_id", "value"], prefix="click_")
    # no-match columns are coalesced to -1 sentinels (plus an explicit flag):
    # nullable BIGINTs otherwise decay to float64 in the pandas comparison
    # layer and lose digits at 9 significant figures
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return out.select(
        "event_id", "user_id", us("ts").alias("ts_us"),
        F.col("click_event_id").isNotNull().cast("int").alias("has_click"),
        F.coalesce(F.col("click_event_id"), F.lit(-1)).alias("click_event_id"),
        F.coalesce(us("click_ts"), F.lit(-1)).alias("click_ts_us"),
        F.round(F.coalesce(F.col("click_value"), F.lit(-1.0)), 4)
         .alias("click_value"))


SQL_EVENTS_ASOF = """
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
       CAST(r.event_id IS NOT NULL AS INT) AS has_click,
       COALESCE(r.event_id, -1) AS click_event_id,
       COALESCE(epoch_us(r.ts), -1) AS click_ts_us,
       ROUND(COALESCE(r.value, -1.0), 4) AS click_value
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_emb_near_dup_blocked(spark, sf_dir):
    """Embedding-cosine near-dup pairs blocked by label. The raw corpus has
    no pairs at cos ≥ 0.9 (trivially-empty gate, VERDICT r3 #8), so every
    50th vector is re-injected under a shifted id — identical embedding and
    label ⇒ cos = 1.0 pairs the gate actually verifies."""
    emb = _p(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    salted = (emb.where(F.col("vec_id") % 50 == 0)
              .withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000)))
    return dedup.embedding_near_duplicates(emb.unionByName(salted),
                                           block_col="label", threshold=0.9)


SQL_EMB_NEAR_DUP = """
WITH v AS (SELECT vec_id, label, embedding FROM embeddings
           UNION ALL
           SELECT vec_id + 1000000 AS vec_id, label, embedding
           FROM embeddings WHERE vec_id % 50 = 0)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(
         list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(range(1, len(a.embedding) + 1),
                            i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
             (x, y) -> x + y)
         / NULLIF(
            sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(a.embedding) + 1),
                                i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)),
                 (x, y) -> x + y))
          * sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(b.embedding) + 1),
                                i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
                 (x, y) -> x + y)), 0), 6) AS cos
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE
  list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(range(1, len(a.embedding) + 1),
                     i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
      (x, y) -> x + y)
  / NULLIF(
     sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(range(1, len(a.embedding) + 1),
                         i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)),
          (x, y) -> x + y))
   * sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(range(1, len(b.embedding) + 1),
                         i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
          (x, y) -> x + y)), 0) >= 0.9
"""


def q_kg_mention_stats(spark, sf_dir):
    """Mention detection over synthetic-alias transcripts. Aliases are
    planted with portable arithmetic (user_id*31 + turn_idx*7 mod |aliases|)
    and the pandas-UDF extractall is reproduced in the oracle with the SAME
    longest-first alternation regex (RE2 and Python re agree on leftmost-
    first alternation)."""
    tr = _transcripts_from_events(spark, sf_dir)
    aliases = [a for _, _, al in alias_dictionary() for a in al]
    arr = F.array(*[F.lit(a) for a in aliases])
    un = F.substring(F.col("conv_id"), 6, 18).cast("long")  # 'conv-<user_id>'
    idx = F.pmod(un * 31 + F.col("turn_idx") * 7, F.lit(len(aliases)))
    tr = tr.withColumn(
        "text", F.concat(F.col("text"), F.lit(" about "),
                         F.element_at(arr, (idx + 1).cast("int"))))
    ments = mentions_mod.detect_mentions(tr, alias_dictionary())
    return (ments.groupBy("mention_norm")
            .agg(F.count("*").alias("n")).orderBy(F.desc("n"), "mention_norm"))


def _sql_mention_stats() -> str:
    aliases = [a for _, _, al in alias_dictionary() for a in al]
    alias_list = "[" + ", ".join("'" + a.replace("'", "''") + "'"
                                 for a in aliases) + "]"
    _, rx = mentions_mod._build_lookup(alias_dictionary())
    return f"""
WITH {_TRANSCRIPTS_CTE},
planted AS (
  SELECT text || ' about ' ||
         ({alias_list})[CAST((CAST(substr(conv_id, 6) AS BIGINT) * 31
                              + turn_idx * 7) % {len(aliases)} AS INT) + 1] AS text
  FROM transcripts),
m AS (SELECT unnest(regexp_extract_all(text, '{rx.pattern}', 1)) AS mention
      FROM planted)
SELECT lower(mention) AS mention_norm, COUNT(*) AS n
FROM m GROUP BY mention_norm
"""


SQL_MENTION_STATS = _sql_mention_stats()


def q_cc_components(spark, sf_dir):
    """Iterative-join connected components. The oracle computes the same
    min-label fixpoint with a recursive CTE (closure is small at gate sf)."""
    orders = _p(spark, sf_dir, "orders")
    # bipartite graph: customer ↔ order-priority-bucket edges
    edges = orders.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("o_orderpriority")).alias("dst")).distinct()
    from csvw_rdf_convertor_spark.kg.cc import connected_components
    labels = connected_components(edges)
    return labels.groupBy("comp").agg(F.count("*").alias("size"))


SQL_CC_COMPONENTS = """
WITH RECURSIVE
e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                       'p' || o_orderpriority AS dst FROM orders),
edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
lbl AS (SELECT node, MIN(lab) AS comp FROM reach GROUP BY node)
SELECT comp, COUNT(*) AS "size" FROM lbl GROUP BY comp
"""


def q_a5_labels(spark, sf_dir):
    """A5: label resolution — preferred-LANGUAGE priority (en) before
    predicate priority (skos:prefLabel beats rdfs:label), language-less
    labels preferred within the fallback predicate
    (schema-inferrer.ts:303-353 getLabel).

    Fixture: nations carry skos@de + rdfs@en + rdfs(no lang) — the @en
    rdfs:label must win despite skos's higher predicate priority; regions
    carry skos@fr + rdfs(no lang) — no @en match, so the sticky-offlang
    fallback keeps skos's @fr label (predicate priority)."""
    skos = "http://www.w3.org/2004/02/skos/core#prefLabel"
    rdfs = "http://www.w3.org/2000/01/rdf-schema#label"
    nation = _p(spark, sf_dir, "nation")
    region = _p(spark, sf_dir, "region")
    nsubj = F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("subj")
    rsubj = F.concat(F.lit("r"), F.col("r_regionkey").cast("string")).alias("subj")
    t = (nation.select(nsubj, F.lit(skos).alias("pred"),
                       F.col("n_name").alias("obj_lex"),
                       F.lit("de").alias("obj_lang"))
         .unionByName(nation.select(
             nsubj, F.lit(rdfs).alias("pred"),
             F.concat(F.lit("en-"), F.col("n_name")).alias("obj_lex"),
             F.lit("en").alias("obj_lang")))
         .unionByName(nation.select(
             nsubj, F.lit(rdfs).alias("pred"),
             F.concat(F.lit("fallback-"), F.col("n_name")).alias("obj_lex"),
             F.lit("").alias("obj_lang")))
         .unionByName(region.select(
             rsubj, F.lit(skos).alias("pred"), F.col("r_name").alias("obj_lex"),
             F.lit("fr").alias("obj_lang")))
         .unionByName(region.select(
             rsubj, F.lit(rdfs).alias("pred"),
             F.concat(F.lit("plain-"), F.col("r_name")).alias("obj_lex"),
             F.lit("").alias("obj_lang"))))
    return rdf2csvw.labels(
        t.withColumn("obj_kind", F.lit("literal"))
         .withColumn("obj_dtype", F.lit(""))
         .withColumn("graph", F.lit("")),
        pref_lang="en")


SQL_A5_LABELS = """
WITH t AS (
  SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS subj, 0 AS pri,
         n_name AS obj_lex, 'de' AS lang FROM nation
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR), 1, 'en-' || n_name, 'en' FROM nation
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR), 1, 'fallback-' || n_name, '' FROM nation
  UNION ALL
  SELECT 'r' || CAST(r_regionkey AS VARCHAR), 0, r_name, 'fr' FROM region
  UNION ALL
  SELECT 'r' || CAST(r_regionkey AS VARCHAR), 1, 'plain-' || r_name, '' FROM region),
ranked AS (SELECT subj, obj_lex,
                  row_number() OVER (PARTITION BY subj ORDER BY
                    CASE WHEN lang = 'en' OR lang LIKE 'en-%' THEN 0 ELSE 1 END,
                    pri,
                    CASE WHEN lang = '' THEN 0 ELSE 1 END,
                    obj_lex) rk
           FROM t)
SELECT subj, obj_lex AS label FROM ranked WHERE rk = 1
"""


CHAIN_DESC = {
    "url": "urn:nr",
    "tableSchema": {
        "aboutUrl": "urn:nation#{n_nationkey}",
        "columns": [
            {"name": "n_name", "propertyUrl": "urn:n#name", "required": True},
            {"name": "n_regionkey", "propertyUrl": "urn:n#region",
             "valueUrl": "urn:region#{n_regionkey}"},
            # object-subject chain: aboutUrl == previous column's valueUrl,
            # so the compiler assigns them ONE variable (t1.obj == t2.subj)
            {"name": "r_name", "aboutUrl": "urn:region#{n_regionkey}",
             "propertyUrl": "urn:r#name"},
        ],
    },
}


def q_rdf2csvw_chain(spark, sf_dir):
    """J1 object-subject chains: a PROVIDED descriptor is compiled into
    variable-shared triple patterns (create-query.ts:338-510, var
    assignment :83-98, recursion :470-501) and executed as DataFrame joins
    — nation rows chain to region rows through the n_regionkey valueUrl,
    with the link IRI trimmed back to the key cell value."""
    nation = _p(spark, sf_dir, "nation")
    region = _p(spark, sf_dir, "region")
    nsub = F.concat(F.lit("urn:nation#"), F.col("n_nationkey").cast("string"))
    rsub = F.concat(F.lit("urn:region#"), F.col("r_regionkey").cast("string"))
    triples = (nation.select(nsub.alias("subj"), F.lit("urn:n#name").alias("pred"),
                             F.col("n_name").alias("obj_lex"),
                             F.lit("literal").alias("obj_kind"))
               .unionByName(nation.select(
                   nsub.alias("subj"), F.lit("urn:n#region").alias("pred"),
                   F.concat(F.lit("urn:region#"),
                            F.col("n_regionkey").cast("string")).alias("obj_lex"),
                   F.lit("iri").alias("obj_kind")))
               .unionByName(region.select(
                   rsub.alias("subj"), F.lit("urn:r#name").alias("pred"),
                   F.col("r_name").alias("obj_lex"),
                   F.lit("literal").alias("obj_kind")))
               .withColumn("obj_dtype", F.lit(""))
               .withColumn("obj_lang", F.lit(""))
               .withColumn("graph", F.lit("")))
    cols, roots = rdf2csvw.compile_table_query(
        parse_descriptor(CHAIN_DESC).tables[0])
    return rdf2csvw.match_table_query(triples, cols, roots)


SQL_RDF2CSVW_CHAIN = """
SELECT n.n_name AS n_name,
       CAST(n.n_regionkey AS VARCHAR) AS n_regionkey,
       coalesce(r.r_name, '') AS r_name
FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def q_rdf2csvw_roundtrip(spark, sf_dir):
    """Inverse direction end-to-end: forward nation triples → BGP equi-join
    matching (J1–J3) → reconstructed rows."""
    triples = q_csvw2rdf_minimal_nation(spark, sf_dir) \
        .withColumn("graph", F.lit(""))
    u = "urn:nation#"
    pats = [rdf2csvw.TriplePattern("n_name", u + "n_name", required=True),
            rdf2csvw.TriplePattern("n_regionkey", u + "n_regionkey")]
    return rdf2csvw.match_patterns(triples, pats)


SQL_RDF2CSVW_ROUNDTRIP = """
SELECT 'urn:nation#nation-' || CAST(n_nationkey AS VARCHAR) AS subj,
       n_name, CAST(n_regionkey AS VARCHAR) AS n_regionkey
FROM nation
"""


def q_rdf2csvw_format_roundtrip(spark, sf_dir):
    """rdf2csvw OUTPUT FORMATTING end-to-end (bindings-to-row-transformation
    .ts:16-85, url-trimming.ts, format-boolean/number.ts): forward-convert a
    nation-derived table whose columns use a valueUrl IRI template, a
    boolean 'Y|N' format and an LDML number pattern, then reconstruct the
    rows — trimmed + formatted cells must equal the original CSV values."""
    u = "urn:natfmt"
    desc = {
        "url": u,
        "tableSchema": {
            "aboutUrl": "#n-{n_nationkey}",
            "columns": [
                {"name": "n_nationkey", "suppressOutput": True},
                {"name": "n_regionkey", "datatype": "integer",
                 "valueUrl": "urn:region-{n_regionkey}"},
                {"name": "flag",
                 "datatype": {"base": "boolean", "format": "Y|N"}},
                {"name": "price", "datatype": "decimal"},
                {"name": "note", "null": [""]},
            ],
        },
    }
    df = _p(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("string").alias("n_nationkey"),
        F.col("n_regionkey").cast("string").alias("n_regionkey"),
        F.when(F.col("n_nationkey") % 2 == 0, F.lit("Y")).otherwise(F.lit("N"))
         .alias("flag"),
        F.concat((F.col("n_nationkey") * 1000 + 234).cast("string"), F.lit(".5"))
         .alias("price"),
        F.when(F.col("n_nationkey") < 5,
               F.concat(F.lit("note-"), F.col("n_nationkey").cast("string")))
         .otherwise(F.lit("")).alias("note"))
    table = with_order(parse_descriptor(desc).tables[0], "n_nationkey")
    triples = table_to_triples(df, table)

    pats = [
        rdf2csvw.TriplePattern("n_regionkey", f"{u}#n_regionkey", required=True,
                               valueUrl="urn:region-{n_regionkey}",
                               datatype=DatatypeSpec(base="integer")),
        rdf2csvw.TriplePattern("flag", f"{u}#flag",
                               datatype=DatatypeSpec(base="boolean",
                                                     format="Y|N")),
        rdf2csvw.TriplePattern("price", f"{u}#price",
                               datatype=DatatypeSpec(
                                   base="decimal",
                                   format={"pattern": "#,##0.00"})),
        rdf2csvw.TriplePattern("note", f"{u}#note", null=("NONE",)),
    ]
    return rdf2csvw.match_patterns(triples, pats)


SQL_RDF2CSVW_FORMAT = """
WITH n AS (SELECT n_nationkey AS k, n_regionkey AS rk,
                  n_nationkey * 1000 + 234 AS pint FROM nation)
SELECT 'urn:natfmt#n-' || CAST(k AS VARCHAR) AS subj,
       CAST(rk AS VARCHAR) AS n_regionkey,
       CASE WHEN k % 2 = 0 THEN 'Y' ELSE 'N' END AS flag,
       CASE WHEN pint >= 1000
            THEN CAST(pint // 1000 AS VARCHAR) || ',' ||
                 lpad(CAST(pint % 1000 AS VARCHAR), 3, '0')
            ELSE CAST(pint AS VARCHAR) END || '.50' AS price,
       CASE WHEN k < 5 THEN 'note-' || CAST(k AS VARCHAR) ELSE 'NONE' END AS note
FROM n
"""


def q_p5_numeric_battery(spark, sf_dir):
    """P5 shapes on constructed lexicals: trailing AND leading percents,
    integer-family % division (parse-number.ts:151-176), grouped decimals
    with empty-segment rejection, tiny (<1e-4) and huge (1e20) doubles
    exercising the JS positional/exponential canonicalization zones,
    specials, invalid demotion — built identically in both engines."""
    from csvw_rdf_convertor_spark.functions import cells
    part = _p(spark, sf_dir, "part")
    digit = (F.col("p_partkey") % 9 + 1).cast("string")
    src = part.select(
        "p_partkey",
        F.concat((F.col("p_partkey") % 200).cast("string"), F.lit("%")).alias("pct_in"),
        F.concat(F.lit("%"), (F.col("p_partkey") % 200).cast("string")).alias("lead_in"),
        F.when(F.col("p_partkey") % 7 == 0, F.lit("abc"))
         .otherwise(F.concat(F.lit("+0"), (F.col("p_partkey") % 50).cast("string")))
         .alias("int_in"),
        F.concat((F.col("p_partkey") % 300).cast("string"), F.lit("%")).alias("intpct_in"),
        F.concat(F.lit("1.2"), (F.col("p_partkey") % 10).cast("string"), F.lit("4,5"))
         .alias("grp_in"),
        F.concat(F.lit("1..2"), (F.col("p_partkey") % 10).cast("string"), F.lit(",5"))
         .alias("badgrp_in"),
        F.concat(digit, F.lit("E-5")).alias("tiny_in"),
        F.concat(digit, F.lit("E20")).alias("big_in"))
    dbl = DatatypeSpec(base="double")
    grp_fmt = DatatypeSpec(base="decimal",
                           format={"groupChar": ".", "decimalChar": ","})
    return src.select(
        "p_partkey",
        cells.parse_number(F.col("pct_in"), dbl).alias("pct_out"),
        cells.parse_number(F.col("lead_in"), dbl).alias("lead_out"),
        cells.parse_number(F.col("int_in"), DatatypeSpec(base="integer")).alias("int_out"),
        cells.parse_number(F.col("intpct_in"), DatatypeSpec(base="integer")).alias("intpct_out"),
        cells.parse_number(F.col("grp_in"), grp_fmt).alias("grp_out"),
        cells.parse_number(F.col("badgrp_in"), grp_fmt).alias("badgrp_out"),
        cells.parse_number(F.col("tiny_in"), dbl).alias("tiny_out"),
        cells.parse_number(F.col("big_in"), dbl).alias("big_out"))


SQL_P5_BATTERY = """
SELECT p_partkey,
       CASE WHEN (p_partkey % 200) % 100 = 0
            THEN CAST(CAST((p_partkey % 200) / 100 AS BIGINT) AS VARCHAR)
            ELSE CAST((p_partkey % 200) / 100.0 AS VARCHAR) END AS pct_out,
       CASE WHEN (p_partkey % 200) % 100 = 0
            THEN CAST(CAST((p_partkey % 200) / 100 AS BIGINT) AS VARCHAR)
            ELSE CAST((p_partkey % 200) / 100.0 AS VARCHAR) END AS lead_out,
       CASE WHEN p_partkey % 7 = 0 THEN '@@invalid@@abc'
            ELSE CAST(p_partkey % 50 AS VARCHAR) END AS int_out,
       CASE WHEN (p_partkey % 300) % 100 = 0
            THEN CAST(CAST((p_partkey % 300) / 100 AS BIGINT) AS VARCHAR)
            ELSE CAST((p_partkey % 300) / 100.0 AS VARCHAR) END AS intpct_out,
       '12' || CAST(p_partkey % 10 AS VARCHAR) || '4.5' AS grp_out,
       '@@invalid@@1..2' || CAST(p_partkey % 10 AS VARCHAR) || ',5' AS badgrp_out,
       '0.0000' || CAST(p_partkey % 9 + 1 AS VARCHAR) AS tiny_out,
       CAST(p_partkey % 9 + 1 AS VARCHAR) || repeat('0', 20) AS big_out
FROM part
"""


def q_issues_required(spark, sf_dir):
    """Issues side-output: required-cell violations with (table,row,column)
    location (utils/issue-tracker.ts:34-126)."""
    from csvw_rdf_convertor_spark.plans.csvw2rdf import issues
    desc = {
        "url": "urn:events",
        "tableSchema": {"columns": [
            {"name": "event_id"},
            {"name": "flag", "required": True, "null": [""]},
        ]},
        "order_by": "event_id",
    }
    df = _p(spark, sf_dir, "events").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.when(F.col("event_type") == "error", F.lit(""))
         .otherwise(F.lit("ok")).alias("flag"))
    table = parse_descriptor(desc).tables[0]
    return issues(df, table)


SQL_ISSUES = """
SELECT 'urn:events' AS "table",
       CAST(row_number() OVER (ORDER BY event_id) AS BIGINT) AS row,
       'flag' AS "column", 'required cell is null' AS message
FROM events
QUALIFY event_type = 'error'
"""


def q_csvw2rdf_header_nation(spark, sf_dir):
    """P11 header-driven naming end-to-end (convertor.ts:409-592): nation
    written as a bare CSV with NO descriptor; column names derive from the
    header row (percent-encoded, '-' → %2D), predicates are url#name, and
    subjects are per-row skolem bnodes (no aboutUrl)."""
    import csv as _csv

    from csvw_rdf_convertor_spark.sources.csv_source import read_csv
    from csvw_rdf_convertor_spark.sources.resolve import resolve_with_header

    rows = (_p(spark, sf_dir, "nation")
            .select("n_nationkey", "n_name", "n_regionkey")
            .orderBy("n_nationkey").collect())  # nation is a 25-row constant
    path = "/tmp/csvw_gate_header_nation.csv"
    with open(path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["nation key", "n-name", "region key"])
        for r in rows:
            w.writerow([r.n_nationkey, r.n_name, r.n_regionkey])

    tg = resolve_with_header(path)
    table = with_order(tg.tables[0], "nation key")
    df = read_csv(spark, path, table)
    return table_to_triples(df, table).select(*TRIPLE_OUT)


_HDR_PATH = "/tmp/csvw_gate_header_nation.csv"
_SK_CELLSUBJ = _sk_sql(f"'{_HDR_PATH}'", "'cellsubj'", "CAST(rn AS VARCHAR)")
SQL_HEADER_NATION = f"""
WITH n AS (SELECT CAST(n_nationkey AS VARCHAR) AS k, n_name AS nm,
                  CAST(n_regionkey AS VARCHAR) AS rk,
                  row_number() OVER (ORDER BY CAST(n_nationkey AS VARCHAR)) AS rn
           FROM nation)
SELECT {_SK_CELLSUBJ} AS subj, '{_HDR_PATH}#nation%20key' AS pred,
       k AS obj_lex, 'literal' AS obj_kind, '' AS obj_dtype, '' AS obj_lang FROM n
UNION ALL SELECT {_SK_CELLSUBJ}, '{_HDR_PATH}#n%2Dname', nm, 'literal', '', '' FROM n
UNION ALL SELECT {_SK_CELLSUBJ}, '{_HDR_PATH}#region%20key', rk, 'literal', '', '' FROM n
"""


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing (Arrow mapInPandas, deterministic fake decoder).

    The gate projection recovers the integer codes behind the float32
    features (round(x·65535) is exact: float32 rounding error ≪ 0.5) and
    emits them as one comma-joined string — hashable for the harness AND
    fully oracle-checkable, since the fake decoder is sha256-derived and
    DuckDB can replay it (sha256 of the hex payload, little-endian uint16
    pairs)."""
    from csvw_rdf_convertor_spark.ops import multimodal
    media = multimodal.synth_media(spark, 128)
    feats = multimodal.extract_features(media, deterministic_fake=True)
    codes = F.transform(
        F.col("feature"),
        lambda x: F.round(x.cast("double") * 65535).cast("int").cast("string"))
    return feats.select("media_id", "kind", "n_bytes",
                        F.array_join(codes, ",").alias("codes"))


SQL_MULTIMODAL = """
WITH m AS (SELECT range AS media_id FROM range(128)),
d AS (SELECT media_id, sha256(sha256(CAST(media_id AS VARCHAR))) AS dg FROM m)
SELECT media_id,
       (['image','audio','video'])[CAST(media_id % 3 AS INT) + 1] AS kind,
       CAST(64 AS INT) AS n_bytes,
       array_to_string(list_transform(range(0, 16),
         i -> CAST(('0x' || substr(dg, 4*i + 1, 2))::INT
                   + 256 * ('0x' || substr(dg, 4*i + 3, 2))::INT AS VARCHAR)),
         ',') AS codes
FROM d
"""


# --------------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts→KG triples (mapping + mentions + linking) at
    sf0.001; returns the triples DataFrame."""
    _tune(spark)
    sf_dir = "/root/testdata/sf0.001"
    tr = _transcripts_from_events(spark, sf_dir)
    turns = pipeline.turn_triples(tr)
    d = alias_dictionary()
    ments = mentions_mod.detect_mentions(tr, d)
    linked = linking.link_exact(ments.where(F.size("candidates") > 0))
    canon = linked.sparkSession.createDataFrame([], "node string, canonical string")
    m_triples = pipeline.mention_triples(linked, canon)
    return turns.unionByName(m_triples)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # CSVW→RDF engine (SURVEY §2.2–2.3)
        "csvw2rdf_minimal_nation": q_csvw2rdf_minimal_nation,
        "csvw2rdf_normalized_descriptor": q_csvw2rdf_normalized_descriptor,
        "csvw2rdf_datetime_orders": q_csvw2rdf_datetime_orders,
        "csvw2rdf_standard_region": q_csvw2rdf_standard_region,
        "csvw2rdf_list_split": q_csvw2rdf_list_split,
        "csvw2rdf_rdf_list": q_csvw2rdf_rdf_list,
        "rdf_list_linearize": q_rdf_list_linearize,
        "cell_bool_null_default": q_cell_bool_null_default,
        "uri_template_encoding": q_uri_template_encoding,
        "trig_roundtrip": q_trig_roundtrip,
        "jsonld_write_roundtrip": q_jsonld_write_roundtrip,
        "rdfxml_write_roundtrip": q_rdfxml_write_roundtrip,
        "kg_turn_triples": q_kg_turn_triples,
        # joins / aggs / windows / set ops (§2.4–2.7)
        "q1_pricing_summary": q_q1_pricing_summary,
        "q3_top_orders": q_q3_top_orders,
        "j2_left_join_optional": q_j2_left_join_optional,
        "j3_distinct_seed": q_j3_distinct_seed,
        "j5_fk_anti_join": q_j5_fk_anti_join,
        "a1_type_grouping": q_a1_type_grouping,
        "a2_multivalue": q_a2_multivalue,
        "a3_collect_set_merge": q_a3_collect_set_merge,
        "a4_minmax_lcp": q_a4_minmax_lcp,
        "a7_prefix_extract": q_a7_prefix_extract,
        "w1_rownum_per_group": q_w1_rownum_per_group,
        "w2_event_deltas": q_w2_event_deltas,
        "u1_union_distinct": q_u1_union_distinct,
        # training-data operators
        "text_token_counts": q_text_token_counts,
        "text_quality": q_text_quality,
        "text_lang_id": q_text_lang_id,
        "text_fingerprint": q_text_fingerprint,
        "text_repetition": q_text_repetition,
        "text_scrub_pii": q_text_scrub_pii,
        "text_term_counts": q_text_term_counts,
        "dedup_exact": q_dedup_exact,
        "dedup_normalized": q_dedup_normalized,
        "dedup_minhash_pairs": q_dedup_minhash_pairs,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_hamming": q_dedup_simhash_hamming,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_clusters": q_dedup_minhash_clusters,
        "text_chunk_windows": q_text_chunk_windows,
        "text_cdc_chunks": q_text_cdc_chunks,
        "text_pack_sequences": q_text_pack_sequences,
        "text_tfidf_topk": q_text_tfidf_topk,
        "text_gopher_filter": q_text_gopher_filter,
        "decontam_ngram_overlap": q_decontam_ngram_overlap,
        "decontam_source_overlap": q_decontam_source_overlap,
        "winnow_fingerprints": q_winnow_fingerprints,
        "winnow_near_dup": q_winnow_near_dup,
        "text_length_quantiles": q_text_length_quantiles,
        "kmeans_quantized": q_kmeans_quantized,
        "sample_hash_split": q_sample_hash_split,
        "sample_stratified": q_sample_stratified,
        "sample_bottom_k": q_sample_bottom_k,
        "sample_mixture_rates": q_sample_mixture_rates,
        "snapshot_diff": q_snapshot_diff,
        "sketch_theta_distinct": q_sketch_theta_distinct,
        "sim_topk_bruteforce": q_sim_topk_bruteforce,
        "sim_lsh_topk": q_sim_lsh_topk,
        "sim_ivf_topk": q_sim_ivf_topk,
        "events_asof_join": q_events_asof_join,
        "events_sessionize": q_events_sessionize,
        "events_funnel": q_events_funnel,
        "events_retention": q_events_retention,
        "emb_near_dup_blocked": q_emb_near_dup_blocked,
        "kg_mention_stats": q_kg_mention_stats,
        "cc_components": q_cc_components,
        # inverse direction + battery extensions
        "csvw2rdf_header_nation": q_csvw2rdf_header_nation,
        "a5_labels": q_a5_labels,
        "rdf2csvw_chain": q_rdf2csvw_chain,
        "rdf2csvw_roundtrip": q_rdf2csvw_roundtrip,
        "rdf2csvw_format_roundtrip": q_rdf2csvw_format_roundtrip,
        "p5_numeric_battery": q_p5_numeric_battery,
        "issues_required": q_issues_required,
        "multimodal_features": q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "csvw2rdf_minimal_nation": SQL_MINIMAL_NATION,
        "csvw2rdf_normalized_descriptor": SQL_MINIMAL_NATION,
        "csvw2rdf_datetime_orders": SQL_DATETIME_ORDERS,
        "csvw2rdf_standard_region": SQL_STANDARD_REGION,
        "csvw2rdf_list_split": SQL_LIST_SPLIT,
        "csvw2rdf_rdf_list": SQL_RDF_LIST,
        "rdf_list_linearize": SQL_RDF_LIST_LINEARIZE,
        "cell_bool_null_default": SQL_CELL_BOOL,
        "uri_template_encoding": SQL_URI_ENCODING,
        "trig_roundtrip": SQL_WRITER_ROUNDTRIP,
        "jsonld_write_roundtrip": SQL_WRITER_ROUNDTRIP,
        "rdfxml_write_roundtrip": SQL_RDFXML_ROUNDTRIP,
        "kg_turn_triples": SQL_KG_TURNS,
        "q1_pricing_summary": SQL_Q1,
        "q3_top_orders": SQL_Q3,
        "j2_left_join_optional": SQL_J2,
        "j3_distinct_seed": SQL_J3,
        "j5_fk_anti_join": SQL_J5,
        "a1_type_grouping": SQL_A1,
        "a2_multivalue": SQL_A2,
        "a3_collect_set_merge": SQL_A3,
        "a4_minmax_lcp": SQL_A4,
        "a7_prefix_extract": SQL_A7,
        "w1_rownum_per_group": SQL_W1,
        "w2_event_deltas": SQL_W2,
        "u1_union_distinct": SQL_U1,
        "text_token_counts": SQL_TOKEN_COUNTS,
        "text_quality": SQL_TEXT_QUALITY,
        "text_lang_id": SQL_LANG_ID,
        "text_fingerprint": SQL_FINGERPRINT,
        "text_repetition": SQL_TEXT_REPETITION,
        "text_scrub_pii": SQL_SCRUB_PII,
        "text_term_counts": SQL_TERM_COUNTS,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_normalized": SQL_DEDUP_NORMALIZED,
        "dedup_minhash_pairs": SQL_DEDUP_MINHASH,
        "dedup_simhash": SQL_DEDUP_SIMHASH,
        "dedup_simhash_hamming": SQL_DEDUP_SIMHASH_HAMMING,
        "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
        "dedup_minhash_clusters": SQL_DEDUP_MINHASH_CLUSTERS,
        "text_chunk_windows": SQL_TEXT_CHUNK_WINDOWS,
        "text_cdc_chunks": SQL_TEXT_CDC_CHUNKS,
        "text_pack_sequences": SQL_TEXT_PACK_SEQUENCES,
        "text_tfidf_topk": SQL_TEXT_TFIDF_TOPK,
        "text_gopher_filter": SQL_TEXT_GOPHER_FILTER,
        "decontam_ngram_overlap": SQL_DECONTAM_NGRAM_OVERLAP,
        "decontam_source_overlap": SQL_DECONTAM_SOURCE_OVERLAP,
        "winnow_fingerprints": SQL_WINNOW_FINGERPRINTS,
        "winnow_near_dup": SQL_WINNOW_NEAR_DUP,
        "text_length_quantiles": SQL_TEXT_LENGTH_QUANTILES,
        "kmeans_quantized": SQL_KMEANS_QUANTIZED,
        "sample_hash_split": SQL_SAMPLE_HASH_SPLIT,
        "sample_stratified": SQL_SAMPLE_STRATIFIED,
        "sample_bottom_k": SQL_SAMPLE_BOTTOM_K,
        "sample_mixture_rates": SQL_SAMPLE_MIXTURE_RATES,
        "snapshot_diff": SQL_SNAPSHOT_DIFF,
        "sketch_theta_distinct": SQL_SKETCH_THETA_DISTINCT,
        "sim_topk_bruteforce": SQL_SIM_TOPK,
        "sim_lsh_topk": SQL_SIM_LSH_TOPK,
        "sim_ivf_topk": SQL_SIM_IVF_TOPK,
        "events_asof_join": SQL_EVENTS_ASOF,
        "events_sessionize": SQL_EVENTS_SESSIONIZE,
        "events_funnel": SQL_EVENTS_FUNNEL,
        "events_retention": SQL_EVENTS_RETENTION,
        "emb_near_dup_blocked": SQL_EMB_NEAR_DUP,
        "kg_mention_stats": SQL_MENTION_STATS,
        "cc_components": SQL_CC_COMPONENTS,
        "multimodal_features": SQL_MULTIMODAL,
        "csvw2rdf_header_nation": SQL_HEADER_NATION,
        "a5_labels": SQL_A5_LABELS,
        "rdf2csvw_chain": SQL_RDF2CSVW_CHAIN,
        "rdf2csvw_roundtrip": SQL_RDF2CSVW_ROUNDTRIP,
        "rdf2csvw_format_roundtrip": SQL_RDF2CSVW_FORMAT,
        "p5_numeric_battery": SQL_P5_BATTERY,
        "issues_required": SQL_ISSUES,
    }
