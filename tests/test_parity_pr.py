"""North-rule correctness metrics, measured explicitly:

1. triple P/R vs reference-derived goldens on CSVW fixtures (target ≥ 0.95;
   the engine achieves 1.0 — set equality — on every golden here);
2. entity-linking P/R on the synthetic transcript corpus against the planted
   ground truth (alias → dictionary entity, canonicalization-aware).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.kg import cc, linking
from csvw_rdf_convertor_spark.kg import mentions as mentions_mod
from csvw_rdf_convertor_spark.kg.synth import alias_dictionary, synth_transcripts
from csvw_rdf_convertor_spark.plans.csvw2rdf import table_to_triples
from csvw_rdf_convertor_spark.spec import XSD, parse_descriptor, with_order


def pr(got: set, expected: set) -> tuple[float, float]:
    tp = len(got & expected)
    precision = tp / len(got) if got else 1.0
    recall = tp / len(expected) if expected else 1.0
    return precision, recall


def test_treeops_triple_pr(spark):
    """Golden derived from the reference fixture input.ttl
    (packages/core/test/rdf2csvwtests/011) — minimal mode."""
    from tests.test_csvw2rdf_treeops import ROWS, TREE_OPS_DESCRIPTOR, _input_df
    table = with_order(parse_descriptor(TREE_OPS_DESCRIPTOR).tables[0], "GID")
    got = {(r.subj, r.pred, r.obj_lex, r.obj_dtype)
           for r in table_to_triples(_input_df(spark), table).collect()}
    u = "tree-ops.csv#"
    expected = set()
    for gid, street, species, cycle, _d in ROWS:
        s = f"{u}gid-{gid}"
        expected |= {(s, u + "GID", gid, ""), (s, u + "on_street", street, ""),
                     (s, u + "species", species, ""),
                     (s, u + "trim_cycle", cycle, "")}
    expected.add((u + "gid-1", u + "inventory_date", "2010-10-18", XSD + "date"))
    expected.add((u + "gid-2", u + "inventory_date", "2010-06-02", XSD + "date"))
    p, r = pr(got, expected)
    assert p >= 0.95 and r >= 0.95
    assert p == 1.0 and r == 1.0  # actually exact


def test_entity_linking_pr_on_planted_corpus(spark):
    """Every mention the detector finds must link to an entity that owns
    that surface form (precision), and every planted alias occurrence must
    be detected and linked (recall). Canonicalization must map linked
    entities into the same component as the surface form's owners."""
    d = alias_dictionary()
    tr = synth_transcripts(spark, n_convs=60, max_len=80).cache()
    ments = mentions_mod.detect_mentions(tr, d).cache()
    linked = linking.link(ments, linking.alias_table(spark, d)).cache()

    # --- recall: every planted occurrence is detected & linked -------------
    # each turn plants mention1 always and mention2 with p=0.5; both appear
    # verbatim — the detector's longest-first alternation must catch ≥1 per
    # "discusses X" and the " and Y" suffix when present
    n_turns = tr.count()
    planted_min = tr.select(
        F.sum(F.when(F.col("text").contains(" and "), 2).otherwise(1))
    ).collect()[0][0]
    n_linked = linked.count()
    assert n_linked >= 0.95 * planted_min

    # --- precision: linked entity owns the surface form --------------------
    alias_owner = {(ent, a.lower()) for ent, _n, al in d for a in al}
    owner_df = spark.createDataFrame(list(alias_owner),
                                     "entity_id string, mention_norm string")
    good = linked.join(owner_df, ["entity_id", "mention_norm"], "left_semi").count()
    precision = good / n_linked
    assert precision >= 0.95
    assert precision == 1.0  # exact-alias linking owns every surface form

    # --- canonicalization consistency ---------------------------------------
    edges = cc.link_graph_edges(linked, linking.alias_table(spark, d))
    labels = cc.connected_components(edges).cache()
    comp = {r.node: r.comp for r in labels.collect()}
    # entities sharing a surface form must share a component
    by_alias: dict[str, set] = {}
    for ent, a in alias_owner:
        by_alias.setdefault(a, set()).add(ent)
    for alias, ents in by_alias.items():
        comps = {comp[e] for e in ents if e in comp}
        assert len(comps) <= 1, f"alias {alias!r} spans components {comps}"
