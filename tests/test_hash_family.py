"""Equivalence of the two hash families (functions/phash.py).

The sketch operators are hash-agnostic: the gate queries certify the md5
(engine-portable) family against the DuckDB oracle, and these properties
certify that the xxhash64 (production) family computes the SAME final
answers on corpora whose similarity structure is clear-cut — so the oracle
greenness transfers to the path the bench/pipeline actually runs.
"""

from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.ops import dedup


def _corpus(spark, n_groups: int = 30, perturb_every: int = 3,
            near: bool = True):
    """Synthetic docs with known near-dup structure: each group has a base
    document, an exact copy, and (every ``perturb_every``-th group) a
    one-word perturbation (Jaccard ~0.85 on word-3-shingles); plus unique
    filler docs far from everything."""
    rows = []
    doc_id = 0
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]
    for g in range(n_groups):
        # 40 tokens → 38 word-3-shingles; a single-token edit leaves
        # Jaccard ≈ 0.854, where P(LSH miss | 16 bands × 4 rows) ≈ 5e-6 —
        # both families are in the near-certain recall regime, so the pair
        # sets must coincide (and the corpus is fixed, so the test is
        # deterministic either way)
        base = " ".join(words[(g + i) % len(words)] + str(g * 7 + i * 3)
                        for i in range(40))
        rows.append((doc_id, base)); doc_id += 1
        rows.append((doc_id, base)); doc_id += 1          # exact copy
        if near and g % perturb_every == 0:
            toks = base.split()
            toks[10] = "CHANGED" + str(g)
            rows.append((doc_id, " ".join(toks))); doc_id += 1
        elif not near and g % perturb_every == 0:
            # token-bag-identical perturbation (case/whitespace only) —
            # collides in BOTH families by construction
            rows.append((doc_id, "  " + base.upper() + " ")); doc_id += 1
        rows.append((doc_id, f"unique filler {doc_id} " + " ".join(
            f"w{doc_id}x{i}" for i in range(18)))); doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_pair_set_family_equivalent(spark):
    docs = _corpus(spark)
    kw = dict(threshold=0.6)
    xx = {(r.id_a, r.id_b, r.jacc) for r in
          dedup.minhash_near_duplicates(docs, hash_family="xxhash64", **kw)
          .collect()}
    md = {(r.id_a, r.id_b, r.jacc) for r in
          dedup.minhash_near_duplicates(docs, hash_family="md5", **kw)
          .collect()}
    assert xx == md
    assert len(xx) >= 30  # the corpus really contains near-dups


def test_simhash_groups_family_equivalent(spark):
    # Hamming-0 SimHash grouping is family-equivalent only for token-bag-
    # identical docs (near-dup fingerprints legitimately differ per hash);
    # the corpus therefore perturbs by case/whitespace only
    docs = _corpus(spark, near=False)
    # compare the grouping STRUCTURE (sets of member ids), not the hash
    # values — the 64-bit fingerprints legitimately differ per family
    def groups(fam):
        if fam == "md5":
            sig = dedup.simhash_from_sums(
                dedup.simhash_bit_sums(dedup.simhash_token_hexes(F.col("text"))))
        else:
            sig = dedup.simhash_from_sums(
                dedup.simhash_bit_sums_xx(dedup.simhash_token_longs(F.col("text"))))
        per_doc = docs.select("doc_id", sig.alias("s"))
        member_sets = (per_doc.groupBy("s")
                       .agg(F.collect_set("doc_id").alias("m"),
                            F.count("*").alias("n"))
                       .where(F.col("n") > 1).collect())
        return {frozenset(r.m) for r in member_sets}

    assert groups("xxhash64") == groups("md5")
    # and the public operator finds the same number of duplicate groups
    n_xx = dedup.simhash_duplicates(docs, hash_family="xxhash64").count()
    n_md = dedup.simhash_duplicates(docs, hash_family="md5").count()
    assert n_xx == n_md > 0


def test_fuzzy_link_family_independent_of_hash(spark):
    """The fuzzy linker's accepted matches are exact-Jaccard-thresholded, so
    the production family must reproduce the md5-era results on clear-cut
    typos (same fixture shape as tests/test_kg_pipeline.py)."""
    from csvw_rdf_convertor_spark.kg import linking
    d = [("E1", "Mercury", ["mercury", "the planet mercury"]),
         ("E2", "Beethoven", ["beethoven", "ludwig van beethoven"])]
    unmatched = spark.createDataFrame(
        [("c1", 0, "Beethovan", "beethovan", 0),   # 3-gram jacc 0.56 vs alias
         ("c1", 1, "mercuri", "mercuri", 0)],      # 3-gram jacc 0.67 vs alias
        "conv_id string, turn_idx int, mention string, mention_norm string,"
        " match_i int")
    out = {(r.mention_norm, r.entity_id) for r in linking.link_fuzzy(
        unmatched, linking.alias_table(spark, d), threshold=0.35).collect()}
    assert out == {("beethovan", "E2"), ("mercuri", "E1")}
