"""Scale-holdout data generator: replicate sf0.1 into an sf1-shaped dataset.

The driver's round-end measurement may use a larger, driver-generated scale
factor than the committed sf0.1 (the round brief). This tool builds a 10×
stand-in from the read-only sf0.1 tables so `bench.py` can be smoke-run at
sf1 volume BEFORE the driver does it — catching scale cliffs (plan changes,
bucket blow-ups, memory) that 600k-row tables cannot show. It approximates
volume and join structure, NOT the driver's generator:

- lineitem/orders/customer: 10 copies with consistent key offsets
  (l_orderkey/o_orderkey and o_custkey/c_custkey shifted together), so join
  fan-outs and group cardinalities scale linearly like a real sf1.
- documents: 10 copies, doc_id offset; for copy k>0 every word is suffixed
  with k, so shingle sets across copies are disjoint — near-dup structure
  per copy matches sf0.1 instead of every doc gaining 9 artificial clones
  (which would measure a pair-explosion problem the driver's distinct-docs
  generator does not pose).
- embeddings: 10 copies, vec_id offset ONLY for k>0 (the bench's 10 query
  vectors keep their ids; the corpus is 10×).

The KG row needs no data: bench.py derives n_convs from the directory name
(…/sf1 → 1M synthetic conversations).

Usage:  python tools/make_big_sf.py [out_dir=/dev/shm/bigsf/sf1] [copies=10]
Then:   SPARK_GRAFT_SF_DIR=/dev/shm/bigsf/sf1 SPARK_GRAFT_CPUS=32 python bench.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
KEY_OFF = 100_000_000  # far above any sf0.1 key


def _shift(t: pa.Table, col: str, k: int) -> pa.Table:
    i = t.schema.get_field_index(col)
    return t.set_column(i, col, pc.add(t.column(col), k * KEY_OFF))


def _suffix_words(text_col: pa.ChunkedArray, k: int) -> pa.Array:
    sfx = str(k)
    out = [" ".join(w + sfx for w in (s or "").split(" "))
           for s in text_col.to_pylist()]
    return pa.array(out, type=pa.string())


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/bigsf/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)

    def gen(name: str, per_copy):
        src = pq.read_table(f"{SRC}/{name}.parquet")
        parts = [per_copy(src, k) for k in range(copies)]
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{out_dir}/{name}.parquet",
                       row_group_size=1_000_000)
        print(f"{name}: {src.num_rows} -> {big.num_rows} rows")

    gen("lineitem", lambda t, k: _shift(t, "l_orderkey", k))
    gen("orders", lambda t, k: _shift(_shift(t, "o_orderkey", k),
                                      "o_custkey", k))
    gen("customer", lambda t, k: _shift(t, "c_custkey", k))

    def docs(t: pa.Table, k: int) -> pa.Table:
        t = _shift(t, "doc_id", k)
        if k == 0:
            return t
        new_text = _suffix_words(t.column("text"), k)
        t = t.set_column(t.schema.get_field_index("text"), "text", new_text)
        n = pc.utf8_length(new_text)
        return t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                            n.cast(pa.int64()))

    gen("documents", docs)
    gen("embeddings",
        lambda t, k: t if k == 0 else _shift(t, "vec_id", k))
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
