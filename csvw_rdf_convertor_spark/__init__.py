"""csvw_rdf_convertor_spark — a PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of S0ft1/CSVW-RDF-convertor.

NOT a port: the reference is a single-threaded streaming TypeScript library;
this engine compiles the same CSVW mapping semantics (column→predicate
mappings, RFC 6570 URI templates, datatype coercion/canonicalization, virtual
columns, skolemized blank nodes) into declarative Spark DataFrame plans that
Catalyst/Tungsten execute distributed. Row-level custom logic is restricted to
vectorized pandas/Arrow UDFs — no per-row Python anywhere.

Layout
------
- ``spec``            mapping-spec data model + descriptor parsing/inheritance
                      (reference: packages/core/src/lib/descriptor.ts)
- ``functions``       cell pipeline, URI templates, RDF term/N-Triples exprs
- ``plans``           csvw2rdf triple-construction plan compiler, rdf2csvw
                      schema inference
- ``sources``         dialect-aware CSV scan, N-Triples parse/serialize
- ``kg``              transcripts→KG pipeline (mentions, linking, connected
                      components, materialization, checkpoints)
- ``ops``             large-scale training-data operators (dedup, similarity,
                      text quality, multimodal plumbing)
"""

__version__ = "0.1.0"
