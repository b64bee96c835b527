"""csvw2rdf: compile a TableSpec over a DataFrame into a triples DataFrame.

The reference walks rows one at a time on a single Node thread
(csvw2rdf/convertor.ts:611-806: convertTableRow → convertRowCell →
emitTriple). Here the whole table compiles into ONE declarative plan:

    scan → row numbering → per-column cell exprs (P1–P10)
         → per-column array<triple-struct> (T1–T4, T6)
         → one wide→long ``explode(flatten(...))`` (T5)
         → union standard-mode scaffolding (T7) → triples DF

All branching on the mapping spec happens at plan-build time; the executed
plan is a straight projection inside whole-stage codegen. The only shuffle a
table conversion can introduce is the optional global ``row_number`` (used
for small fixture parity); at scale, numbering is partitioned by a grouping
key (e.g. ``conv_id``) or taken from an existing ordinal column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cells
from ..functions.terms import iri_object, literal_object, skolem, triple
from ..functions.uritemplate import compile_template, variables
from ..spec import CSVW, RDF, XSD, ColumnSpec, TableSpec, expand_iri

RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"
RDF_TYPE = RDF + "type"

_ROW = "__row"
_SRC_ROW = "__source_row"
_EMPTY_TRIPLES = "array<struct<subj:string,pred:string,obj_lex:string,obj_kind:string,obj_dtype:string,obj_lang:string,graph:string>>"



def _resolve_url(table: TableSpec) -> str:
    return expand_iri(table.url, table.base) if table.base else table.url


def _row_numbers(df: DataFrame, table: TableSpec,
                 partition_by: str | None = None, *,
                 allow_arrival_order: bool = False) -> DataFrame:
    """1-based logical row number (reference rowNum: convertor.ts:360-370).

    ``order_by`` column → deterministic numbering; with ``partition_by`` the
    sort is per-partition (scale path, no global shuffle to one reducer).
    Without ``order_by`` the plan CONSUMES row numbers it cannot define:
    the reference's rowNum is the sequential 1..N source order, but a
    distributed scan has no arrival order — so this raises unless the
    caller explicitly opts into non-logical ids
    (``allow_arrival_order=True``, fixture/debug only: values come from
    ``monotonically_increasing_id`` and are neither sequential nor stable).
    """
    if table.order_by:
        if partition_by:
            w = Window.partitionBy(partition_by).orderBy(table.order_by)
        else:
            w = Window.orderBy(table.order_by)
        rn = F.row_number().over(w)
    elif allow_arrival_order:
        rn = F.monotonically_increasing_id() + 1
    else:
        raise ValueError(
            "this conversion consumes row numbers (standard mode, default "
            "subjects, ordered lists, or {_row}/{_sourceRow} templates) but "
            "the table has no order_by column; set one via spec.with_order, "
            "or pass allow_arrival_order=True to accept non-logical, "
            "partition-encoded row ids (reference rowNum is sequential "
            "1..N — convertor.ts:360-370)")
    df = df.withColumn(_ROW, rn.cast("long"))
    return df.withColumn(_SRC_ROW, F.col(_ROW) + F.lit(table.source_row_offset))


def _needs_row_numbers(table: TableSpec, minimal: bool) -> bool:
    """Row numbering costs a sort (global or per-partition) — add it only
    when something consumes it: standard-mode scaffolding, a default (no
    aboutUrl) subject, an ordered-list skolem, or a template referencing the
    ``_row``/``_sourceRow`` specials. Streaming plans (no monotonic ids) and
    the transcripts hot path then stay fully stateless."""
    if not minimal:
        return True
    from ..functions.uritemplate import variables as _vars
    for col in table.columns:
        if col.suppressOutput:
            continue
        if not col.aboutUrl:
            return True
        if col.separator is not None and col.ordered:
            return True
        for tpl in (col.aboutUrl, col.propertyUrl, col.valueUrl):
            if tpl and "{" in tpl and _vars(tpl) & {"_row", "_sourceRow"}:
                return True
    return False


def _maybe_row_numbers(df: DataFrame, table: TableSpec,
                       partition_by: str | None, minimal: bool,
                       allow_arrival_order: bool = False) -> DataFrame:
    if _needs_row_numbers(table, minimal):
        return _row_numbers(df, table, partition_by,
                            allow_arrival_order=allow_arrival_order)
    return df


def _default_subject(table_url: str) -> Column:
    """Per-row default cell subject (fresh bnode in the reference,
    convertor.ts:683 → deterministic skolem of (table, row))."""
    return skolem(table_url, "cellsubj", F.col(_ROW))


def _row_node(table_url: str) -> Column:
    """Standard-mode row node (convertor.ts:619)."""
    return skolem(table_url, "row", F.col(_ROW))


def _predicate(col: ColumnSpec, table: TableSpec, record: dict[str, Column]) -> Column:
    """T3: propertyUrl template, else ``tableUrl#name`` (convertor.ts:760-762)."""
    url = _resolve_url(table)
    if col.propertyUrl:
        if "{" in col.propertyUrl:
            return compile_template(col.propertyUrl, record, base=url)
        return F.lit(expand_iri(col.propertyUrl, url))
    return F.lit(f"{url}#{col.name}")


def _object_parts(col: ColumnSpec, item: Column, table: TableSpec,
                  record: dict[str, Column]):
    """T4: valueUrl ⇒ IRI object (even for typed columns); else literal with
    datatype/lang; invalid values demoted to plain string (P10,
    convertor.ts:772-805, 923-939)."""
    url = _resolve_url(table)
    if col.valueUrl:
        rec = dict(record)
        rec[col.name] = cells.strip_invalid(item)
        if "{" in col.valueUrl:
            return iri_object(compile_template(col.valueUrl, rec, base=url))
        return iri_object(F.lit(expand_iri(col.valueUrl, url)))
    dtype_iri = col.datatype.iri
    lex = cells.strip_invalid(item)
    dtype = F.when(cells.is_invalid(item), F.lit(XSD + "string")).otherwise(F.lit(dtype_iri))
    lang = F.lit(col.lang or "") if dtype_iri == XSD + "string" else F.lit("")
    lang = F.when(cells.is_invalid(item), F.lit("")).otherwise(lang)
    return literal_object(lex, dtype, lang)


def _object_parts_scalar(col: ColumnSpec, lex: Column, inv: Column,
                         table: TableSpec, record: dict[str, Column]):
    """T4 over PRE-STAGED (stripped-lexical, invalid-flag) attributes — the
    scalar-cell fast path. Semantically identical to :func:`_object_parts`
    with ``item = element_at(values, 1)``; referencing two cheap attributes
    instead of five copies of the element_at/strip CASE tree keeps the
    explode expression's generated code under janino's 64 KB per-method
    limit (see ``table_to_triples`` docstring — past that limit the WHOLE
    fused mapping stage silently falls back to interpreted execution)."""
    url = _resolve_url(table)
    if col.valueUrl:
        rec = dict(record)
        rec[col.name] = lex
        if "{" in col.valueUrl:
            return iri_object(compile_template(col.valueUrl, rec, base=url))
        return iri_object(F.lit(expand_iri(col.valueUrl, url)))
    dtype_iri = col.datatype.iri
    dtype = F.when(inv, F.lit(XSD + "string")).otherwise(F.lit(dtype_iri))
    lang = F.lit(col.lang or "") if dtype_iri == XSD + "string" else F.lit("")
    lang = F.when(inv, F.lit("")).otherwise(lang)
    return literal_object(lex, dtype, lang)


def _column_triples(col: ColumnSpec, values: Column, table: TableSpec,
                    record: dict[str, Column],
                    subjects: dict[str | None, Column] | None = None,
                    scalar: tuple[Column, Column] | None = None) -> Column:
    """array<triple-struct> for one column of one row (≤1 per value; a chain
    of 2·n+1 for ordered lists, T6 convertor.ts:836-854)."""
    url = _resolve_url(table)
    if subjects is not None and col.aboutUrl in subjects:
        subj = subjects[col.aboutUrl]
    else:
        subj = (compile_template(col.aboutUrl, record, base=url)
                if col.aboutUrl else _default_subject(url))
    pred = _predicate(col, table, record)

    def value_triple(item: Column) -> Column:
        return triple(subj, pred, *_object_parts(col, item, table, record))

    if col.separator is not None and col.ordered:
        # RDF collection: head link + first/rest chain of skolemized nodes
        node = lambda i: skolem(url, "list", col.name, F.col(_ROW), i)  # noqa: E731
        n = F.size(values)
        head = triple(subj, pred,
                      F.when(n == 0, F.lit(RDF_NIL)).otherwise(node(F.lit(0))),
                      F.when(n == 0, F.lit("iri")).otherwise(F.lit("bnode")),
                      F.lit(""), F.lit(""))
        firsts = F.transform(values, lambda x, i: triple(
            node(i), F.lit(RDF_FIRST), *_object_parts(col, x, table, record)))
        rests = F.transform(values, lambda x, i: triple(
            node(i), F.lit(RDF_REST),
            F.when(i == n - 1, F.lit(RDF_NIL)).otherwise(node(i + 1)),
            F.when(i == n - 1, F.lit("iri")).otherwise(F.lit("bnode")),
            F.lit(""), F.lit("")))
        out = F.concat(F.array(head), firsts, rests)
    elif col.separator is None and scalar is not None:
        # scalar cell (the overwhelmingly common case): exactly one element,
        # whose stripped lexical + invalid flag arrive as staged attributes
        lex, inv = scalar
        out = F.array(triple(subj, pred,
                             *_object_parts_scalar(col, lex, inv, table, record)))
    elif col.separator is None:
        out = F.array(value_triple(F.element_at(values, 1)))
    else:
        out = F.transform(values, value_triple)

    # null cell (NULL array) → no triples
    return F.when(values.isNull(), F.array().cast(_EMPTY_TRIPLES)).otherwise(out)


_BREAK_SEQ = [0]
#: max typed (parts-staged) columns per codegen segment — 5 measured ≈7.2 KB
#: of the 8 KB JIT method budget on the lineitem mix (see _codegen_stage_break)
_TYPED_PER_SEGMENT = 5


def _codegen_stage_break(df: DataFrame) -> DataFrame:
    """Split the fused mapping stage into two WholeStageCodegen segments.

    The cell pipeline + triple fan-out compile into ONE generated consume
    method; past ~4 typed columns its bytecode exceeds the JVM JIT's
    8000-byte DontCompileHugeMethods limit (measured maxMethodCodeSize 8430
    on a 4-column table), so the stage *compiles* (janino is happy, the
    plan still prints ``*(n)``) but executes in the BYTECODE INTERPRETER —
    a silent ~2× the frozen bench conf cannot flag. ``observe`` inserts a
    CollectMetrics node, which does not participate in whole-stage codegen,
    so the parse half and the template/fan-out half each compile into their
    own JIT-compilable method. Cost: one row hand-off between segments and
    a count accumulator — measured well under the JIT win (r6). The
    observation name only has to be unique per query; a module counter
    keeps unions of many tables distinct and carries no data."""
    _BREAK_SEQ[0] += 1
    return df.observe(f"__csvw2rdf_cg_break_{_BREAK_SEQ[0]}",
                      F.count(F.lit(1)).alias("rows"))


def _staged_explode(df: DataFrame, arrays: list[Column],
                    passthrough: list[str]) -> DataFrame:
    """Explode the concatenation of per-column triple arrays, with each
    array's CONSTRUCTION staged behind its own single-row Generate barrier.

    Building every column's array-of-structs inside the one explode
    expression compiles into ONE generated Java method
    (``methodSplitThreshold`` cannot split within a single expression), and
    past ~3-4 columns that method exceeds the JVM JIT's 8000-byte
    DontCompileHugeMethods limit — the stage still *compiles* (janino is
    fine) but runs in the bytecode INTERPRETER (r6: measured 2.2× on the
    4-column mapping with the JIT flag flipped, which a frozen bench conf
    cannot do). One barrier per array keeps each construction in its own
    method; everything stays inside a single WholeStageCodegen (Generate
    supports codegen), so no extra row materialization is paid."""
    from ..functions.staging import as_leaves
    names = []
    for i, arr in enumerate(arrays):
        nm = f"__tr_{i}"
        df = as_leaves(df, list(df.columns), **{nm: arr})
        names.append(nm)
    flat = (F.flatten(F.array(*[F.col(n) for n in names]))
            if len(names) > 1 else F.col(names[0]))
    return (df.select(*passthrough, F.explode(flat).alias("t"))
            .select(*passthrough, "t.*"))


def table_to_triples(df: DataFrame, table: TableSpec, *, minimal: bool = True,
                     partition_by: str | None = None,
                     default_lang: str = "",
                     allow_arrival_order: bool = False,
                     passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Compile and run the full table conversion; returns the triples DF.

    Plan shape (performance-critical): the cell pipeline, the row-record
    bindings, and the per-aboutUrl subject IRIs are materialized as real
    columns in *separate* projections, so each is evaluated ONCE per row and
    downstream expressions reference cheap attributes. Inlining everything
    into the final explode duplicates the whole cell pipeline per column
    (O(n_cols²) expression tree → codegen blowout / interpreted fallback;
    measured ~20× slower on a 7-column table). CollapseProject keeps these
    projections separate because the producer expressions are non-cheap and
    multiply referenced.
    """
    if table.suppressOutput:
        return df.sparkSession.createDataFrame(
            [], "subj string, pred string, obj_lex string, obj_kind string, "
                "obj_dtype string, obj_lang string, graph string")

    url = _resolve_url(table)
    df = _maybe_row_numbers(df, table, partition_by, minimal, allow_arrival_order)

    # stage 1: P1–P10 per column → array<string> columns (evaluated once),
    # in TWO projections: 1a materializes the normalized cell string (P1+P2),
    # 1b runs the datatype parse over that attribute. The parsers reference
    # the normalized value many times; with 1a inlined the duplicated
    # subtrees push the single generated doConsume method past janino's
    # 64 KB bytecode limit and the whole mapping silently falls back to
    # interpreted execution (~11× slower, measured on lineitem).
    # CollapseProject keeps 1a/1b separate: the norm producers are non-cheap
    # and multiply referenced.
    cell_col: dict[str, str] = {}
    stage1a, stage1b = [], []
    parts_groups: list[list[Column]] = []   # one group per TYPED column
    typed_cells: set[int] = set()           # stage1b indices of typed cols
    for i, col in enumerate(table.columns):
        cname = f"__cell_{i}"
        cell_col[col.name] = cname
        if col.virtual:
            # virtual column: no physical cell; templates drive everything,
            # the "value" is the (constant) default ('' unless given)
            stage1b.append(F.array(F.lit(col.default)).alias(cname))
            continue
        src = col.source or col.name
        if src not in df.columns:
            raise KeyError(f"source column {src!r} for {col.name!r} not in DataFrame")
        nname = f"__norm_{i}"
        stage1a.append(cells.cell_norm(F.col(src), col).alias(nname))
        # stage 1a2: heavy parse intermediates (numeric core/flags/parsed
        # number, datetime ts/tz) as real columns — inlined, their subtrees
        # duplicate at every reference and ONE generated method (janino caps
        # methods at 64 KB) grows past the limit, silently demoting the
        # WHOLE fused mapping stage to interpreted execution (measured 5-10×)
        parts = cells.scalar_parse_parts(F.col(nname), col)
        if parts is not None:
            names = {}
            group = []
            for k, expr in parts.items():
                pname = f"__p{i}_{k}"
                group.append(expr.alias(pname))
                names[k] = pname
            parts_groups.append(group)
            typed_cells.add(len(stage1b))
            parts = {k: F.col(n) for k, n in names.items()}
        stage1b.append(
            cells.cell_values_from_norm(F.col(nname), col, parts).alias(cname))
    if stage1a:
        df = df.select("*", *stage1a)
    # Emit the parse intermediates and the cell parses in SEGMENTS of at
    # most _TYPED_PER_SEGMENT typed columns, each segment behind a
    # _codegen_stage_break: a segment's generated consume method must stay
    # under the JVM JIT's 8000-byte DontCompileHugeMethods limit (measured:
    # 5 typed columns' parts ≈ 6.8 KB, their parses ≈ 7.2 KB — one fused
    # method for the 7-column lineitem was 13.3 KB and ran in the bytecode
    # interpreter, ~2× slower, with nothing in the plan string to show it).
    # Untyped (string/boolean) cells are cheap and ride with any segment;
    # tables with NO typed columns get no break at all.
    if parts_groups:
        seg: list[Column] = []
        for gi, group in enumerate(parts_groups):
            seg.extend(group)
            if (gi + 1) % _TYPED_PER_SEGMENT == 0:
                df = _codegen_stage_break(df.select("*", *seg))
                seg = []
        if seg:
            df = _codegen_stage_break(df.select("*", *seg))
        seg, typed_in_seg = [], 0
        for bi, expr in enumerate(stage1b):
            seg.append(expr)
            if bi in typed_cells:
                typed_in_seg += 1
                if typed_in_seg == _TYPED_PER_SEGMENT:
                    df = _codegen_stage_break(df.select("*", *seg))
                    seg, typed_in_seg = [], 0
        if seg:
            df = _codegen_stage_break(df.select("*", *seg))
    else:
        df = df.select("*", *stage1b)

    # stage 2: row-record bindings (template variables) as columns
    rec_col: dict[str, str] = {}
    stage2 = []
    for i, col in enumerate(table.columns):
        rname = f"__rec_{i}"
        rec_col[col.name] = rname
        stage2.append(cells.strip_invalid(
            F.array_join(F.col(cell_col[col.name]), ",")).alias(rname))
    df = df.select("*", *stage2)
    record: dict[str, Column] = {n: F.col(c) for n, c in rec_col.items()}
    if _ROW in df.columns:
        record["_row"] = F.col(_ROW).cast("string")
        record["_sourceRow"] = F.col(_SRC_ROW).cast("string")

    parsed: dict[str, Column] = {n: F.col(c) for n, c in cell_col.items()}

    # stage 3: one subject column per distinct aboutUrl template (templates
    # using per-column specials (_name/_column) fall back to inline exprs)
    subj_col: dict[str | None, str] = {}
    stage3 = []
    distinct_abouts = dict.fromkeys(
        c.aboutUrl for c in table.columns if not c.suppressOutput)
    for j, key in enumerate(distinct_abouts):
        if key and variables(key) & {"_name", "_column", "_sourceColumn"}:
            continue
        sname = f"__subj_{j}"
        subj_col[key] = sname
        expr = (compile_template(key, record, base=url) if key
                else _default_subject(url))
        stage3.append(expr.alias(sname))
    df = df.select("*", *stage3)
    subjects: dict[str | None, Column] = {k: F.col(v) for k, v in subj_col.items()}

    # stage 3.5: per scalar (non-separator) column, the stripped lexical and
    # invalid flag as real columns. The triple structs in the explode then
    # reference two cheap attributes instead of five copies of the
    # element_at/strip CASE tree — without this the Generate's fused
    # expression exceeds janino's 64 KB per-method limit and Spark silently
    # runs the ENTIRE mapping stage interpreted (measured 5-10× slower; the
    # "Whole-stage codegen disabled for plan" WARN is the only symptom).
    stage35 = []
    scalar_col: dict[str, tuple[str, str]] = {}
    for i, col in enumerate(table.columns):
        if col.suppressOutput or col.separator is not None:
            continue
        item = F.element_at(F.col(cell_col[col.name]), 1)
        stage35.append(cells.strip_invalid(item).alias(f"__lex_{i}"))
        stage35.append(cells.is_invalid(item).alias(f"__inv_{i}"))
        scalar_col[col.name] = (f"__lex_{i}", f"__inv_{i}")
    if stage35:
        df = df.select("*", *stage35)

    def _scalar(col: ColumnSpec) -> tuple[Column, Column] | None:
        names = scalar_col.get(col.name)
        return (F.col(names[0]), F.col(names[1])) if names else None

    per_col = [
        _column_triples(col, parsed[col.name], table,
                        {**record, "_name": F.lit(col.name),
                         "_column": F.lit(str(i + 1)),
                         "_sourceColumn": F.lit(str(i + 1 + table.dialect.skipColumns))},
                        subjects=subjects, scalar=_scalar(col))
        for i, col in enumerate(table.columns) if not col.suppressOutput
    ]

    if minimal:
        # passthrough columns (e.g. a pre-computed partition bucket) ride
        # through the explode so callers keep their partitioning without
        # re-deriving keys from 10× more triple rows
        if not per_col:
            return (df.select(*passthrough,
                              F.explode(F.array().cast(_EMPTY_TRIPLES)).alias("t"))
                    .select(*passthrough, "t.*"))
        return _staged_explode(df, per_col, list(passthrough))

    # standard mode (T7): row scaffolding emitted from the same single pass
    row_node = _row_node(url)
    table_node = skolem(url, "table")
    scaffold = [
        F.array(
            triple(table_node, F.lit(CSVW + "row"), row_node, F.lit("bnode"), F.lit(""), F.lit("")),
            triple(row_node, F.lit(RDF_TYPE), F.lit(CSVW + "Row"), F.lit("iri"), F.lit(""), F.lit("")),
            triple(row_node, F.lit(CSVW + "rownum"), F.col(_ROW).cast("string"),
                   F.lit("literal"), F.lit(XSD + "integer"), F.lit("")),
            triple(row_node, F.lit(CSVW + "url"),
                   F.concat(F.lit(url + "#row="), F.col(_SRC_ROW).cast("string")),
                   F.lit("iri"), F.lit(""), F.lit("")),
        )
    ]
    # T7 rowTitles → csvw:title (convertor.ts:650-667): each rowTitles entry
    # names a column; its row-record value becomes a (possibly language-
    # tagged) title literal, skipped when empty (the reference's truthy
    # check). Unknown names have no rowRecord entry → skipped at plan time.
    for title in table.rowTitles:
        rname = rec_col.get(title)
        if rname is None:
            continue
        col = next((c for c in table.columns if c.name == title), None)
        lang = (col.lang or "") if col else ""
        val = F.col(rname)
        t = triple(row_node, F.lit(CSVW + "title"), val,
                   F.lit("literal"), F.lit(""), F.lit(lang))
        scaffold.append(
            F.when(val.isNotNull() & (val != ""), F.array(t))
            .otherwise(F.array().cast(_EMPTY_TRIPLES)))

    # csvw:describes → each distinct subject of the row (deduped by template)
    seen: set[str] = set()
    for col in table.columns:
        if col.suppressOutput:
            continue
        key = col.aboutUrl or ""
        if key in seen:
            continue
        seen.add(key)
        if col.aboutUrl in subjects:
            subj = subjects[col.aboutUrl]
        elif col.aboutUrl:
            subj = compile_template(col.aboutUrl,
                                    {**record, "_name": F.lit(col.name)}, base=url)
        else:
            subj = _default_subject(url)
        kind = F.lit("iri") if col.aboutUrl else F.lit("bnode")
        scaffold.append(F.array(triple(row_node, F.lit(CSVW + "describes"), subj, kind,
                                       F.lit(""), F.lit(""))))

    row_triples = _staged_explode(df, per_col + scaffold, [])

    spark = df.sparkSession
    group_node_id = "_:skgroup"
    table_consts = spark.range(1).select(
        F.explode(F.array(
            triple(table_node, F.lit(RDF_TYPE), F.lit(CSVW + "Table"), F.lit("iri"), F.lit(""), F.lit("")),
            triple(table_node, F.lit(CSVW + "url"), F.lit(url), F.lit("iri"), F.lit(""), F.lit("")),
            triple(F.lit(group_node_id), F.lit(RDF_TYPE), F.lit(CSVW + "TableGroup"), F.lit("iri"), F.lit(""), F.lit("")),
            triple(F.lit(group_node_id), F.lit(CSVW + "table"), table_node, F.lit("bnode"), F.lit(""), F.lit("")),
        )).alias("t")).select("t.*")
    out = row_triples.unionByName(table_consts)

    # T8: external (non-CSVW) descriptor annotations on the table node
    if table.external:
        from ..functions.terms import skolem_value
        from .external_props import external_triples
        ext = external_triples(table.external, skolem_value(url, "table"),
                               base=url, default_lang=default_lang)
        if ext:
            out = out.unionByName(spark.createDataFrame(
                ext, "subj string, pred string, obj_lex string, obj_kind string, "
                     "obj_dtype string, obj_lang string, graph string"))
    return out


def apply_template_iris(triples: DataFrame) -> DataFrame:
    """The reference's default ``templateIris: true`` post-pass
    (convertor.ts:1235-1243): IDN-decode hostnames + JS-decodeURI every IRI
    term (subjects, predicates, IRI objects; skolem bnodes untouched).

    Opt-in here (the engine default keeps RFC-encoded IRIs — encoded forms
    are join-stable and round-trip through NT serialization); Arrow-batched
    pandas UDF, one narrow projection."""
    from ..functions.uritemplate import template_iris_udf
    dec = template_iris_udf()
    return (triples
            .withColumn("subj", F.when(F.col("subj").startswith("_:"),
                                       F.col("subj")).otherwise(dec("subj")))
            .withColumn("pred", dec("pred"))
            .withColumn("obj_lex", F.when(F.col("obj_kind") == "iri",
                                          dec("obj_lex"))
                        .otherwise(F.col("obj_lex"))))


def group_to_triples(dfs: dict[str, DataFrame], group, *, minimal: bool = True,
                     default_lang: str = "",
                     allow_arrival_order: bool = False) -> DataFrame:
    """Convert every (non-suppressed) table of a TableGroupSpec and union.

    Standard mode also re-emits group-scope external annotations on the
    group node (T8 at TableGroup scope; convertor.ts:177-211
    emitExternalProps(descriptor, groupNode))."""
    out: DataFrame | None = None
    spark = None
    for t in group.tables:
        if t.suppressOutput:
            continue
        spark = dfs[t.url].sparkSession
        part = table_to_triples(dfs[t.url], t, minimal=minimal,
                                allow_arrival_order=allow_arrival_order)
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("no unsuppressed tables")
    if not minimal and getattr(group, "external", ()):
        from .external_props import external_triples
        ext = external_triples(group.external, "_:skgroup",
                               base=group.base, default_lang=default_lang)
        if ext:
            out = out.unionByName(spark.createDataFrame(
                ext, "subj string, pred string, obj_lex string, obj_kind string, "
                     "obj_dtype string, obj_lang string, graph string"))
    return out


def issues(df: DataFrame, table: TableSpec,
           allow_arrival_order: bool = False) -> DataFrame:
    """Side-output issues DF: required-cell violations with (table,row,column)
    location (reference: utils/issue-tracker.ts:34-126)."""
    df = _row_numbers(df, table, allow_arrival_order=allow_arrival_order)
    checks = []
    for col in table.columns:
        if col.virtual or not col.required:
            continue
        src = col.source or col.name
        checks.append(F.when(
            cells.required_violation(F.col(src), col),
            F.struct(F.lit(table.url).alias("table"), F.col(_ROW).alias("row"),
                     F.lit(col.name).alias("column"),
                     F.lit("required cell is null").alias("message"))))
    if not checks:
        return df.sparkSession.createDataFrame(
            [], "table string, row long, column string, message string")
    arr = F.array_compact(F.array(*checks))
    return df.select(F.explode(arr).alias("i")).select("i.*")
