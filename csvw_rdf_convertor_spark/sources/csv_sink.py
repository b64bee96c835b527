"""CSV sink (S7): write reconstructed tables, one per inferred schema.

Reference: cli/src/lib/commands/rdf2csvw/handler.ts:97-154 — one CSV per
table, header per dialect, '' for nulls. Distributed via df.write.csv."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..spec import DialectSpec


def write_table_csv(df: DataFrame, path: str,
                    dialect: DialectSpec | None = None) -> None:
    d = dialect or DialectSpec()
    (df.na.fill("")
       .write.mode("overwrite")
       .option("sep", d.delimiter)
       .option("quote", d.quoteChar or '"')
       .option("escape", (d.quoteChar or '"') if d.doubleQuote else "\\")
       .option("header", str(d.header_row_count > 0).lower())
       .option("emptyValue", "")
       .csv(path))
