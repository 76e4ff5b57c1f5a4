"""JSONL (newline-delimited JSON) corpus source/sink — the interchange
format LLM training corpora actually arrive in (one JSON object per
line, usually gzip members, e.g. the public Common-Crawl-derived text
dumps).

Spark's native json reader/writer handles JSONL line-per-record
natively and splits uncompressed files by range; gzip members are
per-file parallel (a 100 TB corpus arrives as many .gz shards, so the
scan still fans out file-parallel — the standard layout). An explicit
schema is mandatory on read: schema inference is a full extra pass over
100 TB and type-unstable across shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def write_documents_jsonl(
    docs: DataFrame, path: str, compression: str | None = "gzip"
) -> str:
    """Materialize a document set as JSONL (gzip by default — the wire
    format corpora ship in). One output file per input partition; pair
    with a ``repartition`` upstream when file count must be a layout
    parameter (the corpus-writer discipline)."""
    w = docs.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
    return path


def load_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Read a JSONL corpus with an EXPLICIT schema (never inference —
    see module docstring). Missing fields are null, the JSONL contract;
    corrupt lines land in Spark's default PERMISSIVE handling."""
    return spark.read.schema(schema).json(path)


def write_documents_csv(
    docs: DataFrame,
    path: str,
    sep: str = ",",
    compression: str | None = "gzip",
) -> str:
    """Materialize a document set as RFC-4180 CSV (gzip by default) —
    the other interchange format corpora arrive in. Spark's CSV writer
    defaults to backslash escaping; ``escape='"'`` pins doubled-quote
    escaping so standard CSV tooling (and our own reader) round-trips
    embedded quotes, commas, and newlines byte-exactly."""
    w = (
        docs.write.mode("overwrite")
        .option("header", True)
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        # fidelity over convention: keep padding bytes (the writer
        # trims by default) and make NULL distinguishable from the
        # empty string (both map to nothing otherwise)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)
    return path


def load_documents_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType = DOCUMENTS_SCHEMA,
    sep: str = ",",
) -> DataFrame:
    """Read a CSV corpus with an EXPLICIT schema (inference = an extra
    full pass, type-unstable). ``multiLine`` because document text
    embeds newlines; the cost is per-file (not per-split) parallelism
    on such files — corpora ship as many shards, so the scan still
    fans out file-parallel, the same story as gzip JSONL."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(path)
    )
