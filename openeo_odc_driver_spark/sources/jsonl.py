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
