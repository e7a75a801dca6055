"""Document-corpus sources/sinks for the training-data pipeline (E-layer).

The reference ingests only RDF serializations (SURVEY §2.2.6); the [EXT]
curation operators need the formats LLM corpora actually arrive in:

- JSONL (one JSON doc per line, optionally gzip-compressed) — the
  lingua franca of web-scale text dumps;
- CSV with full quoting (embedded commas/newlines/quotes);
- raw text files (one document per file).

Everything routes through ``spark.read`` so Catalyst keeps schema
pruning and predicate pushdown; no custom parsing in Python.

Scale notes: Spark parallelizes per file — and per split for
uncompressed/splittable inputs. A single big ``.gz`` file is NOT
byte-splittable (one task reads it all): large corpora should land as
many shards (the layout ``write_jsonl`` produces) — same guidance the
Turtle reader documents for non-splittable RDF input. ``mode="strict"``
(FAILFAST) aborts on malformed rows; the default PERMISSIVE mode
quarantines them in ``_corrupt_record`` so a 100 TB ingest survives a
bad shard and the bad rows remain auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
])


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(schema.fields
                        + [T.StructField("_corrupt_record", T.StringType())])


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType | None = None,
               mode: str = "permissive") -> DataFrame:
    """Read JSONL (optionally .gz) documents with an explicit schema —
    never schema inference, which at 100 TB means reading the data twice.

    ``mode="permissive"`` keeps malformed lines in ``_corrupt_record``
    (select it to audit, filter it to clean); ``mode="strict"`` fails
    fast on the first malformed line.
    """
    schema = schema or DOCUMENT_SCHEMA
    if mode == "strict":
        return (spark.read.schema(schema)
                .option("mode", "FAILFAST").json(path))
    return (spark.read.schema(_with_corrupt(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path))


def quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a permissive read into (good, bad) frames. Spark refuses to
    lazily query ONLY the internal corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the split pins the parsed
    batch with cache() — call .unpersist() on either side when done."""
    df = df.cache()
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    good = (df.filter(F.col("_corrupt_record").isNull())
            .drop("_corrupt_record"))
    return good, bad


def read_csv_documents(spark: SparkSession, path: str,
                       schema: T.StructType | None = None) -> DataFrame:
    """CSV with full RFC-4180 quoting (embedded commas, quotes, and
    newlines inside quoted fields — ``multiLine`` so records may span
    physical lines)."""
    return (spark.read.schema(schema or DOCUMENT_SCHEMA)
            .option("header", "true")
            .option("multiLine", "true")
            .option("quote", '"').option("escape", '"')
            .csv(path))


def read_text_documents(spark: SparkSession, path: str) -> DataFrame:
    """One document per FILE (wholetext) with the file path as id —
    the layout crawl dumps and book corpora use."""
    return (spark.read.text(path, wholetext=True)
            .select(F.input_file_name().alias("path"),
                    F.col("value").alias("text")))


def write_jsonl(df: DataFrame, path: str, shards: int | None = None,
                compression: str | None = None) -> None:
    """Write a document table as JSONL shards. ``shards`` controls file
    count (range-partitioned by doc_id when present, so shard contents
    are deterministic); gzip/zstd via ``compression``."""
    out = df
    if shards:
        out = (df.repartitionByRange(shards, "doc_id")
               if "doc_id" in df.columns else df.repartition(shards))
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
