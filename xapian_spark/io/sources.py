"""Corpus sources / sinks.

The reference ingests documents one at a time through application code
(examples/simpleindex.cc:57-78 reads stdin paragraphs; omega's omindex
walks filesystems).  The Spark-native ingest surface is a TABLE: the
north-star input shape is an Iceberg table of source-code files
(repo, path, commit, lang, content) — at 10^12 rows the reader must
supply partition pruning + column pruning + predicate pushdown, which
Iceberg/parquet give us via the DataSource V2 API for free.

`read_corpus` normalizes the supported formats to that shape and is the
single entry the build pipeline consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def read_corpus(
    spark: SparkSession,
    source: str,
    fmt: str = "auto",
    content_col: str = "content",
) -> DataFrame:
    """Read a corpus table.

    fmt:
      - "iceberg": `source` is a catalog table name (catalog must be on the
        session: spark.sql.catalog.* confs + iceberg runtime jar). The
        production path for the 10^12-file posture — snapshot isolation and
        partition pruning come from the table format.
      - "parquet" / "json" / "csv": `source` is a path.
      - "text": one doc per line, content only.
      - "auto": iceberg if `source` has no '/', else by file extension.
    """
    if fmt == "auto":
        if "/" not in source:
            fmt = "iceberg"
        elif source.endswith((".json", ".jsonl", ".ndjson")):
            fmt = "json"
        elif source.endswith(".csv"):
            fmt = "csv"
        elif source.endswith(".txt"):
            fmt = "text"
        else:
            fmt = "parquet"
    if fmt == "iceberg":
        df = spark.read.table(source)
    elif fmt == "parquet":
        df = spark.read.parquet(source)
    elif fmt == "json":
        df = spark.read.json(source)
    elif fmt == "csv":
        df = spark.read.option("header", "true").csv(source)
    elif fmt == "text":
        df = spark.read.text(source).withColumnRenamed("value", content_col)
    else:
        raise ValueError(f"unsupported format: {fmt}")
    if content_col not in df.columns:
        raise ValueError(
            f"corpus is missing content column {content_col!r}: {df.columns}"
        )
    return df


def with_content_hash(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach the content_sha256 row invariant (BASELINE input_hint)."""
    return df.withColumn(
        "content_sha256", F.sha2(F.col(content_col).cast("binary"), 256)
    )


def write_corpus(
    df: DataFrame, path: str, fmt: str = "parquet", partition_by: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true")  # read_corpus reads with header
    if partition_by:
        w = w.partitionBy(*partition_by)
    getattr(w, fmt)(path)
