"""Build the index warehouse from a corpus parquet table.

The spark-submit twin of the reference's simpleindex.cc / omega omindex
surface (examples/simpleindex.cc:57-78):

    spark-submit --py-files xapian_spark.zip scripts/build_index.py \
        --input /data/corpus.parquet --output /data/index \
        --content-col content --id-col docid --n-ranges 64

Resumable: rerunning after a failure skips every committed stage/range
(see xapian_spark/index/merge.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="corpus source: a path (parquet/json/csv/text) or "
                    "an Iceberg catalog table name (the production path)")
    ap.add_argument("--format", default="auto",
                    choices=["auto", "iceberg", "parquet", "json", "csv",
                             "text"],
                    help="corpus format; auto = iceberg for catalog names, "
                    "else by file extension")
    ap.add_argument("--output", required=True, help="warehouse directory")
    ap.add_argument("--content-col", default="content")
    ap.add_argument("--id-col", default=None,
                    help="numeric 1-based docid column; derived if absent")
    ap.add_argument("--order-cols", default=None,
                    help="comma list for deterministic docid assignment")
    ap.add_argument("--mode", default="xapian", choices=["xapian", "simple"])
    ap.add_argument("--prefix-fields", default=None,
                    help="comma list col:PREFIX for boolean field terms")
    ap.add_argument("--n-ranges", type=int, default=8)
    ap.add_argument("--block-size", type=int, default=512)
    ap.add_argument("--docdata", default="copy",
                    choices=["copy", "reference"],
                    help="copy: rewrite source rows into the warehouse "
                    "(self-contained, the glass docdata shape); reference: "
                    "record the source path instead — at 10^12 files the "
                    "lake already holds the bytes (requires --id-col so "
                    "docids are derivable from the source alone)")
    ap.add_argument("--verify", action="store_true",
                    help="run xapian-check-style invariants after build")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("xapian-spark-build").getOrCreate()
    from xapian_spark.index import merge
    from xapian_spark.index.builder import assign_docids
    from xapian_spark.io.sources import read_corpus

    docs = read_corpus(
        spark, args.input, fmt=args.format, content_col=args.content_col
    )
    if args.id_col:
        docs = docs.withColumn("docid", F.col(args.id_col).cast("long"))
    else:
        order = (args.order_cols or docs.columns[0]).split(",")
        docs = assign_docids(docs, order)
    prefix_fields = None
    if args.prefix_fields:
        prefix_fields = dict(
            kv.split(":") for kv in args.prefix_fields.split(",")
        )
    if args.docdata == "reference" and not args.id_col:
        ap.error("--docdata reference requires --id-col (docids must be "
                 "derivable from the source table alone)")
    t0 = time.perf_counter()
    merge.build_warehouse(
        spark, docs, args.output,
        content_col=args.content_col, docid_col="docid", mode=args.mode,
        prefix_fields=prefix_fields, n_ranges=args.n_ranges,
        block_size=args.block_size,
        docdata=args.docdata,
        docdata_source=args.input if args.docdata == "reference" else None,
        docdata_source_docid_col=args.id_col,
    )
    elapsed = time.perf_counter() - t0
    n = docs.count()
    report = {
        "docs": n, "elapsed_sec": round(elapsed, 3),
        "docs_per_sec": round(n / elapsed, 1),
        "complete": merge.warehouse_complete(args.output),
    }
    if args.verify:
        report["invariants"] = merge.verify_invariants(
            spark, args.output, docs,
            content_col=args.content_col, docid_col="docid",
        )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
