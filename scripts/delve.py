"""Inspect an index warehouse: the spark-submit twin of xapian-delve
(xapian-core/bin/xapian-delve.cc).

    spark-submit --py-files xapian_spark.zip scripts/delve.py --index /idx
    ... --index /idx -r 42          # show document 42 (data + termlist)
    ... --index /idx -t error       # show term stats + postings
    ... --index /idx -t error -r 42 # positions of 'error' in doc 42
    ... --index /idx -a -p Z        # all terms (optionally prefixed)
    ... --index /idx -m             # user metadata
    ... --index /idx -s lang        # value slot / column stream
    ... --index /idx --check        # structural invariants (xapian-check)

Output is line-oriented like the reference tool; every listing is a
driver-side capped view over the distributed tables (see the SCALE
CONTRACT notes on the Database accessors).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("-r", "--record", type=int, action="append",
                    help="show document docid (repeatable)")
    ap.add_argument("-t", "--term", help="show term stats + postings")
    ap.add_argument("-a", "--all-terms", action="store_true",
                    help="list dictionary terms")
    ap.add_argument("-p", "--prefix", default="",
                    help="prefix filter for -a")
    ap.add_argument("-m", "--metadata", action="store_true",
                    help="list user metadata")
    ap.add_argument("-s", "--slot", help="list a value slot/column stream")
    ap.add_argument("--check", action="store_true",
                    help="run xapian-check structural invariants")
    ap.add_argument("--limit", type=int, default=1000)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("xapian-spark-delve").getOrCreate()
    from xapian_spark.api import Database

    db = Database(spark, args.index)

    print(f"UUID = {db.get_uuid()}")
    print(f"revision = {db.get_revision()}")
    print(f"number of documents = {db.get_doccount()}")
    print(f"average document length = {db.get_avlength():.6g}")
    print(f"document length lower bound = "
          f"{db.index.stats.doclen_lower_bound}")
    print(f"document length upper bound = "
          f"{db.index.stats.doclen_upper_bound}")
    print(f"highest document id ever used = {db.get_lastdocid()}")
    print(f"has positional information = {db.has_positions()}")

    if args.term and args.record:
        for did in args.record:
            pos = db.positionlist(did, args.term)
            print(f"Positions of '{args.term}' in record #{did}: "
                  + " ".join(map(str, pos)))
    elif args.term:
        print(f"term '{args.term}': termfreq {db.get_termfreq(args.term)}, "
              f"collection freq {db.get_collection_freq(args.term)}, "
              f"wdf upper bound {db.get_wdf_upper_bound(args.term)}")
        for did, wdf in db.postlist(args.term, limit=args.limit):
            print(f"  docid {did} wdf {wdf}")
    elif args.record:
        for did in args.record:
            doc = db.get_document(did)
            print(f"Record #{did}: {json.dumps(doc, default=str)}")
            print(f"doclength {db.get_doclength(did)}, "
                  f"unique terms {db.get_unique_terms(did)}")
            print("Term List:")
            for term, wdf, positions in db.termlist(did):
                p = (":" + ",".join(map(str, positions))) if positions else ""
                print(f"  {term} wdf={wdf}{p}")

    if args.all_terms:
        print("All terms:" + (f" (prefix {args.prefix!r})"
                              if args.prefix else ""))
        for t in db.allterms(prefix=args.prefix, limit=args.limit):
            print(f"  {t}")

    if args.metadata:
        print("User metadata:")
        for k in db.metadata_keys():
            print(f"  {k} -> {db.get_metadata(k)!r}")

    if args.slot:
        print(f"Value slot {args.slot!r}:")
        for did, v in db.valuestream(args.slot, limit=args.limit):
            print(f"  docid {did} -> {v!r}")

    if args.check:
        rep = db.check()
        print("xapian-check invariants:", json.dumps(rep))
        if any(rep.values()):
            sys.exit(1)


if __name__ == "__main__":
    main()
