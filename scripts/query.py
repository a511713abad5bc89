"""Query an index warehouse: the spark-submit twin of examples/quest.cc.

    spark-submit --py-files xapian_spark.zip scripts/query.py \
        --index /data/index --query "error AND handling" -k 10

--engine wand uses the blocked/block-max path (free-text OR only);
--engine planner evaluates the full boolean/positional AST.
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
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True, action="append",
                    help="repeatable; multiple queries run as one batch")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--engine", default="planner",
                    choices=["planner", "wand"])
    ap.add_argument("--weight", default="bm25")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("xapian-spark-query").getOrCreate()
    from xapian_spark.index import merge
    from xapian_spark.query.parser import QueryParser
    from xapian_spark.query.planner import Planner
    from xapian_spark.query.wand import wand_topk
    from xapian_spark.ranking.weights import WEIGHT_SCHEMES

    idx = merge.read_warehouse(spark, args.index)
    weight = WEIGHT_SCHEMES[args.weight]()
    parser = QueryParser()
    out = []
    for qstr in args.query:
        t0 = time.perf_counter()
        if args.engine == "wand":
            terms = [t.term for t in parser.parse_free_text(qstr)]
            tstats = idx.collect_term_stats(sorted(set(terms)))
            res = (
                wand_topk(idx.blocked, idx.stats, tstats, terms, args.k, weight)
                .orderBy(F.desc("score"), "docid").limit(args.k).collect()
            )
        else:
            node = parser.parse_query(qstr)
            res = Planner(idx, weight).search(node, k=args.k).collect()
        out.append({
            "query": qstr,
            "elapsed_sec": round(time.perf_counter() - t0, 4),
            "hits": [
                {"docid": r["docid"], "score": round(r["score"], 6)}
                for r in res
            ],
        })
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
