"""Multi-source compaction — the `xapian-compact` tool / xapian::Compactor
API (compactor.h, bin/xapian-compact.cc) re-expressed over warehouses.

The reference merges several glass databases into one with a k-way
priority-queue merge per table, renumbering docids contiguously (source 2
offset by source 1's docid range, and so on) unless --no-renumber, calling
a user-overridable `set_status(table, status)` per step and
`resolve_duplicate_metadata(key, values)` on user-metadata conflicts.

Spark-first: the merge of posting data IS the checkpointed stage pipeline
(merge._stages_1_to_3) run over the UNION of the sources' termlists with a
JVM-side docid offset expression — the shuffle performs the k-way merge
the reference does file-at-a-time, and every stage stays resumable with
per-partition lineage, which is what a 10^12-file compaction needs.
Side tables (docdata, synonyms, spellings, metadata) fold with
union/groupBy plans.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xapian_spark.index import merge as m


class Compactor:
    """xapian::Compactor (compactor.h:40-150).

    Usage (mirrors the reference)::

        c = Compactor(spark)
        c.add_source("/idx/shard1")
        c.add_source("/idx/shard2")
        c.set_destdir("/idx/combined")
        c.compact()

    Subclass and override set_status / resolve_duplicate_metadata for
    progress reporting and metadata conflict resolution.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._sources: list[str] = []
        self._destdir: str | None = None
        self._renumber = True
        self._n_ranges = 8
        self._block_size = 512

    def add_source(self, path: str) -> None:
        """Compactor::add_source: a committed warehouse to merge."""
        if not m.warehouse_complete(path):
            raise ValueError(f"{path} is not a committed warehouse")
        self._sources.append(path)

    def set_destdir(self, path: str) -> None:
        self._destdir = path

    def set_renumber(self, renumber: bool) -> None:
        """--no-renumber analogue: keep source docids (sources' docid
        ranges must not overlap; checked)."""
        self._renumber = renumber

    def set_status(self, table: str, status: str) -> None:
        """Progress callback (Compactor::set_status): override to report.
        Called with (table, "begin"/"done") per folded table."""

    def resolve_duplicate_metadata(self, key: str,
                                   values: list[str]) -> str:
        """Compactor::resolve_duplicate_metadata: called when several
        sources define the same user-metadata key with different values.
        Default: the first source wins (the reference's default keeps the
        value from the first database)."""
        return values[0]

    # -- internals ---------------------------------------------------------

    def _offsets(self) -> list[int]:
        """Contiguous renumber offsets: source i's docids shift by the
        cumulative max docid of sources 0..i-1 (xapian-compact's default
        renumbering).  One tiny agg job per source over doclens."""
        offs, cum = [], 0
        for path in self._sources:
            offs.append(cum)
            hi = (
                self.spark.read.parquet(os.path.join(path, "doclens"))
                .agg(F.coalesce(F.max("docid"), F.lit(0)).alias("m"))
                .collect()[0]["m"]
            )
            delta_dir = os.path.join(path, "delta")
            if os.path.exists(delta_dir):
                # uncompacted streamed adds may carry docids above the
                # base range
                hi2 = (
                    self.spark.read.parquet(delta_dir)
                    .agg(F.coalesce(F.max("docid"), F.lit(0)).alias("m"))
                    .collect()[0]["m"]
                )
                hi = max(int(hi), int(hi2))
            cum += int(hi)
        return offs

    def _check_disjoint(self) -> None:
        lo_hi = []
        for path in self._sources:
            r = (
                self.spark.read.parquet(os.path.join(path, "doclens"))
                .agg(F.min("docid").alias("lo"), F.max("docid").alias("hi"))
                .collect()[0]
            )
            lo_hi.append((r["lo"], r["hi"], path))
        lo_hi.sort()
        for (_, hi1, p1), (lo2, _, p2) in zip(lo_hi, lo_hi[1:]):
            if lo2 is not None and hi1 is not None and lo2 <= hi1:
                raise ValueError(
                    f"docid ranges overlap between {p1} and {p2}; "
                    "renumbering required"
                )

    def _fold_side_table(self, name: str, offsets: list[int],
                         remap_docid: bool) -> DataFrame | None:
        parts = []
        for i, path in enumerate(self._sources):
            d = os.path.join(path, name)
            if not os.path.exists(d):
                continue
            df = self.spark.read.parquet(d)
            if remap_docid and self._renumber:
                df = df.withColumn(
                    "docid",
                    (F.col("docid") + F.lit(offsets[i])).cast("long"),
                )
            parts.append(df)
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def compact(self) -> None:
        """Merge the sources into destdir and build every derived stage
        (checkpointed + resumable, like the single-source build)."""
        if not self._sources:
            raise ValueError("no sources added")
        if not self._destdir:
            raise ValueError("no destdir set")
        dest = self._destdir
        os.makedirs(dest, exist_ok=True)
        offsets = (
            self._offsets() if self._renumber else [0] * len(self._sources)
        )
        if not self._renumber:
            self._check_disjoint()

        modes = {
            m._read_meta(p, "termlists").get("tokenizer_mode", "xapian")
            for p in self._sources
        }
        if len(modes) > 1:
            raise ValueError(f"sources disagree on tokenizer mode: {modes}")
        mode = modes.pop()

        # postlist table == union of source LIVE termlist views (base
        # minus tombstoned/replaced docids plus delta rows — a compaction
        # must never resurrect a deleted doc or drop a replacement) with
        # the docid offset folded in as a JVM expression; stage 1's
        # repartitionByRange(term, docid) then IS the k-way merge
        self.set_status("postlist", "begin")
        if not m._done(dest, "termlists"):
            merged = None
            for i, path in enumerate(self._sources):
                tl = m.live_termlists(self.spark, path)
                if self._renumber:
                    tl = tl.withColumn(
                        "docid",
                        (F.col("docid") + F.lit(offsets[i])).cast("long"),
                    )
                merged = (
                    tl if merged is None
                    else merged.unionByName(tl, allowMissingColumns=True)
                )
            merged.write.mode("overwrite").parquet(
                os.path.join(dest, "termlists")
            )
            n = self.spark.read.parquet(
                os.path.join(dest, "termlists")
            ).count()
            m._commit(dest, "termlists", {
                "stage": 0, "rows": n, "tokenizer_mode": mode,
                "compacted_from": self._sources,
            })
        self.set_status("postlist", "done")

        self.set_status("docdata", "begin")
        if not m._done(dest, "docdata"):
            docs = None
            for i, path in enumerate(self._sources):
                d = m.live_docs(self.spark, path)
                if d is None:
                    continue
                if self._renumber:
                    d = d.withColumn(
                        "docid",
                        (F.col("docid") + F.lit(offsets[i])).cast("long"),
                    )
                docs = (
                    d if docs is None
                    else docs.unionByName(d, allowMissingColumns=True)
                )
            if docs is not None:
                docs.write.mode("overwrite").parquet(
                    os.path.join(dest, "docs")
                )
            m._commit(dest, "docdata", {"stage": "0b"})
        self.set_status("docdata", "done")

        self.set_status("synonyms", "begin")
        syn = self._fold_side_table("synonyms", offsets, remap_docid=False)
        if syn is not None and not os.path.exists(
            os.path.join(dest, "synonyms")
        ):
            syn.distinct().write.mode("overwrite").parquet(
                os.path.join(dest, "synonyms")
            )
        self.set_status("synonyms", "done")

        self.set_status("spelling", "begin")
        sp = self._fold_side_table("spellings", offsets, remap_docid=False)
        if sp is not None and not os.path.exists(
            os.path.join(dest, "spellings")
        ):
            sp.groupBy("term").agg(F.sum("tf").alias("tf")).where(
                F.col("tf") > 0
            ).write.mode("overwrite").parquet(
                os.path.join(dest, "spellings")
            )
        self.set_status("spelling", "done")

        self.set_status("metadata", "begin")
        mpath = os.path.join(dest, "metadata")
        if not os.path.exists(mpath):
            per_source = []
            for path in self._sources:
                d = os.path.join(path, "metadata")
                if os.path.exists(d):
                    per_source.append({
                        r["key"]: r["value"]
                        for r in self.spark.read.parquet(d).collect()
                    })
            folded: dict[str, str] = {}
            conflicts: dict[str, list[str]] = {}
            for src in per_source:
                for k, v in src.items():
                    conflicts.setdefault(k, []).append(v)
            for k, vs in conflicts.items():
                distinct = list(dict.fromkeys(vs))
                folded[k] = (
                    distinct[0] if len(distinct) == 1
                    else self.resolve_duplicate_metadata(k, distinct)
                )
            if folded:
                self.spark.createDataFrame(
                    list(folded.items()), "key string, value string"
                ).write.mode("overwrite").parquet(mpath)
        self.set_status("metadata", "done")

        self.set_status("postlist blocks + stats", "begin")
        m._stages_1_to_3(
            self.spark, dest, mode=mode,
            n_ranges=self._n_ranges, block_size=self._block_size,
        )
        self.set_status("postlist blocks + stats", "done")


def compact_databases(spark: SparkSession, sources: list[str],
                      destdir: str, renumber: bool = True) -> None:
    """Database::compact(destdir) convenience (database.h compact
    overloads) — merge `sources` into `destdir`."""
    c = Compactor(spark)
    for s in sources:
        c.add_source(s)
    c.set_destdir(destdir)
    c.set_renumber(renumber)
    c.compact()


__all__ = ["Compactor", "compact_databases"]
