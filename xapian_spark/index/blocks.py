"""Blocked, delta+VByte-compressed posting lists with skip metadata.

Logical mirror of the reference's postlist layout — not byte-for-byte:

- VByte: LSB-first 7-bit varints, continuation bit 0x80
  (`xapian-core/common/pack.h:294-360`).
- Chunking: bounded blocks keyed (term, first_docid), docids stored as
  (delta - 1) after the first — `glass_postlist.cc:219-329`,
  `pack_glass_postlist_key` (`pack.h:569-594`); a filter on
  (first_docid, last_docid) replaces the B-tree key seek for skip_to.
- Per-block exact `wdf_max` for block-max pruning, the honey-backend
  design (`honey_postlist_encodings.h:26-111`); glass derives a looser
  bound (`glass_postlist.cc:151-191`) — we follow honey.

Blocked table schema (one row per block):
  term        string   (block key part 1)
  first_docid long     (block key part 2; parquet min/max prunable)
  last_docid  long
  n           int      postings in block
  wdf_max     int      exact max wdf within block
  payload     binary   vbyte([d0, delta1-1, ..., w0..wn-1, l0..ln-1])
                       docid deltas, then wdfs, then doclens

Doclens are denormalized into the payload so BM25 scoring from blocks
needs no doclen join (same locality trick as the doclen postlist living
in the postlist table, glass_postlist.h:53-56).

Encode/decode are vectorized numpy inside Arrow-batched mapInPandas —
no per-row Python in the build or query hot path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK_SCHEMA = (
    "term string, first_docid long, last_docid long, n int, "
    "wdf_max int, payload binary"
)

DEFAULT_BLOCK = 512  # postings per block (~ CHUNKSIZE=2000 bytes in glass)


# -- VByte (vectorized) ------------------------------------------------------


def vbyte_encode(values: np.ndarray) -> bytes:
    """LSB-first 7-bit varint encode of a uint64 array (pack.h:294-305)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: 1 + floor(log128(v))
    nbytes = np.ones(v.shape, dtype=np.int64)
    rest = v >> np.uint64(7)
    while rest.any():
        nbytes += (rest > 0).astype(np.int64)
        rest >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # write position of each value's first byte
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    cur = v.copy()
    offset = np.zeros(v.shape, dtype=np.int64)
    remaining = nbytes.copy()
    while (remaining > 0).any():
        mask = remaining > 0
        b = (cur[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (remaining[mask] > 1).astype(np.uint8) * np.uint8(0x80)
        out[starts[mask] + offset[mask]] = b | cont
        cur[mask] >>= np.uint64(7)
        offset[mask] += 1
        remaining[mask] -= 1
    return out.tobytes()


def vbyte_decode(buf: bytes) -> np.ndarray:
    """Decode an LSB-first varint stream to uint64 (pack.h:325-360)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # value id for each byte: number of completed values before it
    vid = np.concatenate(([0], np.cumsum(is_last)[:-1]))
    # position within its value
    starts = np.concatenate(([0], np.nonzero(is_last)[0][:-1] + 1))
    pos = np.arange(b.size) - starts[vid]
    nvals = int(is_last.sum())
    out = np.zeros(nvals, dtype=np.uint64)
    np.add.at(
        out, vid, (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    )
    return out


# -- block pack / unpack -----------------------------------------------------


def _pack_group(
    term: str,
    docids: np.ndarray,
    wdfs: np.ndarray,
    doclens: np.ndarray,
    block_size: int,
) -> list[tuple]:
    """Pack one term's docid-sorted postings into block rows."""
    if len(docids) > 1 and np.any(docids[1:] == docids[:-1]):
        # duplicate (term, docid) postings would underflow the delta-1
        # coding (uint64 wrap -> corrupt docids for the rest of the
        # block).  The inverter emits unique terms per doc, so this is
        # defensive: collapse duplicates by summing wdf, keeping the
        # first doclen
        keep = np.concatenate(([True], docids[1:] != docids[:-1]))
        grp = np.cumsum(keep) - 1
        wdf_sum = np.zeros(int(keep.sum()), dtype=np.int64)
        np.add.at(wdf_sum, grp, wdfs.astype(np.int64))
        docids, wdfs, doclens = docids[keep], wdf_sum, doclens[keep]
    rows = []
    for s in range(0, len(docids), block_size):
        d = docids[s : s + block_size]
        w = wdfs[s : s + block_size]
        ln = doclens[s : s + block_size]
        deltas = np.empty(len(d), dtype=np.uint64)
        deltas[0] = d[0]
        if len(d) > 1:
            # delta - 1: consecutive docids encode as 0 (glass
            # read_did_increase, glass_postlist.cc:106-113)
            deltas[1:] = (d[1:] - d[:-1] - 1).astype(np.uint64)
        ints = np.concatenate(
            [deltas, w.astype(np.uint64), ln.astype(np.uint64)]
        )
        rows.append(
            (
                term,
                int(d[0]),
                int(d[-1]),
                int(len(d)),
                int(w.max()),
                vbyte_encode(ints),
            )
        )
    return rows


def pack_blocks_udf(block_size: int = DEFAULT_BLOCK):
    """mapInPandas fn over (term, docid, wdf, doclen) sorted by (term, docid)
    within each partition: emits block rows.

    Streams through the partition carrying at most one term's pending
    postings, so memory stays bounded even for stopword-class hot terms
    (partition boundaries may split a term; each side emits its own blocks,
    exactly like the multiple sorted runs merged by xapian-compact,
    glass_compact.cc:80-340)."""

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pend_term: str | None = None
        pend: list[pd.DataFrame] | None = None

        def flush() -> pd.DataFrame | None:
            nonlocal pend_term, pend
            if pend_term is None:
                return None
            g = pd.concat(pend, ignore_index=True) if len(pend) > 1 else pend[0]
            rows = _pack_group(
                pend_term,
                g["docid"].to_numpy(np.int64),
                g["wdf"].to_numpy(np.int64),
                g["doclen"].to_numpy(np.int64),
                block_size,
            )
            pend_term, pend = None, None
            return pd.DataFrame(
                rows,
                columns=[
                    "term", "first_docid", "last_docid", "n", "wdf_max",
                    "payload",
                ],
            )

        for batch in batches:
            if batch.empty:
                continue
            terms = batch["term"].to_numpy()
            # group boundaries within the batch (input is sorted by term)
            change = np.nonzero(terms[1:] != terms[:-1])[0] + 1
            bounds = np.concatenate(([0], change, [len(terms)]))
            outs = []
            for i in range(len(bounds) - 1):
                seg = batch.iloc[bounds[i] : bounds[i + 1]]
                t = terms[bounds[i]]
                if pend_term is not None and t != pend_term:
                    f = flush()
                    if f is not None:
                        outs.append(f)
                if pend_term is None:
                    pend_term, pend = t, [seg]
                else:
                    pend.append(seg)
                # everything but the final segment of the batch is complete
                if i < len(bounds) - 2:
                    f = flush()
                    if f is not None:
                        outs.append(f)
            if outs:
                yield pd.concat(outs, ignore_index=True)
        f = flush()
        if f is not None:
            yield f

    return pack


def pack_blocks(
    postings: DataFrame,
    block_size: int = DEFAULT_BLOCK,
    num_ranges: int | None = None,
) -> DataFrame:
    """(term, docid, wdf, doclen) -> blocked table.

    Explicit term-hash-range layout: repartitionByRange(term, docid) gives
    each task a contiguous (term, docid) range — hot terms span several
    tasks (built-in salting by docid range), cold terms pack densely.
    """
    parts = num_ranges or postings.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    return (
        postings.select("term", "docid", "wdf", "doclen")
        .repartitionByRange(int(parts), "term", "docid")
        .sortWithinPartitions("term", "docid")
        .mapInPandas(pack_blocks_udf(block_size), BLOCK_SCHEMA)
    )


def _decode_block_batch(batch: pd.DataFrame) -> dict[str, np.ndarray]:
    """Vectorized decode of a whole Arrow batch of block rows.

    One vbyte_decode over the concatenated payloads (every payload ends on
    a value boundary, so decode(concat) == concat(decode(each))), then pure
    numpy segment arithmetic — no per-block Python loop in the query hot
    path (the glass cursor decodes chunk-at-a-time, glass_postlist.cc:
    219-329; we decode batch-at-a-time).
    """
    ns = batch["n"].to_numpy(np.int64)
    ints = vbyte_decode(b"".join(batch["payload"]))
    nblocks = len(ns)
    total = int(ns.sum())
    # flat layout per block i: [deltas(n_i), wdfs(n_i), doclens(n_i)]
    starts3 = np.zeros(nblocks, dtype=np.int64)
    pstarts = np.zeros(nblocks, dtype=np.int64)
    if nblocks > 1:
        np.cumsum(3 * ns[:-1], out=starts3[1:])
        np.cumsum(ns[:-1], out=pstarts[1:])
    block_of = np.repeat(np.arange(nblocks), ns)
    within = np.arange(total, dtype=np.int64) - pstarts[block_of]
    delta_idx = starts3[block_of] + within
    n_rep = ns[block_of]
    deltas = ints[delta_idx].astype(np.int64)
    wdfs = ints[delta_idx + n_rep].astype(np.int64)
    doclens = ints[delta_idx + 2 * n_rep].astype(np.int64)
    # docid reconstruction: within a block d = segmented_cumsum(delta+1) - 1
    c = np.cumsum(deltas + 1)
    seg_base = np.zeros(nblocks, dtype=np.int64)
    if nblocks > 1:
        seg_base[1:] = c[pstarts[1:] - 1]
    docids = c - seg_base[block_of] - 1
    return {
        "term": np.repeat(batch["term"].to_numpy(), ns),
        "first_docid": np.repeat(
            batch["first_docid"].to_numpy(np.int64), ns
        ),
        "docid": docids,
        "wdf": wdfs,
        "doclen": doclens,
    }


def unpack_blocks_udf():
    """mapInPandas fn: block rows -> (term, docid, wdf, doclen) postings."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if batch.empty:
                continue
            cols = _decode_block_batch(batch)
            yield pd.DataFrame(
                {
                    "term": cols["term"],
                    "docid": cols["docid"],
                    "wdf": cols["wdf"],
                    "doclen": cols["doclen"],
                }
            )

    return unpack


def unpack_blocks(blocked: DataFrame) -> DataFrame:
    return blocked.mapInPandas(
        unpack_blocks_udf(), "term string, docid long, wdf int, doclen long"
    )


def unpack_blocks_keyed(blocked: DataFrame) -> DataFrame:
    """Like unpack_blocks but keeps the block key (first_docid) on every
    posting row, so postings can be joined back to per-query surviving-
    block sets (the batched block-max path, query/wand.py)."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if batch.empty:
                continue
            yield pd.DataFrame(_decode_block_batch(batch))

    return blocked.mapInPandas(
        unpack,
        "term string, first_docid long, docid long, wdf int, doclen long",
    )
