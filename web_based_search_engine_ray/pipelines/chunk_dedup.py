"""Corpus-wide chunk-level exact dedup (the C4 "discard any line seen
before" rule, generalized): split every doc into chunks, keep only the
globally-FIRST occurrence of each distinct chunk (order = (doc_id,
chunk_no)), and reassemble docs from their surviving chunks.

Chunking is pluggable: a delimiter (``delimiter="\\n"`` for real line
dedup) or — for corpora without line structure, like the synthetic
tables here — fixed ``chunk_tokens`` windows of the reference
tokenizer's tokens (original case; the reassembled text is the
canonical single-space join, documented normalization).

Scale shape:

- Chunking is one streaming ``map_batches`` (vectorized token split per
  doc, no shuffle), emitting ``(doc_id, chunk_no, chunk)`` rows.
- Keep-first is a ``groupby`` on ``hash(chunk) % num_buckets`` — the
  same bucketed keep-min shape as ``dedup.exact_dedup``; inside a
  bucket the winner per distinct chunk is a numpy lexsort +
  first-of-run over the whole bucket (no per-chunk Python).  Only
  bucket ids are hashed keys; chunk text rides the exchange once
  (unavoidable for exact semantics — the exchange IS the dataset, the
  same volume a sort would move).
- Reassembly is a second bucketed groupby on ``doc_id % num_buckets``
  with a per-bucket vectorized sort + frame join.  Docs whose every
  chunk was DEDUPLICATED away still appear (empty ``text_clean``);
  docs that produce zero chunks in the first place (empty or
  all-whitespace text) emit no chunk rows and are OMITTED from the
  output — the output is row-aligned with the set of chunkable input
  docs, not the raw input.

Both shuffles carry each surviving row exactly once; nothing
materializes on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from web_based_search_engine_ray.functions.hashing import fnv1a63_array
from web_based_search_engine_ray.functions.tokenize import TOKEN_RE


def _chunk_rows(batch: pa.Table, *, chunk_tokens: int,
                delimiter: str | None, text_col: str,
                id_col: str, num_buckets: int) -> pa.Table:
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_id: list[int] = []
    out_no: list[int] = []
    out_chunk: list[str] = []
    for i, t in zip(ids, batch[text_col].to_pylist()):
        if delimiter is not None:
            chunks = [c for c in t.split(delimiter) if c.strip()]
        else:
            toks = [x for x in TOKEN_RE.split(t) if x]
            chunks = [
                " ".join(toks[j:j + chunk_tokens])
                for j in range(0, len(toks), chunk_tokens)
            ]
        out_id.extend([int(i)] * len(chunks))
        out_no.extend(range(len(chunks)))
        out_chunk.extend(chunks)
    chunk_arr = pa.array(out_chunk, type=pa.string())
    bucket = (
        fnv1a63_array(chunk_arr) % np.int64(num_buckets)
        if len(out_chunk)
        else np.empty(0, dtype=np.int64)
    )
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "chunk_no": pa.array(out_no, type=pa.int64()),
            "chunk": chunk_arr,
            "bucket": pa.array(bucket, type=pa.int64()),
        }
    )


def _keep_first_in_bucket(group: pa.Table) -> pa.Table:
    """One distinct chunk → its (doc_id, chunk_no)-minimal occurrence.
    Whole-bucket numpy: sort by (chunk, doc_id, chunk_no), keep run
    heads."""
    chunks = np.asarray(group["chunk"].to_pylist(), dtype=object)
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    nos = group["chunk_no"].to_numpy(zero_copy_only=False)
    order = np.lexsort((nos, ids, chunks))
    sc = chunks[order]
    head = np.ones(len(sc), dtype=bool)
    head[1:] = sc[1:] != sc[:-1]
    win = order[head]
    return pa.table(
        {
            "doc_id": pa.array(ids[win], type=pa.int64()),
            "chunk_no": pa.array(nos[win], type=pa.int64()),
            "chunk": pa.array(chunks[win], type=pa.string()),
        }
    )


def _reassemble_bucket(group: pa.Table) -> pa.Table:
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    nos = group["chunk_no"].to_numpy(zero_copy_only=False)
    chunks = np.asarray(group["chunk"].to_pylist(), dtype=object)
    order = np.lexsort((nos, ids))
    ids, chunks = ids[order], chunks[order]
    new = np.ones(len(ids), dtype=bool)
    new[1:] = ids[1:] != ids[:-1]
    starts = np.flatnonzero(new)
    bounds = np.append(starts, len(ids))
    return pa.table(
        {
            "doc_id": pa.array(ids[starts], type=pa.int64()),
            "text_clean": pa.array(
                [
                    " ".join(chunks[a:b])
                    for a, b in zip(bounds[:-1], bounds[1:])
                ],
                type=pa.string(),
            ),
            "n_kept": pa.array(
                (bounds[1:] - bounds[:-1]).astype(np.int64),
                type=pa.int64(),
            ),
        }
    )


def chunk_dedup(docs, *, chunk_tokens: int = 16,
                delimiter: str | None = None,
                text_col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 64,
                max_group_rows: int | None = 8_000_000):
    """Dataset of ``(doc_id, text_clean, n_chunks, n_kept)`` — one row
    per CHUNKABLE input doc (a doc with empty/all-whitespace text
    yields no chunks and is omitted, mirrored by the SQL oracle);
    ``text_clean`` keeps only globally-first chunks (empty string when
    every chunk was seen earlier).

    Each chunk-hash bucket (and each doc-id bucket on reassembly) must
    fit one reducer; ``max_group_rows`` fails loud on a hot bucket
    (raise ``num_buckets`` to thin them)."""
    from web_based_search_engine_ray.util import check_group_budget

    def _guarded(fn, stage):
        def run(group: pa.Table) -> pa.Table:
            check_group_budget(
                len(group), max_group_rows, stage=stage,
                key=int(group["bucket"][0].as_py()) if len(group) else None,
                hint="raise num_buckets (thins chunk/doc buckets) or "
                     "max_group_rows",
            )
            return fn(group)
        return run
    chunks = docs.map_batches(
        lambda b: _chunk_rows(
            b,
            chunk_tokens=chunk_tokens,
            delimiter=delimiter,
            text_col=text_col,
            id_col=id_col,
            num_buckets=num_buckets,
        ),
        batch_format="pyarrow",
    )
    # per-doc chunk totals ride a tiny side aggregate (doc_id, n) — the
    # survivors alone can't reconstruct n_chunks
    from ray.data.aggregate import Count

    totals = chunks.groupby("doc_id").aggregate(Count(alias_name="n_chunks"))

    survivors = (
        chunks.groupby("bucket")
        .map_groups(_guarded(_keep_first_in_bucket, "chunk_dedup.keep_first"),
                    batch_format="pyarrow")
    )

    def docbucket(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket",
            pa.array(ids % np.int64(num_buckets), type=pa.int64()),
        )

    rebuilt = (
        survivors.map_batches(docbucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_guarded(_reassemble_bucket, "chunk_dedup.reassemble"),
                    batch_format="pyarrow")
    )

    # align with ALL input docs: left join totals ⟕ rebuilt on doc_id —
    # both sides are (doc_id)-keyed and already small-width; reuse the
    # bucketed map_groups join shape (sides padded to one schema so the
    # union is schema-stable)
    def pad_left(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chunks": b["n_chunks"],
                "text_clean": pa.nulls(n, type=pa.string()),
                "n_kept": pa.nulls(n, type=pa.int64()),
                "jb": pa.array(
                    ids % np.int64(num_buckets), type=pa.int64()
                ),
            }
        )

    def pad_right(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chunks": pa.nulls(n, type=pa.int64()),
                "text_clean": b["text_clean"],
                "n_kept": b["n_kept"],
                "jb": pa.array(
                    ids % np.int64(num_buckets), type=pa.int64()
                ),
            }
        )

    left = totals.map_batches(pad_left, batch_format="pyarrow")
    right = rebuilt.map_batches(pad_right, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lrows = group.filter(pc.is_valid(group["n_chunks"]))
        rrows = group.filter(pc.is_valid(group["text_clean"]))
        lid = lrows["doc_id"].to_numpy(zero_copy_only=False)
        nch = lrows["n_chunks"].to_numpy(zero_copy_only=False)
        order = np.argsort(lid, kind="mergesort")
        lid, nch = lid[order], nch[order]
        text = np.full(len(lid), "", dtype=object)
        nkept = np.zeros(len(lid), dtype=np.int64)
        if len(rrows):
            rid = rrows["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(lid, rid)
            text[pos] = np.asarray(
                rrows["text_clean"].to_pylist(), dtype=object
            )
            nkept[pos] = rrows["n_kept"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(lid, type=pa.int64()),
                "text_clean": pa.array(text, type=pa.string()),
                "n_chunks": pa.array(nch, type=pa.int64()),
                "n_kept": pa.array(nkept, type=pa.int64()),
            }
        )

    return (
        left.union(right)
        .groupby("jb")
        .map_groups(merge, batch_format="pyarrow")
    )
