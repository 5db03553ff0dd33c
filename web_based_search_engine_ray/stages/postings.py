"""Posting extraction + segment encoding stages.

This is the Ray-Data re-expression of the reference's posting-list
build (``PostingIndex.addDocument``, ``PostingIndex.java:40-85``): the
per-document positional postings (positions kept separately for the
title field and the body field, ``Posting.java:9``) become delta-gap +
varbyte compressed *segment runs* built with a local-index-then-merge
plan:

1. :class:`TokenizeEncode` (actor pool) tokenizes a block of documents
   and encodes one posting *run* per term within the block — no shuffle
   touches raw (term, doc, positions) rows;
2. ``compact_bucket`` merges the compressed runs per term inside a
   term-hash-bucket groupby — the only term shuffle moves already
   compressed bytes.  Skew handling (Zipf head at web scale,
   SURVEY.md §4): a term's merged list is re-chunked into runs of at
   most ``max_run_docs`` docs, so no task ever materializes a
   mega-term's full posting list; the query side unions runs and
   df = Σ df_run.

The segment row schema is shared by both stages; all runs of a term
carry the same ``bucket`` (hash(term) % num_buckets), which the forward
/docstats derivation relies on (all runs of a term meet in one bucket
group, so Σ df_run there is the global df).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from web_based_search_engine_ray.config import IndexConfig
from web_based_search_engine_ray.functions.hashing import stable_hash63
from web_based_search_engine_ray.functions.stopwords import stopword_set
from web_based_search_engine_ray.functions.tokenize import TOKEN_RE, stem_word
from web_based_search_engine_ray.stages import codec

SEGMENT_SCHEMA = pa.schema(
    [
        ("doc_shard", pa.int32()),
        ("bucket", pa.int32()),
        ("part_key", pa.int64()),   # doc_shard * num_buckets + bucket
        ("term", pa.string()),
        ("run", pa.int32()),
        ("df_run", pa.int64()),
        ("doc_gaps", pa.binary()),
        ("title_tfs", pa.binary()),
        ("body_tfs", pa.binary()),
        ("title_pos", pa.binary()),
        ("body_pos", pa.binary()),
    ]
)


class PostingExtractor:
    """Actor-pool stage: documents → flat positional posting rows
    (``term, doc_id, title_positions, body_positions``).

    ``__init__`` holds per-actor state (stopword set, compiled regex) —
    once per actor, not per batch.
    """

    #: bound on the per-actor token→stem memo (Zipf vocabulary ⇒ the
    #: working set is tiny; the cap only guards pathological inputs)
    MEMO_CAP = 1_000_000

    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg
        self.stops = stopword_set() if cfg.use_stopwords else frozenset()
        self.re = TOKEN_RE
        self._memo: dict[str, str | None] = {}

    def _analyze(self, text: str) -> list[str]:
        cfg = self.cfg
        memo = self._memo
        out = []
        for tok in self.re.split(text):
            if not tok:
                continue
            if tok in memo:
                w = memo[tok]
            else:
                w = stem_word(
                    tok,
                    use_stopwords=cfg.use_stopwords,
                    use_stemming=cfg.use_stemming,
                    _stops=self.stops,
                )
                if len(memo) < self.MEMO_CAP:
                    memo[tok] = w
            if w is not None:
                out.append(w)
        return out

    def extract(self, batch: pa.Table):
        """→ (terms list, doc_ids, title_pos lists, body_pos lists)."""
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        titles = batch["title"].to_pylist()
        texts = batch["text"].to_pylist()
        terms: list[str] = []
        out_doc: list[int] = []
        tpos: list[list[int]] = []
        bpos: list[list[int]] = []
        for doc_id, title, text in zip(doc_ids, titles, texts):
            doc_id = int(doc_id)
            acc: dict[str, tuple[list[int], list[int]]] = {}
            for i, t in enumerate(self._analyze(title)):
                acc.setdefault(t, ([], []))[0].append(i)
            for i, t in enumerate(self._analyze(text)):
                acc.setdefault(t, ([], []))[1].append(i)
            for term, (tl, bl) in acc.items():
                terms.append(term)
                out_doc.append(doc_id)
                tpos.append(tl)
                bpos.append(bl)
        return terms, out_doc, tpos, bpos

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms, out_doc, tpos, bpos = self.extract(batch)
        return pa.table(
            {
                "term": pa.array(terms, type=pa.string()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "title_positions": pa.array(tpos, type=pa.list_(pa.int32())),
                "body_positions": pa.array(bpos, type=pa.list_(pa.int32())),
            }
        )


def _segment_table(rows: dict[str, list], shards, buckets, runs,
                   num_buckets: int) -> pa.Table:
    n = len(rows["term"])
    if not n:
        return SEGMENT_SCHEMA.empty_table()
    shards_np = np.asarray(shards, dtype=np.int64)
    buckets_np = np.asarray(buckets, dtype=np.int64)
    return pa.table(
        {
            "doc_shard": pa.array(shards_np, type=pa.int32()),
            "bucket": pa.array(buckets_np, type=pa.int32()),
            "part_key": pa.array(
                shards_np * num_buckets + buckets_np, type=pa.int64()
            ),
            "term": pa.array(rows["term"], type=pa.string()),
            "run": pa.array(runs, type=pa.int32()),
            "df_run": pa.array(rows["df_run"], type=pa.int64()),
            "doc_gaps": pa.array(rows["doc_gaps"], type=pa.binary()),
            "title_tfs": pa.array(rows["title_tfs"], type=pa.binary()),
            "body_tfs": pa.array(rows["body_tfs"], type=pa.binary()),
            "title_pos": pa.array(rows["title_pos"], type=pa.binary()),
            "body_pos": pa.array(rows["body_pos"], type=pa.binary()),
        },
        schema=SEGMENT_SCHEMA,
    )


class TokenizeEncode(PostingExtractor):
    """Actor-pool stage: documents block → one compressed posting run
    per term in the block (``SEGMENT_SCHEMA`` rows).  The reference's
    binary-search posting insertion (``PostingIndex.java:66-84``)
    becomes one sort + vectorized delta/varbyte encode per term."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms, out_doc, tpos, bpos = self.extract(batch)
        if not terms:
            return SEGMENT_SCHEMA.empty_table()
        terms_np = np.asarray(terms, dtype=object)
        docs_np = np.asarray(out_doc, dtype=np.int64)
        n_shards = max(1, self.cfg.doc_shards)
        shards_np = docs_np % n_shards
        order = np.lexsort((docs_np, terms_np, shards_np))
        terms_np, docs_np = terms_np[order], docs_np[order]
        shards_np = shards_np[order]
        tpos = [tpos[i] for i in order]
        bpos = [bpos[i] for i in order]

        new_term = np.ones(len(terms_np), dtype=bool)
        new_term[1:] = (terms_np[1:] != terms_np[:-1]) | (
            shards_np[1:] != shards_np[:-1]
        )
        starts = np.flatnonzero(new_term)
        ends = np.concatenate((starts[1:], [len(terms_np)]))
        sizes = ends - starts

        all_ttf = np.fromiter(map(len, tpos), np.int64, len(tpos))
        all_btf = np.fromiter(map(len, bpos), np.int64, len(bpos))

        rows = {k: [] for k in ("term", "df_run", "doc_gaps", "title_tfs",
                                "body_tfs", "title_pos", "body_pos")}
        buckets = []
        out_shards = []
        nb = self.cfg.num_buckets

        # --- fast path: single-doc runs (the Zipf tail is most of the
        # vocabulary) — one vectorized encode + bytes slicing instead of
        # six codec calls per term
        single = sizes == 1
        s_idx = starts[single]
        if s_idx.size:
            ones = np.ones(len(s_idx), dtype=np.int64)
            gap_blobs = codec.varbyte_encode_slices(
                docs_np[s_idx].astype(np.uint64), ones
            )
            ttfs_s = all_ttf[s_idx]
            btfs_s = all_btf[s_idx]
            ttf_blobs = codec.varbyte_encode_slices(
                ttfs_s.astype(np.uint64), ones
            )
            btf_blobs = codec.varbyte_encode_slices(
                btfs_s.astype(np.uint64), ones
            )
            tflat = (
                np.concatenate([np.asarray(tpos[i], np.int64) for i in s_idx])
                if ttfs_s.sum() else np.empty(0, np.int64)
            )
            bflat = (
                np.concatenate([np.asarray(bpos[i], np.int64) for i in s_idx])
                if btfs_s.sum() else np.empty(0, np.int64)
            )
            tpos_blobs = codec.varbyte_encode_slices(
                codec.delta_concat(tflat, ttfs_s), ttfs_s
            )
            bpos_blobs = codec.varbyte_encode_slices(
                codec.delta_concat(bflat, btfs_s), btfs_s
            )
            for j, i in enumerate(s_idx):
                term = str(terms_np[i])
                rows["term"].append(term)
                rows["df_run"].append(1)
                rows["doc_gaps"].append(gap_blobs[j])
                rows["title_tfs"].append(ttf_blobs[j])
                rows["body_tfs"].append(btf_blobs[j])
                rows["title_pos"].append(tpos_blobs[j])
                rows["body_pos"].append(bpos_blobs[j])
                buckets.append(stable_hash63(term) % nb)
                out_shards.append(int(shards_np[i]))

        # --- general path: multi-doc runs
        for s, e in zip(starts[~single], ends[~single]):
            term = str(terms_np[s])
            ids = docs_np[s:e]
            ttfs = all_ttf[s:e]
            btfs = all_btf[s:e]
            tflat = (
                np.concatenate([np.asarray(x, np.int64) for x in tpos[s:e]])
                if ttfs.sum() else np.empty(0, np.int64)
            )
            bflat = (
                np.concatenate([np.asarray(x, np.int64) for x in bpos[s:e]])
                if btfs.sum() else np.empty(0, np.int64)
            )
            rows["term"].append(term)
            rows["df_run"].append(int(e - s))
            rows["doc_gaps"].append(codec.encode_sorted(ids))
            rows["title_tfs"].append(codec.varbyte_encode(ttfs.astype(np.uint64)))
            rows["body_tfs"].append(codec.varbyte_encode(btfs.astype(np.uint64)))
            rows["title_pos"].append(codec.encode_concat_positions(tflat, ttfs))
            rows["body_pos"].append(codec.encode_concat_positions(bflat, btfs))
            buckets.append(stable_hash63(term) % nb)
            out_shards.append(int(shards_np[s]))
        run0 = int(docs_np[0] % (1 << 30))
        return _segment_table(
            rows, out_shards, buckets, [run0] * len(buckets), nb
        )


def compact_bucket(group: pa.Table, *, max_run_docs: int,
                   num_buckets: int) -> pa.Table:
    """``map_groups`` body for one (doc_shard, term-hash-bucket) group
    (``part_key``): merge each term's compressed runs into doc-sorted
    runs of ≤ ``max_run_docs`` docs.

    Single-run terms (the Zipf tail — the vast majority) pass through
    untouched.  For multi-run terms only doc-id gaps and tf arrays are
    decoded; per-doc POSITION payloads are never decoded — within-doc
    deltas are invariant under doc reordering, so position runs are
    spliced at byte level (``codec.varbyte_slice_points``)."""
    if group.num_rows == 0:
        return SEGMENT_SCHEMA.empty_table()
    terms_np = np.asarray(group["term"])
    order = np.argsort(terms_np, kind="stable")
    terms_np = terms_np[order]
    new_term = np.ones(len(terms_np), dtype=bool)
    new_term[1:] = terms_np[1:] != terms_np[:-1]
    starts = np.flatnonzero(new_term)
    ends = np.concatenate((starts[1:], [len(terms_np)]))

    passthrough_idx = []
    rows = {k: [] for k in ("term", "df_run", "doc_gaps", "title_tfs",
                            "body_tfs", "title_pos", "body_pos")}
    buckets, runs, shards = [], [], []
    bucket = int(group["bucket"][0].as_py())
    doc_shard = int(group["doc_shard"][0].as_py())

    gap_blobs = group["doc_gaps"].to_pylist()
    ttf_blobs = group["title_tfs"].to_pylist()
    btf_blobs = group["body_tfs"].to_pylist()
    tpos_blobs = group["title_pos"].to_pylist()
    bpos_blobs = group["body_pos"].to_pylist()

    for s, e in zip(starts, ends):
        idxs = order[s:e]
        if e - s == 1:
            passthrough_idx.append(int(idxs[0]))
            continue
        term = str(terms_np[s])
        ids_parts, ttf_parts, btf_parts = [], [], []
        tpos_pieces: list[bytes] = []  # per-doc byte slices, run order
        bpos_pieces: list[bytes] = []
        for i in idxs:
            i = int(i)
            ids = codec.decode_sorted(gap_blobs[i])
            ttfs = codec.varbyte_decode(ttf_blobs[i]).astype(np.int64)
            btfs = codec.varbyte_decode(btf_blobs[i]).astype(np.int64)
            ids_parts.append(ids)
            ttf_parts.append(ttfs)
            btf_parts.append(btfs)
            tb = tpos_blobs[i]
            bb = bpos_blobs[i]
            tcuts = codec.varbyte_slice_points(tb, ttfs)
            bcuts = codec.varbyte_slice_points(bb, btfs)
            tpos_pieces.extend(
                tb[tcuts[j]:tcuts[j + 1]] for j in range(len(ids))
            )
            bpos_pieces.extend(
                bb[bcuts[j]:bcuts[j + 1]] for j in range(len(ids))
            )
        ids = np.concatenate(ids_parts)
        sort = np.argsort(ids, kind="stable")
        ids = ids[sort]
        ttfs = np.concatenate(ttf_parts)[sort]
        btfs = np.concatenate(btf_parts)[sort]
        # chunk into bounded runs; positions are byte-spliced per doc
        for chunk, cs in enumerate(range(0, len(ids), max_run_docs)):
            ce = min(cs + max_run_docs, len(ids))
            sel = sort[cs:ce]
            rows["term"].append(term)
            rows["df_run"].append(int(ce - cs))
            rows["doc_gaps"].append(codec.encode_sorted(ids[cs:ce]))
            rows["title_tfs"].append(
                codec.varbyte_encode(ttfs[cs:ce].astype(np.uint64))
            )
            rows["body_tfs"].append(
                codec.varbyte_encode(btfs[cs:ce].astype(np.uint64))
            )
            rows["title_pos"].append(
                b"".join(tpos_pieces[j] for j in sel)
            )
            rows["body_pos"].append(
                b"".join(bpos_pieces[j] for j in sel)
            )
            buckets.append(bucket)
            runs.append(chunk)
            shards.append(doc_shard)

    merged = _segment_table(rows, shards, buckets, runs, num_buckets)
    if passthrough_idx:
        kept = group.take(pa.array(passthrough_idx, type=pa.int64()))
        kept = kept.select([f.name for f in SEGMENT_SCHEMA])
        kept = kept.cast(SEGMENT_SCHEMA)
        merged = (
            pa.concat_tables([kept, merged]) if merged.num_rows else kept
        )
    return merged


def explode_segment_rows(batch: pa.Table) -> pa.Table:
    """Segment rows → flat ``(doc_id, term, title_tf, body_tf, df)``.

    Used to derive the forward index / doc stats from the already-built
    segments without re-tokenizing.  MUST be called on one whole bucket
    (all runs of a term share its bucket), so the per-term Σ df_run here
    is the global df.
    """
    gap_blobs = batch["doc_gaps"].to_pylist()
    ttf_blobs = batch["title_tfs"].to_pylist()
    btf_blobs = batch["body_tfs"].to_pylist()
    df_runs_np = batch["df_run"].to_numpy(zero_copy_only=False)

    doc_parts, term_parts, ttf_parts, btf_parts = [], [], [], []
    # fast path: single-doc runs decode in ONE varbyte pass (each blob
    # holds exactly one value)
    singles = np.flatnonzero(df_runs_np == 1)
    if singles.size:
        doc_parts.append(
            codec.varbyte_decode(
                b"".join(gap_blobs[i] for i in singles)
            ).astype(np.int64)
        )
        ttf_parts.append(
            codec.varbyte_decode(
                b"".join(ttf_blobs[i] for i in singles)
            ).astype(np.int64)
        )
        btf_parts.append(
            codec.varbyte_decode(
                b"".join(btf_blobs[i] for i in singles)
            ).astype(np.int64)
        )
        term_parts.append(singles.astype(np.int64))
    for i in np.flatnonzero(df_runs_np != 1):
        i = int(i)
        ids = codec.decode_sorted(gap_blobs[i])
        ttfs = codec.varbyte_decode(ttf_blobs[i]).astype(np.int64)
        btfs = codec.varbyte_decode(btf_blobs[i]).astype(np.int64)
        doc_parts.append(ids)
        ttf_parts.append(ttfs)
        btf_parts.append(btfs)
        term_parts.append(np.full(len(ids), i, dtype=np.int64))
    if not doc_parts:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "term": pa.array([], type=pa.string()),
                "title_tf": pa.array([], type=pa.int64()),
                "body_tf": pa.array([], type=pa.int64()),
                "df": pa.array([], type=pa.int64()),
            }
        )
    row_idx = np.concatenate(term_parts)
    terms = pa.concat_arrays(
        [c for c in batch["term"].chunks]
    ).take(pa.array(row_idx))
    term_strs = np.asarray(batch["term"])
    df_runs = batch["df_run"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(term_strs, return_inverse=True)
    df_tot = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(df_tot, inv, df_runs)
    df_per_row = df_tot[inv]
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(doc_parts), type=pa.int64()),
            "term": terms,
            "title_tf": pa.array(np.concatenate(ttf_parts), type=pa.int64()),
            "body_tf": pa.array(np.concatenate(btf_parts), type=pa.int64()),
            "df": pa.array(df_per_row[row_idx], type=pa.int64()),
        }
    )


def _list_column_parts(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat_values, lengths) of a list<intN> column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    values = values[offsets[0]: offsets[-1]]
    offsets = offsets - offsets[0]
    lengths = np.diff(offsets)
    return values, lengths


def forward_bucket_group(group: pa.Table) -> pa.Table:
    """``map_groups`` body for one *doc-hash bucket*: forward-index rows
    for every doc in the bucket, fully vectorized (no per-doc Python).

    Mirrors the forward set (``PostingIndex.java:44-47``) and tfMax
    (``InvertedIndex.updateTFMax``, ``InvertedIndex.java:38-54``); also
    carries df per term so doc_len_norm is computable downstream without
    a lexicon broadcast.
    """
    if group.num_rows == 0:
        return _empty_forward()
    group = group.sort_by([("doc_id", "ascending")])
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False)
    ttf = group["title_tf"].to_numpy(zero_copy_only=False)
    btf = group["body_tf"].to_numpy(zero_copy_only=False)
    dfs = group["df"].to_numpy(zero_copy_only=False)
    tf = ttf + btf
    uniq_ids, starts = np.unique(doc_ids, return_index=True)
    offsets = np.concatenate((starts, [len(doc_ids)])).astype(np.int32)
    terms_vals = group["term"].combine_chunks()
    if isinstance(terms_vals, pa.ChunkedArray):
        terms_vals = terms_vals.chunk(0)
    tf_max = np.maximum.reduceat(tf, starts)
    off = pa.array(offsets, type=pa.int32())
    return pa.table(
        {
            "doc_id": pa.array(uniq_ids, type=pa.int64()),
            "terms": pa.ListArray.from_arrays(off, terms_vals),
            "title_tfs": pa.ListArray.from_arrays(off, pa.array(ttf, type=pa.int64())),
            "body_tfs": pa.ListArray.from_arrays(off, pa.array(btf, type=pa.int64())),
            "dfs": pa.ListArray.from_arrays(off, pa.array(dfs, type=pa.int64())),
            "tf_max": pa.array(tf_max, type=pa.int64()),
        }
    )


def _empty_forward() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "terms": pa.array([], type=pa.list_(pa.string())),
            "title_tfs": pa.array([], type=pa.list_(pa.int64())),
            "body_tfs": pa.array([], type=pa.list_(pa.int64())),
            "dfs": pa.array([], type=pa.list_(pa.int64())),
            "tf_max": pa.array([], type=pa.int64()),
        }
    )


def doc_stats_batch(batch: pa.Table, *, n_docs: int) -> pa.Table:
    """Forward rows → ``(doc_id, tf_max, doc_len_norm)``.

    doc_len_norm = sqrt(Σ_t (tf_t · log10(N/df_t) / tfMax)²) over ALL of
    the doc's terms with unweighted tf (``InvertedIndex.getDocumentLength``,
    ``InvertedIndex.java:69-95``; the title multiplier is NOT applied
    here).  A single-doc corpus gives idf=0 → norm 0 → NaN scores, which
    is reproduced deliberately (reference behavior)."""
    ttf_flat, lens = _list_column_parts(batch["title_tfs"])
    btf_flat, _ = _list_column_parts(batch["body_tfs"])
    df_flat, _ = _list_column_parts(batch["dfs"])
    tf_max = batch["tf_max"].to_numpy(zero_copy_only=False)
    tf_flat = ttf_flat + btf_flat
    idf_flat = np.log10(n_docs / df_flat.astype(np.float64))
    contrib = (tf_flat * idf_flat) ** 2
    sums = np.zeros(batch.num_rows, dtype=np.float64)
    row_of = np.repeat(np.arange(batch.num_rows), lens)
    np.add.at(sums, row_of, contrib)
    norm = np.sqrt(sums) / tf_max
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "tf_max": batch["tf_max"],
            "doc_len_norm": pa.array(norm, type=pa.float64()),
        }
    )
