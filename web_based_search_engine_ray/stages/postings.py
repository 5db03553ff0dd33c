"""Posting extraction + segment encoding stages.

This is the Ray-Data re-expression of the reference's posting-list
build (``PostingIndex.addDocument``, ``PostingIndex.java:40-85``): the
per-document positional postings (positions kept separately for the
title field and the body field, ``Posting.java:9``) become flat Arrow
rows ``(term, doc_id, title_positions, body_positions)`` emitted by a
tokenizer actor pool, shuffled by a *salted term-bucket key* and
encoded into delta-gap + varbyte compressed segment rows.

Skew handling (Zipf terms at web scale — SURVEY.md §4): every term
belongs to a hash ``bucket``; terms in the broadcast *hot set* are
additionally salted by ``doc_id % num_salts`` so no single shuffle
group holds a mega-term's full posting list.  A term's posting list is
therefore stored as one or more *runs* (disjoint doc sets); the query
side unions runs, and ``df = Σ df_run``.
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
        ("bucket", pa.int32()),
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
    """Actor-pool stage: documents → flat positional posting rows.

    ``__init__`` holds the per-actor state (stopword set, compiled
    regex, broadcast hot-term set) — once per actor, not per batch.
    """

    def __init__(
        self,
        cfg: IndexConfig,
        hot_terms_ref=None,
    ):
        self.cfg = cfg
        self.stops = stopword_set() if cfg.use_stopwords else frozenset()
        self.re = TOKEN_RE
        if hot_terms_ref is not None:
            import ray

            self.hot_terms = ray.get(hot_terms_ref)
        else:
            self.hot_terms = frozenset()
        # term → bucket cache (vocabulary is Zipfian: tiny working set)
        self._bucket_cache: dict[str, int] = {}

    def _analyze(self, text: str) -> list[str]:
        cfg = self.cfg
        out = []
        for tok in self.re.split(text):
            if not tok:
                continue
            w = stem_word(
                tok,
                use_stopwords=cfg.use_stopwords,
                use_stemming=cfg.use_stemming,
                _stops=self.stops,
            )
            if w is not None:
                out.append(w)
        return out

    def _bucket(self, term: str) -> int:
        b = self._bucket_cache.get(term)
        if b is None:
            b = stable_hash63(term) % self.cfg.num_buckets
            self._bucket_cache[term] = b
        return b

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        num_salts = cfg.num_salts if cfg.salt_hot_terms else 1
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        titles = batch["title"].to_pylist()
        texts = batch["text"].to_pylist()

        terms: list[str] = []
        out_doc: list[int] = []
        tpos: list[list[int]] = []
        bpos: list[list[int]] = []
        group_keys: list[int] = []

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
                salt = (doc_id % num_salts) if term in self.hot_terms else 0
                group_keys.append(self._bucket(term) * num_salts + salt)

        return pa.table(
            {
                "group_key": pa.array(group_keys, type=pa.int64()),
                "term": pa.array(terms, type=pa.string()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "title_positions": pa.array(tpos, type=pa.list_(pa.int32())),
                "body_positions": pa.array(bpos, type=pa.list_(pa.int32())),
            }
        )


def _list_column_parts(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat_values, lengths) of a list<int32> column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    # account for a possible non-zero offset slice
    values = values[offsets[0]: offsets[-1]]
    offsets = offsets - offsets[0]
    lengths = np.diff(offsets)
    return values, lengths


def encode_segment_group(group: pa.Table, *, num_salts: int) -> pa.Table:
    """``map_groups`` body for one (bucket, salt) shuffle group: encode
    every term's run in the group into one segment row.

    Replaces the reference's per-term sorted ``List<Posting>``
    (binary-search insertion, ``PostingIndex.java:66-84``) with a single
    sort + vectorized delta/varbyte encode per term.
    """
    if group.num_rows == 0:
        return SEGMENT_SCHEMA.empty_table()
    group = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
    terms = np.asarray(group["term"])
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False)
    tflat, tlens = _list_column_parts(group["title_positions"])
    bflat, blens = _list_column_parts(group["body_positions"])
    toffsets = np.concatenate(([0], np.cumsum(tlens)))
    boffsets = np.concatenate(([0], np.cumsum(blens)))

    uniq, starts = np.unique(terms, return_index=True)
    order = np.argsort(starts)
    uniq, starts = uniq[order], starts[order]
    ends = np.concatenate((starts[1:], [len(terms)]))

    group_key = int(group["group_key"][0].as_py())
    bucket = group_key // num_salts
    run = group_key % num_salts

    rows = {k: [] for k in ("term", "df_run", "doc_gaps", "title_tfs",
                            "body_tfs", "title_pos", "body_pos")}
    for term, s, e in zip(uniq, starts, ends):
        ids = doc_ids[s:e]
        if np.unique(ids).size != ids.size:
            # duplicate (term, doc) is an upstream bug (the reference
            # treats it as an error, PostingIndex.java:76-80)
            raise ValueError(f"duplicate posting for term {term!r}")
        ttfs = tlens[s:e]
        btfs = blens[s:e]
        rows["term"].append(str(term))
        rows["df_run"].append(int(e - s))
        rows["doc_gaps"].append(codec.encode_sorted(ids))
        rows["title_tfs"].append(codec.varbyte_encode(ttfs.astype(np.uint64)))
        rows["body_tfs"].append(codec.varbyte_encode(btfs.astype(np.uint64)))
        rows["title_pos"].append(
            codec.encode_concat_positions(tflat[toffsets[s]:toffsets[e]], ttfs)
        )
        rows["body_pos"].append(
            codec.encode_concat_positions(bflat[boffsets[s]:boffsets[e]], btfs)
        )

    n = len(rows["term"])
    return pa.table(
        {
            "bucket": pa.array([bucket] * n, type=pa.int32()),
            "term": pa.array(rows["term"], type=pa.string()),
            "run": pa.array([run] * n, type=pa.int32()),
            "df_run": pa.array(rows["df_run"], type=pa.int64()),
            "doc_gaps": pa.array(rows["doc_gaps"], type=pa.binary()),
            "title_tfs": pa.array(rows["title_tfs"], type=pa.binary()),
            "body_tfs": pa.array(rows["body_tfs"], type=pa.binary()),
            "title_pos": pa.array(rows["title_pos"], type=pa.binary()),
            "body_pos": pa.array(rows["body_pos"], type=pa.binary()),
        },
        schema=SEGMENT_SCHEMA,
    )


def explode_segment_rows(batch: pa.Table) -> pa.Table:
    """Segment rows → flat ``(doc_id, term, title_tf, body_tf, df_run)``.

    Used to derive the forward index / doc stats from the already-built
    segments without re-tokenizing.  ``df_run`` is summed to the true df
    by the downstream per-bucket aggregation (all runs of a term share a
    bucket).
    """
    doc_parts, term_parts, ttf_parts, btf_parts = [], [], [], []
    for i in range(batch.num_rows):
        ids = codec.decode_sorted(batch["doc_gaps"][i].as_py())
        ttfs = codec.varbyte_decode(batch["title_tfs"][i].as_py()).astype(np.int64)
        btfs = codec.varbyte_decode(batch["body_tfs"][i].as_py()).astype(np.int64)
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
    # df per term: sum df_run over the batch.  A batch is one whole
    # bucket (explode runs inside groupby("bucket"), see build_index),
    # so all runs of a term are present and the sum is the global df.
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
