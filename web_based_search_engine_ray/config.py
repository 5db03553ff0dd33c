"""Engine configuration.

The scoring/behavior constants mirror the reference
(``InvertedIndex.java:21`` TITLE_MATCH_MULTIPLIER=0.9,
``App.java:23-24`` maxPages=300 / maxSearchResults=50,
``SearchResult.java:12`` MAX_KEYWORD_COUNT=5); the physical knobs
(buckets, batch sizes, salting) are ours — the reference is
single-threaded and has no equivalents.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    # --- semantics (must match the reference for rank-identity) ---
    title_weight: float = 0.9          # InvertedIndex.java:21
    use_stopwords: bool = True         # Indexer.stemWord, Indexer.java:67
    use_stemming: bool = True          # Indexer.stemWord, Indexer.java:70
    max_results: int = 50              # App.java:24
    max_keywords: int = 5              # SearchResult.java:12
    # Last-write-wins per url by warc_ts before indexing (reference
    # freshness semantics, Indexer.java:77-85, expressed batch-style).
    dedup_urls: bool = True
    # Verify extracted body text is byte-identical to the input table's
    # ``text`` column (the per-row invariant from BASELINE.json).
    verify_extraction: bool = True

    # --- physical layout / scale knobs (ours) ---
    num_buckets: int = 32              # term-hash partitions for segments
    tokenize_batch_size: int = 1024    # docs per batch in the tokenize stage
    # (larger batches -> fewer per-(term, block) runs to shuffle+compact)
    tokenize_concurrency: tuple[int, int] = (1, 8)  # actor-pool size range
    extract_batch_size: int = 256
    extract_concurrency: tuple[int, int] = (1, 8)
    # Segment build is local-index-then-merge: posting runs are encoded
    # per tokenize block (no shuffle of raw postings), then compacted
    # per term-hash bucket — the shuffle moves only compressed runs.
    # Hot (Zipf-head) terms are merged into bounded chunks of
    # ``max_run_docs`` docs so no single merge task holds a mega-term's
    # full posting list; query unions runs (df = Σ df_run).
    compact_segments: bool = True
    max_run_docs: int = 5_000_000
    # Document partitioning (web-search-style doc-partitioned index):
    # segments are additionally partitioned by doc_id % doc_shards, so a
    # query can scatter-gather over per-shard searchers each holding
    # only its shard's postings + doc stats.  1 = single partition.
    doc_shards: int = 1
    # Shuffle parallelism: groupby inputs are coalesced to this many
    # blocks first (None = 2 × cluster CPUs).  Ray's sort shuffle cost
    # scales with block count, which at test scale is dominated by
    # many tiny blocks; a 100-TB deployment should set this to
    # ~data_size / target_block_size instead.
    shuffle_partitions: int | None = None
    min_rows_per_file: int = 65536
    # Per-partition resume for the wide stages: build segments/forward
    # one doc_shard at a time, each with its own lineage manifest, so a
    # crash at hour 9 of a 10-hour stage resumes at the failed SHARD
    # instead of repeating the stage.  Off by default: each shard pays
    # a fixed Ray pipeline overhead (~0.5-2 s), which dominates at test
    # scale but amortizes to noise when a shard takes minutes.  Same
    # artifacts either way (physical execution knob, not semantic).
    partitioned_build: bool = False
    # How many shard-part pipelines of a partitioned_build stage run
    # CONCURRENTLY (independent Dataset executions on one Ray cluster;
    # outputs and manifests are per-part, so completion order is
    # irrelevant).  >1 hides the per-execution fixed overhead at small
    # shard sizes and keeps the cluster busy when one part alone can't
    # saturate it; resume granularity is unchanged.
    part_build_concurrency: int = 4

    def semantic_key(self) -> str:
        """Stable hash of the fields that affect index *content* (used to
        key index caches and resume manifests)."""
        sem = {
            "title_weight": self.title_weight,
            "use_stopwords": self.use_stopwords,
            "use_stemming": self.use_stemming,
            "dedup_urls": self.dedup_urls,
            "num_buckets": self.num_buckets,
            "compact_segments": self.compact_segments,
            "max_run_docs": self.max_run_docs,
            "doc_shards": self.doc_shards,
            "format_version": 5,  # bump when artifact schemas change
        }
        return hashlib.md5(json.dumps(sem, sort_keys=True).encode()).hexdigest()[:12]

    def to_dict(self) -> dict:
        return asdict(self)


#: Configuration whose output is expressible in ANSI SQL (used by the
#: DuckDB oracle checks): tokenization + lowercase only, no stopword
#: removal, no stemming.  Everything else identical.
ORACLE_CONFIG = IndexConfig(use_stopwords=False, use_stemming=False)
