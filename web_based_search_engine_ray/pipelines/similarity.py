"""Similarity search over the ``embeddings`` table.

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one dense matmul,
  per-block top-k partials are merged on the driver (k is small).
- :class:`IvfIndex` — IVF-flat scale path: deterministic k-means
  (seeded sample init + Lloyd iterations via ``map_batches`` partial
  sums), cluster assignment stored per vector, query probes the
  ``nprobe`` nearest centroids only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from web_based_search_engine_ray.util import embedding_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(ds, query_vecs: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k per query.  Returns (query_id, rank, vec_id,
    cosine) — deterministic tie-break (cosine desc, vec_id asc)."""
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    qref = ray.put(q)

    def block_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = _normalize(embedding_matrix(batch["embedding"]))
        sim = qm @ emb.T  # (nq, nb)
        nq, nb = sim.shape
        kk = min(k, nb)
        # per-block partial top-k with deterministic tie-break
        order = np.lexsort((ids[None, :].repeat(nq, 0), -sim), axis=1)[:, :kk]
        rows_q = np.repeat(np.arange(nq), kk)
        cols = order.ravel()
        return pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "vec_id": pa.array(ids[cols], type=pa.int64()),
                "cosine": pa.array(sim[rows_q, cols], type=pa.float64()),
            }
        )

    partials = ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    # vectorized driver merge: one lexsort over the (nq x k x blocks)
    # partials, per-query rank via run offsets, head-k filter
    q_arr = partials["query_id"].to_numpy()
    v_arr = partials["vec_id"].to_numpy()
    c_arr = partials["cosine"].to_numpy()
    order = np.lexsort((v_arr, -c_arr, q_arr))
    sq = q_arr[order]
    new = np.ones(len(sq), dtype=bool)
    new[1:] = sq[1:] != sq[:-1]
    run_start = np.maximum.accumulate(
        np.where(new, np.arange(len(sq)), 0)
    )
    rank = np.arange(len(sq)) - run_start
    keep = rank < k
    sel = order[keep]
    return pd.DataFrame(
        {
            "query_id": q_arr[sel].astype(np.int64),
            "rank": rank[keep].astype(np.int64),
            "vec_id": v_arr[sel].astype(np.int64),
            "cosine": c_arr[sel].astype(np.float64),
        }
    )


class IvfIndex:
    """IVF-flat over a Ray Dataset of (vec_id, embedding).

    Build: k-means on normalized vectors — centroid init from a seeded
    sample, ``iters`` Lloyd rounds where each round is one
    ``map_batches`` pass emitting per-centroid partial sums (pre-agg →
    tiny driver reduce; no shuffle).  Assignment adds a ``cluster``
    column.  Query: probe the ``nprobe`` closest centroids, exact
    cosine within probed clusters.
    """

    def __init__(self, n_clusters: int | None = None, iters: int = 5,
                 seed: int = 42, store_dir: str | None = None):
        #: None → auto-scale at fit() time to ~sqrt(n) (the standard
        #: IVF sizing rule), clamped to [16, 65536]
        self.n_clusters = n_clusters
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None
        self.store_dir = store_dir  # cluster-partitioned parquet
        self._cluster_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def fit(self, ds):
        import ray

        n_total = ds.count()
        if self.n_clusters is None:
            self.n_clusters = int(
                min(65536, max(16, round(n_total ** 0.5)))
            )
        sample = ds.random_sample(
            min(1.0, (self.n_clusters * 32) / max(1, n_total)), seed=self.seed
        ).to_pandas()
        m = _normalize(np.asarray(sample["embedding"].tolist(), dtype=np.float64))
        rng = np.random.default_rng(self.seed)
        init_idx = rng.choice(len(m), size=min(self.n_clusters, len(m)), replace=False)
        cents = m[np.sort(init_idx)]

        for _ in range(self.iters):
            cref = ray.put(cents)

            def partial(batch: pa.Table) -> pa.Table:
                c = ray.get(cref)
                emb = _normalize(
                    embedding_matrix(batch["embedding"])
                )
                assign = np.argmax(emb @ c.T, axis=1)
                dim = emb.shape[1]
                sums = np.zeros((len(c), dim))
                np.add.at(sums, assign, emb)
                counts = np.bincount(assign, minlength=len(c))
                return pa.table(
                    {
                        "cluster": pa.array(np.arange(len(c)), type=pa.int64()),
                        "sum": pa.array(sums.tolist(), type=pa.list_(pa.float64())),
                        "count": pa.array(counts, type=pa.int64()),
                    }
                )

            parts = pa.concat_tables(
                ds.map_batches(partial, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
            )
            dim = cents.shape[1]
            cl = parts["cluster"].to_numpy(zero_copy_only=False)
            sums = np.zeros((len(cents), dim))
            np.add.at(sums, cl, embedding_matrix(parts["sum"]))
            counts = np.bincount(
                cl,
                weights=parts["count"].to_numpy(zero_copy_only=False),
                minlength=len(cents),
            )
            nonzero = counts > 0
            cents[nonzero] = _normalize(sums[nonzero] / counts[nonzero, None])
        self.centroids = cents

        cref = ray.put(cents)

        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            emb = _normalize(
                embedding_matrix(batch["embedding"])
            )
            a = np.argmax(emb @ c.T, axis=1)
            return batch.append_column("cluster", pa.array(a, type=pa.int64()))

        # Persist the assignment partitioned BY CLUSTER: queries then
        # read only the probed partitions (resumable, and at cluster
        # scale each partition is a bounded slice instead of a full
        # dataset scan per query).
        if self.store_dir is None:
            import tempfile

            self.store_dir = tempfile.mkdtemp(prefix="ivf_store_")
        else:
            # a re-fit (or a dirty target dir) must not leave stale
            # cluster partitions behind — _cluster_vectors would read
            # them alongside the fresh assignment
            import os
            from web_based_search_engine_ray.state import fsio

            if fsio.isdir(self.store_dir):
                fsio.rmtree(self.store_dir)
        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            self.store_dir, partition_cols=["cluster"]
        )
        self._cluster_cache = {}
        return self

    def _cluster_vectors(self, cluster: int) -> tuple[np.ndarray, np.ndarray]:
        """(vec_ids, normalized matrix) of one cluster partition —
        loaded once, memoized."""
        hit = self._cluster_cache.get(cluster)
        if hit is not None:
            return hit
        import os

        import pyarrow.dataset as pads

        from web_based_search_engine_ray.state import fsio

        part = os.path.join(self.store_dir, f"cluster={cluster}")
        if not fsio.isdir(part):
            out = (np.empty(0, dtype=np.int64), np.empty((0, 0)))
        else:
            t = pads.dataset(part, format="parquet").to_table(
                columns=["vec_id", "embedding"]
            )
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            emb = _normalize(embedding_matrix(t["embedding"]))
            out = (ids, emb)
        self._cluster_cache[cluster] = out
        return out

    def search(self, query_vecs: np.ndarray, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
        assert self.centroids is not None, "fit() first"
        q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
        out = []
        for qid, qv in enumerate(q):
            probes = np.argsort(-(self.centroids @ qv))[:nprobe]
            parts = [self._cluster_vectors(int(c)) for c in probes]
            parts = [p for p in parts if len(p[0])]
            if not parts:
                continue
            ids = np.concatenate([p[0] for p in parts])
            emb = np.vstack([p[1] for p in parts])
            sim = emb @ qv
            order = np.lexsort((ids, -sim))[:k]
            for rank, i in enumerate(order):
                out.append(
                    {
                        "query_id": qid,
                        "rank": rank,
                        "vec_id": int(ids[i]),
                        "cosine": float(sim[i]),
                    }
                )
        return pd.DataFrame(out)
