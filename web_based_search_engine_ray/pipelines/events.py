"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows; per the established batch pattern
(ray_guide "Streaming-shaped workloads") windows are expressed as
truncation + groupby, and sessionization as per-user-bucket sorted
group processing.  Ordering assumption: rows of one user fit one
shuffle group (user-hash bucket), sorted by ts inside the group fn.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from web_based_search_engine_ray.util import coalesce


def hourly_window_agg(ds):
    """Tumbling 1-hour window per event_type: count + sum(value) +
    mean(value).  Pre-aggregates inside map_batches before the small
    groupby shuffle (combiner pattern)."""
    from ray.data.aggregate import Count, Sum

    def pre(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table(
            {
                "window_start": hour,
                "event_type": batch["event_type"],
                "value": batch["value"],
            }
        )
        # partial per-batch combine — Arrow-native hash aggregation (no
        # pandas round-trip in the hot combiner).  count_all keeps the
        # COUNT(*) row semantics (plain "count" would skip null values),
        # and columns are picked BY NAME — aggregate output order is a
        # pyarrow implementation detail.
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [([], "count_all"), ("value", "sum")]
        )
        return pa.table(
            {
                "window_start": g["window_start"],
                "event_type": g["event_type"],
                "n_part": g["count_all"],
                "sum_part": g["value_sum"],
            }
        )

    agg = (
        coalesce(ds.map_batches(pre, batch_format="pyarrow"))
        .groupby(["window_start", "event_type"])
        .aggregate(
            Sum("n_part", alias_name="n_events"),
            Sum("sum_part", alias_name="sum_value"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        mean = pc.divide(
            pc.cast(batch["sum_value"], pa.float64()),
            pc.cast(batch["n_events"], pa.float64()),
        )
        return batch.append_column("mean_value", mean)

    return agg.map_batches(finish, batch_format="pyarrow")


def sliding_window_agg(ds, *, size_minutes: int = 60, step_minutes: int = 15):
    """Overlapping (sliding) windows aligned to the epoch: an event at
    ``t`` belongs to every window ``[start, start+size)`` with
    ``start = floor(t/step)·step - i·step`` and ``start > t - size``.
    Each event is exploded into ``size/step`` window rows (pre-agg per
    batch), then a small groupby sums.  Output: (window_start,
    event_type, n_events, sum_value)."""
    from ray.data.aggregate import Sum

    size_us = size_minutes * 60 * 1_000_000
    step_us = step_minutes * 60 * 1_000_000
    k = -(-size_us // step_us)  # windows per event

    def explode(batch: pa.Table) -> pa.Table:
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        n = len(ts)
        base = (ts // step_us) * step_us
        starts = base[:, None] - np.arange(k)[None, :] * step_us
        valid = starts > (ts[:, None] - size_us)
        rows, cols = np.nonzero(valid)
        take = pa.array(rows)
        t = pa.table(
            {
                "window_start": pa.array(
                    starts[rows, cols].astype("datetime64[us]"),
                    type=pa.timestamp("us"),
                ),
                "event_type": batch["event_type"].take(take),
                "value": batch["value"].take(take),
            }
        )
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [([], "count_all"), ("value", "sum")]
        )
        return pa.table(
            {
                "window_start": g["window_start"],
                "event_type": g["event_type"],
                "n_part": g["count_all"],
                "sum_part": g["value_sum"],
            }
        )

    return (
        coalesce(ds.map_batches(explode, batch_format="pyarrow"))
        .groupby(["window_start", "event_type"])
        .aggregate(
            Sum("n_part", alias_name="n_events"),
            Sum("sum_part", alias_name="sum_value"),
        )
    )


def sessionize(ds, *, gap_minutes: int = 30, num_buckets: int = 64,
               max_group_rows: int | None = 8_000_000):
    """Per-user sessions (new session when the gap to the previous event
    exceeds ``gap_minutes``).  Output: one row per session with
    (user_id, session_start, session_end, n_events, sum_value).
    Vectorized per user-hash bucket.

    A bucket's events must fit one reducer; ``max_group_rows`` guards
    the hot-key case loudly (raise ``num_buckets`` to thin buckets; a
    SINGLE user over the budget needs time-sliced salting — split the
    user's events on coarse time, sessionize slices, merge
    boundary-crossing sessions)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(u % num_buckets, type=pa.int64())
        )

    def sessions(group: pa.Table) -> pa.Table:
        from web_based_search_engine_ray.util import check_group_budget

        check_group_budget(
            len(group), max_group_rows, stage="sessionize",
            key=int(group["bucket"][0].as_py()) if len(group) else None,
            hint="raise num_buckets (thins users per bucket) or "
                 "max_group_rows; one user over the budget needs "
                 "time-sliced salting",
        )
        group = group.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        users = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ts_i = ts.astype(np.int64)
        vals = group["value"].to_numpy(zero_copy_only=False)
        n = len(users)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                }
            )
        new_sess = np.ones(n, dtype=bool)
        new_sess[1:] = (users[1:] != users[:-1]) | (
            (ts_i[1:] - ts_i[:-1]) > gap_us
        )
        starts = np.flatnonzero(new_sess)
        ends = np.concatenate((starts[1:], [n]))
        sum_value = np.add.reduceat(vals, starts)
        return pa.table(
            {
                "user_id": pa.array(users[starts], type=pa.int64()),
                "session_start": pa.array(ts[starts], type=pa.timestamp("us")),
                "session_end": pa.array(ts[ends - 1], type=pa.timestamp("us")),
                "n_events": pa.array(ends - starts, type=pa.int64()),
                "sum_value": pa.array(sum_value, type=pa.float64()),
            }
        )

    return (
        coalesce(ds.map_batches(add_bucket, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(sessions, batch_format="pyarrow")
    )


def top_users_by_value(ds, *, k: int = 20):
    """Heavy-hitter users: pre-agg per batch, groupby-sum, global sort
    with deterministic tie-break, limit k."""
    from ray.data.aggregate import Sum

    def pre(batch: pa.Table) -> pa.Table:
        g = batch.select(["user_id", "value"]).group_by("user_id").aggregate(
            [("value", "sum")]
        )
        return pa.table({"user_id": g["user_id"], "part": g["value_sum"]})

    agg = (
        coalesce(ds.map_batches(pre, batch_format="pyarrow"))
        .groupby("user_id")
        .aggregate(Sum("part", alias_name="total_value"))
    )
    return agg.sort(["total_value", "user_id"], descending=[True, False]).limit(k)


def top_k_per_group(ds, *, group_col: str = "user_id",
                    order_col: str = "value", k: int = 3,
                    tie_col: str = "event_id", num_buckets: int = 64,
                    max_group_rows: int | None = 8_000_000):
    """Window rank: the top-``k`` rows per group by
    (``order_col`` desc, ``tie_col`` asc) — ``ROW_NUMBER() OVER
    (PARTITION BY g ORDER BY v DESC, t) <= k`` without a global sort:
    one hash-bucket shuffle, then a whole-bucket lexsort +
    first-k-of-run per group (vectorized, no per-group Python)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
        return batch.append_column(
            "__tk_bucket", pa.array(g % num_buckets, type=pa.int64())
        )

    def topk(group: pa.Table) -> pa.Table:
        from web_based_search_engine_ray.util import check_group_budget

        check_group_budget(
            len(group), max_group_rows, stage="top_k_per_group",
            key=int(group["__tk_bucket"][0].as_py()) if len(group) else None,
            hint="raise num_buckets or pre-aggregate per batch before "
                 "the shuffle",
        )
        g = group[group_col].to_numpy(zero_copy_only=False)
        v = group[order_col].to_numpy(zero_copy_only=False)
        t = group[tie_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -v, g))  # group asc, value desc, tie asc
        sg = g[order]
        new = np.ones(len(sg), dtype=bool)
        new[1:] = sg[1:] != sg[:-1]
        # rank within run = index - start-of-run
        run_start = np.maximum.accumulate(
            np.where(new, np.arange(len(sg)), 0)
        )
        rank = np.arange(len(sg)) - run_start
        keep = order[rank < k]
        out = group.take(pa.array(np.sort(keep)))
        return out.drop_columns(["__tk_bucket"])

    return (
        coalesce(ds.map_batches(add_bucket, batch_format="pyarrow"))
        .groupby("__tk_bucket")
        .map_groups(topk, batch_format="pyarrow")
    )
