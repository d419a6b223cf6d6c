"""Event-stream operators over the ``events`` table — the windowed /
sessionized custom-operator family.

The reference has NO streaming features (SURVEY.md §2.11) — its only
incremental loop is the crawler BFS frontier. These operators are the
engine's extension for event-log inputs, built as Ray-Data compositions
(map_batches + groupby().map_groups) with the partitioning assumption
documented per operator:

  windowed_agg   tumbling time window × event_type aggregate — partial
                 aggregation inside each batch (map_batches), tiny final
                 groupby over (window, type) partials
  sessionize     gap-based session windows per user — ONE shuffle keyed by
                 user_id (assumes a user's events fit in a worker; the
                 10^12-row path salts by (user_id, day) and merges
                 cross-day sessions in a second pass)
  props_extract  JSON-ish scalar extraction via RE2 (pc.extract_regex)

Monetary-style doubles are exchanged as scaled integers
(round(value·100) — exact, order-insensitive sums) so results hash-match
the DuckDB oracles bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

WINDOW_US = 3_600_000_000  # 1 hour in microseconds


def windowed_agg(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Tumbling 1-hour windows per event_type.

    Columns: window_start_us (int64 epoch µs), event_type, n_events,
    sum_value_c (Σ round(value·100), int64). Partial aggregation inside
    each batch → the shuffle moves at most |windows × types| rows per
    batch, never raw events.
    """
    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // WINDOW_US) * WINDOW_US
        val_c = np.round(batch["value"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        t = pa.table({
            "window_start_us": pa.array(win),
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            "v": pa.array(val_c),
        })
        return (t.group_by(["window_start_us", "event_type"],
                           use_threads=False)
                 .aggregate([("n", "sum"), ("v", "sum")])
                 .rename_columns(["window_start_us", "event_type",
                                  "n", "v"]))

    from searchengine_ray.pipelines.common import grouped_aggregate

    def reduce_part(part: pa.Table) -> pa.Table:
        g = (part.group_by(["window_start_us", "event_type"],
                           use_threads=False)
             .aggregate([("n", "sum"), ("v", "sum")]))
        return pa.table({
            "window_start_us": pc.cast(g["window_start_us"], pa.int64()),
            "event_type": pc.cast(g["event_type"], pa.string()),
            "n_events": pc.cast(g["n_sum"], pa.int64()),
            "sum_value_c": pc.cast(g["v_sum"], pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(partials, ["window_start_us", "event_type"],
                             reduce_part)


def sql_windowed_agg() -> str:
    return f"""
SELECT (epoch_us(ts) // {WINDOW_US}) * {WINDOW_US} AS window_start_us,
       event_type,
       count(*)::BIGINT AS n_events,
       sum(round(value * 100)::BIGINT)::BIGINT AS sum_value_c
FROM events GROUP BY 1, 2
"""


NUM_EVENT_PARTITIONS = 64
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _user_part(uid: np.ndarray, num_parts: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((uid.astype(np.uint64) * _MIX)
                % np.uint64(num_parts)).astype(np.int32)


def _sessionize_runs(uid: np.ndarray, ts: np.ndarray, gap_us: int
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray]:
    """Vectorized multi-user sessionization over (uid, ts) sorted by
    (uid, ts): returns (user, start, end, n) per session."""
    if uid.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    new_sess = np.empty(uid.size, dtype=bool)
    new_sess[0] = True
    new_sess[1:] = (uid[1:] != uid[:-1]) | (np.diff(ts) > gap_us)
    sid = np.cumsum(new_sess) - 1
    k = int(sid[-1]) + 1
    starts = ts[new_sess]
    users = uid[new_sess]
    ends = np.zeros(k, dtype=np.int64)
    np.maximum.at(ends, sid, ts)
    counts = np.zeros(k, dtype=np.int64)
    np.add.at(counts, sid, 1)
    return users, starts, ends, counts


def sessionize(ds: "ray.data.Dataset",
               gap_us: int = 1_800_000_000) -> "ray.data.Dataset":
    """Gap-based sessions per user (new session when the gap to the
    previous event exceeds ``gap_us``; default 30 min).

    Columns: user_id, session_start_us, n_events, duration_us (all int64).
    ONE shuffle over COARSE hash(user) partitions (not one Ray group per
    user — a per-user map_groups is a Python call per user; measured 4×
    slower); inside a partition all users sessionize in one lexsort +
    diff/cumsum pass. A user's events land in exactly one partition, so
    results are identical to per-user grouping.
    """
    def add_part(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch["user_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(_user_part(uid, NUM_EVENT_PARTITIONS)),
            "user_id": pa.array(uid),
            "ts": batch["ts"],
        })

    def per_part(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(group["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        users, starts, ends, counts = _sessionize_runs(
            uid[order], ts[order], gap_us)
        return pa.table({
            "user_id": pa.array(users),
            "session_start_us": pa.array(starts),
            "n_events": pa.array(counts),
            "duration_us": pa.array(ends - starts),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("part").map_groups(per_part, batch_format="pyarrow"))


def sessionize_salted(ds: "ray.data.Dataset",
                      gap_us: int = 1_800_000_000,
                      shard_us: int = 86_400_000_000) -> "ray.data.Dataset":
    """Skew-safe sessionization — the 10^12-row path for ``sessionize``.

    Plain sessionize co-locates a user's ENTIRE history, so one
    pathologically active user lands on one worker. Here the wide shuffle
    is keyed by (user_id, time-shard) — default 1-day shards, so no unit
    of work exceeds a user-day of events — producing per-shard partial
    sessions; a SECOND, tiny shuffle (per-user session summaries, not
    events) merges sessions that span shard boundaries (boundary sessions
    closer than ``gap_us`` coalesce). Both shuffles route through COARSE
    hash partitions and process all their (user, shard) runs in one
    lexsort + diff/cumsum pass — no Python call per group (measured 4×).
    Output is IDENTICAL to sessionize() — asserted in tests.
    """
    def add_shard(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch["user_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        shard = ts // shard_us
        # coarse partition key over (user, shard): bounded groups without
        # a Python map_groups call per (user, day)
        with np.errstate(over="ignore"):
            key = (uid.astype(np.uint64) * _MIX
                   + shard.astype(np.uint64)) * _MIX
        return pa.table({
            "part": pa.array((key % np.uint64(NUM_EVENT_PARTITIONS))
                             .astype(np.int32)),
            "user_id": pa.array(uid),
            "ts": pa.array(ts),
            "shard": pa.array(shard),
        })

    def per_part(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        shard = group["shard"].to_numpy(zero_copy_only=False)
        # one vectorized pass over ALL (user, shard) runs in the partition
        order = np.lexsort((ts, shard, uid))
        uid, ts, shard = uid[order], ts[order], shard[order]
        if uid.size == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"user_id": z, "start_us": z, "end_us": z,
                             "n": z})
        new_sess = np.empty(uid.size, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = ((uid[1:] != uid[:-1]) | (shard[1:] != shard[:-1])
                        | (np.diff(ts) > gap_us))
        sid = np.cumsum(new_sess) - 1
        k = int(sid[-1]) + 1
        ends = np.zeros(k, dtype=np.int64)
        np.maximum.at(ends, sid, ts)
        counts = np.zeros(k, dtype=np.int64)
        np.add.at(counts, sid, 1)
        return pa.table({
            "user_id": pa.array(uid[new_sess]),
            "start_us": pa.array(ts[new_sess]),
            "end_us": pa.array(ends),
            "n": pa.array(counts),
        })

    partials = (ds.map_batches(add_shard, batch_format="pyarrow")
                  .groupby("part")
                  .map_groups(per_part, batch_format="pyarrow"))

    def add_user_part(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "upart", pa.array(_user_part(uid, NUM_EVENT_PARTITIONS)))

    def merge_part(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        starts = group["start_us"].to_numpy(zero_copy_only=False)
        ends = group["end_us"].to_numpy(zero_copy_only=False)
        ns = group["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((starts, uid))
        uid, starts, ends, ns = (uid[order], starts[order], ends[order],
                                 ns[order])
        if uid.size == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"user_id": z, "session_start_us": z,
                             "n_events": z, "duration_us": z})
        # coalesce consecutive partials of the SAME user whose boundary
        # gap ≤ gap_us (partials from different shards are time-disjoint)
        new_sess = np.empty(uid.size, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = ((uid[1:] != uid[:-1])
                        | (starts[1:] - ends[:-1] > gap_us))
        sid = np.cumsum(new_sess) - 1
        k = int(sid[-1]) + 1
        out_end = np.zeros(k, dtype=np.int64)
        np.maximum.at(out_end, sid, ends)
        out_n = np.zeros(k, dtype=np.int64)
        np.add.at(out_n, sid, ns)
        return pa.table({
            "user_id": pa.array(uid[new_sess]),
            "session_start_us": pa.array(starts[new_sess]),
            "n_events": pa.array(out_n),
            "duration_us": pa.array(out_end - starts[new_sess]),
        })

    return (partials.map_batches(add_user_part, batch_format="pyarrow")
                    .groupby("upart")
                    .map_groups(merge_part, batch_format="pyarrow"))


def sql_sessionize(gap_us: int = 1_800_000_000) -> str:
    return f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                   > {gap_us} OR lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events),
s AS (
  SELECT user_id, t,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM e)
SELECT user_id::BIGINT AS user_id,
       min(t)::BIGINT AS session_start_us,
       count(*)::BIGINT AS n_events,
       (max(t) - min(t))::BIGINT AS duration_us
FROM s GROUP BY user_id, sess
"""


def streaming_windowed_agg(ds: "ray.data.Dataset",
                           lateness_us: int = 60_000_000,
                           window_us: int = WINDOW_US) -> "ray.data.Dataset":
    """Tumbling windows under STREAMING semantics with a watermark and an
    allowed-lateness policy — the streaming-window custom operator (the
    reference has no streaming features at all, SURVEY.md §2.11).

    Arrival order is the stream order (= ascending event_id; the testdata's
    ts jitter makes arrival ≠ event time, i.e. real out-of-orderness). Per
    event_type the watermark is the running max event-time seen so far
    minus ``lateness_us``; an event whose window has already been passed by
    the watermark AT ITS ARRIVAL is late → excluded from the window's
    aggregate and counted under is_late=1. Deterministic and exactly
    restated in SQL (a running-max window function), so the policy itself
    is oracle-checked.

    Columns: window_start_us, event_type, is_late (int64 0/1), n_events,
    sum_value_c. Partitioning: one shuffle keyed by event_type (the
    watermark's scope); within a partition the sweep is a vectorized
    running max in arrival order.
    """
    def per_type(group: pa.Table) -> pa.Table:
        etype = group["event_type"][0].as_py()
        order = np.argsort(pc.cast(group["event_id"], pa.int64())
                           .to_numpy(zero_copy_only=False), kind="stable")
        ts = pc.cast(group["ts"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[order]
        val_c = np.round(group["value"].to_numpy(zero_copy_only=False)[order]
                         * 100.0).astype(np.int64)
        win = (ts // window_us) * window_us
        running_max = np.maximum.accumulate(ts)
        late = (win + window_us) <= (running_max - lateness_us)
        t = pa.table({
            "window_start_us": pa.array(win),
            "is_late": pa.array(late.astype(np.int64)),
            "n": pa.array(np.ones(len(ts), dtype=np.int64)),
            "v": pa.array(np.where(late, 0, val_c)),
        })
        g = (t.group_by(["window_start_us", "is_late"], use_threads=False)
             .aggregate([("n", "sum"), ("v", "sum")]))
        return pa.table({
            "window_start_us": pc.cast(g["window_start_us"], pa.int64()),
            "event_type": pa.array([etype] * len(g), type=pa.string()),
            "is_late": pc.cast(g["is_late"], pa.int64()),
            "n_events": pc.cast(g["n_sum"], pa.int64()),
            "sum_value_c": pc.cast(g["v_sum"], pa.int64()),
        })

    return ds.groupby("event_type").map_groups(per_type,
                                               batch_format="pyarrow")


def streaming_windowed_agg_salted(ds: "ray.data.Dataset",
                                  lateness_us: int = 60_000_000,
                                  window_us: int = WINDOW_US,
                                  shard_events: int = 65536) -> "ray.data.Dataset":
    """Skew-safe twin of ``streaming_windowed_agg`` — the 10^12-row path.

    The plain operator keys its shuffle by event_type alone: a
    low-cardinality, inherently skewed key (one worker receives an entire
    type's full history). Here the wide shuffle is keyed by (event_type,
    arrival-shard) — contiguous ``shard_events``-sized event_id ranges, so
    no group exceeds a bounded slice of the stream — and a SECOND, tiny
    shuffle over per-shard PARTIALS (≤ windows×2 rows per shard, never
    events) finalizes lateness across shard boundaries.

    Why this is exact: the watermark at an event is the running max
    event-time over all earlier arrivals, which decomposes over arrival
    shards as max(carry_in, local_running_max) where carry_in is the max
    ts of all PREVIOUS shards. An event is late iff
    win_end ≤ watermark − lateness, i.e. iff it is late under its shard's
    local running max alone, OR carry_in ≥ win_end + lateness — a per-
    (window, shard) threshold the merge pass evaluates from shard-summary
    maxima. Output is IDENTICAL to streaming_windowed_agg (asserted in
    tests; same driver oracle).
    """
    def add_shard(batch: pa.Table) -> pa.Table:
        eid = pc.cast(batch["event_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "event_id": pa.array(eid),
            "ts": batch["ts"],
            "value": batch["value"],
            "shard": pa.array(eid // shard_events),
        })

    def per_shard(group: pa.Table) -> pa.Table:
        etype = group["event_type"][0].as_py()
        shard = int(group["shard"][0].as_py())
        order = np.argsort(pc.cast(group["event_id"], pa.int64())
                           .to_numpy(zero_copy_only=False), kind="stable")
        ts = pc.cast(group["ts"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[order]
        val_c = np.round(group["value"].to_numpy(zero_copy_only=False)[order]
                         * 100.0).astype(np.int64)
        win = (ts // window_us) * window_us
        lmax = np.maximum.accumulate(ts)
        late_local = (win + window_us) <= (lmax - lateness_us)
        t = pa.table({
            "window_start_us": pa.array(win),
            "late_local": pa.array(late_local.astype(np.int64)),
            "n": pa.array(np.ones(len(ts), dtype=np.int64)),
            "v": pa.array(np.where(late_local, 0, val_c)),
        })
        g = (t.group_by(["window_start_us", "late_local"], use_threads=False)
             .aggregate([("n", "sum"), ("v", "sum")]))
        k = len(g)
        return pa.table({
            "event_type": pa.array([etype] * k, type=pa.string()),
            "shard": pa.array(np.full(k, shard, dtype=np.int64)),
            "shard_max_ts": pa.array(np.full(k, int(ts.max()),
                                             dtype=np.int64)),
            "window_start_us": pc.cast(g["window_start_us"], pa.int64()),
            "late_local": pc.cast(g["late_local"], pa.int64()),
            "n": pc.cast(g["n_sum"], pa.int64()),
            "v": pc.cast(g["v_sum"], pa.int64()),
        })

    partials = (ds.map_batches(add_shard, batch_format="pyarrow")
                  .groupby(["event_type", "shard"])
                  .map_groups(per_shard, batch_format="pyarrow"))

    def merge_type(group: pa.Table) -> pa.Table:
        etype = group["event_type"][0].as_py()
        shard = group["shard"].to_numpy(zero_copy_only=False)
        smax = group["shard_max_ts"].to_numpy(zero_copy_only=False)
        win = group["window_start_us"].to_numpy(zero_copy_only=False)
        late_l = group["late_local"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        # exclusive prefix max of shard maxima, in shard order
        uniq_shards, inv = np.unique(shard, return_inverse=True)
        per_shard_max = np.full(len(uniq_shards), np.iinfo(np.int64).min,
                                dtype=np.int64)
        np.maximum.at(per_shard_max, inv, smax)
        carry = np.concatenate([[np.iinfo(np.int64).min],
                                np.maximum.accumulate(per_shard_max)[:-1]])
        carry_in = carry[inv]
        # lateness on the RIGHT side: carry_in is int64.min for the first
        # shard and subtracting would wrap
        flipped = (late_l == 0) & (carry_in >= win + window_us + lateness_us)
        is_late = (late_l == 1) | flipped
        t = pa.table({
            "window_start_us": pa.array(win),
            "is_late": pa.array(is_late.astype(np.int64)),
            "n": pa.array(n),
            "v": pa.array(np.where(is_late, 0, v)),
        })
        g = (t.group_by(["window_start_us", "is_late"], use_threads=False)
             .aggregate([("n", "sum"), ("v", "sum")]))
        return pa.table({
            "window_start_us": pc.cast(g["window_start_us"], pa.int64()),
            "event_type": pa.array([etype] * len(g), type=pa.string()),
            "is_late": pc.cast(g["is_late"], pa.int64()),
            "n_events": pc.cast(g["n_sum"], pa.int64()),
            "sum_value_c": pc.cast(g["v_sum"], pa.int64()),
        })

    return partials.groupby("event_type").map_groups(merge_type,
                                                     batch_format="pyarrow")


def sql_streaming_windowed_agg(lateness_us: int = 60_000_000,
                               window_us: int = WINDOW_US) -> str:
    return f"""
WITH e AS (
  SELECT event_type, event_id, epoch_us(ts) AS t,
         round(value * 100)::BIGINT AS vc,
         max(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING) AS wm
  FROM events),
flagged AS (
  SELECT event_type, (t // {window_us}) * {window_us} AS window_start_us,
         CASE WHEN (t // {window_us}) * {window_us} + {window_us}
                   <= wm - {lateness_us} THEN 1 ELSE 0 END AS is_late,
         vc
  FROM e)
SELECT window_start_us, event_type, is_late::BIGINT AS is_late,
       count(*)::BIGINT AS n_events,
       sum(CASE WHEN is_late = 1 THEN 0 ELSE vc END)::BIGINT AS sum_value_c
FROM flagged GROUP BY window_start_us, event_type, is_late
"""


def value_quantiles(ds: "ray.data.Dataset",
                    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    num_buckets: int = 32,
                    fetch_threshold: int = 4096) -> pa.Table:
    """EXACT per-type value quantiles + distinct-user counts via
    ITERATIVE DISTRIBUTED SELECTION (:func:`value_quantile_exact`'s
    engine): every requested quantile refines TOGETHER — each round is
    ONE streaming column scan that bins all still-active
    (type, quantile) intervals into ``num_buckets`` sub-buckets, and
    the driver only ever accumulates (type, quantile, bucket, count)
    digests. The round-4 shape — a driver-side (type x distinct-cents)
    histogram — was exact but unbounded on a wide/unquantized value
    domain; this one's driver traffic is O(types x qs x buckets) per
    round regardless of value cardinality. Distinct users ride
    hash-partitioned pair-dedup partials (<= partitions x types rows).

    Columns: event_type, n_events, n_users, p{50,90,99}_value_c — the
    quantile convention matches DuckDB quantile_disc: sorted value at
    index max(0, ceil(q*n) - 1)."""
    from searchengine_ray.pipelines.common import grouped_aggregate

    proj = _project_type_cents(ds)
    stats = _type_value_stats(proj)
    tags = [f"p{int(round(q * 100))}_value_c" for q in qs]
    active: dict[tuple[str, str], tuple[int, int, int]] = {}
    counts: dict[tuple[str, str], int] = {}
    for q, tag in zip(qs, tags):
        # exact ceil(q*n) in integer math (q as parts-per-million —
        # int(0.99*1e6) would TRUNCATE to 989999)
        qn = int(round(q * 1_000_000))
        for ty, (n, lo, hi) in stats.items():
            k = max(1, -(-qn * int(n) // 1_000_000))
            active[(ty, tag)] = (int(lo) - 1, int(hi), k)
            counts[(ty, tag)] = int(n)
    result = _iterative_select(proj, active, counts, num_buckets,
                               fetch_threshold)

    def upart(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "user_id": pc.cast(batch["user_id"], pa.int64()),
        })
        return (t.group_by(["event_type", "user_id"], use_threads=False)
                .aggregate([]))

    def ureduce(part: pa.Table) -> pa.Table:
        d = (part.group_by(["event_type", "user_id"], use_threads=False)
             .aggregate([]))
        g = (d.group_by(["event_type"], use_threads=False)
             .aggregate([("user_id", "count")]))
        return pa.table({"event_type": pc.cast(g["event_type"], pa.string()),
                         "pu": pc.cast(g["user_id_count"], pa.int64())})

    users = grouped_aggregate(
        ds.select_columns(["event_type", "user_id"])
          .map_batches(upart, batch_format="pyarrow"),
        ["event_type", "user_id"], ureduce)

    u_by_type: dict[str, int] = {}
    for r in users.take_all():        # bounded: <= partitions x types rows
        u_by_type[r["event_type"]] = u_by_type.get(r["event_type"], 0) \
            + int(r["pu"])

    tys = sorted(stats)
    out: dict[str, list] = {
        "event_type": tys,
        "n_events": [int(stats[t][0]) for t in tys],
        "n_users": [u_by_type.get(t, 0) for t in tys],
    }
    for tag in tags:
        out[tag] = [result[(t, tag)] for t in tys]
    return pa.table({k: pa.array(v, type=pa.string() if k == "event_type"
                                 else pa.int64())
                     for k, v in out.items()})


def sql_value_quantiles(qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> str:
    cols = ", ".join(
        f"quantile_disc(round(value * 100)::BIGINT, {q})::BIGINT "
        f"AS p{int(round(q * 100))}_value_c" for q in qs)
    return (f"SELECT event_type, count(*)::BIGINT AS n_events, "
            f"count(DISTINCT user_id)::BIGINT AS n_users, {cols} "
            f"FROM events GROUP BY event_type")


def props_extract(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Extract the integer ``k`` from the JSON-ish props column with an RE2
    kernel (reference has no JSON functions, SURVEY.md §2.10 — this is the
    engine extension; a real pipeline would swap in a JSON parser in the
    same map_batches slot). Columns: event_id, props_k (int64, -1 when
    absent)."""
    def fn(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(pc.cast(batch["props"], pa.string()),
                             r'"k": (?P<k>\d+)')
        k = pc.struct_field(m, "k")
        out = pc.if_else(pc.is_valid(k),
                         pc.cast(k, pa.int64()),
                         pa.scalar(-1, type=pa.int64()))
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "props_k": out,
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_props_extract() -> str:
    return ("SELECT event_id, CASE WHEN regexp_extract(props, '\"k\": (\\d+)', 1) = '' "
            "THEN -1 ELSE regexp_extract(props, '\"k\": (\\d+)', 1)::BIGINT END "
            "AS props_k FROM events")


# ---------------------------------------------------------------------------
# custom joins the Dataset API lacks: as-of join + range join
# ---------------------------------------------------------------------------

def asof_join_prior(ds: "ray.data.Dataset", left_type: str = "purchase",
                    right_type: str = "view") -> "ray.data.Dataset":
    """AS-OF JOIN (inner): for every ``left_type`` event, the most recent
    STRICTLY-PRIOR ``right_type`` event of the same user — "which view
    preceded this purchase". Deterministic prior order is (ts, event_id)
    lexicographic (event_id breaks ts ties; ids are unique), so results
    are engine-independent.

    Ray-Data-first plan (there is no join primitive): ONE coarse shuffle
    keyed by hash(user_id) — the same partitioning assumption as
    sessionize (a user's events fit in one partition; salt by time-shard
    at 10^12 rows). Inside a partition, ALL users resolve in one
    vectorized pass: rows sorted by (user, ts, event_id); a running
    maximum over right-row positions gives each row the latest prior
    right index; a per-user segment start invalidates carries across user
    boundaries. No per-user Python, no per-row loops.

    Columns: event_id, user_id, prior_event_id, gap_us (all int64).
    """
    def add_part(batch: pa.Table) -> pa.Table:
        et = pc.cast(batch["event_type"], pa.string())
        keep = pc.is_in(et, value_set=pa.array([left_type, right_type]))
        b = batch.filter(keep)
        uid = pc.cast(b["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "part": pa.array(_user_part(uid, NUM_EVENT_PARTITIONS)),
            "user_id": pa.array(uid),
            "ts": pc.cast(pc.cast(b["ts"], pa.int64()), pa.int64()),
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "is_left": pc.equal(pc.cast(b["event_type"], pa.string()),
                                left_type),
        })

    def per_part(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        is_left = group["is_left"].to_numpy(zero_copy_only=False)
        empty = pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "prior_event_id": pa.array([], type=pa.int64()),
            "gap_us": pa.array([], type=pa.int64()),
        })
        if uid.size == 0:
            return empty
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, is_left = (uid[order], ts[order], eid[order],
                                 is_left[order])
        n = uid.size
        idx = np.arange(n, dtype=np.int64)
        # position of each row's user-run start
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        user_start = idx[new_user][np.cumsum(new_user) - 1]
        # latest right-row position at a strictly earlier sort position;
        # a carry from a previous user lands < user_start → no match
        right_pos = np.where(~is_left, idx, -1)
        prior = np.concatenate(
            [[-1], np.maximum.accumulate(right_pos)[:-1]])
        ok = is_left & (prior >= user_start)
        pi = prior[ok]
        return pa.table({
            "event_id": pa.array(eid[ok]),
            "user_id": pa.array(uid[ok]),
            "prior_event_id": pa.array(eid[pi]),
            "gap_us": pa.array(ts[ok] - ts[pi]),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("part").map_groups(per_part, batch_format="pyarrow"))


def sql_asof_join_prior(left_type: str = "purchase",
                        right_type: str = "view") -> str:
    return f"""
WITH e AS (SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
                  epoch_us(ts) AS ts_us, event_type FROM events),
l AS (SELECT * FROM e WHERE event_type = '{left_type}'),
r AS (SELECT * FROM e WHERE event_type = '{right_type}'),
j AS (
  SELECT l.event_id, l.user_id, r.event_id AS prior_event_id,
         l.ts_us - r.ts_us AS gap_us,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY r.ts_us DESC, r.event_id DESC) AS rn
  FROM l JOIN r ON l.user_id = r.user_id
   AND (r.ts_us < l.ts_us
        OR (r.ts_us = l.ts_us AND r.event_id < l.event_id)))
SELECT event_id, user_id, prior_event_id, gap_us FROM j WHERE rn = 1
"""


# Deterministic irregular value buckets for the range join — quadratic
# boundaries over the testdata's value domain [0, 500). Float literals
# repr-roundtrip exactly into DuckDB, so containment decisions are
# bit-identical across engines.
RANGE_BUCKETS: list[tuple[int, float, float]] = [
    (j, 7.7 * j * j, 7.7 * (j + 1) * (j + 1)) for j in range(9)
]


def value_range_join(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """RANGE JOIN (inner) of events against the small irregular interval
    table ``RANGE_BUCKETS`` (bucket_id, lo, hi): each event joins the
    bucket with lo ≤ value < hi.

    Ray-Data-first plan: the interval table is the BROADCAST SMALL SIDE —
    intervals are sorted, non-overlapping constants captured in the task
    closure (ray.put-equivalent for kB-scale constants), and each batch
    resolves containment with ONE vectorized ``np.searchsorted`` over the
    boundary array — never a shuffle, never a per-row loop. This is the
    house pattern for any small-side join at 100 TB (dimension tables,
    config ranges): broadcast + per-batch binary search.

    Columns: event_id, bucket_id (int64), lo_c, hi_c (scaled-int
    boundaries ×100, exact in both engines).
    """
    los = np.array([b[1] for b in RANGE_BUCKETS], dtype=np.float64)
    his = np.array([b[2] for b in RANGE_BUCKETS], dtype=np.float64)
    assert (los[1:] >= his[:-1] - 1e-12).all(), "intervals must not overlap"

    def fn(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch["value"], pa.float64()).to_numpy(
            zero_copy_only=False)
        # bucket candidate: rightmost lo ≤ value
        j = np.searchsorted(los, v, side="right") - 1
        ok = (j >= 0) & (v < his[np.clip(j, 0, len(his) - 1)])
        j = j[ok]
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64())
            .filter(pa.array(ok)),
            "bucket_id": pa.array(j.astype(np.int64)),
            "lo_c": pa.array(np.round(los[j] * 100).astype(np.int64)),
            "hi_c": pa.array(np.round(his[j] * 100).astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_value_range_join() -> str:
    # ::DOUBLE — bare decimal literals parse as DECIMAL and overflow on
    # the ×100 scale; doubles also match numpy's comparisons bit-for-bit
    rows = ", ".join(f"({j}, {lo!r}::DOUBLE, {hi!r}::DOUBLE)"
                     for j, lo, hi in RANGE_BUCKETS)
    return f"""
WITH buckets(bucket_id, lo, hi) AS (VALUES {rows})
SELECT e.event_id::BIGINT AS event_id, b.bucket_id::BIGINT AS bucket_id,
       round(b.lo * 100)::BIGINT AS lo_c, round(b.hi * 100)::BIGINT AS hi_c
FROM events e JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
"""


def asof_join_prior_salted(ds: "ray.data.Dataset",
                           left_type: str = "purchase",
                           right_type: str = "view",
                           shard_us: int = 86_400_000_000
                           ) -> "ray.data.Dataset":
    """Skew-safe twin of ``asof_join_prior`` — the 10^12-row path.

    The plain operator co-locates a user's entire history; here the wide
    shuffle keys on (user, time-shard) so no unit of work exceeds a
    user-day. Stage 1 resolves every left event whose prior right event
    lies in the SAME shard and emits two tiny side outputs per (user,
    shard) run: the run's LAST right event (one row) and the run's
    UNRESOLVED left events (those whose prior lies in an earlier shard).
    Stage 2 is a small per-user shuffle over those side rows only —
    lefts sort BEFORE rights within a shard, so the same vectorized
    running-max pass matches each pending left to the latest earlier
    shard's last right. Output is IDENTICAL to asof_join_prior()
    (asserted in tests; same driver oracle).
    """
    def add_shard(batch: pa.Table) -> pa.Table:
        et = pc.cast(batch["event_type"], pa.string())
        keep = pc.is_in(et, value_set=pa.array([left_type, right_type]))
        b = batch.filter(keep)
        uid = pc.cast(b["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(pc.cast(b["ts"], pa.int64()), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        shard = ts // shard_us
        with np.errstate(over="ignore"):
            key = (uid.astype(np.uint64) * _MIX
                   + shard.astype(np.uint64)) * _MIX
        return pa.table({
            "part": pa.array((key % np.uint64(NUM_EVENT_PARTITIONS))
                             .astype(np.int32)),
            "user_id": pa.array(uid),
            "shard": pa.array(shard),
            "ts": pa.array(ts),
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "is_left": pc.equal(pc.cast(b["event_type"], pa.string()),
                                left_type),
        })

    def _rows(eids, uids, prior_eids, gaps, kinds, shards, tss):
        return pa.table({
            "event_id": pa.array(eids, type=pa.int64()),
            "user_id": pa.array(uids, type=pa.int64()),
            "prior_event_id": pa.array(prior_eids, type=pa.int64()),
            "gap_us": pa.array(gaps, type=pa.int64()),
            # kind 2 = resolved match, 0 = pending left, 1 = last-right
            "kind": pa.array(kinds, type=pa.int64()),
            "shard": pa.array(shards, type=pa.int64()),
            "ts": pa.array(tss, type=pa.int64()),
        })

    def per_part(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        shard = group["shard"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        is_left = group["is_left"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return _rows([], [], [], [], [], [], [])
        order = np.lexsort((eid, ts, shard, uid))
        uid, shard, ts, eid, is_left = (uid[order], shard[order],
                                        ts[order], eid[order],
                                        is_left[order])
        n = uid.size
        idx = np.arange(n, dtype=np.int64)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (uid[1:] != uid[:-1]) | (shard[1:] != shard[:-1])
        run_id = np.cumsum(new_run) - 1
        run_start = idx[new_run][run_id]
        right_pos = np.where(~is_left, idx, -1)
        prior = np.concatenate(
            [[-1], np.maximum.accumulate(right_pos)[:-1]])
        matched = is_left & (prior >= run_start)
        pending = is_left & ~matched
        pi = prior[matched]
        k = int(run_id[-1]) + 1
        last_r = np.full(k, -1, dtype=np.int64)
        ir = np.nonzero(~is_left)[0]
        np.maximum.at(last_r, run_id[ir], ir)
        has_r = last_r >= 0
        lr = last_r[has_r]
        nm, np_, nr = int(matched.sum()), int(pending.sum()), int(lr.size)
        z = np.zeros
        i64 = np.int64
        return pa.concat_tables([
            _rows(eid[matched], uid[matched], eid[pi], ts[matched] - ts[pi],
                  np.full(nm, 2, dtype=i64), shard[matched], ts[matched]),
            _rows(eid[pending], uid[pending], np.full(np_, -1, dtype=i64),
                  z(np_, dtype=i64), z(np_, dtype=i64), shard[pending],
                  ts[pending]),
            _rows(eid[lr], uid[lr], np.full(nr, -1, dtype=i64),
                  z(nr, dtype=i64), np.ones(nr, dtype=i64), shard[lr],
                  ts[lr]),
        ])

    stage1 = (ds.map_batches(add_shard, batch_format="pyarrow")
                .groupby("part").map_groups(per_part,
                                            batch_format="pyarrow"))

    def add_upart(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "upart", pa.array(_user_part(uid, NUM_EVENT_PARTITIONS)))

    def merge_part(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        resolved = group.filter(pa.array(kind == 2)).select(
            ["event_id", "user_id", "prior_event_id", "gap_us"])
        side = group.filter(pa.array(kind != 2))
        uid = side["user_id"].to_numpy(zero_copy_only=False)
        shard = side["shard"].to_numpy(zero_copy_only=False)
        ts = side["ts"].to_numpy(zero_copy_only=False)
        eid = side["event_id"].to_numpy(zero_copy_only=False)
        kk = side["kind"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return resolved
        # lefts (kind 0) sort BEFORE rights (kind 1) within a shard, so a
        # pending left sees only rights from strictly earlier shards
        order = np.lexsort((eid, kk, shard, uid))
        uid, shard, ts, eid, kk = (uid[order], shard[order], ts[order],
                                   eid[order], kk[order])
        n = uid.size
        idx = np.arange(n, dtype=np.int64)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        user_start = idx[new_user][np.cumsum(new_user) - 1]
        right_pos = np.where(kk == 1, idx, -1)
        prior = np.concatenate(
            [[-1], np.maximum.accumulate(right_pos)[:-1]])
        ok = (kk == 0) & (prior >= user_start)
        pi = prior[ok]
        late = pa.table({
            "event_id": pa.array(eid[ok]),
            "user_id": pa.array(uid[ok]),
            "prior_event_id": pa.array(eid[pi]),
            "gap_us": pa.array(ts[ok] - ts[pi]),
        })
        return pa.concat_tables([resolved, late])

    return (stage1.map_batches(add_upart, batch_format="pyarrow")
                  .groupby("upart").map_groups(merge_part,
                                               batch_format="pyarrow"))


def rolling_user_window(ds: "ray.data.Dataset",
                        k: int = 5) -> "ray.data.Dataset":
    """Per-user rolling ROWS-window aggregate — for each event, the
    count and Σ value over the ``k`` most recent events of that user
    (current + k−1 preceding, ordered by (ts, event_id); SQL
    ``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW``). The feature-
    engineering staple ("user's spend over their last 5 actions").

    Columns: event_id, user_id, roll_n, roll_sum_c (Σ round(value·100)
    over the window — integer end-to-end, so window sums are exact and
    order-insensitive across engines).

    ONE coarse hash(user) shuffle (the house pattern: a user's rows
    co-locate; partitions hold many users). Inside a partition ALL
    users resolve in one lexsort + prefix-sum pass: rolling sum =
    cumsum[i] − cumsum[lo−1] with lo clamped to the user's run start —
    no per-user or per-row Python. Skew: a hot user's rows land in one
    partition; bound upstream by salting (ts-shard) as in
    ``asof_join_prior_salted`` if a single user exceeds a worker.
    """
    def add_part(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch["user_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(_user_part(uid, NUM_EVENT_PARTITIONS)),
            "user_id": pa.array(uid),
            "ts": pc.cast(batch["ts"], pa.int64()),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "vc": pa.array(np.round(
                batch["value"].to_numpy(zero_copy_only=False) * 100.0)
                .astype(np.int64)),
        })

    def per_part(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        if uid.size == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"event_id": z, "user_id": z,
                             "roll_n": z, "roll_sum_c": z})
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        vc = group["vc"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid, vc = uid[order], eid[order], vc[order]
        n = uid.size
        idx = np.arange(n, dtype=np.int64)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        user_start = idx[new_user][np.cumsum(new_user) - 1]
        lo = np.maximum(idx - (k - 1), user_start)
        cs = np.cumsum(vc)
        prev = np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        return pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "roll_n": pa.array(idx - lo + 1),
            "roll_sum_c": pa.array(cs - prev),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("part").map_groups(per_part,
                                          batch_format="pyarrow"))


def sql_rolling_user_window(k: int = 5) -> str:
    """Exact twin of rolling_user_window: integer window sums over
    round(value·100) — order-insensitive, no float in the window math."""
    return f"""
SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
       CAST(count(*) OVER w AS BIGINT) AS roll_n,
       CAST(sum(round(value * 100)::BIGINT) OVER w AS BIGINT) AS roll_sum_c
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# HyperLogLog distinct-user sketch (the mergeable-sketch custom operator)
# ---------------------------------------------------------------------------
HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P
_HLL_WBITS = 64 - HLL_P        # 56 low bits feed the rank
_HLL_WMASK = np.uint64((1 << _HLL_WBITS) - 1)
_HLL_SCALE = 1 << (_HLL_WBITS + 1)   # 2^57: S = Σ 2^(57−M_j) is integer-exact


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (no float round-trip — a
    2^k−ε value must NOT round up across the power-of-two boundary)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << s)
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl[v > 0] += 1
    return bl


def hll_distinct_users(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Approximate distinct user_id per event_type via a deterministic
    HyperLogLog sketch (Flajolet et al. 2007), p=8 / 256 registers,
    hash = first 8 bytes (big-endian) of md5(str(user_id)) — the repo's
    SQL-reproducible hash discipline, so the estimate is EXACTLY
    restatable in the DuckDB oracle.

    Mergeable-sketch shape: each batch emits ≤ types×256 (event_type,
    bucket, max-rank) partial registers — the shuffle moves registers,
    never users; register merge is max, so the sketch is associative /
    re-aggregable at any fan-in (the 100-TB property). The estimator is
    integer-exact cross-engine: Σ 2^(−M_j) is carried as the integer
    S = Σ 2^(57−M_j) (absent registers contribute 2^57), so the only
    float ops are one division and (in the small-range branch) one ln —
    identical operation order both sides, round(·,6) emitted.

    Columns: event_type (string), est_r (float64).
    """
    import hashlib

    from searchengine_ray.pipelines.common import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(uid, return_inverse=True)
        h = np.fromiter(
            (int.from_bytes(
                hashlib.md5(str(int(u)).encode()).digest()[:8], "big")
             for u in uniq),
            dtype=np.uint64, count=len(uniq))[codes]
        bucket = (h >> np.uint64(_HLL_WBITS)).astype(np.int64)
        w = h & _HLL_WMASK
        rho = (_HLL_WBITS + 1) - _bit_length_u64(w)
        t = pa.table({
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "bucket": pa.array(bucket),
            "rho": pa.array(rho),
        })
        g = t.group_by(["event_type", "bucket"], use_threads=False) \
             .aggregate([("rho", "max")])
        return pa.table({"event_type": g["event_type"],
                         "bucket": g["bucket"],
                         "rho": pc.cast(g["rho_max"], pa.int64())})

    def estimate(part: pa.Table) -> pa.Table:
        g = part.group_by(["event_type", "bucket"], use_threads=False) \
                .aggregate([("rho", "max")])
        types = g["event_type"].to_pylist()
        rhos = g["rho_max"].to_numpy(zero_copy_only=False)
        out_t, out_e = [], []
        for et in sorted(set(types)):
            mj = [int(r) for t, r in zip(types, rhos) if t == et]
            zeros = HLL_M - len(mj)
            s = sum(1 << (_HLL_WBITS + 1 - m) for m in mj) \
                + zeros * _HLL_SCALE
            est = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 \
                * float(_HLL_SCALE) / float(s)
            if est <= 2.5 * HLL_M and zeros > 0:
                est = 256.0 * np.log(256.0 / zeros)
            out_t.append(et)
            out_e.append(round(est, 6))
        return pa.table({"event_type": pa.array(out_t, type=pa.string()),
                         "est_r": pa.array(out_e, type=pa.float64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(partials, ["event_type"], estimate)


def sql_hll_distinct_users() -> str:
    """Exact twin of hll_distinct_users (same hash, same integer S, same
    float operation order)."""
    wbits, scale = _HLL_WBITS, _HLL_SCALE
    wmask = (1 << wbits) - 1
    return f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS h
  FROM events),
r AS (
  SELECT event_type, CAST(h >> {wbits} AS BIGINT) AS bucket,
         CASE WHEN (h & {wmask}::UBIGINT) = 0 THEN {wbits + 1}
              ELSE {wbits + 1} - length(bin(h & {wmask}::UBIGINT)) END AS rho
  FROM h),
m AS (SELECT event_type, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
s AS (SELECT event_type,
             sum(CAST(1 AS BIGINT) << ({wbits + 1} - mj))
               + (256 - count(*))::HUGEINT * {scale}::HUGEINT AS s_int,
             CAST(256 - count(*) AS DOUBLE) AS zeros
      FROM m GROUP BY 1)
SELECT event_type,
       round(CASE WHEN est <= 640.0 AND zeros > 0
                  THEN 256.0 * ln(256.0 / zeros) ELSE est END, 6) AS est_r
FROM (SELECT event_type, zeros,
             (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
               * CAST({scale} AS DOUBLE) / CAST(s_int AS DOUBLE) AS est
      FROM s) t
"""


def global_value_rank(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Global rank of every event by value DESC (``rank()`` semantics:
    1 + count of strictly greater values; ties share a rank) — the
    distributed-global-sort-rank operator, WITHOUT a global sort.

    Bounded-domain broadcast-histogram pattern (same cut as
    value_quantiles): phase 1 builds the exact (value_c, count)
    histogram — partial per batch, digest-sized shuffle, only histogram
    rows reach the driver; the DESC-sorted exclusive prefix sum gives
    each value its rank, broadcast once via ``ray.put``; phase 2 is one
    streaming searchsorted lookup per batch. The corpus is never sorted
    and never re-shuffled. Columns: event_id, rnk (int64).
    """
    import ray

    from searchengine_ray.pipelines.common import grouped_aggregate

    def hpart(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        u, c = np.unique(vc, return_counts=True)
        return pa.table({"vc": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    def hreduce(part: pa.Table) -> pa.Table:
        g = part.group_by(["vc"], use_threads=False).aggregate([("n", "sum")])
        return pa.table({"vc": g["vc"], "n": g["n_sum"]})

    hist = pa.concat_tables(
        [pa.table(b) for b in
         grouped_aggregate(ds.map_batches(hpart, batch_format="pyarrow"),
                           ["vc"], hreduce).iter_batches(batch_format="pyarrow")])
    vals = hist["vc"].to_numpy(zero_copy_only=False)
    cnts = hist["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(-vals, kind="stable")
    vals_desc, cnts_desc = vals[order], cnts[order]
    ranks_desc = np.ones(len(vals_desc), dtype=np.int64)
    ranks_desc[1:] += np.cumsum(cnts_desc[:-1])
    # re-sort ascending for searchsorted lookups
    asc = np.argsort(vals_desc, kind="stable")
    ref = ray.put((vals_desc[asc], ranks_desc[asc]))

    def assign(batch: pa.Table) -> pa.Table:
        v_asc, r_asc = ray.get(ref)
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        pos = np.searchsorted(v_asc, vc)
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "rnk": pa.array(r_asc[pos]),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def sql_global_value_rank() -> str:
    return ("SELECT event_id, CAST(rank() OVER (ORDER BY "
            "CAST(round(value * 100) AS BIGINT) DESC) AS BIGINT) AS rnk "
            "FROM events")


def global_value_rank_ranged(ds: "ray.data.Dataset",
                             num_buckets: int = 32) -> "ray.data.Dataset":
    """Output-identical twin of :func:`global_value_rank` for a
    CONTINUOUS value domain, where the broadcast (value, rank) table
    would be O(N) (ROADMAP round-5 candidate, landed in round 4).

    Nothing O(distinct-values) ever reaches the driver:

      1. exact (vc, n) histogram — the same digest shuffle, kept as a
         DISTRIBUTED Dataset;
      2. histogram rows range-bucket by sampled split points (the splits
         only steer partitioning — output is independent of them);
         per-bucket TOTALS are the only driver fetch: ``num_buckets``
         scalars, whose DESC exclusive prefix gives each bucket its rank
         offset (broadcast back as a tiny closure constant);
      3. one grouped pass ranks each bucket's values locally (DESC sort
         + exclusive prefix + bucket offset) → a DISTRIBUTED (vc, rnk)
         table;
      4. events co-partition with the rank table by hash(vc) in a
         union-shuffle; an in-partition searchsorted assigns every
         event its rank.

    Columns: event_id, rnk (int64) — bit-identical to the broadcast twin
    and the SQL oracle (asserted by the ``events_global_rank_ranged``
    driver entry and tests).
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def hpart(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        u, c = np.unique(vc, return_counts=True)
        return pa.table({"vc": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    def hreduce(part: pa.Table) -> pa.Table:
        g = part.group_by(["vc"], use_threads=False) \
                .aggregate([("n", "sum")])
        return pa.table({"vc": g["vc"],
                         "n": pc.cast(g["n_sum"], pa.int64())})

    hist = grouped_aggregate(ds.map_batches(hpart, batch_format="pyarrow"),
                             ["vc"], hreduce).materialize()

    # split points from a bounded per-batch quantile sample (≤ 33 values
    # per block reach the driver — a SAMPLE, not the table; split quality
    # affects balance only, never output values)
    def sample(batch: pa.Table) -> pa.Table:
        vc = batch["vc"].to_numpy(zero_copy_only=False)
        if len(vc) == 0:
            return pa.table({"s": pa.array([], type=pa.int64())})
        qs = np.quantile(vc, np.linspace(0, 1, num_buckets + 1),
                         method="nearest").astype(np.int64)
        return pa.table({"s": pa.array(np.unique(qs))})

    samp = np.sort(np.unique(np.concatenate(
        [b["s"].to_numpy(zero_copy_only=False) for b in
         hist.map_batches(sample, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")] or
        [np.empty(0, dtype=np.int64)])))
    if len(samp) == 0:
        def empty(batch: pa.Table) -> pa.Table:
            z = pa.array([], type=pa.int64())
            return pa.table({"event_id": z, "rnk": z})
        return ds.map_batches(empty, batch_format="pyarrow")
    splits = np.unique(np.quantile(
        samp, np.linspace(0, 1, num_buckets + 1)[1:-1],
        method="nearest").astype(np.int64))

    def bucket_of(vc: np.ndarray) -> np.ndarray:
        return np.searchsorted(splits, vc, side="right").astype(np.int64)

    # per-bucket totals: the ONLY driver fetch — ≤ num_buckets rows
    def btot(batch: pa.Table) -> pa.Table:
        vc = batch["vc"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        b = bucket_of(vc)
        u, inv = np.unique(b, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, n)
        return pa.table({"b": pa.array(u), "t": pa.array(s)})

    tot = np.zeros(len(splits) + 1, dtype=np.int64)
    for b in hist.map_batches(btot, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        np.add.at(tot, b["b"].to_numpy(zero_copy_only=False),
                  b["t"].to_numpy(zero_copy_only=False))
    # DESC rank offsets: bucket k (values ≤ splits[k]) is OUTRANKED by
    # every value in higher buckets
    offsets = np.concatenate(
        [np.cumsum(tot[::-1])[::-1][1:], [0]]).astype(np.int64)

    # distributed (vc, rnk) table: rank locally within each bucket
    def rank_bucket(part: pa.Table) -> pa.Table:
        vc = part["vc"].to_numpy(zero_copy_only=False)
        n = part["n"].to_numpy(zero_copy_only=False)
        b = int(bucket_of(vc[:1])[0])
        order = np.argsort(-vc, kind="stable")
        vd, nd = vc[order], n[order]
        r = np.ones(len(vd), dtype=np.int64) + offsets[b]
        r[1:] += np.cumsum(nd[:-1])
        return pa.table({"vc": pa.array(vd), "rnk": pa.array(r)})

    def add_bucket(batch: pa.Table) -> pa.Table:
        vc = batch["vc"].to_numpy(zero_copy_only=False)
        return batch.append_column("b", pa.array(bucket_of(vc)))

    ranks = (hist.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("b")
             .map_groups(lambda g: rank_bucket(g.drop_columns(["b"])),
                         batch_format="pyarrow"))

    # assign: events + rank rows co-partition by hash(vc)
    def tag_events(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        return pa.table({
            "vc": pa.array(vc),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "rnk": pa.nulls(len(batch), type=pa.int64()),
            "side": pa.array(np.ones(len(batch), dtype=np.int64)),
        })

    def tag_ranks(batch: pa.Table) -> pa.Table:
        return pa.table({
            "vc": batch["vc"],
            "event_id": pa.nulls(len(batch), type=pa.int64()),
            "rnk": batch["rnk"],
            "side": pa.array(np.zeros(len(batch), dtype=np.int64)),
        })

    def assign(part: pa.Table) -> pa.Table:
        side = part["side"].to_numpy(zero_copy_only=False)
        vc = part["vc"].to_numpy(zero_copy_only=False)
        ev = side == 1
        if not ev.any():
            z = pa.array([], type=pa.int64())
            return pa.table({"event_id": z, "rnk": z})
        rv = vc[~ev]
        rr = part["rnk"].to_numpy(zero_copy_only=False)[~ev]
        order = np.argsort(rv, kind="stable")
        rv, rr = rv[order], rr[order]
        pos = np.searchsorted(rv, vc[ev])
        return pa.table({
            "event_id": pa.array(part["event_id"]
                                 .to_numpy(zero_copy_only=False)[ev]),
            "rnk": pa.array(rr[pos]),
        })

    unioned = (ds.map_batches(tag_events, batch_format="pyarrow")
               .union(ranks.map_batches(tag_ranks,
                                        batch_format="pyarrow")))
    return grouped_aggregate(unioned, ["vc"], assign)


def value_zscore(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-event z-score of value within its event_type — feature
    normalization as a two-phase broadcast-stats pipeline: phase 1
    aggregates EXACT integer moments (n, Σc, Σc²) per type (partial per
    batch, shuffle moves ≤ types rows per batch); phase 2 streams the
    normalization. All float ops happen in one shared operation order on
    integer inputs (population variance), so the SQL twin is bit-exact
    before the shared round(·,6). Columns: event_id, z_r (float64).
    """
    import ray

    from searchengine_ray.pipelines.common import grouped_aggregate

    def mpart(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        t = pa.table({
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            "s": pa.array(vc),
            "ss": pa.array(vc * vc),
        })
        g = (t.group_by(["event_type"], use_threads=False)
             .aggregate([("n", "sum"), ("s", "sum"), ("ss", "sum")]))
        return pa.table({"event_type": g["event_type"], "n": g["n_sum"],
                         "s": g["s_sum"], "ss": g["ss_sum"]})

    def mreduce(part: pa.Table) -> pa.Table:
        g = (part.group_by(["event_type"], use_threads=False)
             .aggregate([("n", "sum"), ("s", "sum"), ("ss", "sum")]))
        return pa.table({"event_type": g["event_type"], "n": g["n_sum"],
                         "s": g["s_sum"], "ss": g["ss_sum"]})

    mom = pa.concat_tables(
        [pa.table(b) for b in
         grouped_aggregate(ds.map_batches(mpart, batch_format="pyarrow"),
                           ["event_type"], mreduce)
         .iter_batches(batch_format="pyarrow")])
    stats = {}
    for et, n, s, ss in zip(mom["event_type"].to_pylist(),
                            mom["n"].to_pylist(), mom["s"].to_pylist(),
                            mom["ss"].to_pylist()):
        # shared float operation order with the SQL twin
        mean = float(s) / float(n)
        var = (float(ss) - float(s) * float(s) / float(n)) / float(n)
        stats[et] = (mean, var ** 0.5)
    ref = ray.put(stats)

    def assign(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        ets = batch["event_type"].to_pylist()
        z = np.empty(len(vc), dtype=np.float64)
        # per-distinct-type vectorized (types are few)
        ets_arr = np.array(ets, dtype=object)
        for et in set(ets):
            mean, sd = st[et]
            m = ets_arr == et
            z[m] = np.round((vc[m].astype(np.float64) - mean) / sd, 6)
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "z_r": pa.array(z),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def sql_value_zscore() -> str:
    """Twin of value_zscore: identical integer moments, identical float
    operation order (population variance), round(·,6)."""
    return """
WITH c AS (SELECT event_id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
m AS (SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vc) AS BIGINT) AS s,
             CAST(sum(vc * vc) AS BIGINT) AS ss
      FROM c GROUP BY event_type)
SELECT c.event_id,
       round((CAST(c.vc AS DOUBLE) - CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))
             / sqrt((CAST(m.ss AS DOUBLE)
                     - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)
                       / CAST(m.n AS DOUBLE)) / CAST(m.n AS DOUBLE)), 6)
         AS z_r
FROM c JOIN m USING (event_type)
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(ds: "ray.data.Dataset",
           steps: tuple[str, ...] = FUNNEL_STEPS) -> "ray.data.Dataset":
    """Ordered-funnel analysis: for every user, the furthest step of
    ``steps`` reached IN ORDER — step k counts only if it happens
    STRICTLY AFTER the user's earliest completion of step k−1 (the
    classic min-ts funnel; re-orderings don't count).

    ONE hash(user) shuffle (coarse partitions), then every user in a
    partition resolves vectorized: per-step masked ``np.minimum.at``
    builds the earliest-completion time against the previous step's
    per-user bound — no per-user Python loop. Columns: user_id, stage
    (int64: 0 = never did step 1, len(steps) = completed the funnel).
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "ts": pc.cast(batch["ts"], pa.int64()),
            "event_type": pc.cast(batch["event_type"], pa.string()),
        })

    def per_part(part: pa.Table) -> pa.Table:
        uid = part["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(part["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        et = np.array(part["event_type"].to_pylist(), dtype=object)
        users, uidx = np.unique(uid, return_inverse=True)
        bound = np.full(len(users), -(1 << 62), dtype=np.int64)
        stage = np.zeros(len(users), dtype=np.int64)
        for k, step in enumerate(steps):
            t = np.full(len(users), 1 << 62, dtype=np.int64)
            m = (et == step) & (ts > bound[uidx]) & (stage == k)[uidx]
            np.minimum.at(t, uidx[m], ts[m])
            done = t < (1 << 62)
            stage[done & (stage == k)] += 1
            bound = np.where(done & (stage == k + 1), t, bound)
        return pa.table({"user_id": pa.array(users),
                         "stage": pa.array(stage)})

    return grouped_aggregate(ds.map_batches(project, batch_format="pyarrow"),
                             ["user_id"], per_part)


def sql_funnel(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    """Twin of funnel(): chained min-ts CTEs, one per step."""
    ctes, prev = [], None
    for k, step in enumerate(steps):
        name = f"s{k + 1}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT user_id, min(epoch_us(ts)) AS t "
                f"FROM events WHERE event_type = '{step}' GROUP BY user_id)")
        else:
            ctes.append(
                f"{name} AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t "
                f"FROM events e JOIN {prev} USING (user_id) "
                f"WHERE e.event_type = '{step}' AND epoch_us(e.ts) > {prev}.t "
                f"GROUP BY e.user_id)")
        prev = name
    joins = " ".join(f"LEFT JOIN s{k + 1} USING (user_id)"
                     for k in range(len(steps)))
    stage = " + ".join(
        f"(CASE WHEN s{k + 1}.t IS NOT NULL THEN 1 ELSE 0 END)"
        for k in range(len(steps)))
    return (f"WITH " + ",\n".join(ctes) + f"\n"
            f"SELECT u.user_id, CAST({stage} AS BIGINT) AS stage\n"
            f"FROM (SELECT DISTINCT user_id FROM events) u {joins}")


WEEK_US = 7 * 86_400_000_000


def retention(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Cohort retention: users cohort by the epoch-week of their FIRST
    event; each cell (cohort_week, week_offset) counts the distinct
    users active that many weeks later — the analytics-warehouse
    staple, as ONE wide shuffle: (user, ts) pairs ride a coarse
    hash(user) exchange once, each partition derives its users'
    cohorts and distinct (cohort, offset, user) triples vectorized
    (lexsort + run masks), and only the digest-sized distinct-triple
    table reaches the final (cohort, offset) count.

    Columns: cohort_week, week_offset, n_users (all int64).
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "w": pa.array(pc.cast(batch["ts"], pa.int64())
                          .to_numpy(zero_copy_only=False) // WEEK_US),
        })

    def per_user_part(part: pa.Table) -> pa.Table:
        uid = part["user_id"].to_numpy(zero_copy_only=False)
        w = part["w"].to_numpy(zero_copy_only=False)
        users, uidx = np.unique(uid, return_inverse=True)
        cohort = np.full(len(users), 1 << 62, dtype=np.int64)
        np.minimum.at(cohort, uidx, w)
        off = w - cohort[uidx]
        # distinct (user, cohort, offset): lexsort + run mask
        order = np.lexsort((off, uidx))
        ui, of = uidx[order], off[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = (ui[1:] != ui[:-1]) | (of[1:] != of[:-1])
        t = pa.table({
            "cohort_week": pa.array(cohort[ui[first]]),
            "week_offset": pa.array(of[first]),
            "n": pa.array(np.ones(int(first.sum()), dtype=np.int64)),
        })
        g = (t.group_by(["cohort_week", "week_offset"], use_threads=False)
             .aggregate([("n", "sum")]))
        return pa.table({"cohort_week": g["cohort_week"],
                         "week_offset": g["week_offset"],
                         "n": g["n_sum"]})

    partials = grouped_aggregate(
        ds.map_batches(project, batch_format="pyarrow"),
        ["user_id"], per_user_part)

    def final(part: pa.Table) -> pa.Table:
        g = (part.group_by(["cohort_week", "week_offset"],
                           use_threads=False).aggregate([("n", "sum")]))
        return pa.table({
            "cohort_week": pc.cast(g["cohort_week"], pa.int64()),
            "week_offset": pc.cast(g["week_offset"], pa.int64()),
            "n_users": pc.cast(g["n_sum"], pa.int64()),
        })

    return grouped_aggregate(partials, ["cohort_week", "week_offset"],
                             final)


def sql_retention() -> str:
    return f"""
WITH f AS (SELECT user_id, min(epoch_us(ts)) // {WEEK_US} AS cw
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT e.user_id, f.cw,
             (epoch_us(e.ts) // {WEEK_US}) - f.cw AS off
      FROM events e JOIN f USING (user_id))
SELECT cw AS cohort_week, off AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY cw, off
"""


def interarrival(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-event inter-arrival gap: microseconds since the SAME user's
    previous event (lag() semantics; −1 for a user's first event; ts
    ties broken by event_id, matching the oracle's ORDER BY ts,
    event_id). One coarse hash(user) shuffle; every user in a partition
    resolves in one lexsort + masked diff. Columns: event_id,
    gap_us (int64)."""
    from searchengine_ray.pipelines.common import grouped_aggregate

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "ts": pc.cast(batch["ts"], pa.int64()),
        })

    def per_part(part: pa.Table) -> pa.Table:
        uid = part["user_id"].to_numpy(zero_copy_only=False)
        eid = part["event_id"].to_numpy(zero_copy_only=False)
        ts = part["ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, e_s, t_s = uid[order], eid[order], ts[order]
        gap = np.empty(len(order), dtype=np.int64)
        if len(order):
            gap[0] = -1
            same = u_s[1:] == u_s[:-1]
            gap[1:] = np.where(same, t_s[1:] - t_s[:-1], -1)
        return pa.table({"event_id": pa.array(e_s),
                         "gap_us": pa.array(gap)})

    return grouped_aggregate(ds.map_batches(project, batch_format="pyarrow"),
                             ["user_id"], per_part)


def sql_interarrival() -> str:
    return """
SELECT event_id,
       coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id),
                -1)::BIGINT AS gap_us
FROM events
"""


def global_percent_rank(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """percent_rank() by value DESC over all events, sort-free: the same
    broadcast-histogram machinery as global_value_rank with one extra
    float ((rank−1)/(N−1), round 6 — computed from exact integer ranks,
    identical op order both engines). Columns: event_id, prank_r."""
    import ray

    from searchengine_ray.pipelines.common import grouped_aggregate

    def hpart(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        u, c = np.unique(vc, return_counts=True)
        return pa.table({"vc": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    def hreduce(part: pa.Table) -> pa.Table:
        g = part.group_by(["vc"], use_threads=False).aggregate([("n", "sum")])
        return pa.table({"vc": g["vc"], "n": g["n_sum"]})

    hist = pa.concat_tables(
        [pa.table(b) for b in
         grouped_aggregate(ds.map_batches(hpart, batch_format="pyarrow"),
                           ["vc"], hreduce).iter_batches(batch_format="pyarrow")])
    vals = hist["vc"].to_numpy(zero_copy_only=False)
    cnts = hist["n"].to_numpy(zero_copy_only=False)
    n_total = int(cnts.sum())
    order = np.argsort(-vals, kind="stable")
    vals_desc, cnts_desc = vals[order], cnts[order]
    ranks_desc = np.ones(len(vals_desc), dtype=np.int64)
    ranks_desc[1:] += np.cumsum(cnts_desc[:-1])
    asc = np.argsort(vals_desc, kind="stable")
    ref = ray.put((vals_desc[asc], ranks_desc[asc], n_total))

    def assign(batch: pa.Table) -> pa.Table:
        v_asc, r_asc, n = ray.get(ref)
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        rnk = r_asc[np.searchsorted(v_asc, vc)]
        denom = float(max(n - 1, 1))
        pr = np.round((rnk - 1).astype(np.float64) / denom, 6)
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "prank_r": pa.array(pr),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def global_percent_rank_ranged(ds: "ray.data.Dataset",
                               num_buckets: int = 32
                               ) -> "ray.data.Dataset":
    """Continuous-domain twin of :func:`global_percent_rank`: composes
    :func:`global_value_rank_ranged` (no O(distinct-values) broadcast)
    with the identical float finisher ((rank−1)/(N−1), round 6 — same op
    order as the broadcast twin and the SQL oracle). N is the dataset
    row count (parquet metadata — one scalar). Columns: event_id,
    prank_r."""
    n_total = ds.count()
    denom = float(max(n_total - 1, 1))
    ranked = global_value_rank_ranged(ds, num_buckets)

    def to_pr(batch: pa.Table) -> pa.Table:
        rnk = batch["rnk"].to_numpy(zero_copy_only=False)
        pr = np.round((rnk - 1).astype(np.float64) / denom, 6)
        return pa.table({"event_id": batch["event_id"],
                         "prank_r": pa.array(pr)})

    return ranked.map_batches(to_pr, batch_format="pyarrow")


def sql_global_percent_rank() -> str:
    return ("SELECT event_id, round(percent_rank() OVER (ORDER BY "
            "CAST(round(value * 100) AS BIGINT) DESC), 6) AS prank_r "
            "FROM events")


def distinct_users_exact(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """EXACT distinct users per event_type — the exact twin of
    :func:`hll_distinct_users` (reference A10 cardinality stats,
    app.py:246-274 health counts, restated as a distributed op).

    Three-level combiner cascade, never a row-level global shuffle of
    the raw events: (1) per-batch dedup of (type, user) pairs inside
    ``map_batches`` (the partial/combiner discipline — repeat users
    collapse before anything moves); (2) ONE hash(type, user) shuffle of
    the already-deduped pairs, per-partition dedup + per-type partial
    counts (a pair lands in exactly one partition, so partials are
    disjoint); (3) a tiny final sum over ≤ partitions × |types| rows.
    At 100 TB the exchanged table is bounded by the true pair
    cardinality, not the event count. Columns: event_type,
    distinct_users (int64).
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def pairs(batch: pa.Table) -> pa.Table:
        return (batch.select(["event_type", "user_id"])
                .group_by(["event_type", "user_id"], use_threads=False)
                .aggregate([]))

    def partial_counts(part: pa.Table) -> pa.Table:
        d = part.group_by(["event_type", "user_id"],
                          use_threads=False).aggregate([])
        c = d.group_by(["event_type"], use_threads=False) \
             .aggregate([("user_id", "count")])
        return pa.table({"event_type": c["event_type"],
                         "partial": pc.cast(c["user_id_count"], pa.int64())})

    partials = grouped_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["event_type", "user_id"], partial_counts)

    def final_sum(part: pa.Table) -> pa.Table:
        g = part.group_by(["event_type"], use_threads=False) \
                .aggregate([("partial", "sum")])
        return pa.table({"event_type": g["event_type"],
                         "distinct_users": pc.cast(g["partial_sum"],
                                                   pa.int64())})

    return grouped_aggregate(partials, ["event_type"], final_sum)


def sql_distinct_users_exact() -> str:
    return ("SELECT event_type, count(DISTINCT user_id)::BIGINT AS "
            "distinct_users FROM events GROUP BY event_type")


def running_total(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-user RUNNING cumulative value (``sum() OVER (PARTITION BY
    user ORDER BY ts)`` semantics) — the unbounded-preceding window
    twin of :func:`rolling_user_window`. Integer cents throughout
    (order-insensitive sums). One coarse hash(user) shuffle; every user
    in a partition resolves in one lexsort + cumsum with vectorized
    group-boundary rebase. Columns: event_id, running_c (int64)."""
    from searchengine_ray.pipelines.common import grouped_aggregate

    def project(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "ts": pc.cast(batch["ts"], pa.int64()),
            "vc": pa.array(vc),
        })

    def per_part(part: pa.Table) -> pa.Table:
        uid = part["user_id"].to_numpy(zero_copy_only=False)
        eid = part["event_id"].to_numpy(zero_copy_only=False)
        ts = part["ts"].to_numpy(zero_copy_only=False)
        vc = part["vc"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, e_s, v_s = uid[order], eid[order], vc[order]
        cs = np.cumsum(v_s)
        if len(order):
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
            base = np.repeat(np.r_[np.int64(0), cs[starts[1:] - 1]],
                             np.diff(np.r_[starts, len(order)]))
            run = cs - base
        else:
            run = cs
        return pa.table({"event_id": pa.array(e_s),
                         "running_c": pa.array(run.astype(np.int64))})

    return grouped_aggregate(ds.map_batches(project, batch_format="pyarrow"),
                             ["user_id"], per_part)


def sql_running_total() -> str:
    return """
SELECT event_id,
       sum(CAST(round(value * 100) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id)::BIGINT AS running_c
FROM events
"""


def value_histogram(ds: "ray.data.Dataset",
                    bin_width_c: int = 500) -> "ray.data.Dataset":
    """Fixed-width value histogram per event_type (bin = floor(cents /
    width)) — the profiling op that sizes the quantile/median bucket
    machinery. Pure combiner shape: per-batch partial histograms (the
    only thing that ever moves is (type, bin, n) digests), then ONE
    hash(type, bin) shuffle summing disjoint partials. Columns:
    event_type, bin, n (int64)."""
    from searchengine_ray.pipelines.common import grouped_aggregate

    def hpart(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        b = np.floor_divide(vc, bin_width_c)
        t = batch.select(["event_type"]).append_column("bin", pa.array(b))
        g = t.group_by(["event_type", "bin"], use_threads=False) \
             .aggregate([("bin", "count")])
        return pa.table({"event_type": g["event_type"], "bin": g["bin"],
                         "n": pc.cast(g["bin_count"], pa.int64())})

    def hsum(part: pa.Table) -> pa.Table:
        g = part.group_by(["event_type", "bin"], use_threads=False) \
                .aggregate([("n", "sum")])
        return pa.table({"event_type": g["event_type"], "bin": g["bin"],
                         "n": pc.cast(g["n_sum"], pa.int64())})

    return grouped_aggregate(ds.map_batches(hpart, batch_format="pyarrow"),
                             ["event_type", "bin"], hsum)


def sql_value_histogram(bin_width_c: int = 500) -> str:
    return (f"SELECT event_type, CAST(floor(CAST(round(value * 100) AS "
            f"BIGINT) / {bin_width_c}.0) AS BIGINT) AS bin, "
            f"count(*)::BIGINT AS n FROM events GROUP BY event_type, bin")


def value_median_exact(ds: "ray.data.Dataset", num_buckets: int = 32,
                       fetch_threshold: int = 4096) -> "ray.data.Dataset":
    """EXACT per-type lower median (q = 1/2; see
    :func:`value_quantile_exact` for the algorithm). Columns:
    event_type, median_c (int64)."""
    return value_quantile_exact(ds, 1, 2, "median_c",
                                num_buckets, fetch_threshold)


def value_quantile_exact(ds: "ray.data.Dataset", q_num: int = 1,
                         q_den: int = 2, out_col: str = "median_c",
                         num_buckets: int = 32,
                         fetch_threshold: int = 4096
                         ) -> "ray.data.Dataset":
    """EXACT per-type q-quantile — the k-th smallest cents value with
    k = ceil(q*n) = (q_num*n + q_den - 1) // q_den — by ITERATIVE
    DISTRIBUTED SELECTION (:func:`_iterative_select`), never a sort
    and never an O(distinct-values) structure on the driver. Columns:
    event_type, <out_col> (int64)."""
    proj = _project_type_cents(ds)
    stats = _type_value_stats(proj)
    active = {(ty, out_col): (int(lo) - 1, int(hi),
                              (q_num * int(n) + q_den - 1) // q_den)
              for ty, (n, lo, hi) in stats.items()}
    counts = {(ty, out_col): int(n) for ty, (n, _, _) in stats.items()}
    result = _iterative_select(proj, active, counts, num_buckets,
                               fetch_threshold)
    tys = sorted(stats)
    return _table_dataset(pa.table({
        "event_type": pa.array(tys, type=pa.string()),
        out_col: pa.array([result[(t, out_col)] for t in tys],
                          type=pa.int64()),
    }))


def _project_type_cents(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(event_type, vc=round(value*100)) projection the selection scans
    re-stream per round — at 100 TB each round re-reads two id-width
    columns from storage rather than pinning a projection in the
    object store."""
    def project(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "vc": pa.array(vc)})

    return ds.select_columns(["event_type", "value"]) \
             .map_batches(project, batch_format="pyarrow")


def _type_value_stats(proj: "ray.data.Dataset"
                      ) -> dict[str, tuple[int, int, int]]:
    """One streaming pass -> {event_type: (n, min_vc, max_vc)} from
    digest-sized per-batch partials."""
    def stats_part(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type"], use_threads=False).aggregate(
            [("vc", "count"), ("vc", "min"), ("vc", "max")])
        return pa.table({"event_type": g["event_type"],
                         "n": pc.cast(g["vc_count"], pa.int64()),
                         "lo": g["vc_min"], "hi": g["vc_max"]})

    agg: dict[str, list[int]] = {}
    for b in proj.map_batches(stats_part, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        for ty, n, lo, hi in zip(b["event_type"].to_pylist(),
                                 b["n"].to_pylist(), b["lo"].to_pylist(),
                                 b["hi"].to_pylist()):
            cur = agg.setdefault(ty, [0, lo, hi])
            cur[0] += n
            cur[1] = min(cur[1], lo)
            cur[2] = max(cur[2], hi)
    return {ty: (int(n), int(lo), int(hi))
            for ty, (n, lo, hi) in agg.items()}


def _iterative_select(proj: "ray.data.Dataset",
                      active: dict[tuple[str, str], tuple[int, int, int]],
                      counts: dict[tuple[str, str], int],
                      num_buckets: int = 32,
                      fetch_threshold: int = 4096
                      ) -> dict[tuple[str, str], int]:
    """Iterative distributed selection over (event_type, vc) rows for
    MANY targets at once: ``active[(type, tag)] = (lo_excl, hi_incl,
    k)`` asks for the k-th smallest vc in (lo, hi] among rows of that
    type. Each refinement round is ONE streaming column scan: every
    batch bins its in-interval values for EVERY still-active target
    into ``num_buckets`` sub-buckets and emits (type, tag, bucket,
    count) digests — the ONLY thing the driver ever accumulates
    (<= targets x buckets scalars per block). The driver walks the
    cumulative counts, narrows each target's interval, and re-scans;
    a target stops when its interval holds <= ``fetch_threshold``
    values (fetched once; ``np.partition`` gives the exact order
    statistic) or collapses to a single integer. Rounds are
    O(log_buckets(value_range)) — the slowest target bounds the scan
    count, so p50/p90/p99 together cost the same passes as one."""
    active = dict(active)
    counts = dict(counts)
    result: dict[tuple[str, str], int] = {}
    to_fetch: dict[tuple[str, str], tuple[int, int, int]] = {}

    while active:
        for key in list(active):
            lo, hi, k = active[key]
            if hi - lo == 1:          # single integer left — done
                result[key] = hi
                del active[key]
            elif counts[key] <= fetch_threshold:
                to_fetch[key] = active.pop(key)
        if not active:
            break
        # integer sub-edges per target (inner edges, ascending)
        spec = {}
        for key, (lo, hi, _k) in active.items():
            edges = np.unique(np.linspace(lo, hi, num_buckets + 1)
                              .astype(np.int64))[1:-1]
            spec[key] = (lo, hi, edges)

        def bucket_pass(batch: pa.Table, _spec=spec) -> pa.Table:
            vc = batch["vc"].to_numpy(zero_copy_only=False)
            by_ty: dict[str, list] = {}
            for (ty, tag), s in _spec.items():
                by_ty.setdefault(ty, []).append((tag, s))
            tys, tags, bks, cts = [], [], [], []
            for ty, specs in by_ty.items():
                tm = pc.equal(batch["event_type"], ty).to_numpy(
                    zero_copy_only=False)
                if not tm.any():
                    continue
                for tag, (lo, hi, edges) in specs:
                    m = tm & (vc > lo) & (vc <= hi)
                    if not m.any():
                        continue
                    bk = np.searchsorted(edges, vc[m], side="left")
                    u, c = np.unique(bk, return_counts=True)
                    tys.extend([ty] * len(u))
                    tags.extend([tag] * len(u))
                    bks.append(u.astype(np.int64))
                    cts.append(c.astype(np.int64))
            if not tys:
                z = pa.array([], type=pa.int64())
                return pa.table({"event_type":
                                 pa.array([], type=pa.string()),
                                 "tag": pa.array([], type=pa.string()),
                                 "bk": z, "c": z})
            return pa.table({"event_type": pa.array(tys),
                             "tag": pa.array(tags),
                             "bk": pa.array(np.concatenate(bks)),
                             "c": pa.array(np.concatenate(cts))})

        hist: dict[tuple[str, str], np.ndarray] = {
            key: np.zeros(len(spec[key][2]) + 1, dtype=np.int64)
            for key in spec}
        for b in proj.map_batches(bucket_pass, batch_format="pyarrow") \
                     .iter_batches(batch_format="pyarrow"):
            for ty, tag, bk, c in zip(b["event_type"].to_pylist(),
                                      b["tag"].to_pylist(),
                                      b["bk"].to_pylist(),
                                      b["c"].to_pylist()):
                hist[(ty, tag)][bk] += c
        for key in list(active):
            lo, hi, k = active[key]
            edges = spec[key][2]
            cum = np.cumsum(hist[key])
            j = int(np.searchsorted(cum, k, side="left"))
            k_new = k - (int(cum[j - 1]) if j else 0)
            all_edges = np.concatenate([[lo], edges, [hi]])
            active[key] = (int(all_edges[j]), int(all_edges[j + 1]), k_new)
            counts[key] = int(hist[key][j])

    if to_fetch:
        fspec = dict(to_fetch)

        def fetch(batch: pa.Table, _f=fspec) -> pa.Table:
            vc = batch["vc"].to_numpy(zero_copy_only=False)
            by_ty: dict[str, list] = {}
            for (ty, tag), s in _f.items():
                by_ty.setdefault(ty, []).append((tag, s))
            tys, tags, vals = [], [], []
            for ty, specs in by_ty.items():
                tm = pc.equal(batch["event_type"], ty).to_numpy(
                    zero_copy_only=False)
                if not tm.any():
                    continue
                for tag, (lo, hi, _k) in specs:
                    m = tm & (vc > lo) & (vc <= hi)
                    if not m.any():
                        continue
                    nm = int(m.sum())
                    tys.extend([ty] * nm)
                    tags.extend([tag] * nm)
                    vals.append(vc[m])
            if not tys:
                return pa.table({"event_type":
                                 pa.array([], type=pa.string()),
                                 "tag": pa.array([], type=pa.string()),
                                 "vc": pa.array([], type=pa.int64())})
            return pa.table({"event_type": pa.array(tys),
                             "tag": pa.array(tags),
                             "vc": pa.array(np.concatenate(vals))})

        vals: dict[tuple[str, str], list[np.ndarray]] = {
            key: [] for key in fspec}
        for b in proj.map_batches(fetch, batch_format="pyarrow") \
                     .iter_batches(batch_format="pyarrow"):
            t = b["event_type"].to_numpy(zero_copy_only=False)
            g = b["tag"].to_numpy(zero_copy_only=False)
            v = b["vc"].to_numpy(zero_copy_only=False)
            for ty, tag in fspec:
                m = (t == ty) & (g == tag)
                if m.any():
                    vals[(ty, tag)].append(v[m])
        for key, (_lo, _hi, k) in fspec.items():
            v = (np.concatenate(vals[key]) if vals[key]
                 else np.empty(0, dtype=np.int64))
            result[key] = int(np.partition(v, k - 1)[k - 1])
    return result


def _table_dataset(tbl: pa.Table) -> "ray.data.Dataset":
    import ray
    return ray.data.from_arrow(tbl)


def sql_value_median_exact() -> str:
    return sql_value_quantile_exact(1, 2, "median_c")


def sql_value_quantile_exact(q_num: int = 1, q_den: int = 2,
                             out_col: str = "median_c") -> str:
    return f"""
SELECT event_type, vc AS {out_col} FROM (
  SELECT event_type, vc,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY vc, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM (SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS vc FROM events)
) WHERE rn = ({q_num} * n + {q_den} - 1) // {q_den}
"""


TOP_N_DEFAULT = 100


def top_n_by_value(ds: "ray.data.Dataset",
                   n: int = TOP_N_DEFAULT) -> "ray.data.Dataset":
    """Global top-N events by value (DESC, event_id ASC tie-break)
    WITHOUT a global sort: every batch pre-aggregates its own top-N
    (lexsort + head — ≤ N rows leave each batch), one single-key reduce
    finishes. The shuffle moves ≤ N × blocks digest rows; the corpus is
    never re-ordered. Columns: rnk, event_id, vc (int64)."""
    from searchengine_ray.pipelines.common import grouped_aggregate

    def _head(eid: np.ndarray, vc: np.ndarray, emit_rank: bool
              ) -> pa.Table:
        order = np.lexsort((eid, -vc))[:n]
        cols = {}
        if emit_rank:
            cols["rnk"] = pa.array(np.arange(1, len(order) + 1,
                                             dtype=np.int64))
        cols["event_id"] = pa.array(eid[order])
        cols["vc"] = pa.array(vc[order])
        return pa.table(cols)

    def partial(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        eid = pc.cast(batch["event_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = _head(eid, vc, emit_rank=False)
        return t.append_column("k", pa.array(
            np.zeros(len(t), dtype=np.int64)))

    def final(part: pa.Table) -> pa.Table:
        return _head(part["event_id"].to_numpy(zero_copy_only=False),
                     part["vc"].to_numpy(zero_copy_only=False),
                     emit_rank=True)

    return grouped_aggregate(ds.map_batches(partial,
                                            batch_format="pyarrow"),
                             ["k"], final)


def sql_top_n_by_value(n: int = TOP_N_DEFAULT) -> str:
    return (f"SELECT CAST(row_number() OVER (ORDER BY "
            f"CAST(round(value * 100) AS BIGINT) DESC, event_id) AS BIGINT)"
            f" AS rnk, event_id, CAST(round(value * 100) AS BIGINT) AS vc "
            f"FROM events ORDER BY rnk LIMIT {n}")


def type_value_rank_ranged(ds: "ray.data.Dataset",
                           num_buckets: int = 32) -> "ray.data.Dataset":
    """GROUPED window rank — ``rank() OVER (PARTITION BY event_type
    ORDER BY value DESC)`` — for a CONTINUOUS value domain, same
    driver-surface discipline as :func:`global_value_rank_ranged`:

      1. exact (type, vc, n) histogram digest, kept DISTRIBUTED;
      2. histogram rows range-bucket by sampled global splits (splits
         steer partitioning only — output independent of them);
         per-(type, bucket) TOTALS are the only driver fetch
         (≤ |types| × num_buckets scalars), whose per-type DESC
         exclusive prefix gives each bucket its in-type rank offset;
      3. one grouped pass ranks each (type, bucket) locally → a
         DISTRIBUTED (type, vc, rnk) table;
      4. events co-partition with the rank table by hash(type, vc);
         an in-partition per-type searchsorted assigns ranks.

    Columns: event_id, rnk (int64).
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def hpart(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "vc": pa.array(vc)})
        g = t.group_by(["event_type", "vc"], use_threads=False) \
             .aggregate([("vc", "count")])
        return pa.table({"event_type": g["event_type"], "vc": g["vc"],
                         "n": pc.cast(g["vc_count"], pa.int64())})

    def hreduce(part: pa.Table) -> pa.Table:
        g = part.group_by(["event_type", "vc"], use_threads=False) \
                .aggregate([("n", "sum")])
        return pa.table({"event_type": g["event_type"], "vc": g["vc"],
                         "n": pc.cast(g["n_sum"], pa.int64())})

    hist = grouped_aggregate(ds.map_batches(hpart, batch_format="pyarrow"),
                             ["event_type", "vc"], hreduce).materialize()

    # global split points from a bounded per-block sample (balance only)
    def sample(batch: pa.Table) -> pa.Table:
        vc = batch["vc"].to_numpy(zero_copy_only=False)
        if len(vc) == 0:
            return pa.table({"s": pa.array([], type=pa.int64())})
        qs = np.quantile(vc, np.linspace(0, 1, num_buckets + 1),
                         method="nearest").astype(np.int64)
        return pa.table({"s": pa.array(np.unique(qs))})

    samp = np.sort(np.unique(np.concatenate(
        [b["s"].to_numpy(zero_copy_only=False) for b in
         hist.map_batches(sample, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")] or
        [np.empty(0, dtype=np.int64)])))
    if len(samp) == 0:
        def empty(batch: pa.Table) -> pa.Table:
            z = pa.array([], type=pa.int64())
            return pa.table({"event_id": z, "rnk": z})
        return ds.map_batches(empty, batch_format="pyarrow")
    splits = np.unique(np.quantile(
        samp, np.linspace(0, 1, num_buckets + 1)[1:-1],
        method="nearest").astype(np.int64))

    def bucket_of(vc: np.ndarray) -> np.ndarray:
        return np.searchsorted(splits, vc, side="right").astype(np.int64)

    # per-(type, bucket) totals — the ONLY driver fetch
    def btot(batch: pa.Table) -> pa.Table:
        vc = batch["vc"].to_numpy(zero_copy_only=False)
        t = batch.select(["event_type"]) \
            .append_column("b", pa.array(bucket_of(vc))) \
            .append_column("n", batch["n"])
        g = t.group_by(["event_type", "b"], use_threads=False) \
             .aggregate([("n", "sum")])
        return pa.table({"event_type": g["event_type"], "b": g["b"],
                         "t": pc.cast(g["n_sum"], pa.int64())})

    tot: dict[str, np.ndarray] = {}
    nb = len(splits) + 1
    for b in hist.map_batches(btot, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        for ty, bk, n in zip(b["event_type"].to_pylist(),
                             b["b"].to_pylist(), b["t"].to_pylist()):
            tot.setdefault(ty, np.zeros(nb, dtype=np.int64))[bk] += n
    # per-type DESC rank offsets
    offsets = {ty: np.concatenate([np.cumsum(t[::-1])[::-1][1:], [0]])
               .astype(np.int64) for ty, t in tot.items()}

    def rank_bucket(part: pa.Table) -> pa.Table:
        vc = part["vc"].to_numpy(zero_copy_only=False)
        n = part["n"].to_numpy(zero_copy_only=False)
        ty = part["event_type"][0].as_py()
        b = int(bucket_of(vc[:1])[0])
        order = np.argsort(-vc, kind="stable")
        vd, nd = vc[order], n[order]
        r = np.ones(len(vd), dtype=np.int64) + offsets[ty][b]
        r[1:] += np.cumsum(nd[:-1])
        return pa.table({"event_type": pa.array([ty] * len(vd),
                                                type=pa.string()),
                         "vc": pa.array(vd), "rnk": pa.array(r)})

    def add_bucket(batch: pa.Table) -> pa.Table:
        vc = batch["vc"].to_numpy(zero_copy_only=False)
        return batch.append_column("b", pa.array(bucket_of(vc)))

    ranks = (hist.map_batches(add_bucket, batch_format="pyarrow")
             .groupby(["event_type", "b"])
             .map_groups(lambda g: rank_bucket(g.drop_columns(["b"])),
                         batch_format="pyarrow"))

    def tag_events(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        return pa.table({
            "event_type": batch["event_type"],
            "vc": pa.array(vc),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "rnk": pa.nulls(len(batch), type=pa.int64()),
            "side": pa.array(np.ones(len(batch), dtype=np.int64)),
        })

    def tag_ranks(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "vc": batch["vc"],
            "event_id": pa.nulls(len(batch), type=pa.int64()),
            "rnk": batch["rnk"],
            "side": pa.array(np.zeros(len(batch), dtype=np.int64)),
        })

    def assign(part: pa.Table) -> pa.Table:
        side = part["side"].to_numpy(zero_copy_only=False)
        vc = part["vc"].to_numpy(zero_copy_only=False)
        ev = side == 1
        if not ev.any():
            z = pa.array([], type=pa.int64())
            return pa.table({"event_id": z, "rnk": z})
        out_eid, out_rnk = [], []
        eid = part["event_id"].to_numpy(zero_copy_only=False)
        rnk = part["rnk"].to_numpy(zero_copy_only=False)
        types = part["event_type"]
        for ty in pc.unique(types).to_pylist():  # |types| is bounded
            tm = pc.equal(types, ty).to_numpy(zero_copy_only=False)
            evm, rm = tm & ev, tm & ~ev
            if not evm.any():
                continue
            rv, rr = vc[rm], rnk[rm]
            order = np.argsort(rv, kind="stable")
            rv, rr = rv[order], rr[order]
            pos = np.searchsorted(rv, vc[evm])
            out_eid.append(eid[evm])
            out_rnk.append(rr[pos])
        return pa.table({
            "event_id": pa.array(np.concatenate(out_eid)),
            "rnk": pa.array(np.concatenate(out_rnk)),
        })

    unioned = (ds.map_batches(tag_events, batch_format="pyarrow")
               .union(ranks.map_batches(tag_ranks,
                                        batch_format="pyarrow")))
    return grouped_aggregate(unioned, ["event_type", "vc"], assign)


def sql_type_value_rank() -> str:
    return ("SELECT event_id, CAST(rank() OVER (PARTITION BY event_type "
            "ORDER BY CAST(round(value * 100) AS BIGINT) DESC) AS BIGINT)"
            " AS rnk FROM events")


PIVOT_TYPES = ("signup", "click", "error", "view", "purchase")


def pivot_type_counts(ds: "ray.data.Dataset",
                      types: tuple[str, ...] = PIVOT_TYPES
                      ) -> "ray.data.Dataset":
    """PIVOT / one-hot feature matrix: one row per user with one count
    column per event type (``n_<type>``) plus ``n_total`` — the classic
    crosstab used to turn an event log into a per-entity feature table.

    Pure combiner: each batch pre-aggregates indicator columns with
    Arrow's C++ group_by, so the exchange moves ≤ |users-in-batch| rows
    of int64 counts per batch and the final ``grouped_aggregate`` sums
    partials per coarse hash(user) partition. The pivoted type set is a
    fixed argument (as in SQL PIVOT) — unknown types count only toward
    ``n_total``, keeping the output schema static at any scale.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    cols = [f"n_{t}" for t in types]

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        d = {"user_id": pc.cast(batch["user_id"], pa.int64())}
        for t, c in zip(types, cols):
            d[c] = pc.cast(pc.equal(et, t), pa.int64())
        d["n_total"] = pa.array(np.ones(len(batch), dtype=np.int64))
        t_ = pa.table(d)
        g = (t_.group_by(["user_id"], use_threads=False)
             .aggregate([(c, "sum") for c in cols + ["n_total"]]))
        return g.rename_columns(["user_id"] + cols + ["n_total"])

    def final(part: pa.Table) -> pa.Table:
        g = (part.group_by(["user_id"], use_threads=False)
             .aggregate([(c, "sum") for c in cols + ["n_total"]]))
        out = {"user_id": pc.cast(g["user_id"], pa.int64())}
        for c in cols + ["n_total"]:
            out[c] = pc.cast(g[f"{c}_sum"], pa.int64())
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(partials, ["user_id"], final)


def sql_pivot_type_counts(types: tuple[str, ...] = PIVOT_TYPES) -> str:
    filt = ", ".join(
        f"count(*) FILTER (WHERE event_type = '{t}')::BIGINT AS n_{t}"
        for t in types)
    return (f"SELECT user_id, {filt}, count(*)::BIGINT AS n_total "
            f"FROM events GROUP BY user_id")


def user_value_median(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """GROUPED exact median at HIGH key cardinality — ``median(value)
    GROUP BY user_id`` — the shape where per-group iterative selection
    (value_median_exact's per-TYPE loop) would not amortize.

    One coarse hash(user) shuffle; inside each partition ALL users'
    medians compute in a single vectorized pass (lexsort by (user, vc),
    run-length segment bounds, gather the two middle elements per run).
    Groups never span partitions, so this is exact; the driver never
    sees raw rows. Columns: user_id, median_c2 (int64 — the median in
    HALF-cents: lo+hi of the two middles, = 2·median, so even-count
    averages stay integers and order-insensitive).
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def med(part: pa.Table) -> pa.Table:
        uid = pc.cast(part["user_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        vc = np.round(part["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        if uid.size == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"user_id": z, "median_c2": z})
        order = np.lexsort((vc, uid))
        uid, vc = uid[order], vc[order]
        new = np.empty(uid.size, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, uid.size])
        lo = vc[starts + (counts - 1) // 2]
        hi = vc[starts + counts // 2]
        return pa.table({"user_id": pa.array(uid[starts]),
                         "median_c2": pa.array(lo + hi)})

    return grouped_aggregate(ds, ["user_id"], med)


def sql_user_value_median() -> str:
    # 2·median of integer cents == the sum of the two middle elements,
    # integer-exact on both engines (DuckDB median interpolates halves)
    return ("SELECT user_id, CAST(round(2 * median("
            "CAST(round(value * 100) AS BIGINT))) AS BIGINT) AS median_c2 "
            "FROM events GROUP BY user_id")


def type_transitions(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Markov TRANSITION MATRIX of consecutive event types per user —
    ``(event_type, lead(event_type) OVER (PARTITION BY user ORDER BY
    ts, event_id))`` counted globally. Columns: prev_type, next_type, n.

    One coarse hash(user) shuffle (a user's events co-locate, so every
    consecutive pair is visible in exactly one partition); inside each
    partition ALL users' transitions extract in a single lexsorted
    shift-compare pass, pre-counted per partition, then a tiny
    (type × type)-row reduce. The sequence step never leaves the
    partition — only the ≤ |types|² digest rows move twice.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def per_part(part: pa.Table) -> pa.Table:
        uid = pc.cast(part["user_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = pc.cast(part["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(part["event_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        et = part["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        if uid.size == 0:
            e = pa.array([], type=pa.string())
            return pa.table({"prev_type": e, "next_type": e,
                             "pn": pa.array([], type=pa.int64())})
        order = np.lexsort((eid, ts, uid))
        same_user = uid[order][1:] == uid[order][:-1]
        oa = pa.array(order)
        t = pa.table({
            "prev_type": et.take(oa[:-1]),
            "next_type": et.take(oa[1:]),
        }).filter(pa.array(same_user))
        g = (t.group_by(["prev_type", "next_type"], use_threads=False)
             .aggregate([([], "count_all")]))
        return pa.table({"prev_type": g["prev_type"],
                         "next_type": g["next_type"],
                         "pn": pc.cast(g["count_all"], pa.int64())})

    def final(part: pa.Table) -> pa.Table:
        g = (part.group_by(["prev_type", "next_type"], use_threads=False)
             .aggregate([("pn", "sum")]))
        return pa.table({
            "prev_type": pc.cast(g["prev_type"], pa.string()),
            "next_type": pc.cast(g["next_type"], pa.string()),
            "n": pc.cast(g["pn_sum"], pa.int64()),
        })

    partials = grouped_aggregate(ds, ["user_id"], per_part)
    return grouped_aggregate(partials, ["prev_type", "next_type"], final)


def sql_type_transitions() -> str:
    return """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT event_type AS prev_type, nxt AS next_type, count(*)::BIGINT AS n
FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
"""


def latest_per_user(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """LATEST-RECORD-PER-KEY materialization (the CDC/state-table
    pattern: reduce an append-only log to each key's current row).
    Columns: user_id, event_id, ts_us, event_type, vc — the row of the
    user's latest event (max ts; ties → max event_id).

    Per-batch pre-reduction keeps only each user's in-batch latest row
    (≤ |users-in-batch| rows leave every batch), then ONE coarse
    hash(user) shuffle and a vectorized per-partition take-last finish.
    Never a global sort; the log's full width rides only the digest
    rows.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def take_latest(t: pa.Table) -> pa.Table:
        uid = pc.cast(t["user_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts_us"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(t["event_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if uid.size == 0:
            return t
        order = np.lexsort((eid, ts, uid))
        last = np.empty(uid.size, dtype=bool)
        sorted_uid = uid[order]
        last[:-1] = sorted_uid[1:] != sorted_uid[:-1]
        last[-1] = True
        return t.take(pa.array(order[last]))

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "vc": pa.array(np.round(
                batch["value"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)),
        })
        return take_latest(t)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(partials, ["user_id"], take_latest)


def sql_latest_per_user() -> str:
    return """
SELECT user_id, event_id, ts_us, event_type, vc FROM (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
         CAST(round(value * 100) AS BIGINT) AS vc,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


def value_outliers(ds: "ray.data.Dataset",
                   num_buckets: int = 32,
                   fetch_threshold: int = 4096) -> "ray.data.Dataset":
    """Per-type IQR OUTLIER counts — Tukey fences from EXACT p25/p75
    (the iterative-distributed-selection machinery composed twice), in
    doubled integer cents so the 1.5·IQR arithmetic stays exact:
    low: 2·vc < 2·p25 − 3·(p75−p25); high: 2·vc > 2·p75 + 3·(p75−p25).
    Columns: event_type, n_low, n_high.

    The two selection passes ship only (type, bucket, count) digests;
    the fences (≤ |types| scalars) broadcast into a final counting
    pass — one partial per batch, one tiny reduce.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    q25 = {r["event_type"]: int(r["p_c"]) for r in
           value_quantile_exact(ds, 1, 4, "p_c", num_buckets,
                                fetch_threshold).take_all()}
    q75 = {r["event_type"]: int(r["p_c"]) for r in
           value_quantile_exact(ds, 3, 4, "p_c", num_buckets,
                                fetch_threshold).take_all()}
    types = sorted(q25)
    type_arr = pa.array(types, type=pa.string())
    lo_arr = np.array([2 * q25[t] - 3 * (q75[t] - q25[t])
                       for t in types], dtype=np.int64)
    hi_arr = np.array([2 * q75[t] + 3 * (q75[t] - q25[t])
                       for t in types], dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        et = pc.cast(batch["event_type"], pa.string())
        idx = pc.index_in(et, type_arr).to_numpy(zero_copy_only=False)
        vc2 = 2 * np.round(batch["value"].to_numpy(zero_copy_only=False)
                           * 100.0).astype(np.int64)
        t = pa.table({
            "event_type": et,
            "l": pa.array((vc2 < lo_arr[idx]).astype(np.int64)),
            "h": pa.array((vc2 > hi_arr[idx]).astype(np.int64)),
        })
        return (t.group_by(["event_type"], use_threads=False)
                 .aggregate([("l", "sum"), ("h", "sum")])
                 .rename_columns(["event_type", "l", "h"]))

    def final(part: pa.Table) -> pa.Table:
        g = (part.group_by(["event_type"], use_threads=False)
             .aggregate([("l", "sum"), ("h", "sum")]))
        return pa.table({
            "event_type": pc.cast(g["event_type"], pa.string()),
            "n_low": pc.cast(g["l_sum"], pa.int64()),
            "n_high": pc.cast(g["h_sum"], pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(partials, ["event_type"], final)


def sql_value_outliers() -> str:
    q25 = sql_value_quantile_exact(1, 4, "p25_c")
    q75 = sql_value_quantile_exact(3, 4, "p75_c")
    return f"""
WITH f AS (
  SELECT a.event_type,
         2 * a.p25_c - 3 * (b.p75_c - a.p25_c) AS lo2,
         2 * b.p75_c + 3 * (b.p75_c - a.p25_c) AS hi2
  FROM ({q25}) a JOIN ({q75}) b USING (event_type))
SELECT e.event_type,
       sum(CASE WHEN 2 * CAST(round(e.value * 100) AS BIGINT) < f.lo2
                THEN 1 ELSE 0 END)::BIGINT AS n_low,
       sum(CASE WHEN 2 * CAST(round(e.value * 100) AS BIGINT) > f.hi2
                THEN 1 ELSE 0 END)::BIGINT AS n_high
FROM events e JOIN f USING (event_type)
GROUP BY e.event_type
"""


THROTTLE_GAP_US = 86_400_000_000  # 1 day


def throttle(ds: "ray.data.Dataset",
             gap_us: int = THROTTLE_GAP_US) -> "ray.data.Dataset":
    """DEBOUNCE / THROTTLE: keep an event iff no PREVIOUS event of the
    same (user_id, event_type) occurred within ``gap_us`` (lag
    semantics — each event compares to the immediately preceding RAW
    event of its key, the dedup used for retry storms and duplicate
    beacons). Columns: event_id, kept (bool) — a mask, so the caller
    can either filter or audit.

    One coarse hash(user, type) shuffle; inside a partition all keys
    debounce in a single lexsorted shift-compare (a key's events
    co-locate, so the lag never crosses partitions).
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def per_part(part: pa.Table) -> pa.Table:
        uid = pc.cast(part["user_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = pc.cast(part["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(part["event_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        et = part["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        if uid.size == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "kept": pa.array([], type=pa.bool_())})
        codes = np.asarray(et.dictionary_encode().indices,
                           dtype=np.int64)
        order = np.lexsort((eid, ts, codes, uid))
        u, c, t = uid[order], codes[order], ts[order]
        kept = np.empty(u.size, dtype=bool)
        kept[0] = True
        kept[1:] = (u[1:] != u[:-1]) | (c[1:] != c[:-1]) \
            | ((t[1:] - t[:-1]) > gap_us)
        return pa.table({"event_id": pa.array(eid[order]),
                         "kept": pa.array(kept)})

    return grouped_aggregate(ds, ["user_id", "event_type"], per_part)


def sql_throttle(gap_us: int = THROTTLE_GAP_US) -> str:
    return f"""
WITH s AS (
  SELECT event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts, event_id) AS d
  FROM events)
SELECT event_id, (d IS NULL OR d > {gap_us}) AS kept FROM s
"""


def throttle_chained(ds: "ray.data.Dataset",
                     gap_us: int = THROTTLE_GAP_US) -> "ray.data.Dataset":
    """CHAINED debounce: keep an event iff its ts is more than ``gap_us``
    after the last KEPT event of the same (user_id, event_type) — the
    first event of a key is always kept. Unlike :func:`throttle` (lag
    semantics, compares to the previous RAW event) this recurrence is
    prefix-dependent: whether event i survives depends on which earlier
    events survived, so no window function expresses it (the oracle is
    a recursive CTE). Columns: event_id, kept (bool).

    Distribution: the same ONE coarse hash(user, type) shuffle as
    :func:`throttle` — a key's events co-locate, so the chain never
    crosses partitions. Inside a partition every key advances in
    LOCKSTEP: round r visits each still-active key's r-th event with
    one vectorized compare against the per-key kept anchor (segments
    sorted by length descending, so round r's active keys are a prefix
    and total work is O(rows), never a Python loop over events). Skew:
    a single key with K events costs K lockstep rounds — the same
    co-location assumption sessionize documents; salt hot keys
    upstream if one key dominates.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def per_part(part: pa.Table) -> pa.Table:
        uid = pc.cast(part["user_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = pc.cast(part["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(part["event_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        et = part["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        if uid.size == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "kept": pa.array([], type=pa.bool_())})
        codes = np.asarray(et.dictionary_encode().indices,
                           dtype=np.int64)
        order = np.lexsort((eid, ts, codes, uid))
        u, c, t = uid[order], codes[order], ts[order]
        n = u.size
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (u[1:] != u[:-1]) | (c[1:] != c[:-1])
        seg_starts = np.flatnonzero(change)
        seg_len = np.diff(np.append(seg_starts, n))
        # longest segments first: round r's active keys are a prefix
        by_len = np.argsort(-seg_len, kind="stable")
        seg_starts = seg_starts[by_len]
        seg_len = seg_len[by_len]
        anchors = t[seg_starts].copy()
        kept = np.zeros(n, dtype=bool)
        kept[seg_starts] = True
        max_len = int(seg_len[0])
        for r in range(1, max_len):
            a_cnt = int(np.searchsorted(-seg_len, -(r + 1), side="right"))
            idx = seg_starts[:a_cnt] + r
            k = (t[idx] - anchors[:a_cnt]) > gap_us
            kept[idx[k]] = True
            anchors[:a_cnt][k] = t[idx[k]]
        return pa.table({"event_id": pa.array(eid[order]),
                         "kept": pa.array(kept)})

    return grouped_aggregate(ds, ["user_id", "event_type"], per_part)


def sql_throttle_chained(gap_us: int = THROTTLE_GAP_US) -> str:
    # prefix-dependent keep -> recursive CTE stepping row_number chains;
    # e MATERIALIZED so each recursion level scans a pinned row set
    return f"""
WITH RECURSIVE e AS MATERIALIZED (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS t,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events),
chain AS (
  SELECT user_id, event_type, event_id, t, rn, t AS anchor, TRUE AS kept
  FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.event_type, e.event_id, e.t, e.rn,
         CASE WHEN e.t - c.anchor > {gap_us} THEN e.t ELSE c.anchor END,
         e.t - c.anchor > {gap_us}
  FROM e JOIN chain c
    ON e.user_id = c.user_id AND e.event_type = c.event_type
   AND e.rn = c.rn + 1)
SELECT event_id, kept FROM chain
"""


def value_quartile(ds: "ray.data.Dataset",
                   num_buckets: int = 32,
                   fetch_threshold: int = 4096) -> "ray.data.Dataset":
    """QUANTILE BINNING feature transform: each event labeled with its
    per-type quartile (0-3) against the EXACT p25/p50/p75 order
    statistics (k = ceil(q·n)-th smallest, the iterative-distributed-
    selection machinery run three times). Columns: event_id, quartile.

    The three selection passes ship only (type, bucket, count) digests;
    the ≤ |types|×3 cut points broadcast into one vectorized labeling
    pass (pc.index_in type lookup + two searchsorted-free compares).
    """
    cuts = {}
    for q_num, q_den in ((1, 4), (1, 2), (3, 4)):
        res = value_quantile_exact(ds, q_num, q_den, "p_c", num_buckets,
                                   fetch_threshold).take_all()
        for r in res:
            cuts.setdefault(r["event_type"], []).append(int(r["p_c"]))
    types = sorted(cuts)
    type_arr = pa.array(types, type=pa.string())
    cut_mat = np.array([cuts[t] for t in types],
                       dtype=np.int64)   # (types, 3) p25/p50/p75

    def label(batch: pa.Table) -> pa.Table:
        et = pc.cast(batch["event_type"], pa.string())
        idx = pc.index_in(et, type_arr).to_numpy(zero_copy_only=False)
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        c = cut_mat[idx]
        quart = ((vc > c[:, 0]).astype(np.int64)
                 + (vc > c[:, 1]) + (vc > c[:, 2]))
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "quartile": pa.array(quart),
        })

    return ds.map_batches(label, batch_format="pyarrow")


def sql_value_quartile() -> str:
    p25 = sql_value_quantile_exact(1, 4, "p25_c")
    p50 = sql_value_quantile_exact(1, 2, "p50_c")
    p75 = sql_value_quantile_exact(3, 4, "p75_c")
    return f"""
WITH c AS (
  SELECT a.event_type, a.p25_c, b.p50_c, d.p75_c
  FROM ({p25}) a JOIN ({p50}) b USING (event_type)
  JOIN ({p75}) d USING (event_type))
SELECT e.event_id,
       (CAST(CAST(round(e.value * 100) AS BIGINT) > c.p25_c AS BIGINT)
        + CAST(CAST(round(e.value * 100) AS BIGINT) > c.p50_c AS BIGINT)
        + CAST(CAST(round(e.value * 100) AS BIGINT) > c.p75_c AS BIGINT))
         ::BIGINT AS quartile
FROM events e JOIN c USING (event_type)
"""


def value_mad_outliers(ds: "ray.data.Dataset", k_mult: int = 3,
                       num_buckets: int = 32,
                       fetch_threshold: int = 4096
                       ) -> "ray.data.Dataset":
    """ROBUST outlier flags via the Median-Absolute-Deviation rule
    (Hampel): per event_type, flag events with |vc − median| >
    k·MAD where MAD = median(|vc − median|) — the robust sibling of
    the IQR/z-score detectors, immune to the outliers it hunts.
    Columns: event_id, is_outlier (bool). All-integer (cents), so the
    comparison is exact on both engines.

    TWO chained iterative-distributed-selection passes — the second
    selects over a derived column (|vc − med|) no storage column holds:
    (1) per-type medians (digest-only driver traffic), broadcast as ≤
    |types| scalars; (2) the same machinery over the absolute
    deviations, computed on the fly inside the scan's projection; then
    one vectorized flagging pass. Nothing user- or event-sized ever
    reaches the driver.
    """
    med = {r["event_type"]: int(r["median_c"])
           for r in value_quantile_exact(ds, 1, 2, "median_c",
                                         num_buckets,
                                         fetch_threshold).take_all()}
    types = sorted(med)
    type_arr = pa.array(types, type=pa.string())
    med_arr = np.array([med[t] for t in types], dtype=np.int64)

    def project_ad(batch: pa.Table) -> pa.Table:
        et = pc.cast(batch["event_type"], pa.string())
        idx = pc.index_in(et, type_arr).to_numpy(zero_copy_only=False)
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        return pa.table({"event_type": et,
                         "vc": pa.array(np.abs(vc - med_arr[idx]))})

    proj = ds.select_columns(["event_type", "value"]) \
             .map_batches(project_ad, batch_format="pyarrow")
    stats = _type_value_stats(proj)
    active = {(t, "mad"): (int(lo) - 1, int(hi), (int(n) + 1) // 2)
              for t, (n, lo, hi) in stats.items()}
    counts = {(t, "mad"): int(n) for t, (n, _, _) in stats.items()}
    mad_res = _iterative_select(proj, active, counts, num_buckets,
                                fetch_threshold)
    mad_arr = np.array([mad_res[(t, "mad")] for t in types],
                       dtype=np.int64)

    def flag(batch: pa.Table) -> pa.Table:
        et = pc.cast(batch["event_type"], pa.string())
        idx = pc.index_in(et, type_arr).to_numpy(zero_copy_only=False)
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        out = np.abs(vc - med_arr[idx]) > k_mult * mad_arr[idx]
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "is_outlier": pa.array(out),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def sql_value_mad_outliers(k_mult: int = 3) -> str:
    return f"""
WITH e AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events),
m AS (SELECT event_type, quantile_disc(vc, 0.5) AS med
      FROM e GROUP BY 1),
d AS (SELECT e.event_id, e.event_type, abs(e.vc - m.med) AS ad
      FROM e JOIN m USING (event_type)),
mad AS (SELECT event_type, quantile_disc(ad, 0.5) AS mad
        FROM d GROUP BY 1)
SELECT d.event_id, (d.ad > {k_mult} * mad.mad) AS is_outlier
FROM d JOIN mad USING (event_type)
"""


DAY_US = 86_400_000_000


def daily_leaderboard(ds: "ray.data.Dataset", k: int = 5
                      ) -> "ray.data.Dataset":
    """Per-day top-k users by total value (the windowed grouped-top-k
    dashboard shape). Columns: day_us, user_id, total_c, rank (1..k;
    ties broken user_id-ascending — deterministic, shared with SQL).

    Two digest shuffles: (1) hash(day, user) pre-aggregate — exact
    per-(day,user) cent sums, the only pass that reads the log; (2) a
    day-keyed coarse shuffle whose per-partition top-k is ONE lexsort +
    run-boundary rank over ALL days in the partition (no per-day
    Python, no global sort). Output ≤ days × k rows.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def part(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        tbl = pa.table({
            "day": pa.array((t // DAY_US) * DAY_US),
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "vc": pa.array(vc),
        })
        g = (tbl.group_by(["day", "user_id"], use_threads=False)
             .aggregate([("vc", "sum")]))
        return pa.table({"day": g["day"], "user_id": g["user_id"],
                         "vc": pc.cast(g["vc_sum"], pa.int64())})

    def sum_pairs(p: pa.Table) -> pa.Table:
        g = (p.group_by(["day", "user_id"], use_threads=False)
             .aggregate([("vc", "sum")]))
        return pa.table({"day": g["day"], "user_id": g["user_id"],
                         "vc": pc.cast(g["vc_sum"], pa.int64())})

    sums = grouped_aggregate(
        ds.select_columns(["user_id", "ts", "value"])
          .map_batches(part, batch_format="pyarrow"),
        ["day", "user_id"], sum_pairs)

    def topk(p: pa.Table) -> pa.Table:
        day = pc.cast(p["day"], pa.int64()).to_numpy(zero_copy_only=False)
        uid = pc.cast(p["user_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        vc = pc.cast(p["vc"], pa.int64()).to_numpy(zero_copy_only=False)
        if day.size == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"day_us": z, "user_id": z, "total_c": z,
                             "rank": z})
        order = np.lexsort((uid, -vc, day))
        d = day[order]
        start = np.empty(d.size, dtype=bool)
        start[0] = True
        start[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(start)
        rank = np.arange(d.size) - np.repeat(
            starts, np.diff(np.append(starts, d.size))) + 1
        keep = rank <= k
        sel = order[keep]
        return pa.table({"day_us": pa.array(day[sel]),
                         "user_id": pa.array(uid[sel]),
                         "total_c": pa.array(vc[sel]),
                         "rank": pa.array(rank[keep])})

    return grouped_aggregate(sums, ["day"], topk)


def sql_daily_leaderboard(k: int = 5) -> str:
    return f"""
WITH du AS (
  SELECT (epoch_us(ts) // {DAY_US}) * {DAY_US} AS day_us, user_id,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS total_c
  FROM events GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY day_us
                                   ORDER BY total_c DESC, user_id)
               AS rank FROM du)
SELECT day_us::BIGINT AS day_us, user_id, total_c, rank::BIGINT AS rank
FROM r WHERE rank <= {k}
"""


SLIDE_WIDTH_US = 86_400_000_000      # 1-day window
SLIDE_STEP_US = 21_600_000_000       # 6-hour step (width % step == 0)


def sliding_distinct_users(ds: "ray.data.Dataset",
                           width_us: int = SLIDE_WIDTH_US,
                           step_us: int = SLIDE_STEP_US
                           ) -> "ray.data.Dataset":
    """SLIDING-window distinct users (rolling DAU): for every step-grid
    window [w·step, w·step + width) the count of distinct user_ids with
    an event inside. Columns: window_start_us, n_users (int64).

    An event at t belongs to exactly the ``width/step`` windows
    ``w = t//step − k, k ∈ [0, width/step)`` (integer identity — no
    boundary predicate needed), so the plan is: per-batch explode ×
    (width/step) into (window, user) pairs DEDUPED inside the batch,
    ONE hash(window, user) shuffle whose reduce dedups exactly and
    emits per-window counts — the same pair-dedup digest shape as
    ``value_quantiles``' n_users. Nothing user-sized ever reaches the
    driver; output rows = number of windows.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate
    assert width_us % step_us == 0
    fan = width_us // step_us

    def explode(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        u = pc.cast(batch["user_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        base = t // step_us
        win = (base[:, None] - np.arange(fan, dtype=np.int64)[None, :]) \
            .ravel()
        uu = np.repeat(u, fan)
        tbl = pa.table({"win": pa.array(win), "user_id": pa.array(uu)})
        return (tbl.group_by(["win", "user_id"], use_threads=False)
                .aggregate([]))

    def dedup_count(part: pa.Table) -> pa.Table:
        # a (win, user) pair lands in exactly ONE partition — the dedup
        # is exact here; the per-win count is PARTIAL (a win's users
        # spread across partitions under the pair-keyed hash)
        d = (part.group_by(["win", "user_id"], use_threads=False)
             .aggregate([]))
        g = (d.group_by(["win"], use_threads=False)
             .aggregate([("user_id", "count")]))
        return pa.table({"win": pc.cast(g["win"], pa.int64()),
                         "pu": pc.cast(g["user_id_count"], pa.int64())})

    def win_sum(part: pa.Table) -> pa.Table:
        g = (part.group_by(["win"], use_threads=False)
             .aggregate([("pu", "sum")]))
        return pa.table({
            "window_start_us": pc.multiply(
                pc.cast(g["win"], pa.int64()),
                pa.scalar(step_us, type=pa.int64())),
            "n_users": pc.cast(g["pu_sum"], pa.int64()),
        })

    partials = grouped_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["win", "user_id"], dedup_count)
    # second, digest-sized shuffle: ≤ partitions × windows partial rows
    return grouped_aggregate(partials, ["win"], win_sum)


def sql_sliding_distinct_users(width_us: int = SLIDE_WIDTH_US,
                               step_us: int = SLIDE_STEP_US) -> str:
    fan = width_us // step_us
    return f"""
WITH x AS (
  SELECT (epoch_us(ts) // {step_us}) - k.k AS win, user_id
  FROM events, (SELECT unnest(range(0, {fan})) AS k) k)
SELECT (win * {step_us})::BIGINT AS window_start_us,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM x GROUP BY win
"""


def user_rfm(ds: "ray.data.Dataset", num_buckets: int = 32,
             fetch_threshold: int = 4096) -> "ray.data.Dataset":
    """RFM SEGMENTATION — the classic user-feature composite: per user
    recency (max event ts, µs), frequency (event count) and monetary
    (sum cents), each quartile-binned against the EXACT global p25/p50/
    p75 order statistics. Columns: user_id, r_bin, f_bin, m_bin
    (int64, 0-3; bin = Σ(value > cut), the value_quartile convention).

    Scale shape: (1) ONE user-keyed shuffle reduces the log to a
    distinct-user-bounded (user, r, f, m) digest, pinned once —
    consumed by the selection scans and the labeling pass; (2) all NINE
    cut points (3 dims × 3 quantiles) refine together in a single
    :func:`_iterative_select` run over a (dim, value) projection of the
    digest — the driver only ever accumulates (dim, quantile, bucket,
    count) rows, never a user-sized structure; (3) one vectorized
    labeling pass against the 9 broadcast scalars.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def part(batch: pa.Table) -> pa.Table:
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        t = pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "vc": pa.array(vc),
            "n": pa.array(np.ones(len(batch), dtype=np.int64)),
        })
        g = (t.group_by(["user_id"], use_threads=False)
             .aggregate([("ts_us", "max"), ("vc", "sum"), ("n", "sum")]))
        return pa.table({"user_id": g["user_id"],
                         "r": pc.cast(g["ts_us_max"], pa.int64()),
                         "f": pc.cast(g["n_sum"], pa.int64()),
                         "m": pc.cast(g["vc_sum"], pa.int64())})

    def combine(p: pa.Table) -> pa.Table:
        g = (p.group_by(["user_id"], use_threads=False)
             .aggregate([("r", "max"), ("f", "sum"), ("m", "sum")]))
        return pa.table({"user_id": g["user_id"],
                         "r": pc.cast(g["r_max"], pa.int64()),
                         "f": pc.cast(g["f_sum"], pa.int64()),
                         "m": pc.cast(g["m_sum"], pa.int64())})

    rfm = grouped_aggregate(
        ds.select_columns(["user_id", "ts", "value"])
          .map_batches(part, batch_format="pyarrow"),
        ["user_id"], combine).materialize()

    def project_dims(batch: pa.Table) -> pa.Table:
        dims, vals = [], []
        for d in ("r", "f", "m"):
            v = pc.cast(batch[d], pa.int64()) \
                .to_numpy(zero_copy_only=False)
            dims.extend([d] * len(v))
            vals.append(v)
        return pa.table({"event_type": pa.array(dims, type=pa.string()),
                         "vc": pa.array(np.concatenate(vals))})

    proj = rfm.map_batches(project_dims, batch_format="pyarrow")
    stats = _type_value_stats(proj)
    tags = {(1, 4): "p25", (1, 2): "p50", (3, 4): "p75"}
    active, counts = {}, {}
    for (qn, qd), tag in tags.items():
        for d, (n, lo, hi) in stats.items():
            active[(d, tag)] = (int(lo) - 1, int(hi),
                                (qn * int(n) + qd - 1) // qd)
            counts[(d, tag)] = int(n)
    cuts = _iterative_select(proj, active, counts, num_buckets,
                             fetch_threshold)
    cut_mat = {d: np.array([cuts[(d, "p25")], cuts[(d, "p50")],
                            cuts[(d, "p75")]], dtype=np.int64)
               for d in ("r", "f", "m")}

    def label(batch: pa.Table) -> pa.Table:
        out = {"user_id": pc.cast(batch["user_id"], pa.int64())}
        for d in ("r", "f", "m"):
            v = pc.cast(batch[d], pa.int64()) \
                .to_numpy(zero_copy_only=False)
            c = cut_mat[d]
            out[f"{d}_bin"] = pa.array(
                (v > c[0]).astype(np.int64) + (v > c[1]) + (v > c[2]))
        return pa.table(out)

    return rfm.map_batches(label, batch_format="pyarrow")


def sql_user_rfm() -> str:
    # quantile_disc == the engine's k = ceil(q·n)-th smallest
    # (sorted value at max(0, ceil(q·n)−1)) — the certified convention
    dims = {"r": "r", "f": "f", "m": "m"}
    cut_cols = ", ".join(
        f"quantile_disc({c}, {q}) AS {d}{int(q * 100)}"
        for d, c in dims.items() for q in (0.25, 0.5, 0.75))
    bin_cols = ", ".join(
        f"((u.{c} > c.{d}25)::BIGINT + (u.{c} > c.{d}50)::BIGINT "
        f"+ (u.{c} > c.{d}75)::BIGINT)::BIGINT AS {d}_bin"
        for d, c in dims.items())
    return f"""
WITH u AS MATERIALIZED (
  SELECT user_id, epoch_us(max(ts))::BIGINT AS r,
         count(*)::BIGINT AS f,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS m
  FROM events GROUP BY user_id),
c AS (SELECT {cut_cols} FROM u)
SELECT u.user_id, {bin_cols}
FROM u CROSS JOIN c
"""


HOUR_US = 3_600_000_000


def hourly_seasonality(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """CALENDAR FEATURE EXTRACTION: event counts per (hour-of-day,
    event_type) — the seasonality profile (UTC; hour = epoch-µs //
    3600s mod 24, identical to SQL ``extract(hour ...)`` for UTC
    timestamps). Columns: hour, event_type, n_events. Pure combiner:
    ≤ 24×|types| digest rows per batch.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = (ts // HOUR_US) % 24
        t = pa.table({
            "hour": pa.array(hour),
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "n": pa.array(np.ones(len(batch), dtype=np.int64)),
        })
        return (t.group_by(["hour", "event_type"], use_threads=False)
                 .aggregate([("n", "sum")])
                 .rename_columns(["hour", "event_type", "n"]))

    def final(part: pa.Table) -> pa.Table:
        g = (part.group_by(["hour", "event_type"], use_threads=False)
             .aggregate([("n", "sum")]))
        return pa.table({
            "hour": pc.cast(g["hour"], pa.int64()),
            "event_type": pc.cast(g["event_type"], pa.string()),
            "n_events": pc.cast(g["n_sum"], pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(partials, ["hour", "event_type"], final)


def sql_hourly_seasonality() -> str:
    return ("SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour, "
            "event_type, count(*)::BIGINT AS n_events "
            "FROM events GROUP BY 1, 2")


def conversion_time(ds: "ray.data.Dataset",
                    from_type: str = "signup",
                    to_type: str = "purchase") -> "ray.data.Dataset":
    """TIME-TO-CONVERT: for each user, the delay from their FIRST
    ``from_type`` event to their first ``to_type`` event at-or-after it
    (the product-analytics "signup → purchase latency"). Columns:
    user_id, delta_us — one row per CONVERTED user.

    One coarse hash(user) shuffle; inside a partition every user's
    anchor (min from-ts) and converted target (min to-ts ≥ anchor)
    compute with two ``np.minimum.at`` passes — no sort, no per-user
    loop. A user's events co-locate, so the anchor is always visible
    to the target pass.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def per_part(part: pa.Table) -> pa.Table:
        uid = pc.cast(part["user_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = pc.cast(part["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        et = part["event_type"].to_numpy(zero_copy_only=False)
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "delta_us": pa.array([], type=pa.int64())})
        if uid.size == 0:
            return empty
        users = np.unique(uid)
        pos = np.searchsorted(users, uid)
        big = np.iinfo(np.int64).max
        anchor = np.full(users.size, big, dtype=np.int64)
        fmask = et == from_type
        np.minimum.at(anchor, pos[fmask], ts[fmask])
        target = np.full(users.size, big, dtype=np.int64)
        tmask = (et == to_type) & (anchor[pos] != big) \
            & (ts >= anchor[pos])
        np.minimum.at(target, pos[tmask], ts[tmask])
        conv = target != big
        if not conv.any():
            return empty
        return pa.table({
            "user_id": pa.array(users[conv]),
            "delta_us": pa.array(target[conv] - anchor[conv]),
        })

    return grouped_aggregate(ds, ["user_id"], per_part)


def sql_conversion_time(from_type: str = "signup",
                        to_type: str = "purchase") -> str:
    return f"""
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS a FROM events
  WHERE event_type = '{from_type}' GROUP BY user_id),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = '{to_type}' AND epoch_us(e.ts) >= s.a
  GROUP BY e.user_id)
SELECT s.user_id, (p.t - s.a)::BIGINT AS delta_us
FROM s JOIN p USING (user_id)
"""


TREND_T0_MIN = 28_401_120  # epoch MINUTES of 2024-01-01T00:00:00Z
TREND_SCALE = 1_000_000


def trend_slope(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """DISTRIBUTED LEAST SQUARES: per-type OLS slope of value-cents over
    time — drift detection as a pure moment aggregate. Columns:
    event_type, n_events, slope_u (int64 =
    trunc((n·Σty − Σt·Σy) · 10⁶ / (n·Σt² − (Σt)²)), t in MINUTES since
    a FIXED epoch — minute resolution keeps the per-batch int64 moment
    sums safe even for a decade-spanning log at 4k-row batches).

    Each batch emits per-type integer moment partials (n, Σt, Σy, Σty,
    Σt²) — order-insensitive int64 sums (per-batch magnitudes bounded);
    ONE tiny reduce combines in PYTHON ints (the cross terms exceed
    int64; the SQL twin uses HUGEINT) and finishes with the same
    truncate-toward-zero division DuckDB's ``//`` performs.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        t = ts // 60_000_000 - TREND_T0_MIN
        y = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        tb = pa.table({
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            "st": pa.array(t),
            "sy": pa.array(y),
            "sty": pa.array(t * y),
            "stt": pa.array(t * t),
        })
        return (tb.group_by(["event_type"], use_threads=False)
                .aggregate([("n", "sum"), ("st", "sum"), ("sy", "sum"),
                            ("sty", "sum"), ("stt", "sum")])
                .rename_columns(["event_type", "n", "st", "sy", "sty",
                                 "stt"]))

    def final(part: pa.Table) -> pa.Table:
        g = (part.group_by(["event_type"], use_threads=False)
             .aggregate([("n", "sum"), ("st", "sum"), ("sy", "sum"),
                         ("sty", "sum"), ("stt", "sum")]))
        types, ns, slopes = [], [], []
        for i in range(len(g)):
            n = int(g["n_sum"][i].as_py())
            st = int(g["st_sum"][i].as_py())
            sy = int(g["sy_sum"][i].as_py())
            sty = int(g["sty_sum"][i].as_py())
            stt = int(g["stt_sum"][i].as_py())
            num = (n * sty - st * sy) * TREND_SCALE
            den = n * stt - st * st
            if den == 0:
                continue   # constant-t group: slope undefined
            q = abs(num) // den          # den > 0 (variance)
            slope = q if num >= 0 else -q   # trunc toward zero (SQL //)
            types.append(g["event_type"][i].as_py())
            ns.append(n)
            slopes.append(slope)
        return pa.table({
            "event_type": pa.array(types, type=pa.string()),
            "n_events": pa.array(ns, type=pa.int64()),
            "slope_u": pa.array(slopes, type=pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(partials, ["event_type"], final)


def sql_trend_slope() -> str:
    return f"""
WITH b AS (
  SELECT event_type,
         (epoch_us(ts) // 60000000 - {TREND_T0_MIN}) AS t,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events),
m AS (
  SELECT event_type, count(*)::HUGEINT AS n,
         sum(t)::HUGEINT AS st, sum(y)::HUGEINT AS sy,
         sum(t * y)::HUGEINT AS sty, sum(t * t)::HUGEINT AS stt
  FROM b GROUP BY event_type)
SELECT event_type, n::BIGINT AS n_events,
       CAST(((n * sty - st * sy) * {TREND_SCALE})
            // (n * stt - st * st) AS BIGINT) AS slope_u
FROM m WHERE n * stt - st * st != 0
"""


def value_time_corr(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """PEARSON CORRELATION per type between time and value — the
    normalized twin of :func:`trend_slope`, same exact integer moment
    sums plus Σy². Columns: event_type, n_events, corr_r
    (round(num / (√d₁·√d₂), 6); num and the two variance terms are
    EXACT python ints on the engine side / HUGEINT in SQL, converted to
    double by the identical round-to-nearest cast in both engines, so
    the final rounded double matches bit-for-bit).
    """
    from searchengine_ray.pipelines.common import grouped_aggregate
    import math

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        t = ts // 60_000_000 - TREND_T0_MIN
        y = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        tb = pa.table({
            "event_type": pc.cast(batch["event_type"], pa.string()),
            "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            "st": pa.array(t),
            "sy": pa.array(y),
            "sty": pa.array(t * y),
            "stt": pa.array(t * t),
            "syy": pa.array(y * y),
        })
        return (tb.group_by(["event_type"], use_threads=False)
                .aggregate([("n", "sum"), ("st", "sum"), ("sy", "sum"),
                            ("sty", "sum"), ("stt", "sum"),
                            ("syy", "sum")])
                .rename_columns(["event_type", "n", "st", "sy", "sty",
                                 "stt", "syy"]))

    def final(part: pa.Table) -> pa.Table:
        g = (part.group_by(["event_type"], use_threads=False)
             .aggregate([("n", "sum"), ("st", "sum"), ("sy", "sum"),
                         ("sty", "sum"), ("stt", "sum"), ("syy", "sum")]))
        types, ns, corrs = [], [], []
        for i in range(len(g)):
            n = int(g["n_sum"][i].as_py())
            st = int(g["st_sum"][i].as_py())
            sy = int(g["sy_sum"][i].as_py())
            sty = int(g["sty_sum"][i].as_py())
            stt = int(g["stt_sum"][i].as_py())
            syy = int(g["syy_sum"][i].as_py())
            num = n * sty - st * sy
            d1 = n * stt - st * st
            d2 = n * syy - sy * sy
            if d1 == 0 or d2 == 0:
                continue
            corr = round(float(num)
                         / (math.sqrt(float(d1)) * math.sqrt(float(d2))),
                         6)
            types.append(g["event_type"][i].as_py())
            ns.append(n)
            corrs.append(corr)
        return pa.table({
            "event_type": pa.array(types, type=pa.string()),
            "n_events": pa.array(ns, type=pa.int64()),
            "corr_r": pa.array(corrs, type=pa.float64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(partials, ["event_type"], final)


def sql_value_time_corr() -> str:
    return f"""
WITH b AS (
  SELECT event_type,
         (epoch_us(ts) // 60000000 - {TREND_T0_MIN}) AS t,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events),
m AS (
  SELECT event_type, count(*)::HUGEINT AS n,
         sum(t)::HUGEINT AS st, sum(y)::HUGEINT AS sy,
         sum(t * y)::HUGEINT AS sty, sum(t * t)::HUGEINT AS stt,
         sum(y * y)::HUGEINT AS syy
  FROM b GROUP BY event_type)
SELECT event_type, n::BIGINT AS n_events,
       round((n * sty - st * sy)::DOUBLE
             / (sqrt((n * stt - st * st)::DOUBLE)
                * sqrt((n * syy - sy * sy)::DOUBLE)), 6) AS corr_r
FROM m WHERE n * stt - st * st != 0 AND n * syy - sy * sy != 0
"""
