"""Distributed equi-join — the general-purpose relational join the
Dataset API lacks (SURVEY.md §2.6: the reference joins only via in-heap
dict lookups, indexer.py:330-341).

Ray-Data-first plan: tag each side, union, ONE coarse shuffle keyed by
hash(key) (both sides of a key land in the same partition), then a fully
vectorized per-partition sort-merge: right rows sort by key, each left
key finds its right-run via searchsorted, and many-to-many expansion is
a ``np.repeat`` over run lengths — no per-row or per-key Python. The
broadcast small-side variant (no shuffle at all) lives in
``events.value_range_join``; this operator is the both-sides-big path.

Skew: a hot key's rows land in one partition — bound upstream (salt the
key or pre-aggregate) exactly as for any hash shuffle; the coarse
partition count spreads distinct keys evenly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

NUM_JOIN_PARTITIONS = 64
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _key_part(key: np.ndarray, num_parts: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((key.astype(np.uint64) * _MIX)
                % np.uint64(num_parts)).astype(np.int32)


def equi_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              left_key: str, right_key: str,
              left_cols: list[str], right_cols: list[str],
              num_parts: int = NUM_JOIN_PARTITIONS) -> "ray.data.Dataset":
    """INNER equi-join on int64 keys.

    Output columns: ``key`` (int64) + ``left_cols`` + ``right_cols``
    (caller guarantees the names don't collide). Many-to-many keys
    expand to the full cross product of their rows, ordered
    deterministically (left row order × right row order within key).
    """
    overlap = set(left_cols) & set(right_cols)
    assert not overlap, f"column name collision: {sorted(overlap)}"

    # Build each side with the FULL output schema (other side's payload
    # columns as typed nulls) so the union has one schema.
    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema

    def l_type(c):
        return l_schema.field(c).type

    def r_type(c):
        return r_schema.field(c).type

    def tag_left(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch[left_key], pa.int64()).to_numpy(
            zero_copy_only=False)
        out = {"part": pa.array(_key_part(k, num_parts)),
               "key": pa.array(k),
               "side": pa.array(np.zeros(len(batch), dtype=np.int64))}
        for c in left_cols:
            out[f"l_{c}"] = batch[c]
        for c in right_cols:
            out[f"r_{c}"] = pa.nulls(len(batch), type=r_type(c))
        return pa.table(out)

    def tag_right(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch[right_key], pa.int64()).to_numpy(
            zero_copy_only=False)
        out = {"part": pa.array(_key_part(k, num_parts)),
               "key": pa.array(k),
               "side": pa.array(np.ones(len(batch), dtype=np.int64))}
        for c in left_cols:
            out[f"l_{c}"] = pa.nulls(len(batch), type=l_type(c))
        for c in right_cols:
            out[f"r_{c}"] = batch[c]
        return pa.table(out)

    def merge(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        key = group["key"].to_numpy(zero_copy_only=False)
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        empty = pa.table(
            {"key": pa.array([], type=pa.int64()),
             **{c: pa.array([], type=l_type(c)) for c in left_cols},
             **{c: pa.array([], type=r_type(c)) for c in right_cols}})
        if li.size == 0 or ri.size == 0:
            return empty
        # deterministic: stable sort both sides by key, keep row order
        lo = li[np.argsort(key[li], kind="stable")]
        ro = ri[np.argsort(key[ri], kind="stable")]
        lk, rk = key[lo], key[ro]
        starts = np.searchsorted(rk, lk, side="left")
        ends = np.searchsorted(rk, lk, side="right")
        counts = ends - starts
        hit = counts > 0
        if not hit.any():
            return empty
        lo, starts, counts = lo[hit], starts[hit], counts[hit]
        # many-to-many expansion: left row i repeats counts[i] times,
        # right indices are each run's consecutive positions
        lidx = np.repeat(lo, counts)
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ridx = ro[np.arange(int(counts.sum())) -
                  np.repeat(offs, counts) + np.repeat(starts, counts)]
        lt = pa.array(lidx)
        rt = pa.array(ridx)
        cols = {"key": pc.take(group["key"], lt)}
        for c in left_cols:
            cols[c] = pc.take(group[f"l_{c}"], lt)
        for c in right_cols:
            cols[c] = pc.take(group[f"r_{c}"], rt)
        return pa.table(cols)

    unioned = (left.map_batches(tag_left, batch_format="pyarrow")
               .union(right.map_batches(tag_right,
                                        batch_format="pyarrow")))
    return unioned.groupby("part").map_groups(merge,
                                              batch_format="pyarrow")
