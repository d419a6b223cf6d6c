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
              num_parts: int = NUM_JOIN_PARTITIONS,
              how: str = "inner") -> "ray.data.Dataset":
    """Distributed equi-join on int64 keys; ``how`` ∈ inner / left /
    semi / anti.

    inner — key + left_cols + right_cols; many-to-many keys expand to
        the full cross product of their rows, ordered deterministically
        (left row order × right row order within key).
    left  — inner plus unmatched left rows with typed-null right cols.
    semi  — left rows (key + left_cols) having ≥1 right match, each
        emitted ONCE (no expansion — the "has an embedding?" filter).
    anti  — left rows with NO right match (the "missing dimension
        row" audit). semi/anti never materialize the cross product.

    All four modes share the single tag→union→hash-shuffle→vectorized
    sort-merge plan; the mode only changes the per-partition emit.
    """
    assert how in ("inner", "left", "semi", "anti"), how
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

    with_right = how in ("inner", "left")

    def left_only_rows(group: pa.Table, lidx: np.ndarray,
                       null_right: bool) -> pa.Table:
        lt = pa.array(lidx)
        cols = {"key": pc.take(group["key"], lt)}
        for c in left_cols:
            cols[c] = pc.take(group[f"l_{c}"], lt)
        if null_right:
            for c in right_cols:
                cols[c] = pa.nulls(len(lidx), type=r_type(c))
        return pa.table(cols)

    def merge(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        key = group["key"].to_numpy(zero_copy_only=False)
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        empty = pa.table(
            {"key": pa.array([], type=pa.int64()),
             **{c: pa.array([], type=l_type(c)) for c in left_cols},
             **({c: pa.array([], type=r_type(c)) for c in right_cols}
                if with_right else {})})
        if li.size == 0:
            return empty
        if ri.size == 0:
            if how == "inner" or how == "semi":
                return empty
            # left: every left row with null right cols; anti: every row
            return left_only_rows(group, li, null_right=(how == "left"))
        # deterministic: stable sort both sides by key, keep row order
        lo = li[np.argsort(key[li], kind="stable")]
        ro = ri[np.argsort(key[ri], kind="stable")]
        lk, rk = key[lo], key[ro]
        starts = np.searchsorted(rk, lk, side="left")
        ends = np.searchsorted(rk, lk, side="right")
        counts = ends - starts
        hit = counts > 0
        if how == "semi":
            return left_only_rows(group, lo[hit], null_right=False)
        if how == "anti":
            return left_only_rows(group, lo[~hit], null_right=False)
        miss_lo = lo[~hit]
        if not hit.any():
            return (left_only_rows(group, miss_lo, null_right=True)
                    if how == "left" else empty)
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
        matched = pa.table(cols)
        if how == "left" and miss_lo.size:
            return pa.concat_tables(
                [matched, left_only_rows(group, miss_lo, null_right=True)])
        return matched

    unioned = (left.map_batches(tag_left, batch_format="pyarrow")
               .union(right.map_batches(tag_right,
                                        batch_format="pyarrow")))
    return unioned.groupby("part").map_groups(merge,
                                              batch_format="pyarrow")
