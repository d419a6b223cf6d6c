"""Shared distributed-aggregation primitive for the pipeline family.

``grouped_aggregate`` is the engine's general wide-aggregation operator:
hash-partition rows by their key columns into a bounded number of coarse
partitions, then run an ARROW-NATIVE (C++) aggregation over each partition.
This replaces `Dataset.groupby(keys).aggregate(...)`, whose reduce step is
Python-level per group and was measured 7-10× slower on million-row pair
tables (see BASELINE.md); the coarse-partition form also keeps group count
per Ray task bounded regardless of key cardinality — the property that
matters at 10^12 rows.

Contract: the caller's ``agg_fn`` receives ALL rows of one partition
(every row of a given key lands in exactly one partition) and must perform
the per-key aggregation itself (typically ``Table.group_by(...).aggregate``)
plus any finalization. Skewed single keys are bounded by the caller's
pre-aggregation (partial aggregates per map batch) — the same
partial→final discipline as the postings shuffle.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DEFAULT_AGG_PARTITIONS = 64

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _hash_key_columns(batch: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Vectorized combined hash of the key columns (uint64). Strings hash
    per-distinct via dictionary encoding; integers via multiply-mix."""
    from searchengine_ray.functions.hashing import hash64_array
    acc = np.zeros(len(batch), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            col = batch[c]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                h = hash64_array(col)
            else:
                v = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
                h = v.astype(np.uint64) * _MIX2 + _MIX1
            acc = acc * _MIX1 + h
    return acc


def grouped_aggregate(ds: "ray.data.Dataset", key_cols: list[str],
                      agg_fn: Callable[[pa.Table], pa.Table],
                      num_partitions: int = DEFAULT_AGG_PARTITIONS
                      ) -> "ray.data.Dataset":
    """Hash-partitioned Arrow-native wide aggregation (see module doc)."""
    def add_part(batch: pa.Table) -> pa.Table:
        h = _hash_key_columns(batch, key_cols)
        return batch.append_column(
            "__part", pa.array((h % np.uint64(num_partitions)).astype(np.int32)))

    def per_part(group: pa.Table) -> pa.Table:
        return agg_fn(group.drop_columns(["__part"]))

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("__part")
              .map_groups(per_part, batch_format="pyarrow"))
