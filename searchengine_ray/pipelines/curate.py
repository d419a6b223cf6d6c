"""Corpus curation — the composed training-data cleaning pipeline.

What a 100 TB training-data run actually executes before tokenization:
exact-dedup (keep one copy per distinct content) ∧ quality gate. Composed
from the existing operators' kernels into ONE wide shuffle:

    map_batches: sha256(text) (the only per-row Python cost — no Arrow
                 kernel for cryptographic digests), coarse hash partition
    groupby(part): per partition, keepers = min doc_id per sha (vectorized
                 sort + run boundaries), quality mask on keepers only
                 (analysis.quality_keep_mask), emit curated rows

Full rows ride the shuffle exactly once — the honest at-scale layout
(deciding keepers on a digest-only shuffle would still need a second
full-row join to materialize the curated corpus). Output is written with
``ds.write_parquet`` by the caller (resumable partitioned output).

Reference tie-in: generalizes the crawler's visited-URL dedup
(/root/reference/search_engine/crawler/crawler.py:245-247, SURVEY.md §2.8
D1) to content level, gated by the quality heuristics.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from searchengine_ray.pipelines.analysis import quality_keep_mask

NUM_CURATE_PARTITIONS = 64


def curate(ds: "ray.data.Dataset", *, min_ws_tokens: int = 10,
           max_stop_ratio_u: int = 500_000,
           min_distinct_ratio_u: int = 300_000,
           text_col: str = "text",
           id_col: str = "doc_id") -> "ray.data.Dataset":
    """Curated corpus: one row per kept document (columns: doc_id, text).

    keep ⇔ doc_id == min(doc_id) among exact-content duplicates AND the
    quality gate passes (scaled-integer ratio rules, exact vs SQL).
    """
    def key_batch(batch: pa.Table) -> pa.Table:
        texts = pc.cast(batch[text_col], pa.string())
        shas = np.fromiter(
            (int.from_bytes(hashlib.sha256((t or "").encode()).digest()[:8],
                            "big") for t in texts.to_pylist()),
            dtype=np.uint64, count=len(batch))
        return pa.table({
            "part": pa.array((shas % np.uint64(NUM_CURATE_PARTITIONS))
                             .astype(np.int32)),
            "sha64": pa.array(shas),
            "doc_id": pc.cast(batch[id_col], pa.int64()),
            "text": texts,
        })

    def per_part(group: pa.Table) -> pa.Table:
        g = group.combine_chunks().sort_by(
            [("sha64", "ascending"), ("doc_id", "ascending")])
        shas = g["sha64"].to_numpy(zero_copy_only=False)
        if shas.size == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "text": pa.array([], type=pa.string())})
        # keeper = first row of each sha run (min doc_id — sorted above)
        is_keeper = np.empty(shas.size, dtype=bool)
        is_keeper[0] = True
        is_keeper[1:] = shas[1:] != shas[:-1]
        kept = g.filter(pa.array(is_keeper))
        ok = quality_keep_mask(kept["text"],
                               min_ws_tokens=min_ws_tokens,
                               max_stop_ratio_u=max_stop_ratio_u,
                               min_distinct_ratio_u=min_distinct_ratio_u)
        out = kept.filter(pa.array(ok))
        return out.select(["doc_id", "text"])

    return (ds.map_batches(key_batch, batch_format="pyarrow")
              .groupby("part")
              .map_groups(per_part, batch_format="pyarrow"))


def sql_curate(min_ws_tokens: int = 10, max_stop_ratio_u: int = 500_000,
               min_distinct_ratio_u: int = 300_000) -> str:
    """Oracle: dedup keeper (min doc_id per sha256(text)) ∧ quality gate.
    Note the Ray side keys on the first 8 bytes of the digest — a 64-bit
    collision would merge two distinct contents, probability ~n²/2⁶⁵;
    the oracle uses the full digest, so the driver check also certifies
    collision-freedom on the actual data."""
    from searchengine_ray.config import DEFAULT_STOPWORDS
    stop = ", ".join(f"'{s}'" for s in sorted(DEFAULT_STOPWORDS))
    return f"""
WITH keepers AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
    FROM documents) WHERE doc_id = keeper),
m AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x != '') AS toks
  FROM keepers)
SELECT doc_id, text FROM (
  SELECT doc_id, text, len(toks)::BIGINT AS n_ws,
         len(list_filter(toks, t -> t IN ({stop})))::BIGINT AS n_stop,
         len(list_distinct(toks))::BIGINT AS n_dist
  FROM m)
WHERE n_ws >= {min_ws_tokens}
  AND (n_stop * 1000000) // greatest(n_ws, 1) <= {max_stop_ratio_u}
  AND (n_dist * 1000000) // greatest(n_ws, 1) >= {min_distinct_ratio_u}
"""


def curate_to_dir(ds: "ray.data.Dataset", out_dir: str, *,
                  num_parts: int = NUM_CURATE_PARTITIONS,
                  **curate_kwargs) -> dict[int, int]:
    """Curate and persist as RESUMABLE partitioned parquet: curated rows
    hash-partition by doc_id into ``num_parts`` files through the
    generic ``state.partitioned_write`` sink — a restarted run prunes
    finished partitions before the shuffle and rewrites only the rest.
    Returns {partition: rows}."""
    from searchengine_ray.state.partitioned_write import write_partitioned
    curated = curate(ds, **curate_kwargs)

    def add_part(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return batch.append_column(
            "wpart", pa.array((ids % num_parts).astype(np.int64)))

    return write_partitioned(
        curated.map_batches(add_part, batch_format="pyarrow"),
        out_dir, "wpart", scheme=f"doc_id%{num_parts}")
