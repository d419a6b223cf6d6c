"""Postings explode + segment build — the one wide shuffle of the engine.

Replaces the reference's single-heap inverted-index accumulation
(/root/reference/search_engine/indexer/indexer.py:44-46, 149-150 — SURVEY.md
§2.6 A1) with:

  explode (stateless map_batches, Arrow):  source rows →
      (part:int32, term:string, doc_id:uint64, wtf:float64) posting rows
      PLUS one doc-length row per doc (term=None, wtf=doc_len) routed to
      length partitions — doc_len computed locally per batch (a doc never
      spans batches), so no extra tokenize pass and no extra shuffle.
  groupby("part").map_groups(segment writer):  per partition, sort
      (term, doc_id), varbyte-delta encode each term's postings with
      block-max metadata, write ``part-NNNNN.parquet`` atomically
      (tmp → rename), return ONE manifest row. The returned dataset is tiny;
      the driver folds it into manifest.json (checkpoint/resume lineage).

Skew: hot terms (df above cfg.hot_term_df_ratio, estimated by a sampling
pre-pass) are salted across ``n_salts`` sub-partitions keyed by doc_id hash;
the query engine merges the salted sub-lists (SURVEY.md §4).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from searchengine_ray.codec import block_max_tf, encode_postings
from searchengine_ray.config import IndexConfig
from searchengine_ray.functions.arrow_tokenize import weighted_term_counts
from searchengine_ray.functions.hashing import hash64, hash64_array
from searchengine_ray.stages.docstats import doc_keys

POSTING_SCHEMA = pa.schema([
    ("part", pa.int32()),
    ("term", pa.string()),
    ("doc_id", pa.uint64()),
    ("wtf", pa.float64()),
])

SEGMENT_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("term_hash", pa.uint64()),
    ("df", pa.uint32()),
    ("postings", pa.large_binary()),
    ("block_max", pa.binary()),
])

LENGTHS_SCHEMA = pa.schema([
    ("doc_id", pa.uint64()),
    ("doc_len", pa.float64()),
])

MANIFEST_ROW_SCHEMA = pa.schema([
    ("part", pa.int32()),
    ("kind", pa.string()),
    ("path", pa.string()),
    ("rows", pa.int64()),
    ("terms", pa.int64()),
    ("bytes", pa.int64()),
    ("sum_doc_len", pa.float64()),
    ("status", pa.string()),
])


def salt_of(term: str, salt: int) -> str:
    return f"{term}\x00{salt}"


class ExplodePostings:
    """Stateless-per-batch callable; constructed once per task with the
    (small) hot-term dict captured in the closure — broadcast-not-reshipped
    because Ray serializes the callable once per worker."""

    def __init__(self, cfg: IndexConfig, hot_terms: dict[str, int] | None = None):
        self.cfg = cfg
        self.hot_terms = hot_terms or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        ids = hash64_array(doc_keys(batch))
        counts = weighted_term_counts(
            [
                (batch["path"], cfg.title_boost),
                (pc.binary_join_element_wise(
                    pc.cast(batch["repo"], pa.string()),
                    pc.cast(batch["lang"], pa.string()), " "), cfg.meta_boost),
                (batch["content"], cfg.content_boost),
            ],
            cfg,
        )
        doc_index = counts["doc_index"].to_numpy(zero_copy_only=False)
        post_doc_ids = ids[doc_index]
        terms = counts["term"]
        wtf = counts["wtf"].to_numpy(zero_copy_only=False)
        term_hashes = hash64_array(terms)
        parts = (term_hashes % np.uint64(cfg.num_partitions)).astype(np.int32)
        term_list = None
        if self.hot_terms:
            # Salt hot terms: sub-partition by doc_id hash.
            term_list = terms.to_pylist()
            for i, t in enumerate(term_list):
                n_salts = self.hot_terms.get(t)
                if n_salts:
                    s = int(post_doc_ids[i] % np.uint64(n_salts))
                    parts[i] = np.int32(hash64(salt_of(t, s)) % cfg.num_partitions)
        # Per-doc length rows (doc_len = sum of weighted tfs, indexer.py:144-146)
        doc_len = np.zeros(len(batch), dtype=np.float64)
        np.add.at(doc_len, doc_index, wtf)
        len_parts = (cfg.num_partitions
                     + (ids % np.uint64(cfg.num_length_partitions)).astype(np.int64)
                     ).astype(np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate([parts, len_parts])),
                pa.concat_arrays([
                    terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms,
                    pa.nulls(len(batch), type=pa.string()),
                ]),
                pa.array(np.concatenate([post_doc_ids, ids])),
                pa.array(np.concatenate([wtf, doc_len])),
            ],
            schema=POSTING_SCHEMA,
        )


class SegmentWriter:
    """map_groups callable: one group = one partition. Writes the partition
    file atomically and returns its manifest row."""

    def __init__(self, out_dir: str, cfg: IndexConfig):
        self.out_dir = out_dir
        self.cfg = cfg

    def _write(self, table: pa.Table, rel: str) -> tuple[str, int]:
        path = os.path.join(self.out_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, path)
        return rel, os.path.getsize(path)

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        part = int(group["part"][0].as_py())
        if part < cfg.num_partitions:
            return self._build_segment(group, part)
        return self._build_lengths(group, part)

    def _build_segment(self, group: pa.Table, part: int) -> pa.Table:
        cfg = self.cfg
        order = pc.sort_indices(group, sort_keys=[("term", "ascending"),
                                                  ("doc_id", "ascending")])
        g = group.take(order)
        terms = g["term"].combine_chunks() if isinstance(g["term"], pa.ChunkedArray) else g["term"]
        doc_ids = g["doc_id"].to_numpy(zero_copy_only=False)
        wtf = g["wtf"].to_numpy(zero_copy_only=False)
        # term run boundaries via dictionary codes
        dic = terms.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False)
        boundaries = np.nonzero(np.diff(codes))[0] + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(codes)]])
        uniq_terms = [dic.dictionary[int(codes[s])].as_py() for s in starts]
        rows_term, rows_hash, rows_df, rows_post, rows_bm = [], [], [], [], []
        for t, s, e in zip(uniq_terms, starts, ends):
            ids, tfs = doc_ids[s:e], wtf[s:e]
            rows_term.append(t)
            rows_hash.append(hash64(t))
            rows_df.append(e - s)
            rows_post.append(encode_postings(ids, tfs))
            rows_bm.append(block_max_tf(tfs, cfg.block_size))
        seg = pa.Table.from_arrays(
            [
                pa.array(rows_term, type=pa.string()),
                pa.array(np.array(rows_hash, dtype=np.uint64)),
                pa.array(np.array(rows_df, dtype=np.uint32)),
                pa.array(rows_post, type=pa.large_binary()),
                pa.array(rows_bm, type=pa.binary()),
            ],
            schema=SEGMENT_SCHEMA,
        )
        rel, size = self._write(seg, f"segments/part-{part:05d}.parquet")
        return pa.Table.from_pylist(
            [{"part": part, "kind": "segment", "path": rel, "rows": len(g),
              "terms": len(rows_term), "bytes": size, "sum_doc_len": 0.0,
              "status": "done"}],
            schema=MANIFEST_ROW_SCHEMA,
        )

    def _build_lengths(self, group: pa.Table, part: int) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        g = group.take(order)
        lens = pa.Table.from_arrays(
            [g["doc_id"].combine_chunks() if isinstance(g["doc_id"], pa.ChunkedArray)
             else g["doc_id"],
             g["wtf"].combine_chunks() if isinstance(g["wtf"], pa.ChunkedArray)
             else g["wtf"]],
            schema=LENGTHS_SCHEMA,
        )
        rel, size = self._write(lens, f"lengths/part-{part:05d}.parquet")
        sum_len = float(pc.sum(g["wtf"]).as_py() or 0.0)
        return pa.Table.from_pylist(
            [{"part": part, "kind": "lengths", "path": rel, "rows": len(g),
              "terms": 0, "bytes": size, "sum_doc_len": sum_len,
              "status": "done"}],
            schema=MANIFEST_ROW_SCHEMA,
        )
