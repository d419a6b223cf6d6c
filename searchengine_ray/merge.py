"""Incremental index merge — the stateful actor-pool segment merger.

New corpus shards are indexed as independent delta indexes (build_index on
the shard), then merged: for each term partition, the per-source posting
lists are SORTED RUNS over disjoint doc_id spaces; the merger concatenates
runs per term, re-sorts by doc_id, and re-encodes (varbyte delta +
block-max). This is the SURVEY.md §2.4 ST2 actor-pool slot (reference
analogue: the segment-merge stage planned in §7 milestone 3): the merger
is a callable CLASS passed to ``map_batches(SegmentMerger, concurrency=N,
batch_size=1)`` — per-actor setup (source manifests, output dirs) happens
once in ``__init__``; each ``__call__`` merges one partition.

Constraints (asserted): all sources share num_partitions, tokenizer
version and hot_terms (build deltas with ``build_index(...,
hot_terms_override=base_manifest["hot_terms"])`` so salted routing
matches); doc_id spaces must be disjoint (guaranteed when shards hold
distinct (repo,path,commit) triples — doc_id is their hash).
"""

from __future__ import annotations

import os
import shutil
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from searchengine_ray.codec import (CODEC_VERSION, block_max_tf_batch,
                                    decode_postings, encode_postings_batch)
from searchengine_ray.config import IndexConfig
from searchengine_ray.functions.hashing import hash64
from searchengine_ray.stages.postings import LENGTHS_SCHEMA, SEGMENT_SCHEMA
from searchengine_ray.state.manifest import (TOKENIZER_VERSION, load_manifest,
                                             save_manifest)


class SegmentMerger:
    """Actor-pool callable: one __call__ = merge one partition across all
    source indexes (a batch of {part} rows; batch_size=1)."""

    def __init__(self, source_dirs: list[str], out_dir: str, cfg: IndexConfig):
        self.source_dirs = source_dirs
        self.out_dir = out_dir
        self.cfg = cfg  # per-actor setup: paths + config held for all calls

    def _write(self, table: pa.Table, rel: str) -> tuple[str, int]:
        path = os.path.join(self.out_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        # row_group_size matches SegmentWriter._write — merged indexes keep
        # the bounded row groups lazy_segments predicate pushdown needs
        pq.write_table(table, tmp, compression="zstd", row_group_size=1024)
        os.replace(tmp, path)
        return rel, os.path.getsize(path)

    def _merge_segment(self, part: int) -> dict:
        rel = f"segments/part-{part:05d}.parquet"
        tables = []
        for d in self.source_dirs:
            p = os.path.join(d, rel)
            if os.path.exists(p):
                tables.append(pq.read_table(p))
        by_term: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
        for t in tables:
            terms = t["term"].to_pylist()
            for i, term in enumerate(terms):
                by_term.setdefault(term, []).append(
                    decode_postings(t["postings"][i].as_py()))
        terms_sorted = sorted(by_term)
        ids_parts, tf_parts, lens = [], [], []
        for term in terms_sorted:
            runs = by_term[term]
            ids = np.concatenate([r[0] for r in runs])
            tfs = np.concatenate([r[1] for r in runs]).astype(np.float64)
            order = np.argsort(ids, kind="stable")  # merge of sorted runs
            ids, tfs = ids[order], tfs[order]
            if len(runs) > 1:
                assert np.all(np.diff(ids) > 0), \
                    f"doc_id collision across sources for term {term!r}"
            ids_parts.append(ids)
            tf_parts.append(tfs)
            lens.append(len(ids))
        if not terms_sorted:
            seg = pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in SEGMENT_SCHEMA],
                schema=SEGMENT_SCHEMA)
            _, size = self._write(seg, rel)
            return {"part": part, "kind": "segment", "path": rel, "rows": 0,
                    "terms": 0, "bytes": size, "sum_doc_len": 0.0,
                    "status": "done"}
        all_ids = np.concatenate(ids_parts)
        all_tfs = np.concatenate(tf_parts)
        lens_arr = np.array(lens, dtype=np.int64)
        ends = np.cumsum(lens_arr)
        starts = ends - lens_arr
        posts = encode_postings_batch(all_ids, all_tfs, starts, ends,
                                      self.cfg.block_size)
        bms = block_max_tf_batch(all_tfs, starts, ends, self.cfg.block_size)
        seg = pa.Table.from_arrays(
            [pa.array(terms_sorted, type=pa.string()),
             pa.array(np.array([hash64(t) for t in terms_sorted],
                               dtype=np.uint64)),
             pa.array(lens_arr.astype(np.uint32)),
             pa.array(posts, type=pa.large_binary()),
             pa.array(bms, type=pa.binary())],
            schema=SEGMENT_SCHEMA)
        _, size = self._write(seg, rel)
        return {"part": part, "kind": "segment", "path": rel,
                "rows": int(ends[-1]), "terms": len(terms_sorted),
                "bytes": size, "sum_doc_len": 0.0, "status": "done"}

    def _merge_lengths(self, part: int) -> dict:
        rel = f"lengths/part-{part:05d}.parquet"
        tables = [pq.read_table(os.path.join(d, rel))
                  for d in self.source_dirs
                  if os.path.exists(os.path.join(d, rel))]
        merged = pa.concat_tables(tables) if tables else \
            pa.Table.from_arrays([pa.array([], type=f.type)
                                  for f in LENGTHS_SCHEMA],
                                 schema=LENGTHS_SCHEMA)
        ids = merged["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        assert len(ids) == 0 or np.all(np.diff(ids[order]) > 0), \
            "doc_id collision across sources"
        merged = merged.take(pa.array(order))
        _, size = self._write(merged, rel)
        return {"part": part, "kind": "lengths", "path": rel,
                "rows": len(merged), "terms": 0, "bytes": size,
                "sum_doc_len": float(np.sum(
                    merged["doc_len"].to_numpy(zero_copy_only=False))),
                "status": "done"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for part in batch["part"].to_pylist():
            part = int(part)
            if part < self.cfg.num_partitions:
                rows.append(self._merge_segment(part))
            else:
                rows.append(self._merge_lengths(part))
        return pa.Table.from_pylist(rows)


def merge_indexes(source_dirs: list[str], out_dir: str,
                  cfg: IndexConfig = IndexConfig(), *,
                  concurrency: tuple[int, int] = (2, 8)) -> dict[str, Any]:
    """Merge N source indexes (disjoint doc_id spaces) into ``out_dir``.

    Partition merge fan-out runs on an actor pool; docstores are
    file-copied (immutable per-shard parquet). Returns the merged manifest.
    """
    manifests = [load_manifest(d) for d in source_dirs]
    assert all(m is not None for m in manifests), "missing source manifest"
    base = manifests[0]
    for d, m in zip(source_dirs, manifests):
        # an incomplete source would silently merge as missing-partition
        # postings whose docs have no length rows — refuse loudly
        assert m.get("complete"), f"source index not complete: {d}"
        assert m["num_partitions"] == cfg.num_partitions, \
            f"{d}: num_partitions {m['num_partitions']} != cfg {cfg.num_partitions}"
        assert m["num_length_partitions"] == cfg.num_length_partitions, \
            f"{d}: num_length_partitions mismatch vs cfg"
        assert m["tokenizer_version"] == TOKENIZER_VERSION, \
            f"{d}: tokenizer_version mismatch"
        assert m.get("codec_version") == CODEC_VERSION, \
            f"{d}: codec_version {m.get('codec_version')} != {CODEC_VERSION}"
        assert m.get("stemmer", "none") == cfg.stemmer, \
            f"{d}: stemmer {m.get('stemmer')} != cfg {cfg.stemmer}"
        assert m.get("lengths_layout") == "range", \
            f"{d}: lengths_layout {m.get('lengths_layout')} != range"
        assert m["hot_terms"] == base["hot_terms"], \
            "sources must share hot_terms (build deltas with " \
            "hot_terms_override of the base index)"
    os.makedirs(out_dir, exist_ok=True)

    total_parts = cfg.num_partitions + cfg.num_length_partitions
    parts_ds = ray.data.from_items([{"part": p} for p in range(total_parts)])
    rows = parts_ds.map_batches(
        SegmentMerger, batch_size=1, concurrency=concurrency,
        fn_constructor_args=(source_dirs, out_dir, cfg),
        batch_format="pyarrow").take_all()

    # docstore: copy per-shard files (immutable) under unique names
    ds_out = os.path.join(out_dir, "docstore")
    os.makedirs(ds_out, exist_ok=True)
    for si, d in enumerate(source_dirs):
        src = os.path.join(d, "docstore")
        for f in sorted(os.listdir(src)):
            if f.endswith(".parquet"):
                shutil.copyfile(os.path.join(src, f),
                                os.path.join(ds_out, f"src{si:03d}-{f}"))

    partitions = {}
    for row in rows:
        partitions[str(int(row["part"]))] = {
            "kind": row["kind"], "path": row["path"], "rows": int(row["rows"]),
            "terms": int(row["terms"]), "bytes": int(row["bytes"]),
            "sum_doc_len": float(row["sum_doc_len"]), "status": row["status"],
        }
    num_docs = sum(e["rows"] for e in partitions.values()
                   if e["kind"] == "lengths")
    sum_doc_len = sum(e["sum_doc_len"] for e in partitions.values()
                      if e["kind"] == "lengths")
    manifest = {
        "num_docs": num_docs,
        "avg_doc_len": (sum_doc_len / num_docs) if num_docs else 0.0,
        "num_terms": sum(e["terms"] for e in partitions.values()
                         if e["kind"] == "segment"),
        "num_partitions": cfg.num_partitions,
        "num_length_partitions": cfg.num_length_partitions,
        "bm25": {"k1": cfg.k1, "b": cfg.b},
        "boosts": {"title": cfg.title_boost, "meta": cfg.meta_boost,
                   "content": cfg.content_boost},
        "codec_version": CODEC_VERSION,
        "lengths_layout": "range",
        "stemmer": cfg.stemmer,
        "tokenizer_version": TOKENIZER_VERSION,
        "hot_terms": base["hot_terms"],
        "docstore_done": True,
        "complete": True,
        "merged_from": [os.path.abspath(d) for d in source_dirs],
        "partitions": partitions,
    }
    save_manifest(out_dir, manifest)
    return manifest
