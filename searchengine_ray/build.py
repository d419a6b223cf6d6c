"""Index-build orchestrator — Ray-Data-native lifecycle (SURVEY.md §3.4).

    read_parquet(source)
      → map_batches(docstats_batch, pyarrow)          # docstore + sha256 invariant
      → write_parquet(docstore/)
    read_parquet(source)
      → map_batches(ExplodePostings, pyarrow)         # ONE tokenize pass
      → groupby("part").map_groups(SegmentWriter)     # the one wide shuffle
      → (tiny manifest-row dataset) → manifest.json

Replaces the reference's single-process in-heap build
(/root/reference/search_engine/indexer/indexer.py:109-167). Never calls
ray.init/shutdown — the caller owns the session (driver contract).

Resume: partitions listed done in manifest.json (with their files present)
are filtered out *before* the shuffle, so a restarted build re-tokenizes
(cheap, streaming) but re-shuffles and re-writes only missing partitions.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from searchengine_ray.codec import CODEC_VERSION
from searchengine_ray.config import IndexConfig
from searchengine_ray.functions.arrow_tokenize import tokenize_column
from searchengine_ray.stages.docstats import docstats_batch
from searchengine_ray.stages.postings import (
    DocstoreWriter,
    ExplodePostings,
    SegmentWriter,
    docstore_part_ids,
)
from searchengine_ray.state.manifest import (
    TOKENIZER_VERSION,
    done_parts,
    load_manifest,
    save_manifest,
)


def estimate_hot_terms(source: "ray.data.Dataset", cfg: IndexConfig,
                       sample_docs: int = 2000) -> dict[str, int]:
    """Sampling pre-pass for skew: estimate per-term document frequency on a
    bounded prefix sample; terms with df-ratio above cfg.hot_term_df_ratio
    are salted across sub-partitions proportional to their hotness.
    Over-salting a cold term costs nothing but an extra query-side probe, so
    prefix (rather than uniform) sampling bias is acceptable (SURVEY.md §4)."""
    sample = source.limit(sample_docs)

    def partial_df(batch: pa.Table) -> pa.Table:
        di, toks = tokenize_column(batch["content"], cfg)
        t = pa.table({"doc": pa.array(di), "term": toks})
        g = (t.group_by(["doc", "term"], use_threads=False).aggregate([])
             .group_by("term", use_threads=False).aggregate([("doc", "count")]))
        # sentinel row carries the batch's doc count (term=None)
        return pa.table({
            "term": pa.concat_arrays([g["term"].combine_chunks(),
                                      pa.nulls(1, pa.string())]),
            "doc_count": pa.concat_arrays([
                g["doc_count"].combine_chunks(),
                pa.array([len(batch)], type=pa.int64()).cast(g["doc_count"].type)]),
        })

    rows = sample.map_batches(partial_df, batch_format="pyarrow").take_all()
    if not rows:
        return {}
    n = 0
    df: dict[str, int] = {}
    for r in rows:
        if r["term"] is None:
            n += int(r["doc_count"])
        else:
            df[r["term"]] = df.get(r["term"], 0) + int(r["doc_count"])
    n = max(1, n)
    hot: dict[str, int] = {}
    for term, c in df.items():
        ratio = c / n
        if ratio > cfg.hot_term_df_ratio:
            # salts ∝ hotness, capped by partition count
            hot[term] = int(min(cfg.num_partitions,
                                max(2, round(ratio / cfg.hot_term_df_ratio))))
    return hot


def build_index(source: "ray.data.Dataset", index_dir: str,
                cfg: IndexConfig = IndexConfig(), *,
                resume: bool = True,
                salt_hot_terms: bool = True,
                only_parts: set[int] | None = None,
                hot_terms_override: dict[str, int] | None = None) -> dict[str, Any]:
    """Build (or resume) the index at ``index_dir``; returns the manifest.

    ``only_parts`` is a test hook simulating a mid-build crash: only those
    shuffle partitions are written this run (FIXTURES.md §5 resume fixture).
    ``hot_terms_override`` pins the salt routing — required when building a
    DELTA index that will be merged into a base (merge.py needs identical
    hot-term routing across sources).
    """
    os.makedirs(index_dir, exist_ok=True)
    if not resume:
        # a non-resume build OWNS the directory: clear stale artifacts so a
        # previous corpus's partition files can never leak into this index
        # (SegmentWriter only writes partitions that have rows)
        import shutil
        for sub in ("segments", "lengths", "docstore"):
            shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
        mpath = os.path.join(index_dir, "manifest.json")
        if os.path.exists(mpath):
            os.remove(mpath)
    prior = load_manifest(index_dir) if resume else None
    if prior is not None:
        # resuming onto an incompatible layout would mix two partition
        # numberings / term spaces into one index — refuse loudly
        for key, want in (("num_partitions", cfg.num_partitions),
                          ("num_length_partitions", cfg.num_length_partitions),
                          ("num_docstore_partitions",
                           cfg.num_docstore_partitions),
                          ("codec_version", CODEC_VERSION),
                          ("lengths_layout", "range"),
                          ("stemmer", cfg.stemmer),
                          ("tokenizer",
                           getattr(cfg, "tokenizer", "split")),
                          ("tokenizer_version", TOKENIZER_VERSION)):
            # pre-tokenizer-field manifests (no "tokenizer" key) were all
            # built with the whitespace split — resume them under "split"
            have = prior.get(key, "split" if key == "tokenizer" else None)
            if have != want:
                raise ValueError(
                    f"resume mismatch at {index_dir}: manifest {key}={have} "
                    f"but this build uses {want}; pass resume=False to "
                    f"rebuild from scratch")
    done = done_parts(prior, index_dir)

    docstore_dir = os.path.join(index_dir, "docstore")
    docstore_done = bool(prior and prior.get("docstore_done")
                         and os.path.isdir(docstore_dir))
    if (prior and prior.get("complete") and docstore_done
            and only_parts is None):
        return prior  # full build already checkpointed, artifacts intact

    total_parts = cfg.num_partitions + cfg.num_length_partitions
    docstore_ids = set(range(total_parts,
                             total_parts + cfg.num_docstore_partitions))
    skip = set(done)
    if only_parts is not None:
        skip |= (set(range(total_parts)) | docstore_ids) - set(only_parts)
    docstore_skip = skip & docstore_ids

    docstore_thread = None
    docstore_err: list[BaseException] = []
    docstore_rows: list = []
    if not docstore_done:
        # independent pass over the source — run it CONCURRENTLY with the
        # postings shuffle (two Ray Data jobs share the cluster; the
        # streaming executors interleave), hiding its wall time entirely.
        # Output is doc_id-RANGE partitioned with the same atomic-write +
        # manifest-lineage contract as segments, so a crashed docstore pass
        # resumes per-partition (deterministic file names — a rerun
        # overwrites, never duplicates).
        def _add_dpart(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "dpart", pa.array(docstore_part_ids(ids, cfg)))

        def _docstore_job():
            try:
                dds = (source.map_batches(docstats_batch,
                                          batch_format="pyarrow")
                       .map_batches(_add_dpart, batch_format="pyarrow"))
                if docstore_skip:
                    skip_arr = pa.array(sorted(docstore_skip),
                                        type=pa.int32())
                    dds = dds.map_batches(
                        lambda t: t.filter(pc.invert(
                            pc.is_in(t["dpart"], value_set=skip_arr))),
                        batch_format="pyarrow")
                writer = DocstoreWriter(index_dir)
                docstore_rows.extend(
                    dds.groupby("dpart")
                       .map_groups(lambda g: writer(g),
                                   batch_format="pyarrow")
                       .take_all())
            except BaseException as e:  # re-raised on join
                docstore_err.append(e)

        import threading
        docstore_thread = threading.Thread(target=_docstore_job, daemon=True)
        docstore_thread.start()

    if hot_terms_override is not None:
        hot_terms = {t: int(n) for t, n in hot_terms_override.items()}
    elif prior and prior.get("hot_terms") is not None:
        hot_terms = {t: int(n) for t, n in prior["hot_terms"].items()}
    elif salt_hot_terms:
        hot_terms = estimate_hot_terms(source, cfg)
    else:
        hot_terms = {}

    if prior and prior.get("complete") and only_parts is None:
        # all partitions already checkpointed — only the docstore needed
        # rebuilding (thread above); skip the shuffle entirely
        manifest_rows: list = []
    else:
        exploded = source.map_batches(
            ExplodePostings(cfg, hot_terms), batch_format="pyarrow")
        if skip:
            skip_arr = pa.array(sorted(skip), type=pa.int32())
            exploded = exploded.map_batches(
                lambda t: t.filter(
                    pc.invert(pc.is_in(t["part"], value_set=skip_arr))),
                batch_format="pyarrow")
        writer = SegmentWriter(index_dir, cfg)

        def write_partition(group):
            return writer(group)

        manifest_rows = (
            exploded.groupby("part")
            .map_groups(write_partition, batch_format="pyarrow")
            .take_all()
        )
    if docstore_thread is not None:
        docstore_thread.join()
        if docstore_err:
            raise docstore_err[0]

    partitions = dict(prior.get("partitions", {})) if prior else {}
    for row in list(manifest_rows) + docstore_rows:
        partitions[str(int(row["part"]))] = {
            "kind": row["kind"], "path": row["path"], "rows": int(row["rows"]),
            "terms": int(row["terms"]), "bytes": int(row["bytes"]),
            "sum_doc_len": float(row["sum_doc_len"]), "status": row["status"],
        }
    sum_doc_len = sum(e["sum_doc_len"] for e in partitions.values()
                      if e["kind"] == "lengths")
    # N = one length row per doc — no driver-side footer scan needed
    num_docs = sum(e["rows"] for e in partitions.values()
                   if e["kind"] == "lengths")
    num_terms = sum(e["terms"] for e in partitions.values()
                    if e["kind"] == "segment")
    # complete requires: a full (non-only_parts) run, actual documents
    # observed (guards a resume against an empty/mis-pathed source being
    # marked complete), and every recorded partition done
    complete = (only_parts is None and num_docs > 0
                and all(p["status"] == "done" for p in partitions.values()))
    manifest = {
        "num_docs": num_docs,
        "avg_doc_len": (sum_doc_len / num_docs) if num_docs else 0.0,
        "num_terms": num_terms,
        "num_partitions": cfg.num_partitions,
        "num_length_partitions": cfg.num_length_partitions,
        "num_docstore_partitions": cfg.num_docstore_partitions,
        "bm25": {"k1": cfg.k1, "b": cfg.b},
        "boosts": {"title": cfg.title_boost, "meta": cfg.meta_boost,
                   "content": cfg.content_boost},
        "codec_version": CODEC_VERSION,
        "lengths_layout": "range",
        "stemmer": cfg.stemmer,
        "tokenizer": getattr(cfg, "tokenizer", "split"),
        "tokenizer_version": TOKENIZER_VERSION,
        "hot_terms": hot_terms,
        # done unless an only_parts run deliberately excluded docstore
        # partitions (the crash-simulation hook) — then the next resume
        # reruns exactly the missing ones
        "docstore_done": bool(docstore_done or not (docstore_ids & skip
                                                    - set(done))),
        "complete": complete,
        "partitions": partitions,
    }
    save_manifest(index_dir, manifest)
    return manifest


def filter_new_docs(source: "ray.data.Dataset",
                    base_index_dir: str) -> "ray.data.Dataset":
    """Incremental-ingest content filter: the subset of ``source`` whose
    sha256(content) does NOT already exist in ``base_index_dir``'s
    docstore, with exact-duplicate rows WITHIN the incoming batch also
    collapsed to one (min doc_key per sha — deterministic).

    Exact distributed anti-join on the full 32-byte sha: both sides ride
    a coarse hash shuffle keyed by the sha's first 8 bytes, and each
    partition takes the exact byte-level set difference — hash-prefix
    collisions cannot create false drops. Only the base docstore's
    content_sha256 COLUMN is read (column-pruned; 32 bytes/doc), while
    incoming rows ride the shuffle once with their payload — the right
    trade for the incremental case where the delta ≪ the base corpus.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from searchengine_ray.functions.hashing import sha256_array
    from searchengine_ray.pipelines.common import grouped_aggregate
    from searchengine_ray.stages.docstats import doc_keys

    src_schema = source.schema().base_schema
    payload_cols = [f.name for f in src_schema]

    def _key64(sha: pa.Array) -> pa.Array:
        b = np.frombuffer(b"".join(sha.to_pylist()), dtype=">u8") \
            .reshape(-1, 4)[:, 0].astype(np.int64) \
            if len(sha) else np.empty(0, dtype=np.int64)
        return pa.array(b)

    def tag_base(batch: pa.Table) -> pa.Table:
        sha = batch["content_sha256"].combine_chunks() \
            if isinstance(batch["content_sha256"], pa.ChunkedArray) \
            else batch["content_sha256"]
        out = {"sha_key": _key64(sha), "sha": sha,
               "side": pa.array(np.zeros(len(batch), dtype=np.int64)),
               "doc_key": pa.nulls(len(batch), type=pa.string())}
        for c in payload_cols:
            out[c] = pa.nulls(len(batch), type=src_schema.field(c).type)
        return pa.table(out)

    def tag_src(batch: pa.Table) -> pa.Table:
        content = batch["content"]
        sha = pa.array(sha256_array(content), type=pa.binary())
        out = {"sha_key": _key64(sha), "sha": sha,
               "side": pa.array(np.ones(len(batch), dtype=np.int64)),
               "doc_key": doc_keys(batch)}
        for c in payload_cols:
            out[c] = batch[c]
        return pa.table(out)

    base = ray.data.read_parquet(
        os.path.join(base_index_dir, "docstore"),
        columns=["content_sha256"]).map_batches(
            tag_base, batch_format="pyarrow")
    incoming = source.map_batches(tag_src, batch_format="pyarrow")

    def diff(part: pa.Table) -> pa.Table:
        side = part["side"].to_numpy(zero_copy_only=False)
        shas = part["sha"].to_pylist()
        existing = {s for s, sd in zip(shas, side) if sd == 0}
        keys = part["doc_key"].to_pylist()
        best: dict[bytes, int] = {}
        for i, (s, sd) in enumerate(zip(shas, side)):
            if sd == 0 or s in existing:
                continue
            j = best.get(s)
            if j is None or keys[i] < keys[j]:
                best[s] = i
        if not best:
            return part.select(payload_cols).slice(0, 0)
        take = pa.array(sorted(best.values()), type=pa.int64())
        return part.select(payload_cols).take(take)

    return grouped_aggregate(base.union(incoming), ["sha_key"], diff)


def build_delta_index(source: "ray.data.Dataset", base_index_dir: str,
                      delta_index_dir: str,
                      cfg: IndexConfig = IndexConfig()) -> dict[str, Any]:
    """Incremental indexing, end to end: index ONLY the content of
    ``source`` not already in the base (filter_new_docs), pinning the
    base's hot-term salt routing so the delta stays mergeable
    (merge_indexes) and federable (FederatedQueryEngine / Manager) with
    it. Returns the delta manifest; a delta with zero new docs still
    writes a valid empty index."""
    base_manifest = load_manifest(base_index_dir)
    hot = {t: int(n) for t, n in
           (base_manifest.get("hot_terms") or {}).items()}
    fresh = filter_new_docs(source, base_index_dir)
    return build_index(fresh, delta_index_dir, cfg,
                       hot_terms_override=hot)
