"""Resumable key-partitioned Parquet sink — the generic form of the
write pattern every wide stage in this repo uses (build.py docstore,
similarity block spill, IVF buckets): one atomic file per key partition,
a lineage manifest recording finished partitions, and a resume path that
prunes finished partitions BEFORE the shuffle, so a restarted 100 TB job
re-reads only the unfinished slice of the input.

Contract: ``part_col`` is an int64 column with bounded cardinality (a
hash partition id, a bucket id, a shard number). Files are written
tmp→``os.replace`` (atomic on POSIX); the manifest is written LAST, so a
crash mid-run leaves either a fully-recorded partition or an orphan tmp
file — never a recorded-but-partial partition. Re-runs verify recorded
files still exist before trusting them.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

MANIFEST_NAME = "_PARTS.json"


def _load_manifest(out_dir: str) -> tuple[str | None, dict[int, int]]:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None, {}
    try:
        with open(path) as f:
            raw = json.load(f)
    except (OSError, ValueError):
        return None, {}
    done = {}
    for k, rows in raw.get("parts", {}).items():
        # trust an entry only if its file is still on disk
        if os.path.exists(os.path.join(out_dir, f"part-{int(k):05d}.parquet")):
            done[int(k)] = int(rows)
    return raw.get("scheme"), done


def write_partitioned(ds: "ray.data.Dataset", out_dir: str,
                      part_col: str,
                      scheme: str | None = None) -> dict[int, int]:
    """Write ``ds`` as one parquet file per distinct ``part_col`` value.

    Returns {partition: rows}. Finished partitions (recorded in
    ``_PARTS.json`` with their file present) are PRUNED from the input
    before the shuffle — the resume path costs one filtered scan, not a
    rewrite. Output rows drop the partition column (it is in the file
    name).

    ``scheme`` names how the caller computed ``part_col`` (e.g.
    ``"doc_id%64"``). A resume against a directory written with a
    DIFFERENT scheme is refused loudly — pruning rows against stale
    partition ids would silently produce a wrong dataset."""
    os.makedirs(out_dir, exist_ok=True)
    prev_scheme, done = _load_manifest(out_dir)
    if done and prev_scheme != scheme:
        raise ValueError(
            f"{out_dir} was written with partition scheme "
            f"{prev_scheme!r}; this run uses {scheme!r} — resume would "
            f"mix partitionings. Use a fresh directory or the original "
            f"scheme.")
    if done:
        done_arr = pa.array(sorted(done), type=pa.int64())
        ds = ds.map_batches(
            lambda b, _d=done_arr: b.filter(
                pc.invert(pc.is_in(pc.cast(b[part_col], pa.int64()),
                                   value_set=_d))),
            batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        p = int(group[part_col][0].as_py())
        body = group.drop_columns([part_col]).combine_chunks()
        path = os.path.join(out_dir, f"part-{p:05d}.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(body, tmp)
        os.replace(tmp, path)
        return pa.table({"p": pa.array([p], type=pa.int64()),
                         "rows": pa.array([len(body)], type=pa.int64())})

    written = (ds.groupby(part_col)
               .map_groups(write_group, batch_format="pyarrow")
               .take_all())  # one row per partition — bounded
    for r in written:
        done[int(r["p"])] = int(r["rows"])
    path = os.path.join(out_dir, MANIFEST_NAME)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"scheme": scheme,
                   "parts": {str(k): v for k, v in sorted(done.items())}},
                  f)
    os.replace(tmp, path)
    return done


def read_partitioned(out_dir: str) -> "ray.data.Dataset":
    """Read back a write_partitioned directory (manifest-listed files
    only — orphan tmp files from a crashed run are ignored)."""
    _, done = _load_manifest(out_dir)
    files = [os.path.join(out_dir, f"part-{p:05d}.parquet")
             for p in sorted(done)]
    return ray.data.read_parquet(files)
