"""Index manifest — checkpoint/resume lineage and corpus scalars.

The reference persists a single scalar file and monolithic pickles
(/root/reference/search_engine/indexer/indexer.py:238-256); here the
manifest is a JSON file recording corpus stats plus one entry per output
partition (status, rows, terms, bytes, sum_doc_len) — the transactional
analogue of the crawler's file-existence resume idiom
(crawler.py:210-219, SURVEY.md §2.8 D2, §4). Partition files are written
atomically (tmp → rename) by the segment writer; a partition is "done" iff
its manifest entry says so AND its file exists, so a crash between file
write and manifest write just re-does that partition.
"""

from __future__ import annotations

import json
import os
from typing import Any

TOKENIZER_VERSION = "code-aware-v1"
MANIFEST_NAME = "manifest.json"


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST_NAME)


def load_manifest(index_dir: str) -> dict[str, Any] | None:
    path = manifest_path(index_dir)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def save_manifest(index_dir: str, manifest: dict[str, Any]) -> None:
    path = manifest_path(index_dir)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, path)


def done_parts(manifest: dict[str, Any] | None, index_dir: str) -> set[int]:
    """Partitions proven complete: manifest says done AND the file exists."""
    if not manifest:
        return set()
    done = set()
    for key, entry in manifest.get("partitions", {}).items():
        if entry.get("status") == "done" and os.path.exists(
                os.path.join(index_dir, entry["path"])):
            done.add(int(key))
    return done
