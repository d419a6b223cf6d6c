"""Index artifact verification — reference parity with
/root/reference/verify_index.py:23-141 (file-presence + loadability +
cardinality smoke check that gates deploys; SURVEY.md §5).

Checks, per artifact:
  manifest.json     loads; complete; partition entries all 'done'
  segments/         every manifest segment file exists, loads, row/term
                    counts match its lineage entry; postings decode
  lengths/          files exist; total rows == num_docs; doc_ids unique
  docstore/         loads; row count == num_docs; doc_ids unique;
                    sha256 column present (the per-row invariant)
  scalars           avg_doc_len == Σ doc_len / N (exact)
  embeddings/       optional (hybrid path): row count == num_docs

Returns a report dict; ``ok`` is the deploy gate (reference :126-141 uses
the exit code the same way). Wired as ``cli.py verify``.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.codec import decode_postings
from searchengine_ray.state.manifest import load_manifest


def _read_dir(path: str, columns=None) -> pa.Table | None:
    if not os.path.isdir(path):
        return None
    files = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(os.path.join(path, f),
                                           columns=columns) for f in files])


def verify_index(index_dir: str, *, decode_sample_terms: int = 50) -> dict[str, Any]:
    problems: list[str] = []
    report: dict[str, Any] = {"index_dir": index_dir, "problems": problems}

    manifest = load_manifest(index_dir)
    if manifest is None:
        problems.append("manifest.json missing or unreadable")
        report["ok"] = False
        return report
    report["num_docs"] = manifest.get("num_docs")
    report["num_terms"] = manifest.get("num_terms")
    if not manifest.get("complete"):
        problems.append("manifest not marked complete")
    parts = manifest.get("partitions", {})
    not_done = [p for p, e in parts.items() if e.get("status") != "done"]
    if not_done:
        problems.append(f"partitions not done: {sorted(not_done)[:5]}...")

    # segments: lineage vs files
    n_terms = 0
    decoded = 0
    for p, e in sorted(parts.items(), key=lambda kv: int(kv[0])):
        path = os.path.join(index_dir, e["path"])
        if not os.path.exists(path):
            problems.append(f"missing artifact {e['path']}")
            continue
        t = pq.read_table(path)
        if e["kind"] == "segment":
            if len(t) != e["terms"]:
                problems.append(
                    f"{e['path']}: {len(t)} terms != manifest {e['terms']}")
            n_terms += len(t)
            if int(pa.compute.sum(t["df"]).as_py() or 0) != e["rows"]:
                problems.append(f"{e['path']}: Σdf != manifest rows")
            for i in range(min(len(t), max(0, decode_sample_terms - decoded))):
                ids, tfs = decode_postings(t["postings"][i].as_py())
                if ids.size != int(t["df"][i].as_py()):
                    problems.append(
                        f"{e['path']} term {t['term'][i].as_py()!r}: "
                        f"decode length != df")
                if ids.size > 1 and not (ids[1:] > ids[:-1]).all():
                    problems.append(
                        f"{e['path']} term {t['term'][i].as_py()!r}: "
                        f"postings not strictly sorted")
                decoded += 1
        elif e["kind"] == "lengths" and len(t) != e["rows"]:
            problems.append(f"{e['path']}: {len(t)} rows != manifest")
    if n_terms != manifest["num_terms"]:
        problems.append(f"Σ segment terms {n_terms} != manifest num_terms")

    lengths = _read_dir(os.path.join(index_dir, "lengths"))
    if lengths is None:
        problems.append("lengths/ missing")
    else:
        ids = lengths["doc_id"].to_numpy(zero_copy_only=False)
        if len(lengths) != manifest["num_docs"]:
            problems.append(f"lengths rows {len(lengths)} != num_docs")
        if len(np.unique(ids)) != len(ids):
            problems.append("duplicate doc_ids in lengths")
        total = float(np.sum(lengths["doc_len"].to_numpy(zero_copy_only=False)))
        want = manifest["avg_doc_len"] * manifest["num_docs"]
        if manifest["num_docs"] and abs(total - want) > 1e-6 * max(1.0, want):
            problems.append(f"Σ doc_len {total} != avg·N {want}")

    store = _read_dir(os.path.join(index_dir, "docstore"),
                      columns=["doc_id", "content_sha256"])
    if store is None:
        problems.append("docstore/ missing")
    else:
        if len(store) != manifest["num_docs"]:
            problems.append(f"docstore rows {len(store)} != num_docs")
        sids = store["doc_id"].to_numpy(zero_copy_only=False)
        if len(np.unique(sids)) != len(sids):
            problems.append("duplicate doc_ids in docstore")
        if store["content_sha256"].null_count:
            problems.append("null content_sha256 rows")

    emb = _read_dir(os.path.join(index_dir, "embeddings"), columns=["doc_id"])
    report["has_embeddings"] = emb is not None
    if emb is not None and len(emb) != manifest["num_docs"]:
        problems.append(f"embeddings rows {len(emb)} != num_docs")

    report["ok"] = not problems
    return report
