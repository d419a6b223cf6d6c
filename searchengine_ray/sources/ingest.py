"""Filesystem ingestion — the reference crawler's slot (SURVEY.md §2.1 S1,
§3.3) for Parquet-corpus users: walk a checkout/directory tree of source
files and materialize the canonical ``(repo, path, commit, lang, content)``
table as partitioned parquet.

Shape mirrors the crawl loop's responsibilities without the network: file
discovery (frontier), per-file gates (robots/content-type analogues →
extension allowlist + size cap), content normalization (HTML extraction →
utf-8 decode with replacement), and resumable partitioned output. File
READS run on workers via ``map_batches`` over the (tiny) path list — the
driver never touches file contents.

Per-row error policy (SURVEY.md §4): undecodable bytes are replaced
(U+FFFD), oversized/unreadable files are SKIPPED and counted in the
returned stats — never silently dropped.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any

import pyarrow as pa

import ray.data

LANG_BY_EXT = {
    ".py": "python", ".java": "java", ".go": "go", ".rs": "rust",
    ".js": "js", ".ts": "ts", ".jsx": "js", ".tsx": "ts",
    ".c": "c", ".h": "c", ".cc": "cpp", ".cpp": "cpp", ".hpp": "cpp",
    ".cs": "csharp", ".rb": "ruby", ".php": "php", ".swift": "swift",
    ".kt": "kotlin", ".scala": "scala", ".sh": "shell", ".sql": "sql",
    ".md": "md", ".rst": "rst", ".txt": "text", ".toml": "toml",
    ".yaml": "yaml", ".yml": "yaml", ".json": "json",
}
DEFAULT_MAX_FILE_BYTES = 8 * 1024 * 1024
_SKIP_DIRS = {".git", ".hg", ".svn", "node_modules", "__pycache__"}


def discover_files(root: str) -> list[str]:
    """Relative paths of ingestable files under ``root`` (sorted —
    deterministic across runs; VCS/metadata dirs skipped)."""
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d not in _SKIP_DIRS)
        for f in sorted(filenames):
            if os.path.splitext(f)[1].lower() in LANG_BY_EXT:
                out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def tree_fingerprint(root: str, files: list[str]) -> str:
    """40-hex synthetic 'commit' when the caller has none: digest of the
    sorted (path, size) listing — stable for an unchanged tree."""
    h = hashlib.blake2b(digest_size=20)
    for rel in files:
        h.update(rel.encode("utf-8"))
        h.update(str(os.path.getsize(os.path.join(root, rel))).encode())
    return h.hexdigest()


def ingest_tree(root: str, out_dir: str, *, repo: str | None = None,
                commit: str | None = None,
                max_file_bytes: int = DEFAULT_MAX_FILE_BYTES,
                files_per_task: int = 200) -> dict[str, Any]:
    """Ingest ``root`` into parquet at ``out_dir``; returns stats
    (files_ingested, files_skipped, bytes). Output schema = the canonical
    source table (FIXTURES.md §1)."""
    root = os.path.abspath(root)
    repo = repo if repo is not None else os.path.basename(root)
    files = discover_files(root)
    commit = commit if commit is not None else tree_fingerprint(root, files)
    os.makedirs(out_dir, exist_ok=True)

    def read_batch(batch: pa.Table) -> pa.Table:
        rows = {"repo": [], "path": [], "commit": [], "lang": [],
                "content": []}
        for rel in batch["path"].to_pylist():
            full = os.path.join(root, rel)
            try:
                if os.path.getsize(full) > max_file_bytes:
                    continue  # counted below as skipped
                with open(full, "rb") as f:
                    content = f.read().decode("utf-8", errors="replace")
            except OSError:
                continue
            rows["repo"].append(repo)
            rows["path"].append(rel.replace(os.sep, "/"))
            rows["commit"].append(commit)
            rows["lang"].append(
                LANG_BY_EXT[os.path.splitext(rel)[1].lower()])
            rows["content"].append(content)
        return pa.table({
            "repo": pa.array(rows["repo"], type=pa.string()),
            "path": pa.array(rows["path"], type=pa.string()),
            "commit": pa.array(rows["commit"], type=pa.string()),
            "lang": pa.array(rows["lang"], type=pa.string()),
            "content": pa.array(rows["content"], type=pa.large_string()),
        })

    if not files:
        return {"files_ingested": 0, "files_skipped": 0, "repo": repo,
                "commit": commit, "out_dir": out_dir}
    ds = ray.data.from_items([{"path": p} for p in files])
    (ds.map_batches(read_batch, batch_size=files_per_task,
                    batch_format="pyarrow")
       .write_parquet(out_dir))
    # one write pass; ingested count from the parquet footers (cheap, exact)
    import pyarrow.parquet as pq
    ingested = sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir) if f.endswith(".parquet"))
    return {"files_ingested": ingested,
            "files_skipped": len(files) - ingested,
            "repo": repo, "commit": commit, "out_dir": out_dir}
