"""Corpus sources: the canonical synthetic source-code table and the
driver-testdata adapter.

Input contract (BASELINE.json input_hint): a Parquet table
``(repo:string, path:string, commit:string, lang:string, content:string)``.
The synthetic generator is fully deterministic (seeded numpy, no wall clock)
per FIXTURES.md §1: Zipf vocabulary (hot terms for skew tests), camelCase and
snake_case identifiers, occasional URLs/HTML entities/hyphens to exercise the
tokenizer cleanup chain, log-normal lengths with outliers.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

_LANGS = ["python", "java", "go", "rust", "js", "md"]
_LANG_W = np.array([0.3, 0.2, 0.15, 0.1, 0.15, 0.1])
_EXT = {"python": "py", "java": "java", "go": "go", "rust": "rs", "js": "js", "md": "md"}

_KEYWORDS = [
    "def", "return", "class", "import", "for", "while", "if", "else", "match",
    "func", "struct", "impl", "trait", "let", "const", "var", "async", "await",
    "try", "except", "raise", "yield", "lambda", "public", "static", "void",
]
_STEMS = [
    "parse", "token", "stream", "index", "query", "batch", "merge", "sort",
    "hash", "map", "reduce", "shard", "block", "buffer", "codec", "varbyte",
    "score", "rank", "search", "engine", "vector", "matrix", "cache", "queue",
    "node", "graph", "tree", "heap", "list", "array", "string", "byte",
    "file", "path", "read", "write", "open", "close", "flush", "seek",
    "chunk", "split", "join", "filter", "group", "window", "partition", "spill",
]


def _vocab(rng: np.ndarray) -> list[str]:
    """~2,600 deterministic code-like words: keywords, stems, camelCase and
    snake_case composites."""
    words = list(_KEYWORDS) + list(_STEMS)
    for i, a in enumerate(_STEMS):
        b = _STEMS[(i * 7 + 3) % len(_STEMS)]
        c = _STEMS[(i * 13 + 5) % len(_STEMS)]
        words.append(a + b.capitalize())              # camelCase
        words.append(f"{a}_{b}")                      # snake_case
        words.append(a + b.capitalize() + c.capitalize())
        words.append(f"{a}-{b}")                      # hyphenated
    for i in range(2300):
        a = _STEMS[i % len(_STEMS)]
        words.append(f"{a}{i}")
    return words


def generate_corpus_table(num_docs: int, seed: int = 42,
                          start: int = 0) -> pa.Table:
    """Generate rows [start, start+num_docs) of the deterministic corpus.

    Output is a pure function of (seed, start, num_docs) — shards generated
    by ``write_corpus`` are reproducible across runs and processes without
    coordination (no wall clock, no global RNG).
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, start, num_docs]))
    vocab = np.array(_vocab(rng))
    # Zipf-distributed vocabulary ranks → hot terms (skew)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = 1.0 / ranks ** 1.1
    probs /= probs.sum()

    ids = np.arange(start, start + num_docs)
    langs = np.array(_LANGS)[rng.choice(len(_LANGS), num_docs, p=_LANG_W)]
    repos = np.array([f"org{i % 7}/proj{i % 13}" for i in ids])
    paths = np.array([
        f"src/module_{(i * 31) % 97}/file_{i}.{_EXT[l]}"
        for i, l in zip(ids, langs)
    ])
    commits = np.array([
        hashlib.blake2b(f"commit:{seed}:{r}".encode(), digest_size=20).hexdigest()
        for r in repos
    ])
    # log-normal token counts, mean ≈ 180 tokens, with rare large outliers
    n_tokens = np.minimum(
        rng.lognormal(mean=4.8, sigma=0.9, size=num_docs), 50_000
    ).astype(np.int64) + 5
    contents = []
    for i in range(num_docs):
        toks = vocab[rng.choice(len(vocab), n_tokens[i], p=probs)]
        body = " ".join(toks.tolist())
        r = rng.random()
        if r < 0.05:
            body = f"see https://example.com/{ids[i]} " + body
        elif r < 0.08:
            body = "&amp; &lt;" + body
        contents.append(body)
    return pa.table({
        "repo": pa.array(repos.tolist(), type=pa.string()),
        "path": pa.array(paths.tolist(), type=pa.string()),
        "commit": pa.array(commits.tolist(), type=pa.string()),
        "lang": pa.array(langs.tolist(), type=pa.string()),
        "content": pa.array(contents, type=pa.large_string()),
    })


def write_corpus(out_dir: str, num_docs: int, seed: int = 42,
                 rows_per_file: int = 10_000) -> str:
    """Materialize the synthetic corpus as a multi-file parquet directory
    (one file per shard → parallel reads; generation itself runs as Ray
    tasks when a Ray session is active, falling back to a local loop)."""
    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done_marker):
        return out_dir
    starts = list(range(0, num_docs, rows_per_file))

    def gen_shard(batch):
        s = int(batch["start"][0])
        n = min(rows_per_file, num_docs - s)
        t = generate_corpus_table(n, seed=seed, start=s)
        path = os.path.join(out_dir, f"part-{s // rows_per_file:05d}.parquet")
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)
        return {"start": np.array([s])}

    ds = ray.data.from_items([{"start": s} for s in starts])
    ds.map_batches(gen_shard, batch_size=1, batch_format="numpy").materialize()
    with open(done_marker, "w") as f:
        f.write(str(num_docs))
    return out_dir


def read_source(path_or_dir: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read the source table (column-pruned at the read)."""
    return ray.data.read_parquet(
        path_or_dir,
        columns=columns or ["repo", "path", "commit", "lang", "content"],
    )


def adapt_documents(sf_dir: str) -> "ray.data.Dataset":
    """Project the driver's documents table
    (doc_id:int64, text, lang, source, n_chars — TESTDATA.md) onto the
    source-code schema: repo=source, path=f"doc_{doc_id}.txt",
    commit=40 zeros, content=text. The original doc_id is recoverable from
    ``path`` (used by __ray_entry__ to emit SQL-comparable ids)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )

    def project(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "repo": batch["source"],
            "path": pa.array([f"doc_{int(d)}.txt" for d in doc_ids], type=pa.string()),
            "commit": pa.array(["0" * 40] * len(batch), type=pa.string()),
            "lang": batch["lang"],
            "content": batch["text"].cast(pa.large_string()),
        })

    return ds.map_batches(project, batch_format="pyarrow")
