"""Amortization evidence for the iterative/composite pipelines
(round-4 verdict item 5): run the three most expensive driver entries —
dedup_graph_pagerank, prepare_corpus, dedup_cluster_keep — on a
deterministic synthetic documents table at sf0.1-equivalent (5k docs)
and sf1-equivalent (50k docs, 10x) and report the wall-time growth
ratio. The claim under test: their cost at toy scale is per-stage FIXED
overhead x stage count, so wall time grows SUB-LINEARLY vs the 10x data
growth (the data term is small against the fixed term).

The generator mirrors /root/testdata's documents shape (TESTDATA.md:
40-word vocab, langs en/zh/es/de/fr, sources src0..19, 5-60 token docs,
planted exact + near dups) but is seeded locally — /root/testdata is
read-only and has no sf1.

Usage: python tools/amortization_bench.py [--cpus 32]
Prints one JSON line; paste the table into BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("batch part spark line column order small sort fast value scan "
         "a hash slow group agg filter query big key window row table "
         "stream merge data vector join read write shuffle block plan "
         "map task node disk page cache actor").split()
assert len(VOCAB) == 40
LANGS = ["en", "zh", "es", "de", "fr"]


def gen_docs(n: int, out_dir: str, seed: int = 42) -> str:
    """Deterministic documents table at `n` docs; ~2% exact dups and
    ~2% near dups (one token changed) so the dedup graph is non-trivial
    at every scale."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(5, 61, size=n)
    texts: list[str] = []
    for i in range(n):
        toks = rng.choice(VOCAB, size=int(lens[i]))
        texts.append(" ".join(toks))
    # planted dups: doc i copies doc i - n//50 (exact), i - n//25 (near)
    for i in range(n // 50, n, 50):
        texts[i] = texts[i - n // 50]
    for i in range(n // 25 + 1, n, 50):
        base = texts[i - n // 25].split()
        base[len(base) // 2] = VOCAB[int(rng.integers(0, 40))]
        texts[i] = " ".join(base)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array([LANGS[i % 5] for i in range(n)]),
        "source": pa.array([f"src{i % 20}" for i in range(n)]),
        "n_chars": pa.array(np.array([len(x) for x in texts],
                                     dtype=np.int64)),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(t, os.path.join(out_dir, "documents.parquet"))
    return out_dir


ENTRIES = ["dedup_graph_pagerank", "prepare_corpus", "dedup_cluster_keep"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--scales", type=int, nargs="*",
                    default=[5_000, 50_000])
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, log_to_driver=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry_mod
    queries = entry_mod.queries()

    root = "/tmp/seray_amort"
    shutil.rmtree(root, ignore_errors=True)
    out: dict = {"cpus": args.cpus, "scales": {}}
    for n in args.scales:
        sf_dir = gen_docs(n, os.path.join(root, f"docs_{n}"))
        times = {}
        for name in ENTRIES:
            t0 = time.perf_counter()
            ds = queries[name](sf_dir)
            nrows = ds.count()
            times[name] = round(time.perf_counter() - t0, 2)
            times[f"{name}_rows"] = nrows
        out["scales"][str(n)] = times
    lo, hi = (str(s) for s in args.scales[:2])
    out["growth_10x"] = {
        name: round(out["scales"][hi][name]
                    / max(out["scales"][lo][name], 1e-9), 2)
        for name in ENTRIES}
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
