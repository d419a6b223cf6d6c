"""Shared fixtures: ONE Ray session per pytest run, one tiny built index.

The Ray session is session-scoped (driver contract / SURVEY.md §5); every
test that touches Ray Data reuses it. The tiny corpus + built index +
in-process oracle are also session-scoped so the expensive build happens
once.
"""

from __future__ import annotations

import glob
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@dataclass
class BuiltIndex:
    corpus_dir: str
    index_dir: str
    cfg: object
    manifest: dict
    table: pa.Table          # full corpus as one Arrow table
    oracle: object           # OracleIndex over the same rows/ids


def read_corpus_table(corpus_dir: str) -> pa.Table:
    files = sorted(glob.glob(corpus_dir + "/*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files])


def oracle_docs(table: pa.Table) -> list[dict]:
    from searchengine_ray.functions.hashing import hash64
    from searchengine_ray.stages.docstats import doc_keys

    keys = doc_keys(table).to_pylist()
    cols = {c: table[c].to_pylist() for c in
            ("repo", "path", "commit", "lang", "content")}
    return [
        {"doc_id": hash64(keys[i]), **{c: cols[c][i] for c in cols}}
        for i in range(len(table))
    ]


@pytest.fixture(scope="session")
def built(ray_session, tmp_path_factory) -> BuiltIndex:
    from searchengine_ray.build import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.oracle import build_oracle_index
    from searchengine_ray.sources.corpus import read_source, write_corpus

    root = tmp_path_factory.mktemp("engine")
    corpus_dir = str(root / "corpus")
    index_dir = str(root / "index")
    write_corpus(corpus_dir, 400, rows_per_file=100)
    cfg = IndexConfig(num_partitions=8, num_length_partitions=2)
    manifest = build_index(read_source(corpus_dir), index_dir, cfg)
    table = read_corpus_table(corpus_dir)
    oracle = build_oracle_index(oracle_docs(table), cfg)
    return BuiltIndex(corpus_dir=corpus_dir, index_dir=index_dir, cfg=cfg,
                      manifest=manifest, table=table, oracle=oracle)
