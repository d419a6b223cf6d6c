"""Benchmark decontamination — flag training documents whose word
n-grams overlap a held-out benchmark/eval set (the GPT-3/PaLM-style
"n-gram collision" decontamination pass every LLM training-data
pipeline runs before training).

The reference has no analogue (its corpus is a crawled index, SURVEY.md
§2) — this is part of the training-data extension family.

Ray-Data-first plan — ZERO shuffle:
  1. The benchmark side is SMALL by construction (eval suites are MBs,
     not TBs): its distinct shingles are collected once and broadcast
     via ``ray.put`` — read by every scoring task from the object
     store, never re-shipped per batch.
  2. The training side streams through ONE ``map_batches`` pass: each
     batch shingles its docs (Arrow-vectorized, shared
     ``dedup._shingle_batch`` kernel), marks bench membership with a
     single ``pc.is_in`` against the broadcast value set (exact string
     membership — no hash-collision risk vs the SQL twin), and reduces
     to per-doc counts with ``np.unique``/``np.bincount``. A document
     is never split across batches, so per-batch reduction is complete
     — no groupby, no shuffle, no driver-side loop.

At 100 TB this is the right shape: the training corpus rides through
once with backpressure; the only materialized state is the bench
shingle set (bounded by the benchmark, not the corpus). For a bench
side too large to broadcast (unusual), fall back to
``pipelines.join.equi_join`` on shingle hash.

Docs with fewer than ``n`` tokens produce no shingles and are absent
from the output — identical to the SQL twin's unnest semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from searchengine_ray.pipelines.dedup import _shingle_batch

CONTAM_SCALE = 1_000_000  # contam_u = hits*SCALE // n_shingles (exact int)


def bench_shingle_set(bench: "ray.data.Dataset", n: int,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Array:
    """Distinct shingle strings of the benchmark side as a sorted Arrow
    string array (the broadcast payload). Streams the bench dataset in
    batches; memory is bounded by the DISTINCT bench shingles."""
    vals: set[str] = set()
    per_doc = bench.map_batches(
        lambda b: _shingle_batch(b, n, text_col, id_col),
        batch_format="pyarrow")
    for b in per_doc.iter_batches(batch_format="pyarrow"):
        vals.update(b["shingle"].to_pylist())
    return pa.array(sorted(vals), type=pa.string())


def decontaminate(train: "ray.data.Dataset", bench: "ray.data.Dataset",
                  n: int = 3, tau_u: int = 20_000,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-training-doc benchmark-overlap score.

    Output columns: doc_id, n_shingles (distinct word-``n``-grams),
    n_hit (of those, how many appear anywhere in the bench side),
    contam_u (= n_hit·10^6 // n_shingles, exact scaled ratio), flagged
    (1 iff contam_u ≥ ``tau_u``). ``n`` defaults small for the tiny
    test vocabulary; real corpora use n=8..13.
    """
    value_set = bench_shingle_set(bench, n, text_col, id_col)
    ref = ray.put(value_set)  # broadcast once; tasks read from plasma

    def score(batch: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        t = _shingle_batch(batch, n, text_col, id_col)
        if t.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "n_shingles": pa.array([], type=pa.int64()),
                "n_hit": pa.array([], type=pa.int64()),
                "contam_u": pa.array([], type=pa.int64()),
                "flagged": pa.array([], type=pa.int64()),
            })
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hit = np.asarray(
            pc.is_in(t["shingle"], value_set=vs)
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        uids, inv = np.unique(ids, return_inverse=True)
        sz = np.bincount(inv).astype(np.int64)
        hits = np.bincount(inv, weights=hit).astype(np.int64)
        contam_u = (hits * CONTAM_SCALE) // sz
        return pa.table({
            "doc_id": pa.array(uids, type=pa.int64()),
            "n_shingles": pa.array(sz),
            "n_hit": pa.array(hits),
            "contam_u": pa.array(contam_u),
            "flagged": pa.array((contam_u >= tau_u).astype(np.int64)),
        })

    return train.map_batches(score, batch_format="pyarrow")


def sql_decontaminate(n: int = 3, tau_u: int = 20_000,
                      bench_mod: int = 37) -> str:
    """Exact twin of the driver entry: bench side = documents with
    doc_id % bench_mod = 0, train side = the rest; distinct-shingle
    overlap via a plain join on the shingle STRING (the engine's
    pc.is_in is exact string membership, so no hash-collision gap)."""
    from searchengine_ray.functions.tokenizer import sql_tokens_expr
    toks = sql_tokens_expr("text")
    return f"""
WITH toklists AS (SELECT doc_id, {toks} AS L FROM documents),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(L) - {n} + 2, 1)),
                                 i -> array_to_string(L[i:i+{n - 1}], ' ')))
           AS shingle
    FROM toklists)),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {bench_mod} = 0),
train AS (SELECT * FROM sh WHERE doc_id % {bench_mod} != 0),
agg AS (
  SELECT t.doc_id, count(*)::BIGINT AS n_shingles,
         sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_hit
  FROM train t LEFT JOIN bench b USING (shingle)
  GROUP BY t.doc_id)
SELECT doc_id, n_shingles, n_hit,
       ((n_hit * {CONTAM_SCALE}) // n_shingles)::BIGINT AS contam_u,
       (CASE WHEN (n_hit * {CONTAM_SCALE}) // n_shingles >= {tau_u}
             THEN 1 ELSE 0 END)::BIGINT AS flagged
FROM agg
"""
