"""Driver contract implementation: Ray pipelines + DuckDB oracle SQL.

Every entry in QUERIES is a pipeline over the driver's testdata tables
(``documents`` / ``embeddings`` — TESTDATA.md); SQL-expressible ones have a
matching entry in ORACLES whose column names/types are kept in lockstep
(the driver hash-compares values with columns sorted by name).

The BM25 oracle is the flagship: `sql_bm25` generates, from the SAME query
analysis the engine uses (prepare_query), a full ANSI-SQL restatement of
the reference scoring pipeline (SURVEY.md §2.9; /root/reference/
search_engine/indexer/indexer.py:280-443): weighted tf (field boosts
5/3/1), weighted doc length, clamped idf, term-importance, multiplicative
metadata boosts in reference order, max-normalization, min-score filter.
All float expressions are written in the engine's operation order; emitted
scores are round(·, 6) on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from searchengine_ray.config import IndexConfig, QueryConfig
from searchengine_ray.functions.tokenizer import (
    filter_tokens,
    prepare_query,
    sql_filtered_tokens_expr,
    sql_tokens_expr,
    tokenize,
)
from searchengine_ray.pipelines import (analysis, chunking, classify, curate,
                                        decontam, dedup, events, graph,
                                        multimodal, prepare, relational,
                                        similarity)
from searchengine_ray.sources.corpus import adapt_documents

CFG = IndexConfig()
QCFG = QueryConfig()

# Field mapping of the adapted documents table (FIXTURES.md §2 applied to
# TESTDATA's documents: title=path='doc_{id}.txt', meta=source+' '+lang).
SQL_TITLE = "('doc_' || doc_id || '.txt')"
SQL_META = "(source || ' ' || lang)"
SQL_CONTENT = "text"

# Fixed reference query set for the driver check (terms drawn from the
# testdata vocabulary; includes multi-term and single-term shapes).
BM25_QUERIES = {
    "bm25_zh_dup": "zh dup",
    "bm25_src7_window": "src7 window",
    "bm25_en": "en",
}

ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 10

# Boolean (set-retrieval) driver queries: (query, mode, exclude). Terms
# drawn from the testdata vocabulary so each shape is non-trivially
# populated: a conjunction, a disjunction, and a conjunction with an
# exclusion list.
BOOLEAN_QUERIES = {
    "boolean_and": ("zh dup", "and", ""),
    "boolean_or": ("src7 window", "or", ""),
    "boolean_and_not": ("dup window", "and", "zh"),
}


def _docs(sf_dir: str,
          columns: list[str] = ["doc_id", "text"]) -> "ray.data.Dataset":
    """Column-pruned documents read — only the columns the pipeline
    touches leave storage (the engine readers' uniform property,
    corpus.py:145)."""
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=list(columns))


def _embs(sf_dir: str,
          columns: list[str] = ["vec_id", "embedding"]) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                 columns=list(columns))


def _events(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                 columns=list(columns))


def _tbl(sf_dir: str, name: str, columns: list[str]) -> "ray.data.Dataset":
    """Column-pruned reader for the relational (TPC-H-ish) tables."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                                 columns=list(columns))


def q_tpch_q3(sf_dir: str):
    return relational.top_unshipped_orders(
        _tbl(sf_dir, "lineitem",
             ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]),
        _tbl(sf_dir, "orders",
             ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]),
        _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"]))


def q_events_user_type_join(sf_dir: str, salted: bool = False):
    """COMPOSITE-key distributed join (join.equi_join_multi): every
    event picks up its (user_id, event_type) group's total and count —
    the multi-column-key path that single-int64 ``equi_join`` can't
    express without packing. The dim side is a lazy grouped aggregate;
    ``right_schema`` skips the schema probe that would execute it
    twice. ``salted=True`` routes hot composite keys through
    ``equi_join_multi_salted`` (row-identical; skew twin)."""
    from searchengine_ray.pipelines.common import grouped_aggregate
    from searchengine_ray.pipelines.join import equi_join_multi

    def dim_partial(b: pa.Table) -> pa.Table:
        vc = np.round(b["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        t = pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "event_type": pc.cast(b["event_type"], pa.string()),
            "v": pa.array(vc),
            "n": pa.array(np.ones(len(b), dtype=np.int64)),
        })
        return (t.group_by(["user_id", "event_type"], use_threads=False)
                 .aggregate([("v", "sum"), ("n", "sum")])
                 .rename_columns(["user_id", "event_type", "v", "n"]))

    def dim_final(part: pa.Table) -> pa.Table:
        g = (part.group_by(["user_id", "event_type"], use_threads=False)
             .aggregate([("v", "sum"), ("n", "sum")]))
        return pa.table({
            "user_id": pc.cast(g["user_id"], pa.int64()),
            "event_type": pc.cast(g["event_type"], pa.string()),
            "total_c": pc.cast(g["v_sum"], pa.int64()),
            "n_events": pc.cast(g["n_sum"], pa.int64()),
        })

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "value"])
    dim = grouped_aggregate(
        ev.map_batches(dim_partial, batch_format="pyarrow"),
        ["user_id", "event_type"], dim_final)
    left = _events(sf_dir, ["event_id", "user_id", "event_type"])
    sch = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                     ("event_type", pa.string())])
    dim_sch = pa.schema([("user_id", pa.int64()),
                         ("event_type", pa.string()),
                         ("total_c", pa.int64()),
                         ("n_events", pa.int64())])
    if salted:
        # adversarial-skew twin: hot (user_id, event_type) composites
        # (threshold ≈ 1.5× the testdata's mean key size, so real keys
        # salt) spread/replicate across salts; same oracle, same output
        from searchengine_ray.pipelines.join import (detect_hot_keys_multi,
                                                     equi_join_multi_salted)
        hot = detect_hot_keys_multi(left, ["user_id", "event_type"],
                                    threshold=20)
        return equi_join_multi_salted(
            left, dim, ["user_id", "event_type"],
            ["event_id"], ["total_c", "n_events"],
            hot_hashes=hot, replicate=4,
            left_schema=sch, right_schema=dim_sch)
    return equi_join_multi(left, dim, ["user_id", "event_type"],
                           ["event_id"], ["total_c", "n_events"],
                           left_schema=sch, right_schema=dim_sch)


def sql_events_user_type_join() -> str:
    return """
WITH d AS (
  SELECT user_id, event_type,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS total_c,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2)
SELECT e.user_id, e.event_type, e.event_id, d.total_c, d.n_events
FROM events e JOIN d USING (user_id, event_type)
"""


def q_tpch_q5(sf_dir: str):
    return relational.local_supplier_revenue(
        _tbl(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        _tbl(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        _tbl(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        _tbl(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]),
        _tbl(sf_dir, "region", ["r_regionkey", "r_name"]))


# ---------------------------------------------------------------------------
# index build/cache over the adapted documents table
# ---------------------------------------------------------------------------

# bump when the on-disk index format or indexing semantics change, so a
# stale /tmp cache from an older code revision can never answer for the
# current engine
ENGINE_CACHE_REV = 6  # r2: + range-partitioned lengths layout


def index_dir_for(sf_dir: str) -> str:
    import hashlib

    from searchengine_ray.state.manifest import TOKENIZER_VERSION
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{TOKENIZER_VERSION}:{ENGINE_CACHE_REV}"
        .encode()).hexdigest()[:12]
    return os.path.join("/tmp", "seray_driver_index", key)


def ensure_index(sf_dir: str) -> str:
    """Build (once; resume-aware) the full-text index over the adapted
    documents table. Salting disabled so manifest num_terms is the exact
    distinct-term count (salting is exercised by tests + bench instead)."""
    from searchengine_ray.build import build_index
    idx = index_dir_for(sf_dir)
    build_index(adapt_documents(sf_dir), idx, CFG, resume=True,
                salt_hot_terms=False)
    return idx


def _orig_id_from_title(title: str) -> int:
    # adapt_documents writes path = f"doc_{doc_id}.txt"
    return int(title[4:-4])


# ---------------------------------------------------------------------------
# shared dedup intermediates (round-4 verdict #5)
# ---------------------------------------------------------------------------
# Seven gate entries consume the MinHash-LSH pair set (lsh / components /
# pagerank / cluster_keep / lsh_verified / consensus / triangles), two the
# SimHash pair set, two the shingle table — each used to rebuild the
# fingerprints from scratch. Memoize the MATERIALIZED intermediate per
# sf_dir (same pattern as ensure_index): the first entry pays the build,
# later entries read pinned blocks. Opt-in at the operator level (every
# pipeline function still computes its own intermediates when none is
# passed); cache lifetime is the driver session, keyed by (sf_dir, kind).

_SHARED_DEDUP: dict = {}


def _shared(key: tuple, build) -> "ray.data.Dataset":
    ds = _SHARED_DEDUP.get(key)
    if ds is None:
        ds = build().materialize()
        _SHARED_DEDUP[key] = ds
    return ds


def shared_minhash_pairs(sf_dir: str,
                         family: str = "m31") -> "ray.data.Dataset":
    return _shared((sf_dir, "minhash_pairs", family),
                   lambda: dedup.minhash_lsh_pairs(_docs(sf_dir),
                                                   family=family))


def shared_simhash_pairs(sf_dir: str) -> "ray.data.Dataset":
    return _shared((sf_dir, "simhash_pairs"),
                   lambda: dedup.simhash_neardup_pairs(
                       _docs(sf_dir), 3, CFG, max_bucket=1 << 30))


def shared_shingles(sf_dir: str) -> "ray.data.Dataset":
    return _shared((sf_dir, "shingles"),
                   lambda: dedup.shingles(_docs(sf_dir), 3))


# ---------------------------------------------------------------------------
# engine-backed queries
# ---------------------------------------------------------------------------

def q_doc_lengths(sf_dir: str) -> pa.Table:
    """Per-doc weighted document length from the index lengths table
    (reference indexer.py:144-146 semantics; integral by construction)."""
    from searchengine_ray.query import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx, CFG, QCFG)
    # map engine doc_id → original doc_id via the docstore title
    pos = np.searchsorted(eng._doc_ids, eng._len_ids)
    titles = eng._title.iloc[pos]
    # vectorized id recovery (title = f"doc_{doc_id}.txt")
    orig = titles.str[4:-4].astype(np.int64).to_numpy()
    return pa.table({
        "doc_id": pa.array(orig),
        "doc_len": pa.array(eng._len_vals.astype(np.int64)),
    })


def sql_doc_lengths() -> str:
    ft = sql_filtered_tokens_expr(SQL_TITLE, CFG)
    fm = sql_filtered_tokens_expr(SQL_META, CFG)
    fc = sql_filtered_tokens_expr(SQL_CONTENT, CFG)
    return (
        f"SELECT doc_id, (5*len({ft}) + 3*len({fm}) + len({fc}))::BIGINT AS doc_len "
        f"FROM documents"
    )


def q_index_stats(sf_dir: str) -> pa.Table:
    from searchengine_ray.state.manifest import load_manifest
    idx = ensure_index(sf_dir)
    m = load_manifest(idx)
    sum_len = sum(e["sum_doc_len"] for e in m["partitions"].values()
                  if e["kind"] == "lengths")
    return pa.table({
        "num_docs": pa.array([int(m["num_docs"])], type=pa.int64()),
        "num_terms": pa.array([int(m["num_terms"])], type=pa.int64()),
        "sum_doc_len": pa.array([int(round(sum_len))], type=pa.int64()),
    })


def sql_index_stats() -> str:
    ft = sql_filtered_tokens_expr(SQL_TITLE, CFG)
    fm = sql_filtered_tokens_expr(SQL_META, CFG)
    fc = sql_filtered_tokens_expr(SQL_CONTENT, CFG)
    return (
        "SELECT (SELECT count(*) FROM documents)::BIGINT AS num_docs, "
        "(SELECT count(DISTINCT t) FROM (SELECT unnest(list_concat("
        f"list_concat({ft}, {fm}), {fc})) AS t FROM documents))::BIGINT AS num_terms, "
        f"(SELECT sum(5*len({ft}) + 3*len({fm}) + len({fc})) FROM documents)::BIGINT "
        "AS sum_doc_len"
    )


_HEX_DIGITS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def _hex_of_binary(col) -> pa.ChunkedArray:
    """Vectorized bytes→lowercase-hex for a (large_)binary column of
    fixed-length values: nibble lookup over the raw data buffer, output
    assembled zero-copy via StringArray.from_buffers — no per-row Python."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts = []
    for ch in chunks:
        n = len(ch)
        if n == 0:
            continue
        otype = (np.int64 if pa.types.is_large_binary(ch.type)
                 else np.int32)
        offs = np.frombuffer(ch.buffers()[1], dtype=otype)[
            ch.offset: ch.offset + n + 1]
        lens = np.diff(offs)
        width = int(lens[0])
        assert (lens == width).all(), "mixed-width binary column"
        data = np.frombuffer(ch.buffers()[2], dtype=np.uint8)
        mat = data[offs[0]:offs[-1]].reshape(n, width)
        out = np.empty((n, 2 * width), dtype=np.uint8)
        out[:, 0::2] = _HEX_DIGITS[mat >> 4]
        out[:, 1::2] = _HEX_DIGITS[mat & 0x0F]
        starts = np.arange(0, 2 * width * (n + 1), 2 * width,
                           dtype=np.int32)
        parts.append(pa.StringArray.from_buffers(
            n, pa.py_buffer(starts.tobytes()), pa.py_buffer(out.tobytes())))
    if not parts:
        return pa.chunked_array([], type=pa.string())
    return pa.chunked_array(parts)


def q_docstore_sha(sf_dir: str) -> pa.Table:
    """The BASELINE.json per-row invariant, surfaced directly: sha256 of
    every docstore row (as built by the INDEX pipeline) must equal sha256
    of the source text. Columns: doc_id, sha_hex.

    Streams the docstore through map_batches (column-pruned read); id
    recovery and hex encoding are vectorized Arrow/numpy kernels. The
    O(N) output table is inherent to the oracle check itself."""
    import glob

    import ray.data
    idx = ensure_index(sf_dir)
    files = sorted(glob.glob(os.path.join(idx, "docstore", "*.parquet")))

    def to_rows(t: pa.Table) -> pa.Table:
        # adapt_documents writes title = path = f"doc_{doc_id}.txt"
        ids = pc.cast(pc.replace_substring_regex(
            pc.utf8_slice_codeunits(t["title"], 4), r"\.txt$", ""),
            pa.int64())
        return pa.table({"doc_id": ids,
                         "sha_hex": _hex_of_binary(t["content_sha256"])})

    ds = (ray.data.read_parquet(files, columns=["title", "content_sha256"])
          .map_batches(to_rows, batch_format="pyarrow"))
    import ray as _ray
    tables = _ray.get(ds.to_arrow_refs())
    return pa.concat_tables([t for t in tables if len(t)]).combine_chunks()


def sql_docstore_sha() -> str:
    return "SELECT doc_id, sha256(text) AS sha_hex FROM documents"


def q_bm25(sf_dir: str, query: str, wand: bool = False) -> pa.Table:
    """All docs scoring > min_score for the query (top_k unbounded so the
    result is a SET — order-insensitive vs the SQL oracle).
    ``wand=True`` routes through the block-max WAND scorer — same
    oracle, certifying its bit-exactness at the driver gate."""
    from searchengine_ray.query import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx, CFG, QCFG)
    res = eng.search_wand(query, top_k=1 << 30) if wand \
        else eng.search(query, top_k=1 << 30)
    return pa.table({
        "doc_id": pa.array([_orig_id_from_title(r["title"]) for r in res],
                           type=pa.int64()),
        "score_r": pa.array([round(r["score"], 6) for r in res],
                            type=pa.float64()),
    })


def q_boolean(sf_dir: str, query: str, mode: str, exclude: str = "") -> pa.Table:
    """Boolean set retrieval (no scoring): original doc_ids whose indexed
    term set matches ``query`` under ``mode``, minus docs containing any
    ``exclude`` token. Pure postings-set arithmetic in the engine; the
    docstore is touched only to recover the original ids from titles."""
    from searchengine_ray.query import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx, CFG, QCFG)
    ids = eng.boolean_search(query, mode=mode, exclude=exclude)
    metas = eng._doc_meta(ids) if len(ids) else []
    orig = sorted(_orig_id_from_title(m["title"]) for m in metas)
    return pa.table({"doc_id": pa.array(orig, type=pa.int64())})


def sql_boolean(query: str, mode: str, exclude: str = "",
                cfg: IndexConfig = CFG) -> str:
    """Oracle for q_boolean: query analysis (tokenize + stopword/length
    filter) runs in Python via the SAME functions the engine uses; doc-side
    membership is the SQL token-list twin over all three indexed fields."""
    stem = getattr(cfg, "stemmer", "none")
    wt = getattr(cfg, "tokenizer", "split")
    toks = list(dict.fromkeys(filter_tokens(tokenize(query, stem, wt), cfg)))
    if not toks:
        return "SELECT CAST(1 AS BIGINT) AS doc_id WHERE false"
    ft = sql_filtered_tokens_expr(SQL_TITLE, cfg)
    fm = sql_filtered_tokens_expr(SQL_META, cfg)
    fc = sql_filtered_tokens_expr(SQL_CONTENT, cfg)

    def has(t: str) -> str:
        q = _sql_quote(t)
        return (f"(list_contains(ftoks, {q}) OR list_contains(mtoks, {q}) "
                f"OR list_contains(ctoks, {q}))")

    joiner = " AND " if mode == "and" else " OR "
    cond = "(" + joiner.join(has(t) for t in toks) + ")"
    ex_toks = list(dict.fromkeys(filter_tokens(tokenize(exclude, stem, wt), cfg)))
    if ex_toks:
        cond += " AND NOT (" + " OR ".join(has(t) for t in ex_toks) + ")"
    return (f"WITH docs AS (SELECT doc_id, {ft} AS ftoks, {fm} AS mtoks, "
            f"{fc} AS ctoks FROM documents)\n"
            f"SELECT doc_id FROM docs WHERE {cond}")


def q_phrase(sf_dir: str, phrase: str) -> pa.Table:
    """Serving-field phrase retrieval (QueryEngine.phrase_search):
    postings-narrowed candidates verified by the reference's substring
    phrase check over title/meta/snippet."""
    from searchengine_ray.query import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx, CFG, QCFG)
    ids = eng.phrase_search(phrase)
    metas = eng._doc_meta(ids) if len(ids) else []
    orig = sorted(_orig_id_from_title(m["title"]) for m in metas)
    return pa.table({"doc_id": pa.array(orig, type=pa.int64())})


def sql_phrase(phrase: str, cfg: IndexConfig = CFG) -> str:
    """Oracle for q_phrase: tokens-all-indexed (any field) AND the
    lowercased phrase substring-contained in title, meta or snippet."""
    stem = getattr(cfg, "stemmer", "none")
    wt = getattr(cfg, "tokenizer", "split")
    toks = list(dict.fromkeys(filter_tokens(tokenize(phrase, stem, wt), cfg)))
    needle = phrase.lower().strip()
    if not toks or not needle:
        return "SELECT CAST(1 AS BIGINT) AS doc_id WHERE false"
    ft = sql_filtered_tokens_expr(SQL_TITLE, cfg)
    fm = sql_filtered_tokens_expr(SQL_META, cfg)
    fc = sql_filtered_tokens_expr(SQL_CONTENT, cfg)

    def has(t: str) -> str:
        q = _sql_quote(t)
        return (f"(list_contains(ftoks, {q}) OR list_contains(mtoks, {q}) "
                f"OR list_contains(ctoks, {q}))")

    nq = _sql_quote(needle)
    return (
        f"WITH docs AS (SELECT doc_id,\n"
        f"  lower({SQL_TITLE}) AS title_l, lower({SQL_META}) AS meta_l,\n"
        f"  lower(CASE WHEN length(text) > 0 THEN substr(text, 1, 200) "
        f"|| '...' ELSE '' END) AS snippet_l,\n"
        f"  {ft} AS ftoks, {fm} AS mtoks, {fc} AS ctoks FROM documents)\n"
        f"SELECT doc_id FROM docs WHERE "
        + " AND ".join(has(t) for t in toks)
        + f" AND (contains(title_l, {nq}) OR contains(meta_l, {nq}) "
          f"OR contains(snippet_l, {nq}))")


def q_facets(sf_dir: str, query: str) -> pa.Table:
    """Facet counts (by source and lang) over the query's BM25 result set
    — QueryEngine.facet_counts with the adapted-schema field mapping
    (docstore repo == documents.source)."""
    from searchengine_ray.query import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx, CFG, QCFG)
    rows = eng.facet_counts(query, fields=("repo", "lang"))
    names = {"repo": "source", "lang": "lang"}
    return pa.table({
        "facet": pa.array([names[f] for f, _, _ in rows], type=pa.string()),
        "value": pa.array([v for _, v, _ in rows], type=pa.string()),
        "n": pa.array([c for _, _, c in rows], type=pa.int64()),
    })


def sql_facets(query: str, cfg: IndexConfig = CFG,
               qcfg: QueryConfig = QCFG) -> str:
    """Oracle for q_facets: hits = the sql_bm25 scored set, facets via a
    join back to the documents table."""
    ctes = _sql_bm25_ctes(query, cfg, qcfg)
    if ctes is None:
        return ("SELECT 'x' AS facet, 'x' AS value, "
                "CAST(1 AS BIGINT) AS n WHERE false")
    return (ctes + f""",
hits AS (SELECT doc_id FROM final WHERE s > {qcfg.min_score})
SELECT 'source' AS facet, source AS value, CAST(count(*) AS BIGINT) AS n
FROM hits JOIN documents USING (doc_id) GROUP BY source
UNION ALL
SELECT 'lang', lang, CAST(count(*) AS BIGINT)
FROM hits JOIN documents USING (doc_id) GROUP BY lang""")


def _sql_term_df_ctes(cfg: IndexConfig = CFG) -> str:
    """WITH-chain ending in df(term, df) — the index vocabulary with
    distinct-doc document frequency over ALL three indexed fields (the
    exact term space the segment files' (term, df) columns carry)."""
    ft = sql_filtered_tokens_expr(SQL_TITLE, cfg)
    fm = sql_filtered_tokens_expr(SQL_META, cfg)
    fc = sql_filtered_tokens_expr(SQL_CONTENT, cfg)
    return (
        f"WITH docs AS (SELECT doc_id, {ft} AS ftoks, {fm} AS mtoks, "
        f"{fc} AS ctoks FROM documents),\n"
        f"occ AS (SELECT doc_id, unnest(ftoks) AS term FROM docs\n"
        f"  UNION SELECT doc_id, unnest(mtoks) FROM docs\n"
        f"  UNION SELECT doc_id, unnest(ctoks) FROM docs),\n"
        f"df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df "
        f"FROM occ GROUP BY term)")


def q_suggest(sf_dir: str, prefix: str, k: int) -> pa.Table:
    """Prefix autocomplete over the index term dictionary."""
    from searchengine_ray.query import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx, CFG, QCFG)
    rows = eng.suggest(prefix, k)
    return pa.table({
        "term": pa.array([t for t, _ in rows], type=pa.string()),
        "df": pa.array([d for _, d in rows], type=pa.int64()),
    })


def sql_suggest(prefix: str, k: int, cfg: IndexConfig = CFG) -> str:
    return (_sql_term_df_ctes(cfg)
            + f"\nSELECT term, df FROM df "
              f"WHERE starts_with(term, {_sql_quote(prefix)}) "
              f"ORDER BY df DESC, term LIMIT {k}")


def q_fuzzy(sf_dir: str, token: str, max_dist: int) -> pa.Table:
    """Fuzzy term match (Levenshtein ≤ max_dist) over the term dictionary."""
    from searchengine_ray.query import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx, CFG, QCFG)
    rows = eng.fuzzy_terms(token, max_dist)
    return pa.table({
        "term": pa.array([t for t, _ in rows], type=pa.string()),
        "df": pa.array([d for _, d in rows], type=pa.int64()),
    })


def sql_fuzzy(token: str, max_dist: int, cfg: IndexConfig = CFG) -> str:
    return (_sql_term_df_ctes(cfg)
            + f"\nSELECT term, df FROM df "
              f"WHERE levenshtein(term, {_sql_quote(token)}) <= {max_dist}")


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_bm25(query: str, cfg: IndexConfig = CFG,
             qcfg: QueryConfig = QCFG) -> str:
    """Full BM25+boosts oracle SQL for a fixed query string (all docs with
    normalized score > min_score)."""
    ctes = _sql_bm25_ctes(query, cfg, qcfg)
    if ctes is None:
        return "SELECT 1::BIGINT AS doc_id, 1.0 AS score_r WHERE false"
    return (ctes
            + f"\nSELECT doc_id, round(s, 6) AS score_r FROM final "
              f"WHERE s > {qcfg.min_score}")


def _sql_bm25_ctes(query: str, cfg: IndexConfig = CFG,
                   qcfg: QueryConfig = QCFG) -> str | None:
    """The WITH-clause chain ending in ``final(doc_id, s)`` — s is the
    UNROUNDED max-normalized score. Shared by sql_bm25 and sql_hybrid.

    Query analysis (expansion, tokenize, stopword filter, importance) runs
    in Python via the SAME functions the engine uses; the corpus-side math
    is pure SQL in the engine's float-operation order.
    """
    filtered, original_tokens, original_query = prepare_query(query, cfg)
    if not filtered:
        return None
    # occurrence-count × importance per distinct term
    weights: dict[str, float] = {}
    for t in filtered:
        imp = qcfg.term_importance if t in set(original_tokens) else 1.0
        weights[t] = weights.get(t, 0.0) + imp
    qvals = ", ".join(f"({_sql_quote(t)}, {w!r})" for t, w in sorted(weights.items()))
    ft = sql_filtered_tokens_expr(SQL_TITLE, cfg)
    fm = sql_filtered_tokens_expr(SQL_META, cfg)
    fc = sql_filtered_tokens_expr(SQL_CONTENT, cfg)
    oq = _sql_quote(original_query)
    k = len(original_tokens)
    t_hits = " + ".join(
        f"(CASE WHEN contains(title_l, {_sql_quote(t)}) THEN 1 ELSE 0 END)"
        for t in original_tokens) or "0"
    d_hits = " + ".join(
        f"(CASE WHEN contains(meta_l, {_sql_quote(t)}) THEN 1 ELSE 0 END)"
        for t in original_tokens) or "0"
    all_in_snip = " AND ".join(
        f"contains(snippet_l, {_sql_quote(t)})" for t in original_tokens) or "false"
    k1, b = cfg.k1, cfg.b
    return f"""
WITH qterms(term, w) AS (VALUES {qvals}),
docs AS (
  SELECT doc_id,
         lower({SQL_TITLE}) AS title_l,
         lower({SQL_META}) AS meta_l,
         lower(CASE WHEN length(text) > 0 THEN substr(text, 1, 200) || '...'
                    ELSE '' END) AS snippet_l,
         {ft} AS ftoks, {fm} AS mtoks, {fc} AS ctoks
  FROM documents),
lens AS (
  SELECT doc_id, CAST(5*len(ftoks) + 3*len(mtoks) + len(ctoks) AS DOUBLE) AS dl
  FROM docs),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM lens),
occ AS (
  SELECT doc_id, unnest(ftoks) AS term, 5.0 AS w FROM docs
  UNION ALL SELECT doc_id, unnest(mtoks), 3.0 FROM docs
  UNION ALL SELECT doc_id, unnest(ctoks), 1.0 FROM docs),
tf AS (
  SELECT doc_id, term, sum(w) AS tf FROM occ
  WHERE term IN (SELECT term FROM qterms) GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
base AS (
  SELECT tf.doc_id,
         sum( greatest(0.0, ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5)))
              * (({k1} + 1) * tf.tf)
                / ({k1} * (1 - {b} + {b} * lens.dl / stats.avgdl) + tf.tf)
              * q.w ) AS score
  FROM tf
  JOIN df USING (term) JOIN lens USING (doc_id) JOIN qterms q USING (term),
  stats
  GROUP BY tf.doc_id),
boosted AS (
  SELECT base.doc_id,
         base.score
         * (CASE WHEN contains(d.title_l, {oq}) THEN 1.8
                 WHEN contains(d.meta_l, {oq}) THEN 1.5
                 WHEN contains(d.snippet_l, {oq}) THEN 1.3 ELSE 1.0 END)
         * (CASE WHEN ({t_hits}) > 0
                 THEN 1.0 + (CAST(({t_hits}) AS DOUBLE) / {k}) * 2.0
                 ELSE 1.0 END)
         * (CASE WHEN ({d_hits}) > 0
                 THEN 1.0 + (CAST(({d_hits}) AS DOUBLE) / {k}) * 1.0
                 ELSE 1.0 END)
         * (CASE WHEN {k} > 1 AND ({all_in_snip}) THEN 1.25 ELSE 1.0 END)
         AS score
  FROM base JOIN docs d USING (doc_id)),
final AS (
  SELECT doc_id, score / (SELECT max(score) FROM boosted) AS s FROM boosted)"""


def ensure_embeddings(sf_dir: str) -> str:
    import os as _os

    from searchengine_ray.pipelines.embeddings import build_doc_embeddings
    idx = ensure_index(sf_dir)
    if not _os.path.isdir(_os.path.join(idx, "embeddings")):
        build_doc_embeddings(idx)
    return idx


def q_hybrid(sf_dir: str, query: str) -> pa.Table:
    """Hybrid score for EVERY BM25-scored doc (> min_score) — unbounded k
    on both sides makes the result a set, order-insensitive vs SQL:
    hybrid = 0.7·bm25_norm + 0.3·(1/(1+L2(query, doc))) over unit vecs."""
    from searchengine_ray.query import QueryEngine
    idx = ensure_embeddings(sf_dir)
    eng = QueryEngine(idx, CFG, QCFG)
    bm25 = eng.search(query, top_k=1 << 30)
    sims = dict(eng.vector_search(query, top_k=1 << 30))
    rows_id, rows_s = [], []
    for r in bm25:
        sim = sims[r["doc_id"]]
        rows_id.append(_orig_id_from_title(r["title"]))
        rows_s.append(round(eng.HYBRID_BM25_WEIGHT * r["score"]
                            + eng.HYBRID_VEC_WEIGHT * sim, 6))
    return pa.table({
        "doc_id": pa.array(rows_id, type=pa.int64()),
        "hybrid_r": pa.array(rows_s, type=pa.float64()),
    })


def sql_hybrid(query: str, cfg: IndexConfig = CFG,
               qcfg: QueryConfig = QCFG) -> str:
    """Hybrid oracle: the shared BM25 CTE chain ⊕ an md5-bucketed
    bag-of-words embedding restated in SQL (embeddings.embed_text
    semantics; doc text = title title meta snippet per
    bert_embeddings.py:107)."""
    from searchengine_ray.pipelines.embeddings import EMBED_DIM, embed_text
    ctes = _sql_bm25_ctes(query, cfg, qcfg)
    if ctes is None:
        return "SELECT 1::BIGINT AS doc_id, 1.0 AS hybrid_r WHERE false"
    q = embed_text(query)
    nz = [(b, q[b]) for b in np.nonzero(q)[0]]
    if nz:
        qvals = ", ".join(f"({int(b)}, {w!r})" for b, w in nz)
    else:
        qvals = "(0, 0.0)"
    snippet_sql = ("CASE WHEN length(text) > 0 THEN substr(text, 1, 200) "
                   "|| '...' ELSE '' END")
    default_sim = 1.0 / (1.0 + np.sqrt(2.0))
    return ctes + f""",
qw(b, w) AS (VALUES {qvals}),
emb_text AS (
  SELECT doc_id,
         lower({SQL_TITLE} || ' ' || {SQL_TITLE} || ' ' || {SQL_META}
               || ' ' || {snippet_sql}) AS et
  FROM documents),
etok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(et), '\\s+')) AS t
  FROM emb_text WHERE trim(et) != ''),
buck AS (
  SELECT doc_id,
         (('0x' || substr(md5(t), 1, 16))::UBIGINT % {EMBED_DIM})::BIGINT AS b,
         count(*)::DOUBLE AS tf
  FROM etok GROUP BY doc_id, b),
dt AS (SELECT doc_id, sum(tf * w) AS dp FROM buck JOIN qw USING (b)
       GROUP BY doc_id),
nrm AS (SELECT doc_id, sqrt(sum(tf * tf)) AS nd FROM buck GROUP BY doc_id),
sims AS (
  SELECT nrm.doc_id,
         1.0 / (1.0 + sqrt(greatest(0.0,
               2.0 - 2.0 * (coalesce(dt.dp, 0.0) / nrm.nd)))) AS sim
  FROM nrm LEFT JOIN dt USING (doc_id))
SELECT final.doc_id,
       round(0.7 * final.s + 0.3 * coalesce(sims.sim, {default_sim!r}), 6)
         AS hybrid_r
FROM final LEFT JOIN sims USING (doc_id)
WHERE final.s > {qcfg.min_score}
"""


# ---------------------------------------------------------------------------
# analysis / dedup / similarity / multimodal oracle SQL
# ---------------------------------------------------------------------------

def sql_token_stats() -> str:
    toks = sql_tokens_expr("text")
    return (
        "SELECT doc_id, "
        "len(list_filter(regexp_split_to_array(text, '\\s+'), "
        "x -> x != ''))::BIGINT AS n_ws_tokens, "
        f"len({toks})::BIGINT AS n_tokens, "
        f"len(regexp_extract_all(text, '{analysis.BPE_PATTERN}'))::BIGINT AS n_bpe_tokens, "
        "length(text)::BIGINT AS n_chars "
        "FROM documents"
    )


def sql_quality_score() -> str:
    from searchengine_ray.config import DEFAULT_STOPWORDS
    stop = ", ".join(f"'{s}'" for s in sorted(DEFAULT_STOPWORDS))
    return f"""
WITH ws AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x != '') AS toks
  FROM documents)
SELECT doc_id,
       len(toks)::BIGINT AS n_ws_tokens,
       len(list_filter(toks, t -> t IN ({stop})))::BIGINT AS n_stopwords,
       len(list_distinct(toks))::BIGINT AS n_distinct,
       coalesce(list_sum(list_transform(toks, t -> length(t))), 0)::BIGINT
         AS sum_token_len,
       CASE WHEN len(toks) > 0
            THEN (list_sum(list_transform(toks, t -> length(t)))::BIGINT
                  * 1000000) // len(toks)
            ELSE 0 END::BIGINT AS mean_token_len_u
FROM ws
"""


def sql_lang_id() -> str:
    cases = " ".join(
        f"WHEN contains(' ' || text || ' ', ' {m} ') THEN '{lang}'"
        for m, lang in analysis.LANG_MARKERS)
    return f"SELECT doc_id, CASE {cases} ELSE 'unknown' END AS lang_pred FROM documents"


def sql_lang_confusion() -> str:
    cases = " ".join(
        f"WHEN contains(' ' || text || ' ', ' {m} ') THEN '{lang}'"
        for m, lang in analysis.LANG_MARKERS)
    return (f"SELECT lang AS lang_actual, "
            f"CASE {cases} ELSE 'unknown' END AS lang_pred, "
            f"CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2")


def sql_snippets() -> str:
    return ("SELECT doc_id, CASE WHEN length(text) > 0 THEN "
            "substr(text, 1, 200) || '...' ELSE '' END AS snippet FROM documents")


def sql_term_df() -> str:
    toks = sql_filtered_tokens_expr("text", CFG)
    return (
        "SELECT term, count(*)::BIGINT AS df FROM ("
        f"SELECT DISTINCT doc_id, unnest({toks}) AS term FROM documents"
        ") GROUP BY term"
    )


def sql_top_sources() -> str:
    return "SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source"


def sql_pii_redact() -> str:
    """Sequential redaction restated as chained CTEs — counts are taken on
    the progressively-redacted text exactly as the Ray pass does; both
    sides run the SAME RE2 patterns."""
    from searchengine_ray.pipelines.analysis import PII_PATTERNS
    parts = ["WITH r0 AS (SELECT doc_id, text AS t FROM documents)"]
    cols = []
    prev = "r0"
    for i, (name, pat, token) in enumerate(PII_PATTERNS, start=1):
        carry = ", ".join(f"n_{n}" for n, _, _ in PII_PATTERNS[:i - 1])
        carry = (carry + ", ") if carry else ""
        parts.append(
            f", r{i} AS (SELECT doc_id, {carry}"
            f"len(regexp_extract_all(t, '{pat}'))::BIGINT AS n_{name}, "
            f"regexp_replace(t, '{pat}', '{token}', 'g') AS t "
            f"FROM {prev})")
        prev = f"r{i}"
        cols.append(f"n_{name}")
    parts.append(f" SELECT doc_id, {', '.join(cols)}, t AS redacted "
                 f"FROM {prev}")
    return "".join(parts)


def sql_repetition_stats(top_n: int = 2, dup_n: int = 5) -> str:
    def gram_cte(n: int, name: str) -> str:
        return f"""
{name} AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(L) - {n} + 2, 1)),
                               i -> array_to_string(L[i:i+{n - 1}], ' ')))
           AS g
  FROM toks)"""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x != '') AS L
  FROM documents),{gram_cte(top_n, "g2")},{gram_cte(dup_n, "g5")},
c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
a2 AS (SELECT doc_id, sum(c)::BIGINT AS n2, max(c)::BIGINT AS top2
       FROM c2 GROUP BY doc_id),
c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g),
a5 AS (SELECT doc_id, sum(c)::BIGINT AS n5, count(*)::BIGINT AS d5
       FROM c5 GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a2.n2, 0)::BIGINT AS n_2grams,
       coalesce(a2.top2, 0)::BIGINT AS top_2gram_count,
       (CASE WHEN coalesce(a2.n2, 0) > 0
             THEN (a2.top2 * 1000000) // a2.n2 ELSE 0 END)::BIGINT
         AS top_2gram_frac_u,
       coalesce(a5.n5, 0)::BIGINT AS n_5grams,
       (CASE WHEN coalesce(a5.n5, 0) > 0
             THEN ((a5.n5 - a5.d5) * 1000000) // a5.n5 ELSE 0 END)::BIGINT
         AS dup_5gram_frac_u
FROM documents d
LEFT JOIN a2 ON a2.doc_id = d.doc_id
LEFT JOIN a5 ON a5.doc_id = d.doc_id
"""


def sql_exact_dedup() -> str:
    return ("SELECT sha256(text) AS content_sha, min(doc_id)::BIGINT AS keeper_id, "
            "count(*)::BIGINT AS n_copies FROM documents GROUP BY sha256(text)")


def sql_dedup_keep() -> str:
    return ("SELECT doc_id, (CASE WHEN doc_id = min(doc_id) OVER "
            "(PARTITION BY sha256(text)) THEN 1 ELSE 0 END)::BIGINT AS keep "
            "FROM documents")


def sql_quality_filter(min_ws_tokens: int = 10,
                       max_stop_ratio_u: int = 500_000,
                       min_distinct_ratio_u: int = 300_000) -> str:
    from searchengine_ray.config import DEFAULT_STOPWORDS
    stop = ", ".join(f"'{s}'" for s in sorted(DEFAULT_STOPWORDS))
    return f"""
WITH ws AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x != '') AS toks
  FROM documents),
m AS (
  SELECT doc_id, len(toks)::BIGINT AS n_ws,
         len(list_filter(toks, t -> t IN ({stop})))::BIGINT AS n_stop,
         len(list_distinct(toks))::BIGINT AS n_dist
  FROM ws)
SELECT doc_id,
       (CASE WHEN n_ws >= {min_ws_tokens}
              AND (n_stop * 1000000) // greatest(n_ws, 1) <= {max_stop_ratio_u}
              AND (n_dist * 1000000) // greatest(n_ws, 1) >= {min_distinct_ratio_u}
             THEN 1 ELSE 0 END)::BIGINT AS keep
FROM m
"""


def sql_ngram_jaccard(n: int = 3, tau_u: int = 100_000, max_df: int = 200) -> str:
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
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
keep AS (SELECT shingle FROM sh GROUP BY shingle
         HAVING count(*) BETWEEN 2 AND {max_df}),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS inter
  FROM sh a JOIN sh b USING (shingle) JOIN keep USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id),
j AS (
  SELECT a_id, b_id, inter, (sa.sz + sb.sz - inter)::BIGINT AS uni
  FROM pairs JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id)
SELECT a_id::BIGINT AS a_id, b_id::BIGINT AS b_id, inter, uni,
       ((inter * {dedup.JACCARD_SCALE}) // uni)::BIGINT AS jaccard_u
FROM j WHERE (inter * {dedup.JACCARD_SCALE}) // uni >= {tau_u}
"""


def _sql_minhash_prefix(n: int, num_perm: int, bands: int, seed: int,
                        max_bucket: int) -> str:
    """Shared CTE chain (perms → … → est) of the m31 MinHash+LSH
    restatement — the prefix of sql_minhash_lsh and sql_lsh_verified."""
    from searchengine_ray.pipelines.dedup import (MERSENNE31,
                                                  _minhash_params_m31)
    a, b = _minhash_params_m31(num_perm, seed)
    perms = ", ".join(f"({j}, {int(a[j])}, {int(b[j])})"
                      for j in range(num_perm))
    r = num_perm // bands
    toks = sql_tokens_expr("text")
    return f"""
WITH perms(j, a, b) AS (VALUES {perms}),
toklists AS (SELECT doc_id, {toks} AS L FROM documents),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(L) - {n} + 2, 1)),
                                 i -> array_to_string(L[i:i+{n - 1}], ' ')))
           AS shingle
    FROM toklists)),
xs AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % {MERSENNE31} AS x
  FROM sh),
mins AS (
  SELECT d.doc_id, p.j,
         coalesce(min((p.a * xs.x + p.b) % {MERSENNE31}),
                  {MERSENNE31}) AS m
  FROM documents d CROSS JOIN perms p LEFT JOIN xs ON xs.doc_id = d.doc_id
  GROUP BY d.doc_id, p.j),
bandv AS (
  SELECT doc_id, j // {r} AS band, list(m ORDER BY j) AS bv
  FROM mins GROUP BY doc_id, j // {r}),
bucket_sizes AS (
  SELECT band, bv, count(*) AS c FROM bandv GROUP BY band, bv),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bandv a
  JOIN bandv b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
  JOIN bucket_sizes s ON s.band = a.band AND s.bv = a.bv
  WHERE s.c BETWEEN 2 AND {max_bucket}),
est AS (
  SELECT c.a_id, c.b_id,
         sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END)::BIGINT AS est_matches
  FROM cand c
  JOIN mins ma ON ma.doc_id = c.a_id
  JOIN mins mb ON mb.doc_id = c.b_id AND mb.j = ma.j
  GROUP BY c.a_id, c.b_id)"""


def sql_minhash_lsh(n: int = 3, num_perm: int = 64, bands: int = 16,
                    tau: float = 0.5, seed: int = 42,
                    max_bucket: int = 500) -> str:
    """Exact SQL restatement of the m31 MinHash+LSH pipeline: md5-32
    shingle hashes, (a·x+b) mod 2^31−1 perms (all arithmetic < 2^62 —
    exact in BIGINT), banded buckets via list-equality self-join with the
    same bucket-size cap, signature-estimate filter."""
    min_matches = int(np.ceil(tau * num_perm))
    prefix = _sql_minhash_prefix(n, num_perm, bands, seed, max_bucket)
    return f"""{prefix}
SELECT a_id::BIGINT AS a_id, b_id::BIGINT AS b_id, est_matches
FROM est WHERE est_matches >= {min_matches}
"""


def sql_lsh_verified(n: int = 3, num_perm: int = 64, bands: int = 16,
                     tau: float = 0.5, seed: int = 42,
                     max_bucket: int = 500, tau_u: int = 500_000) -> str:
    """Exact twin of dedup.lsh_verified_pairs: the LSH candidate CTEs
    composed with exact shingle-set intersection/union and the
    integer-Jaccard threshold."""
    min_matches = int(np.ceil(tau * num_perm))
    prefix = _sql_minhash_prefix(n, num_perm, bands, seed, max_bucket)
    return f"""{prefix},
ver AS (
  SELECT e.a_id, e.b_id, count(*)::BIGINT AS inter
  FROM est e
  JOIN sh sa ON sa.doc_id = e.a_id
  JOIN sh sb ON sb.doc_id = e.b_id AND sb.shingle = sa.shingle
  WHERE e.est_matches >= {min_matches}
  GROUP BY e.a_id, e.b_id),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
vj AS (
  SELECT a_id, b_id, inter, (sa.sz + sb.sz - inter)::BIGINT AS uni
  FROM ver JOIN sizes sa ON sa.doc_id = a_id
           JOIN sizes sb ON sb.doc_id = b_id)
SELECT a_id::BIGINT AS a_id, b_id::BIGINT AS b_id, inter, uni,
       ((inter * {dedup.JACCARD_SCALE}) // uni)::BIGINT AS jaccard_u
FROM vj WHERE (inter * {dedup.JACCARD_SCALE}) // uni >= {tau_u}
"""


def sql_minhash_components() -> str:
    """Connected components of the m31 MinHash-LSH near-dup graph via a
    RECURSIVE CTE: reach(node, lbl) closes over the edge set, so
    min(lbl) per node = the minimum doc_id reachable = the component
    representative — exactly the fixpoint of graph.connected_components'
    min-label propagation."""
    return f"""
WITH RECURSIVE pairs AS ({sql_minhash_lsh()}),
edges AS (SELECT a_id AS a, b_id AS b FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node::BIGINT AS doc_id, min(lbl)::BIGINT AS component_id
FROM reach GROUP BY node
"""


def q_dedup_incremental(sf_dir: str) -> "ray.data.Dataset":
    """Incremental-ingest dedup over a deterministic parity split of the
    documents table: odd doc_ids play the NEW batch, even ids the
    existing corpus — dedup.incremental_neardup emits only the
    new × corpus cross pairs."""
    docs = _docs(sf_dir)

    def half(parity: int):
        def fn(b: pa.Table) -> pa.Table:
            ids = pc.cast(b["doc_id"], pa.int64())
            mask = pc.equal(
                pc.bit_wise_and(ids, pa.scalar(1, type=pa.int64())),
                pa.scalar(parity, type=pa.int64()))
            return b.filter(mask)
        return docs.map_batches(fn, batch_format="pyarrow")

    return dedup.incremental_neardup(half(1), half(0), family="m31")


def sql_dedup_incremental(n: int = 3, num_perm: int = 64,
                          bands: int = 16, tau: float = 0.5,
                          seed: int = 42, max_bucket: int = 500) -> str:
    """Oracle for q_dedup_incremental: the full-pair LSH prefix (both
    sides live in the same bucket population, so the cap semantics
    coincide) filtered to cross-parity pairs, oriented (new, corpus)."""
    min_matches = int(np.ceil(tau * num_perm))
    prefix = _sql_minhash_prefix(n, num_perm, bands, seed, max_bucket)
    return f"""{prefix}
SELECT CASE WHEN a_id % 2 = 1 THEN a_id ELSE b_id END::BIGINT AS new_id,
       CASE WHEN a_id % 2 = 1 THEN b_id ELSE a_id END::BIGINT
         AS corpus_id,
       est_matches
FROM est WHERE est_matches >= {min_matches}
  AND (a_id % 2) <> (b_id % 2)
"""


def sql_leakage_safe_split() -> str:
    """Oracle for dedup.leakage_safe_split: components oracle + the
    train_split md5-fence CASE keyed by component_id."""
    from searchengine_ray.pipelines.analysis import (_SPLIT_TRAIN_HI,
                                                     _SPLIT_VAL_HI)
    h = "('0x' || substr(md5(component_id::VARCHAR), 1, 8))::BIGINT"
    return f"""
WITH comp AS ({sql_minhash_components()})
SELECT doc_id, CASE WHEN {h} < {_SPLIT_TRAIN_HI} THEN 'train'
                    WHEN {h} < {_SPLIT_VAL_HI} THEN 'val'
                    ELSE 'test' END AS split
FROM comp
"""


def sql_cluster_keep() -> str:
    """Oracle for dedup.neardup_cluster_keep: components oracle (itself a
    WITH RECURSIVE restatement of the LSH pair graph closure) + a
    (length DESC, doc_id ASC) window pick per component."""
    return f"""
WITH comp AS ({sql_minhash_components()})
SELECT c.doc_id,
       (row_number() OVER (PARTITION BY c.component_id
                           ORDER BY length(d.text) DESC, c.doc_id) = 1)
         AS keep
FROM comp c JOIN documents d USING (doc_id)"""


def sql_pagerank() -> str:
    """Exact twin of graph.pagerank_int over the m31 LSH pair graph:
    integer contributions (r // deg) and integer damping make every sum
    order-insensitive, so the fixed 3-iteration unrolling is a plain CTE
    chain — no float summation-order hazard."""
    from searchengine_ray.pipelines.graph import (PR_DAMP_NUM, PR_ITERS,
                                                  PR_SCALE)
    base = (100 - PR_DAMP_NUM) * PR_SCALE // 100
    body = (f"WITH pairs AS ({sql_minhash_lsh()}),\n"
            f"edges AS (SELECT a_id AS src, b_id AS dst FROM pairs\n"
            f"          UNION ALL SELECT b_id, a_id FROM pairs),\n"
            f"deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg "
            f"FROM edges GROUP BY src),\n"
            f"r0 AS (SELECT doc_id AS node, CAST({PR_SCALE} AS BIGINT) AS r "
            f"FROM documents)")
    prev = "r0"
    for t in range(1, PR_ITERS + 1):
        body += (f",\ns{t} AS (SELECT e.dst AS node, "
                 f"sum({prev}.r // deg.deg) AS c\n"
                 f"  FROM edges e JOIN {prev} ON {prev}.node = e.src "
                 f"JOIN deg ON deg.src = e.src GROUP BY e.dst),\n"
                 f"r{t} AS (SELECT n.node, "
                 f"CAST({base} + ({PR_DAMP_NUM} * coalesce(s.c, 0)) // 100 "
                 f"AS BIGINT) AS r\n"
                 f"  FROM (SELECT node FROM r0) n "
                 f"LEFT JOIN s{t} s ON s.node = n.node)")
        prev = f"r{t}"
    return body + f"\nSELECT node AS doc_id, r AS rank_u FROM {prev}"


def sql_simhash(cfg: IndexConfig = CFG) -> str:
    toks = sql_filtered_tokens_expr("text", cfg)
    chunk_cols = ", ".join(
        f"coalesce(sum(CASE WHEN j >= {16 * c} AND j < {16 * (c + 1)} AND s > 0 "
        f"THEN (1::BIGINT << (j - {16 * c})) ELSE 0 END), 0)::BIGINT AS sh{c}"
        for c in range(4))
    return f"""
WITH tok AS (
  SELECT doc_id, t, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, unnest({toks}) AS t FROM documents)
  GROUP BY doc_id, t),
h AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS hv, tf FROM tok),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (hv >> j) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM h, (SELECT unnest(range(0, 64)) AS j)
  GROUP BY doc_id, j)
SELECT d.doc_id, {chunk_cols}
FROM documents d LEFT JOIN bits ON bits.doc_id = d.doc_id
GROUP BY d.doc_id
"""


def sql_simhash_neardup(max_hamming: int = 3,
                        cfg: IndexConfig = CFG) -> str:
    """All doc pairs with SimHash hamming ≤ max_hamming — exactly what the
    banded Ray operator emits (4×16-bit banding is complete for ≤ 3)."""
    return f"""
WITH sigs AS (
  SELECT doc_id,
         (sh0::UBIGINT + sh1::UBIGINT * 65536::UBIGINT
          + sh2::UBIGINT * 4294967296::UBIGINT
          + sh3::UBIGINT * 281474976710656::UBIGINT) AS sig
  FROM ({sql_simhash(cfg)}))
SELECT a.doc_id::BIGINT AS a_id, b.doc_id::BIGINT AS b_id,
       bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
"""


def sql_fingerprint(k: int = 5, window: int = 4) -> str:
    """Winnowing oracle: md5-64 shingle hashes, rolling-window minima over
    full windows (single global min when n_shingles ≤ window — matches the
    numpy path's boundary exactly)."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x != '') AS L
  FROM documents),
hl AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(L) - {k} + 2, 1)),
                        i -> ('0x' || substr(md5(array_to_string(
                              L[i:i+{k - 1}], ' ')), 1, 16))::UBIGINT)
         AS hlist
  FROM toks),
base AS (SELECT doc_id, len(hlist) AS n_sh, hlist FROM hl),
pos AS (SELECT doc_id, n_sh, unnest(hlist) AS h,
               generate_subscripts(hlist, 1) AS i
        FROM base),
wins AS (
  SELECT doc_id, n_sh, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
         AS wmin
  FROM pos),
fps AS (
  SELECT doc_id, wmin FROM wins
  WHERE n_sh > {window} AND i <= n_sh - {window} + 1
  UNION ALL
  SELECT doc_id, min(h) AS wmin FROM pos
  WHERE n_sh BETWEEN 1 AND {window} GROUP BY doc_id),
agg AS (
  SELECT doc_id, count(DISTINCT wmin) AS nf, min(wmin) AS mn, max(wmin) AS mx
  FROM fps GROUP BY doc_id)
SELECT b.doc_id, b.n_sh::BIGINT AS n_shingles,
       coalesce(a.nf, 0)::BIGINT AS n_fingerprints,
       coalesce(a.mn, 0)::UBIGINT AS min_fp,
       coalesce(a.mx, 0)::UBIGINT AS max_fp
FROM base b LEFT JOIN agg a USING (doc_id)
"""


def sql_embedding_neardup(tau: float = 0.3) -> str:
    return f"""
SELECT a.vec_id::BIGINT AS a_id, b.vec_id::BIGINT AS b_id,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS cos_r
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]), 6) >= {tau}
"""


def sql_ann_topk(query_ids: list[int], k: int) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id::BIGINT AS query_id, e.vec_id::BIGINT AS vec_id,
         list_cosine_similarity(q.embedding::DOUBLE[],
                                e.embedding::DOUBLE[]) AS cos
  FROM q CROSS JOIN embeddings e),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id) AS rn
  FROM scored)
SELECT query_id, vec_id, round(cos, 6) AS cos_r FROM ranked WHERE rn <= {k}
"""


def sql_ann_int8_topk(query_ids: list[int], k: int) -> str:
    """Exact twin of similarity.int8_topk: per-vector max-abs int8 codes
    via floor(127·x/m + 0.5) (round-half-up — identical in numpy and
    DuckDB, unlike round()), exact integer dots/norms, one final float
    division in the engine's operation order."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings),
mx AS (SELECT vec_id, max(abs(val)) AS m FROM ev GROUP BY vec_id),
qv AS (SELECT ev.vec_id, ev.d,
              CAST(floor(127 * ev.val / mx.m + 0.5) AS BIGINT) AS q
       FROM ev JOIN mx USING (vec_id)),
n2 AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2 FROM qv
       GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
         CAST(sum(a.q * b.q) AS BIGINT) AS dp
  FROM qv a JOIN qv b USING (d)
  WHERE a.vec_id IN ({ids})
  GROUP BY a.vec_id, b.vec_id),
scored AS (
  SELECT query_id::BIGINT AS query_id, dots.vec_id::BIGINT AS vec_id,
         CAST(dp AS DOUBLE)
           / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
           AS cos
  FROM dots
  JOIN n2 na ON na.vec_id = dots.query_id
  JOIN n2 nb ON nb.vec_id = dots.vec_id),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id) AS rn
  FROM scored)
SELECT query_id, vec_id, round(cos, 6) AS cos_r FROM ranked WHERE rn <= {k}
"""


def _sql_unit_vectors() -> str:
    """Shared CTE text: embeddings unnested to (vec_id, d, u) unit-vector
    coordinates. Norms differ from numpy at ~1e-16 (summation order); every
    downstream decision uses round(·, 6), which absorbs that."""
    return """
ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         unnest(embedding)::DOUBLE AS val
  FROM embeddings),
nrm AS (SELECT vec_id, sqrt(sum(val * val)) AS nv FROM ev GROUP BY vec_id),
uv AS (SELECT ev.vec_id, ev.d, ev.val / nrm.nv AS u
       FROM ev JOIN nrm ON nrm.vec_id = ev.vec_id)"""


def sql_ann_lsh_topk(query_ids: list[int], k: int, num_planes: int = 8,
                     num_tables: int = 8, seed: int = 42,
                     dim: int = 64) -> str:
    """Exact SQL restatement of similarity.lsh_topk: the seeded SRP planes
    are injected as constants (data-independent; float64 repr round-trips
    exactly through DuckDB), sign bits come from round(projection, 6) > 0
    and ranking from (round(cos, 6) DESC, vec_id) — the same rounded-
    arithmetic discipline the Ray side uses, so buckets, candidate sets
    and top-k are bit-identical across engines."""
    from searchengine_ray.pipelines.similarity import srp_planes
    planes = srp_planes(num_tables, num_planes, dim, seed)
    vals = ", ".join(
        f"({t}, {p}, {d}, {planes[t, p, d]!r})"
        for t in range(num_tables) for p in range(num_planes)
        for d in range(dim))
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH planes(t, p, d, w) AS (VALUES {vals}),
{_sql_unit_vectors()},
proj AS (
  SELECT uv.vec_id, pl.t, pl.p, round(sum(uv.u * pl.w), 6) AS pr
  FROM uv JOIN planes pl ON pl.d = uv.d
  GROUP BY uv.vec_id, pl.t, pl.p),
codes AS (
  SELECT vec_id, t,
         sum(CASE WHEN pr > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT
           AS code
  FROM proj GROUP BY vec_id, t),
cand AS (
  SELECT DISTINCT qc.vec_id AS query_id, vc.vec_id AS vec_id
  FROM codes qc JOIN codes vc ON qc.t = vc.t AND qc.code = vc.code
  WHERE qc.vec_id IN ({ids})),
scored AS (
  SELECT c.query_id, c.vec_id, round(sum(uq.u * ud.u), 6) AS cos_r
  FROM cand c
  JOIN uv uq ON uq.vec_id = c.query_id
  JOIN uv ud ON ud.vec_id = c.vec_id AND ud.d = uq.d
  GROUP BY c.query_id, c.vec_id),
ranked AS (
  SELECT query_id, vec_id, cos_r,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_r DESC, vec_id) AS rn
  FROM scored)
SELECT query_id::BIGINT AS query_id, vec_id::BIGINT AS vec_id, cos_r
FROM ranked WHERE rn <= {k}
"""


def sql_embedding_neardup_lsh(tau: float = 0.3, num_planes: int = 6,
                              num_tables: int = 24, seed: int = 42,
                              max_bucket: int = 2000, dim: int = 64) -> str:
    """Exact SQL restatement of similarity.embedding_neardup_lsh: SRP
    planes as constants, rounded-projection sign bits, candidates = pairs
    sharing a (table, code) bucket of size ≤ max_bucket, exact rounded
    cosine ≥ tau. The LSH output itself (not just the exact verifier) is
    oracle-checked — same trick as the MinHash m31 family."""
    from searchengine_ray.pipelines.similarity import srp_planes
    planes = srp_planes(num_tables, num_planes, dim, seed)
    vals = ", ".join(
        f"({t}, {p}, {d}, {planes[t, p, d]!r})"
        for t in range(num_tables) for p in range(num_planes)
        for d in range(dim))
    return f"""
WITH planes(t, p, d, w) AS (VALUES {vals}),
{_sql_unit_vectors()},
proj AS (
  SELECT uv.vec_id, pl.t, pl.p, round(sum(uv.u * pl.w), 6) AS pr
  FROM uv JOIN planes pl ON pl.d = uv.d
  GROUP BY uv.vec_id, pl.t, pl.p),
codes AS (
  SELECT vec_id, t,
         sum(CASE WHEN pr > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT
           AS code
  FROM proj GROUP BY vec_id, t),
bucket_sizes AS (
  SELECT t, code, count(*) AS c FROM codes GROUP BY t, code),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM codes a
  JOIN codes b ON a.t = b.t AND a.code = b.code AND a.vec_id < b.vec_id
  JOIN bucket_sizes s ON s.t = a.t AND s.code = a.code
  WHERE s.c BETWEEN 2 AND {max_bucket}),
scored AS (
  SELECT c.a_id, c.b_id, round(sum(ua.u * ub.u), 6) AS cos_r
  FROM cand c
  JOIN uv ua ON ua.vec_id = c.a_id
  JOIN uv ub ON ub.vec_id = c.b_id AND ub.d = ua.d
  GROUP BY c.a_id, c.b_id)
SELECT a_id::BIGINT AS a_id, b_id::BIGINT AS b_id, cos_r
FROM scored WHERE cos_r >= {tau}
"""


def _sql_kmeans_assign(n_centroids: int = 16, sample_rows: int = 512,
                       lloyd_iters: int = 2) -> str:
    """Shared CTE chain: unit vectors + the UNROLLED deterministic k-means
    (similarity.train_centroids — id-prefix sample, stride-seeded
    centroids, round(·, 6) after every update) ending in ``alldots``
    (every vector's rounded dot against every final centroid) and
    ``assign`` (nearest centroid, ties → lowest index). Consumed by the
    IVF and semantic-dedup oracles."""
    # initial centroids: every stride-th sample row (by vec_id order)
    parts = [f"""
WITH {_sql_unit_vectors()},
samp AS (SELECT vec_id FROM embeddings
         ORDER BY vec_id LIMIT {sample_rows}),
stride AS (
  SELECT greatest((SELECT count(*) FROM samp) // {n_centroids}, 1) AS s),
sidx AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS rn
         FROM samp),
c0 AS (
  SELECT (sidx.rn // stride.s)::BIGINT AS j, uv.d, round(uv.u, 6) AS c
  FROM sidx CROSS JOIN stride
  JOIN uv ON uv.vec_id = sidx.vec_id
  WHERE sidx.rn % stride.s = 0 AND sidx.rn // stride.s < {n_centroids})"""]
    for i in range(lloyd_iters):
        parts.append(f""",
d{i} AS (
  SELECT uv.vec_id, c.j, round(sum(uv.u * c.c), 6) AS dot
  FROM uv JOIN c{i} c ON c.d = uv.d
  WHERE uv.vec_id IN (SELECT vec_id FROM samp)
  GROUP BY uv.vec_id, c.j),
a{i} AS (
  SELECT vec_id, j FROM (
    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dot DESC, j) AS rnk
    FROM d{i}) WHERE rnk = 1),
m{i} AS (
  SELECT a.j, uv.d, round(avg(uv.u), 6) AS m
  FROM a{i} a JOIN uv ON uv.vec_id = a.vec_id
  GROUP BY a.j, uv.d),
mf{i} AS (
  SELECT c.j, c.d, coalesce(m.m, c.c) AS m
  FROM c{i} c LEFT JOIN m{i} m ON m.j = c.j AND m.d = c.d),
c{i + 1} AS (
  SELECT j, d, round(m / nr, 6) AS c FROM (
    SELECT j, d, m, sqrt(sum(m * m) OVER (PARTITION BY j)) AS nr
    FROM mf{i}))""")
    cf = f"c{lloyd_iters}"
    parts.append(f""",
alldots AS (
  SELECT uv.vec_id, c.j, round(sum(uv.u * c.c), 6) AS dot
  FROM uv JOIN {cf} c ON c.d = uv.d
  GROUP BY uv.vec_id, c.j),
assign AS (
  SELECT vec_id, j FROM (
    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dot DESC, j) AS rnk
    FROM alldots) WHERE rnk = 1)""")
    return "".join(parts)


def sql_ann_ivf_topk(query_ids: list[int], k: int, n_centroids: int = 16,
                     n_probe: int = 4, sample_rows: int = 512,
                     lloyd_iters: int = 2) -> str:
    """Exact SQL restatement of similarity.ivf_topk INCLUDING the k-means
    training (similarity.train_centroids): id-prefix sample, stride-seeded
    centroids, unrolled Lloyd iterations. Centroid coordinates are
    round(·, 6) after every update and every assignment/probe/rank compares
    round(dot, 6) (ties → lowest centroid index / vec_id), so the trained
    centroids and the final top-k are bit-identical to the numpy path."""
    ids = ", ".join(str(i) for i in query_ids)
    return _sql_kmeans_assign(n_centroids, sample_rows, lloyd_iters) + f""",
qprobe AS (
  SELECT vec_id AS query_id, j FROM (
    SELECT vec_id, j, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dot DESC, j) AS rnk
    FROM alldots WHERE vec_id IN ({ids})) WHERE rnk <= {n_probe}),
cand AS (
  SELECT q.query_id, a.vec_id FROM qprobe q JOIN assign a ON a.j = q.j),
scored AS (
  SELECT c.query_id, c.vec_id, round(sum(uq.u * ud.u), 6) AS cos_r
  FROM cand c
  JOIN uv uq ON uq.vec_id = c.query_id
  JOIN uv ud ON ud.vec_id = c.vec_id AND ud.d = uq.d
  GROUP BY c.query_id, c.vec_id),
ranked AS (
  SELECT query_id, vec_id, cos_r,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_r DESC, vec_id) AS rn
  FROM scored)
SELECT query_id::BIGINT AS query_id, vec_id::BIGINT AS vec_id, cos_r
FROM ranked WHERE rn <= {k}
"""


def sql_semantic_dedup(tau: float, n_centroids: int = 16,
                       sample_rows: int = 512,
                       lloyd_iters: int = 2) -> str:
    """Exact SQL restatement of similarity.semantic_dedup: the shared
    unrolled k-means assignment, then within each cluster a vector is
    dropped iff some LOWER vec_id in the same cluster has
    round(cos, 6) ≥ tau."""
    return _sql_kmeans_assign(n_centroids, sample_rows, lloyd_iters) + f""",
pairs AS (
  SELECT a.vec_id AS hi_id, round(sum(ua.u * ub.u), 6) AS cos_r
  FROM assign a
  JOIN assign b ON b.j = a.j AND b.vec_id < a.vec_id
  JOIN uv ua ON ua.vec_id = a.vec_id
  JOIN uv ub ON ub.vec_id = b.vec_id AND ub.d = ua.d
  GROUP BY a.vec_id, b.vec_id),
dups AS (SELECT DISTINCT hi_id FROM pairs WHERE cos_r >= {tau})
SELECT a.vec_id::BIGINT AS vec_id, a.j::BIGINT AS cluster,
       a.vec_id NOT IN (SELECT hi_id FROM dups) AS keep
FROM assign a
"""


def sql_cluster_cap_sample(cap: int, n_centroids: int = 16,
                           sample_rows: int = 512,
                           lloyd_iters: int = 2) -> str:
    """Exact twin of similarity.cluster_cap_sample: the shared unrolled
    k-means assignment, then keep = (rank by vec_id within cluster) ≤
    cap."""
    return _sql_kmeans_assign(n_centroids, sample_rows, lloyd_iters) + f"""
SELECT vec_id::BIGINT AS vec_id, j::BIGINT AS cluster,
       (row_number() OVER (PARTITION BY j ORDER BY vec_id)
        <= {cap}) AS keep
FROM assign
"""


def q_doc_embedding_join(sf_dir: str):
    """Generic distributed hash equi-join (pipelines/join.py): documents
    ⋈ embeddings on doc_id = vec_id; payload = lang + the first
    embedding coordinate (round 6 — float32→float64 is exact, so both
    engines round the same double)."""
    from searchengine_ray.pipelines.join import equi_join
    from searchengine_ray.pipelines.similarity import _emb_matrix

    def prep(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, "embedding")
        return pa.table({
            "vec_id": pc.cast(batch["vec_id"], pa.int64()),
            "e0_r": pa.array(np.round(m[:, 0], 6)
                             if m.size else np.empty(0)),
        })

    docs = _docs(sf_dir, ["doc_id", "lang"])
    embs = _embs(sf_dir).map_batches(prep, batch_format="pyarrow")
    return equi_join(docs, embs, "doc_id", "vec_id", ["lang"], ["e0_r"])


def sql_doc_embedding_join() -> str:
    return (
        "SELECT d.doc_id AS key, d.lang, "
        "round(CAST(list_extract(e.embedding, 1) AS DOUBLE), 6) AS e0_r "
        "FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id"
    )


def _join_sides(sf_dir: str):
    """Sides for the left/semi/anti entries: the right side keeps only
    EVEN vec_ids, so every mode is exercised non-trivially at every SF
    (left has real unmatched rows, anti/semi are both non-empty)."""
    from searchengine_ray.pipelines.similarity import _emb_matrix

    def prep(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, "embedding")
        vid = pc.cast(batch["vec_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({
            "vec_id": pa.array(vid),
            "e0_r": pa.array(np.round(m[:, 0], 6)
                             if m.size else np.empty(0)),
        })
        return t.filter(pa.array(vid % 2 == 0))

    docs = _docs(sf_dir, ["doc_id", "lang"])
    embs = _embs(sf_dir).map_batches(prep, batch_format="pyarrow")
    return docs, embs


def q_doc_embedding_left_join(sf_dir: str):
    """LEFT variant of the generic hash join; the driver entry coalesces
    the unmatched-side null to −1.0 on BOTH engines (the hash compare's
    null convention is out of our hands; tests assert the operator's own
    typed-null semantics directly)."""
    from searchengine_ray.pipelines.join import equi_join
    docs, embs = _join_sides(sf_dir)
    joined = equi_join(docs, embs, "doc_id", "vec_id", ["lang"], ["e0_r"],
                       how="left")

    def fix(b: pa.Table) -> pa.Table:
        return b.set_column(b.schema.get_field_index("e0_r"), "e0_r",
                            pc.fill_null(b["e0_r"], -1.0))

    return joined.map_batches(fix, batch_format="pyarrow")


def sql_doc_embedding_left_join() -> str:
    return (
        "SELECT d.doc_id AS key, d.lang, "
        "coalesce(round(CAST(list_extract(e.embedding, 1) AS DOUBLE), 6), "
        "-1.0) AS e0_r "
        "FROM documents d LEFT JOIN "
        "(SELECT * FROM embeddings WHERE vec_id % 2 = 0) e "
        "ON d.doc_id = e.vec_id"
    )


def q_doc_embedding_anti_join(sf_dir: str):
    """ANTI variant: documents with NO embedding row (the missing-
    dimension audit a curation pipeline runs before hybrid serving)."""
    from searchengine_ray.pipelines.join import equi_join
    docs, embs = _join_sides(sf_dir)
    return equi_join(docs, embs, "doc_id", "vec_id", ["lang"], ["e0_r"],
                     how="anti")


def sql_doc_embedding_anti_join() -> str:
    return (
        "SELECT d.doc_id AS key, d.lang FROM documents d "
        "WHERE NOT EXISTS (SELECT 1 FROM embeddings e "
        "WHERE e.vec_id = d.doc_id AND e.vec_id % 2 = 0)"
    )


def q_doc_embedding_semi_join(sf_dir: str):
    """SEMI variant: documents having ≥1 embedding row, emitted once."""
    from searchengine_ray.pipelines.join import equi_join
    docs, embs = _join_sides(sf_dir)
    return equi_join(docs, embs, "doc_id", "vec_id", ["lang"], ["e0_r"],
                     how="semi")


def sql_doc_embedding_semi_join() -> str:
    return (
        "SELECT d.doc_id AS key, d.lang FROM documents d "
        "WHERE EXISTS (SELECT 1 FROM embeddings e "
        "WHERE e.vec_id = d.doc_id AND e.vec_id % 2 = 0)"
    )


def q_events_user_join_salted(sf_dir: str):
    """Skew-safe fact⋈dimension enrichment: every event joined to its
    user's corpus-wide totals. The user keys are HOT by construction
    (few users, many events each) — detect_hot_keys finds them and
    equi_join_salted spreads each hot user's events across salts while
    replicating the one dimension row per salt. Output identical to the
    unsalted join (same SQL oracle)."""
    from searchengine_ray.pipelines.join import (detect_hot_keys,
                                                 equi_join_salted)

    ev = _events(sf_dir, ["event_id", "user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        uid = pc.cast(b["user_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        vc = np.round(b["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        u, inv = np.unique(uid, return_inverse=True)
        s = np.zeros(u.size, dtype=np.int64)
        np.add.at(s, inv, vc)
        return pa.table({"user_id": pa.array(u), "s": pa.array(s),
                         "n": pa.array(np.bincount(inv)
                                       .astype(np.int64))})

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "uid": pc.cast(b["user_id"], pa.int64()),
            "total_c": pc.cast(b["sum(s)"], pa.int64()),
            "n_events": pc.cast(b["sum(n)"], pa.int64()),
        })

    dim = (ev.map_batches(partial, batch_format="pyarrow")
             .groupby("user_id").sum(["s", "n"])
             .map_batches(fin, batch_format="pyarrow"))
    left = _events(sf_dir, ["event_id", "user_id"])
    hot = detect_hot_keys(left, "user_id", threshold=32)
    return equi_join_salted(left, dim, "user_id", "uid",
                            ["event_id"], ["total_c", "n_events"],
                            hot_keys=hot, replicate=8)


def sql_events_user_join_salted() -> str:
    return (
        "WITH d AS (SELECT user_id, "
        "CAST(sum(round(value * 100)::BIGINT) AS BIGINT) AS total_c, "
        "count(*)::BIGINT AS n_events FROM events GROUP BY user_id) "
        "SELECT e.user_id::BIGINT AS key, e.event_id::BIGINT AS event_id, "
        "d.total_c, d.n_events FROM events e JOIN d USING (user_id)"
    )


DECONTAM_BENCH_MOD = 37  # bench side = doc_id % 37 == 0 (deterministic)


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination over a deterministic train/bench split
    of the documents table (bench = doc_id % 37 == 0)."""
    docs = _docs(sf_dir)

    def split(keep_bench: bool):
        def fn(b: pa.Table) -> pa.Table:
            ids = pc.cast(b["doc_id"], pa.int64()) \
                .to_numpy(zero_copy_only=False)
            m = (ids % DECONTAM_BENCH_MOD) == 0
            return b.filter(pa.array(m if keep_bench else ~m))
        return fn

    train = docs.map_batches(split(False), batch_format="pyarrow")
    bench = docs.map_batches(split(True), batch_format="pyarrow")
    return decontam.decontaminate(train, bench)


def sql_media_decode() -> str:
    """Closed-form twin of multimodal.media_decode_stats: the synthesized
    payload CONTENT is a pure function of doc_id (multimodal.py
    _synth_audio_samples/_synth_ppm), so the REAL-decoded integer
    aggregates (sum of squared PCM samples / sum of pixel bytes — int64
    end-to-end, no float) restate exactly as series sums."""
    from searchengine_ray.pipelines.multimodal import (SYNTH_AUDIO_FRAMES,
                                                       SYNTH_IMG_H,
                                                       SYNTH_IMG_W)
    n_px = SYNTH_IMG_W * SYNTH_IMG_H * 3
    return (
        "SELECT doc_id, 'audio' AS modality, "
        f"{SYNTH_AUDIO_FRAMES}::BIGINT AS n_units, "
        "(SELECT sum(((( doc_id*31 + i*7 ) % 65536) - 32768) * "
        "(((doc_id*31 + i*7) % 65536) - 32768)) "
        f"FROM range({SYNTH_AUDIO_FRAMES}) t(i))::BIGINT AS value_sum "
        "FROM documents "
        "UNION ALL "
        f"SELECT doc_id, 'image', {n_px}::BIGINT, "
        f"(SELECT sum((doc_id + j) % 256) FROM range({n_px}) t(j))::BIGINT "
        "FROM documents"
    )


def sql_media_resize(out_w: int = 4, out_h: int = 2) -> str:
    """Closed-form twin of multimodal.media_resize_stats: the resize is
    the index gather ((r*H)//out_h, (c*W)//out_w) over the synthetic
    raster value (doc_id + (row*W + col)*3 + ch) % 256."""
    from searchengine_ray.pipelines.multimodal import SYNTH_IMG_H, SYNTH_IMG_W
    n = out_w * out_h * 3
    return (
        f"SELECT doc_id, {n}::BIGINT AS n_units, "
        f"(SELECT sum((doc_id + (((r * {SYNTH_IMG_H}) // {out_h}) * {SYNTH_IMG_W} "
        f"+ ((c * {SYNTH_IMG_W}) // {out_w})) * 3 + ch) % 256) "
        f"FROM range({out_h}) t1(r), range({out_w}) t2(c), range(3) t3(ch)"
        f")::BIGINT AS pixel_sum "
        f"FROM documents"
    )


def sql_media_frames(stride: int = 2) -> str:
    """Closed-form twin of multimodal.media_frame_stats: frames
    0, stride, 2·stride, … < (1 + doc_id % 5), each a range-sum of
    (doc_id + f·17 + j) % 256 over the 45 raster bytes."""
    from searchengine_ray.pipelines.multimodal import (SYNTH_IMG_H,
                                                       SYNTH_IMG_W,
                                                       SYNTH_VIDEO_FRAME_STEP)
    n_px = SYNTH_IMG_W * SYNTH_IMG_H * 3
    return (
        f"SELECT doc_id, f AS frame_idx, "
        f"{SYNTH_IMG_W}::BIGINT AS width, {SYNTH_IMG_H}::BIGINT AS height, "
        f"(SELECT sum((doc_id + f * {SYNTH_VIDEO_FRAME_STEP} + j) % 256) "
        f"FROM range({n_px}) t(j))::BIGINT AS pixel_sum "
        f"FROM (SELECT doc_id, unnest(range(0, 1 + doc_id % 5)) AS f "
        f"FROM documents) WHERE f % {stride} = 0"
    )


def sql_multimodal() -> str:
    checksum = " + ".join(
        f"('0x' || substr(sha256(text), {2 * j + 1}, 2))::BIGINT" for j in range(8))
    return (
        "SELECT doc_id, octet_length(encode(text))::BIGINT AS blob_len, "
        "sha256(text) AS blob_sha256, "
        f"({checksum})::BIGINT AS feat_checksum FROM documents"
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def build_queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {
        "token_stats": lambda sf: analysis.token_stats(_docs(sf)),
        # treebank-variant token counts (perturbed so the contraction
        # expansion fires; certifies the build-path treebank plumbing)
        "token_stats_treebank": lambda sf: analysis.token_count_treebank(
            _docs(sf, ["doc_id", "text"])),
        "quality_score": lambda sf: analysis.quality_score(_docs(sf)),
        "lang_id": lambda sf: analysis.lang_id(_docs(sf)),
        "snippets": lambda sf: analysis.snippets(_docs(sf)),
        "term_df": lambda sf: analysis.term_df(_docs(sf, ["text"]), CFG),
        "top_sources": lambda sf: analysis.top_sources(_docs(sf, ["source"])),
        "fingerprint": lambda sf: analysis.fingerprint(_docs(sf)),
        "repetition_stats": lambda sf: analysis.repetition_stats(_docs(sf)),
        "pii_redact": lambda sf: analysis.pii_redact(_docs(sf)),
        "dedup_exact": lambda sf: dedup.exact_dedup(_docs(sf)),
        "dedup_keep": lambda sf: dedup.dedup_keep_mask(_docs(sf)),
        "quality_filter": lambda sf: analysis.quality_filter(_docs(sf)),
        "curate": lambda sf: curate.curate(_docs(sf)),
        "dedup_ngram_jaccard": lambda sf: dedup.ngram_jaccard_pairs(_docs(sf)),
        "simhash": lambda sf: dedup.simhash(_docs(sf), CFG),
        # max_bucket effectively unbounded: 4×16-bit banding is COMPLETE for
        # hamming ≤ 3, so the result is exactly all pairs ≤ 3 — SQL-checkable
        "dedup_simhash": lambda sf: shared_simhash_pairs(sf),
        # m31 family: exactly SQL-restatable (the fast wrap64 family stays
        # the default for non-oracle use)
        "dedup_minhash_lsh": lambda sf: shared_minhash_pairs(sf),
        # the iterative-graph operator: near-dup pairs → duplicate
        # CLUSTERS (min-label propagation to fixpoint)
        "dedup_minhash_components": lambda sf: graph.connected_components(
            shared_minhash_pairs(sf),
            _docs(sf, ["doc_id"])),
        "dedup_graph_pagerank": lambda sf: graph.pagerank_int(
            shared_minhash_pairs(sf),
            _docs(sf, ["doc_id"])),
        # incremental-ingest dedup: new batch × existing corpus cross
        # pairs only (parity split plays the two sides)
        "dedup_incremental": q_dedup_incremental,
        # curation dashboard: per-source exact-dup rate (ppm, exact ints)
        "source_dup_rate": lambda sf: dedup.source_dup_rate(
            _docs(sf, ["doc_id", "text", "source"])),
        # leakage-safe split: near-dup clusters assigned to train/val/
        # test ATOMICALLY (md5 fence on the component representative)
        "docs_leakage_safe_split": lambda sf: dedup.leakage_safe_split(
            _docs(sf), pairs=shared_minhash_pairs(sf)),
        "embedding_neardup": lambda sf: similarity.embedding_neardup(_embs(sf)),
        "embedding_neardup_lsh": lambda sf: similarity.embedding_neardup_lsh(
            _embs(sf)),
        "ann_cosine_topk": lambda sf: similarity.brute_topk(
            _embs(sf), ANN_QUERY_IDS, ANN_K),
        "ann_lsh_topk": lambda sf: similarity.lsh_topk(
            _embs(sf), ANN_QUERY_IDS, ANN_K),
        "ann_ivf_topk": lambda sf: similarity.ivf_topk(
            _embs(sf), ANN_QUERY_IDS, ANN_K),
        "ann_int8_topk": lambda sf: similarity.int8_topk(
            _embs(sf), ANN_QUERY_IDS, ANN_K),
        "multimodal_features": lambda sf: multimodal.feature_summary(_docs(sf)),
        "multimodal_decode": lambda sf: multimodal.media_decode_stats(
            _docs(sf, ["doc_id"])),
        "multimodal_resize": lambda sf: multimodal.media_resize_stats(
            _docs(sf, ["doc_id"])),
        "multimodal_frames": lambda sf: multimodal.media_frame_stats(
            _docs(sf, ["doc_id"])),
        "doc_embedding_join": q_doc_embedding_join,
        "doc_embedding_left_join": q_doc_embedding_left_join,
        "doc_embedding_anti_join": q_doc_embedding_anti_join,
        "doc_embedding_semi_join": q_doc_embedding_semi_join,
        "decontaminate": q_decontaminate,
        "events_user_join_salted": q_events_user_join_salted,
        "top_ngrams": lambda sf: analysis.top_ngrams(_docs(sf, ["text"])),
        "chunk_docs": lambda sf: chunking.chunk_docs(_docs(sf)),
        "dup_spans": lambda sf: chunking.dup_spans(_docs(sf)),
        "doc_rarity": lambda sf: analysis.doc_rarity(_docs(sf), CFG),
        # join-strategy twins: the unbounded-vocabulary plan (df computed
        # inside the term shuffle, NO ray.put broadcast) against the SAME
        # SQL oracle — the driver itself certifies output identity
        "doc_rarity_joined": lambda sf: analysis.doc_rarity(
            _docs(sf), CFG, strategy="join"),
        "doc_keywords_joined": lambda sf: analysis.doc_keywords(
            _docs(sf), strategy="join"),
        "pack_token_budget": lambda sf: analysis.pack_token_budget(
            _docs(sf, ["doc_id", "text"])),
        "stratified_sample": lambda sf: analysis.stratified_sample(
            _docs(sf, ["doc_id", "lang"])),
        "mixture_sample": lambda sf: analysis.mixture_sample(
            _docs(sf, ["doc_id", "text", "source"])),
        "top_docs_per_source": lambda sf: analysis.top_docs_per_group(
            _docs(sf, ["doc_id", "text", "source"])),
        "classify_blogs": lambda sf: classify.classify(
            _docs(sf, ["doc_id", "text", "lang", "source"])),
        "events_windowed_agg": lambda sf: events.windowed_agg(
            _events(sf, ["ts", "event_type", "value"])),
        "events_sessionize": lambda sf: events.sessionize(
            _events(sf, ["user_id", "ts"])),
        "events_sessionize_salted": lambda sf: events.sessionize_salted(
            _events(sf, ["user_id", "ts"])),
        "events_streaming_window": lambda sf: events.streaming_windowed_agg(
            _events(sf, ["event_id", "event_type", "ts", "value"])),
        # skew-safe twin: small shards so the boundary-merge path is what
        # the driver actually checks
        "events_streaming_window_salted":
            lambda sf: events.streaming_windowed_agg_salted(
                _events(sf, ["event_id", "event_type", "ts", "value"]),
                shard_events=2048),
        "events_asof_join": lambda sf: events.asof_join_prior(
            _events(sf, ["event_id", "user_id", "ts", "event_type"])),
        "events_asof_join_salted": lambda sf: events.asof_join_prior_salted(
            _events(sf, ["event_id", "user_id", "ts", "event_type"])),
        "events_range_join": lambda sf: events.value_range_join(
            _events(sf, ["event_id", "value"])),
        "events_props_extract": lambda sf: events.props_extract(
            _events(sf, ["event_id", "props"])),
        "events_value_quantiles": lambda sf: events.value_quantiles(
            _events(sf, ["event_type", "user_id", "value"])),
        "events_rolling_window": lambda sf: events.rolling_user_window(
            _events(sf, ["event_id", "user_id", "ts", "value"])),
        "doc_lengths": q_doc_lengths,
        "index_stats": q_index_stats,
        "docstore_sha256": q_docstore_sha,
        "phrase_match": lambda sf: analysis.phrase_match(
            _docs(sf), "sort window", CFG),
        "phrase_serving": lambda sf: q_phrase(sf, "src7 zh"),
        "suggest_terms": lambda sf: q_suggest(sf, "s", 10),
        "fuzzy_terms": lambda sf: q_fuzzy(sf, "src0", 1),
        "events_hll_users": lambda sf: events.hll_distinct_users(
            _events(sf, ["event_type", "user_id"])),
        "facets_bm25": lambda sf: q_facets(sf, "zh dup"),
        "dedup_cluster_keep": lambda sf: dedup.neardup_cluster_keep(
            _docs(sf), pairs=shared_minhash_pairs(sf)),
        "doc_keywords": lambda sf: analysis.doc_keywords(_docs(sf)),
        "events_global_rank": lambda sf: events.global_value_rank(
            _events(sf, ["event_id", "value"])),
        # continuous-domain twin: range-bucketed distributed rank table,
        # driver sees only bucket totals — same oracle, same output
        "events_global_rank_ranged":
            lambda sf: events.global_value_rank_ranged(
                _events(sf, ["event_id", "value"])),
        "events_percent_rank": lambda sf: events.global_percent_rank(
            _events(sf, ["event_id", "value"])),
        "events_percent_rank_ranged":
            lambda sf: events.global_percent_rank_ranged(
                _events(sf, ["event_id", "value"])),
        "events_value_zscore": lambda sf: events.value_zscore(
            _events(sf, ["event_id", "event_type", "value"])),
        "weighted_sample": lambda sf: analysis.weighted_sample(_docs(sf)),
        "cap_per_source": lambda sf: analysis.cap_per_source(
            _docs(sf, ["doc_id", "source"])),
        "prepare_corpus": lambda sf: prepare.prepare_corpus(
            _docs(sf, ["doc_id", "text", "source"])),
        "events_funnel": lambda sf: events.funnel(
            _events(sf, ["user_id", "ts", "event_type"])),
        "events_retention": lambda sf: events.retention(
            _events(sf, ["user_id", "ts"])),
        "events_interarrival": lambda sf: events.interarrival(
            _events(sf, ["event_id", "user_id", "ts"])),
        "docs_rollup": lambda sf: analysis.docs_rollup(
            _docs(sf, ["text", "source", "lang"])),
        "lang_confusion": lambda sf: analysis.lang_confusion(
            _docs(sf, ["text", "lang"])),
        "term_cooccurrence": lambda sf: analysis.term_cooccurrence(
            _docs(sf, ["doc_id", "text"])),
        "term_cooccurrence_joined": lambda sf: analysis.term_cooccurrence(
            _docs(sf, ["doc_id", "text"]), strategy="join"),
        # exact twin of events_hll_users — combiner-cascade distinct
        "events_distinct_users": lambda sf: events.distinct_users_exact(
            _events(sf, ["event_type", "user_id"])),
        "events_running_total": lambda sf: events.running_total(
            _events(sf, ["event_id", "user_id", "ts", "value"])),
        "events_value_histogram": lambda sf: events.value_histogram(
            _events(sf, ["event_type", "value"])),
        # iterative distributed selection — exact twin of the quantile
        # sketch; driver sees only (type, bucket, count) digests
        "events_value_median": lambda sf: events.value_median_exact(
            _events(sf, ["event_type", "value"])),
        "docs_train_split": lambda sf: analysis.train_split(
            _docs(sf, ["doc_id"])),
        # ExactSubstr rewrite: drop globally-duplicate chunks, text
        # rides exactly one exchange (winner election is id-width)
        "dedup_chunk_rewrite": lambda sf: chunking.chunk_dedup_rewrite(
            _docs(sf)),
        # two-phase production dedup: LSH recall + exact-Jaccard verify
        "dedup_lsh_verified": lambda sf: dedup.lsh_verified_pairs(
            _docs(sf), family="m31",
            cands=shared_minhash_pairs(sf), sh=shared_shingles(sf)),
        "events_top_n": lambda sf: events.top_n_by_value(
            _events(sf, ["event_id", "value"])),
        # the selection machinery generalizes to any quantile — exact
        # p90 pairs with the p90 entry of the value_quantiles sketch
        "events_value_p90": lambda sf: events.value_quantile_exact(
            _events(sf, ["event_type", "value"]), 9, 10, "p90_c"),
        # grouped window rank (PARTITION BY type), continuous domain
        "events_type_rank": lambda sf: events.type_value_rank_ranged(
            _events(sf, ["event_id", "event_type", "value"])),
        # vector aggregate: per-label mean-embedding centroid (integer
        # partial sums — only labels × dim digests ever move)
        "embedding_centroids": lambda sf: similarity.label_centroids(
            _embs(sf, ["label", "embedding"])),
        # SemDeDup composite: deterministic k-means + within-cluster
        # lowest-id-representative near-dup drop (blocked pairwise)
        "semantic_dedup": lambda sf: similarity.semantic_dedup(_embs(sf)),
        # topic balancing: cap every k-means cluster at `cap` lowest ids
        # (SemDeDup's curation sibling; shared deterministic k-means)
        "cluster_cap_sample": lambda sf: similarity.cluster_cap_sample(
            _embs(sf), cap=32),
        # PIVOT/crosstab: event log → per-user feature matrix
        "events_pivot_counts": lambda sf: events.pivot_type_counts(
            _events(sf, ["user_id", "event_type"])),
        # grouped exact median at HIGH key cardinality (one coarse
        # shuffle + vectorized segmented selection; no per-group loop)
        "events_user_median": lambda sf: events.user_value_median(
            _events(sf, ["user_id", "value"])),
        # generic-primitive composition demos over the LARGEST tables
        # (lineitem): pure-combiner aggregate and semi+inner join + top-N
        "tpch_q1_pricing": lambda sf: relational.pricing_summary(
            _tbl(sf, "lineitem",
                 ["l_returnflag", "l_linestatus", "l_quantity",
                  "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])),
        "tpch_q3_toporders": q_tpch_q3,
        "tpch_q5_local_supplier": q_tpch_q5,
        # aggregate→HAVING→join-back composition: the qualifying set is
        # produced and filtered inside the shuffle, never on the driver
        # Pearson correlation per type (normalized moments twin)
        "events_value_time_corr": lambda sf: events.value_time_corr(
            _events(sf, ["ts", "event_type", "value"])),
        # distributed OLS: per-type value-over-time slope via exact
        # integer moment sums (drift detection)
        "events_trend_slope": lambda sf: events.trend_slope(
            _events(sf, ["ts", "event_type", "value"])),
        # time-to-convert: first signup -> first subsequent purchase
        "events_conversion_time": lambda sf: events.conversion_time(
            _events(sf, ["user_id", "ts", "event_type"])),
        # calendar-feature seasonality profile (pure combiner)
        "events_hourly_seasonality": lambda sf: events.hourly_seasonality(
            _events(sf, ["ts", "event_type"])),
        # quantile-binning feature transform from exact order statistics
        # robust MAD outlier flags: two chained selection passes (the
        # second over a derived |vc − median| column)
        "events_value_mad_outliers": lambda sf: events.value_mad_outliers(
            _events(sf, ["event_id", "event_type", "value"])),
        # per-day top-k users by value: two digest shuffles, in-partition
        # multi-day lexsort rank (no global sort)
        "events_daily_leaderboard": lambda sf: events.daily_leaderboard(
            _events(sf, ["user_id", "ts", "value"])),
        # rolling DAU: sliding windows via the exact k in [0, width/step)
        # integer explode + (window,user) pair-dedup digest shuffle
        "events_sliding_dau": lambda sf: events.sliding_distinct_users(
            _events(sf, ["user_id", "ts"])),
        # RFM user segmentation: per-user digest + ONE nine-target
        # iterative-selection run for all quartile cuts
        "events_user_rfm": lambda sf: events.user_rfm(
            _events(sf, ["user_id", "ts", "value"])),
        "events_value_quartile": lambda sf: events.value_quartile(
            _events(sf, ["event_id", "event_type", "value"])),
        # debounce/throttle mask: drop same-(user,type) events within
        # a gap of the previous raw event (lag semantics)
        "events_throttle": lambda sf: events.throttle(
            _events(sf, ["event_id", "user_id", "ts", "event_type"])),
        # chained variant: gap measured from the last KEPT event
        # (prefix-dependent; lockstep per-key scan, recursive-CTE oracle)
        "events_throttle_chained": lambda sf: events.throttle_chained(
            _events(sf, ["event_id", "user_id", "ts", "event_type"])),
        # composite-key distributed join (multi-column keys)
        "events_user_type_join": q_events_user_type_join,
        # skew twin: hot composite keys salted (row-identical output)
        "events_user_type_join_salted":
            lambda sf: q_events_user_type_join(sf, salted=True),
        # CDC/state-table: reduce the log to each user's latest row
        "events_latest_per_user": lambda sf: events.latest_per_user(
            _events(sf, ["user_id", "event_id", "ts", "event_type",
                         "value"])),
        # Tukey-fence outliers from exact p25/p75 (selection machinery
        # composed twice; fences are ≤|types| scalars)
        "events_value_outliers": lambda sf: events.value_outliers(
            _events(sf, ["event_id", "event_type", "value"])),
        # distributed PCA: Gram digests → driver power iteration
        # (rounded discipline) → broadcast projection pass
        "embedding_pca1": lambda sf: similarity.embedding_pca1(
            _embs(sf, ["vec_id", "embedding"])),
        # per-label inertia via the two-moments identity (exact ints)
        "embedding_label_scatter": lambda sf: similarity.label_scatter(
            _embs(sf, ["label", "embedding"])),
        # two-component PCA via driver-side deflation (Rayleigh λ₁)
        "embedding_pca2": lambda sf: similarity.embedding_pca2(
            _embs(sf, ["vec_id", "embedding"])),
        # generic k-component deflation (round-4 verdict #6): same two
        # distributed passes, k×(d×d) driver arithmetic
        "embedding_pca_k": lambda sf: similarity.embedding_pca_k(
            _embs(sf, ["vec_id", "embedding"]), k=4),
        # distributed exact Gram matrix (PCA/whitening input): one
        # matmul per batch, d² digest rows move, nothing else
        "embedding_gram": lambda sf: similarity.embedding_gram(
            _embs(sf, ["embedding"])),
        # triangle count on the near-dup graph (digest-width joins,
        # ONE scalar to the driver)
        "dedup_triangles": lambda sf: dedup.triangle_count(
            _docs(sf), edges=shared_minhash_pairs(sf)),
        # Markov transition matrix of consecutive per-user event types
        "events_type_transitions": lambda sf: events.type_transitions(
            _events(sf, ["user_id", "ts", "event_id", "event_type"])),
        # two-family consensus dedup: MinHash-LSH pairs ∩ SimHash pairs
        # via a packed-key id-width join
        "dedup_consensus_pairs": lambda sf: dedup.consensus_pairs(
            _docs(sf), cfg=CFG, mh_pairs=shared_minhash_pairs(sf),
            sh_pairs=shared_simhash_pairs(sf)),
        # corpus law fit: Zipf exponent over the term-frequency digest
        "corpus_zipf_slope": lambda sf: analysis.zipf_slope(
            _docs(sf, ["text"]), CFG),
        # curation dashboard: per-source median of the quality metric
        "source_quality_median": lambda sf: analysis.source_quality_median(
            _docs(sf, ["source", "text"])),
        # data-mixture diagnostic: exact scaled-integer L1 drift of each
        # source's term distribution vs the corpus blend
        "source_term_drift": lambda sf: analysis.source_term_drift(
            _docs(sf, ["source", "text"]), CFG),
        # broadcast-dimension conditional aggregate (promo share)
        "tpch_q14_promo_share": lambda sf:
            relational.promo_revenue_by_month(
                _tbl(sf, "lineitem", ["l_partkey", "l_shipdate",
                                      "l_extendedprice", "l_discount"]),
                _tbl(sf, "part", ["p_partkey", "p_type"])),
        # data-profiling describe(): per-column min/max/nulls, one pass
        "lineitem_profile": lambda sf: relational.profile_numeric(
            _tbl(sf, "lineitem", list(relational.PROFILE_COLS))),
        # pure filtered-scan combiner with READ-side predicate pushdown
        "tpch_q6_revenue_delta": relational.revenue_delta,
        # grouped COUNT DISTINCT after broadcast enrichment (combiner
        # cascade — only distinct triples ever shuffle)
        "tpch_q16_supplier_variety": lambda sf: relational.supplier_variety(
            _tbl(sf, "lineitem", ["l_partkey", "l_suppkey"]),
            _tbl(sf, "part", ["p_partkey", "p_brand", "p_size"])),
        "tpch_q18_large_orders": lambda sf: relational.large_orders(
            _tbl(sf, "lineitem", ["l_orderkey", "l_quantity"]),
            _tbl(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
            _tbl(sf, "customer", ["c_custkey", "c_name"])),
    }
    for name, text in BM25_QUERIES.items():
        q[name] = (lambda sf, _t=text: q_bm25(sf, _t))
        q[name.replace("bm25_", "hybrid_")] = (
            lambda sf, _t=text: q_hybrid(sf, _t))
    # block-max WAND twin: the selective-decode scorer against the SAME
    # oracle the exhaustive path certifies under (score-hash-exact)
    q["bm25_en_wand"] = lambda sf: q_bm25(sf, "en", wand=True)
    for name, (text, mode, excl) in BOOLEAN_QUERIES.items():
        q[name] = (lambda sf, _t=text, _m=mode, _e=excl:
                   q_boolean(sf, _t, _m, _e))
    return q


def build_oracles() -> dict[str, str]:
    o = {
        "token_stats": sql_token_stats(),
        "token_stats_treebank": analysis.sql_token_count_treebank(),
        "quality_score": sql_quality_score(),
        "lang_id": sql_lang_id(),
        "snippets": sql_snippets(),
        "term_df": sql_term_df(),
        "top_sources": sql_top_sources(),
        "dedup_exact": sql_exact_dedup(),
        "dedup_keep": sql_dedup_keep(),
        "quality_filter": sql_quality_filter(),
        "curate": curate.sql_curate(),
        "dedup_ngram_jaccard": sql_ngram_jaccard(),
        "simhash": sql_simhash(),
        "dedup_simhash": sql_simhash_neardup(),
        "dedup_minhash_lsh": sql_minhash_lsh(),
        "dedup_minhash_components": sql_minhash_components(),
        "docs_leakage_safe_split": sql_leakage_safe_split(),
        "dedup_incremental": sql_dedup_incremental(),
        "source_dup_rate": """
WITH k AS (
  SELECT doc_id, source,
         min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
  FROM documents),
s AS (SELECT source, count(*)::BIGINT AS n_docs,
             sum((doc_id <> keeper)::INT)::BIGINT AS n_dups
      FROM k GROUP BY source)
SELECT source, n_docs, n_dups,
       (n_dups * 1000000 // greatest(n_docs, 1))::BIGINT AS dup_rate_ppm
FROM s
""",
        "dedup_graph_pagerank": sql_pagerank(),
        "fingerprint": sql_fingerprint(),
        "repetition_stats": sql_repetition_stats(),
        "pii_redact": sql_pii_redact(),
        "embedding_neardup": sql_embedding_neardup(),
        "embedding_neardup_lsh": sql_embedding_neardup_lsh(),
        "ann_cosine_topk": sql_ann_topk(ANN_QUERY_IDS, ANN_K),
        "ann_lsh_topk": sql_ann_lsh_topk(ANN_QUERY_IDS, ANN_K),
        "ann_ivf_topk": sql_ann_ivf_topk(ANN_QUERY_IDS, ANN_K),
        "ann_int8_topk": sql_ann_int8_topk(ANN_QUERY_IDS, ANN_K),
        "multimodal_features": sql_multimodal(),
        "multimodal_decode": sql_media_decode(),
        "multimodal_resize": sql_media_resize(),
        "multimodal_frames": sql_media_frames(),
        "doc_embedding_join": sql_doc_embedding_join(),
        "doc_embedding_left_join": sql_doc_embedding_left_join(),
        "doc_embedding_anti_join": sql_doc_embedding_anti_join(),
        "doc_embedding_semi_join": sql_doc_embedding_semi_join(),
        "decontaminate": decontam.sql_decontaminate(
            bench_mod=DECONTAM_BENCH_MOD),
        "events_user_join_salted": sql_events_user_join_salted(),
        "top_ngrams": analysis.sql_top_ngrams(),
        "chunk_docs": chunking.sql_chunk_docs(),
        "dup_spans": chunking.sql_dup_spans(),
        "doc_rarity": analysis.sql_doc_rarity(CFG),
        # join-strategy twins are output-identical → same oracles
        "doc_rarity_joined": analysis.sql_doc_rarity(CFG),
        "doc_keywords_joined": analysis.sql_doc_keywords(),
        "pack_token_budget": analysis.sql_pack_token_budget(),
        "stratified_sample": analysis.sql_stratified_sample(),
        "mixture_sample": analysis.sql_mixture_sample(),
        "top_docs_per_source": analysis.sql_top_docs_per_group(),
        "classify_blogs": classify.sql_classify(),
        "events_windowed_agg": events.sql_windowed_agg(),
        "events_sessionize": events.sql_sessionize(),
        # the salted variant is output-identical → same oracle
        "events_sessionize_salted": events.sql_sessionize(),
        "events_asof_join": events.sql_asof_join_prior(),
        # output-identical by construction → same oracle
        "events_asof_join_salted": events.sql_asof_join_prior(),
        "events_range_join": events.sql_value_range_join(),
        "events_streaming_window": events.sql_streaming_windowed_agg(),
        # output-identical by construction → same oracle
        "events_streaming_window_salted": events.sql_streaming_windowed_agg(),
        "events_props_extract": events.sql_props_extract(),
        "events_value_quantiles": events.sql_value_quantiles(),
        "events_rolling_window": events.sql_rolling_user_window(),
        "doc_lengths": sql_doc_lengths(),
        "index_stats": sql_index_stats(),
        "docstore_sha256": sql_docstore_sha(),
        "phrase_match": analysis.sql_phrase_match("sort window", CFG),
        "phrase_serving": sql_phrase("src7 zh"),
        "suggest_terms": sql_suggest("s", 10),
        "fuzzy_terms": sql_fuzzy("src0", 1),
        "events_hll_users": events.sql_hll_distinct_users(),
        "facets_bm25": sql_facets("zh dup"),
        "dedup_cluster_keep": sql_cluster_keep(),
        "doc_keywords": analysis.sql_doc_keywords(),
        "events_global_rank": events.sql_global_value_rank(),
        "events_global_rank_ranged": events.sql_global_value_rank(),
        "events_percent_rank": events.sql_global_percent_rank(),
        "events_percent_rank_ranged": events.sql_global_percent_rank(),
        "events_value_zscore": events.sql_value_zscore(),
        "weighted_sample": analysis.sql_weighted_sample(),
        "cap_per_source": analysis.sql_cap_per_source(),
        "prepare_corpus": prepare.sql_prepare_corpus(),
        "events_funnel": events.sql_funnel(),
        "events_retention": events.sql_retention(),
        "events_interarrival": events.sql_interarrival(),
        "docs_rollup": analysis.sql_docs_rollup(),
        "lang_confusion": sql_lang_confusion(),
        "term_cooccurrence": analysis.sql_term_cooccurrence(),
        # join-strategy twin (output-identical) → same oracle
        "term_cooccurrence_joined": analysis.sql_term_cooccurrence(),
        "events_distinct_users": events.sql_distinct_users_exact(),
        "events_running_total": events.sql_running_total(),
        "events_value_histogram": events.sql_value_histogram(),
        "events_value_median": events.sql_value_median_exact(),
        "docs_train_split": analysis.sql_train_split(),
        "dedup_chunk_rewrite": chunking.sql_chunk_dedup_rewrite(),
        "dedup_lsh_verified": sql_lsh_verified(),
        "events_top_n": events.sql_top_n_by_value(),
        "events_value_p90": events.sql_value_quantile_exact(9, 10, "p90_c"),
        "events_type_rank": events.sql_type_value_rank(),
        "embedding_centroids": similarity.sql_label_centroids(),
        "semantic_dedup": sql_semantic_dedup(similarity.SEMDEDUP_TAU),
        "cluster_cap_sample": sql_cluster_cap_sample(32),
        "events_pivot_counts": events.sql_pivot_type_counts(),
        "events_user_median": events.sql_user_value_median(),
        "tpch_q1_pricing": relational.sql_pricing_summary(),
        "tpch_q3_toporders": relational.sql_top_unshipped_orders(),
        "tpch_q5_local_supplier": relational.sql_local_supplier_revenue(),
        "events_value_time_corr": events.sql_value_time_corr(),
        "events_trend_slope": events.sql_trend_slope(),
        "events_conversion_time": events.sql_conversion_time(),
        "events_hourly_seasonality": events.sql_hourly_seasonality(),
        "events_value_quartile": events.sql_value_quartile(),
        "events_user_rfm": events.sql_user_rfm(),
        "events_sliding_dau": events.sql_sliding_distinct_users(),
        "events_daily_leaderboard": events.sql_daily_leaderboard(),
        "events_value_mad_outliers": events.sql_value_mad_outliers(),
        "events_throttle": events.sql_throttle(),
        "events_throttle_chained": events.sql_throttle_chained(),
        "events_user_type_join": sql_events_user_type_join(),
        "events_user_type_join_salted": sql_events_user_type_join(),
        "events_latest_per_user": events.sql_latest_per_user(),
        "events_value_outliers": events.sql_value_outliers(),
        "embedding_pca1": similarity.sql_embedding_pca1(),
        "embedding_pca2": similarity.sql_embedding_pca2(),
        "embedding_pca_k": similarity.sql_embedding_pca_k(k=4),
        "embedding_label_scatter": similarity.sql_label_scatter(),
        "embedding_gram": similarity.sql_embedding_gram(),
        "dedup_triangles": (
            f"WITH e AS (SELECT * FROM ({sql_minhash_lsh()}) t) "
            f"SELECT count(*)::BIGINT AS n_triangles "
            f"FROM e e1 "
            f"JOIN e e2 ON e2.a_id = e1.a_id AND e2.b_id > e1.b_id "
            f"JOIN e e3 ON e3.a_id = e1.b_id AND e3.b_id = e2.b_id"),
        "events_type_transitions": events.sql_type_transitions(),
        "dedup_consensus_pairs": (
            f"SELECT m.a_id, m.b_id, m.est_matches, s.hamming "
            f"FROM ({sql_minhash_lsh()}) m "
            f"JOIN ({sql_simhash_neardup()}) s "
            f"USING (a_id, b_id)"),
        "corpus_zipf_slope": analysis.sql_zipf_slope(CFG),
        "source_quality_median": analysis.sql_source_quality_median(),
        "source_term_drift": analysis.sql_source_term_drift(CFG),
        "tpch_q14_promo_share": relational.sql_promo_revenue_by_month(),
        "lineitem_profile": relational.sql_profile_numeric(),
        "tpch_q6_revenue_delta": relational.sql_revenue_delta(),
        "tpch_q16_supplier_variety": relational.sql_supplier_variety(),
        "tpch_q18_large_orders": relational.sql_large_orders(),
    }
    for name, text in BM25_QUERIES.items():
        o[name] = sql_bm25(text)
        o[name.replace("bm25_", "hybrid_")] = sql_hybrid(text)
    o["bm25_en_wand"] = sql_bm25("en")
    for name, (text, mode, excl) in BOOLEAN_QUERIES.items():
        o[name] = sql_boolean(text, mode, excl)
    return o
    # Every queries() entry now has an exact SQL oracle. The approximate
    # ANN entries (lsh/ivf) are restated via the rounded-arithmetic
    # discipline: seeded SRP planes / k-means training injected or unrolled
    # in SQL, every cross-engine float decision on round(·, 6) values.


def flagship(sf_dir: str = "/root/testdata/sf0.001") -> pd.DataFrame:
    """Flagship pipeline: build the inverted index over the adapted
    documents table, serve the reference query set, return ranked results."""
    from searchengine_ray.query import QueryEngine
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx, CFG, QCFG)
    rows = []
    for name, qtext in BM25_QUERIES.items():
        for rank, r in enumerate(eng.search(qtext, top_k=QCFG.top_k), 1):
            rows.append({
                "query": qtext, "rank": rank, "doc_id": r["doc_id"],
                "url": r["url"], "title": r["title"],
                "score": round(r["score"], 6),
            })
    return pd.DataFrame(rows,
                        columns=["query", "rank", "doc_id", "url", "title",
                                 "score"])
