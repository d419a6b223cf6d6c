"""Token-window operators over the documents table.

Two first-class LLM-training-data operators with no reference analogue
(the reference engine, search_engine/indexer/indexer.py, stops at
document-granularity text ops — these extend the engine's curation
family the way dedup.py / analysis.py do):

* ``chunk_docs`` — sliding-window chunking with overlap: the standard
  training-shard / RAG-passage prep step (window W tokens, stride S,
  W−S token overlap between consecutive chunks).
* ``dup_spans`` — exact-substring duplicate-SPAN detection at W-token
  window granularity: the span-level analogue of ExactSubstr dedup
  (Lee et al., "Deduplicating Training Data Makes Language Models
  Better", ACL'22) — a window is duplicated iff its exact token
  sequence occurs in ≥ 2 distinct documents; per document,
  overlapping-or-adjacent duplicated windows merge into maximal spans.

Token semantics are the whitespace family (analysis.ws_flat_tokens):
RE2 ``\\s+`` split, empties dropped — equal on all inputs to the SQL
twins' ``list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')``.
Window text is the canonical single-space rejoin, equal to
``array_to_string(list_slice(L, a, b), ' ')``.

Both operators extract window strings via ONE char-offset pass: the
batch's tokens are rejoined once into a single buffer and every window
is a (start, end) codepoint slice of it (O(output bytes), no per-window
join loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from searchengine_ray.pipelines.analysis import ws_flat_tokens

CHUNK_WINDOW = 32
CHUNK_STRIDE = 24
SPAN_WINDOW = 8
NUM_SPAN_PARTITIONS = 64

# the ONE whitespace-token list expression shared by every SQL twin of
# the ws family (see ws_flat_tokens docstring for the parity argument)
_WS_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')"


def _batch_token_layout(text: pa.Array | pa.ChunkedArray
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray, str]:
    """(per-row token count n, per-row global token offset, per-token
    cumulative char offset in the rejoined buffer, the buffer itself).

    Token j..k of row i (within-doc offsets) is the codepoint slice
    ``buf[char_cum[tok_off[i]+j] : char_cum[tok_off[i]+k] - 1]`` — one
    cumsum over token lengths replaces per-window ``' '.join`` calls.
    """
    parents, flat = ws_flat_tokens(text)
    n = np.zeros(len(text), dtype=np.int64)
    np.add.at(n, parents, 1)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    char_cum = np.concatenate(([0], np.cumsum(tok_len + 1)))
    tok_off = np.concatenate(([0], np.cumsum(n)))
    buf = " ".join(flat.to_pylist())
    return n, tok_off, char_cum, buf


def _window_texts(buf: str, char_cum: np.ndarray, gs: np.ndarray,
                  ge: np.ndarray) -> pa.Array:
    """Window strings for global-token spans [gs, ge) — each a single
    codepoint slice of the rejoined buffer (utf8_length counts
    codepoints; Python slicing is codepoint-addressed, so the two
    agree on any unicode content)."""
    cs = char_cum[gs]
    ce = char_cum[ge] - 1
    return pa.array([buf[a:b] for a, b in zip(cs.tolist(), ce.tolist())],
                    type=pa.string())


# ---------------------------------------------------------------------------
# sliding-window chunking
# ---------------------------------------------------------------------------

def chunk_docs(ds: "ray.data.Dataset", window: int = CHUNK_WINDOW,
               stride: int = CHUNK_STRIDE, text_col: str = "text",
               id_col: str = "doc_id") -> "ray.data.Dataset":
    """Overlapped sliding-window chunking: chunk c of a doc with n
    tokens starts at ``c*stride`` for every ``c*stride < n`` and carries
    ``min(window, n - start)`` tokens (defaults 32/24 → 8-token overlap;
    the final chunk may be short — no padding). Zero chunks for empty
    docs.

    Embarrassingly parallel — ONE map_batches, no shuffle, output rows
    ≈ input tokens / stride; at 100 TB this is a pure streaming pass
    whose output feeds pack_token_budget / embedding build directly.

    Columns: doc_id, chunk_id, start_tok, n_tok (int64), chunk_text
    (string, canonical single-space rejoin).
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")

    empty = pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "chunk_id": pa.array([], type=pa.int64()),
        "start_tok": pa.array([], type=pa.int64()),
        "n_tok": pa.array([], type=pa.int64()),
        "chunk_text": pa.array([], type=pa.string()),
    })

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch[text_col], pa.string())
        did = pc.cast(batch[id_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n, tok_off, char_cum, buf = _batch_token_layout(text)
        cnt = -(-n // stride)  # ceil(n / stride); 0 for empty docs
        total = int(cnt.sum())
        if total == 0:
            return empty
        doc_rep = np.repeat(np.arange(len(n)), cnt)
        off = np.concatenate(([0], np.cumsum(cnt)))
        within = np.arange(total, dtype=np.int64) - off[doc_rep]
        start = within * stride
        n_tok = np.minimum(window, n[doc_rep] - start)
        gs = tok_off[doc_rep] + start
        return pa.table({
            "doc_id": pa.array(did[doc_rep]),
            "chunk_id": pa.array(within),
            "start_tok": pa.array(start),
            "n_tok": pa.array(n_tok),
            "chunk_text": _window_texts(buf, char_cum, gs, gs + n_tok),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_chunk_docs(window: int = CHUNK_WINDOW,
                   stride: int = CHUNK_STRIDE) -> str:
    """Exact twin of chunk_docs over the documents table."""
    return f"""
WITH t AS (SELECT doc_id, {_WS_TOKS} AS L FROM documents),
c AS (SELECT doc_id, L, len(L) AS n FROM t),
s AS (SELECT doc_id, L, n, unnest(range(0, n, {stride})) AS st FROM c)
SELECT doc_id::BIGINT AS doc_id, (st // {stride})::BIGINT AS chunk_id,
       st::BIGINT AS start_tok,
       least({window}, n - st)::BIGINT AS n_tok,
       array_to_string(L[st + 1:least(st + {window}, n)], ' ') AS chunk_text
FROM s
"""


# ---------------------------------------------------------------------------
# exact-substring duplicate spans
# ---------------------------------------------------------------------------

def dup_spans(ds: "ray.data.Dataset", window: int = SPAN_WINDOW,
              text_col: str = "text", id_col: str = "doc_id",
              num_partitions: int = NUM_SPAN_PARTITIONS) -> "ray.data.Dataset":
    """Maximal cross-document duplicated spans at ``window``-token
    granularity.

    A window (doc, start) is DUPLICATED iff its exact token sequence
    occurs in ≥ 2 distinct documents (within-doc repeats alone don't
    qualify — those are repetition_stats' Gopher signal). Per document,
    duplicated windows whose starts differ by ≤ ``window`` (overlapping
    or exactly adjacent) merge into one maximal span ``[span_start,
    span_end)`` in token offsets.

    Plan (the decontaminate/ngram_jaccard exchange shape): window
    explode (one row per window, batch-local layout work only) →
    (shuffle 1) shingle-hash coarse partitions: Arrow
    ``count_distinct(doc_id)`` per shingle inside each partition is the
    GLOBAL distinct-doc count (a shingle's rows all land in one
    partition), qualifying rows keep only (doc_id, start) → (shuffle 2)
    doc-hash coarse partitions: vectorized islands-and-gaps merge
    (lexsort + run boundaries — no per-doc Python). Shuffle 1 moves one
    row per window (the token stream ×1, strings ≤ window tokens);
    shuffle 2 moves only qualifying windows, typically a small fraction.

    Columns: doc_id, span_start, span_end, n_windows (all int64;
    n_windows = duplicated windows merged into the span).
    """
    from searchengine_ray.functions.hashing import hash64_array

    empty_w = pa.table({
        "part": pa.array([], type=pa.int32()),
        "shingle": pa.array([], type=pa.string()),
        "doc_id": pa.array([], type=pa.int64()),
        "start": pa.array([], type=pa.int64()),
    })

    def explode(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch[text_col], pa.string())
        did = pc.cast(batch[id_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n, tok_off, char_cum, buf = _batch_token_layout(text)
        w = np.maximum(n - window + 1, 0)
        total = int(w.sum())
        if total == 0:
            return empty_w
        doc_rep = np.repeat(np.arange(len(n)), w)
        off = np.concatenate(([0], np.cumsum(w)))
        start = np.arange(total, dtype=np.int64) - off[doc_rep]
        gs = tok_off[doc_rep] + start
        sh = _window_texts(buf, char_cum, gs, gs + window)
        h = hash64_array(sh)
        return pa.table({
            "part": pa.array((h % np.uint64(num_partitions))
                             .astype(np.int32)),
            "shingle": sh,
            "doc_id": pa.array(did[doc_rep]),
            "start": pa.array(start),
        })

    def mark(group: pa.Table) -> pa.Table:
        g = (group.select(["shingle", "doc_id"])
             .group_by("shingle", use_threads=False)
             .aggregate([("doc_id", "count_distinct")]))
        dup = pc.filter(
            g["shingle"],
            pc.greater_equal(g["doc_id_count_distinct"], 2))
        if isinstance(dup, pa.ChunkedArray):
            dup = dup.combine_chunks()
        keep = pc.is_in(group["shingle"], value_set=dup)
        t = group.filter(keep)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "dpart": pa.array((did % num_partitions).astype(np.int32)),
            "doc_id": t["doc_id"],
            "start": t["start"],
        })

    def merge(group: pa.Table) -> pa.Table:
        did = group["doc_id"].to_numpy(zero_copy_only=False)
        st = group["start"].to_numpy(zero_copy_only=False)
        order = np.lexsort((st, did))
        did, st = did[order], st[order]
        brk = np.concatenate(([True],
                              (did[1:] != did[:-1])
                              | ((st[1:] - st[:-1]) > window)))
        s_idx = np.nonzero(brk)[0]
        e_idx = np.concatenate((s_idx[1:], [len(st)])) - 1
        return pa.table({
            "doc_id": pa.array(did[s_idx].astype(np.int64)),
            "span_start": pa.array(st[s_idx].astype(np.int64)),
            "span_end": pa.array((st[e_idx] + window).astype(np.int64)),
            "n_windows": pa.array((e_idx - s_idx + 1).astype(np.int64)),
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
              .groupby("part").map_groups(mark, batch_format="pyarrow")
              .groupby("dpart").map_groups(merge, batch_format="pyarrow"))


def sql_dup_spans(window: int = SPAN_WINDOW) -> str:
    """Exact twin of dup_spans: windows unnested, qualifying shingles by
    count(DISTINCT doc_id) ≥ 2, islands-and-gaps merge via lag/sum
    windows (first row's NULL lag falls through CASE to a break)."""
    return f"""
WITH t AS (SELECT doc_id, {_WS_TOKS} AS L FROM documents),
c AS (SELECT doc_id, L, len(L) AS n FROM t),
win AS (SELECT doc_id, L,
               unnest(range(0, greatest(n - {window} + 1, 0))) AS s
        FROM c),
sh AS (SELECT doc_id, s, array_to_string(L[s + 1:s + {window}], ' ') AS g
       FROM win),
dup AS (SELECT g FROM sh GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
dw AS (SELECT doc_id, s FROM sh WHERE g IN (SELECT g FROM dup)),
brk AS (SELECT doc_id, s,
               CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s)
                         <= {window} THEN 0 ELSE 1 END AS b
        FROM dw),
isl AS (SELECT doc_id, s,
               sum(b) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS UNBOUNDED PRECEDING) AS grp
        FROM brk)
SELECT doc_id::BIGINT AS doc_id, min(s)::BIGINT AS span_start,
       (max(s) + {window})::BIGINT AS span_end,
       count(*)::BIGINT AS n_windows
FROM isl GROUP BY doc_id, grp
"""


# ---------------------------------------------------------------------------
# chunk-level dedup rewrite
# ---------------------------------------------------------------------------

DEDUP_CHUNK_WINDOW = 10


def chunk_dedup_rewrite(ds: "ray.data.Dataset",
                        window: int = DEDUP_CHUNK_WINDOW,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> "ray.data.Dataset":
    """Corpus REWRITE dropping globally-duplicate chunks (the rewrite
    step of ExactSubstr dedup, Lee et al. ACL'22): split every doc into
    consecutive ``window``-token chunks (last may be short), keep a
    chunk iff its exact token sequence has not occurred earlier in the
    corpus — "earlier" = lexicographic (doc_id, chunk_idx) — and
    re-join each doc's kept chunks in order.

    Two exchanges, TEXT RIDES EXACTLY ONE: the winner election shuffles
    only id-width (md5-128, doc_id, idx) rows (one per chunk, grouped
    by hash; the argmin per hash is vectorized lexsort+first — md5-128
    keying follows the docstore-sha collision discipline); the
    reconstruct union-shuffles chunk text ONCE keyed by doc_id, marks
    winners with a structured-key searchsorted, and rejoins per doc via
    ``pc.binary_join`` (no Python join loop). Docs whose every chunk
    was seen earlier (and empty docs, which have no chunks) emit no
    row — identical to the oracle's inner join.

    Columns: doc_id, clean_text (string), n_kept, n_dropped (int64).
    """
    import hashlib

    from searchengine_ray.pipelines.common import grouped_aggregate

    exploded = chunk_docs(ds, window=window, stride=window,
                          text_col=text_col, id_col=id_col) \
        .select_columns(["doc_id", "chunk_id", "chunk_text"])

    def to_hash(batch: pa.Table) -> pa.Table:
        texts = batch["chunk_text"].to_pylist()
        h0 = np.empty(len(texts), dtype=np.int64)
        h1 = np.empty(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            d = hashlib.md5(s.encode()).digest()
            h0[i] = int.from_bytes(d[:8], "big", signed=True)
            h1[i] = int.from_bytes(d[8:], "big", signed=True)
        return pa.table({"h0": pa.array(h0), "h1": pa.array(h1),
                         "doc_id": batch["doc_id"],
                         "idx": batch["chunk_id"]})

    def winners_part(part: pa.Table) -> pa.Table:
        h0 = part["h0"].to_numpy(zero_copy_only=False)
        h1 = part["h1"].to_numpy(zero_copy_only=False)
        d = part["doc_id"].to_numpy(zero_copy_only=False)
        ix = part["idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ix, d, h1, h0))
        h0s, h1s = h0[order], h1[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = (h0s[1:] != h0s[:-1]) | (h1s[1:] != h1s[:-1])
        return pa.table({"doc_id": pa.array(d[order][first]),
                         "idx": pa.array(ix[order][first])})

    winners = grouped_aggregate(
        exploded.map_batches(to_hash, batch_format="pyarrow"),
        ["h0", "h1"], winners_part)

    def tag_chunks(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "idx": pc.cast(batch["chunk_id"], pa.int64()),
            "chunk": batch["chunk_text"],
            "side": pa.array(np.ones(len(batch), dtype=np.int64)),
        })

    def tag_winners(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "idx": pc.cast(batch["idx"], pa.int64()),
            "chunk": pa.nulls(len(batch), type=pa.string()),
            "side": pa.array(np.zeros(len(batch), dtype=np.int64)),
        })

    def _pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        k = np.empty(len(a), dtype=[("a", np.int64), ("b", np.int64)])
        k["a"], k["b"] = a, b
        return k

    def reconstruct(part: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "clean_text": pa.array([], type=pa.string()),
            "n_kept": pa.array([], type=pa.int64()),
            "n_dropped": pa.array([], type=pa.int64()),
        })
        side = part["side"].to_numpy(zero_copy_only=False)
        d = part["doc_id"].to_numpy(zero_copy_only=False)
        ix = part["idx"].to_numpy(zero_copy_only=False)
        cm = side == 1
        if not cm.any():
            return empty
        kw = np.sort(_pack(d[~cm], ix[~cm]))
        kc = _pack(d[cm], ix[cm])
        pos = np.searchsorted(kw, kc)
        pos_c = np.minimum(pos, max(len(kw) - 1, 0))
        kept = (pos < len(kw)) & (kw[pos_c] == kc) if len(kw) \
            else np.zeros(len(kc), dtype=bool)
        if not kept.any():
            return empty
        texts = pc.filter(part["chunk"], pa.array(cm))
        dk, ixk = d[cm][kept], ix[cm][kept]
        tk = pc.filter(texts, pa.array(kept))
        order = np.lexsort((ixk, dk))
        dk = dk[order]
        tk = pc.take(tk, pa.array(order))
        starts = np.flatnonzero(np.r_[True, dk[1:] != dk[:-1]])
        n_kept = np.diff(np.r_[starts, len(dk)])
        offsets = pa.array(np.r_[starts, len(dk)].astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets, tk.combine_chunks()
                                         if isinstance(tk, pa.ChunkedArray)
                                         else tk)
        clean = pc.binary_join(lists, " ")
        docs = dk[starts]
        ud, utot = np.unique(d[cm], return_counts=True)
        tot = utot[np.searchsorted(ud, docs)]
        return pa.table({
            "doc_id": pa.array(docs),
            "clean_text": clean,
            "n_kept": pa.array(n_kept.astype(np.int64)),
            "n_dropped": pa.array((tot - n_kept).astype(np.int64)),
        })

    unioned = (exploded.map_batches(tag_chunks, batch_format="pyarrow")
               .union(winners.map_batches(tag_winners,
                                          batch_format="pyarrow")))
    return grouped_aggregate(unioned, ["doc_id"], reconstruct)


def sql_chunk_dedup_rewrite(window: int = DEDUP_CHUNK_WINDOW) -> str:
    """Exact twin of chunk_dedup_rewrite over the documents table."""
    return f"""
WITH t AS (SELECT doc_id, {_WS_TOKS} AS L FROM documents),
c AS (SELECT doc_id, L, len(L) AS n FROM t),
s AS (SELECT doc_id, L, n, unnest(range(0, n, {window})) AS st FROM c),
chunks AS (SELECT doc_id::BIGINT AS doc_id, (st // {window})::BIGINT AS idx,
                  array_to_string(L[st + 1:least(st + {window}, n)], ' ')
                      AS chunk
           FROM s),
winners AS (SELECT doc_id, idx FROM (
    SELECT doc_id, idx,
           row_number() OVER (PARTITION BY chunk
                              ORDER BY doc_id, idx) AS rn
    FROM chunks) WHERE rn = 1),
totals AS (SELECT doc_id, count(*)::BIGINT AS n_total
           FROM chunks GROUP BY doc_id)
SELECT c.doc_id,
       string_agg(c.chunk, ' ' ORDER BY c.idx) AS clean_text,
       count(*)::BIGINT AS n_kept,
       (any_value(t2.n_total) - count(*))::BIGINT AS n_dropped
FROM chunks c
JOIN winners w USING (doc_id, idx)
JOIN totals t2 USING (doc_id)
GROUP BY c.doc_id
"""
