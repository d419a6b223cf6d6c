"""Text-analysis operators over the corpus — stateless Arrow map_batches.

Each operator mirrors a reference behavior (SURVEY.md §2 ids cited per
function) or a training-data-pipeline staple (language id, quality scoring,
token counting, fingerprinting). Every function takes/returns
``ray.data.Dataset`` and is paired with an ANSI-SQL oracle in
``__ray_entry__.oracle_sql`` — column names must stay in lockstep.

Scale notes: all per-doc ops are embarrassingly parallel (no shuffle);
``term_df`` is the only wide op (groupby term) and pre-aggregates
(doc,term)-distinct pairs inside each batch before the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from searchengine_ray.config import DEFAULT_STOPWORDS, IndexConfig
from searchengine_ray.functions.arrow_tokenize import tokenize_column

# Deterministic language markers for the n-gram/marker heuristic language id.
# Shared rule between the Ray pipeline and the SQL oracle: first marker hit
# in priority order wins, else 'unknown'. (A real pipeline would plug a
# fastText-style model into the same actor-pool slot.)
LANG_MARKERS: list[tuple[str, str]] = [
    ("the", "en"),
    ("der", "de"),
    ("le", "fr"),
    ("el", "es"),
]

# BPE-ish token pattern: alpha runs, digit runs, or single non-space symbol
# (reference has only whitespace tokenization — this is the training-data
# token-counting extension).
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-doc token statistics over ``text`` (whitespace tokens, reference
    fallback tokenizer semantics M1 at utils/text_processing.py:79-81).

    Columns: doc_id, n_ws_tokens (whitespace split), n_tokens (code-aware
    tokenize, len>1), n_bpe_tokens (BPE-ish regex), n_chars.
    """
    def fn(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch["text"], pa.string())
        ws_parents, _ = ws_flat_tokens(text)
        n_ws = np.zeros(len(batch), dtype=np.int64)
        np.add.at(n_ws, ws_parents, 1)
        di, _ = tokenize_column(text, None, apply_filter=False)
        n_tok = np.zeros(len(batch), dtype=np.int64)
        np.add.at(n_tok, di, 1)
        n_bpe = pc.count_substring_regex(text, BPE_PATTERN)
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "n_ws_tokens": pa.array(n_ws),
            "n_tokens": pa.array(n_tok),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def token_count_treebank(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-doc token count under the Penn-Treebank tokenizer variant
    (``IndexConfig(tokenizer="treebank")`` — functions/treebank.py), the
    oracle-certified twin of the build-path expansion. The testdata
    vocabulary contains no contraction words, so both engines first
    apply the SAME deterministic literal substitution (table→cannot,
    batch→gonna) — a SQL-expressible perturbation that makes the
    MacIntyre expansion actually fire on every doc instead of
    vacuously certifying a no-op path. Columns: doc_id,
    n_tokens_tb (int64)."""
    from searchengine_ray.config import IndexConfig
    tb_cfg = IndexConfig(tokenizer="treebank")

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch["text"], pa.string())
        text = pc.replace_substring(text, pattern="table",
                                    replacement="cannot")
        text = pc.replace_substring(text, pattern="batch",
                                    replacement="gonna")
        di, _ = tokenize_column(text, tb_cfg, apply_filter=False)
        n = np.zeros(len(batch), dtype=np.int64)
        np.add.at(n, di, 1)
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "n_tokens_tb": pa.array(n),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_token_count_treebank() -> str:
    from searchengine_ray.functions.tokenizer import sql_treebank_tokens_expr
    col = "replace(replace(text, 'table', 'cannot'), 'batch', 'gonna')"
    return (f"SELECT doc_id, len({sql_treebank_tokens_expr(col)})::BIGINT "
            f"AS n_tokens_tb FROM documents")


def ws_flat_tokens(text: pa.Array | pa.ChunkedArray
                   ) -> tuple[np.ndarray, pa.Array]:
    """Raw whitespace tokens as (parent_row_index, flat tokens), using the
    RE2 ``\\s+`` split with empty tokens dropped — the ONE semantic of
    the whitespace-split family, equal for ALL inputs to the SQL twins\'
    ``list_filter(regexp_split_to_array(t, \'\\s+\'), x -> x != \'\')``
    (RE2 on both sides; verified incl. non-ASCII whitespace, which
    NEITHER side splits on — the previous utf8_split_whitespace/trim pair
    diverged on trailing newlines and U+00A0)."""
    text = pc.cast(text, pa.string())
    lists = pc.split_pattern_regex(text, pattern=r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    ne = pc.greater(pc.utf8_length(flat), 0)
    flat = pc.filter(flat, ne)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return parents[ne.to_numpy(zero_copy_only=False)], flat


def ws_quality_stats(text: pa.Array | pa.ChunkedArray
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray]:
    """(n_ws_tokens, n_stopwords, n_distinct, sum_token_len) per row over
    whitespace tokens — the shared kernel behind quality_score,
    quality_filter and curate."""
    stop = pa.array(sorted(DEFAULT_STOPWORDS), type=pa.string())
    text = pc.cast(text, pa.string())
    n = len(text)
    parents, flat = ws_flat_tokens(text)
    n_ws = np.zeros(n, dtype=np.int64)
    np.add.at(n_ws, parents, 1)
    is_stop = pc.is_in(flat, value_set=stop).to_numpy(zero_copy_only=False)
    n_stop = np.zeros(n, dtype=np.int64)
    np.add.at(n_stop, parents, is_stop.astype(np.int64))
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    sum_len = np.zeros(n, dtype=np.int64)
    np.add.at(sum_len, parents, tok_len)
    # distinct tokens per doc
    t = pa.table({"d": pa.array(parents), "t": flat})
    g = t.group_by(["d", "t"], use_threads=False).aggregate([])
    n_distinct = np.zeros(n, dtype=np.int64)
    np.add.at(n_distinct, g["d"].to_numpy(zero_copy_only=False), 1)
    return n_ws, n_stop, n_distinct, sum_len


def quality_keep_mask(text: pa.Array | pa.ChunkedArray, *,
                      min_ws_tokens: int = 10,
                      max_stop_ratio_u: int = 500_000,
                      min_distinct_ratio_u: int = 300_000) -> np.ndarray:
    """Boolean quality-gate mask per row (scaled-integer ratio rules —
    exact in Ray and SQL)."""
    n_ws, n_stop, n_dist, _ = ws_quality_stats(text)
    safe = np.maximum(n_ws, 1)
    return ((n_ws >= min_ws_tokens)
            & ((n_stop * 1_000_000) // safe <= max_stop_ratio_u)
            & ((n_dist * 1_000_000) // safe >= min_distinct_ratio_u))


def quality_score(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-doc quality heuristics (training-data staple): stopword ratio,
    distinct-token ratio, mean token length — all over whitespace tokens.

    Columns: doc_id, n_ws_tokens, n_stopwords, n_distinct, sum_token_len,
    mean_token_len_u (= sum_token_len*1e6 // n_ws_tokens — scaled-integer
    mean, exact in Ray and SQL; 0 for empty docs).
    """
    def fn(batch: pa.Table) -> pa.Table:
        n_ws, n_stop, n_distinct, sum_len = ws_quality_stats(batch["text"])
        mean_u = np.where(n_ws > 0,
                          (sum_len * 1_000_000) // np.maximum(n_ws, 1), 0)
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "n_ws_tokens": pa.array(n_ws),
            "n_stopwords": pa.array(n_stop),
            "n_distinct": pa.array(n_distinct),
            "sum_token_len": pa.array(sum_len),
            "mean_token_len_u": pa.array(mean_u),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_filter(ds: "ray.data.Dataset", *, min_ws_tokens: int = 10,
                   max_stop_ratio_u: int = 500_000,
                   min_distinct_ratio_u: int = 300_000) -> "ray.data.Dataset":
    """The training-data QUALITY GATE (quality_keep_mask kernel): keep docs with
    ≥ min_ws_tokens whitespace tokens, stopword ratio ≤ max_stop_ratio_u/1e6
    and distinct-token ratio ≥ min_distinct_ratio_u/1e6 (scaled-integer
    ratios — exact in Ray and SQL). Columns: doc_id, keep (int64 0/1)."""
    def fn(batch: pa.Table) -> pa.Table:
        keep = quality_keep_mask(batch["text"],
                                 min_ws_tokens=min_ws_tokens,
                                 max_stop_ratio_u=max_stop_ratio_u,
                                 min_distinct_ratio_u=min_distinct_ratio_u)
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "keep": pa.array(keep.astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def lang_id(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Marker-word language id (deterministic heuristic; the model-based
    variant would be an actor-pool stage in the same slot).

    Columns: doc_id, lang_pred. Rule: first (priority-ordered) marker word
    present as a whitespace token wins, else 'unknown'.
    """
    def fn(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch["text"], pa.string())
        padded = pc.binary_join_element_wise(" ", text, " ", "")
        out = np.full(len(batch), "unknown", dtype=object)
        assigned = np.zeros(len(batch), dtype=bool)
        for marker, lang in LANG_MARKERS:
            hit = pc.match_substring(padded, f" {marker} ").to_numpy(
                zero_copy_only=False)
            take = hit & ~assigned
            out[take] = lang
            assigned |= hit
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "lang_pred": pa.array(out.tolist(), type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def snippets(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Docstore snippet truncation (M12, reference indexer.py:141 semantics:
    first 200 chars + '...' when non-empty). Columns: doc_id, snippet."""
    def fn(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch["text"], pa.string())
        head = pc.utf8_slice_codeunits(text, 0, 200)
        snip = pc.if_else(pc.greater(pc.utf8_length(text), 0),
                          pc.binary_join_element_wise(head, "...", ""),
                          pa.scalar("", type=pa.string()))
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "snippet": snip,
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def term_df(ds: "ray.data.Dataset", cfg: IndexConfig = IndexConfig()) -> "ray.data.Dataset":
    """Per-term document frequency over ``text`` (A5 analogue, SURVEY.md
    §2.6): code-aware tokenize + stopword/len filter, distinct per doc,
    then a small groupby-count shuffle. Partial aggregation: the
    (doc,term)-distinct reduction happens inside each batch, so the shuffle
    moves at most |unique (doc,term)| rows, never raw token streams.

    Columns: term, df (int64).
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def explode_distinct(batch: pa.Table) -> pa.Table:
        di, toks = tokenize_column(batch["text"], cfg, apply_filter=True)
        t = pa.table({"doc": pa.array(di), "term": toks})
        # partial: (doc,term)-distinct + per-batch df, so the shuffle moves
        # at most |batch vocabulary| rows per batch
        g = (t.group_by(["doc", "term"], use_threads=False).aggregate([])
             .group_by("term", use_threads=False).aggregate([("doc", "count")]))
        return pa.table({"term": g["term"],
                         "pdf": pc.cast(g["doc_count"], pa.int64())})

    def reduce_part(part: pa.Table) -> pa.Table:
        g = part.group_by(["term"], use_threads=False).aggregate([("pdf", "sum")])
        return pa.table({
            "term": pc.cast(g["term"], pa.string()),
            "df": pc.cast(g["pdf_sum"], pa.int64()),
        })

    exploded = ds.map_batches(explode_distinct, batch_format="pyarrow")
    return grouped_aggregate(exploded, ["term"], reduce_part)


def top_sources(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-source doc counts (A8 domain-stats analogue, crawler.py:199-208).
    Columns: source, n_docs. Partial counts per batch → tiny shuffle."""
    from searchengine_ray.pipelines.common import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = (pa.table({"source": pc.cast(batch["source"], pa.string())})
             .group_by(["source"], use_threads=False)
             .aggregate([([], "count_all")]))
        return pa.table({"source": g["source"],
                         "pn": pc.cast(g["count_all"], pa.int64())})

    def reduce_part(part: pa.Table) -> pa.Table:
        g = part.group_by(["source"], use_threads=False).aggregate([("pn", "sum")])
        return pa.table({
            "source": pc.cast(g["source"], pa.string()),
            "n_docs": pc.cast(g["pn_sum"], pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(partials, ["source"], reduce_part)


# PII scrubbing patterns (training-data safety pass) — RE2 syntax, shared
# verbatim between pyarrow (RE2) and DuckDB (RE2), so redaction output is
# bit-identical across engines. Order matters: emails before the generic
# URL pattern would not matter here (disjoint), but phones run LAST so a
# redaction token never partially matches the phone digits pattern.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
]


def pii_redact(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """PII scrubbing pass (training-data safety staple): count and redact
    emails, URLs and phone-number-shaped spans with RE2 kernels — no
    Python loop, no shuffle. The redacted TEXT is emitted (not just
    counts), so the driver check certifies the rewrite itself.

    Columns: doc_id, n_email, n_url, n_phone (int64), redacted (string).
    """
    def fn(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch["text"], pa.string())
        out = {"doc_id": pc.cast(batch["doc_id"], pa.int64())}
        red = text
        for name, pat, token in PII_PATTERNS:
            out[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(red, pat), pa.int64())
            red = pc.replace_substring_regex(red, pattern=pat,
                                             replacement=token)
        out["redacted"] = red
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_stats(ds: "ray.data.Dataset", top_n: int = 2,
                     dup_n: int = 5) -> "ray.data.Dataset":
    """Repetition-based quality signals (the Gopher-rule family, Rae et
    al. 2021 appendix A: excessive n-gram repetition marks boilerplate /
    spam): per doc, the occurrence share of the single most frequent
    ``top_n``-gram and the duplicate share of ``dup_n``-gram occurrences.
    Scaled-integer ratios (×1e6 //) — exact in Ray and SQL.

    Columns: doc_id, n_2grams, top_2gram_count, top_2gram_frac_u,
    n_5grams, dup_5gram_frac_u (whitespace-token grams; no shuffle —
    embarrassingly parallel map_batches)."""
    def grams(flat: pa.Array, parents: np.ndarray, n: int, nb: int):
        """(per-doc gram counts: totals, top, distinct) via slice-join."""
        totals = np.zeros(nb, dtype=np.int64)
        top = np.zeros(nb, dtype=np.int64)
        distinct = np.zeros(nb, dtype=np.int64)
        if len(flat) < n:
            return totals, top, distinct
        m = len(flat) - n + 1
        parts = [flat.slice(i, m) for i in range(n)]
        g = pc.binary_join_element_wise(*parts, " ")
        same = parents[:m] == parents[n - 1:]
        doc = parents[:m][same]
        g = pc.filter(g, pa.array(same))
        np.add.at(totals, doc, 1)
        t = pa.table({"d": pa.array(doc), "g": g})
        cnt = t.group_by(["d", "g"], use_threads=False) \
            .aggregate([("d", "count")])
        cd = cnt["d"].to_numpy(zero_copy_only=False)
        cc = cnt["d_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        np.maximum.at(top, cd, cc)
        np.add.at(distinct, cd, 1)
        return totals, top, distinct

    def fn(batch: pa.Table) -> pa.Table:
        nb = len(batch)
        text = pc.cast(batch["text"], pa.string())
        parents, flat = ws_flat_tokens(text)
        t2, top2, _ = grams(flat, parents, top_n, nb)
        t5, _, d5 = grams(flat, parents, dup_n, nb)
        top2_frac = np.where(t2 > 0,
                             (top2 * 1_000_000) // np.maximum(t2, 1), 0)
        dup5_frac = np.where(t5 > 0,
                             ((t5 - d5) * 1_000_000) // np.maximum(t5, 1),
                             0)
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "n_2grams": pa.array(t2),
            "top_2gram_count": pa.array(top2),
            "top_2gram_frac_u": pa.array(top2_frac),
            "n_5grams": pa.array(t5),
            "dup_5gram_frac_u": pa.array(dup5_frac),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprint(ds: "ray.data.Dataset", k: int = 5, window: int = 4) -> "ray.data.Dataset":
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    rolling hash over k-token shingles, per-window minimum kept.
    Deterministic md5-based shingle hash (first 8 bytes big-endian — no
    Python hash(); reproducible in the DuckDB oracle as
    ('0x'||substr(md5(s),1,16))::UBIGINT). Columns: doc_id, n_shingles,
    n_fingerprints, min_fp, max_fp."""
    from searchengine_ray.pipelines.dedup import _md5_64

    def fn(batch: pa.Table) -> pa.Table:
        nb = len(batch)
        doc_ids = pc.cast(batch["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        out_nsh = np.zeros(nb, dtype=np.int64)
        out_nfp = np.zeros(nb, dtype=np.int64)
        out_min = np.zeros(nb, dtype=np.uint64)
        out_max = np.zeros(nb, dtype=np.uint64)

        # whitespace tokens, flat + parent index (shared RE2 semantic)
        text = pc.cast(batch["text"], pa.string())
        parents, flat = ws_flat_tokens(text)

        if len(flat) >= k:
            # k-gram shingle strings via slice-join (no per-row loop), masked
            # to windows that stay inside one doc
            m = len(flat) - k + 1
            flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) \
                else flat
            parts = [flat.slice(i, m) for i in range(k)]
            shingles = pc.binary_join_element_wise(*parts, " ")
            same_doc = parents[:m] == parents[k - 1:]
            sdoc = parents[:m][same_doc]
            shingles = pc.filter(shingles, pa.array(same_doc))
            # md5 each DISTINCT shingle once, gather through dictionary codes
            dic = shingles.dictionary_encode()
            codes = dic.indices.to_numpy(zero_copy_only=False)
            uniq = dic.dictionary.to_pylist()
            h = np.fromiter((_md5_64(u) for u in uniq), dtype=np.uint64,
                            count=len(uniq))[codes] if len(uniq) \
                else np.empty(0, dtype=np.uint64)
            np.add.at(out_nsh, sdoc, 1)

            fp_doc_parts, fp_val_parts = [], []
            if h.size:
                # per-doc global min (the n_shingles ≤ window case)
                doc_min = np.full(nb, np.uint64(0xFFFFFFFFFFFFFFFF),
                                  dtype=np.uint64)
                np.minimum.at(doc_min, sdoc, h)
                small = (out_nsh >= 1) & (out_nsh <= window)
                fp_doc_parts.append(np.nonzero(small)[0])
                fp_val_parts.append(doc_min[small])
                # sliding-window minima for docs with > window shingles;
                # valid windows are those fully inside one doc
                if h.size >= window:
                    from numpy.lib.stride_tricks import sliding_window_view
                    wmin = sliding_window_view(h, window).min(axis=1)
                    valid = (sdoc[:len(wmin)] == sdoc[window - 1:]) \
                        & (out_nsh[sdoc[:len(wmin)]] > window)
                    fp_doc_parts.append(sdoc[:len(wmin)][valid])
                    fp_val_parts.append(wmin[valid])
            if fp_doc_parts:
                fdoc = np.concatenate(fp_doc_parts).astype(np.uint64)
                fval = np.concatenate(fp_val_parts)
                uniq_pairs = np.unique(np.stack([fdoc, fval], axis=1), axis=0)
                udoc = uniq_pairs[:, 0].astype(np.int64)
                uval = uniq_pairs[:, 1]
                np.add.at(out_nfp, udoc, 1)
                # pairs are doc-major sorted: per-doc min is the run head,
                # max the run tail
                b = np.nonzero(np.diff(udoc))[0] + 1
                starts = np.concatenate([[0], b])
                ends = np.concatenate([b, [len(udoc)]])
                out_min[udoc[starts]] = uval[starts]
                out_max[udoc[starts]] = uval[ends - 1]

        return pa.table({
            "doc_id": pa.array(doc_ids),
            "n_shingles": pa.array(out_nsh),
            "n_fingerprints": pa.array(out_nfp),
            "min_fp": pa.array(out_min),
            "max_fp": pa.array(out_max),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# stratified sampling + grouped top-k (training-data curation staples)
# ---------------------------------------------------------------------------

# Per-language sampling quotas (the per-stratum rate table a real corpus
# curation run would tune; broadcast small side — travels in the task
# closure). Thresholds are EXACT uint32 integers so keep-decisions are
# bit-identical in Ray and SQL.
SAMPLE_RATES: dict[str, float] = {"en": 0.5, "zh": 0.25, "es": 0.25,
                                  "de": 0.125, "fr": 0.125}
_SAMPLE_DEFAULT = 0.0625


def _sample_threshold(rate: float) -> int:
    return int(rate * (1 << 32))


def stratified_sample(ds: "ray.data.Dataset",
                      rates: dict[str, float] | None = None,
                      group_col: str = "lang") -> "ray.data.Dataset":
    """Deterministic per-stratum sampling: keep a row iff the top 32 bits
    of md5(doc_id) fall under its stratum's threshold. No RNG, no state,
    no shuffle — every worker makes the same decision, re-runs are
    idempotent (exactly what a resumable 100 TB curation pass needs), and
    the SQL twin reproduces it bit-for-bit. md5 is the cross-engine-
    stable hash (DuckDB md5()); swap a vectorized splitmix for it on a
    real cluster if the per-row digest shows up in profiles.

    Columns: doc_id (int64), grp (string)."""
    rates = SAMPLE_RATES if rates is None else rates

    def fn(batch: pa.Table) -> pa.Table:
        import hashlib
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        grp = pc.cast(batch[group_col], pa.string()).to_pylist()
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4],
                            "big") for i in ids),
            dtype=np.int64, count=len(ids))
        thr = np.fromiter(
            (_sample_threshold(rates.get(g, _SAMPLE_DEFAULT)) for g in grp),
            dtype=np.int64, count=len(grp))
        keep = h < thr
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "grp": pa.array([g for g, k in zip(grp, keep) if k],
                            type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_stratified_sample(rates: dict[str, float] | None = None,
                          group_col: str = "lang") -> str:
    rates = SAMPLE_RATES if rates is None else rates
    cases = " ".join(
        f"WHEN '{g}' THEN {_sample_threshold(r)}" for g, r in rates.items())
    return (
        f"SELECT doc_id, {group_col} AS grp FROM documents "
        f"WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT < "
        f"(CASE {group_col} {cases} "
        f"ELSE {_sample_threshold(_SAMPLE_DEFAULT)} END)"
    )


# integer split fences: floor(0.8·2^32), floor(0.9·2^32) — exact in both
# engines, no float thresholds anywhere
_SPLIT_TRAIN_HI = (8 << 32) // 10
_SPLIT_VAL_HI = (9 << 32) // 10


def train_split(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministic 80/10/10 train/val/test assignment: each doc goes
    to exactly ONE split by the top 32 bits of md5(doc_id) against
    integer fences (the partition-function sibling of the md5-threshold
    samplers — same hash, so split membership is stable across re-runs,
    resumable shards, and engines). No RNG, no state, no shuffle; a
    100 TB corpus splits in one embarrassingly-parallel pass and any
    subset re-processed later lands in the same split. Columns: doc_id
    (int64), split (string)."""

    def fn(batch: pa.Table) -> pa.Table:
        import hashlib
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        # md5(decimal-string) is the oracle contract, so the digest loop
        # can't be replaced by a numpy hash — but the int→bytes
        # conversion vectorizes (astype('S') = b"123") and md5/from_bytes
        # bind locally, leaving only the C digest call per row
        md5 = hashlib.md5
        fb = int.from_bytes
        h = np.fromiter(
            (fb(md5(b).digest()[:4], "big") for b in ids.astype("S")),
            dtype=np.int64, count=len(ids))
        split = np.where(h < _SPLIT_TRAIN_HI, "train",
                         np.where(h < _SPLIT_VAL_HI, "val", "test"))
        return pa.table({"doc_id": pa.array(ids),
                         "split": pa.array(split.tolist(),
                                           type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_train_split() -> str:
    return (
        f"SELECT doc_id, CASE WHEN "
        f"('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT < "
        f"{_SPLIT_TRAIN_HI} THEN 'train' WHEN "
        f"('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT < "
        f"{_SPLIT_VAL_HI} THEN 'val' ELSE 'test' END AS split "
        f"FROM documents"
    )


def top_docs_per_group(ds: "ray.data.Dataset", k: int = 3,
                       group_col: str = "source") -> "ray.data.Dataset":
    """Grouped top-k (curation staple: best documents per source/domain):
    rank docs within each group by (n_distinct whitespace tokens DESC,
    doc_id ASC) and keep the top ``k``.

    Pre-aggregation pattern: each batch emits only its per-group top-k
    partials (≤ groups×k rows leave every batch — the shuffle moves
    partials, never the corpus), then a small groupby(group) reduce picks
    the global top-k. Columns: grp, doc_id, n_distinct, rank (int64).
    """
    def _topk(grp: np.ndarray, ids: np.ndarray, nd: np.ndarray,
              emit_rank: bool) -> pa.Table:
        order = np.lexsort((ids, -nd, grp))
        grp, ids, nd = grp[order], ids[order], nd[order]
        new_g = np.empty(grp.size, dtype=bool)
        if grp.size:
            new_g[0] = True
            new_g[1:] = grp[1:] != grp[:-1]
        # rank within group = position since group start
        pos = np.arange(grp.size) - \
            np.arange(grp.size)[new_g][np.cumsum(new_g) - 1] \
            if grp.size else np.empty(0, dtype=np.int64)
        keep = pos < k
        cols = {
            "grp": pa.array(grp[keep], type=pa.string()),
            "doc_id": pa.array(ids[keep]),
            "n_distinct": pa.array(nd[keep]),
        }
        if emit_rank:
            cols["rank"] = pa.array((pos[keep] + 1).astype(np.int64))
        return pa.table(cols)

    def partial(batch: pa.Table) -> pa.Table:
        _, _, n_distinct, _ = ws_quality_stats(batch["text"])
        grp = np.asarray(pc.cast(batch[group_col], pa.string()).to_pylist())
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return _topk(grp, ids, n_distinct, emit_rank=False)

    def reduce_group(group: pa.Table) -> pa.Table:
        grp = np.asarray(group["grp"].to_pylist())
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        nd = group["n_distinct"].to_numpy(zero_copy_only=False)
        return _topk(grp, ids, nd, emit_rank=True)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("grp").map_groups(reduce_group,
                                         batch_format="pyarrow"))


def sql_top_docs_per_group(k: int = 3, group_col: str = "source") -> str:
    nd = ("len(list_distinct(list_filter("
          "regexp_split_to_array(text, '\\s+'), x -> x != '')))")
    return f"""
WITH scored AS (
  SELECT {group_col} AS grp, doc_id, {nd}::BIGINT AS n_distinct
  FROM documents),
ranked AS (
  SELECT grp, doc_id, n_distinct,
         row_number() OVER (PARTITION BY grp
                            ORDER BY n_distinct DESC, doc_id) AS rank
  FROM scored)
SELECT grp, doc_id, n_distinct, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}
"""


PACK_PARTITIONS = 32


def pack_token_budget(ds: "ray.data.Dataset", capacity: int = 2048,
                      num_parts: int = PACK_PARTITIONS
                      ) -> "ray.data.Dataset":
    """Sequence packing for training shards: assign each document to a
    token-budget bin of ~``capacity`` whitespace tokens (the example-
    packing step before tokenize-and-concat in an LLM data pipeline).

    Deterministic, fully parallel packing discipline: documents shard by
    ``doc_id % num_parts``; within a shard, docs pack in doc_id order and
    ``bin_id = (running token count BEFORE the doc) // capacity`` —
    boundary docs overflow their bin by less than one document (they are
    split/truncated downstream), which is what makes the assignment a
    pure prefix-sum: one vectorized pass per shard, an exact SQL window
    twin, and no sequential first-fit state. Global bin key =
    (part, bin_id).

    Columns: doc_id, part, bin_id, n_tokens (all int64).
    """
    def add_part(batch: pa.Table) -> pa.Table:
        n_ws, _, _, _ = ws_quality_stats(batch["text"])
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "part": pa.array((ids % num_parts).astype(np.int64)),
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n_ws),
        })

    def per_part(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        nt = group["n_tokens"].to_numpy(zero_copy_only=False)
        part = group["part"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, nt, part = ids[order], nt[order], part[order]
        before = np.concatenate([[0], np.cumsum(nt)[:-1]])
        return pa.table({
            "doc_id": pa.array(ids),
            "part": pa.array(part),
            "bin_id": pa.array(before // capacity),
            "n_tokens": pa.array(nt),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("part").map_groups(per_part,
                                          batch_format="pyarrow"))


def sql_pack_token_budget(capacity: int = 2048,
                          num_parts: int = PACK_PARTITIONS) -> str:
    nt = ("len(list_filter(regexp_split_to_array(text, '\\s+'), "
          "x -> x != ''))")
    return f"""
WITH toks AS (
  SELECT doc_id, doc_id % {num_parts} AS part, {nt}::BIGINT AS n_tokens
  FROM documents)
SELECT doc_id, part,
       ((sum(n_tokens) OVER (PARTITION BY part ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens)
        // {capacity})::BIGINT AS bin_id,
       n_tokens
FROM toks
"""


# Per-source token budgets for mixture construction (the mixing-weights
# table a real pretraining run tunes; small side — travels in the task
# closure). Values are EXACT integers so keep-decisions are bit-identical
# in Ray and SQL.
MIXTURE_BUDGETS: dict[str, int] = {"src0": 4000, "src1": 2500,
                                   "src2": 2500, "src3": 1000}
_MIXTURE_DEFAULT = 500
MIXTURE_PARTITIONS = 8


def mixture_sample(ds: "ray.data.Dataset",
                   budgets: dict[str, int] | None = None,
                   source_col: str = "source",
                   num_parts: int = MIXTURE_PARTITIONS
                   ) -> "ray.data.Dataset":
    """Data-mixture construction: fill each source's TOKEN budget with a
    deterministic pseudo-random subset of its documents — the mixing step
    that turns per-domain weights (e.g. "40% web, 25% code") into an
    actual document selection for a pretraining run.

    Within a source, documents are ordered by (md5_32(doc_id), doc_id) —
    the same cross-engine-stable hash order as stratified_sample, so the
    "random" subset is reproducible anywhere — and a document is kept iff
    the cumulative whitespace-token count BEFORE it in that order is
    under the source's budget (the boundary document overflows by less
    than one document, same prefix-sum discipline as pack_token_budget —
    that is what keeps the pass vectorized and the SQL twin a pure
    window).

    Plan: ONE coarse hash(source) shuffle (each partition holds whole
    sources); inside a partition every source resolves in one lexsort +
    run-boundary-reset prefix sum — no per-source Python. Scale note: a
    source's prefix sum is computed in one task here (fine up to ~10^8
    docs/source); beyond that, split each source into ordered sub-blocks,
    scan per-block sums, and offset — identical output.

    Columns: doc_id, source, n_tokens, cum_before (all int64 except
    source).
    """
    from searchengine_ray.functions.hashing import hash64_array

    budgets = MIXTURE_BUDGETS if budgets is None else budgets

    def add_part(batch: pa.Table) -> pa.Table:
        import hashlib
        n_ws, _, _, _ = ws_quality_stats(batch["text"])
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        src = pc.cast(batch[source_col], pa.string())
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4],
                            "big") for i in ids),
            dtype=np.int64, count=len(ids))
        return pa.table({
            "part": pa.array((hash64_array(src)
                              % np.uint64(num_parts)).astype(np.int64)),
            "doc_id": pa.array(ids),
            "source": src,
            "n_tokens": pa.array(n_ws),
            "h": pa.array(h),
        })

    def per_part(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        nt = group["n_tokens"].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        src = group["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        dic = src.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = dic.dictionary.to_pylist()
        order = np.lexsort((ids, h, codes))
        ids, nt, h, codes = ids[order], nt[order], h[order], codes[order]
        # per-source prefix sum via run-boundary reset of the global cumsum
        before = np.concatenate(([0], np.cumsum(nt)[:-1]))
        new_run = np.empty(len(codes), dtype=bool)
        if len(codes):
            new_run[0] = True
            new_run[1:] = codes[1:] != codes[:-1]
        run_id = np.cumsum(new_run) - 1 if len(codes) else new_run
        cum_before = before - before[new_run][run_id] if len(codes) \
            else before
        bud = np.fromiter((budgets.get(u, _MIXTURE_DEFAULT) for u in uniq),
                          dtype=np.int64, count=len(uniq))
        keep = cum_before < bud[codes]
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "source": pa.array([uniq[c] for c in codes[keep]],
                               type=pa.string()),
            "n_tokens": pa.array(nt[keep]),
            "cum_before": pa.array(cum_before[keep]),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("part").map_groups(per_part, batch_format="pyarrow"))


def sql_mixture_sample(budgets: dict[str, int] | None = None,
                       source_col: str = "source") -> str:
    """Exact twin of mixture_sample: md5-order window prefix sum per
    source, QUALIFY under the budget CASE."""
    budgets = MIXTURE_BUDGETS if budgets is None else budgets
    nt = ("len(list_filter(regexp_split_to_array(text, '\\s+'), "
          "x -> x != ''))")
    cases = " ".join(f"WHEN '{s}' THEN {b}" for s, b in budgets.items())
    return f"""
WITH toks AS (
  SELECT doc_id, {source_col} AS source, {nt}::BIGINT AS n_tokens,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM documents)
SELECT doc_id, source, n_tokens,
       (sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                            ROWS UNBOUNDED PRECEDING)
        - n_tokens)::BIGINT AS cum_before
FROM toks
QUALIFY cum_before < (CASE source {cases} ELSE {_MIXTURE_DEFAULT} END)
"""


def top_ngrams(ds: "ray.data.Dataset", n: int = 2, k: int = 20,
               text_col: str = "text") -> "ray.data.Dataset":
    """Global heavy hitters: the ``k`` most frequent word-``n``-grams
    corpus-wide (ALL occurrences, not distinct-per-doc) — the
    corpus-analysis staple behind boilerplate detection and vocab
    inspection.

    Exact (not sketched) via the pre-aggregation pattern: each batch
    emits its LOCAL (shingle, count) partials — one Arrow hash-aggregate
    per batch, so the shuffle moves ≤ distinct-shingles-per-batch rows,
    never the token stream — then a groupby(shingle) sum and a global
    sort by (cnt DESC, shingle ASC) with limit(k). The final sort's
    input is one row per DISTINCT corpus shingle (bounded by vocab^n,
    typically ≪ corpus); ties at the k boundary are deterministic via
    the shingle tie-break. Columns: shingle, cnt (int64).
    """
    from searchengine_ray.functions.arrow_tokenize import tokenize_column

    empty = pa.table({"shingle": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})

    def count_batch(batch: pa.Table) -> pa.Table:
        di, toks = tokenize_column(batch[text_col], None, apply_filter=False)
        if len(di) < n:
            return empty
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        m = len(di) - n + 1
        parts = [toks.slice(j, m) for j in range(n)]
        sh = pc.binary_join_element_wise(*parts, " ")
        same_doc = di[:m] == di[n - 1:]
        sh = pc.filter(sh, pa.array(same_doc))
        g = pa.table({"shingle": sh}).group_by(
            "shingle", use_threads=False).aggregate([("shingle", "count")])
        return pa.table({"shingle": g["shingle"],
                         "cnt": pc.cast(g["shingle_count"], pa.int64())})

    total = (ds.map_batches(count_batch, batch_format="pyarrow")
               .groupby("shingle").sum("cnt"))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"shingle": b["shingle"],
                         "cnt": pc.cast(b["sum(cnt)"], pa.int64())})

    return (total.map_batches(rename, batch_format="pyarrow")
                 .sort(["cnt", "shingle"], descending=[True, False])
                 .limit(k))


def sql_top_ngrams(n: int = 2, k: int = 20) -> str:
    """Exact twin of top_ngrams: every n-gram occurrence unnested, counted,
    top-k by (cnt DESC, shingle ASC)."""
    from searchengine_ray.functions.tokenizer import sql_tokens_expr
    toks = sql_tokens_expr("text")
    return f"""
WITH toklists AS (SELECT {toks} AS L FROM documents),
sh AS (
  SELECT unnest(list_transform(range(1, greatest(len(L) - {n} + 2, 1)),
                               i -> array_to_string(L[i:i+{n - 1}], ' ')))
         AS shingle
  FROM toklists)
SELECT shingle, count(*)::BIGINT AS cnt FROM sh
GROUP BY shingle ORDER BY cnt DESC, shingle LIMIT {k}
"""


RARITY_SCALE = 1_000_000

# Above this many distinct terms the df side table stops being "small"
# (a 100 TB code corpus's identifier vocabulary can approach token count)
# and the broadcast pattern becomes an O(vocab) driver materialization —
# auto-switch to the in-shuffle df join below it.
VOCAB_BROADCAST_LIMIT = 2_000_000


def _broadcast_df(dft: pa.Table):
    """Broadcast hook for the small-vocab path: ``ray.put`` ONCE, every
    scoring task reads the (terms, dfs) pair zero-copy from the object
    store. Split out so the strategy tests can assert WHICH path ran
    (the join path must never call this)."""
    import ray
    return ray.put((dft["term"].combine_chunks(),
                    dft["df"].to_numpy(zero_copy_only=False)))


def _tf_rows(ds: "ray.data.Dataset", cfg: IndexConfig) -> "ray.data.Dataset":
    """Pre-aggregated (doc_id, term, tf) rows — the id-width table the
    df-join operators shuffle instead of the raw token stream. A document
    row never spans batches, so per-(doc, term) tf is exact locally and
    each (doc_id, term) pair is emitted exactly ONCE corpus-wide — which
    is what lets the term-keyed shuffle count df(term) as its own row
    count per term, with NO separate term_df pass and NO broadcast."""
    def explode(batch: pa.Table) -> pa.Table:
        di, toks = tokenize_column(batch["text"], cfg, apply_filter=True)
        ids = pc.cast(batch["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"d": pa.array(di), "term": toks})
        g = (t.group_by(["d", "term"], use_threads=False)
             .aggregate([("d", "count")]))
        gd = g["d"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[gd]),
            "term": g["term"],
            "tf": pc.cast(g["d_count"], pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def _df_runs(t: pa.Table) -> tuple[pa.Table, np.ndarray]:
    """Sort a term-partition by term and return (sorted table, per-row df)
    where df(term) = the term's row count in the partition (= its global
    df — every row of a term lands in one partition and each (doc, term)
    appears exactly once)."""
    t = t.sort_by("term")
    codes = (t["term"].combine_chunks().dictionary_encode()
             .indices.to_numpy(zero_copy_only=False))
    b = np.nonzero(np.diff(codes))[0] + 1
    runs = np.diff(np.concatenate([[0], b, [len(codes)]]))
    return t, np.repeat(runs, runs).astype(np.int64)


def _resolve_df_strategy(ds: "ray.data.Dataset", cfg: IndexConfig,
                         strategy: str, limit: int):
    """Shared strategy resolution for the df-scoring operators: returns
    ("broadcast", dft_table) or ("join", None). ``auto`` materializes the
    term_df Dataset (distributed) and checks the VOCABULARY size — the
    one scalar the decision needs; if it switches to join, that term_df
    pass is the (documented) price of auto-detection, since the join path
    recomputes df inside its own shuffle. Callers at known-large scale
    pass strategy="join" to skip it."""
    assert strategy in ("auto", "broadcast", "join"), strategy
    if strategy == "join":
        return "join", None
    dft_ds = term_df(ds, cfg)
    if strategy == "auto":
        dft_ds = dft_ds.materialize()
        if dft_ds.count() > limit:
            return "join", None
    dft = pa.concat_tables(
        [pa.table(b) for b in dft_ds.iter_batches(batch_format="pyarrow")])
    return "broadcast", dft


def doc_rarity(ds: "ray.data.Dataset",
               cfg: IndexConfig = IndexConfig(),
               strategy: str = "auto",
               broadcast_vocab_limit: int = VOCAB_BROADCAST_LIMIT
               ) -> "ray.data.Dataset":
    """Corpus-statistics document scoring (KenLM-perplexity slots into the
    same shape): per-doc mean scaled inverse df over filtered tokens.
    All arithmetic is integer (exact vs the SQL twin). Docs whose filtered
    token list is empty are absent (match the twin's join).
    Columns: doc_id, n_tok, rarity_u (= Σ tf·(N·10^6//df) // n_tok).

    Two output-identical plans, switched by ``strategy``:

    broadcast (vocab ≤ ``broadcast_vocab_limit``): ``term_df`` aggregates
      per-term document frequency (partial-aggregated shuffle, output
      bounded by the VOCABULARY ≪ corpus); the df table is broadcast once
      via ``ray.put`` and ONE streaming map_batches pass scores every doc
      — no second shuffle, the corpus rides through once.
    join (the 100 TB / unbounded-vocab path): NO broadcast and no df pass
      at all — pre-aggregated (doc_id, term, tf) rows are hash-partitioned
      by term, df(term) = the term's own row count inside its partition
      (each (doc, term) pair is emitted exactly once), scores attach in
      the same task, and a second doc-keyed shuffle of id-width partial
      sums finishes the per-doc mean. Everything that moves is id-width.
    auto: run term_df, broadcast iff vocabulary ≤ the limit.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    n_docs = ds.count()
    plan, dft = _resolve_df_strategy(ds, cfg, strategy,
                                     broadcast_vocab_limit)
    if plan == "broadcast":
        import ray
        ref = _broadcast_df(dft)

        def score(batch: pa.Table) -> pa.Table:
            terms, dfs = ray.get(ref)
            di, toks = tokenize_column(batch["text"], cfg, apply_filter=True)
            ids = pc.cast(batch["doc_id"], pa.int64()) \
                .to_numpy(zero_copy_only=False)
            if len(di) == 0:
                z = pa.array([], type=pa.int64())
                return pa.table({"doc_id": z, "n_tok": z, "rarity_u": z})
            idx = pc.index_in(toks, value_set=terms) \
                .to_numpy(zero_copy_only=False)
            rar_tok = (n_docs * RARITY_SCALE) // dfs[idx.astype(np.int64)]
            sums = np.zeros(len(batch), dtype=np.int64)
            np.add.at(sums, di, rar_tok)
            cnts = np.bincount(di, minlength=len(batch)).astype(np.int64)
            keep = cnts > 0
            return pa.table({
                "doc_id": pa.array(ids[keep]),
                "n_tok": pa.array(cnts[keep]),
                "rarity_u": pa.array(sums[keep] // cnts[keep]),
            })

        return ds.map_batches(score, batch_format="pyarrow")

    # join plan: shuffle 1 keyed by term (df + score in-task, partial
    # per-doc sums out), shuffle 2 keyed by doc_id (final integer mean)
    def score_part(part: pa.Table) -> pa.Table:
        t, df = _df_runs(part)
        tf = t["tf"].to_numpy(zero_copy_only=False)
        rar = tf * ((n_docs * RARITY_SCALE) // df)
        pt = pa.table({"doc_id": t["doc_id"], "ntok": pa.array(tf),
                       "rar": pa.array(rar)})
        g = (pt.group_by(["doc_id"], use_threads=False)
             .aggregate([("ntok", "sum"), ("rar", "sum")]))
        return pa.table({"doc_id": pc.cast(g["doc_id"], pa.int64()),
                         "ntok": pc.cast(g["ntok_sum"], pa.int64()),
                         "rar": pc.cast(g["rar_sum"], pa.int64())})

    scored = grouped_aggregate(_tf_rows(ds, cfg), ["term"], score_part)

    def finish(part: pa.Table) -> pa.Table:
        g = (part.group_by(["doc_id"], use_threads=False)
             .aggregate([("ntok", "sum"), ("rar", "sum")]))
        n_tok = pc.cast(g["ntok_sum"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rar = pc.cast(g["rar_sum"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pc.cast(g["doc_id"], pa.int64()),
                         "n_tok": pa.array(n_tok),
                         "rarity_u": pa.array(rar // n_tok)})

    return grouped_aggregate(scored, ["doc_id"], finish)


def sql_doc_rarity(cfg: IndexConfig = IndexConfig()) -> str:
    """Exact twin of doc_rarity: df and N computed in-query, per-token
    integer inverse-df, per-doc integer mean."""
    from searchengine_ray.functions.tokenizer import sql_filtered_tokens_expr
    toks = sql_filtered_tokens_expr("text", cfg)
    return f"""
WITH toklists AS (SELECT doc_id, {toks} AS L FROM documents),
tok AS (SELECT doc_id, unnest(L) AS term FROM toklists),
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
       FROM tok GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT t.doc_id, count(*)::BIGINT AS n_tok,
       CAST(sum((SELECT n FROM n) * {RARITY_SCALE} // d.df)
            // count(*) AS BIGINT) AS rarity_u
FROM tok t JOIN df d USING (term) GROUP BY t.doc_id
"""


def phrase_match(ds: "ray.data.Dataset", phrase: str,
                 cfg: IndexConfig = IndexConfig()) -> "ray.data.Dataset":
    """Exact-phrase grep over the FULL content token stream: doc_ids whose
    filtered token sequence (code-aware tokenize + stopword/length filter —
    the index's term space) contains the filtered tokens of ``phrase``
    consecutively. Stopword-removed adjacency is the standard
    positional-index-with-stopping semantics ('data the data' matches
    'data data').

    One streaming map_batches, zero shuffle: per row the filtered tokens
    are re-assembled into a space-joined string (offsets from a bincount
    of tokenize_column's doc_index) and matched against the space-padded
    needle — a single vectorized substring kernel, no Python row loop.
    Columns: doc_id (int64).
    """
    from searchengine_ray.functions.tokenizer import filter_tokens, tokenize

    stem = getattr(cfg, "stemmer", "none")
    wt = getattr(cfg, "tokenizer", "split")
    needle_toks = filter_tokens(tokenize(phrase, stem, wt), cfg)
    if not needle_toks:
        return ds.map_batches(
            lambda b: pa.table({"doc_id": pa.array([], type=pa.int64())}),
            batch_format="pyarrow")
    needle = " " + " ".join(needle_toks) + " "

    def match(batch: pa.Table) -> pa.Table:
        di, toks = tokenize_column(batch["text"], cfg, apply_filter=True)
        counts = np.bincount(di, minlength=len(batch))
        offsets = np.zeros(len(batch) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        lists = pa.LargeListArray.from_arrays(pa.array(offsets), toks)
        joined = pc.binary_join(lists, " ")
        padded = pc.binary_join_element_wise(" ", joined, " ", "")
        hit = pc.match_substring(padded, needle)
        ids = pc.filter(batch["doc_id"], hit)
        return pa.table({"doc_id": pc.cast(ids, pa.int64())})

    return ds.map_batches(match, batch_format="pyarrow")


def sql_phrase_match(phrase: str, cfg: IndexConfig = IndexConfig()) -> str:
    """Twin of phrase_match: query-side analysis in Python via the SAME
    functions, doc-side join/contains over the SQL token-list twin."""
    from searchengine_ray.functions.tokenizer import (
        filter_tokens, sql_filtered_tokens_expr, tokenize)
    stem = getattr(cfg, "stemmer", "none")
    wt = getattr(cfg, "tokenizer", "split")
    needle_toks = filter_tokens(tokenize(phrase, stem, wt), cfg)
    if not needle_toks:
        return "SELECT CAST(1 AS BIGINT) AS doc_id WHERE false"
    needle = (" " + " ".join(needle_toks) + " ").replace("'", "''")
    toks = sql_filtered_tokens_expr("text", cfg)
    return (f"SELECT doc_id FROM (SELECT doc_id, "
            f"' ' || array_to_string({toks}, ' ') || ' ' AS j "
            f"FROM documents) WHERE contains(j, '{needle}')")


def doc_keywords(ds: "ray.data.Dataset", k: int = 3,
                 cfg: IndexConfig = IndexConfig(),
                 strategy: str = "auto",
                 broadcast_vocab_limit: int = VOCAB_BROADCAST_LIMIT
                 ) -> "ray.data.Dataset":
    """Per-document keyword extraction: top-``k`` content terms by scaled
    integer tf·idf (tf × (N·10^6 // df)), tie-broken term-ascending — the
    deterministic total order shared with the SQL twin.

    Same strategy switch as :func:`doc_rarity` (output-identical paths):

    broadcast: the vocabulary-bounded df table is broadcast once
      (``ray.put``), then ONE streaming pass computes per-(doc, term) tf
      by run-length over a lexsort and picks each doc's top-k with a
      vectorized rank-since-run-start — no per-doc Python loop, no second
      shuffle. The broadcast table is sorted by term so the in-kernel
      tie-break can use integer term codes.
    join (unbounded vocab): no broadcast/df pass — (doc_id, term, tf)
      rows shuffle by term, df and score_u attach inside the partition
      (df = the term's own row count), then a doc-keyed shuffle brings
      each doc's scored terms together for the same vectorized top-k.
      Tie-break equality holds because within a doc-partition the terms
      are sorted and dictionary codes are again lexicographic.

    Columns: doc_id, rank (1..k), term, score_u — all int64/string.
    """
    import ray

    from searchengine_ray.pipelines.common import grouped_aggregate

    n_docs = ds.count()
    plan, dft = _resolve_df_strategy(ds, cfg, strategy,
                                     broadcast_vocab_limit)
    if plan == "join":
        def score_part(part: pa.Table) -> pa.Table:
            t, df = _df_runs(part)
            tf = t["tf"].to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": t["doc_id"],
                "term": t["term"],
                "score_u": pa.array(tf * ((n_docs * RARITY_SCALE) // df)),
            })

        scored = grouped_aggregate(_tf_rows(ds, cfg), ["term"], score_part)

        def topk_part(part: pa.Table) -> pa.Table:
            t = part.sort_by("term")
            codes = (t["term"].combine_chunks().dictionary_encode()
                     .indices.to_numpy(zero_copy_only=False))
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            s = t["score_u"].to_numpy(zero_copy_only=False)
            ord2 = np.lexsort((codes, -s, d))
            d2 = d[ord2]
            newd = np.empty(len(ord2), dtype=bool)
            newd[0] = True
            newd[1:] = d2[1:] != d2[:-1]
            pos = np.arange(len(ord2), dtype=np.int64)
            run_start = np.maximum.accumulate(np.where(newd, pos, 0))
            rank = pos - run_start + 1
            keep = rank <= k
            sel = ord2[keep]
            return pa.table({
                "doc_id": pa.array(d2[keep]),
                "rank": pa.array(rank[keep]),
                "term": pc.take(t["term"], pa.array(sel)),
                "score_u": pa.array(s[sel]),
            })

        return grouped_aggregate(scored, ["doc_id"], topk_part)

    dft = dft.sort_by("term")
    ref = _broadcast_df(dft)

    def extract(batch: pa.Table) -> pa.Table:
        terms, dfs = ray.get(ref)
        di, toks = tokenize_column(batch["text"], cfg, apply_filter=True)
        ids = pc.cast(batch["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        empty = pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            "term": pa.array([], type=pa.string()),
            "score_u": pa.array([], type=pa.int64())})
        if len(di) == 0:
            return empty
        idx = pc.index_in(toks, value_set=terms) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # tf per (doc, term): run-length over (doc, term-code) order
        order = np.lexsort((idx, di))
        d_s, t_s = di[order], idx[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(order))).astype(np.int64)
        gd, gt = d_s[starts], t_s[starts]
        score = tf * ((n_docs * RARITY_SCALE) // dfs[gt])
        # top-k per doc: (doc, score DESC, term-code ASC) then rank
        # within each doc run (codes are term-lexicographic: sorted table)
        ord2 = np.lexsort((gt, -score, gd))
        gd2 = gd[ord2]
        run_start = np.empty(len(ord2), dtype=np.int64)
        newd = np.empty(len(ord2), dtype=bool)
        newd[0] = True
        newd[1:] = gd2[1:] != gd2[:-1]
        pos = np.arange(len(ord2), dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(newd, pos, 0))
        rank = pos - run_start + 1
        keep = rank <= k
        sel = ord2[keep]
        return pa.table({
            "doc_id": pa.array(ids[gd2[keep]]),
            "rank": pa.array(rank[keep]),
            "term": pc.take(terms, pa.array(gt[sel])),
            "score_u": pa.array(score[sel]),
        })

    return ds.map_batches(extract, batch_format="pyarrow")


def sql_doc_keywords(k: int = 3, cfg: IndexConfig = IndexConfig()) -> str:
    """Exact twin of doc_keywords (same integer tf·idf, same total order)."""
    from searchengine_ray.functions.tokenizer import sql_filtered_tokens_expr
    toks = sql_filtered_tokens_expr("text", cfg)
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM tok GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, term),
s AS (SELECT doc_id, term,
             tf * ((SELECT n FROM n) * {RARITY_SCALE} // df) AS score_u
      FROM tf JOIN df USING (term))
SELECT doc_id, CAST(row_number() OVER w AS BIGINT) AS rank, term, score_u
FROM s
WINDOW w AS (PARTITION BY doc_id ORDER BY score_u DESC, term)
QUALIFY row_number() OVER w <= {k}
"""


WEIGHTED_SAMPLE_CHARS = 2000        # p(keep) = min(1, n_chars / 2000)
_WS_THRESH_PER_CHAR = (1 << 32) // WEIGHTED_SAMPLE_CHARS


def weighted_sample(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Importance-weighted Poisson sampling: keep a doc with probability
    ∝ its length (p = min(1, n_chars/2000)) — the length-weighted
    curation sampler. Deterministic and integer-exact: keep iff
    md5_32(doc_id) < min(2^32, n_chars·(2^32//2000)); idempotent across
    re-runs, embarrassingly parallel (one map_batches, zero shuffle).
    Columns: doc_id (int64)."""
    import hashlib

    def keep(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        nch = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(int(i)).encode()).digest()[:4],
                            "big") for i in ids),
            dtype=np.int64, count=len(ids))
        thr = np.minimum(1 << 32, nch * _WS_THRESH_PER_CHAR)
        return pa.table({"doc_id": pa.array(ids[h < thr])})

    return ds.map_batches(keep, batch_format="pyarrow")


def sql_weighted_sample() -> str:
    return (f"SELECT doc_id FROM documents WHERE "
            f"('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT < "
            f"least(4294967296, length(text) * {_WS_THRESH_PER_CHAR})")


CAP_PER_SOURCE_K = 12


def cap_per_source(ds: "ray.data.Dataset",
                   k: int = CAP_PER_SOURCE_K) -> "ray.data.Dataset":
    """Per-domain contribution cap (the crawl-pipeline staple: no source
    dominates the corpus): keep the ``k`` docs per source with the
    smallest md5(doc_id) — a deterministic uniform "random" cap,
    idempotent across re-runs.

    Pre-aggregation pattern: each batch forwards only its own per-source
    k-smallest (≤ sources×k rows leave every batch), so the shuffle moves
    candidates, never the corpus; the final per-partition pick is one
    lexsort + rank-since-run-start over all its sources at once.
    Columns: doc_id (int64), source (string).
    """
    import hashlib

    from searchengine_ray.pipelines.common import grouped_aggregate

    def topk(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        src = np.array(batch["source"].to_pylist(), dtype=object)
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(int(i)).encode()).digest()[:4],
                            "big") for i in ids),
            dtype=np.int64, count=len(ids))
        order = np.lexsort((ids, h, src))
        s_s = src[order]
        newg = np.empty(len(order), dtype=bool)
        if len(order):
            newg[0] = True
            newg[1:] = s_s[1:] != s_s[:-1]
        pos = np.arange(len(order), dtype=np.int64)
        rank = pos - np.maximum.accumulate(np.where(newg, pos, 0)) + 1
        sel = order[rank <= k]
        return pa.table({
            "doc_id": pa.array(ids[sel]),
            "source": pa.array(src[sel].astype(str), type=pa.string()),
            "h": pa.array(h[sel]),
        })

    partials = ds.map_batches(topk, batch_format="pyarrow")

    def final(part: pa.Table) -> pa.Table:
        ids = part["doc_id"].to_numpy(zero_copy_only=False)
        src = np.array(part["source"].to_pylist(), dtype=object)
        h = part["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, src))
        s_s = src[order]
        newg = np.empty(len(order), dtype=bool)
        if len(order):
            newg[0] = True
            newg[1:] = s_s[1:] != s_s[:-1]
        pos = np.arange(len(order), dtype=np.int64)
        rank = pos - np.maximum.accumulate(np.where(newg, pos, 0)) + 1
        sel = order[rank <= k]
        return pa.table({
            "doc_id": pa.array(ids[sel]),
            "source": pa.array(src[sel].astype(str), type=pa.string()),
        })

    return grouped_aggregate(partials, ["source"], final)


def sql_cap_per_source(k: int = CAP_PER_SOURCE_K) -> str:
    return (f"SELECT doc_id, source FROM documents "
            f"QUALIFY row_number() OVER (PARTITION BY source ORDER BY "
            f"('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT, doc_id) "
            f"<= {k}")


ROLLUP_ALL = "__ALL__"


def docs_rollup(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Multi-level rollup (GROUPING SETS analogue): doc counts and total
    chars at (source, lang), (source, *), (*, *) in ONE pass — each batch
    emits partials for all three levels (≤ 3×|groups| rows), one small
    groupby finishes. The sentinel '__ALL__' marks a rolled-up level.
    Columns: source, lang, n_docs, n_chars (int64)."""
    from searchengine_ray.pipelines.common import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        src = pc.cast(batch["source"], pa.string())
        lang = pc.cast(batch["lang"], pa.string())
        nch = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
        alls = pa.array([ROLLUP_ALL] * len(batch), type=pa.string())
        t = pa.concat_tables([
            pa.table({"source": src, "lang": lang, "c": nch}),
            pa.table({"source": src, "lang": alls, "c": nch}),
            pa.table({"source": alls, "lang": alls, "c": nch}),
        ])
        g = (t.group_by(["source", "lang"], use_threads=False)
             .aggregate([([], "count_all"), ("c", "sum")]))
        return pa.table({"source": g["source"], "lang": g["lang"],
                         "n": pc.cast(g["count_all"], pa.int64()),
                         "c": pc.cast(g["c_sum"], pa.int64())})

    def reduce_part(part: pa.Table) -> pa.Table:
        g = (part.group_by(["source", "lang"], use_threads=False)
             .aggregate([("n", "sum"), ("c", "sum")]))
        return pa.table({
            "source": pc.cast(g["source"], pa.string()),
            "lang": pc.cast(g["lang"], pa.string()),
            "n_docs": pc.cast(g["n_sum"], pa.int64()),
            "n_chars": pc.cast(g["c_sum"], pa.int64()),
        })

    return grouped_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                             ["source", "lang"], reduce_part)


def sql_docs_rollup() -> str:
    return f"""
SELECT coalesce(source, '{ROLLUP_ALL}') AS source,
       coalesce(lang, '{ROLLUP_ALL}') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), ())
"""


def lang_confusion(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Classifier-eval confusion matrix: labeled ``lang`` × marker-
    heuristic ``lang_pred`` counts — the model-evaluation aggregate every
    labeled pipeline runs (plug a real classifier into the same lang_id
    slot and this stage is unchanged). Per-batch partial counts (the
    shuffle moves ≤ |langs|² rows per batch). Columns: lang_actual,
    lang_pred, n (int64)."""
    from searchengine_ray.pipelines.common import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch["text"], pa.string())
        padded = pc.binary_join_element_wise(" ", text, " ", "")
        out = np.full(len(batch), "unknown", dtype=object)
        assigned = np.zeros(len(batch), dtype=bool)
        for marker, lang in LANG_MARKERS:
            hit = pc.match_substring(padded, f" {marker} ").to_numpy(
                zero_copy_only=False)
            out[hit & ~assigned] = lang
            assigned |= hit
        t = pa.table({
            "lang_actual": pc.cast(batch["lang"], pa.string()),
            "lang_pred": pa.array(out.tolist(), type=pa.string()),
        })
        g = (t.group_by(["lang_actual", "lang_pred"], use_threads=False)
             .aggregate([([], "count_all")]))
        return pa.table({"lang_actual": g["lang_actual"],
                         "lang_pred": g["lang_pred"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    def reduce_part(part: pa.Table) -> pa.Table:
        g = (part.group_by(["lang_actual", "lang_pred"], use_threads=False)
             .aggregate([("n", "sum")]))
        return pa.table({
            "lang_actual": pc.cast(g["lang_actual"], pa.string()),
            "lang_pred": pc.cast(g["lang_pred"], pa.string()),
            "n": pc.cast(g["n_sum"], pa.int64()),
        })

    return grouped_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                             ["lang_actual", "lang_pred"], reduce_part)


PMI_SCALE = 1_000_000
PMI_MIN_PAIR = 5


def _run_pair_indices(d_s: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered within-run position pairs (i < j) over a run-sorted
    key array — the shared vectorized pair generator (repeat/arange
    gather, no Python loop over runs)."""
    newd = np.empty(len(d_s), dtype=bool)
    newd[0] = True
    newd[1:] = d_s[1:] != d_s[:-1]
    starts = np.flatnonzero(newd)
    lens = np.diff(np.append(starts, len(d_s)))
    run_start = np.repeat(starts, lens)
    pos = np.arange(len(d_s))
    later = (starts + lens)[np.searchsorted(starts, run_start)] - pos - 1
    a_idx = np.repeat(pos, later)
    off = np.arange(later.sum()) - np.repeat(
        np.concatenate([[0], np.cumsum(later)[:-1]]), later) + 1
    return a_idx, a_idx + off


def term_cooccurrence(ds: "ray.data.Dataset",
                      min_pair: int = PMI_MIN_PAIR,
                      cfg: IndexConfig = IndexConfig(),
                      strategy: str = "auto",
                      broadcast_vocab_limit: int = VOCAB_BROADCAST_LIMIT
                      ) -> "ray.data.Dataset":
    """Document-level term co-occurrence with scaled-integer PMI:
    for unordered term pairs (a < b) co-occurring in ≥ ``min_pair``
    docs, ``pmi_u = n_ab·N·10^6 // (n_a·n_b)`` (the integer monotone of
    exp(PMI); >10^6 ⇔ positively associated). The collocation/phrase-
    mining staple.

    Pair generation is vectorized per batch (distinct (doc, term) runs →
    all within-doc pairs via repeat/arange gather — no Python loop over
    docs); per-batch partial pair counts bound the shuffle by the batch
    pair vocabulary. Columns: term_a, term_b, n_ab, pmi_u.

    Strategy (same switch as :func:`doc_rarity`, output-identical):
    broadcast fetches the vocab-bounded df table to the driver once
    (``ray.put``); join keeps term_df DISTRIBUTED and attaches df to the
    filtered pair table with two union-shuffles keyed by term_a then
    term_b (pair rows + df rows co-partition; an in-partition
    ``pc.index_in`` maps each pair key to its df) — nothing O(vocab)
    ever reaches the driver.
    """
    import ray as _ray

    from searchengine_ray.pipelines.common import grouped_aggregate

    assert strategy in ("auto", "broadcast", "join"), strategy
    n_docs = ds.count()
    dft_ds = None
    if strategy != "broadcast":
        dft_ds = term_df(ds, cfg).materialize()
    if strategy == "auto":
        strategy = ("broadcast"
                    if dft_ds.count() <= broadcast_vocab_limit else "join")

    if strategy == "join":
        return _term_cooccurrence_join(ds, dft_ds, n_docs, min_pair, cfg)

    src = dft_ds if dft_ds is not None else term_df(ds, cfg)
    dft = pa.concat_tables(
        [pa.table(b) for b in src.iter_batches(batch_format="pyarrow")]
    ).sort_by("term")
    ref = _broadcast_df(dft)

    def pairs_partial(batch: pa.Table) -> pa.Table:
        terms, _dfs = _ray.get(ref)
        di, toks = tokenize_column(batch["text"], cfg, apply_filter=True)
        if len(di) == 0:
            e = pa.array([], type=pa.int64())
            return pa.table({"a": e, "b": e, "n": e})
        code = pc.index_in(toks, value_set=terms) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (doc, code), doc-sorted with code ascending per doc
        t = np.unique(np.stack([di.astype(np.int64), code]), axis=1)
        d_s, c_s = t[0], t[1]
        # run lengths per doc
        newd = np.empty(len(d_s), dtype=bool)
        newd[0] = True
        newd[1:] = d_s[1:] != d_s[:-1]
        starts = np.flatnonzero(newd)
        lens = np.diff(np.append(starts, len(d_s)))
        # all ordered pairs (i < j) within each run: for every element,
        # pair it with each LATER element of its run
        run_start = np.repeat(starts, lens)
        pos = np.arange(len(d_s))
        later = (starts + lens)[np.searchsorted(starts, run_start)] \
            - pos - 1   # count of later elements in the run
        a_idx = np.repeat(pos, later)
        # offsets 1..later for each a
        off = np.arange(later.sum()) - np.repeat(
            np.concatenate([[0], np.cumsum(later)[:-1]]), later) + 1
        b_idx = a_idx + off
        pt = pa.table({"a": pa.array(c_s[a_idx]),
                       "b": pa.array(c_s[b_idx]),
                       "n": pa.array(np.ones(len(a_idx), dtype=np.int64))})
        g = pt.group_by(["a", "b"], use_threads=False) \
              .aggregate([("n", "sum")])
        return pa.table({"a": g["a"], "b": g["b"],
                         "n": pc.cast(g["n_sum"], pa.int64())})

    def pairs_reduce(part: pa.Table) -> pa.Table:
        terms, dfs = _ray.get(ref)
        g = part.group_by(["a", "b"], use_threads=False) \
                .aggregate([("n", "sum")])
        n_ab = pc.cast(g["n_sum"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = n_ab >= min_pair
        a = g["a"].to_numpy(zero_copy_only=False)[keep]
        b = g["b"].to_numpy(zero_copy_only=False)[keep]
        n_ab = n_ab[keep]
        pmi = (n_ab * n_docs * PMI_SCALE) // (dfs[a] * dfs[b])
        return pa.table({
            "term_a": pc.take(terms, pa.array(a)),
            "term_b": pc.take(terms, pa.array(b)),
            "n_ab": pa.array(n_ab),
            "pmi_u": pa.array(pmi),
        })

    return grouped_aggregate(
        ds.map_batches(pairs_partial, batch_format="pyarrow"),
        ["a", "b"], pairs_reduce)


def _term_cooccurrence_join(ds: "ray.data.Dataset",
                            dft_ds: "ray.data.Dataset", n_docs: int,
                            min_pair: int, cfg: IndexConfig
                            ) -> "ray.data.Dataset":
    """The unbounded-vocab PMI plan: pair counts shuffle as STRING pairs
    (partial-aggregated per batch, min_pair-filtered in the reduce —
    the pair table is small after the filter), then df attaches with two
    union-shuffles against the DISTRIBUTED term_df Dataset. The driver
    never sees a row."""
    from searchengine_ray.pipelines.common import grouped_aggregate

    def pairs_partial(batch: pa.Table) -> pa.Table:
        di, toks = tokenize_column(batch["text"], cfg, apply_filter=True)
        empty = pa.table({"a": pa.array([], type=pa.string()),
                          "b": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if len(di) == 0:
            return empty
        # distinct (doc, term), term-lexicographic within each doc so the
        # emitted pairs satisfy a < b by string order (matches the
        # broadcast path's sorted-vocab code order and the SQL twin)
        t = (pa.table({"d": pa.array(di), "t": toks})
             .group_by(["d", "t"], use_threads=False).aggregate([])
             .sort_by([("d", "ascending"), ("t", "ascending")]))
        d_s = t["d"].to_numpy(zero_copy_only=False)
        if len(d_s) == 0:
            return empty
        a_idx, b_idx = _run_pair_indices(d_s)
        pt = pa.table({
            "a": pc.take(t["t"], pa.array(a_idx)),
            "b": pc.take(t["t"], pa.array(b_idx)),
            "n": pa.array(np.ones(len(a_idx), dtype=np.int64)),
        })
        g = pt.group_by(["a", "b"], use_threads=False) \
              .aggregate([("n", "sum")])
        return pa.table({"a": g["a"], "b": g["b"],
                         "n": pc.cast(g["n_sum"], pa.int64())})

    def pairs_reduce(part: pa.Table) -> pa.Table:
        g = part.group_by(["a", "b"], use_threads=False) \
                .aggregate([("n", "sum")])
        n_ab = pc.cast(g["n_sum"], pa.int64())
        keep = pc.greater_equal(n_ab, min_pair)
        t = pa.table({"a": g["a"], "b": g["b"], "n_ab": n_ab}) \
            .filter(keep)
        return t

    pairs = grouped_aggregate(
        ds.map_batches(pairs_partial, batch_format="pyarrow"),
        ["a", "b"], pairs_reduce)

    def _attach_df(key_col: str, out_col: str):
        """union-shuffle stage: pair rows keyed by ``key_col`` co-partition
        with df rows; in-partition pc.index_in maps key → df."""
        def tag_pairs(batch: pa.Table) -> pa.Table:
            cols = {"k": batch[key_col], "side": pa.array(
                np.ones(len(batch), dtype=np.int64)), "df": pa.nulls(
                len(batch), type=pa.int64())}
            for c in batch.column_names:
                if c != key_col:
                    cols[c] = batch[c]
            return pa.table(cols)

        def tag_df(batch: pa.Table, pair_schema: pa.Schema) -> pa.Table:
            cols = {"k": pc.cast(batch["term"], pa.string()),
                    "side": pa.array(np.zeros(len(batch), dtype=np.int64)),
                    "df": pc.cast(batch["df"], pa.int64())}
            for f in pair_schema:
                if f.name != key_col:
                    cols[f.name] = pa.nulls(len(batch), type=f.type)
            return pa.table(cols)

        def attach(part: pa.Table) -> pa.Table:
            side = part["side"].to_numpy(zero_copy_only=False)
            dfrows = part.filter(pa.array(side == 0))
            prows = part.filter(pa.array(side == 1))
            if len(prows) == 0:
                drop = prows.drop_columns(["side", "df"])
                return drop.append_column(
                    out_col, pa.array([], type=pa.int64())) \
                    .rename_columns(
                        [key_col if c == "k" else c
                         for c in drop.column_names] + [out_col])
            terms = dfrows["k"].combine_chunks()
            dfs = dfrows["df"].to_numpy(zero_copy_only=False)
            idx = pc.index_in(prows["k"], value_set=terms) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            out = prows.drop_columns(["side", "df"])
            out = out.rename_columns(
                [key_col if c == "k" else c for c in out.column_names])
            return out.append_column(out_col, pa.array(dfs[idx]))

        return tag_pairs, tag_df, attach

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("n_ab", pa.int64())])
    tag_p, tag_d, attach = _attach_df("a", "df_a")
    u1 = (pairs.map_batches(tag_p, batch_format="pyarrow")
          .union(dft_ds.map_batches(
              lambda b: tag_d(b, pair_schema), batch_format="pyarrow")))
    with_a = grouped_aggregate(u1, ["k"], attach)

    pair_schema2 = pa.schema([("a", pa.string()), ("b", pa.string()),
                              ("n_ab", pa.int64()),
                              ("df_a", pa.int64())])
    tag_p2, tag_d2, attach2 = _attach_df("b", "df_b")
    u2 = (with_a.map_batches(tag_p2, batch_format="pyarrow")
          .union(dft_ds.map_batches(
              lambda b: tag_d2(b, pair_schema2), batch_format="pyarrow")))
    with_b = grouped_aggregate(u2, ["k"], attach2)

    def finish(batch: pa.Table) -> pa.Table:
        n_ab = batch["n_ab"].to_numpy(zero_copy_only=False)
        da = batch["df_a"].to_numpy(zero_copy_only=False)
        db = batch["df_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "term_a": pc.cast(batch["a"], pa.string()),
            "term_b": pc.cast(batch["b"], pa.string()),
            "n_ab": pa.array(n_ab),
            "pmi_u": pa.array((n_ab * n_docs * PMI_SCALE) // (da * db)),
        })

    return with_b.map_batches(finish, batch_format="pyarrow")


def sql_term_cooccurrence(min_pair: int = PMI_MIN_PAIR,
                          cfg: IndexConfig = IndexConfig()) -> str:
    from searchengine_ray.functions.tokenizer import sql_filtered_tokens_expr
    toks = sql_filtered_tokens_expr("text", cfg)
    return f"""
WITH tok AS (SELECT DISTINCT doc_id, unnest({toks}) AS term FROM documents),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
pairs AS (
  SELECT t1.term AS term_a, t2.term AS term_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM tok t1 JOIN tok t2
    ON t1.doc_id = t2.doc_id AND t1.term < t2.term
  GROUP BY t1.term, t2.term
  HAVING count(*) >= {min_pair})
SELECT term_a, term_b, n_ab,
       CAST((n_ab * (SELECT n FROM n) * {PMI_SCALE})
            // (da.df * db.df) AS BIGINT) AS pmi_u
FROM pairs
JOIN df da ON da.term = pairs.term_a
JOIN df db ON db.term = pairs.term_b
"""


def source_term_drift(ds: "ray.data.Dataset",
                      cfg: IndexConfig = IndexConfig()
                      ) -> "ray.data.Dataset":
    """Per-source term-distribution DRIFT vs the whole corpus — the
    data-mixture diagnostic (which sources are distributionally far from
    the blend they feed). Exact scaled-integer L1 distance:

        drift_scaled(s) = Σ_t |c(s,t)·N − g(t)·n(s)|
                          (terms absent from s contribute g(t)·n(s))

    where c = per-source term count, g = corpus term count, n = source
    token count, N = corpus token count — i.e. N·n(s) × the total
    variation between p(t|s) and p(t). Columns: source, n_tokens,
    drift_scaled (all int64, order-insensitive).

    Scale shape: ONE pass over text produces per-batch (source, term)
    partial counts; everything after moves digest rows only —
    (source×vocab) exact counts, then g(t) computed INSIDE a term-keyed
    shuffle (each (s,t) row exists exactly once, the df-join discipline),
    then a source-keyed reduce. N is one driver scalar (Dataset.sum on
    the materialized digest). The missing-term mass folds in closed form
    (n·(N − Σ_{t∈s} g)) so the full-vocab L1 never enumerates absent
    terms.
    """
    from searchengine_ray.functions.arrow_tokenize import tokenize_column
    from searchengine_ray.pipelines.common import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        di, toks = tokenize_column(batch["text"], cfg, apply_filter=True)
        src = pc.cast(batch["source"], pa.string()).take(pa.array(di))
        g = (pa.table({"source": src, "term": toks})
             .group_by(["source", "term"], use_threads=False)
             .aggregate([([], "count_all")]))
        return pa.table({"source": g["source"], "term": g["term"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    def reduce_st(part: pa.Table) -> pa.Table:
        g = (part.group_by(["source", "term"], use_threads=False)
             .aggregate([("c", "sum")]))
        return pa.table({"source": pc.cast(g["source"], pa.string()),
                         "term": pc.cast(g["term"], pa.string()),
                         "c": pc.cast(g["c_sum"], pa.int64())})

    st = grouped_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                           ["source", "term"], reduce_st).materialize()
    n_total = int(st.sum("c"))   # ONE scalar to the driver

    def attach_g(part: pa.Table) -> pa.Table:
        # the partition holds MANY terms (coarse hash partitions); every
        # (source, term) row exists exactly once, so each term's corpus
        # count is the per-term segment sum (df-join discipline),
        # vectorized via dictionary codes
        c = pc.cast(part["c"], pa.int64()).to_numpy(zero_copy_only=False)
        codes_arr = pc.dictionary_encode(
            part["term"].combine_chunks()
            if isinstance(part["term"], pa.ChunkedArray) else part["term"])
        if isinstance(codes_arr, pa.ChunkedArray):
            codes_arr = codes_arr.combine_chunks()
        codes = np.asarray(codes_arr.indices, dtype=np.int64)
        sums = np.zeros(len(codes_arr.dictionary), dtype=np.int64)
        np.add.at(sums, codes, c)
        return part.append_column("g", pa.array(sums[codes]))

    def per_source(group: pa.Table) -> pa.Table:
        gsrc = group["source"]
        c = pc.cast(group["c"], pa.int64()).to_numpy(zero_copy_only=False)
        gg = pc.cast(group["g"], pa.int64()).to_numpy(zero_copy_only=False)
        srcs = gsrc.to_numpy(zero_copy_only=False)
        order = np.argsort(srcs, kind="stable")
        c, gg, srcs = c[order], gg[order], srcs[order]
        new = np.empty(len(srcs), dtype=bool)
        if len(srcs):
            new[0] = True
            new[1:] = srcs[1:] != srcs[:-1]
        starts = np.flatnonzero(new)
        n = np.add.reduceat(c, starts) if len(starts) else np.empty(0)
        sum_g = np.add.reduceat(gg, starts) if len(starts) else np.empty(0)
        sid = np.cumsum(new) - 1
        present = np.abs(c * n_total - gg * n[sid])
        drift = (np.add.reduceat(present, starts)
                 + n * (n_total - sum_g)) if len(starts) else np.empty(0)
        return pa.table({
            "source": pa.array(srcs[starts]),
            "n_tokens": pa.array(n.astype(np.int64)),
            "drift_scaled": pa.array(drift.astype(np.int64)),
        })

    # g(t) attaches inside a TERM-keyed pass over the digest rows…
    with_g = grouped_aggregate(st, ["term"], attach_g)
    # …then one SOURCE-keyed reduce emits the per-source scalars; the
    # per_source kernel handles multiple sources per coarse partition
    return grouped_aggregate(with_g, ["source"], per_source)


def sql_source_term_drift(cfg: IndexConfig = IndexConfig()) -> str:
    from searchengine_ray.functions.tokenizer import sql_filtered_tokens_expr
    toks = sql_filtered_tokens_expr("text", cfg)
    return f"""
WITH toklists AS (SELECT source, {toks} AS L FROM documents),
tok AS (SELECT source, unnest(L) AS term FROM toklists),
st AS (SELECT source, term, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
g AS (SELECT term, sum(c)::BIGINT AS g FROM st GROUP BY term),
ns AS (SELECT source, sum(c)::BIGINT AS n FROM st GROUP BY source),
tot AS (SELECT sum(c)::BIGINT AS nn FROM st)
SELECT st.source, ns.n AS n_tokens,
       (sum(abs(st.c * tot.nn - g.g * ns.n))
        + ns.n * (tot.nn - sum(g.g)))::BIGINT AS drift_scaled
FROM st JOIN g USING (term) JOIN ns USING (source) CROSS JOIN tot
GROUP BY st.source, ns.n, tot.nn
"""


def source_quality_median(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-source MEDIAN of the per-doc mean-token-length quality metric
    — the curation dashboard number ("which sources are drifting
    low-quality"), composing the quality kernel with the grouped exact
    median. Columns: source, median_mtl_u2 (int64 = 2·median of
    mean_token_len_u; doubled so even-count averages stay integer).

    One pass computes the per-doc metric; one coarse hash(source)
    shuffle of (source, metric) id-width rows; inside each partition all
    sources' medians compute in a single argsorted segmented gather.
    """
    from searchengine_ray.pipelines.common import grouped_aggregate

    def metric(batch: pa.Table) -> pa.Table:
        n_ws, _, _, sum_len = ws_quality_stats(batch["text"])
        mean_u = np.where(n_ws > 0,
                          (sum_len * 1_000_000) // np.maximum(n_ws, 1), 0)
        return pa.table({
            "source": pc.cast(batch["source"], pa.string()),
            "m": pa.array(mean_u.astype(np.int64)),
        })

    def med(part: pa.Table) -> pa.Table:
        src = part["source"].to_numpy(zero_copy_only=False)
        m = pc.cast(part["m"], pa.int64()).to_numpy(zero_copy_only=False)
        if src.size == 0:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "median_mtl_u2": pa.array([],
                                                       type=pa.int64())})
        _, inv = np.unique(src, return_inverse=True)
        order = np.lexsort((m, inv))
        src, m, inv = src[order], m[order], inv[order]
        new = np.empty(src.size, dtype=bool)
        new[0] = True
        new[1:] = inv[1:] != inv[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, src.size])
        lo = m[starts + (counts - 1) // 2]
        hi = m[starts + counts // 2]
        return pa.table({
            "source": pa.array(src[starts]),
            "median_mtl_u2": pa.array(lo + hi),
        })

    rows = ds.map_batches(metric, batch_format="pyarrow")
    return grouped_aggregate(rows, ["source"], med)


def sql_source_quality_median() -> str:
    from searchengine_ray.pipelines.driver_api import sql_quality_score
    return f"""
WITH q AS ({sql_quality_score()})
SELECT d.source,
       CAST(round(2 * median(q.mean_token_len_u)) AS BIGINT)
         AS median_mtl_u2
FROM q JOIN documents d USING (doc_id)
GROUP BY d.source
"""


def zipf_slope(ds: "ray.data.Dataset",
               cfg: IndexConfig = IndexConfig()) -> "ray.data.Dataset":
    """CORPUS LAW FIT: the Zipf exponent — OLS slope of ln(count) over
    ln(rank) across the term frequency table (corpus-health diagnostic:
    natural text ≈ −1, templated/duplicated corpora flatten). Columns:
    one row — n_terms, slope_r (round 6).

    One tokenize pass produces the (term, count) digest (vocab-bounded,
    the same boundedness contract as term_df); ranking and the 2-var
    OLS run on the driver over that digest. Both engines fit on
    round(ln(·), 6) coordinates so libm-vs-numpy 1-ulp log differences
    can never move the fit.
    """
    from searchengine_ray.functions.arrow_tokenize import tokenize_column
    from searchengine_ray.pipelines.common import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        _, toks = tokenize_column(batch["text"], cfg, apply_filter=True)
        g = (pa.table({"term": toks})
             .group_by(["term"], use_threads=False)
             .aggregate([([], "count_all")]))
        return pa.table({"term": g["term"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    def reduce_t(part: pa.Table) -> pa.Table:
        g = part.group_by(["term"], use_threads=False) \
                .aggregate([("c", "sum")])
        return pa.table({"term": pc.cast(g["term"], pa.string()),
                         "c": pc.cast(g["c_sum"], pa.int64())})

    digest = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["term"], reduce_t).take_all()   # vocab-bounded
    if not digest:
        return ray.data.from_arrow(pa.table({
            "n_terms": pa.array([0], type=pa.int64()),
            "slope_r": pa.array([0.0], type=pa.float64())}))
    rows = sorted(digest, key=lambda r: (-int(r["c"]), r["term"]))
    n = len(rows)
    x = np.round(np.log(np.arange(1, n + 1, dtype=np.float64)), 6)
    y = np.round(np.log(np.array([float(r["c"]) for r in rows])), 6)
    num = n * float(x @ y) - float(x.sum()) * float(y.sum())
    den = n * float(x @ x) - float(x.sum()) ** 2
    slope = round(num / den, 6) if den != 0 else 0.0
    return ray.data.from_arrow(pa.table({
        "n_terms": pa.array([n], type=pa.int64()),
        "slope_r": pa.array([slope], type=pa.float64())}))


def sql_zipf_slope(cfg: IndexConfig = IndexConfig()) -> str:
    from searchengine_ray.functions.tokenizer import sql_filtered_tokens_expr
    toks = sql_filtered_tokens_expr("text", cfg)
    return f"""
WITH tok AS (SELECT unnest({toks}) AS term FROM documents),
tc AS (SELECT term, count(*)::BIGINT AS c FROM tok GROUP BY term),
rk AS (
  SELECT round(ln(row_number() OVER (ORDER BY c DESC, term)), 6) AS x,
         round(ln(c::DOUBLE), 6) AS y
  FROM tc),
m AS (SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx FROM rk)
SELECT n AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_r
FROM m
"""
