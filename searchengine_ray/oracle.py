"""In-process conformance oracle — reference semantics, dict-at-a-time.

A deliberately naive single-process implementation of the reference engine's
build + scoring pipeline (/root/reference/search_engine/indexer/indexer.py),
sharing ONLY the pure tokenizer/snippet functions with the distributed
engine. Tests assert the Ray engine is rank-identical to this oracle
(doc ids + normalized scores, FIXTURES.md §4); the oracle itself is unit
tested against hand-computed BM25 values.

Structure mirrors the reference:
- weighted per-field tf accumulation  — indexer.py:58-107
- doc_len = sum of weighted tfs       — indexer.py:144-146
- avgdl = mean weighted length        — indexer.py:160-162
- IDF clamp, term importance, tf comp — indexer.py:376-403
- metadata multiplicative boosts      — indexer.py:405-441
- max-normalize, sort, head-k, >0.05  — indexer.py:314-332
with the rebuild's deterministic tie-break (-score, doc_id) (SURVEY.md §2.9).
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass, field

from searchengine_ray.config import IndexConfig, QueryConfig
from searchengine_ray.functions.tokenizer import (
    filter_tokens,
    make_snippet,
    prepare_query,
    tokenize,
)


@dataclass
class OracleIndex:
    cfg: IndexConfig
    document_map: dict = field(default_factory=dict)
    inverted_index: dict = field(default_factory=lambda: defaultdict(list))
    document_lengths: dict = field(default_factory=dict)
    average_doc_length: float = 0.0


def process_document(title: str, meta: str, content: str,
                     cfg: IndexConfig) -> dict[str, float]:
    """Reference _process_document (indexer.py:58-107) with the code-corpus
    field mapping title=path, meta=repo+' '+lang (FIXTURES.md §2)."""
    weighted: dict[str, float] = defaultdict(float)
    for text, boost in ((title, cfg.title_boost), (meta, cfg.meta_boost),
                        (content, cfg.content_boost)):
        for token in filter_tokens(
                tokenize(text, getattr(cfg, 'stemmer', 'none'),
                         getattr(cfg, 'tokenizer', 'split')), cfg):
            weighted[token] += boost
    return weighted


def build_oracle_index(docs: list[dict], cfg: IndexConfig) -> OracleIndex:
    """docs: rows with repo/path/commit/lang/content and a doc_id key
    (matching the engine's uint64 ids so rank comparisons align)."""
    idx = OracleIndex(cfg=cfg)
    for doc in docs:
        doc_id = doc["doc_id"]
        title = doc["path"]
        meta = f"{doc['repo']} {doc['lang']}"
        content = doc["content"]
        weighted = process_document(title, meta, content, cfg)
        idx.document_map[doc_id] = {
            "url": f"{doc['repo']}/{doc['path']}@{doc['commit']}",
            "title": title,
            "description": meta,
            "content_snippet": make_snippet(content),
        }
        idx.document_lengths[doc_id] = sum(weighted.values())
        for term, w in weighted.items():
            idx.inverted_index[term].append((doc_id, w))
    if idx.document_map:
        idx.average_doc_length = (
            sum(idx.document_lengths.values()) / len(idx.document_map))
    return idx


def oracle_search(idx: OracleIndex, query: str,
                  qcfg: QueryConfig = QueryConfig(),
                  top_k: int | None = None) -> list[dict]:
    """Reference search (indexer.py:280-342) with tie-break (-score, doc_id)."""
    cfg = idx.cfg
    top_k = qcfg.top_k if top_k is None else top_k
    filtered, original_tokens, original_query = prepare_query(query, cfg)
    if not filtered:
        return []
    scores: dict = defaultdict(float)
    N = len(idx.document_map)
    original_token_set = set(original_tokens)
    for qt in filtered:
        postings = idx.inverted_index.get(qt)
        if not postings:
            continue
        n = len(postings)
        idf = max(0.0, math.log((N - n + 0.5) / (n + 0.5)))
        importance = qcfg.term_importance if qt in original_token_set else 1.0
        for doc_id, tf in postings:
            dl = idx.document_lengths[doc_id]
            tf_comp = ((cfg.k1 + 1) * tf) / (
                cfg.k1 * (1 - cfg.b + cfg.b * dl / idx.average_doc_length) + tf)
            scores[doc_id] += idf * tf_comp * importance
    # Metadata multiplicative boosts (indexer.py:405-441)
    for doc_id in list(scores.keys()):
        info = idx.document_map[doc_id]
        title = info["title"].lower()
        description = info["description"].lower()
        content = info["content_snippet"].lower()
        if original_query in title:
            scores[doc_id] *= 1.8
        elif original_query in description:
            scores[doc_id] *= 1.5
        elif original_query in content:
            scores[doc_id] *= 1.3
        if original_tokens:
            title_pct = sum(1 for t in original_tokens if t in title) / len(original_tokens)
            desc_pct = sum(1 for t in original_tokens if t in description) / len(original_tokens)
            if title_pct > 0:
                scores[doc_id] *= (1.0 + title_pct * 2.0)
            if desc_pct > 0:
                scores[doc_id] *= (1.0 + desc_pct * 1.0)
        if len(original_tokens) > 1 and all(t in content for t in original_tokens):
            scores[doc_id] *= 1.25
    if not scores:
        return []
    max_score = max(scores.values())
    if max_score > 0:
        for doc_id in scores:
            scores[doc_id] = scores[doc_id] / max_score
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    results = []
    for doc_id, score in ranked:
        if doc_id in idx.document_map and score > qcfg.min_score:
            info = idx.document_map[doc_id]
            results.append({
                "doc_id": doc_id,
                "url": info["url"],
                "title": info["title"],
                "description": info["description"],
                "score": score,
            })
    return results
