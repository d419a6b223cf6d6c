"""Oracle unit tests against hand-computed BM25 values (SURVEY.md §5.1).

The 5-doc fixture is chosen so the hand arithmetic is tractable: same
repo/lang, distinct 1-token contents except the query terms. Weighted doc
lengths: path gives 3 tokens ×5 = 15, meta (repo+lang) gives 2 tokens ×3 = 6,
so dl = 21 + content token count. Expected values below were computed by hand
from the reference formulas (SURVEY.md §2.9: idf=max(0,ln((N-n+.5)/(n+.5))),
tf_comp=((k1+1)tf)/(k1(1-b+b·dl/avgdl))+tf), ×1.8 term importance, ×1.3
snippet phrase boost, max-normalize).
"""

from __future__ import annotations

import pytest

from searchengine_ray.config import IndexConfig, QueryConfig
from searchengine_ray.oracle import build_oracle_index, oracle_search

CFG = IndexConfig()


def _docs():
    mk = lambda i, content: {
        "doc_id": i,
        "repo": "r1/proj",
        "path": f"src/doc{i}.py",
        "commit": "c" * 40,
        "lang": "python",
        "content": content,
    }
    return [
        mk(1, "zebra lion"),
        mk(2, "zebra zebra tiger"),
        mk(3, "tiger puma"),
        mk(4, "otter"),
        mk(5, "ferret"),
    ]


@pytest.fixture(scope="module")
def idx():
    return build_oracle_index(_docs(), CFG)


def test_doc_lengths_and_avgdl(idx):
    # path "src/docN.py" → [src, docN, py] ×5 = 15; meta "r1/proj python" →
    # [r1, proj, python] ×3 = 9; content ×1.
    assert idx.document_lengths[1] == 15 + 9 + 2
    assert idx.document_lengths[2] == 15 + 9 + 3
    assert idx.average_doc_length == pytest.approx((26 + 27 + 26 + 25 + 25) / 5)


def test_df(idx):
    assert len(idx.inverted_index["zebra"]) == 2
    assert len(idx.inverted_index["lion"]) == 1
    # 'python' appears in every doc (meta) → df = 5
    assert len(idx.inverted_index["python"]) == 5


def test_single_match_normalizes_to_one(idx):
    res = oracle_search(idx, "lion")
    assert [r["doc_id"] for r in res] == [1]
    assert res[0]["score"] == 1.0


def test_two_match_ranking_and_ratio(idx):
    res = oracle_search(idx, "zebra")
    assert [r["doc_id"] for r in res] == [2, 1]
    assert res[0]["score"] == 1.0
    # hand-computed: d1/d2 unnormalized = 0.784861.../1.067237... with
    # dl1=26, dl2=27, avgdl=25.8, idf=ln(3.5/2.5), both ×1.8 importance
    # ×1.3 snippet boost — the ratio cancels the shared factors.
    import math
    avgdl = idx.average_doc_length
    tfc = lambda tf, dl: (2.2 * tf) / (1.2 * (1 - 0.75 + 0.75 * dl / avgdl) + tf)
    expect = tfc(1, 26) / tfc(2, 27)
    assert res[1]["score"] == pytest.approx(expect, rel=1e-12)


def test_high_df_term_clamps_to_zero(idx):
    # 'python' in all 5 docs → idf = max(0, ln(0.5/5.5)) = 0 → all scores 0
    # → below min_score 0.05 → empty results (reference indexer.py:332).
    assert oracle_search(idx, "python") == []


def test_stopword_only_and_empty(idx):
    assert oracle_search(idx, "the and of") == []
    assert oracle_search(idx, "") == []
    assert oracle_search(idx, "unseenterm") == []


def test_title_phrase_boost_ordering(idx):
    # query equal to a path substring: "doc1" appears in d1's title →
    # graduated title-pct boost lifts d1 even though 'doc1' is a unique term.
    res = oracle_search(idx, "doc1")
    assert [r["doc_id"] for r in res] == [1]


def test_top_k_bound(idx):
    res = oracle_search(idx, "tiger", top_k=1)
    assert len(res) == 1


def test_min_score_filter():
    # many docs sharing the term → tail normalized scores can fall under
    # 0.05 and must be dropped; build a skewed corpus to check the filter.
    docs = []
    for i in range(1, 41):
        content = "needle " + " ".join(f"fill{j}w" for j in range(i * 20))
        docs.append({
            "doc_id": i, "repo": "r/p", "path": f"f{i}.py",
            "commit": "c" * 40, "lang": "go", "content": content,
        })
    idx2 = build_oracle_index(docs, CFG)
    res = oracle_search(idx2, "needle", top_k=40)
    assert all(r["score"] > 0.05 for r in res)


def test_duplicate_query_term_double_counts(idx):
    r1 = oracle_search(idx, "lion")
    # duplicated term accumulates twice pre-normalization; after
    # max-normalize the single-result score is 1.0 either way, but the doc
    # set must be identical (reference keeps duplicates, indexer.py:295).
    r2 = oracle_search(idx, "lion lion")
    assert [r["doc_id"] for r in r1] == [r["doc_id"] for r in r2]
