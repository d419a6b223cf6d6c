"""Engine vs oracle rank-identity over the synthetic corpus (FIXTURES.md §4).

The Ray-built index must produce identical doc_id sequences and normalized
scores (atol 1e-9) to the in-process reference-semantics oracle for every
query class, at k ∈ {1, 5, 10, 20}.
"""

from __future__ import annotations

import pytest

from searchengine_ray.oracle import oracle_search
from searchengine_ray.query import QueryEngine

# Query classes per FIXTURES.md §4. Mid-df discriminative terms come from the
# numbered vocabulary (the Zipf head saturates df>N/2 → IDF clamps to 0,
# which is itself covered below).
QUERIES = [
    "python",                       # single mid-df term
    "queue71",                      # rare numbered identifier
    "py org2",                      # multi term
    "java parse",                   # mix rare + saturated
    "js go org1",                   # multi term
    "tokenStream",                  # camelCase → sub-token split
    "build_index",                  # snake_case split
    "src/module_96/file_25.py",     # phrase-in-title path query
    "module_96",                    # path fragment
    "def",                          # hot Zipf head term → idf clamp → empty
    "the and of",                   # stopword-only → empty
    "",                             # empty
    "a",                            # 1-char token → filtered → empty
    "supercalifragilisticexpialidocious",  # >20 chars → filtered → empty
    "xyzzyunseen",                  # unseen term → empty
    "parse parse",                  # duplicated term
]


@pytest.fixture(scope="module")
def engine(built):
    return QueryEngine(built.index_dir, built.cfg)


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("k", [1, 5, 20])
def test_rank_identity(built, engine, query, k):
    got = engine.search(query, top_k=k)
    want = oracle_search(built.oracle, query, top_k=k)
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], abs=1e-9)
        assert g["url"] == w["url"]


def test_engine_stats_match_oracle(built, engine):
    assert engine.N == len(built.oracle.document_map)
    assert engine.avgdl == pytest.approx(built.oracle.average_doc_length,
                                         rel=1e-12)


def test_hot_terms_were_salted_and_merge_correctly(built, engine):
    # at least one Zipf-head term must have been salted, and its merged
    # posting list must equal the oracle's df for that term.
    assert built.manifest["hot_terms"], "expected hot terms in this corpus"
    term = max(built.manifest["hot_terms"],
               key=built.manifest["hot_terms"].get)
    post = engine.postings(term)
    assert post is not None
    ids, _ = post
    assert ids.size == len(built.oracle.inverted_index[term])
    assert (ids[1:] > ids[:-1]).all()  # strictly sorted, no duplicates


def test_unsalted_term_postings_match_oracle_df(built, engine):
    for term in ("queue71", "org2"):
        oracle_postings = built.oracle.inverted_index.get(term, [])
        post = engine.postings(term)
        n = 0 if post is None else post[0].size
        assert n == len(oracle_postings)


# ---------------------------------------------------------------------------
# property test: random queries (hypothesis) — engine == oracle always
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["parse", "token", "stream", "index", "queue71", "hash", "py",
          "org2", "def", "the", "a", "tokenStream", "build_index", "zzz9",
          "src/module_96/file_25.py", "&amp;", "https://x.co/1", "merge-sort"]


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(parts=st.lists(st.sampled_from(_WORDS), min_size=0, max_size=5),
       k=st.sampled_from([1, 3, 17]))
def test_random_query_rank_identity(built, engine, parts, k):
    query = " ".join(parts)
    got = engine.search(query, top_k=k)
    want = oracle_search(built.oracle, query, top_k=k)
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], query
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], abs=1e-9)
