"""Incremental merge: two delta indexes over disjoint corpus halves merge
into an index whose query results are bit-identical to building the full
corpus at once (the sorted-run merge preserves posting order and scores)."""

from __future__ import annotations

import glob

import pytest

from searchengine_ray.config import IndexConfig

CFG = IndexConfig(num_partitions=8, num_length_partitions=2)
QUERIES = ["queue71", "py org2", "parse token stream", "rust engine",
           "src/module_96/file_25.py", "hashMap codec", "def"]


@pytest.fixture(scope="module")
def merged_setup(tmp_path_factory):
    import ray.data
    from searchengine_ray.build import build_index
    from searchengine_ray.merge import merge_indexes
    from searchengine_ray.sources.corpus import generate_corpus_table

    root = tmp_path_factory.mktemp("merge")
    full_t = generate_corpus_table(300, seed=42, start=0)
    half_a = full_t.slice(0, 150)
    half_b = full_t.slice(150, 150)

    full_dir = str(root / "full")
    a_dir = str(root / "a")
    b_dir = str(root / "b")
    out_dir = str(root / "merged")

    m_full = build_index(ray.data.from_arrow(full_t), full_dir, CFG)
    hot = m_full["hot_terms"]
    build_index(ray.data.from_arrow(half_a), a_dir, CFG,
                hot_terms_override=hot)
    build_index(ray.data.from_arrow(half_b), b_dir, CFG,
                hot_terms_override=hot)
    m_merged = merge_indexes([a_dir, b_dir], out_dir, CFG,
                             concurrency=(1, 2))
    return full_dir, out_dir, m_full, m_merged


def test_manifest_scalars_match(merged_setup):
    _, _, m_full, m_merged = merged_setup
    assert m_merged["num_docs"] == m_full["num_docs"] == 300
    assert m_merged["num_terms"] == m_full["num_terms"]
    assert m_merged["avg_doc_len"] == m_full["avg_doc_len"]


def test_segment_bytes_identical(merged_setup):
    """Sorted-run merge reproduces the one-shot build's segment files
    byte-for-byte (same terms, same doc order, same codec)."""
    full_dir, out_dir, _, _ = merged_setup
    full_segs = sorted(glob.glob(full_dir + "/segments/*.parquet"))
    merged_segs = sorted(glob.glob(out_dir + "/segments/*.parquet"))
    assert [f.split("/")[-1] for f in full_segs] == \
           [f.split("/")[-1] for f in merged_segs]
    import pyarrow.parquet as pq
    for fa, fb in zip(full_segs, merged_segs):
        ta, tb = pq.read_table(fa), pq.read_table(fb)
        assert ta.equals(tb), fa


def test_query_results_identical(merged_setup):
    from searchengine_ray.query import QueryEngine
    full_dir, out_dir, _, _ = merged_setup
    full_eng = QueryEngine(full_dir, CFG)
    merged_eng = QueryEngine(out_dir, CFG)
    for q in QUERIES:
        assert full_eng.search(q, top_k=20) == merged_eng.search(q, top_k=20), q


def test_federated_matches_merged(merged_setup):
    """FederatedQueryEngine over the two delta indexes must be
    rank-identical to querying the merged index, scores equal to float
    accumulation-order tolerance (avgdl is reconstructed as
    Σ(avgdl_i·N_i)/N — one multiply-back ulp vs the merged manifest)."""
    from searchengine_ray.query import FederatedQueryEngine, QueryEngine
    _, out_dir, _, m_merged = merged_setup
    a_dir, b_dir = m_merged["merged_from"]
    fed = FederatedQueryEngine([QueryEngine(a_dir, CFG),
                                QueryEngine(b_dir, CFG)])
    merged_eng = QueryEngine(out_dir, CFG)
    assert fed.stats()["num_docs"] == merged_eng.N
    assert fed.avgdl == pytest.approx(merged_eng.avgdl, rel=1e-14)
    for q in QUERIES:
        got = fed.search(q, top_k=20)
        want = merged_eng.search(q, top_k=20)
        assert [r["doc_id"] for r in got] == \
            [r["doc_id"] for r in want], q
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], rel=1e-12)
            assert g["url"] == w["url"]
            assert g["content_snippet"] == w["content_snippet"]


def test_second_level_merge_and_federation(merged_setup, tmp_path):
    """Compaction chains: merging an already-merged index with a fresh
    delta equals the one-shot build over everything (same hot routing),
    and federating [merged, delta] serves rank-identically meanwhile."""
    import pyarrow as pa
    import ray.data
    from searchengine_ray.build import build_index
    from searchengine_ray.merge import merge_indexes
    from searchengine_ray.query import FederatedQueryEngine, QueryEngine
    from searchengine_ray.sources.corpus import generate_corpus_table
    _, out_dir, m_full, _ = merged_setup
    hot = m_full["hot_terms"]
    delta_t = generate_corpus_table(60, seed=43, start=300)
    c_dir = str(tmp_path / "c")
    m2_dir = str(tmp_path / "m2")
    all_dir = str(tmp_path / "all")
    build_index(ray.data.from_arrow(delta_t), c_dir, CFG,
                hot_terms_override=hot)
    merge_indexes([out_dir, c_dir], m2_dir, CFG, concurrency=(1, 2))
    full_t = generate_corpus_table(300, seed=42, start=0)
    build_index(ray.data.from_arrow(
        pa.concat_tables([full_t, delta_t])), all_dir, CFG,
        hot_terms_override=hot)
    eng_all = QueryEngine(all_dir, CFG)
    eng_m2 = QueryEngine(m2_dir, CFG)
    fed = FederatedQueryEngine([QueryEngine(out_dir, CFG),
                                QueryEngine(c_dir, CFG)])
    for q in QUERIES:
        want = eng_all.search(q, top_k=20)
        assert eng_m2.search(q, top_k=20) == want, q
        got = fed.search(q, top_k=20)
        assert [r["doc_id"] for r in got] == \
            [r["doc_id"] for r in want], q
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], rel=1e-12)


def test_merge_is_idempotent(merged_setup):
    """Re-running the merge over the same sources rewrites identical
    artifacts (atomic tmp→rename; resume-safe)."""
    import glob
    import pyarrow.parquet as pq
    from searchengine_ray.merge import merge_indexes
    full_dir, out_dir, _, m1 = merged_setup
    src_a = m1["merged_from"]
    m2 = merge_indexes(src_a, out_dir, CFG, concurrency=(1, 2))
    assert m2["num_docs"] == m1["num_docs"]
    assert m2["num_terms"] == m1["num_terms"]
    for f in sorted(glob.glob(out_dir + "/segments/*.parquet")):
        base = f.split("/")[-1]
        assert pq.read_table(f).equals(
            pq.read_table(full_dir + "/segments/" + base))


def test_merge_refuses_incomplete_or_mismatched_sources(merged_setup, tmp_path):
    import json
    import os
    import shutil
    import pytest as pt
    from searchengine_ray.merge import merge_indexes
    full_dir, _, _, m1 = merged_setup
    src = m1["merged_from"]
    # wrong cfg
    with pt.raises(AssertionError, match="num_partitions"):
        merge_indexes(src, str(tmp_path / "o1"),
                      IndexConfig(num_partitions=16, num_length_partitions=2))
    # incomplete source
    broken = str(tmp_path / "broken")
    shutil.copytree(src[0], broken)
    mf = json.load(open(os.path.join(broken, "manifest.json")))
    mf["complete"] = False
    json.dump(mf, open(os.path.join(broken, "manifest.json"), "w"))
    with pt.raises(AssertionError, match="not complete"):
        merge_indexes([broken, src[1]], str(tmp_path / "o2"), CFG)


def test_federation_manager_auto_compaction(tmp_path):
    """K+1 deltas trigger compaction; serving is rank-identical
    before/during/after the boundary (compare against a directly built
    federation over the same dirs, and against the one-shot full build
    after compaction)."""
    import ray.data
    from searchengine_ray.build import build_index
    from searchengine_ray.merge import merge_indexes  # noqa: F401
    from searchengine_ray.query import (FederatedQueryEngine,
                                        FederationManager, QueryEngine)
    from searchengine_ray.sources.corpus import generate_corpus_table

    full_t = generate_corpus_table(240, seed=7, start=0)
    slices = [full_t.slice(i * 60, 60) for i in range(4)]
    full_dir = str(tmp_path / "full")
    m_full = build_index(ray.data.from_arrow(full_t), full_dir, CFG)
    hot = m_full["hot_terms"]
    dirs = []
    for i, sl in enumerate(slices):
        d = str(tmp_path / f"part{i}")
        build_index(ray.data.from_arrow(sl), d, CFG,
                    hot_terms_override=hot)
        dirs.append(d)

    mgr = FederationManager(dirs[0], str(tmp_path / "gen"), CFG,
                            max_deltas=2)
    queries = ["queue71", "py org2", "parse token stream"]
    seen = [dirs[0]]
    for i, d in enumerate(dirs[1:], start=1):
        compacted = mgr.add_delta(d)
        seen.append(d)
        assert compacted == (i == 3)  # third delta exceeds max_deltas=2
        want_eng = (FederatedQueryEngine(
            [QueryEngine(x, CFG) for x in seen]))
        for q in queries:
            got = mgr.search(q, top_k=15)
            want = want_eng.search(q, top_k=15)
            assert [r["doc_id"] for r in got] == \
                [r["doc_id"] for r in want], (i, q)
            for g, w in zip(got, want):
                assert g["score"] == pytest.approx(w["score"], rel=1e-12)
    # post-compaction state: single compacted engine, no deltas, and the
    # compacted index equals the one-shot full build bit-for-bit
    assert mgr.generation == 1 and mgr.delta_dirs == []
    assert mgr.engine.index_dir == mgr.base_dir
    from searchengine_ray.query import QueryEngine as QE
    full_eng = QE(full_dir, CFG)
    for q in QUERIES:
        assert mgr.search(q, top_k=20) == full_eng.search(q, top_k=20), q
    assert mgr.stats()["num_docs"] == 240
    # pagination rides the same engine
    pg = mgr.search_page("py org2", page=1, per_page=5)
    assert pg["results"] == mgr.search("py org2", top_k=15)[:5]


def test_federated_extended_serving_matches_merged(merged_setup):
    """boolean/phrase/suggest/fuzzy/facets/MLT over a base+delta
    federation must equal the merged single index (inherited methods use
    the federated postings/df/docstore overrides)."""
    import os

    import numpy as np
    from searchengine_ray.query import FederatedQueryEngine, QueryEngine
    full_dir, out_dir, _, _ = merged_setup
    root = os.path.dirname(full_dir)
    fed = FederatedQueryEngine([QueryEngine(os.path.join(root, "a"), CFG),
                                QueryEngine(os.path.join(root, "b"), CFG)])
    merged = QueryEngine(out_dir, CFG)
    for q in ("py org2", "queue71 java"):
        assert np.array_equal(fed.boolean_search(q),
                              merged.boolean_search(q)), q
        assert np.array_equal(fed.phrase_search(q),
                              merged.phrase_search(q)), q
    assert fed.boolean_search("py", exclude="org2").tolist() == \
        merged.boolean_search("py", exclude="org2").tolist()
    assert fed.suggest("qu", 5) == merged.suggest("qu", 5)
    assert fed.fuzzy_terms("py", 1) == merged.fuzzy_terms("py", 1)
    assert fed.facet_counts("py org2") == merged.facet_counts("py org2")
    seed = merged.search("py org2", top_k=1)[0]["doc_id"]
    assert fed.more_like_this(seed) == merged.more_like_this(seed)
