"""Build invariants, checkpoint/resume, and partition-invariance
(SURVEY.md §5.3-5.5, FIXTURES.md §5 resume fixture)."""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build import build_index
from searchengine_ray.config import IndexConfig
from searchengine_ray.oracle import oracle_search
from searchengine_ray.query import QueryEngine
from searchengine_ray.sources.corpus import read_source
from searchengine_ray.state.manifest import load_manifest


def _read_dir(path, columns=None):
    import pyarrow as pa
    return pa.concat_tables([
        pq.read_table(f, columns=columns)
        for f in sorted(glob.glob(os.path.join(path, "*.parquet")))
    ])


def test_sha256_invariant(built):
    """Per-row sha256(content) of docstore rows equals the source table
    (BASELINE.json input_hint per-row invariant)."""
    store = _read_dir(os.path.join(built.index_dir, "docstore"),
                      columns=["doc_key", "content_sha256"])
    got = {k: s for k, s in zip(store["doc_key"].to_pylist(),
                                store["content_sha256"].to_pylist())}
    src = built.table
    keys = [f"{r}/{p}@{c}" for r, p, c in zip(
        src["repo"].to_pylist(), src["path"].to_pylist(),
        src["commit"].to_pylist())]
    assert len(got) == len(keys)
    for key, content in zip(keys, src["content"].to_pylist()):
        assert got[key] == hashlib.sha256(content.encode()).digest()


def test_doc_id_uniqueness(built):
    store = _read_dir(os.path.join(built.index_dir, "docstore"),
                      columns=["doc_id"])
    ids = store["doc_id"].to_numpy(zero_copy_only=False)
    assert np.unique(ids).size == ids.size


def test_lengths_match_oracle(built):
    lens = _read_dir(os.path.join(built.index_dir, "lengths"))
    got = dict(zip(lens["doc_id"].to_pylist(), lens["doc_len"].to_pylist()))
    assert got == pytest.approx(built.oracle.document_lengths)


def test_manifest_scalars(built):
    m = built.manifest
    assert m["num_docs"] == len(built.table)
    assert m["avg_doc_len"] == pytest.approx(built.oracle.average_doc_length)
    assert m["complete"] is True
    # every partition entry is done and its file exists
    for entry in m["partitions"].values():
        assert entry["status"] == "done"
        assert os.path.exists(os.path.join(built.index_dir, entry["path"]))


def test_df_totals_match_oracle(built):
    """Σ per-term df across segments == Σ oracle posting lengths (salted
    sub-lists sum to the term's true df)."""
    seg = _read_dir(os.path.join(built.index_dir, "segments"),
                    columns=["term", "df"])
    from collections import Counter
    got = Counter()
    for t, d in zip(seg["term"].to_pylist(), seg["df"].to_pylist()):
        got[t] += d
    want = {t: len(p) for t, p in built.oracle.inverted_index.items()}
    assert dict(got) == want


def test_resume_after_partial_build(built, tmp_path):
    """Kill-after-subset resume: build only half the partitions, then
    resume; the final index must answer queries identically and the second
    run must not rewrite completed partitions."""
    cfg = IndexConfig(num_partitions=8, num_length_partitions=2)
    index_dir = str(tmp_path / "resume_index")
    src = read_source(built.corpus_dir)
    half = set(range(5))
    m1 = build_index(src, index_dir, cfg, only_parts=half)
    done_after_first = {k for k, v in m1["partitions"].items()
                        if v["status"] == "done"}
    assert 0 < len(done_after_first) <= len(half)
    mtimes = {
        k: os.path.getmtime(os.path.join(index_dir, v["path"]))
        for k, v in m1["partitions"].items()
    }
    m2 = build_index(src, index_dir, cfg)
    assert m2["complete"] is True
    # completed partitions were not rewritten
    for k in done_after_first:
        path = os.path.join(index_dir, m2["partitions"][k]["path"])
        assert os.path.getmtime(path) == mtimes[k]
    eng = QueryEngine(index_dir, cfg)
    for q in ("queue71", "py org2", "src/module_96/file_25.py"):
        got = eng.search(q, top_k=10)
        want = oracle_search(built.oracle, q, top_k=10)
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], abs=1e-9)


def test_resume_mid_docstore(built, tmp_path):
    """Kill-mid-docstore resume: first run writes only a subset of docstore
    partitions (crash simulation via only_parts), the resume writes exactly
    the missing ones — byte-identical to a one-shot build, no duplicated
    doc rows (the round-1 dirty-docstore hazard)."""
    cfg = IndexConfig(num_partitions=8, num_length_partitions=2)
    src = read_source(built.corpus_dir)
    total = cfg.num_partitions + cfg.num_length_partitions
    ds_ids = set(range(total, total + cfg.num_docstore_partitions))

    # crash run: all postings parts + only 3 docstore parts
    crash_dir = str(tmp_path / "crash_index")
    subset = set(range(total)) | set(sorted(ds_ids)[:3])
    m1 = build_index(src, crash_dir, cfg, only_parts=subset)
    assert m1["docstore_done"] is False
    done_ds = {int(k) for k, v in m1["partitions"].items()
               if v["kind"] == "docstore"}
    assert done_ds <= set(sorted(ds_ids)[:3]) and done_ds
    mtimes = {k: os.path.getmtime(os.path.join(crash_dir, v["path"]))
              for k, v in m1["partitions"].items() if v["kind"] == "docstore"}

    m2 = build_index(src, crash_dir, cfg)
    assert m2["docstore_done"] is True and m2["complete"] is True
    # finished docstore partitions were not rewritten
    for k, t in mtimes.items():
        assert os.path.getmtime(
            os.path.join(crash_dir, m2["partitions"][k]["path"])) == t

    # byte-identical docstore vs a one-shot build, and no duplicate rows
    oneshot_dir = str(tmp_path / "oneshot_index")
    build_index(src, oneshot_dir, cfg)
    a = _read_dir(os.path.join(crash_dir, "docstore"))
    b = _read_dir(os.path.join(oneshot_dir, "docstore"))
    assert a.equals(b)
    ids = a["doc_id"].to_numpy(zero_copy_only=False)
    assert np.unique(ids).size == ids.size == len(built.table)


def test_docstore_and_lengths_files_cover_disjoint_ranges(built):
    """Range-partitioning contract: each docstore AND lengths file covers
    a disjoint doc_id RANGE (whole-file pruning for lazy_docstore and
    doc-range shards relies on it)."""
    for sub in ("docstore", "lengths"):
        files = sorted(glob.glob(os.path.join(built.index_dir, sub,
                                              "*.parquet")))
        assert len(files) > 1, sub
        prev_max = -1
        for f in files:
            t = pq.read_table(f, columns=["doc_id"])
            ids = t["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            assert int(ids.min()) > prev_max, (sub, f)
            prev_max = int(ids.max())


def test_incompatible_index_refused_loudly(built, tmp_path):
    """Format guards: an index whose manifest declares a different codec
    version or lengths layout must be refused at load with a clear error
    (silent misreads would corrupt results)."""
    import json
    import shutil
    import pytest as pt
    from searchengine_ray.state.manifest import load_manifest, save_manifest
    for key, value, match in (("codec_version", 1, "codec"),
                              ("stemmer", "porter", "stemmer")):
        dmg = str(tmp_path / f"tampered_{key}")
        shutil.copytree(built.index_dir, dmg)
        m = load_manifest(dmg)
        m[key] = value
        save_manifest(dmg, m)
        with pt.raises(ValueError, match=match):
            QueryEngine(dmg, built.cfg)
        # resume onto the tampered layout refuses too
        from searchengine_ray.build import build_index
        from searchengine_ray.sources.corpus import read_source
        with pt.raises(ValueError, match="resume mismatch"):
            build_index(read_source(built.corpus_dir), dmg, built.cfg)


def test_completed_build_is_noop_on_rebuild(built):
    m = load_manifest(built.index_dir)
    m2 = build_index(read_source(built.corpus_dir), built.index_dir,
                     built.cfg)
    assert m2 == m


def test_partition_count_invariance(built, tmp_path):
    """Results must be identical with a different shuffle width
    (SURVEY.md §5.5)."""
    cfg = IndexConfig(num_partitions=3, num_length_partitions=1)
    index_dir = str(tmp_path / "p3_index")
    build_index(read_source(built.corpus_dir), index_dir, cfg)
    eng = QueryEngine(index_dir, cfg)
    for q in ("queue71", "py org2", "tokenStream", "java parse"):
        got = eng.search(q, top_k=10)
        want = oracle_search(built.oracle, q, top_k=10)
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], abs=1e-9)


def test_no_salting_still_correct(built, tmp_path):
    cfg = IndexConfig(num_partitions=4, num_length_partitions=1)
    index_dir = str(tmp_path / "nosalt_index")
    build_index(read_source(built.corpus_dir), index_dir, cfg,
                salt_hot_terms=False)
    eng = QueryEngine(index_dir, cfg)
    got = eng.search("py org2", top_k=10)
    want = oracle_search(built.oracle, "py org2", top_k=10)
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]


def test_null_fields_normalized(ray_session, tmp_path):
    """Per-row error policy (SURVEY.md §4): null key/content fields are
    normalized to "" — rows are indexed deterministically, never dropped."""
    import pyarrow as pa
    import ray.data
    from searchengine_ray.build import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query import QueryEngine

    t = pa.table({
        "repo": pa.array(["r1", None, "r3"], type=pa.string()),
        "path": pa.array(["a.py", "b.py", None], type=pa.string()),
        "commit": pa.array(["c", "c", "c"], type=pa.string()),
        "lang": pa.array(["py", None, "py"], type=pa.string()),
        "content": pa.array(["alpha beta", None, "gamma delta"],
                            type=pa.string()),
    })
    cfg = IndexConfig(num_partitions=4, num_length_partitions=2)
    idx = str(tmp_path / "idx")
    m = build_index(ray.data.from_arrow(t), idx, cfg, salt_hot_terms=False)
    assert m["num_docs"] == 3
    eng = QueryEngine(idx, cfg)
    assert eng.search("alpha")[0]["url"] == "r1/a.py@c"
    assert eng.search("gamma")[0]["url"] == "r3/@c"  # null path -> ""


def test_adversarial_skew_salting_bounds_partitions(ray_session, tmp_path):
    """Adversarial skew: one term in EVERY doc. Salting must spread that
    term's postings across sub-partitions (no single partition holds the
    whole hot list), and merged query-side postings must stay exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from searchengine_ray.build import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query import QueryEngine

    n = 600
    rng = np.random.default_rng(5)
    texts = [f"megahot filler{rng.integers(0, 50)} w{rng.integers(0, 9)}"
             for _ in range(n)]
    t = pa.table({
        "repo": pa.array([f"r{i % 5}" for i in range(n)]),
        "path": pa.array([f"f{i}.py" for i in range(n)]),
        "commit": pa.array(["c"] * n),
        "lang": pa.array(["py"] * n),
        "content": pa.array(texts),
    })
    cfg = IndexConfig(num_partitions=16, num_length_partitions=2,
                      hot_term_df_ratio=0.05)
    idx = str(tmp_path / "idx")
    m = build_index(ray.data.from_arrow(t), idx, cfg)
    assert "megahot" in m["hot_terms"] and m["hot_terms"]["megahot"] >= 2
    # the hot term's rows are spread: no single segment partition holds
    # all n postings
    seg_rows = [e["rows"] for e in m["partitions"].values()
                if e["kind"] == "segment"]
    assert max(seg_rows) < n + 0.5 * n  # every doc also has ~4 other terms
    eng = QueryEngine(idx, cfg)
    post = eng.postings("megahot")
    assert post is not None and post[0].size == n  # merged list is complete
    assert (np.diff(post[0]) > 0).all()
    # df>N/2 → idf clamps → hot term alone returns nothing (reference rule)
    assert eng.search("megahot") == []
    # mixed query still ranks by the rare term exactly: every hit's
    # content contains filler7 (the only positive-idf term)
    r = eng.search("megahot filler7")
    assert r
    texts_by_url = {f"r{i % 5}/f{i}.py@c": texts[i] for i in range(n)}
    assert all("filler7" in texts_by_url[x["url"]] for x in r)


def test_build_is_deterministic(ray_session, tmp_path):
    """Same input → byte-identical segments and equal manifests across two
    independent builds (no wall-clock, no unseeded randomness, stable
    hashes — SURVEY.md §7 hard part 5)."""
    import glob
    import pyarrow.parquet as pq
    import ray.data
    from searchengine_ray.build import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.sources.corpus import generate_corpus_table

    t = generate_corpus_table(250, seed=9)
    cfg = IndexConfig(num_partitions=8, num_length_partitions=2)
    m1 = build_index(ray.data.from_arrow(t), str(tmp_path / "a"), cfg)
    m2 = build_index(ray.data.from_arrow(t), str(tmp_path / "b"), cfg)
    for k in ("num_docs", "num_terms", "avg_doc_len", "hot_terms"):
        assert m1[k] == m2[k], k
    segs_a = sorted(glob.glob(str(tmp_path / "a" / "segments" / "*.parquet")))
    segs_b = sorted(glob.glob(str(tmp_path / "b" / "segments" / "*.parquet")))
    assert [s.split("/")[-1] for s in segs_a] == \
           [s.split("/")[-1] for s in segs_b]
    for fa, fb in zip(segs_a, segs_b):
        assert pq.read_table(fa).equals(pq.read_table(fb)), fa


def test_resume_config_mismatch_raises(ray_session, tmp_path):
    """Resuming onto an index built with a different partition layout must
    refuse (it would mix two partition numberings)."""
    import pyarrow as pa
    import pytest as pt
    import ray.data
    t = pa.table({"repo": ["r"], "path": ["a.py"], "commit": ["c"],
                  "lang": ["py"], "content": ["alpha beta gamma"]})
    idx = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(t), idx,
                IndexConfig(num_partitions=4, num_length_partitions=2),
                salt_hot_terms=False)
    with pt.raises(ValueError, match="resume mismatch"):
        build_index(ray.data.from_arrow(t), idx,
                    IndexConfig(num_partitions=8, num_length_partitions=2),
                    salt_hot_terms=False)
    # resume=False rebuilds cleanly with the new layout
    m = build_index(ray.data.from_arrow(t), idx,
                    IndexConfig(num_partitions=8, num_length_partitions=2),
                    resume=False, salt_hot_terms=False)
    assert m["num_partitions"] == 8 and m["complete"]


def test_no_resume_clears_stale_artifacts(ray_session, tmp_path):
    """A resume=False rebuild on a different corpus must not resurrect the
    old corpus's partition files (ghost documents)."""
    import pyarrow as pa
    import ray.data
    cfg = IndexConfig(num_partitions=4, num_length_partitions=2)
    idx = str(tmp_path / "idx")
    a = pa.table({"repo": ["rA"], "path": ["a.py"], "commit": ["c"],
                  "lang": ["py"], "content": ["ghostterm alpha"]})
    b = pa.table({"repo": ["rB"] * 3, "path": ["b.py", "c.py", "d.py"],
                  "commit": ["c"] * 3, "lang": ["py"] * 3,
                  "content": ["beta gamma", "delta one", "epsilon two"]})
    build_index(ray.data.from_arrow(a), idx, cfg, salt_hot_terms=False)
    m = build_index(ray.data.from_arrow(b), idx, cfg, resume=False,
                    salt_hot_terms=False)
    assert m["num_docs"] == 3
    eng = QueryEngine(idx, cfg)
    assert eng.search("ghostterm") == []
    assert eng.search("beta")[0]["url"] == "rB/b.py@c"


def test_search_topk_zero_and_page_clamp(built):
    eng = QueryEngine(built.index_dir, built.cfg)
    assert eng.search("queue71", top_k=0) == []
    p0 = eng.search_page("py org2", page=0, per_page=5)
    p1 = eng.search_page("py org2", page=1, per_page=5)
    assert p0["results"] == p1["results"] and p0["page"] == 1


def test_delta_ingest_filter_and_federation(built, tmp_path):
    """Incremental ingestion: filter_new_docs drops every already-indexed
    content (exact 32-byte sha anti-join) AND collapses in-batch dupes;
    build_delta_index over a superset corpus indexes exactly the new
    docs; base+delta federate/merge into the same answers as a one-shot
    build over the full corpus."""
    import pyarrow as pa
    import ray.data
    from searchengine_ray.build import build_delta_index, filter_new_docs
    from searchengine_ray.merge import merge_indexes
    from searchengine_ray.query import FederatedQueryEngine, QueryEngine
    from searchengine_ray.sources.corpus import read_source, write_corpus

    # same seed + rows_per_file as the fixture → the first 400 docs are
    # byte-identical; docs 400..499 are new
    big_dir = str(tmp_path / "corpus_big")
    write_corpus(big_dir, 500, rows_per_file=100)
    src = read_source(big_dir)

    fresh = filter_new_docs(src, built.index_dir)
    paths = sorted(r["path"] for r in fresh.take_all())
    base_paths = set(built.table["path"].to_pylist())
    assert len(paths) == 100 and not (set(paths) & base_paths)

    # in-batch duplicates collapse to ONE row (min doc_key)
    dup = pa.table({
        "repo": pa.array(["r"] * 3), "path": pa.array(["b.py", "a.py", "c.py"]),
        "commit": pa.array(["0" * 40] * 3), "lang": pa.array(["py"] * 3),
        "content": pa.array(["brandnewcontent_zzz"] * 3,
                            type=pa.large_string()),
    })
    got = filter_new_docs(ray.data.from_arrow(dup),
                          built.index_dir).take_all()
    assert [r["path"] for r in got] == ["a.py"]

    delta_dir = str(tmp_path / "delta_idx")
    m = build_delta_index(src, built.index_dir, delta_dir, built.cfg)
    assert m["num_docs"] == 100

    fed = FederatedQueryEngine([QueryEngine(built.index_dir, built.cfg),
                                QueryEngine(delta_dir, built.cfg)])
    merged_dir = str(tmp_path / "merged_idx")
    merge_indexes([built.index_dir, delta_dir], merged_dir, built.cfg,
                  concurrency=(1, 2))
    merged = QueryEngine(merged_dir, built.cfg)
    from searchengine_ray.build import build_index
    full_dir = str(tmp_path / "full_idx")
    build_index(read_source(big_dir), full_dir, built.cfg)
    full = QueryEngine(full_dir, built.cfg)
    for q in ("queue71", "py org2", "java parse"):
        f = fed.search(q, top_k=10)
        assert f == merged.search(q, top_k=10), q           # bit-identical
        g = full.search(q, top_k=10)                        # rank-identical
        assert [r["doc_id"] for r in f] == [r["doc_id"] for r in g], q
        assert [round(r["score"], 9) for r in f] == \
            [round(r["score"], 9) for r in g], q

    # idempotent: a second delta pass against base+merged finds nothing
    again = filter_new_docs(src, merged_dir).take_all()
    assert again == []


def test_cli_build_delta_against(built, tmp_path, capsys):
    from searchengine_ray import cli
    from searchengine_ray.sources.corpus import write_corpus
    big_dir = str(tmp_path / "corpus_big_cli")
    write_corpus(big_dir, 450, rows_per_file=100)
    rc = cli.main(["build", "--source", big_dir,
                   "--index", str(tmp_path / "delta_cli"),
                   "--partitions", "8",
                   "--delta-against", built.index_dir])
    assert rc == 0
    import json
    out = json.loads(capsys.readouterr().out)
    assert out["num_docs"] == 50 and out["complete"]
