"""Filesystem ingestion source (crawler-slot analogue, SURVEY.md §2.1 S1)."""

from __future__ import annotations

import os


def make_tree(root):
    os.makedirs(os.path.join(root, "src", "sub"))
    os.makedirs(os.path.join(root, ".git"))
    with open(os.path.join(root, "src", "main.py"), "w") as f:
        f.write("def parseToken(stream):\n    return stream.hashMap\n")
    with open(os.path.join(root, "src", "sub", "util.rs"), "w") as f:
        f.write("fn merge_sort() {}\n")
    with open(os.path.join(root, "README.md"), "w") as f:
        f.write("# engine docs\n")
    with open(os.path.join(root, "src", "bad.py"), "wb") as f:
        f.write(b"x = '\xff\xfe broken'\n")          # invalid utf-8
    with open(os.path.join(root, "big.js"), "w") as f:
        f.write("x" * 2048)                          # oversized (cap below)
    with open(os.path.join(root, ".git", "HEAD"), "w") as f:
        f.write("ref: refs/heads/main\n")            # skipped dir
    with open(os.path.join(root, "binary.so"), "wb") as f:
        f.write(b"\x7fELF")                          # unknown extension


def test_ingest_tree_and_index_end_to_end(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from searchengine_ray.build import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query import QueryEngine
    from searchengine_ray.sources.corpus import read_source
    from searchengine_ray.sources.ingest import ingest_tree, tree_fingerprint

    root = str(tmp_path / "checkout")
    make_tree(root)
    out = str(tmp_path / "corpus")
    stats = ingest_tree(root, out, max_file_bytes=1024)
    assert stats["files_ingested"] == 4          # main.py util.rs README bad.py
    assert stats["files_skipped"] == 1           # big.js over cap
    assert len(stats["commit"]) == 40

    t = pq.read_table(out)
    rows = {r["path"]: r for r in t.to_pylist()}
    assert set(rows) == {"src/main.py", "src/sub/util.rs", "README.md",
                         "src/bad.py"}
    assert rows["src/main.py"]["lang"] == "python"
    assert rows["src/sub/util.rs"]["lang"] == "rust"
    assert "�" in rows["src/bad.py"]["content"]   # replacement policy
    assert all(r["commit"] == stats["commit"] for r in rows.values())

    # deterministic fingerprint for an unchanged tree
    from searchengine_ray.sources.ingest import discover_files
    assert tree_fingerprint(root, discover_files(root)) == stats["commit"]

    # end-to-end: ingested corpus → index → query
    cfg = IndexConfig(num_partitions=4, num_length_partitions=2)
    idx = str(tmp_path / "idx")
    m = build_index(read_source(out), idx, cfg, salt_hot_terms=False)
    assert m["num_docs"] == 4
    eng = QueryEngine(idx, cfg)
    hits = eng.search("parseToken")
    assert hits and hits[0]["title"] == "src/main.py"
    assert eng.search("mergeSort")[0]["title"] == "src/sub/util.rs"


def test_cli_ingest(ray_session, tmp_path, capsys):
    import json
    from searchengine_ray import cli
    root = str(tmp_path / "tree")
    make_tree(root)
    rc = cli.main(["ingest", "--root", root, "--out", str(tmp_path / "out"),
                   "--repo", "demo", "--max-file-bytes", "1024"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["files_ingested"] == 4 and stats["repo"] == "demo"


def test_full_user_story(ray_session, tmp_path):
    """The complete lifecycle a reference user would run, chained: ingest
    two checkouts → build a base index + a delta → merge → embeddings →
    BM25 + hybrid + paginated queries → artifact verification."""
    import os
    from searchengine_ray.build import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.merge import merge_indexes
    from searchengine_ray.pipelines.embeddings import build_doc_embeddings
    from searchengine_ray.query import QueryEngine
    from searchengine_ray.sources.corpus import read_source
    from searchengine_ray.sources.ingest import ingest_tree
    from searchengine_ray.verify_index import verify_index

    # two "repos"
    r1 = str(tmp_path / "repo1")
    os.makedirs(os.path.join(r1, "src"))
    with open(os.path.join(r1, "src", "engine.py"), "w") as f:
        f.write("class QueryEngine:\n    def searchIndex(self): pass\n")
    with open(os.path.join(r1, "src", "codec.py"), "w") as f:
        f.write("def varbyte_encode(values): pass\n")
    for i in range(4):  # filler so test terms stay under the df>N/2 clamp
        with open(os.path.join(r1, "src", f"filler{i}.py"), "w") as f:
            f.write(f"helper{i} = {i}  # misc module\n")
    r2 = str(tmp_path / "repo2")
    os.makedirs(r2)
    with open(os.path.join(r2, "notes.md"), "w") as f:
        f.write("# varbyte posting lists\nblock max metadata\n")

    c1 = str(tmp_path / "c1")
    c2 = str(tmp_path / "c2")
    assert ingest_tree(r1, c1)["files_ingested"] == 6
    assert ingest_tree(r2, c2)["files_ingested"] == 1

    cfg = IndexConfig(num_partitions=4, num_length_partitions=2)
    i1 = str(tmp_path / "i1")
    i2 = str(tmp_path / "i2")
    merged = str(tmp_path / "merged")
    m1 = build_index(read_source(c1), i1, cfg, salt_hot_terms=False)
    build_index(read_source(c2), i2, cfg,
                hot_terms_override=m1["hot_terms"])
    mm = merge_indexes([i1, i2], merged, cfg, concurrency=(1, 2))
    assert mm["num_docs"] == 7
    build_doc_embeddings(merged)

    eng = QueryEngine(merged, cfg)
    hits = eng.search("varbyte")
    assert {h["title"] for h in hits} == {"src/codec.py", "notes.md"}
    assert eng.search("searchIndex")[0]["title"] == "src/engine.py"
    page = eng.search_page("varbyte", page=1, per_page=1)
    assert page["total_results"] == 2 and len(page["results"]) == 1
    hyb = eng.hybrid_search("varbyte posting", 5)
    assert hyb and hyb[0]["search_method"] == "Hybrid BM25+Embedding"

    rep = verify_index(merged)
    assert rep["ok"] and rep["has_embeddings"], rep["problems"]
