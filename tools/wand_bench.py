"""Block-max WAND evidence at bench scale: base-tier skip ratio +
latency vs the exhaustive scorer on the 96k-doc synthetic corpus.

Usage:  python tools/wand_bench.py [--docs 96000] [--top-k 20]

Builds (or reuses) the bench index, picks the highest-df scorable terms
(df < N/2 — the longest posting lists, where selective decode matters),
and for each runs `search_wand_base` (stats-instrumented) against a
brute base-score top-k computed from `_score_candidates`. Asserts
result equality, prints one JSON line with per-term block counts and
wall times. The boosted path is also timed for reference (its ceiling
rarely skips — wand.py documents why).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int,
                    default=int(os.environ.get("SERAY_BENCH_DOCS", "96000")))
    ap.add_argument("--top-k", type=int, default=20)
    ap.add_argument("--terms", type=int, default=12)
    args = ap.parse_args()

    import numpy as np
    import ray
    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
        logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import bench
    index_dir = "/tmp/seray_bench_index"
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        bench.run_index_build(index_dir)
    from searchengine_ray.query import QueryEngine
    eng = QueryEngine(index_dir, bench._bench_cfg(),
                      preload_segments=True)

    # highest-df scorable terms = longest lists (idf must stay > 0)
    dic = eng._term_dictionary()
    t_col = dic["term"].to_pylist()
    d_col = dic["df"].to_numpy(zero_copy_only=False)
    order = np.argsort(-d_col)
    terms = []
    for i in order:
        t, df = t_col[int(i)], int(d_col[int(i)])
        if eng.N - df + 0.5 > df + 0.5:
            terms.append((t, df))
        if len(terms) >= args.terms:
            break

    rows = []
    tot_blocks = tot_decoded = 0
    for t, df in terms:
        stats: dict = {}
        t0 = time.perf_counter()
        got = eng.search_wand_base(t, top_k=args.top_k, stats=stats)
        wand_ms = (time.perf_counter() - t0) * 1000
        t0 = time.perf_counter()
        sc = eng._score_candidates(t)
        ids, scores = sc[0], sc[1]
        o = np.lexsort((ids, -scores))[:args.top_k]
        want = [(int(ids[i]), float(scores[i])) for i in o]
        brute_ms = (time.perf_counter() - t0) * 1000
        assert got == want, t
        tot_blocks += stats.get("blocks_total", 0)
        tot_decoded += stats.get("blocks_decoded", 0)
        rows.append({"term": t, "df": df,
                     "blocks": stats.get("blocks_total"),
                     "decoded": stats.get("blocks_decoded"),
                     "wand_ms": round(wand_ms, 2),
                     "brute_ms": round(brute_ms, 2)})
    # boosted-path identity at bench scale (the full reference ladder)
    boosted_checked = 0
    for q in bench.BM25_BENCH_QUERIES + [t for t, _ in terms[:6]]:
        assert eng.search_wand(q, top_k=args.top_k) == \
            eng.search(q, top_k=args.top_k), q
        boosted_checked += 1
    print(json.dumps({
        "metric": "block-max WAND base-tier skip ratio (bench corpus)",
        "docs": args.docs, "top_k": args.top_k,
        "blocks_total": tot_blocks, "blocks_decoded": tot_decoded,
        "skip_ratio": round(1 - tot_decoded / max(1, tot_blocks), 3),
        "boosted_identity_checked": boosted_checked,
        "terms": rows,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
