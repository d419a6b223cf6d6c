"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

All logic lives in ``searchengine_ray.pipelines.driver_api``; nothing here
(or there) calls ray.init()/ray.shutdown() — the driver owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the streaming
    inverted index over the adapted documents table, serve the fixed BM25
    query set, return the ranked results as a pandas DataFrame."""
    from searchengine_ray.pipelines.driver_api import flagship
    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2 + the
    training-data extension family: dedup, similarity search, multimodal,
    text analysis)."""
    from searchengine_ray.pipelines.driver_api import build_queries
    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (column names in lockstep). EVERY
    queries() entry has an exact oracle — the approximate/iterative ones
    (ANN, banded LSH, k-means IVF, connected components) via the rounded-
    arithmetic discipline and WITH RECURSIVE restatements."""
    from searchengine_ray.pipelines.driver_api import build_oracles
    return build_oracles()
