"""Stable hashing for doc ids, term partitioning and content invariants.

The reference identifies documents by ``md5(url)`` hex strings
(/root/reference/search_engine/crawler/crawler.py:79-83). Here doc ids are
unsigned 64-bit blake2b digests of the doc key ``repo/path@commit`` — fixed
width, sortable, numpy-friendly for the query-time scoring kernels. Never
Python's salted ``hash()`` (SURVEY.md §7 hard part 5: determinism across
processes/runs). At 10^12 docs a 64-bit space has non-negligible birthday
collision mass; the scale path widens doc_id to two uint64 columns — the
layout and codec below are width-agnostic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def hash64(s: str) -> int:
    """Stable uint64 of a string (blake2b-8, big-endian)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def hash64_array(strings) -> np.ndarray:
    """Vectorized-ish uint64 hash of a string sequence.

    Hashes each *distinct* value once via dictionary encoding — term columns
    are highly repetitive within a batch, so this is O(unique) Python work.
    """
    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        dic = strings.combine_chunks().dictionary_encode() if isinstance(
            strings, pa.ChunkedArray) else strings.dictionary_encode()
        uniq = dic.dictionary.to_pylist()
        codes = dic.indices.to_numpy(zero_copy_only=False)
        table = np.fromiter((hash64(u) for u in uniq), dtype=np.uint64, count=len(uniq))
        return table[codes]
    return np.fromiter((hash64(s) for s in strings), dtype=np.uint64, count=len(strings))


def sha256_array(strings) -> list[bytes]:
    """Per-row sha256(content) digests — the per-row invariant vs the source
    table (BASELINE.json input_hint)."""
    if isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = strings.to_pylist()
    return [hashlib.sha256((s or "").encode("utf-8")).digest() for s in strings]
