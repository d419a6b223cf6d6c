"""Posting-list codec: docID-delta varbyte + weighted-tf + block-max metadata.

The reference stores postings as pickled Python ``(doc_id_str, float)`` tuple
lists (/root/reference/search_engine/indexer/indexer.py:247-248). Here each
term's postings are doc_id-sorted, delta-encoded and varbyte-compressed
(classic 7-bit little-endian groups, MSB = continuation), with weighted tf as
a parallel float32 array and per-block max-tf metadata for block-max WAND
pruning (north star). Encode and decode are numpy-vectorized — the inner
loop is over byte-position (≤10), never over postings.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE_DEFAULT = 128


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array; each value as little-endian 7-bit groups with
    MSB set on all but the final byte."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    nbytes = np.ones(a.size, dtype=np.int64)
    v = a >> np.uint64(7)
    while v.any():
        nbytes += (v > 0)
        v >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_len = int(nbytes.max())
    for k in range(max_len):
        sel = nbytes > k
        byte = ((a[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] - 1 > k)
        byte[cont] |= np.uint8(0x80)
        out[starts[sel] + k] = byte
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Inverse of varbyte_encode; returns uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero(b < 128)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    for k in range(int(lengths.max())):
        sel = lengths > k
        out[sel] |= (b[starts[sel] + k] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return out


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode one term's postings. ``doc_ids`` must be sorted ascending
    uint64 (the build sorts (term, doc_id) before encoding — SURVEY.md §2.11:
    BM25 is order-insensitive, so sorted postings preserve scores exactly
    while enabling delta coding and WAND)."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    deltas = np.empty_like(ids)
    if ids.size:
        deltas[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    vb = varbyte_encode(deltas)
    tf32 = np.ascontiguousarray(tfs, dtype=np.float32)
    header = np.array([ids.size, len(vb)], dtype=np.uint32).tobytes()
    return header + vb + tf32.tobytes()


def decode_postings(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode to (doc_ids ascending uint64, tf float32)."""
    n, vb_len = np.frombuffer(buf[:8], dtype=np.uint32)
    deltas = varbyte_decode(buf[8:8 + int(vb_len)])
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    tfs = np.frombuffer(buf[8 + int(vb_len):], dtype=np.float32)
    assert doc_ids.size == int(n) and tfs.size == int(n)
    return doc_ids, tfs


def encode_postings_batch(doc_ids: np.ndarray, tfs: np.ndarray,
                          starts: np.ndarray, ends: np.ndarray
                          ) -> list[bytes]:
    """Encode MANY terms' postings in one vectorized pass.

    ``doc_ids``/``tfs`` are the concatenated per-term runs (each run sorted
    ascending by doc_id); ``starts``/``ends`` delimit runs. Byte-identical
    to ``encode_postings`` per run (property-tested) — the delta/varbyte
    math runs once over the whole partition; the per-term loop only slices.
    """
    ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    n = ids.size
    if n == 0:
        return []
    deltas = np.empty_like(ids)
    deltas[1:] = ids[1:] - ids[:-1]
    deltas[starts] = ids[starts]
    nbytes = np.ones(n, dtype=np.int64)
    v = deltas >> np.uint64(7)
    while v.any():
        nbytes += (v > 0)
        v >>= np.uint64(7)
    vends = np.cumsum(nbytes)
    vstarts = vends - nbytes
    out = np.zeros(int(vends[-1]), dtype=np.uint8)
    for k in range(int(nbytes.max())):
        sel = nbytes > k
        byte = ((deltas[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] - 1 > k)
        byte[cont] |= np.uint8(0x80)
        out[vstarts[sel] + k] = byte
    vb_all = out.tobytes()
    tf_all = np.ascontiguousarray(tfs, dtype=np.float32).tobytes()
    term_vs = vstarts[starts]
    term_ve = np.concatenate([vstarts[starts[1:]], [int(vends[-1])]])
    counts = (ends - starts).astype(np.uint32)
    vb_lens = (term_ve - term_vs).astype(np.uint32)
    headers = np.stack([counts, vb_lens], axis=1).astype("<u4").tobytes()
    res = []
    for i in range(len(starts)):
        res.append(headers[8 * i:8 * i + 8]
                   + vb_all[term_vs[i]:term_ve[i]]
                   + tf_all[4 * starts[i]:4 * ends[i]])
    return res


def block_max_tf_batch(tfs: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                       block_size: int = BLOCK_SIZE_DEFAULT) -> list[bytes]:
    """Per-term block-max metadata for many contiguous runs in one
    ``np.maximum.reduceat`` (runs must tile the array)."""
    t = np.ascontiguousarray(tfs, dtype=np.float32)
    if t.size == 0:
        return []
    counts = ends - starts
    nblocks = (counts + block_size - 1) // block_size
    offsets = np.concatenate([[0], np.cumsum(nblocks)])
    term_of_block = np.repeat(np.arange(len(starts)), nblocks)
    j = np.arange(int(offsets[-1])) - offsets[term_of_block]
    bstarts = starts[term_of_block] + block_size * j
    bmax = np.maximum.reduceat(t, bstarts)
    return [bmax[offsets[i]:offsets[i + 1]].tobytes()
            for i in range(len(starts))]


def block_max_tf(tfs: np.ndarray, block_size: int = BLOCK_SIZE_DEFAULT) -> bytes:
    """Per-block (``block_size`` postings) max weighted tf, float32.

    Query-time upper bound per block: tf_component is increasing in tf and
    decreasing in doc_len, so ``(k1+1)·maxtf / (k1·(1-b) + maxtf)`` (doc_len→0
    limit) is an admissible bound without storing lengths."""
    t = np.ascontiguousarray(tfs, dtype=np.float32)
    if t.size == 0:
        return b""
    nblocks = (t.size + block_size - 1) // block_size
    pad = nblocks * block_size - t.size
    if pad:
        t = np.concatenate([t, np.full(pad, -np.inf, dtype=np.float32)])
    return t.reshape(nblocks, block_size).max(axis=1).tobytes()


def decode_block_max(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.float32)
