"""Multimodal column plumbing — binary payloads + actor-pool feature stages.

Design for image/audio/video at 100 TB: payloads are opaque ``binary``
columns with typed metadata travelling alongside (modality, nominal size).
Decode / feature-extraction runs as an ACTOR-POOL ``map_batches`` stage
(callable class: expensive setup once per actor in ``__init__``, per-batch
work in ``__call__`` — SURVEY.md §2.4 ST2 pattern), with small
``batch_size`` so batch × concurrency of multi-MB payloads fits worker
heaps.

The real decoders (PIL/ffmpeg/torchvision) are NOT in this container, so
``decode_image``/``decode_audio`` are clearly-marked stubs raising
NotImplementedError; the *deterministic fake* featurizer exercises the full
Ray-side plumbing (schema, actor signature, batch sizing, output layout)
and is what tests and the driver check.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

FEATURE_DIM = 8


def decode_image(blob: bytes) -> "np.ndarray":
    """STUB — image decode requires PIL/libjpeg, absent in this environment.
    The production stage plugs the real decoder into DecodeFeatures below
    (same signature, same actor-pool slot)."""
    raise NotImplementedError("image decode requires PIL; not available here")


def decode_audio(blob: bytes) -> "np.ndarray":
    """STUB — audio decode requires ffmpeg/soundfile, absent here."""
    raise NotImplementedError("audio decode requires ffmpeg; not available here")


def pack_blobs(ds: "ray.data.Dataset", text_col: str = "text",
               id_col: str = "doc_id") -> "ray.data.Dataset":
    """Materialize an opaque binary payload column + typed metadata.

    (Stand-in for reading real media files: the payload is the utf-8 bytes
    of the text column — deterministic, so the downstream feature checksums
    are SQL-checkable.) Columns: doc_id:int64, blob:binary,
    modality:string, blob_len:int64.
    """
    def fn(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch[text_col], pa.string())
        blob = pc.cast(text, pa.binary())
        return pa.table({
            "doc_id": pc.cast(batch[id_col], pa.int64()),
            "blob": blob,
            "modality": pa.array(["text"] * len(batch), type=pa.string()),
            "blob_len": pc.cast(pc.binary_length(blob), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


class DecodeFeatures:
    """Actor-pool featurizer: deterministic fake 'decode' producing a
    FEATURE_DIM uint8 feature vector per payload (the first FEATURE_DIM
    bytes of sha256(blob)) plus integrity metadata.

    __init__ = the once-per-actor model-load slot (here: nothing heavy, but
    the pattern — pass this class to ``map_batches(DecodeFeatures,
    concurrency=N, batch_size=B)`` — is exactly how the real decoder runs).
    """

    def __init__(self, modality: str = "text"):
        self.modality = modality
        self._calls = 0  # actor-lifetime state (visible in tests)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._calls += 1
        blobs = batch["blob"].to_pylist()
        digests = [hashlib.sha256(b or b"").digest() for b in blobs]
        feats = np.frombuffer(b"".join(d[:FEATURE_DIM] for d in digests),
                              dtype=np.uint8).reshape(len(blobs), FEATURE_DIM)
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "blob_len": pc.cast(batch["blob_len"], pa.int64()),
            "blob_sha256": pa.array([d.hex() for d in digests], type=pa.string()),
            "feature": pa.array(feats.astype(np.int64).tolist(),
                                type=pa.list_(pa.int64())),
            "feat_checksum": pa.array(feats.sum(axis=1).astype(np.int64)),
        })


def multimodal_features(ds: "ray.data.Dataset", *, concurrency: int = 2,
                        batch_size: int = 64) -> "ray.data.Dataset":
    """pack → actor-pool featurize. Small batch_size: with real multi-MB
    payloads, batch × concurrency must fit in a worker heap."""
    packed = pack_blobs(ds)
    return packed.map_batches(DecodeFeatures, concurrency=concurrency,
                              batch_size=batch_size, batch_format="pyarrow")


def feature_summary(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Flat, SQL-comparable projection of multimodal_features (drops the
    list column): doc_id, blob_len, blob_sha256, feat_checksum."""
    feats = multimodal_features(ds)
    return feats.map_batches(
        lambda b: b.select(["doc_id", "blob_len", "blob_sha256",
                            "feat_checksum"]),
        batch_format="pyarrow")
