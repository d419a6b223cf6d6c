"""Multimodal column plumbing — binary payloads + actor-pool feature stages.

Design for image/audio/video at 100 TB: payloads are opaque ``binary``
columns with typed metadata travelling alongside (modality, nominal size).
Decode / feature-extraction runs as an ACTOR-POOL ``map_batches`` stage
(callable class: expensive setup once per actor in ``__init__``, per-batch
work in ``__call__`` — SURVEY.md §2.4 ST2 pattern), with small
``batch_size`` so batch × concurrency of multi-MB payloads fits worker
heaps.

Decoders are import-guarded, not stubbed wholesale: ``decode_audio`` is a
REAL stdlib ``wave`` decoder (PCM WAV works everywhere); ``decode_image``
natively decodes binary PPM (P6) with pure numpy and delegates every other
format to PIL when installed — where a format's library is absent it
raises NotImplementedError with the dependency named. The *deterministic
fake* featurizer (DecodeFeatures) remains the driver-checked path —
SQL-reproducible at any scale; ``MediaStats`` is the real-decode
actor-pool stage (same slot, modality-routed).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

FEATURE_DIM = 8


def _decode_ppm(blob: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8, pure numpy/stdlib."""
    # header: b"P6" <ws> width <ws> height <ws> maxval <single ws> raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":  # comment to end of line
            pos = blob.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # the single whitespace byte before the raster
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    raster = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3,
                           offset=pos)
    return raster.reshape(h, w, 3)


def decode_image(blob: bytes) -> np.ndarray:
    """Image payload → (h, w, 3) uint8 RGB array.

    Binary PPM (P6) decodes natively (pure numpy — always available);
    every other format delegates to PIL behind an import guard and raises
    NotImplementedError naming the missing dependency when PIL is not
    installed (it is absent in this sandbox; the deterministic-fake
    DecodeFeatures path keeps CI and the driver entry green)."""
    if blob[:2] == b"P6":
        return _decode_ppm(blob)
    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "image decode for non-PPM formats requires PIL (pip install "
            "pillow); not available here")
    import io
    with Image.open(io.BytesIO(blob)) as im:
        return np.asarray(im.convert("RGB"))


def _decode_error_types() -> tuple:
    """Exception classes a CORRUPT (not just unsupported) payload can
    raise out of the decoders: header parse failures (ValueError,
    struct.error, IndexError), truncated rasters (ValueError from
    frombuffer/reshape), wave container errors (wave.Error, EOFError),
    and file-ish IO errors. The skip-and-report stages catch exactly
    these — a genuine code bug (TypeError, AttributeError, ...) still
    propagates."""
    import struct
    import wave
    return (NotImplementedError, ValueError, IndexError, EOFError,
            OSError, struct.error, wave.Error)


_DECODE_ERRORS = _decode_error_types()


def decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    """Audio payload → ((frames, channels) int16 PCM, sample_rate).

    PCM WAV decodes with the stdlib ``wave`` module (real, everywhere);
    compressed formats would need ffmpeg/soundfile and raise
    NotImplementedError naming the dependency."""
    import io
    import wave
    if blob[:4] != b"RIFF":
        raise NotImplementedError(
            "audio decode for non-WAV formats requires ffmpeg/soundfile; "
            "not available here")
    with wave.open(io.BytesIO(blob), "rb") as wf:
        sw = wf.getsampwidth()
        if sw != 2:
            raise NotImplementedError(f"{8 * sw}-bit WAV unsupported "
                                      "(16-bit PCM only)")
        frames = np.frombuffer(wf.readframes(wf.getnframes()),
                               dtype="<i2")
        return frames.reshape(-1, wf.getnchannels()), wf.getframerate()


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


class MediaStats:
    """Real-decode actor-pool stage (same slot/signature as
    DecodeFeatures): routes each payload by its ``modality`` column
    through decode_image / decode_audio and emits per-item stats —
    images: (width, height, mean_q = round(1e4·mean(pixel))/1e4 as scaled
    int); audio: (sample_rate, n_frames as width/height slots, rms_q).
    Payloads whose decoder dependency is missing surface as
    ``decode_ok=false`` with the error string — a 100 TB run must skip
    and report, not die on, the odd undecodable blob."""

    def __init__(self):
        self._calls = 0  # once-per-actor init slot (real: model/codec load)

    @staticmethod
    def _one(blob: bytes, modality: str) -> tuple[int, int, int, bool, str]:
        try:
            if modality == "image":
                arr = decode_image(blob)
                h, w = arr.shape[0], arr.shape[1]
                return w, h, int(round(float(arr.mean()) * 10_000)), \
                    True, ""
            if modality == "audio":
                pcm, sr = decode_audio(blob)
                rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) \
                    if pcm.size else 0.0
                return sr, pcm.shape[0], int(round(rms * 10_000)), True, ""
            raise NotImplementedError(f"no decoder for modality "
                                      f"{modality!r}")
        except _DECODE_ERRORS as e:
            return 0, 0, 0, False, f"{type(e).__name__}: {e}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._calls += 1
        blobs = batch["blob"].to_pylist()
        modalities = batch["modality"].to_pylist()
        rows = [self._one(b or b"", m) for b, m in zip(blobs, modalities)]
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "modality": batch["modality"],
            "dim0": pa.array([r[0] for r in rows], type=pa.int64()),
            "dim1": pa.array([r[1] for r in rows], type=pa.int64()),
            "stat_q": pa.array([r[2] for r in rows], type=pa.int64()),
            "decode_ok": pa.array([r[3] for r in rows], type=pa.bool_()),
            "decode_err": pa.array([r[4] for r in rows], type=pa.string()),
        })


def media_stats(ds: "ray.data.Dataset", *, concurrency: int = 2,
                batch_size: int = 32) -> "ray.data.Dataset":
    """Real-decode stats over a packed multimodal dataset (doc_id, blob,
    modality columns). Small batch_size: multi-MB payloads × concurrency
    must fit worker heaps."""
    return ds.map_batches(MediaStats, concurrency=concurrency,
                          batch_size=batch_size, batch_format="pyarrow")


def multimodal_features(ds: "ray.data.Dataset", *, concurrency: int = 2,
                        batch_size: int = 64) -> "ray.data.Dataset":
    """pack → actor-pool featurize. Small batch_size: with real multi-MB
    payloads, batch × concurrency must fit in a worker heap."""
    packed = pack_blobs(ds)
    return packed.map_batches(DecodeFeatures, concurrency=concurrency,
                              batch_size=batch_size, batch_format="pyarrow")


def resize_image(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (h, w, c) → (out_h, out_w, c) — pure-numpy
    index gather (the PIL-free path; a real deployment swaps PIL/OpenCV
    into the same stage slot)."""
    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows][:, cols]


class ResizeImages:
    """Actor-pool resize stage: decode → nearest-neighbor resize →
    re-emit raw RGB bytes + dims. Undecodable payloads skip-and-report
    (decode_ok=false), like MediaStats."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rgb, ok, err = [], [], []
        for blob in batch["blob"].to_pylist():
            try:
                arr = resize_image(decode_image(blob or b""),
                                   self.out_w, self.out_h)
                out_rgb.append(arr.tobytes())
                ok.append(True)
                err.append("")
            except _DECODE_ERRORS as e:
                out_rgb.append(b"")
                ok.append(False)
                err.append(f"{type(e).__name__}: {e}")
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "rgb": pa.array(out_rgb, type=pa.binary()),
            "width": pa.array([self.out_w] * len(batch), type=pa.int64()),
            "height": pa.array([self.out_h] * len(batch), type=pa.int64()),
            "decode_ok": pa.array(ok, type=pa.bool_()),
            "decode_err": pa.array(err, type=pa.string()),
        })


def resize_images(ds: "ray.data.Dataset", out_w: int = 32, out_h: int = 32,
                  *, concurrency: int = 2,
                  batch_size: int = 32) -> "ray.data.Dataset":
    return ds.map_batches(ResizeImages, fn_constructor_args=(out_w, out_h),
                          concurrency=concurrency, batch_size=batch_size,
                          batch_format="pyarrow")


# --- trivial multi-frame container + frame sampling ------------------------
# A "video" here is the simplest possible real container: a header
# b"MJPG"-style magic + frame count, then n concatenated PPM frames. The
# production analogue (ffmpeg keyframe extraction) slots into the same
# actor-pool stage; the sampling/plumbing logic (stride selection, per-
# frame decode, output layout) is exactly what it would be there.
_VIDEO_MAGIC = b"SRAYV1"


def pack_video(frames: list[bytes]) -> bytes:
    import struct
    parts = [_VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        parts.append(struct.pack("<I", len(f)))
        parts.append(f)
    return b"".join(parts)


def iter_video_frames(blob: bytes):
    import struct
    if blob[:6] != _VIDEO_MAGIC:
        raise NotImplementedError(
            "video decode for real containers requires ffmpeg; not "
            "available here (SRAYV1 concatenated-PPM container only)")
    n = struct.unpack("<I", blob[6:10])[0]
    pos = 10
    for _ in range(n):
        ln = struct.unpack("<I", blob[pos:pos + 4])[0]
        pos += 4
        yield blob[pos:pos + ln]
        pos += ln


class SampleFrames:
    """Actor-pool frame-sampling stage: every ``stride``-th frame (always
    including frame 0) decodes through decode_image; one output ROW per
    sampled frame (doc_id, frame_idx, width, height, pixel_sum) — the
    flat layout a downstream feature/embedding stage consumes."""

    def __init__(self, stride: int = 4):
        assert stride >= 1
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, ws, hs, sums = [], [], [], [], []
        for doc_id, blob in zip(batch["doc_id"].to_pylist(),
                                batch["blob"].to_pylist()):
            mark = len(ids)
            try:
                for i, frame in enumerate(iter_video_frames(blob or b"")):
                    if i % self.stride:
                        continue
                    arr = decode_image(frame)
                    ids.append(doc_id)
                    fidx.append(i)
                    ws.append(arr.shape[1])
                    hs.append(arr.shape[0])
                    sums.append(int(arr.astype(np.int64).sum()))
            except _DECODE_ERRORS:
                # undecodable container/frame: drop the DOC's partial
                # frames — a 100 TB run must not die on one bad blob
                del ids[mark:], fidx[mark:], ws[mark:], hs[mark:], \
                    sums[mark:]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(fidx, type=pa.int64()),
            "width": pa.array(ws, type=pa.int64()),
            "height": pa.array(hs, type=pa.int64()),
            "pixel_sum": pa.array(sums, type=pa.int64()),
        })


def sample_frames(ds: "ray.data.Dataset", stride: int = 4, *,
                  concurrency: int = 2,
                  batch_size: int = 16) -> "ray.data.Dataset":
    """Frame-sample a packed video dataset (doc_id, blob). Small
    batch_size: a batch holds whole multi-frame payloads."""
    return ds.map_batches(SampleFrames, fn_constructor_args=(stride,),
                          concurrency=concurrency, batch_size=batch_size,
                          batch_format="pyarrow")


# --- deterministic real-container synthesis + decode (oracle-checkable) ---
# Payload CONTENT is a closed-form function of doc_id, so the decoded
# integer aggregates have an exact SQL twin; the CONTAINERS are real WAV/
# PPM bytes, so the decode path exercised is the production one.
SYNTH_AUDIO_FRAMES = 64
SYNTH_AUDIO_RATE = 8000
SYNTH_IMG_W, SYNTH_IMG_H = 5, 3  # 45 pixel bytes (odd count — see tests)


def _synth_audio_samples(doc_id: int) -> np.ndarray:
    i = np.arange(SYNTH_AUDIO_FRAMES, dtype=np.int64)
    return ((doc_id * 31 + i * 7) % 65536 - 32768).astype(np.int16)


def _synth_wav(doc_id: int) -> bytes:
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(SYNTH_AUDIO_RATE)
        wf.writeframes(_synth_audio_samples(doc_id).tobytes())
    return buf.getvalue()


def _synth_ppm(doc_id: int) -> bytes:
    j = np.arange(SYNTH_IMG_W * SYNTH_IMG_H * 3, dtype=np.int64)
    raster = ((doc_id + j) % 256).astype(np.uint8)
    return (f"P6\n{SYNTH_IMG_W} {SYNTH_IMG_H}\n255\n".encode()
            + raster.tobytes())


def synth_media(ds: "ray.data.Dataset",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Two payload rows per input row (one WAV, one PPM), content a
    closed-form function of doc_id. Columns: doc_id, blob, modality."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_col], pa.int64()).to_pylist()
        blobs, modality, out_ids = [], [], []
        for d in ids:
            blobs.append(_synth_wav(int(d)))
            modality.append("audio")
            out_ids.append(d)
            blobs.append(_synth_ppm(int(d)))
            modality.append("image")
            out_ids.append(d)
        return pa.table({
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "blob": pa.array(blobs, type=pa.binary()),
            "modality": pa.array(modality, type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


class DecodeIntStats:
    """Actor-pool REAL-decode stage with integer-exact output (the
    oracle-checkable twin of MediaStats): audio rows decode through the
    stdlib wave reader and emit sum(sample²); image rows decode through
    the PPM parser and emit sum(pixel bytes). All arithmetic is int64 —
    no float anywhere, so the SQL twin matches bit-for-bit."""

    def __init__(self):
        pass  # once-per-actor decoder/codec init slot

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_units, value_sum = [], []
        for blob, mod in zip(batch["blob"].to_pylist(),
                             batch["modality"].to_pylist()):
            if mod == "audio":
                pcm, _sr = decode_audio(blob)
                s = pcm.astype(np.int64)
                n_units.append(int(pcm.shape[0]))
                value_sum.append(int((s * s).sum()))
            else:
                arr = decode_image(blob)
                n_units.append(int(arr.size))
                value_sum.append(int(arr.astype(np.int64).sum()))
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "modality": batch["modality"],
            "n_units": pa.array(n_units, type=pa.int64()),
            "value_sum": pa.array(value_sum, type=pa.int64()),
        })


def media_decode_stats(ds: "ray.data.Dataset", *, concurrency: int = 2,
                       batch_size: int = 64,
                       id_col: str = "doc_id") -> "ray.data.Dataset":
    """synth → real decode → integer aggregates. Exercises the production
    decode path (real WAV/PPM containers through decode_audio /
    decode_image) with an EXACT closed-form SQL oracle."""
    return synth_media(ds, id_col).map_batches(
        DecodeIntStats, concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow")


def feature_summary(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Flat, SQL-comparable projection of multimodal_features (drops the
    list column): doc_id, blob_len, blob_sha256, feat_checksum."""
    feats = multimodal_features(ds)
    return feats.map_batches(
        lambda b: b.select(["doc_id", "blob_len", "blob_sha256",
                            "feat_checksum"]),
        batch_format="pyarrow")


def media_resize_stats(ds: "ray.data.Dataset", out_w: int = 4,
                       out_h: int = 2, *, concurrency: int = 2,
                       batch_size: int = 32) -> "ray.data.Dataset":
    """Oracle-checkable REAL resize chain: synthesize PPM payloads
    (content a closed form of doc_id), run the actual decode →
    nearest-neighbor ResizeImages actor-pool stage, and reduce each
    resized raster to an integer pixel sum. Because the resize is a
    deterministic index gather ((r·H)//out_h, (c·W)//out_w), the whole
    decode+resize pipeline restates as a double range-sum in SQL — the
    multimodal_decode discipline extended to a TRANSFORMING stage.
    Columns: doc_id, n_units, pixel_sum (int64, no float anywhere)."""
    def images_only(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["modality"], "image")
        return batch.filter(m)

    imgs = synth_media(ds).map_batches(images_only, batch_format="pyarrow")
    resized = resize_images(imgs, out_w, out_h, concurrency=concurrency,
                            batch_size=batch_size)

    def stats(batch: pa.Table) -> pa.Table:
        sums = [int(np.frombuffer(b, dtype=np.uint8).astype(np.int64).sum())
                for b in batch["rgb"].to_pylist()]
        n = out_w * out_h * 3
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "n_units": pa.array([n] * len(batch), type=pa.int64()),
            "pixel_sum": pa.array(sums, type=pa.int64()),
        })

    return resized.map_batches(stats, batch_format="pyarrow")


SYNTH_VIDEO_FRAME_STEP = 17   # frame f pixel j = (doc_id + f*17 + j) % 256


def _synth_video(doc_id: int, n_frames: int) -> bytes:
    j = np.arange(SYNTH_IMG_W * SYNTH_IMG_H * 3, dtype=np.int64)
    header = f"P6\n{SYNTH_IMG_W} {SYNTH_IMG_H}\n255\n".encode()
    frames = [
        header + ((doc_id + f * SYNTH_VIDEO_FRAME_STEP + j) % 256)
        .astype(np.uint8).tobytes()
        for f in range(n_frames)
    ]
    return pack_video(frames)


def media_frame_stats(ds: "ray.data.Dataset", stride: int = 2, *,
                      concurrency: int = 2,
                      batch_size: int = 16) -> "ray.data.Dataset":
    """Oracle-checkable REAL frame-sampling chain: synthesize SRAYV1
    multi-frame containers (1 + doc_id % 5 PPM frames, pixel content a
    closed form of (doc_id, frame)), run the actual container parse +
    per-frame decode through the SampleFrames actor pool, and emit its
    flat per-sampled-frame layout. Columns: doc_id, frame_idx, width,
    height, pixel_sum — int64 end-to-end."""
    def synth(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()).to_pylist()
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "blob": pa.array([_synth_video(int(d), 1 + int(d) % 5)
                              for d in ids], type=pa.binary()),
        })

    videos = ds.map_batches(synth, batch_format="pyarrow")
    return sample_frames(videos, stride, concurrency=concurrency,
                         batch_size=batch_size)
