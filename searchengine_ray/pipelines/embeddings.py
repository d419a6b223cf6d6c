"""Document embeddings for the hybrid search path — reference parity
(SURVEY.md §2.9 hybrid / §2.4 ST2; /root/reference/search_engine/indexer/
bert_embeddings.py).

The reference encodes ``f"{title} {title} {description} {content_snippet}"``
per doc with a SentenceTransformer on normalized vectors
(bert_embeddings.py:100-123) into FAISS. The model itself is NOT available
in this environment, so the model slot holds a DETERMINISTIC stand-in:
``HashedBowEmbedder`` — md5-bucketed bag-of-words, L2-normalized. It is a
real (if crude) text embedding: shared-vocabulary docs are cosine-similar,
it is reproducible in the DuckDB oracle, and swapping in a genuine model is
a one-class change with the same actor-pool signature
(``map_batches(HashedBowEmbedder, concurrency=N, batch_size=B)``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

EMBED_DIM = 64


def _md5_bucket(token: str, dim: int = EMBED_DIM) -> int:
    import hashlib
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8],
                          "big") % dim


def embed_text(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Pure shared embedding function (engine + tests + SQL oracle
    semantics): lowercase whitespace tokens → md5 bucket tf → L2 unit."""
    vec = np.zeros(dim, dtype=np.float64)
    for tok in (text or "").lower().split():
        vec[_md5_bucket(tok, dim)] += 1.0
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


class TextEmbedder:
    """The formal model interface for the embedding slot (reference
    bert_embeddings.py:61-123 shape): ``load()`` is the lazy once-per-
    actor model load; ``encode(texts)`` returns a float64 (n, dim) matrix
    of UNIT-normalized row vectors (the reference passes
    normalize_embeddings=True). Implementations must be picklable BEFORE
    load() — the heavy model state is created inside the actor, never
    shipped through the object store."""

    dim: int = EMBED_DIM

    def load(self) -> None:  # once per actor; default: nothing to load
        pass

    def encode(self, texts: list[str]) -> np.ndarray:
        raise NotImplementedError


class HashedBowModel(TextEmbedder):
    """The sandbox's deterministic stand-in model: md5-bucketed
    bag-of-words, L2 unit rows — reproducible in the DuckDB oracle."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim

    def encode(self, texts: list[str]) -> np.ndarray:
        return np.stack([embed_text(t, self.dim) for t in texts])


class SentenceTransformerModel(TextEmbedder):
    """Real-model adapter (reference bert_embeddings.py:61-80 load_model,
    :111-123 batched normalized encode). Import-guarded: the library is
    absent in this sandbox, so construction succeeds (picklable spec) and
    ``load()`` raises ImportError where sentence-transformers is not
    installed. On a real cluster: pass
    ``embedder=SentenceTransformerModel("all-MiniLM-L6-v2", dim=384)`` to
    ``build_doc_embeddings`` — each map_batches actor loads the model
    once and encodes batches on its own CPUs/GPU."""

    def __init__(self, model_name: str = "all-MiniLM-L6-v2",
                 dim: int = 384, cache_folder: str | None = None):
        self.model_name = model_name
        self.dim = dim
        self.cache_folder = cache_folder
        self._model = None

    def _create_model(self):
        """The only line that needs the library — split out so the CI
        offline fake can subclass THIS hook and still execute the real
        ``load``/``encode`` adapter glue (batch kwargs, f32→f64 cast,
        dim check in the actor) end-to-end without the package."""
        from sentence_transformers import SentenceTransformer
        kwargs = ({"cache_folder": self.cache_folder}
                  if self.cache_folder else {})
        return SentenceTransformer(self.model_name, **kwargs)

    def load(self) -> None:
        self._model = self._create_model()

    def encode(self, texts: list[str]) -> np.ndarray:
        return np.asarray(self._model.encode(
            texts, show_progress_bar=False, convert_to_numpy=True,
            normalize_embeddings=True), dtype=np.float64)


class HashedBowEmbedder:
    """Actor-pool embedding stage (the ST2 model slot). __init__ is the
    once-per-actor model-load point; __call__ embeds a batch. Any
    :class:`TextEmbedder` plugs into the ``embedder`` slot — the default
    is the sandbox's deterministic HashedBowModel."""

    def __init__(self, dim: int = EMBED_DIM, text_col: str = "embed_text",
                 embedder: TextEmbedder | None = None):
        self.embedder = embedder if embedder is not None \
            else HashedBowModel(dim)
        self.embedder.load()  # the once-per-actor model-load point
        self.dim = self.embedder.dim if embedder is not None else dim
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.cast(batch[self.text_col], pa.string()).to_pylist()
        mat = np.asarray(self.embedder.encode(texts), dtype=np.float64)
        if mat.shape != (len(texts), self.dim):
            raise ValueError(
                f"embedder returned shape {mat.shape}, expected "
                f"({len(texts)}, {self.dim})")
        out = batch.drop_columns([self.text_col])
        # float64 storage: keeps hybrid scores bit-reproducible against the
        # SQL oracle (a production index would store f32 at 2× density)
        return out.append_column(
            "embedding", pa.array(mat.tolist(), type=pa.list_(pa.float64())))


def reference_embed_text_expr(title, meta, snippet) -> str:
    """f"{title} {title} {description} {snippet}" — bert_embeddings.py:107."""
    return f"{title} {title} {meta} {snippet}"


def build_doc_embeddings(index_dir: str, *, concurrency: int = 2,
                         batch_size: int = 256,
                         embedder: TextEmbedder | None = None,
                         force: bool = False) -> str:
    """Embed every docstore row (reference generate_bert_embeddings.py
    shape: document_map → combined text → batched encode → store). Writes
    ``index_dir/embeddings/`` parquet (doc_id, embedding) and returns the
    directory.

    ``embedder`` injects any :class:`TextEmbedder` (e.g.
    ``SentenceTransformerModel("all-MiniLM-L6-v2", dim=384)`` on a real
    cluster); default is the deterministic HashedBowModel. The unloaded
    spec ships to each actor; the model weights load once per actor
    inside ``HashedBowEmbedder.__init__``.

    Resumable at artifact granularity: a completed build writes a
    lineage marker (row count + embedder fingerprint); a re-run with the
    same corpus and embedder is a no-op, while a changed docstore or a
    different model triggers a clean rebuild (``force=True`` overrides).
    """
    import hashlib
    import json
    out_dir = os.path.join(index_dir, "embeddings")
    marker = os.path.join(out_dir, "_EMBED_MANIFEST.json")
    docstore_dir = os.path.join(index_dir, "docstore")
    docstore = ray.data.read_parquet(
        docstore_dir, columns=["doc_id", "title", "meta", "snippet"])
    n_docs = docstore.count()  # parquet metadata, no scan
    emb = embedder if embedder is not None else HashedBowModel()
    # model identity = class + its picklable constructor-ish state (so a
    # different model_name of the SAME adapter class rebuilds too)
    params = {k: v for k, v in sorted(vars(emb).items())
              if not k.startswith("_")
              and isinstance(v, (str, int, float, bool, type(None)))}
    fingerprint = (f"{type(emb).__module__}.{type(emb).__qualname__}"
                   f":{json.dumps(params, sort_keys=True)}")
    # corpus identity = digest over the docstore FILE SET (name, size,
    # mtime) — a re-written corpus with the same doc count still rebuilds
    h = hashlib.sha256()
    for fn in sorted(os.listdir(docstore_dir)):
        st = os.stat(os.path.join(docstore_dir, fn))
        h.update(f"{fn}:{st.st_size}:{st.st_mtime_ns}".encode())
    corpus_digest = h.hexdigest()
    if not force and os.path.exists(marker):
        try:
            with open(marker) as f:
                m = json.load(f)
            if (m.get("num_docs") == n_docs
                    and m.get("embedder") == fingerprint
                    and m.get("corpus_digest") == corpus_digest):
                return out_dir  # complete and current — skip
        except (OSError, ValueError):
            pass  # unreadable marker → rebuild
    # idempotence: write_parquet ADDS uniquely-named files, so a re-run
    # into a dirty dir would silently duplicate embedding rows — own the
    # directory instead
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)

    def prep(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["title"], pa.string())
        m = pc.cast(batch["meta"], pa.string())
        s = pc.cast(batch["snippet"], pa.string())
        combined = pc.binary_join_element_wise(t, t, m, s, " ")
        return pa.table({"doc_id": batch["doc_id"], "embed_text": combined})

    kwargs = {} if embedder is None else {
        "fn_constructor_kwargs": {"embedder": embedder}}
    (docstore.map_batches(prep, batch_format="pyarrow")
             .map_batches(HashedBowEmbedder, concurrency=concurrency,
                          batch_size=batch_size, batch_format="pyarrow",
                          **kwargs)
             .write_parquet(out_dir))
    # marker LAST (atomic tmp→rename): its presence proves completeness
    tmp = f"{marker}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"num_docs": n_docs, "embedder": fingerprint,
                   "corpus_digest": corpus_digest}, f)
    os.replace(tmp, marker)
    return out_dir


def load_doc_embeddings(index_dir: str) -> tuple[np.ndarray, np.ndarray] | None:
    """(doc_ids sorted, unit matrix float64) or None when absent."""
    out_dir = os.path.join(index_dir, "embeddings")
    if not os.path.isdir(out_dir):
        return None
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    if not files:
        return None
    t = pa.concat_tables([pq.read_table(os.path.join(out_dir, f))
                          for f in files])
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    arr = t["embedding"].combine_chunks()
    # flatten() (not .values) so sliced arrays keep their offset alignment
    mat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64) \
        .reshape(len(t), -1)
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]
