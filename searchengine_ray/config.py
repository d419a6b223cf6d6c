"""Typed configuration for the Ray-Data-native full-text engine.

Constants mirror the reference engine's deployed configuration
(/root/reference/utils/config.py:77-86 INDEXER_CONFIG and
/root/reference/search_engine/indexer/indexer.py:49-56) so that scoring is
rank-identical to the reference semantics. The reference exposes these as a
plain dict; here they are frozen dataclasses (SURVEY.md §2.12).
"""

from __future__ import annotations

from dataclasses import dataclass


# The reference's 40-word default stopword list, written by
# /root/reference/search_engine/indexer/build_index.py:40-45 when no
# stopwords file exists. The deployed artifact is an EMPTY file (0 bytes →
# empty set); tests cover both variants (FIXTURES.md §5).
DEFAULT_STOPWORDS: frozenset[str] = frozenset({
    "a", "an", "the", "and", "or", "but", "if", "because", "as", "what",
    "when", "where", "how", "who", "which", "this", "that", "these", "those",
    "is", "are", "was", "were", "be", "been", "being", "have", "has", "had",
    "do", "does", "did", "for", "of", "on", "in", "to", "from", "with",
})


@dataclass(frozen=True)
class IndexConfig:
    """Build-time configuration.

    BM25 constants from indexer.py:50-52 (k3 is declared but unused in the
    reference — intentionally omitted here); boosts from config.py:84-85;
    token-length bounds from config.py:81-82.
    """

    k1: float = 1.2
    b: float = 0.75
    title_boost: float = 5.0
    meta_boost: float = 3.0
    content_boost: float = 1.0
    min_token_length: int = 2
    max_token_length: int = 20
    stopwords: frozenset[str] = DEFAULT_STOPWORDS
    # Pluggable tokenizer variant: "none" = the reference's fallback chain
    # (round-1 conformance semantics); "porter" = the published Porter
    # algorithm; "nltk" = NLTK_EXTENSIONS-mode Porter — term-space parity
    # with the reference's PRIMARY branch when NLTK is present
    # (utils/text_processing.py:62-74). Index and queries must use the
    # same value (recorded in the manifest; mismatches refuse loudly).
    stemmer: str = "none"
    # Word-tokenizer variant applied AFTER the normalize chain, BEFORE
    # stemming (the word_tokenize slot of the reference's NLTK branch,
    # text_processing.py:66): "split" = plain whitespace split (fallback
    # branch); "treebank" = Penn-Treebank rules (functions/treebank.py) —
    # on normalized text exactly the MacIntyre contraction-word expansion
    # (cannot→can not, gonna→gon na, …). tokenizer="treebank" +
    # stemmer="nltk" is full term-space parity with a reference
    # deployment that has NLTK installed. Recorded in the manifest;
    # mismatches refuse loudly.
    tokenizer: str = "split"

    # Physical layout knobs (no reference equivalent — the reference is a
    # single in-memory dict, SURVEY.md §4). num_partitions is the width of
    # the one wide shuffle (postings by hash(term) % num_partitions);
    # num_length_partitions shards the doc-length table by hash(doc_id).
    num_partitions: int = 32
    num_length_partitions: int = 8
    # Docstore output shards: doc_id RANGE partitioned (uniform, since
    # doc_ids are hash64 values) so every docstore file covers a disjoint
    # id range — lazy_docstore fetches prune whole files, and a crashed
    # build resumes per-partition exactly like segments.
    num_docstore_partitions: int = 8
    # Posting block size for block-max metadata (docs per block).
    block_size: int = 128
    # Terms with df above this fraction of N are salted into sub-partitions
    # during the shuffle to bound skew (SURVEY.md §4 "Skew").
    hot_term_df_ratio: float = 0.05


@dataclass(frozen=True)
class QueryConfig:
    """Query-time configuration (reference: indexer.py:280, 332; app.py:140)."""

    top_k: int = 20
    min_score: float = 0.05  # minimum normalized relevance, indexer.py:332
    term_importance: float = 1.8  # exact-match boost, indexer.py:391
    snippet_window: int = 200  # _generate_relevant_snippet, indexer.py:358


DEFAULT_INDEX_CONFIG = IndexConfig()
DEFAULT_QUERY_CONFIG = QueryConfig()
