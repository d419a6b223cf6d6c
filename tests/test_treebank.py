"""Penn-Treebank tokenizer variant — NLTK word_tokenize parity.

Unit vectors come from NLTK's published docstrings/documentation for
TreebankWordTokenizer / word_tokenize; the pre-stripped identity is the
load-bearing claim that lets the Arrow build stay a whitespace split plus
a dictionary expansion (functions/treebank.py module docstring).
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_ray.config import IndexConfig
from searchengine_ray.functions.arrow_tokenize import tokenize_column
from searchengine_ray.functions.tokenizer import filter_tokens, tokenize
from searchengine_ray.functions.treebank import (
    TREEBANK_SPECIALS,
    expand_pre_stripped,
    treebank_word_tokenize,
    word_tokenize,
)

TB_CFG = IndexConfig(tokenizer="treebank")


# --- published unit vectors -------------------------------------------------

def test_treebank_published_example():
    # NLTK TreebankWordTokenizer docstring example (single-span rules:
    # only the final period of the text detaches)
    s = "Good muffins cost $3.88\nin New York.  Please buy me\ntwo of them.\n\nThanks."
    assert treebank_word_tokenize(s) == [
        "Good", "muffins", "cost", "$", "3.88", "in", "New", "York.",
        "Please", "buy", "me", "two", "of", "them.", "Thanks", "."]
    # nltk.word_tokenize composition: sentence-final periods all detach
    assert word_tokenize(s) == [
        "Good", "muffins", "cost", "$", "3.88", "in", "New", "York", ".",
        "Please", "buy", "me", "two", "of", "them", ".", "Thanks", "."]


def test_treebank_clitics_and_punctuation():
    assert treebank_word_tokenize("They'll save and invest more.") == \
        ["They", "'ll", "save", "and", "invest", "more", "."]
    assert treebank_word_tokenize("hi, my name can't hello,") == \
        ["hi", ",", "my", "name", "ca", "n't", "hello", ","]
    assert treebank_word_tokenize('"We beat \'em," he said; (really?)') == \
        ["``", "We", "beat", "'em", ",", "''", "he", "said", ";", "(",
         "really", "?", ")"]


def test_treebank_contraction_words():
    assert treebank_word_tokenize("I cannot do that; gonna pass.") == \
        ["I", "can", "not", "do", "that", ";", "gon", "na", "pass", "."]
    assert treebank_word_tokenize("Gimme that, I wanna go") == \
        ["Gim", "me", "that", ",", "I", "wan", "na", "go"]


# --- pre-stripped identity --------------------------------------------------

def test_expand_pre_stripped_table():
    toks = "you cannot be gonna wanna gimme gotta lemme x".split()
    assert expand_pre_stripped(toks) == [
        "you", "can", "not", "be", "gon", "na", "wan", "na", "gim", "me",
        "got", "ta", "lem", "me", "x"]
    plain = ["alpha", "beta", "cannotx", "gon"]
    assert expand_pre_stripped(plain) == plain


_norm_alphabet = st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789_ ")


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_norm_alphabet, max_size=80),
       st.sampled_from(sorted(TREEBANK_SPECIALS) + ["plain"]))
def test_treebank_on_normalized_text_is_dictionary_expansion(text, extra):
    """On text the reference normalize chain already stripped to
    [a-z0-9_\\s], the FULL treebank rule set degenerates to the
    contraction-word expansion — the identity the Arrow fast path
    relies on."""
    t = (text + " " + extra).strip()
    assert treebank_word_tokenize(t) == expand_pre_stripped(t.split())


# --- engine wiring ----------------------------------------------------------

def test_tokenize_treebank_variant():
    assert tokenize("You cannot parseHTML, gonna-fly!", None, "treebank") \
        == ["you", "can", "not", "parse", "html", "gon", "na", "fly"]
    # split variant keeps the contraction words whole
    assert tokenize("You cannot fly, gonna go!", None) == \
        ["you", "cannot", "fly", "gonna", "go"]


def _arrow_tokens(texts, cfg, apply_filter=False):
    arr = pa.array(texts, type=pa.string())
    di, toks = tokenize_column(arr, cfg, apply_filter=apply_filter)
    out = [[] for _ in texts]
    for i, t in zip(di, toks.to_pylist()):
        out[int(i)].append(t)
    return out


def test_arrow_treebank_matches_python():
    texts = ["You cannot be gonna wanna", "plain code_tokens here",
             "CannotParser cannot gimme&amp;gotta", "", "lemme wanna",
             "cannot"]
    got = _arrow_tokens(texts, TB_CFG)
    want = [tokenize(t, None, "treebank") for t in texts]
    assert got == want


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(
    codec="ascii", exclude_categories=("Cs",), exclude_characters="\x00"),
    max_size=100), max_size=6),
    st.sampled_from(sorted(TREEBANK_SPECIALS)))
def test_arrow_treebank_matches_python_property(texts, special):
    texts = texts + [f"x {special} y"]
    assert _arrow_tokens(texts, TB_CFG) == \
        [tokenize(t, None, "treebank") for t in texts]


def test_arrow_treebank_filtered_matches_python():
    texts = ["the parser cannot tokenize", "gonna theVeryLongIdentifier"]
    got = _arrow_tokens(texts, TB_CFG, apply_filter=True)
    want = [filter_tokens(tokenize(t, None, "treebank"), TB_CFG)
            for t in texts]
    assert got == want


# --- end-to-end -------------------------------------------------------------

def test_treebank_index_end_to_end(ray_session, tmp_path):
    """tokenizer="treebank" + stemmer="nltk" (full NLTK-present reference
    parity) must be rank-identical to the in-process oracle under the
    same config, collapse contraction words into the shared term space,
    record its mode, and refuse mismatched query configs."""
    import ray.data
    from conftest import oracle_docs
    from searchengine_ray.build import build_index
    from searchengine_ray.oracle import build_oracle_index, oracle_search
    from searchengine_ray.query import QueryEngine

    docs = [
        ("r0", "cannot.txt", "we cannot merge branches without review"),
        ("r0", "cans.txt", "tin cans stacked not far away"),
        ("r1", "gonna.txt", "builds gonna break tonight maybe"),
        ("r1", "wanna.txt", "tests wanna pass cleanly today"),
        ("r2", "unrelated.txt", "zebra quantum waffle theory"),
        ("r2", "filler1.txt", "gamma delta epsilon omicron"),
        ("r2", "filler2.txt", "lambda sigma upsilon omega"),
    ]
    t = pa.table({
        "repo": pa.array([d[0] for d in docs]),
        "path": pa.array([d[1] for d in docs]),
        "commit": pa.array(["0" * 40] * len(docs)),
        "lang": pa.array(["txt"] * len(docs)),
        "content": pa.array([d[2] for d in docs]),
    })
    cfg = IndexConfig(num_partitions=4, num_length_partitions=2,
                      stemmer="nltk", tokenizer="treebank")
    idx = str(tmp_path / "tb_index")
    m = build_index(ray.data.from_arrow(t), idx, cfg, salt_hot_terms=False)
    assert m["tokenizer"] == "treebank" and m["stemmer"] == "nltk"
    eng = QueryEngine(idx, cfg)
    oracle = build_oracle_index(oracle_docs(t), cfg)
    for q in ("cannot", "can not", "gonna", "wanna pass", "cans"):
        got = eng.search(q, top_k=10)
        want = oracle_search(oracle, q, top_k=10)
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], q
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], abs=1e-12)
    # term space collapsed: the word "cannot" lives as can+not, so a
    # "cannot" query hits BOTH the cannot doc and the "cans ... not" doc
    hits = {r["title"] for r in eng.search("cannot", top_k=10)}
    assert {"cannot.txt", "cans.txt"} <= hits
    # a split-tokenizer engine on the same index must refuse loudly
    with pytest.raises(ValueError, match="tokenizer"):
        QueryEngine(idx, IndexConfig(num_partitions=4,
                                     num_length_partitions=2,
                                     stemmer="nltk"))
