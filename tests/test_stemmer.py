"""Porter stemmer: the paper's own example vectors (Porter 1980, Program
14(3)) + the Arrow distinct-token application path."""

from __future__ import annotations

import pyarrow as pa

from searchengine_ray.functions.stemmer import porter_stem, stem_array

# (word, stem) pairs lifted from the worked examples in the paper's rule
# tables, step by step.
PAPER_VECTORS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b (+cleanup)
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_paper_vectors():
    bad = {w: (porter_stem(w), want) for w, want in PAPER_VECTORS.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_short_words_unchanged():
    for w in ("", "a", "is", "by", "go"):
        assert porter_stem(w) == w


def test_morphological_family_collapses():
    assert len({porter_stem(w)
                for w in ("connect", "connected", "connecting",
                          "connection", "connections")}) == 1


def test_arrow_tokenize_matches_python_with_stemmer():
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.functions.arrow_tokenize import tokenize_column
    from searchengine_ray.functions.tokenizer import filter_tokens, tokenize
    cfg = IndexConfig(num_partitions=4, num_length_partitions=2,
                      stemmer="porter")
    rows = ["Connections connected; the ConnectingParser!",
            "running runs RAN", "", "hopeful hopefulness hoping",
            "https://x.io/running ties &amp; caresses"]
    di, toks = tokenize_column(pa.array(rows, type=pa.string()), cfg)
    got: dict[int, list[str]] = {}
    for d, t in zip(di.tolist(), toks.to_pylist()):
        got.setdefault(d, []).append(t)
    for i, row in enumerate(rows):
        want = filter_tokens(tokenize(row, "porter"), cfg)
        assert got.get(i, []) == want, (i, row)


def test_porter_index_end_to_end(ray_session, tmp_path):
    """A stemmed index must (a) be rank-identical to the in-process oracle
    built with the same config (the engine machinery is tokenizer-
    agnostic), (b) actually collapse morphology (query 'connection' hits
    the 'connecting' doc), (c) refuse a mismatched query config."""
    import ray.data
    import pytest
    from conftest import oracle_docs
    from searchengine_ray.build import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.oracle import build_oracle_index, oracle_search
    from searchengine_ray.query import QueryEngine

    docs = [
        ("r0", "connecting.txt", "engines connecting pipelines daily"),
        ("r0", "connected.txt", "the engine connected yesterday morning"),
        ("r1", "parser.txt", "parsing tokenized streams quickly"),
        ("r1", "runner.txt", "runners running marathons happily"),
        ("r2", "unrelated.txt", "zebra quantum waffle theory"),
    ]
    t = pa.table({
        "repo": pa.array([d[0] for d in docs]),
        "path": pa.array([d[1] for d in docs]),
        "commit": pa.array(["0" * 40] * len(docs)),
        "lang": pa.array(["txt"] * len(docs)),
        "content": pa.array([d[2] for d in docs]),
    })
    cfg = IndexConfig(num_partitions=4, num_length_partitions=2,
                      stemmer="porter")
    idx = str(tmp_path / "stem_index")
    m = build_index(ray.data.from_arrow(t), idx, cfg, salt_hot_terms=False)
    assert m["stemmer"] == "porter" and m["num_docs"] == len(docs)
    eng = QueryEngine(idx, cfg)
    oracle = build_oracle_index(oracle_docs(t), cfg)
    for q in ("connection", "running", "parse", "engines", "waffles",
              "connected engines"):
        got = eng.search(q, top_k=10)
        want = oracle_search(oracle, q, top_k=10)
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], q
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], abs=1e-12)
    # morphology collapses: 'connection' finds both connect* docs
    hits = {r["title"] for r in eng.search("connection", top_k=10)}
    assert {"connecting.txt", "connected.txt"} <= hits
    # unstemmed engine on the same corpus would NOT match
    with pytest.raises(ValueError, match="stemmer"):
        QueryEngine(idx, IndexConfig(num_partitions=4,
                                     num_length_partitions=2))


def test_stem_array_matches_scalar():
    toks = ["running", "runs", "ran", "caresses", "sky", "", "is",
            "running"]
    out = stem_array(pa.array(toks, type=pa.string())).to_pylist()
    assert out == [porter_stem(t) for t in toks]
    assert stem_array(pa.array([], type=pa.string())).to_pylist() == []


# ---------------------------------------------------------------------------
# NLTK_EXTENSIONS mode
# ---------------------------------------------------------------------------

# Vectors derived from NLTK's documented extension rules (nltk/stem/
# porter.py NLTK_EXTENSIONS commentary) — each pins a specific deviation.
NLTK_VECTORS = {
    # irregular-forms pool
    "skies": "sky", "sky": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "news": "news", "innings": "inning",
    "inning": "inning", "outings": "outing", "cannings": "canning",
    "howe": "howe", "proceed": "proceed", "exceed": "exceed",
    "succeed": "succeed",
    # step 1a: 4-letter ies -> ie (longer words keep the paper rule)
    "dies": "die", "ties": "tie", "flies": "fli", "ponies": "poni",
    # step 1b: ied -> ie / i
    "died": "die", "spied": "spi", "studied": "studi",
    # step 1c: consonant-before-y condition
    "happy": "happi", "cry": "cri", "enjoy": "enjoy", "say": "say",
    "by": "by",
    # step 2: bli->ble / fulli->ful / alli-first-and-rerun
    "possibly": "possibl", "carefully": "care", "formally": "formal",
    "operationally": "oper",
    # 2-letter *o extension
    "using": "use",
    # shared with the paper on common morphology (regression guard)
    "caresses": "caress", "cats": "cat", "feed": "feed",
    "agreed": "agre", "plastered": "plaster", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "hopping": "hop",
    "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "failing": "fail", "filing": "file", "happiness": "happi",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "generalization": "gener", "oscillators": "oscil",
    "connection": "connect", "connections": "connect",
    "connected": "connect", "connecting": "connect",
}


def test_nltk_vectors():
    from searchengine_ray.functions.stemmer import nltk_porter_stem
    bad = {w: (nltk_porter_stem(w), want)
           for w, want in NLTK_VECTORS.items()
           if nltk_porter_stem(w) != want}
    assert not bad, bad


def test_nltk_vs_paper_divergences():
    """The documented deviations actually diverge (guards against the two
    implementations silently collapsing into one)."""
    from searchengine_ray.functions.stemmer import nltk_porter_stem
    for word, paper, nltk in [
        ("dies", "di", "die"), ("died", "di", "die"),
        ("skies", "ski", "sky"), ("news", "new", "news"),
        ("dying", "dy", "die"), ("innings", "in", "inning"),
        ("enjoy", "enjoi", "enjoy"), ("using", "us", "use"),
        ("carefully", "carefulli", "care"),
        ("possibly", "possibli", "possibl"),
        ("exceed", "exce", "exceed"),
    ]:
        assert porter_stem(word) == paper, (word, porter_stem(word))
        assert nltk_porter_stem(word) == nltk, (word, nltk_porter_stem(word))


def test_nltk_stem_array_and_tokenize():
    from searchengine_ray.functions.stemmer import nltk_porter_stem
    from searchengine_ray.functions.tokenizer import tokenize
    toks = ["running", "skies", "dies", "carefully", "is", ""]
    out = stem_array(pa.array(toks, type=pa.string()),
                     "nltk").to_pylist()
    assert out == [nltk_porter_stem(t) for t in toks]
    # tokenize() routes the nltk stemmer through the same raw-token chain
    assert tokenize("Dying skies; carefully enjoying!", "nltk") == \
        ["die", "sky", "care", "enjoy"]


def test_nltk_index_end_to_end(ray_session, tmp_path):
    """nltk-stemmed index is rank-identical to the in-process oracle under
    the same config, collapses morphology, and records its mode."""
    import ray.data
    import pytest
    from conftest import oracle_docs
    from searchengine_ray.build import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.oracle import build_oracle_index, oracle_search
    from searchengine_ray.query import QueryEngine

    docs = [
        ("r0", "dying.txt", "stars dying slowly in darkening skies"),
        ("r0", "died.txt", "the star died while others survived"),
        ("r1", "enjoy.txt", "enjoying carefully prepared meals daily"),
        ("r2", "unrelated.txt", "zebra quantum waffle theory"),
        # filler rows keep df("die")=2 below N/2 so idf stays positive
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
                      stemmer="nltk")
    idx = str(tmp_path / "nltk_index")
    m = build_index(ray.data.from_arrow(t), idx, cfg, salt_hot_terms=False)
    assert m["stemmer"] == "nltk" and m["num_docs"] == len(docs)
    eng = QueryEngine(idx, cfg)
    oracle = build_oracle_index(oracle_docs(t), cfg)
    for q in ("dying", "died", "sky", "enjoyment", "careful stars"):
        got = eng.search(q, top_k=10)
        want = oracle_search(oracle, q, top_k=10)
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], q
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], abs=1e-12)
    # pool morphology collapses: 'dying' (pool->die) finds the 'died' doc
    hits = {r["title"] for r in eng.search("dying", top_k=10)}
    assert {"dying.txt", "died.txt"} <= hits
    # 'sky' pool-collapses with 'skies'
    assert {r["title"] for r in eng.search("sky", top_k=10)} == {"dying.txt"}
    with pytest.raises(ValueError, match="stemmer"):
        QueryEngine(idx, IndexConfig(num_partitions=4,
                                     num_length_partitions=2,
                                     stemmer="porter"))
