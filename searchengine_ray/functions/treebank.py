"""Penn-Treebank word tokenizer — NLTK ``word_tokenize`` parity.

The reference's PRIMARY tokenize branch (when NLTK is installed,
/root/reference/utils/text_processing.py:62-74) runs ``word_tokenize``
over the regex-normalized text before stemming. This module reproduces
that tokenizer from PUBLIC sources only: the original Penn Treebank sed
script (``tokenizer.sed``, Robert MacIntyre, University of Pennsylvania,
1995 — the rules are published with the treebank) as implemented by
NLTK's ``TreebankWordTokenizer`` (documented rule lists in
``nltk/tokenize/treebank.py`` and the MacIntyre contraction tables in
``nltk/tokenize/util.py``; examples from NLTK's published docstrings).

Two layers:

- :func:`treebank_word_tokenize` — the full rule set over raw text
  (quotes, punctuation, parens, contraction clitics like ``n't``/``'ll``,
  and the MacIntyre contraction words like ``cannot`` → ``can not``).
  :func:`word_tokenize` adds a lightweight sentence split first so each
  sentence's FINAL period detaches, matching ``nltk.word_tokenize``'s
  punkt+treebank composition on plain prose. Documented divergence: the
  punkt sentence model (abbreviation learning) is NOT reproduced — the
  naive ``[.!?]``-boundary split differs on abbreviation-heavy prose.
  This is irrelevant for reference parity because the reference strips
  all sentence punctuation BEFORE tokenizing (see below).

- :func:`expand_pre_stripped` — the exact effect of the treebank rules
  on text that already went through the reference's normalize chain
  (``[^\\w\\s-]``→space, ``-``→space, lowercase): every quote/clitic/
  punctuation rule is then unfireable (no such characters remain), so
  the ONLY rules that can change the token stream are the MacIntyre
  contraction WORDS that are plain ``\\w`` runs. This identity — proven
  by a hypothesis test against the full rule set — is what lets the
  distributed Arrow build stay a vectorized whitespace split plus a
  six-word dictionary expansion instead of running 20 regexes per doc.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Full rule set (tokenizer.sed / NLTK TreebankWordTokenizer)
# ---------------------------------------------------------------------------

_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # final period of the text (word_tokenize: of each sentence)
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = [
    (re.compile(r"[\]\[\(\)\{\}\<\>]"), r" \g<0> "),
    (re.compile(r"--"), r" -- "),
]

_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

# MacIntyre contraction tables (CONTRACTIONS2/3 — the sed script's
# two-way and three-way splits; CONTRACTIONS4 exists in the table but is
# NOT applied by the tokenizer, same as NLTK).
_CONTRACTIONS2 = [re.compile(p) for p in (
    r"(?i)\b(can)(?#X)(not)\b",
    r"(?i)\b(d)(?#X)('ye)\b",
    r"(?i)\b(gim)(?#X)(me)\b",
    r"(?i)\b(gon)(?#X)(na)\b",
    r"(?i)\b(got)(?#X)(ta)\b",
    r"(?i)\b(lem)(?#X)(me)\b",
    r"(?i)\b(more)(?#X)('n)\b",
    r"(?i)\b(wan)(?#X)(na)\s",
)]
_CONTRACTIONS3 = [re.compile(p) for p in (
    r"(?i) ('t)(?#X)(is)\b",
    r"(?i) ('t)(?#X)(was)\b",
)]


def treebank_word_tokenize(text: str) -> list[str]:
    """TreebankWordTokenizer.tokenize semantics on one text span."""
    for pat, sub in _STARTING_QUOTES:
        text = pat.sub(sub, text)
    for pat, sub in _PUNCTUATION:
        text = pat.sub(sub, text)
    for pat, sub in _PARENS_BRACKETS:
        text = pat.sub(sub, text)
    text = " " + text + " "
    for pat, sub in _ENDING_QUOTES:
        text = pat.sub(sub, text)
    for pat in _CONTRACTIONS2:
        text = pat.sub(r" \1 \2 ", text)
    for pat in _CONTRACTIONS3:
        text = pat.sub(r" \1 \2 ", text)
    return text.split()


_SENT_BOUNDARY = re.compile(r"(?<=[.!?])\s+")


def word_tokenize(text: str) -> list[str]:
    """``nltk.word_tokenize`` composition: sentence-split, then treebank
    per sentence (so every sentence-final period detaches). Sentence
    model is the naive boundary split documented above, not punkt."""
    out: list[str] = []
    for sent in _SENT_BOUNDARY.split(text):
        if sent:
            out.extend(treebank_word_tokenize(sent))
    return out


# ---------------------------------------------------------------------------
# Pre-stripped path (the reference pipeline position)
# ---------------------------------------------------------------------------

# Contraction WORDS that are pure \w runs — the only treebank rules that
# can fire after the reference's [^\w\s-]-strip + hyphen replacement
# (quotes, clitics and punctuation rules all require characters that no
# longer exist). Lowercase-only: the chain lowercases before tokenizing.
TREEBANK_SPECIALS: dict[str, tuple[str, ...]] = {
    "cannot": ("can", "not"),
    "gimme": ("gim", "me"),
    "gonna": ("gon", "na"),
    "gotta": ("got", "ta"),
    "lemme": ("lem", "me"),
    "wanna": ("wan", "na"),
}


def expand_pre_stripped(tokens: list[str]) -> list[str]:
    """Apply the treebank rules to an already-normalized whitespace-split
    token stream — exactly the MacIntyre contraction-word expansion (see
    module docstring for why nothing else can fire)."""
    if not any(t in TREEBANK_SPECIALS for t in tokens):
        return list(tokens)
    out: list[str] = []
    for t in tokens:
        rep = TREEBANK_SPECIALS.get(t)
        if rep is None:
            out.append(t)
        else:
            out.extend(rep)
    return out
