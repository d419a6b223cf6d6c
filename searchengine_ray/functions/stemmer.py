"""Classic Porter stemmer (M.F. Porter, "An algorithm for suffix
stripping", Program 14(3), 1980) — the second implementation behind the
pluggable-tokenizer hook (``IndexConfig.stemmer = "porter"``).

The reference engine's PRIMARY tokenizer branch stems with NLTK's
PorterStemmer when NLTK is present (/root/reference/utils/
text_processing.py:62-74); the sandbox exercises the fallback branch, so
round-1 conformance was against the unstemmed chain. This module
implements BOTH variants: ``porter_stem`` is the PUBLISHED algorithm
from the paper's rule tables (unit tests pin the paper's own example
vectors), and ``nltk_porter_stem`` is NLTK's default NLTK_EXTENSIONS
mode (irregular-forms pool, ies/ied length rules, consonant-y step 1c,
bli/fulli/alli-rerun step 2, 2-letter cvc) for exact term-space parity
with a reference deployment that had NLTK installed.

Hot-path application is per-DISTINCT-token: ``stem_array`` dictionary-
encodes the token column and stems each distinct token once (Python cost
O(vocabulary), not O(tokens)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel→consonant transitions."""
    m = 0
    prev_cons = True  # initial consonant run doesn't count
    started_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if not cons:
            started_vowel = True
        elif started_vowel and not prev_cons:
            m += 1
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _ends_cvc(w: str) -> bool:
    """*o: stem ends cons-vowel-cons, final cons not w, x or y."""
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


# (suffix, replacement) tables; within a step the LONGEST matching suffix
# wins, and if its m-condition fails nothing else in the step applies.
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest_match(w: str, table) -> tuple[str, str] | None:
    best = None
    for suf, rep in table:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    cleanup = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            cleanup = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            cleanup = True
    if cleanup:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    m2 = _longest_match(w, _STEP2)
    if m2 is not None:
        suf, rep = m2
        if _measure(w[:-len(suf)]) > 0:
            w = w[:-len(suf)] + rep

    # Step 3
    m3 = _longest_match(w, _STEP3)
    if m3 is not None:
        suf, rep = m3
        if _measure(w[:-len(suf)]) > 0:
            w = w[:-len(suf)] + rep

    # Step 4
    m4 = _longest_match(w, [(s, "") for s in _STEP4])
    if m4 is not None:
        suf, _ = m4
        stem = w[:-len(suf)]
        if _measure(stem) > 1:
            if suf == "ion":
                if stem and stem[-1] in "st":
                    w = stem
            else:
                w = stem

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]

    # Step 5b
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]

    return w


# ---------------------------------------------------------------------------
# NLTK_EXTENSIONS mode — parity with the reference's PRIMARY branch
# ---------------------------------------------------------------------------
#
# The reference stems with nltk.stem.PorterStemmer() in its DEFAULT mode
# (NLTK_EXTENSIONS) when NLTK is importable (/root/reference/utils/
# text_processing.py:62-74).  That mode deviates from the published paper
# in a documented handful of rules (all public knowledge from NLTK's own
# porter.py commentary):
#
#   * an irregular-forms pool short-circuits whole words
#     (skies→sky, dying→die, news→news, exceed→exceed, …);
#   * step 1a: 4-letter "...ies" → "...ie" (dies→die, but flies→fli);
#   * step 1b: "...ied" → "ie" (len 4) / "i" (longer) before the eed/ed/ing
#     rules (died→die, spied→spi);
#   * step 1c: y→i only when the preceding char is a CONSONANT and the
#     stem is longer than 1 (enjoy→enjoy where the paper gives enjoi;
#     by→by);
#   * step 2: "bli"→"ble" replaces the paper's "abli"→"able"
#     (possibli→possible); "fulli"→"ful" added (carefulli→careful); the
#     "alli"→"al" rule applies FIRST and re-runs step 2 on success
#     (operationalli→operational→operate);
#   * *o (cvc) additionally matches 2-letter vowel-consonant words
#     (using→use where the paper gives us).
#
# Rule dispatch is NLTK's first-match-in-list-order (the lists are ordered
# so shadowed suffixes come first); a failed condition still ends the step.

_NLTK_POOL = {
    "skies": "sky", "sky": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "news": "news", "innings": "inning",
    "inning": "inning", "outings": "outing", "outing": "outing",
    "cannings": "canning", "canning": "canning", "howe": "howe",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
}


def _ends_cvc_nltk(w: str) -> bool:
    return _ends_cvc(w) or (len(w) == 2 and not _is_cons(w, 0)
                            and _is_cons(w, 1))


def _m_pos(stem: str) -> bool:
    return _measure(stem) > 0


def _m_gt1(stem: str) -> bool:
    return _measure(stem) > 1


def _first_match(w: str, rules) -> str:
    """First matching suffix wins; a failed condition ends the step."""
    for suf, rep, cond in rules:
        if w.endswith(suf):
            stem = w[:len(w) - len(suf)]
            if cond is None or cond(stem):
                return stem + rep
            return w
    return w


_NLTK_STEP2 = [
    ("ational", "ate", _m_pos), ("tional", "tion", _m_pos),
    ("enci", "ence", _m_pos), ("anci", "ance", _m_pos),
    ("izer", "ize", _m_pos), ("bli", "ble", _m_pos),
    ("alli", "al", _m_pos), ("entli", "ent", _m_pos),
    ("eli", "e", _m_pos), ("ousli", "ous", _m_pos),
    ("ization", "ize", _m_pos), ("ation", "ate", _m_pos),
    ("ator", "ate", _m_pos), ("alism", "al", _m_pos),
    ("iveness", "ive", _m_pos), ("fulness", "ful", _m_pos),
    ("ousness", "ous", _m_pos), ("aliti", "al", _m_pos),
    ("iviti", "ive", _m_pos), ("biliti", "ble", _m_pos),
    ("fulli", "ful", _m_pos),
]
_NLTK_STEP3 = [
    ("icate", "ic", _m_pos), ("ative", "", _m_pos), ("alize", "al", _m_pos),
    ("iciti", "ic", _m_pos), ("ical", "ic", _m_pos), ("ful", "", _m_pos),
    ("ness", "", _m_pos),
]
_NLTK_STEP4 = [
    ("al", "", _m_gt1), ("ance", "", _m_gt1), ("ence", "", _m_gt1),
    ("er", "", _m_gt1), ("ic", "", _m_gt1), ("able", "", _m_gt1),
    ("ible", "", _m_gt1), ("ant", "", _m_gt1), ("ement", "", _m_gt1),
    ("ment", "", _m_gt1), ("ent", "", _m_gt1),
    ("ion", "", lambda s: _measure(s) > 1 and s[-1] in "st"),
    ("ou", "", _m_gt1), ("ism", "", _m_gt1), ("ate", "", _m_gt1),
    ("iti", "", _m_gt1), ("ous", "", _m_gt1), ("ive", "", _m_gt1),
    ("ize", "", _m_gt1),
]


def _nltk_step2(w: str) -> str:
    if w.endswith("alli") and _measure(w[:-4]) > 0:
        return _nltk_step2(w[:-4] + "al")
    return _first_match(w, _NLTK_STEP2)


def nltk_porter_stem(word: str) -> str:
    """Porter stemmer, NLTK_EXTENSIONS mode — token-level parity with the
    reference's ``stemmer.stem(token)`` call (text_processing.py:70).
    Expects lowercase input (the tokenizer lowercases first, as does the
    reference at text_processing.py:47)."""
    if word in _NLTK_POOL:
        return _NLTK_POOL[word]
    if len(word) <= 2:
        return word
    w = word

    # Step 1a (+ the 4-letter ies→ie extension)
    if w.endswith("ies") and len(w) == 4:
        w = w[:-3] + "ie"
    elif w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b (+ the ied→ie/i extension, which skips the rest of the step)
    if w.endswith("ied"):
        w = w[:-3] + ("ie" if len(w) == 4 else "i")
    elif w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        cleanup = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            cleanup = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            cleanup = True
        if cleanup:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc_nltk(w):
                w += "e"

    # Step 1c (consonant-before-y condition instead of contains-vowel)
    if w.endswith("y"):
        stem = w[:-1]
        if len(stem) > 1 and _is_cons(stem, len(stem) - 1):
            w = stem + "i"

    w = _nltk_step2(w)
    w = _first_match(w, _NLTK_STEP3)
    w = _first_match(w, _NLTK_STEP4)

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc_nltk(w[:-1])):
            w = w[:-1]

    # Step 5b
    if w.endswith("ll") and _measure(w[:-1]) > 1:
        w = w[:-1]

    return w


STEMMERS = {"none": None, "porter": porter_stem, "nltk": nltk_porter_stem}


def stem_array(tokens: pa.Array | pa.ChunkedArray,
               stemmer: str = "porter") -> pa.Array:
    """Stem a token column, hashing each DISTINCT token once (dictionary
    encode → stem distincts in Python → gather through the codes)."""
    fn = STEMMERS[stemmer]
    if fn is None:
        return tokens
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    if len(tokens) == 0:
        return tokens
    dic = tokens.dictionary_encode()
    stemmed = pa.array([fn(t) for t in dic.dictionary.to_pylist()],
                       type=pa.string())
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return stemmed.take(pa.array(codes))
