"""Snowball English ("Porter2") stemmer — pure Python, dependency-free.

The reference stems with NLTK's ``snowball.SnowballStemmer("english")``
(reference stemmer.py:8-14, applied inside the parser's default token branch
at parser_module.py:94-96, flag ``ConfigClass.toStem`` configuration.py:16).
NLTK is not installed in this environment, so this module implements the
same *published* algorithm — Martin Porter's English (Porter2) stemmer as
specified at snowballstem.org/algorithms/english/stemmer.html — from the
public description, including its exception word lists and NLTK's
apostrophe-normalization preamble.

Implementation notes:

- R1/R2 are tracked as start *offsets* into the word (the spec's region
  semantics). NLTK instead mirrors r1/r2 as separate strings it re-syncs
  after every edit; that bookkeeping has known corner-case drift from the
  spec (e.g. its step-2 ``r2 = "e"`` resync). Where the two disagree, this
  module follows the spec.
- Exception list 1 (invariant/special-cased words) and exception list 2
  (checked after step 1a) are the spec's lists; the suffixed forms NLTK
  folds into its dict (``innings`` → ``inning`` etc.) fall out of step 1a +
  the exception-2 check and need no special casing.
- Golden pairs in tests/test_stemmer.py come from the published sample
  vocabulary/output on snowballstem.org.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

#: exception list 1 — stemmed by lookup before the algorithm runs
_EXCEPTION1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

#: exception list 2 — invariant if matched after step 1a
_EXCEPTION2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)

_STEP2 = (
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    ("ogi", None),  # → "og", only if preceded by l
    ("li", None),   # → delete, only after a valid li-ending
)

_STEP3 = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", ""),   # delete, only if in R2
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion",  # only if preceded by s or t
    "al", "er", "ic",
)


def _ends_short_syllable(word: str) -> bool:
    """True iff ``word`` ends in a short syllable (spec definition):
    (a) vowel + non-vowel(≠ w, x, Y) preceded by a non-vowel, or
    (b) a word of exactly two letters: vowel + non-vowel."""
    n = len(word)
    if n >= 3:
        if (
            word[-1] not in _VOWELS
            and word[-1] not in "wxY"
            and word[-2] in _VOWELS
            and word[-3] not in _VOWELS
        ):
            return True
    if n == 2 and word[0] in _VOWELS and word[1] not in _VOWELS:
        return True
    return False


def _r1r2(word: str) -> tuple[int, int]:
    n = len(word)
    r1 = n
    if word.startswith(("gener", "arsen")):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
        for i in range(1, n):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _has_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s)


def stem(word: str) -> str:
    """Stem one token per the Snowball English (Porter2) algorithm."""
    word = word.lower()
    if len(word) <= 2:
        return word
    if word in _EXCEPTION1:
        return _EXCEPTION1[word]

    # apostrophe normalization (NLTK preamble + spec's initial-' removal)
    word = (
        word.replace("’", "'").replace("‘", "'").replace("‛", "'")
    )
    if word.startswith("'"):
        word = word[1:]

    # mark consonant-y as Y: initial y, or y after a vowel
    if word.startswith("y"):
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _r1r2(word)

    def in_r1(suffix_len: int) -> bool:
        return len(word) - suffix_len >= r1

    def in_r2(suffix_len: int) -> bool:
        return len(word) - suffix_len >= r2

    # ---- step 0: 's' / 's / ' ------------------------------------------
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # ---- step 1a ----------------------------------------------------------
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _has_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # ---- step 1b ----------------------------------------------------------
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if in_r1(len(suf)):
                word = word[: -len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _has_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"
                break

    # ---- step 1c: y/Y → i after a non-vowel that isn't the first letter ---
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # ---- step 2 (longest suffix, condition: in R1) -------------------------
    for suf, repl in _STEP2:
        if word.endswith(suf):
            if in_r1(len(suf)):
                if suf == "ogi":
                    if len(word) >= 4 and word[-4] == "l":
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # ---- step 3 (longest suffix, condition: in R1; ative needs R2) --------
    for suf, repl in _STEP3:
        if word.endswith(suf):
            if in_r1(len(suf)):
                if suf == "ative":
                    if in_r2(len(suf)):
                        word = word[:-5]
                else:
                    word = word[: -len(suf)] + repl
            break

    # ---- step 4 (longest suffix, condition: in R2) -------------------------
    for suf in _STEP4:
        if word.endswith(suf):
            if in_r2(len(suf)):
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # ---- step 5 -------------------------------------------------------------
    if word.endswith("e"):
        if in_r2(1) or (in_r1(1) and not _ends_short_syllable(word[:-1])):
            word = word[:-1]
    elif word.endswith("ll") and in_r2(1):
        word = word[:-1]

    return word.replace("Y", "y")


class Stemmer:
    """Drop-in for the reference's Stemmer (reference stemmer.py:4-14)."""

    def stem_term(self, token: str) -> str:
        return stem(token)
