"""Penn Treebank word tokenizer + deterministic sentence splitter.

The reference tokenizes with NLTK's ``word_tokenize`` (reference
parser_module.py:48), which is punkt sentence segmentation followed by the
Treebank word tokenizer per sentence. NLTK is not installed here, so this
module ports the tokenizer from its *published* rule set — Robert
MacIntyre's Penn Treebank ``tokenizer.sed`` regex sequence (the public
specification NLTK's ``TreebankWordTokenizer`` implements): quote
normalization, punctuation padding, parens/dashes, clitic (contraction)
splitting — applied in the published order.

Punkt itself is a *trained statistical* segmenter and cannot be reproduced
exactly without its model; ``sent_tokenize`` here is a deterministic
approximation (documented delta): a sentence boundary is ``[.!?]`` (+
optional closing quotes/brackets) followed by whitespace, except after
common abbreviations, single-letter initials, and dotted acronyms
("u.s.", "e.g."). Note the approximation can only affect *period
attachment*: ``?``/``!``/``...``/quotes are padded by the Treebank rules
regardless of segmentation, so a boundary decision changes tokens only by
gluing/splitting a final period — exactly punkt's job.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Treebank word tokenizer rules (published sed-script sequence)
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
    # final-period rule: split a period (plus trailing closers) only at the
    # END of the sentence string — this is why sentence segmentation feeds
    # this tokenizer
    (re.compile(r'([^\.])(\.)([\]\)}>"\']*)\s*$'), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = (re.compile(r"[\]\[\(\)\{\}\<\>]"), r" \g<0> ")
_DOUBLE_DASHES = (re.compile(r"--"), r" -- ")

_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

_CONTRACTIONS2 = [
    re.compile(p)
    for p in (
        r"(?i)\b(can)(?#X)(not)\b",
        r"(?i)\b(d)(?#X)('ye)\b",
        r"(?i)\b(gim)(?#X)(me)\b",
        r"(?i)\b(gon)(?#X)(na)\b",
        r"(?i)\b(got)(?#X)(ta)\b",
        r"(?i)\b(lem)(?#X)(me)\b",
        r"(?i)\b(mor)(?#X)('n)\b",
        r"(?i)\b(wan)(?#X)(na)\s",
    )
]
_CONTRACTIONS3 = [
    re.compile(p) for p in (r"(?i) ('t)(?#X)(is)\b", r"(?i) ('t)(?#X)(was)\b")
]


def treebank_tokenize(sentence: str) -> list[str]:
    """Tokenize ONE sentence with the Treebank rules."""
    text = sentence
    for regexp, substitution in _STARTING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp, substitution in _PUNCTUATION:
        text = regexp.sub(substitution, text)
    regexp, substitution = _PARENS_BRACKETS
    text = regexp.sub(substitution, text)
    regexp, substitution = _DOUBLE_DASHES
    text = regexp.sub(substitution, text)
    text = " " + text + " "
    for regexp, substitution in _ENDING_QUOTES:
        text = regexp.sub(substitution, text)
    for regexp in _CONTRACTIONS2:
        text = regexp.sub(r" \1 \2 ", text)
    for regexp in _CONTRACTIONS3:
        text = regexp.sub(r" \1 \2 ", text)
    return text.split()


# ---------------------------------------------------------------------------
# Deterministic sentence splitter (punkt approximation — see module doc)
# ---------------------------------------------------------------------------

#: common abbreviations that do not end a sentence (lowercased, no dot)
_ABBREVIATIONS = frozenset(
    """mr mrs ms dr prof rev gen rep sen gov lt col capt sgt st jr sr
    etc vs v eg ie cf al ca approx dept est fig figs no nos vol vols
    inc ltd co corp univ assn bros
    jan feb mar apr jun jul aug sep sept oct nov dec
    mon tue tues wed thu thurs fri sat sun""".split()
)

_BOUNDARY = re.compile(r"([.!?]+)([\'\")\]}»’”]*)(\s+)")
_LAST_WORD = re.compile(r"(\S+)$")


def sent_tokenize(text: str) -> list[str]:
    """Split text into sentence strings for ``treebank_tokenize``."""
    sentences: list[str] = []
    start = 0
    for m in _BOUNDARY.finditer(text):
        punct = m.group(1)
        if "!" not in punct and "?" not in punct and "..." not in punct:
            # plain period boundary: guard against abbreviations
            lw = _LAST_WORD.search(text, start, m.start())
            if lw:
                w = lw.group(1).strip("\"'()[]{}“”‘’").lower()
                if (
                    w in _ABBREVIATIONS
                    or (len(w) == 1 and w.isalpha())
                    or "." in w  # dotted acronym / initials: u.s, e.g
                ):
                    continue
        seg = text[start:m.end(2)]
        if seg.strip():
            sentences.append(seg)
        start = m.end()
    tail = text[start:]
    if tail.strip() or not sentences:
        sentences.append(tail)
    return sentences


# Fast path: a text with no punctuation characters cannot be touched by any
# quote/punct/paren/clitic rule — except the \w-only MacIntyre contractions
# (cannot/gimme/gonna/gotta/lemme/wanna), checked separately. For such text
# every rule is the identity and word_tokenize(text) == text.split();
# skipping the ~20 regex passes roughly doubles tokenizer throughput on
# bag-of-words content while being bit-identical on the output.
_HAS_PUNCT = re.compile(r"[^\w\s]")
_HAS_W_CONTRACTION = re.compile(
    r"(?i)\b(?:cannot|gimme|gonna|gotta|lemme|wanna)\b"
)


def word_tokenize(text: str) -> list[str]:
    """NLTK-``word_tokenize``-shaped entry: sentence split, then Treebank."""
    if not _HAS_PUNCT.search(text) and not _HAS_W_CONTRACTION.search(text):
        return text.split()
    return [
        tok for sent in sent_tokenize(text) for tok in treebank_tokenize(sent)
    ]
