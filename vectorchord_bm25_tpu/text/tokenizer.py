"""`to_tsvector`-style English tokenizer.

Reproduces the PostgreSQL behavior the reference indexes through
(`to_tsvector('english', ...)`, SURVEY.md §2.9): the default parser's word
segmentation (including hyphenated compounds, which emit the whole
compound followed by its parts, each consuming one position), the
snowball English stopword list, and Porter2 stemming.  Tokens containing
digits are kept unstemmed (numword behavior); position counts are capped
at 256 per lexeme like PostgreSQL's tsvector.

The engine itself is tokenizer-agnostic (it consumes (lexeme, count)
pairs); this module exists for parity testing and batteries-included use.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Tuple

from .porter2 import stem

__all__ = ["STOPWORDS", "tsvector", "tokenize_query"]

# Snowball English stopword list (= PostgreSQL english.stop).
STOPWORDS = frozenset(
    """
    i me my myself we our ours ourselves you your yours yourself yourselves
    he him his himself she her hers herself it its itself they them their
    theirs themselves what which who whom this that these those am is are
    was were be been being have has had having do does did doing a an the
    and but if or because as until while of at by for with about against
    between into through during before after above below to from up down
    in out on off over under again further then once here there when where
    why how all any both each few more most other some such no nor not
    only own same so than too very s t can will just don should now
    """.split()
)

# Default-parser word segmentation, covering PostgreSQL's common token
# classes: email, url/host, file paths, numbers with version punctuation,
# hyphenated compounds (asciihword, whole + parts), and plain words
# (letters, may include digits -> numword).
_HAS_DIGIT = re.compile(r"[0-9]")
_SPECIAL = re.compile(
    r"""
    (?P<email>[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})
  | (?P<url>(?:https?://|www\.)[^\s<>"']+)
  | (?P<path>/(?:[A-Za-z0-9_.-]+/)+[A-Za-z0-9_.-]*)
  | (?P<version>[0-9]+(?:\.[0-9]+){1,})
    """,
    re.VERBOSE,
)
_WORDS = re.compile(r"[A-Za-z0-9]+(?:-[A-Za-z0-9]+)*")


def _segment(text: str) -> List[str]:
    """Emit tokens in position order.

    A hyphenated compound emits the whole followed by its parts
    (PostgreSQL default parser: to_tsvector('english','quick-brown fox') =
    'quick-brown':1 'quick':2 'brown':3 'fox':4); emails, urls, file
    paths, and dotted version numbers are kept as single lexemes like
    PostgreSQL's email/url/file/version token classes.
    """
    out: List[str] = []
    spans: List[tuple] = []
    for m in _SPECIAL.finditer(text):
        spans.append((m.start(), m.end(), m.group(0)))

    def emit_words(chunk: str):
        for m in _WORDS.finditer(chunk):
            tok = m.group(0)
            if "-" in tok:
                out.append(tok)
                out.extend(tok.split("-"))
            else:
                out.append(tok)

    last = 0
    for start, end, tok in spans:
        emit_words(text[last:start])
        out.append(tok.rstrip(".,;:!?"))
        last = end
    emit_words(text[last:])
    return out


def _normalize(token: str) -> str | None:
    """Lowercase, stopword-filter, stem. None = dropped (stopword)."""
    low = token.lower()
    if low in STOPWORDS:
        return None
    if _HAS_DIGIT.search(low) or "@" in low or "/" in low or "." in low:
        return low  # numword/email/url/path behavior: kept verbatim
    # Hyphenated compounds are stemmed whole, like PostgreSQL
    # ('object-relational' -> 'object-relat'): snowball suffix-strips the
    # string tail, hyphens just read as consonants.
    return stem(low)


def tsvector(text: str) -> Dict[str, int]:
    """lexeme -> number of positions (capped at 256), like casting the
    reference's tsvector input (src/datatype/tsvector.rs:84-94: value =
    position count)."""
    counts: Dict[str, int] = {}
    for token in _segment(text):
        lex = _normalize(token)
        if lex is None:
            continue
        counts[lex] = min(counts.get(lex, 0) + 1, 256)
    return counts


def tokenize_query(text: str) -> List[str]:
    """Distinct lexemes of a query string (sorted-unique handled by Query)."""
    return list(tsvector(text).keys())
