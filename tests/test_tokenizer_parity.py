"""Pinned tokenizer parity cases (VERDICT round-1 item 9).

Each case pins `tsvector(input)` — the lexeme -> position-count map —
against PostgreSQL's `to_tsvector('english', input)` behavior (the
reference indexes through that cast, src/datatype/tsvector.rs:84-94,
where value = position count).  Cases cover the default parser's token
classes: asciiword/word (Unicode), numword, hyphenated compounds
(whole + parts), email, host, url (url + host + url_path lexemes), file,
version/float/uint, underscore/apostrophe separators, stopwords, and
snowball stemming.

Digit-leading mixed tokens ('42nd') and pure-digit hyphen parts
('top-10') are intentionally NOT pinned: the PostgreSQL parser's
treatment of those is not recorded here, and the engine is
tokenizer-agnostic either way.
"""

import pytest

from vectorchord_bm25_tpu.text.tokenizer import tsvector

# (input, expected lexeme->count) — PostgreSQL to_tsvector('english', ...)
CASES = [
    # --- plain words, stemming, stopwords -------------------------------
    ("The quick brown foxes jumped", {"quick": 1, "brown": 1, "fox": 1, "jump": 1}),
    ("a fat cat sat on a mat it ate a fat rats",
     {"fat": 2, "cat": 1, "sat": 1, "mat": 1, "ate": 1, "rat": 1}),
    ("Hello, world!", {"hello": 1, "world": 1}),
    ("running runs", {"run": 2}),
    ("Databases and database", {"databas": 2}),
    ("THE THE THE", {}),
    ("", {}),
    ("   \t\n ", {}),
    ("word word word", {"word": 3}),
    ("searching searches searched", {"search": 3}),
    ("engines engine", {"engin": 2}),
    ("indexes indexing", {"index": 2}),
    ("ranking ranked ranks", {"rank": 3}),
    ("relevance", {"relev": 1}),
    ("important", {"import": 1}),
    ("queries query", {"queri": 2}),
    ("flies dies ties", {"fli": 1, "die": 1, "tie": 1}),
    ("agreed agree", {"agre": 2}),
    ("generously", {"generous": 1}),
    ("community communities", {"communiti": 2}),
    ("probabilistic retrieval framework",
     {"probabilist": 1, "retriev": 1, "framework": 1}),
    ("supports supported supporting", {"support": 3}),
    ("powerful power", {"power": 2}),
    ("systems system", {"system": 2}),
    ("should we do this now", {}),
    ("being been was were", {}),
    ("i me my myself", {}),
    # --- apostrophes are separators (don/t/s are stopwords) -------------
    ("don't", {}),
    ("dog's bone", {"dog": 1, "bone": 1}),
    ("it's John's house", {"john": 1, "hous": 1}),
    ("can't won't", {"won": 1}),
    # --- underscores are separators --------------------------------------
    ("foo_bar", {"foo": 1, "bar": 1}),
    ("snake_case_name", {"snake": 1, "case": 1, "name": 1}),
    ("_leading trailing_", {"lead": 1, "trail": 1}),
    # --- digit tokens kept verbatim (uint/float/version -> simple) ------
    ("42", {"42": 1}),
    ("over 15 years", {"15": 1, "year": 1}),
    ("3.14", {"3.14": 1}),
    ("1.2.3", {"1.2.3": 1}),
    ("2024", {"2024": 1}),
    ("beta1 beta2", {"beta1": 1, "beta2": 1}),
    ("192.168.0.1", {"192.168.0.1": 1}),
    # --- hyphenated compounds: whole + parts ------------------------------
    ("quick-brown fox", {"quick-brown": 1, "quick": 1, "brown": 1, "fox": 1}),
    ("object-relational", {"object-rel": 1, "object": 1, "relat": 1}),
    ("state-of-the-art", {"state-of-the-art": 1, "state": 1, "art": 1}),
    ("foo-bar-beta1", {"foo-bar-beta1": 1, "foo": 1, "bar": 1, "beta1": 1}),
    ("a--b", {"b": 1}),
    ("well- done", {"well": 1, "done": 1}),
    ("-well", {"well": 1}),
    # --- email (simple dict: lowercased, kept whole) ----------------------
    ("bob@example.com", {"bob@example.com": 1}),
    ("Bob@Example.COM", {"bob@example.com": 1}),
    ("mail bob.smith@mail.example.org now",
     {"mail": 1, "bob.smith@mail.example.org": 1}),
    # --- host tokens -------------------------------------------------------
    ("example.com", {"example.com": 1}),
    ("www.example.com", {"www.example.com": 1}),
    ("foo.txt", {"foo.txt": 1}),
    ("U.S.A", {"u.s.a": 1}),
    ("Visit example.com.", {"visit": 1, "example.com": 1}),
    ("(see foo.txt)", {"see": 1, "foo.txt": 1}),
    ("end. Next", {"end": 1, "next": 1}),
    # --- urls: url + host + url_path lexemes -------------------------------
    ("http://example.com/path",
     {"example.com/path": 1, "example.com": 1, "/path": 1}),
    ("https://www.pg.org/docs/index.html",
     {"www.pg.org/docs/index.html": 1, "www.pg.org": 1, "/docs/index.html": 1}),
    ("www.foo.org/docs", {"www.foo.org/docs": 1, "www.foo.org": 1, "/docs": 1}),
    ("http://example.com", {"example.com": 1}),
    ("site.com/a?q=1&b=2",
     {"site.com/a?q=1&b=2": 1, "site.com": 1, "/a?q=1&b=2": 1}),
    # --- file paths ---------------------------------------------------------
    ("/usr/local/bin/tool", {"/usr/local/bin/tool": 1}),
    ("see /var/log/syslog now", {"see": 1, "/var/log/syslog": 1}),
    # --- unicode words -------------------------------------------------------
    ("café", {"café": 1}),
    # snowball treats non-ASCII letters as consonants: naïve -> naïv
    # (step-5a e-deletion), fußball -> fußbal (step-5b ll-undoubling)
    ("naïve approach", {"naïv": 1, "approach": 1}),
    ("Fußball", {"fußbal": 1}),
    ("日本語 text", {"日本語": 1, "text": 1}),
    ("Ελληνικά", {"ελληνικά": 1}),
    ("смысл жизни", {"смысл": 1, "жизни": 1}),
    ("em—dash", {"em": 1, "dash": 1}),
]


@pytest.mark.parametrize("text,expected", CASES, ids=lambda v: repr(v)[:40])
def test_tsvector_parity(text, expected):
    if not isinstance(text, str):
        pytest.skip("id row")
    assert tsvector(text) == expected


def test_case_count():
    assert len(CASES) >= 50


def test_position_count_cap():
    v = tsvector(" ".join(["word"] * 300))
    assert v["word"] == 256


def test_accented_uppercase_lowering():
    assert tsvector("Café RÉSUMÉ") == {"café": 1, "résumé": 1}
