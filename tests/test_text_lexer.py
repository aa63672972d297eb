"""Lexer + stemmer + radix tree unit tests.

Mirrors reference testing/text/lexer_test.cc and radix_test coverage
(SURVEY.md §4.1). The stemmer golden file was generated from a build of
the snowball v3.0.1 C library the reference vendors — behavioral parity,
independent implementation."""

import os

import pytest

from valkey_search_tpu.text.lexer import Lexer, DEFAULT_STOP_WORDS
from valkey_search_tpu.text.radix import RadixTree
from valkey_search_tpu.text.stemmer import stem

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "snowball_golden.txt")


def test_stemmer_golden_parity():
    n = 0
    with open(GOLDEN) as f:
        for line in f:
            word, expect = line.rstrip("\n").split("\t")
            assert stem(word) == expect, f"stem({word!r})"
            n += 1
    assert n > 2000


def test_stemmer_spotchecks():
    # snowball 3.0.1 behaviors (not classic Porter2)
    assert stem("dying") == "die"
    assert stem("organizer") == "organiz"   # organ- is an R1 exception prefix
    assert stem("evening") == "evening"  # ing-exception: no-op
    assert stem("egg") == "egg"             # aeo+double stays doubled
    assert stem("betting") == "bet"
    assert stem("biologist") == "biolog"    # 3.x ogist->og
    assert stem("pasting") == "paste"       # "past" counts short
    assert stem("proceed") == "proceed"
    assert stem("proceeding") == "proceed"


def test_tokenize_pipeline():
    lx = Lexer()
    toks = lx.tokenize("The Quick-Brown fox, jumps over the lazy dog!")
    # stop words the/over? 'over' is not a stop word; 'the' is.
    assert toks == ["quick", "brown", "fox", "jumps", "over", "lazy", "dog"]


def test_tokenize_records_stem_map():
    lx = Lexer()
    sm = {}
    toks = lx.tokenize("running quickly", stem_map=sm)
    assert toks == ["running", "quickly"]
    assert sm == {"run": {"running"}, "quick": {"quickly"}}


def test_tokenize_escapes_and_punct():
    lx = Lexer()
    assert lx.split_words(r"hello\,world foo.bar") == ["hello,world", "foo", "bar"]


def test_stop_words_default_list():
    lx = Lexer()
    for w in DEFAULT_STOP_WORDS:
        assert lx.is_stop_word(w)
    assert lx.tokenize("the a an and") == []


def test_min_stem_size_gate():
    lx = Lexer(min_stem_size=6)
    assert lx.stem("cats") == "cats"      # shorter than min
    assert lx.stem("runnings") == "run"   # long enough


def test_radix_basic():
    t = RadixTree()
    words = ["romane", "romanus", "romulus", "rubens", "ruber", "rubicon",
             "rubicundus", "rom"]
    for i, w in enumerate(words):
        assert t.insert(w, i)
    assert len(t) == len(words)
    assert t.get("romane") == 0
    assert t.get("rubicon") == 5
    assert "roman" not in t
    assert t.prefix_count("rom") == 4
    assert t.prefix_count("rub") == 4
    assert t.prefix_count("rubi") == 2
    assert t.prefix_count("z") == 0
    assert list(t.keys("rub")) == ["rubens", "ruber", "rubicon", "rubicundus"]
    # overwrite is not an insert
    assert not t.insert("rom", 99)
    assert t.get("rom") == 99
    assert len(t) == len(words)


def test_radix_remove_and_merge():
    t = RadixTree()
    for w in ["test", "team", "tea", "toast"]:
        t.insert(w, w)
    assert t.remove("tea")
    assert "tea" not in t and t.get("team") == "team"
    assert not t.remove("tea")
    assert t.remove("team") and t.remove("test") and t.remove("toast")
    assert len(t) == 0
    assert list(t.keys()) == []


def test_radix_ordered_walk():
    t = RadixTree()
    import random
    rng = random.Random(3)
    words = {"".join(rng.choices("abc", k=rng.randint(1, 6))) for _ in range(200)}
    for w in words:
        t.insert(w, None)
    assert list(t.keys()) == sorted(words)
    for p in ["a", "ab", "abc", "c", ""]:
        assert t.prefix_count(p) == sum(1 for w in words if w.startswith(p))


def test_radix_fuzzy():
    t = RadixTree()
    for w in ["hello", "hallo", "hullo", "help", "world", "hell"]:
        t.insert(w, w)
    hits = {w: d for w, _, d in t.fuzzy("hello", 1)}
    assert hits == {"hello": 0, "hallo": 1, "hullo": 1, "hell": 1}
    hits2 = {w for w, _, d in t.fuzzy("hello", 2)}
    assert hits2 == {"hello", "hallo", "hullo", "hell", "help"}
