"""Tag + numeric index units: postings, prefix match, ranges, device masks."""

import numpy as np
import pytest

from valkey_search_tpu.indexes.base import RecordResult
from valkey_search_tpu.indexes.numeric import NumericIndex
from valkey_search_tpu.indexes.tag import TagIndex


def test_tag_parse_and_postings():
    t = TagIndex()
    assert t.add_record("k1", "blue, red ,GREEN") is RecordResult.ADDED
    assert t.posting("blue") and t.posting("green")  # casefolded
    assert t.posting("RED") == t.posting("red")
    assert t.count() == 1
    assert t.unique_tags() == 3


def test_tag_case_sensitive():
    t = TagIndex(case_sensitive=True)
    t.add_record("k1", "Blue")
    assert not t.posting("blue")
    assert t.posting("Blue")


def test_tag_separator():
    t = TagIndex(separator=";")
    t.add_record("k1", "a;b,c")
    assert t.posting("a") and t.posting("b,c")


def test_tag_prefix_search():
    t = TagIndex()
    for i, v in enumerate(["blue", "black", "beige", "green"]):
        t.add_record(f"k{i}", v)
    f = t.search(["b*"])
    assert f.size() == 3
    assert t.estimate(["b*", "green"]) == 4
    # doc_matches host check
    doc = t.interner.lookup("k3")
    assert t.doc_matches(doc, ["gr*"]) and not t.doc_matches(doc, ["b*"])


def test_tag_empty_value_untracked():
    t = TagIndex()
    assert t.add_record("k1", "  ") is RecordResult.SKIPPED
    assert "k1" in t.untracked_keys()
    t.add_record("k1", "x")
    assert "k1" not in t.untracked_keys()


def test_tag_remove_cleans_postings():
    t = TagIndex()
    t.add_record("k1", "a,b")
    t.add_record("k2", "a")
    t.remove_record("k1")
    assert not t.posting("b")
    assert t.posting("a") == {t.interner.lookup("k2")}


def test_tag_device_mask():
    t = TagIndex()
    t.add_record("k0", "x")
    t.add_record("k1", "y")
    t.add_record("k2", "x,y")
    m = np.asarray(t.device_mask(["x"], cap=8))
    docs = {t.interner.lookup(k) for k in ("k0", "k2")}
    assert set(np.nonzero(m)[0].tolist()) == docs


def test_numeric_ranges():
    n = NumericIndex()
    for i in range(20):
        n.add_record(f"k{i}", i)
    assert n.range_count(5, 10) == 6
    assert n.range_count(5, 10, lo_open=True) == 5
    assert n.range_count(5, 10, hi_open=True) == 5
    assert n.range_count(-np.inf, np.inf) == 20
    ids = list(n.range_fetch(17, 19))
    assert len(ids) == 3


def test_numeric_invalid_and_update():
    n = NumericIndex()
    # unparsable numeric -> INVALID_DATA: schema drops the key everywhere
    # (Redisearch compat, index_schema.cc:729; 'bad numbers' oracle)
    assert n.add_record("k", "abc") is RecordResult.INVALID_DATA
    assert "k" in n.untracked_keys()
    assert n.add_record("k", "5") is RecordResult.ADDED
    assert n.add_record("k", "7") is RecordResult.MODIFIED
    assert n.value_of("k") == 7
    assert n.range_count(5, 5) == 0  # old value gone


def test_numeric_device_mask():
    n = NumericIndex()
    for i in range(10):
        n.add_record(f"k{i}", i * 10)
    m = np.asarray(n.device_mask(25, 55, cap=16))
    want = {n.interner.lookup(f"k{i}") for i in (3, 4, 5)}
    assert set(np.nonzero(m)[0].tolist()) == want
    # exclusive bounds
    m = np.asarray(n.device_mask(30, 50, cap=16, lo_open=True, hi_open=True))
    assert set(np.nonzero(m)[0].tolist()) == {n.interner.lookup("k4")}


def test_numeric_remove():
    n = NumericIndex()
    n.add_record("a", 1)
    n.add_record("b", 2)
    assert n.remove_record("a") is RecordResult.REMOVED
    assert n.range_count(0, 10) == 1
    m = np.asarray(n.device_mask(0, 10, cap=4))
    assert m.sum() == 1
