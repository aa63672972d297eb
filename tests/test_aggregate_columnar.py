"""Index-columnar GROUPBY+COUNT fast path (server/ft_aggregate.py).

When GROUPBY targets an indexed TAG attribute and every reducer is an
arg-less COUNT, the aggregation reads the tag index's raw-value column
directly (TagIndex.value_counts) — zero keyspace fetches. These tests pin
the fast path's SEMANTIC EQUALITY with the generic per-row pipeline
(reference behavior: group key is the raw document field string,
ft_aggregate.cc CreateRecordsFromNeighbors), including the shapes that
must fall back.
"""

import pytest

from valkey_search_tpu.server import ft_aggregate as fa
from valkey_search_tpu.server.engine import Engine


@pytest.fixture
def engine():
    e = Engine()
    e.execute("FT.CREATE", "idx", "ON", "HASH", "PREFIX", "1", "d:",
              "SCHEMA", "body", "TEXT", "tag", "TAG", "n", "NUMERIC")
    return e


def _generic(engine, *args, monkeypatch):
    """Run the same FT.AGGREGATE with the columnar plan disabled."""
    monkeypatch.setattr(fa, "_columnar_groupby_index", lambda *a: None)
    try:
        return engine.ft_aggregate(*args)
    finally:
        monkeypatch.undo()


AGG = ("idx", None, "GROUPBY", "1", "@tag",
       "REDUCE", "COUNT", "0", "AS", "c")


def run_both(engine, monkeypatch, query, *tail):
    args = ["idx", query, *tail]
    fast = engine.ft_aggregate(*args)
    generic = _generic(engine, *args, monkeypatch=monkeypatch)
    assert fast == generic
    return fast


def test_basic_counts_match_generic(engine, monkeypatch):
    for i in range(50):
        engine.hset(f"d:{i}", {"body": "apple pie", "tag":
                               "red" if i % 3 == 0 else "blue"})
    out = run_both(engine, monkeypatch, "@body:apple",
                   "GROUPBY", "1", "@tag", "REDUCE", "COUNT", "0", "AS", "c")
    assert out[0] == 2
    groups = {row[1]: row[3] for row in out[1:]}
    assert groups == {"red": "17", "blue": "33"}


def test_raw_value_not_normalized_tags(engine, monkeypatch):
    # GROUPBY groups by the RAW field string ("A, b"), not the parsed
    # tag set {a, b} — reference loads field content per row
    engine.hset("d:1", {"body": "x", "tag": "A, b"})
    engine.hset("d:2", {"body": "x", "tag": "A, b"})
    engine.hset("d:3", {"body": "x", "tag": "b"})
    out = run_both(engine, monkeypatch, "@body:x",
                   "GROUPBY", "1", "@tag", "REDUCE", "COUNT", "0", "AS", "c")
    groups = {row[1]: row[3] for row in out[1:]}
    assert groups == {"A, b": "2", "b": "1"}


def test_docs_without_tag_field_group_under_nil(engine, monkeypatch):
    engine.hset("d:1", {"body": "y", "tag": "t1"})
    engine.hset("d:2", {"body": "y"})  # no tag field at all
    out = run_both(engine, monkeypatch, "@body:y",
                   "GROUPBY", "1", "@tag", "REDUCE", "COUNT", "0", "AS", "c")
    assert out[0] == 2
    rows = {tuple(r) for r in out[1:]}
    assert ("tag", "t1", "c", "1") in rows
    assert ("c", "1") in rows  # nil group: no 'tag' pair emitted


def test_empty_tag_value_falls_back_and_matches(engine, monkeypatch):
    # "  " parses to no tags -> untracked key with a raw value; the
    # column cannot own its doc id, so value_counts returns None and the
    # command must take the generic path with identical output
    engine.hset("d:1", {"body": "z", "tag": "  "})
    engine.hset("d:2", {"body": "z", "tag": "t"})
    out = run_both(engine, monkeypatch, "@body:z",
                   "GROUPBY", "1", "@tag", "REDUCE", "COUNT", "0", "AS", "c")
    groups = {row[1]: row[3] for row in out[1:]}
    assert groups == {"  ": "1", "t": "1"}


def test_group_order_matches_generic_row_order(engine, monkeypatch):
    # group emission order = first occurrence in ascending-doc order
    for i, tag in enumerate(["m", "a", "z", "a", "m", "q"]):
        engine.hset(f"d:{i}", {"body": "w", "tag": tag})
    out = run_both(engine, monkeypatch, "@body:w",
                   "GROUPBY", "1", "@tag", "REDUCE", "COUNT", "0", "AS", "c")
    assert [row[1] for row in out[1:]] == ["m", "a", "z", "q"]


def test_overwrite_and_delete_stay_exact(engine, monkeypatch):
    engine.hset("d:1", {"body": "v", "tag": "old"})
    engine.hset("d:1", {"body": "v", "tag": "new"})
    engine.hset("d:2", {"body": "v", "tag": "old"})
    engine.delete("d:2")
    out = run_both(engine, monkeypatch, "@body:v",
                   "GROUPBY", "1", "@tag", "REDUCE", "COUNT", "0", "AS", "c")
    assert out == [1, ["tag", "new", "c", "1"]]


def test_later_stages_run_on_grouped_records(engine, monkeypatch):
    for i in range(9):
        engine.hset(f"d:{i}", {"body": "s", "tag": f"t{i % 3}"})
    out = run_both(
        engine, monkeypatch, "@body:s",
        "GROUPBY", "1", "@tag", "REDUCE", "COUNT", "0", "AS", "c",
        "SORTBY", "2", "@tag", "DESC",
        "LIMIT", "0", "2",
    )
    assert [row[1] for row in out[1:]] == ["t2", "t1"]


def test_sum_reducer_not_columnar(engine, monkeypatch):
    # non-COUNT reducers must use the generic pipeline (needs field fetch)
    engine.hset("d:1", {"body": "k", "tag": "g", "n": "3"})
    engine.hset("d:2", {"body": "k", "tag": "g", "n": "4"})
    out = run_both(engine, monkeypatch, "@body:k",
                   "GROUPBY", "1", "@tag",
                   "REDUCE", "SUM", "1", "@n", "AS", "s")
    assert out == [1, ["tag", "g", "s", "7"]]


def test_groupby_text_field_not_columnar(engine, monkeypatch):
    engine.hset("d:1", {"body": "hello", "tag": "g"})
    out = run_both(engine, monkeypatch, "@body:hello",
                   "GROUPBY", "1", "@body", "REDUCE", "COUNT", "0", "AS", "c")
    assert out == [1, ["body", "hello", "c", "1"]]


def test_match_all_star_query(engine, monkeypatch):
    for i in range(10):
        engine.hset(f"d:{i}", {"body": "b", "tag": "even" if i % 2 else "odd"})
    out = run_both(engine, monkeypatch, "*",
                   "GROUPBY", "1", "@tag", "REDUCE", "COUNT", "0", "AS", "c")
    groups = {row[1]: row[3] for row in out[1:]}
    assert groups == {"even": "5", "odd": "5"}


def test_columnar_plan_detection(engine):
    schema = engine.manager.get("idx")
    spec = fa.parse_ft_aggregate([
        "idx", "*", "GROUPBY", "1", "@tag",
        "REDUCE", "COUNT", "0", "AS", "c",
    ])
    assert fa._columnar_groupby_index(schema, spec) is not None
    # vector-score field / __key / LOAD * shapes are excluded
    spec2 = fa.parse_ft_aggregate([
        "idx", "*", "LOAD", "*", "GROUPBY", "1", "@tag",
        "REDUCE", "COUNT", "0", "AS", "c",
    ])
    assert fa._columnar_groupby_index(schema, spec2) is None
    spec3 = fa.parse_ft_aggregate([
        "idx", "*", "GROUPBY", "1", "@__key",
        "REDUCE", "COUNT", "0", "AS", "c",
    ])
    assert fa._columnar_groupby_index(schema, spec3) is None
