"""Filter-expression parity drills.

Mirrors /root/reference/integration/test_filter_expressions.py: tag OR
syntax ({A|B|C}), custom separators, negation, AND-before-OR precedence,
parentheses, every numeric range bracket form, deep OR nesting, huge tag
unions, and escaped closing braces — standalone and inside hybrid KNN
queries (query parser: src/query/predicate_parser.cc).
"""

import numpy as np
import pytest

from valkey_search_tpu.server.engine import Engine

COUNTRIES = ["USA", "GBR", "CAN", "FRA", "DEU"]


@pytest.fixture
def engine():
    e = Engine(sync_ingest=True)
    e.execute(
        "FT.CREATE", "idx", "ON", "HASH", "PREFIX", "1", "d:",
        "SCHEMA", "country", "TAG", "n", "NUMERIC",
        "v", "VECTOR", "FLAT", "6",
        "TYPE", "FLOAT32", "DIM", "3", "DISTANCE_METRIC", "L2",
    )
    for i in range(20):
        e.hset(f"d:{i}", {
            "country": COUNTRIES[i % 5], "n": str(i),
            "v": np.float32([i, 0, 0]).tobytes(),
        })
    return e


def _n(e, q, *a):
    return e.execute("FT.SEARCH", "idx", q, "NOCONTENT",
                     "LIMIT", "0", "100", *a)[0]


def test_tag_or_syntax_basic(engine):
    assert _n(engine, "@country:{USA|GBR|CAN}") == 12
    assert _n(engine, "@country:{FRA}") == 4
    assert _n(engine, "@country:{USA|GBR|CAN|FRA|DEU}") == 20


def test_tag_or_in_hybrid_query(engine):
    q = np.float32([1, 0, 0]).tobytes()
    r = engine.execute(
        "FT.SEARCH", "idx", "(@country:{USA|GBR} @n:[0 10])=>[KNN 3 @v $q]",
        "PARAMS", "2", "q", q, "NOCONTENT")
    assert r[0] == 3
    # every returned key satisfies the filter
    for key in r[1:]:
        i = int(str(key).split(":")[1])
        assert COUNTRIES[i % 5] in ("USA", "GBR") and 0 <= i <= 10


def test_tag_or_with_custom_separator(engine):
    e = engine
    e.execute("FT.CREATE", "sep", "ON", "HASH", "PREFIX", "1", "p:",
              "SCHEMA", "tags", "TAG", "SEPARATOR", ",")
    e.hset("p:1", {"tags": "red,large"})
    e.hset("p:2", {"tags": "blue,small"})
    e.hset("p:3", {"tags": "red,small"})
    e.hset("p:4", {"tags": "green,large"})
    assert e.execute("FT.SEARCH", "sep", "@tags:{red|blue}",
                     "NOCONTENT")[0] == 3
    assert e.execute("FT.SEARCH", "sep", "@tags:{large|small}",
                     "NOCONTENT")[0] == 4


def test_negation_tag_filter(engine):
    assert _n(engine, "-@country:{USA}") == 16


def test_negation_with_numeric_and(engine):
    # n in [5,15] minus USA rows {5,10,15}
    assert _n(engine, "(-@country:{USA} @n:[5 15])") == 8


def test_operator_precedence_and_before_or(engine):
    # USA ∪ (GBR ∧ n∈[0,4]) = {0,5,10,15} ∪ {1}
    assert _n(engine, "@country:{USA} | @country:{GBR} @n:[0 4]") == 5


def test_parentheses_override_precedence(engine):
    # (USA ∪ GBR) ∧ n∈[0,4] = {0,1}
    assert _n(engine, "(@country:{USA} | @country:{GBR}) @n:[0 4]") == 2


@pytest.mark.parametrize("rng,count", [
    ("[5 10]", 6),        # inclusive both
    ("[(5 10]", 5),       # exclusive min
    ("[5 (10]", 5),       # exclusive max
    ("[(5 (10]", 4),      # exclusive both
    ("[5 +inf]", 15),     # >=
    ("[(5 +inf]", 14),    # >
    ("[-inf 5]", 6),      # <=
    ("[-inf (5]", 5),     # <
    ("[7 7]", 1),         # equality
])
def test_numeric_range_brackets(engine, rng, count):
    assert _n(engine, f"@n:{rng}") == count


def test_multiple_negations(engine):
    # [0..9] minus USA {0,5} minus GBR {1,6}
    assert _n(engine, "(-@country:{USA} -@country:{GBR} @n:[0 9])") == 6


def test_deep_or_nesting(engine):
    q = ("((@country:{USA}|@country:{GBR})|"
         "(@country:{CAN}|@country:{FRA}))")
    assert _n(engine, q) == 16


def test_complex_negation_and_or(engine):
    # -(USA) ∧ (n<5 ∨ n>=15) → non-USA of {1,2,3,4} ∪ {16,17,18,19}
    # ({15} is USA so excluded either way)
    assert _n(engine, "(-@country:{USA} (@n:[-inf (5] | @n:[15 +inf]))") == 8


def test_large_tag_union(engine):
    e = engine
    e.execute("FT.CREATE", "big", "ON", "HASH", "PREFIX", "1", "b:",
              "SCHEMA", "t", "TAG")
    for i in range(64):
        e.hset(f"b:{i}", {"t": f"tag{i}"})
    # a 1000-branch OR where only 64 tags exist (reference drills 10k)
    union = "|".join(f"tag{i}" for i in range(1000))
    assert e.execute("FT.SEARCH", "big", "@t:{%s}" % union, "NOCONTENT",
                     "LIMIT", "0", "100")[0] == 64


def test_tag_escaped_closing_brace(engine):
    engine.hset("d:esc", {"country": "we}ird", "n": "99",
                          "v": np.float32([9, 9, 9]).tobytes()})
    assert _n(engine, r"@country:{we\}ird}") == 1
