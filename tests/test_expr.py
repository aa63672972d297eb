"""Expression engine: arithmetic, relational, functions, nil semantics."""

import math

import pytest

from valkey_search_tpu.query import expr as E
from valkey_search_tpu.query.expr import Expression, ExprError


def ev(text, record=None, params=None):
    return Expression(text).eval(record or {}, params or {})


def test_arithmetic_and_precedence():
    assert ev("1 + 2 * 3") == 7.0
    assert ev("(1 + 2) * 3") == 9.0
    # ^ sits in the multiplicative tier, left-assoc (search-expressions.md
    # BNF): (2^3)*2, not 2^(3*2)
    assert ev("2 ^ 3 * 2") == pytest.approx(16.0)
    assert ev("7 % 4") == 3.0
    assert ev("-3 + 5") == 2.0


def test_division_by_zero_is_nan():
    # reference FuncDiv (value.cc:350): x/0 == nan (oracle-verified)
    assert math.isnan(ev("1 / 0"))
    assert math.isnan(ev("1 % 0"))


def test_field_and_param_refs():
    assert ev("@a + @b", {"a": 2.0, "b": 3.0}) == 5.0
    assert ev("@missing") is None
    with pytest.raises(E.EvalError):
        ev("@missing + 1")  # arithmetic on nil errors (oracle-verified)
    assert ev("$p * 2", {}, {"p": "21"}) == 42.0


def test_string_conversion():
    assert ev("@s + 1", {"s": "41"}) == 42.0
    with pytest.raises(E.EvalError):
        ev("@s + 1", {"s": "xyz"})  # non-numeric arithmetic errors


def test_relational():
    assert ev("2 < 3") == 1.0
    assert ev("'abc' == 'abc'") == 1.0
    assert ev("'10' == 10") == 1.0  # numeric coercion rule 5
    with pytest.raises(E.EvalError):
        ev("@x == @y", {})  # nil comparison errors (oracle-verified)
    with pytest.raises(E.EvalError):
        ev("@x < 5", {})


def test_logical():
    assert ev("1 && 2") == 1.0
    assert ev("0 || 0") == 0.0
    assert ev("!0") == 1.0
    assert ev("!'hello'") == 0.0  # non-numeric string is truthy


def test_numeric_functions():
    assert ev("sqrt(16)") == 4.0
    assert ev("abs(-3)") == 3.0
    assert ev("floor(2.7)") == 2.0
    assert ev("ceil(2.1)") == 3.0
    assert ev("log(exp(1))") == pytest.approx(1.0)
    assert ev("log2(8)") == 3.0
    # unparsable operand -> nan (numeric_unary_nan_on_unparsable)
    assert math.isnan(ev("sqrt('abc')"))


def test_string_functions():
    assert ev("upper('abc')") == "ABC"
    assert ev("lower('AbC')") == "abc"
    assert ev("strlen('hello')") == 5.0
    assert ev("startswith('hello', 'he')") == 1.0
    assert ev("contains('banana', 'an')") == 2.0
    assert ev("substr('hello', 1, 3)") == "ell"
    # negative length trims from the END (reference FuncSubstr value.cc:554)
    assert ev("substr('hello', 1, -1)") == "ell"
    assert ev("concat('a', 'b', 'c')") == "abc"


def test_exists():
    assert ev("exists(@f)", {"f": 1.0}) == 1.0
    assert ev("exists(@f)", {}) == 0.0


def test_time_functions():
    # 2021-01-02T03:04:05Z = 1609556645. day/hour/minute/month TRUNCATE the
    # timestamp to the period start (reference RoundToPeriod + FuncMonth,
    # value.cc:766-831); the component extractors are dayof*/monthofyear/year.
    ts = "1609556645"
    t = 1609556645
    assert ev(f"year({ts})") == 2021.0
    assert ev(f"month({ts})") == 1609459200.0  # 2021-01-01T00:00:00Z
    assert ev(f"day({ts})") == t - t % 86400
    assert ev(f"hour({ts})") == t - t % 3600
    assert ev(f"minute({ts})") == t - t % 60
    assert ev(f"dayofmonth({ts})") == 2.0
    assert ev(f"monthofyear({ts})") == 0.0  # January = 0
    assert ev(f"dayofweek({ts})") == 6.0  # Saturday
    assert ev("day(-1)") is None  # pre-epoch → nil
    s = ev(f"timefmt({ts}, '%Y-%m-%d')")
    assert s == "2021-01-02"
    assert ev("parsetime('2021-01-02', '%Y-%m-%d')") == 1609545600.0


def test_inf_constant():
    assert ev("inf") == math.inf
    assert ev("-inf") == -math.inf


def test_errors():
    for bad in ["1 +", "foo(", "nosuchfn(1)", "(1", "@", "'unterminated"]:
        with pytest.raises(ExprError):
            Expression(bad)
