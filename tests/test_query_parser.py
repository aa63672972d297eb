"""Filter dialect parser: grammar coverage + error cases."""

import math

import pytest

from valkey_search_tpu.query import parser as qp
from valkey_search_tpu.query import predicate as P


def parse(s, params=None):
    return qp.FilterParser(s, params or {}).parse()


def test_match_all():
    assert isinstance(parse("*"), P.MatchAll)


def test_tag_single():
    p = parse("@color:{blue}")
    assert isinstance(p, P.TagPredicate)
    assert p.field == "color" and p.values == ["blue"]


def test_tag_multi_and_prefix():
    p = parse("@color:{blue | black | fred*}")
    assert p.values == ["blue", "black", "fred*"]


def test_tag_with_spaces():
    p = parse("@color:{hello world | hello universe}")
    assert p.values == ["hello world", "hello universe"]


def test_numeric_inclusive():
    p = parse("@price:[10 100]")
    assert (p.lo, p.hi, p.lo_open, p.hi_open) == (10.0, 100.0, False, False)


def test_numeric_exclusive_and_inf():
    p = parse("@price:[(10 100.5]")
    assert (p.lo, p.lo_open) == (10.0, True)
    p = parse("@price:[-inf (1e2]")
    assert p.lo == -math.inf and p.hi == 100.0 and p.hi_open


def test_and_by_juxtaposition():
    p = parse("@genre:{comedy|horror} @year:[2015 2024]")
    assert isinstance(p, P.And) and len(p.children) == 2


def test_or_precedence():
    p = parse("@a:{x} @b:{y} | @c:{z}")
    # OR binds loosest: (a AND b) OR c
    assert isinstance(p, P.Or) and len(p.children) == 2
    assert isinstance(p.children[0], P.And)


def test_negate():
    p = parse("-@genre:{comedy} @year:[2015 2024]")
    assert isinstance(p, P.And)
    assert isinstance(p.children[0], P.Negate)
    assert isinstance(p.children[0].child, P.TagPredicate)


def test_parens():
    p = parse("(@a:{x} | @b:{y}) @c:[1 2]")
    assert isinstance(p, P.And)
    assert isinstance(p.children[0], P.Or)


def test_text_terms():
    p = parse("hello")
    assert isinstance(p, P.TextPredicate) and p.match == "term"
    p = parse("hello*")
    assert p.match == "prefix" and p.term == "hello"
    p = parse("*hello")
    assert p.match == "suffix"
    p = parse("@t:hello")
    assert p.field == "t"


def test_phrase_and_fuzzy():
    p = parse('"hello world"')
    assert p.match == "phrase" and p.phrase == ("hello", "world")
    p = parse("%%hello%%")
    assert p.match == "fuzzy" and p.distance == 2
    with pytest.raises(qp.QuerySyntaxError):
        parse("%%hello%")


def test_field_scoped_text_group():
    p = parse("@t:(hello | world)")
    assert isinstance(p, P.Or)
    assert all(c.field == "t" for c in p.children)


def test_param_substitution():
    p = parse("@color:{$c}", {"c": "blue"})
    assert p.values == ["blue"]
    p = parse("@n:[$lo $hi]", {"lo": "5", "hi": "7"})
    assert (p.lo, p.hi) == (5.0, 7.0)
    with pytest.raises(qp.QuerySyntaxError):
        parse("@color:{$missing}")


def test_syntax_errors():
    for bad in ["", "@f:", "@f:{", "@f:[1]", "@f:[1 2 3]", "(@a:{x}", "@f:[x y]"]:
        with pytest.raises(qp.QuerySyntaxError):
            parse(bad)


def test_split_vector_clause():
    f, k = qp.split_vector_clause("*=>[KNN 10 @v $b]")
    assert f == "*" and k == "[KNN 10 @v $b]"
    f, k = qp.split_vector_clause("@t:{x}")
    assert k is None
    # '=>' inside brackets is not a split point
    f, k = qp.split_vector_clause("@t:{a=>b}=>[KNN 5 @v $b]")
    assert f == "@t:{a=>b}"


def test_parse_knn():
    blob = b"\x00" * 8
    knn = qp.parse_knn_clause("[KNN 10 @vec $b EF_RUNTIME 50 AS d]", {"b": blob})
    assert knn.k == 10 and knn.field == "vec"
    assert knn.ef_runtime == 50 and knn.score_as == "d"
    assert knn.vector == blob
    with pytest.raises(qp.QuerySyntaxError):
        qp.parse_knn_clause("[KNN 0 @vec $b]", {"b": blob})
    with pytest.raises(qp.QuerySyntaxError):
        qp.parse_knn_clause("[KNN 5 @vec $missing]", {})


def test_full_query_parse():
    blob = b"\x00" * 8
    pred, knn = qp.parse_query(
        "(@genre:{sci-fi} @year:[2000 +inf])=>[KNN 5 @emb $v]", {"v": blob}
    )
    assert isinstance(pred, P.And) and knn.k == 5


def test_predicate_serialization_roundtrip():
    p = parse("(-@a:{x|yy*} @n:[(1 +inf]) | hello*")
    d = p.to_dict()
    p2 = P.Predicate.from_dict(d)
    assert p2.to_dict() == d
