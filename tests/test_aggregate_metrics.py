"""FT.AGGREGATE per-stage metrics + LOAD TEXT/VECTOR handling.

Mirrors /root/reference/integration/test_aggregate_metrics.py (stage
counters agg_*_stages / *_input_records / *_output_records, metrics.h via
ft_aggregate_exec.cc) and test_aggregate_load_text_vector.py (LOAD of a
TEXT field must return the text; LOAD of a VECTOR field must error rather
than reply with raw vector bytes, ft_aggregate.cc:71-74).
"""

import numpy as np
import pytest

from valkey_search_tpu.server.engine import Engine


@pytest.fixture
def engine():
    e = Engine(sync_ingest=True)
    e.execute(
        "FT.CREATE", "products", "SCHEMA",
        "price", "NUMERIC", "rating", "NUMERIC", "category", "TAG",
    )
    for i in range(20):
        e.hset(
            f"product:{i}",
            {
                "price": str(100 + i * 10),
                "rating": str(3.0 + (i % 3)),
                "category": f"cat{i % 3}",
            },
        )
    return e


def _snap(e):
    info = e.info(include_dev=True)
    return {k: v for k, v in info.items() if k.startswith("search_agg_")}


def test_limit_stage_metrics(engine):
    e = engine
    base = _snap(e)
    e.execute("FT.AGGREGATE", "products", "@rating:[-inf inf]",
              "LIMIT", "0", "5")
    now = _snap(e)
    assert now["search_agg_limit_stages"] == base["search_agg_limit_stages"] + 1
    assert (now["search_agg_limit_input_records"]
            == base["search_agg_limit_input_records"] + 20)
    assert (now["search_agg_limit_output_records"]
            == base["search_agg_limit_output_records"] + 5)
    assert (now["search_agg_input_records"]
            == base["search_agg_input_records"] + 20)
    assert (now["search_agg_output_records"]
            == base["search_agg_output_records"] + 5)


def test_groupby_stage_metrics(engine):
    e = engine
    base = _snap(e)
    e.execute("FT.AGGREGATE", "products", "@rating:[-inf inf]",
              "LOAD", "1", "category",
              "GROUPBY", "1", "@category", "REDUCE", "COUNT", "0", "AS", "n")
    now = _snap(e)
    assert (now["search_agg_group_by_stages"]
            == base["search_agg_group_by_stages"] + 1)
    assert (now["search_agg_group_by_input_records"]
            == base["search_agg_group_by_input_records"] + 20)
    # 3 categories -> 3 output groups, each ticking its 1 reducer
    assert (now["search_agg_group_by_output_records"]
            == base["search_agg_group_by_output_records"] + 3)
    assert (now["search_agg_reducer_stages"]
            == base["search_agg_reducer_stages"] + 3)
    assert (now["search_agg_output_records"]
            == base["search_agg_output_records"] + 3)


def test_apply_sortby_filter_metrics(engine):
    e = engine
    base = _snap(e)
    e.execute("FT.AGGREGATE", "products", "@rating:[-inf inf]",
              "APPLY", "@price * 2", "AS", "double_price")
    now = _snap(e)
    assert now["search_agg_apply_stages"] == base["search_agg_apply_stages"] + 1
    assert (now["search_agg_apply_records"]
            == base["search_agg_apply_records"] + 20)

    base = now
    e.execute("FT.AGGREGATE", "products", "@rating:[-inf inf]",
              "LOAD", "1", "price",
              "SORTBY", "2", "@price", "DESC", "MAX", "20")
    now = _snap(e)
    assert (now["search_agg_sort_by_stages"]
            == base["search_agg_sort_by_stages"] + 1)
    assert (now["search_agg_sort_by_records"]
            == base["search_agg_sort_by_records"] + 20)
    assert (now["search_agg_output_records"]
            == base["search_agg_output_records"] + 20)

    # SORTBY default MAX is 10 (ft_aggregate_parser.h:291) — a following
    # LIMIT sees only 10 inputs
    base = now
    e.execute("FT.AGGREGATE", "products", "@rating:[-inf inf]",
              "SORTBY", "1", "@category", "LIMIT", "0", "5")
    now = _snap(e)
    assert (now["search_agg_limit_input_records"]
            == base["search_agg_limit_input_records"] + 10)
    assert (now["search_agg_limit_output_records"]
            == base["search_agg_limit_output_records"] + 5)
    assert (now["search_agg_output_records"]
            == base["search_agg_output_records"] + 5)

    base = now
    e.execute("FT.AGGREGATE", "products", "@rating:[-inf inf]",
              "LOAD", "1", "price", "FILTER", "@price >= 150")
    now = _snap(e)
    assert (now["search_agg_filter_stages"]
            == base["search_agg_filter_stages"] + 1)
    assert (now["search_agg_filter_input_records"]
            == base["search_agg_filter_input_records"] + 20)
    # prices 100..290 step 10 -> 15 of 20 are >= 150
    assert (now["search_agg_filter_output_records"]
            == base["search_agg_filter_output_records"] + 15)


# -- LOAD of TEXT / VECTOR fields (test_aggregate_load_text_vector.py) ------

@pytest.fixture(params=["HASH", "JSON"])
def tv_engine(request):
    e = Engine(sync_ingest=True)
    vec = np.ones(3, np.float32).tobytes()
    if request.param == "HASH":
        e.execute(
            "FT.CREATE", "idx", "ON", "HASH", "PREFIX", "1", "doc:",
            "SCHEMA", "price", "NUMERIC", "title", "TEXT",
            "embedding", "VECTOR", "HNSW", "6",
            "TYPE", "FLOAT32", "DIM", "3", "DISTANCE_METRIC", "L2",
        )
        for i in range(3):
            e.hset(f"doc:{i}",
                   {"price": str(i), "title": "hello world",
                    "embedding": vec})
    else:
        e.execute(
            "FT.CREATE", "idx", "ON", "JSON", "PREFIX", "1", "doc:",
            "SCHEMA", "$.price", "AS", "price", "NUMERIC",
            "$.title", "AS", "title", "TEXT",
            "$.embedding", "AS", "embedding", "VECTOR", "HNSW", "6",
            "TYPE", "FLOAT32", "DIM", "3", "DISTANCE_METRIC", "L2",
        )
        for i in range(3):
            e.execute(
                "JSON.SET", f"doc:{i}", "$",
                '{"price": %d, "title": "hello world",'
                ' "embedding": [1.0, 1.0, 1.0]}' % i,
            )
    return e


def test_aggregate_load_text_field(tv_engine):
    res = tv_engine.execute(
        "FT.AGGREGATE", "idx", "@price:[-inf +inf]", "LOAD", "1", "@title"
    )
    assert res[0] == 3
    for row in res[1:]:
        fields = dict(zip(row[::2], row[1::2]))
        assert "hello world" in fields["title"]


def test_aggregate_load_vector_field_errors(tv_engine):
    with pytest.raises(Exception, match="(?i)vector"):
        tv_engine.execute(
            "FT.AGGREGATE", "idx", "@price:[-inf +inf]",
            "LOAD", "1", "@embedding",
        )
    # engine still healthy afterwards (the reference used to crash)
    assert tv_engine.execute("FT.AGGREGATE", "idx", "*",
                             "LOAD", "1", "@price")[0] == 3


# -- cancellation (integration/test_cancel.py aggregate drills) --------------

def test_aggregate_timeout_error_text(engine):
    """TIMEOUT expiry surfaces the reference's exact client error."""
    from valkey_search_tpu.utils.cancel import CancelledError

    with pytest.raises(CancelledError,
                       match="Search operation cancelled due to timeout"):
        engine.execute("FT.AGGREGATE", "products", "@rating:[-inf inf]",
                       "TIMEOUT", "0")


def test_aggregate_stage_boundary_cancel(engine):
    """A token cancelled between stages aborts the pipeline (stage-boundary
    checkpoints, reference cancel token spans the whole FT.AGGREGATE)."""
    from valkey_search_tpu.server.ft_aggregate import (
        aggregate_rows,
        parse_ft_aggregate,
    )
    from valkey_search_tpu.utils.cancel import CancelledError, Token

    spec = parse_ft_aggregate([
        "products", "@rating:[-inf inf]", "LIMIT", "0", "5",
    ])
    schema = engine.manager.get("products")
    token = Token()
    token.cancel("client kill")
    with pytest.raises(CancelledError):
        aggregate_rows(schema, spec, [], None, None, token=token)
