"""Generative differential fuzz: random filter queries vs a naive oracle.

The recorded-answer suite (test_compatibility.py) replays fixed oracle
cases; this fuzz *generates* random corpora and random predicate trees and
checks the engine's result set against a brute-force evaluation of the
same predicate over the raw documents — covering planner/path choices
(probe vs materialize AND, negation, nested OR, numeric bounds, prefix
expansion) the fixed cases may miss. Seeded: failures reproduce.

Reference analog: integration/test_filter_expressions.py +
test_query_parser.py randomized sections.
"""

import numpy as np
import pytest

from valkey_search_tpu.server.engine import Engine

COLORS = ["red", "green", "blue", "cyan", "violet"]
WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
         "omega", "omicron", "sigma", "lambda"]


@pytest.fixture(scope="module")
def corpus_engine():
    rng = np.random.default_rng(1234)
    e = Engine()
    e.execute(
        "FT.CREATE", "f", "ON", "HASH", "PREFIX", "1", "x:",
        "SCHEMA", "c", "TAG", "n", "NUMERIC", "t", "TEXT",
    )
    docs = {}
    for i in range(400):
        fields = {
            "c": ",".join(
                rng.choice(COLORS, size=rng.integers(1, 3), replace=False)
            ),
            "n": str(round(float(rng.uniform(-50, 50)), 3)),
            "t": " ".join(rng.choice(WORDS, size=6)),
        }
        e.hset(f"x:{i}", fields)
        docs[f"x:{i}"] = fields
    # holes: deleted and tag-less docs
    for i in range(0, 40, 7):
        e.delete(f"x:{i}")
        del docs[f"x:{i}"]
    return e, docs


def _gen_pred(rng, depth=0):
    """Returns (query_fragment, match_fn(fields) -> bool)."""
    kind = rng.choice(
        ["tag", "num", "term", "prefix", "and", "or", "neg"]
        if depth < 3 else ["tag", "num", "term", "prefix"]
    )
    if kind == "tag":
        vals = list(rng.choice(COLORS, size=int(rng.integers(1, 3)),
                               replace=False))
        frag = "@c:{" + "|".join(vals) + "}"
        return frag, lambda f, v=set(vals): bool(
            v & set(f["c"].split(",")))
    if kind == "num":
        lo, hi = sorted(rng.uniform(-60, 60, size=2).round(2))
        frag = f"@n:[{lo} {hi}]"
        return frag, lambda f, lo=lo, hi=hi: lo <= float(f["n"]) <= hi
    if kind == "term":
        w = str(rng.choice(WORDS))
        return f"@t:{w}", lambda f, w=w: w in f["t"].split()
    if kind == "prefix":
        p = str(rng.choice(["al", "om", "ze", "ga"]))
        return f"@t:{p}*", lambda f, p=p: any(
            w.startswith(p) for w in f["t"].split())
    a_frag, a_fn = _gen_pred(rng, depth + 1)
    b_frag, b_fn = _gen_pred(rng, depth + 1)
    if kind == "and":
        return (f"({a_frag} {b_frag})",
                lambda f, a=a_fn, b=b_fn: a(f) and b(f))
    if kind == "or":
        return (f"({a_frag} | {b_frag})",
                lambda f, a=a_fn, b=b_fn: a(f) or b(f))
    # negation only of a leaf (engine semantics: -pred over indexed docs)
    return f"-{a_frag}", lambda f, a=a_fn: not a(f)


def test_random_predicates_match_oracle(corpus_engine):
    e, docs = corpus_engine
    rng = np.random.default_rng(99)
    mismatches = []
    for qi in range(250):
        frag, fn = _gen_pred(rng)
        res = e.ft_search("f", frag, "NOCONTENT", "LIMIT", "0", "1000")
        got = set(map(str, res[1:]))
        want = {k for k, f in docs.items() if fn(f)}
        if got != want:
            mismatches.append((frag, len(got), len(want),
                               sorted(got ^ want)[:4]))
    assert not mismatches, mismatches[:3]


def test_random_hybrid_knn_prefilter_matches_oracle(corpus_engine):
    """KNN over a random filter: result keys must come from the filter's
    oracle set and be the true k nearest among them."""
    rng = np.random.default_rng(7)
    e = Engine()
    e.execute(
        "FT.CREATE", "h", "ON", "HASH", "PREFIX", "1", "y:",
        "SCHEMA", "v", "VECTOR", "FLAT", "6", "TYPE", "FLOAT32",
        "DIM", "8", "DISTANCE_METRIC", "L2", "c", "TAG", "n", "NUMERIC",
    )
    vecs = rng.standard_normal((300, 8)).astype(np.float32)
    meta = {}
    for i, v in enumerate(vecs):
        c = COLORS[i % len(COLORS)]
        e.hset(f"y:{i}", {"v": v.tobytes(), "c": c, "n": str(i % 100)})
        meta[f"y:{i}"] = (c, i % 100)
    for t in range(30):
        color = COLORS[t % len(COLORS)]
        lo = int(rng.integers(0, 60))
        hi = lo + int(rng.integers(5, 40))
        q = vecs[int(rng.integers(0, 300))]
        res = e.ft_search(
            "h", f"(@c:{{{color}}} @n:[{lo} {hi}])=>[KNN 5 @v $q]",
            "PARAMS", "2", "q", q.tobytes(), "NOCONTENT")
        got = [str(k) for k in res[1:]]
        qualified = [k for k, (c, n) in meta.items()
                     if c == color and lo <= n <= hi]
        dd = {k: float(np.sum((vecs[int(k.split(':')[1])] - q) ** 2))
              for k in qualified}
        want = sorted(dd, key=dd.get)[:5]
        assert got == want, (t, color, lo, hi, got, want)
