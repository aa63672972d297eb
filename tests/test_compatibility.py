"""Golden-answer conformance vs recorded Redisearch behavior.

The reference's own integration suite replays these pickles against
valkey-search as its compatibility oracle (SURVEY.md §4.2); here the same
commands replay against this engine. Thresholds assert the measured
conformance level so regressions fail loudly. All suites sit at 100%
(46k recorded replies)."""

import os

import pytest

import compat_harness as H

pytestmark = pytest.mark.skipif(
    not os.path.isdir(H.REF_COMPAT), reason="reference tree not mounted"
)


@pytest.fixture(autouse=True)
def _reset_config():
    yield
    from valkey_search_tpu.runtime import config

    config.REGISTRY.reset_all()  # drop the emulate-release pin


@pytest.fixture(scope="module")
def text_groups():
    return H.group_answers(H.load_answers("text-search-answers.pickle.gz"))


@pytest.mark.parametrize("key_type", ["hash", "json"])
@pytest.mark.parametrize("schema_type", ["default", "nostem"])
def test_pure_text_conformance(text_groups, key_type, schema_type):
    key = (key_type, "pure text", schema_type)
    eng = H.build_engine("pure text", key_type, schema_type)
    passed, total, fails = H.run_group(eng, text_groups[key])
    assert total >= 6000
    rate = passed / total
    assert rate == 1.0, (
        f"{key}: {rate:.4%} — first failures: "
        + "; ".join(str(f['why'])[:80] for f in fails[:3])
    )


def test_expr_conformance():
    """Expression-engine oracle: 6,590 recorded APPLY evaluations."""
    groups = H.group_answers(H.load_answers("expr-answers.pickle.gz"))
    gp = gt = 0
    worst = []
    for key in sorted(groups):
        kt, dsname, _ = key
        eng = H.build_engine_agg(dsname, kt)
        p, t, fails = H.run_group(eng, groups[key])
        gp += p
        gt += t
        worst += fails[:2]
    assert gt >= 6000
    rate = gp / gt
    assert rate == 1.0, (
        f"expr conformance {rate:.4%}: "
        + "; ".join(str(f['why'])[:70] for f in worst[:3])
    )


def test_aggregate_conformance():
    """FT.AGGREGATE/FT.SEARCH oracle: 9,384 recorded replies across 13
    datasets (numbers/strings/tags/vectors, hash+json)."""
    groups = H.group_answers(H.load_answers("aggregate-answers.pickle.gz"))
    gp = gt = 0
    worst = []
    for key in sorted(groups):
        kt, dsname, _ = key
        eng = H.build_engine_agg(dsname, kt)
        p, t, fails = H.run_group(eng, groups[key])
        gp += p
        gt += t
        worst += fails[:2]
    assert gt >= 9000
    rate = gp / gt
    assert rate == 1.0, (
        f"aggregate conformance {rate:.4%}: "
        + "; ".join(str(f['why'])[:70] for f in worst[:3])
    )


@pytest.mark.parametrize("key_type", ["hash", "json"])
@pytest.mark.parametrize("schema_type", ["default", "nostem"])
def test_punctuation_conformance(text_groups, key_type, schema_type):
    key = (key_type, "punctuation", schema_type)
    eng = H.build_engine("punctuation", key_type, schema_type)
    passed, total, fails = H.run_group(eng, text_groups[key])
    rate = passed / total
    assert rate == 1.0, (
        f"{key}: {rate:.4%} — first failures: "
        + "; ".join(str(f['why'])[:80] for f in fails[:3])
    )
