"""Endurance: concurrent ingest + search + checkpoint cycles.

Scaled-down equivalent of the reference's memtier endurance suite
(.github/workflows/endurance_tests.yml + run_endurance_test.sh:
long-running save/restore under write+query load). Asserts no lost
writes, no torn reads, and checkpoint/restore equivalence while the
engine is being hammered from multiple threads."""

import threading

import numpy as np
import pytest

from valkey_search_tpu.server.engine import Engine

D = 8
N_WRITERS = 3
N_READERS = 2
OPS_PER_WRITER = 120


@pytest.fixture()
def eng():
    e = Engine()
    e.execute(
        "FT.CREATE", "idx", "ON", "HASH", "PREFIX", "1", "doc:",
        "SCHEMA",
        "emb", "VECTOR", "FLAT", "6",
        "TYPE", "FLOAT32", "DIM", str(D), "DISTANCE_METRIC", "L2",
        "grp", "TAG", "seq", "NUMERIC",
    )
    return e


def test_concurrent_ingest_search_checkpoint(eng, tmp_path):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((N_WRITERS * OPS_PER_WRITER, D)).astype(np.float32)
    errors = []
    stop = threading.Event()

    def writer(wid):
        try:
            for i in range(OPS_PER_WRITER):
                gid = wid * OPS_PER_WRITER + i
                eng.hset(f"doc:{gid}", {
                    "emb": vecs[gid].tobytes(),
                    "grp": f"w{wid}",
                    "seq": str(gid),
                })
                if i % 10 == 9:
                    eng.delete(f"doc:{gid}")  # churn
        except Exception as exc:  # pragma: no cover
            errors.append(("writer", wid, exc))

    def reader(rid):
        try:
            while not stop.is_set():
                r = eng.execute("FT.SEARCH", "idx", f"@grp:{{w{rid}}}",
                                "NOCONTENT", "LIMIT", "0", "1000")
                # count must equal returned keys (no torn replies)
                assert r[0] == len(r[1:])
                for k in r[1:]:
                    assert k.startswith("doc:")
        except Exception as exc:  # pragma: no cover
            errors.append(("reader", rid, exc))

    writers = [threading.Thread(target=writer, args=(w,)) for w in range(N_WRITERS)]
    readers = [threading.Thread(target=reader, args=(r,)) for r in range(N_READERS)]
    for t in writers + readers:
        t.start()
    for t in writers:
        t.join(60)
    stop.set()
    for t in readers:
        t.join(60)
    assert not errors, errors[:3]

    # final state: every 10th doc deleted, rest present
    expected = {
        f"doc:{w * OPS_PER_WRITER + i}"
        for w in range(N_WRITERS)
        for i in range(OPS_PER_WRITER)
        if i % 10 != 9
    }
    r = eng.execute("FT.SEARCH", "idx", "*", "NOCONTENT", "LIMIT", "0", "10000")
    assert set(r[1:]) == expected

    # checkpoint cycles under a fresh write load
    for cycle in range(3):
        p = str(tmp_path / f"endurance{cycle}.vstpu")
        eng.save(p)
        e2 = Engine.load(p)
        r2 = e2.execute("FT.SEARCH", "idx", "*", "NOCONTENT",
                        "LIMIT", "0", "10000")
        assert set(r2[1:]) == set(
            eng.execute("FT.SEARCH", "idx", "*", "NOCONTENT",
                        "LIMIT", "0", "10000")[1:]
        )
        # KNN equivalence spot check after restore
        q = vecs[7].tobytes()
        a = eng.execute("FT.SEARCH", "idx", "*=>[KNN 5 @emb $q]",
                        "PARAMS", "2", "q", q, "NOCONTENT")
        b = e2.execute("FT.SEARCH", "idx", "*=>[KNN 5 @emb $q]",
                       "PARAMS", "2", "q", q, "NOCONTENT")
        assert a == b
        # keep mutating between cycles
        eng.hset(f"doc:extra{cycle}", {
            "emb": vecs[cycle].tobytes(), "grp": "extra", "seq": "0",
        })


def test_async_ingest_endurance():
    e = Engine(sync_ingest=False)
    e.execute("FT.CREATE", "i", "ON", "HASH", "PREFIX", "1", "k:",
              "SCHEMA", "t", "TAG")
    for round_ in range(5):
        for i in range(100):
            e.hset(f"k:{i}", {"t": f"r{round_}"})
        e.drain()
        r = e.execute("FT.SEARCH", "i", f"@t:{{r{round_}}}", "NOCONTENT",
                      "LIMIT", "0", "200")
        assert r[0] == 100
    from valkey_search_tpu.runtime.metrics import STATS

    assert STATS.get("mutations_applied") > 0
