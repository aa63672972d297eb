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
        t.join(300)  # generous: CI boxes share one core with other load
        assert not t.is_alive(), "writer starved past the join budget"
    stop.set()
    for t in readers:
        t.join(300)
        assert not t.is_alive(), "reader starved past the join budget"
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


def test_wire_cluster_endurance(tmp_path):
    """Socket cluster under concurrent wire traffic: writers + searchers +
    a mid-run BGSAVE per node, replica staying in sync — the socket-level
    analog of the reference's memtier endurance suite
    (scripts/benchmark/run_endurance_test.sh)."""
    import threading
    import time

    import numpy as np

    from valkey_search_tpu.cluster.transport import (
        ClusterClient,
        NodeServer,
        RespConnection,
        assign_slot_ranges,
    )

    nodes = [NodeServer(f"e{i}", port=0, gossip_interval_s=0.05)
             for i in range(2)]
    for (lo, hi), n in zip(assign_slot_ranges(2), nodes):
        n.slots = (lo, hi)
    for n in nodes:
        n.resp.start()
    addrs = [f"127.0.0.1:{n.port}" for n in nodes]
    for i, n in enumerate(nodes):
        n.peers = [a for j, a in enumerate(addrs) if j != i]
    replica = NodeServer("er", port=0, gossip_interval_s=0.05).start()
    replica.become_replica_of(addrs[0])
    client = ClusterClient(addrs)
    dim = 8
    rng = np.random.default_rng(3)
    client.execute(
        "FT.CREATE", "idx", "ON", "HASH", "PREFIX", "1", "doc:",
        "SCHEMA", "emb", "VECTOR", "FLAT", "6", "TYPE", "FLOAT32",
        "DIM", str(dim), "DISTANCE_METRIC", "L2", "tags", "TAG",
    )
    vecs = rng.standard_normal((400, dim)).astype(np.float32)
    stop = time.time() + 4.0
    errors = []

    def writer():
        try:
            c = ClusterClient(addrs)
            i = 0
            while time.time() < stop:
                client_i = i % 400
                c.execute("HSET", f"doc:{client_i}", "emb",
                          vecs[client_i].tobytes(), "tags",
                          "even" if client_i % 2 == 0 else "odd")
                if i % 37 == 0:
                    c.execute("DEL", f"doc:{(i * 7) % 400}")
                i += 1
            c.close()
        except Exception as exc:  # noqa: BLE001
            errors.append(("writer", exc))

    def searcher():
        try:
            c = ClusterClient(addrs)
            while time.time() < stop:
                q = rng.standard_normal(dim).astype(np.float32)
                r = c.execute("FT.SEARCH", "idx", "*=>[KNN 3 @emb $q]",
                              "PARAMS", "2", "q", q.tobytes(), "NOCONTENT")
                assert isinstance(r[0], int)
            c.close()
        except Exception as exc:  # noqa: BLE001
            errors.append(("searcher", exc))

    def saver():
        try:
            conns = [RespConnection(("127.0.0.1", n.port)) for n in nodes]
            k = 0
            while time.time() < stop:
                for j, cc in enumerate(conns):
                    cc.cmd("SAVE", str(tmp_path / f"n{j}-{k}.vstpu"))
                k += 1
                time.sleep(0.5)
            for cc in conns:
                cc.close()
        except Exception as exc:  # noqa: BLE001
            errors.append(("saver", exc))

    threads = [threading.Thread(target=f)
               for f in (writer, writer, searcher, saver)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert not errors, errors

    # post-run integrity: cluster answers; replica converged for shard 0
    r = client.execute("FT.SEARCH", "idx", "@tags:{even}", "NOCONTENT",
                       "LIMIT", "0", "5")
    assert isinstance(r[0], int)
    time.sleep(0.3)
    shard0_keys = set(nodes[0].engine.keyspace)
    replica_keys = set(replica.engine.keyspace)
    missing = shard0_keys - replica_keys
    assert len(missing) <= max(2, len(shard0_keys) // 20), (
        len(missing), len(shard0_keys))
    client.close()
    replica.close()
    for n in nodes:
        n.close()


def test_create_drop_soak_releases_memory():
    """200 create→ingest→drop cycles: engine memory pools return to the
    empty-keyspace baseline (no leaked index structures — the reference's
    reclaimable-memory/RSS soak analog, test_reclaimable_memory.py)."""
    import numpy as np

    from valkey_search_tpu.server.engine import Engine

    e = Engine(sync_ingest=True)
    for i in range(8):
        e.hset(f"soak:{i}", {"v": np.float32([i, 0, 0]).tobytes(),
                             "t": "x", "n": str(i), "b": "hello world"})
    base = e.used_memory_bytes()
    for cycle in range(200):
        e.execute("FT.CREATE", "soak", "ON", "HASH", "PREFIX", "1",
                  "soak:", "SCHEMA",
                  "v", "VECTOR", "HNSW", "6",
                  "TYPE", "FLOAT32", "DIM", "3", "DISTANCE_METRIC", "L2",
                  "t", "TAG", "n", "NUMERIC", "b", "TEXT")
        e.execute("FT.DROPINDEX", "soak")
    after = e.used_memory_bytes()
    # allow small bounded growth (config/metrics jitter), not per-cycle leak
    assert after <= base * 1.2 + 4096, (base, after)
