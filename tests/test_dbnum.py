"""Cluster multi-db (valkey 9 dbnum).

Mirrors /root/reference/integration/test_dbnum.py: indexes created under
different SELECTed dbs gossip to every node with their db, FT._LIST is
per-db everywhere, per-db data/queries stay isolated, and the metadata
min-version for a non-zero-db index is 1.1 (index_schema.cc GetMinVersion
kRelease11). Plus: the replication stream carries SELECT frames so
replicas mirror every db.
"""

import time

import pytest

from valkey_search_tpu.cluster.transport import (
    NodeServer,
    RespConnection,
    assign_slot_ranges,
)
from valkey_search_tpu.cluster.metadata import encode_version
from valkey_search_tpu.runtime import config
from valkey_search_tpu.runtime.debug import reset_all


@pytest.fixture(autouse=True)
def _clean():
    reset_all()
    yield
    reset_all()
    config.REGISTRY.reset_all()


@pytest.fixture
def trio_nodes():
    nodes = [NodeServer(f"db{i}", port=0, gossip_interval_s=0.05)
             for i in range(3)]
    for (lo, hi), n in zip(assign_slot_ranges(3), nodes):
        n.slots = (lo, hi)
    for n in nodes:
        n.resp.start()
    addrs = [f"127.0.0.1:{n.port}" for n in nodes]
    import threading

    for i, n in enumerate(nodes):
        n.peers = [a for j, a in enumerate(addrs) if j != i]
        n._gossip_thread = threading.Thread(target=n._gossip_loop,
                                            daemon=True)
        n._gossip_thread.start()
    yield nodes
    for n in nodes:
        n.close()


def _wait(cond, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.05)
    return cond()


def test_dbnum_cluster(trio_nodes):
    nodes = trio_nodes
    conns = [RespConnection(("127.0.0.1", n.port)) for n in nodes]
    c0, c1, c2 = conns
    try:
        # index0 in db 0 on node0; index1 in db 1 on node1
        assert c1.cmd("SELECT", "1") == "OK"
        c1.cmd("FT.CREATE", "index1", "SCHEMA", "t", "TAG")
        c0.cmd("FT.CREATE", "index0", "SCHEMA", "t", "TAG")

        def converged():
            return all(
                n.engine.manager.list_names() == ["index0"]
                and n.resp.engine_for(1).manager.list_names() == ["index1"]
                for n in nodes
            )

        assert _wait(converged), [
            (n.engine.manager.list_names(),
             n.resp.engine_for(1).manager.list_names()) for n in nodes
        ]
        # FT._LIST is per-SELECTed-db on every node
        assert c0.cmd("FT._LIST") == [b"index0"]
        assert c1.cmd("FT._LIST") == [b"index1"]
        c2.cmd("SELECT", "1")
        assert c2.cmd("FT._LIST") == [b"index1"]
        c2.cmd("SELECT", "0")
        assert c2.cmd("FT._LIST") == [b"index0"]

        # the db-1 index's metadata requires release 1.1
        e1 = nodes[0].metadata.get("index1")
        assert e1.min_version == encode_version(1, 1)
        assert nodes[0].metadata.get("index0").min_version \
            == encode_version(1, 0)

        # per-db data isolation: the same key in db 0 and db 1
        owner = None
        from valkey_search_tpu.cluster.node import key_slot

        slot = key_slot("0")
        for n, c in zip(nodes, conns):
            if n.slots[0] <= slot < n.slots[1]:
                owner, oc = n, c
                break
        oc.cmd("SELECT", "0")
        oc.cmd("HSET", "0", "t", "tag0")
        oc.cmd("SELECT", "1")
        oc.cmd("HSET", "0", "t", "tag1")
        r0 = oc.cmd("SELECT", "0") and oc.cmd(
            "FT.SEARCH", "index0", "@t:{tag0}", "NOCONTENT")
        assert r0[0] == 1
        oc.cmd("SELECT", "1")
        r1 = oc.cmd("FT.SEARCH", "index1", "@t:{tag1}", "NOCONTENT")
        assert r1[0] == 1
        # cross-db: db1's index never sees db0's value
        assert oc.cmd("FT.SEARCH", "index1", "@t:{tag0}",
                      "NOCONTENT")[0] == 0

        # drop from the owning db; tombstone clears it everywhere
        oc.cmd("FT.DROPINDEX", "index1")
        assert _wait(lambda: all(
            n.resp.engine_for(1).manager.list_names() == [] for n in nodes
        ))
        assert all(n.engine.manager.list_names() == ["index0"]
                   for n in nodes)
    finally:
        for c in conns:
            c.close()


def test_multidb_replication_stream():
    """The primary→replica stream carries SELECT frames: writes in db 1
    land in the replica's db-1 engine, db 0 stays isolated."""
    primary = NodeServer("mp", port=0).start()
    replica = NodeServer("mr", port=0).start()
    pc = RespConnection(("127.0.0.1", primary.port))
    try:
        # pre-replica data in both dbs (exercises multi-db full sync)
        pc.cmd("HSET", "k0", "f", "zero")
        pc.cmd("SELECT", "1")
        pc.cmd("HSET", "k1", "f", "one")
        replica.become_replica_of(f"127.0.0.1:{primary.port}")
        assert _wait(lambda: "k1" in replica.resp.engine_for(1).keyspace)
        assert "k0" in replica.engine.keyspace
        assert "k1" not in replica.engine.keyspace
        # live stream with db switches
        pc.cmd("HSET", "k1b", "f", "live1")
        pc.cmd("SELECT", "0")
        pc.cmd("HSET", "k0b", "f", "live0")
        assert _wait(lambda: "k0b" in replica.engine.keyspace
                     and "k1b" in replica.resp.engine_for(1).keyspace)
        assert "k1b" not in replica.engine.keyspace
    finally:
        pc.close()
        primary.close()
        replica.close()


def test_cross_db_name_collision_and_drop_guards(trio_nodes):
    """Re-creating an existing cluster index name (any db) errors instead
    of silently destroying it, and FT.DROPINDEX only sees the SELECTed
    db's indexes (review findings: cross-db destruction repros)."""
    from valkey_search_tpu.cluster.transport import ReplyError

    nodes = trio_nodes
    c = RespConnection(("127.0.0.1", nodes[0].port))
    try:
        c.cmd("FT.CREATE", "guard", "SCHEMA", "t", "TAG")
        c.cmd("SELECT", "1")
        with pytest.raises(ReplyError, match="already exists"):
            c.cmd("FT.CREATE", "guard", "SCHEMA", "t", "TAG")
        # db 0's index untouched
        c.cmd("SELECT", "0")
        assert c.cmd("FT._LIST") == [b"guard"]
        # dropping from the wrong db answers not-found
        c.cmd("SELECT", "5")
        with pytest.raises(ReplyError, match="not found"):
            c.cmd("FT.DROPINDEX", "guard")
        c.cmd("SELECT", "0")
        assert c.cmd("FT._LIST") == [b"guard"]
        assert c.cmd("FT.DROPINDEX", "guard") == "OK"
    finally:
        c.close()


def test_multidb_replication_under_concurrent_writers():
    """Two writer threads on different dbs: the SELECT-framed stream must
    deliver every write to the right db engine on the replica with no
    cross-db bleed (single-forwarder ordering drill)."""
    import threading

    primary = NodeServer("cp", port=0).start()
    replica = NodeServer("cr", port=0).start()
    try:
        replica.become_replica_of(f"127.0.0.1:{primary.port}")
        N = 150

        def writer(db):
            c = RespConnection(("127.0.0.1", primary.port))
            if db:
                c.cmd("SELECT", str(db))
            for i in range(N):
                c.cmd("HSET", f"w{db}:{i}", "f", f"v{db}-{i}")
            c.close()

        ts = [threading.Thread(target=writer, args=(d,)) for d in (0, 2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()

        def mirrored():
            e0, e2 = replica.engine, replica.resp.engine_for(2)
            return (len([k for k in e0.keyspace if k.startswith("w0:")])
                    == N
                    and len([k for k in e2.keyspace
                             if k.startswith("w2:")]) == N)

        assert _wait(mirrored, timeout=10.0), (
            len(replica.engine.keyspace),
            len(replica.resp.engine_for(2).keyspace),
        )
        # no bleed: db0 never received db2's keys and vice versa
        assert not any(k.startswith("w2:") for k in replica.engine.keyspace)
        assert not any(k.startswith("w0:")
                       for k in replica.resp.engine_for(2).keyspace)
        # spot-check values landed unswapped
        assert replica.resp.engine_for(2).hgetall("w2:7")["f"] in (
            b"v2-7", "v2-7")
    finally:
        primary.close()
        replica.close()
