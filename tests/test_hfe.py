"""Hash-field expiration (HFE) + replica FT.CREATE refusal.

Mirrors /root/reference/integration/test_expired.py
test_hash_field_expiration_should_update_index (HEXPIRE on an indexed
field fires the notification path: the field leaves the index while the
key — and num_docs — survive) and test_ft_create.py
ft_create_fails_on_replica ("You can't write against a read only
replica").
"""

import time

import pytest

from valkey_search_tpu.server.engine import Engine


@pytest.fixture
def engine():
    e = Engine(sync_ingest=True)
    e.execute("FT.CREATE", "my_index", "SCHEMA",
              "t", "TAG", "n", "NUMERIC")
    return e


def test_hash_field_expiration_updates_index(engine):
    e = engine
    e.hset("test_key", {"t": "mytag", "n": "1"})
    assert e.execute("FT.SEARCH", "my_index", "@t:{mytag}")[0] == 1
    assert e.execute("HEXPIRE", "test_key", "0.05",
                     "FIELDS", "1", "t") == [1]
    time.sleep(0.08)
    e.sweep_expired()
    # the tag field left the index; the key (and its numeric field) remain
    assert e.execute("FT.SEARCH", "my_index", "@t:{mytag}")[0] == 0
    assert e.execute("FT.SEARCH", "my_index", "@n:[1 1]")[0] == 1
    info = dict(zip(*(iter(e.execute("FT.INFO", "my_index")),) * 2))
    assert int(info["num_docs"]) == 1
    assert e.hgetall("test_key") == {"n": "1"}


def test_hexpire_last_field_deletes_key(engine):
    e = engine
    e.hset("k1", {"t": "solo"})
    e.execute("HEXPIRE", "k1", "0.05", "FIELDS", "1", "t")
    time.sleep(0.08)
    e.sweep_expired()
    assert e.hgetall("k1") == {}
    assert e.execute("FT.SEARCH", "my_index", "@t:{solo}")[0] == 0


def test_hexpire_ttl_persist_contract(engine):
    e = engine
    e.hset("k2", {"t": "a", "n": "2"})
    # missing key / field → -2
    assert e.execute("HEXPIRE", "ghost", "5", "FIELDS", "1", "t") == [-2]
    assert e.execute("HTTL", "k2", "FIELDS", "2", "t", "nope") == [-1, -2]
    assert e.execute("HEXPIRE", "k2", "100", "FIELDS", "1", "t") == [1]
    ttl = e.execute("HTTL", "k2", "FIELDS", "1", "t")[0]
    assert 95 <= ttl <= 100
    # HPERSIST clears; second call reports no TTL
    assert e.execute("HPERSIST", "k2", "FIELDS", "1", "t") == [1]
    assert e.execute("HPERSIST", "k2", "FIELDS", "1", "t") == [-1]
    # ttl<=0 deletes the field immediately (HEXPIRE contract value 2)
    assert e.execute("HEXPIRE", "k2", "0", "FIELDS", "1", "t") == [2]
    assert e.hgetall("k2") == {"n": "2"}


def test_hset_clears_field_ttl(engine):
    e = engine
    e.hset("k3", {"t": "x"})
    e.execute("HEXPIRE", "k3", "0.05", "FIELDS", "1", "t")
    e.hset("k3", {"t": "y"})  # rewrite clears the pending TTL
    time.sleep(0.08)
    e.sweep_expired()
    assert e.hgetall("k3") == {"t": "y"}
    assert e.execute("FT.SEARCH", "my_index", "@t:{y}")[0] == 1


def test_lazy_field_expiry_on_read(engine):
    e = engine
    e.hset("k4", {"t": "zed", "n": "4"})
    e.execute("HEXPIRE", "k4", "0.05", "FIELDS", "1", "t")
    time.sleep(0.08)
    # no sweep: the TTL read path expires lazily
    assert e.execute("HTTL", "k4", "FIELDS", "1", "t") == [-2]
    assert e.hgetall("k4") == {"n": "4"}


def test_ft_create_fails_on_replica():
    from valkey_search_tpu.cluster.transport import (
        NodeServer,
        ReplyError,
        RespConnection,
    )

    primary = NodeServer("hfp", port=0).start()
    replica = NodeServer("hfr", port=0).start()
    try:
        replica.become_replica_of(f"127.0.0.1:{primary.port}")
        rc = RespConnection(("127.0.0.1", replica.port))
        with pytest.raises(ReplyError,
                           match="You can't write against a read only"):
            rc.cmd("FT.CREATE", "ridx", "SCHEMA", "n", "NUMERIC")
        pc = RespConnection(("127.0.0.1", primary.port))
        assert pc.cmd("FT.CREATE", "ridx", "SCHEMA", "n", "NUMERIC") == "OK"
        with pytest.raises(ReplyError,
                           match="You can't write against a read only"):
            rc.cmd("FT.DROPINDEX", "ridx")
        # promotion lifts the restriction
        replica.promote_to_primary(f"127.0.0.1:{primary.port}")
        rc.cmd("FT.CREATE", "ridx2", "SCHEMA", "n", "NUMERIC")
        rc.close()
        pc.close()
    finally:
        primary.close()
        replica.close()


def test_replica_refuses_client_keyspace_writes_but_accepts_stream():
    """Client HSET/DEL on a replica answer -READONLY, while the primary's
    replication stream (marked via _REPL.STREAM) keeps flowing (valkey
    replica-read-only semantics)."""
    import time as _t

    from valkey_search_tpu.cluster.transport import (
        NodeServer,
        ReplyError,
        RespConnection,
    )

    primary = NodeServer("rwp", port=0).start()
    replica = NodeServer("rwr", port=0).start()
    try:
        replica.become_replica_of(f"127.0.0.1:{primary.port}")
        pc = RespConnection(("127.0.0.1", primary.port))
        rc = RespConnection(("127.0.0.1", replica.port))
        with pytest.raises(ReplyError, match="read only replica"):
            rc.cmd("HSET", "wk", "f", "v")
        with pytest.raises(ReplyError, match="read only replica"):
            rc.cmd("DEL", "wk")
        # primary write replicates through the stream despite the guard
        pc.cmd("HSET", "wk", "f", "v1")
        deadline = _t.time() + 5
        while _t.time() < deadline and "wk" not in replica.engine.keyspace:
            _t.sleep(0.05)
        assert replica.engine.hgetall("wk") == {"f": b"v1"} or \
            replica.engine.hgetall("wk") == {"f": "v1"}
        # reads stay allowed on the replica
        assert rc.cmd("HGETALL", "wk")
        pc.close()
        rc.close()
    finally:
        primary.close()
        replica.close()


# -- review-fix regressions ---------------------------------------------------

def test_hexpire_zero_on_last_field_deletes_key(engine):
    e = engine
    e.hset("z1", {"t": "only"})
    assert e.execute("HEXPIRE", "z1", "0", "FIELDS", "1", "t") == [2]
    assert e.execute("EXISTS", "z1") == 0  # valkey never keeps empty hashes
    assert e.execute("FT.SEARCH", "my_index", "@t:{only}")[0] == 0


def test_httl_rounds_up_and_hpttl_is_millisecond(engine):
    e = engine
    e.hset("z2", {"t": "x"})
    e.execute("HPEXPIRE", "z2", "400", "FIELDS", "1", "t")
    # live sub-second TTL: HTTL reports 1 (ceil), never the ambiguous 0
    assert e.execute("HTTL", "z2", "FIELDS", "1", "t") == [1]
    ms = e.execute("HPTTL", "z2", "FIELDS", "1", "t")[0]
    assert 200 <= ms <= 400


def test_field_ttls_survive_save_restore(engine, tmp_path):
    from valkey_search_tpu.persistence.checkpoint import (
        load_engine,
        save_engine,
    )

    e = engine
    e.hset("z3", {"t": "keep", "n": "3"})
    e.execute("HEXPIRE", "z3", "100", "FIELDS", "1", "t")
    path = str(tmp_path / "hfe.vstpu")
    save_engine(e, path)
    e2 = load_engine(path)
    ttl = e2.execute("HTTL", "z3", "FIELDS", "1", "t")[0]
    assert 95 <= ttl <= 100
    assert e2.execute("HTTL", "z3", "FIELDS", "1", "n") == [-1]


def test_replica_refuses_hexpire():
    from valkey_search_tpu.cluster.transport import (
        NodeServer,
        ReplyError,
        RespConnection,
    )

    primary = NodeServer("hep", port=0).start()
    replica = NodeServer("her", port=0).start()
    try:
        replica.become_replica_of(f"127.0.0.1:{primary.port}")
        rc = RespConnection(("127.0.0.1", replica.port))
        with pytest.raises(ReplyError, match="read only replica"):
            rc.cmd("HEXPIRE", "wk", "5", "FIELDS", "1", "f")
        with pytest.raises(ReplyError, match="read only replica"):
            rc.cmd("HPERSIST", "wk", "FIELDS", "1", "f")
        rc.close()
    finally:
        primary.close()
        replica.close()


def test_acl_all_minus_admin_denies_admin(engine):
    from valkey_search_tpu.server.acl import AclError

    engine.acl.setuser("u1", "on", ">pw", "~*", "+@all", "-@admin")
    u = engine.acl.getuser("u1")
    assert u.has_category("search")
    assert not u.has_category("admin")
    # re-granting lifts the denial
    engine.acl.setuser("u1", "+@admin")
    assert engine.acl.getuser("u1").has_category("admin")
    # unenforceable per-command DENY rules fail closed
    with pytest.raises(AclError, match="per-command deny"):
        engine.acl.setuser("u2", "on", "-FT.DROPINDEX")


def test_aggregate_timeout_counts_as_error(engine):
    from valkey_search_tpu.runtime.metrics import STATS

    engine.hset("ae1", {"t": "x", "n": "1"})
    q0 = STATS.get("aggregate_queries")
    e0 = STATS.get("aggregate_errors")
    with pytest.raises(Exception):
        engine.execute("FT.AGGREGATE", "my_index", "@n:[0 5]",
                       "TIMEOUT", "0")
    assert STATS.get("aggregate_queries") == q0 + 1
    assert STATS.get("aggregate_errors") == e0 + 1


def test_failed_load_restores_prior_keyspace(engine, tmp_path):
    from valkey_search_tpu.persistence.checkpoint import (
        load_engine,
        save_engine,
    )

    donor = type(engine)(sync_ingest=True)
    donor.execute("FT.CREATE", "didx", "SCHEMA", "n", "NUMERIC")
    donor.hset("dk", {"n": "1"})
    path = str(tmp_path / "bad.vstpu")
    save_engine(donor, path)
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) - 30])  # truncate mid-stream
    engine.hset("mine", {"t": "precious"})
    with pytest.raises(Exception):
        load_engine(path, engine=engine)
    # the pre-load keyspace survives a failed load
    assert engine.hgetall("mine") == {"t": "precious"}
