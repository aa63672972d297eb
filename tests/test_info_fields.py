"""INFO field presence/typing parity.

Mirrors /root/reference/integration/test_info.py test_info_fields_present:
every reference-spelled search_* INFO field exists with the right type —
integers parse as int, doubles as float, background_indexing_status is a
string, used_memory_human is SI-formatted (valkey_search.cc:93-160).
"""

import numpy as np
import pytest

from valkey_search_tpu.server.engine import Engine

INTEGER_FIELDS = [
    "search_query_queue_size",
    "search_writer_queue_size",
    "search_worker_pool_suspend_cnt",
    "search_writer_resumed_cnt",
    "search_reader_resumed_cnt",
    "search_writer_suspension_expired_cnt",
    "search_rdb_load_success_cnt",
    "search_rdb_load_failure_cnt",
    "search_rdb_save_success_cnt",
    "search_rdb_save_failure_cnt",
    "search_successful_requests_count",
    "search_failure_requests_count",
    "search_hybrid_requests_count",
    "search_inline_filtering_requests_count",
    "search_hnsw_add_exceptions_count",
    "search_hnsw_remove_exceptions_count",
    "search_hnsw_modify_exceptions_count",
    "search_hnsw_search_exceptions_count",
    "search_hnsw_create_exceptions_count",
    "search_string_interning_store_size",
    "search_vector_externing_entry_count",
    "search_vector_externing_hash_extern_errors",
    "search_vector_externing_generated_value_cnt",
    "search_vector_externing_num_lru_entries",
    "search_vector_externing_lru_promote_cnt",
    "search_vector_externing_deferred_entry_cnt",
    "search_number_of_attributes",
    "search_number_of_indexes",
    "search_total_indexed_documents",
    "search_total_active_write_threads",
    "search_used_memory_bytes",
    "search_index_reclaimable_memory",
]
DOUBLE_FIELDS = ["search_used_read_cpu", "search_used_write_cpu"]
STRING_FIELDS = ["search_background_indexing_status"]
HUMAN_FIELDS = ["search_used_memory_human"]


@pytest.fixture
def engine():
    e = Engine(sync_ingest=True)
    e.execute(
        "FT.CREATE", "idx", "SCHEMA",
        "v", "VECTOR", "HNSW", "6",
        "TYPE", "FLOAT32", "DIM", "4", "DISTANCE_METRIC", "L2",
        "t", "TAG",
    )
    for i in range(8):
        e.hset(f"k{i}", {"v": np.float32([i, 0, 0, 0]).tobytes(),
                         "t": "x"})
    return e


def test_info_fields_present(engine):
    info = engine.info(include_dev=True)
    for f in INTEGER_FIELDS:
        assert f in info, f
        int(info[f])
    for f in DOUBLE_FIELDS:
        assert f in info, f
        float(info[f])
    for f in STRING_FIELDS:
        assert f in info, f
        assert isinstance(info[f], str)
    for f in HUMAN_FIELDS:
        assert f in info, f
        assert str(info[f]).endswith(("B", "iB"))


def test_info_field_values_track_state(engine):
    info = engine.info(include_dev=True)
    assert int(info["search_number_of_indexes"]) == 1
    assert int(info["search_number_of_attributes"]) == 2
    assert int(info["search_total_indexed_documents"]) == 8
    assert int(info["search_string_interning_store_size"]) == 8
    assert int(info["search_used_memory_bytes"]) > 0
    assert info["search_background_indexing_status"] == "NO_ACTIVITY"
    base = info
    q = np.zeros(4, np.float32).tobytes()
    engine.execute("FT.SEARCH", "idx", "*=>[KNN 3 @v $q]",
                   "PARAMS", "2", "q", q, "NOCONTENT")
    info = engine.info(include_dev=True)
    assert (int(info["search_successful_requests_count"])
            == int(base["search_successful_requests_count"]) + 1)
    assert (int(info["search_failure_requests_count"])
            == int(base["search_failure_requests_count"]))


def test_hybrid_and_failure_request_counts(engine):
    base = engine.info(include_dev=True)
    q = np.zeros(4, np.float32).tobytes()
    engine.execute("FT.SEARCH", "idx", "(@t:{x})=>[KNN 3 @v $q]",
                   "PARAMS", "2", "q", q, "NOCONTENT")
    with pytest.raises(Exception):
        engine.execute("FT.SEARCH", "idx", "@nope:[bad")
    info = engine.info(include_dev=True)
    assert (int(info["search_hybrid_requests_count"])
            == int(base["search_hybrid_requests_count"]) + 1)
    assert (int(info["search_failure_requests_count"])
            == int(base["search_failure_requests_count"]) + 1)


def test_coordinator_partition_counters():
    """_PART.SEARCH RPCs tick the coordinator server/client counters
    (reference coordinator/server.cc:85-92, client.cc:174-184)."""
    from valkey_search_tpu.cluster.transport import (
        ClusterClient,
        NodeServer,
        assign_slot_ranges,
    )
    from valkey_search_tpu.runtime.metrics import STATS

    nodes = [NodeServer(f"cp{i}", port=0) for i in range(2)]
    for (lo, hi), n in zip(assign_slot_ranges(2), nodes):
        n.slots = (lo, hi)
    for n in nodes:
        n.resp.start()
    client = ClusterClient([f"127.0.0.1:{n.port}" for n in nodes])
    try:
        client.execute("FT.CREATE", "cidx", "ON", "HASH", "PREFIX", "1",
                       "cd:", "SCHEMA", "n", "NUMERIC")
        for i in range(6):
            client.execute("HSET", f"cd:{i}", "n", str(i))
        s0 = STATS.get("coordinator_server_partition_successes")
        c0 = STATS.get("coordinator_client_partition_successes")
        r = client.execute("FT.SEARCH", "cidx", "@n:[0 3]", "NOCONTENT")
        assert r[0] == 4
        assert STATS.get("coordinator_server_partition_successes") == s0 + 2
        assert STATS.get("coordinator_client_partition_successes") == c0 + 2
    finally:
        client.close()
        for n in nodes:
            n.close()


def test_allocator_level_memory_fields():
    """Process RSS and glibc heap gauges (the malloc-interposition truth
    the analytic per-subsystem pools cannot see)."""
    import numpy as np

    from valkey_search_tpu.server.engine import Engine

    e = Engine()
    info = e.info()
    for f in ("search_process_rss_bytes", "search_heap_allocated_bytes"):
        assert f in info
    # raw gauge values are plausible: RSS at least tens of MB for a
    # python+numpy process, heap non-zero, both monotone-ish under load
    def _parse(v):
        s = str(v)
        for suf, mul in (("GiB", 2**30), ("MiB", 2**20), ("KiB", 2**10),
                         ("B", 1)):
            if s.endswith(suf):
                return float(s[: -len(suf)]) * mul
        return float(s)

    rss = _parse(info["search_process_rss_bytes"])
    heap = _parse(info["search_heap_allocated_bytes"])
    assert rss > 32 * 2**20
    assert heap > 1 * 2**20
    # allocate through the engine; heap gauge must move. The gauge is
    # si_bytes-formatted (3 sig figs — ~10 MB resolution once the suite's
    # process heap reaches GBs), so the retained allocation must be large
    # enough to move the formatted value, not a 0.5 MB nudge.
    for i in range(2000):
        e.execute("HSET", f"m:{i}", "f", "x" * 32768)
    heap2 = _parse(e.info()["search_heap_allocated_bytes"])
    assert heap2 >= heap + 16 * 2**20, (heap, heap2)
