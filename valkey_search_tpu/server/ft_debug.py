"""FT._DEBUG — test/inspection command surface.

Reference: src/commands/ft_debug.cc:95-365 — PAUSEPOINT SET/RESET/TEST/
LIST, CONTROLLED_VARIABLE GET/SET/LIST, metrics/config listing,
STRING_POOL_STATS, SHOW_METADATA, SHOW_INDEX. Mutating debug controls
are gated behind `search.debug-mode` (module_config.h:222-227)."""

from __future__ import annotations

from typing import List

from valkey_search_tpu.runtime import config
from valkey_search_tpu.runtime.debug import CONTROLLED, PAUSEPOINTS, TEST_COUNTERS
from valkey_search_tpu.runtime.metrics import STATS


class FTDebugError(ValueError):
    pass


def _require_debug_mode() -> None:
    if not config.get("search.debug-mode"):
        raise FTDebugError(
            "FT._DEBUG control requires CONFIG SET search.debug-mode yes"
        )


def run_ft_debug(engine, args: List[str]) -> object:
    if not args:
        raise FTDebugError(
            "FT._DEBUG subcommand required: PAUSEPOINT | CONTROLLED_VARIABLE |"
            " TEST_COUNTER | SHOW_INDEX | SHOW_METADATA | STRING_POOL_STATS |"
            " METRICS | CONFIG | RESET"
        )
    sub = args[0].upper()
    rest = args[1:]

    if sub == "PAUSEPOINT":
        _require_debug_mode()
        if not rest:
            raise FTDebugError("PAUSEPOINT SET|RESET|TEST|LIST")
        op = rest[0].upper()
        if op == "LIST":
            return PAUSEPOINTS.list()
        if len(rest) < 2:
            raise FTDebugError(f"PAUSEPOINT {op} needs a name")
        name = rest[1]
        if op == "SET":
            PAUSEPOINTS.pause(name)
            return "OK"
        if op == "RESET":
            PAUSEPOINTS.resume(name)
            return "OK"
        if op == "TEST":
            return ["paused", int(PAUSEPOINTS.is_paused(name)),
                    "hits", PAUSEPOINTS.hits(name),
                    "waiting", PAUSEPOINTS.waiting(name)]
        raise FTDebugError(f"unknown PAUSEPOINT op {op!r}")

    if sub == "CONTROLLED_VARIABLE":
        _require_debug_mode()
        if not rest:
            raise FTDebugError("CONTROLLED_VARIABLE GET|SET|LIST")
        op = rest[0].upper()
        if op == "LIST":
            out: List[object] = []
            for k, v in sorted(CONTROLLED.list().items()):
                out += [k, v]
            return out
        if op == "GET":
            if len(rest) < 2:
                raise FTDebugError("CONTROLLED_VARIABLE GET needs a name")
            return CONTROLLED.get(rest[1])
        if op == "SET":
            if len(rest) < 3:
                raise FTDebugError("CONTROLLED_VARIABLE SET needs name + value")
            CONTROLLED.set(rest[1], rest[2])
            return "OK"
        raise FTDebugError(f"unknown CONTROLLED_VARIABLE op {op!r}")

    if sub == "TEST_COUNTER":
        _require_debug_mode()
        if rest and rest[0].upper() == "GET":
            if len(rest) < 2:
                raise FTDebugError("TEST_COUNTER GET needs a name")
            return TEST_COUNTERS.get(rest[1])
        out = []
        for k, v in sorted(TEST_COUNTERS.list().items()):
            out += [k, v]
        return out

    if sub == "SHOW_INDEX":
        if not rest:
            raise FTDebugError("SHOW_INDEX needs an index name")
        schema = engine.manager.get(rest[0])
        st = schema.stats()
        out = []
        for k, v in st.items():
            out += [k, v]
        if getattr(schema, "text_engine", None) is not None:
            for k, v in schema.text_engine.stats().items():
                out += [f"text_{k}", v]
        return out

    if sub == "SHOW_METADATA":
        mm = getattr(engine, "metadata", None)
        if mm is None:
            return []
        out = []
        for name, entry in sorted(mm.entries().items()):
            out += [name, ["version", entry.version,
                           "fingerprint", entry.fingerprint]]
        return out

    if sub == "STRING_POOL_STATS":
        total_keys = 0
        total_capacity = 0
        for schema in engine.manager.all_schemas():
            total_keys += schema.interner.count
            total_capacity += schema.interner.capacity
        return ["interned_keys", total_keys, "id_capacity", total_capacity,
                "keyspace_keys", len(engine.keyspace)]

    if sub == "METRICS":
        out = []
        for k, v in sorted(STATS.snapshot().items()):
            out += [k, v]
        return out

    if sub == "CONFIG":
        out = []
        for k, v in sorted(config.REGISTRY.snapshot(include_hidden=True).items()):
            out += [k, v]
        return out

    if sub == "PROFILE":
        # jax.profiler trace capture (SURVEY §5.1: the reference is
        # metrics-first; on TPU the added capability is a real XLA trace)
        _require_debug_mode()
        if not rest:
            raise FTDebugError("PROFILE START <dir> | STOP")
        op = rest[0].upper()
        import jax

        if op == "START":
            if len(rest) < 2:
                raise FTDebugError("PROFILE START needs a directory")
            jax.profiler.start_trace(rest[1])
            return "OK"
        if op == "STOP":
            jax.profiler.stop_trace()
            return "OK"
        raise FTDebugError(f"unknown PROFILE op {op!r}")

    if sub == "RESET":
        _require_debug_mode()
        from valkey_search_tpu.runtime import debug as dbg

        dbg.reset_all()
        return "OK"

    raise FTDebugError(f"unknown FT._DEBUG subcommand {sub!r}")
