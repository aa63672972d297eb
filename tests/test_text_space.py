"""Full-text space-consumption regression (scaled).

Mirrors /root/reference/integration/test_fulltext_space_performance.py
(manual large-scale suite) at CI scale, against the packed native postings
(native/text_index.cpp Posting: one 8-byte doc<<32|pos<<8|mask entry per
position, sorted, O(1) append on monotone ingest). The reference publishes
6.6-8.2 bytes/word for its compressed position maps
(docs/full-text/space-consumption.md:20-45); the packed layout lands at
~10.5 B/position including growth slack — the round-1 per-doc hash-map
design cost ~136 B/position and would fail these bounds 8x over.
"""

from valkey_search_tpu.server.engine import Engine


def _mk():
    e = Engine()
    e.execute("FT.CREATE", "i", "SCHEMA", "desc", "TEXT")
    return e


def test_single_doc_many_positions():
    """One document carrying 50k positions of one word: position storage
    dominates; bound bytes/position."""
    n = 50_000
    e = _mk()
    e.hset("p:1", {"desc": " ".join(["b"] * n)})
    per_pos = e.memory_pools()["text"] / n
    assert per_pos <= 16.0, f"text bytes/position regressed: {per_pos:.1f}"
    # the index still answers: term + exact phrase over the long doc
    assert e.ft_search("i", "b", "NOCONTENT")[0] == 1
    assert e.ft_search("i", '@desc:"b b b"', "NOCONTENT")[0] == 1


def test_many_docs_shared_token():
    """10k docs × one shared token: per-doc cost = one posting entry plus
    the forward-index node; bound bytes/doc."""
    n = 10_000
    e = _mk()
    for i in range(n):
        e.hset(f"p:{i}", {"desc": "b"})
    per_doc = e.memory_pools()["text"] / n
    assert per_doc <= 120.0, f"text bytes/doc regressed: {per_doc:.1f}"
    assert e.ft_search("i", "b", "LIMIT", "0", "0")[0] == n


def test_many_docs_unique_tokens():
    """10k docs × unique words: dictionary + stem links + prefix tree
    dominate; bound bytes per distinct word and spot-check retrieval."""

    def tok(k):
        s = ""
        k += 1
        while k > 0:
            k -= 1
            s = chr(ord("a") + k % 26) + s
            k //= 26
        return s

    n = 10_000
    e = _mk()
    for i in range(n):
        e.hset(f"p:{i}", {"desc": tok(i)})
    per_word = e.memory_pools()["text"] / n
    assert per_word <= 700.0, f"text bytes/word regressed: {per_word:.1f}"
    # tok(0) = "a" is a stopword — never indexed (reference default list)
    assert e.ft_search("i", "@desc:a", "NOCONTENT")[0] == 0
    for i in (1, 2, 3, 7777):
        r = e.ft_search("i", tok(i), "NOCONTENT")
        assert r[0] == 1 and r[1] == f"p:{i}"


def test_update_and_remove_reclaims():
    """Re-HSET and DEL shrink the accounted text bytes back toward the
    baseline (posting removal compacts the packed vectors)."""
    e = _mk()
    for i in range(500):
        e.hset(f"p:{i}", {"desc": " ".join(["w" + str(i % 7)] * 50)})
    full = e.memory_pools()["text"]
    for i in range(500):
        e.hset(f"p:{i}", {"desc": "tiny"})
    shrunk = e.memory_pools()["text"]
    assert shrunk < full * 0.6, (full, shrunk)
    for i in range(500):
        e.execute("DEL", f"p:{i}")
    gone = e.memory_pools()["text"]
    assert gone < shrunk
    assert e.ft_search("i", "tiny", "LIMIT", "0", "0")[0] == 0
