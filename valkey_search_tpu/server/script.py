"""EVAL-lite: the redis.call subset of Lua scripting.

The reference delegates scripting to valkey-server and only constrains it
in cluster mode (integration/test_multi_lua.py drives scripts of the shape
``return redis.call('CMD', 'arg', KEYS[1], ARGV[1])`` and asserts the CME
single-slot restriction). This standalone engine owns the command surface,
so it carries a deliberately small script engine: a sequence of
``redis.call(...)`` statements with literal/KEYS[n]/ARGV[n] arguments and
an optional ``return`` — the patterns that cluster clients actually ship
for locks, counters, and test harnesses. Anything outside the subset is
refused with a clear error instead of misinterpreted (fail closed, like
the unsupported-ACL-rule policy). Scope documented in docs/PARITY.md.

Grammar (whitespace/newline/semicolon separated):

    script  := stmt* [ 'return' expr ]
    stmt    := call | 'local' NAME '=' call
    expr    := call | literal | KEYS '[' int ']' | ARGV '[' int ']' | NAME
    call    := ('redis'|'server') '.' ('call'|'pcall'|'status_reply'|
               'error_reply') '(' [arg (',' arg)*] ')'
    arg     := literal | KEYS '[' int ']' | ARGV '[' int ']' | NAME
    literal := 'single' / "double" quoted string | number
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple


class ScriptError(ValueError):
    """Unsupported construct or malformed script."""


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|--[^\n]*)                      # whitespace / line comment
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<punct>[().,;\[\]=])
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> List[Tuple[str, str]]:
    out: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if m is None:
            raise ScriptError(
                f"EVAL-lite: unsupported character {src[pos]!r} at {pos}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    return out


def _unquote(tok: str) -> bytes:
    body = tok[1:-1]
    body = re.sub(
        r"\\(.)",
        lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(m.group(1),
                                                        m.group(1)),
        body,
    )
    return body.encode("utf-8", "surrogateescape")


class _Call:
    """One redis.call/pcall with argument templates."""

    def __init__(self, fn: str, args, pcall: bool):
        self.fn = fn            # "call" | "status_reply" | "error_reply"
        self.args = args        # list of ("lit", bytes)|("key"/"arg", i)|("var", name)
        self.pcall = pcall


class Script:
    """Parsed script: statements then an optional returned expression."""

    def __init__(self, stmts, ret, assigns):
        self.stmts: List[_Call] = stmts
        self.ret = ret          # None | _Call | template tuple
        self.assigns = assigns  # stmt index -> variable name


def parse(src: str) -> Script:
    toks = _tokenize(src)
    i = 0

    def peek(k=0):
        return toks[i + k] if i + k < len(toks) else ("eof", "")

    def take(kind=None, val=None):
        nonlocal i
        t = peek()
        if (kind and t[0] != kind) or (val and t[1] != val):
            raise ScriptError(
                f"EVAL-lite: expected {val or kind}, got {t[1]!r} — "
                "supported: redis.call statements, KEYS[n]/ARGV[n]/string/"
                "number args, optional final return"
            )
        i += 1
        return t

    def parse_template():
        t = peek()
        if t[0] == "str":
            take()
            return ("lit", _unquote(t[1]))
        if t[0] == "num":
            take()
            return ("lit", t[1].encode())
        if t[0] == "name" and t[1] in ("KEYS", "ARGV"):
            take()
            take("punct", "[")
            n = take("num")
            take("punct", "]")
            idx = int(n[1])
            if idx < 1:
                raise ScriptError("EVAL-lite: KEYS/ARGV indexes are 1-based")
            return ("key" if t[1] == "KEYS" else "arg", idx - 1)
        if t[0] == "name":
            take()
            return ("var", t[1])
        raise ScriptError(f"EVAL-lite: unsupported argument {t[1]!r}")

    def parse_call() -> _Call:
        ns = take("name")
        if ns[1] not in ("redis", "server"):
            raise ScriptError(f"EVAL-lite: unknown namespace {ns[1]!r}")
        take("punct", ".")
        fn = take("name")[1]
        if fn not in ("call", "pcall", "status_reply", "error_reply",
                      "sha1hex"):
            raise ScriptError(f"EVAL-lite: unsupported redis.{fn}")
        take("punct", "(")
        args = []
        if peek() != ("punct", ")"):
            args.append(parse_template())
            while peek() == ("punct", ","):
                take()
                args.append(parse_template())
        take("punct", ")")
        return _Call(fn, args, pcall=(fn == "pcall"))

    stmts: List[_Call] = []
    assigns = {}
    ret = None
    while peek()[0] != "eof":
        if peek() == ("punct", ";"):
            take()
            continue
        if peek() == ("name", "return"):
            take()
            t = peek()
            if t[0] == "name" and t[1] in ("redis", "server"):
                ret = parse_call()
            else:
                ret = parse_template()
            if peek() == ("punct", ";"):
                take()
            if peek()[0] != "eof":
                raise ScriptError("EVAL-lite: code after return")
            break
        if peek() == ("name", "local"):
            take()
            var = take("name")[1]
            take("punct", "=")
            stmts.append(parse_call())
            assigns[len(stmts) - 1] = var
            continue
        stmts.append(parse_call())
    return Script(stmts, ret, assigns)


def resolve_args(
    call: _Call,
    keys: Sequence[bytes],
    argv: Sequence[bytes],
    variables: dict,
) -> List[bytes]:
    out: List[bytes] = []
    for kind, v in call.args:
        if kind == "lit":
            out.append(v)
        elif kind == "key":
            if v >= len(keys):
                raise ScriptError(f"EVAL-lite: KEYS[{v + 1}] out of range")
            out.append(keys[v])
        elif kind == "arg":
            if v >= len(argv):
                raise ScriptError(f"EVAL-lite: ARGV[{v + 1}] out of range")
            out.append(argv[v])
        else:  # variable from a prior `local x = redis.call(...)`
            if v not in variables:
                raise ScriptError(f"EVAL-lite: unknown variable {v!r}")
            val = variables[v]
            if isinstance(val, str):
                val = val.encode()
            elif isinstance(val, (int, float)):
                val = str(val).encode()
            elif not isinstance(val, bytes):
                raise ScriptError(
                    f"EVAL-lite: variable {v!r} holds a non-scalar reply"
                )
            out.append(val)
    return out
