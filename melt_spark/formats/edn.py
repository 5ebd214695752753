"""Minimal EDN (extensible data notation) emitter + parser.

The reference persists its schema cache as a pretty-printed EDN file
(target/schema.edn, src/jdbc/melt.clj:102-115) and its table samples as
pprint files (melt.clj:153-174). JSON is functionally equivalent, but a
migrating user has existing .edn artifacts — this module gives file-format
parity so those round-trip.

EDN is a public, documented format (github.com/edn-format/edn). This is a
deliberately small subset — exactly what schema/sample artifacts need:
maps {}, vectors [], sets #{}, strings, integers, floats, keywords,
booleans, nil. No tagged literals, no symbols, no ratios.

Python<->EDN mapping:
  dict -> map (string keys become :keywords when they look like keyword
          names and keywordize_keys=True — the reference's maps are
          keyword-keyed), list/tuple -> vector, set -> set, str -> "string",
  bool -> true/false, None -> nil, int/float -> literals.
Parsing maps keywords back to plain strings (leading ':' stripped), so
load(dump(x)) == x for the artifact shapes used here.
"""

from __future__ import annotations

import re

_KEYWORD_RE = re.compile(r"^[A-Za-z_*+!?<>=.-][A-Za-z0-9_*+!?<>=.-]*$")


# ---------------------------------------------------------------------------
# emit

def _emit_str(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') \
                  .replace("\n", "\\n").replace("\t", "\\t") + '"'


def _emit_key(k, keywordize: bool) -> str:
    if isinstance(k, str) and keywordize and _KEYWORD_RE.match(k):
        return ":" + k
    return _emit(k, keywordize)


def _emit(obj, keywordize: bool, indent: int | None = None,
          level: int = 0) -> str:
    pad = "" if indent is None else "\n" + " " * (indent * (level + 1))
    end_pad = "" if indent is None else "\n" + " " * (indent * level)
    if obj is None:
        return "nil"
    if obj is True:
        return "true"
    if obj is False:
        return "false"
    if isinstance(obj, str):
        return _emit_str(obj)
    if isinstance(obj, (int, float)):
        return repr(obj)
    if isinstance(obj, dict):
        if not obj:
            return "{}"
        items = [
            f"{_emit_key(k, keywordize)} {_emit(v, keywordize, indent, level + 1)}"
            for k, v in obj.items()]
        sep = "," + (pad or " ")
        return "{" + pad + sep.join(items) + end_pad + "}"
    if isinstance(obj, (list, tuple)):
        return "[" + " ".join(_emit(v, keywordize, indent, level + 1)
                              for v in obj) + "]"
    if isinstance(obj, (set, frozenset)):
        return "#{" + " ".join(sorted(_emit(v, keywordize) for v in obj)) + "}"
    raise TypeError(f"cannot EDN-encode {type(obj).__name__}")


def dumps(obj, keywordize_keys: bool = True, indent: int | None = 2) -> str:
    """EDN text for obj (pretty-printed map entries by default, mirroring
    the reference's pprint output)."""
    return _emit(obj, keywordize_keys, indent)


# ---------------------------------------------------------------------------
# parse

_TOKEN_RE = re.compile(r"""
    (?P<ws>[\s,]+)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<setopen>\#\{)
  | (?P<open>[\[{(])
  | (?P<close>[\]})])
  | (?P<atom>[^\s,\[\]{}()"]+)
""", re.VERBOSE)


def _tokens(text: str):
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"bad EDN at {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            yield m.lastgroup, m.group()


def _atom(tok: str):
    if tok == "nil":
        return None
    if tok == "true":
        return True
    if tok == "false":
        return False
    if tok.startswith(":"):
        return tok[1:]  # keyword -> plain string
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    raise ValueError(f"unsupported EDN atom {tok!r} (symbols/tags not "
                     "in this subset)")


def _unescape(tok: str) -> str:
    body = tok[1:-1]
    return (body.replace("\\\\", "\x00").replace("\\n", "\n")
            .replace("\\t", "\t").replace('\\"', '"')
            .replace("\x00", "\\"))


def _parse(toks: list, i: int) -> tuple[object, int]:
    kind, tok = toks[i]
    if kind == "string":
        return _unescape(tok), i + 1
    if kind == "atom":
        return _atom(tok), i + 1
    if kind == "setopen" or (kind == "open" and tok in "[({"):
        items = []
        i += 1
        while i < len(toks) and toks[i][0] != "close":
            item, i = _parse(toks, i)
            items.append(item)
        if i >= len(toks):
            raise ValueError("unterminated collection")
        i += 1  # consume close
        if kind == "setopen":
            return set(items), i
        if tok in "[(":
            return items, i
        if len(items) % 2:
            raise ValueError("map with odd number of forms")
        return dict(zip(items[::2], items[1::2])), i
    raise ValueError(f"unexpected token {tok!r}")


def loads(text: str):
    """Parse one EDN form (the artifact file shape: a single map)."""
    toks = list(_tokens(text))
    obj, i = _parse(toks, 0)
    if i != len(toks):
        raise ValueError("trailing content after first EDN form")
    return obj
