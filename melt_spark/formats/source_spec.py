"""EDN source specs ↔ Source descriptors — config-file parity.

A reference user's source is a keyword-keyed Clojure map
(src/jdbc/melt.clj:26-31; e.g. {::melt/name "Address" ::melt/schema
"SalesLT" ::melt/keys #{:addressid} ::melt/sql "..."}). Those maps live in
EDN config files / REPL sessions; this module loads them into Source
dataclasses (and writes them back), so an existing config migrates without
hand-translation.

Key handling: namespaced keywords (:jdbc.melt/name, :melt/name) and bare
ones (:name) all resolve to the segment after the last '/'. The ::xform
entry is a FUNCTION in Clojure and has no EDN representation — a spec
carrying one is rejected with instructions (transforms are Python callables
registered on the Source, MIGRATION.md §0) rather than silently dropped.
"""

from __future__ import annotations

from typing import Iterable

from ..model import Source
from . import edn

# spec key (post-namespace) -> Source field
_FIELDS = {"name": "name", "schema": "schema", "cat": "catalog",
           "catalog": "catalog", "sql": "sql", "topic": "topic",
           "ts-format": "ts_format", "ts_format": "ts_format"}
_COLLECTIONS = {"columns": "columns", "keys": "keys",
                "sql-params": "sql_params", "sql_params": "sql_params"}


def _local(key: str) -> str:
    """':jdbc.melt/name' / 'melt/name' / 'name' → 'name' (the parser has
    already stripped the leading colon)."""
    return key.rsplit("/", 1)[-1]


def source_from_map(m: dict) -> Source:
    """One parsed spec map → Source. Unknown keys are ignored (a reference
    map can carry app-private entries); ::xform is rejected, see module
    docstring."""
    kwargs: dict = {}
    for key, val in m.items():
        local = _local(str(key))
        if local == "xform":
            raise ValueError(
                "::xform is a Clojure function and cannot live in an EDN "
                "file - register a Python callable instead: "
                "Source(..., transforms=(fn,))")
        if local in _FIELDS:
            kwargs[_FIELDS[local]] = val
        elif local in _COLLECTIONS:
            items = list(val) if isinstance(val, (list, tuple, set)) else [val]
            items = [str(x).lower() for x in items]
            if local != "sql-params" and local != "sql_params":
                items = sorted(items)  # EDN sets are unordered; pin one
            kwargs[_COLLECTIONS[local]] = tuple(items)
    if "name" not in kwargs:
        raise ValueError(f"source spec lacks a name: {m!r}")
    return Source(**kwargs)


def sources_from_edn(text: str) -> list[Source]:
    """Parse an EDN config: either one source map or a vector of them."""
    parsed = edn.loads(text)
    specs = parsed if isinstance(parsed, list) else [parsed]
    return [source_from_map(s) for s in specs]


def source_to_map(src: Source) -> dict:
    """Source → plain keyword-ready map (round-trips through EDN)."""
    out: dict = {"name": src.name, "schema": src.schema}
    if src.catalog:
        out["cat"] = src.catalog
    if src.columns:
        out["columns"] = set(src.columns)
    if src.keys:
        out["keys"] = set(src.keys)
    if src.sql:
        out["sql"] = src.sql
        if src.sql_params:
            out["sql-params"] = list(src.sql_params)
    if src.topic:
        out["topic"] = src.topic
    if src.ts_format:
        out["ts-format"] = src.ts_format
    return out


def sources_to_edn(sources: Iterable[Source]) -> str:
    return edn.dumps([source_to_map(s) for s in sources])
