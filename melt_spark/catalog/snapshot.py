"""Schema snapshot cache + drift detection.

Reference: schema is memoized per process, pretty-printed to an EDN file
(target/schema.edn or $SCHEMA_PATH), and `schema-diff` / `schema-check`
compare cached vs live, aborting when drift exists and
ABORT_ON_SCHEMA_CHANGE=TRUE (src/jdbc/melt.clj:21,24,102-133).

Spark restatement: descriptors (one small row per table) collect to the
driver and snapshot as JSON; drift = dict comparison. The catalog is O(number
of tables), never O(data), so driver-side logic is the right altitude here.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame

DEFAULT_SCHEMA_PATH = "target/schema.json"  # reference: target/schema.edn
ABORT_ENV = "ABORT_ON_SCHEMA_CHANGE"        # melt.clj:24

# File-format parity: a path ending in .edn round-trips through the EDN
# emitter/parser (melt_spark/formats/edn.py), so SCHEMA_PATH=target/schema.edn
# reproduces the reference's artifact format (melt.clj:102-115), not just its
# content. Default stays JSON.


def _descriptors(schema_df: DataFrame) -> dict[str, dict]:
    out = {}
    for row in schema_df.collect():
        full = ".".join(str(p) for p in
                        (row["table_cat"], row["table_schem"], row["table_name"]))
        out[full] = {
            "columns": sorted(row["columns"] or []),
            "keys": sorted(row["keys"] or []),
        }
    return out


def save_schema(schema_df: DataFrame, path: str | None = None) -> str:
    path = path or os.environ.get("SCHEMA_PATH", DEFAULT_SCHEMA_PATH)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    desc = _descriptors(schema_df)
    with open(path, "w") as f:
        if path.endswith(".edn"):
            from ..formats.edn import dumps
            f.write(dumps({k: desc[k] for k in sorted(desc)}) + "\n")
        else:
            json.dump(desc, f, indent=2, sort_keys=True)
    return path


def load_schema(path: str | None = None) -> dict[str, dict] | None:
    path = path or os.environ.get("SCHEMA_PATH", DEFAULT_SCHEMA_PATH)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        if path.endswith(".edn"):
            from ..formats.edn import loads
            return loads(f.read())
        return json.load(f)


def schema_diff(cached: dict[str, dict], live: dict[str, dict]) -> dict:
    """Reference schema-diff (melt.clj:117-123): what's only-cached /
    only-live / changed. Empty dicts everywhere == no drift."""
    only_cached = {k: v for k, v in cached.items() if k not in live}
    only_live = {k: v for k, v in live.items() if k not in cached}
    changed = {
        k: {"cached": cached[k], "live": live[k]}
        for k in cached.keys() & live.keys()
        if cached[k] != live[k]
    }
    return {"only_cached": only_cached, "only_live": only_live,
            "changed": changed}


def schema_check(schema_df: DataFrame, path: str | None = None) -> bool:
    """Reference schema-check (melt.clj:128-133): False (abort) iff drift
    exists and ABORT_ON_SCHEMA_CHANGE=TRUE. Saves the snapshot when none
    exists yet."""
    cached = load_schema(path)
    live = _descriptors(schema_df)
    if cached is None:
        save_schema(schema_df, path)
        return True
    d = schema_diff(cached, live)
    drift = any(d.values())
    abort = os.environ.get(ABORT_ENV, "").upper() == "TRUE"
    return not (drift and abort)
