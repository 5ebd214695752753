"""Sampling — the reference's migration-planning scan (S7).

Reference sample-db (src/jdbc/melt.clj:153-174): per table, `Select TOP 10 *`
plus `Select count(*)`, pretty-printed one file per table.

Spark restatement: limit(N) + count() — both push down to the scan (parquet
reads N rows from one file; count uses metadata where possible). Output goes
to JSON text files, one per table.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame


def sample_table(df: DataFrame, n: int = 10,
                 order_by: str | None = None) -> tuple[DataFrame, int]:
    """(top-N rows, total count). Pass order_by for a deterministic sample —
    the reference's TOP 10 is whatever the DB returns; tests need stability."""
    sample = df.orderBy(order_by).limit(n) if order_by else df.limit(n)
    return sample, df.count()


def sample_db(tables: dict[str, DataFrame], out_dir: str, n: int = 10,
              fmt: str = "json") -> list[str]:
    """Write one sample file per table (reference writes one pprint file per
    table, melt.clj:153-170). fmt='edn' reproduces the reference's artifact
    format (pretty-printed EDN maps) via melt_spark/formats/edn.py; 'json'
    is the default. Returns written paths."""
    if fmt not in ("json", "edn"):
        raise ValueError(f"unknown sample format {fmt!r}")
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    paths = []
    for name, df in sorted(tables.items()):
        sample, total = sample_table(df, n)
        rows = [{k: v if isinstance(v, (str, int, float, bool, list, dict,
                                        type(None))) else str(v)
                 for k, v in r.asDict(recursive=True).items()}
                for r in sample.collect()]
        path = os.path.join(out_dir, f"{name}.{fmt}")
        with open(path, "w") as f:
            doc = {"table": name, "count": total, "sample": rows}
            if fmt == "edn":
                from ..formats.edn import dumps
                f.write(dumps(doc) + "\n")
            else:
                json.dump(doc, f, indent=2, sort_keys=True, default=str)
        paths.append(path)
    return paths
