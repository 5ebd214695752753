"""Single source of truth for query names.

Three surfaces consume the fine-grained constituent registry — the
per-constituent oracle checker (tools/check_one.py), the CLI's
``query``/``explain`` commands, and the docs/SUITE_MAP.md audit trail —
and before this module each built its own union of ANALYTICS_SUITE and
PIPELINE_SUITE. With 110 constituents a silent name collision or a
renamed constituent could drop a query out of one surface without any
signal. Everything now imports from here, and tests/test_registry.py
pins SUITE_MAP.md to these names.
"""

from __future__ import annotations

from typing import Callable


def constituents() -> dict[str, tuple]:
    """name -> (fn(spark, sf_dir) -> DataFrame, oracle_sql) for every
    fine-grained constituent query. Raises on a name collision between
    the two suites — a collision would silently shadow one query in
    every consumer."""
    from .analytics_suite import ANALYTICS_SUITE
    from .pipeline_suite import PIPELINE_SUITE

    clash = set(ANALYTICS_SUITE) & set(PIPELINE_SUITE)
    if clash:
        raise ValueError(f"constituent name collision: {sorted(clash)}")
    return {**ANALYTICS_SUITE, **PIPELINE_SUITE}


def entries() -> dict[str, Callable]:
    """The 50 merged driver entries (name -> fn) — the surface the
    external driver checks."""
    from .suite import spark_queries

    return dict(spark_queries())


def all_named() -> dict[str, Callable]:
    """Every runnable query by name: constituents plus the merged driver
    entries. Where a merged entry shadows a constituent of the same name
    (e.g. clean_corpus), the MERGED entry wins — that is the
    driver-checked plan, which is what the CLI should show."""
    out: dict[str, Callable] = {n: fn for n, (fn, _sql)
                                in constituents().items()}
    out.update(entries())
    return out
