"""Cross-engine output-type audit for every suite query.

The driver's value-hash is stricter than repr-normalization: a column that is
DECIMAL on one engine and DOUBLE/HUGEINT on the other can hash-mismatch even
when values are numerically equal (round-1 lesson: tpch_q1, event_sessions).
This tool runs every queries()/oracle_sql() pair and flags:

  * Spark/DuckDB type-class mismatches per column (decimal vs double, ...)
  * DuckDB HUGEINT outputs (pandas/arrow-render as float or int128 — always
    cast to BIGINT in the oracle)
  * DOUBLE outputs on either side (allowed only where round-1 driver rows
    were green — bit-identical floats)

Usage: python tools/audit_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def spark_class(dtype: str) -> str:
    d = dtype.lower()
    if d.startswith("decimal"):
        return "decimal"
    if d in ("double", "float"):
        return "float"
    if d in ("bigint", "int", "smallint", "tinyint", "long", "integer"):
        return "int"
    if d.startswith("array"):
        return "array"
    if d.startswith(("struct", "map")):
        return "struct"
    return d


def duck_class(t: str) -> str:
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER"):
        return "int"
    if t == "HUGEINT":
        return "hugeint"
    if t.endswith("[]"):
        return "array"
    if t.startswith(("STRUCT", "MAP")):
        return "struct"
    if t in ("VARCHAR",):
        return "string"
    if t == "BOOLEAN":
        return "boolean"
    if t == "TIMESTAMP":
        return "timestamp"
    if t == "DATE":
        return "date"
    if t == "BLOB":
        return "binary"
    return t.lower()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from melt_spark.session import get_spark

    spark = get_spark("type-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    flagged = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            sdt = dict(fn(spark, sf_dir).dtypes)
        except Exception as e:  # pragma: no cover - audit tool
            print(f"ERR   {name}: spark {e}")
            flagged += 1
            continue
        try:
            rel = con.sql(sql)
            ddt = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # pragma: no cover - audit tool
            print(f"ERR   {name}: duckdb {e}")
            flagged += 1
            continue
        issues = []
        for col in sorted(set(sdt) | set(ddt)):
            sc = spark_class(sdt[col]) if col in sdt else "MISSING"
            dc = duck_class(ddt[col]) if col in ddt else "MISSING"
            if dc == "hugeint":
                issues.append(f"{col}: duck HUGEINT (cast to BIGINT)")
            elif sc != dc:
                issues.append(f"{col}: spark={sdt.get(col)} duck={ddt.get(col)}")
            elif sc == "float":
                issues.append(f"{col}: DOUBLE on both (ok only if bit-exact)")
        if issues:
            flagged += 1
            print(f"FLAG  {name}:")
            for i in issues:
                print(f"      {i}")
        else:
            print(f"ok    {name}")
    print(f"\n{flagged} flagged")


if __name__ == "__main__":
    main()
