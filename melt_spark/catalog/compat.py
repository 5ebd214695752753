"""Schema-evolution compatibility checking — the column-level verdict
layer ABOVE snapshot.py's drift detection.

schema_diff (the reference's melt.clj:117-123 restatement) answers "did
anything change"; a migration gate needs "is the change SAFE for
existing readers". The rules here are the Avro/Parquet promotion canon
(Avro spec §Schema Resolution: int is promotable to long/float/double,
long to float/double, float to double; a field added with a default —
here: nullable — is compatible; removing a field readers rely on is
not):

  added nullable column          compatible  (readers ignore it)
  added NOT NULL column          BREAKING    (old writers can't satisfy it)
  dropped column                 BREAKING    (readers lose it)
  type widened along the chain   compatible  (smallint<int<bigint<float
                                              <double — Avro promotion)
  type narrowed / class changed  BREAKING
  NOT NULL -> nullable           compatible  (loosened)
  nullable -> NOT NULL           BREAKING    (tightened)
  primary-key flag changed       BREAKING    (identity semantics shift)

Pure relational shape: one full-outer join of the two descriptor tables
on (table, column) + CASE classification — O(columns), no data scan; at
100 TB the inputs are catalog-sized whatever the corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the Avro promotion chain; absent types have no rank -> any change
# involving them is a class change (breaking)
TYPE_RANK = {"smallint": 1, "int": 2, "bigint": 3,
             "float": 4, "double": 5}

BREAKING = ("added_required", "dropped", "type_changed",
            "required_tightened", "pk_changed")


def _rank(col):
    m = F.create_map(*[F.lit(x) for kv in TYPE_RANK.items() for x in kv])
    return F.element_at(m, col)


def schema_compat(cached: DataFrame, live: DataFrame) -> DataFrame:
    """Column-level compatibility verdicts between two schema snapshots.

    Inputs: (table_name, column, dtype, nullable['YES'|'NO'], is_pk int)
    descriptor frames — the shape catalog/discovery.py produces and
    snapshot.py caches. Output: one row per changed column:
    (table_name, column, status, breaking) where status concatenates
    every applicable flag ('widened+required_tightened') and breaking
    is 1 iff any flag is in the BREAKING set. Unchanged columns emit no
    row (schema_diff's empty-diff convention).
    """
    c, l = cached.alias("c"), live.alias("l")
    j = c.join(l, ["table_name", "column"], "full_outer")
    both = F.col("c.dtype").isNotNull() & F.col("l.dtype").isNotNull()
    f_presence = (
        F.when(F.col("c.dtype").isNull(),
               F.when(F.col("l.nullable") == "YES", F.lit("added"))
               .otherwise(F.lit("added_required")))
        .when(F.col("l.dtype").isNull(), F.lit("dropped")))
    rc, rl = _rank(F.col("c.dtype")), _rank(F.col("l.dtype"))
    f_type = F.when(
        both & (F.col("c.dtype") != F.col("l.dtype")),
        F.when(rc.isNotNull() & rl.isNotNull() & (rl > rc),
               F.lit("widened")).otherwise(F.lit("type_changed")))
    f_null = (
        F.when(both & (F.col("c.nullable") == "YES")
               & (F.col("l.nullable") == "NO"),
               F.lit("required_tightened"))
        .when(both & (F.col("c.nullable") == "NO")
              & (F.col("l.nullable") == "YES"),
              F.lit("nullable_loosened")))
    f_pk = F.when(both & (F.col("c.is_pk") != F.col("l.is_pk")),
                  F.lit("pk_changed"))
    status = F.concat_ws("+", f_presence, f_type, f_null, f_pk)
    breaking = F.when(
        sum((status.contains(b).cast("int") for b in BREAKING),
            F.lit(0)) > 0, 1).otherwise(0)
    return (j.select("table_name", "column", status.alias("status"),
                     breaking.cast("int").alias("breaking"))
            .filter(F.col("status") != ""))
