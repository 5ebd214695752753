"""Approximate string matching — edit-distance join with q-gram count
prefiltering (Gravano, Ipeirotis, Jagadish, Koudas, Muthukrishnan,
Srivastava: "Approximate string joins in a database (almost) for free",
VLDB 2001): two strings within edit distance k must share at least
max(|Ga|, |Gb|) − k·q of their q-grams (each edit touches at most q
gram windows), so an inverted q-gram index prunes the cross product to
pairs clearing that bound and the exact levenshtein runs on candidates
only — the entity-resolution / fuzzy-dedup primitive.

Spark-first shape, graded for 100 TB: gram TEXT hashes to 8-byte
digests at the map side (the dedup discipline); the index join keys on
digests; per-pair shared counts map-side combine; levenshtein (JVM
codegen, same DP as DuckDB's — the string battery pins the parity) runs
only on pairs past the bound. Caveat the docstring owns: corpora with a
long SHARED PREFIX (ids, URLs with one host) defeat the count filter —
block by length/prefix bucket first, exactly like the hot-shingle
df-cap defends the Jaccard index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _qgrams(col, q: int):
    """Character q-grams (1-based substr windows; empty for short
    strings — the sequence(1, <=0)-descends guard)."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.when(F.length(c) >= q,
                 F.sequence(F.lit(1), F.length(c) - (q - 1))) \
           .otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: c.substr(i, F.lit(q)))


def fuzzy_match(left: DataFrame, right: DataFrame,
                left_id: str, left_str: str,
                right_id: str, right_str: str,
                q: int = 3, max_dist: int = 2) -> DataFrame:
    """(left_id, right_id, shared_grams, lev) for pairs with levenshtein
    <= max_dist, found via the q-gram count bound. Distinct-gram variant
    of the filter (an edit changes <= q distinct grams, so
    |distinct ∩| >= (len_min - q + 1) - k*q still holds)."""
    # two-step projection: aliasing X->ls and exploding qgrams(X) in ONE
    # select trips Spark's lateral-column-alias path when X is already
    # named ls (INTERNAL_ERROR LateralColumnAliasReference)
    lg = (left.select(F.col(left_id).alias("lid"),
                      F.col(left_str).alias("ls"))
          .select("lid", "ls",
                  F.explode(F.array_distinct(_qgrams("ls", q)))
                  .alias("g"))
          .select("lid", "ls", F.xxhash64("g").alias("gid")))
    rg = (right.select(F.col(right_id).alias("rid"),
                       F.col(right_str).alias("rs"))
          .select("rid", "rs",
                  F.explode(F.array_distinct(_qgrams("rs", q)))
                  .alias("g"))
          .select("rid", "rs", F.xxhash64("g").alias("gid")))
    shared = (lg.join(rg, "gid")
              .groupBy("lid", "ls", "rid", "rs")
              .agg(F.count(F.lit(1)).alias("shared_grams")))
    # the count bound must use each string's OWN distinct-gram count, not
    # the length-derived len-q+1: strings with repeated grams (ids full
    # of zeros) have far fewer distinct grams, and a length bound would
    # prune true matches (each edit removes <= q DISTINCT grams, so
    # |A∩B| >= max(|A|,|B|) - k*q holds on distinct counts)
    nl = lg.groupBy("lid").agg(F.count(F.lit(1)).alias("n_l"))
    nr = rg.groupBy("rid").agg(F.count(F.lit(1)).alias("n_r"))
    bound = F.greatest(F.col("n_l"), F.col("n_r")) - F.lit(max_dist * q)
    cand = (shared.join(nl, "lid").join(nr, "rid")
            .filter(F.col("shared_grams") >= bound))
    lev = F.levenshtein("ls", "rs")
    return (cand.withColumn("lev", lev)
            .filter(F.col("lev") <= max_dist)
            .select(F.col("lid").alias(left_id),
                    F.col("rid").alias(right_id),
                    "shared_grams", "lev"))
