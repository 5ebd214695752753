"""Round-7 operator tests: distributed global ntile, graph-ANN seed
robustness, and the plan-lint guard's own parser."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_DIR  # noqa: F401  (fixture scale dir)


# --- util.global_ntile ------------------------------------------------------

@pytest.mark.parametrize("n", [1, 4, 5, 6, 100, 1003])
def test_global_ntile_matches_window_ntile(spark, n):
    """The distributed quintile must be BIT-identical to the window
    ntile on every size regime: n < tiles, n == tiles, n % tiles != 0,
    with duplicate sort values broken by a unique key."""
    from melt_spark.functions.util import global_ntile

    df = spark.range(n).select((F.col("id") % 7).alias("v"),
                               F.col("id").alias("uid"))
    order = [F.desc("v"), F.asc("uid")]
    got = global_ntile(df, 5, order, "tile")
    exp = df.withColumn("tile", F.ntile(5).over(Window.orderBy(*order)))
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_global_ntile_no_single_partition_exchange(spark):
    """The entire point: the plan must NOT funnel the frame through an
    unbounded SinglePartition exchange (the WindowExec single-reducer
    the round-6 audit flagged in rfm_scores)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_lint import lint_plan

    from melt_spark.functions.util import global_ntile

    df = spark.range(1000).select((F.col("id") % 7).alias("v"),
                                  F.col("id").alias("uid"))
    got = global_ntile(df, 5, [F.asc("v"), F.asc("uid")], "tile")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = got._jdf.queryExecution().explainString(mode)
    assert lint_plan(plan) == []


# --- graph-ANN seed robustness (round-6 ADVICE) -----------------------------

def test_graph_ann_sparse_offset_id_space(spark):
    """Seeds must exist on a SPARSE, OFFSET id space — the old
    `id % seeds_every == 0` rule found zero seeds there and returned a
    silently empty result."""
    from melt_spark.functions.similarity import graph_ann_search, knn_graph
    from melt_spark.sources.parquet import read_table

    emb = (read_table(spark, SF_DIR, "embeddings")
           .select((F.col("vec_id") * 7 + 1_000_001).alias("vec_id"),
                   "embedding"))
    edges = knn_graph(emb, m=8, every=50)
    q = emb.orderBy("vec_id").limit(3)
    out = graph_ann_search(emb, q, edges, k=10, beam=10, rounds=2)
    rows = out.collect()
    assert len(rows) == 30  # 3 queries x top-10, NOT silently empty
    assert sum(r.in_exact for r in rows) > 0


def test_graph_ann_rejects_zero_rounds(spark):
    from melt_spark.functions.similarity import graph_ann_search
    from melt_spark.sources.parquet import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="rounds"):
        graph_ann_search(emb, emb.limit(1), emb.limit(0), rounds=0)


# --- exact-substring dedup (Lee et al. ExactSubstr class) -------------------

def test_exact_substring_finds_planted_straddling_duplicate(spark):
    """A 25-token duplicate planted at DIFFERENT offsets in two otherwise
    unique documents must surface as one maximal span per doc, with the
    right start and length — the offset-exactness span_dedup's
    non-overlapping blocks cannot give."""
    from melt_spark.functions.dedup import exact_substring_spans

    dup = " ".join(f"d{i}" for i in range(25))
    uniq = lambda tag, m: " ".join(f"{tag}{i}" for i in range(m))  # noqa: E731
    rows = [(1, uniq("a", 7) + " " + dup + " " + uniq("b", 10)),
            (2, uniq("c", 13) + " " + dup + " " + uniq("e", 4))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r.doc_id, r.span_start, r.span_tokens)
           for r in exact_substring_spans(df, k=20).collect()}
    assert out == {(1, 8, 25), (2, 14, 25)}


def test_exact_substring_merges_adjacent_runs(spark):
    """Two copies of the same doc: the whole text is one maximal span."""
    from melt_spark.functions.dedup import exact_substring_spans

    text = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    out = {(r.doc_id, r.span_start, r.span_tokens)
           for r in exact_substring_spans(df, k=20).collect()}
    assert out == {(1, 1, 40), (2, 1, 40)}


def test_exact_substring_below_threshold_silent(spark):
    """A 19-token shared substring is under the k=20 threshold: nothing."""
    from melt_spark.functions.dedup import exact_substring_spans

    dup = " ".join(f"d{i}" for i in range(19))
    rows = [(1, dup + " x0 x1 x2"), (2, "y0 y1 y2 " + dup)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert exact_substring_spans(df, k=20).count() == 0


# --- SCALING.md is a pure view of SCALING.json (round-6 verdict item 3) -----

def test_scaling_md_table_matches_json():
    import json
    from pathlib import Path

    docs = Path(__file__).resolve().parent.parent / "docs"
    state = json.loads((docs / "SCALING.json").read_text())
    assert state["n"] == 16, "SCALING.json must hold the 16x baseline"
    recorded = {k for k in state["base"] if k in state["big"]}
    md = (docs / "SCALING.md").read_text()
    main = md.split("## Reading the r4 rows")[0]
    rows = {line.split("|")[1].strip() for line in main.splitlines()
            if line.startswith("| ") and not line.startswith("| query")}
    assert rows == recorded, (
        f"SCALING.md main table out of sync with SCALING.json: "
        f"md-only={sorted(rows - recorded)} "
        f"json-only={sorted(recorded - rows)}")


# --- plan_lint parser unit tests --------------------------------------------

def _fmt(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_plan_lint_flags_partitionless_window(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_lint import lint_plan

    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id")))
    assert lint_plan(_fmt(spark, df)), \
        "partition-less window over unbounded input must be flagged"


def test_plan_lint_accepts_bounded_shapes(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_lint import lint_plan

    base = spark.range(100)
    # global agg: keyless partial -> SinglePartition is one row per task
    assert lint_plan(_fmt(spark, base.agg(F.sum("id")))) == []
    # top-k then rank: TakeOrderedAndProject bounds the window input
    topk = base.orderBy("id").limit(5).withColumn(
        "rn", F.row_number().over(Window.orderBy("id")))
    assert lint_plan(_fmt(spark, topk)) == []
    # keyed agg then limit then window: limit certificate
    lim = (base.groupBy((F.col("id") % 10).alias("g")).count().limit(10)
           .withColumn("rn", F.row_number().over(Window.orderBy("g"))))
    assert lint_plan(_fmt(spark, lim)) == []


# --- util.global_order_scan cummax_excl + cleaning.pareto_front (r7b) -------

def test_cummax_excl_matches_window(spark):
    """Distributed exclusive running max must be bit-identical to
    max() OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING .. 1 PRECEDING),
    including the NULL empty-prefix on the global first row and
    duplicate order keys broken by a unique id."""
    from melt_spark.functions.util import global_order_scan

    df = spark.range(997).select(
        F.col("id"),
        (F.col("id") % 13).alias("k"),
        ((F.col("id") * 37) % 101).alias("v"))
    got = global_order_scan(df, [F.col("k").asc(), F.col("id").asc()],
                            cummax_excl={"v": "mx"})
    w = Window.orderBy(F.col("k").asc(), F.col("id").asc()) \
        .rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("mx", F.max("v").over(w))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_pareto_front_dominance_semantics(spark):
    """Textbook NOT-EXISTS semantics on a hand-built frame: strict
    dominance removes, equal coordinates aggregate (n_points), a point
    tied on one axis but beaten on the other is dominated."""
    from melt_spark.functions.cleaning import pareto_front

    rows = [
        (1, 10, 10),   # frontier (global max corner)
        (2, 10, 10),   # exact duplicate -> same frontier row, n_points=2
        (3, 10, 9),    # dominated: same x as 10,10 but lower y
        (4, 9, 10),    # dominated: same y, lower x
        (5, 8, 12),    # frontier: beats everything on y
        (6, 8, 11),    # dominated by (8, 12)
        (7, 12, 1),    # frontier: beats everything on x
        (8, 1, 1),     # dominated by all
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {(r.x, r.y): (r.n_points, r.min_id)
           for r in pareto_front(df, "x", "y", "id").collect()}
    assert got == {(10, 10): (2, 1), (8, 12): (1, 5), (12, 1): (1, 7)}


def test_pareto_front_matches_not_exists_oracle(spark, sf_dir):
    """On real data (orders price × recency) the distributed skyline
    equals the quadratic NOT-EXISTS definition computed via an
    anti-join."""
    from melt_spark.functions.cleaning import pareto_front
    from melt_spark.sources.parquet import read_table

    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
        F.col("o_orderdate").cast("long").alias("y"))
    got = pareto_front(o, "x", "y", "id").select("x", "y")
    pts = o.groupBy("x", "y").count().select("x", "y")
    q = pts.select(F.col("x").alias("qx"), F.col("y").alias("qy"))
    dominated = pts.join(
        q, (F.col("qx") >= F.col("x")) & (F.col("qy") >= F.col("y"))
        & ((F.col("qx") > F.col("x")) | (F.col("qy") > F.col("y"))),
        "left_semi")
    want = pts.exceptAll(dominated)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() >= 1
