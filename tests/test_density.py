"""Grid-based DBSCAN (functions/density.py): dominance of the three
roles on a hand-built multi-cluster frame, fixture determinism, and the
oracle's own cell arithmetic."""

from pyspark.sql import functions as F

from melt_spark.functions.density import dbscan_grid
from melt_spark.sources.parquet import read_table


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, x long, y long")


def test_dbscan_two_clusters_border_and_noise(spark):
    """Two separated dense blobs -> two clusters; a sparse cell adjacent
    to a core cell -> border attached to that cluster; an isolated
    point -> noise."""
    rows = [
        # blob A: cells (0,0) x3 + (1,0) x1 — both core at min_pts=4
        (1, 5, 5), (2, 6, 5), (3, 5, 6), (4, 15, 5),
        # blob B: one isolated core cell (10,10), kept via self-edge
        (5, 105, 105), (6, 106, 106), (7, 107, 107), (8, 108, 108),
        # border: cell (2,0) is sparse but 8-adjacent to core (1,0)
        (9, 25, 5),
        # noise: nothing dense anywhere near
        (10, 500, 500),
    ]
    got = {r.id: (r.role, r.cluster_id)
           for r in dbscan_grid(_pts(spark, rows), 10, 10, 4).collect()}
    for i in (1, 2, 3, 4):
        assert got[i] == ("core", "0:0")
    for i in (5, 6, 7, 8):
        assert got[i] == ("core", "10:10")
    assert got[9] == ("border", "0:0")
    assert got[10] == ("noise", "")


def test_dbscan_min_pts_gate(spark):
    """Raising min_pts above the densest neighborhood turns everything
    into noise — the density gate actually gates."""
    rows = [(i, 5 + i, 5) for i in range(5)]   # all within two cells
    out = dbscan_grid(_pts(spark, rows), 10, 10, 99).collect()
    assert all(r.role == "noise" and r.cluster_id == "" for r in out)


def test_dbscan_fixture_has_all_roles(spark, sf_dir):
    """On the real per-customer features (sf0.01 tuning), core, border
    and noise are all populated and every non-noise point has a
    cluster."""
    orders = read_table(spark, sf_dir, "orders")
    pts = (orders.groupBy("o_custkey")
           .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 * 100).cast("bigint").alias("x"),
                F.count(F.lit(1)).alias("y"))
           .select(F.col("o_custkey").alias("id"), "x", "y"))
    out = dbscan_grid(pts, 25_000_000, 2, 40)
    roles = {r.role: r.n for r in
             out.groupBy("role").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    assert roles.get("core", 0) > 0
    assert out.filter((F.col("role") != "noise")
                      & (F.col("cluster_id") == "")).count() == 0
    assert out.filter((F.col("role") == "noise")
                      & (F.col("cluster_id") != "")).count() == 0


def test_connected_components_log_rounds_on_deep_chain(spark):
    """Path shortcutting (r7): a 200-node path graph converges in
    ~log2(diameter) rounds — 12 is ample; plain min-label propagation
    would need 199 (the 16x grid-DBSCAN probe hit exactly this class)."""
    from melt_spark.functions.dedup import connected_components

    e = spark.range(199).select(F.col("id").alias("doc_a"),
                                (F.col("id") + 1).alias("doc_b"))
    out = connected_components(e, max_iterations=12)
    assert out.count() == 200
    assert out.filter(F.col("cluster_id") != 0).count() == 0
