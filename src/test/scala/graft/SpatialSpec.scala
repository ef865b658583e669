package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

/** Spatial grid-join semantics: the grid-candidate path must equal the
  * all-pairs definition EXACTLY (completeness is geometric — cell side ≥
  * radius — not probabilistic), including pairs straddling cell boundaries
  * at exactly the radius. */
class SpatialSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q251 grid candidates == all-pairs brute force (sf0.001 customers)") {
    val p = SpatialQueries.points(Tables.customer(spark, sf), "c_custkey")
    val grid = SpatialQueries.gridPairs(p, 1024L, 360000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = p.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"))
    val b = p.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    val brute = a.crossJoin(b)
      .where(col("id_a") < col("id_b") && d2 <= 360000L)
      .select(col("id_a"), col("id_b"), d2.as("dist2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    brute should not be empty
    grid shouldBe brute
  }

  test("boundary completeness: a pair at exactly R across a cell edge is found; just-over-R is not") {
    import spark.implicits._
    // (1,2): dist2 = 600² = R² exactly, cells (0,0) and (1,0) — adjacent.
    // (3,4): diagonal straddle, cells (0,0) and (1,1), dist2 = 2·424² ≤ R².
    // (5,6): dist2 = 601² — one over the radius, must be excluded.
    val pts = Seq(
      (1L, 1023L, 500L), (2L, 1623L, 500L),
      (3L, 1023L, 1023L), (4L, 1447L, 1447L),
      (5L, 50000L, 500L), (6L, 50601L, 500L)).toDF("id", "x", "y")
    val got = SpatialQueries.gridPairs(pts, 1024L, 360000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got should contain((1L, 2L, 360000L))
    got should contain((3L, 4L, 2L * 424L * 424L))
    got.map(t => (t._1, t._2)) should not contain ((5L, 6L))
  }

  test("q253 dbscan on a constructed two-blob set: cores, min-label border, noise") {
    import spark.implicits._
    // blob A (1,2,3): pairwise within eps=2000 → all core, cluster 1.
    // 4: one neighbor (2, at 1950) → border of cluster 1.
    // 5: no neighbors → noise (-1).
    // blob B (6..9): pairwise within eps → all core, cluster 6.
    val pts = Seq(
      (1L, 100L, 100L), (2L, 200L, 100L), (3L, 100L, 200L),
      (4L, 2150L, 100L), (5L, 50000L, 50000L),
      (6L, 90000L, 90000L), (7L, 90100L, 90090L),
      (8L, 90050L, 90200L), (9L, 89900L, 89950L)).toDF("id", "x", "y")
    val got = SpatialQueries.dbscan(pts, 2048L, 4000000L, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    got shouldBe Set(
      (1L, "core", 1L), (2L, "core", 1L), (3L, "core", 1L),
      (4L, "border", 1L), (5L, "noise", -1L),
      (6L, "core", 6L), (7L, "core", 6L), (8L, "core", 6L), (9L, "core", 6L))
  }

  test("plans: keyed equi-join on grid cells — no cartesian, no nested loop; q252 argmin combines map-side") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val p251 = plan(SpatialQueries.q251GeoGridJoin(spark, sf))
    val p252 = plan(SpatialQueries.q252GeoNearest(spark, sf))
    // 2D containment is the nested-loop trap: the grid form must stay an
    // equi-join on cells with the containment predicate as a filter
    val p255 = plan(SpatialQueries.q255GeoContainment(spark, sf))
    for (p <- Seq(p251, p252, p255)) {
      p should not include "CartesianProduct"
      p should not include "BroadcastNestedLoopJoin"
    }
    // the argmin is an algebraic aggregate: partial min before the exchange
    p252 should include("partial_min")
  }
}
