package graft
import org.apache.spark.sql.functions.col
/** Filter ABSORPTION's blast-radius guard: absorbed (fully-pushed)
  * filters must stay correct on every read surface that plans files
  * without the scan builder's skip set — the streaming micro-batch
  * tail, the COW group rewrite, and the MOR delta plan. A leak here
  * would be silent wrong results, not a failure. */
class AbsorbProbeSpec extends SparkSpec {
  private def sql(q: String) = spark.sql(q)
  test("absorbed partition-aligned filters stay exact on streaming reads and row-level rewrites") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
    sql("DROP TABLE IF EXISTS graft_cat.db.absp")
    sql("CREATE TABLE graft_cat.db.absp (g BIGINT, k BIGINT) PARTITIONED BY (g)")
    sql("INSERT INTO graft_cat.db.absp SELECT id % 4, id FROM range(0, 4000, 1, 2)")
    // 1. STREAMING read with a partition-aligned filter
    val got = collection.mutable.ArrayBuffer.empty[Long]
    val ckpt = java.nio.file.Files.createTempDirectory("absp-ckpt").toString
    val q = spark.readStream.table("graft_cat.db.absp")
      .filter(col("g") === 2L)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.collect().map(_.getLong(1)); ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.size == 1000, s"stream got ${got.size} rows, want 1000")
    assert(got.forall(_ % 4 == 2), "stream leaked rows outside g=2")
    // 2. COW UPDATE with a partition-aligned condition
    sql("UPDATE graft_cat.db.absp SET k = k + 1000000 WHERE g = 1")
    val r = sql("SELECT g, count(*), sum(CASE WHEN k >= 1000000 THEN 1 ELSE 0 END) " +
      "FROM graft_cat.db.absp GROUP BY g ORDER BY g").collect()
    r.foreach { row =>
      val (g, n, upd) = (row.getLong(0), row.getLong(1), row.getLong(2))
      assert(n == 1000, s"g=$g count $n")
      assert(if (g == 1) upd == 1000 else upd == 0, s"g=$g updated $upd")
    }
    // 3. MOR delta UPDATE with aligned condition
    sql("DROP TABLE IF EXISTS graft_cat.db.abspm")
    sql("CREATE TABLE graft_cat.db.abspm (g BIGINT, k BIGINT) PARTITIONED BY (g) " +
      "TBLPROPERTIES ('update.mode'='merge-on-read')")
    sql("INSERT INTO graft_cat.db.abspm SELECT id % 4, id FROM range(0, 4000, 1, 2)")
    sql("UPDATE graft_cat.db.abspm SET k = k + 1000000 WHERE g = 3")
    val r2 = sql("SELECT sum(CASE WHEN k >= 1000000 THEN 1 ELSE 0 END), count(*) " +
      "FROM graft_cat.db.abspm").collect().head
    assert(r2.getLong(0) == 1000 && r2.getLong(1) == 4000, s"mor: ${r2}")
  }
}
