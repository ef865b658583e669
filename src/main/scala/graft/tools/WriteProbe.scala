package graft.tools

import graft.GraftSession

/** One-off writer-path probe: times the catalog CTAS / INSERT encode
  * path at 1M rows (the write A/B harness proper lives in
  * CatalogEvidence). */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def sql(q: String) = spark.sql(q)
    def ms[T](b: => T): Long = {
      val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1000000L
    }
    sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
    // warm
    sql("DROP TABLE IF EXISTS graft_cat.db.wprobe")
    sql("CREATE TABLE graft_cat.db.wprobe AS SELECT id AS k, id * 3 AS v " +
      "FROM range(0, 1000000, 1, 4)")
    val longs = (1 to 7).map { _ =>
      sql("DROP TABLE IF EXISTS graft_cat.db.wprobe")
      ms(sql("CREATE TABLE graft_cat.db.wprobe AS " +
        "SELECT id AS k, id * 3 AS v FROM range(0, 1000000, 1, 4)"))
    }
    val mixed = (1 to 7).map { _ =>
      sql("DROP TABLE IF EXISTS graft_cat.db.wprobe")
      ms(sql("CREATE TABLE graft_cat.db.wprobe AS " +
        "SELECT id AS k, CAST(id AS DOUBLE) * 0.5 AS x, concat('s', id) AS s " +
        "FROM range(0, 1000000, 1, 4)"))
    }
    val n = spark.sql("SELECT count(*) FROM graft_cat.db.wprobe")
      .collect().head.getLong(0)
    println(s"""{"ctas_long_ms": ${longs.min}, "ctas_mixed_ms": ${mixed.min}, "rows": $n, "all_long": ${longs.mkString("[", ",", "]")}, "all_mixed": ${mixed.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
