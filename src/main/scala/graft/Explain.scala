package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-inspection tool: `runMain graft.Explain <queryName> [sfDir] [mode]`
  * prints the physical plan of a catalog query — the `.explain("formatted")`
  * loop as a command. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(ExplainMode.fromString(mode)))
    spark.stop()
  }
}
