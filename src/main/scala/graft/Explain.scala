package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan for one or all
  * driver queries. Usage: runMain graft.Explain <sfDir> [queryName].
  * Used to check the plans we ship: broadcast joins on dims, PushedFilters
  * reaching the parquet scans, WholeStageCodegen spans, no unnecessary
  * exchanges. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) Seq(args(1)) else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
