package graft.tools

import org.apache.spark.sql.SparkSession

/** PAIRED comparison of two driver queries: alternate A,B,A,B,… inside
  * ONE Spark session so this box's slow disk-throughput drift (±30%
  * across hours, documented in ENGINE.md) hits both sides equally and
  * cancels in the per-round ratios — the adjudication protocol the r14
  * verdict asked for where two absolute numbers from different hours
  * contradicted each other (q_stream_cluster_addonly vs _lifecycle).
  *
  * Per round both queries run back to back; the artifact is the vector
  * of per-round ratios plus medians. An unpaired warm-up round runs
  * first and is discarded (JVM/codegen warm-up would otherwise land
  * entirely on query A).
  *
  * Usage: runMain graft.tools.PairedBench <sfDir> <qA> <qB> [rounds] */
object PairedBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qa = args(1)
    val qb = args(2)
    val rounds = if (args.length > 3) args(3).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fa = graft.SparkEntry.queries(qa)
    val fb = graft.SparkEntry.queries(qb)
    def run(f: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      f(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    run(fa); run(fb) // discarded warm-up round
    val ts = (1 to rounds).map { r =>
      val a = run(fa); val b = run(fb)
      System.err.println(f"[paired] round $r: $qa $a%.2fs  $qb $b%.2fs  " +
        f"ratio ${a / b}%.3f")
      (a, b)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val ratios = ts.map { case (a, b) => a / b }
    println(f"""{"sf":"$sfDir","a":"$qa","b":"$qb","rounds":$rounds,""" +
      f""""a_secs":[${ts.map(t => f"${t._1}%.3f").mkString(",")}],""" +
      f""""b_secs":[${ts.map(t => f"${t._2}%.3f").mkString(",")}],""" +
      f""""ratios":[${ratios.map(r => f"$r%.3f").mkString(",")}],""" +
      f""""median_a":${median(ts.map(_._1))}%.3f,""" +
      f""""median_b":${median(ts.map(_._2))}%.3f,""" +
      f""""median_ratio":${median(ratios)}%.3f}""")
    spark.stop()
  }
}
