package graft.exec

import org.apache.spark.sql.{Column, DataFrame}

/** Distribution helpers shared by operators and queries. */
object Partitioning {

  /** Repartition with an EXPLICIT partition count (round-robin without
    * keys, hash on `keys` otherwise). Used to spread a small frame across
    * the cluster BEFORE a row-amplifying stage (explode fan-out):
    * `repartition(col)` without a count is AQE-coalescible, and a few-MB
    * pre-explode shuffle would be folded back into the single partition
    * the repartition exists to break up. */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    val n = df.sparkSession.conf
      .getOption("spark.sql.shuffle.partitions").flatMap(_.toIntOption)
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    if (keys.isEmpty) df.repartition(n) else df.repartition(n, keys: _*)
  }
}
