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

  /** Free the cached blocks behind a `localCheckpoint`ed frame whose
    * consumers have ALL executed. Spark only reclaims checkpoint blocks
    * when the backing RDD is garbage-collected — on a large-heap driver
    * that can be hours — so iterative loops (per-iteration label frames)
    * and repeated index builds would otherwise accumulate dead blocks in
    * the block manager. Only frames whose plan ROOT is the checkpoint are
    * touched: a derived frame (checkpoint + downstream operators) is left
    * alone, because unpersisting through it would free an RDD other
    * consumers may still need. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
