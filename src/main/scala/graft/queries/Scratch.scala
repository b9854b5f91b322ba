package graft.queries

/** Scratch locations for driver queries that build STANDING state
  * (stream checkpoints, standing indexes, verdict sinks). Derived from
  * (query tag, data dir) so invocations against different scale factors
  * never clobber each other's state, and each query owns a distinct
  * namespace — the sequential-runner assumption stays out of the query
  * code. */
private[queries] object Scratch {
  def base(tag: String, dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"/tmp/graft_${tag}_$h"
  }

  /** Delete-and-return: a lifecycle query's scratch must start empty
    * (a stale checkpoint would make the stream skip this run's files). */
  def fresh(spark: org.apache.spark.sql.SparkSession,
            tag: String, dir: String): String = {
    val b = base(tag, dir)
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(b), true)
    b
  }
}
