package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
/** Scratch profiler: runs one named query with a job listener, printing
  * per-job wall time and task counts. Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    var stages = 0; var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.get(j.jobId)
        System.err.println(f"[job ${j.jobId}%3d] ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    System.err.println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n stages=$stages tasks=$tasks")
    spark.stop()
  }
}
