package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The standing preference matrix must equal the one-shot aggregation
  * after any batch split; a replayed batch must change nothing;
  * withdrawal is permanent (delete-wins over later ingestion); and
  * compaction folds to the identical matrix while retiring tombstones. */
class PreferenceIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def freshBase(): String =
    java.nio.file.Files.createTempDirectory("graft_prefidx").toString + "/idx"

  private def judgments(rows: (String, String)*) =
    rows.toDF("winner", "loser")

  private def matrixSet(base: String) =
    PreferenceIndex.matrix(spark, base)
      .as[(String, String, Long)].collect().toSet

  test("split ingestion == one-shot aggregation; replayed batch is a no-op") {
    val base = freshBase()
    val all = Seq(("a", "b"), ("a", "b"), ("b", "c"), ("a", "c"), ("c", "b"))
    PreferenceIndex.append(spark, base, judgments(all.take(2): _*),
      "winner", "loser", batchId = 0L)
    PreferenceIndex.append(spark, base, judgments(all.drop(2): _*),
      "winner", "loser", batchId = 1L)
    val expected = all.groupBy(identity).map { case ((w, l), g) =>
      (w, l, g.size.toLong) }.toSet
    assert(matrixSet(base) == expected)
    // replay: the same batch id with the same content overwrites its own
    // partition — counts must not double
    PreferenceIndex.append(spark, base, judgments(all.take(2): _*),
      "winner", "loser", batchId = 0L)
    assert(matrixSet(base) == expected)
  }

  test("withdrawal masks both endpoints and wins over later ingestion; compact folds and retires") {
    val base = freshBase()
    PreferenceIndex.append(spark, base, judgments(("a", "b"), ("b", "c")),
      "winner", "loser", batchId = 0L)
    PreferenceIndex.withdraw(spark, base, Seq("b").toDF("item"), "item",
      batchId = 1L)
    // edges where b won AND where b lost are both dead
    assert(matrixSet(base) == Set.empty)
    // delete-wins: a LATER batch re-introducing b stays masked
    PreferenceIndex.append(spark, base, judgments(("b", "a"), ("a", "c")),
      "winner", "loser", batchId = 2L)
    assert(matrixSet(base) == Set(("a", "c", 1L)))
    val folded = PreferenceIndex.compact(spark, base)
    assert(matrixSet(base) == Set(("a", "c", 1L)))
    // tombstones retired: physical state is ONE delta batch, zero tombs
    val st = PreferenceIndex.stats(spark, base).collect().head
    assert(st.getAs[Long]("n_delta_batches") == 1L)
    assert(st.getAs[Long]("n_withdrawn_items") == 0L)
    assert(st.getAs[Long]("n_live_edges") == 1L)
    // post-compact ingestion resumes above the folded batch — b may
    // re-enter now, the explicit re-admission path
    PreferenceIndex.append(spark, base, judgments(("b", "a")),
      "winner", "loser", batchId = folded + 1L)
    assert(matrixSet(base) == Set(("a", "c", 1L), ("b", "a", 1L)))
  }

  test("judgments with draws: tie deltas fold, survive unrelated withdrawal, die with their endpoint") {
    val base = freshBase()
    val j1 = Seq(("a", "b", "a"), ("a", "b", "tie"), ("b", "a", "tie"),
      ("b", "c", "b"), ("a", "c", "tie")).toDF("x", "y", "oc")
    PreferenceIndex.appendJudgments(spark, base, j1, "x", "y", "oc", batchId = 0L)
    // ties canonicalize to (least, greatest): (a,b) twice, (a,c) once
    def tieSet() = PreferenceIndex.ties(spark, base)
      .as[(String, String, Long)].collect().toSet
    assert(tieSet() == Set(("a", "b", 2L), ("a", "c", 1L)))
    assert(matrixSet(base) == Set(("a", "b", 1L), ("c", "b", 1L)))
    // withdrawing d (unrelated) leaves every tie; withdrawing c kills
    // ONLY ties touching c — delete-wins on both endpoints
    PreferenceIndex.withdraw(spark, base, Seq("c").toDF("item"), "item",
      batchId = 1L)
    assert(tieSet() == Set(("a", "b", 2L)))
    assert(matrixSet(base) == Set(("a", "b", 1L)))
    // delete-wins: later tie judgments touching c stay dead
    PreferenceIndex.appendJudgments(spark, base,
      Seq(("c", "a", "tie"), ("a", "b", "tie")).toDF("x", "y", "oc"),
      "x", "y", "oc", batchId = 2L)
    assert(tieSet() == Set(("a", "b", 3L)))
    // stats sees BOTH tables: batches 0 and 2 wrote ties, batch 1 only
    // tombs; live counts reflect the masked state, judgments = wins+ties
    val st = PreferenceIndex.stats(spark, base).collect().head
    assert(st.getAs[Long]("n_delta_batches") == 2L)  // ties batches 0,2; batch 1 is tombs-only
    assert(st.getAs[Long]("n_tie_rows") == 4L)       // raw deltas: (a,b,2)(a,c,1) + (a,b,1)(a,c,1)
    assert(st.getAs[Long]("n_withdrawn_items") == 1L)
    assert(st.getAs[Long]("n_live_ties") == 1L)      // (a,b,3) folded
    assert(st.getAs[Long]("n_live_items") == 2L)     // a, b
    assert(st.getAs[Long]("n_judgments") == 4L)      // 1 win + 3 draws
    assert(st.getAs[Boolean]("needs_compact"))       // tombstone pending
    // compaction folds BOTH tables and retires the tombstone
    val folded = PreferenceIndex.compact(spark, base)
    assert(tieSet() == Set(("a", "b", 3L)))
    assert(matrixSet(base) == Set(("a", "b", 1L)))
    // replayed judgment batch post-compact: idempotent per partition
    PreferenceIndex.appendJudgments(spark, base,
      Seq(("b", "c", "tie")).toDF("x", "y", "oc"), "x", "y", "oc",
      batchId = folded + 1L)
    PreferenceIndex.appendJudgments(spark, base,
      Seq(("b", "c", "tie")).toDF("x", "y", "oc"), "x", "y", "oc",
      batchId = folded + 1L)
    assert(tieSet() == Set(("a", "b", 3L), ("b", "c", 1L)))
  }

  test("appendJudgments raises on an unknown outcome value") {
    val base = freshBase()
    val bad = Seq(("a", "b", "draw")).toDF("x", "y", "oc")
    val e = intercept[Exception] {
      PreferenceIndex.appendJudgments(spark, base, bad, "x", "y", "oc", 0L)
    }
    assert(e.getMessage.contains("outcome") ||
      e.getCause != null && e.getCause.getMessage.contains("outcome"))
  }

  test("a corrupt edges partition fails loudly instead of reading as empty") {
    // A read failure that is NOT a missing path must propagate: if it
    // were swallowed as empty, compact() would fold a phantom-empty
    // matrix, commit, and retire tombstones without masking — silently
    // resurrecting withdrawn items.
    val base = freshBase()
    PreferenceIndex.append(spark, base, judgments(("a", "b")),
      "winner", "loser", batchId = 0L)
    val bad = java.nio.file.Paths.get(base, "edges", "batch_id=1")
    java.nio.file.Files.createDirectories(bad)
    java.nio.file.Files.write(bad.resolve("part-junk.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    intercept[org.apache.spark.SparkException] {
      PreferenceIndex.matrix(spark, base).collect()
    }
  }

  test("heal rolls an uncommitted compaction back and a committed one forward") {
    val base = freshBase()
    PreferenceIndex.append(spark, base, judgments(("a", "b")),
      "winner", "loser", batchId = 0L)
    PreferenceIndex.append(spark, base, judgments(("a", "b"), ("b", "c")),
      "winner", "loser", batchId = 1L)
    val expected = Set(("a", "b", 2L), ("b", "c", 1L))
    // simulate a crash AFTER the consolidated write but BEFORE commit:
    // start marker + a garbage consolidated partition at batch 2
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$base/_compact_start"), true)
    out.write("2".getBytes("UTF-8")); out.close()
    Seq(("zzz", "garbage", 999L)).toDF("winner", "loser", "n")
      .withColumn("batch_id", lit(2L))
      .write.mode("append").partitionBy("batch_id").parquet(s"$base/edges")
    // any entry point heals: the partial consolidation is discarded
    assert(matrixSet(base) == expected)
    // a real compaction then completes and survives
    PreferenceIndex.compact(spark, base)
    assert(matrixSet(base) == expected)
  }
}
