package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Snapshots

/** Snapshot diff / delta semantics on literals. */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("diff classifies added / deleted / changed / unchanged") {
    val a = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("id", "text")
    val b = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("id", "text")
    val r = Snapshots.diff(a, b, "id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1))).toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed", 3L -> "deleted", 4L -> "added"))
  }

  test("delta returns only added+changed rows of the new snapshot, with bodies") {
    val a = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("id", "text")
    val b = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("id", "text")
    val r = Snapshots.delta(a, b, "id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSet
    assert(r == Set((2L, "new"), (4L, "fresh")))
  }

  test("NULL text is a content state, not row absence") {
    // Regression: md5(NULL) is NULL, indistinguishable from "row absent"
    // in the full-outer join — a NULL-text doc present in both snapshots
    // was misreported as added/deleted.
    val a = Seq((1L, null: String), (2L, null: String), (3L, "x"))
      .toDF("id", "text")
    val b = Seq((1L, null: String), (2L, "now set"), (3L, null: String))
      .toDF("id", "text")
    val r = Snapshots.diff(a, b, "id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1))).toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed"))
  }

  test("diff plan exchanges hashes, not bodies: text is pruned before the join") {
    val a = Seq((1L, "x")).toDF("id", "text")
    val b = Seq((1L, "x")).toDF("id", "text")
    val plan = Snapshots.diff(a, b, "id", "text").queryExecution.optimizedPlan
    // after optimization every join input projects to (id, md5) — the raw
    // text column must not appear above the hash projection
    val joinOutputs = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.children.flatMap(_.output.map(_.name))
    }.flatten
    assert(joinOutputs.nonEmpty && !joinOutputs.contains("text"))
  }
}
