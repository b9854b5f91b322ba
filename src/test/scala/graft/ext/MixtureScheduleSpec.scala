package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.queries.TrainPrepQueries

/** The property the oracle can't see: stride scheduling exists so that
  * EVERY prefix of the epoch holds the target domain mixture, not just
  * the whole epoch. Check it directly on the fixture corpus. */
class MixtureScheduleSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("every prefix of the schedule tracks the weight-share mixture until supply runs out") {
    val rows = TrainPrepQueries.qMixtureSchedule(spark, "/root/testdata/sf0.001")
      .select("lang", "pos").as[(String, Long)].collect()
      .sortBy(_._2)
    assert(rows.nonEmpty)
    val weight = (l: String) => l match { case "en" => 5L; case "zh" => 2L; case _ => 1L }
    val supply = rows.groupBy(_._1).map { case (l, v) => l -> v.length.toLong }
    // keysIterator, not keys: a Set.map would dedup equal weights
    val sumW = supply.keysIterator.map(weight).sum.toDouble

    // A domain d keeps pace w_d/sumW until its supply is exhausted at
    // prefix n_d = supply_d * sumW / w_d; past that it saturates. Check
    // prefixes strictly before the EARLIEST exhaustion point.
    val horizon = supply.map { case (l, s) => s * sumW / weight(l) }.min.toInt - 1
    assert(horizon > 100, s"fixture too skewed for the property to bite: $horizon")

    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    rows.take(horizon).zipWithIndex.foreach { case ((lang, _), i) =>
      counts(lang) += 1
      val n = i + 1
      if (n >= 50 && n % 25 == 0) {
        supply.keys.foreach { l =>
          val expected = n * weight(l) / sumW
          // stride drift is O(1) docs per domain; allow integer slack + 10%
          assert(math.abs(counts(l) - expected) <= math.max(3.0, 0.1 * expected),
            s"prefix $n: $l has ${counts(l)} docs, expected ~$expected")
        }
      }
    }
  }
}
