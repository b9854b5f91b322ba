package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.queries.TrainPrepQueries

/** The oracle proves render/pack reproducible; this spec proves the spans
  * MEAN what they claim: slicing a packed sample's text by its rebased
  * mask spans must yield exactly the assistant segments, end tag and all. */
class SftSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def spansOf(json: String): Seq[(Int, Int)] =
    "\\[(\\d+),(\\d+)\\]".r.findAllMatchIn(json)
      .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq

  test("rendered mask spans slice exactly the assistant segments") {
    val rows = TrainPrepQueries.qSftRender(spark, "/root/testdata/sf0.001")
      .select("rendered", "mask_spans").as[(String, String)].collect()
    assert(rows.nonEmpty)
    var checked = 0
    rows.foreach { case (text, json) =>
      spansOf(json).foreach { case (a, b) =>
        val slice = text.substring(a, b)
        assert(slice.startsWith("<|assistant|>") && slice.endsWith("<|end|>"),
          s"bad slice [$a,$b): $slice")
        checked += 1
      }
    }
    assert(checked > 0, "no assistant spans in the fixture")
  }

  test("packed mask spans survive rebasing: every span still slices an assistant segment") {
    val rows = TrainPrepQueries.qSftPack(spark, "/root/testdata/sf0.001")
      .select("text", "mask_spans", "n_chars").as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    var checked = 0
    rows.foreach { case (text, json, nChars) =>
      assert(text.length == nChars)
      spansOf(json).foreach { case (a, b) =>
        val slice = text.substring(a, b)
        assert(slice.startsWith("<|assistant|>") && slice.endsWith("<|end|>"),
          s"bad packed slice [$a,$b): $slice")
        checked += 1
      }
    }
    assert(checked > 0)
  }
}
