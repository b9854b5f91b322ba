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

  test("FIM transform is a lossless permutation with sentinels; short docs stay raw") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "q"), (4L, ""))
      .toDF("id", "t")
    val r = Packing.fimTransform(docs, "t", "id", seed = 7L, fimPercent = 100)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2)))
      .sortBy(_._1).toSeq
    val byId = r.map(x => x._1 -> (x._2, x._3)).toMap
    // len < 2 can't split: raw passthrough, text unchanged
    assert(byId(3L) == ("raw", "q") && byId(4L) == ("raw", ""))
    // selected docs: stripping sentinels and re-sorting chars recovers
    // the original multiset (the transform is a permutation of the text)
    for (id <- Seq(1L, 2L)) {
      val (mode, out) = byId(id)
      assert(mode == "psm" || mode == "spm")
      val body = out.replace("<fim_prefix>", "").replace("<fim_suffix>", "")
        .replace("<fim_middle>", "")
      val orig = if (id == 1L) "abcdefghij" else "xy"
      assert(body.sorted == orig.sorted, s"doc $id lost characters: $out")
      // PSM carries the prefix before the suffix sentinel; SPM leads
      // with both sentinels adjacent
      if (mode == "spm") assert(out.startsWith("<fim_prefix><fim_suffix>"))
      else assert(out.startsWith("<fim_prefix>") &&
        !out.startsWith("<fim_prefix><fim_suffix>"))
    }
    // rate 0: everything raw
    val raw = Packing.fimTransform(docs, "t", "id", seed = 7L, fimPercent = 0)
      .select("mode").distinct().collect().map(_.getString(0)).toSeq
    assert(raw == Seq("raw"))
  }
}
