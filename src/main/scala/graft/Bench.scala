package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/scan paths so the first measured query is not
    // charged session startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // A failed query must not masquerade as a plausible timing: it is
    // reported as -1 in the per-query map, listed under "errors", and the
    // exception goes to stderr.
    val errors = Seq.newBuilder[String]
    // Best-of-2 per query: the second pass measures steady state (plan +
    // codegen caches warm — the state a long-lived cluster session runs
    // in), and the min discards one-off box noise, which on this machine
    // can inflate a single run by 50%.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    // Sub-second queries sit INSIDE best-of-2's noise under box load (three
    // consecutive rounds committed one-run codec outliers a later round had
    // to re-litigate), so they get extra passes: cheap in wall-clock (the
    // queries are sub-second by definition), and the min over 4 passes is
    // stable where the min over 2 was not.
    val subSecPasses = math.max(passes,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SUBSEC_PASSES", "4").toInt)
    // optional comma-separated subset for fast local loops
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def onePass(): Option[Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            None
        }
      }
      var times = (1 to passes).flatMap(_ => onePass())
      if (times.size < passes) errors += name
      else {
        var attempts = passes
        while (times.min < 1.0 && attempts < subSecPasses) {
          times = times ++ onePass()
          attempts += 1
        }
        // Load-spike guard for the >= 1 s tier: when the passes disagree
        // by more than 25% the box was loaded during one of them, and a
        // min over diverging passes has committed one-off spikes three
        // rounds running (r12: q_winsorize 3.61 s in the artifact vs
        // 2.25 s in the same round's scale rehearsal). One extra pass,
        // bought only under OBSERVED divergence, settles it.
        if (times.min >= 1.0 && times.max > 1.25 * times.min) {
          System.err.println(f"[bench] $name: passes diverge >25%% " +
            f"(${times.min}%.2f..${times.max}%.2f) — adding a pass")
          times = times ++ onePass()
        }
      }
      val sec = if (times.isEmpty) -1.0 else times.min
      System.err.println(f"[bench] $name%-28s $sec%8.2fs  (${times.map(t => f"$t%.2f").mkString(", ")})")
      name -> sec
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.result().map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    // Divergence flags vs a REFERENCE run (SPARK_GRAFT_BENCH_REF = a
    // prior bench_full*.json at the same sf — by convention the scale
    // rehearsal's t_small run): every committed artifact then tells a
    // reader which entries moved >25% against the reference WITHOUT
    // hand-diffing SCALE blocks. Flags are advisory (≥1 s tier only —
    // the sub-second tier lives inside scheduler noise); an empty map
    // is the positive statement that nothing diverged.
    val vsRef: String = sys.env.get("SPARK_GRAFT_BENCH_REF").flatMap { p =>
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), "UTF-8")
        // an empty divergence map is the POSITIVE claim that nothing
        // diverged, so a ref file that is not a bench artifact must go
        // through the WARN/omit path, never misparse into {}
        val start = txt.indexOf("\"queries\":{")
        require(start >= 0, s"no \"queries\":{ marker — not a bench artifact")
        val body = txt.substring(start + 11)
        val end = body.indexOf('}')
        require(end >= 0, "unterminated queries object")
        val ref = "\"([A-Za-z0-9_]+)\":(-?[0-9][0-9.eE+-]*)".r
          .findAllMatchIn(body.substring(0, end))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
        val flags = results.toSeq.sorted.collect {
          case (q, sec) if sec >= 1.0 && ref.get(q).exists(r => r > 0 &&
              (sec > 1.25 * r || r > 1.25 * sec)) =>
            f""""$q":${sec / ref(q)}%.2f"""
        }
        Some(flags.mkString(s""","ref":"$p","divergence_vs_ref":{""", ",", "}"))
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] WARN: could not read ref $p: $e")
          None
      }
    }.getOrElse("")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson$vsRef,"sf":"$sfDir"}"""
    println(line)
    // The stdout capture that reaches the committed BENCH artifact is
    // tail-truncated (r11 lost 169 of 236 per-query times), so the full
    // record is ALSO written to a file — stable name, refreshed every
    // run, snapshot per round as bench_full_r{N}.json.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try {
      val w = new java.io.PrintWriter(outPath, "UTF-8")
      // PrintWriter swallows IO errors (println/close never throw), so a
      // disk-full mid-write would silently truncate the record this file
      // exists to preserve — checkError() is the only failure signal.
      val failed = try { w.println(line); w.checkError() } finally w.close()
      if (failed)
        System.err.println(s"[bench] WARN: write to $outPath reported an IO error")
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] WARN: could not write $outPath: $e")
    }
    spark.stop()
  }
}
