package graft.exec

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, NumericType}

/** Distributed `row_number()` — the scale-safe replacement for the two
  * window shapes that serialize at 100 TB:
  *
  *  - `row_number() OVER (ORDER BY …)`: Spark plans an empty-partitioning
  *    window, i.e. the ENTIRE corpus sorts in one task.
  *  - `row_number() OVER (PARTITION BY low_card ORDER BY …)`: each group's
  *    whole extent sorts in one task (3 languages at 100 TB = 3 tasks).
  *
  * Shape here: one range exchange on (group ++ order) — every group
  * occupies a contiguous RUN of partitions and rows are locally sorted —
  * then a two-phase count: per-partition per-group row counts come to the
  * driver, per-partition starting offsets broadcast back, and each
  * partition streams its rows once incrementing a counter. Result is
  * bit-identical to the window formulation (the DuckDB oracles prove it)
  * while the sort work spreads over every core.
  *
  * Driver state: one (group-key, count) entry per group PER PARTITION IT
  * TOUCHES. Contiguity bounds this at partitions + distinct-groups, so the
  * utility is sized for low-cardinality groups (languages, length buckets,
  * shards — the training-pipeline cases). High-cardinality groups don't
  * need it: their per-group windows are already small.
  *
  * Caller contract: `order` must be a TOTAL order (include a unique
  * tie-break column) or the assignment is ambiguous by spec anyway.
  */
object Ranks {

  /** `row_number() OVER (ORDER BY order…)` as `out`, 1-based. */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
                      out: String = "rn"): DataFrame =
    groupedRowNumber(df, Nil, order, out)

  /** EXCLUSIVE running total of `valueCol` per group in `order` —
    * `sum(v) OVER (PARTITION BY group ORDER BY … ROWS UNBOUNDED
    * PRECEDING AND 1 PRECEDING)`, zero-coalesced — with the same
    * two-phase shape as the row numbering (per-(partition, group) value
    * totals to the driver, offsets broadcast back). Token-weighted
    * scheduling needs this: the stride position of a document is the
    * tokens BEFORE it in its domain, not its ordinal. */
  def groupedPrefixSum(df: DataFrame, group: Seq[String], order: Seq[Column],
                       valueCol: String, out: String): DataFrame =
    twoPhase(df, group, order, Some(valueCol), out)

  /** `row_number() OVER (PARTITION BY group… ORDER BY order…)` as `out`,
    * 1-based. Group columns are names (their values key the offset map);
    * order columns are arbitrary sortable expressions. */
  def groupedRowNumber(df: DataFrame, group: Seq[String], order: Seq[Column],
                       out: String): DataFrame =
    twoPhase(df, group, order, None, out)

  /** Hard ceiling on phase-1 driver state: one small tuple per
    * (partition, group-run). ~4M entries is well under a gigabyte of
    * driver heap; beyond it the caller is using a high-cardinality group
    * column, which this utility is explicitly not for (each such group's
    * window is small enough for a plain `Window.partitionBy`). */
  private val MaxDriverEntries: Long = 4L * 1000 * 1000

  private def twoPhase(df0: DataFrame, group: Seq[String], order: Seq[Column],
                       valueCol: Option[String], out: String): DataFrame = {
    val spark = df0.sparkSession
    // The value column's public contract is "any numeric, nulls count as
    // zero"; phase 1/2 arithmetic is Long. Normalize once into an internal
    // appended column rather than trusting callers to pre-cast. The name
    // must not collide with a caller column: withColumn would then replace
    // IN PLACE instead of appending last, and the dropRight(1) below would
    // strip the caller's trailing column and emit corrupted rows.
    val internalV = Iterator.from(0).map(i => s"__graft_tp_value$i")
      .find(n => !df0.columns.contains(n)).get
    val df = valueCol match {
      case Some(v) =>
        val dt = df0.schema(v).dataType
        require(dt.isInstanceOf[NumericType],
          s"value column $v must be numeric, got $dt")
        df0.withColumn(internalV, coalesce(col(v).cast(LongType), lit(0L)))
      case None => df0
    }
    val keys: Seq[Column] = group.map(col) ++ order
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    // localCheckpoint pins ONE materialization of the range exchange: the
    // count job and the numbering job must see identical boundaries, and
    // sampled range boundaries are not stable across re-executions.
    val ranged = df.repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .localCheckpoint()
    val gIdx = group.map(ranged.columns.indexOf(_)).toArray
    require(gIdx.forall(_ >= 0), s"group columns $group must exist in ${ranged.columns.toSeq}")

    def keyOf(r: Row): Seq[Any] = gIdx.toSeq.map(r.get)
    val vIdx = if (valueCol.isEmpty) -1 else ranged.columns.indexOf(internalV)
    def valueOf(r: Row): Long = if (vIdx < 0) 1L else r.getLong(vIdx)

    // Phase 1: per-(partition, group) totals (row counts, or valueCol
    // sums). Rows are sorted with group as the major key, so totalling is
    // a streaming run-length pass.
    val countsRdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], Long)]
      var cur: Seq[Any] = null
      var n = 0L
      it.foreach { r =>
        val k = keyOf(r)
        if (cur == null || k != cur) {
          if (cur != null) runs += ((cur, n))
          cur = k; n = 0L
        }
        n += valueOf(r)
      }
      if (cur != null) runs += ((cur, n))
      Iterator((pid, runs.toSeq))
    }

    // Misuse guard (contiguity bounds entries at partitions + distinct
    // groups, so tripping this means a high-cardinality group column):
    // the entry count is summed DISTRIBUTEDLY, before any entry reaches
    // the driver — guarding after a collect would OOM inside the collect
    // it claims to prevent. The extra job re-reads the pinned checkpoint
    // blocks, not the upstream plan.
    val collected = countsRdd.map(_._2.size.toLong).fold(0L)(_ + _)
    require(collected <= MaxDriverEntries,
      s"Ranks.twoPhase would collect $collected (partition, group) entries " +
        s"(> $MaxDriverEntries): group columns $group are too high-cardinality " +
        "for the two-phase rank — use a plain Window.partitionBy, whose " +
        "per-group extents are small at that cardinality.")
    val counts: Array[(Int, Seq[(Seq[Any], Long)])] = countsRdd.collect()

    // Phase 2: starting offset of each group within each partition = total
    // of that group's counts in earlier partitions.
    val running = scala.collection.mutable.Map.empty[Seq[Any], Long]
    val offsets: Map[Int, Map[Seq[Any], Long]] =
      counts.sortBy(_._1).map { case (pid, runs) =>
        pid -> runs.map { case (k, n) =>
          val start = running.getOrElse(k, 0L)
          running(k) = start + n
          k -> start
        }.toMap
      }.toMap
    val bc = spark.sparkContext.broadcast(offsets)

    // The numbering pass binds the partition index via mapPartitionsWithIndex,
    // NOT TaskContext.getPartitionId(): a downstream NARROW re-partitioning
    // (e.g. a sink's coalesce(1)) folds several checkpoint partitions into
    // one task, where getPartitionId() names the COALESCED partition and
    // every folded chunk would read offset 0. The split index is bound at
    // RDD definition and survives any downstream plan shape.
    // Ranks are INCLUSIVE (this row's 1-based position); prefix sums are
    // EXCLUSIVE (the total strictly before this row).
    // The internal normalized-value column (last, when present) is
    // implementation detail — strip it from both schema and rows.
    val baseSchema =
      if (vIdx < 0) ranged.schema
      else org.apache.spark.sql.types.StructType(ranged.schema.dropRight(1))
    val outSchema = baseSchema.add(out, LongType, nullable = false)
    val numbered = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val mine = bc.value.getOrElse(pid, Map.empty[Seq[Any], Long])
      val cur = scala.collection.mutable.Map.empty[Seq[Any], Long]
      it.map { r =>
        val k = gIdx.toSeq.map(r.get)
        val before = cur.getOrElse(k, mine.getOrElse(k, 0L))
        val v = valueOf(r)
        cur(k) = before + v
        val base = if (vIdx < 0) r.toSeq else r.toSeq.dropRight(1)
        Row.fromSeq(base :+ (if (vIdx < 0) before + v else before))
      }
    }
    spark.createDataFrame(numbered, outSchema)
  }
}
