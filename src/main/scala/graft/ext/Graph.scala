package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the join-iteration shape (one
  * contribution join + one aggregation per superstep), which is exactly
  * how Pregel-style systems and GraphX express it; at 100 TB the edge
  * list is the big partitioned table and ranks are the small one, so each
  * superstep is a broadcast-or-shuffle join Catalyst/AQE already knows
  * how to plan. Complements [[Dedup.clusters]] (connected components) and
  * the bounded k-hop recursive CTE (AnalyticsQueries.qKhop).
  *
  * PageRank here is integer-exact so the ITERATION ITSELF is
  * oracle-checkable: ranks live in micro-units (1e6 = rank 1.0) and every
  * division is integer floor division — both engines floor identically,
  * where float mass-summation order would diverge. Damping 0.85 is the
  * exact rational 85/100. Dangling mass (nodes with no out-edges) is
  * dropped, not redistributed — stated semantics, identical both sides. */
object Graph {

  /** Weighted PageRank over (src, dst, w) edges: `iters` supersteps of
    *   R'(v) = 150000 + 85 * Σ_{u→v} floor(R(u)·w(u,v) / W(u)) / 100
    * in integer micro-units, R₀ = 1e6. `nodes` fixes the vertex set (so
    * isolated vertices keep the damping floor). Edges are materialized
    * once (`localCheckpoint`) — the iteration must not re-run the
    * upstream edge pipeline every superstep. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
               eager: Boolean = true): DataFrame = {
    // NB "wtot", not "W": Spark's default case-insensitive resolution
    // would make a `W` column ambiguous with the edge weight `w`.
    val deg = edges.groupBy(col("src")).agg(sum(col("w")).as("wtot"))
    val ew = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("w").cast("long").as("w"),
        col("wtot").cast("long").as("wtot"),
        // per-edge overflow cap, computed once at edge materialization:
        // pr·w wraps Long iff pr > Long.Max div w (exact integer bound)
        expr(s"${Long.MaxValue}L div greatest(cast(w as long), 1L)").as("prcap"))
      .localCheckpoint(eager)
    val n = nodes.select(col("node")).localCheckpoint(eager)
    var ranks = n.withColumn("pr", lit(1000000L))
    for (_ <- 1 to iters) {
      // Overflow safety without leaving Long arithmetic (a DECIMAL(38,0)
      // widening here measured ~4x slower on the per-edge hot path):
      // pr·w can wrap past Long only when pr > Long.Max/w — a heavy hub
      // after ranks concentrate — so that exact condition raises loudly
      // instead of silently wrapping in non-ANSI mode. The downstream
      // sums cannot wrap first: Σ_v c(v) ≤ Σ_u pr(u) ≈ N·1e6 micro-units
      // (each node distributes at most its own rank), so the guarded
      // multiply is the earliest — and only realistic — overflow site
      // short of ~10^12 nodes.
      val contrib = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst"),
          when(col("pr") > col("prcap"),
            raise_error(concat(lit("pageRank: pr*w exceeds Long range (pr="),
              col("pr").cast("string"), lit(", w="), col("w").cast("string"),
              lit(")"))))
          .otherwise(expr("(pr * w) div wtot")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = n.join(contrib, n("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(150000L) + expr("85 * coalesce(s, 0L) div 100")).as("pr"))
    }
    ranks
  }

  /** Directed transition graph from an ordered event stream: one weighted
    * edge per observed consecutive (prev, curr) item pair within a
    * partition key, self-loops dropped. The classic session-graph builder
    * (item-to-item transitions): a lag window inside the per-user
    * exchange, then a count aggregation — two narrow shuffles total. */
  def transitionEdges(events: DataFrame, partitionCol: String,
                      itemCol: String, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(orderCols.map(col): _*)
    events
      .select(col(itemCol).as("dst"), lag(col(itemCol), 1).over(w).as("src"))
      .where(col("src").isNotNull && col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
  }

  /** One micro-batch step of INCREMENTAL transition-graph maintenance
    * (the foreachBatch shape — see the dedupIncremental pattern): the
    * standing state is one boundary row per partition key (that key's
    * latest event) plus the accumulated edge counts; a new in-order batch
    * folds in by deriving transitions over (boundary ∪ batch) — which
    * yields exactly the batch-internal pairs plus the cross-batch
    * boundary pair, since a single boundary row forms no pair by itself —
    * and summing the edge counts. Cost per batch follows the BATCH (plus
    * one row per touched key), never the standing history.
    *
    * `events` columns: (partitionCol, itemCol, orderCols...); `boundary`
    * has the same shape; `edges` is (src, dst, w). Returns the updated
    * (edges, boundary). */
  def transitionStep(batch: DataFrame, boundary: DataFrame, edges: DataFrame,
                     partitionCol: String, itemCol: String,
                     orderCols: Seq[String]): (DataFrame, DataFrame) = {
    val all = batch.unionByName(boundary)
    val batchEdges = transitionEdges(all, partitionCol, itemCol, orderCols)
    val newEdges = edges.unionByName(batchEdges)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val wOrd = Window.partitionBy(partitionCol)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val newBoundary = all.withColumn("__rn", row_number().over(wOrd))
      .where(col("__rn") === 1).drop("__rn")
    (newEdges, newBoundary)
  }
}
