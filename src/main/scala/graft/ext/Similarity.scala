package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (ARRAY<FLOAT>).
  *
  * Two paths, as a large-scale pipeline needs both:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; one scan of the corpus, no corpus shuffle
  *    except the final per-query top-k. The baseline and the verifier.
  *  - [[lshTopK]]: random-hyperplane LSH — bucket corpus and queries by
  *    sign-bit signatures over L tables, search only colliding buckets.
  *    The 100 TB path: candidate generation is an equi-join on (table,
  *    bucket), cost proportional to collisions, not |corpus|×|queries|.
  *
  * All arithmetic in double (floats widened first) with left-to-right
  * accumulation so results are reproducible and oracle-comparable. */
object Similarity {

  /** Dot product — custom codegen'd expression (the HOF formulation runs
    * interpreted; see graft.functions.VectorExpressions). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))

  /** Fused single-pass cosine, codegen'd; bit-identical to
    * dot/(norm*norm) with left-to-right double accumulation. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineSim(a, b)

  /** The interpreted higher-order-function twin, kept for cross-checking
    * the custom expression in tests. */
  def cosineHof(a: Column, b: Column): Column = {
    val d = aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    d / (norm(a) * norm(b))
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (query ≠ candidate), ties broken by candidate id.
    * `queries` is expected to be small — it is broadcast; the corpus is
    * scanned once. Top-k uses the bounded [[graft.functions.TopKAggregator]]
    * so only ≤ k rows per query per partition reach the shuffle (the window
    * formulation, kept as [[bruteForceTopKWindow]], shuffles every scored
    * candidate). Output: (query_id, rank, cand_id, sim). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    topKPerKey(scoreAll(corpus, queries, idCol, vecCol), k)

  /** Window-formulation twin (full shuffle + sort), for cross-checking. */
  def bruteForceTopKWindow(corpus: DataFrame, queries: DataFrame, k: Int,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id").asc)
    scoreAll(corpus, queries, idCol, vecCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("sim"))
  }

  private def scoreAll(corpus: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    c.join(q, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        cosine(col("qv"), col("cv")).as("sim"))
  }

  /** Bounded top-k of (query_id, cand_id, sim) rows per query_id —
    * map-side partial aggregation, then explode with ranks. */
  def topKPerKey(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(k).toColumn
    scored.select(col("query_id"), col("cand_id"), col("sim"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("top"))
      .flatMap { case (qid, top) =>
        top.iterator.zipWithIndex.map { case ((sim, cid), i) => (qid, i + 1, cid, sim) }
      }
      .toDF("query_id", "rank", "cand_id", "sim")
  }

  // ------------------------------------------------------------- SQ8

  /** Per-vector 8-bit scalar quantization (the FAISS-style SQ8 recipe):
    * `q_i = clamp_0..255(floor((v_i - mn) / scale + 0.5))` with
    * `scale = (mx - mn) / 255`; a constant vector takes scale 0 and
    * q_i = 0. All arithmetic in DOUBLE, and `floor(x + 0.5)` instead of
    * `round()` — HALF_UP vs banker's rounding differs across engines,
    * floor does not — so quantization is bit-reproducible in the oracle.
    * One fused primitive pass ([[graft.functions.VectorExpressions
    * .sq8Quantize]]) — the HOF twin (array_min/array_max + transform)
    * runs interpreted per candidate pair once the corpus projection
    * collapses into the scoring join; arithmetic is bit-identical.
    * Output: struct(mn DOUBLE, sc DOUBLE, q ARRAY<INT>). */
  def sq8Quantize(v: Column): Column =
    graft.functions.VectorExpressions.sq8Quantize(v)

  /** Reconstruction `v̂_i = mn + scale · q_i` — the corpus side of
    * asymmetric distance (queries stay full-precision). One fused
    * primitive loop ([[graft.functions.VectorExpressions
    * .sq8Reconstruct]] — accepts raw INT codes or the byte-packed
    * storage form directly): the HOF `transform` twin runs interpreted
    * per candidate pair once Catalyst collapses it into the scoring
    * join, measured ~6x slower on the brute SQ8 query. Arithmetic is
    * bit-identical to the transform formulation. */
  def sq8Reconstruct(s: Column): Column =
    sq8Dequantize(s.getField("mn"), s.getField("sc"), s.getField("q"))

  def sq8Dequantize(mn: Column, sc: Column, q: Column): Column =
    graft.functions.VectorExpressions.sq8Reconstruct(mn, sc, q)

  /** Byte packing for STORAGE: codes 0..255 shift to signed -128..127
    * (ARRAY<TINYINT> is 1 byte/component in parquet vs 4 for the float
    * vector — the 4× I/O cut that makes SQ8 worth it at 100 TB).
    * Lossless round-trip with [[sq8UnpackBytes]]. */
  def sq8PackBytes(q: Column): Column =
    transform(q, x => (x - lit(128)).cast(ByteType))

  def sq8UnpackBytes(qb: Column): Column =
    transform(qb, x => x.cast(IntegerType) + lit(128))

  /** Brute-force asymmetric SQ8 top-k: quantize + reconstruct the corpus
    * inline, score full-precision queries against it. The oracle-exact
    * reference for the SQ8 codec (and the honest accuracy baseline —
    * candidate ranking degrades only by the quantization error). */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    bruteForceTopK(
      corpus.withColumn(vecCol, sq8Reconstruct(sq8Quantize(col(vecCol)))),
      queries, k, idCol, vecCol)

  // ------------------------------------------- product quantization (PQ)

  /** Index (0-based) of the L2-nearest codeword for a subvector. Distances
    * come from one HOF pass over the codebook literal; the winner is the
    * FIRST index attaining the minimum (`array_position` semantics), so
    * ties break deterministically and identically on every engine pass.
    * All arithmetic in double (float components promote), bit-stable. */
  private def l2ArgMin(sub: Column, codebook: Seq[Seq[Double]]): Column = {
    val dists = transform(typedLit(codebook), c =>
      aggregate(zip_with(sub, c, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Train `m` product-quantization codebooks of `k2` codewords each —
    * the FAISS IVF-PQ recipe's fine quantizer. Each subspace runs the
    * same deterministic quantized-mean Lloyd loop as [[kmeansCentroids]]
    * but under the L2 objective the ENCODER uses (cosine is meaningless
    * on subvectors — direction alone drops the magnitude information PQ
    * exists to keep). Seeds are the first `k2` subvectors by id; a
    * codeword that loses all members KEEPS its previous value so code
    * positions stay stable across iterations. Only m·k2·(dim/m) = k2·dim
    * doubles ever reach the driver — same memory contract as the coarse
    * quantizer. Corpus is scanned once per (subspace × iteration); at
    * build time that is the standard PQ training cost and `df` should be
    * a (cached) sample at extreme scale. */
  def pqTrainCodebooks(df: DataFrame, vecCol: String, idCol: String,
                       m: Int, k2: Int, iters: Int): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    require(k2 >= 1 && k2 <= 256, s"PQ codes are one byte: k2 $k2 not in 1..256")
    // one collect seeds EVERY subspace: the first k2 vectors by id,
    // sliced driver-side
    val seeds = df.orderBy(col(idCol)).limit(k2)
      .select(col(idCol).cast(LongType), col(vecCol)).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    require(seeds.nonEmpty, "PQ: empty training frame")
    val dim = seeds.head.length
    require(dim % m == 0, s"PQ: dim $dim not divisible by m $m")
    val d = dim / m
    var books: Seq[Seq[Seq[Double]]] =
      (0 until m).map(j => seeds.map(_.slice(j * d, j * d + d)))
    // each Lloyd round is ONE distributed pass: a single projection
    // assigns all m subspaces (posexplode over the per-subspace structs),
    // and one grouped aggregation yields every (subspace, codeword,
    // component) quantized mean — job count is `iters`, not m × iters
    for (_ <- 1 to iters) {
      val perSub = df.select(posexplode(array((0 until m).map { j =>
          struct(l2ArgMin(slice(col(vecCol), j * d + 1, d), books(j)).as("c"),
            slice(col(vecCol), j * d + 1, d).as("sv"))
        }: _*)))
        .select(col("pos").as("j"), col("col.c").as("c"),
          posexplode(transform(col("col.sv"),
            x => floor(x.cast(DoubleType) * 1000000.0).cast(LongType))))
      val means = perSub
        .groupBy(col("j"), col("c"), col("pos"))
        .agg(sum(col("col").cast(DecimalType(38, 0))).cast(DoubleType).as("s"),
          count(lit(1)).cast(DoubleType).as("n"))
        .select(col("j"), col("c"), col("pos"),
          (col("s") / (col("n") * 1000000.0)).as("m"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getDouble(3))))
        .groupBy(_._1)
        .map { case (k, rows) => k -> rows.map(_._2).sortBy(_._1).map(_._2).toSeq }
      books = books.zipWithIndex.map { case (book, j) =>
        // a codeword that lost all members keeps its previous value so
        // code positions stay stable
        book.indices.map(i => means.getOrElse((j, i), book(i)))
      }
    }
    books
  }

  /** Encode a vector to `m` one-byte codes (stored shifted to TINYINT
    * like [[sq8PackBytes]] — 1 byte/subspace in parquet, the 8×-vs-SQ8 /
    * 32×-vs-float corpus compression that makes IVF-PQ the standard
    * billion-scale layout). */
  def pqEncode(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val d = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (book, j) =>
      (l2ArgMin(slice(v, j * d + 1, d), book) - lit(128)).cast("byte")
    }: _*)
  }

  /** Reconstruction: concatenate each code's codeword — m table lookups
    * into the codebook literal, no arithmetic (the PQ decode property).
    * Queries stay full-precision; scoring is asymmetric like SQ8. */
  def pqReconstruct(codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    flatten(zip_with(typedLit(codebooks), codes,
      (book, code) => element_at(book, code.cast("int") + lit(129))))

  /** Ad-hoc IVF-PQ search: coarse cells assigned on FULL-PRECISION
    * vectors (like the index build), scoring against the PQ
    * reconstruction. The independent formulation [[graft.queries]] pits
    * against the standing index in the q_sim_pq_verified contract. */
  def pqTopKWith(corpus: DataFrame, queries: DataFrame,
                 cents: Seq[(Long, Seq[Double])],
                 codebooks: Seq[Seq[Seq[Double]]], k: Int, nprobe: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame =
    searchCells(
      assignCells(corpus, vecCol, idCol, cents)
        .withColumn("v", pqReconstruct(pqEncode(col("v"), codebooks), codebooks)),
      probeCells(queries, vecCol, idCol, cents, nprobe), k)

  /** Exact re-rank refinement — the second stage of the standard
    * IVFPQ-with-refine recipe (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011; FAISS `IndexRefineFlat`): an
    * approximate searcher proposes a `shortlist` of candidates per
    * query under lossy (PQ/SQ8) scores, then exact cosine is recomputed
    * for ONLY the shortlisted pairs against a full-precision vector
    * source and the final top-k re-sorts under the exact scores.
    *
    * Scale shape (the 100 TB path): `candidates` is |queries|·shortlist
    * id-pairs — driver-small by the same contract that makes `queries`
    * broadcastable — so the exact pass is ONE scan of the raw corpus
    * with the (pair, query-vector) frame broadcast against it: the
    * corpus is never shuffled and never carries vectors into an
    * exchange; only the bounded per-query top-k aggregation moves
    * (query_id, cand_id, sim) triples. The byte-packed codes stay in
    * the index; the raw vectors stay in cold parquet and are decoded
    * only for shortlisted rows. Output shape matches [[bruteForceTopK]];
    * `sim` is the EXACT cosine (the refinement contract the _verified
    * companion asserts). */
  def rerankExact(candidates: DataFrame, corpus: DataFrame,
                  queries: DataFrame, k: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val pairs = candidates.select(col("query_id"), col("cand_id"))
    val q = queries.select(col(idCol).cast(LongType).as("query_id"),
      col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).cast(LongType).as("cand_id"),
      col(vecCol).as("cv"))
    topKPerKey(
      c.join(broadcast(pairs.join(q, "query_id")), Seq("cand_id"))
        .select(col("query_id"), col("cand_id"),
          cosine(col("qv"), col("cv")).as("sim")),
      k)
  }

  /** [[rerankExact]] for a candidate set too large to broadcast — the
    * refine stage of the BATCH two-stage search (every corpus vector
    * querying the index at once): the same exact-cosine re-scoring, but
    * the (query_id, cand_id) pairs stream through shuffle joins — on
    * cand_id against the raw corpus, then on query_id for the query
    * vectors — instead of collecting into a broadcast. Each join moves
    * one vector per shortlisted pair, so the exchange is bounded by
    * |queries|·shortlist rows, never corpus², and the bounded per-query
    * aggregator caps the output exchange at |queries|·k. Bit-identical
    * to [[rerankExact]] on the same inputs. */
  def rerankExactShuffled(candidates: DataFrame, corpus: DataFrame,
                          queries: DataFrame, k: Int,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val pairs = candidates.select(col("query_id"), col("cand_id"))
    val q = queries.select(col(idCol).cast(LongType).as("query_id"),
      col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).cast(LongType).as("cand_id"),
      col(vecCol).as("cv"))
    topKPerKey(
      pairs.join(c, Seq("cand_id")).join(q, Seq("query_id"))
        .select(col("query_id"), col("cand_id"),
          cosine(col("qv"), col("cv")).as("sim")),
      k)
  }

  /** Deterministic random hyperplanes: `tables` tables × `bits` planes of
    * dimension `dim`, fixed seed. Materialized as plan-time literals. */
  private[graft] def hyperplanes(dim: Int, bits: Int, tables: Int,
                               seed: Long): Seq[Seq[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** Sign-bit bucket id of a vector under one table's planes —
    * compositional formulation, kept ONLY as the cross-check twin of the
    * fused [[graft.functions.HyperplaneBuckets]] expression (T×B dot
    * expressions fall out of whole-stage codegen and run ~6x slower). */
  private[graft] def bucketId(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = dot(vec, typedLit(p.toSeq))
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** (tbl, bucket) rows for every LSH table — fused single-pass expression
    * + posexplode. */
  private def withBuckets(df: DataFrame, planes: Seq[Seq[Array[Double]]],
                          id: String, v: String): DataFrame =
    df.select(col(id), col(v),
        posexplode(graft.functions.VectorExpressions.hyperplaneBuckets(
          col(v), planes.map(_.map(_.toSeq)))))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")

  /** Approximate cosine top-k via random-hyperplane LSH.
    *
    * Recall/cost dial: more `tables` → higher recall, more candidates;
    * more `bits` → smaller buckets. Exact cosine is computed only on
    * bucket collisions; output shape matches [[bruteForceTopK]] (a query
    * colliding with < k candidates returns fewer rows — by design). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              bits: Int = 8, tables: Int = 8, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(dim, bits, tables, seed)
    val c = withBuckets(corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv")),
      planes, "cand_id", "cv")
    val q = broadcast(withBuckets(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      planes, "query_id", "qv"))
    // Score before dedup: cosine is codegen-cheap, and shuffling
    // (query, cand, sim) triples is ~50x narrower than shuffling vectors;
    // then the bounded aggregator caps shuffle rows at keys*k.
    topKPerKey(
      c.join(q, Seq("tbl", "bucket"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"), cosine(col("qv"), col("cv")).as("sim"))
        .dropDuplicates("query_id", "cand_id"),
      k)
  }

  /** Cross-engine-REPRODUCIBLE LSH bucketing — the auditable twin of
    * [[lshTopK]]'s Gaussian planes: hyperplanes are INTEGER-valued from
    * a closed-form affine hash, and the bucket decision is an exact
    * int64 dot over 1e-6-quantized components — no float summation
    * order anywhere, so any SQL engine replays every bucket bit-for-bit
    * (the same portability contract as [[graft.exec.Sampling]]'s
    * hash-based sampling: a vector's bucket never depends on engine,
    * version, or partitioning). Use it where the bucketing must be
    * auditable or shared across engines (recall accounting, incremental
    * reprocessing); [[lshTopK]]'s fused float path remains the
    * throughput choice. Plane (t, b, j) depends only on its own indices
    * — NOT the table count — so bucketings with more tables strictly
    * extend smaller ones and recall is monotone in `tables` by
    * construction.
    *
    * DIMENSION CAP: the plane key stride fixes vector dimension ≤ 64 —
    * components past index 64 have no plane value and would contribute 0
    * to every dot (silently degraded buckets in BOTH engines, invisible
    * to the oracle gate). A row-level guard therefore REJECTS >64-dim
    * vectors loudly instead of bucketing them wrong; widen the stride
    * (4096/64 in `planeVal`) if a wider corpus ever needs this path.
    * Output: (id, tbl, bucket). */
  def lshBucketsReproducible(df: DataFrame, vecCol: String, idCol: String,
                             bits: Int = 8, tables: Int = 4,
                             seed: Long = 9L): DataFrame = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63]: $bits")
    val m = Sharding.HashMod
    // plane component in [-500, 500]; key strides fix dim ≤ 64
    def planeVal(t: Int, b: Int, j: Int): Long = {
      val k = t.toLong * 4096 + b.toLong * 64 + j
      ((k % m) * Sharding.HashMulA + seed) % m * Sharding.HashMulB % m % 1001 - 500
    }
    val q0 = transform(col(vecCol),
      x => floor(x.cast(DoubleType) * 1000000.0).cast(LongType))
    // dim > 64 would silently zero the tail components (see scaladoc):
    // abort the row instead. raise_error's NullType coerces to the array
    // branch, and the guard rides the same projection as the dot, so
    // column pruning can never drop it while buckets are computed.
    val q = when(size(col(vecCol)) <= 64, q0)
      .otherwise(raise_error(concat(
        lit("lshBucketsReproducible: vector dim "),
        size(col(vecCol)).cast(StringType),
        lit(" exceeds the 64-dim plane stride (components past 64 would " +
          "be silently ignored); widen the planeVal stride"))))
    val buckets: Seq[Column] = (0 until tables).map { t =>
      (0 until bits).map { b =>
        val plane = typedLit((0 until 64).map(j => planeVal(t, b, j)))
        // zip_with null-pads the SHORTER side, so a dim ≠ 64 vector
        // would otherwise poison the whole dot to NULL (every bucket 0
        // — a silent cross join) while a SQL replay's NULL-skipping sum
        // computed the true bits. coalesce makes both sides agree:
        // dims past min(dim, 64) contribute zero everywhere.
        val d = aggregate(
          zip_with(q, plane, (a, p) => coalesce(a * p, lit(0L))),
          lit(0L), (acc, x) => acc + x)
        when(d >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    df.select(col(idCol).as("id"), posexplode(array(buckets: _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
  }

  /** IVF (inverted-file) approximate nearest neighbors: the corpus is
    * partitioned into Voronoi cells of a small centroid set (the coarse
    * quantizer); each query searches only its `nprobe` nearest cells.
    *
    * Scale shape (the 100 TB path): the centroid set is driver-sized by
    * construction (classic IVF keeps the coarse quantizer in memory — even
    * 65k × dim-64 floats is ~16 MB), so cell assignment is a pure map-side
    * projection (C fused cosines per row, no shuffle), probe selection is
    * the same expression on the query side, and candidate generation is a
    * broadcast join on the cell id — the corpus is scanned once and never
    * shuffled; only the bounded per-query top-k aggregation exchanges rows.
    *
    * Fully deterministic given a deterministic centroid set (ties broken by
    * centroid id), so unlike random-hyperplane LSH it is exactly
    * oracle-checkable. Output shape matches [[bruteForceTopK]]. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val cents = centroids.select(col(idCol).cast(LongType), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1).toSeq
    ivfTopKWith(corpus, queries, cents, k, nprobe, idCol, vecCol)
  }

  /** [[ivfTopK]] with a driver-resident coarse quantizer — the shape a
    * TRAINED quantizer arrives in (see [[kmeansCentroids]]): classic IVF
    * keeps the centroid matrix in memory, so composing train → index →
    * search never writes centroids to a table. */
  /** (sim, cid) structs compare lexicographically: max sim, ties to the
    * larger centroid id — mirrored in the oracle's ORDER BY sim DESC,
    * cid DESC. All C cosines come from one fused expression pass
    * (CentroidCosines, bit-equal to C compositional cosine expressions
    * but codegen-budget-safe). */
  private def centroidSimArr(v: Column,
                             cents: Seq[(Long, Seq[Double])]): Column =
    zip_with(
      graft.functions.VectorExpressions.centroidCosines(v, cents.map(_._2)),
      typedLit(cents.map(_._1)), (s, c) => struct(s.as("sim"), c.as("cid")))

  /** One assignment pass against a fixed quantizer: every vector with
    * its nearest cell — `(cell, id, v)`, the corpus side of IVF search
    * and the stored frame of [[SimilarityIndex]]. */
  private[ext] def assignCells(df: DataFrame, vecCol: String, idCol: String,
                               cents: Seq[(Long, Seq[Double])]): DataFrame = {
    require(cents.nonEmpty, "centroid set must be non-empty")
    df.select(
      array_max(centroidSimArr(col(vecCol), cents)).getField("cid").as("cell"),
      col(idCol).as("id"), col(vecCol).as("v"))
  }

  /** The `nprobe` nearest cells per query — `(cell, query_id, qv)`, the
    * probe side of IVF search. */
  private[ext] def probeCells(df: DataFrame, vecCol: String, idCol: String,
                              cents: Seq[(Long, Seq[Double])],
                              nprobe: Int): DataFrame = {
    require(cents.nonEmpty, "centroid set must be non-empty")
    df.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(transform(
        slice(reverse(array_sort(centroidSimArr(col(vecCol), cents))),
          1, nprobe),
        s => s.getField("cid"))).as("cell"))
  }

  /** The IVF search tail shared by the ad-hoc path and the standing
    * index: score each (query, cell) probe against the cell's vectors,
    * bounded top-k per query. `assigned` = (cell, id, v) corpus rows,
    * `probes` = (cell, query_id, qv). Each corpus vector lives in
    * exactly one cell and (query, cell) probes are distinct, so
    * candidates need no dedup. One implementation so the index-backed
    * results stay bit-identical to the ad-hoc ones (q_sim_ivf_idx
    * shares q_sim_ivf_trained's oracle on that guarantee). */
  private[ext] def searchCells(assigned: DataFrame, probes: DataFrame,
                               k: Int): DataFrame =
    topKPerKey(
      assigned.select(col("cell"), col("id").as("cand_id"), col("v").as("cv"))
        .join(broadcast(probes), Seq("cell"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          cosine(col("qv"), col("cv")).as("sim")),
      k)

  /** [[searchCells]] for a probe side too large to broadcast — the BATCH
    * probe shape (the whole corpus querying the index at once): the same
    * cell equi-join and scoring arithmetic, but the join is left to the
    * planner as a shuffle join, so the probe frame streams through the
    * exchange instead of collecting to the driver. AQE's skew-join
    * splitting handles hot cells. Output is bit-identical to
    * [[searchCells]] on the same inputs (same keys, same cosine
    * expression, same bounded per-query aggregator). */
  private[ext] def searchCellsShuffled(assigned: DataFrame, probes: DataFrame,
                                       k: Int): DataFrame =
    topKPerKey(
      assigned.select(col("cell"), col("id").as("cand_id"), col("v").as("cv"))
        .join(probes, Seq("cell"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          cosine(col("qv"), col("cv")).as("sim")),
      k)

  def ivfTopKWith(corpus: DataFrame, queries: DataFrame,
                  cents: Seq[(Long, Seq[Double])], k: Int, nprobe: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    searchCells(assignCells(corpus, vecCol, idCol, cents),
      probeCells(queries, vecCol, idCol, cents, nprobe), k)

  /** Lloyd's k-means over an embedding column — the trained-coarse-
    * quantizer companion to [[ivfTopK]]'s fixed centroid set, and the
    * canonical driver-coordinated iterative algorithm: per iteration, ONE
    * distributed assignment pass (fused [[graft.functions.VectorExpressions
    * .centroidCosines]], cosine similarity, ties to the larger cluster id)
    * and ONE per-(cluster, dim) mean aggregation; only the k×dim centroid
    * matrix ever reaches the driver.
    *
    * Fully deterministic, hence oracle-checkable: seeding is the first k
    * vectors by id, and centroid means run over 1e-6-quantized components
    * (exact integer sums — float sums are order-dependent and fractional
    * decimal casts are not cross-engine-stable; the quantized mean is the
    * same number everywhere). Clusters that lose all members drop out.
    * Output: (idCol, cluster) after `iters` update rounds. */
  def kmeans(df: DataFrame, vecCol: String, idCol: String,
             k: Int, iters: Int): DataFrame = {
    val (clusterIds, centroids) = kmeansCentroids(df, vecCol, idCol, k, iters)
    kmeansAssign(df, vecCol, idCol, clusterIds, centroids)
      .select(col("id").as(idCol), col("cluster"))
  }

  /** One assignment pass against a fixed centroid set (cosine, ties to the
    * larger cluster id). Output: (id, v, cluster). */
  private def kmeansAssign(df: DataFrame, vecCol: String, idCol: String,
                           clusterIds: Seq[Long],
                           centroids: Seq[Seq[Double]]): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val cids = typedLit(clusterIds)
    df.select(col(idCol).cast(LongType).as("id"), col(vecCol).as("v"),
      array_max(zip_with(
        graft.functions.VectorExpressions.centroidCosines(col(vecCol), centroids),
        cids, (s, c) => struct(s.as("sim"), c.as("cid"))))
        .getField("cid").as("cluster"))
  }

  /** The trained coarse quantizer itself: cluster ids + centroid vectors
    * after `iters` Lloyd rounds (see [[kmeans]] for the determinism
    * contract). Only the k×dim matrix reaches the driver. */
  def kmeansCentroids(df: DataFrame, vecCol: String, idCol: String,
                      k: Int, iters: Int): (Seq[Long], Seq[Seq[Double]]) = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    var centroids: Seq[Seq[Double]] = df.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast(LongType), col(vecCol)).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    var clusterIds: Seq[Long] = centroids.indices.map(_.toLong)

    for (_ <- 1 to iters) {
      val means = kmeansAssign(df, vecCol, idCol, clusterIds, centroids)
        .select(col("cluster"), posexplode(transform(col("v"),
          x => floor(x.cast(DoubleType) * 1000000.0).cast(LongType))))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("col").cast(DecimalType(38, 0))).cast(DoubleType).as("s"),
          count(lit(1)).cast(DoubleType).as("n"))
        .select(col("cluster"), col("pos"), (col("s") / (col("n") * 1000000.0)).as("m"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val byCluster = means.groupBy(_._1).toSeq.sortBy(_._1)
      clusterIds = byCluster.map(_._1)
      centroids = byCluster.map(_._2.sortBy(_._2).map(_._3).toSeq)
    }
    (clusterIds, centroids)
  }

  /** SemDeDup-style semantic deduplication: k-means-cluster the embedding
    * space (the deterministic [[kmeans]]), then search near-duplicates
    * ONLY within each cluster — the published recipe for billion-scale
    * embedding dedup. The quadratic pair search is bounded by the cluster
    * size, which `k` dials (at scale pick k ≈ corpus / target-cluster-
    * size; clusters process embarrassingly parallel, and the cluster join
    * is one shuffle on the cluster id). A row is dropped when ANY
    * smaller-id row of its cluster has cosine ≥ `threshold` — including
    * a smaller-id row that is itself dropped, so the rule is one
    * set-oriented pass with no iteration. (This is slightly MORE
    * aggressive than a sequential keep-first scan, which compares each
    * row only against previously KEPT rows: in a chain 1~2, 2~3, 1≁3
    * the scan keeps {1, 3} while this rule keeps {1} — the set-oriented
    * form is what stays join-shaped at scale, and near-dup chains are
    * transitively similar in practice.) Output: every input row as
    * (idCol, cluster, keep). */
  def semDedup(df: DataFrame, vecCol: String, idCol: String,
               k: Int, iters: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val assign = kmeans(df, vecCol, idCol, k, iters)
    val withV = df
      .select(col(idCol).cast(LongType).as("id"), col(vecCol).as("__v"))
      .join(assign.select(col(idCol).cast(LongType).as("id"), col("cluster")),
        Seq("id"))
    val a = withV.select(col("cluster"), col("id").as("id_a"),
      col("__v").as("__va"))
    val b = withV.select(col("cluster"), col("id").as("id_b"),
      col("__v").as("__vb"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b") &&
        cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("id_b").as("id")).distinct()
    withV.select(col("id"), col("cluster"))
      .join(dropped.withColumn("__d", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        col("__d").isNull.as("keep"))
  }

  /** L2-normalize an embedding column to unit length (double output).
    * The norm is aliased in its own projection first — CollapseProject
    * keeps multi-use non-cheap aliases un-inlined, so it is computed once
    * per row instead of once per element inside the interpreted HOF. */
  def l2Normalize(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("__norm", norm(col(vecCol)))
      .withColumn(outCol,
        transform(col(vecCol), x => x.cast(DoubleType) / col("__norm")))
      .drop("__norm")

  /** Symmetric int8 quantization: scale = 127 / max(|x|), q = floor(x *
    * scale) clamped to [-127, 127]. floor (not round) because both SQL
    * engines define it identically; the scale rides along for dequant. */
  def quantizeInt8(df: DataFrame, vecCol: String, outCol: String,
                   scaleCol: String = "q_scale"): DataFrame =
    df.withColumn("__absmax",
        greatest(array_max(col(vecCol)).cast(DoubleType),
          -array_min(col(vecCol)).cast(DoubleType)))
      .withColumn(scaleCol,
        when(col("__absmax") > 0, lit(127.0) / col("__absmax")).otherwise(lit(1.0)))
      .withColumn(outCol,
        transform(col(vecCol), x =>
          greatest(least(floor(x.cast(DoubleType) * col(scaleCol)), lit(127.0)),
            lit(-127.0)).cast(IntegerType)))
      .drop("__absmax")

  /** Embedding-space near-duplicate pairs: cosine ≥ threshold, found via
    * LSH collisions (any shared bucket), verified exactly. */
  def embeddingNearDupPairs(df: DataFrame, threshold: Double, dim: Int,
                            bits: Int = 8, tables: Int = 8, seed: Long = 42L,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(dim, bits, tables, seed)
    val withB = withBuckets(df.select(col(idCol).as("id"), col(vecCol).as("v")),
      planes, "id", "v")
    val a = withB.select(col("tbl"), col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withB.select(col("tbl"), col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    // Score + threshold-filter before the pair dedup: the codegen'd cosine
    // is cheaper than shuffling both vectors per candidate pair, and
    // duplicates of a passing pair all carry the identical sim.
    a.join(b, Seq("tbl", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("sim"))
      .filter(col("sim") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }
}
