package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Custom codegen'd Catalyst expressions for the embedding hot path.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * evaluated *interpreted* — no whole-stage codegen — which measured ~10µs
  * per 64-dim cosine. Candidate-pair similarity evaluates millions of
  * cosines, so this is exactly the case where the task guidance says to
  * drop down to a custom `Expression` with `doGenCode`: a tight primitive
  * loop, no boxing, inside the generated stage.
  *
  * Semantics match the HOF version bit-for-bit: left-to-right accumulation
  * in double, null if either array is null, lengths differ, or any element
  * is null (zip_with's null-padding semantics). */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemGetter(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _)  => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case other => throw new IllegalArgumentException(
      s"vector expression needs ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
  }

  protected def elemAt(a: ArrayData, i: Int, e: Expression): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case _          => throw new IllegalStateException("unreachable")
    }

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
}

/** cosine(a, b) = dot / (|a| * |b|), fused single pass. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = elemAt(x, i, left); val yv = elemAt(y, i, right)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val gx = elemGetter(left); val gy = elemGetter(right)
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $a.$gx($i);
         |    double $yv = (double) $b.$gy($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** dot(a, b), single pass. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += elemAt(x, i, left) * elemAt(y, i, right)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val gx = elemGetter(left); val gy = elemGetter(right)
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += ((double) $a.$gx($i)) * ((double) $b.$gy($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** All random-hyperplane LSH bucket ids of a vector in ONE pass: for each
  * of the T tables, the sign bits of the vector against that table's B
  * planes, packed into a long. Returns ARRAY<BIGINT> of length T.
  *
  * Exists because the compositional formulation — T×B `DotProduct`
  * expressions wrapped in when/shiftleft/bitwiseOR inside an
  * explode(array(struct(...))) — produces an expression tree so large that
  * it falls out of whole-stage codegen and evaluates interpreted, measured
  * ~6x slower end-to-end. One tight primitive loop per row replaces T×B
  * expression evaluations; planes ride along as a plan-time constant
  * (driver-sized by construction, like the IVF coarse quantizer).
  * Null vector → null; a null element makes that table's bucket use only
  * the sign of the accumulated non-null terms — fixture vectors have no
  * null elements, and both engines of every LSH consumer share this code. */
case class HyperplaneBuckets(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.flatten.toArray).toArray // per table: B*dim flattened
  @transient private lazy val bitsPerTable: Int = planes.head.length
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](mat.length)
    var t = 0
    while (t < mat.length) {
      val tp = mat(t)
      var bucket = 0L
      var b = 0
      while (b < bitsPerTable) {
        var dot = 0.0
        val off = b * n
        var i = 0
        while (i < n) {
          if (!x.isNullAt(i)) {
            val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
            dot += xv * tp(off + i)
          }
          i += 1
        }
        if (dot >= 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // Same loop as nullSafeEval, emitted INTO the generated stage; the
  // plan-time plane matrix rides as a referenced double[][] constant, so
  // the per-row cost is the arithmetic alone — no virtual eval() call,
  // no interpreted-expression row boundary.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val matRef = ctx.addReferenceObj("planesMat", mat, "double[][]")
      val get = if (isFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val tp = ctx.freshName("tp")
      val bucket = ctx.freshName("bucket"); val b = ctx.freshName("b")
      val dot = ctx.freshName("dot"); val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      s"""
         |int $n = $v.numElements();
         |long[] $out = new long[${mat.length}];
         |for (int $t = 0; $t < ${mat.length}; $t++) {
         |  double[] $tp = $matRef[$t];
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $bitsPerTable; $b++) {
         |    double $dot = 0.0;
         |    int $off = $b * $n;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$v.isNullAt($i)) {
         |        $dot += ((double) $v.$get($i)) * $tp[$off + $i];
         |      }
         |    }
         |    if ($dot >= 0) $bucket |= 1L << $b;
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Cosine similarity of a vector against EVERY centroid of a driver-sized
  * codebook in one pass — ARRAY<DOUBLE>, one sim per centroid, in codebook
  * order. Same motivation as [[HyperplaneBuckets]]: C compositional
  * `CosineSimilarity` expressions per row blow the codegen budget and run
  * interpreted. Per-centroid arithmetic is identical to
  * [[CosineSimilarity]] (left-to-right double accumulation), so results
  * are bit-equal to the compositional form. Null vector → null. */
case class CentroidCosines(child: Expression, centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val mat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](mat.length)
    var c = 0
    while (c < mat.length) {
      val cv = mat(c)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n && i < cv.length) {
        if (!x.isNullAt(i)) {
          val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
          dot += xv * cv(i); na += xv * xv; nb += cv(i) * cv(i)
        }
        i += 1
      }
      out(c) = dot / (math.sqrt(na) * math.sqrt(nb))
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // Mirror of nullSafeEval inside whole-stage codegen; the codebook is a
  // referenced double[][] constant. Per-centroid arithmetic stays
  // left-to-right double accumulation, bit-equal to the interpreted path.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val matRef = ctx.addReferenceObj("centroidMat", mat, "double[][]")
      val get = if (isFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val c = ctx.freshName("c"); val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      s"""
         |int $n = $v.numElements();
         |double[] $out = new double[${mat.length}];
         |for (int $c = 0; $c < ${mat.length}; $c++) {
         |  double[] $cv = $matRef[$c];
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n && $i < $cv.length; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      double $xv = (double) $v.$get($i);
         |      $dot += $xv * $cv[$i]; $na += $xv * $xv;
         |      $nb += $cv[$i] * $cv[$i];
         |    }
         |  }
         |  $out[$c] = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** SQ8 reconstruction `v̂_i = mn + sc · code_i` in ONE primitive loop —
  * ARRAY<DOUBLE> from the per-vector (min, scale) and the stored codes.
  * Accepts the byte-packed storage form directly (ARRAY<TINYINT>, codes
  * shifted by -128) as well as the raw 0..255 ARRAY<INT> codes, fusing
  * the unpack. Exists because the HOF formulation
  * (`transform(transform(qb, +128), mn + sc * _)`) evaluates interpreted
  * per CANDIDATE PAIR once Catalyst collapses the projection into the
  * scoring join — measured ~6x on the brute SQ8 query. Arithmetic is
  * bit-identical to the composed transforms (integer code promotes to
  * double exactly, one multiply-add per element); a null element makes
  * the whole result null, which downstream [[CosineSimilarity]] maps to
  * the same null the composed form produced. */
case class Sq8Reconstruct(first: Expression, second: Expression,
                          third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val isByte: Boolean =
    third.dataType.asInstanceOf[ArrayType].elementType == ByteType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, DoubleType, ArrayType(ByteType | IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (f, s, t) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected (DOUBLE, DOUBLE, ARRAY<TINYINT|INT>), got " +
            s"${f.simpleString} / ${s.simpleString} / ${t.simpleString}")
    }

  override def nullSafeEval(mn: Any, sc: Any, codes: Any): Any = {
    val m = mn.asInstanceOf[Double]
    val s = sc.asInstanceOf[Double]
    val q = codes.asInstanceOf[ArrayData]
    val n = q.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (q.isNullAt(i)) return null
      val code = if (isByte) q.getByte(i).toInt + 128 else q.getInt(i)
      out(i) = m + s * code
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // The same unpack-and-FMA loop inside the generated stage: one
  // multiply-add per element straight off the ArrayData, byte codes
  // unshifted inline. Null elements flip the expression null exactly as
  // the interpreted path does.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, s, q) => {
      val codeOf =
        if (isByte) (i: String) => s"((int) $q.getByte($i)) + 128"
        else (i: String) => s"$q.getInt($i)"
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $q.numElements();
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($q.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $out[$i] = $m + $s * (${codeOf(i)});
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** SQ8 quantization of one vector in two primitive passes:
  * `mn = min(v)`, `sc = (max(v) - mn) / 255`,
  * `q_i = clamp_0..255(floor((v_i - mn) / sc + 0.5))` (all zeros when
  * sc = 0) — STRUCT(mn DOUBLE, sc DOUBLE, q ARRAY<INT>). The fused twin
  * of the HOF formulation (array_min/array_max + transform), which
  * evaluates interpreted per candidate pair once Catalyst collapses the
  * corpus projection into the scoring join. Arithmetic is bit-identical:
  * floats widen to double before min/max exactly as the composed casts
  * do, floor(x+0.5) runs in double, and the int cast of the bounded
  * [0, 255] floor result is exact. A null vector — or a null element,
  * which the codec never produces — yields null. Non-finite elements
  * (NaN/±Inf) also yield null: the HOF twin and the DuckDB oracle
  * disagree with each other on NaN ordering (NaN sorts greatest in
  * Spark's least/greatest, propagates in DuckDB's list_min/list_max),
  * so the fused path refuses rather than silently diverging. */
case class Sq8Quantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("mn", DoubleType, nullable = false),
    StructField("sc", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      if (java.lang.Double.isNaN(xv) || java.lang.Double.isInfinite(xv))
        return null
      if (xv < mn) mn = xv
      if (xv > mx) mx = xv
      i += 1
    }
    val sc = (mx - mn) / 255.0
    val q = new Array[Int](n)
    if (sc != 0.0) {
      i = 0
      while (i < n) {
        val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val f = math.floor((xv - mn) / sc + 0.5).toInt
        q(i) = math.min(255, math.max(0, f))
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(mn, sc,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(q))
  }

  // Two primitive passes in the generated stage, identical arithmetic to
  // nullSafeEval (min/max in double, floor(x+0.5), bounded int cast);
  // null or non-finite elements flip the expression null before any
  // allocation beyond the code array.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx"); val sc = ctx.freshName("sc")
      val q = ctx.freshName("q"); val i = ctx.freshName("i")
      val xv = ctx.freshName("xv"); val f = ctx.freshName("f")
      s"""
         |int $n = $v.numElements();
         |double $mn = Double.POSITIVE_INFINITY;
         |double $mx = Double.NEGATIVE_INFINITY;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xv = (double) $v.$get($i);
         |  if (Double.isNaN($xv) || Double.isInfinite($xv)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  if ($xv < $mn) $mn = $xv;
         |  if ($xv > $mx) $mx = $xv;
         |}
         |if (!${ev.isNull}) {
         |  double $sc = ($mx - $mn) / 255.0;
         |  int[] $q = new int[$n];
         |  if ($sc != 0.0) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $xv = (double) $v.$get($i);
         |      int $f = (int) java.lang.Math.floor(($xv - $mn) / $sc + 0.5);
         |      $q[$i] = java.lang.Math.min(255, java.lang.Math.max(0, $f));
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[] { java.lang.Double.valueOf($mn),
         |        java.lang.Double.valueOf($sc),
         |        new org.apache.spark.sql.catalyst.util.GenericArrayData($q) });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorExpressions {
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def hyperplaneBuckets(v: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(HyperplaneBuckets(
      GraftColumnBridge.expression(v), planes))

  def centroidCosines(v: Column, centroids: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(CentroidCosines(
      GraftColumnBridge.expression(v), centroids))

  def sq8Reconstruct(mn: Column, sc: Column, codes: Column): Column =
    GraftColumnBridge.column(Sq8Reconstruct(
      GraftColumnBridge.expression(mn), GraftColumnBridge.expression(sc),
      GraftColumnBridge.expression(codes)))

  def sq8Quantize(v: Column): Column =
    GraftColumnBridge.column(Sq8Quantize(GraftColumnBridge.expression(v)))
}
