// The expression lives under org.apache.spark.sql.* because the pieces a
// native codegen expression needs (`AbstractDataType` for ExpectsInputTypes,
// `ExpressionUtils.column` to wrap an Expression into a public Column) are
// private[sql]. This is the established pattern for external Spark
// expression libraries; no Spark internals are modified.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native codegen dot product over two `array<double>` columns.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: higher-order
  * functions evaluate interpreted (one closure call + boxed lambda variable
  * per element) and allocate an intermediate array per row. Inside an
  * all-pairs similarity join the dot product runs |A|·|B| times, and the
  * interpreted form was the bench bottleneck (~40 s for 2M pairs × 64 dims
  * at sf0.1). This expression generates a tight primitive loop inside
  * whole-stage codegen: same left-to-right IEEE summation order as the HOF
  * form AND DuckDB's `list_reduce`, so oracle results stay bit-identical.
  *
  * Null contract: null input array → null (BinaryExpression default); null
  * ELEMENTS contribute 0.0 (embedding vectors are non-null by schema).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All random-hyperplane LSH table buckets for one vector, in one pass.
  *
  * The declarative form — `tables × bits` separate `when(dot(v, plane) > 0)`
  * expressions, each with a `bits·dim`-literal array — builds a ~5000-leaf
  * expression tree whose generated method overflows codegen limits and
  * re-materializes every plane per row. This expression holds the plane
  * matrix once as a reference object and emits `array<long>` of one
  * sign-bucket per table via a tight FMA loop.
  *
  * Bucket bit j of table t = [v · planes(t·bits + j) > 0] — identical
  * semantics (and values) to the composed form.
  */
case class LshTableBuckets(
    child: Expression,
    planes: IndexedSeq[IndexedSeq[Double]],
    bitsPerTable: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  require(planes.nonEmpty && planes.length % bitsPerTable == 0,
    "planes must split evenly into tables of bitsPerTable")
  private val numTables = planes.length / bitsPerTable
  @transient private lazy val planeMatrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var b = 0
      while (b < bitsPerTable) {
        val p = planeMatrix(t * bitsPerTable + b)
        val n = math.min(dim, p.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += x.getDouble(i) * p(i); i += 1 }
        if (s > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planeMatrix, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val bucket = ctx.freshName("bucket")
      s"""
         |long[] $out = new long[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $bitsPerTable; $b++) {
         |    double[] $p = $planesRef[$t * $bitsPerTable + $b];
         |    int $n = java.lang.Math.min($v.numElements(), $p.length);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $s += $v.getDouble($i) * $p[$i]; }
         |    if ($s > 0) $bucket |= (1L << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nprobe` nearest centroids (by squared L2 distance, centroid-id
  * tie-break ascending) for one vector, as `array<int>` of centroid ids
  * ordered nearest-first.
  *
  * Replaces the crossJoin(broadcast(centroids)) + row_number() window
  * argmin that materialized rows × nlist through a shuffle just to take a
  * per-row minimum: the centroid matrix (nlist ≤ a few thousand rows —
  * driver-bounded by construction, never data-scale) rides along as a
  * codegen reference object and each row pays one tight FMA loop, zero
  * shuffle, zero row blow-up. With nprobe=1 this is plain argmin (the IVF
  * list assignment); probes use nprobe>1 and explode the result.
  *
  * Score per centroid c: |c|² − 2·v·c (the row's own |v|² is constant
  * across centroids, so dropped — same ordering as full L2 distance).
  */
case class NearestCentroids(
    child: Expression,
    centers: IndexedSeq[IndexedSeq[Double]],
    nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  require(centers.nonEmpty && nprobe >= 1,
    "need at least one centroid and nprobe >= 1")
  private val numCenters = centers.length
  private val take = math.min(nprobe, numCenters)
  @transient private lazy val centerMatrix: Array[Array[Double]] =
    centers.map(_.toArray).toArray
  @transient private lazy val cnorm2: Array[Double] =
    centerMatrix.map(c => c.map(x => x * x).sum)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val bestScore = new Array[Double](take)
    val bestId = new Array[Int](take)
    var filled = 0
    var c = 0
    while (c < numCenters) {
      val p = centerMatrix(c)
      val n = math.min(dim, p.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += x.getDouble(i) * p(i); i += 1 }
      val s = cnorm2(c) - 2.0 * d
      // Insertion keeps (score asc, cid asc): strictly-less shifts, so an
      // equal score never displaces an earlier (smaller) centroid id.
      if (filled < take || s < bestScore(filled - 1)) {
        var j = math.min(filled, take - 1)
        while (j > 0 && s < bestScore(j - 1)) {
          bestScore(j) = bestScore(j - 1); bestId(j) = bestId(j - 1); j -= 1
        }
        bestScore(j) = s; bestId(j) = c
        if (filled < take) filled += 1
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(bestId, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centersRef = ctx.addReferenceObj("centers", centerMatrix, "double[][]")
    val cnorm2Ref = ctx.addReferenceObj("cnorm2", cnorm2, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      val bestScore = ctx.freshName("bestScore")
      val bestId = ctx.freshName("bestId")
      val filled = ctx.freshName("filled")
      s"""
         |double[] $bestScore = new double[$take];
         |int[] $bestId = new int[$take];
         |int $filled = 0;
         |for (int $c = 0; $c < $numCenters; $c++) {
         |  double[] $p = $centersRef[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $p.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $d += $v.getDouble($i) * $p[$i]; }
         |  double $s = $cnorm2Ref[$c] - 2.0 * $d;
         |  if ($filled < $take || $s < $bestScore[$filled - 1]) {
         |    int $j = java.lang.Math.min($filled, $take - 1);
         |    while ($j > 0 && $s < $bestScore[$j - 1]) {
         |      $bestScore[$j] = $bestScore[$j - 1]; $bestId[$j] = $bestId[$j - 1]; $j--;
         |    }
         |    $bestScore[$j] = $s; $bestId[$j] = $c;
         |    if ($filled < $take) $filled++;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  java.util.Arrays.copyOf($bestId, $filled));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Public wrappers (importable without touching Spark-internal packages). */
object VectorFunctions {

  /** Codegen'd dot product; see [[DotProduct]]. */
  def dotNative(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def normNative(a: Column): Column = sqrt(dotNative(a, a))

  /** All LSH table sign-buckets for a vector; see [[LshTableBuckets]]. */
  def lshTableBuckets(v: Column, planes: Seq[Seq[Double]], bitsPerTable: Int): Column =
    ExpressionUtils.column(LshTableBuckets(
      ExpressionUtils.expression(v),
      planes.map(_.toIndexedSeq).toIndexedSeq, bitsPerTable))

  /** The nprobe nearest centroid ids, nearest-first; see [[NearestCentroids]]. */
  def nearestCentroids(v: Column, centers: Seq[Seq[Double]], nprobe: Int): Column =
    ExpressionUtils.column(NearestCentroids(
      ExpressionUtils.expression(v),
      centers.map(_.toIndexedSeq).toIndexedSeq, nprobe))
}
