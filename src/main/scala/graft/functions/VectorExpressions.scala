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
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

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
}
