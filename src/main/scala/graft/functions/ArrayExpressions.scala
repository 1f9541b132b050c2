// Hosted under org.apache.spark.sql.* for the same reason as
// VectorExpressions.scala: ExpectsInputTypes/ExpressionUtils are
// private[sql]. No Spark internals are modified.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| for two SORTED string arrays, as a single merge walk.
  *
  * `size(array_intersect(a, b))` builds a hash set per row and allocates the
  * intersection array just to take its length; inside a near-dup verify join
  * that runs once per candidate pair (millions of rows), those per-row
  * allocations dominated the bench. Sorted inputs (we always produce token
  * sets with `array_sort(array_distinct(...))`) admit an allocation-free
  * two-pointer walk, here generated into whole-stage codegen.
  *
  * Contract: BOTH inputs must be sorted ascending and duplicate-free —
  * callers own this (Dedup.tokenSet guarantees it). Null elements are not
  * expected (regexp_extract_all never yields them) and are skipped.
  * Combined with |A ∪ B| = |A| + |B| − |A ∩ B| this makes exact Jaccard one
  * walk per pair instead of two hash-set builds.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($c == 0) { $n++; $i++; $j++; }
         |    else if ($c < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayFunctions {

  /** Codegen'd |A ∩ B| for sorted, distinct string arrays. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SortedIntersectSize(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
