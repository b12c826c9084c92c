package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Exact Jaccard similarity of two array<string> columns treated as sets,
  * in one hash-set pass — native twin of TextOps.jaccard
  * (size(array_intersect)/size(array_union)), whose interpreted pairwise
  * string comparisons dominate candidate verification on ~10^5 pairs.
  * Identical result: integer set sizes, one double division (empty union →
  * 0.0). */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_sim expects (array<string>, array<string>), got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    // hash UTF8String directly — decoding to java.lang.String allocated +
    // UTF-16-decoded every element of every pair, and on a blocked
    // all-pairs pass (~10^6 pairs × ~10^2 shingles) that allocation WAS
    // the operator (UTF8String.equals/hashCode are byte-wise, so set
    // semantics are identical)
    val sa = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < a.numElements()) { sa.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    val sb = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    i = 0
    while (i < b.numElements()) {
      val s = b.getUTF8String(i)
      if (sb.add(s) && sa.contains(s)) inter += 1
      i += 1
    }
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayJaccard =
    copy(left = newLeft, right = newRight)
}
