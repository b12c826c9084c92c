package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT word k-shingles of a (normalized, single-spaced) string in one
  * JVM pass — native twin of `array_distinct(TextOps.wordShingles(text, k))`
  * whose interpreted slice/concat_ws per position was the residual cost of
  * the MinHash pipeline at sf0.1 (the shingle subtree is evaluated three
  * times: banding + both sides of the candidate join). Same shingles, same
  * first-occurrence order: texts shorter than k words yield their single
  * full window. */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles expects (string, int), got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(textAny: Any, kAny: Any): Any = {
    val words = textAny.asInstanceOf[UTF8String].toString.split(" ", -1)
    val k = kAny.asInstanceOf[Int]
    val out = new java.util.LinkedHashSet[String]()
    if (words.length <= k) {
      out.add(words.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      val end = words.length - k
      while (i <= end) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}
