package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Feature-hashing embedder in ONE JVM pass — native twin of the
  * declarative form in `llm_hash_embed` (word → (xxhash64 mod D,
  * ±1 sign) pairs folded into a dense unit vector): the higher-order
  * `aggregate(transform(...))` formulation costs O(words × D) per row
  * because each accumulate step rebuilds the D-array; this expression is
  * O(words + D). Returns struct(norm double, emb array<double>).
  *
  * BIT-EXACT parity contract (pinned in CorpusOpsSpec): hashes are the
  * same XXH64 composition Spark's `xxhash64(w, lit(seed))` evaluates —
  * word bytes at seed 42, then the int literal folded on top — and the
  * arithmetic is ±1.0 accumulation (exact in double), the same
  * index-order norm fold, and the same per-element division. */
case class HashEmbed(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("norm", DoubleType, nullable = false),
    StructField("emb", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hash_embed expects (string, int dims), got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(textAny: Any, dimsAny: Any): Any = {
    val d = dimsAny.asInstanceOf[Int]
    // SQL-reachable (registered via GraftExtensions): a bad dims must
    // fail with a named error, not a raw / by zero inside a task
    require(d > 0, s"hash_embed dims must be positive, got $d")
    val words = textAny.asInstanceOf[UTF8String].toString.split(" ", -1)
    val raw = new Array[Double](d)
    var i = 0
    while (i < words.length) {
      val wb = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // xxhash64(w, lit(s)) = hashInt(s, hashBytes(w, 42)) — Spark's
      // sequential child fold
      val hw = XXH64.hashUnsafeBytes(wb, Platform.BYTE_ARRAY_OFFSET, wb.length, 42L)
      val dim = (((XXH64.hashInt(1, hw) % d) + d) % d).toInt
      val sign = (((XXH64.hashInt(2, hw) % 2) + 2) % 2) * 2 - 1
      raw(dim) += sign.toDouble
      i += 1
    }
    var norm2 = 0.0
    var j = 0
    while (j < d) { norm2 += raw(j) * raw(j); j += 1 }
    val norm = math.sqrt(norm2)
    val emb = if (norm == 0.0) raw else {
      val e = new Array[Double](d)
      var k = 0
      while (k < d) { e(k) = raw(k) / norm; k += 1 }
      e
    }
    InternalRow(norm, new GenericArrayData(emb))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashEmbed =
    copy(left = newLeft, right = newRight)
}
