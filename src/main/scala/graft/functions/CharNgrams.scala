package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT character n-grams of a string in one pass (first-occurrence
  * order). Replaces `array_distinct(transform(sequence(...), i ->
  * substr(text, i, n)))`, whose interpreted substr-per-position plus an
  * O(len²) string-equality array_distinct dominated llm_lang_id at sf0.1
  * (16 s for 5k docs → sub-second here). Semantics identical: same grams,
  * same order.
  *
  * Works on code points via java.lang.String to stay correct for
  * multi-byte UTF-8 (chars here ≈ UTF-16 units, consistent and
  * deterministic for any input).
  *
  * r18 allocation-path note (text kernels are allocation-bound — the r17
  * widening A/B): ASCII inputs with n ≤ 8 — the llm_lang_id trigram shape
  * — now run a BYTE fast path: for pure-ASCII text, UTF-16 units ARE the
  * bytes, so every n-gram is an n-byte slice; the n bytes pack into one
  * long, so the distinct filter is an open-addressed long table with NO
  * string hashing or equality walks, and each emitted gram is a zero-copy
  * `UTF8String.fromBytes` view of one defensive input copy. Non-ASCII or
  * n > 8 inputs take [[slowEval]] — the previous implementation verbatim,
  * so results are bit-identical for every input (NativeExprSpec). */
case class CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngrams expects (string, int), got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(textAny: Any, nAny: Any): Any = {
    val u = textAny.asInstanceOf[UTF8String]
    val n = nAny.asInstanceOf[Int]
    if (n < 1 || n > 8) return slowEval(u, n)
    // getBytes copies whenever the string aliases a shared buffer slice,
    // so the gram views below stay stable.
    val bytes = u.getBytes
    val len = bytes.length
    var i = 0
    while (i < len) {
      if (bytes(i) < 0) return slowEval(u, n) // non-ASCII: bytes ≠ chars
      i += 1
    }
    if (len < n) {
      if (len == 0) return new GenericArrayData(new Array[Any](0))
      return new GenericArrayData(Array[Any](UTF8String.fromBytes(bytes, 0, len)))
    }
    val ng = len - n + 1
    // distinct filter: n ≤ 8 ASCII bytes pack into one long — an EXACT
    // key (no hash collisions to verify). Open addressing, keys offset by
    // +1 so 0 stays the empty slot (packed keys of ASCII bytes with the
    // +1 are never 0).
    var cap = 8
    while (cap < ng * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val outOff = new Array[Int](ng)
    var outN = 0
    i = 0
    while (i < ng) {
      var key = 0L
      var j = 0
      while (j < n) { key = (key << 8) | (bytes(i + j) & 0xffL); j += 1 }
      key += 1L
      var slot = (java.lang.Long.hashCode(key * -7046029254386353131L)) & mask
      var done = false
      while (!done) {
        val k = keys(slot)
        if (k == 0L) {
          keys(slot) = key
          outOff(outN) = i; outN += 1
          done = true
        } else if (k == key) done = true
        else slot = (slot + 1) & mask
      }
      i += 1
    }
    val arr = new Array[Any](outN)
    var j = 0
    while (j < outN) {
      arr(j) = UTF8String.fromBytes(bytes, outOff(j), n)
      j += 1
    }
    new GenericArrayData(arr)
  }

  /** The original String-based implementation — the exact-semantics
    * fallback for non-ASCII inputs or n outside [1, 8]. */
  private[graft] def slowEval(u: UTF8String, n: Int): Any = {
    val text = u.toString
    val out = new java.util.LinkedHashSet[String]()
    if (text.length < n) {
      if (text.nonEmpty) out.add(text)
    } else {
      var i = 0
      val end = text.length - n
      while (i <= end) {
        out.add(text.substring(i, i + n))
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
      newLeft: Expression, newRight: Expression): CharNgrams =
    copy(left = newLeft, right = newRight)
}
