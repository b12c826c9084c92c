package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle set in ONE pass (SURVEY §4.2's "custom
  * aggregate only if built-ins too slow" — profiling at sf0.1 said yes:
  * the higher-order formulation re-hashes every shingle string once per
  * seed, 64 string hashes per shingle, 460 s for 5k docs; this expression
  * hashes each shingle once and derives the seed family arithmetically).
  *
  * Family: h_j(s) = h1(s) + j · (h2(s) | 1)  (Broder-style universal
  * derivation from two independent 64-bit hashes; the |1 keeps the
  * multiplier odd so the family stays pairwise independent; Java wrapping
  * arithmetic is deterministic). h1/h2 are xxhash64 with seeds 42/43 —
  * Spark's own XXH64 implementation, so behavior matches the engine's hash
  * functions.
  *
  * CodegenFallback: the per-row loop is plain compiled JVM code already;
  * fusing it into generated Java would save only the virtual call.
  */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Signature width bound: a per-row allocation of this many longs. 4096
    * is far above any practical LSH configuration (64–256) but small enough
    * that a typo'd width fails analysis instead of OOMing executors. */
  private val MaxHashes = 4096

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        // The width is conceptually a CONSTANT (it sizes a per-row array) —
        // reject non-foldable / null / out-of-range values at analysis time
        // rather than throwing NegativeArraySizeException or OOM per row.
        if (!right.foldable)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "minhash_sig: the signature width must be a foldable constant")
        else right.eval() match {
          case n: Int if n >= 1 && n <= MaxHashes =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
          case other =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
              s"minhash_sig: signature width must be in [1, $MaxHashes], got $other")
        }
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects (array<string>, int), got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(shinglesAny: Any, nAny: Any): Any = {
    val shingles = shinglesAny.asInstanceOf[ArrayData]
    val nHashes = nAny.asInstanceOf[Int]
    val mins = Array.fill(nHashes)(Long.MaxValue)
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val h1 = hash(s, 42L)
      val h2 = hash(s, 43L) | 1L
      var j = 0
      var hj = h1
      while (j < nHashes) {
        if (hj < mins(j)) mins(j) = hj
        hj += h2
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  private def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
}
