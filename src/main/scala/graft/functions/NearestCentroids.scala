package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** TOP-M nearest centroid ids by rounded cosine — the multi-probe twin
  * of [[NearestCentroid]] (same flat-matrix literal, same total order:
  * rounded cosine desc, cent_id asc; row 1 of the result IS the
  * nearest_centroid answer). Exists because the aggregate formulation of
  * top-m assignment (crossJoin fan-out + collect_list + sort_array)
  * allocates N×k struct rows through an object-heavy aggregation —
  * measured 168 s for the k = √N cell fallback at 121 k vectors where
  * the per-row primitive loop does the same k×dims flops in seconds.
  * Map-side only, zero shuffle: multi-probe assignment stays a pure
  * scan at any corpus size (within the literal-matrix cap — past it use
  * Ivf.assignTopAgg, the aggregate fallback).
  *
  * Rounding, nan-safe ordering, and the null contract match
  * [[NearestCentroid]] exactly: a null / length-mismatched /
  * null-element vector makes every per-centroid cosine null, and
  * all-null ties resolve down the cent_id order — here the m lowest
  * cent_ids. VectorSpec pins top-1 ≡ assign and the full order against
  * the aggregate form.
  *
  * Arguments: (v array<double>, cvsFlat array<double> — k×dims
  * row-major, ascending cent_id —, cids array<bigint> ascending,
  * m int). cvsFlat/cids/m must be foldable constants; 1 ≤ m ≤ k. */
case class NearestCentroids(vec: Expression, cvsExpr: Expression,
    cidsExpr: Expression, mExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, cvsExpr, cidsExpr, mExpr)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  private val MaxFlat = 1 << 20

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (vec.dataType, cvsExpr.dataType, cidsExpr.dataType, mExpr.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
          ArrayType(LongType, _), IntegerType) =>
        if (!cvsExpr.foldable || !cidsExpr.foldable || !mExpr.foldable)
          TypeCheckFailure("nearest_centroids: matrix, ids, and m must be foldable constants")
        else (cvsExpr.eval(), cidsExpr.eval(), mExpr.eval()) match {
          case (cvs: ArrayData, cids: ArrayData, m: Int)
              if cids.numElements() >= 1 && cvs.numElements() <= MaxFlat &&
                cvs.numElements() % cids.numElements() == 0 &&
                m >= 1 && m <= cids.numElements() =>
            TypeCheckSuccess
          case _ =>
            TypeCheckFailure("nearest_centroids: need >= 1 centroid, flat matrix length " +
              s"divisible by the id count and <= $MaxFlat, and 1 <= m <= k")
        }
      case _ =>
        TypeCheckFailure("nearest_centroids expects (array<double>, array<double>, " +
          s"array<bigint>, int), got ${children.map(_.dataType).mkString(", ")}")
    }
  }

  private lazy val cvs: Array[Double] = cvsExpr.eval().asInstanceOf[ArrayData].toDoubleArray()
  private lazy val cids: Array[Long] = cidsExpr.eval().asInstanceOf[ArrayData].toLongArray()
  private lazy val m: Int = mExpr.eval().asInstanceOf[Int]
  private lazy val dims: Int = cvs.length / cids.length
  private lazy val nbSqrt: Array[Double] = Array.tabulate(cids.length) { j =>
    var nb = 0.0
    var i = 0
    while (i < dims) { val y = cvs(j * dims + i); nb += y * y; i += 1 }
    math.sqrt(nb)
  }
  private lazy val lowestCids: GenericArrayData =
    new GenericArrayData(cids.take(m).map(x => x: Any))

  private def round6(d: Double): Double = NearestCentroids.round6(d)

  private def gt(x: Double, y: Double): Boolean = {
    val xn = java.lang.Double.isNaN(x); val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || x == y) false
    else if (xn) true
    else if (yn) false
    else x > y
  }

  override def eval(input: InternalRow): Any = {
    val vAny = vec.eval(input)
    if (vAny == null) return lowestCids
    val vData = vAny.asInstanceOf[ArrayData]
    if (vData.numElements() != dims) return lowestCids
    var i = 0
    while (i < dims) { if (vData.isNullAt(i)) return lowestCids; i += 1 }
    val v = vData.toDoubleArray()
    var na = 0.0
    i = 0
    while (i < dims) { val x = v(i); na += x * x; i += 1 }
    val naSqrt = math.sqrt(na)
    // insertion into the running top-m: centroids arrive in ascending
    // cent_id order, so a strict cosine-greater test alone realizes the
    // (cos desc, cent_id asc) total order — equal-cosine later ids file
    // in after earlier ones and never displace them
    val topC = new Array[Double](m)
    val topId = new Array[Long](m)
    var filled = 0
    var j = 0
    while (j < cids.length) {
      var dot = 0.0
      val base = j * dims
      i = 0
      while (i < dims) { dot += v(i) * cvs(base + i); i += 1 }
      val c = round6(dot / (naSqrt * nbSqrt(j)))
      var pos = if (filled < m) filled else -1
      if (filled == m && gt(c, topC(m - 1))) pos = m - 1
      if (pos >= 0) {
        while (pos > 0 && gt(c, topC(pos - 1))) {
          topC(pos) = topC(pos - 1); topId(pos) = topId(pos - 1); pos -= 1
        }
        topC(pos) = c; topId(pos) = cids(j)
        if (filled < m) filled += 1
      }
      j += 1
    }
    new GenericArrayData(topId.map(x => x: Any))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NearestCentroids =
    copy(vec = newChildren(0), cvsExpr = newChildren(1),
      cidsExpr = newChildren(2), mExpr = newChildren(3))
}

object NearestCentroids {

  /** Spark Round(d, 6) — BigDecimal.valueOf(d).setScale(6, HALF_UP) —
    * with a provably-equivalent fast path. The BigDecimal pipeline
    * (Double.toString → decimal parse → scale → back) costs ~300 ns per
    * value; at k centroids per row it dominated assignment past k ≈ 100
    * (measured: Ivf.train at k = 349 spent 80 s, mostly here).
    *
    * Equivalence argument for the fast path: BigDecimal.valueOf(d) is
    * the decimal value of d's SHORTEST string representation, which
    * differs from the exact binary value of d by < 1 ulp ≈ 1e-16
    * relative, so for |d| ≤ ~1e3 the scaled value y = d·1e6 moves by
    * < 1e-7. floor(y + 0.5)/1e6 therefore agrees with the decimal
    * HALF_UP result whenever y's fractional part is farther than 1e-4
    * from the 0.5 rounding boundary (three orders of magnitude of
    * slack); inside that window — including the negative-boundary case
    * where HALF_UP (away from zero) and floor (toward +∞) genuinely
    * disagree — the exact BigDecimal path runs. Cosines land in the
    * window with probability ~2e-4, so the amortized cost is the two
    * flops. NativeExprSpec-pinned against Spark's Round on boundary
    * values; the NearestCentroid JVM-argmax spec (which rounds via
    * BigDecimal) pins the composition. */
  /** Test hook: NativeExprSpec pins the fast path against Spark Round. */
  def round6Public(d: Double): Double = round6(d)

  private[functions] def round6(d: Double): Double = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return d
    val y = d * 1e6
    val fl = math.floor(y)
    val f = y - fl
    // fast path only for |d| ≤ 1e3 (cosines are ≤ 1; larger magnitudes
    // shrink the string-repr slack) and away from the 0.5 boundary
    if (math.abs(y) <= 1e9 && math.abs(f - 0.5) > 1e-4) {
      val r = (if (f > 0.5) fl + 1 else fl) / 1e6
      if (r == 0.0) 0.0 else r // BigDecimal has no −0.0; normalize the sign
    } else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}
