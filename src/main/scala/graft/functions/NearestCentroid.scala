package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Nearest-centroid id by rounded cosine (SURVEY §4.2's "custom
  * expression only if built-ins too slow" — profiling at sf6d said yes:
  * the literal-argmax formulation — k separate
  * `struct(round(cosine_fast(v, typedlit)), −cid)` expressions under one
  * `array_max` — falls off a codegen/JIT cliff between k = 16 and k = 50
  * (0.39 s → 25.5 s for the same 122 k-vector scan; the generated
  * projection grows past the JIT's huge-method limit and runs
  * interpreted). This expression takes the flat centroid matrix as one
  * literal and runs the k×dims argmax loop over primitive arrays:
  * map-side only, zero shuffle — the property that makes assignment a
  * pure scan at 100 TB — at ~0.1 µs per cosine).
  *
  * Bit-identical to the composition it replaces: sequential-sum dot and
  * norms in element order with cos = dot/(√na·√nb) (√na is row-constant
  * and √nb centroid-constant, so factoring them preserves the exact
  * product CosineSimilarity computes), Spark's Round semantics at scale
  * 6 (HALF_UP via BigDecimal.valueOf, NaN/∞ passthrough), and the
  * max-(rounded-cos, −cent_id) total order with Spark's nan-safe double
  * ordering (NaN above all values; ties → lowest cent_id). The null
  * contract mirrors the struct form: a null / length-mismatched /
  * null-element vector made EVERY per-centroid cosine null, and all-null
  * structs tie down to the lowest cent_id — here returned directly.
  * VectorSpec pins assignment equivalence against a plain JVM argmax and
  * the broadcast-join branch.
  *
  * Arguments: (v array<double>, cvsFlat array<double> — k×dims
  * row-major, ordered by ascending cent_id —, cids array<bigint>,
  * ascending); cvsFlat/cids must be foldable constants (model
  * parameters, validated at analysis time).
  *
  * CodegenFallback: the per-row loop is plain compiled JVM code already;
  * fusing it into generated Java would save only the virtual call. */
case class NearestCentroid(vec: Expression, cvsExpr: Expression, cidsExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, cvsExpr, cidsExpr)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  /** Model-size bound: k×dims doubles ride the plan as one literal; 1 << 20
    * (8 MB) is far above the literal-path cap (Ivf.LiteralArgmaxMaxK × 64)
    * but fails analysis on a typo'd matrix instead of OOMing the driver. */
  private val MaxFlat = 1 << 20

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (vec.dataType, cvsExpr.dataType, cidsExpr.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
        if (!cvsExpr.foldable || !cidsExpr.foldable)
          TypeCheckFailure("nearest_centroid: centroid matrix and ids must be foldable constants")
        else (cvsExpr.eval(), cidsExpr.eval()) match {
          case (cvs: ArrayData, cids: ArrayData)
              if cids.numElements() >= 1 && cvs.numElements() <= MaxFlat &&
                cvs.numElements() % cids.numElements() == 0 =>
            TypeCheckSuccess
          case _ =>
            TypeCheckFailure("nearest_centroid: need >= 1 centroid, flat matrix length " +
              s"divisible by the id count and <= $MaxFlat")
        }
      case _ =>
        TypeCheckFailure("nearest_centroid expects (array<double>, array<double>, " +
          s"array<bigint>), got ${children.map(_.dataType).mkString(", ")}")
    }
  }

  private lazy val cvs: Array[Double] = cvsExpr.eval().asInstanceOf[ArrayData].toDoubleArray()
  private lazy val cids: Array[Long] = cidsExpr.eval().asInstanceOf[ArrayData].toLongArray()
  private lazy val dims: Int = cvs.length / cids.length
  /** √nb per centroid, accumulated in element order — the exact factor
    * CosineSimilarity's per-pair norm loop produces. */
  private lazy val nbSqrt: Array[Double] = NearestCentroid.normSqrts(cvs, cids.length)

  override def eval(input: InternalRow): Any = {
    val vAny = vec.eval(input)
    // null / length-mismatch / null-element vector: every per-centroid
    // cosine was null in the struct form, and all-null structs tie down
    // to max(−cid) = the lowest cent_id
    if (vAny == null) return cids(0)
    val vData = vAny.asInstanceOf[ArrayData]
    if (vData.numElements() != dims) return cids(0)
    var i = 0
    while (i < dims) { if (vData.isNullAt(i)) return cids(0); i += 1 }
    NearestCentroid.nearestId(vData.toDoubleArray(), cvs, cids, nbSqrt)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NearestCentroid =
    copy(vec = newChildren(0), cvsExpr = newChildren(1), cidsExpr = newChildren(2))
}

object NearestCentroid {

  /** √norm per centroid of a flat row-major k×dims matrix, accumulated
    * in element order — the exact factor CosineSimilarity's per-pair
    * norm loop produces. */
  def normSqrts(cvs: Array[Double], k: Int): Array[Double] = {
    val dims = cvs.length / k
    Array.tabulate(k) { j =>
      var nb = 0.0
      var i = 0
      while (i < dims) { val y = cvs(j * dims + i); nb += y * y; i += 1 }
      math.sqrt(nb)
    }
  }

  /** Spark's nan-safe double ordering: NaN == NaN, NaN above all else. */
  private def gt(x: Double, y: Double): Boolean = {
    val xn = java.lang.Double.isNaN(x); val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || x == y) false
    else if (xn) true
    else if (yn) false
    else x > y
  }

  /** The per-row argmax kernel [[NearestCentroid.eval]] runs — factored
    * out (r17) so the driver-local Lloyd path (Ivf.train on a collected
    * training set) assigns through the IDENTICAL compiled code instead
    * of a reimplementation that could drift by an ulp. `v` must already
    * be null-free and of matrix width (eval's null contract stays at the
    * expression boundary). */
  def nearestId(v: Array[Double], cvs: Array[Double], cids: Array[Long],
      nbSqrt: Array[Double]): Long = {
    val dims = cvs.length / cids.length
    var na = 0.0
    var i = 0
    while (i < dims) { val x = v(i); na += x * x; i += 1 }
    val naSqrt = math.sqrt(na)
    var bestC = 0.0
    var bestCid = 0L
    var j = 0
    while (j < cids.length) {
      var dot = 0.0
      val base = j * dims
      i = 0
      while (i < dims) { dot += v(i) * cvs(base + i); i += 1 }
      val c = NearestCentroids.round6(dot / (naSqrt * nbSqrt(j)))
      if (j == 0 || gt(c, bestC)) { bestC = c; bestCid = cids(j) }
      j += 1
    }
    bestCid
  }
}
