package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All of a vector's LSH band sign-buckets in ONE pass (SURVEY §4.2's
  * "custom expression only if built-ins too slow" — profiling at sf6d
  * said yes, loudly: adaptive band geometry at 245 k distinct vectors is
  * 90 bands × 15 bits = 1350 hyperplane projections per vector, and the
  * higher-order formulation — 1350 separate `dot_fast` calls composed
  * with when/sum per bit — paid ~0.5 µs of expression overhead PER
  * PROJECTION, 118 s for the llm_semdedup banding scan where the raw
  * flops are ~5 s. This expression takes the whole flat plane matrix as
  * one literal and runs the bands×bits×dims loop over primitive arrays).
  *
  * Semantics are bit-identical to the per-bit composition it replaces
  * (`when(dot_fast(v, h) > 0, 1 << r).otherwise(0)` summed per band):
  * sequential-sum dot products in element order, strict `> 0` sign test,
  * and the null contract — a null vector, a length mismatch, or any null
  * element made every per-plane dot null, hence every when-branch 0,
  * hence bucket 0 in every band; here those cases return the all-zeros
  * bucket array directly. NativeExprSpec pins the equivalence against
  * the composed form.
  *
  * Arguments: (v array<double>, planes array<double> — the FLAT
  * bands×bits×dims matrix, row-major in (band, bit) order —, nBands int,
  * bitsPerBand int); planes/nBands/bits must be foldable constants
  * (model parameters, validated at analysis time).
  *
  * CodegenFallback: the per-row loop is plain compiled JVM code already;
  * fusing it into generated Java would save only the virtual call. */
case class BandBuckets(vec: Expression, planesExpr: Expression,
    bandsExpr: Expression, bitsExpr: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, planesExpr, bandsExpr, bitsExpr)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  /** Geometry bound: bands × bits is a per-row work factor and the plane
    * literal's size; 1 << 16 projections is far above any sized geometry
    * (adaptiveBandParams peaks in the low thousands) but small enough
    * that a typo'd constant fails analysis instead of freezing a scan. */
  private val MaxProjections = 1 << 16

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (vec.dataType, planesExpr.dataType, bandsExpr.dataType, bitsExpr.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), IntegerType, IntegerType) =>
        if (!planesExpr.foldable || !bandsExpr.foldable || !bitsExpr.foldable)
          TypeCheckFailure("band_buckets: planes, nBands, bitsPerBand must be foldable constants")
        else (bandsExpr.eval(), bitsExpr.eval(), planesExpr.eval()) match {
          case (b: Int, r: Int, p: ArrayData)
              if b >= 1 && r >= 1 && r <= 30 && b.toLong * r <= MaxProjections &&
                p.numElements() > 0 && p.numElements() % (b * r) == 0 =>
            TypeCheckSuccess
          case _ =>
            TypeCheckFailure("band_buckets: need 1 <= nBands, 1 <= bitsPerBand <= 30, " +
              s"bands*bits <= $MaxProjections, and planes length divisible by bands*bits")
        }
      case _ =>
        TypeCheckFailure("band_buckets expects (array<double>, array<double>, int, int), " +
          s"got ${children.map(_.dataType).mkString(", ")}")
    }
  }

  private lazy val nBands: Int = bandsExpr.eval().asInstanceOf[Int]
  private lazy val nBits: Int = bitsExpr.eval().asInstanceOf[Int]
  private lazy val planes: Array[Double] =
    planesExpr.eval().asInstanceOf[ArrayData].toDoubleArray()
  private lazy val dims: Int = planes.length / (nBands * nBits)
  private lazy val zeros: GenericArrayData = new GenericArrayData(new Array[Int](nBands))

  override def eval(input: InternalRow): Any = {
    val vAny = vec.eval(input)
    if (vAny == null) return zeros
    val vData = vAny.asInstanceOf[ArrayData]
    if (vData.numElements() != dims) return zeros
    var i = 0
    while (i < dims) { if (vData.isNullAt(i)) return zeros; i += 1 }
    val v = vData.toDoubleArray()
    val out = new Array[Int](nBands)
    var p = 0
    var k = 0
    while (k < nBands) {
      var bucket = 0
      var r = 0
      while (r < nBits) {
        var dot = 0.0
        var j = 0
        while (j < dims) { dot += v(j) * planes(p + j); j += 1 }
        if (dot > 0) bucket |= (1 << r)
        p += dims
        r += 1
      }
      out(k) = bucket
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BandBuckets =
    copy(vec = newChildren(0), planesExpr = newChildren(1),
      bandsExpr = newChildren(2), bitsExpr = newChildren(3))
}
