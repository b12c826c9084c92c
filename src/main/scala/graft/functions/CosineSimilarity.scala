package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd cosine similarity over two array<double> columns.
  *
  * Why a custom Catalyst Expression (SURVEY §4.2 escape hatch (b)): Spark's
  * higher-order functions (`aggregate`/`zip_with` in VectorOps.cosine) do
  * NOT participate in whole-stage codegen — every element allocates lambda
  * variables and boxes through InternalRow. For all-pairs similarity ops
  * (millions of 64-dim evaluations) that interpretive overhead dominates.
  * This expression emits a tight primitive-double loop inside the generated
  * code — same accumulation order as VectorOps.cosine (sequential dot and
  * norms, then dot/(sqrt(na)*sqrt(nb))), so results are bit-identical and
  * oracle parity is unchanged.
  *
  * Null contract: null if either array is null, if the lengths differ, or
  * if any element is null — exactly what the declarative zip_with/aggregate
  * form yields on those edges (zip_with null-pads the shorter array and the
  * null poisons the sum), so RewriteCosine stays a pure performance
  * transformation on ALL inputs, not just well-formed ones.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // Nullable regardless of children: length-mismatch / null-element → null.
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_fast expects array<double>, got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native expressions into a session's function
  * registry, making them usable from `expr("cosine_fast(a, b)")` and SQL. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    // Idempotent: query builders call this defensively; re-registering per
    // build spams WARNs and costs a few ms per query. Function table is
    // shared with graft.GraftExtensions (the spark.sql.extensions path) so
    // the programmatic and config-driven registrations cannot drift.
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_fast"))) return
    graft.GraftExtensions.functionTable.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RewriteCosine)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteCosine
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.MergeUnionScans)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.MergeUnionScans
    }
  }
}
