package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `array<float|double>` embedding columns, built purely
  * from codegen-capable higher-order functions — no UDFs (SURVEY §2 op 71:
  * "pure built-in, no UDF"), so the DuckDB oracle (`list_cosine_similarity`)
  * has an exact double-precision twin.
  *
  * 100 TB note: these are map-side expressions — similarity search cost is
  * dominated by the JOIN SHAPE around them (brute-force cross join vs
  * LSH/IVF bucketing, see LlmOps ops 71/72), not by the per-pair math.
  */
object VectorOps {

  /** Cast an array<float> column to array<double> (exact) so all arithmetic
    * below is double-precision on both engines. */
  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity of two array<double> columns. Callers should
    * `round(cosine(a,b), 6)` before comparing/ordering across engines —
    * summation order inside the fold is sequential on both sides, but the
    * final divide/sqrt composition is the one place engines may differ in
    * the last ulp. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
