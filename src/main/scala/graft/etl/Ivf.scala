package graft.etl

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** IVF coarse quantization for ANN search (SURVEY §2 op 72 scale path):
  * deterministic k-means training + nearest-centroid assignment.
  *
  * Training = Lloyd iterations with DETERMINISTIC arithmetic: init from
  * the k lowest vec_ids, per-dimension means via decimal-exact sums
  * (DecimalType(28,14) captures the full float mantissa range of unit-ish
  * embeddings), cosine scored through the codegen'd `cosine_fast`. Every
  * re-run — any partitioning, any cluster size — yields identical
  * centroids, so the index is reproducible (the property that matters for
  * a 100 TB vector table partitioned by cent_id on disk).
  */
object Ivf {

  /** Nearest-centroid assignment (ties broken by cent_id). */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c").desc_nulls_last, col("cent_id").asc_nulls_first)
    vecs.crossJoin(broadcast(cents))
      .withColumn("c", round(expr("cosine_fast(v, cv)"), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id"), col("v"))
  }

  /** k-means training over a (vec_id, v: array<double>) DataFrame.
    * Centroids are MODEL PARAMETERS (k×dims doubles): each iteration
    * materializes them to the driver and restarts from a literal relation —
    * otherwise the lazy plan nests every previous iteration's full subtree
    * (the standard iterative-algorithm pitfall; MLlib keeps centers on the
    * driver for the same reason). */
  def train(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    val spark = vecs.sparkSession
    import spark.implicits._
    def materialize(cents: DataFrame): DataFrame =
      cents.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .toSeq.toDF("cent_id", "cv")
    var cents = vecs.orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      cents = materialize(assign(vecs, cents)
        .select(col("cent_id"), posexplode(col("v")))
        .groupBy(col("cent_id"), col("pos"))
        .agg((sum(col("col").cast(DecimalType(28, 14))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("m"))
        .groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cv")))
    }
    cents
  }
}
