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

  /** Nearest-centroid assignment (ties broken by cent_id) — MAP-SIDE ONLY.
    * Centroids are k×dims model parameters, so they ride into the row
    * expression as array literals (one `typedlit` per centroid — the
    * VectorLsh codegen lesson) and the argmax is an `array_max` over
    * struct(cos, −cent_id): max cosine first, then smallest cent_id, the
    * same total order the previous window formulation used. Zero shuffle,
    * zero broadcast-join: at 100 TB assignment is a pure scan, and the
    * earlier crossJoin+window shape (k·N rows through a per-vector window)
    * disappears from every Lloyd iteration and every index build. */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    val cl = cents.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val scored = cl.map { case (cid, cv) =>
      struct(
        round(call_function("cosine_fast", col("v"), typedlit(cv)), 6).as("c"),
        lit(-cid).as("negid"))
    }
    vecs.withColumn("best", array_max(array(scored.toSeq: _*)))
      .select(col("vec_id"), (-col("best.negid")).as("cent_id"), col("v"))
  }

  /** Cluster count for the cluster-scoped pairwise pass (SemDeDup):
    * k = ⌈√N⌉, the BALANCE POINT of the two costs that pull k in
    * opposite directions — within-cell all-pairs is ~N²/(2k) (wants k
    * large; any FIXED k leaves it quadratic, the r5 scale-killer on
    * llm_semdedup) while centroid assignment/training is ~N·k per pass
    * (wants k small; k ∝ N would just move the quadratic there). At
    * k = √N both terms are O(N^1.5) — the standard SemDeDup compromise
    * (the paper's own configs sit near √N cells for corpus sizes in the
    * millions). Truly linear scaling needs candidate pruning INSIDE
    * cells (the VectorLsh band machinery at the drop threshold) — the
    * named next increment, not a k choice. Floor 16 keeps the historical
    * geometry on small corpora; cap 4096 bounds [[assign]]'s
    * literal-centroid argmax expression — past ~16 M distinct vectors
    * swap assign's typedlit argmax for a broadcast join before raising
    * the cap. */
  def adaptiveK(n: Long): Int =
    math.min(4096, math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))

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
    // Training is EAGER (each iteration collects the k×dims model), so the
    // input can be cached for its duration and released before returning:
    // without this, every iteration's job re-runs the caller's upstream
    // plan (e.g. the dedup-to-representatives shuffle) from the scan.
    val input = vecs.persist()
    try {
      var cents = input.orderBy(col("vec_id").asc).limit(k)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      for (_ <- 1 to iters) {
        cents = materialize(assign(input, cents)
          .select(col("cent_id"), posexplode(col("v")))
          .groupBy(col("cent_id"), col("pos"))
          .agg((sum(col("col").cast(DecimalType(28, 14))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("m"))
          .groupBy(col("cent_id"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            x => x.getField("m")).as("cv")))
      }
      cents
    } finally input.unpersist(blocking = false)
  }
}
