package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/* r9 consolidation: RouteSweep and Scratch deleted — superseded by this
 * phase-decomposed variant; recorded runs in CROSSOVER.md. */
/** Dev-only: PHASE-DECOMPOSED cell-fallback probe — times train /
  * assignTop / banding+candidate-join / verify separately, with k and
  * probe width as knobs, so the k=√N-vs-N^⅓ and checkpoint decisions
  * ride measurements. The assigned frame is localCheckpoint-ed so each
  * phase (and each join side) starts from materialized rows.
  *
  * Usage: runMain graft.tools.RouteSweep2 [dir ...]
  *   SPARK_GRAFT_SWEEP_K=cbrt,sqrt  SPARK_GRAFT_SWEEP_M=5
  */
object RouteSweep2 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/graft_sf6s")
    val kModes = sys.env.getOrElse("SPARK_GRAFT_SWEEP_K", "cbrt,sqrt").split(",").map(_.trim)
    val ms = sys.env.getOrElse("SPARK_GRAFT_SWEEP_M", "5").split(",").map(_.trim.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }
    for (dir <- dirs; kMode <- kModes; m <- ms) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
      val planted = base.filter(col("vec_id") % 100 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("v"), x => x * 0.9 + 0.02).as("v"))
      val reps = base.unionByName(planted).localCheckpoint()
      val n = reps.count()
      val k = kMode match {
        case "sqrt" => math.min(4096, math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))
        case _      => graft.etl.Ivf.adaptiveK(n)
      }
      val (bands, bits) = graft.etl.VectorLsh.adaptiveBandParams(n, simThreshold = 0.9)
      val (tTrain, cents) = timed(graft.etl.Ivf.train(reps, k = k, iters = 3,
        sampleCap = graft.etl.Ivf.trainSampleCap(k)))
      val (tAssign, assigned) = timed {
        val a = graft.etl.Ivf.assignTop(reps, cents, m).localCheckpoint()
        a.count(); a
      }
      val (tCand, cand) = timed {
        val bucketed = graft.etl.VectorLsh.withBandBuckets(assigned, bands, bits, 64)
          .select(col("vec_id"), col("cells"), col("band"), col("bucket"))
        val prim = bucketed.select(col("vec_id"),
          col("cells").getItem(0).as("cent_id"), col("band"), col("bucket"))
        val probe = bucketed.select(col("vec_id"),
          explode(col("cells")).as("cent_id"), col("band"), col("bucket"))
        val c = prim.as("a").join(probe.as("b"),
            col("a.cent_id") === col("b.cent_id") &&
            col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") =!= col("b.vec_id"))
          .select(least(col("a.vec_id"), col("b.vec_id")).as("vec_a"),
            greatest(col("a.vec_id"), col("b.vec_id")).as("vec_b"))
          .dropDuplicates(Seq("vec_a", "vec_b"))
          .localCheckpoint()
        c.count(); c
      }
      val nCand = cand.count()
      val (tVer, verified) = timed {
        val v = cand
          .join(reps.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
          .join(reps.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
          .filter(round(call_function("cosine_fast", col("va"), col("vb")), 6) >= 0.9)
          .select("vec_a", "vec_b").localCheckpoint()
        v.count(); v
      }
      val expected = base.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("vec_a"), (col("vec_id") + 1000000L).as("vec_b"))
      val missing = expected.join(verified, Seq("vec_a", "vec_b"), "left_anti").count()
      println(f"SWEEP2 $dir%-18s k=$k%4d($kMode) m=$m n=$n " +
        f"train=${tTrain}%6.2f assign=${tAssign}%6.2f cand=${tCand}%7.2f " +
        f"ver=${tVer}%6.2f s nCand=$nCand missing=$missing")
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
