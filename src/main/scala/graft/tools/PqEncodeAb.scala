package graft.tools

import graft.etl.Pq
import graft.functions.{GraftFunctions, PqEncode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType}

/** Encode-path A/B at PQ's design point (r14 verdict item 2): the r15
  * [[graft.functions.PqEncode.doGenCode]] emitted loop vs the pre-r15
  * CodegenFallback shape (same eval loop reached through a per-row
  * virtual call at a whole-stage seam), on the 1 M × 768-dim
  * hierarchical corpus (tools/make_embeddings_hd.py) at m=96/k=256 —
  * the one-time full-corpus encode whose r14 cost was ~128 s wall.
  * Alternated reps, long-sum checksum pinning path equality.
  *
  * Usage: runMain graft.tools.PqEncodeAb [dirWithEmbeddingsParquet]
  *   AB_M (default 96), AB_K (256), AB_REPS (3), SPARK_GRAFT_CPUS (32).
  * Results print as PROBE lines (CROSSOVER.md protocol). */
object PqEncodeAb {

  /** The pre-r15 execution shape, verbatim: identical arithmetic,
    * reached through CodegenFallback's generated `.eval(row)` call. */
  case class PqEncodeFb(vec: Expression, booksExpr: Expression,
      halfccExpr: Expression, kExpr: Expression)
      extends Expression with CodegenFallback {
    @transient private lazy val inner = PqEncode(vec, booksExpr, halfccExpr, kExpr)
    override def children: Seq[Expression] = Seq(vec, booksExpr, halfccExpr, kExpr)
    override def dataType: DataType = inner.dataType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = inner.checkInputDataTypes()
    override def eval(input: InternalRow): Any = inner.eval(input)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): PqEncodeFb =
      copy(vec = c(0), booksExpr = c(1), halfccExpr = c(2), kExpr = c(3))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_emb_hd")
    val m = sys.env.getOrElse("AB_M", "96").toInt
    val kpq = sys.env.getOrElse("AB_K", "256").toInt
    val reps = sys.env.getOrElse("AB_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode_fb",
      exprs => PqEncodeFb(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")

    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = corpus.count()
    val dims = corpus.select(size(col("v"))).head.getInt(0)
    // the AnnScaleProbe training recipe: deterministic ~k×256-row subsample
    val mod = math.max(1L, n / (kpq * 256L))
    val sample = corpus.filter(pmod(xxhash64(col("vec_id")), lit(mod)) === 0)
    val (books, tTrain) = {
      val t0 = System.nanoTime()
      val b = Pq.train(sample, dims, m, kpq, iters = 2)
      (b, (System.nanoTime() - t0) / 1e9)
    }
    val flat = books.flatMap(_.sortBy(_._1).flatMap(_._2))
    val halfcc = books.flatMap(_.sortBy(_._1).map {
      case (_, cv) => cv.map(x => x * x).sum / 2.0
    })
    println(f"PROBE pq_encode_ab corpus=$dir n=$n dims=$dims m=$m k=$kpq " +
      f"train_s=$tTrain%.1f model_mb=${flat.length * 8 / 1e6}%.1f")

    // full-corpus encode, reduced to exact ORDER-INDEPENDENT checksums
    // over the WHOLE output struct (r15 ADVICE: summing only codes[1]
    // let a fallback-vs-codegen divergence confined to codes 2..m or to
    // the recon stats pass unseen): all m codes sum into one exact long,
    // and the two recon doubles round to 6dp and sum as decimals — exact
    // and partition-order-independent where a double sum is not — so ANY
    // per-subspace or per-stat divergence moves the triple. Timing stays
    // encode-dominated, not write-dominated.
    def drive(fn: String): (String, Double) = {
      val t0 = System.nanoTime()
      val e = call_function(fn,
        col("v"), typedlit(flat), typedlit(halfcc), lit(kpq)).as("e")
      val r = corpus.select(e)
        .select(
          sum(aggregate(col("e").getField("codes"), lit(0L),
            (acc, x) => acc + x)).as("cs"),
          sum(round(col("e").getField("recon_dot"), 6)
            .cast(DecimalType(30, 8))).as("rd"),
          sum(round(col("e").getField("recon_norm2"), 6)
            .cast(DecimalType(30, 8))).as("rn"))
        .head
      (s"${r.getLong(0)}|${r.getDecimal(1)}|${r.getDecimal(2)}",
        (System.nanoTime() - t0) / 1e9)
    }
    for (rep <- 1 to reps; fn <- Seq("pq_encode_fb", "pq_encode")) {
      val (chk, t) = drive(fn)
      val perVec = t * 1e6 / n
      println(f"PROBE pq_encode_ab rep=$rep path=$fn wall_s=$t%.1f " +
        f"us_per_vec=$perVec%.2f checksum=$chk")
    }
    spark.stop()
  }
}
