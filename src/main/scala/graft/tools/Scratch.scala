package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Dev-only scratch probe for stage-level timing experiments. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCRATCH $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // mirror the llm_corpus_prep planted corpus
    val docs0 = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text"))
    val copies = docs0.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("lang"), col("text"))
    val mutants = docs0.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
        regexp_replace(col("text"), "^\\w+ ", "graftmutant ").as("text"))
    val nxt = docs0.select((col("doc_id") - 1).as("doc_id"), col("text").as("t2"))
    val stitched = docs0.join(nxt, "doc_id").filter(col("doc_id") % 40 === 0)
      .select((col("doc_id") + 4000000L).as("doc_id"), col("lang"),
        concat(col("text"), lit(" "), col("t2")).as("text"))
    val docs = docs0.unionByName(copies).unionByName(mutants).unionByName(stitched)
      .select(col("doc_id"), col("lang"), col("text"))

    val exactKept = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val s1 = docs.join(exactKept, "doc_id").cache()
    t("s1 exact dedup")(s1.count())
    val scored = s1.withColumn("q", TextOps.qualityFeatures(col("text")))
    val s2 = scored.filter(col("q.quality") >= 0.45).cache()
    t("s2 quality")(s2.count())
    val dupIds = graft.etl.TextDedup.minhashPairs(
        s2.select(col("doc_id").as("id"), col("text")),
        shingleWords = 5, nHashes = 64, nBands = 16, rowsPerBand = 4, threshold = 0.8)
      .select(col("doc_b").as("doc_id")).distinct()
    val s3 = s2.join(dupIds, Seq("doc_id"), "left_anti").cache()
    t("s3 lsh neardup")(s3.count())
    val chunks = s3
      .select(col("doc_id"), posexplode(TextOps.cdcChunks(TextOps.normalize(col("text")))))
      .select(col("doc_id"), col("pos").as("idx"), col("col").as("c"))
    val owned = chunks.groupBy(col("c"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("f"))
      .groupBy(col("f.doc_id").as("doc_id")).agg(count(lit(1)).as("n_owned"))
    val boilerIds = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
      .join(owned, Seq("doc_id"), "left")
      .filter((col("n_chunks") - coalesce(col("n_owned"), lit(0L))).cast("double")
        > col("n_chunks").cast("double") * 0.6)
      .select("doc_id")
    t("chunks explode count")(chunks.count())
    t("owned count")(owned.count())
    t("boilerIds count")(boilerIds.count())
    val s4 = s3.join(boilerIds, Seq("doc_id"), "left_anti").cache()
    t("s4 chunk boilerplate")(s4.count())
    t("llm_corpus_prep row (fixed)") {
      graft.SparkEntry.queries("llm_corpus_prep")(spark, dir).count()
    }
    t("llm_chunk_dedup row (fixed)") {
      graft.SparkEntry.queries("llm_chunk_dedup")(spark, dir).count()
    }
    t("llm_dedup_clusters row (fixed)") {
      graft.SparkEntry.queries("llm_dedup_clusters")(spark, dir).count()
    }
    // clusters decomposition: edges subtree alone
    locally {
      graft.functions.GraftFunctions.register(spark)
      val base = Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("text"))
      val words2 = split(TextOps.normalize(col("text")), " ")
      val eligible = base.filter(col("doc_id") % 50 === 0 && size(words2) >= 30)
      val mutA = eligible.select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
        concat_ws(" ", transform(words2, (w, i) =>
          when(i.between(9, 13), lit("graftmuta")).otherwise(w))).as("text"))
      val mutB = eligible.select((col("doc_id") + 2000000L).as("doc_id"), col("source"),
        concat_ws(" ", transform(words2, (w, i) =>
          when(i.between(9, 13), lit("graftmuta"))
            .when(i.between(19, 23), lit("graftmutb")).otherwise(w))).as("text"))
      val docsC = base.unionByName(mutA).unionByName(mutB)
      val groups = graft.etl.TextDedup.cappedBlocks(docsC, "source", "doc_id", 1000)
        .groupBy(col("source"), col("text"))
        .agg(min(col("doc_id")).as("rep"),
          sort_array(collect_list(col("doc_id"))).as("members"))
        .withColumn("norm", TextOps.normalize(col("text")))
        .withColumn("sh", expr("word_shingles(norm, 3)"))
        .select(col("source"), col("rep"), col("members"), col("sh"))
      val a = groups.as("a"); val b = groups.as("b")
      val edges = a.join(b,
          col("a.source") === col("b.source") && col("a.rep") < col("b.rep"))
        .filter(expr("jaccard_sim(a.sh, b.sh)") >= 0.5)
        .select(col("a.rep").as("a"), col("b.rep").as("b"))
      t("clusters: groups count")(groups.count())
      t("clusters: edges count")(edges.count())
    }
    spark.stop()
  }
}
