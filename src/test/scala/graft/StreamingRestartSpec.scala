package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Checkpointed restart (streaming ops at production scale): a file-source
  * → file-sink query stopped and restarted from its checkpoint must
  * process each input file EXACTLY once — the recovery contract every
  * 100 TB streaming pipeline leans on. */
class StreamingRestartSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("file source + parquet sink resumes from checkpoint exactly once") {
    val base = Files.createTempDirectory("graft_restart")
    val src = base.resolve("src"); Files.createDirectories(src)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString

    def startQuery() = spark.readStream
      .schema("id LONG, v DOUBLE")
      .parquet(src.toString)
      .withColumn("doubled", col("v") * 2.0)
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    // batch 1
    (1L to 50L).map(i => (i, i / 2.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src.toString)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // batch 2 lands while the query is DOWN
    (51L to 80L).map(i => (i, i / 2.0)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src.toString)

    // restart from the same checkpoint: only the new file is processed
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(sink)
    assert(out.count() == 80)                            // exactly once, no dups
    assert(out.select(countDistinct(col("id"))).head().getLong(0) == 80)
    assert(out.filter(col("doubled") =!= col("v") * 2.0).count() == 0)
  }
}
