package graft

import java.nio.file.Files

import graft.etl.Rollup
import graft.streaming.StreamingRollup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StreamingRollup: a rollup maintained across micro-batches (and across a
  * checkpointed restart) must be BIT-IDENTICAL to the batch recompute over
  * all data ever streamed — the decimal-merge exactness of etl.Rollup
  * carried into continuous operation — and the versioned sink must be
  * idempotent under batch replay (the at-least-once → exactly-once
  * contract of foreachBatch).
  */
class StreamingRollupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val keys = Seq("event_type")
  private val measures = Seq("value")

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy(col("event_type").asc).collect().map(_.toSeq.toList).toSeq

  test("foreachBatch-maintained rollup == batch recompute across a restart; replay is idempotent") {
    val base = Files.createTempDirectory("graft_stream_rollup")
    val src = base.resolve("src"); Files.createDirectories(src)
    val state = base.resolve("state").toString
    val ckpt = base.resolve("ckpt").toString

    def chunk(ids: Range): DataFrame =
      ids.map(i => (i.toLong, s"type${i % 3}", i / 7.0)).toDF("id", "event_type", "value")

    def startQuery() = spark.readStream
      .schema("id LONG, event_type STRING, value DOUBLE")
      .parquet(src.toString)
      .writeStream
      .foreachBatch(StreamingRollup.mergeInto(state, keys, measures) _)
      .option("checkpointLocation", ckpt)
      .start()

    chunk(1 to 400).coalesce(1).write.mode("append").parquet(src.toString)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // more data lands while the query is DOWN; restart from the checkpoint
    chunk(401 to 650).coalesce(1).write.mode("append").parquet(src.toString)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val expected = canon(Rollup.partial(chunk(1 to 650), keys, measures))
    assert(canon(StreamingRollup.current(spark, state)) == expected,
      "maintained rollup diverged from the batch recompute")

    // replay safety: re-running the LAST batch must not double-merge
    val lastId = new java.io.File(state).listFiles()
      .map(_.getName.drop(1).toLong).max
    StreamingRollup.mergeInto(state, keys, measures)(chunk(401 to 650), lastId)
    assert(canon(StreamingRollup.current(spark, state)) == expected,
      "replaying the last batch changed the state — sink not idempotent")
  }
}
