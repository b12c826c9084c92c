package graft

import graft.etl.StageCheckpoint
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The shared stage-materialization policy (r18): sessions without a
  * checkpoint dir (bench/local) take the pre-r18 localCheckpoint path
  * byte-for-byte; sessions WITH one (the cluster production config)
  * take a reliable checkpoint that survives executor loss. Values are
  * identical on both paths. */
class StageCheckpointSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def stageInput = Tables.documents(spark, sf)
    .groupBy(col("lang")).agg(count(lit(1)).as("n"))

  test("no checkpoint dir: localCheckpoint path (lineage truncated, no " +
      "cache-manager entry) — the bench/local behavior, byte-identical " +
      "to pre-r18") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "test-order precondition: the reliable-dir test runs after this one")
    val in = stageInput
    val out = StageCheckpoint.stage(in)
    assert(out.queryExecution.logical.getClass.getSimpleName == "LogicalRDD",
      out.queryExecution.logical.getClass.getName)
    assert(out.storageLevel == StorageLevel.NONE) // not a cacheManager persist
    assert(out.collect().toSeq == in.collect().toSeq)
    out.unpersist(blocking = false)
  }

  test("with a checkpoint dir: reliable checkpoint (survives executor " +
      "loss) — the 100 TB production path; same values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_spec").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val in = stageInput
      val out = StageCheckpoint.stage(in)
      assert(out.queryExecution.logical.getClass.getSimpleName == "LogicalRDD")
      assert(out.storageLevel == StorageLevel.NONE)
      val files = new java.io.File(dir).listFiles()
      assert(files != null && files.nonEmpty, s"no checkpoint files under $dir")
      assert(out.collect().toSeq == in.collect().toSeq)
      // lazy form materializes on first action and checkpoints reliably too
      val lazyOut = StageCheckpoint.stage(stageInput, eager = false)
      assert(lazyOut.count() == in.count())
    } finally {
      // the session is shared across suites — restore the no-dir default
      // (SparkContext has no public unset; the private var is reset via
      // its synthetic setter)
      val m = classOf[org.apache.spark.SparkContext]
        .getDeclaredMethod("checkpointDir_$eq", classOf[Option[String]])
      m.setAccessible(true)
      m.invoke(spark.sparkContext, None)
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
    }
  }
}
