package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF layout (layouts.IvfIndex): the probe query must (a) read
  * ONLY the probed cent_id partition directories — partition pruning as
  * the ANN analogue of DPP — and (b) still reproduce the exact brute-force
  * top-5 on the planted corpus. */
class IvfIndexSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def brute(s: org.apache.spark.sql.SparkSession) = {
    val base = Tables.embeddings(s, sf)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val planted = Seq("0.005", "0.010", "0.015", "0.020").zipWithIndex.map {
      case (off, i) =>
        base.filter(col("vec_id") === 0)
          .select(lit((i + 1) * 1000000L).as("vec_id"),
            transform(col("v"), x => x * lit(0.9) + lit(off.toDouble)).as("v"))
    }.reduce(_ unionByName _)
    val corpus = base.unionByName(planted)
    val q = base.filter(col("vec_id") === 0).select(col("v").as("qv"))
    corpus.crossJoin(broadcast(q))
      .select(col("vec_id"), round(VectorOps.cosine(col("v"), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc_nulls_last, col("vec_id").asc_nulls_first)
      .limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("probed search reads < total partitions and matches brute force exactly") {
    // isolated session: AQE off so the file scan's runtime metrics are
    // readable from the executed plan (the DppSpec pattern)
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val df = SparkEntry.queries("llm_ann_ivf_persisted")(s, sf)
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // exact top-5 = self + the 4 planted mutants, bit-for-bit vs brute force
    assert(rows == brute(s), s"probed=$rows brute=${brute(s)}")
    assert(rows.head == ((0L, 1.0)))
    assert(rows.map(_._1).toSet ==
      Set(0L, 1000000L, 2000000L, 3000000L, 4000000L))

    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("graft_ivf_idx")) => f
    }
    assert(scan.nonEmpty, s"no index scan in:\n${df.queryExecution.executedPlan}")
    val idxPath = new java.io.File(scan.get.relation.location.rootPaths.head.toUri)
    val totalParts = Option(idxPath.listFiles())
      .map(_.count(f => f.isDirectory && f.getName.startsWith("cent_id="))).getOrElse(0)
    val readParts = scan.get.metrics("numPartitions").value
    assert(totalParts > 4, s"index has only $totalParts partitions")
    assert(readParts == 4,
      s"probe read $readParts of $totalParts partitions — expected exactly the 4 probed")
  }

  test("layout build is cached: second run reuses the persisted index") {
    val s = spark.newSession()
    // locate the index dir via a first run's scan metadata
    val df = SparkEntry.queries("llm_ann_ivf_persisted")(s, sf)
    df.collect()
    val idxDirs = Option(new java.io.File("/tmp").listFiles())
      .map(_.filter(_.getName.startsWith("graft_ivf_idx_")).toSeq).getOrElse(Seq.empty)
    assert(idxDirs.nonEmpty)
    val marks = idxDirs.map(d => d -> new java.io.File(d, "_SUCCESS").lastModified()).toMap
    SparkEntry.queries("llm_ann_ivf_persisted")(s, sf).collect()
    idxDirs.foreach { d =>
      assert(new java.io.File(d, "_SUCCESS").lastModified() == marks(d),
        s"index $d was rebuilt on the second run")
    }
  }

  test("serve(): two calls share ONE relation (and its file listing), " +
      "sessions are isolated, evictServed forces a re-list, and the probe " +
      "prunes through the served relation (r12 verdict item 6)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val (idxPath, _) = graft.operators.LlmOps.persistedIvfIndex(s, sf)
    val a = graft.layouts.IvfIndex.serve(s, idxPath)
    val b = graft.layouts.IvfIndex.serve(s, idxPath)
    assert(a eq b,
      "serve() returned distinct relations — the file listing is not shared")
    // a different session must get its own relation (its own listing —
    // cached plans cannot bleed across session configs)
    val s2 = spark.newSession()
    assert(!(graft.layouts.IvfIndex.serve(s2, idxPath) eq a))
    // partition pruning still evaluates per query against the CACHED
    // listing: a 4-cell probe through the served relation reads exactly
    // its probed partitions
    val probed = a.filter(col("cent_id").isin(0L, 1L, 2L, 3L))
      .select(col("vec_id"))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty)
    val total = Option(new java.io.File(new java.net.URI(
        if (idxPath.startsWith("/")) "file:" + idxPath else idxPath)).listFiles())
      .map(_.count(f => f.isDirectory && f.getName.startsWith("cent_id="))).getOrElse(0)
    assert(total > 4, s"index has only $total partitions")
    assert(scan.get.metrics("numPartitions").value == 4,
      s"served-relation probe read ${scan.get.metrics("numPartitions").value} " +
        s"of $total partitions — pruning lost through the cached listing")
    // evictServed is the mutation complement: the next serve() re-lists
    graft.layouts.LayoutUtil.evictServed(idxPath)
    assert(!(graft.layouts.IvfIndex.serve(s, idxPath) eq a),
      "evictServed left the stale relation cached")
  }

  test("a serve() parked between its listing and its insert cannot install " +
      "a pre-eviction relation after evictServed runs (r13 verdict item 1: " +
      "the epoch re-check and the insert are one atomic step)") {
    val s = spark.newSession()
    import s.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_served_race_")
      .toString + "/data"
    val hits = new java.util.concurrent.atomic.AtomicInteger()
    try {
      Seq(1).toDF("x").write.parquet(p)
      // the hook fires in EXACTLY the flagged window — after the listing
      // build, before the atomic re-check+insert. First pass: mutate the
      // path and evict, so the just-built listing is pre-eviction stale.
      graft.layouts.LayoutUtil.postListHook = () =>
        if (hits.incrementAndGet() == 1) {
          Seq(1, 2).toDF("x").write.mode("overwrite").parquet(p)
          graft.layouts.LayoutUtil.evictServed(p)
        }
      val df = graft.layouts.LayoutUtil.servedRelation(s, p)
      // the serve must have looped and re-listed: a pre-eviction install
      // would reference the overwritten (deleted) files
      assert(hits.get() == 2,
        s"serve() built ${hits.get()} listing(s) — expected the eviction " +
          "to force exactly one re-list")
      assert(df.count() == 2,
        "serve() installed the pre-eviction listing — stale relation served")
      // and the post-eviction relation is what stays cached
      assert(graft.layouts.LayoutUtil.servedRelation(s, p) eq df)
    } finally {
      graft.layouts.LayoutUtil.postListHook = () => ()
      graft.layouts.LayoutUtil.evictServed(p)
    }
  }

  test("batched kNN join over the persisted index: probes broadcast onto " +
      "the partitioned layout (no BNLJ, no index-side exchange before the " +
      "join), answers exactly the inline-index form") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val persisted = SparkEntry.queries("llm_knn_join_ivf_persisted")(s, sf)
    val rows = persisted.collect().map(_.toString).toSeq
    val inline = SparkEntry.queries("llm_knn_join_ivf")(s, sf)
      .collect().map(_.toString).toSeq
    assert(rows == inline,
      "persisted-index kNN join diverged from the inline-index form")
    val plan = persisted.queryExecution.executedPlan
    // the only tolerable nested-loop is the tiny queries×centroids model
    // scoring (k rows); the INDEX must never be a nested-loop side
    val idxBnlj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
          if j.collectLeaves().exists {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.metadata.get("Location").exists(_.contains("graft_ivf_idx"))
            case _ => false
          } => j
    }
    assert(idxBnlj.isEmpty, s"the index feeds a nested-loop join:\n$plan")
    // the probe join: a BroadcastHashJoin keyed on the PARTITION column,
    // whose index side feeds straight from the persisted layout's scan —
    // no exchange of index rows before the join (the plan's only
    // exchanges are the per-query window re-ranks downstream)
    val probeJoin = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("cent_id")) => j
    }
    assert(probeJoin.nonEmpty, s"no broadcast probe join on cent_id:\n$plan")
    val idxSide = probeJoin.head.children.find(_.collectLeaves().exists {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.get("Location").exists(_.contains("graft_ivf_idx"))
      case _ => false
    })
    assert(idxSide.nonEmpty, s"persisted-index scan not under the probe join:\n$plan")
    val shuffles = idxSide.get.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"index side shuffled before the probe join:\n$plan")
  }
}
