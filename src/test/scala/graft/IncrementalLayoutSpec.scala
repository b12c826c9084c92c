package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-maintenance lifecycle of the RESIDENT layouts (r9
  * verdict item 1): a nightly 100 TB warehouse appends deltas to its
  * bucketed fact / join-index / time-series layouts — it does not rebuild
  * them per vintage. Pins, per layout family:
  *
  *  - base build + N `Bucketed.appendOnce` batches reconstruct the full
  *    table EXACTLY (query results equal the raw-table recompute);
  *  - the bucket CLUSTERING survives multi-file buckets — consumer joins
  *    / aggregations / windows stay zero-EXCHANGE right through the
  *    appends (the property the layouts exist for);
  *  - fragmentation is bounded by append count (≤ 1 new file per bucket
  *    per append) and `Bucketed.compact` returns the family to one file
  *    per bucket with results invariant and the reported per-bucket sort
  *    order restored (no per-query SortExec on the layout sides);
  *  - exactly-once: a retried batch tag is a no-op, and the stamp
  *    survives compaction (the rewrite contains the batch's rows);
  *  - torn appends recover: a failure mid-family drops every member
  *    table so a half-appended family is never served.
  *
  * The same lifecycle is driver-oracled end-to-end by the
  * `join_bucketed_colocated_incr` / `join_asof_colocated_incr` registry
  * rows (DuckDB recomputes over the full raw tables). */
class IncrementalLayoutSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** slice i of 8 by a deterministic hash of the key column */
  private def slice(df: DataFrame, key: String, i: Int) =
    df.filter(pmod(xxhash64(col(key)), lit(8)) === i)
  private def slices(df: DataFrame, key: String, is: Seq[Int]) =
    df.filter(pmod(xxhash64(col(key)), lit(8)).isin(is.map(_.toLong): _*))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("fact family: base + 3 appends ≡ raw tables; zero-exchange throughout; " +
      "compact restores one file per bucket, trusted sort order, and results") {
    import graft.layouts.Bucketed
    Bucketed.invalidate(spark, "o_ispec")
    Bucketed.invalidate(spark, "l_ispec")
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val Seq(oT, lT) = Bucketed.ensure(spark, dir, Seq(
      Bucketed.Spec("o_ispec", slices(orders, "o_orderkey", 0 to 4), "o_orderkey",
        srcTables = Seq("orders")),
      Bucketed.Spec("l_ispec", slices(lineitem, "l_orderkey", 0 to 4), "l_orderkey",
        srcTables = Seq("lineitem"))), buckets = 4)

    // decimal sum: exact regardless of the (layout-dependent) summation order
    def colocatedAgg(ot: String, lt: String): DataFrame =
      spark.table(lt).hint("merge")
        .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice").cast("decimal(18,4)")).as("s"))
    val oracle = sortedRows(
      lineitem.hint("merge").join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice").cast("decimal(18,4)")).as("s")))

    // three nightly batches, each a FAMILY append under one marker window
    for (i <- 5 to 7) {
      val ran = Bucketed.appendOnce(spark, s"batch-$i", Seq(
        oT -> slice(orders, "o_orderkey", i), lT -> slice(lineitem, "l_orderkey", i)))
      assert(ran, s"batch-$i should apply")
      // fragmentation bounded by APPEND COUNT: ≤ 1 new file per bucket per batch
      assert(Bucketed.maxFilesPerBucket(spark, Seq(oT, lT)) <= 1 + (i - 4))
      // zero-exchange survives multi-file buckets: clustering is reported
      // regardless of file count, only the sort order is ceded
      val q = colocatedAgg(oT, lT)
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        s"appended layout join shuffles after batch-$i:\n" + p)
      assert(p.contains("SortMergeJoin"), p)
    }
    assert(sortedRows(colocatedAgg(oT, lT)) == oracle,
      "base + 3 appends must reconstruct the raw tables exactly")
    // retried batch: exactly-once no-op
    val before = spark.table(oT).count()
    assert(!Bucketed.appendOnce(spark, "batch-5", Seq(
      oT -> slice(orders, "o_orderkey", 5), lT -> slice(lineitem, "l_orderkey", 5))))
    assert(spark.table(oT).count() == before)

    // maintenance: fragmented → compact → one file per bucket, results
    // invariant, per-bucket sort order trusted again (no SortExec on the
    // layout sides of the merge join)
    assert(Bucketed.maxFilesPerBucket(spark, Seq(oT, lT)) > 1)
    assert(Bucketed.compactIfFragmented(spark, Seq(oT, lT), maxFiles = 2))
    assert(Bucketed.maxFilesPerBucket(spark, Seq(oT, lT)) == 1)
    assert(sortedRows(colocatedAgg(oT, lT)) == oracle, "compaction changed results")
    val pc = colocatedAgg(oT, lT).queryExecution.executedPlan.toString
    assert(!pc.contains("Exchange hashpartitioning(l_orderkey") &&
      !pc.contains("Exchange hashpartitioning(o_orderkey"), pc)
    assert(!pc.contains("Sort [l_orderkey") && !pc.contains("Sort [o_orderkey"),
      "compacted layout still re-sorts per query — sort order not trusted:\n" + pc)
    // the exactly-once stamps survive compaction: the rewrite CONTAINS the
    // applied batches' rows, so re-running a batch must stay a no-op
    assert(!Bucketed.appendOnce(spark, "batch-6", Seq(
      oT -> slice(orders, "o_orderkey", 6), lT -> slice(lineitem, "l_orderkey", 6))))
    assert(spark.table(oT).count() == orders.count())
    // idempotent ensure: a re-ensure serves the appended+compacted layout
    // (completion marker present), never a stale base rebuild
    val Seq(oT2, _) = Bucketed.ensure(spark, dir, Seq(
      Bucketed.Spec("o_ispec", slices(orders, "o_orderkey", 0 to 4), "o_orderkey",
        srcTables = Seq("orders")),
      Bucketed.Spec("l_ispec", slices(lineitem, "l_orderkey", 0 to 4), "l_orderkey",
        srcTables = Seq("lineitem"))), buckets = 4)
    assert(oT2 == oT && spark.table(oT2).count() == orders.count())
  }

  test("join-index delta: appending delta-orders ⋈ customer keeps the q3/q5 " +
      "carrier exact and exchange-free") {
    import graft.layouts.Bucketed
    Bucketed.invalidate(spark, "oc_ispec")
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    def enrich(o: DataFrame): DataFrame = o
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .join(customer.select("c_custkey", "c_nationkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("c_nationkey"), col("c_mktsegment"))
    val Seq(ocT) = Bucketed.ensure(spark, dir, Seq(
      Bucketed.Spec("oc_ispec", enrich(slices(orders, "o_orderkey", 0 to 6)),
        "o_orderkey", srcTables = Seq("orders", "customer"))), buckets = 4)
    // the nightly join-index delta: ONLY the delta orders pay the customer
    // join (batch-proportional — the base index is never recomputed)
    Bucketed.appendOnce(spark, "delta-7", Seq(ocT -> enrich(slice(orders, "o_orderkey", 7))))
    assert(sortedRows(spark.table(ocT)) == sortedRows(enrich(orders)),
      "join-index base + delta must equal the full orders ⋈ customer")
    // q3-ish consumer stays exchange-free on the orderkey edge
    Bucketed.invalidate(spark, "l_ispec2")
    val Seq(lT) = Bucketed.ensure(spark, dir, Seq(
      Bucketed.Spec("l_ispec2", Tables.lineitem(spark, dir), "l_orderkey",
        srcTables = Seq("lineitem"))), buckets = 4)
    val q = spark.table(lT).select("l_orderkey", "l_extendedprice").hint("merge")
      .join(spark.table(ocT).filter(col("c_mktsegment") === "BUILDING")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(col("l_extendedprice")).as("rev"))
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      "appended join index no longer carries the zero-exchange q3 shape:\n" + p)
  }

  test("time-series layout: appends keep window/session consumers exact and " +
      "zero-exchange; compact removes the per-query sort") {
    import graft.layouts.Bucketed
    import org.apache.spark.sql.expressions.Window
    Bucketed.invalidate(spark, "ev_ispec")
    val events = Tables.events(spark, dir)
    val Seq(evT) = Bucketed.ensure(spark, dir, Seq(
      Bucketed.Spec("ev_ispec", slices(events, "event_id", 0 to 5), "user_id",
        srcTables = Seq("events"), sortCols = Seq("user_id", "ts", "event_id"))),
      buckets = 4)
    for (i <- 6 to 7)
      Bucketed.appendOnce(spark, s"ev-$i", Seq(evT -> slice(events, "event_id", i)))

    def sessions(src: DataFrame): DataFrame = {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      src.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("ns", when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
        .withColumn("sid", sum(col("ns")).over(run))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts")).as("st"), count(lit(1)).as("n"))
    }
    val oracle = sortedRows(sessions(events))
    assert(sortedRows(sessions(spark.table(evT))) == oracle)
    // multi-file buckets: the window's ClusteredDistribution is still
    // satisfied by the scan — zero exchange below the final agg; the
    // in-bucket sort is the temporary price of fragmentation
    val pAppended = sessions(spark.table(evT)).queryExecution.executedPlan.toString
    assert(!pAppended.contains("Exchange hashpartitioning(user_id"),
      "appended time-series layout re-shuffles the window:\n" + pAppended)
    assert(Bucketed.maxFilesPerBucket(spark, Seq(evT)) > 1)
    Bucketed.compactIfFragmented(spark, Seq(evT), maxFiles = 2)
    assert(Bucketed.maxFilesPerBucket(spark, Seq(evT)) == 1)
    assert(sortedRows(sessions(spark.table(evT))) == oracle)
    val pc = sessions(spark.table(evT)).queryExecution.executedPlan.toString
    assert(!pc.contains("Exchange hashpartitioning(user_id"), pc)
    assert(!pc.contains("Sort [user_id"),
      "compacted time-series layout still sorts per query:\n" + pc)
  }

  test("schema guard: a delta whose (name, type) schema diverges from the " +
      "layout is refused BEFORE any file lands; a torn mid-family failure is " +
      "ROLLED BACK to the pre-append state, not wiped") {
    import graft.layouts.Bucketed
    Bucketed.invalidate(spark, "torn_ispec")
    val orders = Tables.orders(spark, dir)
    def ensure() = Bucketed.ensure(spark, dir, Seq(
      Bucketed.Spec("torn_ispec_a", slices(orders, "o_orderkey", 0 to 6), "o_orderkey",
        srcTables = Seq("orders")),
      Bucketed.Spec("torn_ispec_b", slices(orders, "o_orderkey", 0 to 6), "o_orderkey",
        srcTables = Seq("orders"))), buckets = 4)
    val Seq(aT, bT) = ensure()
    val aBefore = sortedRows(spark.table(aT))
    val bBefore = sortedRows(spark.table(bT))

    // 1. SCHEMA GUARD (r10 verdict item 5): a dropped column is refused
    // with a layout-terms message before ANY member writes — member a's
    // valid delta must not land either (the family moves together)
    val refusal = intercept[IllegalArgumentException] {
      Bucketed.append(spark, Seq(
        aT -> slice(orders, "o_orderkey", 7),
        bT -> slice(orders, "o_orderkey", 7).drop("o_totalprice")))
    }
    assert(refusal.getMessage.contains("does not match layout") &&
      refusal.getMessage.contains("o_totalprice"), refusal.getMessage)
    assert(sortedRows(spark.table(aT)) == aBefore,
      "a refused family append must not have written member a's delta")
    // a retyped column is refused too
    val retyped = intercept[IllegalArgumentException] {
      Bucketed.append(spark, Seq(aT -> slice(orders, "o_orderkey", 7)
        .withColumn("o_totalprice", col("o_totalprice").cast("string"))))
    }
    assert(retyped.getMessage.contains("does not match layout"), retyped.getMessage)

    // 2. TORN MID-FAMILY failure (after both writes, inside the marker
    // window): the guard RESTORES the pre-append files and re-certifies —
    // applied history survives, and the failed batch re-drives cleanly
    val boom = intercept[RuntimeException] {
      Bucketed.append(spark, Seq(
        aT -> slice(orders, "o_orderkey", 7), bT -> slice(orders, "o_orderkey", 7)),
        onCommit = () => throw new RuntimeException("simulated commit-time crash"))
    }
    assert(boom.getMessage.contains("simulated commit-time crash"))
    assert(spark.catalog.tableExists(aT) && spark.catalog.tableExists(bT),
      "a torn family append must restore, not drop, the members")
    assert(sortedRows(spark.table(aT)) == aBefore &&
      sortedRows(spark.table(bT)) == bBefore,
      "restored family content diverges from the pre-append state")
    // certified: re-ensure serves the same layout without rebuilding
    assert(ensure() == Seq(aT, bT))
    // the failed batch's tag was never stamped → the re-drive applies
    assert(Bucketed.appendOnce(spark, "redrive-7", Seq(
      aT -> slice(orders, "o_orderkey", 7), bT -> slice(orders, "o_orderkey", 7))))
    assert(sortedRows(spark.table(aT)) ==
      sortedRows(slices(orders, "o_orderkey", 0 to 7)))
  }
}
