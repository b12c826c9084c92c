package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY §4 / the 100 TB contract): filters and
  * projections reach the parquet scan, small dims broadcast, global top-k
  * avoids a full sort, aggregates keep map-side partial stages. These are
  * the properties that decide whether a plan survives a 100× scale-up, so
  * they are pinned as tests, not left to eyeballing .explain(). */
class PlanSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no registry query plans an unpartitioned Window (single-reducer scale-killer)") {
    import org.apache.spark.sql.catalyst.plans.logical
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      plan.collect {
        case w: logical.Window if w.partitionSpec.isEmpty => name
      }.headOption
    }
    assert(offenders.isEmpty,
      s"queries with a global (unpartitioned) window: ${offenders.mkString(", ")}")
  }

  test("join_bucketed_colocated: sort-merge join with no exchange on the join keys") {
    val p = plan("join_bucketed_colocated")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      "bucketed fact join still shuffles its inputs:\n" + p)
  }

  test("join_bucketed_colocated_incr / join_asof_colocated_incr: the pins " +
      "survive MULTI-FILE buckets — zero exchange on the appended layouts") {
    // the incremental twins run over base-build + appendOnce-delta
    // layouts (fpb = 2 after the delta): the bucket CLUSTERING — and with
    // it every zero-exchange pin — must hold regardless of file count;
    // only the reported per-bucket sort order waits for compaction
    // (IncrementalLayoutSpec pins that half)
    val p = plan("join_bucketed_colocated_incr")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      "appended fact layout join shuffles its inputs:\n" + p)
    val pa = plan("join_asof_colocated_incr")
    assert(!pa.contains("Exchange hashpartitioning(user_id") &&
      !pa.contains("Exchange hashpartitioning(c_user"),
      "appended time-series as-of shuffles a side:\n" + pa)
  }

  test("stream_layout_ingest: the per-user aggregation rides the stream-" +
      "ingested layout's bucketing — zero exchange on user_id") {
    // the layout's buckets are multi-file after the streamed appends
    // (one file per micro-batch per touched bucket); the bucket
    // CLUSTERING must still carry the groupBy with no shuffle
    val p = plan("stream_layout_ingest")
    assert(!p.contains("Exchange hashpartitioning(user_id"),
      "stream-ingested layout aggregation shuffles on user_id:\n" + p)
  }

  test("join_star_colocated: no exchange and no broadcast on the fact⋈orders " +
      "and orders⋈customer edges") {
    val p = plan("join_star_colocated")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_custkey") &&
      !p.contains("Exchange hashpartitioning(c_custkey"),
      "co-located star join still shuffles a join key:\n" + p)
    // the customer relation must not appear at query time at all — its
    // attribute rides in the orders_cust_b join-index scan, so no
    // broadcast (and no scan) is built from customer
    assert(!p.contains("customer.parquet"),
      "customer scanned at query time:\n" + p)
    // exactly the two genuinely tiny dims (supplier, nation) broadcast
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") == 2, p)
    // the one-file-per-bucket sort order is trusted (r7): the SMJ inputs
    // must come straight off the bucketed scans with no per-query re-sort
    assert(!p.contains("Sort [l_orderkey") && !p.contains("Sort [o_orderkey"),
      "bucketed sort order not trusted — per-query re-sort of a fact side:\n" + p)
  }

  test("bench q3 layout twin: ZERO exchange anywhere — co-located merge " +
      "join, bucket-aligned aggregation, top-10 without a global sort — " +
      "and the same groups as the classic shape") {
    val p = Bench.q3Layout(spark, sf).queryExecution.executedPlan.toString
    // the whole query runs on the layouts' resident partitioning: the
    // merge join rides the bucket co-location (no exchange, no sort),
    // the (o_orderkey, o_orderdate) aggregate reuses the scan's
    // o_orderkey bucketing (o_orderkey determines the pair), and the
    // top-10 is TakeOrderedAndProject — so there is NO Exchange at all,
    // the shape that made the classic q3's unspillable shuffled-hash
    // build (r8 sf48: needed a 32 GB heap) unnecessary
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), "q3 layout plan still exchanges:\n" + p)
    assert(!p.contains("Sort [l_orderkey") && !p.contains("Sort [o_orderkey"),
      "bucketed sort order not trusted — per-query re-sort:\n" + p)
    assert(!p.contains("customer.parquet"),
      "customer scanned at query time (mktsegment rides the join index):\n" + p)
    // parity with the classic shape: same top-10 groups, revenues equal
    // to double-add-order tolerance
    val lay = Bench.q3Layout(spark, sf)
    val cls = Bench.q3Classic(spark, sf)
    val layRows = lay.collect().map(r => (r.getLong(0), r.get(1).toString) -> r.getDouble(2)).toMap
    val clsRows = cls.collect().map(r => (r.getLong(0), r.get(1).toString) -> r.getDouble(2)).toMap
    assert(layRows.keySet == clsRows.keySet,
      s"top-10 groups diverge: ${layRows.keySet} vs ${clsRows.keySet}")
    for ((k, v) <- layRows)
      assert(math.abs(v - clsRows(k)) <= math.abs(v) * 1e-9 + 1e-6,
        s"revenue diverges for $k: $v vs ${clsRows(k)}")
  }

  test("bench window_rank/sessionize layout twins: the window rides the " +
      "resident partitioning — zero exchange — and matches the classic rows") {
    // window_rank over orders_bc: the scan's o_custkey bucketing
    // satisfies the window's ClusteredDistribution, so the only work
    // above the scan is the per-bucket sort + window + filter
    val wp = Bench.windowRankLayout(spark, sf).queryExecution.executedPlan.toString
    assert(!wp.contains("Exchange"),
      "window_rank layout form still exchanges:\n" + wp)
    // sessionize over events_bu: bucketing + within-bucket (user_id, ts,
    // event_id) sort satisfy BOTH window requirements — no exchange and
    // no sort in the deepest (scan→windows) segment; the only exchange
    // anywhere would be the final session agg's, which the same
    // partitioning also covers
    val sp = Bench.sessionizeLayout(spark, sf).queryExecution.executedPlan.toString
    assert(!sp.contains("Exchange"),
      "sessionize layout form still exchanges:\n" + sp)
    assert(!sp.contains("Sort [user_id"),
      "sessionize layout form re-sorts the resident order:\n" + sp)
    // parity with the classic rows (exact: same rows, no double-reorder
    // sensitivity — rank ties are broken by the unique o_orderkey, and
    // the session aggregate's doubles sum over the SAME per-group rows
    // in layout-sorted order on both sides... compare value-insensitive
    // columns exactly and the double with tolerance)
    val wGot = Bench.windowRankLayout(spark, sf)
      .select("o_orderkey", "rn").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val wWant = Bench.windowRankClassic(spark, sf)
      .select("o_orderkey", "rn").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(wGot == wWant && wGot.nonEmpty,
      s"window_rank layout/classic diverge: ${(wGot -- wWant).take(3)} / ${(wWant -- wGot).take(3)}")
    def sess(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet
    val sGot = sess(Bench.sessionizeLayout(spark, sf))
    val sWant = sess(Bench.sessionizeClassic(spark, sf))
    assert(sGot == sWant && sGot.nonEmpty,
      s"sessionize layout/classic diverge: ${(sGot -- sWant).take(3)} / ${(sWant -- sGot).take(3)}")
    // …and the double aggregate too (keyed per session, tolerance for
    // add-order): the one column a silent layout-path corruption would hit
    def sums(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "session_start", "sum_value")
      .collect().map(r => (r.getLong(0), r.get(1).toString) -> r.getDouble(2)).toMap
    val (vGot, vWant) = (sums(Bench.sessionizeLayout(spark, sf)),
      sums(Bench.sessionizeClassic(spark, sf)))
    assert(vGot.keySet == vWant.keySet)
    for ((k, v) <- vGot)
      assert(math.abs(v - vWant(k)) <= math.abs(v) * 1e-9 + 1e-9,
        s"sum_value diverges for $k: $v vs ${vWant(k)}")
  }

  test("bench q5 headline: the co-located star plan — zero join-key exchange, " +
      "no customer scan, only the two tiny dims broadcast") {
    // the r6 verdict's flagship item 2: the headline q5_join5 must run
    // the layout-aware plan whose sf12 win (4.81 vs 7.11 s) the classic
    // broadcast row under-represented; same pins as join_star_colocated
    val p = Bench.q5(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_custkey") &&
      !p.contains("Exchange hashpartitioning(c_custkey"),
      "bench q5 still shuffles a join key:\n" + p)
    assert(!p.contains("customer.parquet"), "customer scanned at query time:\n" + p)
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") == 2, p)
    assert(!p.contains("Sort [l_orderkey") && !p.contains("Sort [o_orderkey"),
      "bucketed sort order not trusted — per-query re-sort of a fact side:\n" + p)
  }

  test("join_custkey_colocated: custkey agg and customer join both ride the " +
      "bucketing — zero custkey exchange") {
    val p = plan("join_custkey_colocated")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(o_custkey") &&
      !p.contains("Exchange hashpartitioning(c_custkey"),
      "co-located custkey rollup still shuffles a join/group key:\n" + p)
    assert(!p.contains("BroadcastHashJoin"),
      "the layout row must not fall back to a broadcast join:\n" + p)
  }

  test("join_asof_colocated: the native as-of merge runs straight off the " +
      "time-series layout — zero exchange, zero sort on either side") {
    val p = plan("join_asof_colocated")
    assert(p.contains("AsOfJoin"), p)
    // the layout satisfies the exec's required clustering (bucketed on
    // user_id) AND ordering (sorted (user_id, ts) within buckets), so
    // EnsureRequirements must insert nothing below the merge; the only
    // exchange left is the KB-scale presentation sort above it
    val belowJoin = p.substring(p.indexOf("AsOfJoin"))
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      "as-of inputs still shuffled:\n" + p)
    assert(!belowJoin.contains("Sort ["),
      "as-of inputs re-sorted — the layout's resident order is not trusted:\n" + p)
  }

  test("join_interval_colocated: interval join as a zero-exchange zero-sort " +
      "merge join over the time-series layout") {
    val p = plan("join_interval_colocated")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(user_id") &&
      !p.contains("Exchange hashpartitioning(su"),
      "interval join still shuffles the entity key:\n" + p)
    assert(!p.contains("Sort [user_id") && !p.contains("Sort [su"),
      "interval join re-sorts a layout side:\n" + p)
  }

  test("join_range_banded: the pure-range join rides the band layout — merge " +
      "join on the band, no nested-loop, no banded-side exchange or sort") {
    val p = plan("join_range_banded")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "pure-range join fell back to probe×corpus nested loop:\n" + p)
    assert(!p.contains("Exchange hashpartitioning(band#"),
      "banded (corpus) side still shuffled:\n" + p)
    assert(!p.contains("Sort [band#"),
      "banded side re-sorted — the layout's resident band order is not trusted:\n" + p)
  }

  test("join_bloom_runtime: bloom filter injected on the fact side of the shuffle join") {
    val p = plan("join_bloom_runtime")
    assert(p.toLowerCase.contains("might_contain"),
      "no runtime bloom filter in the fact-side plan:\n" + p)
    assert(!p.contains("BroadcastHashJoin"),
      "bloom row must exercise the shuffle-join regime (broadcast disabled):\n" + p)
  }

  test("filter_where: predicate pushed to parquet + column pruning") {
    val p = plan("filter_where")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), p)
    assert(!p.contains("l_extendedprice"), "scan reads columns the query never uses:\n" + p)
  }

  test("join_broadcast_hash: dims broadcast, no shuffle join") {
    val p = plan("join_broadcast_hash")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("topk_global: TakeOrderedAndProject, not a global sort") {
    val p = plan("topk_global")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("agg_multi_stat: two-phase hash aggregation (map-side partial)") {
    val p = plan("agg_multi_stat")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("join_broadcast_residual: hashed relation stays SINGLE-long-key — the " +
      "extra cross-side equality is a residual predicate, not a join key") {
    val p = plan("join_broadcast_residual")
    // single-key form prints one attribute per key list; the composite
    // form this guards against prints [l_suppkey#N, (l_linenumber#M % 25)]
    assert("BroadcastHashJoin \\[l_suppkey#\\d+L?\\], \\[s_suppkey#\\d+L?\\]".r
      .findFirstIn(p).isDefined,
      "broadcast keys are not the single long key:\n" + p)
    // and the equality actually survives as a residual condition
    assert(p.contains("% 25"), "residual predicate missing from the plan:\n" + p)
  }

  test("MinHashIndex probe: batch bands broadcast into a single-long-key " +
      "hash join; the persisted band index is NEVER shuffled or sorted") {
    // the registry row localCheckpoints the candidate set (its plan
    // truncates there), so the pin re-builds the probe join exactly as
    // llm_dedup_minhash_incremental does and asserts on ITS plan
    import org.apache.spark.sql.functions.{broadcast, col}
    val all = spark.read.parquet(graft.Fixtures.neardupCorpus(spark, sf))
    val corpus = all.filter(col("id") % 1000000000L < 1000000L)
    val batch = all.filter(col("id") % 1000000000L >= 1000000L)
    val (bandsT, _) = graft.layouts.MinHashIndex.ensure(
      spark, sf, corpus, "neardup_repbase", 5, 64, 16, 4, Seq("documents"))
    val (bBands, _) = graft.layouts.MinHashIndex.bandRows(batch, 5, 64, 16, 4)
    val cand = spark.table(bandsT).withColumnRenamed("rep", "crep")
      .join(broadcast(bBands.select(col("bkey64"), col("rep").as("brep"))), "bkey64")
      .select(col("brep"), col("crep")).distinct()
    val p = cand.queryExecution.executedPlan.toString
    // the candidate join is a BroadcastHashJoin on the SINGLE bigint
    // band key — the LongHashedRelation probe (~12 ns/row), not a
    // string-keyed UnsafeHashedRelation and not an SMJ whose merge
    // machinery runs per index row
    assert("BroadcastHashJoin \\[bkey64".r.findFirstIn(p).isDefined,
      "probe join is not a single-long-key broadcast hash join:\n" + p)
    // and the corpus-sized index side never moves: no exchange hashes
    // the band key — the only allowed movement is the KB-scale batch
    // side's BroadcastExchange
    assert(!p.contains("Exchange hashpartitioning(bkey64"),
      "band index shuffled on bkey64:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "probe join degraded to a sort-merge join:\n" + p)
  }

  test("MinHashIndex probe: a small batch's key set FILE-PRUNES the band " +
      "and rep scans — only touched bucket files are read, exactly") {
    import org.apache.spark.sql.functions.{col, expr, hash, lit, pmod}
    // (a) the pruning's correctness foundation: the driver-side bucket
    // derivation must EQUAL the engine's HashPartitioning derivation
    // (pmod(Murmur3Hash(seed 42), n)) — a divergence would silently lose
    // matches, so pin it on adversarial longs at several bucket counts
    val probeKeys = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      -3415263787253978728L, 7564225316372L)
    import spark.implicits._
    for (n <- Seq(7, 64, 256, 1024)) {
      val engine = probeKeys.toDF("k")
        .select(col("k"), pmod(hash(col("k")), lit(n)).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      for (k <- probeKeys)
        assert(graft.layouts.MinHashIndex.bucketOfLong(k, n) == engine(k),
          s"bucketOfLong($k, $n) diverges from the engine's bucket id")
    }
    val all = spark.read.parquet(graft.Fixtures.neardupCorpus(spark, sf))
    val corpus = all.filter(col("id") % 1000000000L < 1000000L)
    // 256 buckets (own tag — coexists with the registry layout's default)
    // so a 2-doc batch (≤ 32 keys) touches a strict file subset — the
    // 100 TB keys ≪ files regime in miniature
    val (bandsT, repsT) = graft.layouts.MinHashIndex.ensure(
      spark, sf, corpus, "neardup_prunespec", 5, 64, 16, 4, Seq("documents"),
      buckets = 256)
    val batch = all.filter(col("id") % 1000000000L >= 1000000L).limit(2)
    val (pairs, _) = graft.layouts.MinHashIndex.probe(
      spark, bandsT, repsT, batch, 5, 64, 16, 4, threshold = 0.5)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (b) the probe telemetry reports the file-pruned path on BOTH scans,
    // with a strict subset of files read
    val Some((bandStats, repStats)) = graft.layouts.MinHashIndex.lastProbeStats
    assert(bandStats.pruned && bandStats.selectedFiles < bandStats.totalFiles,
      s"band scan not file-pruned: $bandStats")
    assert(repStats.pruned && repStats.selectedFiles < repStats.totalFiles,
      s"rep fetch not file-pruned: $repStats")
    // totals reflect NON-EMPTY buckets only (an empty bucket writes no
    // file): 250 corpus reps over 256 buckets leave some empty
    assert(bandStats.totalFiles >= 200 && repStats.totalFiles >= 200,
      s"layout not at the spec'd bucket count: $bandStats / $repStats")
    // (c) pruning is EXACT, not approximate: the pruned probe's verified
    // pairs equal the exhaustive all-pairs jaccard over the same corpus
    graft.functions.GraftFunctions.register(spark)
    val bSh = batch
      .withColumn("bnorm", graft.functions.TextOps.normalize(col("text")))
      .groupBy(col("bnorm")).agg(org.apache.spark.sql.functions.min(col("id")).as("brep"))
      .select(col("brep"), expr("word_shingles(bnorm, 5)").as("bsh"))
    val cSh = corpus
      .withColumn("cnorm", graft.functions.TextOps.normalize(col("text")))
      .groupBy(col("cnorm")).agg(org.apache.spark.sql.functions.min(col("id")).as("crep"))
      .select(col("crep"), expr("word_shingles(cnorm, 5)").as("csh"))
    val scored = bSh.crossJoin(cSh)
      .select(col("brep"), col("crep"), expr("jaccard_sim(bsh, csh)").as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val want = scored.map(_._1).toSet
    // banding may legitimately miss MID-jaccard pairs (16 bands × 4 rows:
    // detect prob 0.645 at j = 0.5), so the pins are soundness — every
    // probe pair is a true ≥-threshold pair — and recall on the
    // HIGH-jaccard pairs, whose band-collision miss probability is ≤ 4e-8
    // (and the whole pipeline is deterministic, so this is a stable pin)
    val wantHigh = scored.filter(_._2 >= 0.9).map(_._1).toSet
    assert(wantHigh.nonEmpty, "fixture lost its planted near-dups: empty oracle")
    assert(got.subsetOf(want),
      s"pruned probe emitted a sub-threshold pair: got $got want $want")
    assert(wantHigh.subsetOf(got),
      s"pruned probe LOST a high-jaccard pair (pruning dropped a match?): " +
        s"got $got wantHigh $wantHigh")
  }

  test("join_lookup_format: tiny VALUES dim broadcast") {
    val p = plan("join_lookup_format")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("whole-stage codegen covers the row-logic pipeline") {
    // AQE prints stages only once final: execute, then inspect
    val df = SparkEntry.queries("derive_columns")(spark, sf)
    df.collect()  // collect (not count) so THIS QueryExecution is the one that ran
    val p = df.queryExecution.executedPlan.toString
    // codegen stages print as "*(n) Operator" in simple mode
    assert("\\*\\(\\d+\\) ".r.findFirstIn(p).isDefined, p)
  }

  test("flagship entry: broadcast the filtered dim, shuffle only the facts") {
    val p = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
