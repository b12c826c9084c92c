package graft

import graft.etl.Pq
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization pins (llm_embed_pq is no-oracle-by-design — k-means
  * — so this spec is its evidence): determinism, a JVM argmin recompute of
  * the codes, decode consistency of the carried reconstruction statistics,
  * and codebook-beats-global-mean reconstruction quality. */
class PqSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val (dims, m, k, iters) = (64, 8, 16, 4)

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))

  private lazy val books = Pq.train(vecs, dims, m, k, iters)

  test("train: deterministic across reruns; m codebooks of k centroids of dims/m") {
    val again = Pq.train(vecs, dims, m, k, iters)
    assert(books == again)
    assert(books.size == m)
    assert(books.forall(_.size == k))
    assert(books.forall(_.forall(_._2.size == dims / m)))
    assert(books.forall(b => b.map(_._1) == (0L until k.toLong)))
  }

  test("encode: codes match a JVM argmin recompute (same negscore formula, same ties)") {
    val sub = dims / m
    val rows = Pq.encodeWithStats(vecs, dims, books)
      .select(col("vec_id"), col("v"), col("codes"))
      .orderBy(col("vec_id").asc).limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val codes = r.getSeq[Long](2)
      val expected = (0 until m).map { j =>
        val sv = v.slice(j * sub, (j + 1) * sub)
        // identical arithmetic to Pq.scoredStruct: dot accumulated in
        // element order (the dot_fast loop), halfcc from the driver fold
        books(j).sortBy(_._1).map { case (cid, cv) =>
          val halfcc = cv.map(x => x * x).sum / 2.0
          var dot = 0.0
          var i = 0
          while (i < sub) { dot += sv(i) * cv(i); i += 1 }
          (halfcc - dot, cid)
        }.min._2
      }
      assert(codes == expected, s"vec ${r.getLong(0)}: $codes vs $expected")
    }
  }

  test("recon stats: recon_dot/recon_norm2 agree with an explicit decode") {
    val sub = dims / m
    val rows = Pq.encodeWithStats(vecs, dims, books)
      .orderBy(col("vec_id").asc).limit(50)
      .select(col("v"), col("codes"), col("recon_dot"), col("recon_norm2"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val codes = r.getSeq[Long](1)
      val recon = (0 until m).flatMap(j => books(j).sortBy(_._1).apply(codes(j).toInt)._2)
      val dot = v.zip(recon).map { case (a, b) => a * b }.sum
      val n2 = recon.map(x => x * x).sum
      assert(math.abs(dot - r.getDouble(2)) < 1e-9)
      assert(math.abs(n2 - r.getDouble(3)) < 1e-9)
    }
  }

  test("native pq_encode is bit-identical to the struct composition it " +
      "replaced — codes AND recon stats (the r14 parity witness: the " +
      "composition Janino-OOMs at the 768-dim design point, so the native " +
      "node carries all encode paths)") {
    val sub = dims / m
    val bests = books.zipWithIndex.map { case (book, j) =>
      Pq.scoredStruct(slice(col("v"), j * sub + 1, sub), book).as(s"_b$j")
    }
    val old = vecs.select(col("vec_id") +: bests: _*)
      .select(col("vec_id"),
        array(books.indices.map(j => col(s"_b$j").getField("cid")): _*).as("codes"),
        books.indices.map(j => col(s"_b$j").getField("dot")).reduce(_ + _).as("recon_dot"),
        books.indices.map(j => col(s"_b$j").getField("cc")).reduce(_ + _).as("recon_norm2"))
    val neu = Pq.encodeWithStats(vecs, dims, books)
      .select("vec_id", "codes", "recon_dot", "recon_norm2")
    val joined = neu.as("n").join(old.as("o"), "vec_id")
    assert(joined.count() == vecs.count())
    // bit-exact: =!= on the doubles, no tolerance
    val diff = joined.filter(col("n.codes") =!= col("o.codes") ||
      col("n.recon_dot") =!= col("o.recon_dot") ||
      col("n.recon_norm2") =!= col("o.recon_norm2"))
    assert(diff.count() == 0, s"diverging rows:\n${diff.limit(5).collect().mkString("\n")}")
  }

  test("pq_encode at composition-killing m×k (m=32, k=256 → 8192 pairs): " +
      "plan stays O(1), codes match the JVM argmin recompute") {
    val (m2, k2) = (32, 256)
    val sub = dims / m2
    val books2 = Pq.train(vecs, dims, m2, k2, iters = 1)
    val rows = Pq.encodeWithStats(vecs, dims, books2)
      .select(col("vec_id"), col("v"), col("codes"))
      .orderBy(col("vec_id").asc).limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val codes = r.getSeq[Long](2)
      val expected = (0 until m2).map { j =>
        val sv = v.slice(j * sub, (j + 1) * sub)
        books2(j).sortBy(_._1).map { case (cid, cv) =>
          val halfcc = cv.map(x => x * x).sum / 2.0
          var dot = 0.0
          var i = 0
          while (i < sub) { dot += sv(i) * cv(i); i += 1 }
          (halfcc - dot, cid)
        }.min._2
      }
      assert(codes == expected, s"vec ${r.getLong(0)}: $codes vs $expected")
    }
  }

  test("pq_encode null contract: a null vector yields a NULL struct") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq.fill(dims)(0.5))), (2L, None))
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val out = Pq.encodeWithStats(df, dims, books)
      .orderBy("vec_id").select("codes").collect()
    assert(out(0).getSeq[Long](0).size == m)
    assert(out(1).isNullAt(0))
  }

  test("pq_encode doGenCode: the generated projection is BIT-identical to " +
      "interpreted eval — real vectors, NaN vectors, and every null-contract " +
      "edge (r15: CodegenFallback replaced by an emitted loop)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val flat = books.flatMap(_.sortBy(_._1).flatMap(_._2))
    val hc = books.flatMap(_.sortBy(_._1).map { case (_, cv) => cv.map(x => x * x).sum / 2.0 })
    val kk = books.head.size
    val enc = graft.functions.PqEncode(
      BoundReference(0, ArrayType(DoubleType, containsNull = true), nullable = true),
      Literal.create(flat, ArrayType(DoubleType)),
      Literal.create(hc, ArrayType(DoubleType)),
      Literal(kk))
    val proj = GenerateUnsafeProjection.generate(Seq(enc)) // codegen path, no fallback
    val real = vecs.orderBy(col("vec_id").asc).limit(100).collect()
      .map(_.getSeq[Double](1).map(x => x: java.lang.Double))
    val edges: Seq[Seq[java.lang.Double]] = Seq(
      null, // null vector
      Seq.fill(dims - 1)(0.5: java.lang.Double), // length mismatch
      (Seq.fill(dims - 1)(0.5: java.lang.Double) :+ (null: java.lang.Double)), // null element
      Seq.fill(dims)(Double.NaN: java.lang.Double)) // NaN vector (argmin tie path)
    (real.toSeq ++ edges).foreach { vals =>
      val in = InternalRow(
        if (vals == null) null else new GenericArrayData(vals.toArray[Any]))
      val gen = proj(in).copy()
      val interp = enc.eval(in)
      if (interp == null) assert(gen.isNullAt(0), s"codegen non-null for $vals")
      else {
        assert(!gen.isNullAt(0))
        val gs = gen.getStruct(0, 3)
        val is = interp.asInstanceOf[InternalRow]
        assert(gs.getArray(0).toLongArray.toSeq == is.getArray(0).toLongArray.toSeq)
        // bit-exact doubles
        assert(java.lang.Double.doubleToRawLongBits(gs.getDouble(1)) ==
          java.lang.Double.doubleToRawLongBits(is.getDouble(1)))
        assert(java.lang.Double.doubleToRawLongBits(gs.getDouble(2)) ==
          java.lang.Double.doubleToRawLongBits(is.getDouble(2)))
      }
    }
  }

  test("encodeCol pins codebook-cid contiguity: non-contiguous cids throw " +
      "instead of silently diverging from the nearestCode path (r14 ADVICE: " +
      "the native node returns the POSITIONAL index as the code, " +
      "scoredStruct the stored cid — equivalent only when cids = 0..k-1)") {
    val shifted: Seq[Pq.Codebook] = books.map(_.map { case (cid, cv) => (cid + 5L, cv) })
    val e = intercept[IllegalArgumentException](Pq.encodeCol(shifted))
    assert(e.getMessage.contains("0..k-1"))
  }

  test("pq_encode analysis rejects an empty codebook matrix (sub == 0 " +
      "previously passed the modulo checks and eval'd to all-NULL — r14 ADVICE)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, Seq.fill(dims)(0.5))).toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    // Dataset construction analyzes eagerly, so the select itself throws
    val e = intercept[org.apache.spark.sql.AnalysisException](
      df.select(call_function("pq_encode",
        col("v"), typedlit(Seq.empty[Double]), typedlit(Seq.fill(k)(0.0)), lit(k))))
    assert(e.getMessage.contains("pq_encode"))
  }

  test("quality: codebook reconstruction beats the global-mean baseline") {
    val all = vecs.select(col("v")).collect().map(_.getSeq[Double](0))
    val mean = (0 until dims).map(d => all.map(_(d)).sum / all.length)
    val baseline = all.map(v => v.zip(mean).map { case (a, b) => (a - b) * (a - b) }.sum).sum / all.length
    val sub = dims / m
    val pqErr = Pq.encodeWithStats(vecs, dims, books)
      .select(col("v"), col("codes")).collect().map { r =>
        val v = r.getSeq[Double](0)
        val codes = r.getSeq[Long](1)
        val recon = (0 until m).flatMap(j => books(j).sortBy(_._1).apply(codes(j).toInt)._2)
        v.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
      }
    val meanPq = pqErr.sum / pqErr.length
    assert(meanPq < baseline,
      s"PQ mean L2² $meanPq should beat global-mean baseline $baseline")
  }

  test("adc: top-10 via code lookups stays within the exact brute-force top-50") {
    val adc = SparkEntry.queries("llm_ann_pq_adc")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(adc.length == 10)
    // deterministic across reruns
    val again = SparkEntry.queries("llm_ann_pq_adc")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(adc.toSeq == again.toSeq)
    // recall containment against the exact scan (the ann_ivf convention)
    val e = vecs
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val top50 = e.crossJoin(broadcast(q))
      .select(col("vec_id"), VectorOps.cosine(col("v"), col("qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id").asc).limit(50)
      .collect().map(_.getLong(0)).toSet
    val hits = adc.map(_._1).count(top50.contains)
    assert(hits >= 5, s"only $hits/10 ADC results inside exact top-50: ${adc.mkString(",")}")
  }

  test("ivfpq: probed-cell ADC top-10 within exact top-50; pruning is real") {
    val r = SparkEntry.queries("llm_ann_ivfpq")(spark, sf)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(r.length == 10)
    val e = vecs
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val top50 = e.crossJoin(broadcast(q))
      .select(col("vec_id"), VectorOps.cosine(col("v"), col("qv")).as("c"))
      .orderBy(col("c").desc, col("vec_id").asc).limit(50)
      .collect().map(_.getLong(0)).toSet
    val hits = r.map(_._1).count(top50.contains)
    assert(hits >= 5, s"only $hits/10 IVF+PQ results inside exact top-50: ${r.mkString(",")}")
    // pruning reality: 4 of 16 cells probed means the candidate set the
    // ADC scan touches is a strict subset of the corpus
    val cents = graft.etl.Ivf.train(
      vecs.groupBy(col("v")).agg(min(col("vec_id")).as("vec_id"))
        .select(col("vec_id"), col("v")), k = 16, iters = 2)
    val assigned = graft.etl.Ivf.assign(
      vecs.groupBy(col("v")).agg(min(col("vec_id")).as("vec_id"))
        .select(col("vec_id"), col("v")), cents)
    val total = assigned.count()
    val largestFourCells = assigned.groupBy(col("cent_id")).count()
      .orderBy(col("count").desc).limit(4)
      .collect().map(_.getLong(1)).sum
    assert(largestFourCells < total,
      s"4 cells cover the whole corpus ($largestFourCells of $total) — no pruning")
  }

  test("ivfpq_persisted: ADC shortlist + exact re-rank reproduces the brute-force top-5; probe prunes") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    graft.functions.GraftFunctions.register(s)
    val persisted = SparkEntry.queries("llm_ann_ivfpq_persisted")(s, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(persisted.length == 5)
    // the ORACLE property, runnable here: the re-ranked probe result must
    // equal the exact brute-force top-5 over the planted corpus (base + 4
    // mutants of vec 0), scored with the same cosine kernel + rounding —
    // this is what makes the row DuckDB-oracled where the inline ADC rows
    // are approximate by construction
    val base = vecs
    val planted = Seq(0.005, 0.010, 0.015, 0.020).zipWithIndex.map { case (off, i) =>
      base.filter(col("vec_id") === 0)
        .select(lit((i + 1) * 1000000L).as("vec_id"),
          transform(col("v"), x => x * lit(0.9) + lit(off)).as("v"))
    }.reduce(_ unionByName _)
    val q = base.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val exact = base.unionByName(planted).crossJoin(broadcast(q))
      .select(col("vec_id"), round(expr("cosine_fast(v, qv)"), 6).as("c"))
      .orderBy(col("c").desc_nulls_last, col("vec_id").asc_nulls_first)
      .limit(5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(persisted == exact, s"persisted=$persisted exact=$exact")
    // partition pruning on the codes table (the IvfIndexSpec pin): the
    // shortlist stage runs eagerly inside the row builder, so re-issue a
    // probe-shaped read against the same persisted index and check scan
    // metrics — driver metrics post on the FIRST computation only.
    val art = graft.operators.LlmOps.pqIndexArtifacts(s, sf)
    val (codesPath, centsPath) = (art.codes, art.cents)
    val qv = base.filter(col("vec_id") === 0).head.getSeq[Double](1)
    val probes = s.read.parquet(centsPath).collect()
      .map { r =>
        val cv = r.getSeq[Double](1)
        val dot = qv.zip(cv).map { case (a, b) => a * b }.sum
        val den = math.sqrt(qv.map(x => x * x).sum) * math.sqrt(cv.map(x => x * x).sum)
        (if (den == 0.0) 0.0 else dot / den, r.getLong(0))
      }.sortBy { case (c, cid) => (-c, cid) }.take(4).map(_._2).toSeq
    val probe = s.read.parquet(codesPath).filter(col("cent_id").isin(probes: _*))
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty)
    probe.collect()
    val idxPath = new java.io.File(codesPath)
    val totalParts = Option(idxPath.listFiles())
      .map(_.count(f => f.isDirectory && f.getName.startsWith("cent_id="))).getOrElse(0)
    val readParts = scan.get.metrics("numPartitions").value
    assert(totalParts > 4, s"index has only $totalParts partitions")
    assert(readParts == 4,
      s"probe read $readParts of $totalParts partitions — expected exactly the 4 probed")
    // build is cached: second run must not rewrite the layout
    val mark = new java.io.File(idxPath, "_SUCCESS").lastModified()
    SparkEntry.queries("llm_ann_ivfpq_persisted")(s, sf).collect()
    assert(new java.io.File(idxPath, "_SUCCESS").lastModified() == mark,
      "codes layout was rebuilt on the second run")
  }

  test("persisted float sidecar: cell-partitioned like the codes table, " +
      "row-parity with it, and a probe-shaped re-rank fetch prunes to the " +
      "probed cells (r15 verdict item 1)") {
    val s = spark
    val art = graft.operators.LlmOps.pqIndexArtifacts(s, sf)
    val codes = s.read.parquet(art.codes)
    val floats = s.read.parquet(art.floats)
    // both tiers carry the same reps, cell for cell
    // partition-column type inference reads cent_id back as int
    val codeCells = codes.groupBy(col("cent_id").cast("long").as("cent_id"))
      .count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val floatCells = floats.groupBy(col("cent_id").cast("long").as("cent_id"))
      .count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(codeCells == floatCells,
      s"tier cell membership diverged: $codeCells vs $floatCells")
    // the re-rank shape: cent_id pruning first, id predicate inside —
    // scan metrics must show exactly the probed partitions (the codes
    // table's pin applied to the cold tier)
    val someCells = codeCells.keys.toSeq.sorted.take(4)
    val someIds = floats
      .filter(col("cent_id").isin(someCells: _*))
      .select(col("vec_id")).limit(8).collect().map(_.getLong(0)).toSeq
    val fetch = floats.filter(col("cent_id").isin(someCells: _*))
      .filter(col("vec_id").isin(someIds: _*))
    val scan = fetch.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty)
    fetch.collect()
    val totalParts = Option(new java.io.File(art.floats).listFiles())
      .map(_.count(f => f.isDirectory && f.getName.startsWith("cent_id="))).getOrElse(0)
    assert(totalParts > 4, s"float tier has only $totalParts partitions")
    assert(scan.get.metrics("numPartitions").value == 4,
      s"re-rank fetch read ${scan.get.metrics("numPartitions").value} of " +
        s"$totalParts float partitions — expected exactly the 4 probed")
  }

  test("appendStream: streamed codes are batch-identical and land in prunable partitions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val cents = graft.etl.Ivf.train(vecs, k = 8, iters = 2)
    val batchCoded = Pq
      .encodeWithStats(graft.etl.Ivf.assign(vecs, cents), dims, books)
      .select(col("vec_id"), col("cent_id"), col("codes"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2)))).toMap

    val idx = "/tmp/graft_pq_stream_idx"
    val cp = "/tmp/graft_pq_stream_cp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cp))
    val rows = vecs.collect().map(r => PqSpec.Vec(r.getLong(0), r.getSeq[Double](1)))
    val stream = MemoryStream[PqSpec.Vec](spark)
    val q = graft.layouts.PqIndex.appendStream(stream.toDF(), cents, books, dims, idx, cp)
    try {
      stream.addData(rows.take(rows.length / 2))
      q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(idx)
      .select(col("vec_id"), col("cent_id").cast("long"), col("codes"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(streamed == batchCoded)
    // probe-style read prunes to one partition dir
    val oneCent = batchCoded.values.head._1
    val probe = spark.read.parquet(idx).filter(col("cent_id") === oneCent)
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty)
    probe.collect()
    assert(scan.get.metrics("numPartitions").value == 1)
  }

  test("registry row: codes for every vec_id, recon_cos in [-1,1], fan-out covers members") {
    val out = SparkEntry.queries("llm_embed_pq")(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length == n)
    assert(out.map(_.getLong(0)).distinct.length == n)
    out.foreach { r =>
      assert(r.getString(1).split(",").length == m)
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }
}

object PqSpec {
  /** Top-level so the streaming test's Dataset encoder can derive. */
  final case class Vec(vec_id: Long, v: Seq[Double])
}
