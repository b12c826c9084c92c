package graft.etl

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** PRODUCT QUANTIZATION (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011): split each d-dim vector
  * into m contiguous subvectors and vector-quantize each subspace with
  * its own small L2 k-means codebook, so a vector stores as m small codes
  * (m bytes at k ≤ 256) instead of d floats — the compression that makes
  * exhaustive in-cell scans affordable in a 100 TB IVF+PQ layout. This
  * module trains the codebooks and encodes; the registry row
  * (`llm_embed_pq`) composes it dedup-first.
  *
  * Deterministic by the house k-means conventions (see Ivf.scala): init
  * from the k lowest vec_ids' subvectors, per-dimension means via
  * decimal-exact sums (order-independent), ties broken by code id.
  * Codebooks are MODEL PARAMETERS (m × k × d/m doubles, a few KB): each
  * Lloyd round materializes them to the driver and restarts from
  * literals, so the lazy plan never nests iterations; at execution time
  * they ride into row expressions as literals — assignment is MAP-SIDE
  * ONLY (zero shuffle, zero broadcast join), the Ivf.assign argument per
  * subspace.
  *
  * Assignment drops the x·x term and halves: argmin |x−c|² ≡ argmin
  * (c·c/2 − x·c) because x·x is constant per row — ONE codegen'd
  * `dot_fast` per centroid, with c·c/2 folded to a driver-side literal.
  * The argmin struct also CARRIES the winning centroid's (x·c, c·c), so
  * reconstruction statistics (v·v̂ = Σⱼ x·c, ‖v̂‖² = Σⱼ c·c) come out of
  * the same pass with no decode step — materializing the decoded vector
  * per row would inline the full m×k×(d/m) codebook as a literal table
  * into the projection, which blows Janino's method-size limit (measured:
  * the first formulation failed codegen exactly there).
  */
object Pq {

  /** One subspace codebook: (code id 0..k-1, centroid). */
  type Codebook = Seq[(Long, Seq[Double])]

  /** Argmin over the codebook: struct(negscore = c·c/2 − x·c, cid, dot,
    * cc); min negscore ⇔ min L2², ties → lowest code id. */
  private def scoredStruct(sv: Column, book: Codebook): Column =
    array_min(array(book.sortBy(_._1).map { case (cid, cv) =>
      val halfcc = cv.map(x => x * x).sum / 2.0
      val dot = call_function("dot_fast", sv, typedlit(cv))
      struct(
        (lit(halfcc) - dot).as("negscore"),
        lit(cid).as("cid"),
        dot.as("dot"),
        lit(2.0 * halfcc).as("cc"))
    }: _*))

  /** Nearest code (L2, ties → lowest code id) for a subvector attribute. */
  def nearestCode(sv: Column, book: Codebook): Column =
    scoredStruct(sv, book).getField("cid")

  /** Train the m codebooks over a (vec_id, v: array<double>) relation.
    * dims must divide evenly into m subspaces. Training is EAGER (each
    * round collects the model), so the input is cached for its duration —
    * the Ivf.train lifecycle.
    *
    * All m subspaces train in the SAME Lloyd round: one pass assigns all
    * m codes, explodes (sub, cid, pos, value) and aggregates every
    * subspace's means in one shuffle — m=8, iters=4 is 4 jobs, not 32.
    * The per-subspace computations are independent, so the result is
    * IDENTICAL to training each subspace alone (PqSpec's JVM recompute
    * pins the assignment; the decimal mean is order-independent). */
  def train(vecs: DataFrame, dims: Int, m: Int, k: Int, iters: Int): Seq[Codebook] = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    GraftFunctions.register(vecs.sparkSession)
    val sub = dims / m
    val input = vecs.persist()
    try {
      val init = input.orderBy(col("vec_id").asc).limit(k)
        .select(col("v")).collect()
      var books: Seq[Codebook] = (0 until m).map { j =>
        init.zipWithIndex.map { case (r, i) =>
          (i.toLong, r.getSeq[Double](0).slice(j * sub, (j + 1) * sub))
        }.toSeq
      }
      for (_ <- 1 to iters) {
        // two ATTRIBUTE-producing projections before the explode: generator
        // expressions are not method-split by codegen, so putting the m
        // argmin structs inside explode() overflows Janino's method limit
        // (measured: 5 failed compiles + interpreted fallback, 15 s vs 3 s).
        // Projections ARE split per expression, so the subvector slices and
        // code assignments materialize there, and the generator only sees
        // small attribute-built structs.
        val svCols = input.select(col("v") +: (0 until m).map(j =>
          slice(col("v"), j * sub + 1, sub).as(s"_pq_sv$j")): _*)
        val cidCols = svCols.select(
          (0 until m).map(j => col(s"_pq_sv$j")) ++
            books.zipWithIndex.map { case (book, j) =>
              scoredStruct(col(s"_pq_sv$j"), book).getField("cid").as(s"_pq_cid$j")
            }: _*)
        val perSub = (0 until m).map { j =>
          struct(lit(j).as("sub"), col(s"_pq_cid$j").as("cid"), col(s"_pq_sv$j").as("sv"))
        }
        val means = cidCols
          .select(explode(array(perSub: _*)).as("e"))
          .select(col("e.sub").as("sub"), col("e.cid").as("cid"), posexplode(col("e.sv")))
          .groupBy(col("sub"), col("cid"), col("pos"))
          .agg((sum(col("col").cast(DecimalType(28, 14))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("m"))
          .groupBy(col("sub"), col("cid"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            x => x.getField("m")).as("cv"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2))
          .toMap
        books = books.zipWithIndex.map { case (book, j) =>
          book.map { case (cid, old) => (cid, means.getOrElse((j, cid), old)) }
        }
      }
      books
    } finally input.unpersist(blocking = false)
  }

  /** Encode + reconstruction statistics in ONE map-side pass over (…, v):
    * appends `codes` (array<bigint>, length m), `recon_dot` (= v·v̂) and
    * `recon_norm2` (= ‖v̂‖²), where v̂ is the concatenation of the chosen
    * centroids. The per-subspace argmin structs are materialized as real
    * projection columns first so each is computed once (the cdcChunks
    * CSE discipline), and the decoded vector itself is never built. */
  def encodeWithStats(vecs: DataFrame, dims: Int, books: Seq[Codebook]): DataFrame = {
    require(dims % books.size == 0,
      s"dims=$dims not divisible by ${books.size} codebooks")
    GraftFunctions.register(vecs.sparkSession)
    val sub = dims / books.size
    val bests = books.zipWithIndex.map { case (book, j) =>
      scoredStruct(slice(col("v"), j * sub + 1, sub), book).as(s"_pq_b$j")
    }
    vecs.select(col("*") +: bests: _*)
      .withColumn("codes",
        array(books.indices.map(j => col(s"_pq_b$j").getField("cid")): _*))
      .withColumn("recon_dot",
        books.indices.map(j => col(s"_pq_b$j").getField("dot")).reduce(_ + _))
      .withColumn("recon_norm2",
        books.indices.map(j => col(s"_pq_b$j").getField("cc")).reduce(_ + _))
      .drop(books.indices.map(j => s"_pq_b$j"): _*)
  }

  /** Reconstruction of a `codes` attribute as a literal-indexing
    * expression. SMALL-SCALE / TEST USE ONLY: this inlines the full
    * codebook as literal tables — fine in a spec assertion, but in a hot
    * projection it is exactly the Janino method-size blowup
    * [[encodeWithStats]] exists to avoid. */
  def decodeExpr(codes: Column, books: Seq[Codebook]): Column =
    concat(books.zipWithIndex.map { case (book, j) =>
      val table = typedlit(book.sortBy(_._1).map(_._2))
      element_at(table, element_at(codes, j + 1).cast("int") + 1)
    }: _*)
}
