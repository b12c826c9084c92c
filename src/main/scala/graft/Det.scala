package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers — the oracle-parity conventions from SURVEY.md §7.
  *
  * The driver hash-compares our parquet output against DuckDB running
  * `SparkEntry.oracleSql` on the same inputs, so double aggregates must be
  * BIT-EXACT across engines, not merely close. Floating-point summation is
  * order-dependent (G1), so instead of rounding after the fact we make the
  * aggregation itself exact: cast doubles to DECIMAL(18,4) before summing.
  * Decimal addition is associative/commutative → any partition order (Spark's
  * partial aggregation, DuckDB's parallel scan) yields the identical result,
  * which both engines then convert to the identical double. The testdata's
  * money/quantity columns carry ≤2 decimal digits (FIXTURES.md), so scale-4
  * capture is lossless in intent and deterministic in tie-handling (binary
  * doubles never land exactly on a .00005 boundary).
  *
  * The same trick at 100 TB: decimal aggregation is how you make re-runs of
  * a revenue pipeline reproducible across cluster sizes — worth its ~2×
  * aggregation-buffer cost for money columns; plain double sum remains fine
  * where last-ulp reproducibility is not a contract.
  */
object Det {

  /** Capture type for double measures: values ≤ ~10^14 with 4 decimals. */
  val Money: DecimalType = DecimalType(18, 4)

  /** Order-independent sum of a double column, returned as double.
    * Oracle twin: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Order-independent mean: exact decimal sum, then one double division —
    * identical IEEE operands on both engines → identical result.
    * Oracle twin: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
    *              / CAST(COUNT(x) AS DOUBLE)`. */
  def davg(c: Column): Column =
    sum(c.cast(Money)).cast(DoubleType) / count(c).cast(DoubleType)

  /** Order-independent sample stddev via exact decimal moments:
    * sqrt((Σx² − (Σx)²/n) / (n−1)) with Σx, Σx² computed in decimal (exact)
    * and the closed-form evaluated in double — same expression shape in the
    * oracle SQL → identical IEEE ops → identical result. Cancellation is a
    * non-issue because the sums are exact. */
  def dstd(c: Column): Column = {
    val s  = sum(c.cast(Money)).cast(DoubleType)
    val s2 = sum(c.cast(Money) * c.cast(Money)).cast(DoubleType)
    val n  = count(c).cast(DoubleType)
    sqrt((s2 - s * s / n) / (n - lit(1.0)))
  }

  /** Knuth multiplicative hash of a non-negative id onto [0, 2³²) — the
    * deterministic sampling coordinate of the mixture/sampling rows
    * (llm_domain_mix, llm_token_budget_mix, sample_stratified_exact).
    * Computed in DECIMAL(38,0): the plain BIGINT multiply overflows (and
    * ANSI mode throws) once ids pass ⌊2⁶³/2654435761⌋ ≈ 3.4×10⁹ — which
    * replica-offset corpora like the sf3/sf6 sets exceed — while the
    * ≤21-digit decimal product is exact and the mod reduces it back to
    * 10 digits, exactly representable as BIGINT/DOUBLE. Both engines run
    * the identical decimal arithmetic (caught at sf3: the count()-based
    * scaling methodology had pruned the hash out of the aggregate rows,
    * so only full evaluation surfaced the overflow). */
  def knuthU(id: Column): Column =
    ((id.cast(DecimalType(38, 0)) * lit(2654435761L)) % lit(4294967296L))
      .cast(LongType)

  /** Oracle twin of [[knuthU]]. */
  def sqlKnuthU(id: String): String =
    s"CAST((CAST($id AS DECIMAL(38,0)) * 2654435761) % 4294967296 AS BIGINT)"

  /** Oracle-side SQL fragments twinning the above. */
  def sqlSum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlAvg(x: String): String =
    s"(CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT($x) AS DOUBLE))"
  def sqlStd(x: String): String = {
    val s  = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
    val s2 = s"CAST(SUM(CAST($x AS DECIMAL(18,4)) * CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
    val n  = s"CAST(COUNT($x) AS DOUBLE)"
    s"SQRT(($s2 - $s * $s / $n) / ($n - 1.0))"
  }
}
