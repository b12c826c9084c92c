package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom statistic (SURVEY §2 UDF/UDAF surface: "custom statistic
  * via DATA-step accumulation → Aggregator[IN,BUF,OUT]"): PROC MEANS-style
  * n / nmiss / min / max / range with SAS missing semantics — missings are
  * COUNTED (nmiss) but excluded from the statistics, and an all-missing
  * group yields missing statistics.
  *
  * 100 TB note: Aggregators run as ObjectHashAggregate with map-side
  * partial merge — same two-phase shape as built-in aggregates. Prefer
  * built-ins where they exist (they stay in whole-stage codegen); this is
  * the pattern for statistics Spark lacks.
  */
object SasStatsAggregator {

  case class Buf(n: Long, nmiss: Long, min: Double, max: Double)
  case class Out(n: Long, nmiss: Long, min: Option[Double],
      max: Option[Double], range: Option[Double])

  val agg: Aggregator[Option[Double], Buf, Out] =
    new Aggregator[Option[Double], Buf, Out] {
      def zero: Buf = Buf(0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity)
      def reduce(b: Buf, in: Option[Double]): Buf = in match {
        case Some(x) => Buf(b.n + 1, b.nmiss, math.min(b.min, x), math.max(b.max, x))
        case None    => b.copy(nmiss = b.nmiss + 1)
      }
      def merge(a: Buf, b: Buf): Buf =
        Buf(a.n + b.n, a.nmiss + b.nmiss, math.min(a.min, b.min), math.max(a.max, b.max))
      def finish(b: Buf): Out =
        if (b.n == 0) Out(0L, b.nmiss, None, None, None)
        else Out(b.n, b.nmiss, Some(b.min), Some(b.max), Some(b.max - b.min))
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Out] = Encoders.product[Out]
    }
}
