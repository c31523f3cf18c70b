package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.2 UDF/UDAF row): geometric mean as an
  * `Aggregator[IN, BUF, OUT]` — log-space sum + count buffer, associative
  * merge, so it plans as partial/final aggregation like any built-in.
  *
  * The log-sum accumulates on the [[graft.Det]] scaled-long grid
  * (round(ln(x)·1e9) summed as LONG) rather than as a raw double: long
  * addition is exact and therefore independent of Spark's nondeterministic
  * shuffle-merge order, which keeps the driver's hash compare stable. The
  * DuckDB oracle mirrors the same grid. Per-term grid error is 5e-10 on
  * ln(x) ≤ ~28, so the sum stays < 2^63 up to ~3e8 rows per group at
  * TPC-H-like magnitudes; the scale constant is the knob if a deployment
  * needs more headroom.
  *
  * Output is (geomean, n) — the buffer tracks the count anyway, and
  * surfacing it means a caller never rides a `count()` beside the UDAF,
  * which would force every sibling aggregate onto the interpreted
  * ObjectHashAggregate path (the CorpusPlanSweepSpec mixed-agg rule). */
object GeoMean extends Aggregator[Double, (Long, Long), (Double, Long)] {
  /** Grid: 1e9 true decimal digits of ln(x). */
  val LogScale = 1e9

  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), x: Double): (Long, Long) =
    (b._1 + math.round(math.log(x) * LogScale), b._2 + 1)
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Long, Long)): (Double, Long) =
    (if (r._2 == 0) Double.NaN else math.exp(r._1 / LogScale / r._2), r._2)
  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
}
