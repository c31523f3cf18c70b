package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Oracle-determinism helpers (SURVEY.md §2.4).
  *
  * Double summation is order-dependent, and Spark's shuffle merge order is
  * nondeterministic — so any float aggregate the DuckDB oracle hashes must
  * be order-independent. Exact decimal sums achieve that but run ~2× slower
  * than primitive aggregation (Decimal boxing in the agg loop, measured via
  * `graft.Probe adhoc`). Instead: round each term to `scale` true decimal
  * digits, sum as LONG (exact, order-free, codegen-primitive), convert to
  * double once at the end. The scale is chosen so the grid point sits on the
  * value's true decimals (prices 2, price*(1-disc) 4, the charge product 6)
  * and per-term scaled values stay far below 2^63.
  */
object Det {

  /** Order-independent sum of a double column with `scale` true decimal
    * digits, emitted as double. Mirror in DuckDB:
    * `CAST(SUM(CAST(round(x * 1eS) AS BIGINT)) AS DOUBLE) / 1eS`. */
  def decSum(c: Column, scale: Int): Column = {
    val f = math.pow(10.0, scale)
    (sum(round(c * f).cast(LongType)) / f).cast(DoubleType)
  }

  /** Order-independent average: scaled-long sum divided by count in double
    * space. Mirror: `CAST(SUM(CAST(round(x*1eS) AS BIGINT)) AS DOUBLE) / 1eS
    * / COUNT(*)`. */
  def decAvg(c: Column, scale: Int): Column =
    decSum(c, scale) / count(lit(1))
}
