package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-determinism helpers (SURVEY.md §2.4).
  *
  * Double summation is order-dependent, and Spark's shuffle merge order is
  * nondeterministic — so any query the DuckDB oracle hashes must aggregate
  * floats through exact decimal arithmetic and only then convert to double.
  * The decimal scale is chosen so the cast rounds at a grid point the true
  * value sits on (prices have 2 decimals, price*(1-disc) has 4, the charge
  * product 6), never at a tie boundary.
  */
object Det {

  /** Exact, order-independent sum of a double column with `scale` true
    * decimal digits; emitted as double. Mirror in DuckDB:
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`. */
  def decSum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact average: decimal sum divided by count in double space.
    * Mirror: `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(*)`. */
  def decAvg(c: Column, scale: Int): Column =
    decSum(c, scale) / count(lit(1))
}
