package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the query inventory.
  *
  * Output-normalization conventions (for exact DuckDB-oracle matching):
  *  - money arithmetic is done in DECIMAL(18,2) (exact), and every
  *    floating-point output column ends as `round(x, n)` cast to DOUBLE
  *    so both engines produce bit-identical doubles;
  *  - integer aggregates are cast to BIGINT on the oracle side (DuckDB
  *    SUM(BIGINT) returns HUGEINT, which would mismatch Spark's LongType).
  */
package object queries {

  /** Load one testdata table from an sf dir. */
  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Exact money arithmetic: cast a double column to DECIMAL(18,2). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Normalize a numeric output column for cross-engine hashing. */
  def asDouble(c: Column, scale: Int = 2): Column =
    round(c, scale).cast("double")
}
