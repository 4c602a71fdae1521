package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's verified inventory.
  *
  * @param name   stable identifier (drives CORRECTNESS/BENCH keys)
  * @param fn     Spark-side implementation; `dir` is a testdata sf dir
  * @param oracle equivalent ANSI SQL for the DuckDB oracle (bare table
  *               names, e.g. `lineitem`); None → rows-only check
  */
case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, None)
}
