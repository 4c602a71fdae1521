package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The relational q-suite must exercise the NATIVE graft scan
  * (GraftBatchScan) inside multi-operator plans — joins (q03),
  * windows (q08), set ops (q13) — not the raw-parquet V1 path, so
  * "same query capabilities" holds over graft storage itself. */
class RelationalGraftSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("q03/q08/q13 plans read from GraftBatchScan and return rows") {
    for (q <- Seq("q03_shipping_priority", "q08_top_orders_per_customer",
        "q13_set_ops_nations")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GraftBatchScan"),
        s"$q does not scan graft storage:\n${plan.take(2000)}")
      assert(df.count() > 0, s"$q returned no rows")
    }
  }

  test("filter and projection push into the graft scan under a join") {
    val df = SparkEntry.queries("q02_filter_projection")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftBatchScan"), plan.take(2000))
    // pruned read schema: 4 of 11 lineitem columns reach the scan
    // (3 projected + l_returnflag consumed by the filter)
    assert(!plan.contains("l_comment"), "projection not pruned")
  }
}
