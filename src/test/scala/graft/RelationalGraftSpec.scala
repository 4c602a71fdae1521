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

  test("scalar subqueries over the same graft table merge into one scan") {
    val wh = java.nio.file.Files.createTempDirectory("graft-merge-wh").toString
    spark.conf.set("spark.sql.catalog.graft_mrg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mrg.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_mrg.ns")
    spark.sql("CREATE TABLE graft_mrg.ns.m (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft_mrg.ns.m VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    // sum and avg are not manifest-answerable, so each subquery scans —
    // unless MergeScalarSubqueries folds them onto ONE GraftBatchScan
    // (it compares leaf scans by value equality)
    // AQE defers subquery reuse to runtime; disable it so the static
    // plan shows the reuse directly
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = spark.sql(
        """SELECT (SELECT sum(v) FROM graft_mrg.ns.m) AS s,
          |       (SELECT avg(v) FROM graft_mrg.ns.m) AS a""".stripMargin)
      // MergeScalarSubqueries rewrites both subqueries to the same
      // merged (sum, avg) aggregate over one relation...
      val merged = df.queryExecution.optimizedPlan.toString
      assert(merged.contains("mergedValue"),
        s"subqueries were not merged:\n$merged")
      // ...and physical planning then executes ONE of them, reusing it
      // for the other (possible only because the merged plans are equal)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(formatted.contains("ReusedSubquery"),
        s"second subquery not reused:\n${formatted.take(3000)}")
      val row = df.head
      assert(row.getDouble(0) == 60.0 && row.getDouble(1) == 20.0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
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
