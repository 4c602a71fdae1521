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

  private val graftQWarehouse = scala.collection.concurrent.TrieMap.empty[String, String]
  private val graftQTables = scala.collection.concurrent.TrieMap.empty[(String, String), Boolean]

  /** Load one testdata table THROUGH graft storage: copied once per
    * (sf dir, table) into a shared graft warehouse, then read via the
    * `graft_q` DSv2 catalog so every relational query (joins, windows,
    * set ops, grouping sets) exercises the native GraftBatchScan and
    * its pushdowns inside multi-operator plans — the reference ships
    * its relational surface through its Spark catalog the same way
    * (paimon-spark SparkCatalog.java). The copy is cached for the JVM
    * lifetime; reruns only pay the scan. */
  def gtbl(s: SparkSession, dir: String, name: String): DataFrame = {
    val wh = graftQWarehouse.getOrElseUpdate("wh",
      java.nio.file.Files.createTempDirectory("graft-q-wh").toString)
    if (!s.conf.getOption("spark.sql.catalog.graft_q").contains("graft.sources.GraftCatalog") ||
      !s.conf.getOption("spark.sql.catalog.graft_q.warehouse").contains(wh)) {
      s.conf.set("spark.sql.catalog.graft_q", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft_q.warehouse", wh)
    }
    val ns = dir.replaceAll("[^A-Za-z0-9]", "_")
    graftQTables.getOrElseUpdate((dir, name), {
      val src = tbl(s, dir, name)
      val t = graft.table.GraftTable.create(s, s"$wh/$ns/$name", src.schema)
      t.write(src)
      true
    })
    s.table(s"graft_q.`$ns`.`$name`")
  }

  /** Event-time as BIGINT epoch micros, adaptive to the physical type
    * the parquet surfaces: timestamp[us] reads as TIMESTAMP_NTZ (or
    * TIMESTAMP), while timestamp[ns] under
    * spark.sql.legacy.parquet.nanosAsLong reads as LONG nanoseconds.
    * Queries must stay green across testdata regenerations that flip
    * between these shapes. Session timezone is pinned to UTC, so the
    * NTZ→TZ cast is value-preserving. */
  def eventMicros(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(c).cast(org.apache.spark.sql.types.TimestampType))
      case _ => expr(s"`$c` div 1000") // legacy long nanos
    }

  /** Exact money arithmetic: cast a double column to DECIMAL(18,2). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact 4-decimal arithmetic (events.value aggregations). */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Run `f` in a session that has the graft SQL extensions (view DDL
    * + view-read resolution) applied. Extensions are builder-time-only
    * in Spark, so the gate rebuilds a session over the SAME
    * SparkContext via builder().withExtensions and restores the
    * original as active/default afterwards. The returned DataFrame
    * stays valid — it executes on the shared context. */
  def withGraftExtensions[T](s: SparkSession)(f: SparkSession => T): T = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new graft.sources.GraftExtensions().apply(_))
      .getOrCreate()
    try f(s2)
    finally {
      SparkSession.setDefaultSession(s)
      SparkSession.setActiveSession(s)
    }
  }

  /** Normalize a numeric output column for cross-engine hashing. */
  def asDouble(c: Column, scale: Int = 2): Column =
    round(c, scale).cast("double")
}
