package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Plain-SQL surface through the DSv2 catalog: DDL, DML, queries,
  * time travel. */
class SqlCatalogSpec extends AnyFunSuite {

  lazy val warehouse: String = Files.createTempDirectory("graft-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.graft.warehouse", warehouse)
    .getOrCreate()

  test("CREATE TABLE / INSERT / SELECT / filters / INSERT OVERWRITE / time travel") {
    spark.sql("CREATE NAMESPACE graft.db")
    spark.sql(
      """CREATE TABLE graft.db.orders (k BIGINT, status STRING, amount DOUBLE)
        |PARTITIONED BY (status)""".stripMargin)
    spark.sql("INSERT INTO graft.db.orders VALUES (1, 'O', 10.0), (2, 'F', 20.0)")
    spark.sql("INSERT INTO graft.db.orders VALUES (3, 'O', 30.0)")

    assert(spark.sql("SELECT count(*) FROM graft.db.orders").head.getLong(0) == 3L)
    val filtered = spark.sql(
      "SELECT k FROM graft.db.orders WHERE status = 'O' ORDER BY k")
    assert(filtered.collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))

    // time travel through SQL
    assert(spark.sql("SELECT count(*) FROM graft.db.orders VERSION AS OF 0")
      .head.getLong(0) == 2L)

    // dynamic partition overwrite: only 'O' replaced
    spark.sql("INSERT OVERWRITE graft.db.orders VALUES (9, 'O', 90.0)")
    val after = spark.sql("SELECT k, status FROM graft.db.orders ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(after.toSeq == Seq((2L, "F"), (9L, "O")))

    // listing + drop
    assert(spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("orders"))
    spark.sql("DROP TABLE graft.db.orders")
    assert(spark.sql("SHOW TABLES IN graft.db").collect().isEmpty)
  }

  test("primary-key table via TBLPROPERTIES upserts on INSERT") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db2")
    spark.sql(
      """CREATE TABLE graft.db2.users (id BIGINT, name STRING, seq BIGINT)
        |TBLPROPERTIES ('primary-key'='id', 'sequence.field'='seq', 'bucket'='2')""".stripMargin)
    spark.sql("INSERT INTO graft.db2.users VALUES (1, 'a', 1), (2, 'b', 1)")
    spark.sql("INSERT INTO graft.db2.users VALUES (1, 'a2', 2), (3, 'c', 1)")
    val got = spark.sql("SELECT id, name FROM graft.db2.users ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a2"), (2L, "b"), (3L, "c")))
  }

  test("ALTER TABLE ADD COLUMN evolves the schema") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db3")
    spark.sql("CREATE TABLE graft.db3.t (k BIGINT)")
    spark.sql("INSERT INTO graft.db3.t VALUES (1)")
    spark.sql("ALTER TABLE graft.db3.t ADD COLUMN extra STRING")
    spark.sql("INSERT INTO graft.db3.t VALUES (2, 'x')")
    val got = spark.sql("SELECT k, extra FROM graft.db3.t ORDER BY k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(got.toSeq == Seq((1L, None), (2L, Some("x"))))
  }
}
