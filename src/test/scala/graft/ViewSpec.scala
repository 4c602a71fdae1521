package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Catalog-stored SQL views: GraftCatalog implements Spark 4's
  * ViewCatalog connector API for storage, and GraftExtensions wires the
  * SQL surface (Spark's analyzer does not yet consult ViewCatalog —
  * see GraftExtensions; reference: paimon SupportView +
  * PaimonViewResolver + RewriteSparkDDLCommands). */
class ViewSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  lazy val warehouse: String = Files.createTempDirectory("graft-vw").toString

  // restore whatever session was default before this suite replaced it
  // (suites share the JVM; a leaked extensions-session with THIS
  // suite's catalog conf would hijack later suites' getOrCreate)
  private var prevDefault: Option[SparkSession] = None
  private var captured = false

  override def afterAll(): Unit = {
    if (captured) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  // the suite may share a JVM (and SparkContext) with suites that built
  // the session first: extensions are builder-time-only, so rebuild a
  // session over whatever context exists with the graft extensions
  // applied (same trick as graft.queries.withGraftExtensions)
  lazy val spark: SparkSession = {
    prevDefault = SparkSession.getDefaultSession
    captured = true
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.sources.GraftExtensions().apply(_))
      .getOrCreate()
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
    s
  }

  test("CREATE VIEW / SELECT / SHOW VIEWS / ALTER / RENAME / DROP through SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vdb")
    spark.sql(
      """CREATE TABLE graft.vdb.orders (k BIGINT, status STRING, amount DOUBLE)
        |""".stripMargin)
    spark.sql(
      "INSERT INTO graft.vdb.orders VALUES (1,'O',10.0),(2,'F',20.0),(3,'O',30.0)")

    spark.sql(
      """CREATE VIEW graft.vdb.open_orders AS
        |SELECT k, amount FROM graft.vdb.orders WHERE status = 'O'""".stripMargin)

    // resolution: reads go through the stored SQL over the graft table
    val got = spark.sql("SELECT k, amount FROM graft.vdb.open_orders ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 10.0), (3L, 30.0)))

    // views reflect base-table changes (SQL text, not a materialization)
    spark.sql("INSERT INTO graft.vdb.orders VALUES (4,'O',40.0)")
    assert(spark.sql("SELECT count(*) FROM graft.vdb.open_orders").head.getLong(0) == 3L)

    // listing
    val views = spark.sql("SHOW VIEWS IN graft.vdb").collect().map(_.getString(1))
    assert(views.contains("open_orders"))

    // CREATE OR REPLACE swaps the query text
    spark.sql(
      """CREATE OR REPLACE VIEW graft.vdb.open_orders AS
        |SELECT k FROM graft.vdb.orders WHERE status = 'F'""".stripMargin)
    assert(spark.sql("SELECT k FROM graft.vdb.open_orders").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))

    // properties via ALTER VIEW
    spark.sql("ALTER VIEW graft.vdb.open_orders SET TBLPROPERTIES ('note'='x')")
    val meta = graft.sources.GraftViews.load(warehouse,
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("vdb"), "open_orders"))
    assert(meta.properties().get("note") == "x")

    // IF NOT EXISTS is a no-op on an existing view
    spark.sql(
      """CREATE VIEW IF NOT EXISTS graft.vdb.open_orders AS
        |SELECT 1 AS one""".stripMargin)
    assert(spark.sql("SELECT k FROM graft.vdb.open_orders").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))

    // DROP
    spark.sql("DROP VIEW graft.vdb.open_orders")
    assert(spark.sql("SHOW VIEWS IN graft.vdb").collect().isEmpty)
    intercept[Exception](spark.sql("SELECT * FROM graft.vdb.open_orders").collect())
  }

  test("ALTER VIEW RENAME / AS / UNSET TBLPROPERTIES") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vdb4")
    spark.sql("CREATE TABLE graft.vdb4.t (k BIGINT)")
    spark.sql("INSERT INTO graft.vdb4.t VALUES (1),(2),(3)")
    spark.sql("CREATE VIEW graft.vdb4.v AS SELECT k FROM graft.vdb4.t WHERE k > 1")

    spark.sql("ALTER VIEW graft.vdb4.v RENAME TO graft.vdb4.w")
    assert(spark.sql("SHOW VIEWS IN graft.vdb4").collect().map(_.getString(1)).toSeq == Seq("w"))
    assert(spark.sql("SELECT count(*) FROM graft.vdb4.w").head.getLong(0) == 2L)

    // redefinition keeps properties, swaps query + schema
    spark.sql("ALTER VIEW graft.vdb4.w SET TBLPROPERTIES ('p'='1')")
    spark.sql("ALTER VIEW graft.vdb4.w AS SELECT k * 10 AS k10 FROM graft.vdb4.t")
    assert(spark.sql("SELECT sum(k10) FROM graft.vdb4.w").head.getLong(0) == 60L)
    val id4 = org.apache.spark.sql.connector.catalog.Identifier.of(Array("vdb4"), "w")
    assert(graft.sources.GraftViews.load(warehouse, id4).properties().get("p") == "1")

    spark.sql("ALTER VIEW graft.vdb4.w UNSET TBLPROPERTIES ('p')")
    assert(graft.sources.GraftViews.load(warehouse, id4).properties().get("p") == null)
  }

  test("temp and global-temp views are never captured by the graft resolver") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vdb5")
    spark.sql("CREATE TABLE graft.vdb5.t (k BIGINT)")
    spark.sql("INSERT INTO graft.vdb5.t VALUES (1)")
    spark.sql("USE graft.vdb5")
    try {
      // session temp view under a graft current catalog
      spark.sql("CREATE TEMP VIEW tv AS SELECT 42 AS k")
      assert(spark.sql("SELECT k FROM tv").head.getInt(0) == 42)
      spark.sql("DROP VIEW tv") // must hit the session catalog, not graft
      // global temp view addressed by its reserved database
      spark.sql("CREATE GLOBAL TEMP VIEW gv AS SELECT 7 AS k")
      assert(spark.sql("SELECT k FROM global_temp.gv").head.getInt(0) == 7)
      spark.sql("DROP VIEW global_temp.gv")
    } finally spark.sql("USE spark_catalog.default")
  }

  test("unqualified names in view text resolve in the DEFINITION namespace") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vdb6")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vdb7")
    spark.sql("CREATE TABLE graft.vdb6.src (k BIGINT)")
    spark.sql("INSERT INTO graft.vdb6.src VALUES (6)")
    // decoy with the same name in the OTHER namespace
    spark.sql("CREATE TABLE graft.vdb7.src (k BIGINT)")
    spark.sql("INSERT INTO graft.vdb7.src VALUES (7)")

    spark.sql("USE graft.vdb6")
    try {
      spark.sql("CREATE VIEW v6 AS SELECT k FROM src") // bare name
      assert(spark.sql("SELECT k FROM v6").head.getLong(0) == 6L)
      // read from the other namespace: still the creator's src
      spark.sql("USE graft.vdb7")
      assert(spark.sql("SELECT k FROM graft.vdb6.v6").head.getLong(0) == 6L)
      // CTE names inside the view text are not qualified away
      spark.sql("USE graft.vdb6")
      spark.sql(
        "CREATE VIEW v6c AS WITH src AS (SELECT 99 AS k) SELECT k FROM src")
      spark.sql("USE graft.vdb7")
      assert(spark.sql("SELECT k FROM graft.vdb6.v6c").head.getInt(0) == 99)
    } finally spark.sql("USE spark_catalog.default")
  }

  test("a view cannot shadow an existing table and vice versa") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vdb8")
    spark.sql("CREATE TABLE graft.vdb8.t (k BIGINT)")
    spark.sql("INSERT INTO graft.vdb8.t VALUES (1)")
    intercept[Exception](
      spark.sql("CREATE VIEW graft.vdb8.t AS SELECT 1 AS one"))
    intercept[Exception](
      spark.sql("CREATE OR REPLACE VIEW graft.vdb8.t AS SELECT 1 AS one"))
    // table unharmed
    assert(spark.sql("SELECT k FROM graft.vdb8.t").head.getLong(0) == 1L)
    // converse: a table cannot be created over a view
    spark.sql("CREATE VIEW graft.vdb8.v AS SELECT 1 AS one")
    intercept[Exception](spark.sql("CREATE TABLE graft.vdb8.v (k BIGINT)"))
  }

  test("view over PK table sees merged state; nested views compose") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vdb2")
    spark.sql(
      """CREATE TABLE graft.vdb2.users (id BIGINT, name STRING)
        |TBLPROPERTIES ('primary-key'='id', 'bucket'='2')""".stripMargin)
    spark.sql("INSERT INTO graft.vdb2.users VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT INTO graft.vdb2.users VALUES (1,'a2')")

    spark.sql("CREATE VIEW graft.vdb2.u AS SELECT * FROM graft.vdb2.users")
    spark.sql(
      "CREATE VIEW graft.vdb2.u1 AS SELECT name FROM graft.vdb2.u WHERE id = 1")
    assert(spark.sql("SELECT name FROM graft.vdb2.u1").head.getString(0) == "a2")
  }

  test("alter_view_dialect stores per-engine SQL; spark dialect updates base query") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.vdb3")
    spark.sql("CREATE TABLE graft.vdb3.t (k BIGINT)")
    spark.sql("INSERT INTO graft.vdb3.t VALUES (1),(2)")
    spark.sql("CREATE VIEW graft.vdb3.v AS SELECT k FROM graft.vdb3.t WHERE k = 1")

    // add a foreign dialect: stored as a property, base query untouched
    spark.sql(
      "CALL graft.sys.alter_view_dialect('vdb3.v', 'add', 'flink', 'SELECT 99')")
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("vdb3"), "v")
    assert(graft.sources.GraftViews.load(warehouse, ident)
      .properties().get("dialect.flink") == "SELECT 99")
    assert(spark.sql("SELECT k FROM graft.vdb3.v").head.getLong(0) == 1L)

    // update the spark dialect = rewrite the base query
    spark.sql(
      """CALL graft.sys.alter_view_dialect('vdb3.v', 'update', 'spark',
        |'SELECT k FROM graft.vdb3.t WHERE k = 2')""".stripMargin)
    assert(spark.sql("SELECT k FROM graft.vdb3.v").head.getLong(0) == 2L)

    // drop the foreign dialect
    spark.sql("CALL graft.sys.alter_view_dialect('vdb3.v', 'drop', 'flink', '')")
    assert(graft.sources.GraftViews.load(warehouse, ident)
      .properties().get("dialect.flink") == null)
  }

  test("upsert-key: INSERT INTO an append table merges on the key, " +
    "sequence.field guards stale updates and dedups the batch") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.updb")
    spark.sql(
      """CREATE TABLE graft.updb.t (id BIGINT, v STRING, seq BIGINT)
        |TBLPROPERTIES ('upsert-key'='id', 'sequence.field'='seq')""".stripMargin)
    spark.sql("INSERT INTO graft.updb.t VALUES (1,'a',1),(2,'b',1)")
    // update id=1 (newer seq), insert id=3; id=2 untouched
    spark.sql("INSERT INTO graft.updb.t VALUES (1,'a2',2),(3,'c',1)")
    val got = spark.sql("SELECT id, v FROM graft.updb.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a2"), (2L, "b"), (3L, "c")), got.toString)
    // a STALE row (older seq) never clobbers the stored newer one
    spark.sql("INSERT INTO graft.updb.t VALUES (1,'old',1)")
    assert(spark.sql("SELECT v FROM graft.updb.t WHERE id=1").head.getString(0) == "a2")
    // one batch with several versions of a key dedups to the newest
    spark.sql("INSERT INTO graft.updb.t VALUES (4,'x',1),(4,'y',3),(4,'z',2)")
    assert(spark.sql("SELECT v FROM graft.updb.t WHERE id=4").head.getString(0) == "y")
    // exactly one row per key survives throughout
    assert(spark.sql("SELECT count(*) FROM graft.updb.t").head.getLong(0) == 4L)
    // the DataFrame writeTo (by-name) path rewrites identically
    spark.sql("SELECT CAST(5 AS BIGINT) AS id, 'w' AS v, CAST(9 AS BIGINT) AS seq")
      .writeTo("graft.updb.t").append()
    spark.sql("SELECT CAST(5 AS BIGINT) AS id, 'stale' AS v, CAST(1 AS BIGINT) AS seq")
      .writeTo("graft.updb.t").append()
    assert(spark.sql("SELECT v FROM graft.updb.t WHERE id=5").head.getString(0) == "w")
    assert(spark.sql("SELECT count(*) FROM graft.updb.t WHERE id=5").head.getLong(0) == 1L)
    // without sequence.field the batch is NOT deduplicated (reference
    // parity): several versions of one key in one INSERT raise the
    // MERGE cardinality error loudly instead of picking one silently
    spark.sql("""CREATE TABLE graft.updb.noseq (id BIGINT, v STRING)
                |TBLPROPERTIES ('upsert-key'='id')""".stripMargin)
    spark.sql("INSERT INTO graft.updb.noseq VALUES (1,'a')")
    val dupErr = intercept[Exception] {
      spark.sql("INSERT INTO graft.updb.noseq VALUES (1,'x'),(1,'y')")
    }
    assert(dupErr.getMessage.toLowerCase.contains("merge") ||
      dupErr.getMessage.toLowerCase.contains("multiple"), dupErr.getMessage)
    // single-row-per-key batches upsert fine without a sequence field
    spark.sql("INSERT INTO graft.updb.noseq VALUES (1,'b'),(2,'c')")
    val ns = spark.sql("SELECT id, v FROM graft.updb.noseq ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(ns.toSeq == Seq((1L, "b"), (2L, "c")), ns.mkString(","))
    // defining upsert-key WITH a primary key is rejected like the reference
    val err = intercept[Exception] {
      spark.sql(
        """CREATE TABLE graft.updb.bad (id BIGINT, v STRING)
          |TBLPROPERTIES ('primary-key'='id', 'upsert-key'='id')""".stripMargin)
    }
    assert(err.getMessage.contains("upsert-key"), err.getMessage)
  }

  test("table-valued functions: graft_incremental_query / _to_auto_tag in FROM") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tvf")
    spark.sql("CREATE TABLE graft.tvf.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1')")
    spark.sql("INSERT INTO graft.tvf.t VALUES (1, 'a')")
    spark.sql("INSERT INTO graft.tvf.t VALUES (2, 'b'), (1, 'a2')")
    val gt = graft.table.GraftTable.load(spark, s"$warehouse/tvf/t")
    gt.createTag("s0", None)
    // FROM-clause TVF, fully SQL — rows changed in (0, 1]
    // no changelog producer: deltas surface as raw adds (+I), same as
    // CALL sys.incremental_query on this table
    val rows = spark.sql(
      "SELECT k, v, _row_kind FROM graft_incremental_query('graft.tvf.t', 0, 1) ORDER BY k, _row_kind")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSet == Set((1L, "a2", "+I"), (2L, "b", "+I")), rows.toSeq)
    // tag names resolve as snapshot refs
    spark.sql("INSERT INTO graft.tvf.t VALUES (3, 'c')")
    // 's0' was tagged at snapshot 1, so the tag-ref range (s0, 2] = {3}
    val byTag = spark.sql(
      "SELECT k FROM graft_incremental_query('graft.tvf.t', 's0', 2)")
      .collect().map(_.getLong(0)).toSet
    assert(byTag == Set(3L))
    // timestamp variant composes with aggregation
    val t0 = gt.sm.snapshot(0L).timeMillis
    val t2 = gt.sm.snapshot(2L).timeMillis
    val n = spark.sql("SELECT count(*) FROM " +
      s"graft_incremental_between_timestamp('graft.tvf.t', $t0, $t2)")
      .head.getLong(0)
    assert(n == 3L) // adds: a2, b, c
  }
}
