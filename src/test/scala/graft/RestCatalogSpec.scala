package graft

import graft.sources.GraftRestServer
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** REST catalog: metadata over HTTP, data direct (reference:
  * paimon-core rest/RESTCatalog). The service and the Spark catalog
  * share one warehouse; the service is on no data path. */
class RestCatalogSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  lazy val warehouse: String = Files.createTempDirectory("graft-rest").toString
  lazy val server: GraftRestServer.Handle =
    GraftRestServer.start(warehouse, token = "sekrit")

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.rc", "graft.sources.GraftRestCatalog")
    s.conf.set("spark.sql.catalog.rc.uri", server.uri)
    s.conf.set("spark.sql.catalog.rc.token", "sekrit")
    s
  }

  override def afterAll(): Unit = server.stop()

  test("DDL + DML + system tables through the REST catalog") {
    spark.sql("CREATE NAMESPACE rc.db")
    spark.sql(
      """CREATE TABLE rc.db.users (id BIGINT, name STRING)
        |TBLPROPERTIES ('primary-key'='id', 'bucket'='2')""".stripMargin)
    spark.sql("INSERT INTO rc.db.users VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT INTO rc.db.users VALUES (1,'a2')")

    // merged PK read through the REST-resolved path
    val got = spark.sql("SELECT id, name FROM rc.db.users ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a2"), (2L, "b")))

    assert(spark.sql("SHOW TABLES IN rc.db").collect()
      .map(_.getString(1)).toSeq == Seq("users"))

    // the same table is visible to a filesystem catalog over the
    // shared warehouse — the service stores no private state
    spark.conf.set("spark.sql.catalog.rc_fs", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rc_fs.warehouse", warehouse)
    assert(spark.sql("SELECT count(*) FROM rc_fs.db.users").head.getLong(0) == 2L)

    spark.sql("DROP TABLE rc.db.users")
    assert(spark.sql("SHOW TABLES IN rc.db").collect().isEmpty)
  }

  test("register_table: an external-path table resolves read-through") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rc.reg")
    // a graft table OUTSIDE the warehouse
    import org.apache.spark.sql.types._
    import spark.implicits._
    val ext = Files.createTempDirectory("graft-rest-ext").toString + "/t"
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    graft.table.GraftTable.create(spark, ext, sch)
      .write(Seq((5L, "e"), (6L, "f")).toDF("k", "v"))
    val cat = spark.sessionState.catalogManager.catalog("rc")
      .asInstanceOf[graft.sources.GraftRestCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    cat.registerTable(Identifier.of(Array("reg"), "ext_r"), ext)
    // listed, resolvable, readable — data never moved
    assert(spark.sql("SHOW TABLES IN rc.reg").collect()
      .map(_.getString(1)).toSeq.contains("ext_r"))
    val got = spark.sql("SELECT k, v FROM rc.reg.ext_r ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((5L, "e"), (6L, "f")))
    // double registration and re-using an occupied identifier refuse
    intercept[Exception](cat.registerTable(Identifier.of(Array("reg"), "ext_r"), ext))
    // rename moves only the marker; drop removes only the marker —
    // the external storage survives both
    spark.sql("ALTER TABLE rc.reg.ext_r RENAME TO reg.ext_r2")
    assert(spark.sql("SELECT count(*) FROM rc.reg.ext_r2").head.getLong(0) == 2L)
    spark.sql("DROP TABLE rc.reg.ext_r2")
    assert(spark.sql("SHOW TABLES IN rc.reg").collect().isEmpty)
    assert(graft.table.GraftTable.exists(ext),
      "dropping a registered table must not delete its external storage")
  }

  test("bad token is rejected; no data leaks") {
    spark.conf.set("spark.sql.catalog.rc_bad", "graft.sources.GraftRestCatalog")
    spark.conf.set("spark.sql.catalog.rc_bad.uri", server.uri)
    spark.conf.set("spark.sql.catalog.rc_bad.token", "wrong")
    val e = intercept[Exception](spark.sql("SHOW TABLES IN rc_bad.db").collect())
    assert(e.toString.contains("unauthorized") ||
      Option(e.getCause).exists(_.toString.contains("unauthorized")), e.toString)
  }

  test("ALTER and RENAME through the REST catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rc.alt")
    spark.sql(
      """CREATE TABLE rc.alt.t (id BIGINT, name STRING)
        |TBLPROPERTIES ('primary-key'='id', 'bucket'='2')""".stripMargin)
    spark.sql("INSERT INTO rc.alt.t VALUES (1,'a')")
    // schema evolution routed through the metadata service
    spark.sql("ALTER TABLE rc.alt.t ADD COLUMN score DOUBLE")
    spark.sql("INSERT INTO rc.alt.t VALUES (2,'b',0.5)")
    spark.sql("ALTER TABLE rc.alt.t RENAME COLUMN name TO label")
    val got = spark.sql("SELECT id, label, score FROM rc.alt.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
    assert(got.toSeq == Seq((1L, "a", None), (2L, "b", Some(0.5))), got.mkString)
    // properties
    spark.sql("ALTER TABLE rc.alt.t SET TBLPROPERTIES ('write.note'='x')")
    // table rename is a service-side atomic move; old name gone
    spark.sql("ALTER TABLE rc.alt.t RENAME TO alt.t2")
    assert(spark.sql("SELECT count(*) FROM rc.alt.t2").head.getLong(0) == 2L)
    val e = intercept[Exception](spark.sql("SELECT * FROM rc.alt.t").collect())
    assert(e.toString.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.toString.contains("NoSuchTable"), e.toString)
    spark.sql("DROP NAMESPACE rc.alt CASCADE")
  }

  test("non-cascade DROP NAMESPACE of a non-empty namespace is rejected") {
    spark.sql("CREATE NAMESPACE rc.full")
    spark.sql("CREATE TABLE rc.full.t (k BIGINT)")
    spark.sql("INSERT INTO rc.full.t VALUES (1)")
    // DSv2 contract: cascade=false + contained tables → error, no wipe
    val e = intercept[Exception](spark.sql("DROP NAMESPACE rc.full"))
    assert(e.toString.toLowerCase.contains("empt"), e.toString) // NonEmptyNamespace
    assert(spark.sql("SELECT count(*) FROM rc.full.t").head.getLong(0) == 1L,
      "non-cascade drop must not have deleted table data")
    spark.sql("DROP NAMESPACE rc.full CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN rc").collect()
      .map(_.getString(0)).contains("full"))
  }

  test("non-cascade drop also rejects namespaces holding only non-table children") {
    spark.sql("CREATE NAMESPACE rc.viewns")
    // a view-like child (view.json dir), invisible to a tables-only
    // emptiness check — any child must block the non-cascade drop
    val vdir = java.nio.file.Paths.get(warehouse, "viewns", "v")
    Files.createDirectories(vdir)
    Files.write(vdir.resolve("view.json"), "{}".getBytes("UTF-8"))
    val e = intercept[Exception](spark.sql("DROP NAMESPACE rc.viewns"))
    assert(e.toString.toLowerCase.contains("empt"), e.toString)
    assert(Files.exists(vdir.resolve("view.json")),
      "non-cascade drop must not have wiped the view")
    spark.sql("DROP NAMESPACE rc.viewns CASCADE")
  }

  test("a failed multi-change ALTER leaves the schema untouched") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rc.atomic")
    spark.sql("CREATE TABLE rc.atomic.t (id BIGINT, name STRING)")
    spark.sql("INSERT INTO rc.atomic.t VALUES (1,'a')")
    // one alterTable carrying (add c1, rename missing column): the
    // whole call must fail WITHOUT committing c1 — otherwise a retry
    // trips over its own half-applied prefix.
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
    val cat = spark.sessionState.catalogManager.catalog("rc")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array("atomic"), "t")
    val e = intercept[Exception](cat.alterTable(ident,
      TableChange.addColumn(Array("c1"), org.apache.spark.sql.types.IntegerType),
      TableChange.renameColumn(Array("nope"), "x")))
    assert(e.toString.contains("nope"), e.toString)
    val cols = spark.sql("SELECT * FROM rc.atomic.t").columns.toSeq
    assert(cols == Seq("id", "name"),
      s"partial ALTER leaked a schema change: $cols")
    // the same ADD then succeeds standalone (no 'already exists')
    spark.sql("ALTER TABLE rc.atomic.t ADD COLUMN c1 INT")
    assert(spark.sql("SELECT * FROM rc.atomic.t").columns.toSeq
      == Seq("id", "name", "c1"))
    spark.sql("DROP NAMESPACE rc.atomic CASCADE")
  }

  test("server-arbitrated commits: CAS authority, concurrent writers serialize") {
    import org.apache.spark.sql.types._
    import graft.sources.RestArbitratedIO
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rc.arb")
    spark.sql("CREATE TABLE rc.arb.t (k BIGINT, v STRING)")
    val path = s"$warehouse/arb/t"
    def arbIo = new RestArbitratedIO(
      new graft.core.LocalFileIO(), server.uri, "sekrit", "arb", "t", path)
    // the /commit route IS a conditional PUT: first create wins,
    // repeat is refused, content is whole
    assert(arbIo.tryCreateAtomic(s"$path/snapshot/probe-1", "alpha"))
    assert(!arbIo.tryCreateAtomic(s"$path/snapshot/probe-1", "beta"))
    assert(new graft.core.LocalFileIO().readString(s"$path/snapshot/probe-1") == "alpha")
    // keys outside the table dir fall through to the delegate (never
    // the server, whose authority is scoped to this table)
    val outside = Files.createTempDirectory("graft-arb-out").toString + "/x"
    assert(arbIo.tryCreateAtomic(outside, "local"))

    // two writers, both committing through the arbiter: every snapshot
    // id has exactly one winner; the loser's normal CAS-retry lands it
    // on the next id — both rows present, snapshot ids dense
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    def handle() = graft.table.GraftTable.load(spark, path, arbIo)
    import spark.implicits._
    var writerMax = -1L
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = handle().write(Seq((1L, "a")).toDF("k", "v"))
      })
      val f2 = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = handle().write(Seq((2L, "b")).toDF("k", "v"))
      })
      val ids = Seq(f1.get(), f2.get())
      assert(ids.distinct.size == 2, s"one winner per snapshot id: $ids")
      writerMax = ids.max
    } finally pool.shutdown()
    val got = spark.sql("SELECT k, v FROM rc.arb.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b")), got.toString)

    // the catalog option wires the same path: reads and writes through
    // an arbitrated-commits catalog behave identically
    spark.conf.set("spark.sql.catalog.rcarb", "graft.sources.GraftRestCatalog")
    spark.conf.set("spark.sql.catalog.rcarb.uri", server.uri)
    spark.conf.set("spark.sql.catalog.rcarb.token", "sekrit")
    spark.conf.set("spark.sql.catalog.rcarb.arbitrated-commits", "true")
    spark.sql("INSERT INTO rcarb.arb.t VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) FROM rcarb.arb.t").head.getLong(0) == 3L)
    // latest-snapshot inspection route
    val conn = new java.net.URL(s"${server.uri}/v1/namespaces/arb/tables/t/snapshot")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestProperty("Authorization", "Bearer sekrit")
    val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
    val latest = graft.core.Json.read(body, classOf[Map[String, Any]])(
      "latestSnapshotId").toString.toLong
    // the catalog-routed INSERT landed one commit past the writers
    assert(latest == writerMax + 1, s"$body vs writers up to $writerMax")
  }

  test("path traversal in URL segments cannot escape the warehouse") {
    // a sentinel file ABOVE the warehouse that a traversal would delete
    val parent = java.nio.file.Paths.get(warehouse).getParent
    val sentinel = parent.resolve(s"sentinel-${System.nanoTime()}.txt")
    Files.write(sentinel, "canary".getBytes("UTF-8"))
    try {
      def raw(method: String, route: String): Int = {
        val conn = new java.net.URL(s"${server.uri}/v1/$route")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod(method)
        conn.setRequestProperty("Authorization", "Bearer sekrit")
        conn.getResponseCode
      }
      // '..' (raw and URL-encoded) must be rejected with 400, and the
      // recursive-delete handler must never run outside the warehouse
      def rejected(code: Int): Boolean = code == 400 || code == 404
      assert(rejected(raw("DELETE", "namespaces/..")))
      assert(rejected(raw("DELETE", "namespaces/%2e%2e")))
      assert(rejected(raw("DELETE", s"namespaces/..%2F${parent.getFileName}")))
      assert(rejected(raw("POST", "namespaces/..")))
      assert(rejected(raw("DELETE", "namespaces/ok/tables/..")))
      assert(Files.exists(sentinel), "traversal escaped the warehouse root")
    } finally Files.deleteIfExists(sentinel)
  }
}
