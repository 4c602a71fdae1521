package graft

import graft.sources.JdbcBridge
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** JDBC-backed catalog registry + distributed locks against a real
  * embedded Derby database (reference: paimon-core jdbc/JdbcCatalog +
  * AbstractDistributedLockDialect) — same JDBC surface as a
  * MySQL/Postgres deployment. */
class JdbcCatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dbDir = Files.createTempDirectory("graft-jdbc").toString
  private lazy val wh = Files.createTempDirectory("graft-jdbc-wh").toString
  private lazy val uri = s"jdbc:derby:$dbDir/cat;create=true"

  private def registerCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.jcat", "graft.sources.GraftJdbcCatalog")
    spark.conf.set("spark.sql.catalog.jcat.warehouse", wh)
    spark.conf.set("spark.sql.catalog.jcat.uri", uri)
  }

  test("DDL mirrors into the JDBC registry: create, rename, drop, namespaces") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS jcat.jb")
    spark.sql("CREATE TABLE jcat.jb.orders_j (k BIGINT, v STRING)")
    assert(JdbcBridge.tablePath(uri, "graft", "jb", "orders_j")
      .contains(s"$wh/jb/orders_j"))
    assert(JdbcBridge.listTables(uri, "graft", "jb") == Seq("orders_j"))
    assert(JdbcBridge.listDatabases(uri, "graft").contains("jb"))

    spark.sql("INSERT INTO jcat.jb.orders_j VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT count(*) FROM jcat.jb.orders_j").head.getLong(0) == 2L)

    // rename moves the registry entry and its path
    spark.sql("ALTER TABLE jcat.jb.orders_j RENAME TO jb.orders_r")
    assert(JdbcBridge.tablePath(uri, "graft", "jb", "orders_j").isEmpty)
    assert(JdbcBridge.tablePath(uri, "graft", "jb", "orders_r")
      .contains(s"$wh/jb/orders_r"))
    assert(spark.sql("SELECT count(*) FROM jcat.jb.orders_r").head.getLong(0) == 2L)

    // drop removes the entry
    spark.sql("DROP TABLE jcat.jb.orders_r")
    assert(JdbcBridge.tablePath(uri, "graft", "jb", "orders_r").isEmpty)
    assert(JdbcBridge.listTables(uri, "graft", "jb").isEmpty)
  }

  test("read-through: a registry entry resolves a table outside the warehouse") {
    registerCatalog()
    import org.apache.spark.sql.types._
    val ext = Files.createTempDirectory("graft-jdbc-ext").toString + "/t"
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val gt = graft.table.GraftTable.create(spark, ext, sch)
    import spark.implicits._
    gt.write(Seq((7L, "x"), (8L, "y")).toDF("k", "v"))
    JdbcBridge.init(uri)
    JdbcBridge.registerTable(uri, "graft", "extdb", "ext_t", ext)
    // nothing at <warehouse>/extdb/ext_t — resolution goes through JDBC
    assert(!graft.table.GraftTable.exists(s"$wh/extdb/ext_t"))
    val got = spark.sql("SELECT k, v FROM jcat.extdb.ext_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((7L, "x"), (8L, "y")))
    // the external table also shows in listings (registry ∪ warehouse)
    val listed = spark.sql("SHOW TABLES IN jcat.extdb")
      .collect().map(_.getString(1)).toSeq
    assert(listed.contains("ext_t"), listed.toString)
  }

  test("distributed locks: exclusion, release, expiry sweep of crashed holders") {
    JdbcBridge.init(uri)
    // exclusion: second acquire of a held lock fails
    assert(JdbcBridge.lockAcquire(uri, "L1", expireSecs = 60))
    assert(!JdbcBridge.lockAcquire(uri, "L1", expireSecs = 60))
    // release frees it
    assert(JdbcBridge.releaseLock(uri, "L1"))
    assert(JdbcBridge.lockAcquire(uri, "L1"))
    assert(JdbcBridge.releaseLock(uri, "L1"))
    // expiry: a "crashed holder" row with a tiny expiry is swept by
    // the next acquire instead of wedging the lock forever
    assert(JdbcBridge.lockAcquire(uri, "L2", expireSecs = 0))
    Thread.sleep(5)
    assert(JdbcBridge.lockAcquire(uri, "L2", expireSecs = 60),
      "timed-out lock must be sweepable by the next acquirer")
    assert(JdbcBridge.releaseLock(uri, "L2"))
    // withLock waits for a short-lived holder, then runs
    assert(JdbcBridge.lockAcquire(uri, "L3", expireSecs = 60))
    val releaser = new Thread(() => { Thread.sleep(300); JdbcBridge.releaseLock(uri, "L3") })
    releaser.start()
    val ran = JdbcBridge.withLock(uri, "L3", timeoutMs = 5000) { 42 }
    releaser.join()
    assert(ran == 42)
    // and a held lock past the timeout throws instead of hanging
    assert(JdbcBridge.lockAcquire(uri, "L4", expireSecs = 600))
    val e = intercept[IllegalStateException](
      JdbcBridge.withLock(uri, "L4", timeoutMs = 200) { () })
    assert(e.getMessage.contains("L4"))
    assert(JdbcBridge.releaseLock(uri, "L4"))
  }

  test("racing CREATEs on one identifier serialize under the DDL lock") {
    registerCatalog()
    JdbcBridge.init(uri)
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.connector.catalog.Identifier
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    // two catalog INSTANCES (two processes in miniature) race the same
    // CREATE: the lock serializes them, exactly one wins, the loser
    // fails cleanly, the registry holds exactly one row
    def mkCat(): graft.sources.GraftJdbcCatalog = {
      val c = new graft.sources.GraftJdbcCatalog
      c.initialize("jrace", new CaseInsensitiveStringMap(
        java.util.Map.of("warehouse", wh, "uri", uri)))
      c
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS jcat.race")
    val ident = Identifier.of(Array("race"), "t1")
    val sch = StructType(Seq(StructField("k", LongType, nullable = false)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val gate = new java.util.concurrent.CountDownLatch(1)
    def attempt() = pool.submit(new java.util.concurrent.Callable[Boolean] {
      def call(): Boolean = {
        gate.await()
        try {
          mkCat().createTable(ident, sch,
            Array.empty[org.apache.spark.sql.connector.expressions.Transform],
            new java.util.HashMap[String, String]())
          true
        } catch { case _: Exception => false }
      }
    })
    val (f1, f2) = (attempt(), attempt())
    gate.countDown()
    val wins = Seq(f1.get(), f2.get()).count(identity)
    pool.shutdown()
    assert(wins == 1, s"exactly one CREATE must win, got $wins")
    assert(JdbcBridge.listTables(uri, "graft", "race") == Seq("t1"))
    assert(spark.sql("SELECT count(*) FROM jcat.race.t1").head.getLong(0) == 0L)
  }

  test("rename locks its SOURCE identifier; create locks its NAMESPACE") {
    registerCatalog()
    JdbcBridge.init(uri)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS jcat.lk")
    spark.sql("CREATE TABLE jcat.lk.src (k BIGINT)")
    // hold the SOURCE identifier's lock: a rename must wait on it (a
    // destination-only lock would let DROP of the source interleave
    // with the move, leaving a half-deleted table under the new name)
    assert(JdbcBridge.lockAcquire(uri, "graft.lk.src", expireSecs = 600))
    val renamed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      spark.sql("ALTER TABLE jcat.lk.src RENAME TO lk.dst")
      renamed.set(true)
    })
    t.start()
    Thread.sleep(700)
    assert(!renamed.get, "rename must block while the source lock is held")
    JdbcBridge.releaseLock(uri, "graft.lk.src")
    t.join(30000)
    assert(renamed.get, "rename must proceed once the source lock frees")
    assert(JdbcBridge.tablePath(uri, "graft", "lk", "dst").isDefined)

    // hold the NAMESPACE lock: a create must wait on it (otherwise a
    // CREATE racing DROP NAMESPACE CASCADE can land its registry row
    // after the cascade's delete — a phantom entry with no storage)
    assert(JdbcBridge.lockAcquire(uri, "graft.lk.__namespace__", expireSecs = 600))
    val created = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t2 = new Thread(() => {
      spark.sql("CREATE TABLE jcat.lk.t2 (k BIGINT)")
      created.set(true)
    })
    t2.start()
    Thread.sleep(700)
    assert(!created.get, "create must block while the namespace lock is held")
    JdbcBridge.releaseLock(uri, "graft.lk.__namespace__")
    t2.join(30000)
    assert(created.get, "create must proceed once the namespace lock frees")
    assert(JdbcBridge.tablePath(uri, "graft", "lk", "t2").isDefined)
  }

  test("lock release is fenced: an expired holder cannot delete its successor's lock") {
    JdbcBridge.init(uri)
    // holder 1 "crashes" past its expiry; a successor sweeps its row
    val t1 = JdbcBridge.lockAcquireToken(uri, "F1", expireSecs = 0).get
    Thread.sleep(5)
    val t2 = JdbcBridge.lockAcquireToken(uri, "F1", expireSecs = 600).get
    assert(t2 > t1, "successor's fencing token must exceed the evicted holder's")
    // the stale holder's (token-conditioned) release must NO-OP —
    // an unconditional delete here would hand the lock to a third
    // party while the successor still runs its critical section
    assert(!JdbcBridge.releaseLockToken(uri, "F1", t1))
    assert(!JdbcBridge.lockAcquire(uri, "F1"),
      "lock must still be held by the successor after the stale release")
    assert(JdbcBridge.releaseLockToken(uri, "F1", t2))
    assert(JdbcBridge.lockAcquire(uri, "F1"))
    assert(JdbcBridge.releaseLock(uri, "F1"))
  }

  test("non-cascade DROP NAMESPACE refuses while the registry holds tables") {
    registerCatalog()
    JdbcBridge.init(uri)
    import org.apache.spark.sql.types._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS jcat.ne")
    // an EXTERNAL read-through registration: invisible to the
    // warehouse directory, so only the registry knows the namespace
    // is non-empty — a drop keyed on the fs alone would destroy the
    // table's only registration silently
    val ext = Files.createTempDirectory("graft-jdbc-ne").toString + "/t"
    val sch = StructType(Seq(StructField("k", LongType, nullable = false)))
    import spark.implicits._
    graft.table.GraftTable.create(spark, ext, sch)
      .write(Seq(1L, 2L).toDF("k"))
    JdbcBridge.registerTable(uri, "graft", "ne", "ext_t", ext)
    val c = new graft.sources.GraftJdbcCatalog
    c.initialize("jne", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh, "uri", uri)))
    intercept[org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException](
      c.dropNamespace(Array("ne"), cascade = false))
    assert(JdbcBridge.tablePath(uri, "graft", "ne", "ext_t").isDefined,
      "refused drop must leave the registration intact")
    assert(c.dropNamespace(Array("ne"), cascade = true))
    assert(JdbcBridge.tablePath(uri, "graft", "ne", "ext_t").isEmpty)
  }

  test("repair registers warehouse tables created outside the catalog") {
    registerCatalog()
    import org.apache.spark.sql.types._
    // a table that exists in the warehouse but not in the registry —
    // created via the library API, bypassing the catalog
    val sch = StructType(Seq(StructField("k", LongType, nullable = false)))
    val gt = graft.table.GraftTable.create(spark, s"$wh/fix/orphan_t", sch)
    import spark.implicits._
    gt.write(Seq(1L, 2L).toDF("k"))
    assert(JdbcBridge.tablePath(uri, "graft", "fix", "orphan_t").isEmpty)
    val msg = spark.sql("CALL jcat.sys.repair('fix.orphan_t')").head.getString(0)
    assert(msg == "fix.orphan_t: registered", msg)
    assert(JdbcBridge.tablePath(uri, "graft", "fix", "orphan_t")
      .contains(s"$wh/fix/orphan_t"))
    // idempotent
    val again = spark.sql("CALL jcat.sys.repair('fix.orphan_t')").head.getString(0)
    assert(again == "fix.orphan_t: already registered", again)
    // database-wide form sweeps every table under it
    val msg2 = spark.sql("CALL jcat.sys.repair('fix')").head.getString(0)
    assert(msg2.contains("orphan_t"), msg2)
  }

  test("CALL sys.register_table points the registry at an external path") {
    registerCatalog()
    import org.apache.spark.sql.types._
    import spark.implicits._
    val ext = Files.createTempDirectory("graft-jdbc-reg").toString + "/t"
    val sch = StructType(Seq(StructField("k", LongType, nullable = false)))
    graft.table.GraftTable.create(spark, ext, sch).write(Seq(3L, 4L).toDF("k"))
    val msg = spark.sql(
      s"CALL jcat.sys.register_table('regdb.ext_p', '$ext')").head.getString(0)
    assert(msg.contains("registered"), msg)
    assert(spark.sql("SELECT count(*) FROM jcat.regdb.ext_p").head.getLong(0) == 2L)
    val msg2 = spark.sql(
      s"CALL jcat.sys.register_table('regdb.ext_p', '$ext')").head.getString(0)
    assert(msg2.contains("already registered"), msg2)
  }

  test("ALTER NAMESPACE property changes land in the registry") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS jcat.props")
    spark.sql(
      "ALTER NAMESPACE jcat.props SET PROPERTIES ('team'='etl', 'tier'='gold')")
    val c = spark.sessionState.catalogManager.catalog("jcat")
      .asInstanceOf[graft.sources.GraftJdbcCatalog]
    val md = c.loadNamespaceMetadata(Array("props"))
    assert(md.get("team") == "etl" && md.get("tier") == "gold", md.toString)
    // update + remove through the V2 change API
    c.alterNamespace(Array("props"),
      org.apache.spark.sql.connector.catalog.NamespaceChange.setProperty("tier", "silver"),
      org.apache.spark.sql.connector.catalog.NamespaceChange.removeProperty("team"))
    val md2 = c.loadNamespaceMetadata(Array("props"))
    assert(md2.get("tier") == "silver" && md2.get("team") == null, md2.toString)
    intercept[Exception](c.alterNamespace(Array("no_such_db"),
      org.apache.spark.sql.connector.catalog.NamespaceChange.setProperty("k", "v")))
  }

  test("two catalog handles over one registry see each other's tables") {
    registerCatalog()
    // a second catalog name, same JDBC uri + warehouse = a second
    // process's view in miniature
    spark.conf.set("spark.sql.catalog.jcat2", "graft.sources.GraftJdbcCatalog")
    spark.conf.set("spark.sql.catalog.jcat2.warehouse", wh)
    spark.conf.set("spark.sql.catalog.jcat2.uri", uri)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS jcat.share")
    spark.sql("CREATE TABLE jcat.share.t1 (k BIGINT)")
    spark.sql("INSERT INTO jcat.share.t1 VALUES (5)")
    assert(spark.sql("SELECT k FROM jcat2.share.t1").head.getLong(0) == 5L)
    assert(JdbcBridge.listTables(uri, "graft", "share") == Seq("t1"))
    spark.sql("DROP TABLE jcat2.share.t1")
    assert(JdbcBridge.listTables(uri, "graft", "share").isEmpty)
  }
}
