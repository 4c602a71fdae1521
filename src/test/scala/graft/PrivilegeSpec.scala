package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** File-based access control (reference: paimon privilege/ —
  * FileBasedPrivilegeManager + the privilege procedures). Three
  * catalogs over ONE warehouse: `pw_root` authenticates as root,
  * `pw_alice` as a limited user, `pw_anon` with no credentials. */
class PrivilegeSpec extends AnyFunSuite {

  lazy val warehouse: String = Files.createTempDirectory("graft-priv").toString

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    for (cat <- Seq("pw_root", "pw_alice", "pw_anon")) {
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    }
    s.conf.set("spark.sql.catalog.pw_root.user", "root")
    s.conf.set("spark.sql.catalog.pw_root.password", "r00t")
    s.conf.set("spark.sql.catalog.pw_alice.user", "alice")
    s.conf.set("spark.sql.catalog.pw_alice.password", "wonder")
    s
  }

  test("init, users, grants: SELECT/INSERT enforced per table; admin procedures gated") {
    // before init: anything goes (opt-in model)
    spark.sql("CREATE NAMESPACE pw_anon.db")
    spark.sql("CREATE TABLE pw_anon.db.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO pw_anon.db.t VALUES (1,'a'),(2,'b')")

    spark.sql("CALL pw_root.sys.init_file_based_privilege('r00t')")

    // root sets up alice with SELECT on db.t only
    spark.sql("CALL pw_root.sys.create_privileged_user('alice', 'wonder')")
    spark.sql("CALL pw_root.sys.grant_privilege_to_user('alice', 'SELECT', 'db.t')")

    // alice can read...
    assert(spark.sql("SELECT count(*) FROM pw_alice.db.t").head.getLong(0) == 2L)
    // ...but not write
    val insErr = intercept[Exception](
      spark.sql("INSERT INTO pw_alice.db.t VALUES (3,'c')"))
    assert(insErr.toString.contains("lacks INSERT"), insErr.toString)
    // ...and not run maintenance procedures
    val procErr = intercept[Exception](
      spark.sql("CALL pw_alice.sys.compact('db.t')"))
    assert(procErr.toString.contains("lacks ADMIN"), procErr.toString)

    // anonymous (no credentials) fails authentication outright
    val anonErr = intercept[Exception](
      spark.sql("SELECT * FROM pw_anon.db.t").collect())
    assert(anonErr.toString.contains("authentication failed"), anonErr.toString)

    // grant INSERT → the write goes through; root can always write
    spark.sql("CALL pw_root.sys.grant_privilege_to_user('alice', 'INSERT', 'db.t')")
    spark.sql("INSERT INTO pw_alice.db.t VALUES (3,'c')")
    spark.sql("INSERT INTO pw_root.db.t VALUES (4,'d')")
    assert(spark.sql("SELECT count(*) FROM pw_root.db.t").head.getLong(0) == 4L)

    // database-scope grant covers new tables beneath it
    spark.sql("CREATE TABLE pw_root.db.t2 (k BIGINT)")
    spark.sql("INSERT INTO pw_root.db.t2 VALUES (10)")
    spark.sql("CALL pw_root.sys.grant_privilege_to_user('alice', 'SELECT', 'db')")
    assert(spark.sql("SELECT k FROM pw_alice.db.t2").head.getLong(0) == 10L)

    // DDL needs its own privileges
    val createErr = intercept[Exception](
      spark.sql("CREATE TABLE pw_alice.db.t3 (k BIGINT)"))
    assert(createErr.toString.contains("lacks CREATE_TABLE"), createErr.toString)
    val dropErr = intercept[Exception](spark.sql("DROP TABLE pw_alice.db.t"))
    assert(dropErr.toString.contains("lacks DROP_TABLE"), dropErr.toString)

    // revoke closes the door again
    spark.sql("CALL pw_root.sys.revoke_privilege_from_user('alice', 'INSERT', 'db.t')")
    val insErr2 = intercept[Exception](
      spark.sql("INSERT INTO pw_alice.db.t VALUES (9,'z')"))
    assert(insErr2.toString.contains("lacks INSERT"), insErr2.toString)

    // wrong password fails loudly
    spark.conf.set("spark.sql.catalog.pw_evil", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pw_evil.warehouse", warehouse)
    spark.conf.set("spark.sql.catalog.pw_evil.user", "alice")
    spark.conf.set("spark.sql.catalog.pw_evil.password", "guess")
    val authErr = intercept[Exception](
      spark.sql("SELECT * FROM pw_evil.db.t").collect())
    assert(authErr.toString.contains("authentication failed"), authErr.toString)

    // dropping the user removes grants; re-init refused
    spark.sql("CALL pw_root.sys.drop_privileged_user('alice')")
    intercept[Exception](
      spark.sql("CALL pw_root.sys.init_file_based_privilege('again')"))
  }

  test("system-table suffixes and namespace drops are guarded too") {
    // bob: SELECT on db.t2 only
    spark.sql("CALL pw_root.sys.create_privileged_user('bob', 'pw')")
    spark.sql("CALL pw_root.sys.grant_privilege_to_user('bob', 'SELECT', 'db.t2')")
    spark.conf.set("spark.sql.catalog.pw_bob", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pw_bob.warehouse", warehouse)
    spark.conf.set("spark.sql.catalog.pw_bob.user", "bob")
    spark.conf.set("spark.sql.catalog.pw_bob.password", "pw")

    // $-suffix on an UNGRANTED table surfaces row data -> denied
    val sysErr = intercept[Exception](
      spark.sql("SELECT * FROM pw_bob.db.`t$audit_log`").collect())
    assert(sysErr.toString.contains("lacks SELECT"), sysErr.toString)
    // granted table's suffix works
    assert(spark.sql("SELECT * FROM pw_bob.db.`t2$snapshots`").count() >= 1L)

    // DROP NAMESPACE cascade needs namespace-scope DROP_TABLE
    val nsErr = intercept[Exception](
      spark.sql("DROP NAMESPACE pw_bob.db CASCADE"))
    assert(nsErr.toString.contains("lacks DROP_TABLE"), nsErr.toString)
  }

  test("views run with INVOKER's rights: base-table SELECT is required") {
    // root defines a view over db.t2; carol is granted nothing on the
    // base table — reading through the view must still be denied
    // (the stored text re-resolves to a guarded base scan)
    spark.conf.set("spark.sql.catalog.pw_rootx", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pw_rootx.warehouse", warehouse)
    spark.conf.set("spark.sql.catalog.pw_rootx.user", "root")
    spark.conf.set("spark.sql.catalog.pw_rootx.password", "r00t")
    graft.sources.GraftViews.create(warehouse,
      new org.apache.spark.sql.connector.catalog.ViewInfo(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "v2view"),
        s"SELECT k FROM pw_carol.db.t2", "pw_rootx", Array("db"),
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.LongType),
        Array("k"), Array.empty, Array.empty,
        new java.util.HashMap[String, String]()),
      orReplace = false)

    spark.sql("CALL pw_root.sys.create_privileged_user('carol', 'pw')")
    spark.conf.set("spark.sql.catalog.pw_carol", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pw_carol.warehouse", warehouse)
    spark.conf.set("spark.sql.catalog.pw_carol.user", "carol")
    spark.conf.set("spark.sql.catalog.pw_carol.password", "pw")
    // carol has no grant on db.t2: the view is no side door. The read
    // must go through an extensions session (view resolution) — which
    // is fresh, so register the catalogs on it too.
    graft.queries.withGraftExtensions(spark) { s2 =>
      for ((cat, u, pw) <- Seq(("pw_carol", "carol", "pw"), ("pw_root", "root", "r00t"))) {
        s2.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s2.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
        s2.conf.set(s"spark.sql.catalog.$cat.user", u)
        s2.conf.set(s"spark.sql.catalog.$cat.password", pw)
      }
      val e = intercept[Exception](
        s2.sql("SELECT k FROM pw_carol.db.v2view").collect())
      assert(e.toString.contains("lacks SELECT"), e.toString)
      // with the base grant the same view works
      s2.sql("CALL pw_root.sys.grant_privilege_to_user('carol', 'SELECT', 'db.t2')")
      assert(s2.sql("SELECT k FROM pw_carol.db.v2view").count() >= 1L)
    }
  }

  test("db-scoped ADMIN implies privileges beneath its scope, not warehouse-wide procedures") {
    spark.sql("CALL pw_root.sys.create_privileged_user('dave', 'pw')")
    spark.sql("CALL pw_root.sys.grant_privilege_to_user('dave', 'ADMIN', 'db')")
    spark.conf.set("spark.sql.catalog.pw_dave", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pw_dave.warehouse", warehouse)
    spark.conf.set("spark.sql.catalog.pw_dave.user", "dave")
    spark.conf.set("spark.sql.catalog.pw_dave.password", "pw")
    // implied: SELECT + INSERT on tables under db (the grant is not inert)
    assert(spark.sql("SELECT count(*) FROM pw_dave.db.t2").head.getLong(0) >= 1L)
    spark.sql("INSERT INTO pw_dave.db.t2 VALUES (77)")
    // NOT implied: '*'-gated procedures — scoped admin stays scoped
    val procErr = intercept[Exception](
      spark.sql("CALL pw_dave.sys.compact('db.t2')"))
    assert(procErr.toString.contains("lacks ADMIN"), procErr.toString)
  }
}
