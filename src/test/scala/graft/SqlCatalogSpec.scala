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

  test("read options select snapshot/tag/timestamp for batch reads") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbro")
    spark.sql("CREATE TABLE graft.dbro.t (k BIGINT)")
    spark.sql("INSERT INTO graft.dbro.t VALUES (1)")
    val gt = graft.table.GraftTable.load(spark, s"$warehouse/dbro/t")
    gt.createTag("v1")
    val ts1 = gt.sm.snapshot(0L).timeMillis
    spark.sql("INSERT INTO graft.dbro.t VALUES (2)")
    assert(spark.read.table("graft.dbro.t").count() == 2L)
    assert(spark.read.option("scan.snapshot-id", "0")
      .table("graft.dbro.t").count() == 1L)
    assert(spark.read.option("scan.tag-name", "v1")
      .table("graft.dbro.t").count() == 1L)
    assert(spark.read.option("scan.timestamp-millis", ts1.toString)
      .table("graft.dbro.t").count() == 1L)
    val e = intercept[Exception](spark.read.option("scan.tag-name", "nope")
      .table("graft.dbro.t").count())
    assert(e.toString.contains("nope"), e.toString)
    // the tag's materialized copy outlives snapshot expiration: both
    // spellings keep working after the tagged snapshot file is gone
    gt.expireSnapshots(retain = 1)
    assert(!gt.sm.snapshotIds.contains(0L), "snapshot 0 should be expired")
    assert(spark.read.option("scan.tag-name", "v1")
      .table("graft.dbro.t").count() == 1L)
    assert(spark.sql("SELECT count(*) FROM graft.dbro.t VERSION AS OF 'v1'")
      .head.getLong(0) == 1L)
  }

  test("VERSION AS OF resolves tags and branches, not just snapshot ids") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbtt")
    spark.sql("CREATE TABLE graft.dbtt.t (k BIGINT)")
    spark.sql("INSERT INTO graft.dbtt.t VALUES (1)")
    val gt = graft.table.GraftTable.load(spark, s"$warehouse/dbtt/t")
    gt.createTag("v1")
    spark.sql("INSERT INTO graft.dbtt.t VALUES (2)")
    gt.createBranch("b1")
    spark.sql("INSERT INTO graft.dbtt.t VALUES (3)")
    assert(spark.sql("SELECT count(*) FROM graft.dbtt.t").head.getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) FROM graft.dbtt.t VERSION AS OF 'v1'")
      .head.getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) FROM graft.dbtt.t VERSION AS OF 'b1'")
      .head.getLong(0) == 2L)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.dbtt.t VERSION AS OF 'nope'").collect())
    assert(e.toString.contains("nope"), e.toString)
    // a tag with an all-digit name wins over snapshot-id parsing
    // (reference checks tagExists before parsing)
    gt.createTag("9999")
    spark.sql("INSERT INTO graft.dbtt.t VALUES (4)")
    assert(spark.sql("SELECT count(*) FROM graft.dbtt.t VERSION AS OF '9999'")
      .head.getLong(0) == 3L)
  }

  test("literal dotted column names never collide with nested paths") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbdot")
    spark.sql(
      "CREATE TABLE graft.dbdot.t (k BIGINT, `a.b` STRING, a STRUCT<b: BIGINT>)")
    spark.sql(
      "INSERT INTO graft.dbdot.t VALUES (1, 'flat', named_struct('b', 7L))")
    // DROP COLUMN `a.b` (quoted → 1-element field array) must drop the
    // FLAT column, never the nested a.b
    spark.sql("ALTER TABLE graft.dbdot.t DROP COLUMN `a.b`")
    val sch = spark.sql("SELECT * FROM graft.dbdot.t").schema
    assert(sch.fieldNames.toSeq == Seq("k", "a"))
    assert(sch("a").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("b"), "nested a.b must have survived")
    assert(spark.sql("SELECT a.b FROM graft.dbdot.t").head.getLong(0) == 7L)
  }

  test("nested ALTER through SQL; failed multi-change ALTER commits nothing") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db3n")
    spark.sql("CREATE TABLE graft.db3n.t (k BIGINT, s STRUCT<a: BIGINT, b: STRING>)")
    spark.sql("INSERT INTO graft.db3n.t VALUES (1, named_struct('a', 10L, 'b', 'x'))")
    // nested ADD: old rows read the new field as null
    spark.sql("ALTER TABLE graft.db3n.t ADD COLUMN s.c INT")
    spark.sql(
      "INSERT INTO graft.db3n.t VALUES (2, named_struct('a', 20L, 'b', 'y', 'c', 7))")
    val got = spark.sql("SELECT k, s.a, s.c FROM graft.db3n.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2))))
    assert(got.toSeq == Seq((1L, 10L, None), (2L, 20L, Some(7))))
    // nested DROP projects the field away everywhere
    spark.sql("ALTER TABLE graft.db3n.t DROP COLUMN s.b")
    assert(spark.sql("SELECT s FROM graft.db3n.t").schema("s")
      .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("a", "c"))
    // atomicity: (valid add, invalid rename) in ONE alterTable call
    // must commit neither
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[TableCatalog]
    val ident = Identifier.of(Array("db3n"), "t")
    val e = intercept[Exception](cat.alterTable(ident,
      TableChange.addColumn(Array("c1"), org.apache.spark.sql.types.IntegerType),
      TableChange.renameColumn(Array("nope"), "x")))
    assert(e.toString.contains("nope"), e.toString)
    assert(!spark.sql("SELECT * FROM graft.db3n.t").columns.contains("c1"),
      "failed multi-change ALTER leaked its valid prefix")
  }

  test("ALTER TABLE RENAME / ALTER COLUMN TYPE / DROP COLUMN") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db4")
    spark.sql("CREATE TABLE graft.db4.t (k BIGINT, amount INT, junk STRING)")
    spark.sql("INSERT INTO graft.db4.t VALUES (1, 100, 'x')")
    spark.sql("ALTER TABLE graft.db4.t RENAME COLUMN amount TO price")
    spark.sql("ALTER TABLE graft.db4.t ALTER COLUMN price TYPE BIGINT")
    spark.sql("ALTER TABLE graft.db4.t DROP COLUMN junk")
    spark.sql("INSERT INTO graft.db4.t VALUES (2, 3000000000)")
    val got = spark.sql("SELECT k, price FROM graft.db4.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 100L), (2L, 3000000000L)))
  }

  test("append-table SQL scan is the native columnar batch with pushed filters") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db5")
    spark.sql(
      """CREATE TABLE graft.db5.t (k BIGINT, p STRING, v DOUBLE)
        |PARTITIONED BY (p)""".stripMargin)
    spark.sql("INSERT INTO graft.db5.t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    spark.sql("INSERT INTO graft.db5.t VALUES (100, 'a', 3.0)")
    val q = spark.sql("SELECT k, v FROM graft.db5.t WHERE p = 'a' AND k > 50")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftBatchScan"), s"expected native scan in:\n$plan")
    // partition + stats pruning happened at plan time: one file scanned
    assert(q.queryExecution.executedPlan.toString.contains("files=1"))
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(100L))
    // pruning observability: the scan reports driver metrics to the UI
    val scanExec = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scanExec.customMetrics.keySet ==
      Set("filesPlanned", "filesAfterRuntimeFiltering", "bytesPlanned"))
    // merge-on-read tables keep the V1 (DataFrame-planned) path
    val pk = spark.sql("SELECT * FROM graft.db2.users WHERE id = 1")
    assert(!pk.queryExecution.executedPlan.toString.contains("GraftBatchScan"))
  }

  test("scan.plan-sort-partition orders planned files by partition value") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbsp")
    spark.sql(
      """CREATE TABLE graft.dbsp.t (k BIGINT, p STRING)
        |PARTITIONED BY (p)
        |TBLPROPERTIES ('scan.plan-sort-partition'='true')""".stripMargin)
    // interleaved partition arrival: c, a, b, a, c
    Seq("c", "a", "b", "a", "c").zipWithIndex.foreach { case (p, i) =>
      spark.sql(s"INSERT INTO graft.dbsp.t VALUES ($i, '$p')")
    }
    val q = spark.sql("SELECT k, p FROM graft.dbsp.t")
    val scanExec = q.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val parts = scanExec.inputPartitions.collect {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp
    }
    // concatenated file order is partition-sorted (a* then b* then c*)
    val dirs = parts.flatMap(_.files).map(f =>
      f.toPath.getParent.getName).filter(_.startsWith("p="))
    assert(dirs.nonEmpty && dirs.sameElements(dirs.sorted),
      s"files not partition-clustered: ${dirs.mkString(", ")}")
  }

  test("chain table through SQL: SELECT composes the branches; branch " +
    "suffix reads serve the branch's own data") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.chn")
    spark.sql(
      """CREATE TABLE graft.chn.t (dt STRING, k BIGINT, v STRING, seq BIGINT)
        |PARTITIONED BY (dt)
        |TBLPROPERTIES ('primary-key'='dt,k', 'sequence.field'='seq',
        |  'chain-table.enabled'='true',
        |  'scan.fallback-snapshot-branch'='snap',
        |  'scan.fallback-delta-branch'='delta')""".stripMargin)
    spark.sql("CALL graft.sys.create_branch('chn.t', 'snap')")
    spark.sql("CALL graft.sys.create_branch('chn.t', 'delta')")
    spark.sql("INSERT INTO graft.chn.`t$branch_snap` VALUES ('d1', 1, 'a', 1)")
    spark.sql("INSERT INTO graft.chn.`t$branch_delta` VALUES ('d2', 1, 'a2', 2), ('d2', 2, 'b', 2)")
    // the SQL read composes: d1 as-is + d2 reconstructed from d1+delta
    val got = spark.sql("SELECT dt, k, v FROM graft.chn.t ORDER BY dt, k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("d1", 1L, "a"), ("d2", 1L, "a2"), ("d2", 2L, "b")), got.mkString(","))
    // branch suffix reads serve ONLY that branch (no chain recursion)
    val snapRows = spark.sql("SELECT dt, k FROM graft.chn.`t$branch_snap`")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(snapRows.toSeq == Seq(("d1", 1L)), snapRows.mkString(","))
  }

  test("materialized table: refresh re-runs the stored definition, aligns " +
    "by name, and fully replaces content") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.mat")
    spark.sql("CREATE TABLE graft.mat.src (k BIGINT, grp STRING, x DOUBLE)")
    spark.sql("INSERT INTO graft.mat.src VALUES (1,'a',1.0),(2,'a',2.0),(3,'b',5.0)")
    spark.sql(
      """CREATE TABLE graft.mat.agg (grp STRING, total DOUBLE, n BIGINT)
        |TBLPROPERTIES ('materialized-table.definition-query'=
        |  'SELECT grp, count(*) AS n, sum(x) AS total FROM graft.mat.src GROUP BY grp')""".stripMargin)
    assert(spark.sql("SELECT * FROM graft.mat.agg").count() == 0)
    spark.sql("CALL graft.sys.refresh_materialized_table('mat.agg')")
    val r1 = spark.sql("SELECT grp, total, n FROM graft.mat.agg ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(r1.toSeq == Seq(("a", 3.0, 2L), ("b", 5.0, 1L)), r1.mkString(","))
    // the source changes; a second refresh fully replaces the content
    spark.sql("INSERT INTO graft.mat.src VALUES (4,'c',7.0)")
    spark.sql("DELETE FROM graft.mat.src WHERE grp = 'b'")
    spark.sql("CALL graft.sys.refresh_materialized_table('mat.agg')")
    val r2 = spark.sql("SELECT grp, total, n FROM graft.mat.agg ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(r2.toSeq == Seq(("a", 3.0, 2L), ("c", 7.0, 1L)), r2.mkString(","))
    // refresh-status bookkeeping landed in the options
    assert(spark.sql("SELECT value FROM graft.mat.`agg$options`")
      .collect().exists(_.getString(0).startsWith("refreshed:snapshot-")))
    // a definition missing a declared column fails loudly
    spark.sql(
      """CREATE TABLE graft.mat.bad (grp STRING, missing BIGINT)
        |TBLPROPERTIES ('materialized-table.definition-query'=
        |  'SELECT grp FROM graft.mat.src')""".stripMargin)
    val err = intercept[Exception] {
      spark.sql("CALL graft.sys.refresh_materialized_table('mat.bad')")
    }
    assert(err.getMessage.contains("missing") ||
      Option(err.getCause).exists(_.getMessage.contains("missing")), err.toString)
  }

  test("COUNT(*) / MIN / MAX answer from manifest stats via LocalScan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db6")
    spark.sql("CREATE TABLE graft.db6.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.db6.t VALUES (1, 1.5), (2, 2.5)")
    spark.sql("INSERT INTO graft.db6.t VALUES (3, 0.5)")
    val q = spark.sql("SELECT count(*), min(k), max(v) FROM graft.db6.t")
    // complete pushdown: the physical plan is a LocalTableScan of the
    // manifest-derived row — no file scan at all
    assert(q.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      s"expected LocalTableScan in:\n${q.queryExecution.executedPlan}")
    val r = q.head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L && r.getDouble(2) == 2.5)
    // with a residual filter the pushdown must NOT fire
    val qf = spark.sql("SELECT count(*) FROM graft.db6.t WHERE v > 1.0")
    assert(!qf.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(qf.head.getLong(0) == 2L)
  }

  test("DELETE FROM routes through the library's three-tier delete") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db7")
    spark.sql(
      """CREATE TABLE graft.db7.t (k BIGINT, p STRING)
        |PARTITIONED BY (p)""".stripMargin)
    spark.sql("INSERT INTO graft.db7.t VALUES (1, 'a'), (2, 'b'), (3, 'b')")
    spark.sql("DELETE FROM graft.db7.t WHERE p = 'a'") // metadata-only drop
    assert(spark.sql("SELECT k FROM graft.db7.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    spark.sql("DELETE FROM graft.db7.t WHERE k = 2")   // rewrite path
    assert(spark.sql("SELECT k FROM graft.db7.t").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("$-suffix system tables are readable through SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db9")
    spark.sql("CREATE TABLE graft.db9.t (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.db9.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.db9.t VALUES (3, 'a')")
    assert(spark.sql("SELECT * FROM graft.db9.`t$snapshots`").count() == 2)
    assert(spark.sql(
      "SELECT min_value_stats['k'] FROM graft.db9.`t$files` WHERE row_count > 0")
      .collect().forall(!_.isNullAt(0)))
    assert(spark.sql("SELECT sum(row_count) FROM graft.db9.`t$files`")
      .head.getLong(0) == 3L)
    val parts = spark.sql(
      "SELECT partition, record_count FROM graft.db9.`t$partitions` ORDER BY partition")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(parts.toSeq == Seq(("p=a", 2L), ("p=b", 1L)))
    assert(spark.sql("SELECT * FROM graft.db9.`t$schemas`").count() == 1)
    assert(spark.sql("SELECT * FROM graft.db9.`t$options`").count() >= 0)
    intercept[Exception](spark.sql("SELECT * FROM graft.db9.`t$nope`").collect())
  }

  test("SQL UPDATE / MERGE INTO rewrite touched files copy-on-write") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbu")
    spark.sql(
      """CREATE TABLE graft.dbu.t (k BIGINT, p STRING, v DOUBLE)
        |PARTITIONED BY (p)""".stripMargin)
    spark.sql("INSERT INTO graft.dbu.t VALUES (1, 'a', 1.0), (2, 'a', 2.0)")
    spark.sql("INSERT INTO graft.dbu.t VALUES (3, 'b', 3.0)")
    // UPDATE with an arithmetic predicate (not filter-translatable)
    spark.sql("UPDATE graft.dbu.t SET v = v * 10 WHERE k % 2 = 0")
    val got = spark.sql("SELECT k, v FROM graft.dbu.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 1.0), (2L, 20.0), (3L, 3.0)))
    // MERGE INTO with update + insert clauses
    spark.sql("SELECT * FROM VALUES (2L, 'a', 99.0), (9L, 'b', 9.0) AS s(k, p, v)")
      .createOrReplaceTempView("dbu_src")
    spark.sql(
      """MERGE INTO graft.dbu.t t USING dbu_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got2 = spark.sql("SELECT k, v FROM graft.dbu.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got2.toSeq == Seq((1L, 1.0), (2L, 99.0), (3L, 3.0), (9L, 9.0)))
    // DELETE with a non-translatable predicate goes copy-on-write too
    spark.sql("DELETE FROM graft.dbu.t WHERE k % 3 = 0")
    assert(spark.sql("SELECT k FROM graft.dbu.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("runtime filtering (DPP) drops partitions from the native scan") {
    import graft.table.GraftTable
    import graft.sources.GraftBatchScan
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.lit
    val sch = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("p", StringType, nullable = false)))
    val dir = Files.createTempDirectory("graft-dpp").toString + "/t"
    val t = GraftTable.create(spark, dir, sch, partitionKeys = Seq("p"))
    import scala.jdk.CollectionConverters._
    def df(rows: (Long, String)*) = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, sch)
    t.write(df((1L, "a"), (2L, "b"), (3L, "c")))
    val entries = t.planEntries(lit(true))
    val dataSchema = StructType(Seq(StructField("k", LongType, nullable = false)))
    val partSchema = StructType(Seq(StructField("p", StringType, nullable = false)))
    val scan = new GraftBatchScan(t, entries, dataSchema, dataSchema,
      partSchema, Array.empty, StructType(dataSchema.fields ++ partSchema.fields))
    assert(scan.planInputPartitions().nonEmpty)
    val before = scan.planInputPartitions()
      .map(_.asInstanceOf[org.apache.spark.sql.execution.datasources.FilePartition])
      .map(_.files.length).sum
    assert(before == 3)
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    scan.filter(Array(new Predicate("IN",
      Array(Expressions.column("p"), Expressions.literal("a"), Expressions.literal("c")))))
    val after = scan.planInputPartitions()
      .map(_.asInstanceOf[org.apache.spark.sql.execution.datasources.FilePartition])
      .map(_.files.length).sum
    assert(after == 2, s"runtime IN filter should keep 2 of 3 partitions, kept $after")
  }

  test("catalog functions: bucket() matches the writer, max_pt() reads manifests") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbf")
    spark.sql(
      """CREATE TABLE graft.dbf.t (k BIGINT, dt STRING)
        |PARTITIONED BY (dt)""".stripMargin)
    spark.sql("INSERT INTO graft.dbf.t VALUES (1, '2024-01-01'), (2, '2024-02-01')")
    // bucket() reproduces the writer's pmod(xxhash64(k), n)
    val fromSql = spark.sql("SELECT k, graft.sys.bucket(8, k) FROM graft.dbf.t")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val expected = spark.sql("SELECT k, CAST(pmod(xxhash64(k), 8) AS INT) FROM graft.dbf.t")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(fromSql == expected)
    assert(spark.sql("SELECT graft.sys.max_pt('dbf.t', 'dt')")
      .head.getString(0) == "2024-02-01")
  }

  test("bucket() hashes per input type: INT, STRING, DATE and multi-key match the writer") {
    // the writer buckets with pmod(xxhash64(key cols in declared type), n)
    // — sys.bucket must agree WITHOUT casting the key (an INT key cast
    // to BIGINT changes the hash input and silently mis-buckets)
    val rows = spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(7 AS INT), 'alpha', DATE'2024-03-01', 42L),
        |  (CAST(-3 AS INT), 'beta', DATE'1999-12-31', 0L),
        |  (CAST(2147483647 AS INT), '', DATE'1970-01-01', -9L)
        |  AS t(i, s, d, l)""".stripMargin)
    rows.createOrReplaceTempView("bkt_src")
    def check(expr: String, keys: String): Unit = {
      val got = spark.sql(
        s"SELECT graft.sys.bucket(16, $keys), CAST(pmod(xxhash64($keys), 16) AS INT) FROM bkt_src")
        .collect()
      got.foreach(r => assert(r.getInt(0) == r.getInt(1),
        s"bucket($keys) [$expr]: ${r.getInt(0)} != writer ${r.getInt(1)}"))
    }
    check("int key", "i")
    check("string key", "s")
    check("date key", "d")
    check("long key", "l")
    check("composite (string, long)", "s, l")
    check("composite (int, string, date)", "i, s, d")
  }

  test("CALL sys.* maintenance procedures run through SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbp")
    spark.sql(
      """CREATE TABLE graft.dbp.t (k BIGINT, seq BIGINT)
        |TBLPROPERTIES ('primary-key'='k', 'sequence.field'='seq', 'bucket'='2')""".stripMargin)
    spark.sql("INSERT INTO graft.dbp.t VALUES (1, 1), (2, 1)")
    spark.sql("INSERT INTO graft.dbp.t VALUES (1, 2), (3, 1)")
    val res = spark.sql("CALL graft.sys.compact('dbp.t')").head.getString(0)
    assert(res.contains("snapshot"), res)
    assert(spark.sql("SELECT count(*) FROM graft.dbp.t").head.getLong(0) == 3L)
    spark.sql("CALL graft.sys.create_tag('dbp.t', 'v1')")
    assert(spark.sql("SELECT * FROM graft.dbp.`t$tags`").count() == 1)
    val exp = spark.sql("CALL graft.sys.expire_snapshots('dbp.t', 1)").head.getString(0)
    assert(exp.startsWith("expired"), exp)
    assert(spark.sql("SELECT count(*) FROM graft.dbp.t").head.getLong(0) == 3L)
    spark.sql("CALL graft.sys.analyze('dbp.t')")
    assert(spark.sql("SELECT * FROM graft.dbp.`t$statistics`").count() > 0)
  }

  test("TRUNCATE TABLE and file-repair/partition-done procedures") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbt")
    spark.sql("CREATE TABLE graft.dbt.t (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.dbt.t VALUES (1, 'a'), (2, 'b')")
    // TRUNCATE = metadata-only delete-all through SupportsDelete
    spark.sql("TRUNCATE TABLE graft.dbt.t")
    assert(spark.sql("SELECT count(*) FROM graft.dbt.t").head.getLong(0) == 0L)
    spark.sql("INSERT INTO graft.dbt.t VALUES (3, 'a')")
    assert(spark.sql("SELECT count(*) FROM graft.dbt.t").head.getLong(0) == 1L)
    // repair: an externally-deleted data file is dropped from metadata
    spark.sql("INSERT INTO graft.dbt.t VALUES (4, 'b')")
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val gt = graft.table.GraftTable.load(spark, s"$wh/dbt/t")
    val victim = gt.sm.latestSnapshot().map(gt.sm.liveEntries).get
      .find(_.partition.get("p").contains("b")).get
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"${gt.path}/${victim.file.fileName}"))
    val rep = spark.sql("CALL graft.sys.remove_unexisting_files('dbt.t')")
      .head.getString(0)
    assert(rep == "dropped 1 unexisting files", rep)
    assert(spark.sql("SELECT count(*) FROM graft.dbt.t").head.getLong(0) == 1L)
    // partition-done marker
    spark.sql("CALL graft.sys.mark_partition_done('dbt.t', 'p=a')")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"${gt.path}/data/p=a/_SUCCESS")))
    // namespace-wide compaction sweep
    val cd = spark.sql("CALL graft.sys.compact_database('dbt')").head.getString(0)
    assert(cd == "compacted 1 tables", cd)
  }

  test("blob descriptor functions resolve through the catalog") {
    val f = java.nio.file.Files.createTempFile("graft-blob", ".bin")
    java.nio.file.Files.write(f, Array.fill[Byte](1234)(7))
    val d = spark.sql(
      s"SELECT graft.sys.path_to_descriptor('${f.toString}') AS d")
    val row = d.head.getStruct(0)
    assert(row.isNullAt(0) && row.getString(1) == f.toString &&
      row.getLong(2) == 1234L)
    assert(d.select(org.apache.spark.sql.functions.expr(
      "graft.sys.descriptor_to_string(d)")).head.getString(0) ==
      s"blob:${f.toString} len=1234")
    // inline descriptors render with their byte count
    assert(spark.sql(
      """SELECT graft.sys.descriptor_to_string(
        |  named_struct('inline', CAST('ab' AS BINARY), 'file', CAST(NULL AS STRING),
        |    'length', CAST(NULL AS BIGINT), 'hash', CAST(NULL AS STRING)))""".stripMargin)
      .head.getString(0) == "inline[2 B]")
  }

  test("secondary-index coverage regained through SQL: ALTER option + CALL rewrite_file_index") {
    import org.apache.spark.sql.functions.col
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbsi")
    spark.sql(
      """CREATE TABLE graft.dbsi.t (k BIGINT, a STRING, b STRING)
        |TBLPROPERTIES ('secondary-index.columns'='a')""".stripMargin)
    // b-ranges of both files overlap 'hot', so min/max stats cannot
    // prune either — any pruning below is the secondary index's
    spark.sql("""INSERT INTO graft.dbsi.t SELECT /*+ COALESCE(1) */ *
                |FROM VALUES (1, 'ax', 'hot'), (2, 'zx', 'zzz')""".stripMargin)
    spark.sql(
      "ALTER TABLE graft.dbsi.t SET TBLPROPERTIES ('secondary-index.columns'='a,b')")
    spark.sql("""INSERT INTO graft.dbsi.t SELECT /*+ COALESCE(1) */ *
                |FROM VALUES (3, 'ay', 'aaa'), (4, 'zy', 'zzy')""".stripMargin)
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    def t = graft.table.GraftTable.load(spark, s"$wh/dbsi/t")
    // intersection guard: the first file predates b's indexing — a b
    // probe must NOT prune (it would wrongly drop the file with the hit)
    assert(t.planEntries(col("b") === "hot").size == 2)
    assert(spark.sql("SELECT count(*) FROM graft.dbsi.t WHERE b = 'hot'")
      .head.getLong(0) == 1L)
    // full rebuild through the SQL procedure force-folds the index and
    // restores b to the covered set
    val res = spark.sql("CALL graft.sys.rewrite_file_index('dbsi.t')").head.getString(0)
    assert(res.contains("snapshot"), res)
    assert(t.planEntries(col("b") === "hot").size == 1)
    assert(t.planEntries(col("b") === "nope").isEmpty)
    assert(spark.sql("SELECT count(*) FROM graft.dbsi.t WHERE b = 'hot'")
      .head.getLong(0) == 1L)
  }

  test("CALL sys.* lifecycle procedures: manifests, consumers, tags, indexes") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbp2")
    spark.sql("CREATE TABLE graft.dbp2.t (k BIGINT, city STRING)")
    (0 until 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.dbp2.t VALUES ($i, 'c$i')"))
    // compact_manifest folds the list without touching data
    val cm = spark.sql("CALL graft.sys.compact_manifest('dbp2.t')").head.getString(0)
    assert(cm.contains("snapshot"), cm)
    assert(spark.sql("SELECT * FROM graft.dbp2.`t$manifests`").count() == 1)
    assert(spark.sql("SELECT count(*) FROM graft.dbp2.t").head.getLong(0) == 3L)
    // consumer lifecycle
    spark.sql("CALL graft.sys.reset_consumer('dbp2.t', 'job1', 2)")
    assert(spark.sql("SELECT * FROM graft.dbp2.`t$consumers`")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet == Set(("job1", 2L)))
    val cc = spark.sql("CALL graft.sys.clear_consumers('dbp2.t')").head.getString(0)
    assert(cc == "cleared 1 consumers", cc)
    assert(spark.sql("SELECT * FROM graft.dbp2.`t$consumers`").count() == 0)
    // timestamp tags + expiry
    spark.sql(
      s"CALL graft.sys.create_tag_from_timestamp('dbp2.t', 'tts', ${System.currentTimeMillis()})")
    assert(spark.sql("SELECT * FROM graft.dbp2.`t$tags`").count() == 1)
    val et = spark.sql(
      s"CALL graft.sys.expire_tags('dbp2.t', ${System.currentTimeMillis() + 1000})")
      .head.getString(0)
    assert(et == "expired 1 tags", et)
    // secondary-index lifecycle: create covers existing files
    val ci = spark.sql("CALL graft.sys.create_global_index('dbp2.t', 'city')")
      .head.getString(0)
    assert(ci.contains("indexed city"), ci)
    assert(spark.sql("SELECT * FROM graft.dbp2.`t$indexes`")
      .filter("index_type = 'global-secondary'").count() > 0)
    assert(spark.sql("SELECT count(*) FROM graft.dbp2.t WHERE city = 'c1'")
      .head.getLong(0) == 1L)
    spark.sql("CALL graft.sys.drop_global_index('dbp2.t', 'city')")
    assert(spark.sql("SELECT value FROM graft.dbp2.`t$options` WHERE key = 'secondary-index.columns'")
      .count() == 0)
  }

  test("catalog-stored SQL functions: create, resolve, coerce, drop") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbfn")
    spark.sql(
      "CALL graft.sys.create_function('dbfn.double_plus', 'x INT', 'x * 2 + 1')")
    assert(spark.sql("SELECT graft.dbfn.double_plus(21)").head.getInt(0) == 43)
    // multi-parameter + built-in functions + implicit coercion in the body
    spark.sql("CALL graft.sys.create_function('dbfn.shout', " +
      "'s STRING, n INT', 'concat(upper(s), repeat(\"!\", n))')")
    assert(spark.sql("SELECT graft.dbfn.shout('hey', 3)")
      .head.getString(0) == "HEY!!!")
    // body mixing types goes through real analyzer coercion (BIGINT
    // division promotes to DOUBLE)
    spark.sql("CALL graft.sys.create_function('dbfn.frac', " +
      "'a BIGINT, b BIGINT', 'a / b')")
    assert(math.abs(spark.sql("SELECT graft.dbfn.frac(1, 4)")
      .head.getDouble(0) - 0.25) < 1e-9)
    // usable inside real queries over stored tables
    spark.sql("CREATE TABLE IF NOT EXISTS graft.dbfn.t (k INT)")
    spark.sql("INSERT INTO graft.dbfn.t VALUES (1), (2)")
    val got = spark.sql(
      "SELECT graft.dbfn.double_plus(k) FROM graft.dbfn.t ORDER BY k")
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(3, 5))
    // invalid bodies are rejected at CREATE time
    intercept[Exception](spark.sql(
      "CALL graft.sys.create_function('dbfn.bad', 'x INT', 'nope(x)')"))
    // alter replaces the definition in place (validated first)
    spark.sql(
      "CALL graft.sys.alter_function('dbfn.shout', 's STRING, n INT', 'lower(s)')")
    assert(spark.sql("SELECT graft.dbfn.shout('HEY', 3)").head.getString(0) == "hey")
    intercept[Exception](spark.sql(
      "CALL graft.sys.alter_function('dbfn.missing', 'x INT', 'x')"))
    // drop removes resolution
    spark.sql("CALL graft.sys.drop_function('dbfn.double_plus')")
    intercept[Exception](
      spark.sql("SELECT graft.dbfn.double_plus(1)").collect())
  }

  test("tag management + rollback_to_timestamp procedures") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbtg")
    spark.sql("CREATE TABLE graft.dbtg.t (k BIGINT)")
    spark.sql("INSERT INTO graft.dbtg.t VALUES (1)")
    val tsAfterFirst = System.currentTimeMillis()
    spark.sql("CALL graft.sys.create_tag('dbtg.t', 'v1')")
    spark.sql("CALL graft.sys.rename_tag('dbtg.t', 'v1', 'release')")
    val tags = spark.sql("SELECT tag_name FROM graft.dbtg.`t$tags`")
      .collect().map(_.getString(0)).toSet
    assert(tags == Set("release"))
    Thread.sleep(20)
    spark.sql("INSERT INTO graft.dbtg.t VALUES (2)")
    // replace_tag re-points at the latest snapshot
    spark.sql("CALL graft.sys.replace_tag('dbtg.t', 'release')")
    val taggedId = spark.sql("SELECT snapshot_id FROM graft.dbtg.`t$tags`")
      .head.getLong(0)
    assert(taggedId == 1L)
    // rollback_to_timestamp discards the second insert
    spark.sql(s"CALL graft.sys.rollback_to_timestamp('dbtg.t', $tsAfterFirst)")
    assert(spark.sql("SELECT count(*) FROM graft.dbtg.t").head.getLong(0) == 1L)
  }

  test("storage-partitioned join: bucket-aligned compacted PK tables join without Exchange") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbspj")
    Seq("t1", "t2").foreach { t =>
      spark.sql(
        s"""CREATE TABLE graft.dbspj.$t (k BIGINT, v DOUBLE)
           |TBLPROPERTIES ('primary-key'='k', 'bucket'='4')""".stripMargin)
    }
    spark.sql("INSERT INTO graft.dbspj.t1 SELECT id, id * 1.0 FROM range(0, 100)")
    spark.sql("INSERT INTO graft.dbspj.t2 SELECT id, id * 2.0 FROM range(0, 100, 2)")
    spark.sql("CALL graft.sys.compact('dbspj.t1')")
    spark.sql("CALL graft.sys.compact('dbspj.t2')")
    val oldBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val oldBroadcast = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = spark.sql(
        """SELECT a.k, a.v, b.v FROM graft.dbspj.t1 a
          |JOIN graft.dbspj.t2 b ON a.k = b.k""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("GraftBucketedScan"),
        s"compacted PK tables must use the bucketed native scan:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucket-aligned join must not shuffle either side:\n$plan")
      val got = q.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(got.length == 50)
      assert(got.head == ((0L, 0.0, 0.0)) && got.last == ((98L, 98.0, 196.0)))
      assert(got.forall { case (k, v, v2) => v == k.toDouble && v2 == k * 2.0 })
      // a non-compacted upsert drops back to the merge-on-read path
      spark.sql("INSERT INTO graft.dbspj.t2 VALUES (1, 99.0)")
      val q2 = spark.sql("SELECT count(*) FROM graft.dbspj.t2 WHERE v = 99.0")
      assert(!q2.queryExecution.executedPlan.toString.contains("GraftBucketedScan"))
      assert(q2.head.getLong(0) == 1L)
    } finally {
      oldBucketing.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      oldBroadcast.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }

  test("readStream streams per-snapshot deltas exactly once across restarts") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db8")
    spark.sql("CREATE TABLE graft.db8.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db8.t VALUES (1, 'a')")
    val ckpt = Files.createTempDirectory("graft-ck").toString
    val received = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def drain(): Unit = {
      val q = spark.readStream.table("graft.db8.t").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          received.synchronized {
            received ++= df.collect().map(r => (r.getLong(0), r.getString(1)))
          }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
    }
    drain()
    assert(received.toSet == Set((1L, "a")))
    spark.sql("INSERT INTO graft.db8.t VALUES (2, 'b')")
    drain() // restart from checkpoint: only the new snapshot arrives
    assert(received.toSet == Set((1L, "a"), (2L, "b")))
    assert(received.size == 2, "checkpoint restart must not replay old snapshots")
  }

  test("readStream scan.mode positions the stream start") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db8m")
    spark.sql("CREATE TABLE graft.db8m.t (k BIGINT)")
    spark.sql("INSERT INTO graft.db8m.t VALUES (1)")
    spark.sql("INSERT INTO graft.db8m.t VALUES (2)")
    def drain(opts: Map[String, String]): Seq[Long] = {
      val ckpt = Files.createTempDirectory("graft-mode").toString
      val received = scala.collection.mutable.ArrayBuffer.empty[Long]
      var r = spark.readStream
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.table("graft.db8m.t").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          received.synchronized { received ++= df.collect().map(_.getLong(0)) }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
      received.sorted.toSeq
    }
    // default (latest-full): the whole history drains
    assert(drain(Map.empty) == Seq(1L, 2L))
    // latest: nothing yet committed after the start → empty drain
    assert(drain(Map("scan.mode" -> "latest")).isEmpty)
    // from-snapshot: starts at the given snapshot id
    assert(drain(Map("scan.mode" -> "from-snapshot", "scan.snapshot-id" -> "1"))
      == Seq(2L))
    // from-timestamp: everything at/after the 2nd commit's time
    val t = graft.table.GraftTable.load(spark, s"$warehouse/db8m/t")
    val ts2 = t.sm.snapshot(1L).timeMillis
    assert(drain(Map("scan.mode" -> "from-timestamp",
      "scan.timestamp-millis" -> ts2.toString)) == Seq(2L))
    val e = intercept[Exception](drain(Map("scan.mode" -> "bogus")))
    assert(e.toString.contains("bogus") ||
      Option(e.getCause).exists(_.toString.contains("bogus")), e.toString)
  }

  test("readStream scan.mode holds on a fully-compacted bucketed PK table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db8b")
    spark.sql("""CREATE TABLE graft.db8b.t (k BIGINT, v STRING)
                |TBLPROPERTIES ('primary-key'='k', 'bucket'='2')""".stripMargin)
    spark.sql("INSERT INTO graft.db8b.t VALUES (1,'a'),(2,'b')")
    val t = graft.table.GraftTable.load(spark, s"$warehouse/db8b/t")
    t.compact()
    def drain(opts: Map[String, String]): Seq[Long] = {
      val ckpt = Files.createTempDirectory("graft-bmode").toString
      val received = scala.collection.mutable.ArrayBuffer.empty[Long]
      var r = spark.readStream
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.table("graft.db8b.t").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          received.synchronized { received ++= df.collect().map(_.getLong(0)) }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
      received.sorted.toSeq
    }
    // a fully-compacted fixed-bucket PK table takes the BUCKETED scan
    // route (SupportsReportPartitioning) — which must thread per-query
    // read options to its inherited micro-batch stream: latest skips
    // the backlog instead of silently re-reading the whole table
    assert(drain(Map("scan.mode" -> "latest")).isEmpty,
      "latest must skip the backlog on the bucketed scan route")
    assert(drain(Map.empty) == Seq(1L, 2L)) // default latest-full still works
  }

  test("scan.mode=compacted-full: batch pins to the latest compact snapshot, " +
    "streams serve its full state once then deltas (restart-safe)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db8c")
    spark.sql("""CREATE TABLE graft.db8c.t (k BIGINT, v STRING)
                |TBLPROPERTIES ('primary-key'='k', 'bucket'='2')""".stripMargin)
    spark.sql("INSERT INTO graft.db8c.t VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT INTO graft.db8c.t VALUES (1,'a2')")
    val t = graft.table.GraftTable.load(spark, s"$warehouse/db8c/t")
    t.compact() // compact snapshot: merged state (1,'a2'),(2,'b')
    spark.sql("INSERT INTO graft.db8c.t VALUES (3,'c')") // post-compact churn
    // batch: compaction-settled state only — no level-0 churn
    val batch = spark.read.option("scan.mode", "compacted-full")
      .table("graft.db8c.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(batch == Set((1L, "a2"), (2L, "b")), s"got $batch")
    // plain read still sees everything
    assert(spark.read.table("graft.db8c.t").count() == 3L)
    // stream: first batch = full state AT the compact snapshot (already
    // merged on disk), then the post-compact delta — never the
    // pre-compact level-0 history
    val ckpt = Files.createTempDirectory("graft-cfull").toString
    val received = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def run(): Unit = {
      val q = spark.readStream.option("scan.mode", "compacted-full")
        .table("graft.db8c.t").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          received.synchronized {
            received ++= df.collect().map(r => (r.getLong(0), r.getString(1)))
          }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
    }
    run()
    assert(received.sorted.toSeq == Seq((1L, "a2"), (2L, "b"), (3L, "c")),
      s"got ${received.sorted}")
    // restart from the checkpoint after another commit: only the new
    // delta arrives — the full-start marker never replays
    spark.sql("INSERT INTO graft.db8c.t VALUES (4,'d')")
    received.clear()
    run()
    assert(received.toSeq == Seq((4L, "d")), s"got $received")
  }

  test("scan.mode=from-snapshot-full streams the full state AT the named " +
    "snapshot, then deltas (restart-safe; missing id degrades to latest-full)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db8f")
    spark.sql("""CREATE TABLE graft.db8f.t (k BIGINT, v STRING)
                |TBLPROPERTIES ('primary-key'='k', 'bucket'='1')""".stripMargin)
    spark.sql("INSERT INTO graft.db8f.t VALUES (1,'a'),(2,'b')")  // s0
    spark.sql("INSERT INTO graft.db8f.t VALUES (1,'a2')")         // s1
    spark.sql("INSERT INTO graft.db8f.t VALUES (3,'c')")          // s2
    val ckpt = Files.createTempDirectory("graft-fsf").toString
    val received = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def run(): Unit = {
      val q = spark.readStream.option("scan.mode", "from-snapshot-full")
        .option("scan.snapshot-id", "1")
        .table("graft.db8f.t").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          received.synchronized {
            received ++= df.collect().map(r => (r.getLong(0), r.getString(1)))
          }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
    }
    run()
    // first batch = the upsert records of the files ALIVE at s1 (the
    // engine's PK-stream contract, same as latest-full: raw upsert
    // records, consumers merge by their sequence) + the s2 delta.
    // Unlike the -1 replay this stays complete after history expiry:
    // it reads the live file set, not per-snapshot deltas.
    assert(received.sorted.toSeq ==
      Seq((1L, "a"), (1L, "a2"), (2L, "b"), (3L, "c")),
      s"got ${received.sorted}")
    // restart from the checkpoint: the full-start marker never replays
    spark.sql("INSERT INTO graft.db8f.t VALUES (4,'d')")
    received.clear()
    run()
    assert(received.toSeq == Seq((4L, "d")), s"got $received")
    // after compaction, a fresh from-snapshot-full at the compact
    // snapshot serves the MERGED state (live set is settled) + deltas
    val t = graft.table.GraftTable.load(spark, s"$warehouse/db8f/t")
    t.compact() // s4: merged (1,a2),(2,b),(3,c),(4,d)
    spark.sql("INSERT INTO graft.db8f.t VALUES (5,'e')") // s5
    received.clear()
    val ck3 = Files.createTempDirectory("graft-fsf3").toString
    val q3 = spark.readStream.option("scan.mode", "from-snapshot-full")
      .option("scan.snapshot-id", "4")
      .table("graft.db8f.t").writeStream
      .option("checkpointLocation", ck3)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        received.synchronized {
          received ++= df.collect().map(r => (r.getLong(0), r.getString(1)))
        }: Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q3.awaitTermination(120000))
    assert(received.sorted.toSeq == Seq((1L, "a2"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e")), s"got ${received.sorted}")
    // a missing snapshot id degrades to latest-full (fresh checkpoint,
    // raw replayed history: key 1 appears twice)
    val received2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = spark.readStream.option("scan.mode", "from-snapshot-full")
      .option("scan.snapshot-id", "99")
      .table("graft.db8f.t").writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-fsf2").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        received2.synchronized { received2 ++= df.collect().map(_.getLong(0)) }: Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(120000))
    assert(received2.sorted.toSeq == Seq(1L, 1L, 2L, 3L, 4L, 5L),
      received2.toString)
  }

  test("bounded readStream drains to scan.bounded.watermark and terminates") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db10")
    spark.sql("DROP TABLE IF EXISTS graft.db10.t")
    spark.sql("""CREATE TABLE graft.db10.t (k BIGINT, v STRING)
                |TBLPROPERTIES ('scan.bounded.watermark'='10')""".stripMargin)
    // three watermarked commits: 5, 10, 20 (past the bound)
    val t = graft.table.GraftTable.load(spark, s"$warehouse/db10/t")
    import spark.implicits._
    t.writeWatermarked(Seq((1L, "a")).toDF("k", "v"), 0L, Some(5L))
    t.writeWatermarked(Seq((2L, "b")).toDF("k", "v"), 1L, Some(10L))
    t.writeWatermarked(Seq((3L, "c")).toDF("k", "v"), 2L, Some(20L))
    val ckpt = Files.createTempDirectory("graft-bck").toString
    val received = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.table("graft.db10.t").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        received.synchronized { received ++= df.collect().map(_.getLong(0)) }: Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "bounded stream must terminate")
    // only snapshots whose watermark is within the bound were consumed
    assert(received.sorted.toSeq == Seq(1L, 2L),
      s"rows past the bound must not stream: $received")
  }

  test("admission control paces micro-batches by scan.max-rows-per-trigger") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db11")
    spark.sql("DROP TABLE IF EXISTS graft.db11.t")
    spark.sql("""CREATE TABLE graft.db11.t (k BIGINT, v STRING)
                |TBLPROPERTIES ('scan.max-rows-per-trigger'='2')""".stripMargin)
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO graft.db11.t VALUES ($i, 'x')"))
    // one commit larger than the cap: admitted whole (snapshots are
    // atomic), but alone in its batch
    spark.sql("INSERT INTO graft.db11.t VALUES (5, 'a'), (6, 'b'), (7, 'c')")
    val ckpt = Files.createTempDirectory("graft-adm").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = spark.readStream.table("graft.db11.t").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.collect().map(_.getLong(0)).toSeq }: Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "paced drain must terminate")
    val nonEmpty = batches.filter(_.nonEmpty)
    assert(nonEmpty.flatten.sorted == (1L to 7L),
      s"paced drain lost or duplicated rows: $batches")
    // snapshots carry 1,1,1,1,3 rows; cap 2 → batches (1,2) (3,4) (5,6,7)
    assert(nonEmpty.map(_.size).sorted == Seq(2, 2, 3),
      s"unexpected batch shapes: ${batches.map(_.size)}")
  }

  test("storage-partitioned aggregation: GROUP BY bucket key shuffles nothing") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbspa")
    spark.sql("""CREATE TABLE graft.dbspa.t (k BIGINT, v DOUBLE)
                |TBLPROPERTIES ('primary-key'='k', 'bucket'='4')""".stripMargin)
    spark.sql("INSERT INTO graft.dbspa.t SELECT id, id * 1.0 FROM range(0, 100)")
    spark.sql("CALL graft.sys.compact('dbspa.t')")
    val old = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      // grouping on the bucket key: the reported KeyGroupedPartitioning
      // already satisfies the aggregate's distribution — at warehouse
      // scale this is the difference between a full shuffle of the
      // table and none at all
      val q = spark.sql("SELECT k, sum(v) AS s FROM graft.dbspa.t GROUP BY k")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("GraftBucketedScan") && !plan.contains("Exchange"),
        s"bucket-key aggregation must not shuffle:\n$plan")
      assert(q.collect().map(r => (r.getLong(0), r.getDouble(1)))
        .forall { case (k, s) => s == k.toDouble })
      // contrast: grouping on a non-key column still shuffles
      val q2 = spark.sql("SELECT v, count(*) FROM graft.dbspa.t GROUP BY v")
      assert(q2.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally old.fold(
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
  }

  test("format tables: snapshot-less csv directory reads, appends, overwrites") {
    val dir = Files.createTempDirectory("graft-fmt").toString + "/ext"
    spark.range(3).selectExpr("id AS k", "concat('r', id) AS s")
      .write.option("header", "true").csv(dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fmtdb")
    spark.sql(s"""CREATE TABLE graft.fmtdb.raw (k BIGINT, s STRING)
                 |TBLPROPERTIES ('format'='csv',
                 |  'format-table.path'='$dir',
                 |  'format-table.option.header'='true')""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.fmtdb.raw").head.getLong(0) == 3L)
    // INSERT INTO appends files to the directory
    spark.sql("INSERT INTO graft.fmtdb.raw VALUES (10, 'x'), (11, 'y')")
    assert(spark.sql("SELECT count(*) FROM graft.fmtdb.raw").head.getLong(0) == 5L)
    assert(spark.sql("SELECT s FROM graft.fmtdb.raw WHERE k = 10")
      .head.getString(0) == "x")
    // INSERT OVERWRITE replaces the directory contents
    spark.sql("INSERT OVERWRITE graft.fmtdb.raw VALUES (99, 'z')")
    val rows = spark.sql("SELECT k, s FROM graft.fmtdb.raw").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 99L)
    // the external directory itself holds the data (no snapshots)
    assert(spark.read.option("header", "true").csv(dir).count() == 1L)
  }

  test("format tables push filters and projection into the file scan") {
    val dir = Files.createTempDirectory("graft-fmtp").toString + "/ext"
    spark.range(100).selectExpr("id AS k", "concat('r', id) AS s", "id * 2 AS v")
      .write.parquet(dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.fmtdb")
    spark.sql(s"""CREATE TABLE graft.fmtdb.rawp (k BIGINT, s STRING, v BIGINT)
                 |TBLPROPERTIES ('format'='parquet',
                 |  'format-table.path'='$dir')""".stripMargin)
    val df = spark.sql("SELECT s FROM graft.fmtdb.rawp WHERE k > 90")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      (91 to 99).map(i => s"r$i").sorted)
    val plan = df.queryExecution.executedPlan.toString
    // the DSv2 wrapper reports what it pushed ...
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(k,90)"),
      s"filter not pushed:\n$plan")
    // ... and the v1 scan only materializes the required columns
    assert(!plan.contains("v#") || plan.indexOf("v#") > plan.indexOf("RowDataSourceScan"),
      s"projection not pruned:\n$plan")
    // count(*): zero-column projection still answers
    assert(spark.sql("SELECT count(*) FROM graft.fmtdb.rawp WHERE v >= 100")
      .head.getLong(0) == 50L)
  }

  test("per-query reader options override table options for pacing") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db13")
    spark.sql("DROP TABLE IF EXISTS graft.db13.t")
    spark.sql("CREATE TABLE graft.db13.t (k BIGINT)") // no pacing property
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO graft.db13.t VALUES ($i)"))
    val ckpt = Files.createTempDirectory("graft-admq").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = spark.readStream
      .option("scan.max-rows-per-trigger", "2")
      .table("graft.db13.t").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count().toInt }: Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    assert(batches.filter(_ > 0).sorted == Seq(2, 2),
      s"reader-option pacing not applied: $batches")
  }

  test("admission control paces by scan.max-bytes-per-trigger") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db12")
    spark.sql("DROP TABLE IF EXISTS graft.db12.t")
    // 1 byte per trigger: every data snapshot exceeds the cap alone,
    // so each lands in its own batch
    spark.sql("""CREATE TABLE graft.db12.t (k BIGINT)
                |TBLPROPERTIES ('scan.max-bytes-per-trigger'='1')""".stripMargin)
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO graft.db12.t VALUES ($i)"))
    val ckpt = Files.createTempDirectory("graft-admb").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = spark.readStream.table("graft.db12.t").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.collect().map(_.getLong(0)).toSeq }: Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    val nonEmpty = batches.filter(_.nonEmpty)
    assert(nonEmpty.map(_.sorted) == Seq(Seq(1L), Seq(2L), Seq(3L)),
      s"bytes pacing wrong: $batches")
  }

  test("CALL sys.incremental_query / incremental_between_timestamp views") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db9")
    spark.sql("DROP TABLE IF EXISTS graft.db9.t")
    spark.sql(
      """CREATE TABLE graft.db9.t (id BIGINT, name STRING, seq BIGINT)
        |TBLPROPERTIES ('primary-key'='id', 'sequence.field'='seq', 'bucket'='2')""".stripMargin)
    spark.sql("INSERT INTO graft.db9.t VALUES (1, 'a', 1), (2, 'b', 1)")
    val tsBetween = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql("INSERT INTO graft.db9.t VALUES (1, 'a2', 2), (3, 'c', 1)")
    val res = spark.sql(
      "CALL graft.sys.incremental_query('db9.t', 0, 1, 'chg9')").head.getString(0)
    assert(res == "view chg9")
    val got = spark.sql("SELECT id, name, _row_kind FROM chg9 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, "a2", "+I"), (3L, "c", "+I")))
    // timestamp variant: (tsBetween, now] covers only the second commit
    spark.sql(s"CALL graft.sys.incremental_between_timestamp(" +
      s"'db9.t', $tsBetween, ${System.currentTimeMillis()}, 'chg9b')")
    val got2 = spark.sql("SELECT id FROM chg9b ORDER BY id")
      .collect().map(_.getLong(0))
    assert(got2.toSeq == Seq(1L, 3L))
  }

  test("CALL sys.incremental_to_auto_tag resolves the preceding auto tag; " +
    "no earlier tag or missing tag -> empty; non-auto names rejected") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db9t")
    spark.sql("DROP TABLE IF EXISTS graft.db9t.t")
    spark.sql(
      """CREATE TABLE graft.db9t.t (id BIGINT, name STRING, seq BIGINT)
        |TBLPROPERTIES ('primary-key'='id', 'sequence.field'='seq', 'bucket'='2')""".stripMargin)
    spark.sql("INSERT INTO graft.db9t.t VALUES (1, 'a', 1), (2, 'b', 1)")
    spark.sql("CALL graft.sys.create_tag('db9t.t', '2024-01-01')")
    spark.sql("INSERT INTO graft.db9t.t VALUES (1, 'a2', 2), (3, 'c', 1)")
    spark.sql("INSERT INTO graft.db9t.t VALUES (4, 'd', 1)")
    spark.sql("CALL graft.sys.create_tag('db9t.t', '2024-01-02')")
    // a NON-auto tag between the two must not become the start point
    spark.sql("INSERT INTO graft.db9t.t VALUES (5, 'e', 1)")
    spark.sql("CALL graft.sys.create_tag('db9t.t', 'manual-v1')")
    spark.sql("CALL graft.sys.incremental_to_auto_tag('db9t.t', '2024-01-02', 'itat')")
    val got = spark.sql("SELECT id, name, _row_kind FROM itat ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // must equal the MANUAL tag-to-tag incremental read (snapshots 0->2)
    spark.sql("CALL graft.sys.incremental_query('db9t.t', 0, 2, 'itat_manual')")
    val manual = spark.sql("SELECT id, name, _row_kind FROM itat_manual ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == manual && got.map(_._1) == Seq(1L, 3L, 4L), s"got $got vs $manual")
    // earliest auto tag has no predecessor -> empty, not an error
    spark.sql("CALL graft.sys.incremental_to_auto_tag('db9t.t', '2024-01-01', 'itat0')")
    assert(spark.sql("SELECT * FROM itat0").count() == 0)
    // a tag name that never existed (but auto-shaped) -> empty
    spark.sql("CALL graft.sys.incremental_to_auto_tag('db9t.t', '2030-12-31', 'itatx')")
    assert(spark.sql("SELECT * FROM itatx").count() == 0)
    // non-auto name -> loud error (reference checkArgument)
    val err = intercept[Exception] {
      spark.sql("CALL graft.sys.incremental_to_auto_tag('db9t.t', 'manual-v1', 'bad')")
    }
    assert(err.getMessage.contains("auto") ||
      Option(err.getCause).exists(_.getMessage.contains("auto")), err.toString)
  }

  test("CALL sys.purge_files / copy_files / migrate_database / trigger_tag_automatic_creation") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db20")
    spark.sql("DROP TABLE IF EXISTS graft.db20.src")
    spark.sql("CREATE TABLE graft.db20.src (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db20.src VALUES (1,'a'),(2,'b')")

    // clone, then purge the source: the clone is unaffected
    spark.sql("CALL graft.sys.copy_files('db20.src', 'db20.dst')")
    assert(spark.sql("SELECT count(*) FROM graft.db20.dst").head.getLong(0) == 2L)
    val purged = spark.sql("CALL graft.sys.purge_files('db20.src')").head.getString(0)
    assert(purged.startsWith("purged"))
    assert(spark.sql("SELECT count(*) FROM graft.db20.src").head.getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) FROM graft.db20.dst").head.getLong(0) == 2L)

    // migrate_database: two plain parquet dirs become two tables
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-migdb").toString
    Seq((1L, "x")).toDF("k", "v").write.parquet(s"$root/ta")
    Seq((2L, "y"), (3L, "z")).toDF("k", "v").write.parquet(s"$root/tb")
    val res = spark.sql(
      s"CALL graft.sys.migrate_database('db20', '$root')").head.getString(0)
    assert(res.contains("2 tables"), res)
    assert(spark.sql("SELECT count(*) FROM graft.db20.tb").head.getLong(0) == 2L)

    // auto tags through SQL options + trigger procedure
    spark.sql("DROP TABLE IF EXISTS graft.db20.tagged")
    spark.sql(
      """CREATE TABLE graft.db20.tagged (k BIGINT)
        |TBLPROPERTIES ('tag.automatic-creation'='process-time',
        |               'tag.creation-period'='daily')""".stripMargin)
    spark.sql("INSERT INTO graft.db20.tagged VALUES (1)")
    val tags = spark.sql("SELECT * FROM graft.db20.`tagged$tags`").collect()
    assert(tags.length == 1, s"expected one auto tag, got ${tags.length}")
    // re-trigger converges (no duplicate tags)
    spark.sql("CALL graft.sys.trigger_tag_automatic_creation('db20.tagged')")
    assert(spark.sql("SELECT * FROM graft.db20.`tagged$tags`").count() == 1L)
  }

  test("object tables index a directory of arbitrary objects; refresh materializes") {
    val objDir = java.nio.file.Files.createTempDirectory("graft-obj")
    java.nio.file.Files.write(objDir.resolve("a.bin"), Array.fill[Byte](10)(1))
    java.nio.file.Files.createDirectories(objDir.resolve("sub"))
    java.nio.file.Files.write(objDir.resolve("sub/b.bin"), Array.fill[Byte](20)(2))

    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db24")
    spark.sql(
      s"""CREATE TABLE graft.db24.objs (path STRING)
         |TBLPROPERTIES ('type'='object-table', 'object-location'='$objDir')""".stripMargin)

    val live = spark.sql(
      "SELECT path, name, length FROM graft.db24.objs ORDER BY path").collect()
    assert(live.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      == Seq(("a.bin", "a.bin", 10L), ("sub/b.bin", "b.bin", 20L)))

    // live listing reflects new objects immediately
    java.nio.file.Files.write(objDir.resolve("c.bin"), Array.fill[Byte](5)(3))
    assert(spark.sql("SELECT count(*) FROM graft.db24.objs").head.getLong(0) == 3L)

    // refresh materializes; later additions are invisible until re-refresh
    assert(spark.sql("CALL graft.sys.refresh_object_table('db24.objs')")
      .head.getString(0) == "indexed 3 objects")
    java.nio.file.Files.write(objDir.resolve("d.bin"), Array.fill[Byte](7)(4))
    assert(spark.sql("SELECT count(*) FROM graft.db24.objs").head.getLong(0) == 3L)
    spark.sql("CALL graft.sys.refresh_object_table('db24.objs')")
    assert(spark.sql("SELECT count(*) FROM graft.db24.objs").head.getLong(0) == 4L)
  }

  test("catalog-level sys tables: all_tables / all_table_options / all_partitions / catalog_options") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db23")
    spark.sql(
      """CREATE TABLE graft.db23.pt (k BIGINT, p STRING) PARTITIONED BY (p)
        |TBLPROPERTIES ('bucket'='2')""".stripMargin)
    spark.sql("INSERT INTO graft.db23.pt VALUES (1,'a'),(2,'b')")

    val at = spark.sql(
      "SELECT partition_keys, record_count FROM graft.sys.all_tables " +
        "WHERE `database` = 'db23' AND `table` = 'pt'").head
    assert(at.getString(0) == "p" && at.getLong(1) == 2L)

    assert(spark.sql(
      "SELECT value FROM graft.sys.all_table_options " +
        "WHERE `database` = 'db23' AND `table` = 'pt' AND key = 'bucket'")
      .head.getString(0) == "2")

    val parts = spark.sql(
      "SELECT partition FROM graft.sys.all_partitions " +
        "WHERE `database` = 'db23' ORDER BY partition")
      .collect().map(_.getString(0))
    assert(parts.toSeq == Seq("p=a", "p=b"))

    assert(spark.sql("SELECT value FROM graft.sys.catalog_options WHERE key='warehouse'")
      .head.getString(0) == warehouse)
  }

  test("SHOW PARTITIONS / ALTER TABLE DROP PARTITION / TRUNCATE PARTITION") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db22")
    spark.sql(
      """CREATE TABLE graft.db22.t (k BIGINT, p STRING, d BIGINT)
        |PARTITIONED BY (p, d)""".stripMargin)
    spark.sql(
      """INSERT INTO graft.db22.t VALUES
        |(1,'a',10),(2,'a',20),(3,'b',10),(4,'b',20)""".stripMargin)

    val parts = spark.sql("SHOW PARTITIONS graft.db22.t")
      .collect().map(_.getString(0)).sorted
    assert(parts.toSeq == Seq("d=10/p=a", "d=10/p=b", "d=20/p=a", "d=20/p=b").sorted
      || parts.toSeq == Seq("p=a/d=10", "p=a/d=20", "p=b/d=10", "p=b/d=20"),
      s"got ${parts.toSeq}")

    // partial spec filters the listing
    val pa = spark.sql("SHOW PARTITIONS graft.db22.t PARTITION (p='a')").collect()
    assert(pa.length == 2)

    // drop one partition: metadata-only, rows gone
    spark.sql("ALTER TABLE graft.db22.t DROP PARTITION (p='a', d=10)")
    assert(spark.sql("SELECT k FROM graft.db22.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))

    // truncate a partition subtree by prefix spec
    spark.sql("TRUNCATE TABLE graft.db22.t PARTITION (p='b')")
    assert(spark.sql("SELECT k FROM graft.db22.t").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(spark.sql("SHOW PARTITIONS graft.db22.t").count() == 1L)
  }

  test("branch reads through SQL: t$branch_<name> serves the branch head") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db23")
    spark.sql("DROP TABLE IF EXISTS graft.db23.b")
    spark.sql("CREATE TABLE graft.db23.b (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db23.b VALUES (1,'main1')")
    spark.sql("CALL graft.sys.create_branch('db23.b', 'dev')")
    // main moves on; the branch keeps the fork state
    spark.sql("INSERT INTO graft.db23.b VALUES (2,'main2')")
    assert(spark.sql("SELECT count(*) FROM graft.db23.b").head.getLong(0) == 2L)
    assert(spark.sql("SELECT v FROM graft.db23.`b$branch_dev`")
      .collect().map(_.getString(0)).toSeq == Seq("main1"))
    // a write to the branch (library path) is visible through SQL
    val gt = graft.table.GraftTable.load(spark, s"$warehouse/db23/b")
    gt.branchTable("dev").write(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(9L, "dev9")),
      spark.table("graft.db23.b").schema))
    assert(spark.sql("SELECT k FROM graft.db23.`b$branch_dev` ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 9L))
    // main unaffected; unknown branch errors
    assert(spark.sql("SELECT count(*) FROM graft.db23.b").head.getLong(0) == 2L)
    intercept[Exception](spark.sql("SELECT * FROM graft.db23.`b$branch_nope`").collect())
    // SQL WRITES land on the branch too (the suffix table IS the
    // branch table, so INSERT routes to the branch head)
    spark.sql("INSERT INTO graft.db23.`b$branch_dev` VALUES (10,'dev10')")
    assert(spark.sql("SELECT k FROM graft.db23.`b$branch_dev` ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 9L, 10L))
    assert(spark.sql("SELECT count(*) FROM graft.db23.b").head.getLong(0) == 2L)
  }

  test("system tables: $ro / $aggregation_fields / $row_tracking / $compact_buckets") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db21")
    spark.sql("DROP TABLE IF EXISTS graft.db21.agg")
    spark.sql(
      """CREATE TABLE graft.db21.agg (k BIGINT, total DOUBLE, latest STRING)
        |TBLPROPERTIES ('primary-key'='k', 'bucket'='1',
        |  'merge-engine'='aggregation', 'fields.total.aggregate-function'='sum')""".stripMargin)
    spark.sql("INSERT INTO graft.db21.agg VALUES (1, 10.0, 'a'), (2, 5.0, 'b')")
    spark.sql("INSERT INTO graft.db21.agg VALUES (1, 7.0, 'a2')")

    // $ro before compaction: only level-0 files exist -> empty
    assert(spark.sql("SELECT * FROM graft.db21.`agg$ro`").count() == 0L)
    spark.sql("CALL graft.sys.compact('db21.agg')")
    val ro = spark.sql("SELECT k, total FROM graft.db21.`agg$ro` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ro.toSeq == Seq((1L, 17.0), (2L, 5.0)))

    val af = spark.sql(
      "SELECT field_name, function FROM graft.db21.`agg$aggregation_fields` ORDER BY field_name")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(af.toSeq == Seq(("k", "primary-key"), ("latest", "last_non_null_value"),
      ("total", "sum")))

    val cb = spark.sql("SELECT file_count, compaction_needed FROM graft.db21.`agg$compact_buckets`")
      .collect()
    assert(cb.length == 1 && !cb.head.getBoolean(1)) // 1 compacted file

    // $row_tracking needs the option
    spark.sql("DROP TABLE IF EXISTS graft.db21.rt")
    spark.sql(
      """CREATE TABLE graft.db21.rt (k BIGINT, v STRING)
        |TBLPROPERTIES ('row-tracking.enabled'='true')""".stripMargin)
    spark.sql("INSERT INTO graft.db21.rt VALUES (10,'x'),(20,'y')")
    val rt = spark.sql("SELECT k, _ROW_ID FROM graft.db21.`rt$row_tracking` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rt.map(_._2).distinct.length == 2 && rt.map(_._1).toSeq == Seq(10L, 20L))

    // $file_monitor: per-snapshot file changes; the compaction snapshot
    // shows the level-0 files as before_files and the merged file added
    val fm = spark.sql(
      """SELECT snapshot_id, size(before_files) AS nb, size(data_files) AS nd
        |FROM graft.db21.`agg$file_monitor` ORDER BY snapshot_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(fm.length == 3, fm.mkString(","))
    assert(fm(0) == ((0L, 0, 1)) && fm(1) == ((1L, 0, 1)), fm.mkString(","))
    assert(fm(2)._2 == 2 && fm(2)._3 == 1, fm.mkString(",")) // compaction
  }
}
