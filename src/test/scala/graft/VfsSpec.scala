package graft

import graft.table.GraftTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** gvfs:// virtual Hadoop FileSystem over catalog-managed tables
  * (reference: paimon-vfs PaimonVirtualFileSystem) — listing and
  * reading through the scheme must match direct storage access, and
  * spark.read over a gvfs:// path must equal the catalog read. */
class VfsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def df(rows: (Long, String)*) = spark.createDataFrame(
    rows.map(r => Row(r._1, r._2)).asJava, sch)

  private def hconf = spark.sparkContext.hadoopConfiguration

  test("warehouse catalog: list catalog/db/table, read files, spark.read matches") {
    val wh = Files.createTempDirectory("graft-vfs-wh").toString
    hconf.set("fs.gvfs.impl", classOf[graft.sources.GraftVirtualFileSystem].getName)
    hconf.set("fs.gvfs.catalog.vcat.warehouse", wh)
    val t = GraftTable.create(spark, s"$wh/db1/orders", sch)
    t.write(df((1L, "a"), (2L, "b")))
    t.write(df((3L, "c")))
    GraftTable.create(spark, s"$wh/db1/other", sch).write(df((9L, "z")))

    val fs = new org.apache.hadoop.fs.Path("gvfs://vcat/").getFileSystem(hconf)
    // catalog root lists databases; db lists tables
    val dbs = fs.listStatus(new org.apache.hadoop.fs.Path("gvfs://vcat/"))
      .map(_.getPath.getName).toSet
    assert(dbs == Set("db1"), dbs.toString)
    val tables = fs.listStatus(new org.apache.hadoop.fs.Path("gvfs://vcat/db1"))
      .map(_.getPath.getName).toSet
    assert(tables == Set("orders", "other"), tables.toString)
    // table level delegates to physical storage, paths stay virtual
    val entries = fs.listStatus(new org.apache.hadoop.fs.Path("gvfs://vcat/db1/orders"))
    assert(entries.forall(_.getPath.toString.startsWith("gvfs://vcat/db1/orders/")),
      entries.map(_.getPath).mkString(","))
    assert(entries.exists(e => e.isDirectory && e.getPath.getName == "data"))
    // a data file read through the scheme equals the physical bytes
    val dataFiles = fs.listStatus(
      new org.apache.hadoop.fs.Path("gvfs://vcat/db1/orders/data"))
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(dataFiles.length >= 2, "two commits -> at least two data files")
    val in = fs.open(dataFiles.head.getPath)
    val viaVfs = in.readAllBytes(); in.close()
    val phys = java.nio.file.Paths.get(
      s"$wh/db1/orders/data/${dataFiles.head.getPath.getName}")
    assert(java.util.Arrays.equals(viaVfs, Files.readAllBytes(phys)))
    // spark.read over the scheme equals the catalog read
    val got = spark.read.parquet("gvfs://vcat/db1/orders/data")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val direct = t.read.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == direct, s"vfs read $got != catalog read $direct")
    // the view is read-path only
    val e = intercept[java.io.IOException](
      fs.create(new org.apache.hadoop.fs.Path("gvfs://vcat/db1/orders/data/x")))
    assert(e.getMessage.contains("catalog/table API"), e.getMessage)
    intercept[java.io.FileNotFoundException](
      fs.getFileStatus(new org.apache.hadoop.fs.Path("gvfs://vcat/db1/nosuch")))
  }

  test("object tables accept raw writes; auto-created on first create") {
    val wh = Files.createTempDirectory("graft-vfs-obj").toString
    hconf.set("fs.gvfs.impl", classOf[graft.sources.GraftVirtualFileSystem].getName)
    hconf.set("fs.gvfs.catalog.ocat.warehouse", wh)
    val fs = new org.apache.hadoop.fs.Path("gvfs://ocat/").getFileSystem(hconf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // create into a MISSING table auto-creates an object table
    val out = fs.create(p("gvfs://ocat/media/raw/img/a.bin"))
    out.write(Array[Byte](1, 2, 3)); out.close()
    assert(Files.exists(java.nio.file.Paths.get(s"$wh/media/raw/object-table.json")),
      "create into a missing table must auto-create an object table")
    val in = fs.open(p("gvfs://ocat/media/raw/img/a.bin"))
    assert(in.readAllBytes().toSeq == Seq[Byte](1, 2, 3)); in.close()
    // rename + delete work within the object table
    assert(fs.rename(p("gvfs://ocat/media/raw/img/a.bin"),
      p("gvfs://ocat/media/raw/img/b.bin")))
    assert(fs.delete(p("gvfs://ocat/media/raw/img/b.bin"), false))
    // the auto-created table reads through the object-table catalog too
    spark.conf.set("spark.sql.catalog.ocat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ocat.warehouse", wh)
    val out2 = fs.create(p("gvfs://ocat/media/raw/img/c.bin"))
    out2.write(Array[Byte](9)); out2.close()
    val names = spark.sql("SELECT name FROM ocat.media.raw")
      .collect().map(_.getString(0)).filterNot(_.startsWith(".")).toSeq
    assert(names == Seq("c.bin"), names.toString)
    // a dropped table's cached root self-invalidates instead of
    // resolving stale for the life of the FS instance
    fs.getFileStatus(p("gvfs://ocat/media/raw")) // warm the cache
    val rawDir = java.nio.file.Paths.get(s"$wh/media/raw")
    graft.core.FsUtil.walkAll(rawDir).reverse.foreach(Files.deleteIfExists(_))
    intercept[java.io.FileNotFoundException](
      fs.getFileStatus(p("gvfs://ocat/media/raw")))
    // snapshot-managed tables still refuse raw mutations
    val t = GraftTable.create(spark, s"$wh/media/managed", sch)
    t.write(df((1L, "x")))
    val e = intercept[java.io.IOException](
      fs.create(p("gvfs://ocat/media/managed/data/evil.parquet")))
    assert(e.getMessage.contains("OBJECT tables"), e.getMessage)
    intercept[java.io.IOException](
      fs.delete(p("gvfs://ocat/media/managed/data"), true))
    // mkdirs on a MISSING table follows Hadoop's create-parents
    // contract: the object-table auto-create, never a FileNotFound
    // leak (distcp-style flows mkdir targets before copying)
    assert(fs.mkdirs(p("gvfs://ocat/media/staged/incoming")))
    assert(Files.exists(java.nio.file.Paths.get(s"$wh/media/staged/object-table.json")),
      "mkdirs into a missing table must auto-create an object table")
    assert(fs.getFileStatus(p("gvfs://ocat/media/staged/incoming")).isDirectory)
    // and mkdirs into a snapshot-managed table refuses with the
    // explanatory read-only IOException, not FNF
    val em = intercept[java.io.IOException](
      fs.mkdirs(p("gvfs://ocat/media/managed/newdir")))
    assert(em.getMessage.contains("OBJECT tables"), em.getMessage)
  }

  test("REST catalog: gvfs resolves table paths through the endpoint") {
    val wh = Files.createTempDirectory("graft-vfs-rest").toString
    val server = graft.sources.GraftRestServer.start(wh, token = "s3cret")
    try {
      val t = GraftTable.create(spark, s"$wh/ns/ev", sch)
      t.write(df((7L, "x"), (8L, "y")))
      hconf.set("fs.gvfs.impl", classOf[graft.sources.GraftVirtualFileSystem].getName)
      hconf.set("fs.gvfs.catalog.rcat.rest.uri", server.uri)
      hconf.set("fs.gvfs.catalog.rcat.rest.token", "s3cret")
      val fs = new org.apache.hadoop.fs.Path("gvfs://rcat/").getFileSystem(hconf)
      val tables = fs.listStatus(new org.apache.hadoop.fs.Path("gvfs://rcat/ns"))
        .map(_.getPath.getName).toSet
      assert(tables.contains("ev"), tables.toString)
      val got = spark.read.parquet("gvfs://rcat/ns/ev/data")
        .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((7L, "x"), (8L, "y")), got.toString)
      // OBJECT tables resolve through REST too: the server's table
      // routes recognize the object-table.json marker, so raw files
      // in a REST-served warehouse stay reachable (and writable)
      val objDir = java.nio.file.Paths.get(wh, "ns", "blobs")
      java.nio.file.Files.createDirectories(objDir.resolve("objects-data"))
      java.nio.file.Files.write(objDir.resolve("object-table.json"),
        graft.core.Json.write(graft.sources.ObjectTableMeta(
          s"$objDir/objects-data")).getBytes("UTF-8"))
      java.nio.file.Files.write(
        objDir.resolve("objects-data").resolve("a.bin"), Array[Byte](4, 5))
      val restTables = fs.listStatus(new org.apache.hadoop.fs.Path("gvfs://rcat/ns"))
        .map(_.getPath.getName).toSet
      assert(restTables.contains("blobs"),
        s"REST listing must include object tables: $restTables")
      val in = fs.open(new org.apache.hadoop.fs.Path("gvfs://rcat/ns/blobs/a.bin"))
      assert(in.readAllBytes().toSeq == Seq[Byte](4, 5)); in.close()
      val out = fs.create(new org.apache.hadoop.fs.Path("gvfs://rcat/ns/blobs/b.bin"))
      out.write(Array[Byte](6)); out.close()
      assert(java.nio.file.Files.exists(
        objDir.resolve("objects-data").resolve("b.bin")))
      // mkdirs contract at the catalog root / database levels: an
      // existing directory returns true instead of aborting top-down
      // copies with a misleading error
      assert(fs.mkdirs(new org.apache.hadoop.fs.Path("gvfs://rcat/")))
      assert(fs.mkdirs(new org.apache.hadoop.fs.Path("gvfs://rcat/ns")))
    } finally server.stop()
  }
}
