package graft.sources

import java.io.{FileNotFoundException, IOException}
import java.net.{HttpURLConnection, URI, URL}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Virtual Hadoop `FileSystem` over catalog-managed tables (reference:
  * paimon-vfs/paimon-vfs-hadoop/.../PaimonVirtualFileSystem.java —
  * `pvfs://catalog/db/table/file`): brownfield tooling that speaks
  * Hadoop paths (distcp, spark.read over raw files, legacy jobs) can
  * address a table's storage as `gvfs://<catalog>/<db>/<table>/...`
  * without knowing where the catalog put it. The authority names a
  * catalog; resolution mode comes from Hadoop conf:
  *
  * {{{
  * fs.gvfs.impl                          = graft.sources.GraftVirtualFileSystem
  * fs.gvfs.catalog.<name>.warehouse      = /path/wh          // direct
  * fs.gvfs.catalog.<name>.rest.uri       = http://host:port  // REST catalog
  * fs.gvfs.catalog.<name>.rest.token     = ...
  * fs.gvfs.catalog.<name>.hms.local-dir  = /path/hms         // HMS bridge
  * fs.gvfs.catalog.<name>.hms.uris       = thrift://...
  * }}}
  *
  * Catalog and database levels list through the catalog (REST
  * `namespaces` endpoints / warehouse directories); table level and
  * below delegate to the table's physical storage with paths mapped
  * back into the virtual scheme, so a recursive listing started at
  * `gvfs://cat/` walks seamlessly into data files. v1 scope is the
  * READ path — mutations throw (the write path belongs to the catalog
  * APIs, which keep snapshots consistent; a raw VFS write would
  * corrupt a table, so refusing is the safe default). Table paths
  * resolve once per FileSystem instance and are cached — Hadoop's own
  * FS cache (scheme+authority) makes that one resolution per catalog
  * per JVM conf, not per access. */
class GraftVirtualFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var catalogName: String = _
  private var workDir: Path = _
  private val tableRoots =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  override def getScheme: String = "gvfs"

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    val auth = uri.getAuthority
    if (auth == null || auth.isEmpty)
      throw new IllegalArgumentException(
        s"gvfs URI needs a catalog authority (gvfs://<catalog>/db/table/...): $uri")
    catalogName = auth
    fsUri = URI.create(s"gvfs://$catalogName/")
    workDir = new Path(fsUri)
  }

  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  private def cfg(key: String): Option[String] =
    Option(getConf.get(s"fs.gvfs.catalog.$catalogName.$key")).filter(_.nonEmpty)

  /** Segments of the VIRTUAL path: (db, table, rest-of-path). */
  private def segments(path: Path): Seq[String] = {
    val p = makeQualified(path).toUri.getPath
    p.split("/").filter(_.nonEmpty).toSeq
  }

  private def restGet(route: String): String = {
    val uri = cfg("rest.uri").get
    val conn = new URL(s"$uri/v1/$route").openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setRequestProperty("Authorization", s"Bearer ${cfg("rest.token").getOrElse("")}")
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    val code = conn.getResponseCode
    val stream = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = if (stream == null) "" else new String(stream.readAllBytes(), "UTF-8")
    if (code == 404) throw new FileNotFoundException(s"gvfs: $route not found")
    if (code >= 400) throw new IOException(s"gvfs REST $route failed ($code): $text")
    text
  }

  /** Physical root of one table, resolved through the catalog. */
  private def tableRoot(db: String, table: String): String =
    tableRoots.computeIfAbsent((db, table), { _ =>
      val resolved = cfg("rest.uri") match {
        case Some(_) =>
          graft.core.Json.read(restGet(s"namespaces/$db/tables/$table"),
            classOf[Map[String, String]])("path")
        case None => cfg("hms.local-dir").orElse(cfg("hms.uris")) match {
          case Some(_) =>
            val opts = Seq("hms.local-dir", "hms.uris")
              .flatMap(k => cfg(k).map(k -> _)).toMap
            HmsBridge.tablePath(opts, db, table).getOrElse(
              throw new FileNotFoundException(s"gvfs: no HMS entry $db.$table"))
          case None =>
            val wh = cfg("warehouse").getOrElse(throw new IOException(
              s"fs.gvfs.catalog.$catalogName needs warehouse, rest.uri or hms.*"))
            s"$wh/$db/$table"
        }
      }
      if (!graft.table.GraftTable.exists(resolved))
        throw new FileNotFoundException(s"gvfs: no graft table at $db.$table")
      resolved
    })

  private def physFs(root: String): FileSystem =
    new Path(root).getFileSystem(getConf)

  /** Physical path of a within-table virtual path. */
  private def physical(db: String, table: String, rest: Seq[String]): Path =
    new Path((tableRoot(db, table) +: rest).mkString("/"))

  private def virtualize(db: String, table: String, root: String, st: FileStatus): FileStatus = {
    val rel = st.getPath.toUri.getPath.stripPrefix(
      new Path(root).toUri.getPath).stripPrefix("/")
    val vp = new Path(s"gvfs://$catalogName/$db/$table" +
      (if (rel.isEmpty) "" else s"/$rel"))
    new FileStatus(st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
      st.getModificationTime, vp)
  }

  private def dirStatus(p: Path): FileStatus =
    new FileStatus(0, true, 1, 0, 0, makeQualified(p))

  override def getFileStatus(f: Path): FileStatus = segments(f) match {
    case Seq() => dirStatus(f)
    case Seq(db) =>
      cfg("rest.uri") match {
        case Some(_) =>
          restGet(s"namespaces/$db") // 404s if absent
          dirStatus(f)
        case None =>
          val wh = cfg("warehouse").getOrElse(
            throw new IOException("gvfs: database listing needs a warehouse catalog"))
          if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(wh, db)))
            throw new FileNotFoundException(s"gvfs: no database $db")
          dirStatus(f)
      }
    case Seq(db, table) =>
      tableRoot(db, table) // FileNotFoundException if absent
      dirStatus(f)
    case db +: table +: rest =>
      val root = tableRoot(db, table)
      virtualize(db, table, root,
        physFs(root).getFileStatus(physical(db, table, rest)))
  }

  override def listStatus(f: Path): Array[FileStatus] = segments(f) match {
    case Seq() =>
      cfg("rest.uri") match {
        case Some(_) =>
          graft.core.Json.read(restGet("namespaces"), classOf[Seq[String]])
            .map(db => dirStatus(new Path(s"gvfs://$catalogName/$db"))).toArray
        case None =>
          val wh = cfg("warehouse").getOrElse(
            throw new IOException("gvfs: catalog listing needs a warehouse catalog"))
          graft.core.FsUtil.listAll(java.nio.file.Paths.get(wh))
            .filter(java.nio.file.Files.isDirectory(_))
            .map(d => dirStatus(new Path(s"gvfs://$catalogName/${d.getFileName}")))
            .toArray
      }
    case Seq(db) =>
      cfg("rest.uri") match {
        case Some(_) =>
          graft.core.Json.read(restGet(s"namespaces/$db/tables"), classOf[Seq[String]])
            .map(t => dirStatus(new Path(s"gvfs://$catalogName/$db/$t"))).toArray
        case None =>
          val wh = cfg("warehouse").getOrElse(
            throw new IOException("gvfs: database listing needs a warehouse catalog"))
          val dbDir = java.nio.file.Paths.get(wh, db)
          if (!java.nio.file.Files.isDirectory(dbDir))
            throw new FileNotFoundException(s"gvfs: no database $db")
          graft.core.FsUtil.listAll(dbDir)
            .filter(d => graft.table.GraftTable.exists(d.toString))
            .map(d => dirStatus(new Path(s"gvfs://$catalogName/$db/${d.getFileName}")))
            .toArray
      }
    case db +: table +: rest =>
      val root = tableRoot(db, table)
      physFs(root).listStatus(physical(db, table, rest))
        .map(virtualize(db, table, root, _))
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = segments(f) match {
    case db +: table +: rest if rest.nonEmpty =>
      val root = tableRoot(db, table)
      physFs(root).open(physical(db, table, rest), bufferSize)
    case _ => throw new FileNotFoundException(
      s"gvfs: $f is a catalog/database/table, not a file")
  }

  private def readOnly(op: String): Nothing = throw new IOException(
    s"gvfs is a read-path view — $op must go through the catalog/table API " +
      "(a raw file mutation would corrupt the table's snapshot consistency)")

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = readOnly("create")
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = readOnly("append")
  override def rename(src: Path, dst: Path): Boolean = readOnly("rename")
  override def delete(f: Path, recursive: Boolean): Boolean = readOnly("delete")
  override def mkdirs(f: Path, permission: FsPermission): Boolean = readOnly("mkdirs")
}
