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
  * `gvfs://cat/` walks seamlessly into data files. Snapshot-managed
  * tables are READ-only through the scheme (their write path belongs
  * to the catalog APIs, which keep snapshots consistent; a raw VFS
  * write would corrupt a table, so refusing is the safe default) —
  * OBJECT tables accept raw create/rename/delete, and a create into a
  * missing table auto-creates one (the reference's createObjectTable
  * fallback). Table paths
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
    val (code, text) = RestHttp.request(cfg("rest.uri").get,
      cfg("rest.token").getOrElse(""), "GET", route)
    if (code == 404) throw new FileNotFoundException(s"gvfs: $route not found")
    if (code >= 400) throw new IOException(s"gvfs REST $route failed ($code): $text")
    text
  }

  /** Cheap liveness probe for a cached root: one or two stats, NOT a
    * SnapshotManager construction — this runs on every path op, so it
    * must cost a HEAD, not a listing. */
  private def rootLive(root: String): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(root, "schema")) ||
      java.nio.file.Files.exists(java.nio.file.Paths.get(root, "object-table.json"))

  /** Physical root of one table, resolved through the catalog. Cache
    * entries self-invalidate when the resolved storage no longer holds
    * a table — a dropped or renamed-away table must stop resolving
    * (and re-resolve at its new home), not serve a stale path for the
    * life of the FS instance. The validation is [[rootLive]]'s 1-2
    * stats per op; the CATALOG round-trip (REST/HMS) still happens
    * once per resolution, which is the cache's purpose. */
  private def tableRoot(db: String, table: String): String = {
    val key = (db, table)
    val cached = tableRoots.get(key)
    if (cached != null && rootLive(cached))
      return cached
    tableRoots.remove(key)
    tableRoots.computeIfAbsent(key, { _ =>
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
      if (!graft.table.GraftTable.exists(resolved) &&
        objectLocation(resolved).isEmpty)
        throw new FileNotFoundException(s"gvfs: no graft table at $db.$table")
      resolved
    })
  }

  /** An OBJECT table's storage directory (reference: ObjectTable — a
    * metadata index over arbitrary objects; the VFS addresses the
    * OBJECTS, as the reference's table-object paths do). None for
    * snapshot-managed graft tables. */
  private def objectLocation(root: String): Option[String] = {
    val marker = java.nio.file.Paths.get(root, "object-table.json")
    if (!java.nio.file.Files.exists(marker)) None
    else Some(graft.core.Json.read(
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8"),
      classOf[ObjectTableMeta]).location)
  }

  private def physFs(root: String): FileSystem =
    new Path(root).getFileSystem(getConf)

  /** Directory a table's within-table paths resolve under: the object
    * location for object tables, the table dir itself otherwise. */
  private def dataRoot(db: String, table: String): String = {
    val root = tableRoot(db, table)
    objectLocation(root).getOrElse(root)
  }

  /** Physical path of a within-table virtual path. */
  private def physical(db: String, table: String, rest: Seq[String]): Path =
    new Path((dataRoot(db, table) +: rest).mkString("/"))

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
      val root = dataRoot(db, table)
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
            .filter(d => graft.table.GraftTable.exists(d.toString) ||
              objectLocation(d.toString).isDefined)
            .map(d => dirStatus(new Path(s"gvfs://$catalogName/$db/${d.getFileName}")))
            .toArray
      }
    case db +: table +: rest =>
      val root = dataRoot(db, table)
      physFs(root).listStatus(physical(db, table, rest))
        .map(virtualize(db, table, root, _))
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = segments(f) match {
    case db +: table +: rest if rest.nonEmpty =>
      val root = dataRoot(db, table)
      physFs(root).open(physical(db, table, rest), bufferSize)
    case _ => throw new FileNotFoundException(
      s"gvfs: $f is a catalog/database/table, not a file")
  }

  private def readOnly(op: String): Nothing = throw new IOException(
    s"gvfs: $op on a snapshot-managed table must go through the catalog/" +
      "table API (a raw file mutation would corrupt snapshot consistency); " +
      "only OBJECT tables accept raw file writes")

  /** Mutations are allowed ONLY inside OBJECT tables (reference:
    * PaimonVirtualFileSystem.create — table-object paths write through
    * the table's fileIO; snapshot-managed tables refuse). A create
    * into a table that does not exist AUTO-CREATES an object table
    * (warehouse catalogs only), mirroring the reference's
    * createObjectTable fallback — the distcp-into-a-fresh-dataset
    * flow. */
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = segments(f) match {
    case db +: table +: rest if rest.nonEmpty =>
      val root =
        try tableRoot(db, table)
        catch {
          case e: FileNotFoundException =>
            autoCreateObjectTable(db, table, e)
        }
      if (objectLocation(root).isEmpty) readOnly("create")
      val target = physical(db, table, rest)
      physFs(root).create(target, permission, overwrite, bufferSize,
        replication, blockSize, progress)
    case _ => throw new IOException(s"gvfs: cannot create at $f")
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = readOnly("append")

  /** Auto-create an object table to receive raw files (warehouse
    * catalogs only) — create()'s and mkdirs()'s shared fallback for a
    * missing table, the distcp-into-a-fresh-dataset flow. Returns the
    * fresh table root; rethrows `cause` when no warehouse is set. */
  private def autoCreateObjectTable(db: String, table: String,
      cause: FileNotFoundException): String = {
    val wh = cfg("warehouse").getOrElse(throw cause)
    val dir = java.nio.file.Paths.get(wh, db, table)
    java.nio.file.Files.createDirectories(dir.resolve("objects-data"))
    java.nio.file.Files.write(dir.resolve("object-table.json"),
      graft.core.Json.write(
        ObjectTableMeta(s"$dir/objects-data")).getBytes("UTF-8"))
    tableRoots.remove((db, table))
    tableRoot(db, table)
  }

  /** Some((db, table, rest)) when the path addresses an OBJECT table.
    * A MISSING table propagates its FileNotFoundException — masking it
    * as "snapshot-managed" would mislead callers and break Hadoop's
    * delete/rename contracts for nonexistent paths; resolution/config
    * errors propagate likewise. */
  private def objectTablePath(p: Path): Option[(String, String, Seq[String])] =
    segments(p) match {
      case db +: table +: rest
        if objectLocation(tableRoot(db, table)).isDefined =>
        Some((db, table, rest))
      case _ => None
    }

  override def rename(src: Path, dst: Path): Boolean =
    try (objectTablePath(src), objectTablePath(dst)) match {
      case (Some((db, t, r1)), Some((db2, t2, r2)))
        if db == db2 && t == t2 && r1.nonEmpty && r2.nonEmpty =>
        physFs(dataRoot(db, t)).rename(
          physical(db, t, r1), physical(db, t, r2))
      case _ => readOnly("rename")
    } catch { case _: FileNotFoundException => false } // Hadoop contract

  override def delete(f: Path, recursive: Boolean): Boolean =
    try objectTablePath(f) match {
      case Some((db, t, rest)) if rest.nonEmpty =>
        physFs(dataRoot(db, t)).delete(physical(db, t, rest), recursive)
      case _ => readOnly("delete")
    } catch { case _: FileNotFoundException => false } // already gone

  /** Hadoop's mkdirs contract creates missing parents and never
    * throws FNF for them — a missing TABLE routes through the same
    * object-table auto-create as [[create]] (warehouse catalogs
    * only); where auto-create is impossible the deliberate read-only
    * IOException explains the refusal instead of a misleading
    * missing-file error. */
  override def mkdirs(f: Path, permission: FsPermission): Boolean = segments(f) match {
    // catalog root and database levels follow Hadoop's contract: an
    // existing directory returns true (top-down mkdirs of a copy
    // target must not abort), and warehouse mode creates a missing
    // database the way the catalog's CREATE NAMESPACE would
    case Seq() => true
    case Seq(db) => cfg("warehouse") match {
      case Some(wh) =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wh, db))
        true
      case None =>
        getFileStatus(f) // FileNotFoundException if the db is absent
        true
    }
    case _ =>
      val resolved =
        try objectTablePath(f)
        catch {
          case e: FileNotFoundException => segments(f) match {
            case db +: table +: _ if cfg("warehouse").isDefined =>
              autoCreateObjectTable(db, table, e)
              objectTablePath(f)
            case _ => readOnly("mkdirs")
          }
        }
      resolved match {
        case Some((db, t, rest)) if rest.nonEmpty =>
          physFs(dataRoot(db, t)).mkdirs(physical(db, t, rest))
        case Some(_) => true // the table root itself, just auto-created or live
        case _ => readOnly("mkdirs")
      }
  }
}
