package graft.sources

import graft.core.{FileIO, LocalFileIO}
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewChange, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}

/** Catalog-stored SQL views (reference: paimon-core view/ViewImpl.java +
  * paimon-spark catalog/SupportView.java — views are named SQL text
  * persisted in the catalog with a frozen schema, resolved at read time
  * by re-parsing the stored query).
  *
  * Spark-first re-expression: instead of the reference's custom analyzer
  * rule + DDL rewrite parser extension, we implement Spark 4's native
  * `ViewCatalog` connector API on [[GraftCatalog]]. The stored artifact
  * is one JSON file per view (`<warehouse>/<ns>/<name>/view.json`) —
  * the same one-object-per-entity layout the rest of the catalog uses,
  * so rename/drop are single-file moves and `listViews` is a directory
  * scan, O(entities-in-namespace) driver-side metadata like every other
  * catalog call (scale-safe: view count, not data size).
  *
  * All metadata IO goes through [[graft.core.FileIO]] — the same seam
  * the table layer uses — so atomic-write/rename semantics live behind
  * ONE abstraction and an object-store port swaps a single
  * implementation, not a hunt for `java.nio.Files` call sites.
  *
  * Multi-dialect queries (reference: AlterViewDialectProcedure — a view
  * can carry per-engine SQL text): the base `sql` is the `spark`
  * dialect; other dialects live in `dialect.<name>` properties and are
  * managed via `CALL sys.alter_view_dialect`.
  */
object GraftViews {

  private val io: FileIO = new LocalFileIO

  /** Persisted form of one view (1:1 with Spark's ViewInfo). */
  case class ViewMeta(
      sql: String,
      currentCatalog: String,
      currentNamespace: Seq[String],
      schemaJson: String,
      queryColumnNames: Seq[String],
      columnAliases: Seq[String],
      columnComments: Seq[String],
      properties: Map[String, String])

  val SparkDialect = "spark"

  def metaPath(warehouse: String, ident: Identifier): String =
    (ident.namespace() :+ ident.name())
      .mkString(s"$warehouse/", "/", "/view.json")

  private def parentDir(p: String): String = p.substring(0, p.lastIndexOf('/'))

  def exists(warehouse: String, ident: Identifier): Boolean =
    io.exists(metaPath(warehouse, ident))

  def create(warehouse: String, info: ViewInfo, orReplace: Boolean): Unit = {
    val p = metaPath(warehouse, info.ident)
    if (!orReplace && io.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(info.ident)
    val meta = ViewMeta(
      sql = info.sql,
      currentCatalog = info.currentCatalog,
      currentNamespace = info.currentNamespace.toSeq,
      schemaJson = info.schema.json,
      queryColumnNames = info.queryColumnNames.toSeq,
      columnAliases = info.columnAliases.toSeq,
      columnComments = info.columnComments.toSeq,
      properties = {
        import scala.jdk.CollectionConverters._
        info.properties.asScala.toMap
      })
    io.writeString(p, graft.core.Json.write(meta))
  }

  private def readMeta(warehouse: String, ident: Identifier): ViewMeta = {
    val p = metaPath(warehouse, ident)
    if (!io.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    graft.core.Json.read(io.readString(p), classOf[ViewMeta])
  }

  def load(warehouse: String, ident: Identifier): View =
    asView(ident, readMeta(warehouse, ident))

  private def asView(ident: Identifier, meta: ViewMeta): View = new View {
    override def name(): String = (ident.namespace() :+ ident.name()).mkString(".")
    override def query(): String = meta.sql
    override def currentCatalog(): String = meta.currentCatalog
    override def currentNamespace(): Array[String] = meta.currentNamespace.toArray
    override def schema(): StructType =
      DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    override def queryColumnNames(): Array[String] = meta.queryColumnNames.toArray
    override def columnAliases(): Array[String] = meta.columnAliases.toArray
    override def columnComments(): Array[String] = meta.columnComments.toArray
    override def properties(): java.util.Map[String, String] = {
      import scala.jdk.CollectionConverters._
      meta.properties.asJava
    }
  }

  def drop(warehouse: String, ident: Identifier): Boolean = {
    val p = metaPath(warehouse, ident)
    if (!io.exists(p)) false
    else {
      io.delete(p)
      // remove the (now empty) view directory; ignore if shared/nonempty
      try io.delete(parentDir(p)) catch { case _: Exception => }
      true
    }
  }

  def rename(warehouse: String, from: Identifier, to: Identifier): Unit = {
    val src = metaPath(warehouse, from)
    if (!io.exists(src))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(from)
    val dst = metaPath(warehouse, to)
    if (io.exists(dst))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(to)
    io.rename(src, dst)
    try io.delete(parentDir(src)) catch { case _: Exception => }
  }

  def list(warehouse: String, namespace: Array[String]): Array[Identifier] =
    io.list(s"$warehouse/${namespace.mkString("/")}").iterator
      .filter(child => io.exists(s"$child/view.json"))
      .map(child => Identifier.of(namespace, child.split('/').last))
      .toArray

  def alter(warehouse: String, ident: Identifier, changes: Seq[ViewChange]): View = {
    var meta = readMeta(warehouse, ident)
    changes.foreach {
      case set: ViewChange.SetProperty =>
        meta = meta.copy(properties = meta.properties + (set.property() -> set.value()))
      case rm: ViewChange.RemoveProperty =>
        meta = meta.copy(properties = meta.properties - rm.property())
      case other => throw new UnsupportedOperationException(
        s"unsupported view change: $other")
    }
    io.writeString(metaPath(warehouse, ident), graft.core.Json.write(meta))
    asView(ident, meta)
  }

  /** Set or drop per-dialect SQL text (reference:
    * AlterViewDialectProcedure; the `spark` dialect is the base query).
    */
  def alterDialect(
      warehouse: String, ident: Identifier,
      action: String, dialect: String, sql: String): String = {
    var meta = readMeta(warehouse, ident)
    action match {
      case "add" | "update" =>
        if (dialect == SparkDialect) meta = meta.copy(sql = sql)
        else meta = meta.copy(properties =
          meta.properties + (s"dialect.$dialect" -> sql))
      case "drop" =>
        require(dialect != SparkDialect, "cannot drop the base spark dialect")
        meta = meta.copy(properties = meta.properties - s"dialect.$dialect")
      case other =>
        throw new IllegalArgumentException(s"unknown action: $other (add|update|drop)")
    }
    io.writeString(metaPath(warehouse, ident), graft.core.Json.write(meta))
    "ok"
  }
}
