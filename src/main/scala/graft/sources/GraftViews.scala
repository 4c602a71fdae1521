package graft.sources

import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewChange, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.file.{Files, Paths, Path}

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
  * Multi-dialect queries (reference: AlterViewDialectProcedure — a view
  * can carry per-engine SQL text): the base `sql` is the `spark`
  * dialect; other dialects live in `dialect.<name>` properties and are
  * managed via `CALL sys.alter_view_dialect`.
  */
object GraftViews {

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

  def metaPath(warehouse: String, ident: Identifier): Path =
    Paths.get((ident.namespace() :+ ident.name())
      .mkString(s"$warehouse/", "/", "/view.json"))

  def exists(warehouse: String, ident: Identifier): Boolean =
    Files.exists(metaPath(warehouse, ident))

  def create(warehouse: String, info: ViewInfo, orReplace: Boolean): Unit = {
    val p = metaPath(warehouse, info.ident)
    if (!orReplace && Files.exists(p))
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
    Files.createDirectories(p.getParent)
    Files.write(p, graft.core.Json.write(meta).getBytes("UTF-8"))
  }

  def load(warehouse: String, ident: Identifier): View = {
    val p = metaPath(warehouse, ident)
    if (!Files.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    val meta = graft.core.Json.read(
      new String(Files.readAllBytes(p), "UTF-8"), classOf[ViewMeta])
    asView(ident, meta)
  }

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
    if (!Files.exists(p)) false
    else {
      Files.delete(p)
      // remove the (now empty) view directory; ignore if shared/nonempty
      try Files.deleteIfExists(p.getParent) catch { case _: Exception => }
      true
    }
  }

  def rename(warehouse: String, from: Identifier, to: Identifier): Unit = {
    val src = metaPath(warehouse, from)
    if (!Files.exists(src))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(from)
    val dst = metaPath(warehouse, to)
    if (Files.exists(dst))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(to)
    Files.createDirectories(dst.getParent)
    Files.move(src, dst)
    try Files.deleteIfExists(src.getParent) catch { case _: Exception => }
  }

  def list(warehouse: String, namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get(s"$warehouse/${namespace.mkString("/")}")
    if (!Files.isDirectory(dir)) Array.empty
    else graft.core.FsUtil.listAll(dir).iterator
      .filter(p => Files.exists(p.resolve("view.json")))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  def alter(warehouse: String, ident: Identifier, changes: Seq[ViewChange]): View = {
    val p = metaPath(warehouse, ident)
    if (!Files.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    var meta = graft.core.Json.read(
      new String(Files.readAllBytes(p), "UTF-8"), classOf[ViewMeta])
    changes.foreach {
      case set: ViewChange.SetProperty =>
        meta = meta.copy(properties = meta.properties + (set.property() -> set.value()))
      case rm: ViewChange.RemoveProperty =>
        meta = meta.copy(properties = meta.properties - rm.property())
      case other => throw new UnsupportedOperationException(
        s"unsupported view change: $other")
    }
    Files.write(p, graft.core.Json.write(meta).getBytes("UTF-8"))
    asView(ident, meta)
  }

  /** Set or drop per-dialect SQL text (reference:
    * AlterViewDialectProcedure; the `spark` dialect is the base query).
    */
  def alterDialect(
      warehouse: String, ident: Identifier,
      action: String, dialect: String, sql: String): String = {
    val p = metaPath(warehouse, ident)
    if (!Files.exists(p))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    var meta = graft.core.Json.read(
      new String(Files.readAllBytes(p), "UTF-8"), classOf[ViewMeta])
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
    Files.write(p, graft.core.Json.write(meta).getBytes("UTF-8"))
    "ok"
  }
}
