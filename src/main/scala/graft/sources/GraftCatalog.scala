package graft.sources

import graft.table.GraftTable
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.rdd.RDD
import java.util
import scala.jdk.CollectionConverters._

/** DSv2 catalog exposing graft tables to plain SQL
  * (reference: paimon-spark .../SparkCatalog.java + SparkTable.scala).
  *
  * Register with
  * `spark.sql.catalog.graft = graft.sources.GraftCatalog` and
  * `spark.sql.catalog.graft.warehouse = /path`, then
  * `CREATE TABLE graft.db.t (...) PARTITIONED BY (...)
  * TBLPROPERTIES ('primary-key'='k', ...)`, INSERT INTO / INSERT
  * OVERWRITE / SELECT (incl. `VERSION AS OF`) work directly.
  *
  * Reads and writes route through the library's DataFrame paths via
  * the DSv2 V1 fallbacks (V1Scan/V1Write), so manifest pruning, merge
  * engines and the commit protocol are shared with the programmatic
  * API rather than reimplemented.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must be set"))
  }

  override def name(): String = catalogName

  private def tablePath(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$warehouse/", "/", "")

  // ---- tables ---------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = java.nio.file.Paths.get(s"$warehouse/${namespace.mkString("/")}")
    if (!java.nio.file.Files.isDirectory(dir)) Array.empty
    else java.nio.file.Files.list(dir).iterator().asScala
      .filter(p => GraftTable.exists(p.toString))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  private def loadGraft(ident: Identifier): GraftTable = {
    if (!GraftTable.exists(tablePath(ident)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    GraftTable.load(spark, tablePath(ident))
  }

  override def loadTable(ident: Identifier): Table =
    new GraftSparkTable(loadGraft(ident), snapshot = None)

  override def loadTable(ident: Identifier, version: String): Table =
    new GraftSparkTable(loadGraft(ident), snapshot = Some(version.toLong))

  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val gt = loadGraft(ident)
    // DSv2 passes micros; snapshots record millis
    val id = gt.sm.snapshotIds.map(gt.sm.snapshot)
      .filter(_.timeMillis <= timestamp / 1000).map(_.id).sorted.lastOption
    new GraftSparkTable(gt, snapshot = id.orElse(Some(-1L)))
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val partitionKeys = partitions.toSeq.map { t =>
      require(t.name == "identity",
        s"unsupported partition transform: ${t.describe()}")
      t.references()(0).fieldNames().mkString(".")
    }
    val props = properties.asScala.toMap
    val primaryKeys = props.get("primary-key")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)
    val options = props -- Seq("primary-key", TableCatalog.PROP_PROVIDER,
      TableCatalog.PROP_LOCATION, TableCatalog.PROP_OWNER, TableCatalog.PROP_COMMENT,
      TableCatalog.PROP_EXTERNAL)
    val gt = GraftTable.create(spark, tablePath(ident), schema,
      partitionKeys = partitionKeys, primaryKeys = primaryKeys, options = options)
    new GraftSparkTable(gt, None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val gt = loadGraft(ident)
    changes.foreach {
      case add: TableChange.AddColumn if add.fieldNames().length == 1 =>
        gt.addColumn(add.fieldNames()(0), add.dataType(), add.isNullable)
      case other => throw new UnsupportedOperationException(
        s"unsupported table change: $other")
    }
    new GraftSparkTable(loadGraft(ident), None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = java.nio.file.Paths.get(tablePath(ident))
    if (!java.nio.file.Files.exists(dir)) false
    else {
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(tablePath(newIdent)).getParent)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(tablePath(oldIdent)),
      java.nio.file.Paths.get(tablePath(newIdent)))
  }

  // ---- namespaces -----------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = java.nio.file.Paths.get(warehouse)
    if (!java.nio.file.Files.isDirectory(root)) Array.empty
    else java.nio.file.Files.list(root).iterator().asScala
      .filter(java.nio.file.Files.isDirectory(_))
      .map(p => Array(p.getFileName.toString)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    Array.empty

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$warehouse/${namespace.mkString("/")}"))

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit =
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$warehouse/${namespace.mkString("/")}"))

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("alterNamespace")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = java.nio.file.Paths.get(s"$warehouse/${namespace.mkString("/")}")
    if (!java.nio.file.Files.exists(dir)) false
    else {
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      true
    }
  }
}

/** DSv2 table handle: batch read via V1Scan (DataFrame-backed), batch
  * write via V1Write (InsertableRelation), dynamic-overwrite capable. */
class GraftSparkTable(gt: GraftTable, snapshot: Option[Long])
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = gt.path
  override def schema(): StructType = gt.schema.toStruct
  override def partitioning(): Array[Transform] =
    gt.schema.partitionKeys.map(k =>
      org.apache.spark.sql.connector.expressions.Expressions.identity(k)).toArray
  override def properties(): util.Map[String, String] =
    gt.schema.options.asJava

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.OVERWRITE_DYNAMIC, TableCapability.TRUNCATE)
      .asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(gt, snapshot, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(gt)
}

class GraftScanBuilder(gt: GraftTable, snapshot: Option[Long], full: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // conservatively keep them all as residuals too
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new V1Scan
      with org.apache.spark.sql.connector.read.SupportsReportStatistics {

    /** manifest-derived stats feed Spark's join planning (broadcast
      * decisions) without touching data files. */
    override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
      new org.apache.spark.sql.connector.read.Statistics {
        private val entries = gt.sm.latestSnapshot()
          .map(gt.sm.liveEntries).getOrElse(Seq.empty)
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(entries.map(_.file.fileSize).sum)
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.of(entries.map(e =>
            e.file.rowCount - e.file.dvCardinality.getOrElse(0L)).sum)
      }

    override def readSchema(): StructType = required
    override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
        with org.apache.spark.sql.sources.TableScan](context: SQLContext): T = {
      val cond = GraftFilters.toCondition(pushed)
      val cols = required.fieldNames
      new org.apache.spark.sql.sources.BaseRelation
          with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = required
        override def buildScan(): RDD[Row] = {
          val base = snapshot match {
            case Some(id) if id < 0 => gt.read.limit(0) // before first snapshot
            case Some(id) => gt.versionAsOf(id).filter(cond)
            case None => gt.scan(cond)
          }
          val pruned =
            if (cols.isEmpty) base.select(lit(1).as("dummy"))
            else base.select(cols.map(col).toIndexedSeq: _*)
          pruned.rdd
        }
      }.asInstanceOf[T]
    }
  }
}

class GraftWriteBuilder(gt: GraftTable)
    extends WriteBuilder with SupportsDynamicOverwrite with SupportsTruncate {

  private var overwriteMode = false

  override def overwriteDynamicPartitions(): WriteBuilder = { overwriteMode = true; this }
  override def truncate(): WriteBuilder = { overwriteMode = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          if (overwriteMode || overwrite) gt.overwrite(data)
          else gt.write(data)
        }
      }
  }
}

/** v1 Filter → Column translation (the subset our planner prunes on;
  * everything is also re-applied by Spark as residual). */
object GraftFilters {
  def toCondition(filters: Array[Filter]): Column =
    filters.flatMap(toColumn).reduceOption(_ && _).getOrElse(lit(true))

  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }
}
