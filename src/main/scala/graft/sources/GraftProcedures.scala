package graft.sources

import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL maintenance procedures: `CALL <catalog>.sys.<proc>(...)`
  * (reference: the 43 Spark procedures under paimon-spark
  * .../procedure/, CALL-routed; Spark 4's native ProcedureCatalog
  * replaces the reference's ANTLR grammar injection).
  *
  * Each procedure returns one result row via a driver-local scan.
  */
object GraftProcedures {

  /** name → (parameters, body(table, args) => result string) */
  private type Body = (GraftTable, InternalRow) => String

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private val procs: Map[String, (Seq[ProcedureParameter], Body)] = Map(
    "compact" -> (Seq(p("table", StringType)), (t, _) =>
      t.compact().map(id => s"compacted -> snapshot $id").getOrElse("empty table")),
    // partition-scoped compaction (reference: CompactProcedure `where`
    // parameter); the SQL predicate may only touch partition columns.
    "compact_where" -> (Seq(p("table", StringType), p("where", StringType)),
      (t, args) => {
        t.compactWhere(org.apache.spark.sql.functions.expr(
          args.getUTF8String(1).toString))
          .map(id => s"compacted -> snapshot $id").getOrElse("no matching partitions")
      }),
    "compact_sorted" -> (Seq(
      p("table", StringType), p("strategy", StringType), p("order_by", StringType)),
      (t, args) => {
        val cols = args.getUTF8String(2).toString.split(",").map(_.trim).toSeq
        t.sortCompact(args.getUTF8String(1).toString, cols)
          .map(id => s"sort-compacted -> snapshot $id").getOrElse("empty table")
      }),
    "expire_snapshots" -> (Seq(p("table", StringType), p("retain", IntegerType)),
      (t, args) => s"expired ${t.expireSnapshots(args.getInt(1)).size} snapshots"),
    "expire_partitions" -> (Seq(
      p("table", StringType), p("column", StringType), p("older_than", StringType)),
      (t, args) => s"dropped ${t.expirePartitions(args.getUTF8String(1).toString,
        args.getUTF8String(2).toString).size} partitions"),
    // time-window expiration with the reference's two strategies
    // (values-time parses partition values; update-time = last write)
    "expire_partitions_by_time" -> (Seq(
      p("table", StringType), p("expiration_millis", LongType),
      p("strategy", StringType), p("timestamp_formatter", StringType)),
      (t, args) => s"dropped ${t.expirePartitionsByTime(
        args.getLong(1), args.getUTF8String(2).toString,
        args.getUTF8String(3).toString).size} partitions"),
    // full HMS partition reconciliation (adds AND drops) — the repair
    // path; per-commit upkeep is delta-only (HmsBridge.syncCommitDelta)
    "sync_hms_partitions" -> (Seq(p("table", StringType)),
      (t, _) => {
        val (a, d) = HmsBridge.reconcilePartitions(t)
        s"added $a, dropped $d HMS partitions"
      }),
    "remove_orphan_files" -> (Seq(p("table", StringType), p("older_than_millis", LongType)),
      (t, args) => s"deleted ${t.removeOrphanFiles(args.getLong(1)).size} orphans"),
    "create_tag" -> (Seq(p("table", StringType), p("tag", StringType)),
      (t, args) => { t.createTag(args.getUTF8String(1).toString); "ok" }),
    // create_tag with an explicit retention (reference: CreateTagProcedure's
    // optional time_retained argument — our procedure params are fixed-arity,
    // so the retained variant is its own name)
    "create_tag_retained" -> (Seq(p("table", StringType), p("tag", StringType),
      p("retain_millis", LongType)),
      (t, args) => { t.createTag(args.getUTF8String(1).toString,
        Some(args.getLong(2))); "ok" }),
    // expire tags whose tag.default-time-retained window lapsed
    // (reference: ExpireTagsProcedure riding TagTimeExpire)
    "expire_tags_by_retention" -> (Seq(p("table", StringType)),
      (t, _) => {
        val ex = t.expireTimedOutTags()
        if (ex.isEmpty) "no expired tags" else s"expired ${ex.mkString(",")}"
      }),
    "delete_tag" -> (Seq(p("table", StringType), p("tag", StringType)),
      (t, args) => { t.deleteTag(args.getUTF8String(1).toString); "ok" }),
    "rollback" -> (Seq(p("table", StringType), p("snapshot", LongType)),
      (t, args) => s"dropped ${t.rollback(args.getLong(1)).size} snapshots"),
    "create_branch" -> (Seq(p("table", StringType), p("branch", StringType)),
      (t, args) => { t.createBranch(args.getUTF8String(1).toString); "ok" }),
    "delete_branch" -> (Seq(p("table", StringType), p("branch", StringType)),
      (t, args) => { t.deleteBranch(args.getUTF8String(1).toString); "ok" }),
    "fast_forward" -> (Seq(p("table", StringType), p("branch", StringType)),
      (t, args) => { t.fastForward(args.getUTF8String(1).toString); "ok" }),
    "analyze" -> (Seq(p("table", StringType)),
      (t, _) => { t.analyze(); "ok" }),
    "rename_tag" -> (Seq(
      p("table", StringType), p("tag", StringType), p("new_tag", StringType)),
      (t, args) => { t.sm.renameTag(args.getUTF8String(1).toString,
        args.getUTF8String(2).toString); "ok" }),
    "replace_tag" -> (Seq(p("table", StringType), p("tag", StringType)),
      (t, args) => { t.replaceTag(args.getUTF8String(1).toString); "ok" }),
    "rollback_to_timestamp" -> (Seq(
      p("table", StringType), p("timestamp_millis", LongType)),
      (t, args) =>
        s"dropped ${t.rollbackToTimestamp(args.getLong(1)).size} snapshots"),
    "rollback_to_watermark" -> (Seq(p("table", StringType), p("watermark", LongType)),
      (t, args) =>
        s"dropped ${t.rollbackToWatermark(args.getLong(1)).size} snapshots"),
    "rescale" -> (Seq(p("table", StringType), p("buckets", IntegerType)),
      (t, args) => t.rescale(args.getInt(1))
        .map(id => s"rescaled -> snapshot $id").getOrElse("no-op")),
    "rewrite_file_index" -> (Seq(p("table", StringType)),
      (t, _) => t.rewriteFileIndex()
        .map(id => s"rewrote indexes -> snapshot $id").getOrElse("empty table")),
    // Iceberg-compatible metadata export: after this call any
    // Iceberg-format reader can consume the table from
    // <table>/metadata/ (reference: IcebergCommitCallback.java:102).
    "iceberg_sync" -> (Seq(p("table", StringType)),
      (t, _) => IcebergCompat.sync(t)
        .map(p => s"iceberg metadata -> $p").getOrElse("empty table")),
    // full-text inverted index build (reference capability:
    // paimon-lucene / CreateGlobalIndexProcedure for text search).
    "rebuild_text_index" -> (Seq(p("table", StringType), p("column", StringType)),
      (t, args) => {
        val c = args.getUTF8String(1).toString
        t.rebuildTextIndex(c)
        s"text index rebuilt for $c"
      }),
    // O(new files) incremental extension of an existing text index
    "update_text_index" -> (Seq(p("table", StringType), p("column", StringType)),
      (t, args) => {
        val c = args.getUTF8String(1).toString
        t.updateTextIndex(c)
        s"text index updated for $c"
      }),
    // table-attached HNSW vector index build (reference:
    // paimon-faiss + CreateGlobalIndexProcedure vector indexes).
    "rebuild_vector_index" -> (Seq(
      p("table", StringType), p("id_column", StringType), p("vector_column", StringType)),
      (t, args) => {
        val (idc, vc) = (args.getUTF8String(1).toString, args.getUTF8String(2).toString)
        t.rebuildVectorIndex(idc, vc)
        s"vector index rebuilt for $vc"
      }),
    // SQL surface for incremental reads (reference:
    // PaimonTableValuedFunctions.paimon_incremental_query — Spark 4 has
    // no user TVF extension point, so the procedure registers the lazy
    // incremental DataFrame as a temp view; the subsequent SELECT runs
    // fully distributed).
    "incremental_query" -> (Seq(
      p("table", StringType), p("from_snapshot", LongType),
      p("to_snapshot", LongType), p("view", StringType)),
      (t, args) => {
        val v = args.getUTF8String(3).toString
        t.incrementalRead(args.getLong(1), args.getLong(2))
          .createOrReplaceTempView(v)
        s"view $v"
      }),
    // repair: drop manifest entries whose data file no longer exists on
    // disk (externally deleted) so scans stop failing on them
    // (reference: RemoveUnexistingFilesProcedure).
    "remove_unexisting_files" -> (Seq(p("table", StringType)), (t, _) => {
      val n = t.removeUnexistingFiles()
      if (n == 0) "no-op" else s"dropped $n unexisting files"
    }),
    // automatic counterpart of mark_partition_done: mark every live
    // partition idle past partition.idle-time-to-done (reference:
    // PARTITION_IDLE_TIME_TO_DONE + PartitionMarkDone trigger)
    "mark_partitions_done_if_idle" -> (Seq(p("table", StringType)),
      (t, _) => {
        val marked = t.markIdlePartitionsDone()
        if (marked.isEmpty) "no idle partitions"
        else s"marked ${marked.size} partition(s) done"
      }),
    // downstream-scheduler signal (reference: MarkPartitionDoneProcedure
    // + partition.mark-done-action — success-file | done-partition |
    // mark-event | http-report | custom, all fired per partition).
    "mark_partition_done" -> (Seq(p("table", StringType), p("partition", StringType)),
      (t, args) => {
        val part = args.getUTF8String(1).toString
        MarkDoneActions.fire(t, part)
        "ok"
      }),
    // reset the table to empty (branches/tags/consumers/changelogs
    // cleared, history expired) while keeping its definition
    // (reference: PurgeFilesProcedure → FileStoreTable.purgeFiles).
    "purge_files" -> (Seq(p("table", StringType)), (t, _) => {
      val id = t.purgeFiles()
      if (id < 0) "already empty" else s"purged -> snapshot $id"
    }),
    "compact_manifest" -> (Seq(p("table", StringType)), (t, _) =>
      t.sm.compactManifests()
        .map(id => s"compacted manifests -> snapshot $id").getOrElse("no-op")),
    // materialized tables (reference: CoreOptions materialized-table.*
    // — the definition query is TABLE metadata; the reference's Flink
    // runtime refreshes it, here the refresh is an explicit CALL):
    // re-run the stored query and atomically OVERWRITE the content.
    // Columns align BY NAME and cast to the declared types, so a
    // definition returning extra/reordered columns still lands
    // correctly and a missing column fails loudly.
    "refresh_materialized_table" -> (Seq(p("table", StringType)), (t, _) => {
      val q = t.schema.options.getOrElse("materialized-table.definition-query",
        throw new IllegalArgumentException(
          "not a materialized table: set materialized-table.definition-query"))
      // a refresh is FULL: partitions the definition no longer produces
      // must clear, which dynamic partition overwrite would leave stale
      require(t.schema.partitionKeys.isEmpty ||
        t.schema.options.get("dynamic-partition-overwrite").contains("false"),
        "a partitioned materialized table needs " +
          "dynamic-partition-overwrite=false for full refreshes")
      val df = t.spark.sql(q)
      val target = t.schema.toStruct
      val missing = target.fieldNames.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"definition query lacks column(s): ${missing.mkString(", ")}")
      val aligned = df.select(target.fields.toIndexedSeq.map(f =>
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)): _*)
      val id = t.overwrite(aligned)
      t.setOption("materialized-table.refresh-status", s"refreshed:snapshot-$id")
      s"refreshed -> snapshot $id"
    }),
    "reset_consumer" -> (Seq(
      p("table", StringType), p("consumer", StringType), p("next_snapshot", LongType)),
      (t, args) => {
        t.sm.io.writeString(
          s"${t.path}/consumer/consumer-${args.getUTF8String(1).toString}",
          args.getLong(2).toString)
        "ok"
      }),
    "clear_consumers" -> (Seq(p("table", StringType)), (t, _) => {
      val cs = t.sm.io.list(s"${t.path}/consumer")
        .filter(_.split('/').last.startsWith("consumer-"))
      cs.foreach(t.sm.io.delete)
      s"cleared ${cs.size} consumers"
    }),
    // run the periodic auto-tag walk on demand (reference:
    // TriggerTagAutomaticCreationProcedure).
    "trigger_tag_automatic_creation" -> (Seq(p("table", StringType)), (t, _) => {
      val created = t.tagAutoCreate()
      if (created.isEmpty) "no new tags" else s"created ${created.mkString(",")}"
    }),
    "create_tag_from_timestamp" -> (Seq(
      p("table", StringType), p("tag", StringType), p("timestamp_millis", LongType)),
      (t, args) => {
        val ms = args.getLong(2)
        val id = t.sm.snapshotIds.map(t.sm.snapshot)
          .filter(_.timeMillis <= ms).map(_.id).maxOption
          .getOrElse(throw new IllegalArgumentException(
            s"no snapshot at or before $ms"))
        t.sm.createTag(args.getUTF8String(1).toString, id)
        t.notifyTag(args.getUTF8String(1).toString, created = true)
        s"tag -> snapshot $id"
      }),
    "expire_tags" -> (Seq(p("table", StringType), p("older_than_millis", LongType)),
      (t, args) => {
        val cutoff = args.getLong(1)
        val victims = t.sm.tags.filter { case (_, sid) =>
          try t.sm.snapshot(sid).timeMillis < cutoff
          catch { case _: Exception => false }
        }
        victims.keys.foreach(t.deleteTag)
        s"expired ${victims.size} tags"
      }),
    // global secondary index lifecycle (reference:
    // CreateGlobalIndexProcedure / DropGlobalIndexProcedure): create
    // appends the column to secondary-index.columns and rebuilds so
    // existing files are covered; drop stops probing the column (its
    // rows age out at the next index fold).
    "create_global_index" -> (Seq(p("table", StringType), p("column", StringType)),
      (t, args) => {
        val c = args.getUTF8String(1).toString
        val cur = t.schema.options.get(GraftTable.SecIndexColumns)
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq.empty)
        if (!cur.contains(c))
          t.setOption(GraftTable.SecIndexColumns, (cur :+ c).mkString(","))
        t.rewriteFileIndex()
          .map(id => s"indexed $c -> snapshot $id").getOrElse("empty table")
      }),
    "drop_global_index" -> (Seq(p("table", StringType), p("column", StringType)),
      (t, args) => {
        val c = args.getUTF8String(1).toString
        val rest = t.schema.options.get(GraftTable.SecIndexColumns)
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq.empty).filterNot(_ == c)
        t.setOption(GraftTable.SecIndexColumns,
          if (rest.isEmpty) null else rest.mkString(","))
        "ok"
      }),
    // incremental read between an auto tag and its predecessor
    // (reference: paimon_incremental_to_auto_tag TVF) — the lazy
    // DataFrame registers as a temp view like incremental_query
    "incremental_to_auto_tag" -> (Seq(
      p("table", StringType), p("tag", StringType), p("view", StringType)),
      (t, args) => {
        val v = args.getUTF8String(2).toString
        t.incrementalToAutoTag(args.getUTF8String(1).toString)
          .createOrReplaceTempView(v)
        s"view $v"
      }),
    "incremental_between_timestamp" -> (Seq(
      p("table", StringType), p("from_millis", LongType),
      p("to_millis", LongType), p("view", StringType)),
      (t, args) => {
        val snaps = t.sm.snapshotIds.map(t.sm.snapshot)
        def lastAtOrBefore(ms: Long): Long =
          snaps.filter(_.timeMillis <= ms).map(_.id).maxOption.getOrElse(-1L)
        val v = args.getUTF8String(3).toString
        t.incrementalRead(
          lastAtOrBefore(args.getLong(1)), lastAtOrBefore(args.getLong(2)))
          .createOrReplaceTempView(v)
        s"view $v"
      }))

  /** Catalog-level procedures (first argument is not a table). */
  private type CatalogBody = (GraftCatalog, InternalRow) => String
  private val catalogProcs: Map[String, (Seq[ProcedureParameter], CatalogBody)] = Map(
    // re-sync external registries (HMS entries, JDBC rows) from the
    // WAREHOUSE state — the truth lives in table storage; the registry
    // is a mirror that drifts when tables are created/dropped outside
    // this catalog (reference: RepairProcedure → Catalog.repairCatalog).
    // '' = whole catalog, 'db' = one database, 'db.table' = one table.
    "repair" -> (Seq(p("database_or_table", StringType)),
      (c, args) => {
        val id = args.getUTF8String(0).toString.trim
        // namespaces stay ARRAYS end-to-end (a mkString round-trip
        // would corrupt namespace names containing the join token);
        // the string form addresses dot-separated levels
        val targets: Seq[(Array[String], String)] =
          if (id.isEmpty)
            c.listNamespaces().toSeq.flatMap(ns =>
              c.listTables(ns).toSeq.map(t => (ns, t.name())))
          else {
            val segs = id.split("\\.")
            if (segs.length >= 2) Seq((segs.dropRight(1), segs.last))
            else c.listTables(segs).toSeq.map(t => (segs, t.name()))
          }
        val results = targets.map { case (ns, t) =>
          s"${(ns :+ t).mkString(".")}: ${c.mirrorRepair(ns, t)}" }
        if (results.isEmpty) "nothing to repair" else results.mkString("; ")
      }),
    // register a graft table living at an EXTERNAL path in this
    // catalog's registry (HMS entry / JDBC row), read-through and
    // without copying data (reference: Catalog.registerTable)
    "register_table" -> (Seq(p("identifier", StringType), p("path", StringType)),
      (c, args) => {
        val id = args.getUTF8String(0).toString.trim
        val path = args.getUTF8String(1).toString.trim
        val segs = id.split("\\.")
        require(segs.length >= 2, "identifier must be <db>.<table>")
        require(graft.table.GraftTable.exists(path),
          s"no graft table at $path")
        s"$id: ${c.mirrorRegister(segs.dropRight(1), segs.last, path)}"
      }),
    // ---- access control (reference: privilege/ procedures on the
    // reference's catalog: InitFileBasedPrivilege, CreatePrivilegedUser,
    // DropPrivilegedUser, GrantPrivilegeToUser, RevokePrivilegeFromUser).
    // Once the store exists, every OTHER procedure requires ADMIN (the
    // gate in load()); init itself is open only while un-initialized.
    "init_file_based_privilege" -> (Seq(p("root_password", StringType)),
      (c, args) => {
        GraftPrivileges.init(c.warehousePath, args.getUTF8String(0).toString)
        "privilege store initialized; authenticate as root"
      }),
    "create_privileged_user" -> (Seq(
      p("user", StringType), p("password", StringType)),
      (c, args) => { GraftPrivileges.createUser(c.warehousePath,
        args.getUTF8String(0).toString, args.getUTF8String(1).toString); "ok" }),
    "drop_privileged_user" -> (Seq(p("user", StringType)),
      (c, args) => { GraftPrivileges.dropUser(c.warehousePath,
        args.getUTF8String(0).toString); "ok" }),
    "grant_privilege_to_user" -> (Seq(
      p("user", StringType), p("privilege", StringType), p("identifier", StringType)),
      (c, args) => { GraftPrivileges.grant(c.warehousePath,
        args.getUTF8String(0).toString, args.getUTF8String(2).toString,
        args.getUTF8String(1).toString); "ok" }),
    "revoke_privilege_from_user" -> (Seq(
      p("user", StringType), p("privilege", StringType), p("identifier", StringType)),
      (c, args) => { GraftPrivileges.revoke(c.warehousePath,
        args.getUTF8String(0).toString, args.getUTF8String(2).toString,
        args.getUTF8String(1).toString); "ok" }),
    "create_function" -> (Seq(
      p("function", StringType), p("params", StringType), p("body", StringType)),
      (c, args) => { StoredFunctions.create(c.warehousePath,
        args.getUTF8String(0).toString, args.getUTF8String(1).toString,
        args.getUTF8String(2).toString); "ok" }),
    "drop_function" -> (Seq(p("function", StringType)),
      (c, args) => { StoredFunctions.drop(c.warehousePath,
        args.getUTF8String(0).toString); "ok" }),
    // replace a stored function's definition (reference:
    // AlterFunctionProcedure); validates the new body before overwrite.
    "alter_function" -> (Seq(
      p("function", StringType), p("params", StringType), p("body", StringType)),
      (c, args) => { StoredFunctions.alter(c.warehousePath,
        args.getUTF8String(0).toString, args.getUTF8String(1).toString,
        args.getUTF8String(2).toString); "ok" }),
    // whole-namespace compaction sweep (reference:
    // CompactDatabaseProcedure); empty tables and non-compactable
    // entries are skipped, the result counts tables compacted.
    "compact_database" -> (Seq(p("database", StringType)),
      (c, args) => {
        val db = args.getUTF8String(0).toString
        var n = 0
        val failed = scala.collection.mutable.ArrayBuffer.empty[String]
        c.listTables(Array(db)).foreach { id =>
          try {
            if (GraftTable.load(SparkSession.active, c.pathOf(id))
              .compact().isDefined) n += 1
          } catch { case e: Exception =>
            failed += id.name()
            org.slf4j.LoggerFactory.getLogger("graft.GraftProcedures")
              .warn(s"compact_database: ${id.name()} failed: $e")
          }
        }
        if (failed.isEmpty) s"compacted $n tables"
        else s"compacted $n tables, ${failed.size} failed: ${failed.mkString(",")}"
      }),
    // per-engine SQL text on a stored view (reference:
    // AlterViewDialectProcedure — action add|update|drop; the `spark`
    // dialect is the base query other engines' dialects hang off).
    "alter_view_dialect" -> (Seq(
      p("view", StringType), p("action", StringType),
      p("dialect", StringType), p("sql", StringType)),
      (c, args) => {
        val parts = args.getUTF8String(0).toString.split("\\.")
        GraftViews.alterDialect(c.warehousePath,
          Identifier.of(parts.dropRight(1), parts.last),
          args.getUTF8String(1).toString, args.getUTF8String(2).toString,
          args.getUTF8String(3).toString)
      }),
    "migrate_table" -> (Seq(p("table", StringType), p("source_dir", StringType)),
      (c, args) => {
        val parts = args.getUTF8String(0).toString.split("\\.")
        val ident = Identifier.of(parts.dropRight(1), parts.last)
        GraftTable.migrate(SparkSession.active,
          args.getUTF8String(1).toString, c.pathOf(ident))
        "ok"
      }),
    // fold a column's patch generations into one (data evolution
    // maintenance)
    "compact_column_patches" -> (Seq(p("table", StringType), p("column", StringType)),
      (c, args) => {
        val parts = args.getUTF8String(0).toString.split("\\.")
        val ident = Identifier.of(parts.dropRight(1), parts.last)
        val t = GraftTable.load(SparkSession.active, c.pathOf(ident))
        t.compactColumnPatches(args.getUTF8String(1).toString) match {
          case Some(id) => s"compacted -> snapshot $id"
          case None => "nothing to compact"
        }
      }),
    // adopt an Iceberg (Hadoop-layout) table; v2 position deletes
    // convert to DV sidecars (reference: IcebergMigrator, which
    // rejects delete files)
    "migrate_iceberg_table" -> (Seq(p("table", StringType), p("source_dir", StringType)),
      (c, args) => {
        val parts = args.getUTF8String(0).toString.split("\\.")
        val ident = Identifier.of(parts.dropRight(1), parts.last)
        GraftTable.migrateIceberg(SparkSession.active,
          args.getUTF8String(1).toString, c.pathOf(ident))
        "ok"
      }),
    // adopt a Hudi COPY_ON_WRITE table: latest completed base file per
    // file group, no rewrite (reference: HudiHiveCloneExtractor /
    // HudiFileIndex — rejects MERGE_ON_READ)
    "migrate_hudi_table" -> (Seq(p("table", StringType), p("source_dir", StringType)),
      (c, args) => {
        val parts = args.getUTF8String(0).toString.split("\\.")
        val ident = Identifier.of(parts.dropRight(1), parts.last)
        GraftTable.migrateHudi(SparkSession.active,
          args.getUTF8String(1).toString, c.pathOf(ident))
        "ok"
      }),
    // migrate every parquet directory under source_root into tables of
    // `database`, one table per subdirectory (reference:
    // MigrateDatabaseProcedure).
    "migrate_database" -> (Seq(p("database", StringType), p("source_root", StringType)),
      (c, args) => {
        val db = args.getUTF8String(0).toString
        val root = java.nio.file.Paths.get(args.getUTF8String(1).toString)
        require(java.nio.file.Files.isDirectory(root), s"no directory: $root")
        val migrated = scala.collection.mutable.ArrayBuffer.empty[String]
        graft.core.FsUtil.listAll(root)
          .filter(java.nio.file.Files.isDirectory(_)).foreach { dir =>
            val hasParquet = graft.core.FsUtil.walkAll(dir)
              .exists(_.toString.endsWith(".parquet"))
            if (hasParquet) {
              val ident = Identifier.of(Array(db), dir.getFileName.toString)
              GraftTable.migrate(SparkSession.active, dir.toString, c.pathOf(ident))
              migrated += dir.getFileName.toString
            }
          }
        s"migrated ${migrated.size} tables: ${migrated.sorted.mkString(",")}"
      }),
    // re-list an object table's directory and materialize the metadata
    // index as parquet (the reference's ObjectTableImpl serves the live
    // listing; the materialization is our addition so repeated queries
    // over slow object storage don't re-list).
    "refresh_object_table" -> (Seq(p("table", StringType)),
      (c, args) => {
        val parts = args.getUTF8String(0).toString.split("\\.")
        val n = c.refreshObjectTable(Identifier.of(parts.dropRight(1), parts.last))
        s"indexed $n objects"
      }),
    // snapshot-consistent table clone: metadata driver-side, data files
    // by a distributed copy job (reference: CopyFilesProcedure).
    "copy_files" -> (Seq(p("table", StringType), p("target", StringType)),
      (c, args) => {
        val s = args.getUTF8String(0).toString.split("\\.")
        val t = args.getUTF8String(1).toString.split("\\.")
        val src = GraftTable.load(SparkSession.active,
          c.pathOf(Identifier.of(s.dropRight(1), s.last)))
        val cloned = src.cloneTo(c.pathOf(Identifier.of(t.dropRight(1), t.last)))
        s"cloned -> ${cloned.path}"
      }))

  def names: Seq[String] = (procs.keys ++ catalogProcs.keys).toSeq.sorted

  def load(catalog: GraftCatalog, ident: Identifier): UnboundProcedure = {
    // privileged warehouses restrict maintenance to ADMIN; only the
    // bootstrap procedure stays open (and only until the store exists,
    // which GraftPrivileges.init itself enforces)
    def gate(): Unit =
      if (ident.name() != "init_file_based_privilege") catalog.requireAdmin()
    catalogProcs.get(ident.name()).foreach { case (params, body) =>
      return catalogProcedure(catalog, ident, params,
        (c, in) => { gate(); body(c, in) })
    }
    val (params, body0) = procs.getOrElse(ident.name(),
      throw new RuntimeException(s"unknown procedure: ${ident.name()}"))
    val body: Body = (t, in) => { gate(); body0(t, in) }
    new UnboundProcedure {
      override def name(): String = ident.name()
      override def description(): String = s"graft ${ident.name()}"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = ident.name()
        override def description(): String = s"graft ${ident.name()}"
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val tableName = input.getUTF8String(0).toString
          val parts = tableName.split("\\.")
          val tIdent = Identifier.of(parts.dropRight(1), parts.last)
          val gt = GraftTable.load(SparkSession.active, catalog.pathOf(tIdent))
          val result = body(gt, input)
          resultScan(result)
        }
      }
    }
  }

  private def resultScan(result: String): java.util.Iterator[Scan] = {
    val schema = StructType(Seq(StructField("result", StringType)))
    val row = InternalRow(UTF8String.fromString(result))
    java.util.Collections.singletonList[Scan](
      new GraftLocalScan(schema, Array(row))).iterator()
  }

  private def catalogProcedure(
      catalog: GraftCatalog, ident: Identifier,
      params: Seq[ProcedureParameter], body: CatalogBody): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = ident.name()
      override def description(): String = s"graft ${ident.name()}"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = ident.name()
        override def description(): String = s"graft ${ident.name()}"
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] =
          resultScan(body(catalog, input))
      }
    }
}
