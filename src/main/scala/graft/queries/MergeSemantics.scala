package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Paimon merge-engine semantics (SURVEY.md §2.4) expressed as pure
  * Spark plans over the `events` stream table, treating `user_id` as
  * the primary key and (`ts`, `event_id`) as the sequence field.
  *
  * Reference semantics being mirrored:
  *  - deduplicate:  MergeFunction keeps the highest-sequence record
  *    (paimon-core .../mergetree/compact/DeduplicateMergeFunction.java)
  *  - first-row:    keeps the lowest-sequence record
  *    (.../compact/FirstRowMergeFunction.java)
  *  - partial-update: per-field last non-null value by sequence
  *    (.../compact/PartialUpdateMergeFunction.java)
  *  - aggregation:  per-field aggregate across versions
  *    (.../compact/aggregate/AggregateMergeFunction.java)
  *
  * In Spark the whole family reduces to groupBy(pk) + ordered
  * aggregates (max_by/min_by/sum/...) — the shuffle's sort replaces
  * the reference's LSM k-way merge.
  */
object MergeSemantics {

  val defs: Vector[QDef] = Vector(
    // ---- deduplicate engine: latest full row per key.
    QDef(
      "m01_dedup_latest",
      """SELECT event_id, user_id, event_type, CAST(ROUND(value, 4) AS DOUBLE) AS value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      tbl(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          asDouble(col("value"), 4).as("value"))
    },

    // ---- first-row engine: earliest full row per key.
    QDef(
      "m02_first_row",
      """SELECT event_id, user_id, event_type, CAST(ROUND(value, 4) AS DOUBLE) AS value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY ts ASC, event_id ASC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      tbl(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          asDouble(col("value"), 4).as("value"))
    },

    // ---- partial-update engine: last non-null per field by sequence.
    // Sparse per-type value columns simulate partial rows; max_by with a
    // null-ordered key skips null updates, mirroring the reference's
    // retract-free partial update.
    QDef(
      "m03_partial_update",
      """SELECT user_id,
        |  CAST(ROUND(arg_max(value, ts) FILTER (WHERE event_type = 'click'), 4) AS DOUBLE) AS last_click_value,
        |  CAST(ROUND(arg_max(value, ts) FILTER (WHERE event_type = 'purchase'), 4) AS DOUBLE) AS last_purchase_value,
        |  CAST(ROUND(arg_max(value, ts) FILTER (WHERE event_type = 'view'), 4) AS DOUBLE) AS last_view_value
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      def lastOf(t: String) = asDouble(
        max_by(col("value"), when(col("event_type") === t, col("ts"))), 4)
      tbl(s, dir, "events")
        .groupBy("user_id")
        .agg(
          lastOf("click").as("last_click_value"),
          lastOf("purchase").as("last_purchase_value"),
          lastOf("view").as("last_view_value"))
    },

    // ---- aggregation engine: per-field aggregates across versions
    // (sum / min / max / count / bool_or / listagg-style).
    QDef(
      "m04_aggregation_engine",
      """SELECT user_id,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value,
        |  CAST(ROUND(MIN(value), 4) AS DOUBLE) AS min_value,
        |  CAST(ROUND(MAX(value), 4) AS DOUBLE) AS max_value,
        |  CAST(COUNT(*) AS BIGINT) AS n_versions,
        |  CAST(MAX(event_type = 'error') AS BOOLEAN) AS any_error,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      tbl(s, dir, "events")
        .groupBy("user_id")
        .agg(
          asDouble(sum(col("value").cast("decimal(18,4)")), 4).as("sum_value"),
          asDouble(min(col("value")), 4).as("min_value"),
          asDouble(max(col("value")), 4).as("max_value"),
          count(lit(1)).as("n_versions"),
          max(col("event_type") === "error").as("any_error"),
          array_join(array_sort(collect_set(col("event_type"))), ",").as("types_seen"))
    },

    // ---- last_non_null + first_value field aggregates (the
    // FieldLastNonNullValueAgg / FieldFirstValueAgg pair).
    QDef(
      "m05_first_last_fields",
      """WITH ranked AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_first,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_last
        |  FROM events)
        |SELECT user_id,
        |  max(CASE WHEN rn_first = 1 THEN event_type END) AS first_type,
        |  max(CASE WHEN rn_last = 1 THEN event_type END) AS last_type,
        |  max(CASE WHEN rn_first = 1 THEN event_id END) AS first_event_id,
        |  max(CASE WHEN rn_last = 1 THEN event_id END) AS last_event_id
        |FROM ranked GROUP BY user_id""".stripMargin) { (s, dir) =>
      val seq = struct(col("ts"), col("event_id"))
      tbl(s, dir, "events")
        .groupBy("user_id")
        .agg(
          min_by(col("event_type"), seq).as("first_type"),
          max_by(col("event_type"), seq).as("last_type"),
          min_by(col("event_id"), seq).as("first_event_id"),
          max_by(col("event_id"), seq).as("last_event_id"))
    },

    // ---- changelog/audit semantics: per-key +I / +U version counting
    // (what $audit_log exposes — first version is the insert, the rest
    // are updates).
    QDef(
      "m06_changelog_counts",
      """SELECT user_id,
        |  CAST(1 AS BIGINT) AS inserts,
        |  CAST(COUNT(*) - 1 AS BIGINT) AS updates
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      tbl(s, dir, "events")
        .groupBy("user_id")
        .agg(lit(1L).as("inserts"), (count(lit(1)) - 1L).as("updates"))
    },

    // ---- partial-update with TWO sequence groups, updated out of
    // order: group a's second write carries an older group-sequence
    // (must lose), group b's a newer one (must win) — end-to-end
    // through the storage layer (reference:
    // PartialUpdateMergeFunction sequence-group semantics).
    QDef(
      "m07_sequence_groups",
      """SELECT o_orderkey, o_orderpriority AS a, CAST(2 AS BIGINT) AS sa,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'NEW_B' ELSE o_orderstatus END AS b,
        |  CAST(CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS sb
        |FROM orders""".stripMargin) { (s, dir) =>
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-m07-").toString + "/table"
      val src = tbl(s, dir, "orders")
      val base = src.select(
        col("o_orderkey"),
        col("o_orderpriority").as("a"), lit(2L).as("sa"),
        col("o_orderstatus").as("b"), lit(1L).as("sb"))
      val t = graft.table.GraftTable.create(s, scratch, base.schema,
        primaryKeys = Seq("o_orderkey"),
        options = Map(
          "merge-engine" -> "partial-update",
          "fields.sa.sequence-group" -> "a",
          "fields.sb.sequence-group" -> "b",
          "bucket" -> "4"))
      t.write(base)
      t.write(src.filter(col("o_orderkey") % 3 === 0).select(
        col("o_orderkey"),
        lit("NEW_A").as("a"), lit(1L).as("sa"),   // older → loses
        lit("NEW_B").as("b"), lit(2L).as("sb")))  // newer → wins
      t.read
    })
}
