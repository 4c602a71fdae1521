package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC wire-format parsers: raw connector JSON → the change-batch
  * shape [[graft.table.GraftTable.applyChanges]] consumes (payload
  * columns + `_row_kind` ∈ +I/+U/-U/-D).
  *
  * This is the format half of the reference's CDC ingestion layer
  * (paimon-flink-cdc — RichCdcRecord + the debezium/canal/maxwell
  * record parsers); the transport half (Kafka consumers, MySQL binlog
  * clients) stays out of scope — any DataFrame of JSON strings works,
  * batch or `readStream` micro-batch alike.
  *
  * Schema is INFERRED from the batch itself (one inference pass over
  * the JSON, then fully distributed parsing) — so a column that first
  * appears mid-stream flows through to applyChanges' schema evolution
  * exactly like the reference's UpdatedDataFieldsProcessFunction. */
object CdcFormats {

  /** Debezium JSON envelopes: `{"before":…,"after":…,"op":"c|r|u|d"}`,
    * with or without the `"payload"` wrapper of the non-flattened
    * connector config. Emits +I (c/r), -U/+U pairs (u), -D (d).
    *
    * Single-pass: each envelope explodes straight into the row kinds
    * it emits and the payload picks the matching image per column
    * (after for +I/+U, before for -U/-D) — one scan of the change
    * batch regardless of the op mix, no per-kind re-filtering, no
    * union. (The schema-inference pass in [[inferParse]] is a separate
    * bounded scan of the same batch.) */
  def debeziumJson(raw: DataFrame, jsonCol: String = "value"): DataFrame = {
    val parsed0 = inferParse(raw, jsonCol)
    // an empty or all-tombstone batch infers NO columns — a no-op
    // batch for the sink, not a query-killing envelope violation
    if (parsed0.columns.isEmpty) return emptyKinded(raw)
    val parsed =
      if (parsed0.columns.contains("payload")) parsed0.select("payload.*")
      else parsed0
    require(parsed.columns.contains("op"),
      "not a Debezium envelope batch: expected an op field")
    // a batch may be after-only (pure inserts/updates) or before-only
    // (pure deletes): to_json omits null envelope halves
    val hasAfter = parsed.columns.contains("after")
    val hasBefore = parsed.columns.contains("before")
    require(hasAfter || hasBefore,
      "not a Debezium envelope batch: expected before and/or after images")
    def fieldsOf(c: String): Seq[String] = parsed.schema(c).dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSeq
      case _ => Seq.empty
    }
    val afterFields = if (hasAfter) fieldsOf("after") else Seq.empty
    val beforeFields = if (hasBefore) fieldsOf("before") else Seq.empty
    val kinds =
      when(col("op").isin("c", "r"), array(lit("+I")))
        .when(col("op") === "u",
          // PER-ROW before check: default REPLICA IDENTITY sends
          // updates with before=null even when other rows in the batch
          // carry one — an all-null -U (null primary key!) must not be
          // fabricated for them
          if (hasBefore && hasAfter)
            when(col("before").isNotNull, array(lit("-U"), lit("+U")))
              .otherwise(array(lit("+U")))
          else if (hasAfter) array(lit("+U"))
          else array(lit("-U")))
        .when(col("op") === "d", array(lit("-D")))
        .otherwise(array().cast("array<string>")) // unknown op → no rows
    val payload = (afterFields ++ beforeFields).distinct.map { f =>
      val a = if (afterFields.contains(f)) col(s"after.`$f`") else lit(null)
      val b = if (beforeFields.contains(f)) col(s"before.`$f`") else lit(null)
      when(col("_row_kind").isin("+I", "+U"), a).otherwise(b).as(f)
    }
    parsed.withColumn("_row_kind", explode(kinds))
      .select(payload :+ col("_row_kind"): _*)
  }

  /** Canal JSON: `{"data":[{…},…],"old":[{…},…],"type":"INSERT|UPDATE|
    * DELETE"}` — `data` is an ARRAY of row objects; `old` (UPDATE only)
    * is a parallel array holding the CHANGED columns' previous values.
    * Updates with an `old` entry emit a full -U/+U pair: the before-
    * image is `data` overlaid with `old` (the reference's
    * CanalRecordParser reconstructs UPDATE_BEFORE the same way). `old`
    * is re-parsed as a MAP so an absent column (unchanged) and a
    * changed-from-NULL column stay distinguishable. */
  def canalJson(raw: DataFrame, jsonCol: String = "value"): DataFrame = {
    val parsed = inferParse(raw, jsonCol)
    if (parsed.columns.isEmpty) return emptyKinded(raw)
    require(parsed.columns.contains("type") && parsed.columns.contains("data"),
      "not a Canal batch: expected type + data fields")
    val hasOld = parsed.columns.contains("old")
    val oldArr =
      if (hasOld) from_json(to_json(col("old")),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
      else lit(null).cast("array<map<string,string>>")
    val rows = parsed
      .select(upper(col("type")).as("__t"), oldArr.as("__olds"),
        posexplode(col("data")).as(Seq("__i", "__row")))
      .withColumn("__old", element_at(col("__olds"), col("__i") + 1))
    kindedWithBefore(rows)
  }

  /** Maxwell JSON: `{"data":{…},"old":{…},"type":"insert|update|
    * delete"}` — one row object per record; `old` (update only) holds
    * the changed columns' previous values, overlaid onto `data` for
    * the -U before-image exactly like the Canal path. */
  def maxwellJson(raw: DataFrame, jsonCol: String = "value"): DataFrame = {
    val parsed = inferParse(raw, jsonCol)
    if (parsed.columns.isEmpty) return emptyKinded(raw)
    require(parsed.columns.contains("type") && parsed.columns.contains("data"),
      "not a Maxwell batch: expected type + data fields")
    val oldMap =
      if (parsed.columns.contains("old")) from_json(to_json(col("old")),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))
      else lit(null).cast("map<string,string>")
    val rows = parsed.select(upper(col("type")).as("__t"),
      col("data").as("__row"), oldMap.as("__old"))
    kindedWithBefore(rows)
  }

  /** Shared Canal/Maxwell row expansion: `__row` (after-image struct),
    * `__old` (changed-columns map or null), `__t` (upper-cased type) →
    * kinded payload rows. Updates with an old map emit -U (+overlay)
    * then +U; everything else emits its single kind. */
  private def kindedWithBefore(rows: DataFrame): DataFrame = {
    val fields = rows.schema("__row").dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fields.toSeq
      case _ => Seq.empty
    }
    val kinds =
      when(col("__t") === "INSERT", array(lit("+I")))
        .when(col("__t") === "UPDATE",
          when(col("__old").isNotNull, array(lit("-U"), lit("+U")))
            .otherwise(array(lit("+U"))))
        .when(col("__t") === "DELETE", array(lit("-D")))
        .otherwise(array().cast("array<string>"))
    val payload = fields.map { f =>
      val after = col(s"__row.`${f.name}`")
      // before-image: the old map's value wins where the KEY exists
      // (a null map value = changed FROM null); absent key = unchanged
      val before = when(map_contains_key(col("__old"), lit(f.name)),
        element_at(col("__old"), lit(f.name)).cast(f.dataType))
        .otherwise(after)
      when(col("_row_kind") === "-U", before).otherwise(after).as(f.name)
    }
    rows.withColumn("_row_kind", explode(kinds))
      .select(payload :+ col("_row_kind"): _*)
  }

  /** Zero-row, `_row_kind`-only frame for batches that infer no
    * columns (empty micro-batch, all-tombstone compacted topic): the
    * sink no-ops instead of the query dying on an envelope require. */
  private def emptyKinded(raw: DataFrame): DataFrame =
    raw.sparkSession.emptyDataFrame
      .withColumn("_row_kind", lit("+I"))

  /** One schema-inference pass over the batch's JSON, then distributed
    * from_json parsing. The raw strings are materialized ONCE
    * (localCheckpoint) so the upstream producing them — a Kafka poll,
    * a to_json projection, a file read — executes a single time per
    * change batch instead of once for inference and again for the
    * parse; blocks are scoped to the batch and reclaimed by the
    * context cleaner. Inference cost is a single scan of the (small,
    * per-epoch) change batch — never of the table. */
  private def inferParse(raw: DataFrame, jsonCol: String): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    // NOTE on parse parallelism (r18, measured and rejected): a batch
    // arriving as ONE partition parses from_json on one core (profiled
    // 1.4 s warm on a 150 K-row epoch). An order-preserving split
    // (monotonic id + repartitionByRange to the session parallelism —
    // plain repartition would reorder same-key rows and change
    // arrival-order merge tiebreaks downstream) was measured at +2
    // jobs/epoch (range sampling + the extra exchange stage): g45
    // 4.47→4.96 s, g47 4.63→5.26 s warm — the job cadence costs more
    // than the parallel parse saves at this batch size, and real
    // large-scale change batches arrive already partitioned. The
    // single-task parse stands as the honest cost of a single-file
    // batch.
    val strs = raw.select(col(jsonCol).cast("string").as("j"))
      .localCheckpoint(true)
    val schema = spark.read.json(strs.as[String]).schema
    strs.select(from_json(col("j"), schema).as("r")).select("r.*")
  }
}
