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
          if (hasBefore && hasAfter) array(lit("-U"), lit("+U"))
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

  /** Canal JSON: `{"data":[{…},…],"type":"INSERT|UPDATE|DELETE"}` —
    * `data` is an ARRAY of row objects. UPDATE rows carry the full
    * after-image in `data` (canal's `old` holds only changed columns,
    * so it cannot produce a complete before-image; none is emitted). */
  def canalJson(raw: DataFrame, jsonCol: String = "value"): DataFrame = {
    val parsed = inferParse(raw, jsonCol)
    require(parsed.columns.contains("type") && parsed.columns.contains("data"),
      "not a Canal batch: expected type + data fields")
    val rows = parsed
      .select(upper(col("type")).as("__t"), explode(col("data")).as("__row"))
    rows.select(col("__row.*"),
      when(col("__t") === "INSERT", "+I")
        .when(col("__t") === "UPDATE", "+U")
        .when(col("__t") === "DELETE", "-D")
        .as("_row_kind"))
      .filter(col("_row_kind").isNotNull)
  }

  /** Maxwell JSON: `{"data":{…},"type":"insert|update|delete"}` —
    * one row object per record. */
  def maxwellJson(raw: DataFrame, jsonCol: String = "value"): DataFrame = {
    val parsed = inferParse(raw, jsonCol)
    require(parsed.columns.contains("type") && parsed.columns.contains("data"),
      "not a Maxwell batch: expected type + data fields")
    parsed.select(col("data.*"),
      when(lower(col("type")) === "insert", "+I")
        .when(lower(col("type")) === "update", "+U")
        .when(lower(col("type")) === "delete", "-D")
        .as("_row_kind"))
      .filter(col("_row_kind").isNotNull)
  }

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
    val strs = raw.select(col(jsonCol).cast("string").as("j"))
      .localCheckpoint(true)
    val schema = spark.read.json(strs.as[String]).schema
    strs.select(from_json(col("j"), schema).as("r")).select("r.*")
  }
}
