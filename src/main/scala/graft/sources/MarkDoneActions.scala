package graft.sources

import graft.table.GraftTable
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

/** Partition mark-done actions (reference: paimon-core
  * partition/actions/PartitionMarkDoneAction.java:44 and its factory —
  * `partition.mark-done-action`, a comma list of):
  *
  *  - `success-file` (default): `_SUCCESS` marker in the partition dir
  *  - `done-partition`: register `<last-value>.done` with the HMS the
  *    table syncs to (AddDonePartitionAction)
  *  - `mark-event`: fire the metastore LOAD_DONE partition event
  *    (MarkPartitionDoneEventAction)
  *  - `http-report`: POST {params, table, location, partition} to
  *    `partition.mark-done-action.http.url`; the JSON response's
  *    `result` must be SUCCESS (HttpReportMarkDoneAction)
  *  - `custom`: instantiate `partition.mark-done-action.custom.class`
  *    — a class implementing [[MarkDoneActions.Action]] with a no-arg
  *    or (GraftTable) constructor
  *
  * Shared by `CALL sys.mark_partition_done` and the idle-partition
  * auto-marker, so every done signal fires the same action set.
  */
object MarkDoneActions {

  val OptionKey = "partition.mark-done-action"

  /** Custom-action contract: `partition` is the path form
    * (`k=v/k2=v2`, Hive-escaped) relative to the table's data dir. */
  trait Action {
    def markDone(table: GraftTable, partition: String): Unit
  }

  def actionsOf(t: GraftTable): Seq[String] =
    t.schema.options.get(OptionKey)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("success-file"))

  /** Fire every configured action for one partition given in path form
    * (`k=v/k2=v2`). Unknown actions fail loudly — a typo must not
    * silently skip the downstream signal. */
  def fire(t: GraftTable, partition: String): Unit =
    actionsOf(t).foreach(fireOne(t, partition, _))

  /** Everything EXCEPT success-file — for callers that manage the
    * `_SUCCESS` marker themselves (the idle auto-marker deletes and
    * re-creates it as partitions flip active/idle). */
  def fireNonFile(t: GraftTable, partition: String): Unit =
    actionsOf(t).filterNot(_ == "success-file").foreach(fireOne(t, partition, _))

  private def fireOne(t: GraftTable, partition: String, action: String): Unit =
    action match {
      case "success-file" =>
        val dataRoot = java.nio.file.Paths.get(s"${t.path}/data").normalize()
        val dir = java.nio.file.Paths.get(s"${t.path}/data/$partition").normalize()
        require(dir.startsWith(dataRoot) && dir != dataRoot,
          s"partition '$partition' resolves outside the table's data directory")
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve("_SUCCESS"), Array.empty[Byte])
      case "done-partition" =>
        HmsBridge.addDonePartition(t, specOf(t, partition).map(_._2))
      case "mark-event" =>
        HmsBridge.markPartitionDoneEvent(t, specOf(t, partition).toMap)
      case "http-report" => httpReport(t, partition)
      case "custom" =>
        val cls = t.schema.options.getOrElse(s"$OptionKey.custom.class",
          throw new IllegalArgumentException(
            s"$OptionKey=custom needs $OptionKey.custom.class"))
        val c = Class.forName(cls)
        val ctors = c.getConstructors
        val instance = ctors.collectFirst {
          case k if k.getParameterCount == 1 &&
            k.getParameterTypes()(0).isAssignableFrom(classOf[GraftTable]) =>
            k.newInstance(t)
        }.orElse(ctors.collectFirst {
          case k if k.getParameterCount == 0 => k.newInstance()
        }).getOrElse(throw new IllegalArgumentException(
          s"$cls needs a no-arg or (GraftTable) constructor"))
        instance.asInstanceOf[Action].markDone(t, partition)
      case other => throw new IllegalArgumentException(
        s"unknown $OptionKey '$other' " +
          "(success-file | done-partition | mark-event | http-report | custom)")
    }

  /** `k=v/k2=v2` → ordered (key, unescaped value) pairs, validated
    * against the table's partition keys. */
  private def specOf(t: GraftTable, partition: String): Seq[(String, String)] = {
    val keys = t.schema.partitionKeys
    val parts = partition.split("/").filter(_.nonEmpty).toSeq.map { seg =>
      seg.split("=", 2) match {
        case Array(k, v) => k -> ExternalCatalogUtils.unescapePathName(v)
        case _ => throw new IllegalArgumentException(
          s"partition segment '$seg' is not k=v")
      }
    }
    require(parts.map(_._1) == keys,
      s"partition '$partition' must bind the partition keys ${keys.mkString("/")} in order")
    parts
  }

  private def httpReport(t: GraftTable, partition: String): Unit = {
    val url = t.schema.options.getOrElse(s"$OptionKey.http.url",
      throw new IllegalArgumentException(
        s"$OptionKey=http-report needs $OptionKey.http.url"))
    val params = t.schema.options.getOrElse(s"$OptionKey.http.params", "")
    val body = graft.core.Json.write(Map(
      "params" -> params,
      "table" -> t.path.split('/').takeRight(2).mkString("."),
      "location" -> t.path,
      "partition" -> partition))
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(url))
      .header("Content-Type", "application/json")
      .timeout(java.time.Duration.ofSeconds(30))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = java.net.http.HttpClient.newHttpClient()
      .send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    val result = try graft.core.Json
      .read(resp.body(), classOf[Map[String, Any]])
      .get("result").map(String.valueOf(_)).getOrElse("")
    catch { case _: Exception => "" }
    require(resp.statusCode() < 400 && result.equalsIgnoreCase("SUCCESS"),
      s"http-report mark-done rejected (${resp.statusCode()}): ${resp.body()}")
  }
}
