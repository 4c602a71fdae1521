package graft

import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Global full-text inverted index (reference capability:
  * paimon-lucene / globalindex text search, rebuilt Spark-first as a
  * token→file posting table). The index only PRUNES files — the row
  * filter decides membership — so every test first checks result
  * identity against a plain filter, then that pruning actually
  * happened / stayed fail-open. */
class TextIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-text").toString + "/t"

  private val sch = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private def df(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, sch)

  private def plainMatch(t: GraftTable, word: String): Set[Long] =
    t.read.filter(array_contains(
      split(coalesce(col("text"), lit("")), GraftTable.TextTokenSplit), word))
      .select("id").collect().map(_.getLong(0)).toSet

  test("append table: search equals plain filter and prunes token-free files") {
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(df((1L, "spark shuffles data"), (2L, "rows and files")).coalesce(1))
    t.write(df((3L, "more data here"), (4L, "nothing relevant")).coalesce(1))
    t.write(df((5L, "unrelated words only")).coalesce(1))
    t.rebuildTextIndex("text")
    val got = t.searchText("text", "data").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
    assert(got == plainMatch(t, "data"))
    // pruning: only the two files containing "data" are candidates
    assert(t.textCandidates("text", "data").size == 2)
    assert(t.textCandidates("text", "unrelated").size == 1)
    // a token nowhere in the corpus prunes everything
    assert(t.textCandidates("text", "zzzmissing").isEmpty)
    // nulls tokenize to nothing and never match
    t.write(df((6L, null)).coalesce(1))
    assert(!t.searchText("text", "data").collect().map(_.getLong(0)).contains(6L))
  }

  test("fail-open: files committed after the rebuild are always scanned") {
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(df((1L, "alpha beta")).coalesce(1))
    t.rebuildTextIndex("text")
    t.write(df((2L, "beta gamma")).coalesce(1)) // NOT covered by the index
    val got = t.searchText("text", "beta").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
    // the uncovered file stays a candidate even for a token the index
    // has never seen
    assert(t.textCandidates("text", "gamma").size == 1)
    // rebuild covers it; a token-free probe prunes both again
    t.rebuildTextIndex("text")
    assert(t.textCandidates("text", "zzzmissing").isEmpty)
  }

  test("PK table: pruning widens to merge units so upserts stay correct") {
    val t = GraftTable.create(spark, tmp(), sch,
      primaryKeys = Seq("id"), options = Map("bucket" -> "2"))
    t.write(df((1L, "old version with needle"), (2L, "stable needle row")))
    t.write(df((1L, "new version without it"))) // newer file lacks the token
    t.rebuildTextIndex("text")
    // id=1's latest version does NOT contain "needle": a naive per-file
    // prune would drop the newer file and resurrect the old version
    val got = t.searchText("text", "needle").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L))
    assert(got == plainMatch(t, "needle"))
  }

  test("AND search: intersection pruning in one postings job") {
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(df((1L, "alpha beta gamma"), (2L, "alpha only here")).coalesce(1))
    t.write(df((3L, "beta gamma delta"), (4L, "alpha beta")).coalesce(1))
    t.rebuildTextIndex("text")
    val got = t.searchTextAll("text", Seq("alpha", "beta")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
    // both files hold alpha∧beta rows here; a pair crossing files prunes
    assert(t.textCandidatesAll("text", Seq("alpha", "delta")).size == 1)
    assert(t.textCandidatesAll("text", Seq("alpha", "zzz")).isEmpty)
    // duplicate words count once
    assert(t.searchTextAll("text", Seq("alpha", "alpha")).count() == 3)
    // fail-open for uncovered appends
    t.write(df((5L, "alpha beta late")).coalesce(1))
    assert(t.searchTextAll("text", Seq("alpha", "beta")).select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 4L, 5L))
  }

  test("prefix search: range-scan pruning, same fail-open semantics") {
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(df((1L, "sparkly things"), (2L, "sparse rows")).coalesce(1))
    t.write(df((3L, "spanner data"), (4L, "unrelated")).coalesce(1))
    t.rebuildTextIndex("text")
    val got = t.searchTextPrefix("text", "spar").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
    // both spar* tokens live in file 1 → file 2 pruned
    assert(t.textCandidates("text", "spar", prefixMatch = true).size == 1)
    assert(t.textCandidates("text", "span", prefixMatch = true).size == 1)
    assert(t.textCandidates("text", "zz", prefixMatch = true).isEmpty)
    // uncovered late append stays fail-open
    t.write(df((5L, "sparta lives")).coalesce(1))
    assert(t.searchTextPrefix("text", "spar").select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 5L))
  }

  test("OR search: union pruning; phrase search verifies adjacency") {
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(df((1L, "alpha beta gamma"), (2L, "alpha only here")).coalesce(1))
    t.write(df((3L, "beta gamma delta"), (4L, "quiet words")).coalesce(1))
    t.write(df((5L, "delta epsilon")).coalesce(1))
    t.rebuildTextIndex("text")
    // OR: union of per-token candidate sets
    assert(t.searchTextAny("text", Seq("alpha", "delta")).select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 5L))
    // pruning: file 2 (quiet/words only... file layout: file2 holds
    // ids 3,4) — 'epsilon' lives only in file 3
    assert(t.textCandidatesAny("text", Seq("epsilon")).size == 1)
    assert(t.textCandidatesAny("text", Seq("zzz", "yyy")).isEmpty)
    // phrase: adjacency required — "alpha beta" matches id 1 only
    // (id 4's file holds neither word and is pruned; id 2 has alpha
    // without beta; id 3 has beta not preceded by alpha)
    assert(t.searchTextPhrase("text", Seq("alpha", "beta")).select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    // non-adjacent words: both present, phrase absent
    assert(t.searchTextPhrase("text", Seq("alpha", "gamma")).count() == 0)
    // phrase at string start and end anchors correctly
    assert(t.searchTextPhrase("text", Seq("delta", "epsilon")).select("id")
      .collect().map(_.getLong(0)).toSet == Set(5L))
    // fail-open composes: uncovered append is scanned for OR and phrase
    t.write(df((6L, "alpha beta late")).coalesce(1))
    assert(t.searchTextAny("text", Seq("alpha")).count() == 3)
    assert(t.searchTextPhrase("text", Seq("alpha", "beta")).select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 6L))
  }

  test("non-ASCII 'tokens' are rejected up front, not silently index-pruned") {
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(df((1L, "cafe hash is great")).coalesce(1))
    t.rebuildTextIndex("text")
    // 'é'.isLetterOrDigit is true, but the ASCII tokenizer splits on
    // it — such a word can never appear in the postings, so accepting
    // it would make results depend on index coverage (covered file
    // pruned vs uncovered file scanned). All entry points must reject.
    intercept[IllegalArgumentException](t.searchText("text", "café"))
    intercept[IllegalArgumentException](t.searchTextAll("text", Seq("café", "hash")))
    intercept[IllegalArgumentException](t.searchTextAny("text", Seq("café")))
    intercept[IllegalArgumentException](t.searchTextPhrase("text", Seq("café", "hash")))
    intercept[IllegalArgumentException](t.searchTextPrefix("text", "café"))
  }

  test("incremental update: only new files are tokenized; coverage stays exact") {
    val t = GraftTable.create(spark, tmp(), sch)
    t.write(df((1L, "alpha beta"), (2L, "beta gamma")).coalesce(1))
    t.rebuildTextIndex("text")
    t.write(df((3L, "delta alone")).coalesce(1))
    t.write(df((4L, "epsilon here")).coalesce(1))
    // before the update: the two uncovered files are ALWAYS candidates
    assert(t.textCandidates("text", "zzzmissing").size == 2)

    t.updateTextIndex("text")
    // after: coverage is complete again — a nowhere-token prunes ALL
    assert(t.textCandidates("text", "zzzmissing").isEmpty)
    // new files' tokens prune to exactly their file
    assert(t.textCandidates("text", "delta").size == 1)
    assert(t.textCandidates("text", "epsilon").size == 1)
    // results identical to the plain filter across old + new coverage
    assert(t.searchText("text", "beta").select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(t.searchText("text", "delta").select("id")
      .collect().map(_.getLong(0)).toSet == Set(3L))
    // O(increment): the original postings generation was NOT rewritten —
    // the update added a second generation beside it
    val st = graft.core.Json.read(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"${t.path}/index-text/text/state.json")), "UTF-8"),
      classOf[GraftTable.TextIndexState])
    assert(st.postings.size == 2, st.postings.toString)
    // idempotent when nothing is new
    t.updateTextIndex("text")
    assert(t.searchText("text", "epsilon").count() == 1)
    // a later full rebuild folds generations back to one and sweeps
    t.rebuildTextIndex("text")
    val st2 = graft.core.Json.read(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"${t.path}/index-text/text/state.json")), "UTF-8"),
      classOf[GraftTable.TextIndexState])
    assert(st2.postings.size == 1, st2.postings.toString)
    assert(t.searchText("text", "beta").count() == 2)
  }

  test("probe cap: an over-cap token fails open with identical results") {
    // cap = 2 files: 'common' lives in 3 files → over cap → fail open
    val t = GraftTable.create(spark, tmp(), sch,
      options = Map("text-index.max-probe-hits" -> "2"))
    t.write(df((1L, "common alpha"), (2L, "other")).coalesce(1))
    t.write(df((3L, "common beta")).coalesce(1))
    t.write(df((4L, "common gamma")).coalesce(1))
    t.rebuildTextIndex("text")
    // over-cap probe keeps every covered candidate (no wrong pruning)
    assert(t.textCandidates("text", "common").size == 3)
    // results identical to the plain filter — fail open, never wrong
    assert(t.searchText("text", "common").select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
    assert(plainMatch(t, "common") == Set(1L, 3L, 4L))
    // an under-cap probe still prunes sharply
    assert(t.textCandidates("text", "beta").size == 1)
    assert(t.searchText("text", "beta").select("id")
      .collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("SQL surface: CALL sys.rebuild_text_index") {
    val wh = Files.createTempDirectory("graft-text-wh").toString
    spark.conf.set("spark.sql.catalog.graft_txt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_txt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_txt.db")
    spark.sql("CREATE TABLE graft_txt.db.t (id BIGINT, text STRING)")
    spark.sql("INSERT INTO graft_txt.db.t VALUES (1, 'hello world'), (2, 'bye')")
    val res = spark.sql("CALL graft_txt.sys.rebuild_text_index('db.t', 'text')")
      .head.getString(0)
    assert(res.contains("text index"), res)
    val t = GraftTable.load(spark, s"$wh/db/t")
    assert(t.searchText("text", "hello").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
