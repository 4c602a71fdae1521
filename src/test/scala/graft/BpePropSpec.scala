package graft

import graft.operators.{Bpe, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants for the tokenizer-training and DSIR
  * operators, checked against an INDEPENDENT single-threaded reference
  * trainer (not the operator's own code path). Seeded: failures
  * reproduce. Alphabet {a,b,c} with short words maximizes merge/tie/
  * overlap collisions — the regimes where greedy/argmax definitions
  * actually bite. */
class BpePropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus(rnd: scala.util.Random): List[String] =
    List.fill(1 + rnd.nextInt(8)) {
      List.fill(1 + rnd.nextInt(10)) {
        List.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(3)).toChar).mkString
      }.mkString(" ")
    }

  /** Reference single-threaded BPE trainer: overlap pair counts over
    * the word-frequency table, (count desc, left, right) argmax, greedy
    * left-to-right application. */
  private def refBpe(docs: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] = docs
      .flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var stop = false
    while (r <= rounds && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.indices.dropRight(1).foreach { i =>
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, rr), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((r, l, rr, c))
        words = words.groupBy { case (syms, _) => greedy(syms, l, rr) }
          .map { case (k, g) => k -> g.values.sum }
        r += 1
      }
    }
    out.result()
  }

  private def greedy(syms: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { b += (l + r); i += 2 }
      else { b += syms(i); i += 1 }
    }
    b.result()
  }

  test("learnMerges matches the reference trainer on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    (0 until 15).foreach { _ =>
      val docs = corpus(rnd)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = Bpe.learnMerges(df, "text", numMerges = 4)
        .as[(Int, String, String, Long)].collect().toSeq
      assert(got == refBpe(docs, 4), s"corpus=$docs")
    }
  }

  test("learnMergesBatched is EXACTLY the sequential merge list, at every batch width") {
    import spark.implicits._
    val rnd = new scala.util.Random(16160816L)
    (0 until 12).foreach { trial =>
      val docs = corpus(rnd)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val expected = refBpe(docs, 8)
      // width 1 degenerates to sequential; width 3 exercises the budget
      // bound; width 64 the conflict/collision/horizon bounds — the
      // {a,b,c} alphabet makes concat collisions ("ab" already a
      // symbol) and shared-symbol conflicts the COMMON case
      Seq(1, 3, 64).foreach { width =>
        val got = Bpe.learnMergesBatched(df, "text", numMerges = 8, maxBatch = width)
          .as[(Int, String, String, Long)].collect().toSeq
        assert(got == expected, s"trial=$trial width=$width corpus=$docs")
      }
    }
  }

  test("learnMergesLocal / learnMergesAuto return the exact sequential list") {
    import spark.implicits._
    val rnd = new scala.util.Random(99L)
    (0 until 10).foreach { trial =>
      val docs = corpus(rnd)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val expected = refBpe(docs, 10)
      val local = Bpe.learnMergesLocal(df, "text", numMerges = 10)
        .as[(Int, String, String, Long)].collect().toSeq
      assert(local == expected, s"trial=$trial corpus=$docs")
      // auto routes to the local trainer here (tiny vocab) and to the
      // distributed batched rounds under a forced 0-vocab ceiling —
      // both must return the same exact list
      val auto = Bpe.learnMergesAuto(df, "text", numMerges = 10)
        .as[(Int, String, String, Long)].collect().toSeq
      assert(auto == expected)
      val forcedDistributed = Bpe.learnMergesAuto(df, "text", numMerges = 10,
        maxLocalVocab = 0L).as[(Int, String, String, Long)].collect().toSeq
      assert(forcedDistributed == expected)
    }
  }

  test("auto routes long-word corpora to the batched rounds despite a small vocab") {
    import spark.implicits._
    // 40 distinct words of ~400 chars each: vocab far under any
    // realistic cap, but the summed symbol count — what the driver
    // trainer's memory actually scales with — blows a 4000-symbol
    // ceiling. The routing predicate must refuse the local path, and
    // the batched path it falls to must still return the exact list.
    val rnd = new scala.util.Random(41L)
    val docs = (0 until 40).map { _ =>
      List.fill(400)(('a' + rnd.nextInt(3)).toChar).mkString
    }.toList
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val stats = Bpe.wordFreq(df, "text")
      .agg(count(lit(1)), sum(length(col("word")))).head()
    val (vocab, syms) = (stats.getLong(0), stats.getLong(1))
    assert(vocab <= 40L && syms >= 15000L, s"vocab=$vocab syms=$syms")
    assert(Bpe.routeLocal(vocab, syms, 8000000L, 16000000L),
      "defaults keep this corpus local (it easily fits)")
    assert(!Bpe.routeLocal(vocab, syms, 8000000L, 4000L),
      "a 4000-symbol ceiling must refuse the local path on long words")
    val expected = refBpe(docs, 6)
    val viaBatched = Bpe.learnMergesAuto(df, "text", numMerges = 6,
      maxLocalSymbols = 4000L).as[(Int, String, String, Long)].collect().toSeq
    assert(viaBatched == expected)
    val viaLocal = Bpe.learnMergesAuto(df, "text", numMerges = 6)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(viaLocal == expected)
  }

  test("batched trainer consumes a precomputed word-frequency table (no corpus re-pass)") {
    import spark.implicits._
    val rnd = new scala.util.Random(163L)
    val docs = corpus(rnd)
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val wf = Bpe.wordFreq(df, "text")
    // the corpus handed over is EMPTY — if the batched rounds secretly
    // re-derived wordFreq from it, they would learn nothing
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val got = Bpe.learnMergesBatchedCounted(empty, "text", numMerges = 6,
      maxBatch = 8, precomputedWordFreq = Some(wf))._1
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == refBpe(docs, 6), s"corpus=$docs")
  }

  test("local trainer scales merge count without per-merge Spark jobs") {
    import spark.implicits._
    // a natural-ish corpus with shared subwords: 256 merges must come
    // out of ONE wordFreq job + driver compute, and match the
    // sequential distributed trainer wherever both terminate
    val rnd = new scala.util.Random(7L)
    val stems = Vector("stat", "graph", "chart", "table", "index", "merge",
      "shard", "query", "token", "batch")
    val sufs = Vector("", "s", "ing", "ed", "er", "ion", "ions", "able")
    val docs = List.fill(300)(
      List.fill(20)(stems(rnd.nextInt(stems.size)) + sufs(rnd.nextInt(sufs.size)))
        .mkString(" "))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val local = Bpe.learnMergesLocal(df, "text", numMerges = 256)
      .as[(Int, String, String, Long)].collect().toSeq
    // sanity vs the independent reference trainer at the same depth
    assert(local == refBpe(docs, 256))
    assert(local.size > 50, s"corpus too shallow: ${local.size} merges")
  }

  test("encode conserves content and respects word boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    (0 until 10).foreach { _ =>
      val docs = corpus(rnd)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val merges = refBpe(docs, 3).map(m => (m._2, m._3))
      val enc = Bpe.encode(df, "text", merges)
        .select(col("text"), col("bpe_tokens"))
        .as[(String, Seq[String])].collect()
      enc.foreach { case (text, toks) =>
        val words = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        assert(toks.mkString == words.mkString, s"content lost: $text -> $toks")
        // tokens never span a word boundary: re-segmenting the token
        // stream by word lengths is exact
        var rest = toks.toList
        words.foreach { w =>
          var acc = ""
          while (acc.length < w.length) { acc += rest.head; rest = rest.tail }
          assert(acc == w, s"token spans boundary: $w vs $acc")
        }
        assert(rest.isEmpty)
      }
    }
  }

  test("DSIR score additivity over disjoint token sets and empty-text zero") {
    import spark.implicits._
    // The probe docs' token sets are disjoint by construction:
    // score(doc AB) = score(doc A) + score(doc B) because weights are
    // per-token and scores are exact integer sums over distinct tokens.
    val raw = Seq(
      (0L, "alpha beta"), (1L, "gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, ""), (4L, "alpha gamma"), (5L, "beta delta epsilon")
    ).toDF("id", "text")
    val target = raw.filter(col("id") < 2)
    val w = Sampling.importanceWeights(raw, target, "text")
    val scores = Sampling.importanceScores(raw, "id", "text", w)
      .as[(Long, Long)].collect().toMap
    assert(scores(2L) == scores(0L) + scores(1L),
      s"additivity: ${scores(2L)} != ${scores(0L)} + ${scores(1L)}")
    assert(scores(3L) == 0L, s"empty text must score 0, got ${scores(3L)}")
  }
}
