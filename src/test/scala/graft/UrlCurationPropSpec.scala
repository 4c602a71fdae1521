package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants for URL normalization and line dedup. Seeded:
  * failures reproduce.
  *
  * normalizeUrl must be IDEMPOTENT — curation pipelines re-run over
  * already-normalized corpora (incremental top-ups, retries), and a
  * second pass that changes anything silently splits dedup groups.
  * It must also never produce null, and its output must keep the same
  * host grouping as the input (a normalization that moves a URL to a
  * different registered domain would corrupt domain caps).
  */
class UrlCurationPropSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val U = graft.operators.UrlCuration

  private def randomUrl(rnd: scala.util.Random): String = {
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
    val scheme = pick(Seq("http", "HTTP", "https", "HTTPS", "ftp"))
    val host = Seq.fill(1 + rnd.nextInt(3))(
      pick(Seq("Www", "EX", "site", "A1", "blog"))).mkString(".") +
      pick(Seq(".com", ".CO.UK", ".org", ".Net", ""))
    val port = pick(Seq("", ":80", ":443", ":8080"))
    val path = pick(Seq("", "/", "/A/b", "/x/Y/", "/p"))
    val utm = pick(Seq("utm_source=G", "utm_b=2", ""))
    val real = pick(Seq("id=3", "Q=x", ""))
    val qparts = rnd.shuffle(Seq(utm, real).filter(_.nonEmpty))
    val query = if (qparts.isEmpty) "" else "?" + qparts.mkString("&")
    val frag = pick(Seq("", "#F", "#a/b?c"))
    s"$scheme://$host$port$path$query$frag"
  }

  test("normalizeUrl is idempotent, null-free and host-stable over 2000 random URLs") {
    val rnd = new scala.util.Random(1715)
    val urls = Seq.fill(2000)(randomUrl(rnd)) ++ Seq(
      "", "nonsense", "http://", "https://h", "https://h:443",
      "http://h:80?utm_a=1", "https://h/?utm_a=1&utm_b=2",
      "HTTPS://U:p@H.COM:443/x#f")
    import spark.implicits._
    val df = urls.toDF("u")
    val once = U.normalizeUrl(col("u"))
    val out = df.select(
        col("u"), once.as("n1"), U.normalizeUrl(once).as("n2"),
        U.registeredDomain(U.hostOf(col("u"))).as("d0"),
        U.registeredDomain(U.hostOf(once)).as("d1"))
      .collect()
    out.foreach { r =>
      val (u, n1, n2) = (r.getString(0), r.getString(1), r.getString(2))
      assert(n1 != null, s"null normalization for '$u'")
      assert(n1 == n2, s"not idempotent: '$u' -> '$n1' -> '$n2'")
      assert(r.getString(3) == r.getString(4),
        s"normalization moved '$u' across domains: ${r.getString(3)} vs ${r.getString(4)}")
      assert(!n1.contains("#"), s"fragment survived: '$u' -> '$n1'")
      assert(!n1.matches(".*[?&]utm_.*"), s"utm survived: '$u' -> '$n1'")
    }
  }

  test("registeredDomainPsl: hosting platforms, multi-label registries, wildcards, exceptions, fallback") {
    import spark.implicits._
    val cases = Seq(
      // subdomain-hosting platforms: each user site is its own domain
      ("myproj.github.io", "myproj.github.io"),
      ("deep.sub.myproj.github.io", "myproj.github.io"),
      ("github.io", "github.io"), // the suffix itself: stable self-group
      ("someblog.blogspot.com", "someblog.blogspot.com"),
      ("app-7.herokuapp.com", "app-7.herokuapp.com"),
      // multi-label ccTLD registries the 2-letter heuristic misses
      ("foo.ne.jp", "foo.ne.jp"),
      ("www.foo.ne.jp", "foo.ne.jp"),
      ("example.co.jp", "example.co.jp"),
      ("service.gov.uk", "service.gov.uk"),
      ("www.service.gov.uk", "service.gov.uk"),
      ("shop.example.com.au", "example.com.au"),
      // wildcard *.ck: every label under ck is a public suffix...
      ("foo.bar.ck", "foo.bar.ck"),
      ("a.foo.bar.ck", "foo.bar.ck"),
      // ...EXCEPT the !www.ck exception, registrable itself
      ("www.ck", "www.ck"),
      ("sub.www.ck", "www.ck"),
      // no PSL rule: heuristic fallback unchanged
      ("example.com", "example.com"),
      ("a.b.example.com", "example.com"),
      ("example.co.uz", "example.co.uz"), // two-part heuristic
      ("localhost", "localhost"),
      ("", ""))
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), U.registeredDomainPsl(col("host")).as("dom"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"host=$h got=${got(h)} want=$want")
    }
    // extraRules extend the snapshot with the same syntax
    val withExtra = Seq("a.b.example.com").toDF("host")
      .select(U.registeredDomainPsl(col("host"), Seq("example.com")))
      .as[String].head()
    assert(withExtra == "b.example.com")
  }

  test("registeredDomainPsl strips the FQDN trailing dot (public API over raw host columns)") {
    import spark.implicits._
    val cases = Seq(
      ("foo.com.", "foo.com"),
      ("example.co.uk.", "example.co.uk"),
      ("myproj.github.io.", "myproj.github.io"),
      (".", ""))
    val got = cases.map(_._1).toDF("host")
      .select(col("host"), U.registeredDomainPsl(col("host")).as("dom"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"host='$h' got=${got(h)} want=$want")
    }
  }

  test("loadPsl: the full bundled publicsuffix.org list parses and matches") {
    import spark.implicits._
    val full = U.loadPsl()
    assert(full.size >= 9000, s"full PSL too small: ${full.size} rules")
    assert(full.forall(r => r.nonEmpty && !r.startsWith("//")),
      "comments/blanks leaked into the rule table")
    // the machinery rows the snapshot exercises all exist in the real
    // list too — same syntax, so the matcher needs no special cases
    Seq("co.uk", "github.io", "*.ck", "!www.ck", "*.kobe.jp",
      "!city.kobe.jp", "myshopify.com", "netlify.app", "pages.dev")
      .foreach(r => assert(full.contains(r), s"expected rule missing: $r"))

    // rules the SNAPSHOT does not know but the full list does: the
    // exact gap the bundled list closes (silently-wrong fallbacks)
    val fullOnly = Seq(
      ("shop-7.myshopify.com", "shop-7.myshopify.com"),
      ("deep.shop-7.myshopify.com", "shop-7.myshopify.com"),
      // *.kobe.jp wildcard with its !city exception
      ("a.b.kobe.jp", "a.b.kobe.jp"),
      ("x.a.b.kobe.jp", "a.b.kobe.jp"),
      ("city.kobe.jp", "city.kobe.jp"),
      ("www.city.kobe.jp", "city.kobe.jp"))
    val gotFull = fullOnly.map(_._1).toDF("host")
      .select(col("host"),
        U.registeredDomainPsl(col("host"), rules = U.loadPsl()).as("dom"))
      .as[(String, String)].collect().toMap
    fullOnly.foreach { case (h, want) =>
      assert(gotFull(h) == want, s"host=$h got=${gotFull(h)} want=$want")
    }
    // snapshot-only matching would get myshopify.com WRONG (platform
    // collapse) — proving the full list changes the answer where it must
    val snap = Seq("shop-7.myshopify.com").toDF("host")
      .select(U.registeredDomainPsl(col("host"))).as[String].head()
    assert(snap == "myshopify.com")
  }

  test("full-PSL parity: 20 randomly sampled real rules group hosts as the PSL algorithm says") {
    import spark.implicits._
    val full = U.loadPsl()
    val wild = full.filter(_.startsWith("*.")).map(_.stripPrefix("*.")).toSet
    val except = full.filter(_.startsWith("!")).map(_.stripPrefix("!")).toSet
    // sample PLAIN rules whose suffix isn't also wildcarded (a `*.R`
    // row would make the probe label itself a public suffix) and that
    // are pure ASCII (hosts must be in the list's own form to match —
    // the documented punycode/unicode contract)
    val plain = full.filter(r => !r.startsWith("*") && !r.startsWith("!") &&
      !wild.contains(r) && !except.contains(r) && r.forall(_ < 128))
    val rnd = new scala.util.Random(9506)
    val sampled = rnd.shuffle(plain).take(14) ++ Seq(
      // always include private-section platforms + deep registries
      "myshopify.com", "netlify.app", "pages.dev", "web.app",
      "blogspot.co.uk", "github.io")
    val cases = sampled.flatMap { r =>
      Seq((s"graft-probe.$r", s"graft-probe.$r"),
        (s"deep.sub.graft-probe.$r", s"graft-probe.$r"))
    }
    val got = cases.map(_._1).toDF("host")
      .select(col("host"),
        U.registeredDomainPsl(col("host"), rules = U.loadPsl()).as("dom"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"host=$h got=${got(h)} want=$want")
    }
  }

  test("capPerDomain(psl=true) caps per hosted SITE, not per platform suffix") {
    import spark.implicits._
    // 6 sites on github.io with 4 pages each; platform-level grouping
    // would keep only `cap` pages TOTAL, PSL keeps `cap` per site
    val rows = for {
      site <- 0 until 6; page <- 0 until 4
    } yield (site.toLong * 100 + page, s"https://site$site.github.io/p$page")
    val df = rows.toDF("id", "url")
    val psl = U.capPerDomain(df, "url", "id", cap = 2L, psl = true)
    val counts = psl.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(counts.size == 6 && counts.values.forall(_ == 2L),
      s"per-site caps wrong: $counts")
    val heuristic = U.capPerDomain(df, "url", "id", cap = 2L)
    assert(heuristic.count() == 2L) // platform collapses to one domain
  }

  test("removeFrequentLinesHashed is exactly removeFrequentLines over random corpora") {
    import spark.implicits._
    val TA = graft.operators.TextAnalysis
    val rnd = new scala.util.Random(2716)
    (0 until 6).foreach { trial =>
      // small line alphabet → heavy cross-doc repetition, empty lines,
      // docs made entirely of boilerplate
      val lineOf = Vector("COOKIE BANNER", "nav home", "unique %d",
        "footer (c)", "", "body text %d", "subscribe now")
      val docs = (0 until 40).map { i =>
        val n = 1 + rnd.nextInt(8)
        val text = (0 until n).map { _ =>
          lineOf(rnd.nextInt(lineOf.size)).replace("%d", rnd.nextInt(30).toString)
        }.mkString("\n")
        (i.toLong, text)
      }.toDF("doc_id", "text")
      val cap = 1L + rnd.nextInt(6)
      val exact = TA.removeFrequentLines(docs, "doc_id", "text", cap)
        .as[(Long, String)].collect().toMap
      val hashed = TA.removeFrequentLinesHashed(docs, "doc_id", "text", cap)
        .as[(Long, String)].collect().toMap
      assert(hashed == exact, s"trial=$trial cap=$cap")
    }
  }

  test("removeFrequentLines conserves non-boilerplate lines over random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(2024)
    val vocab = (0 until 30).map(i => s"line$i")
    val docs = (0L until 200L).map { id =>
      val n = 1 + rnd.nextInt(6)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString("\n")
    }
    val df = docs.toDF("id", "text")
    val maxDf = 20L
    val out = graft.operators.TextAnalysis
      .removeFrequentLines(df, "id", "text", maxDf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // ground truth: per-line distinct-doc counts
    val docFreq = docs.flatMap { case (id, t) => t.split("\n").distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    docs.foreach { case (id, t) =>
      val kept = t.split("\n").filter(l => docFreq(l) <= maxDf)
      if (kept.isEmpty)
        assert(!out.contains(id), s"all-boilerplate doc $id must drop")
      else
        assert(out(id) == kept.mkString("\n"),
          s"doc $id: ${out.get(id)} vs ${kept.toSeq}")
    }
  }
}
