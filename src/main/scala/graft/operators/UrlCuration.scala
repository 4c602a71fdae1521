package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level curation for web-corpus pipelines: normalization,
  * host/registered-domain extraction, and per-domain frequency caps
  * (domain balancing). The core rules are pure codegen'd Column
  * expressions re-expressible in plain SQL, so an independent engine
  * verifies the selection byte-for-byte (the p27 oracle does); the
  * opt-in PSL-backed domain extraction is the one documented UDF
  * (longest-suffix matching over a rule table).
  *
  * At 100 TB the shapes matter: normalization and domain extraction
  * are per-row expressions (zero shuffles); the per-domain cap reuses
  * [[Sampling.mixSources]]' salted two-level exact rank, so a domain
  * with billions of pages never funnels through one sort task.
  */
object UrlCuration {

  /** Canonical form of a URL for dedup/grouping:
    *  - scheme and authority lowercased (path/query case preserved)
    *  - default ports stripped (`https://h:443` → `https://h`,
    *    `http://h:80` → `http://h`)
    *  - fragment dropped
    *  - `utm_*` tracking parameters removed (separators repaired)
    *  - trailing `?`/`&` and trailing path slash stripped
    *
    * Strings without a `scheme://authority` prefix pass through the
    * fragment/query rules unchanged otherwise — garbage in, stable
    * garbage out, never null. */
  def normalizeUrl(u: Column): Column = {
    // lowercase ONLY the scheme://authority prefix; lengths are equal
    // so the remainder splits off positionally
    val prefix = regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(prefix), substring(u, length(prefix) + 1, lit(1 << 24)))
    // no lookahead: the separator is captured and re-emitted, keeping
    // the rule expressible in RE2 engines (the DuckDB oracle mirrors it)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?#]+):443([/?#]|$)", "$1$2"),
      "^(http://[^/:?#]+):80([/?#]|$)", "$1$2")
    val noFrag = regexp_replace(noPort, "#.*$", "")
    // utm params: non-leading ones drop with their '&'; a leading one
    // followed by another param promotes that param to '?'; a
    // leading-and-only one drops with its '?'
    val utm1 = regexp_replace(noFrag, "&utm_[^&]*", "")
    val utm2 = regexp_replace(utm1, "\\?utm_[^&]*&", "?")
    val utm3 = regexp_replace(utm2, "\\?utm_[^&]*$", "")
    val noTrail = regexp_replace(utm3, "[?&]$", "")
    regexp_replace(noTrail, "([^/])/$", "$1")
  }

  /** Lowercased host (authority minus port/userinfo); null-safe empty
    * string for non-URLs. */
  def hostOf(u: Column): Column =
    lower(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Second-level labels that act as public suffixes with a 2-letter
    * ccTLD (`example.co.uk` → registered domain `example.co.uk`).
    * A pragmatic subset — the curation cap only needs grouping to be
    * stable and roughly eTLD+1, not a full public-suffix list. */
  val TwoPartTlds: Seq[String] = Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** eTLD+1 approximation of a (lowercased) host: the last two labels,
    * or the last three when the middle one is a [[TwoPartTlds]] label
    * under a 2-letter ccTLD. */
  def registeredDomain(host: Column): Column = {
    val a = split(host, "\\.")
    val n = size(a)
    val last = element_at(a, -1)
    val second = element_at(a, -2)
    when(n >= 3 && second.isin(TwoPartTlds: _*) && length(last) === 2,
      concat_ws(".", slice(a, n - 2, lit(3))))
      .otherwise(when(n >= 2, concat_ws(".", slice(a, n - 1, lit(2))))
        .otherwise(host))
  }

  /** Static snapshot of the suffixes a web-curation corpus hits
    * constantly, from the PUBLIC publicsuffix.org list (Mozilla-
    * maintained, MPL): the subdomain-hosting platforms whose users are
    * distinct sites (capping `github.io` as ONE domain would starve
    * every project page behind the few hottest) plus the multi-label
    * ccTLD registries the 2-letter heuristic cannot know (`ne.jp`,
    * `com.au`), and the `*.ck`/`!www.ck` pair so the wildcard/exception
    * machinery is exercised, not just stubbed. A snapshot, not the
    * full list — pass `extraRules` (same PSL syntax) to extend. */
  val PublicSuffixSnapshot: Seq[String] = Seq(
    // subdomain-hosting platforms (PSL private section)
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "blogspot.co.uk", "blogspot.com.au", "blogspot.de", "blogspot.fr",
    "blogspot.in", "blogspot.jp", "wordpress.com", "tumblr.com",
    "netlify.app", "herokuapp.com", "vercel.app", "pages.dev", "web.app",
    "firebaseapp.com", "appspot.com", "azurewebsites.net",
    "cloudfront.net", "s3.amazonaws.com", "readthedocs.io",
    "neocities.org", "weebly.com", "wixsite.com", "fastly-edge.com",
    // multi-label ccTLD registries (PSL ICANN section)
    "co.uk", "org.uk", "net.uk", "gov.uk", "ac.uk", "ltd.uk", "plc.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in", "res.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "org.sg", "net.sg", "edu.sg", "gov.sg", "per.sg",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "com.tr", "org.tr", "net.tr", "gov.tr", "edu.tr", "web.tr",
    "co.il", "org.il", "net.il", "gov.il", "ac.il", "muni.il",
    "com.my", "org.my", "net.my", "gov.my", "edu.my",
    "co.id", "or.id", "web.id", "go.id", "ac.id", "sch.id",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    "co.th", "or.th", "go.th", "ac.th", "in.th",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk",
    "com.eg", "org.eg", "net.eg", "gov.eg", "edu.eg",
    "com.sa", "org.sa", "net.sa", "gov.sa", "edu.sa",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ru",
    // wildcard + exception machinery (PSL: every label under ck is a
    // suffix EXCEPT www.ck, which is registrable itself)
    "*.ck", "!www.ck")

  /** The FULL publicsuffix.org list (~9,500 rules), bundled as the
    * resource `graft/public_suffix_list.dat` (the standard Mozilla-
    * published dat, MPL 2.0 — header retained in the file) and parsed
    * once per JVM: comment (`//`) and blank lines drop, every other
    * line is a rule in the exact syntax [[registeredDomainPsl]]
    * matches (`*.` wildcards, `!` exceptions, ICANN + private
    * sections, lowercase, Unicode rules as published — hosts must be
    * in the same form to match; punycode hosts only match punycode
    * rules). Pass as `registeredDomainPsl(host, rules = loadPsl())`;
    * [[PublicSuffixSnapshot]] stays the no-IO default. */
  def loadPsl(): Seq[String] = FullPslRules
  private lazy val FullPslRules: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled graft/public_suffix_list.dat not on classpath")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toList
    } finally in.close()
  }

  /** PSL-backed eTLD+1: longest matching rule wins, `*` matches one
    * label, `!` exceptions beat wildcards (the publicsuffix.org
    * algorithm); hosts matching NO rule fall back to
    * [[registeredDomain]]'s heuristic. A host that IS a public suffix
    * returns itself (stable grouping beats null). The rule set rides
    * in the closure — broadcast-sized by construction (the full PSL is
    * ~200 KB). Deliberately a UDF: longest-suffix matching over
    * hundreds of rules is not expressible as a bounded Column
    * expression, and domain extraction is never the corpus bottleneck.
    */
  def registeredDomainPsl(host: Column, extraRules: Seq[String] = Nil,
      /** the rule table to match against — [[PublicSuffixSnapshot]]
        * (no-IO, always available) by default; pass [[loadPsl]]() for
        * the full bundled publicsuffix.org list. */
      rules: Seq[String] = PublicSuffixSnapshot): Column = {
    val all = rules ++ extraRules
    val exact = all.filterNot(r => r.startsWith("*") || r.startsWith("!")).toSet
    val wild = all.filter(_.startsWith("*.")).map(_.stripPrefix("*.")).toSet
    val except = all.filter(_.startsWith("!")).map(_.stripPrefix("!")).toSet
    val twoPart = TwoPartTlds.toSet
    val f = udf { (hRaw: String) =>
      // FQDN form: a trailing dot ("example.com.") is an empty root
      // label, not part of any rule — strip it or the suffix walk
      // compares "com." to "com" and falls through to a wrong fallback
      val h = if (hRaw != null && hRaw.endsWith(".")) hRaw.dropRight(1) else hRaw
      if (h == null || h.isEmpty) ""
      else {
        val labels = h.split('.')
        val n = labels.length
        // prevailing rule per the publicsuffix.org algorithm: an
        // exception beats everything (its own value IS the registered
        // domain); otherwise the longest matching suffix, where "*.X"
        // matches any one label directly under X
        var exceptionHit: String = null
        var best = 0 // label count of the longest matching suffix
        var take = 1
        while (take <= n && exceptionHit == null) {
          val suffix = labels.slice(n - take, n).mkString(".")
          if (except.contains(suffix)) exceptionHit = suffix
          else {
            if (exact.contains(suffix)) best = take
            if (take >= 2 &&
              wild.contains(labels.slice(n - take + 1, n).mkString(".")))
              best = take
          }
          take += 1
        }
        if (exceptionHit != null) exceptionHit
        else if (best > 0) {
          val keep = math.min(n, best + 1)
          labels.slice(n - keep, n).mkString(".")
        } else {
          // no PSL rule: the existing two-part-TLD heuristic
          if (n >= 3 && twoPart.contains(labels(n - 2)) && labels(n - 1).length == 2)
            labels.slice(n - 3, n).mkString(".")
          else if (n >= 2) labels.slice(n - 2, n).mkString(".")
          else h
        }
      }
    }
    f(host)
  }

  /** Exact URL dedup after normalization: one row per canonical URL
    * (smallest id wins), with the copy count. Hash-partitioned
    * groupBy — the same shape as [[Dedup.exact]]. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.withColumn("__nurl", normalizeUrl(col(urlCol)))
      .groupBy(col("__nurl").as("url"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Keep at most `cap` rows per registered domain, selected
    * deterministically by the [[Sampling.sampleKey]] order of `idCol`
    * (re-runs and engines agree row-for-row). Adds a `domain` column.
    * Delegates to the salted two-level exact rank — no single-task
    * windows even for a domain holding most of the corpus. */
  def capPerDomain(
      df: DataFrame, urlCol: String, idCol: String, cap: Long,
      /** true → [[registeredDomainPsl]] grouping: subdomain-hosting
        * platforms cap per SITE and multi-label registries group
        * correctly. Default keeps the SQL-expressible heuristic (the
        * p27 oracle contract). */
      psl: Boolean = false,
      /** rule table for the PSL path — e.g. [[loadPsl]]() for the full
        * bundled list; ignored when `psl` is false. */
      pslRules: Seq[String] = PublicSuffixSnapshot): DataFrame = {
    val dom =
      if (psl) registeredDomainPsl(hostOf(col(urlCol)), rules = pslRules)
      else registeredDomain(hostOf(col(urlCol)))
    Sampling.mixSources(
      df.withColumn("domain", dom), "domain", idCol, cap)
  }
}
