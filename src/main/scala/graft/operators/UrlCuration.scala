package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level curation for web-corpus pipelines: normalization,
  * host/registered-domain extraction, and per-domain frequency caps
  * (domain balancing). Everything is pure codegen'd Column
  * expressions — no UDFs — and every rule is re-expressible in plain
  * SQL, so an independent engine can verify the selection
  * byte-for-byte (the p27 oracle does).
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
      df: DataFrame, urlCol: String, idCol: String, cap: Long): DataFrame =
    Sampling.mixSources(
      df.withColumn("domain", registeredDomain(hostOf(col(urlCol)))),
      "domain", idCol, cap)
}
