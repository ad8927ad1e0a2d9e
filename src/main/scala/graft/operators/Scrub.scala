package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-scrubbing operators a training-data pipeline runs before anything
  * else: PII redaction and within-document repetition measurement
  * (the C4/Gopher "repetitious content" rules, Raffel et al. 2020 /
  * Rae et al. 2021).
  *
  * Scale: both are MAP-ONLY — codegen'd regexp/string expressions for the
  * scrub, a per-row aggregation for repetition — no shuffle, no UDF.
  * Patterns stay inside the RE2-compatible subset so the DuckDB oracle
  * evaluates the identical regex semantics.
  */
object Scrub {

  /** RE2-safe patterns (no backrefs/lookaround): both engines agree. */
  val EmailRe = "[a-z0-9._]+@[a-z0-9.]+"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Redact emails/phones in `textCol`, counting what was redacted
    * (observability: scrubbing is never silent).
    */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_emails", size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_phones", size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"))

  /** Within-document repetition stats over fixed-width word lines (the
    * repetitious-content signal): line count, distinct-line count, and the
    * duplicate percentage. Integer-exact; `wordsPerLine` defines the
    * dedup granularity (C4 uses sentences/lines; the span corpus is
    * unsegmented, so fixed word windows stand in deterministically).
    */
  def repetitionStats(spark: SparkSession, docs: DataFrame,
                      wordsPerLine: Int = 4): DataFrame = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) =>
        val lines = t.split(" ", -1).grouped(wordsPerLine).map(_.mkString(" ")).toSeq
        val n = lines.length.toLong
        val d = lines.distinct.length.toLong
        (id, n, d, 100L * (n - d) / n)
      }
      .toDF("doc_id", "n_lines", "n_distinct", "dup_pct")
  }

  /** RefinedWeb-style URL filtering over crawled records (the step that
    * runs right after WARC ingestion at web scale): extract the host with
    * a codegen'd regexp, drop non-http(s) schemes, blocked domains
    * (suffix match — `bad.example` also blocks `sub.bad.example`), and
    * URLs containing blocked keywords. Map-only, no shuffle; the rule
    * lists are BOUNDED arguments folded into the plan as literal
    * predicates (a production-sized million-domain blocklist would
    * instead broadcast-join on the reversed host — the bounded-argument
    * contract here mirrors Knn's explicit probe sets). Emits kept + the
    * first matching drop reason, never a silent drop.
    */
  def urlFilter(urls: DataFrame, blockedDomains: Seq[String],
                blockedKeywords: Seq[String], urlCol: String = "url"): DataFrame = {
    val u = lower(col(urlCol))
    val host = regexp_extract(u, "^https?://([^/?#]+)", 1)
    val domainHit = blockedDomains.map(_.toLowerCase)
      .foldLeft(lit(false))((acc, d) =>
        acc || host === d || host.endsWith("." + d))
    val keywordHit = blockedKeywords.map(_.toLowerCase)
      .foldLeft(lit(false))((acc, k) => acc || u.contains(k))
    val reason = when(host === "", "bad-scheme")
      .when(domainHit, "blocked-domain")
      .when(keywordHit, "blocked-keyword")
      .otherwise("")
    urls.withColumn("host", host)
      .withColumn("reason", reason)
      .withColumn("kept", (reason === "").cast("long"))
  }

  /** URL canonicalization (the crawl-dedup normal form; the rules every
    * web pipeline applies before URL-level dedup, cf. the RFC 3986 §6
    * normalizations plus the de-facto tracking-parameter strip):
    * scheme and host lowercase, default port dropped (:80 for http, :443
    * for https), fragment dropped, `utm_*`/`fbclid`/`gclid` tracking
    * parameters removed (separators repaired), empty path becomes `/`,
    * and trailing slashes beyond the root collapse. All codegen'd
    * string/regexp builtins — map-only, no UDF, no shuffle; URL-level
    * dedup is then an exact groupBy on the canonical form.
    */
  def urlCanonicalize(urls: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    // userinfo is CASE-SENSITIVE per RFC 3986 §6.2.2.1 (only scheme and
    // host case-normalize) — split it off verbatim before lowering
    val userinfo = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#@]*@)", 1)
    val hostport = lower(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.\\-]*://(?:[^/?#@]*@)?([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    // path+query with the fragment excluded by the capture itself
    val rest0 = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^#]*)", 1)
    // the parameter NAME must start right after ? or & (kept as $1) — an
    // unanchored pattern would also eat lookalikes: a path segment
    // /blog/utm_tips=x, or the tail of a real name like myfbclid=3
    val noTrack = regexp_replace(rest0,
      "([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*", "$1")
    // repair separators: && runs collapse, ?& -> ?, trailing ?/& drop
    val tidied = regexp_replace(regexp_replace(regexp_replace(noTrack,
      "&&+", "&"), "\\?&", "?"), "[?&]+$", "")
    // trailing-slash collapse applies to the PATH part only: the [^?]
    // class cannot cross into the query, so a slash ending an opaque
    // QUERY value ('/a?p=/x/') survives — the old `(.+?)` form stripped
    // it, mutating the parameter and breaking idempotence for '/a/?x=1/'
    val noTrailing = regexp_replace(tidied, "^([^?]+?)/+(\\?|$)", "$1$2")
    val pathq = when(noTrailing === "", "/").otherwise(noTrailing)
    urls.withColumn("canon_url",
      when(scheme === "" || host === "", u) // unparseable: keep verbatim, never null
        .otherwise(concat(scheme, lit("://"), userinfo, host, pathq)))
  }

  /** Parse robots.txt bodies into per-host (allow, prefix) rules for the
    * `*` user-agent group — the REP grammar (RFC 9309): `#` comments
    * strip, field names are case-insensitive, a group is one or more
    * User-agent lines followed by rules, and an empty Disallow value
    * means "no rule". Only groups naming `*` apply (a polite bulk crawler
    * has no product token). A real parser over untrusted text, so a typed
    * flatMap — per-row work, no shuffle.
    */
  def robotsRules(spark: SparkSession, robots: DataFrame): DataFrame = {
    import spark.implicits._
    robots.select(col("host"), col("robots_txt")).as[(String, String)]
      .flatMap { case (host, txt) =>
        val out = Vector.newBuilder[(String, Int, String)]
        var agents = Set.empty[String]
        var collecting = false // inside a group that names '*'
        var inAgentRun = true  // consecutive UA lines accumulate one group
        txt.split("\r?\n", -1).foreach { raw =>
          val line = raw.takeWhile(_ != '#').trim
          val colonAt = line.indexOf(':')
          if (colonAt > 0) {
            val field = line.substring(0, colonAt).trim.toLowerCase(java.util.Locale.ROOT)
            val value = line.substring(colonAt + 1).trim
            field match {
              case "user-agent" =>
                if (!inAgentRun) { agents = Set.empty; inAgentRun = true }
                agents += value.toLowerCase(java.util.Locale.ROOT)
                collecting = agents.contains("*")
              case "allow" | "disallow" =>
                inAgentRun = false
                if (collecting && value.nonEmpty)
                  out += ((host, if (field == "allow") 1 else 0, value))
              case _ => inAgentRun = false // crawl-delay, sitemap, unknown
            }
          }
        }
        out.result()
      }
      .toDF("host", "allow", "prefix")
  }

  /** Apply robots rules to crawl URLs with REP longest-match semantics:
    * among rules whose prefix matches the URL path, the LONGEST wins,
    * Allow beating Disallow on ties; no matching rule means fetchable.
    * The rules side is O(hosts x rules) — tiny next to the URL set, so
    * the join stays hint-free (AQE broadcasts it); the per-URL argmax is
    * one max(struct) aggregation, no window.
    */
  def robotsFilter(urls: DataFrame, rules: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = lower(col(urlCol))
    val withParts = urls
      .withColumn("host", regexp_extract(u, "^[a-z]+://([^/?#]+)", 1))
      .withColumn("path", regexp_extract(u, "^[a-z]+://[^/?#]+([^?#]*)", 1))
    val matched = withParts.join(rules, Seq("host"), "left")
      .withColumn("hit", col("prefix").isNotNull && expr("startswith(path, prefix)"))
    matched
      .groupBy(urls.columns.map(col) :+ col("path"): _*)
      .agg(max(when(col("hit"),
        struct(length(col("prefix")).as("l"), col("allow").as("a"), col("prefix").as("p"))))
        .as("best"))
      .withColumn("verdict",
        when(col("best").isNull || col("best.a") === 1, "fetch").otherwise("blocked"))
      .withColumn("rule", coalesce(col("best.p"), lit("")))
      .drop("best", "path")
  }
}
