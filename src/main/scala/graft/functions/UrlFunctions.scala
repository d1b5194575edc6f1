package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus pipelines (crawl dedup by URL is the
  * cheapest dedup pass — it runs before any content hashing).
  *
  * Everything composes codegen'd built-ins (regexp/split/array ops, no UDF)
  * and sticks to RE2-compatible regex syntax, so a DuckDB oracle can mirror
  * each step exactly. Canonicalization choices follow the common crawl-
  * pipeline conventions: lowercase scheme+host, strip a leading `www.`,
  * drop any explicit port (a stricter-than-RFC canonicalization that also
  * merges :8080 with the default — the right trade for dedup keys), drop
  * the fragment, drop tracking parameters (`utm_*`, `fbclid`, `gclid`),
  * sort surviving query parameters, strip a trailing slash on a non-root
  * path.
  */
object UrlFunctions {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased scheme ("" when the URL has none). */
  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** URL with scheme and fragment removed — the working remainder. */
  private def rest(url: Column): Column =
    regexp_replace(regexp_replace(url, SchemeRe, ""), "#.*$", "")

  /** Lowercased host: authority up to the first '/', '?' (port stripped),
    * leading `www.` removed. */
  def host(url: Column): Column = {
    val auth = lower(regexp_extract(rest(url), "^([^/?]+)", 1))
    regexp_replace(regexp_replace(auth, ":[0-9]+$", ""), "^www\\.", "")
  }

  /** Naive registrable domain: the last two dot-labels of the host (a
    * public-suffix list would refine multi-label TLDs; this is the
    * SQL-mirrorable approximation). */
  def domain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** Path component ('' → '/'), trailing slash stripped off non-root. */
  private def path(url: Column): Column = {
    val p = regexp_extract(regexp_replace(rest(url), "^[^/?]+", ""), "^([^?]*)", 1)
    val noTrail = regexp_replace(p, "/$", "")
    when(noTrail === "", lit("/")).otherwise(noTrail)
  }

  /** Query parameters with tracking params removed, sorted, re-joined;
    * '' when nothing survives. */
  private def cleanQuery(url: Column): Column = {
    val q = regexp_extract(rest(url), "\\?(.*)$", 1)
    val kept = array_sort(filter(split(q, "&"),
      p => !p.rlike("^(utm_[^=]*|fbclid|gclid)=") && p =!= lit("")))
    when(size(kept) > 0, concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
  }

  /** Canonical URL key for dedup. */
  def normalize(url: Column): Column =
    concat(
      when(scheme(url) === "", lit("")).otherwise(concat(scheme(url), lit("://"))),
      host(url), path(url), cleanQuery(url))

  /** URL dedup: keep the row with the smallest `orderCol` per canonical
    * URL — one window on the normalized key, the standard first pass of a
    * crawl-dedup cascade (runs before any content hashing). */
  def dedupByUrl(df: DataFrame, urlCol: String, orderCol: String): DataFrame =
    graft.dedup.Dedup.exactByKey(df, normalize(col(urlCol)), orderCol)
}
