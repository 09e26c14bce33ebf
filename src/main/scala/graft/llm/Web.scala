package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-crawl URL operators: canonicalization, crawl dedup by canonical
  * URL, and per-host corpus stats — the stage every web-scale training
  * pipeline runs BEFORE text dedup (the same page is crawled under
  * `http://`/`https://`, with/without `www.`, with default ports,
  * tracking parameters, fragments, duplicate or trailing slashes; byte-
  * level text dedup catches only the subset whose bodies also byte-
  * match). Everything here is a chain of codegen'd native string
  * expressions — per-row constant cost, no UDFs, no shuffle until the
  * consumer groups by the canonical key — and every regex stays in the
  * Java-regex ∩ RE2 common subset (classes, alternation, anchors,
  * bounded/unbounded repetition; no lookaround, no backrefs) so the
  * DuckDB oracle replays the surgery verbatim.
  *
  * Canonicalization rules, applied in this order (each is a documented
  * pipeline convention, not an RFC claim):
  *   1. lowercase the scheme://host[:port] head (paths stay
  *      case-sensitive);
  *   2. strip the default ports `:80`/`:443`;
  *   3. fold `http://` to `https://` (crawl dedup treats the scheme
  *      pair as one resource);
  *   4. strip a leading `www.`;
  *   5. drop the `#fragment`;
  *   6. drop tracking parameters (`utm_*`, `fbclid`, `gclid`), fixing
  *      the `?`/`&` separators; other parameters are preserved in
  *      their original order;
  *   7. collapse duplicate slashes; strip one trailing slash.
  * Idempotent by construction (WebSpec asserts canon∘canon = canon). */
object Web {

  private val Tracking = "(utm_[a-z0-9_]*|fbclid|gclid)"

  def canonicalizeUrl(url: Column): Column = {
    // head = scheme://host[:port] (up to the first /, ? or #); tail = rest
    val head = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    val tail = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val h = regexp_replace(
      regexp_replace(head, ":(80|443)$", ""), "^http://", "https://")
    val h2 = regexp_replace(h, "^https://www\\.", "https://")
    val t1 = regexp_replace(tail, "#.*$", "")
    // tracking param followed by another param: drop it AND its '&'
    val t2 = regexp_replace(t1, s"$Tracking=[^&#]*&", "")
    // trailing tracking param: drop it AND its leading '?'/'&'
    val t3 = regexp_replace(t2, s"[?&]$Tracking=[^&#]*$$", "")
    val t4 = regexp_replace(t3, "\\?$", "")
    val t5 = regexp_replace(t4, "/{2,}", "/")
    val t6 = regexp_replace(t5, "/$", "")
    concat(h2, t6)
  }

  /** Registrable host of a canonical URL (already lowercased,
    * port-stripped, www-stripped by [[canonicalizeUrl]]). */
  def hostOf(canon: Column): Column =
    regexp_extract(canon, "^https://([^/]*)", 1)

  /** Deterministic messy-URL fixture over a document id (the planted-
    * fixture pattern of the multimodal family): four crawl variants of
    * one page per id-group of 4 — `www.` + trailing slash, SHOUTED
    * scheme/host + `:80` + a tracking param, `:443` + duplicate slash +
    * fragment, and plain-http + tracking (+ a REAL `page=` param for
    * 2-in-3 groups, which canonicalization must PRESERVE, keeping those
    * group members distinct). The oracle rebuilds the same strings with
    * a CASE expression, so the whole pipeline is hash-exact. */
  def syntheticUrl(id: Column): Column = {
    // ids are non-negative, so >> 2 is exact integer //4 at any
    // magnitude (a double-division detour would round above 2^53)
    val g = shiftright(id.cast("long"), 2)
    val gs = g.cast("string")
    val site = concat(lit("site"), pmod(g, lit(50L)).cast("string"),
      lit(".example"))
    val path = concat(lit("/articles/a"), gs)
    val m = pmod(id.cast("long"), lit(4L))
    val page = pmod(g, lit(3L))
    when(m === 0, concat(lit("https://www."), site, path, lit("/")))
      .when(m === 1, concat(lit("HTTP://"), upper(site), lit(":80"), path,
        lit("?utm_source=feed")))
      .when(m === 2, concat(lit("https://"), site, lit(":443"),
        lit("/articles//a"), gs, lit("#sec")))
      .otherwise(concat(lit("http://"), site, path, lit("?utm_campaign=c"),
        when(page > 0, concat(lit("&page="), page.cast("string")))
          .otherwise(lit(""))))
  }
}
