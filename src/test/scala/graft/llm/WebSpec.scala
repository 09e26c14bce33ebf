package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL canonicalization semantics ([[Web.canonicalizeUrl]]): the four
  * planted crawl variants collapse to one canonical URL, real query
  * params survive tracking removal, and the transform is idempotent —
  * the property that makes it safe to run at ingest AND again at merge
  * (re-canonicalizing already-clean URLs in an incremental crawl must
  * never move the key). */
class WebSpec extends SparkSpec {

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u")
      .select(Web.canonicalizeUrl(col("u")).as("c"))
      .as[String].head()
  }

  test("the four crawl variants of one page share a canonical URL; " +
    "a real page= param keeps its variant distinct") {
    import spark.implicits._
    val ids = (0L until 24L).toDF("doc_id")
    val c = ids
      .select(col("doc_id"),
        Web.canonicalizeUrl(Web.syntheticUrl(col("doc_id"))).as("canon"))
      .as[(Long, String)].collect().toMap
    (0L until 24L by 4L).foreach { base =>
      val g = base / 4
      val expected = s"https://site${g % 50}.example/articles/a$g"
      // m = 0,1,2 always collapse to the clean canonical form
      (0L to 2L).foreach { m =>
        assert(c(base + m) == expected, s"doc ${base + m}: ${c(base + m)}")
      }
      // m = 3 keeps the REAL page= param for g % 3 > 0 groups (tracking
      // removed, page preserved); collapses fully otherwise
      val want3 =
        if (g % 3 > 0) s"$expected?page=${g % 3}" else expected
      assert(c(base + 3) == want3, s"doc ${base + 3}: ${c(base + 3)}")
    }
  }

  test("non-tracking params are preserved in original order; tracking " +
    "params are stripped wherever they sit") {
    assert(canon("https://a.example/p?b=2&a=1") ==
      "https://a.example/p?b=2&a=1")
    assert(canon("https://a.example/p?utm_source=x&b=2&fbclid=y&a=1&gclid=z")
      == "https://a.example/p?b=2&a=1")
    assert(canon("https://a.example/p?utm_a=1&utm_b=2") ==
      "https://a.example/p")
  }

  test("a param whose NAME merely ends in a tracking name is not a " +
    "tracking param — the [?&] anchor keeps it byte-identical") {
    // pre-fix, 'fbclid=1&' matched INSIDE 'xfbclid=1&' and its removal
    // merged 'x' into the next param ('?xa=2')
    assert(canon("https://a.example/p?xfbclid=1&a=2") ==
      "https://a.example/p?xfbclid=1&a=2")
    assert(canon("https://a.example/p?a=1&myutm_source=x") ==
      "https://a.example/p?a=1&myutm_source=x")
    // ...while a REAL tracking param in the same positions still goes
    assert(canon("https://a.example/p?fbclid=1&a=2") ==
      "https://a.example/p?a=2")
  }

  test("slash surgery is path-only: query values carrying slashes pass " +
    "through byte-identical") {
    assert(canon("https://a.example/p?next=//foo/") ==
      "https://a.example/p?next=//foo/")
    assert(canon("https://a.example//p/?next=//foo//bar/") ==
      "https://a.example/p?next=//foo//bar/")
  }

  test("head normalization: case, default ports, scheme fold, www strip, " +
    "slash and fragment cleanup") {
    assert(canon("HTTP://WWW.A.EXAMPLE:80//x//y/#frag") ==
      "https://a.example/x/y")
    assert(canon("https://a.example:443/") == "https://a.example")
    // non-default port survives
    assert(canon("https://a.example:8443/p") == "https://a.example:8443/p")
  }

  test("unparseable inputs pass through unchanged — a crawl's junk tail " +
    "must never merge into one '' key") {
    assert(canon("not a url") == "not a url")
    assert(canon("/relative/path?utm_source=x") == "/relative/path?utm_source=x")
    assert(canon("") == "")
  }

  test("stripBoilerplate: host-wide chrome dropped, rare lines kept in " +
    "order, fully-boilerplate docs survive with empty text, hosts don't " +
    "bleed into each other") {
    import spark.implicits._
    // host A: 6 docs sharing "nav" (df 6 > cap 3 — dropped) and a pair
    // line "deal" in docs 0,1 (df 2 — kept); each doc has a unique body.
    // doc 5's page is ONLY chrome. Host B: 2 docs that BOTH contain
    // "nav" — but B's cap is 1, so "nav" is dropped for B independently;
    // B's "only-b" line (df 1 of 2 ≤ cap) is kept.
    val rows =
      (0 until 6).map { i =>
        val deal = if (i < 2) "deal\n" else ""
        val body = if (i == 5) "" else s"body-$i\n"
        (i.toLong, "a.example", s"nav\n$deal${body}nav")
      } ++ Seq(
        (10L, "b.example", "nav\nonly-b"),
        (11L, "b.example", "nav\nbody-11"))
    val out = Web.stripBoilerplate(
      rows.toDF("doc_id", "host", "page"), "doc_id", "host", "page")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) == (("deal\nbody-0", 2L, 2L)))
    assert(out(1L) == (("deal\nbody-1", 2L, 2L)))
    assert(out(2L) == (("body-2", 1L, 2L)))
    assert(out(5L) == (("", 0L, 2L))) // chrome-only doc survives, empty
    assert(out(10L) == (("only-b", 1L, 1L)))
    assert(out(11L) == (("body-11", 1L, 1L)))
  }

  test("extractText: script/style blocks with hostile bare angle " +
    "brackets drop wholesale; tags never fuse words; entity decode is " +
    "single-pass (double-encoded text stays encoded once)") {
    import spark.implicits._
    def extract(html: String): String =
      Seq(html).toDF("h")
        .select(Web.extractText(col("h")).as("t")).as[String].head()
    // a naive tag strip would turn "a<b" into a tag open and eat the
    // rest of the script; the block drop must win
    assert(extract("<script>if (a<b && c>\"d\") { x = '</'; }</script>ok")
      == "ok")
    assert(extract("<style>p>a{color:red}</style>kept") == "kept")
    // tags replaced by spaces, never by '': words don't fuse
    assert(extract("one</h1><p>two") == "one two")
    // &amp; decodes LAST: double-encoded &amp;lt; yields literal &lt;
    assert(extract("Q&amp;A &lt;b&gt; &quot;q&quot; &#39;s&nbsp;x " +
      "&amp;lt;raw&amp;gt;") == "Q&A <b> \"q\" 's x &lt;raw&gt;")
  }

  test("extractText ∘ syntheticHtml round-trips corpus text carrying " +
    "raw HTML metacharacters (the escape/decode inverse pair)") {
    import spark.implicits._
    val nasty = "x < y & y > z \"quoted\" 's &lt;already&gt; &amp; end"
    val out = Seq((7L, nasty)).toDF("doc_id", "text")
      .select(Web.extractText(Web.syntheticHtml(col("doc_id"),
        Web.syntheticHost(col("doc_id")), col("text"))).as("t"))
      .as[String].head()
    assert(out ==
      s"""doc 7 Article 1 $nasty partner hub about Q&A <tags> "ok" 's end""")
  }

  test("link extraction and host resolution: both quote styles, the " +
    "relative link survives extraction but resolves to no host") {
    import spark.implicits._
    val links = Seq(5L).toDF("doc_id")
      .select(explode(Web.extractLinks(Web.syntheticHtml(col("doc_id"),
        Web.syntheticHost(col("doc_id")), lit("t")))).as("link"))
      .select(col("link"),
        Web.hostOf(Web.canonicalizeUrl(col("link"))).as("host"))
      .as[(String, String)].collect()
    assert(links.map(_._1).toSeq == Seq(
      "https://www.site8.example/from/a1/?utm_source=link",
      "HTTP://SITE1.EXAMPLE:80/hub#top",
      "/about"))
    assert(links.map(_._2).toSeq == Seq(
      "site8.example", "site1.example", ""))
  }

  test("host rank: the seven hub hosts (g % 7 in-links from every " +
    "group) outrank every non-hub host") {
    import spark.implicits._
    val html = Web.syntheticHtml(col("doc_id"),
      Web.syntheticHost(col("doc_id")), lit("t"))
    val edges = (0L until 2000L).toDF("doc_id")
      .select(Web.syntheticHost(col("doc_id")).as("src"),
        explode(Web.extractLinks(html)).as("link"))
      .select(col("src"),
        Web.hostOf(Web.canonicalizeUrl(col("link"))).as("dst"))
      .filter(col("dst") =!= "")
    val ranks = Graph.pageRank(edges, "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    val (hubs, rest) = ranks.partition(kv =>
      (0 until 7).map(i => s"site$i.example").contains(kv._1))
    assert(hubs.size == 7 && rest.nonEmpty)
    assert(hubs.values.min > rest.values.max,
      "every hub must outrank every non-hub")
  }

  test("crawlMerge keeps the latest fetch per URL with a deterministic " +
    "tie-break; crawlDelta classifies added/gone/changed/unchanged") {
    import spark.implicits._
    val fetches = Seq(
      ("u1", 10L, "old"), ("u1", 20L, "new"),     // later fetch wins
      ("u2", 5L, "only"),
      ("u3", 7L, "b"), ("u3", 7L, "a")            // (url, ts) TIE
    ).toDF("url", "ts", "text")
    val merged = Web.crawlMerge(fetches, "url", "ts", "text")
      .as[(String, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(merged("u1") == ((20L, "new", 2L)))
    assert(merged("u2") == ((5L, "only", 1L)))
    // max(struct(ts, text)) — the lexicographically LARGER text wins a
    // ts tie, on every partitioning
    assert(merged("u3") == ((7L, "b", 2L)))

    val oldS = Seq(("a", "x"), ("b", "y"), ("c", "z")).toDF("url", "text")
    val newS = Seq(("b", "y"), ("c", "z2"), ("d", "w")).toDF("url", "text")
    val delta = Web.crawlDelta(oldS, newS, "url", "text")
      .as[(String, String)].collect().toMap
    assert(delta == Map("a" -> "gone", "b" -> "unchanged",
      "c" -> "changed", "d" -> "added"))
  }

  test("canonicalization is idempotent on the fixture corpus") {
    import spark.implicits._
    val ids = (0L until 200L).toDF("doc_id")
    val once = Web.canonicalizeUrl(Web.syntheticUrl(col("doc_id")))
    val n = ids
      .select(once.as("c1"), Web.canonicalizeUrl(once).as("c2"))
      .filter(col("c1") =!= col("c2"))
      .count()
    assert(n == 0, s"$n fixture URLs moved under re-canonicalization")
  }

  // ── robots.txt filtering ────────────────────────────────────────────

  private def robots(urls: Seq[(Long, String)],
      rules: Seq[(String, String, Int)]) = {
    import spark.implicits._
    Web.robotsFilter(urls.toDF("doc_id", "url"),
        rules.toDF("host", "prefix", "allow"), "doc_id", "url")
      .select("doc_id", "allowed", "rule_prefix")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("robots: longest matching prefix wins; equal length Allow beats " +
    "Disallow; no match defaults to allowed") {
    val rules = Seq(
      ("h.example", "/a", 0),        // blocks /a*
      ("h.example", "/a/keep", 1),   // longer Allow carves an exception
      ("h.example", "/tie", 0),      // equal-length pair: Allow wins
      ("h.example", "/tie", 1))
    val urls = Seq(
      (1L, "https://h.example/a/x"),        // /a only → disallowed
      (2L, "https://h.example/a/keep/x"),   // longer allow → allowed
      (3L, "https://h.example/tie/x"),      // tie → allow
      (4L, "https://h.example/other"))      // no rule → default allow
    val out = robots(urls, rules)
    assert(out(1L) == ((false, Some("/a"))))
    assert(out(2L) == ((true, Some("/a/keep"))))
    assert(out(3L) == ((true, Some("/tie"))))
    assert(out(4L) == ((true, None)))
  }

  test("robots: prefix match is literal (a rule for /a1 matches /a10), " +
    "rules never cross hosts") {
    val rules = Seq(("h.example", "/a1", 0))
    val out = robots(Seq(
      (1L, "https://h.example/a10/deep"),   // literal prefix → blocked
      (2L, "https://h.example/a2"),         // different path → allowed
      (3L, "https://other.example/a10")),   // other host → allowed
      rules)
    assert(out(1L)._1 == false)
    assert(out(2L)._1 == true && out(3L)._1 == true)
  }

  test("robots: the synthetic rule fixture exercises all four verdict " +
    "shapes on the corpus arithmetic") {
    import spark.implicits._
    // host 33 (d=3, t=3): g=133 → path a133 matches Disallow /articles/a1?
    // no — d=3: Disallow a3, Allow a33. g=33 → a33: both match, the
    // longer Allow wins. host 9: whole-host '/' Disallow; g=9 → a9 also
    // matches Disallow a9 (longer than '/') → blocked either way.
    // host 2 (2%5=2): tie pair on a2 → g=2 allowed. host 13: g=13 →
    // a13 matches nothing (d=3) → default allow.
    val ids = Seq(33L * 4, 9L * 4, 2L * 4, 13L * 4).toDF("doc_id")
    val canon = Web.canonicalizeUrl(Web.syntheticUrl(col("doc_id")))
    val u = ids.select(col("doc_id"), canon.as("url"))
    val hosts = u.select(Web.hostOf(col("url")).as("host")).distinct()
    val out = Web.robotsFilter(u, Web.syntheticRobots(hosts, "host"),
        "doc_id", "url")
      .select("doc_id", "allowed", "rule_prefix")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(132L) == ((true, Some("/articles/a33"))))  // long allow
    assert(out(36L) == ((false, Some("/articles/a9"))))   // blacklisted
    assert(out(8L) == ((true, Some("/articles/a2"))))     // tie → allow
    assert(out(52L) == ((true, None)))                    // default
  }
}
