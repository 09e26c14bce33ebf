package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic properties of BM25, the quality filter and PII redaction on
  * crafted inputs (the oracle gate proves engine-equivalence; these prove
  * the operators mean what they claim). */
class TextFilterSpec extends SparkSpec {
  import spark.implicits._

  test("charEntropy matches hand-computed Shannon entropy") {
    val rows = Seq(
      (1L, "aabb"),   // two symbols, uniform: H = ln 2 ≈ 0.693147
      (2L, "abcd"),   // four symbols, uniform: H = ln 4 ≈ 1.386294
      (3L, "aaaa"))   // degenerate: H = 0
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(rows, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_chars"), r.getAs[Int]("n_distinct"),
          r.getAs[Double]("entropy")))).toMap
    assert(out(1L) == ((4, 2, 0.693147)))
    assert(out(2L) == ((4, 4, 1.386294)))
    assert(out(3L) == ((4, 1, 0.0)))
    // ordering property on less-crafted text: repeated padding scores
    // strictly below varied prose of the same length
    val pair = TextAnalysis.charEntropy(Seq(
      (10L, "the quick brown fox jumps ov"),
      (11L, "aaaaaaaaaaaaaaaaaaaaaaaaaaab"))
      .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("entropy")).toMap
    assert(pair(10L) > pair(11L))
  }

  test("charEntropy edges: empty text, non-ASCII fallback path, null") {
    val rows = Seq[(java.lang.Long, String)](
      (1L, ""),                 // empty: no chars, entropy 0
      (2L, "日本語日本語"),       // pure wide chars: HashMap fallback path
      (3L, "ab日日"),            // mixed ASCII + wide: both paths combine
      (4L, null))               // null text → null stats row
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(rows, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_chars") == 0 &&
      out(1L).getAs[Int]("n_distinct") == 0 &&
      out(1L).getAs[Double]("entropy") == 0.0)
    // 3 distinct wide chars, each p=1/3: H = ln 3 ≈ 1.098612
    assert(out(2L).getAs[Int]("n_chars") == 6 &&
      out(2L).getAs[Int]("n_distinct") == 3 &&
      out(2L).getAs[Double]("entropy") == 1.098612)
    // a,b,日,日: H = 2·(1/4 ln 4) + (1/2 ln 2) = 1.039721
    assert(out(3L).getAs[Int]("n_chars") == 4 &&
      out(3L).getAs[Int]("n_distinct") == 3 &&
      out(3L).getAs[Double]("entropy") == 1.039721)
    assert(out(4L).isNullAt(out(4L).fieldIndex("entropy")),
      "null text must yield null stats, not a crash or zeros")
  }

  test("charEntropy equals a scala-reference computation on random text") {
    // seeded randomized sweep over alphabet sizes/lengths — the native
    // expression's counting + quantization vs an independent reference
    def refEntropy(s: String): (Int, Int, Double) = {
      val freq = s.groupBy(identity).view.mapValues(_.length)
      val n = s.length.toDouble
      val qsum = freq.values.map { c =>
        val v = (c / n) * math.log(c / n) * 1e9
        (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
      }.sum
      (s.length, freq.size,
        BigDecimal(-(qsum.toDouble / 1e9))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val rnd = new scala.util.Random(42)
    val docs = Seq.tabulate(60) { i =>
      val alpha = 2 + rnd.nextInt(60)
      val len = 1 + rnd.nextInt(400)
      (i.toLong, Seq.fill(len)(('a' + rnd.nextInt(alpha)).toChar).mkString)
    }
    val got = TextAnalysis.charEntropy(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_chars"), r.getAs[Int]("n_distinct"),
          r.getAs[Double]("entropy")))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refEntropy(text), s"doc $id: '${text.take(40)}…'")
    }
  }

  test("bm25 ranks term-bearing docs above term-free docs, zero for no hits") {
    val corpus = Seq(
      (1L, "join join join filter scan"),
      (2L, "join filter scan table row"),
      (3L, "filter scan table row batch"),
      (4L, "vector vector join scan row")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(corpus, "doc_id", "text",
      terms = Seq("join", "vector"), k = 4).collect()
    val scores = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(scores(3L) == 0.0, "doc without any query term must score 0")
    assert(scores(4L) > scores(2L),
      "doc with both terms must beat doc with one")
    assert(scores(1L) > scores(2L),
      "higher tf at equal length must score higher")
    // ranks are 1..4, aligned with descending score
    assert(out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      .sliding(2).forall(p => p(0) >= p(1)))
  }

  test("quality filter rules fire individually") {
    val rows = Seq(
      // healthy: >50 words, sane word length, stopwords present
      (1L, (("the quick brown fox jumps over the lazy dog and runs to it " * 6)
        .trim + " end.")),
      (2L, "too short to keep the a an"),                  // < 50 words
      (3L, ("incomprehensibilities floccinaucinihilipilification " * 30).trim
        + " the of to in is it"),                          // mean word len > 10
      (4L, ("lorem ipsum dolor sit amet " * 12).trim + " the of it"),
      (5L, ("code sample { return 1 } the of it " * 8).trim))
      .toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(rows, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("keep_gopher"), "word-count floor")
    assert(!out(3L).getAs[Boolean]("keep_gopher"), "mean-word-length cap")
    assert(out(4L).getAs[Boolean]("has_lorem") &&
      !out(4L).getAs[Boolean]("keep_c4"))
    assert(out(5L).getAs[Boolean]("has_brace") &&
      !out(5L).getAs[Boolean]("keep_c4"))
  }

  test("LM scoring: corpus-like text scores lower nll; fold is " +
    "repartition-invariant") {
    val corpus = Seq.tabulate(50)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val scored = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // in-model
      (101L, "lazy dog the over fox quick jumps brown the"), // shuffled
      (102L, "zebra xylophone quantum umbrella")) // out-of-vocabulary
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(scored, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(100L) < out(101L), "verbatim must beat shuffled words")
    assert(out(100L) < out(102L), "verbatim must beat out-of-vocab")
    // note: shuffled-but-in-vocab does NOT necessarily beat OOV under
    // add-one smoothing — an unseen bigram after a FREQUENT prefix gets
    // 1/(C(w1)+V) < the fully-unknown 1/V; that asymmetry is inherent
    // to add-one bigram models, not a bug
    val again = TextAnalysis.lmScore(
      scored.repartition(5), corpus.repartition(3), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again == out, "position-sorted fold must be partition-stable")
  }

  test("PII redaction removes every match and counts them") {
    val rows = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or +44 (0)20 7946 0958"),
      (2L, "server 10.0.255.3 fell over; admin@ops.io paged"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(rows, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_emails") == 1)
    assert(out(1L).getAs[Int]("n_phones") == 1)
    assert(out(2L).getAs[Int]("n_ips") == 1)
    assert(out(2L).getAs[Int]("n_emails") == 1)
    assert(out(3L).getAs[String]("redacted") == "no pii here at all")
    // residual scan: NO pattern may still match any redacted text
    val res = TextAnalysis.piiRedact(
      TextAnalysis.piiRedact(rows, "doc_id", "text")
        .select(col("doc_id"), col("redacted").as("text")),
      "doc_id", "text").collect()
    res.foreach { r =>
      assert(r.getAs[Int]("n_emails") == 0 && r.getAs[Int]("n_ips") == 0 &&
        r.getAs[Int]("n_phones") == 0,
        s"residual PII in: ${r.getAs[String]("redacted")}")
    }
  }

  test("ngramDiversity: hand-computed counts, short-doc edges, ordering") {
    val rows = Seq(
      (1L, "a b a b"),       // uni: 4/2; bi: "a b","b a","a b" -> 3/2; tri: 2/2
      (2L, "x y z"),         // all distinct: uni 3/3, bi 2/2, tri 1/1
      (3L, "w"),             // 1 token: no bigrams/trigrams, NULL bigram ratio
      (4L, "q q q q q q"))   // degenerate: uni 6/1, bi 5/1
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramDiversity(rows, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") == 4)
    assert(out(1L).getAs[Long]("n_distinct_tokens") == 2)
    assert(out(1L).getAs[Long]("n_bigrams") == 3)
    assert(out(1L).getAs[Long]("n_distinct_bigrams") == 2)
    assert(out(1L).getAs[Long]("n_trigrams") == 2)
    assert(out(1L).getAs[Long]("n_distinct_trigrams") == 2)
    assert(out(2L).getAs[Double]("unigram_diversity") == 1.0)
    assert(out(2L).getAs[Double]("bigram_diversity") == 1.0)
    assert(out(2L).getAs[Double]("trigram_diversity") == 1.0)
    assert(out(1L).getAs[Double]("trigram_diversity") == 1.0) // 2 distinct / 2
    assert(out(3L).getAs[Long]("n_bigrams") == 0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("bigram_diversity")))
    assert(out(3L).isNullAt(out(3L).fieldIndex("trigram_diversity")))
    // the signal this operator exists for: degenerate text scores
    // strictly below varied text of the same length
    assert(out(4L).getAs[Double]("bigram_diversity") <
      out(2L).getAs[Double]("bigram_diversity"))
    assert(out(4L).getAs[Double]("unigram_diversity") ==
      math.rint(1.0 / 6 * 1e6) / 1e6)
  }

  test("encodeTokenIds: frequency-ranked ids, OOV to 0, order preserved") {
    // corpus counts: b=4, z=3, a=2, c=2, d=2 → ids b=1, z=2, a=3, c=4
    // (a/c/d tie on count 2, broken lexicographically; vocabSize 4
    // leaves "d" OOV → 0)
    val rows = Seq(
      (1L, "b a b c b a d"),
      (2L, "z b"),
      (3L, "d c z z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.encodeTokenIds(rows, "doc_id", "text", 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("ids") == "1-3-1-4-1-3-0")
    assert(out(1L).getAs[Long]("n_oov") == 1)
    assert(out(2L).getAs[String]("ids") == "2-1")
    assert(out(2L).getAs[Long]("n_oov") == 0)
    assert(out(3L).getAs[String]("ids") == "0-4-2-2")
    assert(out(3L).getAs[Long]("n_oov") == 1)
    assert(out(3L).getAs[Long]("n_tokens") == 4)
  }

  test("sparseTfidfKnn: rare shared terms outrank common shared terms") {
    // every doc shares "the"; q shares the RARE "zebra" only with d1 —
    // idf weighting must rank d1 over d2 despite d2's larger raw overlap
    val rows = Seq(
      (0L, "the zebra sable"),
      (1L, "the zebra runs"),
      (2L, "the the the runs runs common words everywhere"),
      (3L, "the common words"),
      (4L, "the words everywhere"),
      (5L, "the common runs"))
      .toDF("doc_id", "text")
    val out = Similarity.sparseTfidfKnn(rows, "doc_id", "text",
      queryPred = col("doc_id") === 0, k = 2)
      .orderBy("rank").collect()
    assert(out.head.getAs[Long]("nid") == 1L,
      s"zebra-sharing doc must rank first, got ${out.toSeq}")
    // sims are valid cosines
    out.foreach(r => assert(r.getAs[Double]("sim") <= 1.000001 &&
      r.getAs[Double]("sim") >= -1.000001))
  }
}
