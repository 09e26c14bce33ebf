package graft.llm

import graft.SparkSpec

/** BPE training semantics: equivalence with an in-memory reference
  * implementation of Sennrich-style merge learning (same tie-break, same
  * left-to-right non-overlapping in-word merge), the overlap/greedy
  * corner the separator encoding must get right, early exhaustion, and
  * bit-exact repartition invariance. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE on an in-memory corpus: word-frequency contraction,
    * (freq DESC, l, r) argmax, greedy left-to-right non-overlapping
    * merge — the algorithm the distributed form must reproduce. */
  private def refTrain(texts: Seq[String], n: Int): Seq[(String, String, Long)] = {
    var vocab = texts
      .flatMap(_.toLowerCase.trim.split("[ \t\n\r\f]+"))
      .filter(_.matches("^[a-z0-9]+$"))
      .groupBy(identity).map { case (w, g) =>
        (w.map(_.toString).toVector, g.size.toLong) }
      .toVector
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + cnt }
      }
      if (counts.nonEmpty) {
        val ((l, r), f) = counts.toSeq
          .sortBy { case ((l, r), f) => (-f, l, r) }.head
        out += ((l, r, f))
        vocab = vocab.map { case (syms, cnt) =>
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
              b += l + r; i += 2 // greedy non-overlapping
            } else { b += syms(i); i += 1 }
          }
          (b.toVector, cnt)
        }
      }
    }
    out.toSeq
  }

  test("train matches the in-memory reference on a mixed corpus") {
    val texts = Seq(
      "the cat sat on the mat", "the bat and the cat", "that hat is flat",
      "concatenate the patterns", "matter scatters the batter",
      "a cab and a taxi 42 42 423")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Bpe.train(df, "text", 6).map(m => (m.lhs, m.rhs, m.freq))
    assert(got == refTrain(texts, 6))
  }

  test("overlapping pair runs merge greedily (the doubled-separator case)") {
    val df = Seq((1L, "aaaa"), (2L, "aaa")).toDF("id", "text")
    val merges = Bpe.train(df, "text", 2)
    // round 1: (a,a) appears 3x in aaaa, 2x in aaa → freq 5; greedy
    // leaves [aa,aa] and [aa,a]. round 2: (aa,aa)=1 beats (aa,a)=1 on
    // the (l, r) tie-break? No — (aa,a) < (aa,aa) lexicographically.
    assert(merges.map(m => (m.lhs, m.rhs, m.freq)) ==
      Seq(("a", "a", 5L), ("aa", "a", 1L)))
    // applying both merges: aaaa → [aa, aa] then (aa,a) no match → 2
    // tokens; aaa → [aa, a] → [aaa]? no — (aa,a) matches → 1 token
    val enc = Bpe.applyMerges(df, "id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(enc(1L) == ((1L, 4L, 2L))) // 1 word, 4 chars, [aa][aa]
    assert(enc(2L) == ((1L, 3L, 1L))) // 1 word, 3 chars, [aaa]
  }

  test("exhausted vocabulary stops early") {
    val df = Seq((1L, "a b c d")).toDF("id", "text")
    assert(Bpe.train(df, "text", 3).isEmpty)
  }

  test("training is bit-identical under repartitioning") {
    val d = graft.Tables.read(spark, sf("sf0.001"), "documents")
    val a = Bpe.train(d, "text", 4)
    val b = Bpe.train(d.repartition(13), "text", 4)
    assert(a == b && a.size == 4)
  }

  test("the production trainer (word counts + in-memory loop) equals " +
    "the distributed trainer, shallow and deep") {
    val d = graft.Tables.read(spark, sf("sf0.001"), "documents")
    val counts = Bpe.wordCounts(d, "text")
    assert(Bpe.trainOnCounts(counts, 8) == Bpe.train(d, "text", 8))
    assert(Bpe.trainOnCounts(counts, 48) == Bpe.train(d, "text", 48))
  }

  test("the rank-priority deep encode equals the sequential replace " +
    "chain on trained tables (gate corpus, depth 8 and 64)") {
    val d = graft.Tables.read(spark, sf("sf0.001"), "documents")
    val counts = Bpe.wordCounts(d, "text")
    for (depth <- Seq(8, 64)) {
      val merges = Bpe.trainOnCounts(counts, depth)
      val chain = Bpe.applyMerges(d, "doc_id", "text", merges)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val deep = Bpe.encodeDeep(d, "doc_id", "text", merges)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(deep == chain, s"divergence at depth $depth")
    }
  }

  test("deep encode == replace chain on random corpora with their own " +
    "trained tables (fuzz)") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val alphabet = "abcdefgh".take(3 + rnd.nextInt(5))
      val texts = (0 until 60).map { i =>
        (0 until 1 + rnd.nextInt(8)).map { _ =>
          (0 until 1 + rnd.nextInt(9))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }.mkString(" ")
      }
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val merges = Bpe.trainOnCounts(Bpe.wordCounts(df, "text"), 24)
      val chain = Bpe.applyMerges(df, "doc_id", "text", merges)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val deep = Bpe.encodeDeep(df, "doc_id", "text", merges)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(deep == chain, s"fuzz divergence, trial $trial")
    }
  }

  test("empty and single-char words encode to their length") {
    val df = Seq((1L, "a bb a")).toDF("doc_id", "text")
    val merges = Bpe.trainOnCounts(Bpe.wordCounts(df, "text"), 1)
    val out = Bpe.encodeDeep(df, "doc_id", "text", merges)
      .collect().head
    // 3 words, 4 chars; (b,b) is the only merge → tokens a=1, bb=1, a=1
    assert(out.getLong(1) == 3L && out.getLong(2) == 4L &&
      out.getLong(3) == 3L)
  }
}
