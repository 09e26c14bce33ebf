package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring statistics in ONE text pass — the
  * Aho–Corasick automaton (Aho & Corasick 1975), the scan shape a
  * blocklist / safety-term / PII-lexicon filter needs at corpus scale:
  * per-row cost is O(len + matches) INDEPENDENT of pattern count,
  * where the naive `contains(p1) OR contains(p2) OR …` chain pays one
  * text pass per pattern (a 10⁴-term lexicon = 10⁴ scans per doc).
  *
  * Output `struct(n_matches LONG, n_patterns INT)`: total occurrence
  * count and the number of distinct patterns that occur. Occurrences
  * are counted GREEDY NON-OVERLAPPING PER PATTERN (left-to-right, an
  * occurrence counts only if it starts after the previous counted
  * occurrence of the SAME pattern ends) — exactly what the oracle's
  * `(len(text) − len(replace(text, p, ''))) / len(p)` computes per
  * pattern, so the hash gate covers the automaton end-to-end.
  * Different patterns count independently (nested/overlapping across
  * patterns all report — the automaton's dictionary suffix links).
  *
  * The automaton is built once on the driver from the (bounded,
  * driver-collected) pattern list and rides to executors inside this
  * expression object; matching is over UTF-16 code units, identical
  * to java `String.indexOf` semantics on the same text. NULL ⇒ NULL. */
case class AhoCorasickStats(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "need at least one non-empty pattern")
  require(patterns.distinct.size == patterns.size,
    "duplicate patterns would double-count; deduplicate the lexicon")

  override def dataType: DataType = StructType(Seq(
    StructField("n_matches", LongType, nullable = false),
    StructField("n_patterns", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.catalogString}")
    }

  /** goto/fail/output tables, built once per expression instance. */
  @transient private lazy val automaton: Automaton = {
    val root = new java.util.HashMap[Character, Integer]()
    val gotoTab = scala.collection.mutable.ArrayBuffer(root)
    val patAt = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        val nxt = gotoTab(s).get(c)
        if (nxt == null) {
          gotoTab += new java.util.HashMap[Character, Integer]()
          patAt += scala.collection.mutable.ArrayBuffer.empty[Int]
          gotoTab(s).put(c, gotoTab.size - 1)
          s = gotoTab.size - 1
        } else s = nxt
      }
      patAt(s) += pi
    }
    val fail = new Array[Int](gotoTab.size)
    val queue = new java.util.ArrayDeque[Integer]()
    gotoTab(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll()
      gotoTab(u).forEach { (c, v) =>
        queue.add(v)
        var f = fail(u)
        while (f != 0 && !gotoTab(f).containsKey(c)) f = fail(f)
        val fv = gotoTab(f).get(c)
        fail(v) = if (fv != null && fv != v) fv.intValue() else 0
        // dictionary links folded in: a state reports its own patterns
        // plus everything its fail chain reports
        patAt(v) ++= patAt(fail(v))
      }
    }
    Automaton(gotoTab.map { m =>
      val im = new java.util.HashMap[Character, Integer](m); im
    }.toArray, fail, patAt.map(_.toArray).toArray,
      patterns.map(_.length).toArray)
  }

  /** The whole scan for one row; also the codegen target. */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val a = automaton
    val text = s.toString
    val n = text.length
    val nextAllowed = new Array[Int](a.patLen.length)
    val hitCount = new Array[Long](a.patLen.length)
    var st = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      var g = a.gotoTab(st).get(c)
      while (g == null && st != 0) { st = a.fail(st); g = a.gotoTab(st).get(c) }
      st = if (g == null) 0 else g.intValue()
      val pats = a.patAt(st)
      var k = 0
      while (k < pats.length) {
        val p = pats(k)
        val start = i - a.patLen(p) + 1
        if (start >= nextAllowed(p)) {
          hitCount(p) += 1
          nextAllowed(p) = i + 1
        }
        k += 1
      }
      i += 1
    }
    var total = 0L
    var distinct = 0
    var p = 0
    while (p < hitCount.length) {
      if (hitCount(p) > 0) { total += hitCount(p); distinct += 1 }
      p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, distinct))
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ahoCorasick", this,
      classOf[AhoCorasickStats].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): AhoCorasickStats = copy(child = newChild)

  override def prettyName: String = "graft_aho_corasick_stats"
}

private[functions] case class Automaton(
    gotoTab: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    patAt: Array[Array[Int]],
    patLen: Array[Int])
