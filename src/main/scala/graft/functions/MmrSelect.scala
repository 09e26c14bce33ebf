package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** MAXIMAL-MARGINAL-RELEVANCE greedy selection (Carbonell & Goldstein,
  * SIGIR'98) over ONE query's candidate list — the diversification
  * re-rank a RAG stack applies after retrieval so the k passages handed
  * to the model aren't k near-copies of the same source.
  *
  * Inputs (per row — the row IS one query, post `groupBy(qid)`):
  *  - `left`:  array<struct<nid:long, rel:long>> — the candidate list
  *    with its RELEVANCE score as a 1e6-scaled long (`round(sim,6)·1e6`
  *    — exact, the engine-portable quantization every knn oracle in
  *    this repo already agrees on);
  *  - `right`: array<struct<a:long, b:long, s:long>> — the candidate×
  *    candidate similarity matrix (upper triangle, `a < b`), same
  *    1e6-scaled quantization.
  *
  * Selection (λ = lamNum/lamDen, classic default 0.7):
  *
  *   step 1:   argmax  lamNum·rel                      (pure relevance)
  *   step i>1: argmax  lamNum·rel − (lamDen−lamNum)·max_{s∈S} sim(c,s)
  *
  * — ALL-INTEGER arithmetic (scores ≤ lamDen·1e6 · lamDen, nowhere near
  * Long range), ties break to the smaller nid, so the selected order is
  * bit-identical to the oracle's unrolled-CTE replay on any engine.
  *
  * Output: array<struct<nid:long, sel_rank:int, mmr_scaled:long>> in
  * selection order (`mmr_scaled` is the score AT SELECTION TIME, the
  * number a serving layer thresholds on).
  *
  * Why interpreted eval (CodegenFallback) is the right cost model here:
  * this expression runs ONCE PER QUERY over ≤kCand candidates (k·n·|S|
  * ≈ 10·20·10 integer ops), after the heavy lifting — corpus scoring
  * and the candidate-pair similarity join — already ran inside
  * codegen'd joins. The per-row-hot-path rule (CharEntropyStats) does
  * not apply to a per-QUERY cold path.
  */
case class MmrSelect(left: Expression, right: Expression,
    k: Int, lamNum: Int, lamDen: Int)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_mmr_select"
  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("nid", LongType, nullable = false),
    StructField("sel_rank", IntegerType, nullable = false),
    StructField("mmr_scaled", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(StructType(cf), _), ArrayType(StructType(pf), _))
        if cf.length == 2 && pf.length == 3 &&
          cf.forall(_.dataType == LongType) &&
          pf.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<struct<long,long>>, " +
        s"array<struct<long,long,long>>), got $other")
  }

  override protected def nullSafeEval(cAny: Any, pAny: Any): Any = {
    val cArr = cAny.asInstanceOf[ArrayData]
    val pArr = pAny.asInstanceOf[ArrayData]
    val n = cArr.numElements()
    val nids = new Array[Long](n)
    val rels = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = cArr.getStruct(i, 2)
      nids(i) = r.getLong(0); rels(i) = r.getLong(1)
      i += 1
    }
    // (a, b) → sim lookup; the builder emits the full upper triangle of
    // the candidate set, so a miss is a broken-contract bug, not data.
    // BOXED value type (ADVICE r13): a HashMap[Long, Long] with Scala
    // primitive Longs auto-unboxes a missing key's null to 0L, turning
    // the broken-contract throw below into a silent sim-0 read that
    // corrupts maxSim and the greedy order.
    val sims =
      new java.util.HashMap[java.lang.Long, java.lang.Long](
        pArr.numElements() * 2)
    val idx = new java.util.HashMap[java.lang.Long, Integer](n * 2)
    i = 0
    while (i < n) { idx.put(nids(i), i); i += 1 }
    i = 0
    while (i < pArr.numElements()) {
      val r = pArr.getStruct(i, 3)
      val ia = idx.get(r.getLong(0)); val ib = idx.get(r.getLong(1))
      // key normalized at PUT time too (ADVICE r13): correctness must
      // not depend on the candidate array arriving nid-sorted (which
      // made ia < ib coincide with nid(a) < nid(b)) — an unsorted left
      // array would otherwise miss every lookup
      if (ia != null && ib != null) {
        val lo = math.min(ia.intValue(), ib.intValue())
        val hi = math.max(ia.intValue(), ib.intValue())
        sims.put(lo.toLong * n + hi, r.getLong(2))
      }
      i += 1
    }
    def simAt(x: Int, y: Int): Long = {
      val key = if (x < y) x.toLong * n + y else y.toLong * n + x
      val v = sims.get(key)
      if (v == null)
        throw new IllegalArgumentException(
          s"graft_mmr_select: missing pair sim (${nids(x)}, ${nids(y)}) " +
            "— the builder must emit the full candidate upper triangle")
      v.longValue()
    }
    val mu = lamNum.toLong
    val pen = (lamDen - lamNum).toLong
    val taken = new Array[Boolean](n)
    val sel = new Array[Int](math.min(k, n))
    val out = new Array[AnyRef](math.min(k, n))
    var step = 0
    while (step < sel.length) {
      var best = -1
      var bestScore = Long.MinValue
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          var maxSim = Long.MinValue
          var s = 0
          while (s < step) {
            val v = simAt(c, sel(s)); if (v > maxSim) maxSim = v; s += 1
          }
          val score =
            if (step == 0) mu * rels(c) else mu * rels(c) - pen * maxSim
          if (score > bestScore ||
              (score == bestScore && best >= 0 && nids(c) < nids(best))) {
            best = c; bestScore = score
          }
        }
        c += 1
      }
      taken(best) = true
      sel(step) = best
      out(step) = new GenericInternalRow(
        Array[Any](nids(best), step + 1, bestScore))
      step += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MmrSelect =
    copy(left = newLeft, right = newRight)
}
