package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared machinery for the IVF cell-assignment expressions: a vector
  * column scored against an in-plan centroid MATRIX with a generated
  * LOOP, not an unrolled term per centroid.
  *
  * Why this exists: the original formulation built
  * `array_max(array(struct(dot(v, lit(c_j)) / …, j) for j ← cells))` —
  * fine at nList=16, but nList now scales as ⌈√N⌉, and at a few hundred
  * cells that expression unrolls to tens of thousands of generated
  * multiply-add terms, blowing past janino's method limits (codegen
  * splits/aborts) and making every corpus pass tens of times slower —
  * the 10× standing bench caught exactly this. A loop over a referenced
  * `double[][]` keeps generated-code size CONSTANT in nList.
  *
  * Determinism contract (same as [[DotProduct]]): per centroid j the
  * similarity is the LEFT-TO-RIGHT element fold `Σ v_i·c_ji` starting at
  * 0.0, divided by `nrm · cnorm_j` — bit-identical to the expression
  * chain it replaces and to the DuckDB oracle's `list_reduce` fold.
  * Ranking replicates Spark's struct ordering over (sim, cid): ties on
  * the similarity (including `-0.0 == 0.0`) resolve to the LARGER cell
  * id; NaN ranks above every finite value (java.lang.Double.compare).
  *
  * Element null handling: the centroid matrix is driver-built and dense;
  * vector ELEMENTS are assumed non-null (embedding columns are
  * fixed-width floats; the quantized training vectors are `transform`s
  * of them). A null vector or norm yields NULL (nullSafeEval).
  */
trait CentroidScorer { self: BinaryExpression =>
  def cents: Seq[Seq[Double]]
  def cnorms: Seq[Double]

  @transient protected lazy val centsArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient protected lazy val cnormsArr: Array[Double] = cnorms.toArray

  protected def vecType: DataType = left.dataType

  protected def okVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (okVec(left) && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, double), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  protected def elemAt(x: ArrayData, i: Int): Double =
    left.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => x.getFloat(i).toDouble
      case _         => x.getDouble(i)
    }

  /** sim of `x` against centroid j — the shared fold. */
  protected def simAt(x: ArrayData, nrm: Double, j: Int): Double = {
    val cv = centsArr(j)
    val n = math.min(x.numElements(), cv.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elemAt(x, i) * cv(i); i += 1 }
    acc / (nrm * cnormsArr(j))
  }

  /** `(s, j)` strictly better than `(bs, bj)` under Spark's struct-max
    * order: sim first (`==` catches -0.0/0.0, Double.compare puts NaN on
    * top), larger cell id on ties. With j iterated ascending, `>=` on
    * equal sims is equivalent — kept explicit for the eval/codegen pair. */
  protected def better(s: Double, j: Int, bs: Double, bj: Int): Boolean =
    (s == bs && j > bj) || java.lang.Double.compare(s, bs) > 0
}

/** Cell id (0-based) of the max-cosine centroid for a vector — the
  * corpus-side assignment of every IVF operator, generated as a tight
  * two-level loop inside whole-stage codegen. */
case class ArgmaxCell(
    left: Expression, right: Expression,
    cents: Seq[Seq[Double]], cnorms: Seq[Double])
    extends BinaryExpression with CentroidScorer {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    var bs = Double.NaN
    var bj = -1
    var j = 0
    while (j < centsArr.length) {
      val s = simAt(x, nrm, j)
      if (bj < 0 || better(s, j, bs, bj)) { bs = s; bj = j }
      j += 1
    }
    bj
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cm = ctx.addReferenceObj("cents", centsArr, "double[][]")
    val nm = ctx.addReferenceObj("cnorms", cnormsArr, "double[]")
    val getElem = left.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _         => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (j, i, n, acc, s, bs, bj, cv) = (
        ctx.freshName("j"), ctx.freshName("i"), ctx.freshName("n"),
        ctx.freshName("acc"), ctx.freshName("s"), ctx.freshName("bs"),
        ctx.freshName("bj"), ctx.freshName("cv"))
      s"""
         |double $bs = Double.NaN;
         |int $bj = -1;
         |for (int $j = 0; $j < $cm.length; $j++) {
         |  double[] $cv = $cm[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${getElem(a, i)} * $cv[$i];
         |  }
         |  double $s = $acc / ($b * $nm[$j]);
         |  if ($bj < 0 || ($s == $bs && $j > $bj) ||
         |      java.lang.Double.compare($s, $bs) > 0) {
         |    $bs = $s; $bj = $j;
         |  }
         |}
         |${ev.value} = $bj;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgmaxCell =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_argmax_cell"
}

/** The `nProbe` nearest cell ids for a QUERY vector, ordered (sim desc,
  * cell id desc) — replaces `slice(reverse(array_sort(array(struct(sim,
  * cid)…))), 1, nProbe)`, whose unrolled array was the same
  * codegen-size trap as the assignment. Query sides are small
  * (broadcast), so interpreted evaluation (CodegenFallback) is fine and
  * keeps this simple; the loop still makes PLAN size constant in nList. */
case class TopCells(
    left: Expression, right: Expression,
    cents: Seq[Seq[Double]], cnorms: Seq[Double], nProbe: Int)
    extends BinaryExpression with CentroidScorer with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val m = centsArr.length
    val p = math.min(nProbe, m)
    // bounded insertion into a (sim desc, cid desc) top-p list — O(m·p)
    val bs = new Array[Double](p)
    val bc = new Array[Int](p)
    var cnt = 0
    var j = 0
    while (j < m) {
      val s = simAt(x, nrm, j)
      var pos = cnt
      while (pos > 0 && better(s, j, bs(pos - 1), bc(pos - 1))) pos -= 1
      if (pos < p) {
        val last = math.min(cnt, p - 1)
        var t = last
        while (t > pos) { bs(t) = bs(t - 1); bc(t) = bc(t - 1); t -= 1 }
        bs(pos) = s; bc(pos) = j
        if (cnt < p) cnt += 1
      }
      j += 1
    }
    new GenericArrayData(bc.take(cnt))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopCells =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_top_cells"
}

/** Top-`t` PRODUCT cells of the inverted multi-index for one query —
  * the multi-sequence probe order of Babenko & Lempitsky (2012) §3.1,
  * truncated at `t` pairs: cell pairs rank by the SUM of the two
  * half-space similarities, so a fixed candidate budget lands on the
  * jointly-best cells instead of a p×p box (the box wastes probes on
  * (weak, weak) corners while missing (1st, p+1-th) pairs the sum
  * ranks higher).
  *
  * Enumeration is the T×T-restricted grid over each half's top-`t`
  * list: a pair in the global top-t by `(simA + simB)` must have both
  * half-ranks ≤ t (any pair it dominates per-coordinate outranks it),
  * so the restriction is lossless under the primary sort; the cell-id
  * TIE-BREAK is evaluated inside that grid, which is what the oracle
  * mirrors (rank each half to t, cross, rank pairs). O(kHalf·d + t²)
  * per query row; kHalf is cube-root-sized, the t² term is constant.
  *
  * Determinism: each half similarity is the shared left-to-right
  * fold / IEEE divide; the pair score is ONE IEEE add of those two
  * doubles — bit-identical across engines; ties → larger product cell
  * id (`ORDER BY s DESC, cell DESC`). Inputs are the quantized-double
  * query halves and their norms (array<double>, never float). */
case class ImiTopPairs(
    va: Expression, na: Expression, vb: Expression, nb: Expression,
    centsA: Seq[Seq[Double]], cnormsA: Seq[Double],
    centsB: Seq[Seq[Double]], cnormsB: Seq[Double], t: Int)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(va, na, vb, nb)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true

  @transient private lazy val caArr: Array[Array[Double]] =
    centsA.map(_.toArray).toArray
  @transient private lazy val cbArr: Array[Array[Double]] =
    centsB.map(_.toArray).toArray
  @transient private lazy val naArr: Array[Double] = cnormsA.toArray
  @transient private lazy val nbArr: Array[Double] = cnormsB.toArray

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(va, vb).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && Seq(na, nb).forall(_.dataType == DoubleType)
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double, array<double>, " +
          "double)")
  }

  private def simAt(x: ArrayData, nrm: Double,
      cents: Array[Array[Double]], cnorms: Array[Double], j: Int): Double = {
    val cv = cents(j)
    val n = math.min(x.numElements(), cv.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * cv(i); i += 1 }
    acc / (nrm * cnorms(j))
  }

  /** (sim desc, cid desc) bounded top-`p` — the [[TopCells]] insertion. */
  private def topHalf(x: ArrayData, nrm: Double,
      cents: Array[Array[Double]], cnorms: Array[Double], p0: Int)
      : (Array[Double], Array[Int], Int) = {
    val m = cents.length
    val p = math.min(p0, m)
    val bs = new Array[Double](p)
    val bc = new Array[Int](p)
    var cnt = 0
    var j = 0
    while (j < m) {
      val s = simAt(x, nrm, cents, cnorms, j)
      var pos = cnt
      while (pos > 0 && ((s == bs(pos - 1) && j > bc(pos - 1)) ||
        java.lang.Double.compare(s, bs(pos - 1)) > 0)) pos -= 1
      if (pos < p) {
        val last = math.min(cnt, p - 1)
        var q = last
        while (q > pos) { bs(q) = bs(q - 1); bc(q) = bc(q - 1); q -= 1 }
        bs(pos) = s; bc(pos) = j
        if (cnt < p) cnt += 1
      }
      j += 1
    }
    (bs, bc, cnt)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val (a, an, b, bn) =
      (va.eval(input), na.eval(input), vb.eval(input), nb.eval(input))
    if (a == null || an == null || b == null || bn == null) return null
    val kHalf = cbArr.length
    val (sa, ca, cntA) = topHalf(a.asInstanceOf[ArrayData],
      an.asInstanceOf[Double], caArr, naArr, t)
    val (sb, cb, cntB) = topHalf(b.asInstanceOf[ArrayData],
      bn.asInstanceOf[Double], cbArr, nbArr, t)
    // rank the T×T grid by (sumSim desc, product cell desc), keep top t
    val bs = new Array[Double](t)
    val bc = new Array[Int](t)
    var cnt = 0
    var i = 0
    while (i < cntA) {
      var j = 0
      while (j < cntB) {
        val s = sa(i) + sb(j)
        val cell = ca(i) * kHalf + cb(j)
        var pos = cnt
        while (pos > 0 && ((s == bs(pos - 1) && cell > bc(pos - 1)) ||
          java.lang.Double.compare(s, bs(pos - 1)) > 0)) pos -= 1
        if (pos < t) {
          val last = math.min(cnt, t - 1)
          var q = last
          while (q > pos) { bs(q) = bs(q - 1); bc(q) = bc(q - 1); q -= 1 }
          bs(pos) = s; bc(pos) = cell
          if (cnt < t) cnt += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(bc.take(cnt))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ImiTopPairs =
    copy(va = newChildren(0), na = newChildren(1),
      vb = newChildren(2), nb = newChildren(3))

  override def prettyName: String = "graft_imi_top_pairs"
}
