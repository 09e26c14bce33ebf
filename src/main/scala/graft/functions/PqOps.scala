package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization (PQ) primitives: a vector column scored against
  * an in-plan CODEBOOK tensor (`m` subspaces × `ksub` centroids × `dsub`
  * dims) with generated loops — the [[CentroidScorer]] plan-size lesson
  * (constant generated-code size in `m·ksub`) applied to PQ.
  *
  * Both expressions assume a FIXED-WIDTH vector (`numElements ≥ m·dsub`)
  * — the same contract the SQ8/IVF family places on the embedding
  * column. The contract is ENFORCED: a shorter vector throws (loud
  * schema violation, never an out-of-bounds UnsafeArrayData read), and a
  * null ELEMENT poisons the result to null — the same propagation as
  * [[PlaneBucket]]/[[DotProduct]] and the oracle's NULL-propagating
  * fold.
  *
  * Determinism contract: per (subspace, centroid) the squared-L2
  * distance / partial dot is the LEFT-TO-RIGHT element fold starting at
  * 0.0 — bit-identical to the DuckDB oracle's `list_reduce([0.0] || …)`
  * fold. Argmin ties resolve to the SMALLER centroid id (`<` with
  * ascending iteration ≡ the oracle's `ORDER BY dist ASC, cid ASC`
  * rank-1).
  */
trait PqCodebook { self: UnaryExpression =>
  def books: Seq[Seq[Seq[Double]]] // m × ksub × dsub

  @transient protected lazy val booksArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient protected lazy val mSub: Int = booksArr.length
  @transient protected lazy val dSub: Int = booksArr(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
}

/** The `m` PQ codes (0-based, one per subspace) of a vector: per
  * subspace, the centroid index minimizing the squared-L2 distance to
  * the subvector. The corpus-side ENCODE pass of every PQ operator —
  * runs on every row, so it generates a tight three-level loop inside
  * whole-stage codegen. */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqCodebook {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < mSub * dSub)
      throw new IllegalArgumentException(
        s"graft_pq_encode: vector has ${x.numElements()} elements, codebook needs ${mSub * dSub}")
    val codes = new Array[Int](mSub)
    var s = 0
    while (s < mSub) {
      val sub = booksArr(s)
      val off = s * dSub
      var d0 = 0
      while (d0 < dSub) {
        if (x.isNullAt(off + d0)) return null
        d0 += 1
      }
      var best = -1
      var bd = 0.0
      var c = 0
      while (c < sub.length) {
        val cv = sub(c)
        var acc = 0.0
        var d = 0
        while (d < dSub) {
          val diff = x.getDouble(off + d) - cv(d)
          acc += diff * diff
          d += 1
        }
        if (best < 0 || acc < bd) { bd = acc; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bm = ctx.addReferenceObj("books", booksArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val (s, c, d, off, sub, cv, acc, diff, best, bd, codes, need, i) = (
        ctx.freshName("s"), ctx.freshName("c"), ctx.freshName("d"),
        ctx.freshName("off"), ctx.freshName("sub"), ctx.freshName("cv"),
        ctx.freshName("acc"), ctx.freshName("diff"), ctx.freshName("best"),
        ctx.freshName("bd"), ctx.freshName("codes"), ctx.freshName("need"),
        ctx.freshName("i"))
      s"""
         |int $need = $bm.length * $bm[0][0].length;
         |if ($a.numElements() < $need) {
         |  throw new IllegalArgumentException(
         |    "graft_pq_encode: vector has " + $a.numElements() +
         |    " elements, codebook needs " + $need);
         |}
         |for (int $i = 0; $i < $need; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  int[] $codes = new int[$bm.length];
         |  for (int $s = 0; $s < $bm.length; $s++) {
         |    double[][] $sub = $bm[$s];
         |    int $off = $s * $sub[0].length;
         |    int $best = -1;
         |    double $bd = 0.0;
         |    for (int $c = 0; $c < $sub.length; $c++) {
         |      double[] $cv = $sub[$c];
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $cv.length; $d++) {
         |        double $diff = $a.getDouble($off + $d) - $cv[$d];
         |        $acc += $diff * $diff;
         |      }
         |      if ($best < 0 || $acc < $bd) { $bd = $acc; $best = $c; }
         |    }
         |    $codes[$s] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}

/** The per-QUERY ADC lookup table: `lut[s][c] = <query_sub_s,
  * centroid_{s,c}>` (left-fold partial dot) — computed ONCE per query
  * vector, after which scoring any corpus row is `m` table lookups.
  * Query sides are small (broadcast), so interpreted evaluation
  * (CodegenFallback) is fine — the loop still keeps PLAN size constant
  * in `m·ksub` (the [[TopCells]] precedent). */
case class PqLut(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqCodebook with CodegenFallback {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return null
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < mSub * dSub)
      throw new IllegalArgumentException(
        s"graft_pq_lut: vector has ${x.numElements()} elements, codebook needs ${mSub * dSub}")
    var i = 0
    while (i < mSub * dSub) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[ArrayData](mSub)
    var s = 0
    while (s < mSub) {
      val sub = booksArr(s)
      val off = s * dSub
      val row = new Array[Double](sub.length)
      var c = 0
      while (c < sub.length) {
        val cv = sub(c)
        var acc = 0.0
        var d = 0
        while (d < dSub) { acc += x.getDouble(off + d) * cv(d); d += 1 }
        row(c) = acc
        c += 1
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_lut"
}
