package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The LSH bucket id of a vector against a referenced HYPERPLANE MATRIX:
  * bit j of the result is set iff the left-fold dot product of the
  * vector with plane j is strictly positive.
  *
  * Why a native loop and not `Σ_j when(graft_dot(v, lit(plane_j)) > 0,
  * 1<<j, 0)`: with [[graft.llm.Similarity.autoPlanes]] the plane count
  * scales as ⌈log₂N⌉, and the unrolled form puts nPlanes 64-element
  * array literals and nPlanes [[DotProduct]] nodes into the PLAN on
  * both join sides — at 15 planes the r7 probe measured ~1.7 s of
  * driver-side analysis/optimization/codegen per query build, 10× the
  * execution cost, the same plan-size trap [[ArgmaxCell]] closed for
  * the IVF family (there it was janino method limits; here the tree
  * walk itself). One expression holding a `double[][]` reference keeps
  * plan size AND generated code constant in nPlanes.
  *
  * Determinism contract: per plane the dot is [[DotProduct]]'s exact
  * LEFT-TO-RIGHT fold from 0.0 over double-widened elements, and the
  * `> 0` test matches the column form (`-0.0`/NaN excluded) — the
  * DuckDB oracle's per-plane `CASE WHEN d > 0` over the identical
  * `list_reduce` fold replays it bit-for-bit. Null array or null
  * element ⇒ NULL (the poisoned-sum semantics of the fold chain). */
case class PlaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 62,
    s"plane count must be in [1, 62] to fit a long bucket id, got ${planes.size}")

  @transient private lazy val planesArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isFloat = elemType == FloatType
    var bkt = 0L
    var j = 0
    while (j < planesArr.length) {
      val p = planesArr(j)
      val n = math.min(x.numElements(), p.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        acc += (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)) * p(i)
        i += 1
      }
      if (acc > 0) bkt |= 1L << j
      j += 1
    }
    bkt
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pm = ctx.addReferenceObj("planes", planesArr, "double[][]")
    val getElem = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _         => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val (j, i, n, acc, bkt, pv) = (
        ctx.freshName("j"), ctx.freshName("i"), ctx.freshName("n"),
        ctx.freshName("acc"), ctx.freshName("bkt"), ctx.freshName("pv"))
      s"""
         |long $bkt = 0L;
         |for (int $j = 0; $j < $pm.length && !${ev.isNull}; $j++) {
         |  double[] $pv = $pm[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $pv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${getElem(a, i)} * $pv[$i];
         |  }
         |  if ($acc > 0) $bkt |= 1L << $j;
         |}
         |${ev.value} = $bkt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneBucket =
    copy(child = newChild)

  override def prettyName: String = "graft_plane_bucket"
}
