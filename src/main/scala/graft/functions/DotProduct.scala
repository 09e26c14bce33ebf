package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen dot product over two numeric arrays (float or double
  * elements), returning double.
  *
  * Replaces the `aggregate(zip_with(a, b, _*_), 0d, _+_)` higher-order
  * chain in the similarity operators: HOFs are interpreted per element
  * (lambda dispatch + boxing), while this generates a tight primitive
  * loop inside whole-stage codegen — the hot path of every kNN/cosine
  * operator.
  *
  * SEMANTICS ARE BIT-FOR-BIT THE FOLD'S: elements are widened to double,
  * multiplied pairwise, and accumulated LEFT TO RIGHT starting from 0.0 —
  * the exact IEEE sequence the DuckDB oracles replicate
  * (`list_reduce([0.0] || list_transform(...), +)`), so swapping the
  * implementation cannot move a single result bit.
  *
  * Element types may differ (float × double widens the float — exact, so
  * e.g. raw `array<float>` embeddings pair with double hyperplane
  * literals with no conversion pass). Rows where either side is NULL
  * yield NULL. Element counts are taken from the shorter array (zip
  * semantics); embedding columns are fixed-width so this never triggers
  * in practice.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (okType(left) && okType(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires array<float>/array<double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  // A null ARRAY or any null ELEMENT in the zipped range yields NULL —
  // exactly the HOF fold's semantics (a null product poisons the sum).
  override def nullable: Boolean = true

  private def getter(t: DataType, x: ArrayData, i: Int): Double = t match {
    case FloatType => x.getFloat(i).toDouble
    case _         => x.getDouble(i)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += getter(lt, x, i) * getter(rt, y, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(t: DataType) = t match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _         => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    val (getL, getR) = (get(elemType(left)), get(elemType(right)))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    $acc += ${getL(a, i)} * ${getR(b, i)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
