package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-entropy statistics in ONE native pass:
  * `struct(n_chars INT, n_distinct INT, qsum LONG)` where qsum is
  * Σ_c round(p_c·ln(p_c)·1e9) over the row's character frequencies —
  * the integer-quantized entropy sum ([[graft.llm.TextAnalysis
  * .charEntropy]] divides by -1e9 and rounds to 6dp).
  *
  * Why native: the column formulation needs per-character lambdas
  * (`aggregate`/`transform` higher-order functions), which Spark
  * evaluates INTERPRETED — measured 10.8 s (O(distinct·len) filtered
  * counts) and 5.2 s (sorted-run fold) for the sf0.1 corpus where this
  * expression does the same work in one tight char loop per row. The
  * counting fast path is an int[128] ASCII table with a HashMap
  * fallback for anything wider, so arbitrary BMP text still works.
  *
  * Determinism contract: frequencies are integer-exact; each term is
  * p·ln(p) in double (java.lang.Math.log — the same libm call the
  * column form's `log` makes) quantized HALF-AWAY-FROM-ZERO to a 1e-9
  * fixed-point long (matching Spark's and DuckDB's `round` on the
  * magnitudes involved); the SUM of longs is order-free. Characters
  * are counted as UTF-16 code units, identical to the regex-split
  * column formulation this replaces (pure-BMP corpora — including all
  * ASCII — are unaffected; the DuckDB oracle counts codepoints, which
  * coincides for BMP text). NULL input ⇒ NULL. */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("qsum", LongType, nullable = false)))

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

  /** HALF_UP on the absolute value — what both Spark's `round` (BigDecimal
    * HALF_UP) and DuckDB's `round` do for doubles. */
  private def roundHalfAway(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong

  /** The whole computation for one row; also the codegen target. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length
    val ascii = new Array[Int](128)
    var wide: java.util.HashMap[Character, Array[Int]] = null
    var i = 0
    while (i < len) {
      val c = str.charAt(i)
      if (c < 128) ascii(c) += 1
      else {
        if (wide == null) wide = new java.util.HashMap()
        val slot = wide.get(c)
        if (slot == null) wide.put(c, Array(1)) else slot(0) += 1
      }
      i += 1
    }
    var qsum = 0L
    var distinct = 0
    val n = len.toDouble
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) {
        distinct += 1
        val p = c / n
        qsum += roundHalfAway(p * math.log(p) * 1e9)
      }
      j += 1
    }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) {
        distinct += 1
        val p = it.next()(0) / n
        qsum += roundHalfAway(p * math.log(p) * 1e9)
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](len, distinct, qsum))
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call into this object per row — the loop itself is
    // already compiled JVM bytecode, so inlining it into janino source
    // would only add compile time
    val self = ctx.addReferenceObj("charEntropyStats", this,
      classOf[CharEntropyStats].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropyStats = copy(child = newChild)

  override def prettyName: String = "graft_char_entropy_stats"
}
