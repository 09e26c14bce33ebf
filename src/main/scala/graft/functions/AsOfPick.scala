package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** As-of pick over a PRE-SORTED per-key history array: the
  * lexicographically-largest `struct(ts, values…)` element whose
  * timestamp is `<= ts` (and `>= ts − ttlSeconds` when `ttlSeconds > 0`),
  * or NULL when no element qualifies.
  *
  * This is the per-row half of the contracted stream-static as-of join
  * ([[graft.streaming.StreamingOps.enrichAsOf]]): the feature side is
  * aggregated ONCE per key into a `sort_array(collect_list(struct(ts,
  * v…)))` history, the join becomes 1:1 on the key, and the latest-pick
  * is an O(log h) binary search here instead of a (entity × features-
  * in-TTL) pair explosion feeding a stateful max_by aggregation — the
  * guide-§8 move (decide with small rows; the history relation is
  * key-cardinality-sized, not event-sized).
  *
  * Why native: the column formulation (`element_at(filter(hist, x ->
  * …), -1)`) walks the whole array through an INTERPRETED lambda per
  * entity row (the CharEntropyStats lesson: measured 10.8 s where a
  * native pass costs 0.06 s); this expression does one binary search
  * over the unsafe array per row and codegens as a single call.
  *
  * Tie semantics: the array is sorted ascending lexicographically over
  * the whole struct, so equal timestamps resolve to the largest value
  * tuple — a deterministic refinement of the previous `max_by(struct,
  * ts)` formulation, whose tie winner was unspecified. NULL history,
  * NULL ts, or a history whose qualifying prefix is all NULL-ts rows
  * (sorted first) yield NULL, matching the old join's null-intolerant
  * range condition. */
case class AsOfPick(hist: Expression, ts: Expression, ttlSeconds: Long)
    extends BinaryExpression {

  override def left: Expression = hist
  override def right: Expression = ts

  private lazy val elemType: StructType = hist.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def dataType: DataType = elemType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (hist.dataType, ts.dataType) match {
      case (ArrayType(s: StructType, _), TimestampType)
          if s.nonEmpty && s.head.dataType == TimestampType =>
        TypeCheckResult.TypeCheckSuccess
      case (h, t) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<struct<ts timestamp, …>>, " +
            s"timestamp), got (${h.catalogString}, ${t.catalogString})")
    }

  /** The whole pick for one row; also the codegen target. */
  def compute(arr: ArrayData, tsMicros: Long): InternalRow = {
    val n = arr.numElements()
    val nf = elemType.length
    // last index whose timestamp key (NULL element or NULL ts ⇒ −∞,
    // i.e. sorted first and never a winner) is <= tsMicros — the key
    // sequence is non-decreasing because the array is sorted ascending
    var lo = 0
    var hi = n - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val key =
        if (arr.isNullAt(mid)) Long.MinValue
        else {
          val row = arr.getStruct(mid, nf)
          if (row.isNullAt(0)) Long.MinValue else row.getLong(0)
        }
      if (key <= tsMicros) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (ans < 0 || arr.isNullAt(ans)) return null
    val row = arr.getStruct(ans, nf)
    if (row.isNullAt(0)) return null
    // TTL lower bound needs checking only on the LATEST qualifier:
    // every earlier element is older still
    if (ttlSeconds > 0 && row.getLong(0) < tsMicros - ttlSeconds * 1000000L)
      return null
    // copy: the unsafe struct is a view into the array buffer, which
    // downstream operators may buffer past this row's lifetime
    row.copy()
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call into this object per row — the binary search is
    // already compiled JVM bytecode (the CharEntropyStats idiom)
    val self = ctx.addReferenceObj("asOfPick", this,
      classOf[AsOfPick].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  $self.compute($a, $b);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsOfPick =
    copy(hist = newLeft, ts = newRight)

  override def prettyName: String = "graft_asof_pick"
}
