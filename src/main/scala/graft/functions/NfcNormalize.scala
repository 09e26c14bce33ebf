package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a native
  * expression — the first stage of every web-text ingestion pipeline
  * (CCNet/C4 normalize before tokenizing, fingerprinting, or deduping:
  * "Café" spelled e+U+0301 and é must hash identically or every
  * downstream exact-dedup and shingle operator silently misses pairs).
  *
  * Why native: Spark ships no normalization function, and a UDF would
  * break whole-stage codegen for the hot path of every query that
  * chains this ahead of hashing. The implementation is the JDK's
  * ICU-derived `java.text.Normalizer` — the same Unicode 15 NFC tables
  * DuckDB's `nfc_normalize` implements, so the oracle is exact on any
  * input, not just the fixtures.
  *
  * Fast path: `Normalizer.isNormalized` is a table-driven quick-check
  * (NFC_QC) that is O(n) with a tiny constant and true for all-ASCII
  * rows — the overwhelming majority of a web corpus — in which case the
  * input UTF8String is returned as-is, zero allocation. NULL ⇒ NULL. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
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

  /** The whole computation for one row; also the codegen target. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row into compiled bytecode — the
    // CharEntropyStats treatment (inlining the JDK normalizer into
    // janino source is impossible anyway)
    val self = ctx.addReferenceObj("nfcNormalize", this,
      classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)

  override def prettyName: String = "graft_nfc_normalize"
}
