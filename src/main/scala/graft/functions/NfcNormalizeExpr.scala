package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftBridge

/** Unicode NFC (canonical composition) as a native codegen'd expression —
  * the first step of training-corpus text normalization: the same visible
  * text can arrive composed (`é`) or decomposed (`e` + U+0301), and every
  * downstream exact/fingerprint dedup, shingle hash, and tokenizer treats
  * the two encodings as different documents unless a canonical form is
  * fixed at ingest.
  *
  * Spark has no normalization built-in, and a Scala UDF here would sit in
  * the hottest possible path (first transform touched by every document at
  * ingest, before any filter can reduce volume). This node stays inside
  * WholeStageCodegen: the kernel first scans for any code point >= 0x300
  * (the lowest combining/compatibility-relevant range) and returns the
  * input UTF8String UNCOPIED when none is present — the overwhelmingly
  * common all-ASCII document costs one byte scan and zero allocation;
  * only genuinely decorated text pays `java.text.Normalizer`.
  *
  * Cross-engine contract: Unicode canonical composition is fully specified
  * (stable under version skew for assigned code points), so DuckDB's
  * utf8proc `nfc_normalize` reproduces the JDK result exactly — oracle
  * `q_text_normalize` hash-checks the chain end to end.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  // declare the string contract so a non-string child fails at ANALYSIS
  // instead of throwing ClassCastException in every executor task at
  // runtime (ImplicitCastInputTypes would be the idiomatic mixin, but
  // AbstractDataType is private[sql] outside the Spark tree)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a STRING child, got ${child.dataType.sql}")
  override def prettyName: String = "nfc_normalize"

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def nullSafeEval(raw: Any): Any =
    NfcNormalize.normalize(raw.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.normalize($s);"
    })
}

object NfcNormalize {

  /** Shared interpreted/codegen kernel. The fast path reads raw UTF-8
    * bytes: any byte < 0xCC (the first lead byte that can start a code
    * point >= U+0300) cannot begin a sequence NFC would rewrite, so pure
    * ASCII and most Latin-1 text short-circuits without decoding. */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      // getByte returns signed; any byte >= 0xCC (lead of U+0300+) is
      // negative and < -52 in signed terms — conservative: fall through to
      // the real normalizer for ANY byte >= 0x80
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  def nfc(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
