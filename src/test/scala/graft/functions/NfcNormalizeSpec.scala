package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestBase

/** The native NFC expression: kernel parity with java.text.Normalizer,
  * the ASCII zero-copy fast path, and the full normalizeText chain.
  * Inputs are built from explicit \\u escapes so the decomposed forms
  * survive any source-file re-encoding. */
class NfcNormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val decomposed = Seq(
    "Cafe\u0301",            // e + combining acute -> \u00e9
    "nai\u0308ve",           // i + combining diaeresis -> \u00ef
    "A\u030Angstro\u0308m", // A + ring, o + diaeresis
    "d\u0323\u0307",        // canonical order: dot-below then dot-above
    "d\u0307\u0323")        // wrong order: NFC must reorder then compose

  test("kernel equals java.text.Normalizer on decorated and plain text") {
    val inputs = decomposed ++ Seq("plain ascii", "", "déjà vu",
      "汉字 text")
    inputs.foreach { s =>
      val got = NfcNormalize.normalize(UTF8String.fromString(s)).toString
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(got == want, s"NFC of ${s.map(_.toInt.toHexString)}")
    }
  }

  test("ASCII fast path returns the input object uncopied") {
    val in = UTF8String.fromString("only ascii here 123")
    assert(NfcNormalize.normalize(in) eq in)
    // already-normalized non-ASCII also avoids the re-encode
    val composed = UTF8String.fromString("déjà")
    assert(NfcNormalize.normalize(composed) eq composed)
  }

  test("codegen path composes; null stays null") {
    val df = (decomposed.map(Option(_)) :+ None).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val out = df.select(col("id"), NfcNormalize.nfc(col("s")).as("n"))
      .orderBy(col("id")).collect()
    decomposed.zipWithIndex.foreach { case (s, i) =>
      assert(out(i).getString(1) ==
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    assert(out.last.isNullAt(1))
  }

  test("normalizeText: NFC + control strip + whitespace collapse + trim") {
    // combining acute composes, VT/FF stripped, tab/newlines collapse
    val raw = " a\u0301b\u000B cd \t\r\n e  f\u000C "
    val got = Seq(Tuple1(raw)).toDF("t")
      .select(graft.pipeline.TextAnalysis.normalizeText(col("t")))
      .head.getString(0)
    assert(got == "áb cd e f")
  }
}
