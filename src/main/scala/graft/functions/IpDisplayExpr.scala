package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftBridge

/** Native Catalyst expression rendering a prefix struct
  * `<version, ip_hi, ip_lo, prefix_len>` to its canonical display string —
  * v4 dotted quad, v6 RFC-5952 `::`-compressed (longest zero-group run,
  * leftmost on tie, lowercase, no leading zeros), optionally followed by
  * `/len`. Matches Rust `IpAddr`/`Ipv6Addr` Display, which the reference
  * uses for JSON keys and regex-match subjects (src/bgpsvc.rs:635,
  * src/ribfilter.rs:1463-1470; golden corpus src/ribfilter.rs:1655-1758).
  *
  * The composed-builtins form statically unrolls the 28 possible zero-run
  * windows into a `when` chain; Catalyst trees have no subexpression
  * sharing, so that expression is ~1400 nodes and dominated the ingest
  * write (measured at sf0.1: deriving + writing `attr_strs`/`prefix_str`
  * cost ~15 s of a 22 s materialization). This node renders in one
  * straight-line kernel call under WholeStageCodegen.
  */
case class PfxDisplay(child: Expression, withLen: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = if (withLen) "pfx_str" else "addr_str"

  override protected def withNewChildInternal(newChild: Expression): PfxDisplay =
    copy(child = newChild)

  override def nullSafeEval(raw: Any): Any = {
    val pfx = raw.asInstanceOf[InternalRow]
    PfxDisplay.render(pfx.getByte(0), pfx.getLong(1), pfx.getLong(2),
      pfx.getInt(3), withLen)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, pfx => {
      val cls = PfxDisplay.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = $cls.render(
         |  $pfx.getByte(0), $pfx.getLong(1), $pfx.getLong(2), $pfx.getInt(3), $withLen);
       """.stripMargin
    })
}

object PfxDisplay {
  /** Display kernel shared by interpreted eval and codegen. v4 lives in the
    * low 32 bits of ip_lo; v6 groups big-endian across (ip_hi, ip_lo). */
  def render(ver: Byte, hi: Long, lo: Long, plen: Int, withLen: Boolean): UTF8String = {
    val sb = new java.lang.StringBuilder(48)
    if (ver == 4) {
      val v = lo & 0xFFFFFFFFL
      sb.append((v >>> 24) & 0xFF).append('.').append((v >>> 16) & 0xFF)
        .append('.').append((v >>> 8) & 0xFF).append('.').append(v & 0xFF)
    } else {
      val g = new Array[Int](8)
      var i = 0
      while (i < 8) {
        val src = if (i < 4) hi else lo
        g(i) = ((src >>> ((3 - (i & 3)) << 4)) & 0xFFFFL).toInt
        i += 1
      }
      // RFC 5952 §4.2: longest run of ≥2 zero groups, leftmost on tie
      var bestS = -1
      var bestL = 1 // runs of length 1 stay uncompressed
      var s = 0
      while (s < 8) {
        if (g(s) == 0) {
          var e = s
          while (e < 8 && g(e) == 0) e += 1
          if (e - s > bestL) { bestL = e - s; bestS = s }
          s = e
        } else s += 1
      }
      if (bestS < 0) {
        i = 0
        while (i < 8) {
          if (i > 0) sb.append(':')
          sb.append(java.lang.Integer.toHexString(g(i)))
          i += 1
        }
      } else {
        i = 0
        while (i < bestS) {
          if (i > 0) sb.append(':')
          sb.append(java.lang.Integer.toHexString(g(i)))
          i += 1
        }
        sb.append("::")
        i = bestS + bestL
        var first = true
        while (i < 8) {
          if (!first) sb.append(':')
          sb.append(java.lang.Integer.toHexString(g(i)))
          first = false
          i += 1
        }
      }
    }
    if (withLen) sb.append('/').append(plen)
    UTF8String.fromString(sb.toString)
  }

  /** Column wrappers: drop-ins for the composed IpFns display forms. */
  def pfx(p: Column): Column =
    GraftBridge.column(PfxDisplay(GraftBridge.expression(p), withLen = true))
  def addr(p: Column): Column =
    GraftBridge.column(PfxDisplay(GraftBridge.expression(p), withLen = false))
}
