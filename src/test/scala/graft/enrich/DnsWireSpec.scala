package graft.enrich

import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.DnsWire._

/** E2 DNS wire codec — golden bytes both directions (the BgpWire
  * discipline): the query packet the reference's dnssector gen::query
  * family emits (header + QNAME labels + PTR/IN), and response parsing
  * with full RFC 1035 §4.1.4 compression. */
class DnsWireSpec extends AnyFunSuite {

  private def hexOf(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString
  private def u16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private val ptrName = "200.1.168.192.IN-ADDR.ARPA."

  test("golden query bytes: PTR/IN with RD, label-encoded QNAME") {
    val q = encodeQuery(0x1234, ptrName)
    assert(hexOf(q) ==
      "1234" + "0100" + "0001" + "0000" + "0000" + "0000" +
        "03" + "323030" + // "200"
        "01" + "31" + // "1"
        "03" + "313638" + // "168"
        "03" + "313932" + // "192"
        "07" + "494e2d41444452" + // "IN-ADDR"
        "04" + "41525041" + // "ARPA"
        "00" + "000c" + "0001")
    // round-trip: the decoder reads its own packet back
    val m = decode(q)
    assert(m.tid == 0x1234 && !m.isResponse)
    assert(m.questions == Vector(Question(ptrName, TypePtr, ClassIn)))
    assert(m.answers.isEmpty && m.authority.isEmpty && m.additional.isEmpty)
  }

  test("encodeName: root, absolute/relative equal, label-size limits") {
    assert(hexOf(encodeName(".")) == "00")
    assert(encodeName("a.b.").sameElements(encodeName("a.b")))
    val max = "x" * 63
    assert(encodeName(s"$max.")(0) == 63.toByte)
    intercept[DnsError] { encodeName(("x" * 64) + ".com") }
    intercept[DnsError] { encodeName("a..b") }
  }

  /** The golden query with QR|RD|RA flags, ancount=1 and one PTR answer
    * whose NAME is a compression pointer to the question (offset 12). */
  private def goldenResponse(tid: Int, rdata: Array[Byte],
      rrType: Int = TypePtr): Array[Byte] = {
    val head = encodeQuery(tid, ptrName)
    head(2) = 0x81.toByte; head(3) = 0x80.toByte
    head(7) = 1 // ancount
    head ++ Array(0xc0.toByte, 0x0c.toByte) ++ u16(rrType) ++ u16(ClassIn) ++
      Array[Byte](0, 0, 0x0e, 0x10) ++ u16(rdata.length) ++ rdata
  }

  test("golden response: compressed owner name, PTR rdata, ttl") {
    val resp = goldenResponse(0x1234, encodeName("host.example.com."))
    val m = decode(resp)
    assert(m.isResponse && m.rcode == 0 && m.tid == 0x1234)
    assert(m.questions.head.qname == ptrName)
    val rr = m.answers.head
    assert(rr.name == ptrName) // pointer resolved to the question name
    assert(rr.rrType == TypePtr && rr.rrClass == ClassIn && rr.ttl == 3600L)
    assert(m.rdataName(rr) == "host.example.com.")
  }

  test("compression INSIDE rdata resolves against the whole message") {
    // rdata = "mail" + pointer to the "168.192.IN-ADDR.ARPA." suffix of
    // the question name (offset 12 + 1+3 + 1+1 = 18): a cross-record jump
    val rdata = encodeName("mail").dropRight(1) ++ Array(0xc0.toByte, 18.toByte)
    val m = decode(goldenResponse(7, rdata))
    assert(m.rdataName(m.answers.head) == "mail.168.192.IN-ADDR.ARPA.")
  }

  test("malformed packets throw the typed error, never loop") {
    val good = goldenResponse(1, encodeName("h.example."))
    // every truncation of a valid packet is a typed failure
    (0 until good.length).foreach { n =>
      val t = intercept[Throwable] { decode(java.util.Arrays.copyOfRange(good, 0, n)) }
      assert(t.isInstanceOf[DnsError], s"cut=$n threw $t")
    }
    // self-pointing compression pointer: loop guard fires
    val loop = encodeQuery(2, "a.b.")
    loop(12) = 0xc0.toByte; loop(13) = 0x0c.toByte
    intercept[DnsError] { decode(loop) }
    // reserved label type 0x80
    val reserved = encodeQuery(3, "a.b.")
    reserved(12) = 0x80.toByte
    intercept[DnsError] { decode(reserved) }
  }

  test("electServer: first QNAME byte modulo pool size (whoissvc.rs:348)") {
    // '2' = 0x32 = 50; 50 % 3 = 2
    assert(electServer(ptrName, Seq("a", "b", "c")) == "c")
    assert(electServer("4.3.2.1.in-addr.arpa.", Seq("a", "b", "c")) == "b") // '4'=52, 52%3=1
    intercept[IllegalArgumentException] { electServer("x", Nil) }
  }

  test("queryPtr: full exchange over a stub socket, reference validations") {
    var sawServer = ""
    var sawPacket: Array[Byte] = null
    def transport(answer: Int => Array[Byte])(pkt: Array[Byte], srv: String) = {
      sawServer = srv; sawPacket = pkt
      answer(decode(pkt).tid)
    }
    // happy path: the PTR name comes back
    val got = queryPtr(0xbeef, ptrName, Seq("r1", "r2"),
      transport(tid => goldenResponse(tid, encodeName("host.example.com."))))
    assert(got == "host.example.com.")
    assert(sawServer == "r1") // '2'=50, 50%2=0
    assert(hexOf(sawPacket) == hexOf(encodeQuery(0xbeef, ptrName)))
    // tid mismatch → the reference's "Unexpected DNS response"
    val e1 = intercept[DnsError] { queryPtr(5, ptrName, Seq("r"),
      transport(_ => goldenResponse(6, encodeName("h.")))) }
    assert(e1.getMessage == "Unexpected DNS response")
    // echoed-question mismatch → same error
    val e2 = intercept[DnsError] { queryPtr(5, ptrName, Seq("r"),
      (pkt: Array[Byte], _: String) => {
        val other = goldenResponse(5, encodeName("h."))
        // swap the question bytes for a different name of equal length
        val wrong = encodeQuery(5, "201.1.168.192.IN-ADDR.ARPA.")
        wrong(2) = 0x81.toByte; wrong(3) = 0x80.toByte; wrong(7) = 1
        wrong ++ other.drop(wrong.length)
      }) }
    assert(e2.getMessage == "Unexpected DNS response")
    // an answer set with no PTR record → "Not found" (whoissvc.rs:392)
    val e3 = intercept[DnsError] { queryPtr(5, ptrName, Seq("r"),
      transport(tid => goldenResponse(tid, encodeName("h."), rrType = 16))) }
    assert(e3.getMessage == "Not found")
    // case-insensitive question echo (resolvers may 0x20-mix): accepted
    val upper = queryPtr(9, ptrName.toLowerCase, Seq("r"),
      (pkt: Array[Byte], _: String) => {
        val resp = goldenResponse(9, encodeName("h.example."))
        resp // question echoed in the ORIGINAL (upper) case
      })
    assert(upper == "h.example.")
  }
}
