package graft.enrich

/** DNS wire codec for the reverse-PTR enrichment path (E2) — the packet
  * half the reference delegates to the dnssector crate
  * (src/whoissvc.rs:329-394 `do_query_dns`: gen::query builds the UDP
  * packet, DNSSector parses the response, the tid + question are
  * verified and the first type-12 answer's labels become the result).
  * Everything here is pure bytes→values — the ONLY thing left injectable
  * is the UDP socket itself, the same posture the BGP FSM earned
  * (sources/SessionTransport.scala): wire codec in-engine and
  * golden-byte specced, transport at the boundary.
  *
  * Encoding follows RFC 1035 §4: 12-byte header, QNAME as length-
  * prefixed labels, QTYPE/QCLASS big-endian. Decoding implements the
  * full §4.1.4 message-compression scheme (pointer chasing with a loop
  * guard) — the reference's own rdata label walk stops at the first
  * compression pointer (whoissvc.rs:371-388 reads raw rdata bytes and
  * breaks on an out-of-range length, which is what a 0xC0 pointer byte
  * looks like to it); this decoder resolves pointers per the RFC, a
  * strict superset that returns the full name where the reference would
  * truncate. Malformed input throws the typed [[DnsError]]. */
object DnsWire {

  final class DnsError(msg: String) extends RuntimeException(msg)

  val TypePtr = 12
  val ClassIn = 1

  /** One parsed resource record. `rdata` is the raw slice; for
    * name-typed rdata (PTR/NS/CNAME) use [[Message.rdataName]] so
    * compression pointers into the whole message resolve. */
  final case class Rr(name: String, rrType: Int, rrClass: Int, ttl: Long,
      rdataOffset: Int, rdataLen: Int)

  final case class Question(qname: String, qtype: Int, qclass: Int)

  /** A parsed message, keeping the raw bytes so rdata names can chase
    * compression pointers anywhere in the packet. */
  final case class Message(bytes: Array[Byte], tid: Int, flags: Int,
      questions: Vector[Question], answers: Vector[Rr],
      authority: Vector[Rr], additional: Vector[Rr]) {
    def isResponse: Boolean = (flags & 0x8000) != 0
    def rcode: Int = flags & 0xf
    /** Decode an RR's rdata as a (possibly compressed) domain name. */
    def rdataName(rr: Rr): String = readName(bytes, rr.rdataOffset)._1
  }

  // ------------------------------------------------------------ encoding

  /** QNAME → length-prefixed label bytes + root terminator. A trailing
    * dot is the root (absolute names, the [[Whois.ptrQueryName]] form);
    * empty labels or labels over 63 octets are invalid per RFC 1035. */
  def encodeName(name: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val trimmed = if (name.endsWith(".")) name.dropRight(1) else name
    if (trimmed.nonEmpty) trimmed.split('.').foreach { label =>
      val b = label.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      if (b.isEmpty || b.length > 63)
        throw new DnsError(s"bad label '$label' in $name")
      out.write(b.length); out.write(b)
    }
    out.write(0)
    out.toByteArray
  }

  /** A complete query packet: header (tid, flags, counts) + one
    * question. `recursionDesired` sets RD (0x0100), the standard
    * stub-resolver form. The tid is caller-supplied so tests are
    * deterministic and the server can randomize per request. */
  def encodeQuery(tid: Int, qname: String, qtype: Int = TypePtr,
      qclass: Int = ClassIn, recursionDesired: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    u16(tid & 0xffff)
    u16(if (recursionDesired) 0x0100 else 0x0000)
    u16(1); u16(0); u16(0); u16(0)
    out.write(encodeName(qname))
    u16(qtype); u16(qclass)
    out.toByteArray
  }

  // ------------------------------------------------------------ decoding

  /** Name at `off`, following §4.1.4 compression pointers. Returns
    * (dotted name with trailing '.', offset after the name AS READ —
    * i.e. after the first pointer if one was taken). A pointer loop or
    * out-of-range jump throws. */
  private[enrich] def readName(b: Array[Byte], off: Int): (String, Int) = {
    val sb = new StringBuilder
    var p = off
    var end = -1 // offset after the name at the original position
    var jumps = 0
    var done = false
    while (!done) {
      if (p < 0 || p >= b.length) throw new DnsError(s"name runs off packet at $p")
      val len = b(p) & 0xff
      if (len == 0) {
        if (end < 0) end = p + 1
        done = true
      } else if ((len & 0xc0) == 0xc0) {
        if (p + 1 >= b.length) throw new DnsError("truncated compression pointer")
        if (end < 0) end = p + 2
        jumps += 1
        if (jumps > 64) throw new DnsError("compression pointer loop")
        p = ((len & 0x3f) << 8) | (b(p + 1) & 0xff)
      } else if ((len & 0xc0) != 0) {
        throw new DnsError(f"reserved label type 0x$len%02x")
      } else {
        if (p + 1 + len > b.length) throw new DnsError("label runs off packet")
        sb.append(new String(b, p + 1, len,
          java.nio.charset.StandardCharsets.US_ASCII)).append('.')
        p += 1 + len
      }
    }
    (if (sb.isEmpty) "." else sb.toString, end)
  }

  def decode(bytes: Array[Byte]): Message = {
    if (bytes.length < 12) throw new DnsError("packet shorter than header")
    def u16(i: Int): Int = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    val (tid, flags) = (u16(0), u16(2))
    val (qd, an, ns, ar) = (u16(4), u16(6), u16(8), u16(10))
    var p = 12
    val qs = Vector.fill(qd) {
      val (n, after) = readName(bytes, p)
      if (after + 4 > bytes.length) throw new DnsError("truncated question")
      val q = Question(n, u16(after), u16(after + 2))
      p = after + 4
      q
    }
    def rrs(n: Int): Vector[Rr] = Vector.fill(n) {
      val (nm, after) = readName(bytes, p)
      if (after + 10 > bytes.length) throw new DnsError("truncated RR header")
      val rdlen = u16(after + 8)
      if (after + 10 + rdlen > bytes.length) throw new DnsError("truncated rdata")
      val rr = Rr(nm, u16(after), u16(after + 2),
        ((u16(after + 4).toLong << 16) | u16(after + 6).toLong) & 0xffffffffL,
        after + 10, rdlen)
      p = after + 10 + rdlen
      rr
    }
    Message(bytes, tid, flags, qs, rrs(an), rrs(ns), rrs(ar))
  }

  // ------------------------------------------------- the reference flow

  /** Server election (whoissvc.rs:348-350): the first byte of the query
    * NAME modulo the server count — the reference's cheap deterministic
    * spread across its configured resolvers. */
  def electServer[A](qname: String, servers: Seq[A]): A = {
    require(servers.nonEmpty, "no DNS servers configured")
    servers((qname.getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)(0) & 0xff) % servers.length)
  }

  /** The full `do_query_dns` exchange minus the socket: build the PTR
    * query for an already-reversed `qname`, send it through `transport`
    * (packet, elected server) → response bytes, then apply the
    * reference's validation — tid must match, the echoed question must
    * match (whoissvc.rs:362-367 "Unexpected DNS response") — and return
    * the first type-12 answer's name ("Not found" when no PTR answer,
    * whoissvc.rs:369-392). */
  def queryPtr[A](tid: Int, qname: String, servers: Seq[A],
      transport: (Array[Byte], A) => Array[Byte]): String = {
    val packet = encodeQuery(tid, qname)
    val resp = decode(transport(packet, electServer(qname, servers)))
    val expect = Question(
      (if (qname.endsWith(".")) qname else qname + ".").toLowerCase, TypePtr, ClassIn)
    val echoed = resp.questions.headOption.map(q =>
      q.copy(qname = q.qname.toLowerCase))
    if (resp.tid != tid || !echoed.contains(expect) || !resp.isResponse)
      throw new DnsError("Unexpected DNS response")
    resp.answers.find(_.rrType == TypePtr) match {
      case Some(rr) => resp.rdataName(rr)
      case None => throw new DnsError("Not found")
    }
  }
}
