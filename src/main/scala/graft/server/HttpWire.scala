package graft.server

import java.io.InputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Pure HTTP/1.1 + RFC 6455 wire codecs for the embedded server — every
  * byte-level rule lives here, golden-specced without sockets; the socket
  * loop ([[GraftServer]]) only moves these buffers.
  *
  * The reference serves its API through hyper and upgrades `/api/ws` to a
  * WebSocket (src/main.rs:104-138); this is the JDK-only equivalent of the
  * small slice of both protocols that surface needs: GET request heads,
  * fixed-length responses, and server-side text/close/ping frames.
  */
object HttpWire {

  /** Parsed request head. Header names are lower-cased (RFC 7230 §3.2:
    * field names are case-insensitive); last repeated header wins. */
  case class RequestHead(method: String, path: String,
      headers: Map[String, String]) {
    def header(name: String): Option[String] = headers.get(name.toLowerCase)

    /** RFC 6455 §4.2.1 upgrade detection: Upgrade: websocket +
      * Connection containing "upgrade" + a Sec-WebSocket-Key. */
    def isWsUpgrade: Boolean =
      header("upgrade").exists(_.equalsIgnoreCase("websocket")) &&
        header("connection").exists(_.toLowerCase.split(',')
          .exists(_.trim == "upgrade")) &&
        header("sec-websocket-key").isDefined
  }

  /** Parse "METHOD /path HTTP/1.1\r\nName: value\r\n..." (the head only —
    * the server reads up to the blank line before calling this). Malformed
    * heads yield None → the connection is dropped, mirroring hyper's
    * parse-failure behavior rather than guessing. */
  def parseRequestHead(head: String): Option[RequestHead] = {
    val lines = head.split("\r\n").toSeq.filter(_.nonEmpty)
    lines.headOption.map(_.split(" ", 3)) match {
      case Some(Array(method, path, version)) if version.startsWith("HTTP/") =>
        val hdrs = lines.tail.flatMap { l =>
          l.indexOf(':') match {
            case -1 => None
            case i => Some(l.substring(0, i).trim.toLowerCase ->
              l.substring(i + 1).trim)
          }
        }.toMap
        Some(RequestHead(method, path, hdrs))
      case _ => None
    }
  }

  private val reasons = Map(200 -> "OK", 101 -> "Switching Protocols",
    400 -> "Bad Request", 404 -> "Not Found", 500 -> "Internal Server Error")

  /** A complete fixed-length HTTP/1.1 response. `contentType` None mirrors
    * the reference's file responses, which carry no Content-type header
    * (src/main.rs:59-66). */
  def response(status: Int, body: Array[Byte],
      contentType: Option[String] = None): Array[Byte] = {
    val head = new StringBuilder
    head.append(s"HTTP/1.1 $status ${reasons.getOrElse(status, "")}\r\n")
    contentType.foreach(ct => head.append(s"Content-type: $ct\r\n"))
    head.append(s"Content-length: ${body.length}\r\n\r\n")
    head.toString.getBytes(UTF_8) ++ body
  }

  /** The 101 upgrade response (reference: src/main.rs:127-137 sets
    * Upgrade/Connection/Sec-WebSocket-Accept on SWITCHING_PROTOCOLS). */
  def upgradeResponse(wsKey: String): Array[Byte] =
    ("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\n" +
      "Connection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${wsAccept(wsKey)}\r\n\r\n").getBytes(UTF_8)

  /** RFC 6455 §4.2.2: base64(SHA-1(key + fixed GUID)). */
  def wsAccept(key: String): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8))
    java.util.Base64.getEncoder.encodeToString(sha)
  }

  // WebSocket opcodes (RFC 6455 §5.2)
  val OpText = 0x1; val OpBinary = 0x2
  val OpClose = 0x8; val OpPing = 0x9; val OpPong = 0xa

  case class WsFrame(opcode: Int, fin: Boolean, payload: Array[Byte]) {
    def text: String = new String(payload, UTF_8)
  }

  /** Encode a server→client frame: FIN set, UNMASKED (RFC 6455 §5.1 — a
    * server MUST NOT mask). Payload length uses the 7/16/64-bit ladder. */
  def encodeFrame(opcode: Int, payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val head =
      if (n <= 125) Array((0x80 | opcode).toByte, n.toByte)
      else if (n <= 0xffff)
        Array((0x80 | opcode).toByte, 126.toByte,
          (n >> 8).toByte, n.toByte)
      else
        Array((0x80 | opcode).toByte, 127.toByte) ++
          (56 to 0 by -8).map(s => ((n.toLong >> s) & 0xff).toByte)
    head ++ payload
  }

  def encodeText(s: String): Array[Byte] = encodeFrame(OpText, s.getBytes(UTF_8))

  /** Close frame with a 2-byte big-endian status code (§5.5.1). */
  def encodeClose(code: Int = 1000): Array[Byte] =
    encodeFrame(OpClose, Array((code >> 8).toByte, code.toByte))

  /** Read one client→server frame. Returns None on EOF. Client frames MUST
    * be masked (§5.1) — an unmasked frame fails the read (protocol error;
    * the server answers close 1002 and drops). Control frames over 125
    * bytes are likewise protocol errors (§5.5). */
  def readFrame(in: InputStream): Option[WsFrame] = {
    def byte(): Int = in.read()
    val b0 = byte(); if (b0 < 0) return None
    val b1 = byte(); if (b1 < 0) return None
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0f
    val masked = (b1 & 0x80) != 0
    if (!masked) throw new WsProtocolError("unmasked client frame")
    val len7 = b1 & 0x7f
    if (opcode >= OpClose && (len7 > 125 || !fin))
      throw new WsProtocolError("oversized or fragmented control frame")
    val len: Long = len7 match {
      case 126 => (0 until 2).foldLeft(0L)((a, _) => (a << 8) | readByteOrFail(in))
      case 127 => (0 until 8).foldLeft(0L)((a, _) => (a << 8) | readByteOrFail(in))
      case n => n.toLong
    }
    if (len > MaxFrameBytes)
      throw new WsProtocolError(s"frame of $len bytes exceeds cap $MaxFrameBytes")
    val mask = Array.fill(4)(readByteOrFail(in).toByte)
    val payload = new Array[Byte](len.toInt)
    var off = 0
    while (off < len) {
      val r = in.read(payload, off, len.toInt - off)
      if (r < 0) throw new WsProtocolError("EOF inside frame payload")
      off += r
    }
    var i = 0
    while (i < payload.length) {
      payload(i) = (payload(i) ^ mask(i & 3)).toByte; i += 1
    }
    Some(WsFrame(opcode, fin, payload))
  }

  /** Inbound text cap — a subscribe command is tens of bytes; anything
    * beyond this is a client error, not a buffer to allocate. */
  val MaxFrameBytes: Long = 1L << 20

  final class WsProtocolError(msg: String) extends RuntimeException(msg)

  private def readByteOrFail(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new WsProtocolError("EOF inside frame header")
    b
  }

  // ------------------------------------------------ client-side helpers
  // (spec use only: the ServerSpec drives the server as a raw socket
  // client, which needs masked frames — RFC 6455 §5.1 client rules)

  /** Encode a MASKED client frame with the given mask key. */
  def encodeClientFrame(opcode: Int, payload: Array[Byte],
      mask: Array[Byte]): Array[Byte] = {
    require(mask.length == 4, "mask key is 4 bytes")
    val n = payload.length
    val head =
      if (n <= 125) Array((0x80 | opcode).toByte, (0x80 | n).toByte)
      else if (n <= 0xffff)
        Array((0x80 | opcode).toByte, (0x80 | 126).toByte,
          (n >> 8).toByte, n.toByte)
      else
        Array((0x80 | opcode).toByte, (0x80 | 127).toByte) ++
          (56 to 0 by -8).map(s => ((n.toLong >> s) & 0xff).toByte)
    val masked = payload.zipWithIndex.map { case (b, i) =>
      (b ^ mask(i & 3)).toByte
    }
    head ++ mask ++ masked
  }

  /** Read one UNMASKED server→client frame (spec-side decode). */
  def readServerFrame(in: InputStream): Option[WsFrame] = {
    val b0 = in.read(); if (b0 < 0) return None
    val b1 = in.read(); if (b1 < 0) return None
    val len: Long = (b1 & 0x7f) match {
      case 126 => (0 until 2).foldLeft(0L)((a, _) => (a << 8) | readByteOrFail(in))
      case 127 => (0 until 8).foldLeft(0L)((a, _) => (a << 8) | readByteOrFail(in))
      case n => n.toLong
    }
    val payload = new Array[Byte](len.toInt)
    var off = 0
    while (off < len) {
      val r = in.read(payload, off, len.toInt - off)
      if (r < 0) return None
      off += r
    }
    Some(WsFrame(b0 & 0x0f, (b0 & 0x80) != 0, payload))
  }
}
