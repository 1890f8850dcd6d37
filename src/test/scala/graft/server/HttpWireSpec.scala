package graft.server

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Golden wire bytes for the HTTP/WS codecs — byte-exact pins, no sockets.
  * The Sec-WebSocket-Accept golden is RFC 6455 §1.3's own worked example;
  * the masking golden is the RFC's §5.7 masked "Hello". */
class HttpWireSpec extends AnyFunSuite {
  import HttpWire._

  test("request head parse: method, path, case-insensitive headers") {
    val head = "GET /api/json/ipv4u?filter=10.0.0.0/8 HTTP/1.1\r\n" +
      "Host: localhost\r\nUPGRADE: websocket\r\nConnection: keep-alive, Upgrade\r\n" +
      "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n\r\n"
    val r = parseRequestHead(head).get
    assert(r.method == "GET")
    assert(r.path == "/api/json/ipv4u?filter=10.0.0.0/8")
    assert(r.header("upgrade").contains("websocket"))
    assert(r.header("UpGrAdE").contains("websocket"))
    assert(r.isWsUpgrade)
    // not an upgrade without the key, or with Connection lacking "upgrade"
    assert(!parseRequestHead("GET / HTTP/1.1\r\nUpgrade: websocket\r\n" +
      "Connection: Upgrade\r\n\r\n").get.isWsUpgrade)
    assert(!parseRequestHead(head.replace("keep-alive, Upgrade", "close"))
      .get.isWsUpgrade)
    // malformed heads
    assert(parseRequestHead("garbage").isEmpty)
    assert(parseRequestHead("GET /x SPEAK/9\r\n\r\n").isEmpty)
  }

  test("RFC 6455 worked example: Sec-WebSocket-Accept") {
    // RFC 6455 §1.3: the example nonce and its exact accept value
    assert(wsAccept("dGhlIHNhbXBsZSBub25jZQ==") ==
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("server frame encode: 7/16-bit length ladder, unmasked") {
    // RFC 6455 §5.7: single-frame unmasked "Hello"
    assert(encodeText("Hello").toSeq ==
      Seq(0x81, 0x05, 0x48, 0x65, 0x6c, 0x6c, 0x6f).map(_.toByte))
    // 126..65535 byte payloads use the 16-bit extended length
    val mid = encodeFrame(OpText, Array.fill[Byte](300)('a'))
    assert(mid.take(4).toSeq == Seq(0x81, 126, 0x01, 0x2c).map(_.toByte))
    assert(mid.length == 4 + 300)
    // close carries the 2-byte big-endian status code
    assert(encodeClose(1002).toSeq ==
      Seq(0x88, 0x02, 0x03, 0xea).map(_.toByte))
  }

  test("client frame decode: RFC 6455 §5.7 masked Hello, roundtrip, errors") {
    // the RFC's masked "Hello" golden: mask 37 fa 21 3d
    val rfc = Array(0x81, 0x85, 0x37, 0xfa, 0x21, 0x3d, 0x7f, 0x9f,
      0x4d, 0x51, 0x58).map(_.toByte)
    val f = readFrame(new ByteArrayInputStream(rfc)).get
    assert(f.opcode == OpText && f.fin && f.text == "Hello")
    // encodeClientFrame(mask) → readFrame roundtrip at each length tier
    for (n <- Seq(0, 125, 126, 70000)) {
      val payload = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      val enc = encodeClientFrame(OpBinary, payload,
        Array(0x37, 0xfa, 0x21, 0x3d).map(_.toByte))
      val dec = readFrame(new ByteArrayInputStream(enc)).get
      assert(dec.opcode == OpBinary && dec.payload.toSeq == payload.toSeq)
    }
    // unmasked client frame → protocol error (RFC 6455 §5.1)
    val unmasked = Array(0x81, 0x05, 0x48, 0x65, 0x6c, 0x6c, 0x6f).map(_.toByte)
    intercept[WsProtocolError] {
      readFrame(new ByteArrayInputStream(unmasked))
    }
    // EOF mid-frame → protocol error; EOF before a frame → None
    intercept[WsProtocolError] {
      readFrame(new ByteArrayInputStream(rfc.take(7)))
    }
    assert(readFrame(new ByteArrayInputStream(Array.emptyByteArray)).isEmpty)
    // control frames can't exceed 125 bytes or be fragmented
    val bigClose = encodeClientFrame(OpClose, Array.fill[Byte](126)(0),
      Array[Byte](1, 2, 3, 4))
    intercept[WsProtocolError] {
      readFrame(new ByteArrayInputStream(bigClose))
    }
  }

  test("response render: status line, content-type presence, length") {
    val withCt = new String(response(200, "hi".getBytes(UTF_8),
      Some("text/json")), UTF_8)
    assert(withCt == "HTTP/1.1 200 OK\r\nContent-type: text/json\r\n" +
      "Content-length: 2\r\n\r\nhi")
    // file responses carry no Content-type, like the reference's
    val noCt = new String(response(404, "Not Found".getBytes(UTF_8)), UTF_8)
    assert(noCt == "HTTP/1.1 404 Not Found\r\nContent-length: 9\r\n\r\nNot Found")
  }
}
