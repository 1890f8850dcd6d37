package graft.sources

import java.io.{InputStream, OutputStream}

import graft.sources.BgpSession._

/** The live socket pump around the pure session FSMs — the transport layer
  * the reference runs in `BgpPeer::lifecycle` (src/bgppeer.rs:179-258):
  * read one complete framed message at a time, feed it to the pure step
  * functions ([[BgpSession.activeStep]], [[BgpSession.passiveHandshake]],
  * [[BgpSession.dispatch]]), and write each produced frame immediately.
  *
  * Everything protocol-shaped stays in [[BgpSession]]; this file only moves
  * bytes, so it works over any stream pair — the spec drives it over a
  * loopback TCP socket, a deployment points it at a configured peer
  * ([[GraftConfig]] supplies the [[BgpSession.Open]] via `sessionOpen`).
  */
object SessionTransport {

  /** Read exactly one framed BGP message: the validated 19-byte head
    * ([[BgpSession.decodeHead]]: marker, length bounds, known type), then
    * the body. None on clean EOF at a frame boundary; EOF mid-frame or a
    * bad head fail loudly (the reference tears the session down on either,
    * src/bgppeer.rs:196-218). */
  def readFrame(in: InputStream): Option[Array[Byte]] = {
    val head = new Array[Byte](19)
    var off = 0
    while (off < 19) {
      val r = in.read(head, off, 19 - off)
      if (r < 0) {
        if (off == 0) return None
        throw new java.io.EOFException(s"EOF inside message head ($off/19B)")
      }
      off += r
    }
    val (_, bodyLen) = decodeHead(head)
    val frame = java.util.Arrays.copyOf(head, 19 + bodyLen)
    off = 19
    while (off < frame.length) {
      val r = in.read(frame, off, frame.length - off)
      if (r < 0) throw new java.io.EOFException(
        s"EOF inside message body ($off/${frame.length}B)")
      off += r
    }
    Some(frame)
  }

  private def write(out: OutputStream, frame: Array[Byte]): Unit = {
    out.write(frame); out.flush()
  }

  /** Active (connect-side) handshake over a live stream: send OPEN, read
    * the answer, strip refused capabilities and retry — the socket form of
    * [[BgpSession.runActive]] (reference start_active,
    * src/bgppeer.rs:102-165), with each retry OPEN written before the next
    * read. On establishment the initial KEEPALIVE is sent (bgppeer.rs:166). */
  def activeHandshake(in: InputStream, out: OutputStream, local: Open,
      peerV4: Boolean, peerHi: Long, peerLo: Long): ActiveResult = {
    var params = local
    while (true) {
      write(out, encodeOpen(params))
      readFrame(in) match {
        case None => return ActiveResult.Failed("peer closed during handshake")
        case Some(f) => activeStep(params, peerV4, peerHi, peerLo, f) match {
          case ActiveResult.RetryWithout(next, cap) =>
            if (next.caps == params.caps)
              return ActiveResult.Failed(
                s"peer refused a capability not announced: $cap")
            params = next
          case r: ActiveResult.Established =>
            write(out, encodeKeepalive)
            return r
          case r => return r
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Passive (listen-side) session over a live stream: handshake on the
    * first frame (reply OPEN written back), then the established loop —
    * KEEPALIVE echoed immediately, UPDATE frames handed to `onUpdate`,
    * OPEN/NOTIFICATION close the session. The socket form of
    * [[BgpSession.runPassive]] (reference start_passive + lifecycle,
    * src/bgppeer.rs:72-101, 219-256). Returns the session descriptor and
    * the close reason (None = peer EOF at a frame boundary). */
  def servePassive(in: InputStream, out: OutputStream, local: Open,
      peerV4: Boolean, peerHi: Long, peerLo: Long)(
      onUpdate: Array[Byte] => Unit): (SessionDesc, Option[String]) = {
    val first = readFrame(in).getOrElse(
      throw new java.io.EOFException("peer closed before OPEN"))
    val (_, reply, desc) = passiveHandshake(local, peerV4, peerHi, peerLo, first)
    write(out, reply)
    var closed: Option[String] = None
    var eof = false
    while (closed.isEmpty && !eof) {
      readFrame(in) match {
        case None => eof = true
        case Some(f) => dispatch(f) match {
          case Action.SendKeepalive => write(out, encodeKeepalive)
          case Action.HandleUpdate(u) => onUpdate(u)
          case Action.Close(reason) => closed = Some(reason)
        }
      }
    }
    (desc, closed)
  }
}
