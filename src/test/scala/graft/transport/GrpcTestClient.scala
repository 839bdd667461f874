package graft.transport

import java.util.concurrent.{CountDownLatch, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer, MultiThreadIoEventLoopGroup}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2._

/** Spec-side gRPC client over Netty's HTTP/2 codec — the loopback peer for
  * [[GrpcOtlpReceiver]], playing the role RemoteReadServerSpec's HTTP POST
  * helper plays for the JSON/parquet endpoints. It is a REAL h2c client
  * (preface, SETTINGS, HPACK, flow control all from Netty's independent
  * client codec paths), so the server is exercised through the actual
  * protocol, not a hand-shaken mock. [[GrpcTestClient.connect]] returns a
  * connection whose calls each open a NEW stream — concurrent calls on one
  * connection multiplex, which is exactly what a real gRPC channel does. */
object GrpcTestClient {

  final case class GrpcResponse(httpStatus: Int, grpcStatus: Int,
      grpcMessage: String, body: Array[Byte], trailers: Map[String, String])

  /** One h2c connection; safe to `call` from multiple threads at once
    * (stream opens and writes are marshalled onto the event loop). */
  final class GrpcConnection private[GrpcTestClient] (
      group: MultiThreadIoEventLoopGroup, channel: Channel) {

    /** One unary call on a fresh stream: HEADERS + chunked DATA up, response
      * collected until the end-stream frame. `chunkSize` below the 16 KiB
      * frame ceiling splits large bodies across many DATA frames, exercising
      * the server's window replenishment. */
    def call(path: String, body: Array[Byte],
        contentType: String = "application/grpc",
        extraHeaders: Seq[(String, String)] = Nil,
        chunkSize: Int = 16384,
        endWithTrailers: Boolean = false): GrpcResponse = {
      val done = new CountDownLatch(1)
      val bodyOut = new java.io.ByteArrayOutputStream()
      @volatile var httpStatus = -1
      @volatile var grpcStatus = -1
      @volatile var grpcMessage = ""
      @volatile var trailers = Map.empty[String, String]

      val streamBootstrap = new Http2StreamChannelBootstrap(channel)
      streamBootstrap.handler(new ChannelInboundHandlerAdapter {
        private def header(hs: Http2Headers, name: String): Option[String] =
          Option(hs.get(name)).map(_.toString)
        override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
          msg match {
            case h: Http2HeadersFrame =>
              val hs = h.headers()
              header(hs, ":status").foreach(s => httpStatus = s.toInt)
              header(hs, "grpc-status").foreach(s => grpcStatus = s.toInt)
              header(hs, "grpc-message").foreach(m => grpcMessage = m)
              if (h.isEndStream) {
                trailers = {
                  val it = hs.iterator()
                  var m = Map.empty[String, String]
                  while (it.hasNext) {
                    val e = it.next()
                    m += (e.getKey.toString -> e.getValue.toString)
                  }
                  m
                }
                done.countDown()
              }
            case d: Http2DataFrame =>
              try {
                val chunk = new Array[Byte](d.content().readableBytes())
                d.content().readBytes(chunk)
                bodyOut.synchronized(bodyOut.write(chunk))
                val n = d.initialFlowControlledBytes()
                if (n > 0) ctx.writeAndFlush(
                  new DefaultHttp2WindowUpdateFrame(n).stream(d.stream()))
                if (d.isEndStream) done.countDown()
              } finally d.release()
            case _: Http2ResetFrame => done.countDown()
            case other => io.netty.util.ReferenceCountUtil.release(other)
          }
      })
      val stream = streamBootstrap.open().sync().getNow

      val hs = new DefaultHttp2Headers()
        .method("POST").scheme("http").path(path).authority("127.0.0.1")
      hs.set("content-type", contentType)
      hs.set("te", "trailers")
      extraHeaders.foreach { case (k, v) => hs.set(k, v) }
      if (body.isEmpty) {
        stream.writeAndFlush(new DefaultHttp2HeadersFrame(hs, true))
      } else {
        stream.write(new DefaultHttp2HeadersFrame(hs))
        var pos = 0
        while (pos < body.length) {
          val n = math.min(chunkSize, body.length - pos)
          // endWithTrailers: END_STREAM rides a trailing HEADERS frame (what
          // an HTTP/2 client sending request trailers does), never the DATA
          val last = pos + n == body.length && !endWithTrailers
          stream.write(new DefaultHttp2DataFrame(
            Unpooled.wrappedBuffer(body, pos, n), last))
          pos += n
        }
        if (endWithTrailers)
          stream.write(new DefaultHttp2HeadersFrame(new DefaultHttp2Headers(), true))
        stream.flush()
      }
      require(done.await(60, TimeUnit.SECONDS), "grpc call timed out")
      GrpcResponse(httpStatus, grpcStatus, grpcMessage,
        bodyOut.toByteArray, trailers)
    }

    /** Frame-level escape hatch for protocol-violation specs: open a fresh
      * stream and write ONE arbitrary HEADERS frame (caller controls the
      * pseudo-headers — e.g. a method-less non-end HEADERS no conforming
      * client would send). Returns (observed :status or -1, sawReset)
      * after the server answers, resets, or `waitMs` elapses — a (−1,
      * false) result means the server silently drained the frame. The
      * returned stream channel stays open for follow-up frames. */
    def rawHeaders(hs: Http2Headers, endStream: Boolean,
        waitMs: Long = 2000): (Int, Boolean) = {
      val done = new CountDownLatch(1)
      @volatile var httpStatus = -1
      @volatile var sawReset = false
      val streamBootstrap = new Http2StreamChannelBootstrap(channel)
      streamBootstrap.handler(new ChannelInboundHandlerAdapter {
        override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
          msg match {
            case h: Http2HeadersFrame =>
              Option(h.headers().get(":status"))
                .foreach(s => httpStatus = s.toString.toInt)
              if (h.isEndStream) done.countDown()
            case _: Http2ResetFrame =>
              sawReset = true; done.countDown()
            case other => io.netty.util.ReferenceCountUtil.release(other)
          }
      })
      val stream = streamBootstrap.open().sync().getNow
      stream.writeAndFlush(new DefaultHttp2HeadersFrame(hs, endStream))
      done.await(waitMs, TimeUnit.MILLISECONDS)
      (httpStatus, sawReset)
    }

    def close(): Unit = {
      channel.close().sync()
      group.shutdownGracefully(0, 500, TimeUnit.MILLISECONDS)
      ()
    }
  }

  def connect(port: Int): GrpcConnection = {
    val group = new MultiThreadIoEventLoopGroup(1, NioIoHandler.newFactory())
    val b = new Bootstrap()
      .group(group)
      .channel(classOf[NioSocketChannel])
      .handler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          ch.pipeline().addLast(
            Http2FrameCodecBuilder.forClient().build(),
            // no server-initiated streams expected; drop any
            new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
        }
      })
    val channel = b.connect("127.0.0.1", port).sync().channel()
    new GrpcConnection(group, channel)
  }

  /** Raw-socket h2c writer for frames a CONFORMING client cannot send
    * (netty's encoder rejects e.g. a second HEADERS without END_STREAM
    * with "sent too many headers") — the tool for protocol-violation
    * specs. Speaks just enough HTTP/2 by hand: preface, empty SETTINGS,
    * ACK of the server's SETTINGS, then whatever frames the spec wants,
    * HPACK-encoded as literal-without-indexing (no dynamic table, no
    * huffman — always valid for the server's decoder). */
  final class RawH2Client(port: Int) extends AutoCloseable {
    private val sock = new java.net.Socket("127.0.0.1", port)
    sock.setSoTimeout(5000)
    private val out = sock.getOutputStream
    private val in = new java.io.DataInputStream(sock.getInputStream)

    private def writeFrame(tpe: Int, flags: Int, streamId: Int,
        payload: Array[Byte]): Unit = {
      val len = payload.length
      out.write(Array[Byte](
        ((len >> 16) & 0xff).toByte, ((len >> 8) & 0xff).toByte,
        (len & 0xff).toByte, tpe.toByte, flags.toByte,
        ((streamId >> 24) & 0x7f).toByte, ((streamId >> 16) & 0xff).toByte,
        ((streamId >> 8) & 0xff).toByte, (streamId & 0xff).toByte))
      out.write(payload)
      out.flush()
    }

    // client preface + our (empty) SETTINGS
    out.write("PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    writeFrame(0x4, 0, 0, Array.empty)

    /** One frame off the wire: (type, flags, streamId, payload); throws
      * SocketTimeoutException after 5 s of silence. */
    def readFrame(): (Int, Int, Int, Array[Byte]) = {
      val hdr = new Array[Byte](9)
      in.readFully(hdr)
      val len = ((hdr(0) & 0xff) << 16) | ((hdr(1) & 0xff) << 8) | (hdr(2) & 0xff)
      val sid = ((hdr(5) & 0x7f) << 24) | ((hdr(6) & 0xff) << 16) |
        ((hdr(7) & 0xff) << 8) | (hdr(8) & 0xff)
      val pay = new Array[Byte](len)
      in.readFully(pay)
      (hdr(3) & 0xff, hdr(4) & 0xff, sid, pay)
    }

    /** Drain frames until the server's SETTINGS arrives, then ACK it. */
    def handshake(): Unit = {
      var acked = false
      while (!acked) {
        val (tpe, flags, _, _) = readFrame()
        if (tpe == 0x4 && (flags & 0x1) == 0) {
          writeFrame(0x4, 0x1, 0, Array.empty); acked = true
        }
      }
    }

    /** HEADERS frame (END_HEADERS always set) from literal pairs —
      * pseudo-headers must come first, per RFC 9113 §8.3. */
    def headers(streamId: Int, hs: Seq[(String, String)],
        endStream: Boolean): Unit = {
      val bb = new java.io.ByteArrayOutputStream()
      hs.foreach { case (k, v) =>
        val n = k.getBytes("UTF-8"); val value = v.getBytes("UTF-8")
        require(n.length < 127 && value.length < 127, "helper caps at 7-bit lengths")
        bb.write(0x00) // literal without indexing, new name
        bb.write(n.length); bb.write(n, 0, n.length)
        bb.write(value.length); bb.write(value, 0, value.length)
      }
      writeFrame(0x1, 0x4 | (if (endStream) 0x1 else 0), streamId,
        bb.toByteArray)
    }

    override def close(): Unit = sock.close()
  }

  /** Single-shot convenience: connect, call once, close. */
  def call(port: Int, path: String, body: Array[Byte],
      contentType: String = "application/grpc",
      extraHeaders: Seq[(String, String)] = Nil,
      chunkSize: Int = 16384,
      endWithTrailers: Boolean = false): GrpcResponse = {
    val conn = connect(port)
    try conn.call(path, body, contentType, extraHeaders, chunkSize,
      endWithTrailers)
    finally conn.close()
  }
}
