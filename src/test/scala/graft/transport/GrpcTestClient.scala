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
