package graft.transport

import java.io.ByteArrayOutputStream

/** Protobuf wire primitives for the hand-rolled [[PromProto]] codec (the
  * prometheus remote-read messages — OTLP ingest is JSON, via
  * [[graft.ingest.OtlpJson]], and needs no protobuf). Three wire types cover
  * every field the codec reads: varint (0), fixed64 (1), length-delimited
  * (2); fixed32 (5) is skippable. Unknown fields skip by wire type so
  * messages from real clients — which set fields this codec doesn't model —
  * decode fine. */
private[transport] final class ProtoReader(buf: Array[Byte]) {
  var pos = 0
  def hasRemaining: Boolean = pos < buf.length
  def readVarint(): Long = {
    var shift = 0; var result = 0L
    while (true) {
      val b = buf(pos); pos += 1
      result |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return result
      shift += 7
      require(shift < 64, "varint too long")
    }
    result
  }
  def readFixed64(): Long = {
    var r = 0L
    var i = 0
    while (i < 8) { r |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
    pos += 8; r
  }
  def readDouble(): Double = java.lang.Double.longBitsToDouble(readFixed64())
  // Truncation is an ERROR, not padding: copyOfRange would silently
  // zero-fill past the end, turning a cut-off message into a "valid" empty
  // one — a corrupt export must surface as INVALID_ARGUMENT, not an ack.
  def readBytes(): Array[Byte] = {
    val n = readVarint().toInt
    require(n >= 0 && n <= buf.length - pos,
      s"truncated length-delimited field: $n bytes declared, ${buf.length - pos} remain")
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
    pos += n; out
  }
  def skip(wireType: Int): Unit = wireType match {
    case 0 => readVarint(); ()
    case 1 => pos += 8
    case 2 =>
      val n = readVarint().toInt
      require(n >= 0 && n <= buf.length - pos,
        s"truncated skipped field: $n bytes declared, ${buf.length - pos} remain")
      pos += n
    case 5 => pos += 4
    case w => throw new IllegalArgumentException(s"unsupported wire type $w")
  }
}

private[transport] final class ProtoWriter {
  val out = new ByteArrayOutputStream()
  def varint(v: Long): Unit = {
    var x = v
    while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
  }
  def key(field: Int, wire: Int): Unit = varint((field << 3) | wire)
  def int64(field: Int, v: Long): Unit =
    if (v != 0) { key(field, 0); varint(v) }
  def fixed64(field: Int, v: Long): Unit = {
    key(field, 1)
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }
  // raw-bits default test so -0.0 (bits != 0) round-trips; proto3 omits
  // only the canonical +0.0 default
  def double(field: Int, v: Double): Unit =
    if (java.lang.Double.doubleToRawLongBits(v) != 0L)
      fixed64(field, java.lang.Double.doubleToLongBits(v))
  def bytes(field: Int, b: Array[Byte]): Unit = {
    key(field, 2); varint(b.length); out.write(b)
  }
  def string(field: Int, s: String): Unit =
    if (s.nonEmpty) bytes(field, s.getBytes("UTF-8"))
  def result(): Array[Byte] = out.toByteArray
}
