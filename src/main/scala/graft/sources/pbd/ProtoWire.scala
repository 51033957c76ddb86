package graft.sources.pbd

/** Minimal protobuf wire-format cursor over a byte slice. The wire
  * format is public, stable, and tiny: varints, zigzag, two fixed
  * widths, and length-delimited blobs (this is everything the PBD
  * container needs — no protobuf runtime on the classpath).
  *
  * Every read is bounds-checked against `end`: truncated or corrupt
  * input raises a parse error instead of zero-padding missing bytes
  * (Arrays.copyOfRange would) or letting a nested-message cursor run
  * past its own region into the parent's following fields.
  */
final class ProtoWire(val bytes: Array[Byte], var pos: Int, val end: Int) {
  def this(bytes: Array[Byte]) = this(bytes, 0, bytes.length)

  def hasMore: Boolean = pos < end

  private def ensure(n: Int): Unit =
    if (n < 0 || pos + n > end)
      throw new IllegalArgumentException(
        s"truncated or corrupt protobuf input: need $n bytes at $pos, region ends at $end")

  def readVarint(): Long = {
    var shift = 0
    var value = 0L
    while (true) {
      ensure(1)
      val b = bytes(pos)
      pos += 1
      value |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return value
      shift += 7
      if (shift > 63) throw new IllegalArgumentException("varint too long")
    }
    value
  }

  def readZigzag(): Long = {
    val v = readVarint()
    (v >>> 1) ^ -(v & 1)
  }

  def readFixed32(): Int = {
    ensure(4)
    val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
      ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
    pos += 4
    v
  }

  def readFixed64(): Long = {
    ensure(8)
    var v = 0L
    var i = 0
    while (i < 8) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
    pos += 8
    v
  }

  def readBytes(): Array[Byte] = {
    val len = readVarint().toInt
    ensure(len)
    val out = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
    pos += len
    out
  }

  /** Sub-cursor over a length-delimited region (no copy). */
  def readSlice(): ProtoWire = {
    val len = readVarint().toInt
    ensure(len)
    val w = new ProtoWire(bytes, pos, pos + len)
    pos += len
    w
  }

  /** Skip one field payload by wire type — the decode-time column
    * skip (reference: pbd.hpp:176-207). */
  def skip(wireType: Int): Unit = wireType match {
    case 0 => readVarint()
    case 1 => ensure(8); pos += 8
    case 2 =>
      // note: must read the length BEFORE adding — `pos += readVarint()`
      // would capture pos before the varint advanced it
      val len = readVarint().toInt
      ensure(len)
      pos += len
    case 5 => ensure(4); pos += 4
    case other =>
      throw new IllegalArgumentException(s"Unsupported wire type $other (groups?)")
  }
}
