package graft.core

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal MessagePack codec for the kartothek metadata interop path
  * (`<uuid>.by-dataset-metadata.msgpack.zstd`, kartothek/core/_zmsgpack.py:
  * zstd-compressed msgpack; the zstd layer is handled by the caller via
  * Spark's bundled zstd-jni). Covers the JSON-equivalent subset the metadata
  * blob actually uses: nil/bool/int/float/str/bin/array/map.
  *
  * Decoded values: null, Boolean, Long, Double, String, Array[Byte],
  * Seq[Any], Map[String, Any] (non-string map keys are stringified — the
  * metadata format only uses string keys).
  */
object Msgpack {

  def unpack(bytes: Array[Byte]): Any = {
    val buf = ByteBuffer.wrap(bytes)
    val v = read(buf)
    v
  }

  private def readStr(buf: ByteBuffer, n: Int): String = {
    val b = new Array[Byte](n); buf.get(b); new String(b, StandardCharsets.UTF_8)
  }

  private def readArr(buf: ByteBuffer, n: Int): Seq[Any] =
    Seq.fill(n)(read(buf))

  private def readMap(buf: ByteBuffer, n: Int): Map[String, Any] =
    Seq.fill(n)((read(buf).toString, read(buf))).toMap

  private def read(buf: ByteBuffer): Any = {
    val b = buf.get() & 0xff
    b match {
      case x if x <= 0x7f             => x.toLong // positive fixint
      case x if x >= 0xe0             => (x - 256).toLong // negative fixint
      case x if (x & 0xf0) == 0x80    => readMap(buf, x & 0x0f) // fixmap
      case x if (x & 0xf0) == 0x90    => readArr(buf, x & 0x0f) // fixarray
      case x if (x & 0xe0) == 0xa0    => readStr(buf, x & 0x1f) // fixstr
      case 0xc0                       => null
      case 0xc2                       => false
      case 0xc3                       => true
      case 0xc4                       => { val n = buf.get() & 0xff; val o = new Array[Byte](n); buf.get(o); o }
      case 0xc5                       => { val n = buf.getShort() & 0xffff; val o = new Array[Byte](n); buf.get(o); o }
      case 0xc6                       => { val n = buf.getInt(); val o = new Array[Byte](n); buf.get(o); o }
      case 0xca                       => buf.getFloat().toDouble
      case 0xcb                       => buf.getDouble()
      case 0xcc                       => (buf.get() & 0xff).toLong
      case 0xcd                       => (buf.getShort() & 0xffff).toLong
      case 0xce                       => buf.getInt() & 0xffffffffL
      case 0xcf                       => buf.getLong() // uint64, may wrap — metadata never exceeds Long
      case 0xd0                       => buf.get().toLong
      case 0xd1                       => buf.getShort().toLong
      case 0xd2                       => buf.getInt().toLong
      case 0xd3                       => buf.getLong()
      case 0xd9                       => readStr(buf, buf.get() & 0xff)
      case 0xda                       => readStr(buf, buf.getShort() & 0xffff)
      case 0xdb                       => readStr(buf, buf.getInt())
      case 0xdc                       => readArr(buf, buf.getShort() & 0xffff)
      case 0xdd                       => readArr(buf, buf.getInt())
      case 0xde                       => readMap(buf, buf.getShort() & 0xffff)
      case 0xdf                       => readMap(buf, buf.getInt())
      case other =>
        throw new IllegalArgumentException(f"Unsupported msgpack type byte 0x$other%02x")
    }
  }

  /** Encoder for the same subset (used by tests and the migration writer). */
  def pack(v: Any): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    write(out, v)
    out.toByteArray
  }

  private def writeBE(out: java.io.ByteArrayOutputStream, v: Long, nBytes: Int): Unit = {
    var i = nBytes - 1
    while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  private def write(out: java.io.ByteArrayOutputStream, v: Any): Unit = v match {
    case null => out.write(0xc0)
    case b: Boolean => out.write(if (b) 0xc3 else 0xc2)
    case i: Int => write(out, i.toLong)
    case l: Long =>
      if (l >= 0 && l <= 0x7f) out.write(l.toInt)
      else if (l < 0 && l >= -32) out.write((l & 0xff).toInt)
      else { out.write(0xd3); writeBE(out, l, 8) }
    case d: Double => out.write(0xcb); writeBE(out, java.lang.Double.doubleToLongBits(d), 8)
    case s: String =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (b.length <= 31) out.write(0xa0 | b.length)
      else if (b.length <= 0xff) { out.write(0xd9); out.write(b.length) }
      else { out.write(0xda); writeBE(out, b.length.toLong, 2) }
      out.write(b)
    case b: Array[Byte] =>
      if (b.length <= 0xff) { out.write(0xc4); out.write(b.length) }
      else { out.write(0xc5); writeBE(out, b.length.toLong, 2) }
      out.write(b)
    case m: scala.collection.Map[_, _] =>
      if (m.size <= 15) out.write(0x80 | m.size)
      else { out.write(0xde); writeBE(out, m.size.toLong, 2) }
      m.foreach { case (k, value) => write(out, k.toString); write(out, value) }
    case s: scala.collection.Seq[_] =>
      if (s.size <= 15) out.write(0x90 | s.size)
      else { out.write(0xdc); writeBE(out, s.size.toLong, 2) }
      s.foreach(write(out, _))
    case other =>
      throw new IllegalArgumentException(s"Cannot msgpack-encode ${other.getClass}")
  }
}
