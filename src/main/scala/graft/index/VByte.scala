package graft.index

import scala.collection.mutable.ArrayBuffer

/** Variable-byte encoding for sorted docID deltas and term frequencies.
  *
  * Classic VByte: 7 data bits per byte, high bit set on the terminating
  * byte of each value (Lucene-style). Values are non-negative longs.
  * The index stores per-block docID *gaps* (first value is the gap from
  * the block's base docID, i.e. firstDoc itself is kept in block metadata
  * and the first stored gap is 0's successor convention: gaps(0) =
  * docs(0) - firstDoc = 0 is skipped — we store gaps from the previous
  * docID with the block's firstDoc as seed) and raw tf values.
  */
object VByte {

  def encodedSize(values: Array[Long]): Int = {
    var size = 0
    var i = 0
    while (i < values.length) {
      var v = values(i)
      size += 1
      while (v >= 0x80L) { v >>>= 7; size += 1 }
      i += 1
    }
    size
  }

  def encode(values: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](encodedSize(values))
    var pos = 0
    var i = 0
    while (i < values.length) {
      var v = values(i)
      while (v >= 0x80L) {
        out(pos) = (v & 0x7fL).toByte
        pos += 1
        v >>>= 7
      }
      out(pos) = (v | 0x80L).toByte // terminator: high bit set
      pos += 1
      i += 1
    }
    out
  }

  /** Decode exactly `n` values from `bytes` starting at offset 0. */
  def decode(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var shift = 0
      var b = bytes(pos)
      pos += 1
      while ((b & 0x80) == 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        b = bytes(pos)
        pos += 1
      }
      v |= (b & 0x7fL) << shift
      out(i) = v
      i += 1
    }
    out
  }

  /** Delta-encode a strictly-increasing docID run against `base`. */
  def deltasFrom(base: Long, sortedDocs: Array[Long]): Array[Long] = {
    val out = new Array[Long](sortedDocs.length)
    var prev = base
    var i = 0
    while (i < sortedDocs.length) {
      out(i) = sortedDocs(i) - prev
      prev = sortedDocs(i)
      i += 1
    }
    out
  }

  def undeltas(base: Long, deltas: Array[Long]): Array[Long] = {
    val out = new Array[Long](deltas.length)
    var prev = base
    var i = 0
    while (i < deltas.length) {
      prev += deltas(i)
      out(i) = prev
      i += 1
    }
    out
  }

  /** Pack ints as 4-byte little-endian (fixed-width, random access). */
  def packInts(values: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](values.length * 4)
    var i = 0
    while (i < values.length) {
      val v = values(i)
      out(i * 4) = (v & 0xff).toByte
      out(i * 4 + 1) = ((v >>> 8) & 0xff).toByte
      out(i * 4 + 2) = ((v >>> 16) & 0xff).toByte
      out(i * 4 + 3) = ((v >>> 24) & 0xff).toByte
      i += 1
    }
    out
  }

  @inline def unpackIntAt(bytes: Array[Byte], idx: Int): Int =
    (bytes(idx * 4) & 0xff) |
      ((bytes(idx * 4 + 1) & 0xff) << 8) |
      ((bytes(idx * 4 + 2) & 0xff) << 16) |
      ((bytes(idx * 4 + 3) & 0xff) << 24)

  def unpackInts(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length / 4
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = unpackIntAt(bytes, i); i += 1 }
    out
  }
}
