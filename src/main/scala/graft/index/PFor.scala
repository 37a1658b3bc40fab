package graft.index

/** Patched-frame-of-reference (PForDelta / NewPFD-style) block codec.
  *
  * Layout: [bitWidth: 1B][nExceptions: 1B]
  *         [n values bit-packed at bitWidth (low bits)]
  *         [exceptions: (position VByte, highBits VByte)*]
  * The bit width is chosen per block to minimize total encoded size —
  * values whose high bits don't fit become patched exceptions. Blocks in
  * this engine hold ≤ blockSize (≤ 255) values, so one byte suffices for
  * positions and the exception count.
  */
object PFor {

  @inline private def bitLen(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Pick the bit width minimizing encoded size — one pass to build a
    * bit-length histogram, then exact closed-form costs per candidate
    * width (an exception with value bit-length L stored at width b takes
    * 1 position byte + ceil((L-b)/7) VByte bytes).
    */
  private def chooseWidth(values: Array[Long]): Int = {
    val hist = new Array[Int](65)
    var maxBits = 0
    var i = 0
    while (i < values.length) {
      val l = bitLen(values(i))
      hist(l) += 1
      if (l > maxBits) maxBits = l
      i += 1
    }
    var best = maxBits
    var bestCost = Long.MaxValue
    var b = 0
    while (b <= maxBits) {
      var cost = 2L + (values.length.toLong * b + 7) / 8
      var exceptions = 0
      var l = b + 1
      while (l <= maxBits) {
        exceptions += hist(l)
        cost += hist(l).toLong * (1 + (l - b + 6) / 7)
        l += 1
      }
      if (exceptions <= 255 && cost < bestCost) { bestCost = cost; best = b }
      b += 1
    }
    best
  }

  def encode(values: Array[Long]): Array[Byte] = {
    require(values.length <= 255, s"PFor block too large: ${values.length}")
    val b = chooseWidth(values)
    val packedBytes = (values.length * b + 7) / 8
    val exceptions = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var i = 0
    while (i < values.length) {
      if (b < 64 && (values(i) >>> b) != 0) exceptions += ((i, values(i) >>> b))
      i += 1
    }
    val tail = exceptions.flatMap { case (pos, hi) =>
      pos.toByte +: VByte.encode(Array(hi)).toSeq
    }
    val out = new Array[Byte](2 + packedBytes + tail.length)
    out(0) = b.toByte
    out(1) = exceptions.length.toByte
    // bit-pack low b bits, LSB-first
    var bitPos = 0
    i = 0
    while (i < values.length) {
      val v = if (b >= 64) values(i) else values(i) & ((1L << b) - 1)
      var written = 0
      while (written < b) {
        val byteIdx = 2 + (bitPos >>> 3)
        val bitInByte = bitPos & 7
        val take = math.min(8 - bitInByte, b - written)
        val chunk = ((v >>> written) & ((1L << take) - 1)).toInt
        out(byteIdx) = (out(byteIdx) | (chunk << bitInByte)).toByte
        written += take
        bitPos += take
      }
      i += 1
    }
    var o = 2 + packedBytes
    tail.foreach { byte => out(o) = byte; o += 1 }
    out
  }

  def decode(bytes: Array[Byte], n: Int): Array[Long] = {
    val b = bytes(0) & 0xff
    val nEx = bytes(1) & 0xff
    val out = new Array[Long](n)
    var bitPos = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var read = 0
      while (read < b) {
        val byteIdx = 2 + (bitPos >>> 3)
        val bitInByte = bitPos & 7
        val take = math.min(8 - bitInByte, b - read)
        val chunk = ((bytes(byteIdx) >>> bitInByte) & ((1 << take) - 1)).toLong
        v |= chunk << read
        read += take
        bitPos += take
      }
      out(i) = v
      i += 1
    }
    var o = 2 + (n * b + 7) / 8
    var e = 0
    while (e < nEx) {
      val pos = bytes(o) & 0xff
      o += 1
      var hi = 0L
      var shift = 0
      var byte = bytes(o)
      o += 1
      while ((byte & 0x80) == 0) {
        hi |= (byte & 0x7fL) << shift
        shift += 7
        byte = bytes(o)
        o += 1
      }
      hi |= (byte & 0x7fL) << shift
      out(pos) |= hi << b
      e += 1
    }
    out
  }
}

/** Posting-payload codec registry: PostingBlock.codec selects the codec
  * per block, so indexes with mixed codecs remain readable.
  */
object Codecs {
  final val VB: Byte = 0
  final val PFOR: Byte = 1

  def encode(codec: Byte, values: Array[Long]): Array[Byte] = codec match {
    case VB => VByte.encode(values)
    case PFOR => PFor.encode(values)
    case c => throw new IllegalArgumentException(s"unknown codec $c")
  }

  def decode(codec: Byte, bytes: Array[Byte], n: Int): Array[Long] = codec match {
    case VB => VByte.decode(bytes, n)
    case PFOR => PFor.decode(bytes, n)
    case c => throw new IllegalArgumentException(s"unknown codec $c")
  }

  def of(name: String): Byte = name.toLowerCase(java.util.Locale.ROOT) match {
    case "vbyte" => VB
    case "pfor" | "pfordelta" => PFOR
    case other => throw new IllegalArgumentException(s"unknown codec $other")
  }
}
