package graft.core

/** Append-only MSB-first bit writer backed by a growable byte array.
  *
  * Shared by the Gorilla XOR float codec ([[GorillaCodec]]) and the
  * delta-of-delta timestamp codec ([[DeltaCodec]]). Pure JVM, no Spark.
  */
final class BitWriter(initialCapacity: Int = 64) {
  private var buf = new Array[Byte](math.max(8, initialCapacity))
  private var bitLen: Long = 0L

  private def ensure(nBits: Long): Unit = {
    val needBytes = ((bitLen + nBits + 7) / 8).toInt
    if (needBytes > buf.length) {
      var cap = buf.length
      while (cap < needBytes) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  }

  def writeBit(b: Boolean): Unit = {
    ensure(1)
    if (b) {
      val byteIdx = (bitLen >>> 3).toInt
      val bitIdx = (bitLen & 7).toInt
      buf(byteIdx) = (buf(byteIdx) | (0x80 >>> bitIdx)).toByte
    }
    bitLen += 1
  }

  /** Write the low `n` bits of `v`, MSB first. n in [0,64]. */
  def writeBits(v: Long, n: Int): Unit = {
    ensure(n)
    var i = n - 1
    while (i >= 0) {
      writeBitFast(((v >>> i) & 1L) == 1L)
      i -= 1
    }
  }

  private def writeBitFast(b: Boolean): Unit = {
    if (b) {
      val byteIdx = (bitLen >>> 3).toInt
      val bitIdx = (bitLen & 7).toInt
      buf(byteIdx) = (buf(byteIdx) | (0x80 >>> bitIdx)).toByte
    }
    bitLen += 1
  }

  def lengthBits: Long = bitLen

  def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, ((bitLen + 7) / 8).toInt)
}

/** MSB-first bit reader over a byte array. */
final class BitReader(bytes: Array[Byte]) {
  private var pos: Long = 0L
  private val maxBits: Long = bytes.length.toLong * 8

  def remaining: Long = maxBits - pos

  def readBit(): Boolean = {
    require(pos < maxBits, s"bit read past end ($pos/$maxBits)")
    val byteIdx = (pos >>> 3).toInt
    val bitIdx = (pos & 7).toInt
    pos += 1
    ((bytes(byteIdx) >>> (7 - bitIdx)) & 1) == 1
  }

  /** Read `n` bits MSB-first into the low bits of a Long. n in [0,64]. */
  def readBits(n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) {
      v = (v << 1) | (if (readBit()) 1L else 0L)
      i += 1
    }
    v
  }
}
