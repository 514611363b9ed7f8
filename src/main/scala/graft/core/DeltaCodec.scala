package graft.core

/** Delta-of-delta timestamp compression (Gorilla paper §4.1.1).
  *
  * Timestamps must be non-decreasing is NOT required — the codec is exact
  * for any Long sequence; sorted input merely compresses best.
  *
  * Layout: [32-bit count][first ts 64 bits][first delta 64 bits][dod stream]
  * dod buckets: 0 → '0'; [-63,64] → '10'+7b; [-255,256] → '110'+9b;
  * [-2047,2048] → '1110'+12b; else '1111'+64b raw.
  * Bucketed values are stored as dod + (2^(bits-1) - 1) zigzag-style offset.
  */
object DeltaCodec {

  def encode(ts: Array[Long]): Array[Byte] = {
    val w = new BitWriter(ts.length * 2 + 16)
    w.writeBits(ts.length.toLong, 32)
    if (ts.isEmpty) return w.toBytes
    w.writeBits(ts(0), 64)
    if (ts.length == 1) return w.toBytes
    var prevDelta = ts(1) - ts(0)
    w.writeBits(prevDelta, 64)
    var i = 2
    while (i < ts.length) {
      val delta = ts(i) - ts(i - 1)
      val dod = delta - prevDelta
      if (dod == 0L) w.writeBit(false)
      else if (dod >= -63 && dod <= 64) { w.writeBits(0x2L, 2); w.writeBits(dod + 63, 7) }
      else if (dod >= -255 && dod <= 256) { w.writeBits(0x6L, 3); w.writeBits(dod + 255, 9) }
      else if (dod >= -2047 && dod <= 2048) { w.writeBits(0xeL, 4); w.writeBits(dod + 2047, 12) }
      else { w.writeBits(0xfL, 4); w.writeBits(dod, 64) }
      prevDelta = delta
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): Array[Long] = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val out = new Array[Long](n)
    if (n == 0) return out
    out(0) = r.readBits(64)
    if (n == 1) return out
    var prevDelta = r.readBits(64)
    out(1) = out(0) + prevDelta
    var i = 2
    while (i < n) {
      val dod =
        if (!r.readBit()) 0L
        else if (!r.readBit()) r.readBits(7) - 63
        else if (!r.readBit()) r.readBits(9) - 255
        else if (!r.readBit()) r.readBits(12) - 2047
        else r.readBits(64)
      prevDelta += dod
      out(i) = out(i - 1) + prevDelta
      i += 1
    }
    out
  }
}
