package graft.core

/** Gorilla XOR compression for a sequence of Double values.
  *
  * Re-derived from the published Gorilla paper (Pelkonen et al., VLDB 2015,
  * §4.1.2 "Compressing values"): each value is XORed with the previous one;
  * a zero XOR is a single '0' bit; otherwise '1' plus either a reuse of the
  * previous leading/trailing-zero window ('0' control bit) or a new window
  * ('1' control bit, 5 bits leading-zero count, 6 bits of meaningful-bit
  * length, then the meaningful bits).
  *
  * Round-trip exact for every Double bit pattern (NaN payloads, ±0.0,
  * subnormals) because it operates on raw `doubleToRawLongBits`.
  *
  * Layout: [32-bit count][first value 64 bits][xor stream...]
  */
object GorillaCodec {

  def encode(values: Array[Double]): Array[Byte] = {
    val w = new BitWriter(values.length + 16)
    w.writeBits(values.length.toLong, 32)
    if (values.isEmpty) return w.toBytes
    var prev = java.lang.Double.doubleToRawLongBits(values(0))
    w.writeBits(prev, 64)
    // "no previous window" sentinel: force a new-window encoding first time
    var prevLead = -1
    var prevTrail = -1
    var i = 1
    while (i < values.length) {
      val cur = java.lang.Double.doubleToRawLongBits(values(i))
      val xor = cur ^ prev
      if (xor == 0L) {
        w.writeBit(false)
      } else {
        w.writeBit(true)
        var lead = java.lang.Long.numberOfLeadingZeros(xor)
        val trail = java.lang.Long.numberOfTrailingZeros(xor)
        if (lead > 31) lead = 31 // 5-bit field
        if (prevLead >= 0 && lead >= prevLead && trail >= prevTrail) {
          // fits in previous window
          w.writeBit(false)
          val sig = 64 - prevLead - prevTrail
          w.writeBits(xor >>> prevTrail, sig)
        } else {
          w.writeBit(true)
          val sig = 64 - lead - trail
          w.writeBits(lead.toLong, 5)
          // sig in [1,64]; store sig-1 in 6 bits so 64 is representable
          w.writeBits((sig - 1).toLong, 6)
          w.writeBits(xor >>> trail, sig)
          prevLead = lead
          prevTrail = trail
        }
      }
      prev = cur
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): Array[Double] = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val out = new Array[Double](n)
    if (n == 0) return out
    var prev = r.readBits(64)
    out(0) = java.lang.Double.longBitsToDouble(prev)
    var prevLead = -1
    var prevTrail = -1
    var i = 1
    while (i < n) {
      if (!r.readBit()) {
        out(i) = java.lang.Double.longBitsToDouble(prev)
      } else {
        if (r.readBit()) {
          val lead = r.readBits(5).toInt
          val sig = r.readBits(6).toInt + 1
          prevLead = lead
          prevTrail = 64 - lead - sig
        }
        val sig = 64 - prevLead - prevTrail
        val xor = r.readBits(sig) << prevTrail
        prev = prev ^ xor
        out(i) = java.lang.Double.longBitsToDouble(prev)
      }
      i += 1
    }
    out
  }
}
