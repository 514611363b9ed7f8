package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class CodecSpec extends AnyFunSuite {

  private val specials = Array(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
    Double.NegativeInfinity, Double.MinPositiveValue, java.lang.Double.MIN_NORMAL, 1.0, -1.0)

  private def randomDoubles(rnd: Random, n: Int): Array[Double] =
    Array.fill(n)(rnd.nextInt(4) match {
      case 0 => rnd.nextDouble() * 2e12 - 1e12
      case 1 => specials(rnd.nextInt(specials.length))
      case 2 => java.lang.Double.longBitsToDouble(rnd.nextLong())
      case _ => 100.0 + rnd.nextInt(3)
    })

  test("Gorilla round-trips 200 random double sequences bit-exactly") {
    val rnd = new Random(42)
    for (_ <- 0 until 200) {
      val xs = randomDoubles(rnd, rnd.nextInt(300))
      val dec = GorillaCodec.decode(GorillaCodec.encode(xs))
      assert(dec.length == xs.length)
      assert(xs.indices.forall(i =>
        java.lang.Double.doubleToRawLongBits(dec(i)) == java.lang.Double.doubleToRawLongBits(xs(i))))
    }
  }

  test("Gorilla compresses near-constant series well") {
    val xs = Array.tabulate(1000)(i => 100.0 + (i % 3))
    val enc = GorillaCodec.encode(xs)
    assert(enc.length < xs.length * 8 / 4, s"got ${enc.length} bytes for ${xs.length * 8} raw")
    assert(GorillaCodec.decode(enc).sameElements(xs))
  }

  test("delta-of-delta round-trips random long sequences") {
    val rnd = new Random(7)
    for (_ <- 0 until 200) {
      val xs = Array.fill(rnd.nextInt(300))(rnd.nextInt(4) match {
        case 0 => rnd.nextLong() / 4
        case 1 => rnd.nextInt(100).toLong
        case _ => 1700000000000L + rnd.nextInt(1000000)
      })
      assert(DeltaCodec.decode(DeltaCodec.encode(xs)).sameElements(xs))
    }
  }

  test("delta-of-delta compresses regular timestamps to ~1 bit/point") {
    val ts = Array.tabulate(10000)(i => 1700000000000L + i * 60000L)
    val enc = DeltaCodec.encode(ts)
    assert(enc.length < 1500, s"got ${enc.length} bytes for 10000 regular timestamps")
    assert(DeltaCodec.decode(enc).sameElements(ts))
  }

  test("delta-of-delta handles irregular gaps") {
    val ts = Array(0L, 60L, 120L, 10000L, 10060L, 9000L, Long.MaxValue / 8, 5L)
    assert(DeltaCodec.decode(DeltaCodec.encode(ts)).sameElements(ts))
  }

  test("empty and single-element sequences") {
    assert(GorillaCodec.decode(GorillaCodec.encode(Array.empty[Double])).isEmpty)
    assert(GorillaCodec.decode(GorillaCodec.encode(Array(3.14))).sameElements(Array(3.14)))
    assert(DeltaCodec.decode(DeltaCodec.encode(Array.empty[Long])).isEmpty)
    assert(DeltaCodec.decode(DeltaCodec.encode(Array(99L))).sameElements(Array(99L)))
  }
}
