package graft.core

import scala.collection.mutable

/** Ratcliff-Obershelp sequence matching with Python-`difflib` parity.
  *
  * The reference's value corrector mines string-edit transformations with
  * `difflib.SequenceMatcher(None, old, new).get_opcodes()`
  * (reference `src/correction.py:164-182`); this is a from-scratch Scala
  * implementation of the same published algorithm (CPython `Lib/difflib.py`
  * semantics) including the *autojunk* popularity heuristic (b-side elements
  * occurring more than 1% of the time in sequences of length >= 200).
  *
  * Sequences are matched over Unicode code points (Python iterates code
  * points, not UTF-16 units).
  */
object Difflib {

  final case class Match(a: Int, b: Int, size: Int)
  /** tag in {"equal","replace","delete","insert"}; ranges [i1,i2) on a, [j1,j2) on b. */
  final case class Opcode(tag: String, i1: Int, i2: Int, j1: Int, j2: Int)

  def codePoints(s: String): Array[Int] = s.codePoints().toArray

  final class SequenceMatcher(a: Array[Int], b: Array[Int]) {
    // b2j: element -> ascending list of indices in b, with popular elements dropped
    private val b2j: mutable.Map[Int, mutable.ArrayBuffer[Int]] = mutable.Map.empty
    private val bpopular: mutable.Set[Int] = mutable.Set.empty
    locally {
      var j = 0
      while (j < b.length) {
        b2j.getOrElseUpdate(b(j), mutable.ArrayBuffer.empty) += j
        j += 1
      }
      val n = b.length
      if (n >= 200) {
        val ntest = n / 100 + 1
        for ((elt, idxs) <- b2j.toList if idxs.length > ntest) {
          bpopular += elt
          b2j.remove(elt)
        }
      }
    }
    private def isbjunk(elt: Int): Boolean = bpopular.contains(elt)

    def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): Match = {
      var besti = alo
      var bestj = blo
      var bestsize = 0
      var j2len = mutable.Map.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val newj2len = mutable.Map.empty[Int, Int]
        b2j.get(a(i)) match {
          case Some(idxs) =>
            var done = false
            val it = idxs.iterator
            while (it.hasNext && !done) {
              val j = it.next()
              if (j >= blo) {
                if (j >= bhi) done = true
                else {
                  val k = j2len.getOrElse(j - 1, 0) + 1
                  newj2len(j) = k
                  if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
                }
              }
            }
          case None =>
        }
        j2len = newj2len
        i += 1
      }
      // extend by non-junk, then by junk (CPython difflib order)
      while (besti > alo && bestj > blo && !isbjunk(b(bestj - 1)) && a(besti - 1) == b(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
             !isbjunk(b(bestj + bestsize)) && a(besti + bestsize) == b(bestj + bestsize)) {
        bestsize += 1
      }
      while (besti > alo && bestj > blo && isbjunk(b(bestj - 1)) && a(besti - 1) == b(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
             isbjunk(b(bestj + bestsize)) && a(besti + bestsize) == b(bestj + bestsize)) {
        bestsize += 1
      }
      Match(besti, bestj, bestsize)
    }

    def getMatchingBlocks: List[Match] = {
      val queue = mutable.Stack((0, a.length, 0, b.length))
      val blocks = mutable.ArrayBuffer.empty[Match]
      while (queue.nonEmpty) {
        val (alo, ahi, blo, bhi) = queue.pop()
        val m = findLongestMatch(alo, ahi, blo, bhi)
        if (m.size > 0) {
          blocks += m
          if (alo < m.a && blo < m.b) queue.push((alo, m.a, blo, m.b))
          if (m.a + m.size < ahi && m.b + m.size < bhi)
            queue.push((m.a + m.size, ahi, m.b + m.size, bhi))
        }
      }
      val sorted = blocks.sortBy(m => (m.a, m.b))
      // merge adjacent blocks
      val merged = mutable.ArrayBuffer.empty[Match]
      var i1 = 0; var j1 = 0; var k1 = 0
      for (m <- sorted) {
        if (i1 + k1 == m.a && j1 + k1 == m.b) k1 += m.size
        else {
          if (k1 > 0) merged += Match(i1, j1, k1)
          i1 = m.a; j1 = m.b; k1 = m.size
        }
      }
      if (k1 > 0) merged += Match(i1, j1, k1)
      merged += Match(a.length, b.length, 0)
      merged.toList
    }

    def getOpcodes: List[Opcode] = {
      var i = 0; var j = 0
      val out = mutable.ArrayBuffer.empty[Opcode]
      for (m <- getMatchingBlocks) {
        val tag =
          if (i < m.a && j < m.b) "replace"
          else if (i < m.a) "delete"
          else if (j < m.b) "insert"
          else ""
        if (tag.nonEmpty) out += Opcode(tag, i, m.a, j, m.b)
        i = m.a + m.size
        j = m.b + m.size
        if (m.size > 0) out += Opcode("equal", m.a, m.a + m.size, m.b, m.b + m.size)
      }
      out.toList
    }
  }

  def opcodes(oldValue: String, newValue: String): List[Opcode] =
    new SequenceMatcher(codePoints(oldValue), codePoints(newValue)).getOpcodes
}
