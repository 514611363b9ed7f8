package graft.dedup

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("finds substitution, insertion, deletion pairs; excludes distance-2") {
    val df = Seq(
      (1L, "spark"),
      (2L, "spork"),  // substitution -> dist 1
      (3L, "sparks"), // insertion -> dist 1
      (4L, "spak"),   // deletion -> dist 1
      (5L, "stork"),  // dist 2 from spark (p->t sub + a->o sub... verify below)
      (6L, "ab"),
      (7L, "ba")      // shares deletion signature "a"/"b" with ab but dist 2
    ).toDF("id", "name")

    val got = FuzzyJoin
      .editDistance1Pairs(df, "id", "name")
      .select("id_a", "id_b", "dist")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet

    assert(got.contains((1L, 2L, 1)))
    assert(got.contains((1L, 3L, 1)))
    assert(got.contains((1L, 4L, 1)))
    assert(got.contains((2L, 5L, 1))) // spork -> stork is one substitution
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(6L, 7L) }) // ab/ba verified out
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 5L) }) // spark/stork dist 2
  }

  test("equal strings pair at distance 0 exactly once") {
    val df = Seq((1L, "same"), (2L, "same")).toDF("id", "name")
    val got = FuzzyJoin
      .editDistance1Pairs(df, "id", "name")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
    assert(got.toSeq == Seq((1L, 2L, 0)))
  }

  test("blocking is complete against brute force on a digit corpus") {
    val names = (0 until 80).map(i => (i.toLong, f"Customer#$i%04d"))
    val df = names.toDF("id", "name")
    val brute = (for {
      (ia, sa) <- names
      (ib, sb) <- names
      if ia < ib
      if levenshtein(sa, sb) <= 1
    } yield (ia, ib)).toSet
    val got = FuzzyJoin
      .editDistance1Pairs(df, "id", "name")
      .select("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == brute)
  }

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      )
    d(a.length)(b.length)
  }
}
