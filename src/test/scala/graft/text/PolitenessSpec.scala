package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PolitenessSpec extends SparkSpec {
  import spark.implicits._

  test("per-host slots are priority-ordered, 0-based, and delay-scaled") {
    val urls = Seq(
      ("h1", 1L, 10L), ("h1", 2L, 30L), ("h1", 3L, 20L),
      ("h2", 4L, 5L)
    ).toDF("host", "id", "prio")
    val got = Politeness
      .schedule(urls, "host", priority = col("prio"), tieBreak = "id", delaySec = lit(7))
      .select("id", "slot", "fetch_offset_s")
      .as[(Long, Long, Long)]
      .collect()
      .map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(got(2L) == (0L, 0L)) // highest priority first
    assert(got(3L) == (1L, 7L))
    assert(got(1L) == (2L, 14L))
    assert(got(4L) == (0L, 0L)) // hosts schedule independently
  }

  test("priority ties break on the tie-break column, ascending") {
    val urls = Seq(("h", 9L, 1L), ("h", 3L, 1L)).toDF("host", "id", "prio")
    val got = Politeness
      .schedule(urls, "host", priority = col("prio"), tieBreak = "id", delaySec = lit(2))
      .select("id", "slot")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got(3L) == 0L && got(9L) == 1L)
  }
}
