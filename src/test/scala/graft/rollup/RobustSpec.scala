package graft.rollup

import java.sql.Timestamp

import graft.SparkSpec

class RobustSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("lower-median MAD flags the spike a mean/stddev z-score would dilute") {
    // values 10,11,9,10,12,100: lower median (n=6, rank 3 of sorted
    // 9,10,10,11,12,100) = 10; deviations 0,1,1,0,2,90 -> sorted
    // 0,0,1,1,2,90, lower MAD (rank 3) = 1; outlier iff dev > 3
    val df = Seq(10.0, 11.0, 9.0, 10.0, 12.0, 100.0).zipWithIndex.map { case (v, i) =>
      ("m", ts(i.toLong + 1), i.toLong + 1, v)
    }.toDF("series", "t", "oid", "v")

    val got = Robust
      .madOutliers(df, "series", "t", "oid", "v", k = 3)
      .collect()
      .map(r => (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
      .sortBy(_._1)

    assert(got.forall(r => r._2 == 10000000L && r._3 == 1000000L)) // med, mad
    assert(got.map(g => g._1 -> g._5).toMap ==
      Map(1L -> false, 2L -> false, 3L -> false, 4L -> false, 5L -> false, 6L -> true))
  }

  test("series are independent and even counts take the lower median") {
    // series a: 1,2,3,4 -> lower median rank (4+1) div 2 = 2 -> 2
    val df = Seq(
      ("a", ts(1), 1L, 1.0),
      ("a", ts(2), 2L, 2.0),
      ("a", ts(3), 3L, 3.0),
      ("a", ts(4), 4L, 4.0),
      ("b", ts(1), 5L, 50.0)
    ).toDF("series", "t", "oid", "v")
    val rows = Robust.madOutliers(df, "series", "t", "oid", "v").collect()
    val aMed = rows.filter(_.getString(0) == "a").map(_.getLong(4)).distinct
    val bMed = rows.filter(_.getString(0) == "b").map(_.getLong(4)).distinct
    assert(aMed.toSeq == Seq(2000000L))
    assert(bMed.toSeq == Seq(50000000L))
  }
}
