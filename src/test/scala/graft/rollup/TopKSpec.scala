package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable top-k heavy-hitter sketch: exact below capacity (the mode
  * the oracle-checked driver query runs in), heavy-hitter presence
  * guaranteed above it, and the tier merge must equal sketching the
  * raw rows directly while in exact mode.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val raw = spark
    .range(20000)
    .select(
      concat(lit("s"), pmod(col("id"), lit(3))).as("series"),
      timestamp_seconds(lit(1704067200L) + col("id") * 7).as("ts"),
      // zipf-ish: low ids reappear constantly, tail ids are rare
      concat(lit("u"), pmod(xxhash64(col("id")), lit(40L)) * pmod(col("id"), lit(3))).as("user")
    )

  test("exact mode: sketch counters equal exact per-item counts, top-5 matches exact ranking") {
    // <= 80 distinct items per state, capacity 128 -> eviction and
    // merge truncation never fire; the sketch IS the exact count map
    val got = raw
      .groupBy("series")
      .agg(TopK.sketch(col("user"), 128).as("st"))
      .select(col("series"), TopK.present(col("st"), 5).as("top5"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("series")
      .orderBy(col("c").desc, col("user").asc)
    val want = raw
      .groupBy("series", "user")
      .agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= 5)
      .groupBy("series")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("r").as("r"), concat_ws(":", col("user"), col("c")).as("s")))),
            e => e.getField("s")
          ),
          ","
        ).as("top5")
      )
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("tier merge in exact mode equals sketching raw directly") {
    val t1m = Rollup.fromRaw(raw, Seq("series"), "ts", "1m", lit(0L), topk = Map("tu" -> col("user")))
    val t1h = Rollup.reRollup(t1m, Seq("series"), "1m" -> "1h", topkCols = Seq("tu"))
    val t1d = Rollup.reRollup(t1h, Seq("series"), "1h" -> "1d", topkCols = Seq("tu"))
    val direct = Rollup.fromRaw(raw, Seq("series"), "ts", "1d", lit(0L), topk = Map("tu" -> col("user")))
    val m = t1d.select(col("series"), col("bucket_ts"), TopK.present(col("tu"), 10).as("t"))
    val d = direct.select(col("series"), col("bucket_ts"), TopK.present(col("tu"), 10).as("t"))
    assert(m.except(d).isEmpty && d.except(m).isEmpty)
  }

  test("over capacity: every true heavy hitter survives, counts within N/capacity") {
    // 3 planted heavy hitters (~1500 rows each) in a sea of ~15500
    // near-unique tail items; capacity 64 << ~15503 distinct items
    val n = 20000L
    val hot = spark
      .range(4500)
      .select(concat(lit("hot"), pmod(col("id"), lit(3))).as("user"))
    val tail = spark.range(n - 4500).select(concat(lit("t"), col("id")).as("user"))
    val items = hot.unionByName(tail)
    val cap = 64
    val st = items.agg(TopK.sketch(col("user"), cap).as("st"))
    val entries = st.select(explode(map_entries(col("st")))).collect()
    val counters = entries.map(r => (r.getStruct(0).getString(0), r.getStruct(0).getLong(1))).toMap
    assert(counters.size <= cap)
    (0 until 3).foreach { h =>
      val c = counters.get(s"hot$h")
      assert(c.isDefined, s"heavy hitter hot$h (freq 1500 > N/cap ${n / cap}) missing from sketch")
      assert(c.get >= 1500 && c.get <= 1500 + n / cap, s"hot$h count ${c.get} outside [1500, 1500 + N/cap]")
    }
  }
}
