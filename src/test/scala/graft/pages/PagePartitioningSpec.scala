package graft.pages

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PagePartitioningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // key "hot" carries 90% of rows
    spark
      .range(1000)
      .select(
        col("id"),
        when(col("id") % 10 < 9, "hot").otherwise(concat(lit("cold"), col("id") % 7)).as("k"),
        (col("id") % 13).cast("double").as("v")
      )
  }

  test("hotKeys finds the heavy hitters deterministically") {
    val hot = PagePartitioning.hotKeys(skewed, "k", topK = 1)
    assert(hot == Seq("hot"))
  }

  test("saltedAgg equals the unsalted aggregate exactly") {
    val hot = PagePartitioning.hotKeys(skewed, "k", topK = 1)
    val salted = PagePartitioning
      .saltedAgg(
        skewed,
        "k",
        "id",
        Map("n" -> count(lit(1)), "s" -> sum(col("v").cast("decimal(28,6)"))),
        hot,
        saltFactor = 8
      )
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2).doubleValue())))
      .toMap
    val plain = skewed
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(28,6)")).as("s"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2).doubleValue())))
      .toMap
    assert(salted == plain)
  }

  test("only hot keys fan out over salts") {
    val salts = skewed
      .withColumn("__salt", PagePartitioning.saltFor(col("k"), col("id"), Seq("hot"), 8))
      .groupBy("k")
      .agg(countDistinct("__salt").as("d"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toMap
    assert(salts("hot") > 1)
    assert(salts.filterNot(_._1 == "hot").values.forall(_ == 1L))
  }

  test("canonical layout keeps all rows and adds the bucket column") {
    val pages = PageGen.clean(spark, 2000)
    val laid = PagePartitioning.canonicalLayout(pages, files = 8, buckets = 32)
    assert(laid.count() == 2000)
    assert(laid.columns.contains("domain_bucket"))
    assert(laid.select(max("domain_bucket")).head().getLong(0) < 32)
  }

  test("graft_dot is callable from SQL via the session extension") {
    val v = spark
      .sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head()
      .getDouble(0)
    assert(v == 11.0)
  }
}
