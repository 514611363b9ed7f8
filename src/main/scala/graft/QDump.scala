package graft

import org.apache.spark.sql.SparkSession

/** Scratch single-query row dump (golden regeneration):
  * `runMain graft.QDump q62_meta_learner_cv` prints every row sorted.
  */
object QDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession
      .builder()
      .appName("graft-qdump")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val out = SparkEntry.queries(name)(spark, sfDir)
      val cols = out.columns.sorted
      out
        .selectExpr(cols: _*)
        .collect()
        .map(_.toSeq.map(String.valueOf).mkString("|"))
        .sorted
        .foreach(r => println(s"[qdump] $name $r"))
      out.unpersist()
    }
    spark.stop()
  }
}
