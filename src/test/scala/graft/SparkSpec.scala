package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites (one per JVM; sbt runs suites
  * in a single forked JVM so every suite reuses this session).
  */
object SparkTestSession {
  lazy val spark: SparkSession = graft.spark.Sessions.build("local[4]", "graft-test")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
}
