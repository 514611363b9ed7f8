package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a.example.com/x\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 5\r\n\r\nhello"

  test("a well-formed record parses to typed fields and validates") {
    val out = Warc
      .parseRecords(Seq((1L, good)).toDF("id", "record"), "record")
      .head()
    assert(out.getAs[String]("warc_type") == "response")
    assert(out.getAs[String]("uri") == "https://a.example.com/x")
    assert(out.getAs[String]("warc_date") == "2024-01-01T00:00:00Z")
    assert(out.getAs[Long]("content_length") == 5L)
    assert(out.getAs[String]("payload") == "hello")
    assert(out.getAs[Boolean]("valid"))
  }

  test("length mismatch invalidates; non-WARC rows yield null fields and valid=false") {
    val badLen = good.replace("Content-Length: 5", "Content-Length: 9")
    val rows = Warc
      .parseRecords(Seq((1L, badLen), (2L, "not a warc record")).toDF("id", "record"), "record")
      .orderBy("id")
      .collect()
    assert(!rows(0).getAs[Boolean]("valid") && rows(0).getAs[String]("payload") == "hello")
    assert(rows(1).isNullAt(rows(1).fieldIndex("uri")) && !rows(1).getAs[Boolean]("valid"))
  }

  test("a missing header is null, not empty") {
    val noDate = good.replace("WARC-Date: 2024-01-01T00:00:00Z\r\n", "")
    val out = Warc.parseRecords(Seq((1L, noDate)).toDF("id", "record"), "record").head()
    assert(out.isNullAt(out.fieldIndex("warc_date")))
    assert(out.getAs[Boolean]("valid")) // length still checks out
  }
}
