package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record parsing — the container format
  * Common-Crawl ships. One record = a `WARC/1.0` version line, CRLF
  * header lines (`Name: value`), a blank line, then `Content-Length`
  * bytes of payload.
  *
  * `parseRecords` maps one RECORD-ized string column to typed fields —
  * every extraction a single codegen regexp in the Java ∩ RE2 dialect
  * (the same oracle-replayable discipline as the PII rules), so the
  * whole parse is a ZERO-SHUFFLE map stage at any corpus size.
  * Record-izing a raw multi-record WARC file is the upstream text
  * source's job (`spark.read.option("lineSep", "WARC/1.0\r\n")` or a
  * length-aware splitter over `binaryFile` — at 100 TB that split
  * must happen at the scan, never by collecting blobs).
  *
  * `valid` cross-checks the declared Content-Length against the
  * payload actually present — the integrity flag a crawl-ingest
  * pipeline filters on before trusting a record.
  */
object Warc {

  private def header(rec: Column, name: String): Column = {
    val m = regexp_extract(rec, "(?s)\r\n" + name + ": ([^\r\n]*)\r\n", 1)
    when(m =!= "", m)
  }

  /** Parse a record-per-row string column into
    * (warc_type, uri, warc_date, content_length, payload, valid).
    * Headers are matched case-sensitively per the WARC spec's canonical
    * names; a missing header yields null, a malformed record yields
    * all-null fields and valid = false.
    */
  def parseRecords(df: DataFrame, recordCol: String): DataFrame = {
    val rec = col(recordCol)
    val isWarc = rec.startsWith("WARC/1.0\r\n")
    val payload = regexp_extract(rec, "(?s)\r\n\r\n(.*)$", 1)
    df.withColumn("warc_type", when(isWarc, header(rec, "WARC-Type")))
      .withColumn("uri", when(isWarc, header(rec, "WARC-Target-URI")))
      .withColumn("warc_date", when(isWarc, header(rec, "WARC-Date")))
      .withColumn("content_length", when(isWarc, header(rec, "Content-Length")).cast("long"))
      .withColumn("payload", when(isWarc, payload))
      .withColumn(
        "valid",
        isWarc && col("content_length").isNotNull &&
          length(col("payload")) === col("content_length")
      )
  }
}
