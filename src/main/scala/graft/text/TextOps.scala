package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: language ID
  * (marker-token heuristic), quality scoring, token counting, document
  * fingerprinting. All pure Catalyst expressions (no UDFs) so they stay
  * inside whole-stage codegen and are exactly reproducible by the
  * DuckDB oracle.
  */
object TextOps {

  /** Whitespace token array (single-space tokenization — matches the
    * synthetic corpus; swap the delimiter regex for real data).
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: runs of letters, runs of digits, or a
    * single other non-space character.
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeishCount(textColName: String): Column =
    expr(s"size(regexp_extract_all($textColName, '$BpeishPattern', 0))")

  /** Stopword ratio over whitespace tokens. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "or", "in", "to", "is")

  def stopwordCount(textColName: String): Column = {
    val list = Stopwords.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter(split($textColName, ' '), w -> w in ($list)))")
  }

  /** Deterministic quality score in [0,1]: blends length saturation,
    * stopword ratio and mean token length (all order-free arithmetic).
    */
  def qualityScore(textColName: String): Column = {
    val t = col(textColName)
    val nTok = tokenCount(t).cast("double")
    val nChars = length(t).cast("double")
    val stopRatio = stopwordCount(textColName).cast("double") / greatest(nTok, lit(1.0))
    val lenScore = least(nChars / lit(500.0), lit(1.0))
    val meanTokLen = nChars / greatest(nTok, lit(1.0))
    val tokLenScore = when(meanTokLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    round((lenScore * 0.4 + stopRatio * 0.3 + tokLenScore * 0.3), 6)
  }

  /** Marker-token language-ID heuristic: count language-marker tokens,
    * argmax with lexicographic tie-break (deterministic; 'en' wins ties
    * only if lexicographically first among tied).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht"),
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "los", "y", "que"),
    "fr" -> Seq("le", "la", "et", "les")
  )

  def markerCount(textColName: String, markers: Seq[String]): Column = {
    val list = markers.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter(split($textColName, ' '), w -> w in ($list)))")
  }

  /** Predicted language code per document; ties break on ascending
    * lang code, all-zero marker counts fall back to 'und'.
    */
  def withLangId(df: DataFrame, textColName: String, out: String): DataFrame = {
    val scored = LangMarkers.map { case (lang, ms) =>
      struct(markerCount(textColName, ms).as("score"), lit(lang).as("lang"))
    }
    df.withColumn("__lang_scores", array(scored: _*))
      .withColumn(
        out,
        expr(
          """aggregate(
               __lang_scores,
               cast(null as struct<score:int, lang:string>),
               (acc, x) -> case when acc is null then x
                                when x.score > acc.score then x
                                when x.score = acc.score and x.lang < acc.lang then x
                                else acc end).lang"""
        )
      )
      .withColumn(
        out,
        when(
          expr("aggregate(__lang_scores, 0, (a, x) -> a + x.score)") === 0,
          lit("und")
        ).otherwise(col(out))
      )
      .drop("__lang_scores")
  }

  /** Whole-document fingerprint: md5 of whitespace-normalized,
    * lowercased text (both engines produce identical lowercase hex).
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))
}
