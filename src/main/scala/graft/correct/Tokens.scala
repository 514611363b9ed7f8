package graft.correct

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small scalar-function family around the correction pipeline
  * (SURVEY.md §2.7 V4-V7) — all pure `when/otherwise`/`concat`
  * expressions, codegen'd, no UDFs.
  */
object Tokens {

  /** V4: the reference's missing-value token — `''` is modeled as
    * `'<MV>'` inside correctors and decoded back on output
    * (`src/correction.py:600-606`, `src/helpers.py:316-321`).
    */
  val MvToken = "<MV>"

  def mvEncode(c: Column): Column = when(c === "", lit(MvToken)).otherwise(c)

  def mvDecode(c: Column): Column = when(c === MvToken, lit("")).otherwise(c)

  /** V5: row serialization used to key the frozen LLM cache
    * (`src/helpers.py:324-373`): values joined with commas, the error
    * cell masked by an `<Error>` sentinel. Never leaves the machine —
    * it exists only as a deterministic join key.
    */
  def promptKey(cols: Seq[Column], errorIdx: Int): Column =
    concat_ws(",", cols.zipWithIndex.map { case (c, i) =>
      if (i == errorIdx) lit("<Error>") else c
    }: _*)

  /** V6: token log-probabilities -> candidate score,
    * pr = exp(sum(logprobs)) (`src/helpers.py:316-321`).
    */
  def logprobScore(logprobs: Column): Column =
    exp(aggregate(logprobs, lit(0.0), (acc, x) => acc + x))

  /** V7: the value corrector only models values up to
    * MAX_VALUE_LENGTH=50 characters (`src/correction.py:123`).
    */
  val MaxValueLength = 50

  def withinValueLength(c: Column): Column = length(c) <= MaxValueLength
}
