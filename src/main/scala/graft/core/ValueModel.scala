package graft.core

import scala.collection.mutable

/** Baran-style value corrector: mines string-edit transformations from
  * (error, correction) example pairs and replays them on new errors.
  *
  * Behavior-parity reimplementation of the reference's four value models
  * (remover / adder / replacer / swapper) under the two value encodings
  * (identity / unicode category) — reference `src/correction.py:148-219`.
  * The reference keys its models by a JSON encoding of the old value; here
  * the key is an equivalent injective string. Probabilities are
  * count / total-count per (model, encoding, encodedOldValue) bucket,
  * identical to the reference.
  *
  * Pure Scala — usable inside Spark closures (all state is immutable after
  * [[ValueModels.fromPairs]]).
  */
object ValueModel {

  sealed trait Encoding { def name: String }
  case object IdentityEnc extends Encoding { val name = "identity" }
  case object UnicodeEnc extends Encoding { val name = "unicode" }
  val encodings: List[Encoding] = List(IdentityEnc, UnicodeEnc)

  /** Injective key for a value under an encoding (stands in for the
    * reference's `json.dumps(...)` key; exact JSON formatting is
    * unobservable — only key equality matters).
    */
  def encode(value: String, enc: Encoding): String = enc match {
    case IdentityEnc => "i:" + value
    case UnicodeEnc  => "u:" + UnicodeCat.categories(value).mkString(",")
  }

  /** One edit of a transformation: replace code points [i1,i2) of the old
    * value with `repl` ("" for remover; for adder i1==i2).
    */
  final case class Edit(i1: Int, i2: Int, repl: String)

  /** A transformation = the ordered edits of one kind mined from one
    * (old,new) example. Kinds: remover, adder, replacer. The swapper is a
    * whole-value mapping, modeled separately.
    */
  final case class Transform(kind: String, edits: List[Edit]) {
    /** Stable key for counting identical transformations. */
    def key: String = kind + "|" + edits.map(e => s"${e.i1},${e.i2}>${e.repl}").mkString(";")
  }

  val kinds: List[String] = List("remover", "adder", "replacer", "swapper")

  /** Mine the per-kind transformations from one labeled pair
    * (reference `src/correction.py:158-182`): difflib opcodes over
    * (old,new); delete→remover, insert→adder, replace→replacer; plus the
    * swapper which maps the whole old value to the whole new value.
    * Returns (kind -> transform) for kinds with at least one edit, and the
    * swapper always.
    */
  def mine(oldValue: String, newValue: String): Map[String, Transform] = {
    val newCps = Difflib.codePoints(newValue)
    def slice(j1: Int, j2: Int): String = new String(newCps, j1, j2 - j1)
    val rem = mutable.ListBuffer.empty[Edit]
    val add = mutable.ListBuffer.empty[Edit]
    val rep = mutable.ListBuffer.empty[Edit]
    for (op <- Difflib.opcodes(oldValue, newValue)) op.tag match {
      case "delete"  => rem += Edit(op.i1, op.i2, "")
      case "insert"  => add += Edit(op.i1, op.i2, slice(op.j1, op.j2))
      case "replace" => rep += Edit(op.i1, op.i2, slice(op.j1, op.j2))
      case _         =>
    }
    val m = mutable.Map.empty[String, Transform]
    if (rem.nonEmpty) m("remover") = Transform("remover", rem.toList)
    if (add.nonEmpty) m("adder") = Transform("adder", add.toList)
    if (rep.nonEmpty) m("replacer") = Transform("replacer", rep.toList)
    m("swapper") = Transform("swapper", List(Edit(0, 0, newValue)))
    m.toMap
  }

  /** Replay a transformation on an error value using the reference's
    * index-character-dictionary semantics (`src/correction.py:184-205`):
    * remover/replacer blank positions [i1,i2); adder/replacer prepend the
    * replacement at position i1 (appending a new slot when i1 == length).
    */
  def applyTransform(oldValue: String, t: Transform): String = {
    if (t.kind == "swapper") return t.edits.head.repl
    val cps = Difflib.codePoints(oldValue)
    val dict = mutable.LinkedHashMap.empty[Int, String]
    var i = 0
    while (i < cps.length) {
      dict(i) = new String(Array(cps(i)), 0, 1)
      i += 1
    }
    for (e <- t.edits) {
      if (t.kind == "remover" || t.kind == "replacer") {
        var k = e.i1
        while (k < e.i2) { dict(k) = ""; k += 1 }
      }
      if (t.kind == "adder" || t.kind == "replacer") {
        val ov = dict.getOrElse(e.i1, "")
        dict(e.i1) = e.repl + ov
      }
    }
    val sb = new StringBuilder
    var k = 0
    while (k < dict.size) { sb.append(dict.getOrElse(k, "")); k += 1 }
    sb.toString
  }
}

/** Frozen value models built from labeled (old,new) pairs; replayable on new
  * error values. Keyed by (kind, encoding, encodedOldValue) → transformation
  * counts. Serializable so it can be broadcast to executors.
  */
final class ValueModels(
    // (kind, encodedOld) -> (transformKey -> (Transform, count))
    private val store: Map[(String, String), Map[String, (ValueModel.Transform, Double)]]
) extends Serializable {
  import ValueModel._

  /** Candidate corrections with probabilities for an error value, one map per
    * (kind, encoding) — the reference emits one feature column per
    * `value_{kind}_{encoding}` (`src/correction.py:467-472`).
    */
  def suggest(errorValue: String): Map[String, Map[String, Double]] = {
    (for {
      kind <- kinds
      enc <- encodings
    } yield {
      val key = (kind, encode(errorValue, enc))
      val suggestions: Map[String, Double] = store.get(key) match {
        case None => Map.empty
        case Some(transforms) =>
          val total = transforms.valuesIterator.map(_._2).sum
          // insertion-order replay like the reference; later duplicates of the
          // same produced string overwrite earlier (dict semantics)
          val out = mutable.LinkedHashMap.empty[String, Double]
          for ((_, (t, cnt)) <- transforms) {
            val produced = applyTransform(errorValue, t)
            out(produced) = cnt / total
          }
          out.toMap
      }
      s"value_${kind}_${enc.name}" -> suggestions
    }).toMap
  }
}

object ValueModels {
  import ValueModel._

  def fromPairs(pairs: Seq[(String, String)]): ValueModels = {
    val store = mutable.Map.empty[(String, String), mutable.LinkedHashMap[String, (Transform, Double)]]
    for ((oldV, newV) <- pairs; (kind, t) <- mine(oldV, newV); enc <- encodings) {
      val key = (kind, encode(oldV, enc))
      val m = store.getOrElseUpdate(key, mutable.LinkedHashMap.empty)
      val (tt, c) = m.getOrElse(t.key, (t, 0.0))
      m(t.key) = (tt, c + 1.0)
    }
    new ValueModels(store.view.mapValues(_.toMap).toMap)
  }
}
