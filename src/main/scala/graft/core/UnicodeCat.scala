package graft.core

/** Two-letter Unicode general-category names, matching Python
  * `unicodedata.category` as used by the reference value encoder
  * (reference `src/correction.py:153-156`). Java exposes the same
  * categories as `Character.getType` int constants; this maps them to
  * the standard two-letter names.
  */
object UnicodeCat {
  private val byType: Array[String] = {
    val a = Array.fill(31)("Cn")
    a(Character.UNASSIGNED) = "Cn"
    a(Character.UPPERCASE_LETTER) = "Lu"
    a(Character.LOWERCASE_LETTER) = "Ll"
    a(Character.TITLECASE_LETTER) = "Lt"
    a(Character.MODIFIER_LETTER) = "Lm"
    a(Character.OTHER_LETTER) = "Lo"
    a(Character.NON_SPACING_MARK) = "Mn"
    a(Character.ENCLOSING_MARK) = "Me"
    a(Character.COMBINING_SPACING_MARK) = "Mc"
    a(Character.DECIMAL_DIGIT_NUMBER) = "Nd"
    a(Character.LETTER_NUMBER) = "Nl"
    a(Character.OTHER_NUMBER) = "No"
    a(Character.SPACE_SEPARATOR) = "Zs"
    a(Character.LINE_SEPARATOR) = "Zl"
    a(Character.PARAGRAPH_SEPARATOR) = "Zp"
    a(Character.CONTROL) = "Cc"
    a(Character.FORMAT) = "Cf"
    a(Character.PRIVATE_USE) = "Co"
    a(Character.SURROGATE) = "Cs"
    a(Character.DASH_PUNCTUATION) = "Pd"
    a(Character.START_PUNCTUATION) = "Ps"
    a(Character.END_PUNCTUATION) = "Pe"
    a(Character.CONNECTOR_PUNCTUATION) = "Pc"
    a(Character.OTHER_PUNCTUATION) = "Po"
    a(Character.MATH_SYMBOL) = "Sm"
    a(Character.CURRENCY_SYMBOL) = "Sc"
    a(Character.MODIFIER_SYMBOL) = "Sk"
    a(Character.OTHER_SYMBOL) = "So"
    a(Character.INITIAL_QUOTE_PUNCTUATION) = "Pi"
    a(Character.FINAL_QUOTE_PUNCTUATION) = "Pf"
    a
  }

  def category(codePoint: Int): String = byType(Character.getType(codePoint))

  /** Category sequence for a string, one entry per code point. */
  def categories(s: String): Vector[String] =
    Difflib.codePoints(s).toVector.map(category)
}
