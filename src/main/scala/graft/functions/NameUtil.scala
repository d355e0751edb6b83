package graft.functions

import java.text.Normalizer

/** Name normalization for schema identifiers (P2 in SURVEY.md §2.a).
  *
  * Re-expresses the behavior of the reference's normalizers
  * (`/root/reference/datagouv_tools/util.py:24-123`): camelCase →
  * snake_case splitting on Unicode general-category transitions, accent
  * stripping via NFKD, and the combined "standard" form. These run on the
  * driver over schema metadata (column/table names), never per row.
  */
object NameUtil {

  /** Unicode general category of a char as a two-letter code ("Lu", "Ll",
    * "Nd", "Pc", ...), matching Python's `unicodedata.category`.
    */
  private def category(ch: Char): String = Character.getType(ch) match {
    case Character.UPPERCASE_LETTER => "Lu"
    case Character.LOWERCASE_LETTER => "Ll"
    case Character.TITLECASE_LETTER => "Lt"
    case Character.MODIFIER_LETTER => "Lm"
    case Character.OTHER_LETTER => "Lo"
    case Character.NON_SPACING_MARK => "Mn"
    case Character.ENCLOSING_MARK => "Me"
    case Character.COMBINING_SPACING_MARK => "Mc"
    case Character.DECIMAL_DIGIT_NUMBER => "Nd"
    case Character.LETTER_NUMBER => "Nl"
    case Character.OTHER_NUMBER => "No"
    case Character.SPACE_SEPARATOR => "Zs"
    case Character.LINE_SEPARATOR => "Zl"
    case Character.PARAGRAPH_SEPARATOR => "Zp"
    case Character.CONTROL => "Cc"
    case Character.FORMAT => "Cf"
    case Character.PRIVATE_USE => "Co"
    case Character.SURROGATE => "Cs"
    case Character.DASH_PUNCTUATION => "Pd"
    case Character.START_PUNCTUATION => "Ps"
    case Character.END_PUNCTUATION => "Pe"
    case Character.CONNECTOR_PUNCTUATION => "Pc"
    case Character.OTHER_PUNCTUATION => "Po"
    case Character.MATH_SYMBOL => "Sm"
    case Character.CURRENCY_SYMBOL => "Sc"
    case Character.MODIFIER_SYMBOL => "Sk"
    case Character.OTHER_SYMBOL => "So"
    case Character.INITIAL_QUOTE_PUNCTUATION => "Pi"
    case Character.FINAL_QUOTE_PUNCTUATION => "Pf"
    case _ => "Cn"
  }

  /** Transitions that do NOT split: upper→lower (camel hump interior),
    * and anything adjacent to a connector (so '_' never splits twice —
    * this is what makes [[toSnake]] idempotent).
    */
  private val defaultDontSplit: Seq[(Option[String], Option[String])] =
    Seq(Some("Lu") -> Some("Ll"), None -> Some("Pc"), Some("Pc") -> None)

  /** Split text into chunks wherever the Unicode category changes, except
    * at transitions listed in `dontSplit` ((None, x) / (x, None) wildcard).
    */
  def splitOnCat(text: String,
                 dontSplit: Seq[(Option[String], Option[String])] =
                 defaultDontSplit): Seq[String] = {
    if (text.isEmpty) return Seq("")
    def splitBetween(prev: String, cur: String): Boolean =
      !dontSplit.exists { case (a, b) =>
        a.forall(_ == prev) && b.forall(_ == cur)
      }
    val cats = text.map(category)
    val chunks = Seq.newBuilder[String]
    var start = 0
    for (i <- 1 until text.length) {
      if (cats(i) != cats(i - 1) && splitBetween(cats(i - 1), cats(i))) {
        chunks += text.substring(start, i)
        start = i
      }
    }
    chunks += text.substring(start)
    chunks.result()
  }

  /** camelCase → snake_case; idempotent. "Lorem2Ipsum" → "lorem_2_ipsum". */
  def toSnake(text: String): String =
    splitOnCat(text).mkString("_").toLowerCase

  /** Strip accents and any non-ASCII char: NFKD-decompose then drop
    * everything outside ASCII. "Code Départ’ement" → "Code Departement".
    */
  def sanitize(text: String): String =
    Normalizer.normalize(text, Normalizer.Form.NFKD)
      .replaceAll("[^\\x00-\\x7F]", "")

  /** Spaces → underscores, sanitize, lowercase. */
  def toStandard(text: String): String =
    sanitize(text.replace(" ", "_")).toLowerCase
}
