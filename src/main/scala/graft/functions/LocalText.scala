package graft.functions

/** JVM-side text kernels for in-task (per-record) scoring — the local
  * twins of the [[Text]] column functions, used where a broadcast model
  * map scores candidates inside a `mapPartitions` (the streaming scorer,
  * reference um/re/streaming/Htmls2PredsPipe.scala:89-112) and a column
  * plan cannot express per-record argmax over a stream.
  *
  * Semantics must stay bit-identical to the Column versions — the
  * differential parity is asserted by FidelitySpec/StreamingSpec, and
  * the reference behaviors are the same ones [[Text]] documents:
  * tokenazer (Utils.scala:57-59), gramsByN (Utils.scala:40-52),
  * parseDouble (Utils.scala:123-129).
  */
object LocalText {

  /** Strip to letters, split on single spaces with Java `split(" ")`
    * semantics (the reference tokenazer is exactly this). */
  def tokenize(s: String): Array[String] =
    s.replaceAll("[^A-Za-z]+", " ").split(" ")

  /** Char n-grams with the reference's quirky bounds: the first char
    * never starts a gram and the final gram stops one short of the end
    * — count = max(0, len - n - 1). */
  def charGrams(s: String, n: Int): IndexedSeq[String] = {
    val len = s.length
    if (len < n + 2) Vector.empty
    else (1 until (len - n)).map(i => s.substring(i, i + n))
  }

  private val LeadNumber = "^-?[0-9][0-9,]*(\\.[0-9]+)?|^-?\\.[0-9]+".r

  /** Locale-aware (en_US) leading-number parse; None when unparseable.
    * Same accepted divergences from java.text.NumberFormat as the
    * Column version ([[Text.parsePriceLocale]]). */
  def parsePriceLocale(s: String): Option[Double] =
    LeadNumber.findPrefixOf(s).map(m => m.replace(",", "").toDouble)
}
