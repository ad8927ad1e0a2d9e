package graft.core.text

/** Character-n-gram language identification after Cavnar & Trenkle,
  * "N-Gram-Based Text Categorization" (1994): each language carries a
  * rank-ordered profile of its most frequent character trigrams (built from
  * common function words and orthography — public linguistic knowledge, no
  * external data); a document is scored by summing rank weights of profile
  * trigrams found in its text, and classified to the best-scoring language.
  *
  * Deterministic: integer weights, fixed tie-break order (en > fr > de >
  * es), "und" when nothing matches. This replaces nothing — the simpler
  * stopword heuristic (TextStats.langId) remains the oracle-mirrored
  * operator; this is the production-grade path, golden-tested on real
  * sentences in each language.
  */
object LangId {

  /** Rank-ordered trigram profiles (most characteristic first). Spaces
    * mark word boundaries, as in the paper's padded n-grams. Public so the
    * SQL oracle generates its scoring CASEs from the SAME profile data —
    * the two scorers cannot drift.
    */
  val Profiles: Seq[(String, Vector[String])] = Seq(
    "en" -> Vector(
      " th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ",
      " to", "to ", "ion", "ed ", " in", "in ", "tio", "ent", " is", "is ",
      "at ", " be", "er ", "es ", " re", "on ", "hat", " wi", "wit", "ith"),
    "fr" -> Vector(
      " le", "le ", " de", "de ", "es ", " la", "la ", "ent", "et ", " et",
      "ion", " un", "un ", "re ", " qu", "que", "ue ", " pa", "par", "les",
      " da", "dan", "ans", "eur", " po", "our", "ais", "ont", "nt ", " co"),
    "de" -> Vector(
      " de", "der", "er ", "ie ", " di", "die", "und", "nd ", " un", "ein",
      "in ", "ich", "ch ", "sch", "en ", " ge", "ung", "ng ", " da", "das",
      "as ", " zu", "zu ", "cht", "ber", " au", "auf", "ten", "den", " ei"),
    "es" -> Vector(
      " de", "de ", " la", "la ", "os ", " lo", "los", "as ", " el", "el ",
      "ión", "que", " qu", "ue ", "ent", " en", "en ", "ar ", " co", "con",
      " es", "es ", "ado", "cio", " un", "una", "nte", "sta", "era", "por"))

  /** Trigram packed into a Long (16 bits per char) — scoring never
    * allocates a string per position.
    */
  @inline private def pack(c0: Char, c1: Char, c2: Char): Long =
    (c0.toLong << 32) | (c1.toLong << 16) | c2.toLong

  private val ProfileMaps: Seq[(String, java.util.HashMap[java.lang.Long, Integer])] =
    Profiles.map { case (lang, grams) =>
      // rank weight: top trigram scores |profile|, last scores 1
      val m = new java.util.HashMap[java.lang.Long, Integer]()
      grams.zipWithIndex.foreach { case (g, i) =>
        m.put(pack(g.charAt(0), g.charAt(1), g.charAt(2)), grams.length - i)
      }
      lang -> m
    }

  /** Document trigrams over a lowercased, space-padded text. */
  def trigrams(text: String): Iterator[String] = {
    val t = " " + text.toLowerCase(java.util.Locale.ROOT) + " "
    Iterator.range(0, math.max(0, t.length - 2)).map(i => t.substring(i, i + 3))
  }

  // hot-loop views: array-indexed maps, one boxed key per position
  private val MapArray: Array[java.util.HashMap[java.lang.Long, Integer]] =
    ProfileMaps.map(_._2).toArray
  private val LangNames: Array[String] = ProfileMaps.map(_._1).toArray

  /** Per-language rank-weight scores, in profile order. One rolling pass
    * over the padded text; per-position cost is one boxed key plus four
    * array-indexed hash probes (no substring allocation, no List walking).
    */
  def scores(text: String): Seq[(String, Long)] = {
    val t = " " + (if (text == null) "" else text).toLowerCase(java.util.Locale.ROOT) + " "
    val acc = new Array[Long](MapArray.length)
    var i = 0
    val end = t.length - 2
    while (i < end) {
      val key: java.lang.Long = pack(t.charAt(i), t.charAt(i + 1), t.charAt(i + 2))
      var l = 0
      while (l < MapArray.length) {
        val w = MapArray(l).get(key)
        if (w != null) acc(l) += w.intValue()
        l += 1
      }
      i += 1
    }
    LangNames.indices.map(l => LangNames(l) -> acc(l))
  }

  /** Classify: argmax of summed rank weights; ties break by profile order;
    * zero everywhere -> "und".
    */
  def classify(text: String): String = {
    var best = "und"
    var bestScore = 0L
    scores(text).foreach { case (lang, s) =>
      if (s > bestScore) { bestScore = s; best = lang }
    }
    best
  }
}
