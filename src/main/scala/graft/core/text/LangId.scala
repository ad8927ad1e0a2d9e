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

  private val ProfileMaps: Seq[(String, Map[String, Int])] =
    Profiles.map { case (lang, grams) =>
      // rank weight: top trigram scores |profile|, last scores 1
      lang -> grams.zipWithIndex.map { case (g, i) => g -> (grams.length - i) }.toMap
    }

  /** Document trigrams over a lowercased, space-padded text. */
  def trigrams(text: String): Iterator[String] = {
    val t = " " + text.toLowerCase(java.util.Locale.ROOT) + " "
    Iterator.range(0, math.max(0, t.length - 2)).map(i => t.substring(i, i + 3))
  }

  /** Per-language rank-weight scores, in profile order. */
  def scores(text: String): Seq[(String, Long)] = {
    val grams =
      if (text == null) Array.empty[String] else trigrams(text).toArray
    ProfileMaps.map { case (lang, weights) =>
      var s = 0L
      var i = 0
      while (i < grams.length) { s += weights.getOrElse(grams(i), 0); i += 1 }
      lang -> s
    }
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
