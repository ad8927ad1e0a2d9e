package graft.core.text

import graft.core.{HashParams, Ids}

/** Text-analysis functions for the training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Every formula is integer-exact and mirrored in the DuckDB oracle
  * (graft.Oracle) — no floats, no locale, no randomness.
  */
object TextStats {

  /** Space-split with DuckDB string_split semantics: trailing empties kept,
    * "" yields [""] — keeping every tokenized formula oracle-aligned on
    * texts with trailing/double spaces, not just on sanitized fixtures.
    */
  def tokens(text: String): Array[String] =
    if (text == null) Array.empty else text.split(" ", -1)

  /** Whitespace token count + a BPE-ish subword estimate:
    * sum over words of ceil(len/4).
    */
  def tokenCounts(text: String): (Int, Long) = {
    val w = tokens(text)
    var sub = 0L
    var i = 0
    while (i < w.length) { sub += (w(i).length + 3) / 4; i += 1 }
    (w.length, sub)
  }

  // Stopword marker sets for the n-gram-free language heuristic.
  val StopEn: Set[String] = Set("the", "a", "and", "of", "to", "in")
  val StopFr: Set[String] = Set("le", "la", "et", "les", "des", "un")
  val StopDe: Set[String] = Set("der", "die", "und", "das", "ein", "zu")

  /** Language ID by stopword-marker counting; deterministic tie-break
    * en > fr > de; no hits -> "und".
    */
  def langId(text: String): String = {
    val w = tokens(text)
    var en = 0; var fr = 0; var de = 0
    var i = 0
    while (i < w.length) {
      val t = w(i)
      if (StopEn.contains(t)) en += 1
      if (StopFr.contains(t)) fr += 1
      if (StopDe.contains(t)) de += 1
      i += 1
    }
    if (en >= fr && en >= de && en > 0) "en"
    else if (fr >= de && fr > 0) "fr"
    else if (de > 0) "de"
    else "und"
  }

  final case class Quality(
      nTokens: Int,
      nChars: Int,
      nStop: Int,
      uniqPct: Int, // 100*distinct/total, integer division
      score: Int
  )

  /** Quality score: favors mid-length docs with stopword presence and
    * lexical diversity. All integer arithmetic.
    */
  def quality(text: String): Quality = {
    val w = tokens(text)
    val n = w.length
    if (n == 0) return Quality(0, 0, 0, 0, 0)
    val nStop = w.count(StopEn.contains)
    val uniq = w.toSet.size
    val uniqPct = 100 * uniq / n
    val score = math.min(40, n / 2) +
      math.min(30, 100 * nStop / n) +
      math.min(30, uniqPct / 3)
    Quality(n, text.length, nStop, uniqPct, score)
  }

  final case class Gopher(
      nWords: Int,
      meanWlenX100: Long, // 100*sum(len)/n, integer division
      nStop: Int,
      alphaPctX100: Long, // 100*words-with-an-alphabetic-char/n
      uniqPctX100: Long,  // 100*distinct/n
      passes: Int         // 1 iff every rule holds
  )

  /** Gopher-style document quality rules (Rae et al. 2021, public paper):
    * word-count bounds, mean-word-length bounds, minimum stop-word
    * presence, minimum fraction of alphabetic words, minimum lexical
    * diversity. Integer-exact, oracle-mirrored (q_quality_gopher).
    */
  def gopher(text: String): Gopher = {
    val w = tokens(text)
    val n = w.length
    if (n == 0) return Gopher(0, 0L, 0, 0L, 0L, 0)
    var lenSum = 0L
    var alpha = 0
    var i = 0
    while (i < n) {
      lenSum += w(i).length
      if (w(i).exists(_.isLetter)) alpha += 1
      i += 1
    }
    val nStop = w.count(StopEn.contains)
    val meanX100 = 100L * lenSum / n
    val alphaX100 = 100L * alpha / n
    val uniqX100 = 100L * w.toSet.size / n
    val passes =
      if (n >= 10 && n <= 100000 &&
        meanX100 >= 200 && meanX100 <= 1200 &&
        nStop >= 1 && alphaX100 >= 80 && uniqX100 >= 20) 1 else 0
    Gopher(n, meanX100, nStop, alphaX100, uniqX100, passes)
  }

  final case class C4Stats(nLines: Int, nKept: Int, hasLorem: Boolean,
                           hasBrace: Boolean, pageKept: Boolean)

  /** C4-style page cleaning (Raffel et al. 2020 §2.2 — the published C4
    * heuristics): keep only lines that end in terminal punctuation
    * (.!?") and carry at least 5 words; drop lines mentioning
    * "javascript"; drop the whole page when it contains "lorem ipsum" or
    * a curly brace, or keeps fewer than 3 terminal lines (the 3-sentence
    * rule, sentences approximated by kept terminal lines). Map-only,
    * integer-exact — the oracle recomputes every count arithmetically.
    */
  def c4(text: String): C4Stats = {
    val lines = text.split('\n')
    var kept = 0
    var i = 0
    while (i < lines.length) {
      val l = lines(i).trim
      if (l.nonEmpty) {
        val last = l.charAt(l.length - 1)
        val terminal = last == '.' || last == '!' || last == '?' || last == '"'
        if (terminal && l.split("\\s+").length >= 5 &&
          !l.toLowerCase(java.util.Locale.ROOT).contains("javascript")) kept += 1
      }
      i += 1
    }
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val hasLorem = lower.contains("lorem ipsum")
    val hasBrace = text.indexOf('{') >= 0
    C4Stats(lines.length, kept, hasLorem, hasBrace,
      !hasLorem && !hasBrace && kept >= 3)
  }

  /** Polynomial document fingerprint over md5-derived word codes:
    * fp = (sum_i (code32(w_i) mod 1000003) * 31^(i mod 8)) mod P.
    * The modulus is applied per step (mathematically identical to the
    * oracle's HUGEINT sum-then-mod) so the accumulator never exceeds
    * P + 2.8e16 regardless of document length.
    */
  def fingerprint(text: String): Long = {
    val w = tokens(text)
    var acc = 0L
    var i = 0
    while (i < w.length) {
      acc = (acc + (Ids.code32(w(i)) % 1000003L) * HashParams.Pow31(i % 8)) % HashParams.P
      i += 1
    }
    acc
  }

  /** Winnowing-style fingerprint count: distinct minima of rolling windows
    * (size 4, truncated at the tail) over word codes — the rolling-hash
    * document fingerprinting scheme (Schleimer et al., SIGMOD'03) reduced
    * to its deterministic core.
    */
  def winnowCount(text: String): Int = {
    val w = tokens(text)
    if (w.isEmpty) return 0
    val codes = w.map(Ids.code32)
    val mins = scala.collection.mutable.HashSet.empty[Long]
    var i = 0
    while (i < codes.length) {
      var m = codes(i)
      var j = i + 1
      val end = math.min(i + 4, codes.length)
      while (j < end) { if (codes(j) < m) m = codes(j); j += 1 }
      mins += m
      i += 1
    }
    mins.size
  }

  /** 32-bit SimHash over md5-derived word codes (with multiplicity). */
  def simhash32(text: String): Long = {
    val w = tokens(text)
    val acc = new Array[Int](32)
    var i = 0
    while (i < w.length) {
      val c = Ids.code32(w(i))
      var b = 0
      while (b < 32) {
        if (((c >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}
