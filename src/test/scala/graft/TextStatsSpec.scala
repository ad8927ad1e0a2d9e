package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.text.TextStats
import graft.core.Ids

class TextStatsSpec extends AnyFunSuite {

  test("n-gram LangId classifies real sentences in four languages") {
    import graft.core.text.LangId
    assert(LangId.classify("the quick brown fox jumps over the lazy dog and runs into the woods") == "en")
    assert(LangId.classify("le chat noir dort dans la maison et les enfants jouent dans le jardin") == "fr")
    assert(LangId.classify("der schnelle braune fuchs springt über den faulen hund und läuft in den wald") == "de")
    assert(LangId.classify("el perro corre por la calle y los niños juegan en el parque con una pelota") == "es")
    assert(LangId.classify("") == "und")
    assert(LangId.classify("zzz qqq xxx") == "und")
  }

  test("gopher rules: a normal doc passes, degenerate docs fail the named rule") {
    import graft.core.text.TextStats
    val good = TextStats.gopher("the cat sat on the mat and then the dog ran off to town")
    assert(good.passes == 1)
    assert(TextStats.gopher("a b").passes == 0) // too few words
    // no stopwords
    assert(TextStats.gopher("zebra yak xylophone walrus vulture toad snake rat quail pig").nStop == 0)
    assert(TextStats.gopher("zebra yak xylophone walrus vulture toad snake rat quail pig").passes == 0)
    // repeated single word: uniq 10% < 20%
    assert(TextStats.gopher(Seq.fill(20)("the").mkString(" ")).passes == 0)
    // numeric tokens: alpha% = 0
    assert(TextStats.gopher(Seq.tabulate(20)(i => s"$i$i").mkString(" ")).alphaPctX100 == 0)
  }


  test("token counts: whitespace + subword estimate") {
    val (ws, sub) = TextStats.tokenCounts("abcd efghijkl m")
    assert(ws == 3)
    assert(sub == 1 + 2 + 1) // ceil(4/4)+ceil(8/4)+ceil(1/4)
  }

  test("langId picks the dominant stopword set; und when no markers") {
    assert(TextStats.langId("the cat of a hat") == "en")
    assert(TextStats.langId("le chat et la table des") == "fr")
    assert(TextStats.langId("der hund und die katze") == "de")
    assert(TextStats.langId("xyzzy plugh") == "und")
    assert(TextStats.langId("") == "und")
  }

  test("quality components are exact integers") {
    val q = TextStats.quality("the the b")
    assert(q.nTokens == 3 && q.nStop == 2)
    assert(q.uniqPct == 100 * 2 / 3)
    assert(q.score == math.min(40, 1) + math.min(30, 66) + math.min(30, q.uniqPct / 3))
  }

  test("code32 equals the first 8 md5 hex chars") {
    val w = "hello"
    assert(Ids.code32(w) == java.lang.Long.parseLong(Ids.md5(w).take(8), 16))
    assert(Ids.md5("hello") == "5d41402abc4b2a76b9719d911017c592")
  }

  test("fingerprint is stable and position-sensitive") {
    assert(TextStats.fingerprint("a b c") == TextStats.fingerprint("a b c"))
    assert(TextStats.fingerprint("a b c") != TextStats.fingerprint("c b a"))
  }

  test("winnow: short docs yield >=1 fingerprint; dup text equal counts") {
    assert(TextStats.winnowCount("a") == 1)
    assert(TextStats.winnowCount("a b c d e f g h") ==
      TextStats.winnowCount("a b c d e f g h"))
    // string_split semantics: "" tokenizes to [""] (one empty word)
    assert(TextStats.winnowCount("") == 1)
  }

  test("tokens follow DuckDB string_split semantics on edges") {
    assert(TextStats.tokens("").toSeq == Seq(""))
    assert(TextStats.tokens("a b ").toSeq == Seq("a", "b", ""))
    assert(TextStats.tokens("a  b").toSeq == Seq("a", "", "b"))
  }

  test("fingerprint stays in [0,P) for arbitrarily long documents") {
    val long = Array.fill(5000)("wordy").mkString(" ")
    val fp = TextStats.fingerprint(long)
    assert(fp >= 0 && fp < graft.core.HashParams.P)
  }

  test("simhash: equal texts equal; bit flips bounded by word changes") {
    val a = TextStats.simhash32("the quick brown fox jumps over the lazy dog")
    val b = TextStats.simhash32("the quick brown fox jumps over the lazy dog")
    assert(a == b)
    assert(a >= 0 && a <= 0xffffffffL)
  }

  test("c4: line filters — terminal punctuation, 5 words, javascript") {
    val page = Seq(
      "one two three four five.",        // kept
      "short line here.",                // < 5 words: dropped
      "no terminal punctuation on this", // dropped
      "uses JavaScript alert popup code.", // mentions javascript: dropped
      "does it end with a question?",    // kept (terminal ?)
      "he said \"quote five words here\"" // kept (terminal ")
    ).mkString("\n")
    val s = TextStats.c4(page)
    assert(s.nLines == 6 && s.nKept == 3)
    assert(s.pageKept) // 3 kept lines, no poisons
  }

  test("c4: page poisons — lorem ipsum, curly brace, <3 sentences") {
    val good = "a b c d e.\nf g h i j.\nk l m n o."
    assert(TextStats.c4(good).pageKept)
    assert(!TextStats.c4(good + "\nsome Lorem Ipsum filler").pageKept)
    assert(TextStats.c4(good + "\nsome Lorem Ipsum filler").hasLorem)
    assert(!TextStats.c4(good + "\nif (x) { y }").pageKept)
    assert(!TextStats.c4("a b c d e.\nf g h i j.").pageKept) // only 2 sentences
    val empty = TextStats.c4("")
    assert(empty.nKept == 0 && !empty.pageKept)
  }
}
