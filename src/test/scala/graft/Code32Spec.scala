package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.Ids
import graft.functions.{Code32, Code32Impl, GraftFunctions}

class Code32Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("static impl equals Ids.code32 on ascii and non-ascii") {
    for (s <- Seq("hello", "", "café 中文 😀", "the quick brown fox")) {
      assert(Code32Impl.compute(UTF8String.fromString(s)) == Ids.code32(s))
    }
  }

  test("interpreted eval path equals Ids.code32") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = Code32(Literal(UTF8String.fromString("hello"),
      org.apache.spark.sql.types.StringType))
    assert(e.eval(null) == Ids.code32("hello"))
  }

  test("codegen path through a DataFrame equals Ids.code32 row by row") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val data = Seq((1L, "alpha"), (2L, "beta gamma"), (3L, "中文"))
    val got = data.toDF("id", "t")
      .select($"id", call_function("graft_code32", $"t").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    data.foreach { case (id, t) => assert(got(id) == Ids.code32(t)) }
  }

  test("simhash/fingerprint expressions equal their TextStats twins") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val texts = Seq("the quick brown fox", "a", "", "中文 test words here")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id",
        call_function("graft_simhash32", $"t").as("s"),
        call_function("graft_fingerprint", $"t").as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (i, s, f) =>
      val t = texts(i.toInt)
      assert(s == graft.core.text.TextStats.simhash32(t))
      assert(f == graft.core.text.TextStats.fingerprint(t))
    }
  }

  test("graft_nfc equals java.text.Normalizer; idempotent; ASCII is identity") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val texts = Seq(
      "plain ascii stays",
      "",
      "cafe\u0301 vin\u0303a",   // decomposed -> composes
      "caf\u00e9 vi\u00f1a",     // already NFC
      "A\u030aB\u0301 mixed \u212b", // ring/acute + ANGSTROM SIGN (composes)
      "\ud83d\ude00 non-BMP \ud835\udc9c e\u0301") // surrogates + combining
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select($"id", call_function("graft_nfc", $"t").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val expect = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      assert(got(i.toLong) == expect, s"case $i")
      // idempotence: NFC(NFC(x)) == NFC(x)
      assert(graft.functions.TextExprImpl.nfc(
        org.apache.spark.unsafe.types.UTF8String.fromString(expect)).toString == expect)
    }
    // the ASCII fast path returns the SAME buffer (no reallocation)
    val ascii = org.apache.spark.unsafe.types.UTF8String.fromString("abc 123")
    assert(graft.functions.TextExprImpl.nfc(ascii) eq ascii)
  }

  test("null input yields null (UnaryExpression null handling)") {
    GraftFunctions.ensureRegistered(spark)
    val row = spark.sql("SELECT graft_code32(CAST(NULL AS STRING)) AS c").collect()(0)
    assert(row.isNullAt(0))
  }
}
