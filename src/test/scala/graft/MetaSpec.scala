package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.meta.Meta

class MetaSpec extends AnyFunSuite {

  test("key normalization: lowercase, non-alnum to underscore, prefixed") {
    assert(Meta.normalizeKey("Content-Type") == "tika_metadata_content_type")
    assert(Meta.normalizeKey("dcterms:created") == "tika_metadata_dcterms_created")
    assert(Meta.normalizeKey("Page Count!") == "tika_metadata_page_count_")
    assert(Meta.normalizeKey("already_ok_9") == "tika_metadata_already_ok_9")
  }

  test("10-digit epoch seconds") {
    assert(Meta.parseToIso("1500000000").contains("2017-07-14T02:40:00Z"))
  }

  test("13-digit epoch millis truncates to seconds") {
    assert(Meta.parseToIso("1500000000123").contains("2017-07-14T02:40:00Z"))
  }

  test("compact yyyyMMddHHmmss and yyyyMMdd") {
    assert(Meta.parseToIso("20170714024000").contains("2017-07-14T02:40:00Z"))
    assert(Meta.parseToIso("20170714").contains("2017-07-14T00:00:00Z"))
  }

  test("RFC-1123 with collapsed asctime-style whitespace") {
    assert(Meta.parseToIso("Fri, 14 Jul 2017 02:40:00 GMT").contains("2017-07-14T02:40:00Z"))
    assert(Meta.parseToIso("Fri,  14  Jul 2017 02:40:00  GMT").contains("2017-07-14T02:40:00Z"))
  }

  test("ISO instant and local datetime") {
    assert(Meta.parseToIso("2017-07-14T02:40:00Z").contains("2017-07-14T02:40:00Z"))
    assert(Meta.parseToIso("2017-07-14T02:40:00").contains("2017-07-14T02:40:00Z"))
  }

  test("implausible epoch (year > 2100) rejected; garbage degrades to None") {
    assert(Meta.parseDate("9999999999").isEmpty)
    assert(Meta.parseDate("4999999999999").isEmpty)
    assert(Meta.parseDate("not a date").isEmpty)
    assert(Meta.parseDate("12345").isEmpty) // wrong digit count
    assert(Meta.parseDate("").isEmpty)
    assert(Meta.parseDate(null).isEmpty)
  }

  test("14 digits is compact, never epoch (the disambiguation trap)") {
    // 20170714024000 as an epoch would be year ~600k; must parse as compact
    assert(Meta.parseToIso("20170714024000").contains("2017-07-14T02:40:00Z"))
  }

  test("normalizeMap: collisions concat, noisy fields dedupe, blocklist drops") {
    val out = Meta.normalizeMap(Seq(
      "Content-Type" -> Seq("text/plain"),
      "Content~Type" -> Seq("text/plain"),
      "Author" -> Seq("a", "b", "a"),
      "X-TIKA:parse_time_millis" -> Seq("123"),
      "Keep Me" -> Seq("v1", "v1")))
    assert(out == Seq(
      "tika_metadata_author" -> Seq("a", "b"), // deduped (noisy field)
      "tika_metadata_content_type" -> Seq("text/plain"), // collision + dedupe
      "tika_metadata_keep_me" -> Seq("v1", "v1"))) // NOT a noisy field: kept as-is
    assert(Meta.isBlocked("tika_metadata_x_tika_parse_time_millis"))
    assert(!Meta.isBlocked("tika_metadata_author"))
  }

  test("iso array all-or-nothing") {
    assert(Meta.toIsoArray(Seq("1500000000", "20170714"))
      .contains(Seq("2017-07-14T02:40:00Z", "2017-07-14T00:00:00Z")))
    assert(Meta.toIsoArray(Seq("1500000000", "garbage")).isEmpty)
    assert(Meta.toIsoArray(Seq.empty).contains(Seq.empty))
  }
}
