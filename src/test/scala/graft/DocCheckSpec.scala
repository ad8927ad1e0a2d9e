package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the README's operator count honest: the literal in the prose
  * must equal `SparkEntry.queries.size` (which the Oracle map mirrors) —
  * a stale count is a silent doc lie the moment a query lands.
  */
class DocCheckSpec extends AnyFunSuite {
  test("README operator count matches SparkEntry.queries") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    val m = "(\\d+) operators/queries in `graft.SparkEntry.queries`".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README no longer declares the operator count"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.group(1)} but SparkEntry.queries has ${SparkEntry.queries.size}")
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      "queries and oracle maps must cover the same keys")
  }
}
