package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.SnapshotTable

/** Iceberg-semantics stand-in: snapshot isolation, time travel, optimistic
  * concurrency, copy-on-write delete.
  */
class SnapshotTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-snap").resolve("t").toString

  test("append/overwrite produce numbered snapshots; reads resolve latest") {
    import spark.implicits._
    val t = tmp()
    val v1 = SnapshotTable.append(spark, t, Seq(1, 2, 3).toDF("x"))
    val v2 = SnapshotTable.append(spark, t, Seq(4, 5).toDF("x"))
    assert((v1, v2) == (1L, 2L))
    assert(SnapshotTable.read(spark, t).count() == 5)
    val v3 = SnapshotTable.overwrite(spark, t, Seq(9).toDF("x"))
    assert(v3 == 3L)
    assert(SnapshotTable.read(spark, t).collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("time travel: every historical snapshot stays readable, bit-stable") {
    import spark.implicits._
    val t = tmp()
    SnapshotTable.append(spark, t, Seq(1, 2).toDF("x"))
    SnapshotTable.append(spark, t, Seq(3).toDF("x"))
    SnapshotTable.deleteWhere(spark, t, col("x") === 1)
    assert(SnapshotTable.snapshots(t) == Seq(1L, 2L, 3L))
    assert(SnapshotTable.read(spark, t, Some(1)).count() == 2)
    assert(SnapshotTable.read(spark, t, Some(2)).count() == 3)
    assert(SnapshotTable.read(spark, t, Some(3)).collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
  }

  test("snapshot isolation: a resolved reader is immune to later commits") {
    import spark.implicits._
    val t = tmp()
    SnapshotTable.append(spark, t, Seq(1, 2, 3).toDF("x"))
    val pinned = SnapshotTable.read(spark, t, Some(1)) // resolve dirs NOW
    SnapshotTable.deleteWhere(spark, t, col("x") > 0)  // wipe everything after
    assert(pinned.count() == 3)                        // pinned view unaffected
    assert(SnapshotTable.read(spark, t).count() == 0)
  }

  test("optimistic concurrency: a lost race retries onto the new snapshot") {
    import spark.implicits._
    val t = tmp()
    SnapshotTable.append(spark, t, Seq(1).toDF("x"))
    // simulate a racing writer that grabs v2 first
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(t, "snapshots", "v2"),
      java.nio.file.Files.readString(java.nio.file.Paths.get(t, "snapshots", "v1")))
    // our commit must lose v2, re-read, and land on v3 ON TOP of v2's state
    val v = SnapshotTable.append(spark, t, Seq(7).toDF("x"))
    assert(v == 3L)
    assert(SnapshotTable.read(spark, t).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 7))
  }
}
