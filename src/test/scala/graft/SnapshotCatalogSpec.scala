package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotCatalog

/** The time-travel read seam (SURVEY §2 row — versioned snapshot
  * catalog): version numbers resolve to sealed, fingerprint-verified
  * parquet snapshots, and every way a resolution can go stale or wrong
  * refuses loudly instead of serving bad data — the same contract
  * IndexFreshnessSpec pins for the build-once caches.
  */
class SnapshotCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession =
    GraftSession.create("snapshot-catalog-spec", cores = "2")

  override def afterAll(): Unit = spark.stop()

  private def tmpRoot(): String = java.nio.file.Files
    .createTempDirectory("graft-snapcat").toFile.getAbsolutePath

  test("publish allocates sequential versions; readAsOf resolves each exactly") {
    import spark.implicits._
    val root = tmpRoot()
    assert(SnapshotCatalog.versions(root).isEmpty)
    assert(SnapshotCatalog.latest(root).isEmpty)
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b = Seq((1L, "a"), (3L, "c"), (4L, "d")).toDF("k", "v")
    assert(SnapshotCatalog.publish(a, root) == 1)
    assert(SnapshotCatalog.publish(b, root) == 2)
    assert(SnapshotCatalog.versions(root) == Seq(1, 2))
    assert(SnapshotCatalog.latest(root).contains(2))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(SnapshotCatalog.readAsOf(spark, root, 1)) == rows(a))
    assert(rows(SnapshotCatalog.readAsOf(spark, root, 2)) == rows(b))
    // the as-of read IS the explicit-path read, byte for byte
    assert(rows(SnapshotCatalog.readAsOf(spark, root, 1)) ==
      rows(spark.read.parquet(SnapshotCatalog.snapshotDir(root, 1))))
  }

  test("unknown version refuses loudly, listing what exists") {
    import spark.implicits._
    val root = tmpRoot()
    SnapshotCatalog.publish(Seq((1L, "a")).toDF("k", "v"), root)
    val e = intercept[IllegalArgumentException] {
      SnapshotCatalog.readAsOf(spark, root, 7)
    }
    assert(e.getMessage.contains("unknown version 7"))
    assert(e.getMessage.contains("claimed: 1"))
  }

  test("a snapshot mutated after publish refuses instead of serving") {
    import spark.implicits._
    val root = tmpRoot()
    val v = SnapshotCatalog.publish(Seq((1L, "a")).toDF("k", "v"), root)
    // corrupt the sealed snapshot: drop an extra file into its dir
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(SnapshotCatalog.snapshotDir(root, v),
        "part-99999-intruder.parquet"), "not parquet")
    val e = intercept[IllegalArgumentException] {
      SnapshotCatalog.readAsOf(spark, root, v)
    }
    assert(e.getMessage.contains("changed on disk since publish"))
  }

  test("an in-flight/aborted publish (unsealed meta) refuses") {
    import spark.implicits._
    val root = tmpRoot()
    SnapshotCatalog.publish(Seq((1L, "a")).toDF("k", "v"), root)
    // simulate a publisher that claimed id 2 and died before sealing
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(root, "_versions", "2.meta"))
    val e = intercept[IllegalArgumentException] {
      SnapshotCatalog.readAsOf(spark, root, 2)
    }
    assert(e.getMessage.contains("in-flight or aborted publish"))
    // readers never SEE the unsealed claim: versions()/latest() list
    // only sealed snapshots, so latest() cannot name a version readAsOf
    // would refuse...
    assert(SnapshotCatalog.versions(root) == Seq(1))
    assert(SnapshotCatalog.latest(root).contains(1))
    // ...the id allocator still sees it, so the next publish skips id 2
    import spark.implicits._
    assert(SnapshotCatalog.publish(Seq((9L, "z")).toDF("k", "v"), root) == 3)
    // and the sealed version still serves
    assert(SnapshotCatalog.readAsOf(spark, root, 1).count() == 1)
  }

  test("seal is CONTENT-level: in-place byte mutation preserving " +
      "size and mtime refuses; identical restore with fresh mtimes serves") {
    import spark.implicits._
    val root = tmpRoot()
    val v = SnapshotCatalog.publish(Seq((1L, "abc")).toDF("k", "v"), root)
    val dir = java.nio.file.Paths.get(SnapshotCatalog.snapshotDir(root, v))
    val part = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).next()
      finally s.close()
    }
    // (a) r14-advice failure mode 1: flip one byte IN PLACE, keep the
    // size, restore the mtime — the size/mtime seal passed this.
    val mtime = java.nio.file.Files.getLastModifiedTime(part)
    val bytes = java.nio.file.Files.readAllBytes(part)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x01).toByte
    java.nio.file.Files.write(part, bytes)
    java.nio.file.Files.setLastModifiedTime(part, mtime)
    val e = intercept[IllegalArgumentException] {
      SnapshotCatalog.readAsOf(spark, root, v)
    }
    assert(e.getMessage.contains("changed on disk since publish"))
    // (b) failure mode 2: restore the ORIGINAL bytes but with a fresh
    // mtime (a content-identical restore/copy) — the size/mtime seal
    // falsely refused this; the content seal serves it.
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x01).toByte
    java.nio.file.Files.write(part, bytes)
    java.nio.file.Files.setLastModifiedTime(part,
      java.nio.file.attribute.FileTime.fromMillis(
        mtime.toMillis + 123456L))
    assert(SnapshotCatalog.readAsOf(spark, root, v).count() == 1)
  }

  test("expire retires all but keepLast: tombstoned meta refuses with " +
      "the retained list, data dir reclaimed, id never re-minted") {
    import spark.implicits._
    val root = tmpRoot()
    (1 to 3).foreach(i =>
      SnapshotCatalog.publish(Seq((i.toLong, s"v$i")).toDF("k", "v"), root))
    assert(SnapshotCatalog.expire(root, keepLast = 2) == Seq(1))
    // retained versions still verify and serve
    assert(SnapshotCatalog.versions(root) == Seq(2, 3))
    assert(SnapshotCatalog.latest(root).contains(3))
    assert(SnapshotCatalog.readAsOf(spark, root, 2).count() == 1)
    assert(SnapshotCatalog.readAsOf(spark, root, 3).count() == 1)
    // the expired read refuses BY NAME, listing what is retained
    val e = intercept[IllegalArgumentException] {
      SnapshotCatalog.readAsOf(spark, root, 1)
    }
    assert(e.getMessage.contains("version 1"))
    assert(e.getMessage.contains("EXPIRED"))
    assert(e.getMessage.contains("retained: 2, 3"))
    // the data dir is reclaimed...
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(SnapshotCatalog.snapshotDir(root, 1))))
    // ...but the claim survives, so the allocator never re-mints id 1
    assert(SnapshotCatalog.publish(Seq((9L, "z")).toDF("k", "v"), root) == 4)
    // expiring again with the same policy retires the now-third-newest
    assert(SnapshotCatalog.expire(root, keepLast = 2) == Seq(2))
    assert(SnapshotCatalog.versions(root) == Seq(3, 4))
  }

  test("concurrent readers of a retained version never break while an " +
      "expirer retires older versions") {
    import spark.implicits._
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val root = tmpRoot()
    (1 to 5).foreach(i =>
      SnapshotCatalog.publish(Seq((i.toLong, s"v$i")).toDF("k", "v"), root))
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val readers = (1 to 2).map(_ => Future {
        // hammer the RETAINED newest version while expiry runs
        (1 to 8).map(_ =>
          SnapshotCatalog.readAsOf(spark, root, 5).count()).sum
      })
      val expirer = Future { SnapshotCatalog.expire(root, keepLast = 1) }
      val counts = Await.result(Future.sequence(readers), 120.seconds)
      assert(counts.forall(_ == 8L)) // every read of v5 served 1 row
      assert(Await.result(expirer, 120.seconds) == Seq(1, 2, 3, 4))
      assert(SnapshotCatalog.versions(root) == Seq(5))
    } finally pool.shutdown()
  }

  test("concurrent publishers claim distinct versions (atomic id loop)") {
    import spark.implicits._
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val root = tmpRoot()
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val vs =
      try Await.result(Future.sequence((1 to 4).toList.map(i => Future {
        SnapshotCatalog.publish(Seq((i.toLong, s"v$i")).toDF("k", "v"), root)
      })), 120.seconds)
      finally pool.shutdown()
    assert(vs.sorted == Seq(1, 2, 3, 4),
      s"version collision across concurrent publishers: $vs")
    // every claimed version reads back its own single row
    vs.foreach(v =>
      assert(SnapshotCatalog.readAsOf(spark, root, v).count() == 1))
  }
}
