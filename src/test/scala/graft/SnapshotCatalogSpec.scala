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
