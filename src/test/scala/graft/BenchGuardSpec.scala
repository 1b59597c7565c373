package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-baseline overwrite guard (verdict r12 №1): the exact
  * footgun — a `SPARK_GRAFT_BENCH_ONLY` subset run silently replacing
  * the committed full-registry `bench_queries.json` — shipped a broken
  * baseline in BOTH round 11 and round 12. Discipline notes failed
  * twice; this spec makes the guard a code invariant.
  */
class BenchGuardSpec extends AnyFunSuite {

  private val committed = Bench.committedBenchPath

  test("subset run without explicit OUT is diverted to /tmp, loudly") {
    val (path, warn) = Bench.resolveBenchOut(requested = None,
      onlySet = true, force = false, newCount = 3, existingCount = 343)
    assert(path.startsWith("/tmp/"), s"subset run landed on $path")
    assert(warn.exists(_.contains("never writes")), s"no warning: $warn")
  }

  test("subset run with explicit OUT honors the explicit path") {
    val (path, warn) = Bench.resolveBenchOut(
      requested = Some("/tmp/my_iteration.json"),
      onlySet = true, force = false, newCount = 3, existingCount = 343)
    assert(path == "/tmp/my_iteration.json")
    assert(warn.isEmpty)
  }

  test("shrinking overwrite of the committed map is refused sans FORCE") {
    val (path, warn) = Bench.resolveBenchOut(requested = None,
      onlySet = false, force = false, newCount = 100,
      existingCount = 343)
    assert(path == "/tmp/bench_queries_refused.json")
    assert(warn.exists(_.contains("REFUSING")), s"no refusal: $warn")
  }

  test("explicit OUT pointed AT the committed map still can't shrink it") {
    val (path, warn) = Bench.resolveBenchOut(requested = Some(committed),
      onlySet = false, force = false, newCount = 1, existingCount = 343)
    assert(path == "/tmp/bench_queries_refused.json")
    assert(warn.nonEmpty)
  }

  test("FORCE permits a deliberate shrink of the committed map") {
    val (path, warn) = Bench.resolveBenchOut(requested = None,
      onlySet = false, force = true, newCount = 100, existingCount = 343)
    assert(path == committed)
    assert(warn.isEmpty)
  }

  test("full run, equal-or-larger map, lands on the committed path") {
    val (grow, w1) = Bench.resolveBenchOut(requested = None,
      onlySet = false, force = false, newCount = 350, existingCount = 343)
    val (same, w2) = Bench.resolveBenchOut(requested = None,
      onlySet = false, force = false, newCount = 343, existingCount = 343)
    assert(grow == committed && same == committed)
    assert(w1.isEmpty && w2.isEmpty)
  }

  test("benchMapSize parses the map this main writes; 0 on absent") {
    val tmp = java.nio.file.Files.createTempFile("graft-bench", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"metric":"total","value":1.0,"queries":{"q_a":0.123,"q_b":1.500,"q_c":0.001},"reps":2}""")
    assert(Bench.benchMapSize(tmp.toString) == 3)
    java.nio.file.Files.writeString(tmp, """{"queries":{}}""")
    assert(Bench.benchMapSize(tmp.toString) == 0)
    assert(Bench.benchMapSize("/nonexistent/nowhere.json") == 0)
    java.nio.file.Files.delete(tmp)
  }

  test("the committed baseline at HEAD is the full registry, not a subset") {
    // The r11/r12 incidents are detectable from the artifact alone: a
    // committed map smaller than the registry means a subset run
    // leaked through. Guard the repo state itself, not just the code.
    // Lower bound = the round-13 full-registry count: the registry only
    // grows, so any committed map below it means a subset run leaked
    // through (mid-round the map may lag new registrations until the
    // round-close full run, hence >= not ==).
    val onDisk = Bench.benchMapSize(committed)
    assert(onDisk >= 361 && onDisk <= SparkEntry.queries.size,
      s"committed bench_queries.json has $onDisk entries (registry: " +
        s"${SparkEntry.queries.size}) — a subset run overwrote the " +
        "baseline")
  }
}
