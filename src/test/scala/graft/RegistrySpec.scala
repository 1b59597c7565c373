package graft

import org.scalatest.funsuite.AnyFunSuite

/** Consistency guards over the driver contract itself: every oracle
  * must belong to a registered query, and the rows-only set must be
  * EXACTLY the documented one (`q_ann_lsh`, recall-bounded by spec —
  * SURVEY §2.3 row 37). An oracle key typo would otherwise silently
  * downgrade a query from hash-checked to rows-only, and a query
  * registered without an oracle would ship with the weaker check
  * unannounced.
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key is a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracles without a matching query (key typo?): $orphans")
  }

  test("rows-only set is exactly the documented one") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q_ann_lsh"),
      s"undocumented rows-only queries: ${rowsOnly - "q_ann_lsh"}")
  }

  /** SURVEY §13/§14 quotes this exact number; round 10 shipped a
    * 262-vs-263 drift because nothing tied the prose tally to the
    * registry. Any query add/remove must update BOTH this constant and
    * the SURVEY ledger in the same commit, or this test goes red.
    */
  val SurveyLedgerCount = 343

  test("registry count matches the SURVEY §13 ledger") {
    assert(SparkEntry.queries.size == SurveyLedgerCount,
      s"registry has ${SparkEntry.queries.size} queries but SURVEY §13 " +
        s"says $SurveyLedgerCount — update both together")
  }

  /** Round-11 drift: `q_silhouette` was registered and hash-green but
    * absent from SURVEY §2, and §14's prose tally still said 298 while
    * this spec pinned 299 — the count check alone cannot catch a query
    * that is counted but never ledgered. So the PROSE side of the
    * contract is mechanical too: every registered query name must
    * appear somewhere in SURVEY.md, and §14 must quote this spec's
    * `SurveyLedgerCount` literal verbatim.
    */
  test("every registered query is ledgered in SURVEY.md") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val unledgered = SparkEntry.queries.keySet.filterNot(survey.contains)
    assert(unledgered.isEmpty,
      s"queries registered but absent from SURVEY.md: $unledgered — " +
        "add a §2 row (and oracle note) in the same commit")
    assert(survey.contains(s"SurveyLedgerCount = $SurveyLedgerCount"),
      s"SURVEY.md must quote `SurveyLedgerCount = $SurveyLedgerCount` " +
        "verbatim in its §14 tally — update the prose with the constant")
  }

  test("no duplicate query names across operator modules") {
    // Map ++ silently keeps the last binding; a name collision between
    // modules would shadow an operator and its oracle without any
    // compile-time signal. Count registrations by re-walking the
    // modules through reflection-free re-concatenation.
    val perModule = Seq(
      operators.OrderAnalytics.queries, operators.Reliability.queries,
      operators.OlapQueries.queries, operators.StreamQueries.queries,
      operators.TextAnalysis.queries, operators.Dedup.queries,
      operators.Similarity.queries, operators.Multimodal.queries,
      operators.Sessionize.queries, operators.AsofJoin.queries,
      operators.Sampling.queries, operators.Packing.queries,
      operators.Analytics.queries, operators.Profiling.queries,
      operators.CorpusPipeline.queries, operators.CorpusClean.queries,
      operators.ZOrder.queries, operators.Stats.queries,
      operators.Ranking.queries, operators.GraphOps.queries,
      sources.OrdersSource.queries)
    val all = perModule.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"query name registered by two modules: $dups")
    assert(all.size == SparkEntry.queries.size)
  }
}
