package graft

/** Driver-contract smoke tests: the flagship `entry` must return rows at sf0.001,
  * and every declared query must have either an oracle or a documented rows-only
  * rationale (w13/clim1 — see SURVEY §2 oracle-coverage note). */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows at sf0.001 (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has an oracle except the two documented rows-only kernels") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("w13_gauss_gap", "clim1_outlier_chain"), s"got $noOracle")
    // no orphan oracles either (an oracle without a query never gets checked)
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"orphan oracles: $orphan")
  }
}
