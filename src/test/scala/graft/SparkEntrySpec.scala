package graft

/** Driver-contract smoke tests: the flagship `entry` must return rows at sf0.001,
  * and every declared query must have either an oracle or a documented rows-only
  * rationale (w13/clim1 — see SURVEY §2 oracle-coverage note). */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows at sf0.001 (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has an oracle except the documented rows-only entries") {
    // w13/clim1: libm-exp 1-ulp parity (golden-pinned in KernelsSpec);
    // d2x: Spark-seeded xxhash64 has no cross-engine replica BY DESIGN — pair-parity
    // with the md5 path is pinned in DedupAnnSpec (the production-hash bench entry);
    // e8t: multi-round k-means training has no tractable SQL oracle — trained >=
    // untrained recall pinned in DedupAnnSpec (e8 is the oracle-checked twin).
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("w13_gauss_gap", "clim1_outlier_chain",
      "d2x_minhash_xxhash", "e8t_ivfpq_trained"), s"got $noOracle")
    // no orphan oracles either (an oracle without a query never gets checked)
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"orphan oracles: $orphan")
  }
}
