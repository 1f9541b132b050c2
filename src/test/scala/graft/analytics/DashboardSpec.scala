package graft.analytics

import graft.SparkSpec

/** E2: one cached scan feeds all four dashboard artifacts (vs the
  * reference's four full scans per page view). */
class DashboardSpec extends SparkSpec {

  test("artifacts agree with the standalone queries; scan is cached") {
    val dir = "/root/testdata/sf0.001"
    val arts = Dashboard.run(spark, dir)
    try {
      assert(arts.sharedScan.storageLevel.useMemory)
      assert(arts.total == 500)
      assert(arts.sourceDistribution.collect().toSeq ==
        SourceDistribution(graft.Tables.documents(spark, dir)).collect().toSeq)
      assert(arts.wordFrequencies.count() > 0)
      assert(arts.recent.count() == 5)
      // cached plan appears as InMemoryTableScan in the artifact plans
      assert(arts.sourceDistribution.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"))
    } finally arts.unpersist()
  }
}
