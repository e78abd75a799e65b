package graft.queries

import graft.SparkSpec

/** Contracts for queries whose outputs are not exact-oracle-checkable. */
class QueriesSpec extends SparkSpec {

  test("approx_count_distinct (HLL++) stays within its error bound of exact") {
    val rows = CoreQueries.q8ApproxDistinct(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val approx = r.getAs[Long]("approx_parts").toDouble
      // rsd is configured at 0.02; measured error on this data is 0.005.
      // The bound is the configured rsd itself — HLL++ at this
      // cardinality is comfortably inside one relative standard deviation
      assert(math.abs(approx - exact) / exact <= 0.02,
        s"approx=$approx exact=$exact for ${r.getAs[String]("l_returnflag")}")
    }
  }
}
