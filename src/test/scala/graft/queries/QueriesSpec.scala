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

  test("dq checks fire on planted violations with exact counts") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = tmpDir("dq")
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // rows: (orderkey, qty, price, discount, returnflag, shipdate)
    Seq(
      (1L, 1.0, 10.0, 0.1, "A", ts),                  // clean
      (2L, 0.0, 10.0, 0.1, "N", ts),                  // qty <= 0
      (3L, -2.0, -5.0, 0.1, "R", ts),                 // qty AND price bad
      (4L, 1.0, 10.0, 1.5, "A", ts),                  // discount > 1
      (5L, 1.0, 10.0, 0.1, "X", ts),                  // flag out of domain
      (6L, 1.0, 10.0, 0.1, "A", null.asInstanceOf[Timestamp]), // null date
      (99L, 1.0, 10.0, 0.1, "A", ts))                 // orphan orderkey
      .toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
        "l_returnflag", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "F"), (2L, "F"), (3L, "F"), (4L, "F"), (5L, "F"), (6L, "F"))
      .toDF("o_orderkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = CoreQueries.dqChecks(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "quantity_positive" -> 2L, "price_non_negative" -> 1L,
      "discount_in_unit_range" -> 1L, "returnflag_in_domain" -> 1L,
      "shipdate_not_null" -> 1L, "orderkey_references_order" -> 1L))
  }
}
