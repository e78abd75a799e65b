package graft.functions

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for the bounded-heap top-k aggregate: the result must
  * be a pure function of the input SET (any partitioning, any order) and
  * must equal the window formulation it replaces. */
class TopKSpec extends SparkSpec {

  import spark.implicits._

  private def topk(rows: Seq[(Long, Double, Long)], k: Int, parts: Int = 5) =
    rows.toDF("g", "score", "id")
      .repartition(parts)
      .groupBy($"g")
      .agg(TopKFunctions.topkByScore($"score", $"id", k).as("nbrs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("ranks by score desc with id tie-break, bounded at k") {
    val rows = Seq((1L, 9.0, 10L), (1L, 7.0, 30L), (1L, 7.0, 20L),
      (1L, 5.0, 40L), (1L, 3.0, 50L))
    assert(topk(rows, 3) === Map(1L -> Seq(10L, 20L, 30L)))
    assert(topk(rows, 10) === Map(1L -> Seq(10L, 20L, 30L, 40L, 50L)))
  }

  test("result is invariant to input order and partitioning (mergeable)") {
    val rnd = new Random(7)
    val rows = (1L to 500L).map(i => (i % 3, rnd.nextDouble(), i))
    val expected = topk(rows, 4, parts = 1)
    assert(topk(rnd.shuffle(rows), 4, parts = 13) === expected)
    assert(topk(rows.reverse, 4, parts = 2) === expected)
  }

  test("NaN scores are skipped, never admitted while the buffer is short") {
    val rows = Seq((1L, Double.NaN, 1L), (1L, 0.5, 2L), (1L, Double.NaN, 3L))
    assert(topk(rows, 3) === Map(1L -> Seq(2L)))
  }

  test("equals the row_number window formulation on random data") {
    val rnd = new Random(42)
    val rows = (1L to 2000L).map(i => (i % 17, rnd.nextInt(50).toDouble, i))
    val viaAgg = rows.toDF("g", "score", "id")
      .groupBy($"g")
      .agg(TopKFunctions.topkByScore($"score", $"id", 5).as("nbrs"))
      .select($"g", posexplode($"nbrs").as(Seq("pos", "id")))
      .select($"g", ($"pos" + 1).cast("long").as("rank"), $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = rows.toDF("g", "score", "id")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"g", $"rank", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg === viaWindow)
  }
}
