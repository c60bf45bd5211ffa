package graft.metrics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TopK

/** The bounded-heap top-k aggregate: window-equality, partial (map-side)
  * aggregation in the physical plan, and partitioning invariance (the
  * merge path really runs and really commutes). */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("o_custkey"), r.getAs[Int]("rank"),
      r.getAs[Long]("o_orderkey"), r.getAs[Double]("o_totalprice"))).toSet

  test("heap top-k equals the row_number window on the real orders table") {
    val heap = asTuples(Dashboard.topOrdersHeap(spark, sf))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = asTuples(graft.Tables.orders(spark, sf)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .select("o_custkey", "rank", "o_orderkey", "o_totalprice"))
    assert(heap == windowed)
    assert(heap.nonEmpty)
  }

  test("plan is ObjectHashAggregate with a partial stage, not a sort+window") {
    val df = Dashboard.topOrdersHeap(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.contains("partial_top_k_structs"), plan.take(2000))
    assert(!plan.contains("Window"), "must not fall back to a window")
  }

  test("result is invariant under physical partitioning (merge commutes)") {
    val base = Seq((1L, 10.0, 100L), (1L, 30.0, 101L), (1L, 20.0, 102L),
      (1L, 30.0, 99L), (2L, 5.0, 200L))
      .toDF("g", "v", "id")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("g")
      .agg(TopK.top_k(struct(col("v"), (-col("id")).as("nk")), 2).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("pos"), (-col("t.nk")).as("id"), col("t.v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = Set((1L, 0, 99L, 30.0), (1L, 1, 101L, 30.0), (2L, 0, 200L, 5.0))
    assert(run(base.repartition(1)) == expected)
    assert(run(base.repartition(7, col("id"))) == expected)
    // ties on the full struct are impossible here (ids unique); the
    // 30.0 pair ranks 99 before 101 via the −id tie-break
  }
}
