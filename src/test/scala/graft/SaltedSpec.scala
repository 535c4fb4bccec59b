package graft

import org.apache.spark.sql.functions._

import graft.operators.Salted

/** Salting must be a pure performance transform: identical results to
  * the unsalted formulation, deterministic across partitionings.
  */
class SaltedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = (1 to 2000).map(i =>
    (if (i % 10 == 0) "cold" + i else "HOT", i.toLong, i % 7))
    .toDF("k", "v", "w")

  test("salted aggregation equals plain groupBy (sum + count + max)") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("v"), max("w").as("w"))
      .orderBy("k").collect().toSeq
    val salted = Salted.aggregate(skewed, Seq("k"),
        Salted.saltOf(8, col("v")), 8,
        Map("v" -> "sum", "w" -> "max"))
      .orderBy("k").collect().toSeq
    assert(salted === plain)
  }

  test("salted join equals plain join, including hot keys") {
    val dim = Seq(("HOT", "hot-dim"), ("cold10", "c10"), ("cold20", "c20"))
      .toDF("k", "payload")
    val plain = skewed.join(dim, Seq("k"))
      .orderBy("k", "v").collect().toSeq
    val salted = Salted.join(skewed, dim, Seq("k"), buckets = 8)
      .select(skewed.columns.map(col) :+ col("payload"): _*)
      .orderBy("k", "v").collect().toSeq
    assert(salted === plain)
  }

  test("salts are content-derived: stable under repartition") {
    val a = skewed.select(Salted.saltOf(8, col("v")).as("s"), col("v"))
      .orderBy("v").collect().toSeq
    val b = skewed.repartition(7)
      .select(Salted.saltOf(8, col("v")).as("s"), col("v"))
      .orderBy("v").collect().toSeq
    assert(a === b)
  }
}
