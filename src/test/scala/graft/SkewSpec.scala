package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals plain groupBy on skewed data") {
    // one hot key with 10k rows, many cold keys
    val skewed = spark.range(10000).select(lit("hot").as("k"), lit(1.0).as("v"))
      .union(spark.range(500).select(concat(lit("cold"), $"id").as("k"),
        lit(2.0).as("v")))
    val salted = Skew.saltedSumCount(skewed, Seq("k"), col("v"))
      .orderBy("k").collect()
    val plain = skewed.groupBy("k")
      .agg(sum($"v").as("sum_value"), count(lit(1)).as("cnt"))
      .orderBy("k").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-9)
      assert(a.getLong(2) == b.getLong(2))
    }
  }

  test("saltedJoin equals plain join on skewed fact") {
    val fact = spark.range(5000).select(lit(7L).as("fk"), $"id".as("payload"))
      .union(spark.range(100).select(($"id" % 20).as("fk"), $"id".as("payload")))
    val dim = spark.range(25).select($"id".as("fk"),
      concat(lit("dim"), $"id").as("name"))
    val salted = Skew.saltedJoin(fact, dim, "fk")
    val plain = fact.join(dim, "fk")
    assert(salted.count() == plain.count())
    val sAgg = salted.groupBy("fk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pAgg = plain.groupBy("fk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sAgg == pAgg)
  }
}
