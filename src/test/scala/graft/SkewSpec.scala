package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + a tail
  private val skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("k", "v")

  test("saltedAgg equals plain aggregation") {
    val plain = skewed.groupBy("k").agg(sum("v").as("v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(skewed.withColumnRenamed("v", "v_in")
        .select(col("k"), col("v_in").as("v"), col("v").as("n_src")),
      Seq("k"), saltBuckets = 8,
      Map("v" -> (sum(_), sum(_)),
          "n_src" -> ((c: org.apache.spark.sql.Column) => count(c),
                      (c: org.apache.spark.sql.Column) => sum(c))))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltBuckets = 8)
      .groupBy("k", "label").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin left preserves unmatched rows") {
    val dim = Seq(("hot", "H")).toDF("k", "label")
    val out = Skew.saltedJoin(skewed, dim, Seq("k"), 4, "left")
    assert(out.count() == 1000)
    assert(out.filter(col("label").isNull).count() == 100)
  }

  test("keySkewProfile surfaces the hot key first with its share") {
    val top = Skew.keySkewProfile(skewed, Seq("k"), 3).head()
    assert(top.getString(0) == "hot")
    assert(top.getLong(1) == 900L)
    assert(math.abs(top.getDouble(2) - 0.9) < 1e-6)
  }
}
