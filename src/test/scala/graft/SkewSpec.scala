package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Schemas
import graft.operators.{Pyramid, Skew}

class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("skew-spec")

  test("salted sum-agg equals plain groupBy sum") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedSumAgg(df, Seq(col("k")),
        Seq(col("v") -> "s", lit(1L).cast("long") -> "n"), saltBuckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join, all join rows preserved") {
    import spark.implicits._
    val big = (1 to 5000).map(i => (if (i % 3 == 0) "hot" else s"k${i % 20}", i))
      .toDF("k", "payload")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = big.join(dim, Seq("k")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, dim, Seq("k"), saltBuckets = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(salted.count(_._1 == "hot") == plain.count(_._1 == "hot"))
  }

  test("extensions: graft functions available in a fresh GraftSession without manual register") {
    val df = spark.sql(
      "SELECT graft_simhash64(array('a','b')) AS s, " +
        "graft_dot_fixed(array(2L, 3L), array(5L, 7L)) AS d, " +
        "size(graft_minhash32(array('x'))) AS m")
    val r = df.head
    assert(r.getAs[Long]("d") == 31L)
    assert(r.getAs[Int]("m") == 32)
  }

  test("typed Dataset view of the daily pyramid layer") {
    import spark.implicits._
    val raw = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-06 01:00:00"), 10.0),
      ("a", java.sql.Timestamp.valueOf("2024-01-06 02:00:00"), 20.0)
    ).toDF("e", "ts", "v")
    val ds = Pyramid.daily(raw, col("e"), col("ts"), col("v"))
      .as[Schemas.DailyMeasurement]
    val row = ds.head()
    assert(row.daily_avg == 15.0 && row.is_weekend && row.measurement_count == 2L)
  }
}
