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

  test("AQE OptimizeSkewedJoin splits the hot partition; result equals salted join") {
    import spark.implicits._
    // planted skew: one key owns ~2/3 of the fact rows, with a payload
    // wide enough that its shuffle partition crosses the (lowered)
    // skew threshold; the dim is too big to broadcast once the
    // broadcast threshold is off, so the join MUST be sort-merge — the
    // shape AQE's skew split exists for. This is stock Spark's answer
    // to the problem Skew.saltedJoin solves by hand: at 100 TB the
    // conf-driven split is the first line of defense and salting the
    // fallback for non-SMJ shapes, so both must agree row-for-row.
    val fact = spark.range(150000)
      .select(
        when($"id" % 3 =!= 0, lit("hot")).otherwise(concat(lit("k"), $"id" % 40))
          .as("k"),
        $"id".as("payload"),
        lpad($"id".cast("string"), 120, "x").as("pad"))
    val dim = spark.range(200)
      .select(concat(lit("k"), $"id" % 50).as("k"), $"id".as("dim_v"))
      .unionByName(spark.range(4).select(lit("hot").as("k"), $"id".as("dim_v")))
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB")
    val before = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val joined = fact.join(dim, Seq("k"))
      val got = joined.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      // the EXECUTED adaptive plan must carry the skew-split SMJ
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"),
        s"no skew-split sort-merge join in executed plan:\n$plan")
      val salted = Skew.saltedJoin(fact, dim, Seq("k"), saltBuckets = 8)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      assert(got == salted, "AQE skew-split join diverged from salted join")
      assert(got.count(_._1 == "hot") == 400000, // 100k hot rows × 4 dim rows
        s"hot-key row count wrong: ${got.count(_._1 == "hot")}")
    } finally before.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
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
