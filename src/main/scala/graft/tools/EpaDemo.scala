package graft.tools

import java.sql.Timestamp
import graft.GraftSession
import graft.operators.Pyramid
import graft.queries.EpaQueries
import org.apache.spark.sql.functions._

/** Demo main: the full reference pipeline shape — synthetic hourly
  * measurements → pyramid layers → the reference's Q01/Q10 with their
  * published output contract.
  */
object EpaDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("epa-demo")
    import spark.implicits._
    val rows = for {
      state <- Seq("Alpha", "Beta", "Gamma")
      y <- Seq(2019, 2020); m <- 1 to 6; d <- 1 to 7; h <- Seq(1, 13)
    } yield {
      val idx = (y - 2019) * 6 + (m - 1)
      val base = state match {
        case "Alpha" => 100.0 - 5.0 * idx
        case "Beta" => 20.0 + 5.0 * idx
        case _ => 50.0
      }
      (state, Timestamp.valueOf(f"$y-$m%02d-$d%02d $h%02d:00:00"), base + h * 0.1)
    }
    val daily = Pyramid.daily(rows.toDF("s", "ts", "v"), col("s"), col("ts"), col("v"))
      .withColumnRenamed("entity", "state_name")
      .withColumn("year", year(col("date_local")))
    val monthly = Pyramid.monthly(daily.withColumnRenamed("state_name", "entity"),
        Pyramid.thresholdChain(col("entity"), col("daily_avg"), Seq("Alpha" -> 60.0)))
      .withColumnRenamed("entity", "state_name")
    val annual = Pyramid.annual(monthly.withColumnRenamed("state_name", "entity"))
      .withColumnRenamed("entity", "state_name")
    println("== Q01 state ranking ==")
    EpaQueries.q01StateRankingYoy(annual).show(6, false)
    println("== Q10 consecutive improvement ==")
    EpaQueries.q10ConsecutiveImprovement(monthly).show(false)

    // SQ1 consumer over Kafka-shaped JSON (batch = trigger-once answer)
    val aqRaw = Seq(
      """{"timestamp":"2024-03-01T10:05:00Z","city":"LA","state":"CA","aqi":50,"aqi_category":"M","dominant_pollutant":"pm25","pm25":12.0,"pm10":1,"o3":1,"no2":1,"so2":1,"co":1}""",
      """{"timestamp":"2024-03-01T10:35:00Z","city":"SF","state":"CA","aqi":50,"aqi_category":"M","dominant_pollutant":"pm25","pm25":13.0,"pm10":1,"o3":1,"no2":1,"so2":1,"co":1}""")
      .toDF("value")
    val bl = Seq(("CA", 10, 3, false, 10.0))
      .toDF("state_name", "bl_hour", "bl_month", "bl_is_weekend", "baseline_avg")
    println("== SQ1 vs baseline ==")
    graft.streaming.EpaConsumers.sq1VsBaseline(
      graft.streaming.EpaConsumers.parse(aqRaw, graft.streaming.EpaConsumers.aqSchema),
      bl).show(false)
    spark.stop()
  }
}
