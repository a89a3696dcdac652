package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over a testdata scale-factor directory.
  *
  * Replaces the reference's Hive-metastore + `MSCK REPAIR` catalog
  * (ASVSP `load_hourly.py:87-105`) with a catalog-free registry: each
  * parquet file becomes a DataFrame and (on demand) a temp view. At
  * cluster scale the same API would point at partitioned parquet roots;
  * partition pruning and predicate pushdown work identically because
  * the scan is declared, not materialized.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The events table's `ts` arrives in generator-dependent physical
    // forms; normalize every one to a session-TZ TIMESTAMP so downstream
    // `unix_micros`/watermarks see one type:
    //  - TIMESTAMP(NANOS): Spark's parquet reader only admits it as a
    //    raw long (SPARK-40819) — read that way, rebuild with integer
    //    division (`DIV`, not `/` — double division would lose precision
    //    on ~1.7e18 nanosecond values);
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ: cast
    //    to TIMESTAMP. The session TZ is pinned UTC (GraftSession), so
    //    the cast is the exact identity on epoch micros — the same
    //    interpretation DuckDB applies to a naive parquet timestamp.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(dir, name))
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions
            .timestamp_micros(org.apache.spark.sql.functions.expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(path(dir, name))
  }

  /** Register every table as a temp view named after the file. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      load(spark, dir, n).createOrReplaceTempView(n)
    }
}
