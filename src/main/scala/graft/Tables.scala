package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All engine queries take `(spark, sfDir)` and read parquet from
  * `sfDir` — predicate pushdown / column pruning happen at this scan,
  * so queries must `select`/`filter` declaratively (never `.collect`).
  *
  * `events.parquet` timestamp encoding has varied across driver data
  * generations, so the loader normalizes both shapes to a micros
  * TimestampType `ts`:
  *   - TIMESTAMP(NANOS): Spark's parquet reader rejects it outright
  *     (PARQUET_TYPE_ILLEGAL) while DuckDB reads it as TIMESTAMP_NS. We
  *     opt into the legacy nanos-as-long read and rebuild micros with
  *     integer arithmetic (ns DIV 1000 — never a double divide:
  *     epoch-nanos ≈ 1.7e18 exceeds double's 2^53 integer range).
  *   - tz-naive TIMESTAMP(MICROS) (no isAdjustedToUTC): Spark 4 infers
  *     TIMESTAMP_NTZ by default, which breaks `window()`/`unix_micros`
  *     time queries; DuckDB reads plain TIMESTAMP. We disable NTZ
  *     inference so it reads as session-TZ TimestampType — the session
  *     runs UTC, so wall-clock values agree with DuckDB exactly.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
