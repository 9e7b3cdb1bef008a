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
  * `events.parquet` stores TIMESTAMP(NANOS) which Spark's parquet reader
  * rejects outright (PARQUET_TYPE_ILLEGAL) while DuckDB reads it as
  * TIMESTAMP_NS. We opt into the legacy nanos-as-long read and rebuild a
  * micros TimestampType column with integer arithmetic (ns DIV 1000 —
  * never a double divide: epoch-nanos ≈ 1.7e18 exceeds double's 2^53
  * integer range). Micros truncation agrees with DuckDB on every
  * second/hour-level comparison the queries make.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
