package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan probe (r19, now a standing audit): does Catalyst's
  * RemoveRedundantAggregates eliminate the r18 pre-aggregation
  * `.distinct()` in the HLL sketch build? max() is duplicate-agnostic,
  * so the inner distinct Aggregate is removable — if it IS removed,
  * the r18 plan never actually paid the corpus-keyed exchange and the
  * source-level fix is hygiene plus an explicit plan pin rather than a
  * runtime win. PlanAuditSpec re-runs [[audit]] under `sbt test` so
  * the recorded history note can never go stale silently. */
object ExplainHllDistinct {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    audit(spark, dir, verbose = true)
    spark.stop()
  }

  def audit(spark: SparkSession, dir: String, verbose: Boolean = false): Unit = {
    val e = Tables.load(spark, dir, "events")
    val (reg, rho) = queries.CurationOps.hllRegRho(col("user_id"))
    val withDistinct = e.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .select(col("day"), reg.as("register_id"), rho.as("rho"))
      .groupBy(col("day"), col("register_id"))
      .agg(max(col("rho")).as("max_rho"))
    val plan = withDistinct.queryExecution.executedPlan.toString
    if (verbose) {
      println("=== executed plan of the r18 (distinct) build ===")
      println(plan)
    }
    val present = plan.contains("hashpartitioning(user_id")
    println(s"HLLDISTINCT user_id-keyed exchange present: $present")
    require(!present,
      "RemoveRedundantAggregates no longer elides the distinct — the " +
        "probe's conclusion (and the r18 history note) would be stale")
  }
}
