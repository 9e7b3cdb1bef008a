package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q87's contract is COMPOSITION: consolidate→validate→confidence→tag
  * as one lazy plan (SURVEY §3.3 — the reference chains the stage CLIs
  * through CSV files on disk; the library must not). This pins the
  * physical evidence: the composed query's executed plan contains no
  * file-sink command and scans no CSV interchange artifact — its only
  * inputs are the corpus parquet and the in-memory (checkpointed)
  * dedupe outputs. */
class Q87PlanSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("composed pipeline plan has no intermediate file sink") {
    val df = Registry.queriesMap("q87_pipeline_composed")(
      spark, "/root/testdata/sf0.001")
    val physical = df.queryExecution.executedPlan.toString
    val optimized = df.queryExecution.optimizedPlan.toString
    for (plan <- Seq(physical, optimized)) {
      assert(!plan.contains("InsertInto"), "plan writes an intermediate sink")
      assert(!plan.contains("SaveIntoDataSource"), "plan writes through a datasource")
      assert(!plan.contains("FileScan csv"), "plan reads a CSV interchange artifact")
    }
    // And the composition is live end-to-end: the lazy plan executes.
    assert(df.count() > 0)
    Scratch.releaseAll()
  }
}
