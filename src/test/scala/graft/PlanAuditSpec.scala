package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The standing structural plan audits, folded into the regular gate
  * (r19 VERDICT task 4 + ADVICE: the Explain* tools carried real
  * `require`-asserted claims — store pruning soundness, the
  * raise_error guard surviving optimization, the sketch build's
  * zero-corpus-exchange — but only ran by hand, so an optimizer or
  * refactor regression would have surfaced next time someone
  * remembered to run them, not at `sbt test`). Each case delegates to
  * the corresponding tool's `audit(spark, dir)` — the SAME assertions
  * the by-hand sf0.1 runs record — at sf0.01, the driver's
  * correctness scale. The tools remain runnable standalone
  * (`Test/runMain graft.ExplainR16 [sfDir]`) for the per-round sf0.1
  * evidence capture. */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("r16 audit: q124 store pruning sound + partition-subset reads; operator exchange census") {
    ExplainR16.audit(spark, dir)
    graft.Scratch.releaseAll()
  }

  test("r18 audit: q140 request feed saves the events pass; q145 recurring run reads the published stores") {
    ExplainR18.audit(spark, dir)
    graft.Scratch.releaseAll()
  }

  test("r19 audit: sketch scan pruned to (ts,user_id); register front-end broadcast with raise_error in-plan; no corpus-keyed sketch exchange") {
    ExplainR19.audit(spark, dir)
    graft.Scratch.releaseAll()
  }

  test("hll distinct-elision probe: RemoveRedundantAggregates still elides an inner distinct under max") {
    ExplainHllDistinct.audit(spark, dir)
    graft.Scratch.releaseAll()
  }
}
