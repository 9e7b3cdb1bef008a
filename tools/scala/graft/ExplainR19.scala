package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 plan audits — the round's three structural claims, read
  * off the executed plans and asserted (the spec-level pins live in
  * HllSpec / EpochSpec; PlanAuditSpec runs [[audit]] under `sbt test`
  * at sf0.01 so a plan regression fails the build, and this main
  * records the same audits at sf0.1 alongside the round's other
  * evidence).
  *
  * 1. THE SKETCH SIDE'S SCAN IS COLUMN-PRUNED: q146's nightly sketch
  *    update deliberately re-scans events instead of consuming the
  *    epoch's wide cached batch, and the claim that makes that the
  *    cheaper I/O shape is that the scan reads ONLY (ts, user_id) —
  *    asserted from the FileScan's ReadSchema.
  *
  * 2. THE COMPACTED REGISTER FRONT-END IS A BROADCAST WITH THE GUARD
  *    IN-PLAN: q145's day-2 front-end must show (a) a broadcast join
  *    against the register (the standing side never exchanges the
  *    batch), and (b) the raise_error in-order guard surviving
  *    optimization (a guard the optimizer could elide would be no
  *    guard at all).
  *
  * 3. THE SKETCH BUILD HAS NO CORPUS-KEYED EXCHANGE at sf0.1 (the
  *    HllSpec pin re-read at the bench scale, plus q151's fold).
  *
  * Usage: sbt "Test/runMain graft.ExplainR19 [sfDir]"
  */
object ExplainR19 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    audit(spark, dir)
    spark.stop()
  }

  def audit(spark: SparkSession, dir: String): Unit = {
    import queries.{CurationOps, EpochOps}

    // ---- 1. sketch-side scan pruning.
    val sk = CurationOps.nightlySketchStore(spark, dir)
    val skPlan = sk.queryExecution.executedPlan.toString
    val scans = skPlan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    val eventsScans = scans.filter(_.contains("events"))
    require(eventsScans.nonEmpty, "no events scan in the sketch-side plan")
    eventsScans.foreach { l =>
      require(l.contains("ReadSchema: struct<ts:timestamp,user_id:bigint>"),
        s"sketch-side events scan is not pruned to (ts, user_id):\n$l")
    }
    println(s"R19AUDIT1 sketch-side events scan ReadSchema pruned to " +
      s"(ts, user_id) across ${eventsScans.size} scan(s)")

    // ---- 2. register front-end: broadcast + in-plan guard.
    val e = Tables.load(spark, dir, "events")
    val reg = EpochOps.compactRegister(
      EpochOps.requestStore(spark, dir).where(EpochOps.epoch1Req),
      EpochOps.cut2Us)
    val fe = EpochOps.registerFrontEnd(
      e.where(col("ts") >= lit(EpochOps.Cut2).cast("timestamp")),
      reg, EpochOps.cut2Us)
    val fePlan = fe.queryExecution.executedPlan.toString
    require(fePlan.contains("BroadcastHashJoin") || fePlan.contains("BroadcastExchange"),
      s"register front-end is not a broadcast join:\n$fePlan")
    require(fePlan.contains("raise_error"),
      "the in-order guard was optimized out of the front-end plan")
    println("R19AUDIT2 register front-end: broadcast join against the " +
      "compacted register, raise_error guard present in the executed plan")

    // ---- 3. no corpus-keyed exchange in the sketch builds.
    for ((name, df) <- Seq(
        ("daySketch", CurationOps.daySketch(e)),
        ("nightlySketchStore", sk))) {
      val p = df.queryExecution.executedPlan.toString
      require(!p.contains("hashpartitioning(user_id"),
        s"$name shuffles the corpus on user_id:\n$p")
    }
    println("R19AUDIT3 no user_id-keyed exchange in daySketch / " +
      "nightlySketchStore at " + dir)
  }
}
