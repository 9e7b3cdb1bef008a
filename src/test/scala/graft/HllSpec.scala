package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q149/q150's deterministic HyperLogLog sketch family: mergeability
  * (disjoint and overlapping parts, any grouping → the same
  * registers), max-idempotence under re-merge, the estimate's
  * accuracy on a known cardinality (the standard-error bound the
  * register count buys), and the q150 retention-drop identity
  * (re-merging surviving day sketches == the direct sketch over the
  * surviving window). The registered oracles hash-gate the REGISTERS
  * cross-engine (the sketch is deterministic — no tolerance band);
  * these cases pin the algebra the registration relies on. */
class HllSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def regsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("register_id") -> r.getAs[Long]("max_rho"))
      .toMap

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf replay: per-day merge == direct sketch; re-merging a day is a no-op; registers non-trivial") {
      val dir = s"/root/testdata/$sf"
      val merged = Registry.queriesMap("q149_hll_distinct_sketch")(spark, dir)
      val m = regsOf(merged)
      assert(m.size == 256 && m.values.max >= 1, s"degenerate registers at $dir")
      assert(m.values.count(_ > 0) > 1, "all users fell into one register")
      // Idempotent re-merge: folding the merged registers into
      // themselves (max with itself) changes nothing — the property
      // that makes redelivered day-sketches harmless.
      val again = merged.select(col("register_id"), col("max_rho"))
        .unionByName(merged.select(col("register_id"), col("max_rho")))
        .groupBy(col("register_id")).agg(max(col("max_rho")).as("max_rho"))
      assert(regsOf(again) == m, s"re-merge must be a no-op at $dir")
      // q150 ⊆ q149 register-wise: the surviving window's maxima can
      // only be ≤ the full window's.
      val dropped = regsOf(
        Registry.queriesMap("q150_hll_retention_drop")(spark, dir))
      assert(dropped.forall { case (r, v) => v <= m(r) },
        s"retention drop raised a register at $dir")
      graft.Scratch.releaseAll()
    }
  }

  for (sf <- Seq("sf0.001")) {
    test(s"$sf replay: the add half (q151) folds the batch into the standing store == q149's direct sketch") {
      val dir = s"/root/testdata/$sf"
      val direct = regsOf(Registry.queriesMap("q149_hll_distinct_sketch")(spark, dir))
      val folded = regsOf(Registry.queriesMap("q151_hll_add_fold")(spark, dir))
      assert(folded == direct,
        "fold-into-standing-store must equal the direct sketch over all days")
      // The chain (q153): epoch 2's fold through the PUBLISHED
      // post-epoch-1 store must also land on the direct sketch.
      val chained = regsOf(Registry.queriesMap("q153_sketch_epoch_chain")(spark, dir))
      assert(chained == direct,
        "chained epoch folds must equal the direct sketch over all days")
      graft.Scratch.releaseAll()
    }
  }

  test("sketch epoch chain: fold-of-fold == direct under any grouping, and a register RISES across epochs (non-vacuous)") {
    import spark.implicits._
    // Crafted corpus for q153's algebra (r19 VERDICT task 1's "done"
    // bar: a register's max must CHANGE across epochs, so the chain
    // exercises a genuine second fold, not an idempotent replay).
    // Day-2 users outnumber the earlier population 1700:300, so many
    // registers' roll-up maxima rise only in epoch 2.
    def evs(ids: Range, day: String) =
      ids.map(i => (s"cu$i", java.sql.Timestamp.valueOf(s"$day 10:00:00")))
        .toDF("user_id", "ts")
    val standingEvents = evs(1 to 150, "2024-01-02")
    val standing = graft.queries.CurationOps.daySketch(standingEvents)
    val day1 = evs(151 to 300, "2024-01-05")
    val day2 = evs(301 to 2000, "2024-01-10")
    val (published, chained) =
      graft.queries.CurationOps.chainSketch(standing, day1, day2)
    def roll(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy(col("register_id")).agg(max(col("max_rho")).as("max_rho"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = roll(graft.queries.CurationOps.daySketch(
      standingEvents.unionByName(day1).unionByName(day2)))
    val viaChain = roll(chained)
    assert(viaChain == direct, "chained != one-shot registers")
    // Alternate grouping: both days folded in one epoch — same
    // registers (grouping invariance, the mergeability claim).
    val (_, oneEpoch) = graft.queries.CurationOps.chainSketch(
      standing, day1.unionByName(day2),
      Seq.empty[(String, java.sql.Timestamp)].toDF("user_id", "ts"))
    assert(roll(oneEpoch) == direct, "epoch grouping changed the registers")
    // Non-vacuity: epoch 2 must raise at least one register past the
    // published post-epoch-1 roll-up (here: many).
    val pub = roll(published)
    val risen = viaChain.count { case (r, v) => v > pub.getOrElse(r, 0L) }
    assert(risen > 0,
      "no register rose across epochs — the second fold is vacuous")
  }

  test("linear-counting view: small-range corrected estimate lands near truth; large-range passes through raw") {
    import spark.implicits._
    // The family scaladoc's deployment recipe as code: sf0.001's ~15
    // users sit deep in the raw estimator's floor regime (~alpha*m =
    // ~179 for m=256), where m*ln(m/V) is the accurate branch.
    val dir = "/root/testdata/sf0.001"
    val dense = Registry.queriesMap("q149_hll_distinct_sketch")(spark, dir)
    val truth = graft.queries.t(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    val row = graft.queries.CurationOps.hllCorrectedEstimate(dense).collect()(0)
    assert(row.getAs[Double]("est_raw") > 2 * truth,
      "raw estimator not in its floor regime — the corpus no longer exercises the small range")
    val est = row.getAs[Double]("est")
    assert(math.abs(est - truth) <= math.max(3.0, truth * 0.2),
      s"linear-counting estimate $est vs true $truth")
    // Pass-through: with no zero registers the correction cannot fire
    // and the raw estimate rides through unchanged.
    val big = (0 until 256).map(i => (i.toLong, 10L, 9999.1234))
      .toDF("register_id", "max_rho", "est")
    val through = graft.queries.CurationOps.hllCorrectedEstimate(big).collect()(0)
    assert(through.getAs[Double]("est") == 9999.1234,
      "large-range estimate must pass through uncorrected")
    graft.Scratch.releaseAll()
  }

  test("add-half redelivery: re-folding an already-folded day into the store is a no-op") {
    import spark.implicits._
    // The add half's at-least-once story: a replayed batch day (a
    // checkpoint redelivery, a re-run nightly) folds the SAME
    // (day, register, rho) partials again, and (day, register) max
    // absorbs them — the store is bit-identical, no dedup machinery
    // needed. Crafted: store = fold(day1); fold(day1) again == store.
    val day1 = (1 to 500).map(i => (s"u$i", java.sql.Timestamp.valueOf("2024-01-02 10:00:00")))
      .toDF("user_id", "ts")
    def fold(standing: Option[org.apache.spark.sql.DataFrame]): Map[(java.sql.Date, Long), Long] = {
      val part = graft.queries.CurationOps.daySketch(day1)
      val all = standing.map(_.unionByName(part)).getOrElse(part)
      all.groupBy(col("day"), col("register_id"))
        .agg(max(col("max_rho")).as("max_rho"))
        .collect().map(r => (r.getDate(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val once = fold(None)
    val store = graft.queries.CurationOps.daySketch(day1)
    val twice = fold(Some(store))
    assert(twice == once, "re-folding a delivered day must be a no-op")
    assert(once.nonEmpty && once.keys.map(_._1).toSet.size == 1)
  }

  test("plan pin: the sketch build has NO corpus-keyed exchange and partial-combines map-side") {
    // r18 VERDICT task 1: the defining property of the sketch as a
    // standing artifact is that building it never shuffles the corpus
    // — duplicate-insensitivity makes the per-(day, register) max
    // map-side combinable, so the only exchanges are keyed on
    // (day, register_id) / (register_id) and carry days x 256 rows.
    // A regression that re-introduces a pre-aggregation distinct (or
    // any user_id-keyed repartition) re-creates the full-corpus
    // shuffle this pin exists to forbid.
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q149_hll_distinct_sketch", "q151_hll_add_fold")) {
      val plan = Registry.queriesMap(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning(user_id"),
        s"$q shuffles the corpus on user_id:\n$plan")
      assert(plan.contains("partial_max"),
        s"$q lost the map-side partial aggregation:\n$plan")
    }
    graft.Scratch.releaseAll()
  }

  test("estimate accuracy: 20,000 known-distinct keys land within the 256-register error bound") {
    import spark.implicits._
    // Standard error for m=256 is 1.04/sqrt(256) = 6.5%; assert 4σ.
    val n = 20000
    val df = (1 to n).map(i => (s"u$i", "2024-01-01")).toDF("user_id", "day")
    // Route through the registered dataflow shape: day-bucketed
    // sketch, merged, densified — via a one-day q149-equivalent
    // computed inline with the same constants.
    val est = {
      val h = graft.queries.h60(concat(lit("hll:"), col("user_id")))
      val rem = shiftright(h, 8)
      val bits = lpad(bin(rem), 52, "0")
      val rho = when(instr(bits, "1") === 0, 53L)
        .otherwise(instr(bits, "1").cast("long"))
      val part = df.select(pmod(h, lit(256)).cast("long").as("register_id"),
          rho.as("rho"))
        .groupBy(col("register_id")).agg(max(col("rho")).as("max_rho"))
      val dense = spark.range(256).select(col("id").as("register_id"))
        .join(part, Seq("register_id"), "left")
        .select(coalesce(col("max_rho"), lit(0L)).as("max_rho"))
      val ss = dense.agg(
        sum(expr("shiftleft(1L, cast(53 - max_rho as int))"))).collect()(0).getLong(0)
      0.7213 / (1 + 1.079 / 256) * 256.0 * 256.0 * 9007199254740992.0 / ss
    }
    assert(math.abs(est - n) < 0.26 * n,
      s"estimate $est is outside 4 sigma of the true $n")
  }

  test("mergeability algebra: disjoint and overlapping parts, any grouping -> the same registers") {
    import spark.implicits._
    def sketch(keys: Seq[String]): Map[Long, Long] = {
      val h = graft.queries.h60(concat(lit("hll:"), col("k")))
      val rem = shiftright(h, 8)
      val bits = lpad(bin(rem), 52, "0")
      val rho = when(instr(bits, "1") === 0, 53L)
        .otherwise(instr(bits, "1").cast("long"))
      keys.toDF("k")
        .select(pmod(h, lit(256)).cast("long").as("r"), rho.as("v"))
        .groupBy(col("r")).agg(max(col("v")).as("v"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    }
    def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      (a.keySet ++ b.keySet).map(k =>
        k -> math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).toMap
    val d1 = (1 to 50).map(i => s"a$i")
    val d2 = (30 to 90).map(i => s"a$i") // overlaps d1
    val d3 = (100 to 130).map(i => s"b$i") // disjoint
    val direct = sketch((d1 ++ d2 ++ d3).distinct)
    assert(merge(merge(sketch(d1), sketch(d2)), sketch(d3)) == direct)
    assert(merge(sketch(d1), merge(sketch(d2), sketch(d3))) == direct,
      "grouping must not matter")
  }
}
