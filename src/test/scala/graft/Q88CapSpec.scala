package graft

import graft.queries.DedupOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the q88 band-bucket frequency cap (the LSH skew
  * guard): capping must only ever REMOVE pairs whose every shared
  * band bucket is hot, never invent or alter pairs — and with the cap
  * out of reach it must reproduce q51 exactly (the bounded collector
  * path and the band self-join path are the same operator).
  */
class Q88CapSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] = {
    val rows = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
      .toSeq.sorted
    Scratch.releaseAll()
    rows
  }

  test("cap beyond every bucket reproduces q51 exactly (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val uncapped = collectPairs(Registry.queriesMap("q51_minhash_lsh")(spark, dir))
    val capped = collectPairs(DedupOps.minhashPairsCapped(spark, dir, Int.MaxValue - 1))
    assert(uncapped.nonEmpty, "corpus produced no pairs; test is vacuous")
    assert(capped == uncapped)
  }

  test("registered cap is a subset of q51 (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val uncapped = collectPairs(Registry.queriesMap("q51_minhash_lsh")(spark, dir))
    val capped = collectPairs(Registry.queriesMap("q88_minhash_lsh_capped")(spark, dir))
    assert(capped.toSet.subsetOf(uncapped.toSet))
  }

  test("capped plan has no band self-join: joins only in the verify step") {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect { case j: BaseJoinExec => j }.size
    val dir = "/root/testdata/sf0.001"
    // q51 has a band self-join ahead of its verify joins; q88's
    // bucket-grouped aggregate replaces it, so the capped plan must
    // have strictly fewer joins. (Not exact counts — those are brittle
    // against planner changes unrelated to the cap semantics.)
    val jUncapped = joins(Registry.queriesMap("q51_minhash_lsh")(spark, dir))
    val jCapped = joins(Registry.queriesMap("q88_minhash_lsh_capped")(spark, dir))
    assert(jCapped < jUncapped,
      s"capped plan has $jCapped joins, uncapped $jUncapped")
    Scratch.releaseAll()
  }

  test("hot bucket is dropped, small bucket survives (crafted corpus)") {
    // 5 byte-identical docs -> identical signatures -> one 5-doc bucket
    // in every band, over the cap of 3 everywhere: NO pair may emerge
    // even though every pair has jaccard 1.0. A separate exact-dup PAIR
    // (bucket of 2) must still come through. Singletons pad the corpus.
    val hot = (0L to 4L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val pair = Seq((10L, "one two three four five six seven"),
      (11L, "one two three four five six seven"))
    val singles = (20L to 24L).map(i =>
      (i, s"lone${i} word${i * 7} tail${i * 13} more${i * 17} end${i * 19}"))
    val dir = java.nio.file.Files.createTempDirectory("q88spec").toString
    spark.createDataFrame(hot ++ pair ++ singles).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val capped = collectPairs(DedupOps.minhashPairsCapped(spark, dir, 3))
    assert(capped == Seq((10L, 11L, 1.0)))

    // Sanity: uncapped sees the full clique plus the pair.
    val uncapped = collectPairs(DedupOps.minhashPairsCapped(spark, dir, 100))
    assert(uncapped.size == 11 && uncapped.contains((0L, 4L, 1.0)))
  }
}
