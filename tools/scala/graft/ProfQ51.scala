package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B of q51's verify-set strategy at volume. Since round 9 the
  * REGISTERED plan is the adaptive deferred-verify one (signature agg
  * computes minhashes only; hs is built in a second pass over the
  * candidate docs, probe-guarded — DedupOps.minhashPairsAdaptive);
  * variant A here is the pre-round-9 one-pass reference plan (hs for
  * EVERY document inside the signature aggregation). Both must
  * produce identical verified pair sets.
  *
  * Run on /tmp/dedup2m (19% candidate density — the regime where
  * deferral is merely a wash) AND /tmp/dedupsparse2m (~1% density,
  * `dedup_gen.py ... 128` — the production regime where deferral
  * wins outright).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.ProfQ51 /tmp/dedup2m"
  */
object ProfQ51 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/dedup2m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shufWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def time(tag: String, df: => DataFrame): Long = {
      shufWrite.set(0)
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Scratch.releaseAll()
      println(f"PROFQ51 $tag%-10s $dt%8.2f s  rows=$n%,d  shufWrite=${shufWrite.get / 1e9}%.2f GB")
      n
    }

    for (rep <- 1 to 2) {
      val a = time("one_pass", queries.DedupOps.minhashPairsOnePass(spark, dir)
        .orderBy(col("doc_a"), col("doc_b")))
      // Forced adaptive (the registered entry size-gates to one-pass
      // below DeferredMinDocs, which would make this A/B a no-op on
      // small corpora).
      val b = time("adaptive", queries.DedupOps.minhashPairsAdaptive(spark, dir,
        queries.DedupOps.DeferredBroadcastIdCap)
        .orderBy(col("doc_a"), col("doc_b")))
      require(a == b, s"pair count diverged: $a vs $b")
      println(s"PROFQ51 --- rep $rep done (counts equal: $a) ---")
    }
    spark.stop()
  }
}
