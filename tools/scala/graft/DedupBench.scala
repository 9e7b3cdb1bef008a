package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume exercise for the near-dup dedup family (q50 exact, q51
  * MinHash-LSH pairs, q52 simhash, q73 clusters) against a
  * `tools/dedup_gen.py` corpus — the one dedup workload the sf bench
  * never reaches: millions of documents with a KNOWN ground-truth
  * cluster structure, so the run verifies soundness and recall at
  * volume, not just wall time.
  *
  * Ground truth (see dedup_gen.py): group g = doc_id/4; g%8==0 is a
  * 4-doc near-dup cluster rooted at 4g (pairwise Jaccard 0.81-0.95);
  * g%8==1 has docs {4g, 4g+1} byte-identical; everything else is a
  * singleton sharing ~no shingles with anything. Checks:
  *  - SOUNDNESS (exact): every q51 pair and every q73 multi-doc
  *    cluster stays within one generated group — LSH + the j>=0.8
  *    verify must never bridge unrelated docs.
  *  - RECALL (probabilistic): the 4x3-band S-curve gives >=99.5% per
  *    root<->member pair at j>=0.90, so >=98% of expected clusters
  *    must be recovered with their full member set. Exact-dup pairs
  *    (j=1.0) must be recovered at 100%.
  *
  * Usage:
  *   python3 tools/dedup_gen.py /tmp/dedup2m 2000000
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.DedupBench /tmp/dedup2m"
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/dedup2m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val shufRead = new java.util.concurrent.atomic.AtomicLong(0)
    val taskCount = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        taskCount.addAndGet(sc.stageInfo.numTasks.toLong)
      }
    })

    val names = Seq("q50_exact_dedup", "q51_minhash_lsh", "q52_simhash",
      "q73_neardup_clusters", "q92_simhash64", "q96_incremental_dedup")
    // Plan/codegen warmup at the unit scale so the timed pass measures
    // data work, not one-time JVM compilation.
    for (n <- names) {
      Registry.queriesMap(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.toRdd.count(); Scratch.releaseAll()
    }
    for (name <- names) {
      shufWrite.set(0); shufRead.set(0); taskCount.set(0)
      val t0 = System.nanoTime()
      val n = Registry.queriesMap(name)(spark, dir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Scratch.releaseAll()
      println(f"DEDUPBENCH $name%-22s $dt%8.2f s  rows=$n%,d  " +
        f"shufWrite=${shufWrite.get / 1e9}%.2f GB  shufRead=${shufRead.get / 1e9}%.2f GB  " +
        f"tasks=${taskCount.get}%,d")
    }

    // ---- ground-truth verification (untimed) --------------------------
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()

    // q51 pair soundness: both endpoints in the same group, and that
    // group is a generated cluster (g%8==0) or exact-dup pair (g%8==1,
    // endpoints {4g, 4g+1}).
    val pairs = Registry.queriesMap("q51_minhash_lsh")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val badPairs = pairs.where(
      !(floor(col("doc_a") / 4) === floor(col("doc_b") / 4) &&
        ((floor(col("doc_a") / 4) % 8 === 0) ||
         (floor(col("doc_a") / 4) % 8 === 1 &&
          col("doc_a") % 4 === 0 && col("doc_b") % 4 === 1)))).count()
    Scratch.releaseAll()

    // q73 cluster soundness: members (sorted ascending by the query)
    // must all land in ONE generated group of the right kind, and the
    // canonical must be the member minimum. With that held, a 4-doc
    // cluster can only be the complete expected set (a group has
    // exactly 4 docs), and any g%8==1 cluster must be {4g, 4g+1}.
    val multi = Registry.queriesMap("q73_neardup_clusters")(spark, dir)
      .where(col("n_docs") > 1)
      .withColumn("mem", split(col("members"), ",").cast("array<long>"))
      .withColumn("g", floor(element_at(col("mem"), 1) / 4))
      .cache()
    val badClusters = multi.where(
      !(col("canonical_id") === element_at(col("mem"), 1) &&
        col("g") === floor(element_at(col("mem"), size(col("mem"))) / 4) &&
        ((col("g") % 8 === 0 && col("n_docs") <= 4) ||
         (col("g") % 8 === 1 && col("n_docs") === 2 &&
          col("canonical_id") === col("g") * 4)))).count()
    val full4 = multi.where(col("g") % 8 === 0 && col("n_docs") === 4).count()
    val exact2 = multi.where(col("g") % 8 === 1).count()
    multi.unpersist()
    Scratch.releaseAll()

    // Capped-plan equivalence at volume: no band bucket on this corpus
    // approaches a production cap of 64, so q88's bucket-grouped
    // bounded-aggregator plan must reproduce q51's verified pair set
    // EXACTLY — two different physical shapes (one-exchange aggregate
    // vs band self-join), bit-equal output at 2M docs. Opt-in ("eq"
    // arg): holding two sig caches needs SPARK_DRIVER_MEM=48g, and the
    // bigger heap's GC regime slows the HEADLINE numbers 3-4x, so the
    // check runs in its own process.
    if (args.contains("eq")) {
    val t88 = System.nanoTime()
    val capped = queries.DedupOps.minhashPairsCapped(spark, dir, 64)
      .select(col("doc_a"), col("doc_b"))
    val onlyUncapped = pairs.exceptAll(capped).count()
    val onlyCapped = capped.exceptAll(pairs).count()
    val dt88 = (System.nanoTime() - t88) / 1e9
    Scratch.releaseAll()
    println(f"DEDUPBENCH q88(cap=64) equivalence $dt88%8.2f s  " +
      f"onlyUncapped=$onlyUncapped onlyCapped=$onlyCapped")
    require(onlyUncapped == 0 && onlyCapped == 0,
      "capped(64) pair set diverges from q51 at volume")
    }

    // q92 precision at volume — THE measurement that motivated the
    // 64-bit sketch: q52's 32-bit instance emits ~17x the true pair
    // count at 2M docs (86% false; THROUGHPUT.md). With 16-bit bands
    // over 64 bits + hamming <= 6 the expected false-pair volume is
    // ~candidates * sum_{k<=6} C(48,k)/2^48 ~ single digits. Exact
    // dups (hamming 0) must all surface; 1-token-mutation cluster
    // pairs pass only when <= 6 of 64 majority votes flip — that
    // recall is REPORTED, not asserted (it is a property of simhash
    // at these doc lengths, identical for any sketch width).
    val p92 = Registry.queriesMap("q92_simhash64")(spark, dir)
      .select(col("doc_a"), col("doc_b")).cache()
    val n92 = p92.count()
    val cross92 = p92.where(
      !(floor(col("doc_a") / 4) === floor(col("doc_b") / 4) &&
        ((floor(col("doc_a") / 4) % 8 === 0) ||
         (floor(col("doc_a") / 4) % 8 === 1 &&
          col("doc_a") % 4 === 0 && col("doc_b") % 4 === 1)))).count()
    val exact92 = p92.where(
      floor(col("doc_a") / 4) % 8 === 1 && col("doc_a") % 4 === 0 &&
        col("doc_b") === col("doc_a") + 1).count()
    p92.unpersist(); Scratch.releaseAll()
    println(f"DEDUPVERIFY q92 pairs=$n92%,d false_pairs=$cross92%,d " +
      f"exact_recovered=$exact92%,d/${nDocs / 32}%,d")
    require(cross92 <= 100, s"q92 emitted $cross92 false pairs; 64-bit precision claim fails")
    require(exact92 == nDocs / 32, "q92 missed exact-dup (hamming 0) pairs")

    val expected = nDocs / 32 // per kind: 4-clusters and exact pairs
    val recall4 = full4.toDouble / expected
    val recall2 = exact2.toDouble / expected
    println(f"DEDUPVERIFY pairs_unsound=$badPairs clusters_unsound=$badClusters " +
      f"full4=$full4%,d/$expected%,d (${recall4 * 100}%.2f%%) " +
      f"exact2=$exact2%,d/$expected%,d (${recall2 * 100}%.2f%%)")
    require(badPairs == 0, s"$badPairs unsound q51 pairs bridge unrelated docs")
    require(badClusters == 0, s"$badClusters q73 clusters violate ground truth")
    require(recall4 >= 0.98, f"4-cluster recall $recall4%.4f below 0.98")
    require(recall2 == 1.0, f"exact-dup recall $recall2%.4f below 1.0")

    // q96 ingest-gate soundness + recall: every reported match must
    // stay inside its ground-truth group; expected matches = incoming
    // docs (the query's own deterministic 10% split) with >= 1
    // same-group partner left in the index (cluster-member Jaccard is
    // >= 0.81 on this corpus, all above the 0.8 verify threshold).
    val inc96 = Registry.queriesMap("q96_incremental_dedup")(spark, dir).cache()
    val n96 = inc96.count()
    val bad96 = inc96.where(
      !(floor(col("doc_id") / 4) === floor(col("best_match") / 4) &&
        ((floor(col("doc_id") / 4) % 8 === 0) ||
         (floor(col("doc_id") / 4) % 8 === 1 &&
          least(col("doc_id"), col("best_match")) % 4 === 0 &&
          greatest(col("doc_id"), col("best_match")) % 4 === 1)))).count()
    inc96.unpersist(); Scratch.releaseAll()
    val docs96 = spark.range(0, nDocs).toDF("doc_id")
      .withColumn("g", floor(col("doc_id") / 4))
      .withColumn("r", col("doc_id") % 4)
      .withColumn("incoming",
        queries.h60(concat(lit("ingest:"), col("doc_id"))) % 10 === 0)
      .where((col("g") % 8 === 0) || (col("g") % 8 === 1 && col("r") <= 1))
    val grouped96 = docs96.groupBy(col("g"))
      .agg(sum(when(col("incoming"), 1).otherwise(0)).as("n_inc"),
        sum(when(!col("incoming"), 1).otherwise(0)).as("n_idx"))
    val expected96 = grouped96
      .select(sum(when(col("n_idx") >= 1, col("n_inc")).otherwise(0)))
      .collect()(0).getLong(0)
    Scratch.releaseAll()
    val recall96 = n96.toDouble / expected96
    println(f"DEDUPVERIFY q96 matches=$n96%,d expected=$expected96%,d " +
      f"(${recall96 * 100}%.2f%%) unsound=$bad96")
    require(bad96 == 0, s"$bad96 q96 matches bridge unrelated docs")
    require(recall96 >= 0.9, f"q96 ingest recall $recall96%.4f below 0.9")
    println("DEDUPVERIFY OK")
    spark.stop()
  }
}
