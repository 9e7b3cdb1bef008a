package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of q89's train-df cap: an 8-gram carried by more than
  * `cap` train documents must contribute NOTHING to an eval doc's
  * contamination counts (it is boilerplate, and at volume it is the
  * entire join blowup — THROUGHPUT.md round 8), while grams at or
  * under the cap must count exactly as q77 counts them. The oracle
  * corpora never put a hot train gram into an eval doc, so this pins
  * the drop path on a crafted corpus.
  */
class Q89CapSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Replicates the query's h60('split:'||id) % 100 split bucket. */
  private def bucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"split:$id".getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 100
  }

  test("hot train gram is excluded from eval counts; in-cap gram kept") {
    val ids = (0L until 400L)
    val train = ids.filter(bucket(_) < 90)
    val eval = ids.filter(bucket(_) >= 90)
    assert(train.size >= 4 && eval.nonEmpty)
    val hotCarriers = train.take(4) // df 4 > cap 2
    val rareCarrier = train.drop(4).head // df 1 <= cap
    val evalDoc = eval.head
    val hot = "h1 h2 h3 h4 h5 h6 h7 h8"
    val rare = "r1 r2 r3 r4 r5 r6 r7 r8"
    def filler(id: Long) = s"f${id}a f${id}b f${id}c f${id}d f${id}e f${id}f f${id}g f${id}h"
    val rows =
      hotCarriers.map(id => (id, s"${filler(id)} $hot")) ++
        Seq((rareCarrier, s"${filler(rareCarrier)} $rare"),
          (evalDoc, s"$hot x9sep $rare")) ++
        train.drop(5).take(3).map(id => (id, filler(id)))
    val dir = java.nio.file.Files.createTempDirectory("q89spec").toString
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def result(name: String) = {
      val r = Registry.queriesMap(name)(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared_shingles"),
          r.getAs[Long]("n_train_docs"))).toSeq
      Scratch.releaseAll()
      r
    }
    // q77 (uncapped): eval doc shares the hot gram with 4 train docs
    // and the rare gram with 1.
    assert(result("q77_decontamination") == Seq((evalDoc, 2L, 5L)))
    // q89 (cap 2): the hot gram's 4 carriers exceed the cap, so only
    // the rare gram survives.
    assert(result("q89_decontam_capped") == Seq((evalDoc, 1L, 1L)))
  }
}
