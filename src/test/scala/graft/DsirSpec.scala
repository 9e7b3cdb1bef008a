package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q108's DSIR scoring, replayed independently: a crafted corpus whose
  * target/raw split is PRECOMPUTED with the same md5 fold the query
  * uses, scored in driver Scala with exact BigDecimal arithmetic, and
  * compared row-for-row to the registered query. Also pins the
  * multiplicity-preserving shingle kernel against its distinct sibling
  * (the query undercounts repeated bigrams if the wrong kernel ships). */
class DsirSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Driver-side [[queries.h60]]: first 15 md5 hex digits as a long. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var b = 0
    while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  test("shingleH60AllUdf keeps order and multiplicity; distinct-folds to shingleH60Udf") {
    val s = spark
    import s.implicits._
    val toks = Seq("a", "b", "a", "b", "a") // bigrams: ab ba ab ba
    val df = Seq(Tuple1(toks)).toDF("toks")
    val all = df.select(queries.shingleH60AllUdf(2)($"toks")).as[Seq[Long]].head()
    val dis = df.select(queries.shingleH60Udf(2)($"toks")).as[Seq[Long]].head()
    assert(all.length == 4, "one hash per position, repeats kept")
    assert(all == Seq(h60("a b"), h60("b a"), h60("a b"), h60("b a")))
    assert(all.distinct == dis, "distinct fold must equal the distinct kernel")
  }

  test("crafted corpus: query scores equal an exact BigDecimal driver replay") {
    val B = 8192
    // 60 docs over a 12-word vocab; the h60 split decides target vs
    // raw exactly as the query does, so the spec controls nothing and
    // verifies everything.
    val vocab = Vector("sun", "moon", "star", "rain", "wind", "snow",
      "oak", "elm", "fir", "ash", "yew", "box")
    val rnd = new scala.util.Random(42L)
    // Ids chosen BY the split hash (4 targets + 56 raws) so the 3 %
    // split is guaranteed non-degenerate at spec size; the query
    // still derives the split itself.
    def isTgt(id: Long) = h60(s"dsir:$id") % 100 >= 97
    val ids = (0L until 4000L).filter(isTgt).take(4) ++
      (0L until 4000L).filterNot(isTgt).take(56)
    val docs = ids.map { id =>
      val n = 8 + rnd.nextInt(20)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "en", "s0", 0L)
    }
    val tmp = java.nio.file.Files.createTempDirectory("q108spec").toString
    spark.createDataFrame(docs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // Driver replay with exact decimals after the 6-dp weight rounding.
    val byDoc = docs.map { case (id, text, _, _, _) =>
      val toks = text.split(" ").toSeq
      val gs = toks.sliding(2).map(bg => h60(bg.mkString(" ")) % B).toSeq
      (id, h60(s"dsir:$id") % 100 >= 97, gs)
    }
    val tgt = byDoc.filter(_._2).flatMap(_._3)
    val raw = byDoc.filterNot(_._2).flatMap(_._3)
    assert(tgt.nonEmpty && raw.nonEmpty, "split must produce both sides")
    val tc = tgt.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rc = raw.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tt, rt) = (tgt.size.toLong, raw.size.toLong)
    // Catalyst's round() on a double goes through the Double.toString
    // decimal repr (BigDecimal.decimal); mirror BOTH of the query's
    // rounding steps exactly — 6 dp on the double weight, then the
    // exact decimal sum cast to double before the 4-dp output round.
    def w(g: Long): BigDecimal = BigDecimal.decimal(
      math.log((tc.getOrElse(g, 0L) + 1.0) / (tt + B)) -
        math.log((rc.getOrElse(g, 0L) + 1.0) / (rt + B)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = byDoc.filterNot(_._2).map { case (id, _, gs) =>
      val score = BigDecimal.decimal(gs.map(w).sum.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      (id, gs.size.toLong, score.toDouble)
    }.sortBy { case (id, _, sc) => (-sc, id) }
      .take(100).zipWithIndex
      .map { case ((id, n, sc), i) => (id, n, sc, i + 1) }

    val got = Registry.queriesMap("q108_dsir_weights")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(got == expected,
      s"query vs driver replay differ; first few got=${got.take(3)} expected=${expected.take(3)}")
  }
}
