package graft
import org.apache.spark.sql.SparkSession
import graft.etl._
object Prof2 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-18s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val raw = Synth.contacts(spark, dir)
    t("raw.count")(println(raw.count()))
    val norm = Pipeline.normalize(raw)
    t("norm.count")(println(norm.count()))
    val normP = norm.persist()
    t("norm.persist")(println(normP.count()))
    val edges = Pipeline.acceptedPairs(normP)
    t("edges.count")(println(edges.count()))
    val comps = t("components")(Pipeline.connectedComponents(
      normP.select(org.apache.spark.sql.functions.col("row_id").as[java.lang.Long]), edges))
    t("comps.count")(println(comps.count()))
    val (merged, lineage) = t("merge.build")(Pipeline.dedupeAndMerge(norm, raw))
    t("merged.count")(println(merged.count()))
    spark.stop()
  }
}
