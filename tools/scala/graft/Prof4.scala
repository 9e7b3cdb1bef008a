package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl._

/** Finer-grained profile of the acceptedPairs DAG internals. */
object Prof4 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val raw = Synth.contacts(spark, dir)
    val norm = t("norm.checkpoint")(Pipeline.normalize(raw).localCheckpoint(true))
    val slim = t("slim.checkpoint")(
      norm.map(ContactLogic.toMatchRec).localCheckpoint(true))

    def tagged(kt: String, arr: Column) =
      transform(arr, x => struct(lit(kt).as("kt"), x.as("k"), lit(null: String).as("lnk")))
    val nameKeys = transform(arrays_zip(col("normNames"), col("lowerNames")),
      x => struct(lit("nm").as("kt"), x.getField("normNames").as("k"),
        x.getField("lowerNames").as("lnk")))
    val keys = slim.select(col("row_id"), col("block"),
        explode(concat(
          nameKeys,
          tagged("nr", col("nickRoots")),
          tagged("em", col("emails")),
          tagged("ph", col("phones")),
          tagged("ak", col("addrKeys")),
          tagged("li", array(col("linkedin"))))).as("e"))
      .select(col("row_id"), col("block"), col("e.kt").as("kt"),
        col("e.k").as("k"), col("e.lnk").as("lnk"))
      .where(col("k") =!= "")
      .distinct()
    t("keys.count")(println(keys.count()))
    val keysP = t("keys.checkpoint")(keys.localCheckpoint(true))
    val KeyTypes = Seq("nm", "nr", "em", "ph", "ak", "li")
    val flagAggs = KeyTypes.map(kt =>
      max(when(col("x.kt") === kt, 1).otherwise(0)).as(s"f_$kt")) :+
      max(when(col("x.lnk").isNotNull && col("x.lnk") === col("y.lnk"), 1)
        .otherwise(0)).as("f_ln")
    val joined = keysP.as("x").join(keysP.as("y"),
      col("x.block") === col("y.block") && col("x.kt") === col("y.kt") &&
        col("x.k") === col("y.k") && col("x.row_id") < col("y.row_id"))
    t("join.count")(println(joined.count()))
    val matches = joined
      .groupBy(col("x.row_id").as("src"), col("y.row_id").as("dst"))
      .agg(flagAggs.head, flagAggs.tail: _*)
    t("matches.count")(println(matches.count()))
    val matchesP = t("matches.checkpoint")(matches.localCheckpoint(true))
    val scalars = slim.select(col("row_id"), col("lastNorm"), col("suffixNorm"),
      lower(col("suffix")).as("suffixLower"),
      col("isLinkedinSrc"), (size(col("normNames")) > 0).as("named"))
    def sc(side: String) = scalars.columns.filter(_ != "row_id")
      .foldLeft(scalars)((d, c) => d.withColumnRenamed(c, s"${side}_$c"))
    val pairs = matchesP
      .join(sc("a").withColumnRenamed("row_id", "src"), "src")
      .join(sc("b").withColumnRenamed("row_id", "dst"), "dst")
    t("pairs.count")(println(pairs.count()))
    val full = t("acceptedPairs.build")(Pipeline.acceptedPairs(norm))
    t("accepted.count")(println(full.count()))
    spark.stop()
  }
}
