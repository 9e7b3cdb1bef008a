package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbenchmark isolating q50's regexp_replace cost as a function of
  * document length — plain java.util.regex replaceAll on the same text
  * is ~58 us/doc at 950 chars, so a superlinear curve here indicts
  * Spark's RegExpReplace evaluation, not the regex engine.
  */
object ProfRegex {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val r = new java.util.Random(42)
    def doc(len: Int) = {
      val sb = new StringBuilder
      while (sb.length < len) { sb.append('t').append(100000 + r.nextInt(900000)).append(' ') }
      sb.toString
    }
    for (len <- Seq(100, 400, 950, 2000)) {
      val df = (0 until 20000).map(i => (i.toLong, doc(len))).toDF("doc_id", "text").cache()
      df.count()
      def run(): Double = {
        val t0 = System.nanoTime()
        df.select(md5(lower(regexp_replace(col("text"), "[^a-zA-Z0-9]", ""))).as("fp"))
          .queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e3 / 20000
      }
      run() // warmup
      println(f"PROFREGEX len=$len%5d  ${run()}%8.1f us/doc (4 threads)")
      df.unpersist()
    }
    spark.stop()
  }
}
