package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val qs = Registry.all.filter(q => names.isEmpty || names.contains(q.name))
    for (q <- qs; i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = q.run(spark, dir).count()
      println(f"PROF ${q.name}%-28s run$i ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      Scratch.releaseAll()
    }
    spark.stop()
  }
}
