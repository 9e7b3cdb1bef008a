package graft

import graft.etl.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume exercise for the connected-components tiers at the sizes
  * that actually select them — the unit tests cover toy graphs only,
  * so this main records wall times and verifies full closure parity
  * on synthetic graphs with KNOWN components.
  *
  *   A  star graph, 4.5M edges → the QUOTIENT tier (1M < E ≤ 5M):
  *      duplicate-heavy shape, near-star components whose quotient is
  *      empty — the tier's design case.
  *   B  star graph, 10M edges → the DISTRIBUTED tier (E > 5M) through
  *      the public connectedComponents entry.
  *   C  64 long chains (~15.6k hops each), 1M edges → distributed
  *      tier directly: pointer-jumping must converge in O(log n)
  *      rounds where plain neighbor-min would need 15.6k.
  *
  * Star graph with C hubs: edge i connects hub (i % C) to leaf C + i;
  * every vertex's true component is its hub id. Chain graph with C
  * chains over V vertices: edge (v+C → v); true component = v % C.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.CCBench"
  */
object CCBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String, vertices: org.apache.spark.sql.Dataset[java.lang.Long],
        edges: org.apache.spark.sql.Dataset[Pipeline.Edge],
        expected: org.apache.spark.sql.Column,
        via: (org.apache.spark.sql.Dataset[java.lang.Long],
              org.apache.spark.sql.Dataset[Pipeline.Edge]) =>
              org.apache.spark.sql.DataFrame): Unit = {
      val nV = vertices.count(); val nE = edges.count() // materialize inputs untimed
      // Min-of-2 timed passes, same protocol as graft.Bench: the first
      // pass pays one-time Janino codegen for the round plans (~7 s on
      // the chain case), which a deployment amortizes across every
      // component run; the min is the device cost.
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val labels = via(vertices, edges)
        val bad = labels.where(col("comp") =!= expected).count()
        val dt = (System.nanoTime() - t0) / 1e9
        require(bad == 0, s"$name parity FAIL($bad)")
        // Release the returned checkpoint's blocks — otherwise each
        // case/rep pins vertex-scale label RDDs for the JVM lifetime
        // and later cases measure the memory pressure, not the device.
        labels.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking = false)
          case _ => ()
        }
        dt
      }
      println(f"CCBENCH $name%-22s vertices=$nV%,d edges=$nE%,d  ${times.min}%8.2f s (min of ${times.map(t => f"$t%.2f").mkString("/")})  parity=OK")
    }

    val C1 = 500000L; val E1 = 4500000L
    run("A quotient/star",
      spark.range(C1 + E1).as[java.lang.Long],
      spark.range(E1).select((col("id") % C1).as("src"), (col("id") + C1).as("dst")).as[Pipeline.Edge],
      when(col("id") < C1, col("id")).otherwise((col("id") - C1) % C1),
      (v, e) => Pipeline.connectedComponents(v, e))

    val C2 = 1000000L; val E2 = 10000000L
    run("B distributed/star",
      spark.range(C2 + E2).as[java.lang.Long],
      spark.range(E2).select((col("id") % C2).as("src"), (col("id") + C2).as("dst")).as[Pipeline.Edge],
      when(col("id") < C2, col("id")).otherwise((col("id") - C2) % C2),
      (v, e) => Pipeline.connectedComponents(v, e))

    val C3 = 64L; val V3 = 1000000L
    run("C distributed/chains",
      spark.range(V3).as[java.lang.Long],
      spark.range(V3 - C3).select((col("id") + C3).as("src"), col("id").as("dst")).as[Pipeline.Edge],
      col("id") % C3,
      (v, e) => Pipeline.distributedComponents(v, e))

    // Optional 10x headroom case (arg "xl"): 100M edges / 110M
    // vertices — kept off the default run so the A/B/C walls stay
    // comparable round-over-round.
    if (args.contains("xl")) {
      val C4 = 10000000L; val E4 = 100000000L
      run("D xl/star 100M",
        spark.range(C4 + E4).as[java.lang.Long],
        spark.range(E4).select((col("id") % C4).as("src"), (col("id") + C4).as("dst")).as[Pipeline.Edge],
        when(col("id") < C4, col("id")).otherwise((col("id") - C4) % C4),
        (v, e) => Pipeline.connectedComponents(v, e))
    }

    spark.stop()
  }
}
