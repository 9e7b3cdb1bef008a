package graft.queries

import graft.Q
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * q55 is the exact brute-force baseline: broadcast the (tiny) query
  * set against the corpus scan, score every vector, keep top-k per
  * query. At 100 TB the corpus side stays partition-parallel with no
  * shuffle of the vectors themselves — only (query_id, vec_id, score)
  * triples move, and the per-query top-k runs as a window over that
  * narrow projection. q56 is the scale path: sign-LSH bucket the
  * corpus once (16 buckets from 4 axis-aligned hyperplanes), then
  * score only the bucket that matches each query — the same
  * probe-the-cell structure as an IVF index with nprobe=1.
  *
  * Dot products are index-wise double folds evaluated in the same
  * sequential order in Spark and the DuckDB oracle, so scores agree
  * bit-for-bit; ranking ties break on vec_id for total determinism.
  */
object SimilarityOps {

  /** Native sequential-fold dot product (plans.VecDotProduct): same
    * double accumulation order as the previous
    * aggregate(zip_with(...)) form — bit-identical scores — but
    * codegen'd with no per-pair allocation. Built as a Column
    * directly — no session registry mutation. */
  private def dot(x: Column, y: Column): Column = graft.plans.VecDotProduct(x, y)

  private val oDot =
    (a: String, b: String) =>
      s"""list_aggregate(list_transform(range(1, len($a) + 1),
         |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')""".stripMargin

  private val NQueries = 8
  private val TopK = 5

  /** Brute-force cosine top-k: query vectors vec_id < 8, k = 5. */
  val q55 = Q(
    "q55_cosine_topk",
    s"brute-force cosine top-$TopK neighbors for $NQueries query vectors",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      val q = e.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(dot(col("qv"), col("v")) / (col("qn") * col("norm")), 6).as("cos6"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos6").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= TopK)
        .select(col("query_id"), col("rank").cast("int").as("rank"),
          col("neighbor_id"), round(col("cos6"), 4).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH e AS (
        SELECT vec_id, embedding AS v,
          sqrt(${oDot("embedding", "embedding")}) AS norm
        FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
          round(${oDot("q.v", "e.v")} / (q.norm * e.norm), 6) AS cos6
        FROM e q JOIN e ON q.vec_id < $NQueries AND e.vec_id <> q.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos6,
          row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
        round(cos6, 4) AS cosine
      FROM ranked WHERE rank <= $TopK ORDER BY query_id, rank"""))

  private val ATopK = 3

  /** Sign-LSH ANN: probe only the query's own bucket (IVF-style,
    * nprobe=1), top-3 within it. Approximate by construction — the
    * bucketing is the documented recall trade vs q55's exact scan. */
  val q56 = Q(
    "q56_ann_lsh_topk",
    s"sign-LSH bucketed ANN top-$ATopK for $NQueries query vectors",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("norm", sqrt(dot(col("v"), col("v"))))
        .withColumn("bucket", concat(
          when(element_at(col("v"), 1) >= 0, "1").otherwise("0"),
          when(element_at(col("v"), 17) >= 0, "1").otherwise("0"),
          when(element_at(col("v"), 33) >= 0, "1").otherwise("0"),
          when(element_at(col("v"), 49) >= 0, "1").otherwise("0")))
      val q = e.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("norm").as("qn"), col("bucket").as("qbucket"))
      val scored = e.join(broadcast(q),
          col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(dot(col("qv"), col("v")) / (col("qn") * col("norm")), 6).as("cos6"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos6").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= ATopK)
        .select(col("query_id"), col("rank").cast("int").as("rank"),
          col("neighbor_id"), round(col("cos6"), 4).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH e AS (
        SELECT vec_id, embedding AS v,
          sqrt(${oDot("embedding", "embedding")}) AS norm,
          (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
           CASE WHEN embedding[17] >= 0 THEN '1' ELSE '0' END ||
           CASE WHEN embedding[33] >= 0 THEN '1' ELSE '0' END ||
           CASE WHEN embedding[49] >= 0 THEN '1' ELSE '0' END) AS bucket
        FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
          round(${oDot("q.v", "e.v")} / (q.norm * e.norm), 6) AS cos6
        FROM e q JOIN e ON q.vec_id < $NQueries AND e.bucket = q.bucket
                      AND e.vec_id <> q.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos6,
          row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
        round(cos6, 4) AS cosine
      FROM ranked WHERE rank <= $ATopK ORDER BY query_id, rank"""))

  private val IvfCells = 16
  private val IvfProbe = 2

  /** IVF-Flat ANN: a 16-centroid coarse quantizer (deterministic
    * training sample: the 16 lowest vec_ids), every vector assigned to
    * its best cell, queries probing their nprobe=2 nearest cells, exact
    * cosine inside the probed cells only.
    *
    * Scale shape: the centroid table broadcasts; assignment is one
    * scan + a 16-way scored window (no shuffle of vectors, only
    * (vec_id, cell)); the probe join is an equi-join on cell id, so
    * search cost tracks corpus/IvfCells × nprobe instead of the full
    * scan — the standard IVF trade vs q55's exact baseline, with
    * better recall than q56's single-bucket LSH probe. */
  val q59 = Q(
    "q59_ann_ivf_topk",
    s"IVF($IvfCells,nprobe=$IvfProbe) ANN top-$ATopK for $NQueries query vectors",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("norm", sqrt(dot(col("v"), col("v"))))
      val cents = e.where(col("vec_id") < IvfCells)
        .select(col("vec_id").as("cell"), col("v").as("cv"), col("norm").as("cn"))
      val affinity = e.join(broadcast(cents), lit(true))
        .select(col("vec_id"), col("v"), col("norm"), col("cell"),
          round(dot(col("v"), col("cv")) / (col("norm") * col("cn")), 6).as("aff"))
      val aw = Window.partitionBy(col("vec_id"))
        .orderBy(col("aff").desc, col("cell").asc)
      val ranked = affinity.withColumn("crank", row_number().over(aw))
      val assigned = ranked.where(col("crank") === 1)
        .select(col("vec_id"), col("v"), col("norm"), col("cell"))
      val probes = ranked.where(col("vec_id") < NQueries && col("crank") <= IvfProbe)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("norm").as("qn"), col("cell"))
      val scored = assigned.join(broadcast(probes),
          assigned("cell") === probes("cell") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(dot(col("qv"), col("v")) / (col("qn") * col("norm")), 6).as("cos6"))
        .distinct()
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos6").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= ATopK)
        .select(col("query_id"), col("rank").cast("int").as("rank"),
          col("neighbor_id"), round(col("cos6"), 4).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH e AS (
        SELECT vec_id, embedding AS v,
          sqrt(${oDot("embedding", "embedding")}) AS norm
        FROM embeddings),
      cents AS (
        SELECT vec_id AS cell, v AS cv, norm AS cn FROM e WHERE vec_id < $IvfCells),
      affinity AS (
        SELECT e.vec_id, e.v, e.norm, cents.cell,
          round(${oDot("e.v", "cents.cv")} / (e.norm * cents.cn), 6) AS aff
        FROM e CROSS JOIN cents),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY aff DESC, cell ASC) AS crank
        FROM affinity),
      assigned AS (
        SELECT vec_id, v, norm, cell FROM ranked WHERE crank = 1),
      probes AS (
        SELECT vec_id AS query_id, v AS qv, norm AS qn, cell
        FROM ranked WHERE vec_id < $NQueries AND crank <= $IvfProbe),
      scored AS (
        SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
          round(${oDot("p.qv", "a.v")} / (p.qn * a.norm), 6) AS cos6
        FROM assigned a JOIN probes p
          ON a.cell = p.cell AND a.vec_id <> p.query_id),
      final AS (
        SELECT query_id, neighbor_id, cos6,
          row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
        round(cos6, 4) AS cosine
      FROM final WHERE rank <= $ATopK ORDER BY query_id, rank"""))

  val all: Seq[Q] = Seq(q55, q56, q59)
}
