package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q105's incremental-equals-batch contract for CLUSTER state:
  * merging the gate's accepted match edges into a standing component
  * assignment (DedupOps.mergeComponents) must produce exactly the
  * partition a from-scratch closure over standing ∪ batch computes.
  * The registered oracle re-proves that cross-engine every round; this
  * spec pins the branches the sf corpora don't reach — above all the
  * BRIDGE case (one new doc merging two standing components), which
  * is the reason the operator exists — plus the same-engine replay on
  * real data. */
class ClusterMergeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def standing(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "comp")
  }

  private def edges(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("src", "dst")
  }

  /** The merged assignment as a canonical partition: set of member
    * sets (labels are internal — only the grouping is the contract). */
  private def partition(df: org.apache.spark.sql.DataFrame): Set[Set[Long]] =
    df.collect().map(r => r.getLong(1) -> r.getLong(0))
      .groupBy(_._1).values.map(_.map(_._2).toSet).toSet

  /** Reference partition: local union-find over star edges of the
    * standing assignment plus the batch edges. */
  private def reference(st: Seq[(Long, Long)], es: Seq[(Long, Long)]): Set[Set[Long]] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    st.foreach { case (id, c) => union(id, c) }
    es.foreach { case (a, b) => union(a, b) }
    val ids = (st.map(_._1) ++ st.map(_._2) ++ es.map(_._1) ++ es.map(_._2)).distinct
    ids.groupBy(find).values.map(_.toSet).toSet
  }

  private def check(st: Seq[(Long, Long)], es: Seq[(Long, Long)]): Unit = {
    val got = partition(queries.DedupOps.mergeComponents(
      standing(st: _*), edges(es: _*)))
    assert(got == reference(st, es))
  }

  test("bridge: one incoming doc merges two standing components") {
    // comps {1,2,3} labeled 1 and {10,11} labeled 10; doc 100 matches
    // members of both -> single component of all six.
    val st = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
    val es = Seq((100L, 2L), (100L, 11L))
    check(st, es)
    assert(reference(st, es) == Set(Set(1L, 2L, 3L, 10L, 11L, 100L)))
  }

  test("attach without bridge: untouched component keeps its members") {
    val st = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
    val es = Seq((100L, 2L)) // touches comp 1 only
    check(st, es)
    assert(reference(st, es) == Set(Set(1L, 2L, 100L), Set(10L, 11L)))
  }

  test("edge inside one standing component is a no-op") {
    val st = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
    check(st, Seq((2L, 3L)))
    assert(reference(st, Seq((2L, 3L))) == Set(Set(1L, 2L, 3L), Set(10L, 11L)))
  }

  test("new-only edges form a new component; unpaired index doc attaches") {
    // 200-201 are both new; 300 is an index doc with no standing pair
    // (absent from the assignment), matched by new doc 400.
    val st = Seq((1L, 1L), (2L, 1L))
    val es = Seq((200L, 201L), (400L, 300L))
    check(st, es)
    assert(reference(st, es) ==
      Set(Set(1L, 2L), Set(200L, 201L), Set(300L, 400L)))
  }

  test("chained bridges merge transitively through several batch docs") {
    val st = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L))
    val es = Seq((100L, 2L), (100L, 11L), (101L, 10L), (101L, 21L))
    check(st, es)
    assert(reference(st, es) ==
      Set(Set(1L, 2L, 10L, 11L, 20L, 21L, 100L, 101L)))
  }

  test("reflexive batch edge: new vertex survives as a singleton (r11 ADVICE)") {
    // 500's only edge is a self-loop: the contracted graph never sees
    // it (src =!= dst filter), so before the left-join fix it vanished
    // from the output where a from-scratch closure emits it as a
    // singleton. A standing vertex's self-loop stays a plain no-op.
    val st = Seq((1L, 1L), (2L, 1L))
    val es = Seq((500L, 500L), (100L, 2L), (2L, 2L))
    check(st, es)
    assert(reference(st, es) == Set(Set(1L, 2L, 100L), Set(500L)))
  }

  test("sf0.001 replay: merged equals from-scratch closure over the same relations") {
    val s = spark
    import s.implicits._
    val (st, ms) = queries.DedupOps.q105Relations(spark, "/root/testdata/sf0.001")
    val stRows = st.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val msRows = ms.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(msRows.nonEmpty, "replay must be non-vacuous: the gate matched docs")
    val got = partition(queries.DedupOps.mergeComponents(
      standing(stRows: _*), edges(msRows: _*)))
    assert(got == reference(stRows, msRows))
    Scratch.releaseAll()
  }
}
