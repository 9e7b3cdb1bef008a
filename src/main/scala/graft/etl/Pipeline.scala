package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Spark dataflow for the contact pipeline (reference stage 1,
  * combine_contacts.py:1429-1529, re-expressed as Spark shapes):
  *
  *   normalize   narrow typed map — no shuffle
  *   block+pairs self equi-join on block key — ONE shuffle on the key;
  *               AQE splits skewed blocks (giant surname buckets)
  *   decide      column-free pure predicate per pair — pipelined
  *   components  iterative min-label propagation over the accepted-pair
  *               edge list until fixpoint (O(log n) rounds; edges are
  *               tiny relative to input)
  *   merge       groupByKey(component).mapGroups — ONE shuffle; cluster
  *               sizes are bounded by duplicate multiplicity, so the
  *               per-group fold is O(dups) not O(n)
  *
  * At 100 TB the only quadratic danger is a degenerate block; the
  * blocking-key design (surname) plus AQE skew splitting keeps pair
  * generation proportional to Σb² with small b.
  */
object Pipeline {

  final case class Pair(left: Long, right: Long)
  final case class Edge(src: Long, dst: Long)

  def normalize(contacts: Dataset[Contact],
      settings: ContactLogic.Settings = ContactLogic.Settings()): Dataset[Contact] = {
    import contacts.sparkSession.implicits._
    contacts.map(c => ContactLogic.normalizeRecord(c, settings))
  }

  /** Accepted merge pairs: block, self-join on the blocking key, apply
    * the merge rule. Returns (left row_id, right row_id), left < right.
    *
    * Two scale devices on top of the blocking itself:
    *  1. only slim MatchRec rows go through the shuffle, not full
    *     contacts;
    *  2. a codegen column pre-filter runs before the Scala predicate.
    *     It is a NECESSARY condition for a merge: name-bearing pairs
    *     must align on normalized name / nickname root / email /
    *     linkedin (the decision gate), and nameless pairs need a
    *     corroborating channel overlap — so candidates are the union of
    *     those overlaps, evaluated as arrays_overlap/equality in
    *     Tungsten. The expensive Ratcliff–Obershelp predicate then only
    *     sees pairs that can actually merge, not all O(b²) of them.
    */
  def acceptedPairs(normalized: Dataset[Contact],
      cfg: ContactLogic.DedupeConfig = ContactLogic.DedupeConfig()): Dataset[Edge] = {
    import normalized.sparkSession.implicits._
    val slim = normalized.map(ContactLogic.toMatchRec)
    val a = slim.toDF(slim.columns.map(c => s"a_$c"): _*)
    val b = slim.toDF(slim.columns.map(c => s"b_$c"): _*)
    def overlap(c: String) = arrays_overlap(col(s"a_$c"), col(s"b_$c"))
    // Necessary condition for any merge: pairs where BOTH sides carry a
    // first-name candidate must pass the decision gate (exact-name align
    // OR nickname-root align OR email overlap OR linkedin equality), and
    // pairs where either side is nameless need a corroborating channel
    // overlap. Both cases are subsumed by this disjunction, so filtering
    // on it drops no accepted pair.
    val candidateFilter =
      overlap("normNames") || overlap("nickRoots") ||
        overlap("emails") || overlap("phones") || overlap("addrKeys") ||
        (col("a_linkedin") =!= "" && col("a_linkedin") === col("b_linkedin"))
    val pairs = a.join(b,
        col("a_block") === col("b_block") && col("a_row_id") < col("b_row_id") &&
          candidateFilter)
    pairs.select(struct(slim.columns.map(c => col(s"a_$c").as(c)): _*).as("a"),
        struct(slim.columns.map(c => col(s"b_$c").as(c)): _*).as("b"))
      .as[(ContactLogic.MatchRec, ContactLogic.MatchRec)]
      .filter { case (l, r) => ContactLogic.shouldMerge(l, r, cfg) }
      .map { case (l, r) => Edge(l.row_id, r.row_id) }
  }

  /** Connected components by iterative min-label propagation: every
    * vertex starts as its own component; each round joins labels across
    * edges (both directions) and keeps the minimum; stops at fixpoint.
    * Converges in O(log n) rounds (components here are tiny duplicate
    * clusters, so usually 1-3 rounds). Equivalent to the reference's
    * union-find closure (combine_contacts.py:1132-1146) but distributed.
    */
  def connectedComponents(vertexIds: Dataset[java.lang.Long], edges: Dataset[Edge]): DataFrame = {
    val spark = vertexIds.sparkSession
    import spark.implicits._
    val symmetric = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = vertexIds.toDF("id").withColumn("comp", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var iterations = 0
    while (!converged && iterations < 50) {
      val neighborMin = symmetric.join(labels, symmetric("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.select(col("id"), col("comp"))
        .union(neighborMin)
        .groupBy("id").agg(min("comp").as("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("comp", "old_comp"), "id")
        .where(col("comp") =!= col("old_comp")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iterations += 1
    }
    symmetric.unpersist()
    labels
  }

  /** Full dedupe: normalized contacts (paired with raw originals)
    * → merged contacts + lineage. */
  def dedupeAndMerge(normalized: Dataset[Contact], raw: Dataset[Contact],
      cfg: ContactLogic.DedupeConfig = ContactLogic.DedupeConfig())
      : (Dataset[MergedContact], Dataset[Lineage]) = {
    val spark = normalized.sparkSession
    import spark.implicits._
    val normPersisted = normalized.persist(StorageLevel.MEMORY_AND_DISK)
    val edges = acceptedPairs(normPersisted, cfg)
    val comps = connectedComponents(
      normPersisted.select(col("row_id").as[java.lang.Long]), edges)

    val withComp = normPersisted.joinWith(raw, normPersisted("row_id") === raw("row_id"))
      .toDF("norm", "raw")
      .join(comps, col("norm.row_id") === comps("id"))
      .select(col("comp"), col("norm"), col("raw"))
      .as[(Long, Contact, Contact)]

    val merged = withComp.groupByKey(_._1).mapGroups { (_, it) =>
      val members = it.toSeq.sortBy(_._2.row_id).map(t => (t._2, t._3))
      ContactLogic.mergeCluster(members)
    }
    val mergedPersisted = merged.persist(StorageLevel.MEMORY_AND_DISK)
    val out = mergedPersisted.map(_._1)
    val lineage = mergedPersisted.flatMap(_._2)
    (out, lineage)
  }

  /** Flattened projection (combine_contacts.py:1457-1514): first
    * email/phone with a non-empty, non-"invalid" label per {home, work,
    * other} bucket, first labeled address rendered as "street, city,
    * ST, zip, country". */
  def flatten(merged: Dataset[MergedContact]): DataFrame = {
    import merged.sparkSession.implicits._
    merged.map { m =>
      val validEmails = m.contact.emails.filter(e => e.label.nonEmpty && e.label != "invalid")
      val validPhones = m.contact.phones.filter(p => p.label.nonEmpty && p.label != "invalid")
      val validAddrs = m.contact.addresses.filter(_.label.nonEmpty)
      def firstEmail(label: String): String =
        validEmails.find(_.label == label).map(_.value).getOrElse("")
      def firstPhone(label: String): String =
        validPhones.find(_.label == label)
          .map(p => graft.functions.Phones.withExtension(p.value, p.extension)).getOrElse("")
      def firstAddr(label: String): String =
        validAddrs.find(_.label == label).map(a =>
          Seq(a.street, a.city, a.state, a.postal_code, a.country)
            .filter(_.nonEmpty).mkString(", ")).getOrElse("")
      (m.contact_id, m.contact.full_name, m.contact.company,
        m.contact.department, m.contact.title, m.contact.linkedin_url,
        firstEmail("home"), firstEmail("work"), firstEmail("other"),
        firstPhone("home"), firstPhone("work"), firstPhone("other"),
        firstAddr("home"), firstAddr("work"), firstAddr("other"))
    }.toDF("contact_id", "full_name", "company", "department", "title", "linkedin_url",
      "home_email", "work_email", "other_email",
      "home_phone", "work_phone", "other_phone",
      "home_address", "work_address", "other_address")
  }
}
