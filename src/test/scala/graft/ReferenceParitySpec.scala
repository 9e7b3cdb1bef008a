package graft

import graft.etl.{Artifacts, Pipeline}
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Golden-file differential parity with the reference implementation.
  *
  * The fixture exports under src/test/resources/difftest were run
  * through the actual reference pipeline
  * (`python -m contacts_etl.combine_contacts`, fallback paths — no
  * email_validator/phonenumbers) and its three artifacts captured as
  * goldens. This spec runs OUR full pipeline (Sources → normalize →
  * dedupeAndMerge → Artifacts) over the same files and asserts
  * cell-for-cell equality on every golden column — including the
  * UUIDv5 contact_ids, which hash the complete merge key material
  * (names, company, title, sorted channels, lineage keys), so an
  * equality here certifies end-to-end behavioral parity of
  * normalization, merge decisions, channel unions and rendering.
  */
class ReferenceParitySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def res(name: String): String =
    Paths.get(getClass.getResource(s"/difftest/$name").toURI).toString

  /** Minimal RFC-4180 row parser for the golden CSVs (reuses the
    * production parser). */
  private def golden(name: String): (Vector[String], Seq[Map[String, String]]) = {
    val t = graft.sources.Csv.table(Files.readString(Paths.get(res(name))))
    (t.header, t.rows.map(r => t.header.zip(r).toMap))
  }

  private def collectRows(df: DataFrame): Seq[Map[String, String]] = {
    val cols = df.columns
    df.collect().map(r => cols.zipWithIndex.map { case (c, i) =>
      c -> Option(r.get(i)).map(_.toString).getOrElse("") }.toMap).toSeq
  }

  private lazy val artifacts: (Seq[Map[String, String]], Seq[Map[String, String]], Seq[Map[String, String]]) = {
    val raw = Sources.loadAll(spark, res("linkedin.csv"), res("gmail.csv"), res("contacts.vcf"))
    val normalized = Pipeline.normalize(raw)
    val (merged, lineage) = Pipeline.dedupeAndMerge(normalized, raw)
    (collectRows(Artifacts.consolidatedContacts(merged)),
      collectRows(Artifacts.consolidatedLineage(lineage)),
      collectRows(Artifacts.flattenedContacts(merged)))
  }

  private def assertParity(name: String, ours: Seq[Map[String, String]],
      sortKeys: Seq[String]): Unit = {
    val (goldenHeader, goldenRows) = golden(name)
    val key = (m: Map[String, String]) => sortKeys.map(m.getOrElse(_, "")).mkString("")
    val g = goldenRows.sortBy(key)
    val o = ours.sortBy(key)
    assert(o.size == g.size, s"$name: row count ${o.size} vs golden ${g.size}")
    for (((gr, or), idx) <- g.zip(o).zipWithIndex; c <- goldenHeader) {
      assert(or.getOrElse(c, "") == gr(c),
        s"$name row $idx col $c: ours=${or.getOrElse(c, "")} golden=${gr(c)}")
    }
  }

  /** Second corpus: name-grammar stress (parenthesized nicknames,
    * professional suffixes, hyphenated/apostrophe surnames, surname
    * particles), `:::` address variants, phone extensions in `;NN`,
    * `ext N` and `pNN#` forms — including the reference's
    * vCard-escape-order quirk (trailing backslash in a name). */
  private lazy val artifacts2: (Seq[Map[String, String]], Seq[Map[String, String]], Seq[Map[String, String]]) = {
    val raw = Sources.loadAll(spark, res("lin2.csv"), res("gmail2.csv"), res("vcf2.vcf"))
    val normalized = Pipeline.normalize(raw)
    val (merged, lineage) = Pipeline.dedupeAndMerge(normalized, raw)
    (collectRows(Artifacts.consolidatedContacts(merged)),
      collectRows(Artifacts.consolidatedLineage(lineage)),
      collectRows(Artifacts.flattenedContacts(merged)))
  }

  /** Third corpus (round 4): combining-mark-only given names ("́",
    * "̂") — the reference's parser normalizes these into namelessness,
    * so the two rows must NOT merge (nameless pairs need a
    * corroborator; the phones differ). Captured from a real reference
    * run; certifies the engine's behavior on the degenerate-name path
    * end-to-end, not just against the Scala merge-rule model. */
  private lazy val artifacts3: (Seq[Map[String, String]], Seq[Map[String, String]], Seq[Map[String, String]]) = {
    val raw = Sources.loadAll(spark, "", res("gmail3.csv"), "")
    val normalized = Pipeline.normalize(raw)
    val (merged, lineage) = Pipeline.dedupeAndMerge(normalized, raw)
    (collectRows(Artifacts.consolidatedContacts(merged)),
      collectRows(Artifacts.consolidatedLineage(lineage)),
      collectRows(Artifacts.flattenedContacts(merged)))
  }

  test("corpus 3 (combining-mark names): consolidated/lineage/flattened parity") {
    assertParity("golden3_consolidated_contacts.csv", artifacts3._1, Seq("contact_id"))
    assertParity("golden3_consolidated_lineage.csv", artifacts3._2,
      Seq("contact_id", "source", "source_row_id"))
    assertParity("golden3_flattened_contacts.csv", artifacts3._3, Seq("contact_id"))
  }

  test("consolidated_contacts matches the reference byte-for-byte (incl. contact_ids)") {
    assertParity("golden_consolidated_contacts.csv", artifacts._1, Seq("contact_id"))
  }

  test("consolidated_lineage matches the reference") {
    assertParity("golden_consolidated_lineage.csv", artifacts._2,
      Seq("contact_id", "source", "source_row_id"))
  }

  test("flattened_contacts matches the reference") {
    assertParity("golden_flattened_contacts.csv", artifacts._3, Seq("contact_id"))
  }

  test("corpus 2 (name grammar / variants / extensions): consolidated_contacts parity") {
    assertParity("golden2_consolidated_contacts.csv", artifacts2._1, Seq("contact_id"))
  }

  test("corpus 2: lineage parity") {
    assertParity("golden2_consolidated_lineage.csv", artifacts2._2,
      Seq("contact_id", "source", "source_row_id"))
  }

  test("corpus 2: flattened parity") {
    assertParity("golden2_flattened_contacts.csv", artifacts2._3, Seq("contact_id"))
  }

  // ---- stages 2-4 over the CSV interchange format --------------------
  // The stage goldens were produced by running the reference's
  // contacts-validate / contacts-confidence / contacts-tag CLIs on the
  // golden consolidate artifacts, so these tests isolate stage-2-4
  // parity (CSV re-parse, metric counters, detail-JSON rendering,
  // confidence arithmetic, tagging, referral priority) from the
  // consolidate stage already covered above.

  private def stageOutputs(prefix: String, gmail: String, vcf: String) = {
    import graft.etl.Stages
    val contacts = Stages.readArtifactCsv(spark,
      res(s"${prefix}consolidated_contacts.csv"))
    val lineageDf = Stages.readArtifactCsv(spark,
      res(s"${prefix}consolidated_lineage.csv"))
    val flattened = Stages.readArtifactCsv(spark,
      res(s"${prefix}flattened_contacts.csv"))
    val (report, scored) = Stages.validate(contacts, flattened)
    val (confReport, confSummary) = Stages.confidence(contacts, report, flattened)
    val notes = Sources.gmailNotes(spark, res(gmail))
      .unionByName(Sources.vcfNotes(spark, res(vcf)))
    val (tagged, _) = Stages.tag(contacts, lineageDf, notes, confReport)
    (report, scored, confReport, confSummary, tagged)
  }

  private lazy val stages1 = stageOutputs("golden_", "gmail.csv", "contacts.vcf")
  private lazy val stages2 = stageOutputs("golden2_", "gmail2.csv", "vcf2.vcf")

  test("stage 2 validate: validation_report + contact_quality_scored parity") {
    assertParity("golden_validation_report.csv", collectRows(stages1._1), Seq("contact_id"))
    assertParity("golden_contact_quality_scored.csv", collectRows(stages1._2), Seq("contact_id"))
  }

  test("stage 3 confidence: report + summary parity") {
    assertParity("golden_confidence_report.csv", collectRows(stages1._3), Seq("contact_id"))
    assertParity("golden_confidence_summary.csv", collectRows(stages1._4), Seq("bucket"))
  }

  test("stage 4 tag: tagged_contacts parity (referral_targets = same rows resorted)") {
    assertParity("golden_tagged_contacts.csv", collectRows(stages1._5), Seq("contact_id"))
    assertParity("golden_referral_targets.csv", collectRows(stages1._5), Seq("contact_id"))
  }

  test("corpus 2: stage 2-4 parity") {
    assertParity("golden2_validation_report.csv", collectRows(stages2._1), Seq("contact_id"))
    assertParity("golden2_contact_quality_scored.csv", collectRows(stages2._2), Seq("contact_id"))
    assertParity("golden2_confidence_report.csv", collectRows(stages2._3), Seq("contact_id"))
    assertParity("golden2_confidence_summary.csv", collectRows(stages2._4), Seq("bucket"))
    assertParity("golden2_tagged_contacts.csv", collectRows(stages2._5), Seq("contact_id"))
  }
}
