package graft

import graft.etl.Tag
import graft.sources.Sources
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Notes re-read + lineage merge, mirroring the reference's
  * notes-merge end-to-end test (tests/test_combine_helpers.py:95-171,
  * tag_contacts.py:34-107).
  */
class NotesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-notes")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("gmail/vcf notes loaders index every record, emit only noted ones") {
    val gmail = tmp("g.csv", Seq(
      "First Name,Notes",
      "A,hello from gmail",
      "B,",
      "C,third note", "").mkString("\n"))
    val g = Sources.gmailNotes(spark, gmail).collect()
      .map(r => (r.getString(1), r.getString(2))).toMap
    assert(g == Map("0" -> "hello from gmail", "2" -> "third note"))

    val vcf = tmp("v.vcf", Seq(
      "BEGIN:VCARD", "FN:One", "END:VCARD",
      "BEGIN:VCARD", "FN:Two", "NOTE:met at tai chi", "END:VCARD",
      "BEGIN:VCARD", "FN:Three", "END:VCARD", "").mkString("\n"))
    val v = Sources.vcfNotes(spark, vcf).collect()
      .map(r => (r.getString(1), r.getString(2))).toMap
    assert(v == Map("1" -> "met at tai chi"))
  }

  test("notes column absent -> empty result (tag_contacts.py:41-43)") {
    val gmail = tmp("g2.csv", "First Name,Last Name\nA,B\n")
    assert(Sources.gmailNotes(spark, gmail).count() == 0)
  }

  test("notesBlob joins lineage to notes and concatenates in source order") {
    import spark.implicits._
    val lineage = Seq(
      ("c1", "gmail", "0"), ("c1", "mac_vcf", "1"), ("c1", "linkedin", "5"),
      ("c2", "gmail", "1"), ("c3", "mac_vcf", "9")).toDF("contact_id", "source", "source_row_id")
    val notes = Seq(
      ("gmail", "0", "g-note"), ("mac_vcf", "1", "v-note"),
      ("gmail", "1", "other")).toDF("source", "source_row_id", "note")
    val got = Tag.notesBlob(lineage, notes).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // c1: gmail (rank 1) before mac_vcf (rank 2); linkedin row has no note.
    assert(got == Map("c1" -> "g-note | v-note", "c2" -> "other"))
  }
}
