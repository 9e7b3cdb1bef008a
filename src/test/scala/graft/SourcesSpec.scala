package graft

import graft.etl.{EmailEntry, PhoneEntry}
import graft.sources.{Channels, Csv, GmailAddress, Sources}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source-reader parity tests mirroring the reference loader suite
  * (tests/test_combine_helpers.py:32-92,174-187,505-533) with the same
  * fixtures, plus parser unit coverage.
  */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpFile(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-sources")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("csv header sniff skips preamble (test_combine_helpers.py:32-46)") {
    val content = Seq(
      "noise line 1", "noise line 2",
      "First Name,Last Name,URL",
      "John,Doe,https://linkedin.com/in/jdoe", "").mkString("\n")
    val t = Csv.table(content, Some("First Name,Last Name,URL"))
    assert(t.get(t.rows.head, "First Name") == "John")
  }

  test("csv parser: quoted commas, doubled quotes, embedded newlines") {
    val t = Csv.table("a,b,c\n\"x,1\",\"say \"\"hi\"\"\",\"two\nlines\"")
    assert(t.rows.head == Vector("x,1", "say \"hi\"", "two\nlines"))
  }

  test("linkedin reader: URL filter, Connected On parse, row ids (combine_contacts.py:295-322)") {
    val path = tmpFile("lin.csv", Seq(
      "Notes:", "\"Some preamble\"",
      "First Name,Last Name,URL,Email Address,Company,Position,Connected On",
      "John,Doe,https://www.linkedin.com/in/jdoe,,Acme,Engineer,04 Sep 2021",
      "Jane,Roe,https://example.com/nope,jane@x.com,Beta,Manager,2020-01-15",
      "").mkString("\n"))
    val rows = Sources.linkedin(spark, path).collect().sortBy(_.source_row_id)
    assert(rows.map(_.source_row_id).toSeq == Seq("0", "1"))
    assert(rows(0).linkedin_url == "https://www.linkedin.com/in/jdoe")
    assert(rows(0).source_timestamp == "2021-09-04T00:00")
    assert(rows(1).linkedin_url == "") // non-linkedin URL dropped
    assert(rows(1).emails == Seq(EmailEntry("jane@x.com", "home")))
    assert(rows(1).source_timestamp == "2020-01-15T00:00")
    assert(rows.forall(_.source == "linkedin"))
  }

  test("vcf reader assigns row ids in file order (test_combine_helpers.py:55-74)") {
    val path = tmpFile("t.vcf", Seq(
      "BEGIN:VCARD", "VERSION:3.0", "FN:John Doe", "N:Doe;John;;;", "END:VCARD",
      "BEGIN:VCARD", "VERSION:3.0", "FN:Jane Smith", "N:Smith;Jane;;;", "END:VCARD",
      "").mkString("\n"))
    val rows = Sources.vcards(spark, path).collect().sortBy(_.source_row_id)
    assert(rows.map(_.source_row_id).toSeq == Seq("0", "1"))
    assert(rows(0).full_name_raw == "John Doe" && rows(0).last_name == "Doe")
  }

  test("vcf reader captures NICKNAME (test_combine_helpers.py:77-92)") {
    val path = tmpFile("n.vcf", Seq(
      "BEGIN:VCARD", "VERSION:3.0", "FN:John Doe", "N:Doe;John;;;",
      "NICKNAME:Johnny", "END:VCARD", "").mkString("\n"))
    assert(Sources.vcards(spark, path).collect().head.nickname == "Johnny")
  }

  test("vcf reader filters TYPE=pref/INTERNET (test_combine_helpers.py:505-533)") {
    val path = tmpFile("l.vcf", Seq(
      "BEGIN:VCARD", "VERSION:3.0", "FN:Casey Example", "N:Example;Casey;;;",
      "EMAIL;TYPE=INTERNET;TYPE=WORK;TYPE=pref:casey.work@example.com",
      "EMAIL;TYPE=INTERNET:casey.other@example.com",
      "TEL;TYPE=CELL;TYPE=pref:+1-555-000-0003",
      "TEL;TYPE=VOICE:+1-555-000-0004",
      "END:VCARD", "").mkString("\n"))
    val entry = Sources.vcards(spark, path).collect().head
    assert(entry.emails == Seq(
      EmailEntry("casey.work@example.com", "work"),
      EmailEntry("casey.other@example.com", "other")))
    assert(entry.phones == Seq(
      PhoneEntry("+1-555-000-0003", "cell", ""),
      PhoneEntry("+1-555-000-0004", "voice", "")))
  }

  test("vcf reader: Apple item labels and NOTE-clobbers-lastname quirk") {
    val path = tmpFile("a.vcf", Seq(
      "BEGIN:VCARD", "VERSION:3.0", "FN:Ann Yu", "N:Yu;Ann;;;",
      "item1.X-ABLABEL:_$!<Home>!$_",
      "item1.EMAIL:a@x.com",
      "item2.EMAIL:b@x.com",
      "item2.X-ABLABEL:_$!<Work>!$_",
      "NOTE:met at tai chi",
      "END:VCARD", "").mkString("\n"))
    val entry = Sources.vcards(spark, path).collect().head
    // Sequential-state parity: item1's label precedes its EMAIL so it
    // applies; item2's label FOLLOWS its EMAIL so (like the reference)
    // the email falls back to "other".
    assert(entry.emails == Seq(
      EmailEntry("a@x.com", "home"), EmailEntry("b@x.com", "other")))
    // Reference quirk: "NOTE" falls into the N branch (starts with N),
    // so note text lands in last_name and notes stays empty.
    assert(entry.last_name == "met at tai chi")
    assert(entry.notes == "")
  }

  test("gmail reader: column groups, ::: multi-values, nickname (test_combine_helpers.py:174-187)") {
    val path = tmpFile("g.csv", Seq(
      "First Name,Last Name,Nickname,Organization Name,E-mail 1 - Value,E-mail 1 - Label,E-mail 2 - Value,E-mail 2 - Label,Phone 1 - Value,Phone 1 - Label,Notes",
      "\"Robert\",\"Jones\",\"Bob\",\"Acme\",\"bob@x.com ::: robert@x.com\",\"* Work\",\"old@x.com\",\"Home\",\"+1 (617) 555-0100 x12\",\"Mobile\",\"hi\"",
      "").mkString("\n"))
    val entry = Sources.gmail(spark, path).collect().head
    assert(entry.nickname == "Bob")
    assert(entry.emails == Seq(
      EmailEntry("bob@x.com", "work"), EmailEntry("robert@x.com", "work"),
      EmailEntry("old@x.com", "home")))
    assert(entry.phones == Seq(PhoneEntry("+1 (617) 555-0100", "mobile", "12")))
    assert(entry.notes == "hi" && entry.company == "Acme")
    assert(entry.full_name_raw == "Robert Jones")
  }

  test("gmail address slot-filling: multi-line street classified into slots (combine_contacts.py:709-812)") {
    val c = GmailAddress.prepare(GmailAddress.Components(
      "", "", "12 Oak St\nApt 4\nQuincy, MA 02169", "", "", "", ""))
    assert(c.street == "12 Oak St, Apt 4")
    assert(c.city == "Quincy")
    assert(c.state == "MA")
    assert(c.postal_code == "02169")
  }

  test("channel helpers: phone extension strip and orphan merge (combine_contacts.py:488-522)") {
    assert(Channels.stripPhoneExtension("617-555-0100;12") == ("617-555-0100", "12"))
    assert(Channels.stripPhoneExtension("617-555-0100 ext 34") == ("617-555-0100", "34"))
    assert(Channels.stripPhoneExtension("617-555-0100p56#") == ("617-555-0100", "56"))
    assert(Channels.stripPhoneExtension("617-555-0100") == ("617-555-0100", ""))
    assert(Channels.mergePhoneExtensions(Seq(("617", ""), ("x22", ""))) == Seq(("617", "22")))
  }

  test("loadAll unions three sources; missing paths degrade to empty (normalization.py:372-376)") {
    val vcf = tmpFile("u.vcf", Seq(
      "BEGIN:VCARD", "VERSION:3.0", "FN:Solo Person", "N:Person;Solo;;;",
      "END:VCARD", "").mkString("\n"))
    val all = Sources.loadAll(spark, "/nonexistent/lin.csv", "/nonexistent/g.csv", vcf)
    val rows = all.collect()
    assert(rows.length == 1 && rows.head.source == "mac_vcf")
    assert(rows.head.row_id == Sources.VcfRowBase)
  }
}
