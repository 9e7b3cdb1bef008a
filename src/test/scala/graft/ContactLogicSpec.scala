package graft

import graft.etl._
import graft.etl.ContactLogic._
import graft.functions.{Ids, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** Behavior-parity tests mirroring the reference's end-to-end helper
  * suite (tests/test_combine_helpers.py) at the ContactLogic level:
  * merge decisions, cluster merging, label resolution, priority rules.
  */
class ContactLogicSpec extends AnyFunSuite {

  private def c(rowId: Long): Contact = Contact.blank(rowId)

  // ---- merge decision rule -------------------------------------------

  test("nickname equivalence toggles the merge (test_combine_helpers.py:222-253)") {
    val bob = c(0).copy(source = "gmail", first_name = "Bob", last_name = "Smith")
    val robert = c(1).copy(source = "mac_vcf", first_name = "Robert", last_name = "Smith")
    assert(shouldMerge(bob, robert, DedupeConfig(nicknameEquivalence = true)))
    assert(!shouldMerge(bob, robert, DedupeConfig(nicknameEquivalence = false)))
  }

  test("explicit nickname field matches (test_combine_helpers.py:256-283)") {
    val a = c(0).copy(source = "gmail", first_name = "Robert", last_name = "Jones")
    val b = c(1).copy(source = "mac_vcf", first_name = "Bobby",
      nickname = "Robert", last_name = "Jones")
    assert(shouldMerge(a, b, DedupeConfig()))
  }

  test("household guard: shared address + last name, different people stay separate (test_combine_helpers.py:286-327)") {
    val addr = AddressEntry("", "", "12 Oak St", "Quincy", "MA", "02169", "US", "home")
    val alice = c(0).copy(source = "gmail", first_name = "Alice",
      last_name = "Doe", addresses = Seq(addr))
    val john = c(1).copy(source = "gmail", first_name = "John",
      last_name = "Doe", addresses = Seq(addr))
    // score = 0.7·sim + 0.5 addr < 1.2 and the name-align gate fails.
    assert(!shouldMerge(alice, john, DedupeConfig()))
  }

  test("email overlap merges despite different names") {
    val a = c(0).copy(source = "gmail", first_name = "Katherine", last_name = "Lee",
      emails = Seq(EmailEntry("kl@example.com", "home")))
    val b = c(1).copy(source = "gmail", first_name = "Kate", last_name = "Lee",
      emails = Seq(EmailEntry("kl@example.com", "work")))
    assert(shouldMerge(a, b, DedupeConfig()))
  }

  test("linkedin-source pairs need exact last+first+generational-suffix unless emails overlap (combine_contacts.py:1189-1204)") {
    // Same name but differing generational suffix: the relaxed path
    // accepts, then the strict LinkedIn-source gate rejects.
    val li = c(0).copy(source = "linkedin", first_name = "Jon", last_name = "Snow",
      suffix = "Jr")
    val vcf = c(1).copy(source = "mac_vcf", first_name = "Jon", last_name = "Snow")
    assert(!shouldMerge(li, vcf, DedupeConfig()))
    // Identical pair from non-LinkedIn sources merges fine.
    assert(shouldMerge(vcf.copy(row_id = 2, suffix = "Jr"),
      li.copy(row_id = 3, source = "gmail"), DedupeConfig()))
    // An email overlap bypasses the strict gate.
    val liWithEmail = li.copy(emails = Seq(EmailEntry("js@x.com", "work")))
    val vcfWithEmail = vcf.copy(emails = Seq(EmailEntry("js@x.com", "home")))
    assert(shouldMerge(liWithEmail, vcfWithEmail, DedupeConfig()))
    // Jon/Jonathan resolve to the same nickname root → equivalent.
    val jonathan = c(4).copy(source = "mac_vcf", first_name = "Jonathan",
      last_name = "Snow", suffix = "Jr")
    assert(shouldMerge(li, jonathan, DedupeConfig()))
  }

  test("nameless records require a corroborator, email alone scores below 1.2 (combine_contacts.py:1166-1173)") {
    // Nameless + named sharing email AND phone: score 2.0 ≥ 1.2 → merge.
    val nameless = c(0).copy(source = "gmail",
      emails = Seq(EmailEntry("x@y.com", "home")),
      phones = Seq(PhoneEntry("+16175550100", "", "")))
    val named = c(1).copy(source = "gmail", first_name = "Ann", last_name = "Yu",
      emails = Seq(EmailEntry("x@y.com", "home")),
      phones = Seq(PhoneEntry("+16175550100", "mobile", "")))
    assert(shouldMerge(nameless, named, DedupeConfig()))
    // Only the email in common: score 1.0 < 1.2 and firstSim 0 → reject.
    val emailOnly = nameless.copy(row_id = 2, phones = Nil)
    assert(!shouldMerge(emailOnly, named, DedupeConfig()))
    // No channel at all → no corroborator → reject.
    val namelessNoChannel = c(3).copy(source = "gmail", full_name = "Ann Yu")
    assert(!shouldMerge(namelessNoChannel, named, DedupeConfig()))
  }

  test("suffix contributes 0.1 only when left suffix truthy and equal (merge.py:53-54, SURVEY §2.9.7)") {
    val a = c(0).copy(first_name = "Al", last_name = "Ho", suffix = "Jr")
    val b = c(1).copy(first_name = "Al", last_name = "Ho", suffix = "jr")
    val noSuffix = c(2).copy(first_name = "Al", last_name = "Ho")
    val sWith = computeSignals(a, b)
    val sLeftBlank = computeSignals(noSuffix, a)
    assert(math.abs(sWith.score - sLeftBlank.score - 0.1) < 1e-9)
  }

  // ---- blocking -------------------------------------------------------

  test("block key fallback chain (combine_contacts.py:1116-1129)") {
    assert(blockKey(c(0).copy(last_name = "Van Dyke")) == "van dyke")
    assert(blockKey(c(1).copy(full_name = "Cher")) == "cher")
    assert(blockKey(c(2).copy(emails = Seq(EmailEntry("a@b.com", "")))) == "a@b.com")
    assert(blockKey(c(3).copy(phones = Seq(PhoneEntry("+1617", "", "")))) == "+1617")
    assert(blockKey(c(7)) == "__blank_7")
  }

  // ---- cluster merge --------------------------------------------------

  private def pair(x: Contact): (Contact, Contact) = (x, x)

  test("linkedin metadata priority beats gmail (test_combine_helpers.py:330-373)") {
    val gm = c(0).copy(source = "gmail", first_name = "Ada", last_name = "Byron",
      company = "Gmail Corp", title = "Old Title")
    val li = c(1).copy(source = "linkedin", first_name = "Ada", last_name = "Byron",
      company = "Analytical Engines", title = "Countess of Computing")
    val (merged, _) = mergeCluster(Seq(pair(gm), pair(li)))
    assert(merged.contact.company == "Analytical Engines")
    assert(merged.contact.title == "Countess of Computing")
  }

  test("newer timestamp beats source priority (test_combine_helpers.py:447-484)") {
    val li = c(0).copy(source = "linkedin", first_name = "Ada", last_name = "Byron",
      company = "Old Co", source_timestamp = "2020-01-01")
    val gm = c(1).copy(source = "gmail", first_name = "Ada", last_name = "Byron",
      company = "New Co", source_timestamp = "2024-06-01")
    val (merged, _) = mergeCluster(Seq(pair(li), pair(gm)))
    assert(merged.contact.company == "New Co")
  }

  test("label preference: work replaces other, not vice versa (test_combine_helpers.py:376-413)") {
    val withOther = c(0).copy(source = "gmail", first_name = "Bo", last_name = "Xi",
      emails = Seq(EmailEntry("bo@x.com", "other")))
    val withWork = c(1).copy(source = "gmail", first_name = "Bo", last_name = "Xi",
      emails = Seq(EmailEntry("bo@x.com", "work")))
    val (merged, _) = mergeCluster(Seq(pair(withOther), pair(withWork)))
    assert(merged.contact.emails == Seq(EmailEntry("bo@x.com", "work")))
    val (merged2, _) = mergeCluster(Seq(pair(withWork), pair(withOther)))
    assert(merged2.contact.emails == Seq(EmailEntry("bo@x.com", "work")))
  }

  test("empty labels default to other in merged output (test_combine_helpers.py:416-444)") {
    val x = c(0).copy(source = "gmail", first_name = "Cy", last_name = "Young",
      emails = Seq(EmailEntry("cy@x.com", "")),
      phones = Seq(PhoneEntry("+16175550123", "", "")))
    val (merged, _) = mergeCluster(Seq(pair(x)))
    assert(merged.contact.emails.head.label == "other")
    assert(merged.contact.phones.head.label == "other")
  }

  test("channel union dedupes by value and sorts output (combine_contacts.py:1359,1371)") {
    val a = c(0).copy(source = "gmail", first_name = "Di", last_name = "Zhu",
      emails = Seq(EmailEntry("z@x.com", "home"), EmailEntry("a@x.com", "work")))
    val b = c(1).copy(source = "mac_vcf", first_name = "Di", last_name = "Zhu",
      emails = Seq(EmailEntry("z@x.com", "home")))
    val (merged, _) = mergeCluster(Seq(pair(a), pair(b)))
    assert(merged.contact.emails.map(_.value) == Seq("a@x.com", "z@x.com"))
  }

  test("lineage: one row per source record, shared contact_id (combine_contacts.py:1377-1405)") {
    val a = c(0).copy(source = "gmail", source_row_id = "0",
      first_name = "Ed", last_name = "Wu", emails = Seq(EmailEntry("e@x.com", "home")))
    val b = c(1).copy(source = "linkedin", source_row_id = "4",
      first_name = "Ed", last_name = "Wu")
    val (merged, lineage) = mergeCluster(Seq(pair(a), pair(b)))
    assert(lineage.size == 2)
    assert(lineage.forall(_.contact_id == merged.contact_id))
    assert(merged.source_count == 2 && merged.source_row_count == 2)
  }

  test("contact_id is deterministic UUIDv5 (common.py:72-74, SURVEY §2.9.8)") {
    val a = c(0).copy(source = "gmail", source_row_id = "0",
      first_name = "Fay", last_name = "Ng", emails = Seq(EmailEntry("f@x.com", "home")))
    val (m1, _) = mergeCluster(Seq(pair(a)))
    val (m2, _) = mergeCluster(Seq(pair(a)))
    assert(m1.contact_id == m2.contact_id)
    assert(m1.contact_id.matches("[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
    assert(Ids.uuid5("hello") == Ids.uuid5("hello"))
    assert(Ids.uuid5("hello") != Ids.uuid5("hellp"))
  }

  // ---- collection normalization --------------------------------------

  test("email dedupe keeps first occurrence, upgrades empty label (test_combine_helpers.py:487-502)") {
    val (out, invalid) = normalizeEmails(
      Seq(EmailEntry("A@B.com", ""), EmailEntry("a@b.com", "work"),
        EmailEntry("bad", "home")),
      dropInvalid = false)
    assert(out.exists(e => e.value == "a@b.com" && e.label == "work"))
    assert(out.exists(e => e.value == "bad" && e.label == "invalid"))
    assert(invalid == Seq("bad"))
  }

  test("address dedupe keyed on fields-except-label keeps first label (test_combine_helpers.py:536-570)") {
    val a1 = AddressEntry("", "", "1 Elm St", "Boston", "MA", "02108", "US", "home")
    val a2 = a1.copy(label = "work")
    val out = normalizeAddresses(Seq(a1, a2))
    assert(out.size == 1 && out.head.label == "home")
  }

  test("phone normalization: failures recorded as non-standard, kept with invalid label (normalization.py:573-617)") {
    val (out, nonStd) = normalizePhones(
      Seq(PhoneEntry("(617) 555-0100", "mobile", ""), PhoneEntry("12", "", "")),
      dropInvalid = false)
    assert(out.exists(p => p.value == "+16175550100" && p.label == "mobile"))
    assert(out.exists(_.label == "invalid"))
    assert(nonStd.nonEmpty)
  }

  // ---- rank / label helpers ------------------------------------------

  test("rankIsBetter: timestamp dominates priority (combine_contacts.py:243-261)") {
    assert(rankIsBetter((Some(200L), 1), (Some(100L), 3)))
    assert(!rankIsBetter((Some(100L), 3), (Some(200L), 1)))
    assert(rankIsBetter((Some(1L), 0), (None, 3)))
    assert(rankIsBetter((None, 3), (None, 1)))
    assert(!rankIsBetter((None, 1), (None, 1)))
  }

  test("nickname table roots (normalization.py:697-735)") {
    assert(Similarity.nicknameEquivalent("Bob", "Robert"))
    assert(Similarity.nicknameEquivalent("Liz", "Elizabeth"))
    assert(!Similarity.nicknameEquivalent("Bob", "William"))
    assert(Similarity.nicknameEquivalent("BILL", "william"))
  }
}
