package graft.etl

/** Canonical contact record (reference: models.py:78-178). All scalar
  * fields are non-null strings ("" = absent) mirroring the reference's
  * CSV-boundary discipline (SURVEY.md §2.9.1); channels are typed
  * arrays, and the invalid side-channels are explicit columns rather
  * than an untyped extras map (SURVEY.md §1.2).
  */
final case class EmailEntry(value: String, label: String)

final case class PhoneEntry(value: String, label: String, extension: String)

final case class AddressEntry(
    po_box: String, extended: String, street: String, city: String,
    state: String, postal_code: String, country: String, label: String)

final case class Contact(
    row_id: Long,
    source: String,
    source_row_id: String,
    source_timestamp: String,
    full_name_raw: String,
    full_name: String,
    prefix: String,
    first_name: String,
    middle_name: String,
    last_name: String,
    maiden_name: String,
    suffix: String,
    suffix_professional: String,
    nickname: String,
    company: String,
    title: String,
    department: String,
    linkedin_url: String,
    notes: String,
    emails: Seq[EmailEntry],
    phones: Seq[PhoneEntry],
    addresses: Seq[AddressEntry],
    invalid_emails: Seq[String],
    non_standard_phones: Seq[String])

object Contact {
  def blank(rowId: Long): Contact = Contact(
    row_id = rowId, source = "", source_row_id = "", source_timestamp = "",
    full_name_raw = "", full_name = "", prefix = "", first_name = "",
    middle_name = "", last_name = "", maiden_name = "", suffix = "",
    suffix_professional = "", nickname = "", company = "", title = "",
    department = "", linkedin_url = "", notes = "",
    emails = Nil, phones = Nil, addresses = Nil,
    invalid_emails = Nil, non_standard_phones = Nil)
}

/** Merged output record: a contact plus merge-derived metadata. */
final case class MergedContact(
    contact_id: String,
    contact: Contact,
    addresses_json: String,
    source_count: Int,
    source_row_count: Int,
    invalid_emails: Seq[String],
    non_standard_phones: Seq[String])

/** One lineage row per source record (reference models.py:181-210). */
final case class Lineage(
    contact_id: String,
    source: String,
    source_row_id: String,
    source_full_name: String,
    source_prefix: String,
    source_company: String,
    source_title: String,
    source_emails: String,
    source_phones: String,
    source_addresses_json: String,
    source_emails_raw: String,
    source_phones_raw: String)
