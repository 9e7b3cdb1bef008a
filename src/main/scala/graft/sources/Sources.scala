package graft.sources

import graft.etl.{AddressEntry, Contact, EmailEntry, PhoneEntry}
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.mutable

/** Multi-format contact ingestion: LinkedIn CSV (preamble-tolerant),
  * Gmail CSV (N-indexed wide column groups), macOS Contacts vCard 3.0.
  * Reference: combine_contacts.py:295-1104.
  *
  * Execution shape: one export file = one task. `wholeTextFiles` hands
  * each file's full content to an executor, where the pure parsers in
  * [[Csv]]/[[Channels]]/[[GmailAddress]] run; files sort by path and
  * records index in file order, so `source_row_id` is deterministic
  * (the top correctness risk per SURVEY.md §7.4.1 — never rely on
  * partition order). Contact exports are inherently many-small-files,
  * so per-file parallelism is the right grain at scale; the heavy
  * all-rows stages downstream (normalize/dedupe) re-partition anyway.
  *
  * `row_id` gets a per-source base offset so the three sources union
  * without collisions.
  */
object Sources {

  val LinkedinRowBase = 0L
  val GmailRowBase = 1L << 40
  val VcfRowBase = 2L << 40

  /** Read every file under `path`, parse each file's content into
    * contacts on an executor, and assign deterministic ids: files sort
    * by path, records index in file order (`zipWithIndex` over the
    * sorted RDD). Missing path → warn + empty dataset
    * (warn_missing, normalization.py:372-376). */
  private def readFiles(spark: SparkSession, path: String, rowBase: Long)(
      parse: String => Seq[Contact]): Dataset[Contact] = {
    import spark.implicits._
    // "" is the documented no-source sentinel (TagMain/ConsolidateMain);
    // hadoop Path would throw on it, so treat it as absent outright.
    if (path == null || path.trim.isEmpty) return spark.emptyDataset[Contact]
    // Resolve the filesystem FROM the path, not the default FS: a
    // scheme-qualified path (s3://, hdfs://) on a cluster whose default
    // FS differs would otherwise always report missing.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) {
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn("source path missing: {}", path)
      return spark.emptyDataset[Contact]
    }
    val rdd = spark.sparkContext.wholeTextFiles(path)
      .sortBy(_._1)
      .flatMap { case (_, content) => parse(content) }
      .zipWithIndex()
      .map { case (c, idx) => c.copy(row_id = rowBase + idx, source_row_id = idx.toString) }
    spark.createDataset(rdd)
  }

  /** LinkedIn connections export (combine_contacts.py:295-322): header
    * sniffed past the preamble; URL kept only when it contains
    * linkedin.com; Connected On parsed "d MMM yyyy" / ISO. */
  def linkedin(spark: SparkSession, path: String,
      rowBase: Long = LinkedinRowBase): Dataset[Contact] =
    readFiles(spark, path, rowBase) { content =>
      val t = Csv.table(content, Some("First Name,Last Name,URL"))
      t.rows.map { row =>
        val url0 = t.get(row, "URL")
        val url = if (url0.toLowerCase.contains("linkedin.com")) url0 else ""
        val email = t.get(row, "Email Address")
        Contact.blank(0).copy(
          source = "linkedin",
          full_name_raw = (t.get(row, "First Name") + " " + t.get(row, "Last Name")).trim,
          company = t.get(row, "Company"),
          title = t.get(row, "Position"),
          linkedin_url = url,
          source_timestamp = parseLinkedinDate(t.get(row, "Connected On")),
          emails = if (email.nonEmpty) Seq(EmailEntry(email, "home")) else Nil)
      }
    }

  /** "%d %b %Y" | "%Y-%m-%d" | lenient → ISO-8601 local date-time
    * (combine_contacts.py:325-336). */
  def parseLinkedinDate(value: String): String = {
    val text = Option(value).getOrElse("").trim
    if (text.isEmpty) return ""
    val fmts = Seq(
      java.time.format.DateTimeFormatter.ofPattern("d MMM yyyy", java.util.Locale.US),
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd"))
    fmts.view.flatMap { fmt =>
      scala.util.Try(java.time.LocalDate.parse(text, fmt)).toOption
    }.headOption.map(_.atStartOfDay.toString).getOrElse("")
  }

  /** Gmail contacts export (combine_contacts.py:815-928): N-indexed
    * E-mail/Phone/Address column groups, `:::` multi-values, `*`
    * preferred markers, address slot-filling + variant expansion. */
  def gmail(spark: SparkSession, path: String,
      rowBase: Long = GmailRowBase): Dataset[Contact] =
    readFiles(spark, path, rowBase) { content =>
      val t = Csv.table(content)
      t.rows.map(row => gmailRecord(t, row))
    }

  private def gmailRecord(t: Csv.Table, row: Vector[String]): Contact = {
    val emailMap = new Channels.LabelMap[String]
    for (column <- t.header
        if column.startsWith("E-mail ") && column.endsWith(" - Value")) {
      val raw = t.get(row, column)
      if (raw.nonEmpty) {
        val (label0, _) = Channels.parseGmailLabel(
          t.get(row, column.replace(" - Value", " - Label")), "email")
        val label = if (label0.nonEmpty) label0 else "other"
        Channels.extractEmailValues(raw).foreach(v => emailMap.record(v, label))
      }
    }
    val phoneMap = new Channels.LabelMap[(String, String)]
    for (column <- t.header
        if column.startsWith("Phone ") && column.endsWith(" - Value")) {
      val raw = t.get(row, column)
      if (raw.nonEmpty) {
        val (label0, _) = Channels.parseGmailLabel(
          t.get(row, column.replace(" - Value", " - Label")), "phone")
        val label = if (label0.nonEmpty) label0 else "other"
        Channels.extractPhoneValues(raw).foreach { case (v, ext) =>
          if (v.trim.nonEmpty) phoneMap.record((v.trim, ext.trim), label)
        }
      }
    }
    val AddrId = """Address (\d+) - .*""".r
    val addrIds = t.header.collect { case AddrId(id) => id }.distinct.sortBy(_.toInt)
    val addrMap = mutable.LinkedHashMap.empty[String, AddressEntry]
    for (addrId <- addrIds) {
      val (label0, _) = Channels.parseGmailLabel(
        t.get(row, s"Address $addrId - Label"), "address")
      val label = if (label0.nonEmpty) label0 else "other"
      val components = GmailAddress.prepare(GmailAddress.Components(
        po_box = t.get(row, s"Address $addrId - PO Box"),
        extended = t.get(row, s"Address $addrId - Extended Address"),
        street = t.get(row, s"Address $addrId - Street"),
        city = t.get(row, s"Address $addrId - City"),
        state = t.get(row, s"Address $addrId - Region"),
        postal_code = t.get(row, s"Address $addrId - Postal Code"),
        country = t.get(row, s"Address $addrId - Country")))
      for (v <- GmailAddress.expandVariants(components)) {
        val entry = AddressEntry(v.po_box, v.extended, v.street, v.city,
          v.state, v.postal_code, v.country, label)
        val hasContent = Seq(entry.street, entry.city, entry.state,
          entry.postal_code, entry.country, entry.po_box).exists(_.nonEmpty)
        if (hasContent) {
          val key = graft.etl.ContactLogic.addressKey(entry)
          addrMap.get(key) match {
            case None => addrMap(key) = entry
            case Some(existing) if existing.label.isEmpty && entry.label.nonEmpty =>
              addrMap(key) = entry
            case _ =>
          }
        }
      }
    }
    val prefix = t.get(row, "Name Prefix")
    val first = t.get(row, "First Name")
    val middle = t.get(row, "Middle Name")
    val last = t.get(row, "Last Name")
    val suffix = t.get(row, "Name Suffix")
    Contact.blank(0).copy(
      source = "gmail",
      full_name_raw = Seq(prefix, first, middle, last, suffix)
        .filter(_.nonEmpty).mkString(" ").trim,
      prefix = prefix,
      suffix = suffix,
      nickname = t.get(row, "Nickname"),
      company = t.get(row, "Organization Name"),
      title = t.get(row, "Organization Title"),
      department = t.get(row, "Organization Department"),
      notes = t.get(row, "Notes"),
      emails = emailMap.entries.map { case (v, l) => EmailEntry(v, l) },
      phones = phoneMap.entries.map { case ((v, e), l) => PhoneEntry(v, l, e) },
      addresses = addrMap.values.toSeq)
  }

  /** macOS Contacts vCard 3.0 export (combine_contacts.py:931-1096):
    * blocks split on END:VCARD; FN/N/NICKNAME/REV/EMAIL/TEL/ADR/ORG/
    * TITLE/URL parsed line-sequentially with TYPE= params and
    * `itemN.`-scoped Apple X-ABLABELs.
    *
    * Replicated reference quirks: lines are NOT unfolded; `NOTE:` lines
    * fall into the `N` branch (header "NOTE" starts with "N"), so note
    * text lands in last_name and record.notes stays empty — the tag
    * stage re-reads notes from the raw file; the EMAIL work-label
    * inference from company/title sees only fields parsed EARLIER in
    * the block (sequential state). */
  def vcards(spark: SparkSession, path: String,
      rowBase: Long = VcfRowBase): Dataset[Contact] =
    readFiles(spark, path, rowBase) { content =>
      content.split("END:VCARD").filter(_.contains("BEGIN:VCARD")).toSeq
        .map(block => vcardRecord(block + "END:VCARD"))
    }

  private def vcardRecord(block: String): Contact = {
    var c = Contact.blank(0).copy(source = "mac_vcf")
    val emailMap = new Channels.LabelMap[String]
    val phoneMap = new Channels.LabelMap[(String, String)]
    val addrMap = mutable.LinkedHashMap.empty[String, AddressEntry]
    val itemLabels = mutable.Map.empty[String, String]
    def part(parts: Array[String], i: Int): String =
      if (i < parts.length) parts(i).trim else ""

    for (rawLine <- block.linesIterator; line = rawLine.trim if line.nonEmpty) {
      var header = line
      var value = ""
      val colon = line.indexOf(':')
      if (colon >= 0) { header = line.substring(0, colon); value = line.substring(colon + 1) }
      var itemKey = ""
      val dot = header.indexOf('.')
      if (dot >= 0) {
        val maybeItem = header.substring(0, dot)
        if (maybeItem.toLowerCase.startsWith("item")) {
          itemKey = maybeItem.toLowerCase
          header = header.substring(dot + 1)
        }
      }
      val headerUpper = header.toUpperCase
      def typeTokens = Channels.extractTypeTokens(header.split(";").drop(1).toSeq)
      def labelFrom(tokens: Seq[String], preferred: Seq[String]): String = {
        val fromPreferred = preferred.find(tokens.contains).getOrElse("")
        val base = if (fromPreferred.nonEmpty) fromPreferred
          else tokens.headOption.getOrElse("")
        if (base.nonEmpty) base
        else if (itemKey.nonEmpty) itemLabels.getOrElse(itemKey, "")
        else ""
      }

      if (headerUpper.startsWith("X-ABLABEL")) {
        if (itemKey.nonEmpty) itemLabels(itemKey) = Channels.normalizeAppleLabel(value)
      } else if (headerUpper.startsWith("FN")) {
        c = c.copy(full_name_raw = value.trim)
      } else if (headerUpper.endsWith("NICKNAME") && value.nonEmpty) {
        c = c.copy(nickname = value.trim)
      } else if (headerUpper.startsWith("N")) {
        val parts = value.split(";", -1)
        c = c.copy(last_name = part(parts, 0), first_name = part(parts, 1),
          middle_name = part(parts, 2), prefix = part(parts, 3), suffix = part(parts, 4))
        if (c.full_name_raw.isEmpty)
          c = c.copy(full_name_raw = Seq(c.prefix, c.first_name, c.middle_name,
            c.last_name, c.suffix).filter(_.nonEmpty).mkString(" ").trim)
      } else if (headerUpper.startsWith("REV") && value.nonEmpty) {
        c = c.copy(source_timestamp = value.trim)
      } else if (headerUpper.startsWith("EMAIL") && value.nonEmpty) {
        var label = labelFrom(typeTokens, Seq("work", "home", "other"))
        if ((label.isEmpty || label == "other") && (c.company.nonEmpty || c.title.nonEmpty))
          label = "work"
        if (label.isEmpty) label = "other"
        if (value.trim.nonEmpty) emailMap.record(value.trim, label)
      } else if (headerUpper.startsWith("TEL") && value.nonEmpty) {
        val unescaped = Channels.unescapeVcard(value)
        var label = labelFrom(typeTokens, Seq("mobile", "cell", "iphone", "work",
          "home", "main", "fax", "pager", "other", "voice"))
        if (label.isEmpty) label = "other"
        val (base, ext) = Channels.stripPhoneExtension(unescaped.trim)
        if (base.trim.nonEmpty) phoneMap.record((base.trim, ext.trim), label)
      } else if (headerUpper.startsWith("ADR") && value.nonEmpty) {
        var label = labelFrom(typeTokens, Seq("work", "home", "other"))
        if (label.isEmpty) label = "other"
        val parts = value.split(";", -1)
        val entry = AddressEntry(part(parts, 0), part(parts, 1), part(parts, 2),
          part(parts, 3), part(parts, 4), part(parts, 5), part(parts, 6), label)
        val key = graft.etl.ContactLogic.addressKey(entry)
        addrMap.get(key) match {
          case None => addrMap(key) = entry
          case Some(existing) if existing.label.isEmpty && entry.label.nonEmpty =>
            addrMap(key) = entry
          case _ =>
        }
      } else if (headerUpper.startsWith("ORG") && value.nonEmpty) {
        val unescaped = Channels.unescapeVcard(value.trim)
        val parts = unescaped.split(";", -1)
        val departments = parts.drop(1).map(_.trim).filter(_.nonEmpty)
        c = c.copy(company = part(parts, 0),
          department = if (departments.nonEmpty) departments.mkString(", ") else c.department)
      } else if (headerUpper.startsWith("TITLE") && value.nonEmpty) {
        c = c.copy(title = Channels.unescapeVcard(value.trim))
      } else if (headerUpper.startsWith("URL") && value.nonEmpty &&
          value.toLowerCase.contains("linkedin.com")) {
        c = c.copy(linkedin_url = value.trim)
      } else if (headerUpper.startsWith("NOTE") && value.nonEmpty) {
        c = c.copy(notes = value.trim)
      }
    }
    c.copy(
      emails = emailMap.entries.map { case (v, l) => EmailEntry(v, l) },
      phones = phoneMap.entries.map { case ((v, e), l) => PhoneEntry(v, l, e) },
      addresses = addrMap.values.toSeq)
  }

  /** Three-source union (combine_contacts.py:1099-1104); missing files
    * degrade to empty datasets. */
  def loadAll(spark: SparkSession, linkedinPath: String, gmailPath: String,
      vcfPath: String): Dataset[Contact] =
    linkedin(spark, linkedinPath)
      .unionByName(gmail(spark, gmailPath))
      .unionByName(vcards(spark, vcfPath))

  /** Tag-stage raw notes re-reads (tag_contacts.py:34-68): project
    * (source, source_row_id, note) straight from the raw exports.
    * Row ids count EVERY record (not just noted ones) so they line up
    * with the loader-assigned source_row_ids. */
  private def notesDf(spark: SparkSession, path: String, source: String)(
      parse: String => Seq[String]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // "" is the documented no-source sentinel (TagMain); hadoop Path
    // would throw on it, so treat it as absent outright.
    if (path == null || path.trim.isEmpty)
      return Seq.empty[(String, String, String)].toDF("source", "source_row_id", "note")
    // Resolve the filesystem FROM the path, not the default FS: a
    // scheme-qualified path (s3://, hdfs://) on a cluster whose default
    // FS differs would otherwise always report missing.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath))
      return Seq.empty[(String, String, String)].toDF("source", "source_row_id", "note")
    spark.sparkContext.wholeTextFiles(path)
      .sortBy(_._1)
      .flatMap { case (_, content) => parse(content) }
      .zipWithIndex()
      .filter(_._1.nonEmpty)
      .map { case (note, idx) => (source, idx.toString, note) }
      .toDF("source", "source_row_id", "note")
  }

  /** Gmail Notes column per row ("" when the column is absent). */
  def gmailNotes(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    notesDf(spark, path, "gmail") { content =>
      val t = Csv.table(content)
      if (!t.header.contains("Notes")) t.rows.map(_ => "")
      else t.rows.map(row => t.get(row, "Notes"))
    }

  /** First NOTE: line of each vCard block (tag_contacts.py:50-68 —
    * unlike the consolidate-stage parser, this one reads notes). */
  def vcfNotes(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    notesDf(spark, path, "mac_vcf") { content =>
      content.split("END:VCARD").filter(_.contains("BEGIN:VCARD")).toSeq.map { block =>
        block.linesIterator.map(_.stripSuffix("\r"))
          .find(_.startsWith("NOTE:"))
          .map(_.drop(5).trim).getOrElse("")
      }
    }
}
