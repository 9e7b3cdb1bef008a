package graft.etl

import graft.functions._
import scala.collection.mutable
import scala.collection.mutable.ListBuffer

/** Pure record-level contact semantics: per-record normalization
  * (reference normalization.py:783-909), collection normalizers
  * (:543-665), and the cluster merge fold (combine_contacts.py:
  * 1243-1425). Spark-free so every rule is unit-testable; the Spark
  * stages apply these inside narrow typed maps / mapGroups — no
  * driver-side loops, no shuffles beyond the ones the dataflow needs.
  */
object ContactLogic {

  final case class Settings(
      genSuffixes: Set[String] = Names.DefaultGenSuffixes,
      profSuffixes: Set[String] = Names.DefaultProfSuffixes,
      namePrefixes: Set[String] = Names.DefaultNamePrefixes,
      defaultPhoneCountry: String = "US",
      dropInvalidEmails: Boolean = false,
      dropInvalidPhones: Boolean = false)

  val EmailFindRe = "[A-Za-z0-9._%+\\-']+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}".r

  /** Find embedded emails, collect them, remove from the text
    * (normalization.py:668-677). */
  def stripEmailsFromText(text: String, acc: ListBuffer[EmailEntry]): String = {
    if (text == null || text.isEmpty) return ""
    val found = EmailFindRe.findAllIn(text).toList
    for (e <- found) acc += EmailEntry(e, "")
    var cleaned = text
    for (e <- found) cleaned = cleaned.replace(e, "").trim
    cleaned
  }

  /** normalize_email_collection (normalization.py:543-570): validate +
    * normalize each email, first-wins dedupe on normalized value with
    * empty→non-empty label upgrade; invalids kept (label "invalid",
    * deduped case-insensitively) unless dropped. Returns (kept, invalid). */
  def normalizeEmails(values: Seq[EmailEntry], dropInvalid: Boolean): (Seq[EmailEntry], Seq[String]) = {
    val emailMap = mutable.LinkedHashMap.empty[String, String]
    val invalid = ListBuffer.empty[String]
    val keptInvalid = mutable.LinkedHashMap.empty[String, String]
    for (entry <- values) {
      val normalized = TextNorm.validateEmail(entry.value)
      if (normalized.isEmpty) {
        val raw = Option(entry.value).getOrElse("").trim
        if (raw.nonEmpty) {
          invalid += raw
          if (!dropInvalid) {
            val key = raw.toLowerCase
            if (!keptInvalid.contains(key)) keptInvalid(key) = raw
          }
        }
      } else {
        val candidateLabel = TextNorm.normLabel(entry.label)
        emailMap.get(normalized) match {
          case None => emailMap(normalized) = candidateLabel
          case Some(cur) if cur.isEmpty && candidateLabel.nonEmpty => emailMap(normalized) = candidateLabel
          case _ =>
        }
      }
    }
    val out = emailMap.toSeq.map { case (v, l) => EmailEntry(v, l) } ++
      (if (dropInvalid) Nil else keptInvalid.values.map(v => EmailEntry(v, "invalid")))
    (out, invalid.toSeq)
  }

  /** normalize_phone_collection (normalization.py:573-617). */
  def normalizePhones(values: Seq[PhoneEntry], dropInvalid: Boolean): (Seq[PhoneEntry], Seq[String]) = {
    val out = ListBuffer.empty[PhoneEntry]
    val seen = mutable.Set.empty[(String, String)]
    val nonStandard = ListBuffer.empty[String]
    val nonStandardSeen = mutable.Set.empty[String]
    val keptInvalid = ListBuffer.empty[(String, String)]
    for (entry <- values) {
      val (formatted, confident) = Phones.normalizeValue(entry.value)
      if (confident && formatted.nonEmpty) {
        val key = (formatted, Option(entry.extension).getOrElse(""))
        if (!seen.contains(key)) {
          seen += key
          out += PhoneEntry(formatted, entry.label, entry.extension)
        }
      } else {
        val trimmed = Option(entry.value).getOrElse("").trim
        if (trimmed.nonEmpty) {
          val rendered = Phones.withExtension(trimmed, entry.extension) + "::invalid"
          if (!nonStandardSeen.contains(rendered)) {
            nonStandardSeen += rendered
            nonStandard += rendered
            if (!dropInvalid) keptInvalid += ((trimmed, Option(entry.extension).getOrElse("")))
          }
        }
      }
    }
    if (!dropInvalid) out ++= keptInvalid.map { case (v, e) => PhoneEntry(v, "invalid", e) }
    (out.toSeq, nonStandard.toSeq)
  }

  private val CityStateZipRe =
    "(.*?)[,\\s]+([^,]+?)[,\\s]+([A-Za-z]{2})[,\\s]+(\\d{4,10})(?:[-\\s]\\d+)?$".r

  /** normalize_address (normalization.py:620-649): pull trailing
    * "city, ST zip" out of the street line, normalize state/country,
    * lowercase label. */
  def normalizeAddress(a: AddressEntry): AddressEntry = {
    var street = Option(a.street).getOrElse("")
    var city = Option(a.city).getOrElse("")
    var state = Option(a.state).getOrElse("")
    var postal = Option(a.postal_code).getOrElse("")
    if (street.nonEmpty && (city.isEmpty || state.isEmpty || postal.isEmpty)) {
      CityStateZipRe.findFirstMatchIn(street).foreach { m =>
        street = m.group(1).trim
        if (city.isEmpty) city = m.group(2).trim
        if (state.isEmpty) state = m.group(3).trim
        if (postal.isEmpty) postal = m.group(4).trim
      }
    }
    AddressEntry(
      po_box = Option(a.po_box).getOrElse(""),
      extended = Option(a.extended).getOrElse(""),
      street = street.trim, city = city.trim,
      state = Lookups.normalizeState(state),
      postal_code = postal.trim,
      country = Lookups.normalizeCountry(a.country),
      label = TextNorm.normLabel(a.label))
  }

  /** Canonical identity key of an address ignoring its label (the
    * reference uses sorted-key JSON; any deterministic rendering works
    * as the dedupe key). */
  def addressKey(a: AddressEntry): String =
    Seq(a.city, a.country, a.extended, a.po_box, a.postal_code, a.state, a.street)
      .mkString("\u0001")

  /** normalize_address_collection (normalization.py:652-665). */
  def normalizeAddresses(values: Seq[AddressEntry]): Seq[AddressEntry] = {
    val map = mutable.LinkedHashMap.empty[String, AddressEntry]
    for (entry <- values) {
      val addr = normalizeAddress(entry)
      val key = addressKey(addr)
      map.get(key) match {
        case None => map(key) = addr
        case Some(existing) if existing.label.isEmpty && addr.label.nonEmpty => map(key) = addr
        case _ =>
      }
    }
    map.values.toSeq
  }

  /** normalize_contact_record (normalization.py:783-909). */
  def normalizeRecord(record0: Contact, settings: Settings = Settings()): Contact = {
    var record = record0
    val tmpEmails = ListBuffer.empty[EmailEntry]
    val rawName = stripEmailsFromText(
      if (record.full_name_raw.nonEmpty) record.full_name_raw else record.full_name, tmpEmails)
    val parsed = Names.stripAndParse(rawName, settings.genSuffixes, settings.profSuffixes, settings.namePrefixes)
    var first = parsed.first
    var middle = parsed.middle
    var last = parsed.last
    var fullClean = parsed.fullClean

    var emails = record.emails
    if (tmpEmails.nonEmpty) {
      val existing = emails.map(_.value).toSet
      emails = emails ++ tmpEmails.filter(e => e.value.nonEmpty && !existing.contains(e.value))
    }

    val prefix = if (record.prefix.nonEmpty) record.prefix else parsed.prefix

    def firstValidEmail(es: Seq[EmailEntry]): String =
      es.collectFirst { case e if TextNorm.EmailRe.findFirstIn(e.value).isDefined => e.value }.getOrElse("")

    if (first.isEmpty && last.isEmpty) {
      val primary = firstValidEmail(emails)
      if (primary.nonEmpty) {
        val local = primary.split("@", 2)(0)
        val (fGuess, lGuess) = TextNorm.guessNameFromEmailLocal(local)
        if (first.isEmpty) first = fGuess
        if (last.isEmpty) last = lGuess
        fullClean = Seq(prefix, first, middle, last, parsed.genSuffix)
          .filter(_.nonEmpty).mkString(" ").trim
      }
    }

    var firstName = if (first.nonEmpty) first else record.first_name
    var middleName = if (middle.nonEmpty) middle else record.middle_name
    var lastName = if (last.nonEmpty) last else record.last_name
    val maiden = if (parsed.maiden.nonEmpty) parsed.maiden else record.maiden_name
    val suffix = if (record.suffix.nonEmpty) record.suffix else parsed.genSuffix
    val suffixProf =
      if (parsed.professional.nonEmpty)
        (if (record.suffix_professional.nonEmpty) record.suffix_professional
         else parsed.professional.mkString("|"))
      else record.suffix_professional
    var fullName = if (fullClean.nonEmpty) fullClean else record.full_name

    // strip embedded emails out of the name parts
    val accEmails = ListBuffer.empty[EmailEntry]
    val f2 = stripEmailsFromText(firstName, accEmails)
    if (f2 != firstName) firstName = f2
    val m2 = stripEmailsFromText(middleName, accEmails)
    if (m2 != middleName) middleName = m2
    val l2 = stripEmailsFromText(lastName, accEmails)
    if (l2 != lastName) lastName = l2
    emails = emails ++ accEmails

    // a name field that IS an email moves to the email list
    if (TextNorm.EmailRe.findFirstIn(firstName.trim).isDefined && firstName.trim.nonEmpty) {
      emails = emails :+ EmailEntry(firstName.trim, "")
      firstName = ""
    }
    if (TextNorm.EmailRe.findFirstIn(lastName.trim).isDefined && lastName.trim.nonEmpty) {
      emails = emails :+ EmailEntry(lastName.trim, "")
      lastName = ""
    }

    if (firstName.isEmpty && lastName.isEmpty) {
      val primary = firstValidEmail(emails)
      if (primary.nonEmpty) {
        val local = primary.split("@", 2)(0)
        val (fGuess, lGuess) = TextNorm.guessNameFromEmailLocal(local)
        if (lastName.isEmpty && lGuess.nonEmpty) lastName = lGuess
        if (firstName.isEmpty && fGuess.nonEmpty) firstName = fGuess
      }
    }
    if (lastName.nonEmpty && firstName.isEmpty) {
      val primary = firstValidEmail(emails)
      if (primary.nonEmpty) {
        val local = primary.split("@", 2)(0)
        val initial = TextNorm.reconcileNameFromEmailAndLast(local, lastName)
        if (initial.nonEmpty) firstName = initial
      }
    }

    fullName = Seq(prefix, firstName, middleName, lastName, suffix)
      .filter(_.nonEmpty).mkString(" ").trim

    val (normEmails, invalidEmails) = normalizeEmails(emails, settings.dropInvalidEmails)
    val (normPhones, nonStandardPhones) = normalizePhones(record.phones, settings.dropInvalidPhones)
    val normAddrs = normalizeAddresses(record.addresses)

    record.copy(
      full_name = fullName, prefix = prefix, first_name = firstName,
      middle_name = middleName, last_name = lastName, maiden_name = maiden,
      suffix = suffix, suffix_professional = suffixProf,
      emails = normEmails, phones = normPhones, addresses = normAddrs,
      invalid_emails = record.invalid_emails ++ invalidEmails,
      non_standard_phones = record.non_standard_phones ++ nonStandardPhones)
  }

  /** address_keys_for_match (normalization.py:912-921): (city, STATE,
    * postal) triples with ≥2 non-empty components. */
  def addressMatchKeys(addresses: Seq[AddressEntry]): Set[(String, String, String)] =
    addresses.iterator.flatMap { a =>
      val city = Option(a.city).getOrElse("").trim.toLowerCase
      val state = Option(a.state).getOrElse("").trim.toUpperCase
      val postal = Option(a.postal_code).getOrElse("").trim
      val nonEmpty = Seq(city, state, postal).count(_.nonEmpty)
      if (nonEmpty >= 2) Some((city, state, postal)) else None
    }.toSet

  // ---------------------------------------------------------------------
  // Merge scoring + decision (merge.py:35-92, combine_contacts.py:1154-1222)
  // ---------------------------------------------------------------------

  final case class MergeSignals(
      score: Double, corroborators: Int, firstSimilarity: Double, emailsOverlap: Boolean)

  def firstNameCandidates(c: Contact): Seq[String] =
    Seq(c.first_name, c.nickname).map(Option(_).getOrElse("").trim)
      .filter(_.nonEmpty).distinct

  /** Slim comparison view of a contact — only what the merge rule reads.
    * Shuffled through the blocked self-join instead of full Contact rows
    * (an order of magnitude less data per pair at scale). The derived
    * arrays (normNames, nickRoots) also back the codegen-level candidate
    * pre-filter in Pipeline.acceptedPairs. */
  final case class MatchRec(
      row_id: Long,
      block: String,
      first: String,
      nickname: String,
      lastNorm: String,
      suffix: String,
      suffixNorm: String,
      isLinkedinSrc: Boolean,
      linkedin: String,
      normNames: Seq[String],
      lowerNames: Seq[String],
      nickRoots: Seq[String],
      emails: Seq[String],
      phones: Seq[String],
      addrKeys: Seq[String])

  def toMatchRec(c: Contact): MatchRec = {
    val cands = firstNameCandidates(c)
    MatchRec(
      row_id = c.row_id,
      block = blockKey(c),
      first = c.first_name,
      nickname = c.nickname,
      lastNorm = TextNorm.norm(c.last_name),
      suffix = c.suffix,
      suffixNorm = TextNorm.norm(c.suffix),
      isLinkedinSrc = c.source.toLowerCase == "linkedin",
      linkedin = c.linkedin_url,
      normNames = cands.map(TextNorm.norm),
      // Raw-lowercase names: equality here guarantees seqRatio == 1.0,
      // which normNames (NFKD-folded) equality does NOT — the native
      // fast-accept in Pipeline.acceptedPairs keys on this.
      lowerNames = cands.map(_.toLowerCase),
      nickRoots = cands.map(Similarity.nicknameRoot).filter(_.nonEmpty),
      emails = c.emails.map(_.value),
      phones = c.phones.map(_.value),
      addrKeys = addressMatchKeys(c.addresses).toSeq.sorted
        .map { case (city, st, zip) => city + "\u0001" + st + "\u0001" + zip })
  }

  private def candidates(r: MatchRec): Seq[String] =
    Seq(r.first, r.nickname).map(Option(_).getOrElse("").trim).filter(_.nonEmpty).distinct

  def computeSignals(a: MatchRec, b: MatchRec, nicknameEquivalence: Boolean): MergeSignals = {
    var score = 0.0
    var corroborators = 0
    val aOpts = candidates(a)
    val bOpts = candidates(b)
    val sims = for (l <- aOpts; r <- bOpts) yield Similarity.seqRatio(l, r)
    var firstSim = if (sims.nonEmpty) sims.max else Similarity.seqRatio(a.first, b.first)
    if (nicknameEquivalence &&
        aOpts.exists(l => bOpts.exists(r => Similarity.nicknameEquivalent(l, r))))
      firstSim = math.max(firstSim, 0.96)
    score += 0.7 * firstSim
    if (a.suffix.nonEmpty && a.suffix.toLowerCase == b.suffix.toLowerCase) score += 0.1
    val emailsOverlap = a.emails.toSet.intersect(b.emails.toSet).nonEmpty
    if (emailsOverlap) { score += 1.0; corroborators += 1 }
    if (a.phones.toSet.intersect(b.phones.toSet).nonEmpty) { score += 1.0; corroborators += 1 }
    if (a.addrKeys.toSet.intersect(b.addrKeys.toSet).nonEmpty) { score += 0.5; corroborators += 1 }
    if (a.linkedin.nonEmpty && a.linkedin == b.linkedin) { score += 0.8; corroborators += 1 }
    MergeSignals(score, corroborators, firstSim, emailsOverlap)
  }

  def computeSignals(a: Contact, b: Contact): MergeSignals =
    computeSignals(toMatchRec(a), toMatchRec(b), nicknameEquivalence = true)

  final case class DedupeConfig(
      mergeScoreThreshold: Double = 1.2,
      relaxedMergeThreshold: Double = 0.6,
      firstNameSimilarityThreshold: Double = 0.88,
      nicknameEquivalence: Boolean = true,
      requireCorroborator: Boolean = false,
      /** Scale knob (engine extension, default off = reference
        * semantics): suppress match keys shared by more than this many
        * records from CANDIDATE GENERATION. A single junk key at
        * corpus scale — a shared `noreply@` mailbox, a call-center
        * phone number — otherwise generates O(df²) candidate pairs
        * and chains unrelated records into one mega-component. Only
        * generation is pruned: pairs that still qualify through any
        * sub-cap key are scored against their FULL key sets, so their
        * merge decisions are identical to the uncapped rule; the only
        * behavioral difference is that a pair whose every shared key
        * is a stop key is never considered. Standard ER stop-key
        * device (cf. Bayardo WWW'07 frequency-ordered pruning). */
      matchKeyFrequencyCap: Option[Long] = None)

  /** Test-only observability (local[] masters): counts typed-path
    * merge decisions — the Scala remainder that pairs fall to only
    * when a side is nameless / empty-norm. Pins PipelineSpec's
    * "all-named corpora decide entirely in codegen" contract. */
  private[graft] val typedDecisionCount =
    new java.util.concurrent.atomic.LongAdder

  /** The full merge decision rule (combine_contacts.py:1154-1222). */
  def shouldMerge(left: MatchRec, right: MatchRec, cfg: DedupeConfig): Boolean = {
    typedDecisionCount.increment()
    val signals = computeSignals(left, right, cfg.nicknameEquivalence)
    var ok = signals.score >= cfg.mergeScoreThreshold ||
      (signals.firstSimilarity >= cfg.firstNameSimilarityThreshold &&
        signals.score >= cfg.relaxedMergeThreshold)

    val leftCands = candidates(left)
    val rightCands = candidates(right)
    def hasCoreName(r: MatchRec, cands: Seq[String]) = cands.nonEmpty && r.lastNorm.nonEmpty
    val eitherNameless = !hasCoreName(left, leftCands) || !hasCoreName(right, rightCands)
    if (eitherNameless && signals.corroborators == 0) ok = false

    lazy val namesAlign = leftCands.exists(a => rightCands.exists(b =>
      a.nonEmpty && b.nonEmpty && TextNorm.norm(a) == TextNorm.norm(b)))
    lazy val nicknameEq = cfg.nicknameEquivalence &&
      leftCands.exists(a => rightCands.exists(b => Similarity.nicknameEquivalent(a, b)))
    if (leftCands.nonEmpty && rightCands.nonEmpty) {
      val linkedinMatch = left.linkedin.nonEmpty && left.linkedin == right.linkedin
      if (!(namesAlign || nicknameEq || signals.emailsOverlap || linkedinMatch)) ok = false
    }

    if (left.isLinkedinSrc || right.isLinkedinSrc) {
      if (!signals.emailsOverlap) {
        val lastEq = left.lastNorm == right.lastNorm
        val genEq = left.suffixNorm == right.suffixNorm
        val firstEq = leftCands.nonEmpty && rightCands.nonEmpty && namesAlign
        if (!(lastEq && (firstEq || nicknameEq) && genEq)) ok = false
      }
    }

    if (cfg.requireCorroborator) ok = ok && signals.corroborators > 0
    ok
  }

  def shouldMerge(left: Contact, right: Contact, cfg: DedupeConfig = DedupeConfig()): Boolean =
    shouldMerge(toMatchRec(left), toMatchRec(right), cfg)

  /** Blocking key (combine_contacts.py:1116-1129): normalized last name,
    * falling back to full name → first email → first phone → unique
    * per-row sentinel. */
  def blockKey(c: Contact): String = {
    var key = TextNorm.norm(c.last_name)
    if (key.isEmpty) key = TextNorm.norm(c.full_name)
    if (key.isEmpty && c.emails.nonEmpty) key = TextNorm.norm(c.emails.head.value)
    if (key.isEmpty && c.phones.nonEmpty) key = TextNorm.norm(c.phones.head.value)
    if (key.isEmpty) key = s"__blank_${c.row_id}"
    key
  }

  // ---------------------------------------------------------------------
  // Cluster merge (combine_contacts.py:1243-1425)
  // ---------------------------------------------------------------------

  /** Source priority: linkedin=3 > mac_vcf=2 > gmail=1 > 0. */
  def sourcePriority(source: String): Int =
    Option(source).getOrElse("").toLowerCase match {
      case "linkedin" => 3
      case "mac_vcf" => 2
      case "gmail" => 1
      case _ => 0
    }

  /** Lenient timestamp parse to epoch millis (reference uses dateutil;
    * our timestamps are ISO-ish strings). */
  def parseTimestamp(value: String): Option[Long] = {
    val text = Option(value).getOrElse("").trim
    if (text.isEmpty) return None
    val attempts = Seq(
      () => java.time.Instant.parse(text).toEpochMilli,
      () => java.time.LocalDateTime.parse(text.replace(" ", "T"))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
      () => java.time.LocalDate.parse(text).atStartOfDay
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    attempts.view.flatMap(f => scala.util.Try(f()).toOption).headOption
  }

  type Rank = (Option[Long], Int)

  /** _rank_is_better (combine_contacts.py:243-261): newer timestamp
    * wins; a timestamp beats none; then higher source priority. */
  def rankIsBetter(candidate: Rank, existing: Rank): Boolean = {
    (candidate._1, existing._1) match {
      case (Some(c), Some(e)) if c > e => return true
      case (Some(c), Some(e)) if c < e => return false
      case (Some(_), None) => return true
      case (None, Some(_)) => return false
      case _ =>
    }
    candidate._2 > existing._2
  }

  /** _should_replace_label (combine_contacts.py:207-226). */
  def shouldReplaceLabel(existingLabel: String, existingRank: Rank,
      candidateLabel: String, candidateRank: Rank): Boolean = {
    if (rankIsBetter(candidateRank, existingRank)) return true
    if (candidateRank._2 == existingRank._2 && candidateLabel.nonEmpty && existingLabel.isEmpty)
      return true
    existingLabel == "other" && candidateLabel.nonEmpty && candidateLabel != "other" &&
      !rankIsBetter(existingRank, candidateRank)
  }

  def recordRank(c: Contact): Rank = (parseTimestamp(c.source_timestamp), sourcePriority(c.source))

  /** _choose_by_priority (combine_contacts.py:264-277): first strictly-
    * best non-empty value in cluster order. */
  def chooseByPriority(records: Seq[Contact], getter: Contact => String): String = {
    var bestValue = ""
    var bestRank: Rank = (None, -1)
    for (record <- records) {
      val value = getter(record)
      if (value != null && value.nonEmpty) {
        val rank = recordRank(record)
        if (bestValue.isEmpty || rankIsBetter(rank, bestRank)) {
          bestRank = rank
          bestValue = value
        }
      }
    }
    bestValue
  }

  /** choose_best_first_name (normalization.py:738-780): weighted vote
    * over explicit first names (linkedin ×2) and email-local-part
    * guesses (×1.5), fuzzy-merging candidate keys at seqRatio ≥ 0.9;
    * explicit names beat guesses. Returns display casing. */
  def chooseBestFirstName(records: Seq[Contact]): String = {
    val counts = mutable.LinkedHashMap.empty[String, Double]
    val casing = mutable.Map.empty[String, String]
    val explicit = mutable.Map.empty[String, Boolean]
    for (record <- records) {
      if (record.first_name.nonEmpty) {
        val weight = if (record.source.toLowerCase == "linkedin") 2.0 else 1.0
        val key = record.first_name.toLowerCase
        counts(key) = counts.getOrElse(key, 0.0) + weight
        if (!casing.contains(key)) casing(key) = record.first_name
        explicit(key) = true
      }
      for (email <- record.emails) {
        val local = if (email.value.contains("@")) email.value.split("@", 2)(0) else ""
        val firstGuess = TextNorm.guessNameFromEmailLocal(local)._1
        if (firstGuess.nonEmpty) {
          val key = firstGuess.toLowerCase
          counts(key) = counts.getOrElse(key, 0.0) + 1.5
          if (!casing.contains(key)) casing(key) = TextNorm.titleCase(firstGuess)
          if (!explicit.contains(key)) explicit(key) = false
        }
      }
    }
    if (counts.isEmpty) return ""
    val merged = mutable.LinkedHashMap.empty[String, Double]
    val mergedExplicit = mutable.Map.empty[String, Boolean]
    val keys = counts.keys.toSeq
    for (key <- keys if !merged.contains(key)) {
      merged(key) = counts(key)
      mergedExplicit(key) = explicit.getOrElse(key, false)
      for (other <- keys if other != key && !merged.contains(other)) {
        if (Similarity.seqRatio(key, other) >= 0.9) {
          merged(key) += counts(other)
          mergedExplicit(key) = mergedExplicit(key) || explicit.getOrElse(other, false)
          merged(other) = -1.0
          if (!mergedExplicit.contains(other)) mergedExplicit(other) = explicit.getOrElse(other, false)
        }
      }
    }
    val candidates = merged.collect { case (k, s) if s >= 0 => k }.toSeq
    if (candidates.isEmpty) return ""
    val explicitCands = candidates.filter(k => mergedExplicit.getOrElse(k, false))
    val pool = if (explicitCands.nonEmpty) explicitCands else candidates
    val bestKey = pool.maxBy(k => merged(k))
    casing.getOrElse(bestKey, TextNorm.titleCase(bestKey))
  }

  /** _merge_cluster (combine_contacts.py:1243-1425). `members` must be
    * in ascending row order (the reference's cluster order) and pair
    * each normalized record with its raw pre-normalization original. */
  def mergeCluster(members: Seq[(Contact, Contact)]): (MergedContact, Seq[Lineage]) = {
    val cluster = members.map(_._1)
    val bestFirst = chooseBestFirstName(cluster)
    val prefix = chooseByPriority(cluster, _.prefix)
    val middle = chooseByPriority(cluster, _.middle_name)
    val last = chooseByPriority(cluster, _.last_name)
    val maiden = chooseByPriority(cluster, _.maiden_name)
    val suffix = chooseByPriority(cluster, _.suffix)
    val profSuffixes = chooseByPriority(cluster, _.suffix_professional)
    val nickname = chooseByPriority(cluster, _.nickname)
    val company = chooseByPriority(cluster, _.company)
    val title = chooseByPriority(cluster, _.title)
    val department = chooseByPriority(cluster, _.department)
    val linkedin = chooseByPriority(cluster, _.linkedin_url)

    val allEmails = mutable.LinkedHashMap.empty[String, (String, Rank)]
    val allPhones = mutable.LinkedHashMap.empty[(String, String), (String, Rank)]
    val clusterInvalidEmails = mutable.SortedSet.empty[String]
    val clusterNonStandard = mutable.SortedSet.empty[String]
    val allAddresses = ListBuffer.empty[AddressEntry]
    val seenAddrKeys = mutable.Set.empty[String]

    for (record <- cluster) {
      clusterInvalidEmails ++= record.invalid_emails
      clusterNonStandard ++= record.non_standard_phones
      val rank = recordRank(record)
      for (email <- record.emails) {
        allEmails.get(email.value) match {
          case None => allEmails(email.value) = (email.label, rank)
          case Some((curLabel, curRank)) =>
            if (shouldReplaceLabel(curLabel, curRank, email.label, rank))
              allEmails(email.value) = (email.label, rank)
        }
      }
      for (phone <- record.phones) {
        val (normalizedValue, confident) = Phones.normalizeValue(phone.value)
        if (normalizedValue.nonEmpty) {
          if (!confident) {
            val renderedValue = Phones.withExtension(normalizedValue, phone.extension)
            val rendered =
              if (phone.label.nonEmpty) s"$renderedValue::${phone.label}" else renderedValue
            clusterNonStandard += rendered
            val key = (renderedValue, Option(phone.extension).getOrElse(""))
            val candidateLabel = if (phone.label.nonEmpty) phone.label else "invalid"
            allPhones.get(key) match {
              case None => allPhones(key) = (candidateLabel, rank)
              case Some((curLabel, curRank)) =>
                if (shouldReplaceLabel(curLabel, curRank, candidateLabel, rank))
                  allPhones(key) = (candidateLabel, rank)
            }
          } else {
            val key = (normalizedValue, Option(phone.extension).getOrElse(""))
            allPhones.get(key) match {
              case None => allPhones(key) = (phone.label, rank)
              case Some((curLabel, curRank)) =>
                if (shouldReplaceLabel(curLabel, curRank, phone.label, rank))
                  allPhones(key) = (phone.label, rank)
            }
          }
        }
      }
      for (address <- record.addresses) {
        val key = addressKey(address) + "\u0001" + address.label
        if (!seenAddrKeys.contains(key)) {
          seenAddrKeys += key
          allAddresses += address
        }
      }
    }

    val fullNameClean = Seq(prefix, bestFirst, middle, last, suffix)
      .filter(_.nonEmpty).mkString(" ").trim
    val lineageKeys = cluster.collect {
      case r if r.source.nonEmpty && r.source_row_id.nonEmpty => s"${r.source}:${r.source_row_id}"
    }
    val phoneKeyComponents = allPhones.keys.map { case (v, e) => Phones.withExtension(v, e) }
    val keyMaterial = Seq(
      fullNameClean, company, title,
      allEmails.keys.toSeq.sorted.mkString(";"),
      phoneKeyComponents.toSeq.sorted.mkString(";"),
      lineageKeys.sorted.mkString("|")).mkString("::").trim
    val contactId = Ids.uuid5(
      if (keyMaterial.nonEmpty) keyMaterial
      else if (fullNameClean.nonEmpty) fullNameClean
      else cluster.head.source_row_id)

    val addressesJson = addressesToJson(allAddresses.toSeq)
    val template = cluster.head
    val merged = Contact.blank(template.row_id).copy(
      source = template.source,
      source_row_id = template.source_row_id,
      source_timestamp = template.source_timestamp,
      full_name = fullNameClean,
      prefix = prefix, first_name = bestFirst, middle_name = middle,
      last_name = last, maiden_name = maiden, suffix = suffix,
      suffix_professional = profSuffixes, nickname = nickname,
      company = company, title = title, department = department,
      linkedin_url = linkedin,
      emails = allEmails.keys.toSeq.sorted.map(v =>
        EmailEntry(v, if (allEmails(v)._1.nonEmpty) allEmails(v)._1 else "other")),
      phones = allPhones.keys.toSeq.sorted.map { case (v, e) =>
        val label = allPhones((v, e))._1
        PhoneEntry(v, if (label.nonEmpty) label else "other", e)
      },
      addresses = allAddresses.toSeq)

    val lineage = members.map { case (record, raw) =>
      Lineage(
        contact_id = contactId,
        source = record.source,
        source_row_id = record.source_row_id,
        source_full_name = record.full_name_raw,
        source_prefix = record.prefix,
        source_company = record.company,
        source_title = record.title,
        source_emails = record.emails.map(_.value).mkString("|"),
        source_phones = record.phones.map(p => Phones.withExtension(p.value, p.extension)).mkString("|"),
        source_addresses_json = addressesToJson(record.addresses),
        source_emails_raw = raw.emails.map(_.value).mkString("|"),
        source_phones_raw = raw.phones.map(p => Phones.withExtension(p.value, p.extension)).mkString("|"))
    }

    val uniqueSources = cluster.map(_.source).filter(_.nonEmpty).distinct
    (MergedContact(
      contact_id = contactId,
      contact = merged,
      addresses_json = addressesJson,
      source_count = if (uniqueSources.nonEmpty) uniqueSources.size else cluster.size,
      source_row_count = cluster.size,
      invalid_emails = clusterInvalidEmails.toSeq,
      non_standard_phones = clusterNonStandard.toSeq), lineage)
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Stable JSON rendering of addresses (field order fixed). */
  def addressesToJson(addresses: Seq[AddressEntry]): String =
    addresses.map { a =>
      Seq(
        "po_box" -> a.po_box, "extended" -> a.extended, "street" -> a.street,
        "city" -> a.city, "state" -> a.state, "postal_code" -> a.postal_code,
        "country" -> a.country, "label" -> a.label)
        .map { case (k, v) => s""""$k": "${jsonEscape(Option(v).getOrElse(""))}"""" }
        .mkString("{", ", ", "}")
    }.mkString("[", ", ", "]")
}
