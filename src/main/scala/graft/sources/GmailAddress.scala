package graft.sources

import graft.functions.Lookups

/** Gmail free-text address-line classification: distribute the lines of
  * a multi-line "Street" cell into street/city/state/postal/country
  * slots using street-keyword, state and postal heuristics.
  * Reference: combine_contacts.py:623-812.
  */
object GmailAddress {

  final case class Components(
      po_box: String, extended: String, street: String, city: String,
      state: String, postal_code: String, country: String) {
    def toMap: Map[String, String] = Map(
      "po_box" -> po_box, "extended" -> extended, "street" -> street,
      "city" -> city, "state" -> state, "postal_code" -> postal_code,
      "country" -> country)
  }

  private val StreetKeywords: Set[String] = Set(
    "street", "st", "st.", "road", "rd", "rd.", "avenue", "ave", "ave.",
    "boulevard", "blvd", "blvd.", "lane", "ln", "ln.", "drive", "dr", "dr.",
    "court", "ct", "ct.", "circle", "cir", "cir.", "way", "parkway", "pkwy",
    "pkwy.", "highway", "hwy", "hwy.", "trail", "trl", "trl.", "loop",
    "plaza", "plz", "suite", "ste", "unit", "apt", "apartment", "floor",
    "fl", "building", "bldg", "bldg.")

  private val CountryTokens: Set[String] = Set(
    "united states", "united states of america", "usa", "us", "canada",
    "mexico", "united kingdom", "uk", "england", "scotland", "wales",
    "northern ireland")

  private val PostalCode = """\b[0-9A-Za-z]{3,10}(?:-[0-9A-Za-z]{3,4})?\b""".r
  private val StatePostal = """^\s*([A-Za-z]{2})[\s,]+(\d{3,10}(?:-[0-9A-Za-z]{3,4})?)\s*$""".r
  private val CityStatePostal =
    """^\s*(.+?)[,\s]+([A-Za-z]{2})[\s,]+(\d{3,10}(?:-[0-9A-Za-z]{3,4})?)\s*$""".r

  private val StateCodes: Set[String] = Lookups.StateAbbr.values.toSet

  def looksLikeCountry(value: String): Boolean = {
    val lowered = Option(value).getOrElse("").trim.toLowerCase
    if (lowered.isEmpty) return false
    if (CountryTokens.contains(lowered)) return true
    val country = Lookups.normalizeCountry(lowered)
    country.nonEmpty && country.toLowerCase != lowered
  }

  def detectStateToken(value: String): String = {
    val token = Option(value).getOrElse("").trim
    if (token.isEmpty) return ""
    val lowered = token.toLowerCase
    Lookups.StateAbbr.get(lowered) match {
      case Some(code) => code
      case None =>
        if (token.length == 2 && token.forall(_.isLetter) &&
          StateCodes.contains(token.toUpperCase)) token.toUpperCase
        else ""
    }
  }

  def isProbableStreetLine(value: String): Boolean = {
    val text = Option(value).getOrElse("").trim
    if (text.isEmpty) return false
    val lowered = text.toLowerCase
    if (Lookups.StateAbbr.contains(lowered) || StateCodes.contains(lowered) ||
      CountryTokens.contains(lowered)) return false
    if (CityStatePostal.findFirstIn(text).isDefined) return false
    if (text.contains(",")) {
      val after = text.split(",", 2)(1)
      if (detectStateToken(after).nonEmpty) return false
    }
    if (PostalCode.pattern.matcher(text).matches()) return false
    if (looksLikeCountry(text)) return false
    if (text.exists(_.isDigit)) return true
    text.toLowerCase.split("[\\s,]+").exists(t => t.nonEmpty && StreetKeywords.contains(t))
  }

  private def splitAddressLines(value: String): Seq[String] =
    Option(value).getOrElse("").split("[\r\n]+").map(_.trim).filter(_.nonEmpty).toSeq
      .flatMap { chunk =>
        val sub = Channels.splitGoogleMulti(chunk)
        if (sub.nonEmpty) sub else Seq(chunk)
      }

  /** `_maybe_extract_city_line_details`: pull "City, ST zip" apart. */
  private def extractCityLineDetails(cityValue: String, c: Components): Components = {
    val text = Option(cityValue).getOrElse("").trim
    if (text.isEmpty) return c
    text match {
      case CityStatePostal(city, state, postal) =>
        var out = c
        if (city != null && city.nonEmpty) out = out.copy(city = city.trim)
        if (state != null && out.state.isEmpty) {
          val detected = detectStateToken(state)
          if (detected.nonEmpty) out = out.copy(state = detected)
        }
        if (postal != null && out.postal_code.isEmpty) out = out.copy(postal_code = postal.trim)
        out
      case _ if text.contains(",") && c.state.isEmpty =>
        val Array(before, after) = text.split(",", 2)
        val state = detectStateToken(after)
        if (state.nonEmpty)
          c.copy(city = if (before.trim.nonEmpty) before.trim else c.city, state = state)
        else c
      case _ => c
    }
  }

  /** The slot-filling pass (combine_contacts.py:709-812). */
  def prepare(raw: Components): Components = {
    var c = Components(raw.po_box.trim, raw.extended.trim, raw.street.trim,
      raw.city.trim, raw.state.trim, raw.postal_code.trim, raw.country.trim)
    val lineCandidates = splitAddressLines(c.street)
    if (lineCandidates.isEmpty) return c
    val redundancies = Set(c.city, c.state, c.postal_code, c.country)
      .map(_.toLowerCase).filter(_.nonEmpty)

    val shouldReplaceStreet =
      c.street.isEmpty || c.street.contains("\n") || c.street.contains("\r")
    var remaining = lineCandidates.toList
    if (shouldReplaceStreet) {
      val streetIdx = remaining.indexWhere(cand =>
        !redundancies.contains(cand.toLowerCase) && isProbableStreetLine(cand))
      if (streetIdx >= 0) {
        c = c.copy(street = remaining(streetIdx))
        remaining = remaining.drop(streetIdx + 1)
      } else {
        // fall back to the first non-redundant line
        var street = ""
        var rest = remaining
        var done = false
        while (!done && rest.nonEmpty) {
          val cand = rest.head; rest = rest.tail
          if (!redundancies.contains(cand.toLowerCase)) { street = cand; done = true }
        }
        c = c.copy(street = street)
        remaining = rest
      }
    } else remaining = remaining.drop(1)

    val (additionalStreet, filtered) = remaining
      .filterNot(cand => redundancies.contains(cand.toLowerCase))
      .partition(isProbableStreetLine)
    remaining = filtered
    if (additionalStreet.nonEmpty)
      c = c.copy(street = (c.street +: additionalStreet).filter(_.nonEmpty).mkString(", "))

    if (remaining.nonEmpty && c.city.isEmpty) {
      val cityLine = remaining.head
      remaining = remaining.tail
      c = extractCityLineDetails(cityLine, c.copy(city = cityLine))
    }

    for (line <- remaining if line.nonEmpty) {
      var assigned = false
      line match {
        case StatePostal(state, postal) =>
          if (state != null && c.state.isEmpty) {
            val normalized = detectStateToken(state)
            c = c.copy(state = if (normalized.nonEmpty) normalized else state.trim)
          }
          if (postal != null && c.postal_code.isEmpty) c = c.copy(postal_code = postal.trim)
          assigned = true
        case _ =>
      }
      if (!assigned && c.state.isEmpty) {
        val normalized = detectStateToken(line)
        if (normalized.nonEmpty) { c = c.copy(state = normalized); assigned = true }
      }
      if (!assigned && c.postal_code.isEmpty) {
        PostalCode.findFirstIn(line) match {
          case Some(postal) => c = c.copy(postal_code = postal.trim); assigned = true
          case None =>
        }
      }
      if (!assigned && c.country.isEmpty) {
        if (Lookups.normalizeCountry(line).nonEmpty) {
          c = c.copy(country = line.trim); assigned = true
        }
      }
      if (!assigned && c.city.isEmpty) c = c.copy(city = line.trim)
    }
    c
  }

  /** `_expand_address_variants`: positional zip of `:::`-multi-valued
    * components into N variants (combine_contacts.py:598-620). */
  def expandVariants(components: Components): Seq[Components] = {
    val split = components.toMap.view.mapValues(Channels.splitGoogleMulti).toMap
    val maxLen = split.values.map(_.length).maxOption.getOrElse(0)
    def at(field: String, idx: Int): String = {
      val values = split(field)
      if (values.isEmpty) "" else if (idx < values.length) values(idx) else values.last
    }
    def build(idx: Int): Components = Components(
      at("po_box", idx), at("extended", idx), at("street", idx), at("city", idx),
      at("state", idx), at("postal_code", idx), at("country", idx))
    if (maxLen <= 1) Seq(build(0)) else (0 until maxLen).map(build)
  }
}
