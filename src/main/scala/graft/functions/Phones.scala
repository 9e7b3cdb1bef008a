package graft.functions

/** Phone normalization — the reference's *fallback* path (its tested
  * behavior; the phonenumbers-library path requires metadata outside the
  * zero-egress build). Reference: normalization.py:282-332.
  */
object Phones {

  private def digitsOf(s: String): String = s.replaceAll("\\D", "")

  /** E.164 fallback formatting (normalization.py:297-327):
    * 10 digits → +1d; 11 with leading 1 → +d; 12-15 digits without a +
    * prefix → +d; '+'-prefixed → strip all but digits and '+'; anything
    * else with digits → +1d; no digits → original trimmed string. */
  def formatE164(value: String): String = {
    val s = Option(value).getOrElse("").trim
    if (s.isEmpty) return ""
    val digits = digitsOf(s)
    val formatted =
      if (digits.length == 10) s"+1$digits"
      else if (digits.length == 11 && digits.startsWith("1")) s"+$digits"
      else if (digits.length > 11 && digits.length <= 15 && !s.startsWith("+")) s"+$digits"
      else if (s.startsWith("+")) s.replaceAll("[^\\d+]", "")
      else if (digits.nonEmpty) s"+1$digits"
      else ""
    if (formatted.isEmpty) s else formatted
  }

  /** Fallback validity: '+'-prefixed with ≥11 digits
    * (normalization.py:282-294). */
  def isValid(value: String): Boolean = {
    val s = Option(value).getOrElse("").trim
    s.startsWith("+") && digitsOf(s).length >= 11
  }

  /** Render `valuexEXT` (normalization.py:330-332). */
  def withExtension(value: String, extension: String): String = {
    val ext = Option(extension).getOrElse("").trim
    if (ext.nonEmpty) s"${value}x$ext" else value
  }

  /** Format + validate with a whitespace-compacted retry
    * (combine_contacts.py:1230-1241). Returns (value, isConfident):
    * confident → E.164 string, else the trimmed raw value. */
  def normalizeValue(value: String): (String, Boolean) = {
    val raw = Option(value).getOrElse("")
    val primary = formatE164(raw)
    if (primary.nonEmpty && isValid(primary)) (primary, true)
    else {
      val compact = raw.replaceAll("\\s+", "")
      if (compact.nonEmpty && compact != raw) {
        val retried = formatE164(compact)
        if (retried.nonEmpty && isValid(retried)) (retried, true)
        else (raw.trim, false)
      } else (raw.trim, false)
    }
  }
}
