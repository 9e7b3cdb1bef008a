package graft.sources

import scala.collection.mutable

/** Channel-cell parsing shared by the Gmail/vCard readers: label
  * normalization, Google `:::` multi-value splits, phone-extension
  * stripping, vCard TYPE-token and Apple-label handling, and the
  * insertion-ordered first-wins channel maps.
  * Reference: combine_contacts.py:339-522.
  */
object Channels {

  /** `\+?\d[\d\s()./-]{6,}\d` (combine_contacts.py:107). */
  private val PhoneValue = """\+?\d[\d\s()./-]{6,}\d""".r
  private val GoogleMulti = ":::+"
  private val ExtOnly = """(?i)^(?:ext\.?|extension|x)?\s*(\d{1,6})$""".r
  private val InlineExt =
    """(?is)^(.+?)(?:[\s,;/]*(?:ext\.?|extension|x)\s*(\d{1,6})|p(\d{1,6})#)\s*$""".r

  def splitGoogleMulti(raw: String): Seq[String] =
    Option(raw).getOrElse("").split(GoogleMulti, -1).map(_.trim).filter(_.nonEmpty).toSeq

  /** Gmail label parse (combine_contacts.py:371-393): leading `*` marks
    * preferred; mobile/cell/iphone bucket (phones), then work/home/other
    * contains-checks; any other non-empty label → other. */
  def parseGmailLabel(rawLabel: String, channel: String): (String, Boolean) = {
    var label = Option(rawLabel).getOrElse("").trim
    var preferred = false
    if (label.startsWith("*")) { preferred = true; label = label.dropWhile(_ == '*').trim }
    val lowered = label.toLowerCase
    val normalized =
      if (channel == "phone" && Seq("mobile", "cell", "iphone").exists(lowered.contains)) "mobile"
      else if (lowered.contains("work")) "work"
      else if (lowered.contains("home")) "home"
      else if (lowered.contains("other")) "other"
      else if (lowered.nonEmpty) "other"
      else ""
    (normalized, preferred)
  }

  /** vCard TYPE= parameter tokens: drop pref/internet, strip x- prefix
    * (combine_contacts.py:425-450). */
  def extractTypeTokens(params: Seq[String]): Seq[String] = {
    val raw = params.filter(_.nonEmpty).flatMap { param =>
      if (param.contains("=")) {
        val Array(key, value) = param.split("=", 2)
        if (key.trim.toLowerCase == "type")
          value.split("[;,]").map(_.trim).filter(_.nonEmpty).map(_.toLowerCase).toSeq
        else Seq.empty
      } else param.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLowerCase).toSeq
    }
    raw.flatMap { token0 =>
      if (token0 == "pref" || token0 == "internet") None
      else {
        val token = if (token0.startsWith("x-")) token0.drop(2) else token0
        if (token.nonEmpty) Some(token) else None
      }
    }
  }

  /** Apple `_$!<Work>!$_` label → `work` via the 3-entry token map;
    * anything else lowercased raw. (The reference's regex fallback,
    * APPLE_LABEL_PATTERN at combine_contacts.py:200, contains an
    * unescaped `$` anchor mid-pattern and can never match — so only the
    * work/home/other token map applies; replicated for parity.) */
  def normalizeAppleLabel(label: String): String = {
    val raw = Option(label).getOrElse("").trim
    if (raw.isEmpty) return ""
    val lowered = raw.toLowerCase
    Map("_$!<work>!$_" -> "work", "_$!<home>!$_" -> "home", "_$!<other>!$_" -> "other")
      .getOrElse(lowered, lowered)
  }

  /** Unescape `\;` `\,` `\n` `\N` `\\` (combine_contacts.py:473-485).
    * Applied in the reference's fixed replacement order. */
  def unescapeVcard(value: String): String =
    Option(value).getOrElse("")
      .replace("\\;", ";").replace("\\,", ",")
      .replace("\\n", "\n").replace("\\N", "\n").replace("\\\\", "\\")

  /** Trailing `;1234`, `x/ext/extension NNN`, `pNNN#` → (number, ext)
    * (combine_contacts.py:488-503). */
  def stripPhoneExtension(segment0: String): (String, String) = {
    val segment = Option(segment0).getOrElse("").trim
    if (segment.contains(";")) {
      val cut = segment.lastIndexOf(';')
      val candidate = segment.substring(cut + 1).trim
      if (candidate.nonEmpty && candidate.forall(_.isDigit) && candidate.length <= 6)
        return (segment.substring(0, cut).trim, candidate)
    }
    segment match {
      case InlineExt(number, ext, ext2) =>
        val extension = Option(ext).getOrElse(Option(ext2).getOrElse("")).trim
        val base = Option(number).getOrElse("").replaceAll("[\\s,;/]+$", "").trim
        if (extension.nonEmpty && base.nonEmpty) (base, extension) else (segment, "")
      case _ => (segment, "")
    }
  }

  /** Orphan extension tokens fold into the previous phone
    * (combine_contacts.py:506-522). */
  def mergePhoneExtensions(values: Seq[(String, String)]): Seq[(String, String)] = {
    val merged = mutable.ArrayBuffer.empty[(String, String)]
    for ((value0, extension0) <- values) {
      val value = Option(value0).getOrElse("").trim
      val extension = Option(extension0).getOrElse("").trim
      if (value.isEmpty) {
        if (extension.nonEmpty && merged.nonEmpty && merged.last._2.isEmpty)
          merged(merged.length - 1) = (merged.last._1, extension)
      } else value match {
        case ExtOnly(ext) if extension.isEmpty && merged.nonEmpty && merged.last._2.isEmpty =>
          merged(merged.length - 1) = (merged.last._1, ext)
        case _ => merged += ((value, extension))
      }
    }
    merged.toSeq
  }

  /** Split a raw Gmail email cell on newlines/pipes/semicolons then
    * `:::` (combine_contacts.py:585-595). */
  def extractEmailValues(raw: String): Seq[String] =
    Option(raw).getOrElse("").split("[\r\n|;]+").map(_.trim).filter(_.nonEmpty).toSeq
      .flatMap(part => { val sub = splitGoogleMulti(part); if (sub.nonEmpty) sub else Seq(part) })

  /** Split a raw Gmail phone cell and regex-extract phone-shaped values
    * with inline-extension attachment (combine_contacts.py:339-360). */
  def extractPhoneValues(raw: String): Seq[(String, String)] = {
    val candidates = Option(raw).getOrElse("").split("[\r\n|;]+").map(_.trim)
      .filter(_.nonEmpty).toSeq
      .flatMap { part =>
        val segments = { val sub = splitGoogleMulti(part); if (sub.nonEmpty) sub else Seq(part) }
        segments.flatMap { segment =>
          val (base, inlineExt) = stripPhoneExtension(segment)
          val matches = PhoneValue.findAllIn(base).toSeq
          if (matches.nonEmpty)
            matches.zipWithIndex.map { case (m, idx) =>
              (m.trim, if (inlineExt.nonEmpty && idx == matches.length - 1) inlineExt else "")
            }
          else {
            val stripped = base.trim
            if (stripped.nonEmpty) Seq((stripped, inlineExt)) else Seq.empty
          }
        }
      }
    mergePhoneExtensions(candidates.filter(_._1.nonEmpty))
  }

  /** Insertion-ordered first-wins map with empty→non-empty label upgrade
    * (combine_contacts.py:396-422 `_record_email`/`_record_phone`). */
  final class LabelMap[K] {
    private val map = mutable.LinkedHashMap.empty[K, String]
    def record(key: K, label: String): Unit = {
      val labelNorm = Option(label).getOrElse("").trim.toLowerCase
      map.get(key) match {
        case None => map(key) = labelNorm
        case Some(current) if current.isEmpty && labelNorm.nonEmpty => map(key) = labelNorm
        case _ =>
      }
    }
    def entries: Seq[(K, String)] = map.toSeq
  }
}
