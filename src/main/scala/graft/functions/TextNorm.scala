package graft.functions

import java.text.Normalizer

/** Text-key normalization and email/label primitives.
  *
  * Semantics mirror the reference's `_norm`, `validate_email_safe`
  * (fallback path — the library path needs network access, out of scope
  * per reference tests), and `_normalize_label_generic`
  * (reference: normalization.py:241-247, 266-279, 927-929).
  */
object TextNorm {

  /** NFKD fold: decompose, strip combining marks, collapse whitespace,
    * lowercase. Equivalent to the reference's `_norm`. */
  def norm(text: String): String = {
    val s = Option(text).getOrElse("").trim
    if (s.isEmpty) ""
    else {
      val decomposed = Normalizer.normalize(s, Normalizer.Form.NFKD)
      val stripped = decomposed.filterNot(ch => Character.getType(ch) == Character.NON_SPACING_MARK)
      stripped.replaceAll("\\s+", " ").toLowerCase
    }
  }

  /** The reference's EMAIL_RE (normalization.py:39). */
  val EmailRe = "^[A-Za-z0-9._%+\\-']+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}$".r

  /** Fallback email validation: strip spaces, lowercase, regex gate.
    * Returns normalized email or "" (normalization.py:266-279). */
  def validateEmail(raw: String): String = {
    val candidate0 = Option(raw).getOrElse("").trim
    if (candidate0.isEmpty) ""
    else {
      val candidate = candidate0.replace(" ", "").toLowerCase
      if (EmailRe.findFirstIn(candidate).isDefined) candidate else ""
    }
  }

  /** Lowercased/trimmed label (normalization.py:927-929). */
  def normLabel(label: String): String =
    Option(label).getOrElse("").trim.toLowerCase

  /** first.last@… local-part → (First, Last) (normalization.py:680-684). */
  def guessNameFromEmailLocal(local: String): (String, String) = {
    val parts = Option(local).getOrElse("").split("[._-]+").filter(_.nonEmpty)
    (if (parts.length > 0) titleCase(parts(0)) else "",
      if (parts.length > 1) titleCase(parts(1)) else "")
  }

  /** Python str.title() for a single token: capitalize after any
    * non-alpha boundary. */
  def titleCase(s: String): String = {
    val sb = new StringBuilder
    var prevAlpha = false
    for (ch <- s) {
      if (Character.isLetter(ch)) {
        sb.append(if (prevAlpha) Character.toLowerCase(ch) else Character.toUpperCase(ch))
        prevAlpha = true
      } else { sb.append(ch); prevAlpha = false }
    }
    sb.toString
  }

  /** If email local = <1-2 char prefix> + lastname, return the first
    * initial uppercased (normalization.py:687-694). */
  def reconcileNameFromEmailAndLast(local: String, last: String): String = {
    val localLower = Option(local).getOrElse("").toLowerCase
    val lastLower = Option(last).getOrElse("").toLowerCase
    if (lastLower.nonEmpty && localLower.endsWith(lastLower) && localLower.length > lastLower.length) {
      val prefix = localLower.dropRight(lastLower.length)
      if (prefix.length >= 1 && prefix.length <= 2) prefix.take(1).toUpperCase else ""
    } else ""
  }
}
