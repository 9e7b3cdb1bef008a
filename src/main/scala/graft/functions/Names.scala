package graft.functions

import scala.collection.mutable.ListBuffer

/** Name grammar: multi-word-surname split and the full strip/parse
  * pipeline. Reference: normalization.py:404-540 (particles :183-206,
  * default suffix/prefix sets combine_contacts.py + config.yaml).
  */
object Names {

  val Particles: Set[String] = Set(
    "da", "de", "del", "della", "der", "di", "la", "le", "van", "von",
    "den", "ten", "ter", "du", "st", "st.", "san", "mac", "mc", "o", "d", "l")

  /** Defaults mirroring config.yaml:10-63. */
  val DefaultGenSuffixes: Set[String] = Set("jr", "sr", "ii", "iii", "iv", "v", "vi")
  val DefaultProfSuffixes: Set[String] = Set(
    "phd", "pmp", "csm", "spc6", "ccim", "phr", "shrm", "shrmcp", "cp",
    "mba", "cissp", "crisc", "cscp", "cams", "cpa", "cfa", "pe", "cisa",
    "cism", "cfe", "cma", "ceh", "itil", "sixsigma", "leansixsigma",
    "esq", "jd", "ms", "rdn", "ld", "mpa", "ise", "md", "mph")
  val DefaultNamePrefixes: Set[String] = Set(
    "dr", "mr", "mrs", "ms", "miss", "prof", "sir", "madam")

  /** Strip non-alnum + lowercase (normalization.py:396-401). */
  def normToken(token: String): String =
    Option(token).getOrElse("").toLowerCase.replaceAll("[^a-z0-9]", "")

  /** "J." or single uppercase letter (normalization.py:404-410). */
  def looksLikeInitial(token: String): Boolean = {
    val t = Option(token).getOrElse("").trim
    (t.length == 2 && t(1) == '.' && t(0).isLetter) ||
      (t.length == 1 && t(0).isLetter && t(0).isUpper)
  }

  /** (first, middle, last) with multi-word surname detection via the
    * particle set + lowercase-token heuristic (normalization.py:413-438). */
  def parseMultiLast(nameStr: String): (String, String, String) = {
    if (nameStr == null || nameStr.isEmpty) return ("", "", "")
    val tokens = nameStr.split("\\s+").filter(_.nonEmpty)
    if (tokens.isEmpty) return ("", "", "")
    if (tokens.length == 1) return (tokens(0), "", "")
    val lastParts = ListBuffer(tokens.last)
    var idx = tokens.length - 2
    var continue = true
    while (idx >= 1 && continue) {
      val token = tokens(idx)
      val tokenClean = token.toLowerCase.replaceAll("^\\.+|\\.+$", "")
      if ((Particles.contains(tokenClean) && !looksLikeInitial(token)) ||
          (Set("o", "d", "l").contains(tokenClean) && idx + 1 < tokens.length &&
            tokens(idx + 1).contains("'"))) {
        lastParts.prepend(token); idx -= 1
      } else if (token.nonEmpty && token(0).isLower && tokens(idx + 1)(0).isUpper) {
        lastParts.prepend(token); idx -= 1
      } else continue = false
    }
    val first = tokens(0)
    val middle = if (idx >= 1) tokens.slice(1, idx + 1).mkString(" ") else ""
    (first, middle, lastParts.mkString(" "))
  }

  /** Output of the full name grammar. */
  final case class Parsed(
      first: String, middle: String, last: String, genSuffix: String,
      professional: Seq[String], maiden: String, prefix: String, fullClean: String)

  /** Full grammar (normalization.py:441-540): extract parenthesized
    * text, split on commas/dashes, strip name prefixes, trailing
    * professional-suffix groups (split on \/|&+), generational
    * suffixes, rebuild the clean full name. */
  def stripAndParse(
      fullName: String,
      genSuffixes: Set[String] = DefaultGenSuffixes,
      profSuffixes: Set[String] = DefaultProfSuffixes,
      namePrefixes: Set[String] = DefaultNamePrefixes): Parsed = {
    if (fullName == null || fullName.trim.isEmpty)
      return Parsed("", "", "", "", Nil, "", "", "")
    var name = fullName.trim
    var maiden = ""
    var parenText = ""
    val parenRe = "\\(([^)]+)\\)".r
    parenRe.findFirstMatchIn(name).foreach { m =>
      parenText = m.group(1).trim
      name = (name.substring(0, m.start) + name.substring(m.end)).trim
    }
    val parts = name.split("[,\\u2013\\u2014-]+").map(_.trim).filter(_.nonEmpty)
    val keptParts = ListBuffer.empty[String]
    var genSuffix = ""
    val professional = ListBuffer.empty[String]
    var prefixValue = ""

    def extractProfParts(token: String): Seq[String] = {
      val tokenClean = token.trim
      if (tokenClean.isEmpty) return Nil
      val normalized = normToken(tokenClean)
      if (profSuffixes.contains(normalized) || normalized.endsWith("spc6"))
        return Seq(tokenClean)
      val cands = tokenClean.split("[\\\\/|&+]+").map(_.trim).filter(_.nonEmpty)
      if (cands.length > 1) {
        val out = ListBuffer.empty[String]
        for (c <- cands) {
          val n = normToken(c)
          if (profSuffixes.contains(n) || n.endsWith("spc6")) out += c
          else return Nil
        }
        out.toSeq
      } else Nil
    }

    for (part <- parts) {
      var tokens = ListBuffer(part.split("\\s+").filter(_.nonEmpty).toIndexedSeq: _*)
      // consume leading prefix tokens
      val consumed = ListBuffer.empty[String]
      while (tokens.nonEmpty && namePrefixes.contains(normToken(tokens.head))) {
        consumed += tokens.remove(0)
      }
      if (consumed.nonEmpty && prefixValue.isEmpty) prefixValue = consumed.mkString(" ")
      if (tokens.nonEmpty) {
        val trailingGroups = ListBuffer.empty[Seq[String]]
        var going = true
        while (tokens.nonEmpty && going) {
          val profParts = extractProfParts(tokens.last)
          if (profParts.nonEmpty) { tokens.remove(tokens.length - 1); trailingGroups += profParts }
          else going = false
        }
        for (group <- trailingGroups.reverse) professional ++= group
        while (tokens.nonEmpty && genSuffixes.contains(normToken(tokens.last))) {
          genSuffix = tokens.remove(tokens.length - 1)
        }
        if (tokens.length == 1) {
          val token = tokens.head
          val profParts = extractProfParts(token)
          if (profParts.nonEmpty) professional ++= profParts
          else if (genSuffixes.contains(normToken(token))) genSuffix = token
          else keptParts += tokens.mkString(" ")
        } else if (tokens.nonEmpty) keptParts += tokens.mkString(" ")
      }
    }

    if (parenText.nonEmpty) {
      val maidenTokens = ListBuffer.empty[String]
      for (token <- parenText.split("[,/&;]+").map(_.trim).filter(_.nonEmpty)) {
        val profParts = extractProfParts(token)
        if (profParts.nonEmpty) professional ++= profParts
        else maidenTokens += token
      }
      if (maidenTokens.nonEmpty) maiden = maidenTokens.mkString(" ")
    }

    val base = keptParts.mkString(" ").trim
    val (first, middle, last) = parseMultiLast(base)
    val fullClean = Seq(prefixValue, first, middle, last, genSuffix)
      .filter(_.nonEmpty).mkString(" ").trim
    Parsed(first, middle, last, genSuffix, professional.toSeq, maiden, prefixValue, fullClean)
  }
}
