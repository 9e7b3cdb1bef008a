package graft.etl

/** Pipeline configuration with the reference's precedence semantics:
  * CLI > yaml > default (config_loader.py:82-165). Zero-dependency:
  * the yaml reader below handles the flat two-level subset the
  * reference's config.yaml actually uses (scalar `key: value` pairs
  * under a section plus `- item` lists).
  *
  * Replicated quirks (SURVEY.md §2.9.4-5), deliberate and tested:
  *   - `require_corroborator` is an argparse store_true flag, so the
  *     CLI can only force-ENABLE it, never disable
  *     (combine_contacts.py:1544) — modeled as a plain Boolean that
  *     ORs with the yaml value.
  *   - Numeric thresholds resolve with Python falsy-or (`args.x or
  *     cfg.x`): an explicit `0.0` on the CLI falls back to the yaml /
  *     default value (config_loader.py:116-121).
  *   - `enable_nickname_equivalence` is the one option resolved with a
  *     proper None-check, so an explicit CLI `false` DOES win.
  */
object Config {

  /** CLI argument surface (None = not given). */
  final case class Cli(
      outDir: Option[String] = None,
      linkedinCsv: Option[String] = None,
      gmailCsv: Option[String] = None,
      macVcf: Option[String] = None,
      defaultPhoneCountry: Option[String] = None,
      mergeScoreThreshold: Option[Double] = None,
      relaxedMergeThreshold: Option[Double] = None,
      firstNameSimilarityThreshold: Option[Double] = None,
      enableNicknameEquivalence: Option[Boolean] = None,
      requireCorroborator: Boolean = false,
      logLevel: Option[String] = None)

  /** Fully-resolved configuration, mapped onto the stage settings the
    * library actually consumes. */
  final case class Resolved(
      inputs: Map[String, Option[String]],
      outputsDir: String,
      /** `outputs.single_file` (engine extension, default true =
        * reference-parity single-CSV artifacts). `false` selects the
        * scale sink mode: part-files written at the upstream
        * parallelism ([[Artifacts.writeCsv]]); the stage CLIs read
        * both layouts, so any prefix of the pipeline can run in scale
        * mode and the rest in parity mode. */
      outputSingleFile: Boolean,
      normalization: ContactLogic.Settings,
      dedupe: ContactLogic.DedupeConfig,
      quality: Score.QualityWeights,
      tagging: Tag.TagSettings,
      logLevel: String)

  /** Parse the two-level yaml subset: `section:` headers at column 0,
    * `  key: value` scalars, `  key:` followed by `  - item` lists.
    * Comments (#...) and blank lines skipped; quotes stripped. */
  def parseYaml(text: String): Map[String, Map[String, Any]] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.LinkedHashMap[String, Any]]
    var section: Option[String] = None
    var listKey: Option[String] = None
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t
    }
    for (raw <- text.linesIterator) {
      val noComment = {
        val hash = raw.indexOf('#')
        if (hash >= 0 && !raw.take(hash).contains('"')) raw.take(hash) else raw
      }
      val line = noComment.replaceAll("\\s+$", "")
      if (line.trim.nonEmpty) {
        val indented = line.startsWith(" ") || line.startsWith("\t")
        val t = line.trim
        if (!indented && t.endsWith(":")) {
          section = Some(t.dropRight(1))
          listKey = None
          out.getOrElseUpdate(section.get, scala.collection.mutable.LinkedHashMap.empty)
        } else if (t.startsWith("- ") || t == "-") {
          for (s <- section; k <- listKey) {
            val cur = out(s).getOrElse(k, Vector.empty[String]).asInstanceOf[Vector[String]]
            out(s)(k) = cur :+ unquote(t.stripPrefix("-").trim)
          }
        } else if (indented && t.contains(":")) {
          val Array(k, v) = t.split(":", 2)
          for (s <- section) {
            if (v.trim.isEmpty) { listKey = Some(k.trim); out(s)(k.trim) = Vector.empty[String] }
            else { listKey = None; out(s)(k.trim) = unquote(v) }
          }
        }
      }
    }
    out.map { case (k, v) => k -> v.toMap }.toMap
  }

  private def str(y: Map[String, Map[String, Any]], section: String, key: String): Option[String] =
    y.get(section).flatMap(_.get(key)).collect { case s: String => s }
  private def dbl(y: Map[String, Map[String, Any]], section: String, key: String): Option[Double] =
    str(y, section, key).flatMap(s => scala.util.Try(s.toDouble).toOption)
  private def bool(y: Map[String, Map[String, Any]], section: String, key: String): Option[Boolean] =
    str(y, section, key).map(_.equalsIgnoreCase("true"))
  private def list(y: Map[String, Map[String, Any]], section: String, key: String): Option[Seq[String]] =
    y.get(section).flatMap(_.get(key)).collect { case v: Vector[_] => v.map(_.toString) }

  /** Python falsy-or for numerics: explicit 0.0 falls through. */
  private def falsyOr(cli: Option[Double], cfg: Option[Double], default: Double): Double =
    cli.filter(_ != 0.0).orElse(cfg.filter(_ != 0.0)).getOrElse(default)

  def load(cli: Cli, yamlText: Option[String] = None): Resolved = {
    val y = yamlText.map(parseYaml).getOrElse(Map.empty)

    val normalization = ContactLogic.Settings(
      genSuffixes = list(y, "normalization", "keep_generational_suffixes")
        .map(_.map(_.toLowerCase).toSet)
        .getOrElse(graft.functions.Names.DefaultGenSuffixes),
      profSuffixes = list(y, "normalization", "professional_suffixes")
        .map(_.map(_.toLowerCase).toSet)
        .getOrElse(graft.functions.Names.DefaultProfSuffixes),
      namePrefixes = list(y, "normalization", "name_prefixes")
        .map(_.map(_.toLowerCase).toSet)
        .getOrElse(graft.functions.Names.DefaultNamePrefixes),
      defaultPhoneCountry = cli.defaultPhoneCountry
        .orElse(str(y, "normalization", "default_phone_country")).getOrElse("US"),
      dropInvalidEmails = bool(y, "normalization", "drop_invalid_emails").getOrElse(false),
      dropInvalidPhones = bool(y, "normalization", "drop_invalid_phones").getOrElse(false))

    val dedupe = ContactLogic.DedupeConfig(
      mergeScoreThreshold =
        falsyOr(cli.mergeScoreThreshold, dbl(y, "dedupe", "merge_score_threshold"), 1.2),
      relaxedMergeThreshold =
        falsyOr(cli.relaxedMergeThreshold, dbl(y, "dedupe", "relaxed_merge_threshold"), 0.6),
      firstNameSimilarityThreshold = falsyOr(cli.firstNameSimilarityThreshold,
        dbl(y, "dedupe", "first_name_similarity_threshold"), 0.88),
      // proper tri-state: explicit CLI false wins (config_loader.py:109-113)
      nicknameEquivalence = cli.enableNicknameEquivalence
        .getOrElse(bool(y, "dedupe", "enable_nickname_equivalence").getOrElse(true)),
      // store_true: CLI can only force-enable (combine_contacts.py:1544)
      requireCorroborator = cli.requireCorroborator ||
        bool(y, "dedupe", "require_corroborator").getOrElse(false),
      // engine extension (no reference equivalent): stop-key
      // suppression for candidate generation at corpus scale
      matchKeyFrequencyCap =
        dbl(y, "dedupe", "match_key_frequency_cap").map(_.toLong).filter(_ > 0))

    val quality = Score.QualityWeights(
      emailFull = dbl(y, "quality", "email_full_score").map(_.toInt).getOrElse(40),
      emailPartial = dbl(y, "quality", "email_partial_score").map(_.toInt).getOrElse(20),
      phoneFull = dbl(y, "quality", "phone_full_score").map(_.toInt).getOrElse(30),
      phonePartial = dbl(y, "quality", "phone_partial_score").map(_.toInt).getOrElse(15),
      addressAny = dbl(y, "quality", "address_any_score").map(_.toInt).getOrElse(30))

    val tagging = Tag.TagSettings(
      priorCompanies = list(y, "tagging", "prior_companies")
        .getOrElse(Tag.TagSettings().priorCompanies),
      priorDomains = list(y, "tagging", "prior_domains")
        .getOrElse(Tag.TagSettings().priorDomains),
      localCities = list(y, "tagging", "local_cities")
        .getOrElse(Tag.TagSettings().localCities))

    Resolved(
      inputs = Map(
        "linkedin_csv" -> cli.linkedinCsv.orElse(str(y, "inputs", "linkedin_csv")),
        "gmail_csv" -> cli.gmailCsv.orElse(str(y, "inputs", "gmail_csv")),
        "mac_vcf" -> cli.macVcf.orElse(str(y, "inputs", "mac_vcf"))),
      outputsDir = cli.outDir.orElse(str(y, "outputs", "dir"))
        .getOrElse(System.getProperty("user.dir")),
      outputSingleFile = bool(y, "outputs", "single_file").getOrElse(true),
      normalization = normalization,
      dedupe = dedupe,
      quality = quality,
      tagging = tagging,
      logLevel = cli.logLevel.orElse(str(y, "logging", "level")).getOrElse("WARNING").toUpperCase)
  }
}
