package graft

import graft.etl.Config
import org.scalatest.funsuite.AnyFunSuite

/** Config precedence (CLI > yaml > default) incl. the reference's
  * documented quirks (config_loader.py:82-165, SURVEY.md §2.9.4-5).
  */
class ConfigSpec extends AnyFunSuite {

  private val yaml =
    """inputs:
      |  linkedin_csv: ./data/linkedin.csv
      |  gmail_csv: ./data/gmail.csv
      |outputs:
      |  dir: ./output
      |normalization:
      |  default_phone_country: US
      |  drop_invalid_emails: true
      |  keep_generational_suffixes:
      |  - jr
      |  - sr
      |dedupe:
      |  enable_nickname_equivalence: true
      |  merge_score_threshold: 1.5
      |  require_corroborator: false
      |quality:
      |  email_full_score: 45
      |tagging:
      |  prior_companies:
      |  - acme
      |  - globex
      |logging:
      |  level: info
      |""".stripMargin

  test("yaml subset parses sections, scalars and lists") {
    val y = Config.parseYaml(yaml)
    assert(y("inputs")("linkedin_csv") == "./data/linkedin.csv")
    assert(y("normalization")("keep_generational_suffixes") == Vector("jr", "sr"))
    assert(y("dedupe")("merge_score_threshold") == "1.5")
  }

  test("match_key_frequency_cap: engine-extension knob, absent means off") {
    assert(Config.load(Config.Cli(), Some(yaml)).dedupe.matchKeyFrequencyCap.isEmpty)
    val withCap = yaml.replace("  require_corroborator: false",
      "  require_corroborator: false\n  match_key_frequency_cap: 1000")
    assert(Config.load(Config.Cli(), Some(withCap)).dedupe.matchKeyFrequencyCap
      .contains(1000L))
  }

  test("precedence: CLI beats yaml beats default") {
    val r = Config.load(Config.Cli(
      gmailCsv = Some("/cli/gmail.csv"),
      mergeScoreThreshold = Some(2.0)), Some(yaml))
    assert(r.inputs("gmail_csv").contains("/cli/gmail.csv"))     // CLI
    assert(r.inputs("linkedin_csv").contains("./data/linkedin.csv")) // yaml
    assert(r.inputs("mac_vcf").isEmpty)                          // absent
    assert(r.dedupe.mergeScoreThreshold == 2.0)                  // CLI
    assert(r.dedupe.relaxedMergeThreshold == 0.6)                // default
    assert(r.normalization.dropInvalidEmails)                    // yaml
    assert(r.normalization.genSuffixes == Set("jr", "sr"))       // yaml list
    assert(r.quality.emailFull == 45 && r.quality.emailPartial == 20)
    assert(r.tagging.priorCompanies == Seq("acme", "globex"))
    assert(r.logLevel == "INFO")
  }

  test("quirk: explicit 0.0 threshold on the CLI falls back to yaml (SURVEY §2.9.5)") {
    val r = Config.load(Config.Cli(mergeScoreThreshold = Some(0.0)), Some(yaml))
    assert(r.dedupe.mergeScoreThreshold == 1.5) // python falsy-or
  }

  test("quirk: require_corroborator CLI flag only force-enables (SURVEY §2.9.4)") {
    val yamlOn = yaml.replace("require_corroborator: false", "require_corroborator: true")
    // CLI flag absent, yaml true -> true; flag present -> true regardless.
    assert(Config.load(Config.Cli(), Some(yamlOn)).dedupe.requireCorroborator)
    assert(Config.load(Config.Cli(requireCorroborator = true), Some(yaml)).dedupe.requireCorroborator)
    assert(!Config.load(Config.Cli(), Some(yaml)).dedupe.requireCorroborator)
  }

  test("nickname equivalence is tri-state: explicit CLI false wins") {
    val r = Config.load(Config.Cli(enableNicknameEquivalence = Some(false)), Some(yaml))
    assert(!r.dedupe.nicknameEquivalence)
    assert(Config.load(Config.Cli(), Some(yaml)).dedupe.nicknameEquivalence)
  }

  test("no yaml: all defaults") {
    val r = Config.load(Config.Cli())
    assert(r.dedupe == graft.etl.ContactLogic.DedupeConfig())
    assert(r.quality == graft.etl.Score.QualityWeights())
    assert(r.logLevel == "WARNING")
  }
}
