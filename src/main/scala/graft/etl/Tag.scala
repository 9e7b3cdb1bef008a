package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stage 4: rule-based tagging + referral priority
  * (tagging.py:10-122, tag_contacts.py:19-31). All column expressions:
  * keyword regexes over a concat blob, higher-order `exists` over the
  * typed channel arrays — one narrow projection at any scale.
  */
object Tag {

  final case class TagSettings(
      priorCompanies: Seq[String] = Seq(
        "gridgain", "red hat", "tetrate", "redhat", "oracle",
        "teamlogic", "teamlogic it"),
      priorDomains: Seq[String] = Seq(
        "gridgain.com", "redhat.com", "tetrate.io", "oracle.com",
        "teamlogicit.com"),
      localCities: Seq[String] = Seq(
        "braintree", "quincy", "weymouth", "dedham", "milton", "hingham"))

  /** The tag CLI's no-config fallback settings: EMPTY prior
    * company/domain lists (config_loader.py:141 defaults — so a bare
    * `contacts-tag` run never tags work_colleague) and the full
    * eleven-city DEFAULT_LOCAL_CITIES (tag_contacts.py:19-31).
    * config.yaml narrows the cities to the six in [[TagSettings]] and
    * supplies the company/domain lists. */
  val CliDefaultSettings: TagSettings = TagSettings(
    priorCompanies = Nil,
    priorDomains = Nil,
    localCities = Seq(
      "braintree", "quincy", "weymouth", "dedham", "milton", "hingham",
      "needham", "brookline", "cambridge", "somerville", "boston"))

  val MartialRe = "tai\\s*chi|wu\\s*an|wu\\s*dao|kung\\s*fu|shaolin|martial\\s*arts"
  val NutcrackerRe = "nutcracker|\\bcherub(s)?\\b|jose\\s*mateo|ballet"

  /** Per-contact notes blob from the raw-source notes re-reads
    * (tag_contacts.py:85-107): lineage ⨝ notes on (source,
    * source_row_id), snippets joined " | " in source-load order
    * (linkedin, gmail, mac_vcf — the reference's concatenation order)
    * then source_row_id order, made deterministic via array_sort over
    * (rank, row, note) structs rather than relying on partition order.
    *
    * `notes` columns: source, source_row_id, note — union of
    * [[graft.sources.Sources.gmailNotes]] / `vcfNotes`. */
  def notesBlob(lineage: DataFrame, notes: DataFrame): DataFrame = {
    val rank = when(col("source") === "linkedin", 0)
      .when(col("source") === "gmail", 1).otherwise(2)
    lineage.select(col("contact_id"), col("source"), col("source_row_id"))
      .join(notes, Seq("source", "source_row_id"))
      .groupBy(col("contact_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(rank.as("r"),
          col("source_row_id").cast("long").as("i"), col("note").as("n")))),
        x => x.getField("n")), " | ").as("notes_blob"))
  }

  /** Adds boolean tag columns, a sorted pipe-joined `tags` column, the
    * relationship category, and referral_priority. Expects columns:
    * company, title, linkedin_url, notes_blob, emails, addresses,
    * confidence_score. */
  def withTags(df: DataFrame, s: TagSettings = TagSettings()): DataFrame = {
    val blob = lower(concat_ws(" ",
      col("company"), col("title"), col("linkedin_url"), col("notes_blob")))
    val companyLower = lower(trim(col("company")))
    val priorCompanyHit = s.priorCompanies
      .map(p => companyLower.contains(p))
      .foldLeft(lit(false))(_ || _) // empty list (CLI default) → never hits
    val domainOf = (e: Column) =>
      when(e.getField("value").contains("@"),
        lower(element_at(split(e.getField("value"), "@"), 2))).otherwise("")
    val priorDomainHit =
      if (s.priorDomains.isEmpty) lit(false)
      else exists(col("emails"), e =>
        s.priorDomains.map(d => domainOf(e).contains(d)).reduce(_ || _))
    val cityMatch = (a: Column) => {
      val city = lower(trim(a.getField("city")))
      s.localCities.map(lc => city === lc || city.contains(lc)).reduce(_ || _)
    }
    val localHit = exists(col("addresses"), a =>
      lower(trim(a.getField("state"))) === "ma" && cityMatch(a))

    val tagged = df
      .withColumn("tag_martial_arts", blob.rlike(MartialRe))
      .withColumn("tag_nutcracker", blob.rlike(NutcrackerRe))
      .withColumn("tag_work_colleague",
        (companyLower =!= "" && priorCompanyHit) || priorDomainHit)
      .withColumn("tag_local_south_shore", localHit)

    tagged
      .withColumn("tags", concat_ws("|", array_sort(filter(array(
        when(col("tag_martial_arts"), "martial_arts"),
        when(col("tag_nutcracker"), "nutcracker_performance"),
        when(col("tag_work_colleague"), "work_colleague"),
        when(col("tag_local_south_shore"), "local_south_shore")), _.isNotNull))))
      .withColumn("relationship_category",
        when(col("tag_martial_arts") || col("tag_nutcracker"), "personal")
          .when(col("tag_work_colleague") || trim(col("linkedin_url")) =!= "", "professional")
          .when(col("tag_local_south_shore"), "local_referral")
          .otherwise("uncategorized"))
      .withColumn("referral_priority",
        least(lit(100), round(
          col("confidence_score") * 0.6 +
            when(col("tag_martial_arts"), 30).otherwise(0) +
            when(col("tag_nutcracker"), 25).otherwise(0) +
            when(col("tag_work_colleague"), 20).otherwise(0) +
            when(col("tag_local_south_shore"), 10).otherwise(0), 0)).cast("int"))
  }
}
