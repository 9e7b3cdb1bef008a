package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stages 2-3: validation metrics + quality score
  * (validate_quality.py:21-190) and confidence score + buckets
  * (confidence_report.py:52-177, 222-232).
  *
  * The reference re-parses pipe-joined "value::label" strings and JSON
  * between process stages; here the channels stay typed arrays so every
  * rule is a whole-stage-codegen column expression over one scan — the
  * 100 TB form is a single narrow projection, no shuffle, no UDF.
  */
object Score {

  final case class QualityWeights(
      emailFull: Int = 40, emailPartial: Int = 20,
      phoneFull: Int = 30, phonePartial: Int = 15,
      addressAny: Int = 30)

  private def nonBlank(c: Column): Column = trim(c) =!= ""

  /** Adds email/phone/address validity counters + quality_score.
    * Expects typed channel columns `emails`, `phones`, `addresses`
    * (merged output: labels are never empty, "invalid" marks rejects —
    * SURVEY.md §2.9.6: validation trusts labels). */
  def withValidationMetrics(df: DataFrame, w: QualityWeights = QualityWeights()): DataFrame = {
    val emailValid = size(filter(col("emails"),
      e => e.getField("value") =!= "" && lower(e.getField("label")) =!= "invalid"))
    val phoneValid = size(filter(col("phones"),
      p => p.getField("value") =!= "" && lower(p.getField("label")) =!= "invalid"))
    val addrValid = size(filter(col("addresses"),
      a => a.getField("street") =!= "" &&
        (a.getField("city") =!= "" || a.getField("postal_code") =!= "")))
    df.withColumn("email_valid_count", emailValid)
      .withColumn("email_total", size(col("emails")))
      .withColumn("phone_valid_count", phoneValid)
      .withColumn("phone_total", size(col("phones")))
      .withColumn("addr_valid_count", addrValid)
      .withColumn("addr_total", size(col("addresses")))
      .withColumn("quality_score",
        when(col("email_total") > 0 && col("email_total") === col("email_valid_count"), w.emailFull)
          .when(col("email_valid_count") > 0, w.emailPartial).otherwise(0) +
        when(col("phone_total") > 0 && col("phone_total") === col("phone_valid_count"), w.phoneFull)
          .when(col("phone_valid_count") > 0, w.phonePartial).otherwise(0) +
        when(col("addr_valid_count") > 0, w.addressAny).otherwise(0))
  }

  /** confidence_score (confidence_report.py:110-177): 0-100 additive
    * with caps, then bucketed. Requires withValidationMetrics columns +
    * source_count. */
  def withConfidence(df: DataFrame): DataFrame = {
    val corroborators =
      when(size(col("emails")) > 0, 1).otherwise(0) +
      when(size(col("phones")) > 0, 1).otherwise(0) +
      when(size(col("addresses")) > 0, 1).otherwise(0) +
      when(nonBlank(col("linkedin_url")), 1).otherwise(0)
    val workChannels =
      when(exists(col("emails"), e => e.getField("label") === "work"), 1).otherwise(0) +
      when(exists(col("phones"), p => p.getField("label") === "work"), 1).otherwise(0) +
      when(exists(col("addresses"), a => a.getField("label") === "work"), 1).otherwise(0)
    val emailAllValid = col("email_total") > 0 && col("email_total") === col("email_valid_count")
    val phoneAllValid = col("phone_total") > 0 && col("phone_total") === col("phone_valid_count")
    val addrAnyValid = col("addr_valid_count") > 0
    val allInvalid = (c: Column, valueField: String) =>
      size(c) > 0 && forall(c, e =>
        e.getField(valueField) === "" || lower(e.getField("label")) === "invalid")

    val raw =
      round(least(col("quality_score"), lit(100)) * 0.4, 0) +
      least(corroborators * 5, lit(20)) +
      when(col("source_count") >= 3, 10).when(col("source_count") === 2, 6).otherwise(2) +
      when(nonBlank(col("linkedin_url")), 6).otherwise(0) +
      when(nonBlank(col("company")) || nonBlank(col("title")), 6).otherwise(0) +
      when(nonBlank(col("department")), 3).otherwise(0) +
      when(workChannels > 0, least(workChannels * 2, lit(6))).otherwise(0) +
      when(emailAllValid, 5).otherwise(0) +
      when(phoneAllValid, 3).otherwise(0) +
      when(addrAnyValid, 2).otherwise(0) +
      when(nonBlank(col("first_name")) && nonBlank(col("last_name")), 3).otherwise(0) +
      when(nonBlank(col("full_name")), 2).otherwise(0) -
      when(allInvalid(col("emails"), "value"), 5).otherwise(0) -
      when(allInvalid(col("phones"), "value"), 4).otherwise(0)

    df.withColumn("confidence_score",
        greatest(lit(0), least(lit(100), raw)).cast("int"))
      .withColumn("confidence_bucket",
        when(col("confidence_score") >= 80, "very_high")
          .when(col("confidence_score") >= 60, "high")
          .when(col("confidence_score") >= 40, "medium")
          .otherwise("low"))
  }

  /** Bucket histogram (confidence_report.py:239-262). */
  /** Corpus validation summary (validate_quality.py:223-233): totals +
    * channel-presence percentages. */
  def validationSummary(scored: DataFrame): DataFrame = {
    def pct(c: Column) = round(
      sum(when(c > 0, 1).otherwise(0)) * lit(100.0) / count(lit(1)), 2)
    scored.agg(
      count(lit(1)).as("contacts_total"),
      pct(col("email_total")).as("has_any_email_pct"),
      pct(col("phone_total")).as("has_any_phone_pct"),
      pct(col("addr_total")).as("has_any_address_pct"))
  }

  def summary(scored: DataFrame): DataFrame = {
    scored.groupBy(col("confidence_bucket").as("bucket"))
      .agg(count(lit(1)).as("count"))
      .withColumn("pct",
        round(col("count") * lit(100.0) / sum(col("count")).over(), 2))
      .orderBy(col("bucket"))
  }
}
