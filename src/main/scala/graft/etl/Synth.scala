package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic contact corpus derived from the `customer`
  * test table, used by the contact-pipeline capability queries.
  *
  * Both representations are generated from the SAME Scala constants:
  *   - [[contacts]]: Spark column expressions → Dataset[Contact]
  *   - [[sqlCte]]: a DuckDB CTE computing identical strings
  * so the driver's oracle can verify the pipeline stages exactly.
  *
  * Duplicate-cluster structure: identity class = c_custkey mod 400
  * (mod 400 fixes both the first-name index mod 16 and the surname
  * index mod 20); class members share the derived email/phone, so the
  * dedupe stage finds genuine multi-record clusters at sf ≥ 0.01.
  */
object Synth {

  val Firsts = Seq(
    "James", "Mary", "Robert", "Patricia", "Michael", "Linda", "William",
    "Elizabeth", "David", "Susan", "Richard", "Jessica", "Joseph",
    "Sarah", "Thomas", "Karen")
  val Lasts = Seq(
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin")
  val Streets = Seq(
    "Main Street", "Oak Avenue", "Elm Drive", "Maple Lane", "Cedar Court",
    "Birch Road")
  val Cities = Seq(
    "Braintree", "Quincy", "Weymouth", "Boston", "Cambridge", "Albany",
    "Hartford", "Providence")
  val Companies = Seq("GridGain Systems", "Red Hat Software", "Acme Corp")
  val Titles = Seq("Engineer", "Manager", "Director", "Analyst", "Consultant")

  // ------------------------------------------------------------------
  // Spark side
  // ------------------------------------------------------------------

  private def pick(values: Seq[String], idx: Column): Column =
    element_at(array(values.map(lit): _*), (idx + 1).cast("int"))

  /** Raw (pre-normalization) contact rows, one per customer. */
  def contacts(spark: SparkSession, dir: String): Dataset[Contact] = {
    import spark.implicits._
    val c = graft.Tables.load(spark, dir, "customer")
    val k = col("c_custkey")
    val first = pick(Firsts, k % 16)
    val last = pick(Lasts, k % 20)
    val cls = (k % 400).cast("string")
    val prefixPart = when(k % 11 === 0, "Dr. ").otherwise("")
    val suffixPart = when(k % 13 === 0, " Jr").otherwise("")
    val emailRaw = when(k % 5 =!= 0,
        concat(lower(first), lit("."), lower(last), cls, lit("@example.com")))
      .when(k % 10 === 5, "invalid email@@example")
      .otherwise("")
    val emailLabel = when(k % 3 === 0, "work").when(k % 3 === 1, "home").otherwise("")
    val phoneRaw = when(k % 7 =!= 0,
        concat(lit("+1 (617) 555-"), lpad(cls, 4, "0")))
      .when(k % 14 === 0, concat(lit("555-01"), lpad((k % 10).cast("string"), 2, "0")))
      .otherwise("")
    val phoneLabel = when(k % 4 === 0, "work").when(k % 4 === 1, "home")
      .when(k % 4 === 2, "mobile").otherwise("")
    val street = concat((k % 899 + 100).cast("string"), lit(" "), pick(Streets, k % 6))
    val city = pick(Cities, k % 8)
    val stateRaw = when(k % 4 === 0, "MA").when(k % 4 === 1, "Massachusetts")
      .when(k % 4 === 2, "NY").otherwise("California")
    val postal = lpad((k % 99 + 2100).cast("string"), 5, "0")
    val addrLabel = when(k % 3 === 0, "home").when(k % 3 === 1, "work").otherwise("")
    val source = when(k % 3 === 0, "gmail").when(k % 3 === 1, "linkedin").otherwise("mac_vcf")
    val linkedin = when(k % 3 === 1,
      concat(lit("https://www.linkedin.com/in/"), lower(first), lit("-"), lower(last),
        lit("-"), cls)).otherwise("")
    val notes = when(k % 10 === 2, "met at tai chi class")
      .when(k % 10 === 6, "Nutcracker ballet parent").otherwise("")
    val ts = when(k % 3 === 0, "").otherwise(
      concat(lit("2023-"), lpad((k % 12 + 1).cast("string"), 2, "0"),
        lit("-"), lpad((k % 28 + 1).cast("string"), 2, "0")))
    val company = when(k % 6 < 3, pick(Companies, k % 6)).otherwise("")
    val title = when(k % 5 < 4, pick(Titles, k % 5)).otherwise("")
    val department = when(k % 8 === 0, "Engineering").otherwise("")

    c.select(
      k.cast("long").as("row_id"),
      source.as("source"),
      k.cast("string").as("source_row_id"),
      ts.as("source_timestamp"),
      concat(prefixPart, first, lit(" "), last, suffixPart).as("full_name_raw"),
      lit("").as("full_name"), lit("").as("prefix"), lit("").as("first_name"),
      lit("").as("middle_name"), lit("").as("last_name"), lit("").as("maiden_name"),
      lit("").as("suffix"), lit("").as("suffix_professional"), lit("").as("nickname"),
      company.as("company"), title.as("title"), department.as("department"),
      linkedin.as("linkedin_url"), notes.as("notes"),
      when(emailRaw =!= "", array(struct(emailRaw.as("value"), emailLabel.as("label"))))
        .otherwise(array().cast("array<struct<value:string,label:string>>")).as("emails"),
      when(phoneRaw =!= "", array(struct(phoneRaw.as("value"), phoneLabel.as("label"),
          lit("").as("extension"))))
        .otherwise(array().cast("array<struct<value:string,label:string,extension:string>>"))
        .as("phones"),
      when(k % 9 =!= 0, array(struct(
          lit("").as("po_box"), lit("").as("extended"), street.as("street"),
          city.as("city"), stateRaw.as("state"), postal.as("postal_code"),
          lit("US").as("country"), addrLabel.as("label"))))
        .otherwise(array().cast(
          "array<struct<po_box:string,extended:string,street:string,city:string," +
            "state:string,postal_code:string,country:string,label:string>>"))
        .as("addresses"),
      array().cast("array<string>").as("invalid_emails"),
      array().cast("array<string>").as("non_standard_phones")
    ).as[Contact]
  }

  // ------------------------------------------------------------------
  // DuckDB mirror
  // ------------------------------------------------------------------

  private def sqlList(values: Seq[String]): String =
    values.map(v => s"'$v'").mkString("[", ", ", "]")

  /** DuckDB CTE `synth`: scalar columns identical to [[contacts]].
    * (k % n is safe unsigned here: c_custkey > 0.) */
  def sqlCte: String = {
    val first = s"${sqlList(Firsts)}[CAST(c_custkey % 16 AS INT) + 1]"
    val last = s"${sqlList(Lasts)}[CAST(c_custkey % 20 AS INT) + 1]"
    s"""synth AS (
      SELECT c_custkey AS k,
        $first AS first,
        $last AS last,
        CAST(c_custkey % 400 AS VARCHAR) AS cls,
        CASE WHEN c_custkey % 11 = 0 THEN 'Dr. ' ELSE '' END AS prefix_part,
        CASE WHEN c_custkey % 13 = 0 THEN ' Jr' ELSE '' END AS suffix_part,
        CASE WHEN c_custkey % 5 <> 0
             THEN lower($first) || '.' || lower($last) || CAST(c_custkey % 400 AS VARCHAR) || '@example.com'
             WHEN c_custkey % 10 = 5 THEN 'invalid email@@example'
             ELSE '' END AS email_raw,
        CASE WHEN c_custkey % 3 = 0 THEN 'work' WHEN c_custkey % 3 = 1 THEN 'home' ELSE '' END AS email_label,
        CASE WHEN c_custkey % 7 <> 0 THEN '+1 (617) 555-' || lpad(CAST(c_custkey % 400 AS VARCHAR), 4, '0')
             WHEN c_custkey % 14 = 0 THEN '555-01' || lpad(CAST(c_custkey % 10 AS VARCHAR), 2, '0')
             ELSE '' END AS phone_raw,
        CASE WHEN c_custkey % 4 = 0 THEN 'work' WHEN c_custkey % 4 = 1 THEN 'home'
             WHEN c_custkey % 4 = 2 THEN 'mobile' ELSE '' END AS phone_label,
        CAST(c_custkey % 899 + 100 AS VARCHAR) || ' ' || ${sqlList(Streets)}[CAST(c_custkey % 6 AS INT) + 1] AS street,
        ${sqlList(Cities)}[CAST(c_custkey % 8 AS INT) + 1] AS city,
        CASE WHEN c_custkey % 4 = 0 THEN 'MA' WHEN c_custkey % 4 = 1 THEN 'Massachusetts'
             WHEN c_custkey % 4 = 2 THEN 'NY' ELSE 'California' END AS state_raw,
        lpad(CAST(c_custkey % 99 + 2100 AS VARCHAR), 5, '0') AS postal,
        CASE WHEN c_custkey % 3 = 0 THEN 'home' WHEN c_custkey % 3 = 1 THEN 'work' ELSE '' END AS addr_label,
        c_custkey % 9 <> 0 AS has_addr,
        CASE WHEN c_custkey % 3 = 0 THEN 'gmail' WHEN c_custkey % 3 = 1 THEN 'linkedin' ELSE 'mac_vcf' END AS source,
        CASE WHEN c_custkey % 3 = 1
             THEN 'https://www.linkedin.com/in/' || lower($first) || '-' || lower($last) || '-' || CAST(c_custkey % 400 AS VARCHAR)
             ELSE '' END AS linkedin_url,
        CASE WHEN c_custkey % 10 = 2 THEN 'met at tai chi class'
             WHEN c_custkey % 10 = 6 THEN 'Nutcracker ballet parent' ELSE '' END AS notes,
        CASE WHEN c_custkey % 3 = 0 THEN ''
             ELSE '2023-' || lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0') || '-' || lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0') END AS source_timestamp,
        CASE WHEN c_custkey % 6 < 3 THEN ${sqlList(Companies)}[CAST(c_custkey % 6 AS INT) + 1] ELSE '' END AS company,
        CASE WHEN c_custkey % 5 < 4 THEN ${sqlList(Titles)}[CAST(c_custkey % 5 AS INT) + 1] ELSE '' END AS title,
        CASE WHEN c_custkey % 8 = 0 THEN 'Engineering' ELSE '' END AS department
      FROM customer)"""
  }

  /** DuckDB CTE `snorm` layered on `synth`: the single-element-collection
    * normalization outcomes (email validation, E.164 fallback, address
    * state normalization) — scalar mirror of ContactLogic.normalizeRecord
    * for this corpus (every collection has ≤1 element, so the
    * order-sensitive dedupe folds are identity). */
  def sqlNormCte: String =
    s"""$sqlCte,
    snorm AS (
      SELECT *,
        CASE WHEN regexp_matches(lower(replace(trim(email_raw), ' ', '')),
                  '^[A-Za-z0-9._%+\\-'']+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}$$')
             THEN lower(replace(trim(email_raw), ' ', '')) ELSE '' END AS email_norm,
        regexp_replace(phone_raw, '[^0-9]', '', 'g') AS phone_digits
      FROM synth),
    snorm2 AS (
      SELECT *,
        CASE WHEN trim(phone_raw) = '' THEN ''
             WHEN length(phone_digits) = 10 THEN '+1' || phone_digits
             WHEN length(phone_digits) = 11 AND phone_digits LIKE '1%' THEN '+' || phone_digits
             WHEN length(phone_digits) > 11 AND length(phone_digits) <= 15 AND trim(phone_raw) NOT LIKE '+%' THEN '+' || phone_digits
             WHEN trim(phone_raw) LIKE '+%' THEN regexp_replace(trim(phone_raw), '[^0-9+]', '', 'g')
             WHEN length(phone_digits) > 0 THEN '+1' || phone_digits
             ELSE trim(phone_raw) END AS phone_e164
      FROM snorm),
    scontact AS (
      SELECT *,
        -- channel presence/validity after normalization
        CASE WHEN email_norm <> '' THEN 1 WHEN trim(email_raw) <> '' THEN 1 ELSE 0 END AS email_total,
        CASE WHEN email_norm <> '' THEN 1 ELSE 0 END AS email_valid_count,
        CASE WHEN trim(phone_raw) = '' THEN 0 ELSE 1 END AS phone_total,
        CASE WHEN phone_e164 LIKE '+%' AND length(phone_digits) >= 11 THEN 1 ELSE 0 END AS phone_valid_count,
        CASE WHEN has_addr THEN 1 ELSE 0 END AS addr_total,
        CASE WHEN has_addr THEN 1 ELSE 0 END AS addr_valid_count,
        CASE WHEN state_raw = 'MA' OR state_raw = 'Massachusetts' THEN 'MA'
             WHEN state_raw = 'NY' THEN 'NY'
             ELSE 'CA' END AS state_norm,
        trim(prefix_part) AS prefix,
        first AS first_name,
        last AS last_name,
        trim(suffix_part) AS suffix,
        trim(prefix_part || first || ' ' || last || suffix_part) AS full_name
      FROM snorm2)"""
}
