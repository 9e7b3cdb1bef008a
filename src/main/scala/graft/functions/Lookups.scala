package graft.functions

/** State/country normalization lookup tables
  * (reference: normalization.py:41-181, 250-263). In queries these are
  * broadcast-joined as tiny lookup DataFrames so the fact side never
  * shuffles; the plain-function forms back the UDF paths and tests.
  */
object Lookups {

  val StateAbbr: Map[String, String] = Map(
    "alabama" -> "AL", "alaska" -> "AK", "arizona" -> "AZ", "arkansas" -> "AR",
    "california" -> "CA", "colorado" -> "CO", "connecticut" -> "CT",
    "delaware" -> "DE", "florida" -> "FL", "georgia" -> "GA", "hawaii" -> "HI",
    "idaho" -> "ID", "illinois" -> "IL", "indiana" -> "IN", "iowa" -> "IA",
    "kansas" -> "KS", "kentucky" -> "KY", "louisiana" -> "LA", "maine" -> "ME",
    "maryland" -> "MD", "massachusetts" -> "MA", "michigan" -> "MI",
    "minnesota" -> "MN", "mississippi" -> "MS", "missouri" -> "MO",
    "montana" -> "MT", "nebraska" -> "NE", "nevada" -> "NV",
    "new hampshire" -> "NH", "new jersey" -> "NJ", "new mexico" -> "NM",
    "new york" -> "NY", "north carolina" -> "NC", "north dakota" -> "ND",
    "ohio" -> "OH", "oklahoma" -> "OK", "oregon" -> "OR",
    "pennsylvania" -> "PA", "rhode island" -> "RI", "south carolina" -> "SC",
    "south dakota" -> "SD", "tennessee" -> "TN", "texas" -> "TX",
    "utah" -> "UT", "vermont" -> "VT", "virginia" -> "VA",
    "washington" -> "WA", "west virginia" -> "WV", "wisconsin" -> "WI",
    "wyoming" -> "WY", "district of columbia" -> "DC", "dc" -> "DC")

  val Iso2: Map[String, String] = Map(
    "us" -> "US", "usa" -> "US", "united states" -> "US",
    "united states of america" -> "US", "u.s." -> "US", "u.s.a." -> "US",
    "america" -> "US", "canada" -> "CA", "ca" -> "CA", "mexico" -> "MX",
    "mx" -> "MX", "united kingdom" -> "GB", "uk" -> "GB", "u.k." -> "GB",
    "great britain" -> "GB", "england" -> "GB", "scotland" -> "GB",
    "wales" -> "GB", "northern ireland" -> "GB", "ireland" -> "IE",
    "republic of ireland" -> "IE", "germany" -> "DE", "deutschland" -> "DE",
    "de" -> "DE", "france" -> "FR", "fr" -> "FR", "italy" -> "IT",
    "it" -> "IT", "spain" -> "ES", "es" -> "ES", "portugal" -> "PT",
    "pt" -> "PT", "netherlands" -> "NL", "holland" -> "NL", "nl" -> "NL",
    "belgium" -> "BE", "be" -> "BE", "switzerland" -> "CH", "ch" -> "CH",
    "austria" -> "AT", "at" -> "AT", "australia" -> "AU", "au" -> "AU",
    "new zealand" -> "NZ", "nz" -> "NZ", "india" -> "IN", "in" -> "IN",
    "china" -> "CN", "cn" -> "CN", "people's republic of china" -> "CN",
    "prc" -> "CN", "japan" -> "JP", "jp" -> "JP", "south korea" -> "KR",
    "republic of korea" -> "KR", "kr" -> "KR", "brazil" -> "BR",
    "br" -> "BR", "argentina" -> "AR", "ar" -> "AR", "south africa" -> "ZA",
    "za" -> "ZA", "sweden" -> "SE", "se" -> "SE", "norway" -> "NO",
    "no" -> "NO", "denmark" -> "DK", "dk" -> "DK", "finland" -> "FI",
    "fi" -> "FI", "czech republic" -> "CZ", "czechia" -> "CZ", "cz" -> "CZ",
    "poland" -> "PL", "pl" -> "PL", "singapore" -> "SG", "sg" -> "SG",
    "hong kong" -> "HK", "hk" -> "HK", "israel" -> "IL", "il" -> "IL",
    "united arab emirates" -> "AE", "uae" -> "AE", "ae" -> "AE")

  /** normalize_state (normalization.py:250-256). */
  def normalizeState(value: String): String = {
    val v = Option(value).getOrElse("").trim
    if (v.isEmpty) ""
    else if (v.length == 2 && v.forall(_.isLetter)) v.toUpperCase
    else StateAbbr.getOrElse(v.toLowerCase, v.toUpperCase)
  }

  /** normalize_country_iso2 (normalization.py:259-263). */
  def normalizeCountry(value: String): String = {
    val v = Option(value).getOrElse("").trim
    if (v.isEmpty) ""
    else Iso2.getOrElse(v.toLowerCase, if (v.length == 2) v.toUpperCase else v)
  }
}
