package graft.functions

/** Regex + constant vocabulary shared by the Spark expressions and the
  * DuckDB oracle SQL generator. Everything here is dialect-portable
  * (works identically under Java regex and RE2), so the engine and the
  * oracle literally share pattern strings.
  *
  * Semantics derived from the reference profiling template
  * (reference: testgen/template/flavors/postgresql/profiling/
  * project_profiling_query.sql:33-106 and templated_functions.yaml).
  * Two deliberate deviations, applied identically on both sides:
  *  - FILE_NAME drops the `(?<!\s)` lookbehind (RE2 can't do it); we use
  *    an equivalent lookbehind-free form.
  *  - CREDIT_CARD / SSN use genuinely anchored regexes (the reference's
  *    SIMILAR TO patterns treat `^`/`$` as literals — a latent bug we do
  *    not reproduce).
  */
object Patterns {
  // IS_NUM (templated_functions.yaml IS_NUM): optional sign, $, thousands
  // groups, decimals, trailing %.
  val isNum = """^\s*[+-]?\$?\s*[0-9]+(,[0-9]{3})*(\.[0-9]*)?%?\s*$"""

  // IS_DATE branch regexes (templated_functions.yaml IS_DATE)
  val isoDateTime =
    """^(\d{4})-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01]) (2[0-3]|[01][0-9]):([0-5][0-9]):([0-5][0-9])( [0-9]{6})?$"""
  val compactDateTime =
    """^(\d{4})(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])(2[0-3]|[01][0-9])([0-5][0-9])([0-5][0-9])([0-9]{6})$"""
  val compactDateHour =
    """^(\d{4})(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])(2[0-3]|[01][0-9])$"""
  val ymdLoose = """[12][09][0-9][0-9]-[0-1]?[0-9]-[0-3]?[0-9]""" // partial match
  val mdySlash4 = """^[0-1]?[0-9]/[0-3]?[0-9]/[12][09][0-9][0-9]$"""
  val mdySlash2 = """^[0-1]?[0-9]/[0-3]?[0-9]/[0-9][0-9]$"""
  val dmyMon =
    """[0-3]?[0-9]-(JAN|FEB|MAR|APR|MAY|JUN|JUL|AUG|SEP|OCT|NOV|DEC)-[12][09][0-9][0-9]""" // partial
  val monthNames = """(JAN|FEB|MAR|APR|MAY|JUN|JUL|AUG|SEP|OCT|NOV|DEC)"""

  val months31 = Seq("01", "03", "05", "07", "08", "10", "12")
  val months30 = Seq("04", "06", "09")
  // variants used by the YYYY-MM(-or-MMM)-DD branch
  val months31Loose = Seq("01", "03", "05", "07", "08", "1", "3", "5", "7", "8",
    "10", "12", "JAN", "MAR", "MAY", "JUL", "AUG", "OCT", "DEC")
  val months30Loose = Seq("04", "06", "09", "4", "6", "9", "11", "APR", "JUN", "SEP", "NOV")
  val monthsFebLoose = Seq("02", "2", "FEB")
  val mon31 = Seq("JAN", "MAR", "MAY", "JUL", "AUG", "OCT", "DEC")
  val mon30 = Seq("APR", "JUN", "SEP", "NOV")

  // zero-as-string (project_profiling_query.sql:34)
  val zeroString = """^0(\.0*)?$"""

  // dummy/filled values (project_profiling_query.sql:56-65). The
  // reference's SIMILAR TO alternation (dots / dashes / '?' / whitespace /
  // 2+ of 0,9,x,z) rendered as an anchored regex.
  val filledPattern = """^(\.+|-+|\?+|\s+|0{2,}|9{2,}|x{2,}|z{2,})$"""
  val filledWords = Seq("blank", "error", "missing", "tbd",
    "n/a", "#na", "none", "null", "unknown")
  def filledWordsAll: Seq[String] =
    filledWords ++ filledWords.map("(" + _ + ")") ++ filledWords.map("[" + _ + "]")

  // std_pattern_match classes (project_profiling_query.sql:85-106),
  // in reference priority order, with the vote threshold per class.
  val streetAddr =
    """^[0-9]{1,5}[a-zA-Z]?\s\w{1,5}\.?\s?\w*\s?\w*\s[a-zA-Z]{1,6}\.?\s?[0-9]{0,5}[A-Z]{0,1}$"""
  val usStates = Seq("AL", "AK", "AS", "AZ", "AR", "CA", "CO", "CT", "DE", "DC",
    "FM", "FL", "GA", "GU", "HI", "ID", "IL", "IN", "IA", "KS", "KY", "LA",
    "ME", "MH", "MD", "MA", "MI", "MN", "MS", "MO", "MT", "NE", "NV", "NH",
    "NJ", "NM", "NY", "NC", "ND", "MP", "OH", "OK", "OR", "PW", "PA", "PR",
    "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VI", "VA", "WA", "WV", "WI",
    "WY", "AE", "AP", "AA")
  val phoneUsa =
    """^(\+1|1)?[ .-]?(\([2-9][0-9]{2}\)|[2-9][0-9]{2})[ .-]?[2-9][0-9]{2}[ .-]?[0-9]{4}$"""
  val email = """^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"""
  val fileName = """^[\w\s\-]*[\w\-]\.(txt|csv|tsv|dat|doc|pdf|xlsx)$"""
  val creditCard = """^([0-9]{4}[- ]?){3}[0-9]{4}$"""
  val delimitedData = """^([^,|\t]{1,20}[,|\t]){2,}[^,|\t]{0,20}([,|\t]?[^,|\t]{0,20})*$"""
  val delimitedExcl = """\s(and|but|or|yet)\s"""
  val ssn = """^[0-8][0-9]{2}-[0-9]{2}-[0-9]{4}$"""

  // pattern generalization (project_profiling_query.sql:128-131)
  // applied as three chained regexp_replace: [a-z]->a, [A-Z]->A, [0-9]->N

  // non-printing characters (project_profiling_query.sql:82)
  val nonPrintingChars =
    "\u00a0\u2009\u200b\u200c\u200d\u200e\u200f\u202f\u3000\ufeff"

  /** SQL-escape a string literal (single quotes doubled). */
  def sq(s: String): String = "'" + s.replace("'", "''") + "'"
  /** SQL IN-list of string literals. */
  def inList(vals: Seq[String]): String = vals.map(sq).mkString("(", ", ", ")")
}
