package graft.inference

import graft.oracle.Dialect

/** PII classification cascade — port of the reference's two-stage
  * pii_flag screens (reference: testgen/template/profiling/pii_flag.sql:
  * primary Alpha screen rules 1-60, secondary screen rules 80-140).
  * Flags are `<risk>/<class>/<subclass>` with risk A (high), B
  * (moderate), C (low), exactly the reference coding consumed by the
  * Potential_PII hygiene screen and its risk factor.
  *
  * Omitted rules (documented deviations): the SWIFT/IBAN/VIN checks —
  * the reference tests them with ILIKE against bracket-expression
  * patterns, which ILIKE treats literally (a latent no-op); and the
  * medical-record/member-id variants already covered by broader rules.
  * Both stages collapse into ONE first-match-wins CASE here because the
  * reference's two UPDATEs are NULL-guarded (second stage only fills
  * still-NULL flags).
  */
object PiiFlag {
  private def like(x: String, pat: String) = s"LOWER($x) LIKE '$pat'"

  /** The flag expression over an enriched profile row (needs
    * functional_data_type, std_pattern_match, the text metrics and
    * top_patterns). */
  def expr(d: Dialect): String = {
    val name = "column_name"
    val fdt = "functional_data_type"
    def nameRe(re: String) = d.rlike(s"LOWER($name)", re)
    val topPat1 = "TRIM(SPLIT_PART(top_patterns, '|', 2))"
    s"""CASE WHEN general_type = 'A' THEN
       |  CASE
       |    WHEN $fdt IN ('Person Full Name', 'Person Given Name', 'Person Last Name')
       |      THEN 'B/NAME/Individual'
       |    WHEN ${nameRe("(maiden|surname)")} THEN 'B/NAME/Individual'
       |    WHEN $fdt = 'Historical Date' AND ${nameRe("(dob|birth)")} THEN 'B/DEMO/Birthdate'
       |    WHEN ${nameRe("(nationality|race|ethnicity|gender|sex|marital)")} THEN 'B/DEMO/Demographic'
       |    WHEN ${like(name, "%med%record%")} THEN 'A/DEMO/Medical'
       |    WHEN ${nameRe("(password|pwd|auth)")} THEN 'A/ID/Security'
       |    WHEN max_length < 10 AND avg_embedded_spaces < 0.1
       |     AND (${like(name, "pin%")} OR ${like(name, "%pin")}) THEN 'A/ID/Security'
       |    WHEN std_pattern_match = 'SSN' AND ${nameRe("(ss|soc|sec)")} THEN 'A/ID/SSN'
       |    WHEN $topPat1 IN ('NNNNNNNNN', 'NNN-NN-NNNN', 'NNN NN NNNN')
       |     AND LEFT(min_text, 1) = '9' AND avg_length BETWEEN 8.8 AND 11.2
       |     AND ${nameRe("(tax|tin|fed)")} THEN 'A/ID/Tax'
       |    WHEN $topPat1 IN ('NNNNNNNNN', 'ANNNNNNNN')
       |     AND avg_length BETWEEN 8.8 AND 9.2
       |     AND ${nameRe("(passp|pp)")} THEN 'A/ID/Passport'
       |    WHEN std_pattern_match = 'CREDIT_CARD'
       |     AND ${nameRe("(credit|card|cc|acct|account)")} THEN 'A/ID/Credit'
       |    WHEN avg_length BETWEEN 5 AND 20
       |     AND ${nameRe("(bank|checking|saving|debit)")} THEN 'A/ID/Bank'
       |    WHEN avg_embedded_spaces < 0.5 AND avg_length < 20
       |     AND (${nameRe("(dr|op).*lic")} OR ${nameRe("(driver|license|operator)")})
       |      THEN 'A/ID/License'
       |    WHEN LOWER($name) IN ('patient_id', 'pat_id') THEN 'A/ID/Medical'
       |    WHEN LOWER($name) IN ('member_id') THEN 'B/ID/Commercial'
       |    WHEN $fdt = 'Email' THEN 'B/CONTACT/Email'
       |    WHEN $fdt IN ('Address', 'City', 'State', 'Zip') THEN 'B/CONTACT/Address'
       |    WHEN $fdt = 'Phone' THEN 'B/CONTACT/Phone'
       |    WHEN ${nameRe("(insur|health|med|patient)")} THEN 'A/DEMO/Medical'
       |    WHEN ${nameRe("(voice|fingerprint|retina|biometric|iris|face_recog)")} THEN 'A/ID/Security'
       |    WHEN ${like(name, "%rout%")} AND avg_length BETWEEN 8.8 AND 11.2
       |     AND $topPat1 IN ('NNNNNNNNN', 'NNNN-NNNN-N') THEN 'C/ID/Bank'
       |    WHEN ${nameRe("(salary|income|wage)")} THEN 'B/DEMO/Financial'
       |    WHEN ${nameRe("(user_id|userid)")} THEN 'C/ID/Security'
       |  END
       |END""".stripMargin
  }

  /** The Potential_PII risk factor (reference
    * profile_anomaly_types_Potential_PII.yaml dq_score_risk_factor). */
  def riskFactor: String =
    "CASE LEFT(pii_flag, 1) WHEN 'A' THEN 1.0 WHEN 'B' THEN 0.66 WHEN 'C' THEN 0.33 END"
}
