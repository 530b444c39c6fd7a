package graft.oracle

/** Minimal two-dialect SQL rendering: every metric/measure in the engine
  * is written ONCE as a `Dialect => String` and rendered to (a) Spark SQL,
  * executed by the engine via `expr`/`spark.sql`, and (b) DuckDB SQL, the
  * driver's correctness oracle. Keeping one definition per metric makes it
  * impossible for the oracle to drift from the engine.
  *
  * Only constructs where the dialects differ get a method here; everything
  * else (CASE/WHEN, COUNT/SUM/MIN/MAX, LENGTH, TRIM, TRANSLATE, LIKE,
  * ROUND, ABS, SIGN, %, ||, NULLIF, COALESCE, GREATEST, IN, BETWEEN,
  * TRY_CAST, SPLIT_PART, LEFT/RIGHT, REPLACE, year()/month()/quarter())
  * is written inline because the two dialects agree.
  */
sealed trait Dialect {
  /** Case-sensitive partial-match regex test (Postgres `~` semantics). */
  def rlike(x: String, re: String): String
  def notRlike(x: String, re: String): String = s"NOT ${rlike(x, re)}"
  /** Global regexp replace (Postgres regexp_replace(..., 'g')). */
  def regexpReplace(x: String, re: String, rep: String): String
  /** CAST to the dialect's text type. */
  def castText(x: String): String
  /** Format timestamp as 'yyyy-MM-dd HH:mm:ss'. */
  def fmtTs(x: String): String
  /** Exact interpolated (continuous) percentile. */
  def quantileCont(x: String, q: Double): String
  /** Days from a to b, both truncated to dates (ref DATEDIFF_DAY). */
  def dateDiffDay(a: String, b: String): String
  /** Whole weeks between week-truncations (ref DATEDIFF_WEEK). */
  def dateDiffWeek(a: String, b: String): String =
    s"CAST(${dateDiffDay(s"date_trunc('week', $a)", s"date_trunc('week', $b)")} / 7 AS INT)"
  /** Calendar-month difference (ref DATEDIFF_MONTH formula). */
  def dateDiffMonth(a: String, b: String): String =
    s"((year($b) - year($a)) * 12 + (month($b) - month($a)))"
  /** Calendar-quarter difference (ref app-db datediff QUARTER intent). */
  def dateDiffQuarter(a: String, b: String): String =
    s"((year($b) - year($a)) * 4 + (quarter($b) - quarter($a)))"
  /** Calendar-year difference. */
  def dateDiffYear(a: String, b: String): String = s"(year($b) - year($a))"
  /** Whole minutes from a to b (ref EXTRACT(EPOCH)/60 in Freshness_Trend). */
  def dateDiffMinutes(a: String, b: String): String
  /** Epoch microseconds of a timestamp expression as BIGINT — the
    * full-precision gap arithmetic (whole-minute diffs floor away
    * sub-minute gaps). */
  def epochMicros(x: String): String
  /** Day of week, Postgres convention: 0 = Sunday … 6 = Saturday. */
  def dow(x: String): String
  /** Add whole months to a date/timestamp expression. */
  def addMonths(x: String, n: Int): String
  /** Extract a JSON field as text (NULL on absent path / invalid JSON). */
  def jsonExtract(x: String, path: String): String
  /** 1-based position of substring, 0 if absent (Postgres STRPOS). */
  def strpos(x: String, sub: String): String
  /** strpos with the needle as an expression rather than a literal. */
  def strposExpr(x: String, subExpr: String): String
  /** Parse a hex-string expression (no 0x prefix) into a BIGINT. */
  def hexToLong(h: String): String
  /** 1-based array element access cast to DOUBLE. */
  def elementAt(arr: String, i: Int): String
  /** Number of elements of an array expression. */
  def arrayLen(arr: String): String
  /** 1-based, `len`-element subarray of an array expression. */
  def arraySlice(arr: String, start1: Int, len: Int): String
  /** Relation exploding `expr` (split by the separator SQL expression
    * `sepSql`, e.g. "CHR(10)") into one row per piece, carrying `cols`
    * through; the piece column is named `piece`. */
  def splitRel(rel: String, cols: Seq[String], expr: String, sepSql: String): String
  /** CTE materialization hint for CTEs referenced many times (DuckDB
    * would otherwise inline and re-evaluate them per reference). */
  def cteMaterialized: String = ""
  /** Global regexp replace whose replacement wraps capture group 1,
    * e.g. prefix="[", suffix="]" → "[\1]" / "[$1]". */
  def regexpReplaceRef(x: String, re: String, prefix: String, suffix: String): String
  /** Trim any of the given characters from both ends. */
  def trimChars(x: String, chars: String): String
  /** Trim any of the given characters from the left end only. */
  def ltrimChars(x: String, chars: String): String
  /** NULL-propagating SPLIT_PART (Postgres semantics: NULL in → NULL
    * out; DuckDB's SPLIT_PART returns '' for NULL input instead). */
  def splitPart(x: String, delim: String, n: Int): String =
    s"SPLIT_PART($x, '${escq(delim)}', $n)"
  /** Relation of (id, pos, word): `textExpr` lowercased and split on
    * whitespace, one row per word with its 0-based position. */
  def wordsRel(table: String, idCol: String, textExpr: String): String
  /** Relation of (id, gram): space-joined `n`-grams of `textExpr`'s
    * consecutive words — the shared derivation behind every positional-
    * agnostic n-gram screen (screens that need word POSITIONS keep
    * bespoke SQL: the two renderings agree on gram content but not on
    * raw split positions for leading-whitespace docs). Default: LEAD
    * windows over [[wordsRel]] (fine single-node — the oracle path);
    * [[SparkDialect]] overrides with a ROW-LOCAL array transform so the
    * engine never shuffles the token stream into a per-doc sort. */
  def wordNgramsRel(table: String, idCol: String, textExpr: String,
                    n: Int): String = {
    require(n >= 2, s"n-gram size must be >= 2, got $n")
    val leads = (1 to (n - 1)).map(i =>
      s"LEAD(word, $i) OVER w AS w$i").mkString(",\n       ")
    val concat = (1 to (n - 1)).map(i => s"w$i").mkString(
      "word || ' ' || ", " || ' ' || ", "")
    s"""SELECT id, $concat AS gram FROM (
       |  SELECT id, word,
       |       $leads
       |    FROM (${wordsRel(table, idCol, textExpr)}) words
       |  WINDOW w AS (PARTITION BY id ORDER BY pos)
       |) lg WHERE w${n - 1} IS NOT NULL""".stripMargin
  }
  /** Relation of (cols..., pos) for pos in 1..`nExpr` inclusive (no rows
    * when the bound is below 1) — the lateral integer series both
    * engines need for character-position explodes. */
  def seriesRel(rel: String, cols: Seq[String], nExpr: String): String
  /** Count of regex matches in a string. */
  def regexpCount(x: String, re: String): String
  /** Dot product of two float-array columns as DOUBLE (sequential
    * left-to-right summation in both dialects). */
  def dotProduct(a: String, b: String): String
  /** Aggregate `valExpr` into an array ordered by `ordExpr`. */
  def arrayAggOrdered(valExpr: String, ordExpr: String): String
  /** Relation of (keyCol, pos, val) exploding an array column with its
    * 0-based position. */
  def arrayPosRel(table: String, keyCol: String, arrCol: String): String
  /** Parse a hex-digit string expression to BIGINT. */
  def hexToInt(x: String): String
  /** Integer (floor) division of two integer expressions. */
  def intDiv(a: String, b: String): String
  /** Bitwise XOR of two integer expressions. */
  def bitXor(a: String, b: String): String
  /** Number of set bits of an integer expression. */
  def bitCount(x: String): String = s"bit_count($x)"
  /** Arithmetic right shift of an integer expression by n bits. */
  def shiftRight(x: String, n: Int): String
  /** Right shift by an expression-valued bit count (0..62). */
  def shiftRightE(x: String, nExpr: String): String
  /** BIGINT 1 left-shifted by an expression-valued bit count (0..62). */
  def oneShiftLeftE(nExpr: String): String
  /** Force NULL-in → NULL-out for an expression derived from `x`, for
    * dialects whose string functions (e.g. DuckDB SPLIT_PART) return ''
    * on NULL input where Postgres/Spark return NULL. */
  def nullGuard(x: String, expr: String): String = expr
  protected def escq(s: String): String
  /** Add whole days to a date expression. */
  def dateAddDays(x: String, n: Int): String
  /** String aggregation with explicit ordering. */
  def stringAgg(x: String, sep: String, orderBy: String): String
  /** DISTINCT string aggregation ordered by the value itself. */
  def stringAggDistinct(x: String, sep: String): String
  /** NULL literal of a given abstract type: "bigint"|"int"|"double"|"text". */
  def nullOf(t: String): String =
    t match {
      case "text" => s"CAST(NULL AS ${textType})"
      case other  => s"CAST(NULL AS ${other.toUpperCase})"
    }
  def textType: String

  /** Regex capture-group extraction; '' when no match (both engines). */
  def regexpExtract(x: String, re: String, group: Int): String

  /** Postgres-style rtrim(x, chars). NOT spelled RTRIM(x, '...') because
    * Spark's two-argument RTRIM takes (trimStr, srcStr) — REVERSED
    * argument order vs Postgres/DuckDB — so the literal form silently
    * computes the wrong value on one engine. */
  def rtrimChars(x: String, chars: String): String

  /** A landed parquet directory as a relation. */
  def readParquet(path: String): String

  /** Byte length of a string expression (UTF-8 octets — DuckDB's
    * octet_length is BLOB-only, so it renders strlen there). */
  def byteLen(x: String): String
}

object SparkDialect extends Dialect {
  def rlike(x: String, re: String): String = s"$x RLIKE '${esc(re)}'"
  def regexpReplace(x: String, re: String, rep: String): String =
    s"regexp_replace($x, '${esc(re)}', '${esc(rep)}')"
  def castText(x: String): String = s"CAST($x AS STRING)"
  def fmtTs(x: String): String = s"date_format($x, 'yyyy-MM-dd HH:mm:ss')"
  def quantileCont(x: String, q: Double): String = s"percentile($x, $q)"
  def dateDiffDay(a: String, b: String): String =
    s"datediff(CAST($b AS DATE), CAST($a AS DATE))"
  def dateAddDays(x: String, n: Int): String = s"date_add($x, $n)"
  def dateDiffMinutes(a: String, b: String): String =
    s"CAST((unix_timestamp(CAST($b AS TIMESTAMP)) - unix_timestamp(CAST($a AS TIMESTAMP))) / 60 AS BIGINT)"
  def epochMicros(x: String): String = s"unix_micros(CAST($x AS TIMESTAMP))"
  def dow(x: String): String = s"(dayofweek($x) - 1)"
  def addMonths(x: String, n: Int): String = s"add_months($x, $n)"
  def strpos(x: String, sub: String): String = s"instr($x, '${esc(sub)}')"
  def strposExpr(x: String, subExpr: String): String = s"instr($x, $subExpr)"
  def jsonExtract(x: String, path: String): String =
    s"get_json_object($x, '${esc(path)}')"
  def hexToLong(h: String): String = s"CAST(CONV($h, 16, 10) AS BIGINT)"
  def elementAt(arr: String, i: Int): String = s"CAST(element_at($arr, $i) AS DOUBLE)"
  def arrayLen(arr: String): String = s"size($arr)"
  def arraySlice(arr: String, start1: Int, len: Int): String =
    s"slice($arr, $start1, $len)"
  def splitRel(rel: String, cols: Seq[String], expr: String, sepSql: String): String =
    s"""SELECT ${cols.mkString(", ")}, sp.piece FROM $rel
       | LATERAL VIEW explode(split($expr, $sepSql)) sp AS piece""".stripMargin
  def regexpReplaceRef(x: String, re: String, prefix: String, suffix: String): String =
    s"regexp_replace($x, '${esc(re)}', '${esc(prefix)}$$1${esc(suffix)}')"
  def trimChars(x: String, chars: String): String =
    s"TRIM(BOTH '${esc(chars)}' FROM $x)"
  def ltrimChars(x: String, chars: String): String =
    s"TRIM(LEADING '${esc(chars)}' FROM $x)"
  def wordsRel(table: String, idCol: String, textExpr: String): String =
    s"""SELECT $idCol AS id, p.pos, p.word FROM $table
       | LATERAL VIEW posexplode(split(LOWER($textExpr), '\\\\s+')) p AS pos, word
       | WHERE p.word <> ''""".stripMargin
  /** Row-local override: the n-gram derives from the split array inside
    * each input row (pure projection + explode) — the token stream is
    * never shuffled into the per-doc sort the default LEAD-window form
    * pays. Same (id, gram) relation (parity-spec-pinned). */
  override def wordNgramsRel(table: String, idCol: String, textExpr: String,
                             n: Int): String = {
    require(n >= 2, s"n-gram size must be >= 2, got $n")
    s"""SELECT id, concat_ws(' ', slice(ws, i + 1, $n)) AS gram
       |  FROM (SELECT id, ws FROM (
       |          SELECT $idCol AS id,
       |                 filter(split(LOWER($textExpr), '\\\\s+'), w -> w <> '') AS ws
       |            FROM $table) z0
       |         WHERE size(ws) >= $n) z
       |  LATERAL VIEW explode(sequence(0, size(ws) - $n)) e AS i""".stripMargin
  }
  def seriesRel(rel: String, cols: Seq[String], nExpr: String): String =
    // NULL when the bound is below 1 — explode of NULL yields no rows
    // (sequence(1, 0) would count DOWN instead of producing nothing)
    s"""SELECT ${cols.mkString(", ")}, p.pos FROM $rel
       | LATERAL VIEW explode(CASE WHEN ($nExpr) >= 1
       |   THEN sequence(1, $nExpr) END) p AS pos""".stripMargin
  def regexpCount(x: String, re: String): String =
    s"size(regexp_extract_all($x, '${esc(re)}', 0))"
  // the native graft_dot expression (registered by Tables.load /
  // tunePerf on every session) — bit-identical to the HOF rendering
  // `aggregate(zip_with(a, b, x*y), 0d, acc+v)` it replaced, without
  // the per-pair zipped allocation + lambda walk (DotExprSpec)
  def dotProduct(a: String, b: String): String = s"graft_dot($a, $b)"
  def arrayAggOrdered(valExpr: String, ordExpr: String): String =
    s"transform(array_sort(collect_list(named_struct('o', $ordExpr, 'v', $valExpr))), s -> s.v)"
  def arrayPosRel(table: String, keyCol: String, arrCol: String): String =
    s"""SELECT $keyCol, p.pos, CAST(p.val AS DOUBLE) AS val FROM $table
       | LATERAL VIEW posexplode($arrCol) p AS pos, val""".stripMargin
  def hexToInt(x: String): String = s"CAST(CONV($x, 16, 10) AS BIGINT)"
  def intDiv(a: String, b: String): String = s"(($a) DIV ($b))"
  def bitXor(a: String, b: String): String = s"($a ^ $b)"
  def shiftRight(x: String, n: Int): String = s"shiftright($x, $n)"
  def shiftRightE(x: String, nExpr: String): String =
    s"shiftright($x, CAST($nExpr AS INT))"
  def oneShiftLeftE(nExpr: String): String =
    s"shiftleft(CAST(1 AS BIGINT), CAST($nExpr AS INT))"
  def stringAgg(x: String, sep: String, orderBy: String): String =
    s"listagg($x, '${esc(sep)}') WITHIN GROUP (ORDER BY $orderBy)"
  def stringAggDistinct(x: String, sep: String): String =
    s"array_join(array_sort(collect_set($x)), '${esc(sep)}')"
  def textType: String = "STRING"
  def regexpExtract(x: String, re: String, group: Int): String =
    s"regexp_extract($x, '${esc(re)}', $group)"
  def rtrimChars(x: String, chars: String): String =
    s"TRIM(TRAILING '${esc(chars)}' FROM $x)"
  def readParquet(path: String): String = s"parquet.`$path`"
  def byteLen(x: String): String = s"octet_length($x)"
  private def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
  protected def escq(s: String): String = esc(s)
}

object DuckDialect extends Dialect {
  def rlike(x: String, re: String): String = s"regexp_matches($x, '${esc(re)}')"
  def regexpReplace(x: String, re: String, rep: String): String =
    s"regexp_replace($x, '${esc(re)}', '${esc(rep)}', 'g')"
  def castText(x: String): String = s"CAST($x AS VARCHAR)"
  def fmtTs(x: String): String = s"strftime($x, '%Y-%m-%d %H:%M:%S')"
  def quantileCont(x: String, q: Double): String = s"quantile_cont($x, $q)"
  def dateDiffDay(a: String, b: String): String =
    s"datediff('day', CAST($a AS DATE), CAST($b AS DATE))"
  def dateAddDays(x: String, n: Int): String = s"(CAST($x AS DATE) + $n)"
  def dateDiffMinutes(a: String, b: String): String =
    s"CAST(FLOOR(CAST(datediff('second', CAST($a AS TIMESTAMP), CAST($b AS TIMESTAMP)) AS DOUBLE) / 60) AS BIGINT)"
  def epochMicros(x: String): String = s"epoch_us(CAST($x AS TIMESTAMP))"
  def dow(x: String): String = s"dayofweek($x)"
  def addMonths(x: String, n: Int): String =
    s"(CAST($x AS TIMESTAMP) + INTERVAL '$n months')"
  def strpos(x: String, sub: String): String = s"strpos($x, '${esc(sub)}')"
  def strposExpr(x: String, subExpr: String): String = s"strpos($x, $subExpr)"
  def jsonExtract(x: String, path: String): String =
    s"json_extract_string($x, '${esc(path)}')"
  def hexToLong(h: String): String = s"CAST(CAST('0x' || $h AS UBIGINT) AS BIGINT)"
  def elementAt(arr: String, i: Int): String = s"CAST(($arr)[$i] AS DOUBLE)"
  def arrayLen(arr: String): String = s"len($arr)"
  def arraySlice(arr: String, start1: Int, len: Int): String =
    s"list_slice($arr, $start1, ${start1 + len - 1})"
  def splitRel(rel: String, cols: Seq[String], expr: String, sepSql: String): String =
    s"""SELECT ${cols.mkString(", ")},
       | unnest(string_split($expr, $sepSql)) AS piece FROM $rel""".stripMargin
  override def cteMaterialized: String = "MATERIALIZED "
  def regexpReplaceRef(x: String, re: String, prefix: String, suffix: String): String =
    s"regexp_replace($x, '${esc(re)}', '${esc(prefix)}\\1${esc(suffix)}', 'g')"
  def trimChars(x: String, chars: String): String =
    s"TRIM($x, '${esc(chars)}')"
  def ltrimChars(x: String, chars: String): String =
    s"ltrim($x, '${esc(chars)}')"
  def stringAgg(x: String, sep: String, orderBy: String): String =
    s"string_agg($x, '${esc(sep)}' ORDER BY $orderBy)"
  def stringAggDistinct(x: String, sep: String): String =
    s"string_agg(DISTINCT $x, '${esc(sep)}' ORDER BY $x)"
  override def splitPart(x: String, delim: String, n: Int): String =
    s"CASE WHEN ($x) IS NULL THEN NULL ELSE SPLIT_PART($x, '${escq(delim)}', $n) END"
  override def nullGuard(x: String, expr: String): String =
    s"(CASE WHEN ($x) IS NULL THEN NULL ELSE $expr END)"
  def wordsRel(table: String, idCol: String, textExpr: String): String =
    s"""SELECT * FROM (
       | SELECT $idCol AS id,
       |  generate_subscripts(string_split_regex(LOWER($textExpr), '\\s+'), 1) - 1 AS pos,
       |  unnest(string_split_regex(LOWER($textExpr), '\\s+')) AS word
       | FROM $table) w WHERE w.word <> ''""".stripMargin
  def seriesRel(rel: String, cols: Seq[String], nExpr: String): String =
    // list-returning generate_series + unnest accepts column-valued
    // bounds (the table-function form rejects lateral column refs)
    s"""SELECT ${cols.mkString(", ")},
       | CAST(unnest(generate_series(1, CAST(GREATEST($nExpr, 0) AS BIGINT))) AS INT) AS pos
       | FROM $rel""".stripMargin
  def regexpCount(x: String, re: String): String =
    s"len(regexp_extract_all($x, '${esc(re)}'))"
  def dotProduct(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"
  def arrayAggOrdered(valExpr: String, ordExpr: String): String =
    s"array_agg($valExpr ORDER BY $ordExpr)"
  def arrayPosRel(table: String, keyCol: String, arrCol: String): String =
    s"""SELECT $keyCol, generate_subscripts($arrCol, 1) - 1 AS pos,
       | CAST(unnest($arrCol) AS DOUBLE) AS val FROM $table""".stripMargin
  def hexToInt(x: String): String = s"CAST(('0x' || ($x)) AS BIGINT)"
  def intDiv(a: String, b: String): String = s"(($a) // ($b))"
  def bitXor(a: String, b: String): String = s"xor($a, $b)"
  def shiftRight(x: String, n: Int): String = s"($x >> $n)"
  def shiftRightE(x: String, nExpr: String): String =
    s"($x >> CAST($nExpr AS INT))"
  def oneShiftLeftE(nExpr: String): String =
    s"(CAST(1 AS BIGINT) << CAST($nExpr AS INT))"
  def textType: String = "VARCHAR"
  def regexpExtract(x: String, re: String, group: Int): String =
    s"regexp_extract($x, '${esc(re)}', $group)"
  def rtrimChars(x: String, chars: String): String =
    s"rtrim($x, '${esc(chars)}')"
  def readParquet(path: String): String = s"read_parquet('$path/*.parquet')"
  def byteLen(x: String): String = s"strlen($x)"
  private def esc(s: String) = s.replace("'", "''")
  protected def escq(s: String): String = esc(s)
}
