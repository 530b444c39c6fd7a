package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** Multi-format table IO — the engine's answer to "my corpus is not
  * parquet yet": read any of the known tables from csv / json / orc /
  * parquet with the SAME enforced schema and row semantics the parquet
  * path serves (reference analogue: the flavor connectors that let
  * testgen profile whatever store the data lives in,
  * `testgen/common/database/database_service.py` — here the flavors are
  * file formats, since the engine's store is the lake).
  *
  * Schema discipline: the static [[Tables.schemas]] schema is applied
  * on read (never inferred — schema inference is a full extra pass at
  * 100 TB and type-unstable between runs), with FAILFAST mode so a
  * malformed row surfaces at the scan instead of as a silent NULL
  * downstream. Timestamps round-trip through an explicit
  * microsecond-precision format on the text formats (both the
  * zone-aware and NTZ variants — the driver parquet carries NTZ).
  *
  * Scale notes: csv/json are row-major and uncompressed-column formats —
  * fine for ingest, wrong for repeated analytics; [[convertToParquet]]
  * is the one-pass landing every pipeline should run first (the scan
  * then gets column pruning, predicate pushdown, and parallel row
  * groups the text formats cannot give).
  */
object Sources {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  // CSV carries no nested types: array columns ride as JSON strings on
  // the csv path (the standard interchange encoding) and parse back to
  // their declared type on read. json/orc carry arrays natively.
  private def arrayFields(name: String) =
    Tables.schemas(name).fields.filter(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])

  private def csvSchema(name: String) =
    org.apache.spark.sql.types.StructType(Tables.schemas(name).fields.map {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
        f.copy(dataType = org.apache.spark.sql.types.StringType)
      case f => f
    })

  /** Load `name` from `dir` in the given format, schema-enforced.
    * `format = "parquet"` delegates to [[Tables.load]] (nanos handling,
    * native-function registration). */
  def load(spark: SparkSession, dir: String, name: String,
           format: String = "parquet"): DataFrame = format match {
    case "parquet" => Tables.load(spark, dir, name, parallelize = false)
    case "csv" =>
      val raw = spark.read
        .schema(csvSchema(name))
        .option("header", "true")
        .option("mode", "FAILFAST")
        .option("timestampFormat", TsFmt)
        .option("timestampNTZFormat", TsFmt)
        // text with embedded quotes/newlines survives round-trip
        .option("multiLine", "true").option("escape", "\"")
        .csv(s"$dir/$name.csv")
      arrayFields(name).foldLeft(raw) { (df, f) =>
        df.withColumn(f.name, org.apache.spark.sql.functions.from_json(
          org.apache.spark.sql.functions.col(f.name), f.dataType))
      }
    case "json" =>
      spark.read
        .schema(Tables.schemas(name))
        .option("mode", "FAILFAST")
        .option("timestampFormat", TsFmt)
        .option("timestampNTZFormat", TsFmt)
        .json(s"$dir/$name.json")
    case "orc" =>
      spark.read.schema(Tables.schemas(name)).orc(s"$dir/$name.orc")
    case other =>
      throw new IllegalArgumentException(
        s"unknown source format '$other' (csv, json, orc, parquet)")
  }

  /** Write a table out in the given format (the test/fixture mirror of
    * [[load]]; timestamp options match so round-trips are exact). */
  def write(df: DataFrame, dir: String, name: String, format: String): Unit =
    format match {
      case "parquet" => df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
      case "csv" =>
        val flat = df.schema.fields.foldLeft(df) {
          case (acc, f) if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
            acc.withColumn(f.name, org.apache.spark.sql.functions.to_json(
              org.apache.spark.sql.functions.col(f.name)))
          case (acc, _) => acc
        }
        flat.write.mode("overwrite")
          .option("header", "true")
          .option("timestampFormat", TsFmt)
          .option("timestampNTZFormat", TsFmt)
          .option("escape", "\"")
          .csv(s"$dir/$name.csv")
      case "json" =>
        df.write.mode("overwrite")
          .option("timestampFormat", TsFmt)
          .option("timestampNTZFormat", TsFmt)
          .json(s"$dir/$name.json")
      case "orc" => df.write.mode("overwrite").orc(s"$dir/$name.orc")
      case other =>
        throw new IllegalArgumentException(s"unknown sink format '$other'")
    }

  /** One-pass landing of a text-format table as parquet — the ingest
    * step that buys every later scan column pruning + pushdown. */
  def convertToParquet(spark: SparkSession, srcDir: String, name: String,
                       format: String, outDir: String): Unit =
    load(spark, srcDir, name, format)
      .write.mode("overwrite").parquet(s"$outDir/$name.parquet")

  /** Quarantine ingestion — the production alternative to FAILFAST when
    * the feed is not trusted to be clean: PERMISSIVE parse with the
    * corrupt-record column, split into (good rows, quarantined raw
    * lines). FAILFAST kills a 100 TB landing for one bad line;
    * quarantine lands the 99.999% and preserves the offenders VERBATIM
    * for the upstream owner (the raw text, not a half-parsed row).
    * csv/json only — binary formats fail structurally, not per-row. */
  def loadQuarantine(spark: SparkSession, dir: String, name: String,
                     format: String): (DataFrame, DataFrame) = {
    val (good, bad, _) = loadQuarantineBase(spark, dir, name, format)
    (good, bad)
  }

  private def loadQuarantineBase(spark: SparkSession, dir: String,
                                 name: String, format: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val corrupt = "_graft_corrupt"
    // Spark disallows referencing ONLY the corrupt column on the raw
    // scan; the parsed relation is cached first (documented requirement).
    // convertToParquetQuarantine unpersists after landing both sides;
    // loadQuarantine callers own the cache lifetime.
    def split(parsed: DataFrame) = {
      val cached = parsed.cache()
      val good = cached.where(col(corrupt).isNull).drop(corrupt)
      val bad = cached.where(col(corrupt).isNotNull)
        .select(col(corrupt).as("raw_record"))
      (good, bad, cached)
    }
    format match {
      case "csv" =>
        val schema = StructType(
          csvSchema(name).fields :+ StructField(corrupt, StringType))
        val raw = spark.read
          .schema(schema)
          .option("header", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", corrupt)
          .option("timestampFormat", TsFmt)
          .option("timestampNTZFormat", TsFmt)
          .option("multiLine", "true").option("escape", "\"")
          .csv(s"$dir/$name.csv")
        val (good, bad, cached) = split(raw)
        val typed = arrayFields(name).foldLeft(good) { (df, f) =>
          df.withColumn(f.name, org.apache.spark.sql.functions.from_json(
            org.apache.spark.sql.functions.col(f.name), f.dataType))
        }
        (typed, bad, cached)
      case "json" =>
        val schema = StructType(
          Tables.schemas(name).fields :+ StructField(corrupt, StringType))
        val raw = spark.read
          .schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", corrupt)
          .option("timestampFormat", TsFmt)
          .option("timestampNTZFormat", TsFmt)
          .json(s"$dir/$name.json")
        split(raw)
      case other =>
        throw new IllegalArgumentException(
          s"quarantine ingest is per-row and text-format only, got '$other'")
    }
  }

  /** Quarantine landing: good rows as parquet, offenders as a text audit
    * beside them; returns (good count, quarantined count). */
  def convertToParquetQuarantine(spark: SparkSession, srcDir: String,
                                 name: String, format: String,
                                 outDir: String): (Long, Long) = {
    val (good, bad, cached) = loadQuarantineBase(spark, srcDir, name, format)
    good.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    bad.write.mode("overwrite").parquet(s"$outDir/${name}_quarantine.parquet")
    // both sides landed: the one-pass cache has served its purpose
    cached.unpersist()
    val g = spark.read.parquet(s"$outDir/$name.parquet").count()
    val b = spark.read.parquet(s"$outDir/${name}_quarantine.parquet").count()
    (g, b)
  }
}
