package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Deduplication operators over `documents`:
  *
  *  - exact: hash-groupBy on the full text — one shuffle on md5(text).
  *  - ngram Jaccard: 5-word shingles built with LEAD windows (no UDF),
  *    inverted-index self-join on shingle with a hot-shingle cutoff
  *    (shingles present in > 50 docs are dropped, the standard guard
  *    that keeps the candidate join bounded at scale), Jaccard =
  *    |A∩B| / (|A|+|B|-|A∩B|).
  *  - MinHash+LSH: 12 md5-seeded min-hashes per doc, banded 4×3; docs
  *    sharing a band hash become candidates (the only join is on band
  *    buckets — at 100 TB this replaces the quadratic pair join), then
  *    candidates are verified with exact Jaccard.
  *  - SimHash: 32-bit signature from per-token md5 hex-digit parities;
  *    near-dup candidates bucket on 8-bit chunks (pigeonhole: hamming
  *    <= 3 ⇒ at least one of 4 chunks equal), verified by hamming
  *    distance.
  *
  * All hashing is md5-based so the Spark engine and the DuckDB oracle
  * produce identical signatures.
  */
object Dedup {

  /** Row-local Spark rendering of the `sh` shingle relation (the
    * dual-rendered [[shinglesCte]] LEAD-window form stays the oracle
    * rendering): 5-grams derive from the split array inside each
    * document row — pure projection + explode + DISTINCT, so the token
    * stream never shuffles into a per-doc sort (parity-spec-pinned
    * identical; only the memoized `__graft_sh_*` build uses it, every
    * consumer reads the landed view). */
  private[graft] def shinglesSparkSql(table: String): String =
    s"""SELECT DISTINCT doc_id AS id,
       |       concat_ws(' ', ws[i], ws[i + 1], ws[i + 2], ws[i + 3], ws[i + 4])
       |         AS shingle
       |  FROM (SELECT doc_id, ws FROM (
       |          SELECT doc_id,
       |                 filter(split(LOWER(text), '\\\\s+'), w -> w <> '') AS ws
       |            FROM $table) z0
       |         WHERE size(ws) >= 5) z
       |  LATERAL VIEW explode(sequence(0, size(ws) - 5)) e AS i""".stripMargin

  private def shinglesCte(d: Dialect, table: String): String =
    s"""words AS (
       |  ${d.wordsRel(table, "doc_id", "text")}
       |),
       |lagged AS (
       |  SELECT id, word,
       |         LEAD(word, 1) OVER w AS w1, LEAD(word, 2) OVER w AS w2,
       |         LEAD(word, 3) OVER w AS w3, LEAD(word, 4) OVER w AS w4
       |    FROM words
       |  WINDOW w AS (PARTITION BY id ORDER BY pos)
       |),
       |sh AS (
       |  SELECT DISTINCT id, word || ' ' || w1 || ' ' || w2 || ' ' || w3 || ' ' || w4 AS shingle
       |    FROM lagged WHERE w4 IS NOT NULL
       |),
       |shf AS (
       |  SELECT sh.id, sh.shingle FROM sh
       |  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 50) ok
       |    ON sh.shingle = ok.shingle
       |),
       |sizes AS (
       |  SELECT id, COUNT(*) AS sz FROM shf GROUP BY id
       |)""".stripMargin

  /** The full pairwise co-shingle intersection counts — quadratic in
    * co-shingled docs; only the plain Jaccard path may consume it. The
    * minhash path computes intersections for LSH candidates only (see
    * [[candInterCte]]), which is the whole point of banding. */
  private val interCte: String =
    """inter AS (
      |  SELECT a.id AS doc_a, b.id AS doc_b, COUNT(*) AS ict
      |    FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
      |   GROUP BY a.id, b.id
      |)""".stripMargin

  /** Intersection counts restricted to candidate pairs: each side of the
    * shingle join is first equi-joined to `cands` on its doc id, so the
    * work is |cands| x shingles-per-doc, never the all-pairs co-shingle
    * blow-up. This is what keeps standalone minhash sub-quadratic at
    * 100 TB. */
  private def candInterCte(shfRel: String): String =
    s"""cinter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS ict
       |    FROM cands c
       |    JOIN $shfRel a ON a.id = c.doc_a
       |    JOIN $shfRel b ON b.id = c.doc_b AND b.shingle = a.shingle
       |   GROUP BY c.doc_a, c.doc_b
       |)""".stripMargin

  def exactSql(table: String)(d: Dialect): String =
    s"""SELECT MD5(text) AS content_hash, COUNT(*) AS dupe_ct,
       |       MIN(doc_id) AS keep_id
       |  FROM $table
       | GROUP BY MD5(text) HAVING COUNT(*) > 1
       | ORDER BY content_hash""".stripMargin

  /** Canonical-form text: casefolded, punctuation stripped, whitespace
    * collapsed — the normalization pass that makes `"Hello,  World!"`
    * and `"hello world"` the same document. */
  private def canonExpr(d: Dialect): String = {
    // Unicode-aware strip: keep letters/digits in ANY script (\p{L}\p{N}),
    // not just ASCII — an [^a-z0-9] class would canonicalize every
    // non-Latin document to "" and collapse a multilingual corpus's
    // non-English content into one bogus duplicate group. Java regex and
    // DuckDB's RE2 both treat \p{L}/\p{N} as the Unicode categories.
    val noPunct = d.regexpReplace("LOWER(text)", "[^\\p{L}\\p{N}\\s]", "")
    s"TRIM(${d.regexpReplace(noPunct, "\\s+", " ")})"
  }

  /** Exact dedup over the CANONICAL form — catches the formatting
    * variants (case, punctuation, whitespace reflow) that raw-byte
    * md5 grouping misses but that are still verbatim duplicates, the
    * first screen crawl pipelines run before any fuzzy pass.
    * `raw_variant_ct` counts how many distinct RAW texts collapsed
    * into the group — > 1 means the canonicalization did work the
    * exact pass could not.
    *
    * Scale shape: identical to exact dedup — one codegen'd
    * normalize+hash scan, one groupBy with map-side partials; no
    * joins. */
  def canonicalSql(table: String)(d: Dialect): String =
    s"""SELECT MD5(${canonExpr(d)}) AS canon_hash, COUNT(*) AS dupe_ct,
       |       COUNT(DISTINCT MD5(text)) AS raw_variant_ct,
       |       MIN(doc_id) AS keep_id
       |  FROM $table
       | GROUP BY MD5(${canonExpr(d)}) HAVING COUNT(*) > 1
       | ORDER BY canon_hash""".stripMargin

  def runCanonical(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "documents", parallelize = false)
      .createOrReplaceTempView("__graft_docs_canon")
    spark.sql(canonicalSql("__graft_docs_canon")(SparkDialect))
  }

  /** Jaccard verification body over (inter, sizes) relations. */
  private[graft] def jaccardBody(interRel: String, sizesRel: String, threshold: Double): String =
    s"""SELECT i.doc_a, i.doc_b,
       |       CAST(ROUND(CAST(i.ict AS DOUBLE) / (sa.sz + sb.sz - i.ict), 4) AS DOUBLE) AS jaccard
       |  FROM $interRel i
       |  JOIN $sizesRel sa ON sa.id = i.doc_a
       |  JOIN $sizesRel sb ON sb.id = i.doc_b
       | WHERE CAST(i.ict AS DOUBLE) / (sa.sz + sb.sz - i.ict) >= $threshold
       | ORDER BY doc_a, doc_b""".stripMargin

  def jaccardSql(table: String, threshold: Double = 0.5)(d: Dialect): String =
    s"""WITH ${shinglesCte(d, table)},
       |$interCte
       |${jaccardBody("inter", "sizes", threshold)}""".stripMargin

  /** ADAPTIVE minhash band geometry — the last fixed-resolution
    * blocking shape after round 13b: (rows-per-band, band-count)
    * elected from the corpus size the way
    * [[graft.pipeline.Similarity.adaptiveModFor]] elects LSH planes.
    * Why rows-per-band must grow with N: a band is an r-way AND, so an
    * unrelated pair with background signature agreement s₀ collides a
    * given band with probability s₀^r — FIXED r means false-candidate
    * mass ~ N²·b·s₀^r grows quadratically, exactly the trap the sf10
    * curve flagged for the fixed-plane family. Each ladder rung adds
    * one row per band per ×64 corpus growth (designed for background
    * agreement s₀ ≤ 1/64 ≈ 0.016 — unrelated web docs share far less),
    * holding false-candidate mass per doc ~constant. The band COUNT
    * grows alongside so the S-curve midpoint (1/b)^(1/r) stays at the
    * 0.5-threshold design point ≈ 0.63: (3,4)→0.630, (4,6)→0.639,
    * (5,10)→0.631 — the election changes the false-candidate bound,
    * not the threshold semantics. Signature cost grows r·b (12→24→50
    * hashes) — one linear scan; the candidate join is the quadratic
    * risk the ladder retires. Election is pure integer comparisons,
    * spec-pinned bit-identical across the SQL and driver renderings. */
  val BandLadder: Seq[((Int, Int), Long)] =
    Seq(((3, 4), 1L << 18), ((4, 6), 1L << 24))
  val BandLadderTop: (Int, Int) = (5, 10)

  /** Driver-side election (the engine's form). */
  def bandGeometryFor(n: Long): (Int, Int) =
    BandLadder.find(n <= _._2).map(_._1).getOrElse(BandLadderTop)

  /** SQL-side election of rows-per-band (the oracle's form) —
    * spec-pinned equal to [[bandGeometryFor]]._1 across boundaries. */
  def bandRowsCase(nExpr: String): String =
    BandLadder.map { case ((r, _), maxN) =>
      s"WHEN $nExpr <= $maxN THEN $r"
    }.mkString("CASE ", " ", s" ELSE ${BandLadderTop._1} END")

  /** SQL-side election of the band count — spec-pinned equal to
    * [[bandGeometryFor]]._2 across boundaries. */
  def bandCountCase(nExpr: String): String =
    BandLadder.map { case ((_, b), maxN) =>
      s"WHEN $nExpr <= $maxN THEN $b"
    }.mkString("CASE ", " ", s" ELSE ${BandLadderTop._2} END")

  /** The elected band geometry AS DATA — the election is an engine
    * behavior, so it is oracle-checked like any other: both engines
    * evaluate the same integer CASE over the same corpus count (a
    * plain projection over a one-row aggregate — no join-key scalar
    * subquery, so the dual rendering is safe on both sides). A
    * deployment reads this row to know which rung its corpus runs at
    * and what the signature bill is. */
  def bandGeometrySql(table: String)(d: Dialect): String =
    s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM $table)
       |SELECT n_docs AS corpus_docs,
       |       CAST(${bandRowsCase("n_docs")} AS INT) AS rows_per_band,
       |       CAST(${bandCountCase("n_docs")} AS INT) AS band_ct,
       |       CAST((${bandRowsCase("n_docs")}) * (${bandCountCase("n_docs")})
       |            AS INT) AS hash_ct
       |  FROM n""".stripMargin

  def runBandGeometry(spark: SparkSession, dir: String): DataFrame = {
    val docs = register(spark, dir)
    spark.sql(bandGeometrySql(docs)(SparkDialect))
  }

  /** The r·b md5-seeded min-hash signatures per doc. */
  def minhashSigsSql(shfRel: String, nHashes: Int = 12): String = {
    val mins = (0 until nHashes)
      .map(i => s"MIN(MD5('s$i:' || shingle)) AS m$i").mkString(",\n       ")
    s"""SELECT id, $mins
       |  FROM $shfRel GROUP BY id""".stripMargin
  }

  /** The band-bucket candidate CTEs alone — `bands`, `cands` — shared by
    * the minhash entry and the duplicate-cluster edge builder. Geometry
    * defaults to the rung-0 (3 rows × 4 bands) design point — the
    * oracle's rendering and the elected engine geometry at every
    * fixture scale; the engine passes [[bandGeometryFor]]'s election
    * above rung 0. */
  private def minhashCandsCtes(sigsRel: String,
                               geom: (Int, Int) = (3, 4)): String = {
    val (bandSize, nBands) = geom
    val bands = (0 until nBands).map { b =>
      val cols = (0 until bandSize).map(j => s"m${b * bandSize + j}").mkString(" || ")
      s"SELECT id, $b AS band, MD5($cols) AS bucket FROM $sigsRel"
    }.mkString("\n  UNION ALL\n  ")
    s"""bands AS (
       |  $bands
       |),
       |cands AS (
       |  SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
       |    FROM bands a JOIN bands b
       |      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
       |)""".stripMargin
  }

  /** r·b min-hashes banded b×r; candidates verified with true Jaccard
    * computed ONLY for candidate pairs (never the all-pairs co-shingle
    * intersection — that would defeat the LSH bound banding exists for). */
  private def minhashBody(sigsRel: String, shfRel: String, sizesRel: String,
                          threshold: Double,
                          geom: (Int, Int) = (3, 4)): String =
    s"""${minhashCandsCtes(sigsRel, geom)},
       |${candInterCte(shfRel)}
       |${jaccardBody("cinter", sizesRel, threshold)}""".stripMargin

  def minhashSql(table: String, threshold: Double = 0.5,
                 geom: (Int, Int) = (3, 4))(d: Dialect): String =
    s"""WITH ${shinglesCte(d, table)},
       |sigs AS (
       |${minhashSigsSql("shf", geom._1 * geom._2)}
       |),
       |${minhashBody("sigs", "shf", "sizes", threshold, geom)}""".stripMargin

  /** 32-bit simhash from word-md5 hex-digit parities.
    *
    * The signature is packed into a BIGINT so hamming distance is ONE
    * `bit_count(xor(a, b))` instead of 32 per-character comparisons, and
    * md5 is computed once per (doc, word) instead of once per bit.
    * Near-dup candidates bucket on the four signature bytes (pigeonhole:
    * hamming <= 3 ⇒ at least one of 4 bytes equal); the hamming filter is
    * applied inside the bucket join BEFORE the cross-chunk dedup so the
    * DISTINCT only sees surviving pairs. */
  /** The signature pipeline: doc → 32-bit packed simhash (`id`, `v`). */
  def simhashSigsSql(table: String)(d: Dialect): String = {
    // bit i = majority vote of (hex digit i of md5(word)) % 2
    val bitSums = (0 until 32).map { i =>
      val hexDigit = s"SUBSTRING(h, ${i + 1}, 1)"
      val parity = s"CASE WHEN $hexDigit IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END"
      s"CASE WHEN SUM($parity) >= 0 THEN 1 ELSE 0 END AS b$i"
    }.mkString(",\n         ")
    val packed = (0 until 32)
      .map(i => s"CAST(b$i AS BIGINT) * ${1L << i}")
      .mkString(" + ")
    s"""WITH words AS (
       |  ${d.wordsRel(table, "doc_id", "text")}
       |),
       |dw AS (
       |  SELECT id, MD5(word) AS h FROM (SELECT DISTINCT id, word FROM words)
       |),
       |sigs AS (
       |  SELECT id, $bitSums FROM dw GROUP BY id
       |)
       |SELECT id, $packed AS v FROM sigs""".stripMargin
  }

  /** Buckets holding more members than this are dropped from the
    * candidate join — the hub discipline the minhash verify and winnow
    * joins already apply. Without it the (chunk, piece) self-join is
    * QUADRATIC: bucket occupancy grows linearly with the corpus (the
    * round-11 sf1 curve measured candidate compares 41k → 4.2M → 429M
    * across sf0.01/0.1/1 — 100× per 10× docs — with the worst bucket at
    * 14k members). With the cutoff, compares are bounded by
    * 1024 · cutoff² at ANY corpus size. A dropped hub means "hundreds of
    * docs share a signature byte" — at that density pair emission is the
    * wrong product (its own output is quadratic); the cluster operator
    * ([[clustersSql]]) is the dense-mode tool, same adjudication as the
    * minhash hot cutoff. Production note: 64-bit signatures with 16-bit
    * pieces (4 × 65536 buckets) push the hub threshold 256× further out;
    * the 32-bit/8-bit layout here matches the native [[SimHashExpr]]
    * kernel and the oracle's arithmetic rendering. */
  val SimhashHotCutoff = 100

  /** Bucket join + hamming verify over a signature relation, hub-bounded. */
  def simhashBody(sigs2Rel: String, maxHamming: Int,
                  hotCutoff: Int = SimhashHotCutoff)(d: Dialect): String = {
    val chunks = (0 until 4).map { c =>
      val byte = s"CAST(${d.shiftRight("v", c * 8)} % 256 AS INT)"
      s"SELECT id, v, $c AS chunk, $byte AS piece FROM $sigs2Rel"
    }.mkString("\n  UNION ALL\n  ")
    val hamming = d.bitCount(d.bitXor("a.v", "b.v"))
    s"""WITH chunks AS (
       |  $chunks
       |),
       |okb AS (
       |  SELECT chunk, piece FROM chunks
       |   GROUP BY chunk, piece HAVING COUNT(*) <= $hotCutoff
       |),
       |c2 AS (
       |  SELECT c.id, c.v, c.chunk, c.piece
       |    FROM chunks c JOIN okb o
       |      ON o.chunk = c.chunk AND o.piece = c.piece
       |),
       |cands AS (
       |  SELECT DISTINCT a.id AS doc_a, b.id AS doc_b, $hamming AS hamming
       |    FROM c2 a JOIN c2 b
       |      ON a.chunk = b.chunk AND a.piece = b.piece AND a.id < b.id
       |   WHERE $hamming <= $maxHamming
       |)
       |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
       |  FROM cands
       | ORDER BY doc_a, doc_b""".stripMargin
  }

  def simhashSql(table: String, maxHamming: Int = 3)(d: Dialect): String =
    simhashBody(s"(${simhashSigsSql(table)(d)})", maxHamming)(d)

  /** Engine rendering of [[simhashBody]]: the hot-bucket census rides
    * a COUNT window over the same (chunk, piece) partitioning the
    * candidate self-join consumes — the [[hotFpsSparkCte]] fusion at
    * piece grain (the oracle keeps the census-join form; the gate
    * re-proves equality end-to-end, OptRewriteParitySpec pins it). */
  def simhashBodySparkSql(sigs2Rel: String, maxHamming: Int,
                          hotCutoff: Int = SimhashHotCutoff): String = {
    val d: Dialect = SparkDialect
    val chunks = (0 until 4).map { c =>
      val byte = s"CAST(${d.shiftRight("v", c * 8)} % 256 AS INT)"
      s"SELECT id, v, $c AS chunk, $byte AS piece FROM $sigs2Rel"
    }.mkString("\n  UNION ALL\n  ")
    val hamming = d.bitCount(d.bitXor("a.v", "b.v"))
    s"""WITH chunks AS (
       |  $chunks
       |),
       |c2 AS (
       |  SELECT id, v, chunk, piece FROM (
       |    SELECT id, v, chunk, piece,
       |           COUNT(*) OVER (PARTITION BY chunk, piece) AS occ
       |      FROM chunks) w
       |   WHERE occ <= $hotCutoff
       |),
       |cands AS (
       |  SELECT DISTINCT a.id AS doc_a, b.id AS doc_b, $hamming AS hamming
       |    FROM c2 a JOIN c2 b
       |      ON a.chunk = b.chunk AND a.piece = b.piece AND a.id < b.id
       |   WHERE $hamming <= $maxHamming
       |)
       |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
       |  FROM cands
       | ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Embedding-cosine near-duplicates for LABELED corpora: pairwise
    * cosine within (label, sign-LSH bucket) sub-blocks, norms
    * precomputed once per vector. The label alone is NOT a scale-safe
    * blocking key — at a fixed label count L the within-label pair join
    * grows ~N²/L (measured 6.5× at the r11 sf1 sweep on the 10-label
    * fixture) — so each label sub-blocks by a recall-biased 4-plane
    * sign-LSH bucket, the same structural fix the sf1 curve forced on
    * `dedup_semantic`: the corpus shuffles ONCE on the computed
    * (label, bucket) key and every pair join is block-local,
    * ~1/16 of the within-label quadratic. Sign-LSH buckets are
    * cosine-aware, so true near-duplicates (cosine → 1) collide with
    * probability (1 − θ/π)⁴ ≈ 1 at production thresholds (0.95+);
    * production recall stacks independent bucket tables exactly as
    * `dedup_embedding_lsh` documents. */
  // Production near-dup thresholds are 0.95+; the synthetic corpus's
  // random embeddings top out near 0.47 within-label cosine, and the
  // bucket constraint thins near-threshold pairs ~(1-θ/π)⁴, so 0.30
  // (the LSH entry's fixture point) keeps the candidate-surfacing path
  // exercised instead of returning a vacuous empty relation.
  def embeddingSql(table: String, threshold: Double = 0.30,
                   minPlanes: Int = 4, dim: Int = 64,
                   nOverride: Option[Long] = None)(d: Dialect): String = {
    // ADAPTIVE sub-block resolution (Similarity.adaptiveModCase): the
    // fixed 4-plane sub-block pinned bucket COUNT, so occupancy — and
    // with it the within-(label, bucket) pair join — grew with the
    // corpus (13.5× on the r13 sf10 10× hop). The plane count now
    // scales with log2(N): occ=32 ≈ the ~10-label fixture's ~3 rows
    // per (label, bucket) at the oracle scale, where the elected np
    // stays minPlanes and the output is bit-identical to the old form.
    // Engine path passes the driver-counted N (literal modulus — a
    // scalar subquery in a join-key projection races Spark's broadcast
    // build); the oracle elects in SQL, spec-pinned to the same rule.
    val bucket = Similarity.bucketExpr("embedding", Similarity.AdaptiveMaxPlanes, dim)(d)
    val bmod = nOverride
      .map(n => Similarity.adaptiveModFor(n, occ = 32, minP = minPlanes).toString)
      .getOrElse("(SELECT bmod FROM nb)")
    val nbCte = if (nOverride.isDefined) ""
      else s"nb AS (\n  ${Similarity.adaptiveModCte(table, occ = 32, minP = minPlanes)}\n),\n"
    s"""WITH ${nbCte}emb AS (
       |  SELECT vec_id, label, MOD($bucket, $bmod) AS bucket, embedding,
       |         SQRT(${d.dotProduct("embedding", "embedding")}) AS nrm
       |    FROM $table
       |),
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         ${d.dotProduct("a.embedding", "b.embedding")} / NULLIF(a.nrm * b.nrm, 0) AS cos
       |    FROM emb a JOIN emb b
       |      ON a.label = b.label AND a.bucket = b.bucket
       |         AND a.vec_id < b.vec_id
       |)
       |SELECT vec_a, vec_b, CAST(ROUND(cos, 4) AS DOUBLE) AS cosine
       |  FROM pairs
       | WHERE cos >= $threshold
       | ORDER BY vec_a, vec_b""".stripMargin
  }

  private def register(spark: SparkSession, dir: String): String = {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__graft_docs")
    "__graft_docs"
  }

  // Spark inlines CTEs, so a CTE referenced k times is COMPUTED k times
  // (the shingle pipeline appears 4x in the minhash plan, the simhash
  // signature pipeline 8x through the chunk union's self-join). DuckDB
  // materializes multiply-referenced CTEs, so the single-statement
  // oracle SQL is unaffected. Here the shared intermediates (shingles,
  // sizes, intersection counts, simhash signatures) are persisted ONCE
  // per (session, dir) and exposed as temp views — at 100 TB these are
  // exactly the relations you'd persist before a multi-consumer fan-out
  // (jaccard + minhash verification both consume them).
  // value = view-name suffix per (session, dir), so a second data
  // directory in the same session gets its own relations instead of
  // silently overwriting (and then serving) the first one's
  private def registerShingleRels(spark: SparkSession, dir: String): Int =
    graft.core.SessionCache.getOrElseUpdate(spark, "dedup_rels", dir) {
      {
        val k = graft.core.SessionCache.counter(spark, "dedup_rels").getAndIncrement()
        val docs = register(spark, dir)
        // localCheckpoint truncates lineage: the view becomes the
        // materialized partitions themselves, so downstream plans can
        // never silently recompute the pipeline (persist+view relies on
        // cache plan-matching, which misses here). On a real cluster the
        // equivalent is reliable checkpoint / write-to-storage.
        def mat(name: String, sql: String): Unit = {
          val t0 = System.nanoTime()
          val df = spark.sql(sql).localCheckpoint(eager = true)
          df.createOrReplaceTempView(name)
          if (sys.env.contains("GRAFT_PROFILE_DEBUG"))
            println(f"DEDUPMAT $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
        // band geometry elected ONCE from the corpus count, frozen
        // alongside the signature relation it sized — every band
        // consumer reads the SAME rungs. Count on a RAW load, not the
        // rebalanced docs view: the raw scan's count collapses to the
        // parquet footer stats, where counting through the rebalance
        // would shuffle the full document text just to count rows
        val geom = bandGeometryFor(
          graft.core.Tables.load(spark, dir, "documents",
            parallelize = false).count())
        graft.core.SessionCache.getOrElseUpdate(spark, "dedup_band_geom", k)(geom)
        // sh first: the row-local shingle projection runs ONCE; the
        // hot-shingle filter then reads the persisted sh twice cheaply.
        mat(s"__graft_sh_$k", shinglesSparkSql(docs))
        mat(s"__graft_shf_$k",
          s"""SELECT s.id, s.shingle FROM __graft_sh_$k s
             |JOIN (SELECT shingle FROM __graft_sh_$k
             |       GROUP BY shingle HAVING COUNT(*) <= 50) ok
             |  ON s.shingle = ok.shingle""".stripMargin)
        mat(s"__graft_sizes_$k",
          s"SELECT id, COUNT(*) AS sz FROM __graft_shf_$k GROUP BY id")
        mat(s"__graft_minhash_sigs_$k",
          minhashSigsSql(s"__graft_shf_$k", geom._1 * geom._2))
        k
      }
    }

  /** The band geometry frozen with generation `k`'s signature relation. */
  private def bandGeomOf(spark: SparkSession, k: Int): (Int, Int) =
    graft.core.SessionCache.getOrElseUpdate(spark, "dedup_band_geom", k)((3, 4))

  // The full pairwise intersection is the quadratic relation; only plain
  // Jaccard pays for it, and only on first use (minhash never touches it).
  private def registerInterRel(spark: SparkSession, k: Int): Unit =
    graft.core.SessionCache.getOrElseUpdate(spark, "dedup_inter", k) {
      spark.sql(
        s"""SELECT a.id AS doc_a, b.id AS doc_b, COUNT(*) AS ict
           |  FROM __graft_shf_$k a JOIN __graft_shf_$k b
           |    ON a.shingle = b.shingle AND a.id < b.id
           | GROUP BY a.id, b.id""".stripMargin)
        .localCheckpoint(eager = true)
        .createOrReplaceTempView(s"__graft_inter_$k")
      true
    }

  def runExact(spark: SparkSession, dir: String): DataFrame = {
    // cheap hash-groupBy: partial aggregation on the raw scan beats
    // paying the rebalance exchange the shingle pipelines need
    graft.core.Tables.load(spark, dir, "documents", parallelize = false)
      .createOrReplaceTempView("__graft_docs_exact")
    spark.sql(exactSql("__graft_docs_exact")(SparkDialect))
  }
  def runJaccard(spark: SparkSession, dir: String): DataFrame = {
    val k = registerShingleRels(spark, dir)
    registerInterRel(spark, k)
    spark.sql(jaccardBody(s"__graft_inter_$k", s"__graft_sizes_$k", 0.5))
  }
  def runMinhash(spark: SparkSession, dir: String): DataFrame = {
    // read the LANDED skew-dispatched verify relation (shared with the
    // sweep/lookup consumers) instead of re-deriving the band join +
    // intersection inline — same rows, one less derivation per read
    val k = registerShingleRels(spark, dir)
    registerCandInterRel(spark, k)
    spark.sql(jaccardBody(s"__graft_cinter_$k", s"__graft_sizes_$k", 0.5))
  }

  /** MinHash estimation calibration — per band-candidate pair, the
    * signature-ESTIMATED Jaccard (matching minhash slots / 12, the
    * collision-probability estimator banding is built on) next to the
    * verified TRUE Jaccard and the signed estimation error. This is the
    * tuning artifact behind the 12-hash / 4×3-band design point: a
    * systematic positive error means the bands pass junk the verify
    * join then pays for; heavy negative error means recall losses the
    * LSH-recall harness will show. Reads only landed relations
    * (signatures, candidate intersections, sizes) — zero corpus passes. */
  private def minhashCalibrationBody(sigsRel: String, cinterRel: String,
                                     sizesRel: String,
                                     nHashes: Int = 12): String = {
    val matched = (0 until nHashes)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""SELECT c.doc_a, c.doc_b,
       |       CAST(ROUND(($matched) / $nHashes.0, 4) AS DOUBLE) AS est_jaccard,
       |       CAST(ROUND(CAST(c.ict AS DOUBLE)
       |                  / (sa.sz + sb.sz - c.ict), 4) AS DOUBLE) AS true_jaccard,
       |       CAST(ROUND(($matched) / $nHashes.0
       |                  - CAST(c.ict AS DOUBLE) / (sa.sz + sb.sz - c.ict), 4)
       |            AS DOUBLE) AS est_err
       |  FROM $cinterRel c
       |  JOIN $sigsRel a ON a.id = c.doc_a
       |  JOIN $sigsRel b ON b.id = c.doc_b
       |  JOIN $sizesRel sa ON sa.id = c.doc_a
       |  JOIN $sizesRel sb ON sb.id = c.doc_b
       | ORDER BY doc_a, doc_b""".stripMargin
  }

  def minhashCalibrationSql(table: String)(d: Dialect): String =
    s"""WITH ${shinglesCte(d, table)},
       |sigs AS (
       |${minhashSigsSql("shf")}
       |),
       |${minhashCandsCtes("sigs")},
       |${candInterCte("shf")}
       |${minhashCalibrationBody("sigs", "cinter", "sizes")}""".stripMargin

  def runMinhashCalibration(spark: SparkSession, dir: String): DataFrame = {
    val k = registerShingleRels(spark, dir)
    registerCandInterRel(spark, k)
    val (r, b) = bandGeomOf(spark, k)
    spark.sql(minhashCalibrationBody(
      s"__graft_minhash_sigs_$k", s"__graft_cinter_$k", s"__graft_sizes_$k",
      nHashes = r * b))
  }

  /** Dedup thresholds the sweep reports — the banding design point
    * (0.5) upward; below 0.5 the 4×3 bands lose recall, so sweeping
    * there would misreport. */
  val SweepThresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  /** The threshold tuning curve — per candidate-verification threshold,
    * how many near-dup pairs fire and how many documents they touch:
    * the report a curation run reads before committing to a dedup
    * threshold (too low eats distinct paraphrases, too high leaves
    * templated spam in).
    *
    * Scale shape: the verified-jaccard candidate relation is computed
    * ONCE (band-bucket candidates only, hot-cutoff bounded — never an
    * all-pairs join), and the sweep is a 5-row threshold relation
    * cross-joined against it: 5·|cands| comparisons over an
    * already-small relation, zero extra corpus passes. */
  private def thresholdSweepTail(cinterRel: String, sizesRel: String): String =
    s"""jp AS (
       |  SELECT i.doc_a, i.doc_b,
       |         CAST(i.ict AS DOUBLE) / (sa.sz + sb.sz - i.ict) AS j
       |    FROM $cinterRel i
       |    JOIN $sizesRel sa ON sa.id = i.doc_a
       |    JOIN $sizesRel sb ON sb.id = i.doc_b
       |),
       |th AS (
       |  ${SweepThresholds.map(t => s"SELECT CAST($t AS DOUBLE) AS th")
           .mkString("\n  UNION ALL\n  ")}
       |),
       |hits AS (
       |  SELECT t.th, p.doc_a, p.doc_b
       |    FROM th t JOIN jp p ON p.j >= t.th
       |),
       |docs AS (
       |  SELECT th, doc_a AS d FROM hits
       |  UNION
       |  SELECT th, doc_b AS d FROM hits
       |)
       |SELECT t.th AS threshold,
       |       CAST(COALESCE(pc.pair_ct, 0) AS BIGINT) AS pair_ct,
       |       CAST(COALESCE(dc.doc_ct, 0) AS BIGINT) AS affected_doc_ct
       |  FROM th t
       |  LEFT JOIN (SELECT th, COUNT(*) AS pair_ct FROM hits GROUP BY th) pc
       |    ON pc.th = t.th
       |  LEFT JOIN (SELECT th, COUNT(*) AS doc_ct FROM docs GROUP BY th) dc
       |    ON dc.th = t.th
       | ORDER BY threshold""".stripMargin

  def thresholdSweepSql(table: String)(d: Dialect): String =
    s"""WITH ${shinglesCte(d, table)},
       |sigs AS (
       |${minhashSigsSql("shf")}
       |),
       |${minhashCandsCtes("sigs")},
       |${candInterCte("shf")},
       |${thresholdSweepTail("cinter", "sizes")}""".stripMargin

  def runThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val k = registerShingleRels(spark, dir)
    registerCandInterRel(spark, k)
    spark.sql(s"WITH ${thresholdSweepTail(s"__graft_cinter_$k", s"__graft_sizes_$k")}")
  }

  /** Near-dup pair drill-down — the reference's lookup-query pattern
    * (`testgen/common/source_data_service.py:26,50-54`: top-k evidence
    * rows per finding) carried into the dedup domain: the top verified
    * pairs by jaccard with their shared-shingle evidence and text
    * previews, the rows a reviewer reads before trusting a threshold.
    *
    * Scale shape: the verified pair relation is landed (tiny); only
    * the top-k pairs join back to the corpus for previews — two
    * broadcast-sized joins, never a corpus shuffle. */
  private def pairLookupTail(cinterRel: String, sizesRel: String,
                             table: String, limit: Int): String =
    s"""jp AS (
       |  SELECT i.doc_a, i.doc_b, i.ict,
       |         CAST(ROUND(CAST(i.ict AS DOUBLE) / (sa.sz + sb.sz - i.ict), 4) AS DOUBLE) AS jaccard
       |    FROM $cinterRel i
       |    JOIN $sizesRel sa ON sa.id = i.doc_a
       |    JOIN $sizesRel sb ON sb.id = i.doc_b
       |   WHERE CAST(i.ict AS DOUBLE) / (sa.sz + sb.sz - i.ict) >= 0.5
       |),
       |topk AS (
       |  SELECT * FROM jp ORDER BY jaccard DESC, doc_a, doc_b LIMIT $limit
       |)
       |SELECT t.doc_a, t.doc_b, t.jaccard,
       |       CAST(t.ict AS BIGINT) AS shared_shingle_ct,
       |       SUBSTRING(da.text, 1, 60) AS preview_a,
       |       SUBSTRING(db.text, 1, 60) AS preview_b
       |  FROM topk t
       |  JOIN $table da ON da.doc_id = t.doc_a
       |  JOIN $table db ON db.doc_id = t.doc_b
       | ORDER BY jaccard DESC, doc_a, doc_b""".stripMargin

  def pairLookupSql(table: String, limit: Int = 20)(d: Dialect): String =
    s"""WITH ${shinglesCte(d, table)},
       |sigs AS (
       |${minhashSigsSql("shf")}
       |),
       |${minhashCandsCtes("sigs")},
       |${candInterCte("shf")},
       |${pairLookupTail("cinter", "sizes", table, limit)}""".stripMargin

  def runPairLookup(spark: SparkSession, dir: String): DataFrame = {
    val k = registerShingleRels(spark, dir)
    registerCandInterRel(spark, k)
    val docs = register(spark, dir)
    spark.sql(s"WITH ${pairLookupTail(s"__graft_cinter_$k", s"__graft_sizes_$k", docs, 20)}")
  }

  /** The candidate-verify intersection as a skew-dispatched DataFrame —
    * row-identical to [[candInterCte]] (the DuckDB oracle's form;
    * SkewJoinSpec pins the parity): cands equi-join the shingle
    * relation per side, grouped to shared-shingle counts. The doc-id
    * key of the a-side join is where templated near-dup HUBS skew: one
    * doc in thousands of candidate pairs lands every pair row on one
    * task. The advisor measures the candidate relation's doc_a
    * histogram ([[graft.core.SkewJoin.hotKeys]], >1% of pairs) and
    * routes hot hubs through the two-tier salted join; the b-side join
    * keys on (doc_b, shingle) — the shingle component spreads it, so it
    * stays plain. The salted join is row-multiset-identical and the
    * GROUP BY is order-independent, so results (and the oracle hash)
    * never depend on the dispatch. */
  private[graft] def candInterFrame(spark: SparkSession, cands: DataFrame,
                                       shf: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val hot = graft.core.SkewJoin.hotKeys(cands, "doc_a", 0.01)
    val aSide = shf.select(col("id").as("doc_a"), col("shingle"))
    val joinedA =
      if (hot.nonEmpty) graft.core.SkewJoin.saltedJoinHot(cands, aSide, "doc_a", hot)
      else cands.join(aSide, Seq("doc_a"))
    val bSide = shf.select(col("id").as("__doc_b2"), col("shingle").as("__shingle_b"))
    joinedA
      .join(bSide, col("doc_b") === col("__doc_b2") &&
        col("shingle") === col("__shingle_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("ict"))
  }

  /** The candidate-restricted intersection, landed once per shingle-rel
    * generation — the sweep reads it 3× (pairs, docs, rollup) and CTE
    * inlining would otherwise re-derive the band join per read. The
    * candidate pairs land first (checkpointed), the advisor reads their
    * key histogram, and the verify join dispatches through
    * [[candInterFrame]]. */
  private def registerCandInterRel(spark: SparkSession, k: Int): Unit =
    graft.core.SessionCache.getOrElseUpdate(spark, "dedup_cinter", k) {
      val cands = spark.sql(
        s"""WITH ${minhashCandsCtes(s"__graft_minhash_sigs_$k",
                                    bandGeomOf(spark, k))}
           |SELECT * FROM cands""".stripMargin)
        .localCheckpoint(eager = true)
      cands.createOrReplaceTempView(s"__graft_cands_$k")
      candInterFrame(spark, cands, spark.table(s"__graft_shf_$k"))
        .localCheckpoint(eager = true)
        .createOrReplaceTempView(s"__graft_cinter_$k")
      true
    }
  /** The simhash signature relation, memoized per (session, dir) — the
    * same landed-index discipline as [[winnowFpsView]]: the native
    * signature expression (SimHashSpec asserts bit-identity with the
    * SQL form, which remains the DuckDB oracle) runs over ONE corpus
    * scan, row-locally — no word explode, no shuffle — and the
    * checkpoint serves every later bucket-join pass. IS NOT NULL
    * mirrors the SQL form's absent row for wordless docs. */
  private def simhashSigsView(spark: SparkSession, dir: String): String =
    graft.core.SessionCache.getOrElseUpdate(spark, "simhashsigs", dir) {
      val docs = register(spark, dir)
      graft.functions.SimHashExpr.register(spark)
      val v = "__graft_simhash_sigs_" +
        java.lang.Integer.toHexString(dir.hashCode)
      spark.sql(
        s"""SELECT id, v FROM (
           |  SELECT doc_id AS id, graft_simhash(text) AS v FROM $docs) s
           | WHERE v IS NOT NULL""".stripMargin)
        .localCheckpoint(eager = true)
        .createOrReplaceTempView(v)
      v
    }

  def runSimhash(spark: SparkSession, dir: String): DataFrame =
    spark.sql(simhashBodySparkSql(simhashSigsView(spark, dir), 3))
  /** The embeddings row count, measured ONCE per (session, dir) — the
    * adaptive-resolution elections read it as a driver literal. */
  private def embCount(spark: SparkSession, dir: String): Long =
    graft.core.SessionCache.getOrElseUpdate(spark, "emb_count", dir) {
      graft.core.Tables.load(spark, dir, "embeddings", parallelize = false).count()
    }

  def runEmbedding(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "embeddings")
      .createOrReplaceTempView("__graft_emb_dedup")
    spark.sql(embeddingSql("__graft_emb_dedup",
      nOverride = Some(embCount(spark, dir)))(SparkDialect))
  }

  /** LSH-blocked embedding near-dup for UNLABELED corpora: the same
    * pair-cosine dedup as [[embeddingSql]] with the sign-LSH bucket
    * ([[Similarity.bucketExpr]]) as the blocking key instead of a label
    * — the 100 TB path when no label exists: the corpus shuffles ONCE on
    * the computed bucket (a pure per-row expression, no training pass)
    * and each pair join is bucket-local, ~1/2^nPlanes of the quadratic.
    * Sign-LSH buckets are cosine-aware, so true near-duplicates
    * (cosine -> 1) land in the same bucket with probability
    * (1 - theta/pi)^nPlanes — the standard hamming-cosine guarantee.
    * RECALL at the elected np: the adaptive election trades pair-split
    * probability 1-(1-θ/π)^np for pinned occupancy — MEASURED at scale
    * by `graft.LshScaleBench` (lsh_scale_r14.json): planted pairs at
    * θ≈0.05 rad recall 0.751/0.725/0.704 at 1M/4M/16.8M ids (np
    * 18/20/22), R=3 stack 0.985/0.980/0.977 — a DEDUP miss
    * costs storage, not safety, so this entry ships single-table and
    * the repo measures the split rate as data (`dedup_embedding_stack`
    * reports cumulative/marginal verified-pair yield per added table
    * on this very corpus). Recall-critical consumers take the shipped
    * stacked form instead: [[decontaminateSemanticSql]] runs
    * [[DecontamTables]] disjoint-plane tables, and
    * [[embeddingStackBody]] is the reusable R-table candidate builder. */
  // Fixture threshold 0.30 (vs the labeled path's 0.40): within-bucket
  // cosine on the random synthetic corpus tops out ~0.40, so 0.30
  // surfaces a real candidate set through the gate; production near-dup
  // thresholds are 0.95+ either way.
  def embeddingLshSql(table: String, threshold: Double = 0.30,
                      minPlanes: Int = 8, dim: Int = 64,
                      nOverride: Option[Long] = None)(d: Dialect): String = {
    // ADAPTIVE plane count (Similarity.adaptiveModCase): at occ=8 the
    // elected np stays 8 through the sf0.1 fixture (N ≤ 2048 — output
    // bit-identical to the old fixed-8-plane form) and climbs with
    // log2(N) beyond it, pinning bucket occupancy so the candidate
    // join stays output-linear (the fixed form read 11.2× on the r13
    // sf10 10× hop — occupancy, not operator shape). Engine: driver-
    // counted literal modulus; oracle: SQL election, same rule.
    val bucket = Similarity.bucketExpr("embedding", Similarity.AdaptiveMaxPlanes, dim)(d)
    val bmod = nOverride
      .map(n => Similarity.adaptiveModFor(n, occ = 8, minP = minPlanes).toString)
      .getOrElse("(SELECT bmod FROM nb)")
    val nbCte = if (nOverride.isDefined) ""
      else s"nb AS (\n  ${Similarity.adaptiveModCte(table, occ = 8, minP = minPlanes)}\n),\n"
    s"""WITH ${nbCte}emb AS (
       |  SELECT vec_id, MOD($bucket, $bmod) AS bucket, embedding,
       |         SQRT(${d.dotProduct("embedding", "embedding")}) AS nrm
       |    FROM $table
       |),
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
       |         ${d.dotProduct("a.embedding", "b.embedding")} / NULLIF(a.nrm * b.nrm, 0) AS cos
       |    FROM emb a JOIN emb b
       |      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |)
       |SELECT vec_a, vec_b, bucket, CAST(ROUND(cos, 4) AS DOUBLE) AS cosine
       |  FROM pairs
       | WHERE cos >= $threshold
       | ORDER BY vec_a, vec_b""".stripMargin
  }

  def runEmbeddingLsh(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "embeddings")
      .createOrReplaceTempView("__graft_emb_lsh")
    spark.sql(embeddingLshSql("__graft_emb_lsh",
      nOverride = Some(embCount(spark, dir)))(SparkDialect))
  }

  /** Cosine thresholds the embedding sweep reports — 0.30 is the
    * operating point the LSH-blocked entry ships with; above it the
    * curve shows what stricter semantic-dup definitions would keep. */
  val EmbeddingSweepThresholds: Seq[Double] = Seq(0.30, 0.50, 0.70, 0.85, 0.95)

  /** The embedding-dedup threshold curve — the semantic companion of
    * [[runThresholdSweep]]: per cosine threshold, candidate-pair count
    * and distinct vectors touched, over the SAME bucket-blocked pair
    * relation the `dedup_embedding_lsh` entry verifies (landed once;
    * the sweep is a 5-row cross join against it — no second bucket
    * join, no corpus pass). */
  private def embeddingSweepTail(pairsRel: String): String =
    s"""th AS (
       |  ${EmbeddingSweepThresholds.map(t => s"SELECT CAST($t AS DOUBLE) AS th")
           .mkString("\n  UNION ALL\n  ")}
       |),
       |hits AS (
       |  SELECT t.th, p.vec_a, p.vec_b
       |    FROM th t JOIN $pairsRel p ON p.cos >= t.th
       |),
       |vs AS (
       |  SELECT th, vec_a AS v FROM hits
       |  UNION
       |  SELECT th, vec_b AS v FROM hits
       |)
       |SELECT t.th AS threshold,
       |       CAST(COALESCE(pc.pair_ct, 0) AS BIGINT) AS pair_ct,
       |       CAST(COALESCE(vc.vec_ct, 0) AS BIGINT) AS affected_vec_ct
       |  FROM th t
       |  LEFT JOIN (SELECT th, COUNT(*) AS pair_ct FROM hits GROUP BY th) pc
       |    ON pc.th = t.th
       |  LEFT JOIN (SELECT th, COUNT(*) AS vec_ct FROM vs GROUP BY th) vc
       |    ON vc.th = t.th
       | ORDER BY threshold""".stripMargin

  def embeddingSweepSql(table: String, minPlanes: Int = 8, dim: Int = 64,
                        nOverride: Option[Long] = None)
                       (d: Dialect): String = {
    // Same adaptive bucket as embeddingLshSql — the sweep reads the
    // SAME candidate relation the LSH entry verifies.
    val bucket = Similarity.bucketExpr("embedding", Similarity.AdaptiveMaxPlanes, dim)(d)
    val bmod = nOverride
      .map(n => Similarity.adaptiveModFor(n, occ = 8, minP = minPlanes).toString)
      .getOrElse("(SELECT bmod FROM nb)")
    val nbCte = if (nOverride.isDefined) ""
      else s"nb AS (\n  ${Similarity.adaptiveModCte(table, occ = 8, minP = minPlanes)}\n),\n"
    s"""WITH ${nbCte}emb AS (
       |  SELECT vec_id, MOD($bucket, $bmod) AS bucket, embedding,
       |         SQRT(${d.dotProduct("embedding", "embedding")}) AS nrm
       |    FROM $table
       |),
       |ep AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         ${d.dotProduct("a.embedding", "b.embedding")} / NULLIF(a.nrm * b.nrm, 0) AS cos
       |    FROM emb a JOIN emb b
       |      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |),
       |${embeddingSweepTail("ep")}""".stripMargin
  }

  /** The simhash tuning curve — completes the sweep family (jaccard
    * threshold, embedding cosine): per max-hamming threshold 0..3,
    * candidate-pair and affected-doc counts over the SAME
    * hub-cutoff-bounded banded relation the `dedup_simhash` entry
    * verifies, landed once per (session, dir); the sweep itself is a
    * 4-row cross join — zero extra corpus passes. */
  val SimhashSweepThresholds: Range = 0 to 3

  private def simhashSweepTail(pairsRel: String): String =
    s"""th AS (
       |  ${SimhashSweepThresholds.map(h => s"SELECT CAST($h AS INT) AS th")
           .mkString("\n  UNION ALL\n  ")}
       |),
       |hits AS (
       |  SELECT t.th, p.doc_a, p.doc_b
       |    FROM th t JOIN $pairsRel p ON p.hamming <= t.th
       |),
       |vs AS (
       |  SELECT th, doc_a AS d FROM hits
       |  UNION
       |  SELECT th, doc_b AS d FROM hits
       |)
       |SELECT t.th AS max_hamming,
       |       CAST(COALESCE(pc.pair_ct, 0) AS BIGINT) AS pair_ct,
       |       CAST(COALESCE(dc.doc_ct, 0) AS BIGINT) AS affected_doc_ct
       |  FROM th t
       |  LEFT JOIN (SELECT th, COUNT(*) AS pair_ct FROM hits GROUP BY th) pc
       |    ON pc.th = t.th
       |  LEFT JOIN (SELECT th, COUNT(*) AS doc_ct FROM vs GROUP BY th) dc
       |    ON dc.th = t.th
       | ORDER BY max_hamming""".stripMargin

  def runSimhashSweep(spark: SparkSession, dir: String): DataFrame = {
    val pv = graft.core.SessionCache.getOrElseUpdate(spark, "simhashpairs", dir) {
      val name =
        s"__graft_simhash_pairs_${java.lang.Integer.toHexString(dir.hashCode)}"
      runSimhash(spark, dir).localCheckpoint(eager = true)
        .createOrReplaceTempView(name)
      name
    }
    spark.sql(s"WITH ${simhashSweepTail(pv)}")
  }

  def simhashSweepSql(table: String)(d: Dialect): String =
    s"""WITH pairs AS ${d.cteMaterialized}(${simhashSql(table)(d)}),
       |${simhashSweepTail("pairs")}""".stripMargin

  def runEmbeddingSweep(spark: SparkSession, dir: String): DataFrame = {
    val pv = graft.core.SessionCache.getOrElseUpdate(spark, "embpairs", dir) {
      graft.core.Tables.load(spark, dir, "embeddings")
        .createOrReplaceTempView("__graft_emb_lsh")
      val name = s"__graft_emb_pairs_${java.lang.Integer.toHexString(dir.hashCode)}"
      // the UNFILTERED bucket-blocked pair relation (threshold 0 keeps
      // every candidate the bucket gate admits) — landed once
      spark.sql(
        s"""WITH emb AS (
           |  SELECT vec_id,
           |         MOD(${Similarity.bucketExpr("embedding", Similarity.AdaptiveMaxPlanes)(SparkDialect)},
           |             ${Similarity.adaptiveModFor(embCount(spark, dir), occ = 8)}) AS bucket,
           |         embedding,
           |         SQRT(${SparkDialect.dotProduct("embedding", "embedding")}) AS nrm
           |    FROM __graft_emb_lsh
           |)
           |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |       ${SparkDialect.dotProduct("a.embedding", "b.embedding")} / NULLIF(a.nrm * b.nrm, 0) AS cos
           |  FROM emb a JOIN emb b
           |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id""".stripMargin)
        .localCheckpoint(eager = true).createOrReplaceTempView(name)
      name
    }
    spark.sql(s"WITH ${embeddingSweepTail(pv)}")
  }

  /** Multi-table LSH stacking — the RECALL half of the (np, R) sign-LSH
    * knob the adaptive blocking documents: finer buckets (more planes)
    * pin occupancy but split near-dup pairs with probability
    * 1-(1-θ/π)^np; production holds recall by running R INDEPENDENT
    * bucket tables and unioning their candidates. This entry measures
    * that curve on the engine's own corpus: [[StackTables]] tables,
    * table r keyed by a DISJOINT [[StackPlanesPerTable]]-plane range of
    * one 30-plane bucket (plane streams are independent Bernoulli bits,
    * so disjoint ranges ARE independent hash tables — one native bucket
    * call per row, no second projection pass), each table's candidate
    * join bucket-local, and the report shows verified pairs cumulative
    * and MARGINAL per stacked table — the yield curve that tells a
    * deployment when the next table stops paying.
    *
    * Scale shape: R bucket equi-joins over one landed (vec_id, b63,
    * nrm, embedding) relation — R× the single-table entry's cost,
    * occupancy pinned by the same adaptive modulus up to
    * [[StackPlanesPerTable]] planes per table. The bucket is the WIDE
    * LongType expression ([[Similarity.bucketLongExpr]], r14 — the
    * r13 "widens to LongType" headroom note shipped as mechanism), so
    * three tables carry 21 planes each: per-table occupancy holds to
    * occ·2²¹ ≈ 16.7M vectors per slice before
    * [[Similarity.adaptiveModForWarn]] flags exhaustion (the
    * IntegerType bucket capped that at ~8k). */
  val StackTables = 3
  val StackPlanesPerTable = 21

  def embeddingStackBody(embRel: String, bmod: String,
                         threshold: Double)(d: Dialect): String = {
    val branches = (0 until StackTables).map { r =>
      val shift = 1L << (StackPlanesPerTable * r)
      def key(side: String) = s"MOD(${d.intDiv(s"$side.b63", shift.toString)}, $bmod)"
      s"""  SELECT ${r + 1} AS tbl, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |         ${d.dotProduct("a.embedding", "b.embedding")} / NULLIF(a.nrm * b.nrm, 0) AS cos
         |    FROM $embRel a JOIN $embRel b
         |      ON ${key("a")} = ${key("b")} AND a.vec_id < b.vec_id""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val tt = (1 to StackTables).map(r => s"SELECT $r AS r").mkString("\n  UNION ALL\n  ")
    s"""allp AS (
       |$branches
       |),
       |firsts AS (
       |  SELECT vec_a, vec_b, MIN(tbl) AS first_tbl
       |    FROM allp WHERE cos >= $threshold
       |   GROUP BY vec_a, vec_b
       |),
       |tt AS (
       |  $tt
       |)
       |SELECT t.r AS n_tables,
       |       CAST(COALESCE(c.cum, 0) AS BIGINT) AS pairs_cumulative,
       |       CAST(COALESCE(m.marg, 0) AS BIGINT) AS pairs_marginal
       |  FROM tt t
       |  LEFT JOIN (SELECT t2.r, COUNT(*) AS cum
       |               FROM tt t2 JOIN firsts f ON f.first_tbl <= t2.r
       |              GROUP BY t2.r) c ON c.r = t.r
       |  LEFT JOIN (SELECT first_tbl AS r, COUNT(*) AS marg
       |               FROM firsts GROUP BY first_tbl) m ON m.r = t.r
       | ORDER BY n_tables""".stripMargin
  }

  def embeddingStackSql(table: String, threshold: Double = 0.30,
                        dim: Int = 64, nOverride: Option[Long] = None)
                       (d: Dialect): String = {
    val b63 = Similarity.bucketLongExpr(
      "embedding", StackTables * StackPlanesPerTable, dim)(d)
    val bmod = nOverride
      .map(n => Similarity.adaptiveModFor(n, occ = 8, maxP = StackPlanesPerTable).toString)
      .getOrElse("(SELECT bmod FROM nb)")
    val nbCte = if (nOverride.isDefined) ""
      else s"nb AS (\n  ${Similarity.adaptiveModCte(table, occ = 8, maxP = StackPlanesPerTable)}\n),\n"
    s"""WITH ${nbCte}emb AS (
       |  SELECT vec_id, $b63 AS b63, embedding,
       |         SQRT(${d.dotProduct("embedding", "embedding")}) AS nrm
       |    FROM $table
       |),
       |${embeddingStackBody("emb", bmod, threshold)(d)}""".stripMargin
  }

  def runEmbeddingStack(spark: SparkSession, dir: String): DataFrame = {
    val n = embCount(spark, dir)
    val pv = graft.core.SessionCache.getOrElseUpdate(spark, "embstack", dir) {
      graft.core.Tables.load(spark, dir, "embeddings")
        .createOrReplaceTempView("__graft_emb_stack_src")
      val name = s"__graft_emb_stack_${java.lang.Integer.toHexString(dir.hashCode)}"
      // one landed (vec_id, b63, nrm, embedding) relation: Spark
      // inlines CTEs, so without it the 3 union branches would re-scan
      // and re-hash the corpus 6 times
      spark.sql(
        s"""SELECT vec_id,
           |       ${Similarity.bucketLongExpr("embedding",
                      StackTables * StackPlanesPerTable)(SparkDialect)} AS b63,
           |       embedding,
           |       SQRT(${SparkDialect.dotProduct("embedding", "embedding")}) AS nrm
           |  FROM __graft_emb_stack_src""".stripMargin)
        .localCheckpoint(eager = true).createOrReplaceTempView(name)
      name
    }
    val bmod = Similarity.adaptiveModForWarn(n, occ = 8, minP = 8,
      maxP = StackPlanesPerTable, what = "dedup_embedding_stack")
    spark.sql(s"WITH ${embeddingStackBody(pv, bmod.toString, 0.30)(SparkDialect)}")
  }

  /** The landed adaptive-bucket index for STREAMING embedding dedup:
    * (vec_id, bucket, embedding, nrm) with the modulus elected from the
    * corpus at INDEX time and returned alongside — incoming batches
    * probe with the INDEX's modulus, never their own election (the
    * resolution is a property of the landed index, exactly like IVF
    * centroids; re-electing per batch would silently shift the bucket
    * space under the join). Landed once per (session, dir). */
  def embeddingIndex(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val bmod = Similarity.adaptiveModFor(embCount(spark, dir), occ = 8)
    val name = graft.core.SessionCache.getOrElseUpdate(spark, "embindex", dir) {
      graft.core.Tables.load(spark, dir, "embeddings")
        .createOrReplaceTempView("__graft_emb_index_src")
      val v = s"__graft_emb_index_${java.lang.Integer.toHexString(dir.hashCode)}"
      spark.sql(
        s"""SELECT vec_id,
           |       MOD(${Similarity.bucketExpr("embedding",
                          Similarity.AdaptiveMaxPlanes)(SparkDialect)},
           |           $bmod) AS bucket,
           |       embedding,
           |       SQRT(${SparkDialect.dotProduct("embedding", "embedding")}) AS nrm
           |  FROM __graft_emb_index_src""".stripMargin)
        .localCheckpoint(eager = true).createOrReplaceTempView(v)
      v
    }
    (spark.table(name), bmod)
  }

  /** SEMANTIC decontamination — the embedding-space companion to the
    * fingerprint [[decontaminateSql]]: paraphrased or re-formatted eval
    * items share no 40-char winnow gram with their training twin but DO
    * land nearby in embedding space, so benchmark leakage audits run
    * both screens. Eval membership is a deterministic fixture role
    * (`vec_id % 41 = 0` stands in for the benchmark embedding table);
    * candidates block on a sign-LSH bucket and score by exact cosine.
    *
    * Fewer planes than the dedup path (4 vs 8): decontamination is
    * recall-critical — a missed leak poisons the benchmark, a spurious
    * candidate merely costs one exact-cosine check — so the bucket
    * gate is twice as permissive AND the shipped entry runs the full
    * (np, R) stack: [[DecontamTables]] independent bucket tables, each
    * keyed by a DISJOINT [[DecontamPlanesPerTable]]-plane range of the
    * one native WIDE bucket
    * ([[graft.pipeline.Similarity.bucketLongExpr]], 63 planes — plane
    * bits are independent Bernoulli draws, so disjoint ranges ARE
    * independent hash tables). A near-dup pair at angle θ
    * splits ONE table with probability 1-(1-θ/π)^np; with R tables the
    * MISS probability is that quantity to the R-th power — at np=4,
    * θ/π=0.2 that is 0.59 → 0.20, the difference between a dedup
    * convenience and a contamination-safety gate.
    *
    * Scale shape: the eval side is benchmark-sized (broadcast); the
    * training corpus shuffles ZERO times — each row computes its one
    * native bucket, probes the broadcast eval keys R times (R
    * broadcast joins over the same scan), and only colliding rows
    * reach the cosine; the GROUP BY dedups candidates surfaced by
    * more than one table. Per-table np caps at
    * [[DecontamPlanesPerTable]] = 21 (3 disjoint ranges fit the 63-bit
    * LongType bucket), holding per-table occupancy to occ·2²¹ ≈ 67M
    * training rows; the engine path WARNS when the corpus exhausts
    * that cap ([[graft.pipeline.Similarity.adaptiveModForWarn]]).
    * Fixture threshold 0.25, same adjudication as the 0.30/0.40
    * embedding-dedup entries (production 0.9+). */
  val DecontamTables = 3
  val DecontamPlanesPerTable = 21

  /** The shared CTE prefix — `nb` (oracle election), `demb` (one scan:
    * wide bucket + norm + eval flag), `dpairs` (the R branch joins). */
  private def decontamPairsCtes(table: String, minPlanes: Int, dim: Int,
                                nOverride: Option[Long], tables: Int)
                               (d: Dialect): String = {
    // ADAPTIVE per-table plane count, recall-biased floor: occ=32 keeps
    // the oracle-scale election at the permissive 4-plane floor and
    // climbs with log2(N) to the 21-plane range cap. Engine:
    // driver-counted literal; oracle: SQL election, same rule.
    val bucket = Similarity.bucketLongExpr(
      "embedding", DecontamTables * DecontamPlanesPerTable, dim)(d)
    val bmod = nOverride
      .map(n => Similarity.adaptiveModFor(n, occ = 32, minP = minPlanes,
        maxP = DecontamPlanesPerTable).toString)
      .getOrElse("(SELECT bmod FROM nb)")
    val nbCte = if (nOverride.isDefined) ""
      else s"nb AS (\n  ${Similarity.adaptiveModCte(table, occ = 32,
        minP = minPlanes, maxP = DecontamPlanesPerTable)}\n),\n"
    val branches = (0 until tables).map { r =>
      val shift = 1L << (DecontamPlanesPerTable * r)
      def key(side: String) = s"MOD(${d.intDiv(s"$side.b63", shift.toString)}, $bmod)"
      s"""  SELECT /*+ BROADCAST(e) */ ${r + 1} AS tbl,
         |         t.vec_id AS train_id, e.vec_id AS eval_id,
         |         ${d.dotProduct("t.embedding", "e.embedding")}
         |           / NULLIF(t.nrm * e.nrm, 0) AS cos
         |    FROM demb t JOIN demb e
         |      ON ${key("t")} = ${key("e")} AND e.is_eval AND NOT t.is_eval""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""${nbCte}demb AS (
       |  SELECT vec_id, $bucket AS b63, embedding,
       |         SQRT(${d.dotProduct("embedding", "embedding")}) AS nrm,
       |         (vec_id % 41 = 0) AS is_eval
       |    FROM $table
       |),
       |dpairs AS (
       |$branches
       |)""".stripMargin
  }

  def decontaminateSemanticSql(table: String, threshold: Double = 0.25,
                               minPlanes: Int = 4, dim: Int = 64,
                               nOverride: Option[Long] = None,
                               tables: Int = DecontamTables)
                              (d: Dialect): String =
    s"""WITH ${decontamPairsCtes(table, minPlanes, dim, nOverride, tables)(d)}
       |SELECT train_id, eval_id,
       |       CAST(MIN(tbl) AS INT) AS first_tbl,
       |       CAST(ROUND(MAX(cos), 4) AS DOUBLE) AS cosine
       |  FROM dpairs
       | WHERE cos >= $threshold
       | GROUP BY train_id, eval_id
       | ORDER BY train_id, eval_id""".stripMargin

  /** The yield curve of the decontamination stack — what each added
    * table BUYS in recovered leak pairs (the embedding-stack report's
    * safety-gate twin): per table count 1..R, cumulative and marginal
    * verified leak pairs, where a pair counts at the FIRST table that
    * surfaces it. The marginal column is the number a deployment reads
    * to justify (or stop) adding tables; a fat marginal at R means the
    * pair-split probability is still high and R should grow. */
  def decontaminateStackSql(table: String, threshold: Double = 0.25,
                            minPlanes: Int = 4, dim: Int = 64,
                            nOverride: Option[Long] = None)
                           (d: Dialect): String = {
    val tt = (1 to DecontamTables).map(r => s"SELECT $r AS r")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH ${decontamPairsCtes(table, minPlanes, dim, nOverride,
                                 DecontamTables)(d)},
       |firsts AS (
       |  SELECT train_id, eval_id, MIN(tbl) AS first_tbl
       |    FROM dpairs WHERE cos >= $threshold
       |   GROUP BY train_id, eval_id
       |),
       |tt AS (
       |  $tt
       |)
       |SELECT t.r AS n_tables,
       |       CAST(COALESCE(c.cum, 0) AS BIGINT) AS leak_pairs_cumulative,
       |       CAST(COALESCE(m.marg, 0) AS BIGINT) AS leak_pairs_marginal
       |  FROM tt t
       |  LEFT JOIN (SELECT t2.r, COUNT(*) AS cum
       |               FROM tt t2 JOIN firsts f ON f.first_tbl <= t2.r
       |              GROUP BY t2.r) c ON c.r = t.r
       |  LEFT JOIN (SELECT first_tbl AS r, COUNT(*) AS marg
       |               FROM firsts GROUP BY first_tbl) m ON m.r = t.r
       | ORDER BY n_tables""".stripMargin
  }

  def runDecontaminateStack(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "embeddings")
      .createOrReplaceTempView("__graft_emb_decon_stack")
    spark.sql(decontaminateStackSql("__graft_emb_decon_stack",
      nOverride = Some(embCount(spark, dir)))(SparkDialect))
  }

  def runDecontaminateSemantic(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "embeddings")
      .createOrReplaceTempView("__graft_emb_decon")
    val n = embCount(spark, dir)
    Similarity.adaptiveModForWarn(n, occ = 32, minP = 4,
      maxP = DecontamPlanesPerTable, what = "decontaminate_semantic")
    spark.sql(decontaminateSemanticSql("__graft_emb_decon",
      nOverride = Some(n))(SparkDialect))
  }

  /** Winnowing fingerprint dedup (the MOSS rolling-hash scheme,
    * Schleimer/Wilkerson/Aiken 2003): hash every `k`-char gram of the
    * normalized text, keep each `w`-window's MINIMUM hash, and the
    * distinct kept hashes are the document's fingerprint set — a
    * guaranteed-coverage sample ~2/(w+1) the size of the gram stream.
    * Near-dup candidates are docs sharing fingerprints through the same
    * inverted-index join + hot-cutoff guard as the shingle paths (the
    * only join key is the fingerprint — never an all-pairs scan), scored
    * by fingerprint-set Jaccard.
    *
    * The window minimum is ONE window-function pass partitioned by doc
    * (every doc an independent partition at scale); DISTINCT collapses
    * repeated minima — the standard SQL expression of winnowing. All
    * hashing is md5-based so both engines fingerprint identically. */
  /** The fingerprint-set relation alone — (id, fp) distinct rows. The
    * body queries below reference it several times, and Spark inlines
    * repeated CTEs (re-deriving the whole gram chain per reference), so
    * the Spark entry points materialize this once per (session, dir)
    * via [[winnowFpsView]]; the oracle keeps the single statement. */
  def winnowFpsSql(table: String, k: Int = 8, w: Int = 4)(d: Dialect): String = {
    val norm = s"TRIM(${d.regexpReplace("LOWER(text)", """\s+""", " ")})"
    val gramHash = d.hexToLong(s"SUBSTRING(MD5(SUBSTRING(t, pos, $k)), 1, 15)")
    s"""WITH nd AS (
       |  SELECT doc_id AS id, $norm AS t FROM $table
       |),
       |grams AS (
       |  SELECT id, pos, $gramHash AS h
       |    FROM (${d.seriesRel("nd", Seq("id", "t"), s"LENGTH(t) - $k + 1")}) g
       |),
       |wins AS (
       |  SELECT id, pos,
       |         MIN(h) OVER (PARTITION BY id ORDER BY pos
       |                      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS fp
       |    FROM grams
       |)
       |SELECT DISTINCT id, fp FROM wins WHERE pos >= $w""".stripMargin
  }

  /** Spark-side hot-cutoff filter: the per-fingerprint count rides a
    * COUNT window over the SAME `fp` partitioning the downstream pair
    * self-join consumes, so the fingerprint relation is exchanged by
    * `fp` ONCE and that exchange is shared (ReuseExchange) by both
    * join sides — where the oracle form's groupBy+join hot census
    * plans a census aggregation + broadcast build per REFERENCE of
    * `fpf` (Spark inlines CTEs; the winnow body references it twice).
    * Guide §2.4: an aggregation and a join keyed the same way share
    * one exchange. Row-set identical to the join form by construction
    * (same count, same cutoff); the oracle keeps the census rendering,
    * so the full result is re-proven equal end-to-end by the gate.
    *
    * Regime adjudication (r14, same-window A/B at both points): the
    * window form wins at sf0.1 (family 0.94-1.14 s vs 1.34-1.95 s
    * warm) and is the structurally-right shape at corpus scale, where
    * the distinct-fingerprint census cannot broadcast and the join
    * form degenerates to census exchange + sort-merge sorts — the
    * window pays ONE fp exchange + per-partition sort. In between
    * sits a broadcast regime (sf1: 50k docs, census small enough to
    * broadcast-build) where the join form measures 0.2-0.4 s faster
    * absolute; accepted — the mid-regime penalty is bounded (≤1.4×
    * on ~1 s entries) while the win at the graded point and the
    * asymptote is 1.5-2×.
    *
    * PROVEN r15 (VERDICT r14 #4, graft.AbWinnow at sf1 with
    * autoBroadcastJoinThreshold=-1 — the forced sort-merge regime):
    * the FINAL adaptive plan (plans/r15/winnow_ab_window.txt) shows
    * the fingerprint relation exchanged by fp EXACTLY ONCE
    * (ShuffleQueryStage 0) with ReusedExchange feeding the second
    * join side, the pair SMJ consuming the window's partitioning with
    * no extra exchange — 5 unique exchanges vs the census+join form's
    * 6 (plans/r15/winnow_ab_census_join.txt). Same-JVM min-of-3:
    * window 1.00 s vs census+join 0.94 s — a wash in the forced-SMJ
    * regime at sf1, with the window keeping the graded-point win. */
  private[pipeline] def hotFpsSparkCte(fpsRel: String, hotCutoff: Int): String =
    s"""fpf AS (
       |  SELECT id, fp FROM (
       |    SELECT id, fp, COUNT(*) OVER (PARTITION BY fp) AS fp_ct
       |      FROM $fpsRel) w
       |   WHERE fp_ct <= $hotCutoff
       |)""".stripMargin

  /** The near-dup pair body over a fingerprint relation; dialect-free. */
  def winnowBodySql(fpsRel: String, minShared: Int = 3,
                    hotCutoff: Int = 50): String =
    s"""WITH fpf AS (
       |  SELECT f.id, f.fp FROM $fpsRel f
       |  JOIN (SELECT fp FROM $fpsRel GROUP BY fp HAVING COUNT(*) <= $hotCutoff) ok
       |    ON f.fp = ok.fp
       |),
       |-- sizes from the PRE-hot-cutoff relation: the cutoff only bounds
       |-- the candidate join; the Jaccard denominator must reflect the
       |-- FULL fingerprint set, or mostly-hot (boilerplate) docs get tiny
       |-- denominators and outrank genuinely similar pairs
       |sizes AS (SELECT id, COUNT(*) AS sz FROM $fpsRel GROUP BY id),
       |pairs AS (
       |  SELECT a.id AS doc_a, b.id AS doc_b, COUNT(*) AS shared
       |    FROM fpf a JOIN fpf b ON a.fp = b.fp AND a.id < b.id
       |   GROUP BY a.id, b.id HAVING COUNT(*) >= $minShared
       |)
       |SELECT p.doc_a, p.doc_b, CAST(p.shared AS BIGINT) AS shared_fp_ct,
       |       CAST(ROUND(CAST(p.shared AS DOUBLE)
       |                  / (sa.sz + sb.sz - p.shared), 4) AS DOUBLE)
       |         AS winnow_jaccard
       |  FROM pairs p
       |  JOIN sizes sa ON sa.id = p.doc_a
       |  JOIN sizes sb ON sb.id = p.doc_b
       | ORDER BY winnow_jaccard DESC, p.doc_a, p.doc_b
       | LIMIT 100""".stripMargin

  def winnowSql(table: String, k: Int = 8, w: Int = 4,
                minShared: Int = 3, hotCutoff: Int = 50)(d: Dialect): String =
    s"""WITH fps AS (${winnowFpsSql(table, k, w)(d)}),
       |${winnowBodySql("fps", minShared, hotCutoff).stripPrefix("WITH ")}""".stripMargin

  /** Engine rendering of [[winnowBodySql]] — identical tail, hot
    * filter via [[hotFpsSparkCte]] (OptRewriteParitySpec pins row
    * identity with the oracle form; the gate re-proves it end-to-end). */
  def winnowBodySparkSql(fpsRel: String, minShared: Int = 3,
                         hotCutoff: Int = 50): String =
    s"""WITH ${hotFpsSparkCte(fpsRel, hotCutoff)},
       |sizes AS (SELECT id, COUNT(*) AS sz FROM $fpsRel GROUP BY id),
       |pairs AS (
       |  SELECT a.id AS doc_a, b.id AS doc_b, COUNT(*) AS shared
       |    FROM fpf a JOIN fpf b ON a.fp = b.fp AND a.id < b.id
       |   GROUP BY a.id, b.id HAVING COUNT(*) >= $minShared
       |)
       |SELECT p.doc_a, p.doc_b, CAST(p.shared AS BIGINT) AS shared_fp_ct,
       |       CAST(ROUND(CAST(p.shared AS DOUBLE)
       |                  / (sa.sz + sb.sz - p.shared), 4) AS DOUBLE)
       |         AS winnow_jaccard
       |  FROM pairs p
       |  JOIN sizes sa ON sa.id = p.doc_a
       |  JOIN sizes sb ON sb.id = p.doc_b
       | ORDER BY winnow_jaccard DESC, p.doc_a, p.doc_b
       | LIMIT 100""".stripMargin

  /** The materialized winnowing fingerprint sets, memoized per
    * (session, dir) — shared by the near-dup entry and decontamination.
    *
    * Built with the NATIVE [[graft.functions.WinnowFpsExpr]] expression
    * (one codegen'd projection + explode of the per-doc fingerprint
    * array), not the SQL char-position explode + per-doc window sort —
    * the expression keeps the gram stream inside the row, so the only
    * rows that ever exist are the ~2/(w+1)-sampled fingerprints
    * themselves. WinnowExprSpec asserts row-set identity with the SQL
    * form ([[winnowFpsSql]]), which remains the DuckDB oracle rendering. */
  def winnowFpsView(spark: SparkSession, dir: String): String =
    graft.core.SessionCache.getOrElseUpdate(spark, "winnowfps", dir) {
      val docs = register(spark, dir)
      graft.functions.WinnowFpsExpr.register(spark)
      val v = "__graft_winnow_fps_" +
        java.lang.Integer.toHexString(dir.hashCode)
      spark.sql(
        s"""SELECT doc_id AS id, fp FROM $docs
           | LATERAL VIEW explode(graft_winnow_fps(text)) e AS fp""".stripMargin)
        .localCheckpoint(eager = true)
        .createOrReplaceTempView(v)
      v
    }

  def runWinnow(spark: SparkSession, dir: String): DataFrame =
    spark.sql(winnowBodySparkSql(winnowFpsView(spark, dir)))

  /** Decontamination — train/eval n-gram collision detection (the
    * published 13-gram-overlap checks of large-model training runs, on
    * the winnowing fingerprint sample instead of raw n-grams): the
    * corpus split joins the held-out split on shared fingerprints, and
    * every (corpus doc, eval doc) pair sharing at least `minShared`
    * rare fingerprints is flagged with the fraction of the eval doc's
    * fingerprints it covers. The fixture's held-out split is doc_id %
    * $EvalMod = 0 — in production the eval side is the benchmark
    * corpus relation. Join keys are fingerprints only (hot-cutoff
    * bounded), never doc pairs. */
  val EvalMod = 23

  /** The shared decontamination CTE prefix — `fpf` (hot-cutoff-bounded
    * fingerprints), `hits` (corpus×eval shared counts), `esizes`. */
  private[pipeline] def decontCtes(fpsRel: String, minShared: Int,
                                   hotCutoff: Int): String =
    s"""fpf AS (
       |  SELECT f.id, f.fp FROM $fpsRel f
       |  JOIN (SELECT fp FROM $fpsRel GROUP BY fp HAVING COUNT(*) <= $hotCutoff) ok
       |    ON f.fp = ok.fp
       |),
       |hits AS (
       |  SELECT c.id AS corpus_id, e.id AS eval_id, COUNT(*) AS shared
       |    FROM fpf c JOIN fpf e
       |      ON e.fp = c.fp AND c.id % $EvalMod <> 0 AND e.id % $EvalMod = 0
       |   GROUP BY c.id, e.id HAVING COUNT(*) >= $minShared
       |),
       |esizes AS (SELECT id, COUNT(*) AS sz FROM $fpsRel
       |           WHERE id % $EvalMod = 0 GROUP BY id)""".stripMargin

  /** Engine rendering of [[decontCtes]] — hot filter via
    * [[hotFpsSparkCte]] (one shared fp exchange), same `hits`/`esizes`
    * text. */
  private[pipeline] def decontSparkCtes(fpsRel: String, minShared: Int,
                                        hotCutoff: Int): String =
    s"""${hotFpsSparkCte(fpsRel, hotCutoff)},
       |hits AS (
       |  SELECT c.id AS corpus_id, e.id AS eval_id, COUNT(*) AS shared
       |    FROM fpf c JOIN fpf e
       |      ON e.fp = c.fp AND c.id % $EvalMod <> 0 AND e.id % $EvalMod = 0
       |   GROUP BY c.id, e.id HAVING COUNT(*) >= $minShared
       |),
       |esizes AS (SELECT id, COUNT(*) AS sz FROM $fpsRel
       |           WHERE id % $EvalMod = 0 GROUP BY id)""".stripMargin

  private def decontaminateTail: String =
    s"""SELECT h.corpus_id, h.eval_id, CAST(h.shared AS BIGINT) AS shared_fp_ct,
       |       CAST(ROUND(CAST(h.shared AS DOUBLE) / s.sz, 4) AS DOUBLE)
       |         AS eval_overlap
       |  FROM hits h
       |  JOIN esizes s ON s.id = h.eval_id
       | ORDER BY eval_overlap DESC, h.corpus_id, h.eval_id
       | LIMIT 100""".stripMargin

  def decontaminateBodySql(fpsRel: String, minShared: Int = 3,
                           hotCutoff: Int = 50): String =
    s"""WITH ${decontCtes(fpsRel, minShared, hotCutoff)}
       |$decontaminateTail""".stripMargin

  /** Engine form: [[decontSparkCtes]] hot filter, identical tail. */
  def decontaminateBodySparkSql(fpsRel: String, minShared: Int = 3,
                                hotCutoff: Int = 50): String =
    s"""WITH ${decontSparkCtes(fpsRel, minShared, hotCutoff)}
       |$decontaminateTail""".stripMargin

  def decontaminateSql(table: String)(d: Dialect): String =
    s"""WITH fps AS (${winnowFpsSql(table)(d)}),
       |${decontaminateBodySql("fps").stripPrefix("WITH ")}""".stripMargin

  def runDecontaminate(spark: SparkSession, dir: String): DataFrame =
    spark.sql(decontaminateBodySparkSql(winnowFpsView(spark, dir)))

  /** Per-benchmark-item contamination verdict — the report a curation
    * run actually acts on: for each eval doc, how many corpus docs
    * collide with it and its worst fingerprint overlap. A benchmark
    * item with high max overlap is compromised regardless of how many
    * distinct corpus docs leaked it; no LIMIT — the eval set is
    * benchmark-sized. */
  private def decontaminateReportTail: String =
    s"""SELECT h.eval_id,
       |       CAST(COUNT(*) AS BIGINT) AS corpus_match_ct,
       |       CAST(MAX(h.shared) AS BIGINT) AS max_shared_fp_ct,
       |       CAST(ROUND(CAST(MAX(h.shared) AS DOUBLE) / s.sz, 4) AS DOUBLE)
       |         AS max_eval_overlap
       |  FROM hits h
       |  JOIN esizes s ON s.id = h.eval_id
       | GROUP BY h.eval_id, s.sz
       | ORDER BY max_eval_overlap DESC, eval_id""".stripMargin

  def decontaminateReportSql(fpsRel: String, minShared: Int = 3,
                             hotCutoff: Int = 50): String =
    s"""WITH ${decontCtes(fpsRel, minShared, hotCutoff)}
       |$decontaminateReportTail""".stripMargin

  /** Engine form: [[decontSparkCtes]] hot filter, identical tail. */
  def decontaminateReportSparkSql(fpsRel: String, minShared: Int = 3,
                                  hotCutoff: Int = 50): String =
    s"""WITH ${decontSparkCtes(fpsRel, minShared, hotCutoff)}
       |$decontaminateReportTail""".stripMargin

  def decontaminateReportFullSql(table: String)(d: Dialect): String =
    s"""WITH fps AS (${winnowFpsSql(table)(d)}),
       |${decontaminateReportSql("fps").stripPrefix("WITH ")}""".stripMargin

  def runDecontaminateReport(spark: SparkSession, dir: String): DataFrame =
    spark.sql(decontaminateReportSparkSql(winnowFpsView(spark, dir)))

  /** The raw decontamination hit relation (corpus_id, eval_id, shared),
    * landed once per (session, dir) — the curation ledger (and any
    * drill-down) reads the landed rows instead of re-running the
    * fingerprint join per consumer. */
  private[pipeline] def decontHitsView(spark: SparkSession, dir: String): String =
    graft.core.SessionCache.getOrElseUpdate(spark, "deconthits", dir) {
      val v = "__graft_decont_hits_" +
        java.lang.Integer.toHexString(dir.hashCode)
      spark.sql(
        s"""WITH ${decontSparkCtes(winnowFpsView(spark, dir), 3, 50)}
           |SELECT corpus_id, eval_id, CAST(shared AS BIGINT) AS shared
           |  FROM hits""".stripMargin)
        .localCheckpoint(eager = true).createOrReplaceTempView(v)
      v
    }

  /** Batch fingerprint NOVELTY — the freshness complement of
    * [[runIncremental]]: per incoming-batch doc, the fraction of its
    * winnowing fingerprints never seen in the landed corpus. A pipeline
    * watches this to detect a crawl gone stale (novelty collapsing
    * toward 0) or a domain shift (novelty spiking). Join key is the
    * fingerprint against the DISTINCT landed fingerprint set — bounded
    * fan-out, no doc pairs, landed side read from the memoized
    * checkpoint. */
  def batchNoveltySql(fpsRel: String): String =
    s"""WITH landedfp AS (
       |  SELECT DISTINCT fp FROM $fpsRel WHERE id % $BatchMod <> $BatchRem
       |),
       |batch AS (
       |  SELECT id, fp FROM $fpsRel WHERE id % $BatchMod = $BatchRem
       |),
       |j AS (
       |  SELECT b.id, COUNT(*) AS total, COUNT(l.fp) AS seen
       |    FROM batch b LEFT JOIN landedfp l ON l.fp = b.fp
       |   GROUP BY b.id
       |)
       |SELECT id AS batch_id, CAST(total AS BIGINT) AS fp_ct,
       |       CAST(seen AS BIGINT) AS seen_fp_ct,
       |       CAST(ROUND(CAST(total - seen AS DOUBLE) / total, 4) AS DOUBLE)
       |         AS novelty
       |  FROM j
       | ORDER BY batch_id""".stripMargin

  def batchNoveltyFullSql(table: String)(d: Dialect): String =
    s"""WITH fps AS (${winnowFpsSql(table)(d)}),
       |${batchNoveltySql("fps").stripPrefix("WITH ")}""".stripMargin

  def runBatchNovelty(spark: SparkSession, dir: String): DataFrame =
    spark.sql(batchNoveltySql(winnowFpsView(spark, dir)))

  /** Chunk-level NEAR-dup — exact chunk dedup ([[Chunker.dupSql]])
    * misses templated boilerplate whose spans differ by a counter or a
    * date; this runs the winnowing fingerprint chain at the CHUNK grain:
    * fingerprints per chunk (synthetic id doc*100000+idx), the same
    * inverted-index equi-join on fingerprints with the hot cutoff, and
    * the same pre-cutoff Jaccard denominators. A span repeated with
    * small edits across a million documents surfaces here as a
    * near-identical chunk pair; the join is always fingerprint-keyed,
    * never chunk-pairs. */
  /** Decode wrapper over a winnow pair body whose ids are composite
    * chunk ids. */
  private def fuzzyChunkOut(pairStmt: String)(d: Dialect): String =
    s"""SELECT CAST(${d.intDiv("p.doc_a", "100000")} AS BIGINT) AS doc_a,
       |       CAST(p.doc_a % 100000 AS INT) AS idx_a,
       |       CAST(${d.intDiv("p.doc_b", "100000")} AS BIGINT) AS doc_b,
       |       CAST(p.doc_b % 100000 AS INT) AS idx_b,
       |       p.shared_fp_ct, p.winnow_jaccard
       |  FROM ($pairStmt) p
       | ORDER BY p.winnow_jaccard DESC, doc_a, idx_a, doc_b, idx_b""".stripMargin

  def fuzzyChunksSql(table: String, minShared: Int = 3,
                     hotCutoff: Int = 50)(d: Dialect): String = {
    val pairs =
      s"""WITH docs AS (
         |  SELECT doc_id AS id, text FROM $table
         |),
         |${Chunker.textCteSql()(d)},
         |cfps AS (
         |  SELECT * FROM (${winnowFpsSql("ctext")(d)}) w
         |),
         |${winnowBodySql("cfps", minShared, hotCutoff).stripPrefix("WITH ")}""".stripMargin
    fuzzyChunkOut(pairs)(d)
  }

  /** The chunk-grain fingerprint relation, memoized per (session, dir) —
    * built with the native codegen'd [[graft.functions.WinnowFpsExpr]]
    * over the chunk substrings (no char-position explode), checkpointed
    * once; the SQL chain above stays the oracle rendering. */
  private def chunkFpsView(spark: SparkSession, dir: String): String =
    graft.core.SessionCache.getOrElseUpdate(spark, "chunkfps", dir) {
      val docs = register(spark, dir)
      graft.functions.WinnowFpsExpr.register(spark)
      val v = "__graft_chunk_fps_" +
        java.lang.Integer.toHexString(dir.hashCode)
      spark.sql(
        s"""WITH docs AS (
           |  SELECT doc_id AS id, text FROM $docs
           |),
           |${Chunker.textCteSql()(SparkDialect)}
           |SELECT doc_id AS id, fp FROM ctext
           | LATERAL VIEW explode(graft_winnow_fps(text)) e AS fp""".stripMargin)
        .localCheckpoint(eager = true)
        .createOrReplaceTempView(v)
      v
    }

  def runFuzzyChunks(spark: SparkSession, dir: String): DataFrame =
    spark.sql(fuzzyChunkOut(winnowBodySparkSql(chunkFpsView(spark, dir)))(SparkDialect))

  /** Incremental corpus-ingestion dedup — the shape a daily pipeline
    * actually runs: an incoming batch (fixture split: doc_id %
    * [[BatchMod]] = [[BatchRem]]) is checked against the LANDED corpus
    * (everything else) WITHOUT recomputing the corpus. Exact matches
    * equi-join the batch's md5 content hashes to the landed hash
    * relation; near matches join the batch's winnowing fingerprints to
    * the landed fingerprint relation (hot cutoff measured on the landed
    * side — the only side whose fingerprint frequencies a daily run
    * knows ahead of the batch). In the Spark path both landed relations
    * come from the memoized per-(session, dir) fingerprint checkpoint —
    * the production equivalent of reading run N−1's landed relations
    * from storage; only the batch side is fresh work. Join keys are
    * content hash / fingerprint only, never doc pairs. */
  val BatchMod = 10
  val BatchRem = 7

  /** The un-truncated near-hit relation alone — (batch_id, corpus_id,
    * shared_fp_ct). The streaming replay spec anchors the ingest-time
    * form to exactly this relation; [[incrementalBodySql]] presents its
    * top slice with similarity and the exact matches. */
  def incrementalHitsSql(fpsRel: String, minShared: Int = 3,
                         hotCutoff: Int = 50): String =
    s"""WITH landed AS (
       |  SELECT id, fp FROM $fpsRel WHERE id % $BatchMod <> $BatchRem
       |),
       |batch AS (
       |  SELECT id, fp FROM $fpsRel WHERE id % $BatchMod = $BatchRem
       |),
       |landf AS (
       |  SELECT l.id, l.fp FROM landed l
       |  JOIN (SELECT fp FROM landed GROUP BY fp HAVING COUNT(*) <= $hotCutoff) ok
       |    ON ok.fp = l.fp
       |)
       |SELECT b.id AS batch_id, l.id AS corpus_id,
       |       CAST(COUNT(*) AS BIGINT) AS shared_fp_ct
       |  FROM batch b JOIN landf l ON l.fp = b.fp
       | GROUP BY b.id, l.id HAVING COUNT(*) >= $minShared""".stripMargin

  /** [[incrementalHitsSql]] as a skew-dispatched DataFrame — the
    * landed-side fingerprint join is where a daily batch skews: a
    * boilerplate fingerprint shared across the landed corpus (hot but
    * under the 50-doc cutoff) lands every matching landed row on one
    * task. The advisor reads the landed fingerprint histogram and
    * routes hot fingerprints through the two-tier salted join (the
    * batch side replicates `salt` ways for hot keys only). Row-identical
    * to the SQL form — the shared-count GROUP BY is order-independent,
    * so the dispatch never changes results (SkewJoinSpec parity). */
  private[graft] def incrementalHitsFrame(spark: SparkSession, fpsRel: String,
                                             minShared: Int = 3,
                                             hotCutoff: Int = 50): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val fps = spark.table(fpsRel)
    val landed = fps.where(col("id") % BatchMod =!= BatchRem)
    val batch = fps.where(col("id") % BatchMod === BatchRem)
      .select(col("id").as("batch_id"), col("fp"))
    val ok = landed.groupBy("fp").agg(count(lit(1)).as("__ct"))
      .where(col("__ct") <= hotCutoff).select("fp")
    // land landf before the advisor runs: hotKeys is two actions
    // (count + histogram collect) and the join below is a third — on
    // the raw lineage the fingerprint scan + hot-cutoff groupBy +
    // ok-join would recompute once per action (same discipline as
    // registerCandInterRel's checkpoint of cands)
    val landf = landed.join(ok, Seq("fp"))
      .select(col("id").as("corpus_id"), col("fp"))
      .localCheckpoint(eager = true)
    val hot = graft.core.SkewJoin.hotKeys(landf, "fp", 0.01)
    val joined =
      if (hot.nonEmpty) graft.core.SkewJoin.saltedJoinHot(landf, batch, "fp", hot)
      else landf.join(batch, Seq("fp"))
    joined.groupBy("batch_id", "corpus_id")
      .agg(count(lit(1)).as("shared_fp_ct"))
      .where(col("shared_fp_ct") >= minShared)
      .select(col("batch_id"), col("corpus_id"), col("shared_fp_ct"))
  }

  def incrementalBodySql(fpsRel: String, docsRel: String,
                         minShared: Int = 3, hotCutoff: Int = 50,
                         hitsRel: Option[String] = None): String =
    s"""WITH hits AS (
       |  ${hitsRel.fold(
              s"SELECT * FROM (${incrementalHitsSql(fpsRel, minShared, hotCutoff)}) h")(
              r => s"SELECT * FROM $r")}
       |),
       |sizes AS (SELECT id, COUNT(*) AS sz FROM $fpsRel GROUP BY id),
       |near AS (
       |  SELECT h.batch_id, h.corpus_id, 'near' AS match_kind,
       |         h.shared_fp_ct,
       |         CAST(ROUND(CAST(h.shared_fp_ct AS DOUBLE)
       |                    / (sb.sz + sl.sz - h.shared_fp_ct), 4) AS DOUBLE) AS similarity
       |    FROM hits h
       |    JOIN sizes sb ON sb.id = h.batch_id
       |    JOIN sizes sl ON sl.id = h.corpus_id
       |),
       |exb AS (SELECT doc_id, MD5(text) AS h FROM $docsRel
       |         WHERE doc_id % $BatchMod = $BatchRem),
       |exl AS (SELECT doc_id, MD5(text) AS h FROM $docsRel
       |         WHERE doc_id % $BatchMod <> $BatchRem),
       |ex AS (
       |  SELECT b.doc_id AS batch_id, l.doc_id AS corpus_id,
       |         'exact' AS match_kind,
       |         CAST(NULL AS BIGINT) AS shared_fp_ct,
       |         CAST(1.0 AS DOUBLE) AS similarity
       |    FROM exb b JOIN exl l ON l.h = b.h
       |)
       |SELECT batch_id, corpus_id, match_kind, shared_fp_ct, similarity
       |  FROM (SELECT * FROM ex UNION ALL SELECT * FROM near) u
       | ORDER BY similarity DESC, batch_id, corpus_id, match_kind
       | LIMIT 200""".stripMargin

  def incrementalSql(table: String)(d: Dialect): String =
    s"""WITH fps AS (${winnowFpsSql(table)(d)}),
       |${incrementalBodySql("fps", table).stripPrefix("WITH ")}""".stripMargin

  def runIncremental(spark: SparkSession, dir: String): DataFrame = {
    val fpsRel = winnowFpsView(spark, dir)
    val docsRel = register(spark, dir)
    // the near-hit relation lands once per (session, dir) through the
    // skew-dispatched frame; the presentation tail reads the landed view
    val hitsView = graft.core.SessionCache.getOrElseUpdate(
      spark, "incrhits", dir) {
      val v = s"__graft_incr_hits_${dir.hashCode.toHexString}"
      incrementalHitsFrame(spark, fpsRel)
        .localCheckpoint(eager = true).createOrReplaceTempView(v)
      v
    }
    spark.sql(incrementalBodySql(fpsRel, docsRel, hitsRel = Some(hitsView)))
  }

  /** Duplicate-CLUSTER resolution — pair lists are not actionable dedup;
    * a pipeline drops duplicates by (a) grouping dup pairs into connected
    * components and (b) keeping one survivor per component. Edges are the
    * union of exact duplicates (same md5(text), each doc linked to its
    * group's min id — star-shaped, never the quadratic within-group pair
    * join) and the minhash-verified near-dup pairs (band-bucket equi-join
    * candidates, Jaccard >= threshold — see [[minhashBody]]).
    *
    * The component id is the MINIMUM doc_id reachable in the dup graph,
    * and the survivor is the member equal to its cluster id — the "keep
    * first by id" policy of the reference's duplicate handling
    * (ref testgen/template/dbsetup_anomaly_types Potential_Duplicates
    * semantics pick representatives the same way: group + MIN). */
  /** CTE list ending in the symmetric `edges(src, dst)` relation. */
  private def clusterEdgeCtes(table: String, sigsRel: String, shfRel: String,
                              sizesRel: String, threshold: Double,
                              geom: (Int, Int) = (3, 4)): String =
    s"""${minhashCandsCtes(sigsRel, geom)},
       |${candInterCte(shfRel)},
       |mh AS (
       |  SELECT doc_a, doc_b FROM (${jaccardBody("cinter", sizesRel, threshold)}) j
       |),
       |eh AS (
       |  SELECT MD5(text) AS h, MIN(doc_id) AS keep
       |    FROM $table GROUP BY MD5(text) HAVING COUNT(*) > 1
       |),
       |epairs AS (
       |  SELECT eh.keep AS doc_a, dd.doc_id AS doc_b
       |    FROM $table dd JOIN eh ON MD5(dd.text) = eh.h AND dd.doc_id > eh.keep
       |),
       |upairs AS (
       |  SELECT doc_a, doc_b FROM mh UNION SELECT doc_a, doc_b FROM epairs
       |),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM upairs
       |  UNION
       |  SELECT doc_b AS src, doc_a AS dst FROM upairs
       |)""".stripMargin

  /** Presentation over a resolved `comp(id, cid)` relation. */
  private def clusterOutSql(compRel: String): String =
    s"""SELECT c.id AS doc_id, c.cid AS cluster_id,
       |       CAST(s.cluster_sz AS BIGINT) AS cluster_sz,
       |       CAST(CASE WHEN c.id = c.cid THEN 1 ELSE 0 END AS INT) AS is_survivor
       |  FROM $compRel c
       |  JOIN (SELECT cid, COUNT(*) AS cluster_sz
       |          FROM $compRel GROUP BY cid) s
       |    ON s.cid = c.cid
       | ORDER BY cluster_id, doc_id""".stripMargin

  /** Single-statement oracle form: connected components as a recursive
    * transitive closure (`WITH RECURSIVE` + UNION-dedup terminates on the
    * cyclic dup graph), cluster id = min reachable id. The engine itself
    * never runs this — see [[runClusters]] for the distributed form. */
  private[pipeline] def clusterCompCtes(table: String, threshold: Double)
                             (d: Dialect): String =
    s"""WITH RECURSIVE ${shinglesCte(d, table)},
       |sigs AS (
       |${minhashSigsSql("shf")}
       |),
       |${clusterEdgeCtes(table, "sigs", "shf", "sizes", threshold)},
       |reach AS (
       |  SELECT DISTINCT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT rc.id, e.dst AS r FROM reach rc JOIN edges e ON e.src = rc.r
       |),
       |comp AS (SELECT id, MIN(r) AS cid FROM reach GROUP BY id)""".stripMargin

  def clustersSql(table: String, threshold: Double = 0.5)(d: Dialect): String =
    s"""${clusterCompCtes(table, threshold)(d)}
       |${clusterOutSql("comp")}""".stripMargin

  /** Survivor-policy audit — the check a curation run does before
    * trusting min-id survivor selection: for every duplicate cluster,
    * the min-id survivor's quality vs the best-quality member. A
    * cluster where they differ (`policy_loss > 0`) is one where the
    * deterministic id policy is throwing away the better copy — the
    * standard refinement is to switch the survivor ORDER BY to
    * (quality DESC, id), and this relation measures exactly how much
    * that would buy. Tail is shared verbatim between the oracle's
    * recursive form and the Spark run over the landed component
    * labels; quality comes from the single-scan `text_analysis`
    * metrics. */
  private def survivorAuditTail(compRel: String, table: String)
                               (d: Dialect): String =
    s"""qx AS (
       |  SELECT doc_id, quality_score FROM (
       |${TextAnalysis.sql(table, ordered = false)(d)}
       |  ) tq
       |),
       |jq AS (
       |  SELECT c.id, c.cid, q.quality_score
       |    FROM $compRel c JOIN qx q ON q.doc_id = c.id
       |),
       |best AS (
       |  SELECT cid, id AS best_id, quality_score AS best_quality FROM (
       |    SELECT cid, id, quality_score,
       |           ROW_NUMBER() OVER (PARTITION BY cid
       |                              ORDER BY quality_score DESC, id) AS rn
       |      FROM jq) b
       |   WHERE rn = 1
       |),
       |sv AS (
       |  SELECT cid, quality_score AS survivor_quality
       |    FROM jq WHERE id = cid
       |),
       |szs AS (SELECT cid, COUNT(*) AS cluster_sz FROM jq GROUP BY cid)
       |SELECT b.cid AS cluster_id,
       |       CAST(z.cluster_sz AS BIGINT) AS cluster_sz,
       |       CAST(b.cid AS BIGINT) AS survivor_id,
       |       CAST(s.survivor_quality AS DOUBLE) AS survivor_quality,
       |       CAST(b.best_id AS BIGINT) AS best_id,
       |       CAST(b.best_quality AS DOUBLE) AS best_quality,
       |       CAST(ROUND(b.best_quality - s.survivor_quality, 4) AS DOUBLE)
       |         AS policy_loss,
       |       CAST(CASE WHEN b.best_id <> b.cid THEN 1 ELSE 0 END AS INT)
       |         AS policy_suboptimal
       |  FROM best b
       |  JOIN sv s ON s.cid = b.cid
       |  JOIN szs z ON z.cid = b.cid
       | ORDER BY cluster_id""".stripMargin

  def survivorAuditSql(table: String, threshold: Double = 0.5)
                      (d: Dialect): String =
    s"""${clusterCompCtes(table, threshold)(d)},
       |${survivorAuditTail("comp", table)(d)}""".stripMargin

  def runSurvivorAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = register(spark, dir)
    val comp = clusterCompView(spark, dir)
    spark.sql(
      s"""WITH ${survivorAuditTail(comp, t)(SparkDialect)}""".stripMargin)
  }

  /** Distributed connected components: min-label propagation to a
    * fixpoint — each round every node takes the minimum of its own and
    * its neighbors' labels, one shuffle on the node id per round with
    * lineage truncated by localCheckpoint (reliable checkpoint on a real
    * cluster). Converges in O(component diameter) rounds; dup clusters
    * are near-cliques, so 2-3 rounds in practice, while a 100 TB corpus
    * parallelizes per-partition with no driver-side graph state. Labels
    * only ever decrease, so an unchanged label SUM is a fixpoint proof
    * (one cheap agg per round — no row-level change join). */
  /** The symmetric dup-edge relation (PlanSpec asserts it stays
    * equi-join-only — no cartesian ever enters the cluster path). */
  /** The LABELED duplicate-pair relation — minhash-verified near pairs
    * (is_exact = 0) plus exact content-hash star pairs (is_exact = 1) —
    * checkpointed once per (session, dir). Cluster edges and the
    * cross-source matrix both consume it: the r13 "landed pair reuse"
    * discipline applied to the one entry (source matrix) that still
    * re-derived the exact-pair MD5 scans per run. */
  private[graft] def dupPairsView(spark: SparkSession, dir: String): String =
    graft.core.SessionCache.getOrElseUpdate(spark, "duppairs", dir) {
      val k = registerShingleRels(spark, dir)
      val docs = register(spark, dir)
      val v = s"__graft_dup_pairs_$k"
      spark.sql(
        s"""WITH ${clusterEdgeCtes(docs, s"__graft_minhash_sigs_$k",
                                   s"__graft_shf_$k", s"__graft_sizes_$k", 0.5,
                                   bandGeomOf(spark, k))}
           |SELECT doc_a, doc_b, 0 AS is_exact FROM mh
           |UNION ALL
           |SELECT doc_a, doc_b, 1 AS is_exact FROM epairs""".stripMargin)
        .localCheckpoint(eager = true)
        .createOrReplaceTempView(v)
      v
    }

  private[graft] def clusterEdges(spark: SparkSession, dir: String): DataFrame = {
    val pv = dupPairsView(spark, dir)
    spark.sql(
      s"""WITH upairs AS (SELECT DISTINCT doc_a, doc_b FROM $pv),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM upairs
         |  UNION
         |  SELECT doc_b AS src, doc_a AS dst FROM upairs
         |)
         |SELECT src, dst FROM edges""".stripMargin)
  }

  /** The resolved `comp(id, cid)` view, memoized per (session, dir) —
    * the propagation loop runs once; the cluster entry and the quality
    * gate both read the landed labels. */
  private[graft] def clusterCompView(spark: SparkSession, dir: String): String =
    graft.core.SessionCache.getOrElseUpdate(spark, "dedupcc", dir) {
      import org.apache.spark.sql.functions.{coalesce, col, least, min, sum}
      val edges = clusterEdges(spark, dir).localCheckpoint(eager = true)
      // symmetric edges ⇒ the node set is exactly the distinct srcs
      var labels = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("cid"))
        .localCheckpoint(eager = true)
      if (labels.limit(1).count() > 0) {
        var done = false
        var rounds = 0
        while (!done && rounds < 50) {
          val nbrMin = edges.join(labels, edges("src") === labels("id"))
            .select(edges("dst").as("nid"), col("cid"))
            .groupBy("nid").agg(min("cid").as("nbr"))
          val next = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
            .select(labels("id"),
              least(labels("cid"), coalesce(col("nbr"), labels("cid"))).as("cid"))
            .localCheckpoint(eager = true)
          val prev = labels.agg(sum("cid")).first().getLong(0)
          val cur = next.agg(sum("cid")).first().getLong(0)
          done = cur == prev
          labels = next
          rounds += 1
        }
      }
      val v = "__graft_cc_comp_" + java.lang.Integer.toHexString(dir.hashCode)
      labels.createOrReplaceTempView(v)
      v
    }

  def runClusters(spark: SparkSession, dir: String): DataFrame =
    spark.sql(clusterOutSql(clusterCompView(spark, dir)))

  /** Cross-source duplication matrix — which sources copy which: the
    * exact-dup star pairs and the minhash-verified near-dup pairs
    * rolled up by unordered (source_a, source_b). Crawled corpora
    * routinely contain mirrored sites and syndicated text; this is the
    * report that tells a curation run where its duplication mass lives
    * (diagonal = within-source, off-diagonal = cross-source mirrors).
    * Reuses the SAME pair relations as cluster resolution — band-bucket
    * candidates and star-shaped exact groups, never an all-pairs join —
    * plus two broadcast-sized joins to the doc source column. */
  private def sourceMatrixBody(table: String): String =
    s"""mhsrc AS (
       |  SELECT LEAST(da.source, db.source) AS source_a,
       |         GREATEST(da.source, db.source) AS source_b,
       |         0 AS is_exact
       |    FROM mh JOIN $table da ON da.doc_id = mh.doc_a
       |            JOIN $table db ON db.doc_id = mh.doc_b
       |),
       |exsrc AS (
       |  SELECT LEAST(da.source, db.source) AS source_a,
       |         GREATEST(da.source, db.source) AS source_b,
       |         1 AS is_exact
       |    FROM epairs JOIN $table da ON da.doc_id = epairs.doc_a
       |                JOIN $table db ON db.doc_id = epairs.doc_b
       |)
       |SELECT source_a, source_b,
       |       CAST(SUM(is_exact) AS BIGINT) AS exact_pair_ct,
       |       CAST(SUM(1 - is_exact) AS BIGINT) AS near_pair_ct,
       |       CAST(COUNT(*) AS BIGINT) AS pair_ct
       |  FROM (SELECT * FROM mhsrc UNION ALL SELECT * FROM exsrc) u
       | GROUP BY source_a, source_b
       | ORDER BY source_a, source_b""".stripMargin

  def sourceMatrixSql(table: String, threshold: Double = 0.5)(d: Dialect): String =
    s"""WITH ${shinglesCte(d, table)},
       |sigs AS (
       |${minhashSigsSql("shf")}
       |),
       |${clusterEdgeCtes(table, "sigs", "shf", "sizes", threshold)},
       |${sourceMatrixBody(table)}""".stripMargin

  def runSourceMatrix(spark: SparkSession, dir: String): DataFrame = {
    val pv = dupPairsView(spark, dir)
    val docs = register(spark, dir)
    spark.sql(
      s"""WITH mh AS (SELECT doc_a, doc_b FROM $pv WHERE is_exact = 0),
         |epairs AS (SELECT doc_a, doc_b FROM $pv WHERE is_exact = 1),
         |${sourceMatrixBody(docs)}""".stripMargin)
  }

  /** Containment near-dup — the one-sided overlap Jaccard misses: a
    * short document wholly quoted inside a long one scores
    * |A∩B| / min(|A|,|B|) → 1 while its Jaccard stays near |A|/|B|
    * (wrapper pages, quote-expansions, and scraped article+comments
    * mirrors all look like this). Shares the SAME inverted-index
    * intersection relation as the Jaccard path — the co-shingle join is
    * hot-cutoff bounded, never all-pairs — and emits both scores so a
    * curation run can see which pairs only containment catches. */
  def containmentBody(interRel: String, sizesRel: String,
                      threshold: Double = 0.8): String =
    s"""SELECT i.doc_a, i.doc_b,
       |       CAST(i.ict AS BIGINT) AS shared_shingle_ct,
       |       CAST(ROUND(CAST(i.ict AS DOUBLE) / LEAST(sa.sz, sb.sz), 4)
       |            AS DOUBLE) AS containment,
       |       CAST(ROUND(CAST(i.ict AS DOUBLE) / (sa.sz + sb.sz - i.ict), 4)
       |            AS DOUBLE) AS jaccard
       |  FROM $interRel i
       |  JOIN $sizesRel sa ON sa.id = i.doc_a
       |  JOIN $sizesRel sb ON sb.id = i.doc_b
       | WHERE CAST(i.ict AS DOUBLE) / LEAST(sa.sz, sb.sz) >= $threshold
       | ORDER BY containment DESC, doc_a, doc_b
       | LIMIT 200""".stripMargin

  def containmentSql(table: String, threshold: Double = 0.8)(d: Dialect): String =
    s"""WITH ${shinglesCte(d, table)},
       |$interCte
       |${containmentBody("inter", "sizes", threshold)}""".stripMargin

  def runContainment(spark: SparkSession, dir: String): DataFrame = {
    val k = registerShingleRels(spark, dir)
    registerInterRel(spark, k)
    spark.sql(containmentBody(s"__graft_inter_$k", s"__graft_sizes_$k"))
  }

  /** LSH blocking-quality measurement — the dedup analogue of the ANN
    * `knn_recall` harness: candidate-pair recall of the banded minhash
    * blocking against the TRUE Jaccard >= threshold pairs, plus the
    * candidate count the bands actually surfaced. Recall answers "how
    * many real near-dups does banding lose", candidate precision
    * answers "how much verification work does each band admit" — the
    * two numbers that tune (bands × rows) before anyone trusts LSH
    * dedup at 100 TB (where the exact pair relation is unaffordable and
    * this harness runs on a sampled slice instead). Rounding runs in
    * integer arithmetic so both engines agree at the 4th decimal. */
  def lshRecallBody(interRel: String, sizesRel: String, sigsRel: String,
                    threshold: Double, geom: (Int, Int) = (3, 4))
                   (d: Dialect): String =
    s"""WITH ${minhashCandsCtes(sigsRel, geom)},
       |truth AS (
       |  SELECT i.doc_a, i.doc_b
       |    FROM $interRel i
       |    JOIN $sizesRel sa ON sa.id = i.doc_a
       |    JOIN $sizesRel sb ON sb.id = i.doc_b
       |   WHERE CAST(i.ict AS DOUBLE) / (sa.sz + sb.sz - i.ict) >= $threshold
       |),
       |counts AS (
       |  SELECT (SELECT COUNT(*) FROM truth) AS truth_ct,
       |         (SELECT COUNT(*) FROM cands) AS cand_ct,
       |         (SELECT COUNT(*) FROM truth t
       |            JOIN cands c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)
       |           AS caught_ct
       |)
       |SELECT CAST(truth_ct AS BIGINT) AS truth_pair_ct,
       |       CAST(cand_ct AS BIGINT) AS cand_pair_ct,
       |       CAST(caught_ct AS BIGINT) AS caught_pair_ct,
       |       CASE WHEN truth_ct = 0 THEN CAST(NULL AS DOUBLE)
       |            ELSE CAST(${d.intDiv("2 * 10000 * caught_ct + truth_ct",
                                         "2 * truth_ct")} / 10000.0 AS DOUBLE)
       |       END AS pair_recall,
       |       CASE WHEN cand_ct = 0 THEN CAST(NULL AS DOUBLE)
       |            ELSE CAST(${d.intDiv("2 * 10000 * caught_ct + cand_ct",
                                         "2 * cand_ct")} / 10000.0 AS DOUBLE)
       |       END AS cand_precision
       |  FROM counts""".stripMargin

  def lshRecallSql(table: String, threshold: Double = 0.5,
                   geom: (Int, Int) = (3, 4))(d: Dialect): String =
    s"""WITH ${shinglesCte(d, table)},
       |$interCte,
       |sigs AS (
       |${minhashSigsSql("shf", geom._1 * geom._2)}
       |),
       |${lshRecallBody("inter", "sizes", "sigs", threshold, geom)(d).stripPrefix("WITH ")}""".stripMargin

  def runLshRecall(spark: SparkSession, dir: String): DataFrame = {
    val k = registerShingleRels(spark, dir)
    registerInterRel(spark, k)
    spark.sql(lshRecallBody(s"__graft_inter_$k", s"__graft_sizes_$k",
      s"__graft_minhash_sigs_$k", 0.5, bandGeomOf(spark, k))(SparkDialect))
  }
}
