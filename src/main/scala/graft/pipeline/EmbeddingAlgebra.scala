package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect}

/** Distributed linear algebra over the embedding corpus — the two
  * primitives a 100 TB training-data pipeline runs before/around ANN:
  *
  *  - **Gram / covariance sufficient statistics** (`embedding_gram`):
  *    the D×D second-moment matrix plus per-dimension sums and the row
  *    count — everything PCA, whitening, or a linear probe needs —
  *    accumulated in ONE scan with per-partition primitive `long[]`
  *    outer-product accumulators (the computeGramianMatrix idiom: the
  *    genuine per-partition-imperative case, since 2 080 independent
  *    SQL aggregate buffers would defeat codegen). Only D·(D+1)/2
  *    partial rows per partition shuffle; vectors never do.
  *
  *  - **Johnson–Lindenstrauss random projection**
  *    (`embedding_jl_projection`): D→K sign-matrix projection, the
  *    standard ANN prefilter/compaction step. The ±1 matrix is derived
  *    from md5 of `"jl:<dim>:<k>"`, so the oracle rebuilds it
  *    arithmetically; projection is one shuffle-free scan.
  *
  * Determinism: components quantize to scaled BIGINTs (ROUND half away
  * from zero, matching both engines' SQL ROUND), so every sum is
  * integer-exact regardless of partition order. Gram uses scale 1e3
  * (headroom: |q|≈1e3-scale products sum safely to ~1e12 rows at unit
  * component scale — beyond that, widen to DECIMAL or drop the scale);
  * the JL projection uses the corpus-wide 1e5 component scale of
  * [[EmbeddingStats]].
  *
  * The eigensolve itself ([[jacobiEigen]]) runs driver-side on the
  * landed, metadata-sized (D×D) statistics — exactly how Spark MLlib's
  * PCA treats the Gramian — via cyclic Jacobi rotations.
  */
object EmbeddingAlgebra {

  /** SQL ROUND semantics (half away from zero) for the Scala side. */
  private def roundHalfAway(x: Double): Long =
    if (x >= 0) (x + 0.5).toLong else -((-x) + 0.5).toLong

  final case class VecRow(vec_id: Long, embedding: Seq[Float])

  // ---- Gram / covariance sufficient statistics -------------------------

  /** One-scan Gram: per partition, accumulate the upper-triangle outer
    * products, per-dim sums and row count into primitive arrays; emit
    * one partial row per (i, j); a metadata-sized groupBy finishes.
    * Ragged rows contribute the dimensions they have (the oracle's
    * pos-copresence join semantics); [[EmbeddingStats]] is the screen
    * that surfaces raggedness. */
  /** The per-partition accumulator behind [[runGram]] — also the fold
    * the streaming twin runs per micro-batch
    * ([[graft.streaming.StreamMonitors.ingestGram]]), so batch and
    * stream quantize and sum identically by construction. */
  def gramPartials(it: Iterator[VecRow]): Iterator[(Int, Int, Long, Long, Long, Long)] = {
    var d = 0
    var acc = new Array[Long](0)   // upper triangle, row-major
    var dsum = new Array[Long](0)
    var n = 0L
    def grow(nd: Int): Unit = {
      val a2 = new Array[Long](nd * (nd + 1) / 2)
      val s2 = new Array[Long](nd)
      // re-index the old triangle into the wider one
      var i = 0; var idx = 0
      while (i < d) {
        var j = i
        while (j < d) { a2(i * nd - i * (i - 1) / 2 + (j - i)) = acc(idx); j += 1; idx += 1 }
        s2(i) = dsum(i); i += 1
      }
      acc = a2; dsum = s2; d = nd
    }
    it.foreach { row =>
      val e = row.embedding
      if (e != null) {
        if (e.length > d) grow(e.length)
        n += 1
        val q = new Array[Long](e.length)
        var i = 0
        while (i < e.length) { q(i) = roundHalfAway(e(i).toDouble * 1000); i += 1 }
        i = 0
        while (i < e.length) {
          dsum(i) += q(i)
          val base = i * d - i * (i - 1) / 2 - i
          var j = i
          while (j < e.length) { acc(base + j) += q(i) * q(j); j += 1 }
          i += 1
        }
      }
    }
    if (n == 0) Iterator.empty
    else {
      var idx = 0
      (0 until d).iterator.flatMap { i =>
        (i until d).map { j =>
          val r = (i, j, acc(idx), dsum(i), dsum(j), n)
          idx += 1
          r
        }
      }
    }
  }

  def runGram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .where(col("embedding").isNotNull)
      .as[VecRow]
    val partials = vecs.mapPartitions(gramPartials _)
      .toDF("i", "j", "sxy", "sx", "sy", "n")
    partials.groupBy("i", "j")
      .agg(sum("sxy").as("sxy"), sum("sx").as("sx"),
        sum("sy").as("sy"), sum("n").as("n"))
      .orderBy("i", "j")
  }

  /** Arithmetic oracle for [[runGram]]: positional explode, quantize,
    * pos-copresence self-join for the products, per-dim sums joined
    * back. Single-node all-pairs-of-dims is fine for the oracle — the
    * engine's one-scan accumulator must reproduce the identical
    * relation. */
  def gramSql(table: String)(d: Dialect): String =
    s"""WITH pe AS (
       |  SELECT vec_id, CAST(pos AS INT) AS dim,
       |         CAST(ROUND(val * 1000) AS BIGINT) AS q
       |    FROM (${d.arrayPosRel(table, "vec_id", "embedding")}) t
       |),
       |g AS (
       |  SELECT a.dim AS i, b.dim AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS sxy
       |    FROM pe a JOIN pe b ON b.vec_id = a.vec_id AND b.dim >= a.dim
       |   GROUP BY a.dim, b.dim
       |),
       |ds AS (SELECT dim, CAST(SUM(q) AS BIGINT) AS s FROM pe GROUP BY dim),
       |nn AS (SELECT COUNT(embedding) AS n FROM $table)
       |SELECT g.i, g.j, g.sxy, da.s AS sx, db.s AS sy, nn.n AS n
       |  FROM g JOIN ds da ON da.dim = g.i
       |         JOIN ds db ON db.dim = g.j
       |         CROSS JOIN nn
       | ORDER BY g.i, g.j""".stripMargin

  def gramDuckSql(): String = gramSql("embeddings")(DuckDialect)

  // ---- Johnson–Lindenstrauss sign projection ---------------------------

  /** The deterministic ±1 entry for (dim, k): +1 when the first hex
    * char of md5("jl:dim:k") is even. */
  def jlSign(dim: Int, k: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dg = md.digest(s"jl:$dim:$k".getBytes("UTF-8"))
    if (((dg(0) >> 4) & 0xf) % 2 == 0) 1 else -1
  }

  /** D→K sign projection in one shuffle-free scan: the sign matrix is
    * rebuilt once per partition (md5 of (dim, k) strings — no
    * broadcast needed, no randomness to ship), each row emits its K
    * projected components. Ragged rows project the dimensions they
    * have. */
  def runJlProjection(spark: SparkSession, dir: String, k: Int = 16): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .where(col("embedding").isNotNull)
      .as[VecRow]
    val kk = k
    vecs.mapPartitions { it =>
      var signs = Array.ofDim[Int](0, kk) // grown to the observed D
      def grow(nd: Int): Unit = {
        val s2 = Array.ofDim[Int](nd, kk)
        System.arraycopy(signs, 0, s2, 0, signs.length)
        var i = signs.length
        while (i < nd) {
          var c = 0
          while (c < kk) { s2(i)(c) = jlSign(i, c); c += 1 }
          i += 1
        }
        signs = s2
      }
      it.flatMap { row =>
        val e = row.embedding
        if (e == null) Iterator.empty
        else {
          if (e.length > signs.length) grow(e.length)
          val y = new Array[Long](kk)
          var i = 0
          while (i < e.length) {
            val q = roundHalfAway(e(i).toDouble * 100000)
            val si = signs(i)
            var c = 0
            while (c < kk) { y(c) += si(c) * q; c += 1 }
            i += 1
          }
          (0 until kk).iterator.map(c => (row.vec_id, c, y(c)))
        }
      }
    }.toDF("vec_id", "k", "yq").orderBy("vec_id", "k")
  }

  /** Arithmetic oracle for [[runJlProjection]]: the same ±1 matrix from
    * the same md5 strings, as a lateral k-series over the positional
    * explode. */
  def jlProjectionSql(table: String, k: Int = 16)(d: Dialect): String = {
    val pe =
      s"""SELECT vec_id, CAST(pos AS INT) AS dim,
         |         CAST(ROUND(val * 100000) AS BIGINT) AS q
         |    FROM (${d.arrayPosRel(table, "vec_id", "embedding")}) t""".stripMargin
    val sign =
      s"""CASE WHEN ${d.hexToInt(
        s"SUBSTRING(MD5('jl:' || ${d.castText("dim")} || ':' || ${d.castText("(pos - 1)")}), 1, 1)")} % 2 = 0
         |              THEN 1 ELSE -1 END""".stripMargin
    s"""WITH pe AS (
       |$pe
       |),
       |pk AS (
       |  SELECT vec_id, dim, q, CAST(pos - 1 AS INT) AS k,
       |         $sign AS sgn
       |    FROM (${d.seriesRel("pe", Seq("vec_id", "dim", "q"), k.toString)}) s
       |)
       |SELECT vec_id, k, CAST(SUM(sgn * q) AS BIGINT) AS yq
       |  FROM pk
       | GROUP BY vec_id, k
       | ORDER BY vec_id, k""".stripMargin
  }

  def jlProjectionDuckSql(): String = jlProjectionSql("embeddings")(DuckDialect)

  // ---- diagonal whitening from the landed statistics -------------------

  /** Per-dimension standardization (diagonal whitening) — the gram
    * relation CONSUMED distributed-side: the D diagonal cells land once
    * per session (metadata-sized collect), their means/stds broadcast
    * as literals into a second scan, and every component emits its
    * z-score. All stat inputs are the gram's exact integers, so both
    * engines derive bit-identical doubles before the single 4-dp
    * rounding; zero-variance dimensions emit NULL (z undefined), and
    * the z is of the QUANTIZED component — the 1e-3-grain semantics the
    * gram defines. At 100 TB: one stats collect of D rows + one scan,
    * no joins. */
  def runStandardized(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val stats = graft.core.SessionCache.getOrElseUpdate(spark, "gramdiag", dir) {
      runGram(spark, dir).where(col("i") === col("j")).collect()
        .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getLong(5)))
    }
    import spark.implicits._
    val statArr: Array[(Double, Double)] = {
      val maxD = stats.map(_._1).max + 1
      val a = Array.fill(maxD)((0.0, 0.0))
      stats.foreach { case (i, sxx, sx, n) =>
        val mean = sx.toDouble / n
        val v = (sxx - sx.toDouble * sx / n) / n
        a(i) = (mean, math.sqrt(v))
      }
      a
    }
    val bc = spark.sparkContext.broadcast(statArr)
    val vecs = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .where(col("embedding").isNotNull)
      .as[VecRow]
    vecs.flatMap { row =>
      val st = bc.value
      row.embedding.iterator.zipWithIndex.map { case (e, i) =>
        val q = roundHalfAway(e.toDouble * 1000)
        val (mean, sd) = if (i < st.length) st(i) else (0.0, 0.0)
        val z: Option[Double] =
          if (sd > 0) Some(roundHalfAway((q - mean) / sd * 10000) / 10000.0)
          else None
        (row.vec_id, i, z)
      }
    }.toDF("vec_id", "dim", "z").orderBy("vec_id", "dim")
  }

  /** Arithmetic oracle for [[runStandardized]]: the same quantized
    * stats derived inline, the same z formula, one 4-dp rounding. */
  def standardizedSql(table: String)(d: Dialect): String =
    s"""WITH pe AS (
       |  SELECT vec_id, CAST(pos AS INT) AS dim,
       |         CAST(ROUND(val * 1000) AS BIGINT) AS q
       |    FROM (${d.arrayPosRel(table, "vec_id", "embedding")}) t
       |),
       |st AS (
       |  SELECT dim, SUM(q) AS sx, SUM(q * q) AS sxx, COUNT(*) AS n
       |    FROM pe GROUP BY dim
       |),
       |sd AS (
       |  SELECT dim, CAST(sx AS DOUBLE) / n AS mean,
       |         SQRT((sxx - CAST(sx AS DOUBLE) * sx / n) / n) AS sdev
       |    FROM st
       |)
       |SELECT pe.vec_id, pe.dim,
       |       CASE WHEN sd.sdev > 0
       |            THEN ROUND((pe.q - sd.mean) / sd.sdev, 4)
       |            ELSE ${d.nullOf("double")} END AS z
       |  FROM pe JOIN sd ON sd.dim = pe.dim
       | ORDER BY pe.vec_id, pe.dim""".stripMargin

  def standardizedDuckSql(): String = standardizedSql("embeddings")(DuckDialect)

  // ---- driver-side eigensolve over the landed statistics ---------------

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues descending, eigenvectors as rows, aligned). Runs on
    * the driver over the metadata-sized (D×D) landed Gram — the MLlib
    * PCA treatment of the Gramian. */
  def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            // smaller root of t² + 2tθ − 1 = 0 (zeroes a(p)(q); θ=0 → 45°)
            val t = {
              val base = math.abs(theta) + math.sqrt(theta * theta + 1)
              if (theta >= 0) 1.0 / base else -1.0 / base
            }
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until n).map(j => v(j)(i)).toArray).toArray)
  }

  /** PCA over the landed Gram relation: build the covariance from the
    * integer sufficient statistics (cov = (sxy − sx·sy/n)/n at the
    * quantization scale), eigensolve on the driver, return the top-k
    * components as (comp, dim, loading, eigenvalue) — the
    * metadata-sized model a projection pass broadcasts. */
  def pcaComponents(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    import spark.implicits._
    val rows = runGram(spark, dir).collect() // D·(D+1)/2 rows — metadata-sized
    require(rows.nonEmpty, "empty embedding corpus")
    val dd = rows.map(_.getInt(1)).max + 1
    val n = rows.head.getLong(5).toDouble
    val cov = Array.ofDim[Double](dd, dd)
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val c = (r.getLong(2) - r.getLong(3).toDouble * r.getLong(4) / n) / n
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (evals, evecs) = jacobiEigen(cov)
    val top = math.min(k, dd)
    (0 until top).flatMap { c =>
      (0 until dd).map(d => (c, d, evecs(c)(d), evals(c)))
    }.toDF("comp", "dim", "loading", "eigenvalue")
  }
}
