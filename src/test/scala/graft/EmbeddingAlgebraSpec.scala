package graft

import graft.oracle.SparkDialect
import graft.pipeline.EmbeddingAlgebra

/** The distributed-linear-algebra surface: the one-scan Gram/JL
  * accumulators must be row-identical to the direct SQL renderings, and
  * the driver-side Jacobi eigensolve over the landed statistics must
  * satisfy the defining eigen properties. */
class EmbeddingAlgebraSpec extends SparkSpec {

  test("one-scan gram statistics match the direct pos-copresence SQL form") {
    graft.core.Tables.load(spark, sfDir, "embeddings")
      .createOrReplaceTempView("__ea_embeddings")
    val direct = spark.sql(EmbeddingAlgebra.gramSql("__ea_embeddings")(SparkDialect))
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val engine = EmbeddingAlgebra.runGram(spark, sfDir)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(engine.nonEmpty && engine.size == direct.size,
      s"size: engine=${engine.size} direct=${direct.size}")
    assert(engine == direct,
      s"first diff: ${(direct.toSet -- engine.toSet).take(2)}")
    // D dims → D(D+1)/2 upper-triangle rows
    val d = engine.keys.map(_._2).max + 1
    assert(engine.size == d * (d + 1) / 2)
  }

  test("one-scan jl projection matches the direct sign-matrix SQL form") {
    graft.core.Tables.load(spark, sfDir, "embeddings")
      .createOrReplaceTempView("__ea_embeddings")
    val direct = spark.sql(EmbeddingAlgebra.jlProjectionSql("__ea_embeddings")(SparkDialect))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val engine = EmbeddingAlgebra.runJlProjection(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    assert(engine.nonEmpty && engine == direct,
      s"sizes ${engine.size}/${direct.size}; first diff: ${
        (direct.toSet -- engine.toSet).take(2)}")
    // K projected components per vector
    assert(engine.keys.map(_._2).toSet == (0 until 16).toSet)
  }

  test("standardization matches the direct SQL form and has unit spread") {
    graft.core.Tables.load(spark, sfDir, "embeddings")
      .createOrReplaceTempView("__ea_embeddings")
    val direct = spark.sql(EmbeddingAlgebra.standardizedSql("__ea_embeddings")(SparkDialect))
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val engine = EmbeddingAlgebra.runStandardized(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(engine.nonEmpty && engine == direct,
      s"sizes ${engine.size}/${direct.size}; first diff: ${
        (direct.toSet -- engine.toSet).take(2)}")
    // standardized components have ~zero mean and ~unit variance per dim
    val z0 = engine.collect { case ((_, 0), Some(z)) => z }.toSeq
    val m = z0.sum / z0.size
    val v = z0.map(z => (z - m) * (z - m)).sum / z0.size
    assert(math.abs(m) < 0.01 && math.abs(v - 1.0) < 0.05, s"dim0 mean=$m var=$v")
  }

  test("jacobi eigensolve satisfies the defining properties on the fixture covariance") {
    val rows = EmbeddingAlgebra.runGram(spark, sfDir).collect()
    val d = rows.map(_.getInt(1)).max + 1
    val n = rows.head.getLong(5).toDouble
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val c = (r.getLong(2) - r.getLong(3).toDouble * r.getLong(4) / n) / n
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (evals, evecs) = EmbeddingAlgebra.jacobiEigen(cov)
    assert(evals.length == d && evecs.length == d)
    // similarity transforms preserve the trace: Σλ = tr(cov)
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(evals.sum - trace) < 1e-8 * math.max(1.0, math.abs(trace)),
      s"trace drift: ${evals.sum} vs $trace")
    // descending, PSD up to numerical noise
    evals.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-9) }
    assert(evals.last >= -1e-6 * math.max(1.0, math.abs(evals.head)))
    // V orthonormal: Vᵀ V = I
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(i => evecs(a)(i) * evecs(b)(i)).sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-8, s"VtV($a,$b)=$dot")
    }
    // A v = λ v for the top three pairs
    (0 until math.min(3, d)).foreach { c =>
      (0 until d).foreach { i =>
        val av = (0 until d).map(j => cov(i)(j) * evecs(c)(j)).sum
        assert(math.abs(av - evals(c) * evecs(c)(i)) < 1e-8 * math.max(1.0, math.abs(evals.head)),
          s"eigenpair $c row $i")
      }
    }
  }

  test("pca components expose the top-k eigenpairs of the landed gram") {
    val comps = EmbeddingAlgebra.pcaComponents(spark, sfDir, k = 4).collect()
    val byComp = comps.groupBy(_.getInt(0))
    assert(byComp.keySet == (0 until 4).toSet)
    val d = comps.map(_.getInt(1)).max + 1
    byComp.values.foreach(rows => assert(rows.length == d))
    val evals = (0 until 4).map(c => byComp(c).head.getDouble(3))
    evals.sliding(2).foreach { case Seq(a, b) => assert(a >= b - 1e-9) }
    // each component is unit-norm
    byComp.values.foreach { rows =>
      val norm = math.sqrt(rows.map(r => r.getDouble(2) * r.getDouble(2)).sum)
      assert(math.abs(norm - 1.0) < 1e-8)
    }
  }
}
