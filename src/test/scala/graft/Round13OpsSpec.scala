package graft

import graft.oracle.SparkDialect
import graft.pipeline.ClassifierTrain

/** Round-13 operators: the trained naive-Bayes quality classifier
  * (train + eval) and the full-hash video-dedup candidate join. */
class Round13OpsSpec extends SparkSpec {

  private def docsView(): String = {
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__r13_docs")
    "__r13_docs"
  }

  test("classifier train: landed engine weights equal the one-statement form") {
    val direct = spark.sql(ClassifierTrain.trainSql(docsView())(SparkDialect))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val engine = ClassifierTrain.runTrain(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(engine.nonEmpty, "training produced no vocabulary")
    assert(engine.toSeq == direct.toSeq)
  }

  test("classifier train: the trainer discovers the supervision token's log-odds") {
    val w = ClassifierTrain.runTrain(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(w.contains("dup"), "the supervision token must be in-vocabulary")
    val others = w - "dup"
    assert(w("dup") > 0, "the marker token must carry positive log-odds")
    assert(others.values.forall(_ < w("dup")),
      "the marker token must dominate every other token's weight")
  }

  test("classifier eval: confusion matrix matches the one-statement form and partitions the corpus") {
    val direct = spark.sql(ClassifierTrain.evalSql(docsView())(SparkDialect))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val engine = ClassifierTrain.runEval(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(engine == direct)
    val total = graft.core.Tables.load(spark, sfDir, "documents")
      .where("text IS NOT NULL").count()
    assert(engine.toSeq.map(_._3).sum == total,
      "confusion cells must partition the labeled corpus")
    // the NB decision must separate the weak-supervision rule on the
    // training corpus itself (the marker token's log-odds dominates)
    val byCell = engine.map { case (y, p, n) => (y, p) -> n }.toMap
    val correct = byCell.getOrElse((0, 0), 0L) + byCell.getOrElse((1, 1), 0L)
    assert(correct * 10 >= total * 9, s"train-set accuracy below 0.9: $correct/$total")
    assert(byCell.getOrElse((1, 1), 0L) > 0,
      "no marker doc was caught — the all-negative degenerate decision")
  }

  test("classifier eval plans no corpus re-scan past the landed weights") {
    // weightsView is session-cached; eval reads it plus ONE docs scan
    val p = ClassifierTrain.runEval(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "eval plans a cartesian")
  }

  test("streaming classifier counts replay bit-identical to the batch census") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = graft.core.Tables.load(spark, sfDir, "documents")
      .selectExpr("text").where("text IS NOT NULL").as[String].collect()
    val (h1, h2) = rows.splitAt(rows.length / 3)
    val input = MemoryStream[String]
    val q = graft.streaming.StreamMonitors.ingestClassifierCounts(
      input.toDF().toDF("text"))
      .writeStream.format("memory").queryName("clf_stream")
      .outputMode("append").start()
    val emitted = try {
      input.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("clf_stream").as[(String, Long, Long)].collect()
    } finally q.stop()
    // the last emission per word = the running census after the whole
    // fixture streamed through; compare with the batch trainer
    val last = emitted.groupBy(_._1)
      .map { case (w, g) => w -> g.map(r => (r._2, r._3)).maxBy(t => t._1 + t._2) }
    val batch = ClassifierTrain.runTrain(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(last.keySet == batch.map(_._1).toSet)
    batch.foreach { case (w, p, n, _) =>
      assert(last(w) == ((p, n)), s"token '$w' census drifted: ${last(w)}")
    }
    // the consumer derives the identical micro-nat weights from the
    // emitted counts with the batch entry's exact arithmetic
    val tp = batch.map(_._2).sum; val tn = batch.map(_._3).sum
    val v = batch.length.toLong
    batch.foreach { case (w, p, n, micro) =>
      val d = math.log((p + 1.0) / (tp + v)) - math.log((n + 1.0) / (tn + v))
      assert(micro == math.round(d * 1e6),
        s"token '$w' weight not derivable from the stream state")
    }
  }
}
