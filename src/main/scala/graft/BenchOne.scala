package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: `runMain graft.BenchOne q1 q2 …` times the named
  * SparkEntry queries (all of them if none given) on SPARK_GRAFT_SF_DIR. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", sys.env.getOrElse("GRAFT_MAXFIELDS", "100"))
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("GRAFT_WSCG", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.tunePerf(spark)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    var total = 0.0
    for (n <- names) {
      val t0 = System.nanoTime()
      val ct =
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case e: Throwable => println(s"$n FAILED: $e"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      total += dt
      println(f"BENCHONE $n%-28s $dt%8.2f s  rows=$ct")
    }
    println(f"BENCHONE TOTAL $total%.2f s")
    spark.stop()
  }
}
