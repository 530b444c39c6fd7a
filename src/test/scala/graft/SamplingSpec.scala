package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.profiling.SampledProfiler

/** Boundary behavior of the sampling parameter mirror (reference:
  * testgen/commands/queries/profiling_query.py:22-53). */
class SamplingSpec extends AnyFunSuite {
  import SampledProfiler.samplingParams

  test("no sampling at or under min_sample rows") {
    assert(samplingParams(1000, 30.0, 1000).isEmpty)
    assert(samplingParams(999, 30.0, 1000).isEmpty)
    assert(samplingParams(1001, 30.0, 1000).isDefined)
  }

  test("invalid percent disables sampling") {
    assert(samplingParams(1000000, 0.0).isEmpty)
    assert(samplingParams(1000000, 100.0).isEmpty)
    assert(samplingParams(1000000, -5.0).isEmpty)
    assert(samplingParams(1000000, 99.999).isDefined)
  }

  test("sample count clamps to the min floor") {
    // 30% of 1,500 = 450 < min 1000 -> clamp up
    val s = samplingParams(1500, 30.0, 1000).get
    assert(s.sampleCount == 1000)
    assert(s.sampleRatio == 1.5)
  }

  test("sample count clamps to the reference 999,000 max") {
    // 30% of 100M = 30M -> clamp at 999,000 (profiling_query.py max_sample)
    val s = samplingParams(100000000L, 30.0, 1000).get
    assert(s.sampleCount == 999000L)
    assert(s.sampleRatio == 100000000.0 / 999000.0)
  }

  test("unclamped case: round(pct% of N), ratio = N / count") {
    val s = samplingParams(60000, 30.0, 1000).get
    assert(s.sampleCount == 18000)
    assert(s.sampleRatio == 60000.0 / 18000.0)
  }
}

/** Landed-run tripwire for the sampled profile (round-7 perf drift):
  * the multi-job fan-out must run once per (session, dir); a repeat
  * read is a scan of the landed rows — at most the single collect job,
  * never the chunked aggregate jobs re-planned under bench pressure. */
class SampledProfileLandingSpec extends SparkSpec {
  test("sampled profile lands once; repeat reads schedule no profiling jobs") {
    val sc = spark.sparkContext
    SampledProfiler.run(spark, sfDir).count() // build + land
    sc.setJobGroup("sampled-repeat", "landed-read tripwire")
    try SampledProfiler.run(spark, sfDir).count()
    finally sc.clearJobGroup()
    val jobs = sc.statusTracker.getJobIdsForGroup("sampled-repeat")
    // the landed read is the ORDER BY + collect over 11 checkpointed
    // rows — at most 2 tiny jobs under AQE; the fan-out it replaces
    // schedules a dozen aggregate jobs over the sample
    assert(jobs.length <= 2,
      s"repeat sampled-profile read scheduled ${jobs.length} jobs — the run was re-profiled instead of read from the landed relation")
  }
}
