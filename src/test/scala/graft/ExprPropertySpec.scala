package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SimHashExpr, WinnowFpsExpr}

/** Property checks for the native Catalyst expressions' kernels against
  * independent straight-line reference implementations written from the
  * algorithm definitions (Schleimer/Wilkerson/Aiken winnowing;
  * Charikar-style simhash as specified in the SQL form) — randomized
  * inputs cover the window/boundary cases the fixture corpus cannot.
  * Samples draw from a FIXED seed so failures reproduce. */
class ExprPropertySpec extends AnyFunSuite {

  private val K = 8
  private val W = 4
  private val N = 400

  private def md5(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  /** First 15 hex chars of md5, base-16 — the shared gram hash. */
  private def gramHash(g: String): Long =
    hex(md5(g)).take(15)
      .foldLeft(0L)((acc, c) => (acc << 4) | Character.digit(c, 16).toLong)

  /** Naive winnowing: normalize, hash every k-gram, take the min of each
    * w-window (positions >= w, 1-based), distinct, sorted. */
  private def naiveWinnow(text: String): Seq[Long] = {
    val norm = text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ").trim()
    val n = norm.length - K + 1
    if (n < W) return Seq.empty
    val hs = (0 until n).map(i => gramHash(norm.substring(i, i + K)))
    (W - 1 until n).map(p => hs.slice(p - W + 1, p + 1).min)
      .distinct.sorted
  }

  /** Naive simhash: per distinct whitespace-token, md5 hex digit i
    * parity votes bit i; majority (>= 0) sets the bit. */
  private def naiveSimhash(text: String): Option[Long] = {
    val words = text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).distinct
    if (words.isEmpty) return None
    val sums = new Array[Int](32)
    for (w <- words; i <- 0 until 32) {
      val odd = "13579bdf".contains(hex(md5(w)).charAt(i))
      sums(i) += (if (odd) 1 else -1)
    }
    Some((0 until 32).map(i => if (sums(i) >= 0) 1L << i else 0L).sum)
  }

  private val asciiText: Gen[String] = for {
    n <- Gen.chooseNum(0, 120)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.alphaUpperChar,
      2 -> Gen.numChar, 3 -> Gen.const(' '),
      1 -> Gen.const('\t'), 1 -> Gen.oneOf('.', ',', ';', ':', '!', '?', '-')))
  } yield cs.mkString

  /** N samples from a fixed seed — deterministic across runs. */
  private val samples: Seq[String] =
    Gen.listOfN(N, asciiText)
      .pureApply(Gen.Parameters.default, Seed(0x5EED5EEDL))

  test("WinnowFpsExpr.compute matches naive winnowing on random text") {
    samples.foreach { t =>
      assert(WinnowFpsExpr.compute(t, K, W).toSeq == naiveWinnow(t), s"text=<$t>")
    }
  }

  test("winnowing is invariant under whitespace runs and case") {
    samples.foreach { t =>
      val mangled = t.replace(" ", "  \t ").toUpperCase(java.util.Locale.ROOT)
      assert(WinnowFpsExpr.compute(mangled, K, W).toSeq ==
        WinnowFpsExpr.compute(t, K, W).toSeq, s"text=<$t>")
    }
  }

  test("SimHashExpr.compute matches the naive majority-vote signature") {
    samples.foreach { t =>
      val expected = naiveSimhash(t)
      val got = Option(SimHashExpr.compute(t)).map(_.longValue)
      assert(got == expected, s"text=<$t>")
    }
  }

  test("simhash is a 32-bit value invariant to token order and repeats") {
    samples.foreach { t =>
      Option(SimHashExpr.compute(t)).foreach { v =>
        assert(v.longValue >= 0 && v.longValue < (1L << 32))
        val words = t.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty)
        val shuffled = (words.reverse ++ words).mkString(" ")
        assert(SimHashExpr.compute(shuffled) == v, s"text=<$t>")
      }
    }
  }

  test("closed-form NTILE split matches the window-function definition") {
    // quality_calibration / lm_perplexity / pack_curriculum restate
    // NTILE(k) over the decomposed exact rank as:
    //   rnk <= rem*(base+1) ? (rnk-1)/(base+1)+1
    //                       : rem + (rnk-1-rem*(base+1))/base + 1
    // with base = n/k, rem = n%k. Property: for every (n, k) the
    // formula yields k (or n, when n<k) groups whose sizes differ by at
    // most 1, larger groups first, covering ranks 1..n in order — the
    // SQL-standard NTILE definition.
    val gen = for {
      n <- Gen.choose(1, 5000)
      k <- Gen.oneOf(2, 3, 7, 10, 16)
    } yield (n, k)
    val cases = Gen.listOfN(300, gen)
      .apply(Gen.Parameters.default, Seed(20260815L)).get
    cases.foreach { case (n, k) =>
      val (base, rem) = (n / k, n % k)
      val buckets = (1 to n).map { rnk =>
        if (rnk <= rem * (base + 1)) (rnk - 1) / (base + 1) + 1
        else rem + (rnk - 1 - rem * (base + 1)) / base + 1
      }
      // monotone, starts at 1, ends at min(n, k)
      assert(buckets.head == 1 && buckets.last == math.min(n, k), s"n=$n k=$k")
      assert(buckets.zip(buckets.tail).forall { case (a, b) => b - a == 0 || b - a == 1 },
        s"n=$n k=$k skips a group")
      val sizes = buckets.groupBy(identity).toSeq.sortBy(_._1).map(_._2.length)
      assert(sizes.max - sizes.min <= 1, s"n=$n k=$k sizes $sizes")
      // larger groups come first (the first n mod k groups get the extra)
      assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b },
        s"n=$n k=$k larger groups must lead: $sizes")
    }
  }
}
