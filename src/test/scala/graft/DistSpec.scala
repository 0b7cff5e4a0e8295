package graft

import graft.analysis.SeqDist
import graft.functions.RandomProj
import graft.operators.DistanceOps.SqPack
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level suites for the pieces without a DuckDB oracle: LCS /
  * common-prefix DP, SQ bit-packing round-trip, projection matrix
  * determinism.
  */
class DistSpec extends AnyFunSuite {

  test("LCS distance: golden values + metric sanity") {
    // |a|+|b|-2·LCS (reference /root/reference/src/dist/seqs.jl:127-132)
    assert(SeqDist.lcsDistance("", "") == 0)
    assert(SeqDist.lcsDistance("abc", "abc") == 0)
    assert(SeqDist.lcsDistance("abc", "") == 3)
    assert(SeqDist.lcsDistance("abcde", "ace") == 2) // LCS=ace
    assert(SeqDist.lcsDistance("xabx", "yaby") == 4) // LCS=ab
    assert(SeqDist.lcsDistance("ab", "ba") == 2) // LCS=1
    // symmetry + triangle spot-checks
    val ws = Seq("spark", "shark", "sprocket", "", "park")
    for (a <- ws; b <- ws) {
      assert(SeqDist.lcsDistance(a, b) == SeqDist.lcsDistance(b, a))
      assert(SeqDist.lcsDistance(a, b) >= math.abs(a.length - b.length))
      for (c <- ws)
        assert(SeqDist.lcsDistance(a, c) <=
          SeqDist.lcsDistance(a, b) + SeqDist.lcsDistance(b, c))
    }
  }

  test("common prefix golden values") {
    assert(SeqDist.commonPrefix("", "x") == 0)
    assert(SeqDist.commonPrefix("abc", "abd") == 2)
    assert(SeqDist.commonPrefix("abc", "abc") == 3)
    assert(SeqDist.commonPrefix("abcd", "ab") == 2)
  }

  test("SQ bit-packing round-trips u8/u4/u2 codes, 2 and 4 codes per byte") {
    val rnd = new scala.util.Random(7)
    for (bits <- Seq(2, 4, 8); n <- Seq(0, 1, 63, 64, 65)) {
      val codes = Array.fill(n)(rnd.nextInt(1 << bits))
      val packed = SqPack.pack(codes, bits)
      assert(packed.length == (n * bits + 7) / 8)
      assert(SqPack.unpack(packed, n, bits).sameElements(codes))
    }
  }

  test("EMD greedy matching: reference semantics incl. running-min accumulation") {
    import graft.operators.DistanceOps.emdGreedy
    def pt(xs: Double*): Array[Double] = xs.toArray
    // identity clouds: every row matches itself at 0 immediately
    val u = Array(pt(0, 0), pt(3, 4))
    assert(emdGreedy(u, u) == 0.0)
    // singletons: plain L2
    assert(emdGreedy(Array(pt(0, 0)), Array(pt(3, 4))) == 5.0)
    // the reference's quirk (cloud.jl:107): scanning x against [far,
    // near] adds BOTH running minima (5 then 1); y then takes the
    // leftover far column (d = 4) ⇒ total 5 + 1 + 4 = 10 at p = 1
    val u2 = Array(pt(0, 0), pt(7, 0))
    val v2 = Array(pt(3, 4), pt(1, 0)) // d(x,·) = 5, 1; d(y, far) = 4√...
    val got = emdGreedy(u2, v2)
    val dyFar = math.sqrt((7.0 - 3.0) * (7.0 - 3.0) + 16.0)
    assert(math.abs(got - (5.0 + 1.0 + dyFar)) < 1e-12, s"got $got")
    // p = 2: distances squared inside, sqrt of the sum outside
    val g2 = emdGreedy(Array(pt(0, 0)), Array(pt(3, 4)), p = 2.0)
    assert(math.abs(g2 - 5.0) < 1e-12)
    // |V| > |U|: only the first |U| columns are consumable
    assert(emdGreedy(Array(pt(1, 0)), Array(pt(1, 0), pt(9, 9))) == 0.0)
  }

  test("random projection matrix: deterministic, right shape, near-unit row scale") {
    val m1 = RandomProj.matrix(16, 64)
    val m2 = RandomProj.matrix(16, 64)
    assert(m1.length == 16 && m1.forall(_.length == 64))
    for (j <- 0 until 16; i <- 0 until 64)
      assert(m1(j)(i) == m2(j)(i), "matrix must be bit-deterministic")
    // rows are N(0, 1/outDim): squared norm of a row ≈ inDim/outDim = 4
    val norms = m1.map(r => r.map(x => x * x).sum)
    assert(norms.forall(n2 => n2 > 1.0 && n2 < 10.0), norms.mkString(","))
    // distinct rows
    assert(m1.map(_.toSeq).distinct.length == 16)
  }

  test("jvmDist ≡ Spark distCol bit-for-bit on random vectors (fused-kernel contract)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 50).map(_ => Array.fill(64)(rnd.nextGaussian() / 8.0))
    val pairs = for (a <- vecs; b <- vecs.take(10)) yield (a.toSeq, b.toSeq)
    val viaSpark = pairs.toDF("a", "b")
      .select(graft.operators.VectorOps.distCol(
        org.apache.spark.sql.functions.col("a").cast("array<double>"),
        org.apache.spark.sql.functions.col("b").cast("array<double>")).as("d"))
      .collect().map(_.getDouble(0))
    val viaJvm = pairs.map { case (a, b) =>
      graft.operators.VectorOps.jvmDist(a.toArray, b.toArray)
    }
    viaSpark.zip(viaJvm).foreach { case (s, j) =>
      assert(java.lang.Double.doubleToRawLongBits(s) ==
        java.lang.Double.doubleToRawLongBits(j), s"$s vs $j")
    }
  }

  test("QR projection matrix: deterministic and row-orthonormal") {
    val q1 = RandomProj.matrixQR(16, 64)
    val q2 = RandomProj.matrixQR(16, 64)
    assert(q1.length == 16 && q1.forall(_.length == 64))
    for (j <- 0 until 16; i <- 0 until 64)
      assert(q1(j)(i) == q2(j)(i), "matrix must be bit-deterministic")
    for (a <- 0 until 16; b <- a until 16) {
      val d = (0 until 64).map(i => q1(a)(i) * q1(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-10, s"rows ${a}x${b} dot = $d, want $want")
    }
    // QR and Gaussian constructors must not alias each other's entries
    val g = RandomProj.matrix(16, 64)
    assert(q1.map(_.toSeq).toSeq != g.map(_.toSeq).toSeq)
  }

  test("sqMinCKnn: constant vector (c = 0) dequantizes to itself, no NaN distances") {
    val spark = TestSpark.spark
    import spark.implicits._
    // per-vector (min, c) with max == min gives step c = 0 — the
    // (x − lo)/c form would emit NaN and poison every pair distance
    val dir = java.nio.file.Files.createTempDirectory("graft-sqminc-").toString
    Seq(
      (0L, Array(0.5f, 0.5f, 0.5f)),            // constant → c = 0
      (1L, Array(0.1f, 0.5f, 0.9f)),
      (2L, Array(0.9f, 0.5f, 0.1f))
    ).toDF("vec_id", "embedding").write.parquet(s"$dir/embeddings.parquet")
    try {
      val r = graft.operators.DistanceOps.sqMinCKnn(spark, dir, k = 3).collect()
      assert(r.length == 9, "3 vectors x k=3 rows")
      assert(r.forall(row => !row.getDouble(3).isNaN), "no NaN distances")
      // the constant vector dequantizes to itself exactly, so its
      // self-distance is the unquantized 1 − 3·(0.5·0.5) = 0.25
      assert(r.exists(row => row.getLong(0) == 0L && row.getLong(2) == 0L &&
        row.getDouble(3) == 0.25))
    } finally graft.operators.StreamingOps.deleteRec(dir)
  }
}
