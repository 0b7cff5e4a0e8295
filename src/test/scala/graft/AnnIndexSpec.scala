package graft

import graft.index.AnnIndex
import graft.operators.AnnOps
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Persisted ANN index gates. The headline invariant is PARITY: the
  * stored-index search paths must return row-identical results to the
  * inline one-plan operators ([[graft.operators.AnnOps.annLsh]]/
  * [[graft.operators.AnnOps.annIvf]]) — same planes/centers, same cap,
  * same rescoring — so q21's recall gate transfers unchanged. The
  * batch path must additionally PRUNE: its codes scan carries the
  * probe-set filters down to the parquet partitions/row groups.
  */
class AnnIndexSpec extends AnyFunSuite {
  private val dir = TestSpark.Sf0001
  private val k = 5

  private def rows(df: DataFrame): Set[(Long, Int, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-annidx-spec-").toString

  test("persisted LSH: searchLshAll row-identical to inline annLsh") {
    val spark = TestSpark.spark
    val idx = tmp()
    try {
      val m = AnnIndex.buildLsh(spark, dir, idx)
      val persisted = AnnIndex.searchLshAll(spark, idx, dir, k)
      val inline = AnnOps.annLsh(spark, dir, k, nbits = m.nbits, tables = m.tables)
      assert(rows(persisted) == rows(inline),
        "persisted-index LSH search diverged from the inline operator")
    } finally graft.operators.StreamingOps.deleteRec(idx)
  }

  test("persisted LSH batch: equals the bulk rows for those ids; scan is pruned") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val idx = tmp()
    try {
      AnnIndex.buildLsh(spark, dir, idx)
      val ids = Seq(3L, 17L, 101L)
      val batch = AnnIndex.searchLshBatch(spark, idx, dir, ids, k)
      val bulk = AnnIndex.searchLshAll(spark, idx, dir, k)
        .filter(col("vec_id").isin(ids: _*))
      assert(rows(batch) == rows(bulk),
        "batch path diverged from the bulk rows for the same query ids")
      // the probe filters must reach the codes scan: partition pruning
      // on shard, predicate pushdown on bucket
      val plan = batch.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("shard"),
        "codes scan lost the shard partition filter")
      assert(plan.contains("PushedFilters") && plan.contains("bucket"),
        "codes scan lost the bucket pushdown filter")
    } finally graft.operators.StreamingOps.deleteRec(idx)
  }

  test("persisted IVF: searchIvfAll row-identical to inline annIvf") {
    val spark = TestSpark.spark
    val idx = tmp()
    try {
      AnnIndex.buildIvf(spark, dir, idx, nlist = 16)
      val persisted = AnnIndex.searchIvfAll(spark, idx, dir, k, nprobe = 8)
      val inline = AnnOps.annIvf(spark, dir, k, nlist = 16, nprobe = 8)
      assert(rows(persisted) == rows(inline),
        "persisted-index IVF search diverged from the inline operator")
    } finally graft.operators.StreamingOps.deleteRec(idx)
  }

  test("IVF batch (vector-carrying codes): equals the bulk rows; zero corpus reads") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val idx = tmp()
    try {
      AnnIndex.buildIvf(spark, dir, idx, nlist = 16)
      val ids = Seq(7L, 42L, 301L)
      val batch = AnnIndex.searchIvfBatch(spark, idx, dir, ids, k, nprobe = 8)
      val bulk = AnnIndex.searchIvfAll(spark, idx, dir, k, nprobe = 8)
        .filter(col("vec_id").isin(ids: _*))
      assert(rows(batch) == rows(bulk),
        "IVF batch path diverged from the bulk rows for the same query ids")
      // the rescore reads candidate vectors off the pruned codes scan —
      // the executed batch plan must not contain a corpus-table scan
      // (only the two driver-side collects touch it, outside this plan)
      val plan = batch.queryExecution.executedPlan.toString
      assert(!plan.contains("embeddings.parquet"),
        "vector-carrying batch plan still scans the corpus table")
      assert(plan.contains("PartitionFilters") && plan.contains("shard"),
        "codes scan lost the shard partition filter")
    } finally graft.operators.StreamingOps.deleteRec(idx)
  }

  test("LSH storeVecs: batch rows identical to the payload-free index's") {
    val spark = TestSpark.spark
    val idxPlain = tmp()
    val idxVecs = tmp()
    try {
      AnnIndex.buildLsh(spark, dir, idxPlain)
      AnnIndex.buildLsh(spark, dir, idxVecs, storeVecs = true)
      val ids = Seq(3L, 17L, 101L)
      val a = AnnIndex.searchLshBatch(spark, idxPlain, dir, ids, k)
      val b = AnnIndex.searchLshBatch(spark, idxVecs, dir, ids, k)
      assert(rows(a) == rows(b),
        "stored-vector LSH batch diverged from the gather-join batch")
      val plan = b.queryExecution.executedPlan.toString
      assert(!plan.contains("embeddings.parquet"),
        "vector-carrying LSH batch plan still scans the corpus table")
    } finally graft.operators.StreamingOps.deleteRec(idxPlain, idxVecs)
  }

  test("codes files are bucket-sorted (row-group pruning precondition)") {
    // V1Writes requires an ordering by the partition column and silently
    // REPLACES a sortWithinPartitions that doesn't lead with it — which
    // voids the tight per-row-group bucket min/max the batch pruning
    // depends on. This reads each written file back in file order and
    // asserts the (bucket, vec_id) sort actually survived the write.
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val idx = tmp()
    try {
      AnnIndex.buildLsh(spark, dir, idx)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val files = fs.listFiles(new org.apache.hadoop.fs.Path(s"$idx/codes"), true)
      var checked = 0
      while (files.hasNext) {
        val f = files.next().getPath.toString
        if (f.endsWith(".parquet")) {
          val rows = spark.read.parquet(f)
            .select(col("bucket"), col("vec_id")).as[(Long, Long)].collect()
          assert(rows.sameElements(rows.sortBy(identity)),
            s"codes file not (bucket, vec_id)-sorted: $f")
          checked += 1
        }
      }
      assert(checked > 0, "no codes files found to check")
    } finally graft.operators.StreamingOps.deleteRec(idx)
  }

  test("quantized IVF at exhaustive probe ≡ inline SQMinC kNN (the q45 gate)") {
    // nprobe = nlist probes every cell, so the index search is the full
    // kNN over the u8 quantization grid — bit-identical to q39's inline
    // operator, which pins the whole stored-code path: quantize → pack
    // → write → read → unpack → dequantize → distance → rank
    val spark = TestSpark.spark
    val idx = tmp()
    try {
      val m = AnnIndex.buildIvf(spark, dir, idx, nlist = 16, quantLevels = 255)
      val persisted = AnnIndex.searchIvfAll(spark, idx, dir, k, nprobe = m.nlist)
      val inline = graft.operators.DistanceOps.sqMinCKnn(spark, dir, 255, k)
      assert(rows(persisted) == rows(inline),
        "quantized persisted IVF at exhaustive probe diverged from inline SQMinC kNN")
    } finally graft.operators.StreamingOps.deleteRec(idx)
  }

  test("quantized IVF batch: equals the bulk rows for those ids; corpus-free plan") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val idx = tmp()
    try {
      AnnIndex.buildIvf(spark, dir, idx, nlist = 16, quantLevels = 255)
      val ids = Seq(3L, 17L, 101L)
      val batch = AnnIndex.searchIvfBatch(spark, idx, dir, ids, k, nprobe = 4)
      val bulk = AnnIndex.searchIvfAll(spark, idx, dir, k, nprobe = 4)
        .filter(col("vec_id").isin(ids: _*))
      assert(rows(batch) == rows(bulk),
        "quantized batch path diverged from the bulk rows for the same ids")
      // the rescore payload comes off the index scan — the batch plan
      // touches the corpus table zero times (queries were collected
      // driver-side in a separate job)
      val plan = batch.queryExecution.executedPlan.toString
      assert(!plan.contains("embeddings.parquet"),
        "quantized batch plan should not re-scan the corpus for candidates")
    } finally graft.operators.StreamingOps.deleteRec(idx)
  }

  test("quantized codes are materially smaller than f64 vector-carrying codes") {
    val spark = TestSpark.spark
    val idxQ = tmp()
    val idxF = tmp()
    try {
      AnnIndex.buildIvf(spark, dir, idxQ, nlist = 16, quantLevels = 255)
      AnnIndex.buildIvf(spark, dir, idxF, nlist = 16)
      def bytes(root: String): Long = {
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(new org.apache.hadoop.fs.Path(s"$root/codes")).getLength
      }
      val (q, f) = (bytes(idxQ), bytes(idxF))
      // 64 f64 components (512 B) become 64 u8 codes + 2 params (~80 B);
      // parquet encoding narrows the raw 6× — demand at least 2×
      assert(q * 2 <= f,
        s"quantized codes ($q B) should be <= half the f64 codes ($f B)")
    } finally graft.operators.StreamingOps.deleteRec(idxQ, idxF)
  }

  test("optimize_index! on the quantization dial: cheapest rung meeting MinRecall") {
    val spark = TestSpark.spark
    val ladder = AnnIndex.evalQuantLadder(spark, dir, k, nlist = 16)
    assert(ladder.map(_.levels) == Seq(3, 15, 255, 0), "ladder order (cheapest first)")
    // the f64 rung at exhaustive probe IS the exact kNN — recall 1.0,
    // so MinRecall always has a passing config
    assert(math.abs(ladder.last.recall - 1.0) < 1e-12,
      s"f64 exhaustive rung should be exact, got ${ladder.last.recall}")
    // storage cost is the bits fraction: 2/64, 4/64, 8/64, 64/64
    assert(ladder.map(_.cost) == Seq(2.0 / 64, 4.0 / 64, 8.0 / 64, 1.0))
    val chosen = AnnOps.chooseQuant(ladder, AnnOps.MinRecallGoal(0.9))
    info(f"quant ladder recalls=${ladder.map(c => f"${c.levels}:${c.recall}%.3f").mkString(", ")} -> levels=${chosen.levels}")
    assert(chosen.recall >= 0.9)
    // minimality: every strictly cheaper rung fails the goal
    ladder.filter(_.cost < chosen.cost).foreach(c =>
      assert(c.recall < 0.9, s"cheaper rung $c passes the goal — pick not minimal"))
  }

  test("external-vector search ≡ id-based batch on every index flavor") {
    // the searchbatch(index, Q) surface: hand the SAME vectors in as
    // explicit (id, vector) pairs and the rows must match the id-based
    // batch exactly — for the quantized index this also pins the JVM
    // dequantizer against the Catalyst expression it mirrors
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = Seq(3L, 17L, 101L)
    val qs = graft.corpus.Corpus.embeddings(spark, dir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toSeq
    val idxF = tmp(); val idxQ = tmp(); val idxL = tmp()
    try {
      AnnIndex.buildIvf(spark, dir, idxF, nlist = 16)
      assert(rows(AnnIndex.searchIvfVecs(spark, idxF, dir, qs, k, nprobe = 4)) ==
        rows(AnnIndex.searchIvfBatch(spark, idxF, dir, ids, k, nprobe = 4)),
        "f64 IVF: external-vector rows diverged from the id-based batch")
      AnnIndex.buildIvf(spark, dir, idxQ, nlist = 16, quantLevels = 255)
      assert(rows(AnnIndex.searchIvfVecs(spark, idxQ, dir, qs, k, nprobe = 4)) ==
        rows(AnnIndex.searchIvfBatch(spark, idxQ, dir, ids, k, nprobe = 4)),
        "quantized IVF: external-vector rows diverged (JVM vs Catalyst dequant?)")
      AnnIndex.buildLsh(spark, dir, idxL, storeVecs = true)
      assert(rows(AnnIndex.searchLshVecs(spark, idxL, dir, qs, k)) ==
        rows(AnnIndex.searchLshBatch(spark, idxL, dir, ids, k)),
        "LSH storeVecs: external-vector rows diverged from the id-based batch")
    } finally graft.operators.StreamingOps.deleteRec(idxF, idxQ, idxL)
  }

  test("external batch rejects wrong-width vectors and duplicate ids") {
    // both corruptions would otherwise be SILENT: a wrong-width vector
    // feeds a mismatched dot product, and duplicate ids collapse in the
    // probe's id→vector map (one id's buckets rescored against the
    // other id's vector)
    val spark = TestSpark.spark
    val idx = tmp()
    try {
      val m = AnnIndex.buildIvf(spark, dir, idx, nlist = 16)
      val good = Array.fill(m.dim)(0.1)
      val narrow = Array.fill(m.dim - 1)(0.1)
      val e1 = intercept[IllegalArgumentException](
        AnnIndex.searchIvfVecs(spark, idx, dir, Seq((-1L, narrow)), k))
      assert(e1.getMessage.contains("dim"))
      val e2 = intercept[IllegalArgumentException](
        AnnIndex.searchIvfVecs(spark, idx, dir, Seq((-1L, good), (-1L, good)), k))
      assert(e2.getMessage.contains("duplicate"))
    } finally graft.operators.StreamingOps.deleteRec(idx)
  }

  test("external-vector search on a payload-free LSH index fails loudly") {
    val spark = TestSpark.spark
    val idx = tmp()
    try {
      AnnIndex.buildLsh(spark, dir, idx) // storeVecs = false
      val e = intercept[IllegalArgumentException](
        AnnIndex.searchLshVecs(spark, idx, dir, Seq((999999L, Array.fill(8)(0.1))), k))
      assert(e.getMessage.contains("storeVecs"))
    } finally graft.operators.StreamingOps.deleteRec(idx)
  }

  test("searching an index with the wrong kind fails loudly, not empty") {
    val spark = TestSpark.spark
    val idx = tmp()
    try {
      AnnIndex.buildIvf(spark, dir, idx, nlist = 16)
      val e = intercept[IllegalArgumentException](
        AnnIndex.searchLshBatch(spark, idx, dir, Seq(3L), k))
      assert(e.getMessage.contains("lsh"))
      val e2 = intercept[IllegalArgumentException](
        AnnIndex.searchLshAll(spark, idx, dir, k))
      assert(e2.getMessage.contains("lsh"))
    } finally graft.operators.StreamingOps.deleteRec(idx)
  }

  test("multiprobe: extraProbes=0 ≡ base path; per-rank dists never worsen; recall ladder monotone; tuner minimal") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val idx = tmp()
    try {
      val m = AnnIndex.buildLsh(spark, dir, idx)
      val ids = AnnIndex.MultiprobeQueryIds
      // m=0 is the pre-multiprobe path bit-for-bit (base buckets only)
      val base = AnnIndex.searchLshBatch(spark, idx, dir, ids, k)
      assert(rows(AnnIndex.searchLshBatch(spark, idx, dir, ids, k, extraProbes = 0))
        == rows(base))
      // probe sets grow with m, so the rank-r distance can only improve
      // (same tie rule both sides; a worse dist at any rank means a
      // candidate was LOST, which multiprobe cannot do)
      val mp = AnnIndex.searchLshBatch(spark, idx, dir, ids, k, extraProbes = 2)
      val worse = base.select(col("vec_id"), col("rnk"), col("dist").as("d0"))
        .join(mp.select(col("vec_id"), col("rnk"), col("dist").as("d2")),
          Seq("vec_id", "rnk"))
        .filter(col("d2") > col("d0")).count()
      assert(worse == 0, s"$worse (vec_id, rnk) rows got WORSE under multiprobe")
      // recall vs exact gold is non-decreasing along the whole ladder
      val ladder = AnnIndex.evalLshProbeLadder(spark, idx, dir, ids, k)
      info(ladder.map(c => f"m=${c.nprobe} recall=${c.recall}%.3f").mkString(", "))
      assert(ladder.map(_.recall).sliding(2)
        .forall(p => p.head <= p.last + 1e-12), s"recall ladder not monotone: $ladder")
      // MinRecall tuner picks the SMALLEST m meeting the target
      val target = 0.9
      val (mBest, rBest) = AnnIndex.tunedLshProbes(spark, idx, dir, ids, k, target)
      assert(rBest >= target)
      assert(!ladder.exists(c => c.nprobe < mBest && c.recall >= target),
        s"a cheaper rung than m=$mBest already meets $target")
      // out-of-range dials fail loudly
      intercept[IllegalArgumentException](
        AnnIndex.searchLshBatch(spark, idx, dir, ids, k, extraProbes = m.nbits + 1))
    } finally graft.operators.StreamingOps.deleteRec(idx)
  }

  test("empty corpus: build commits a readable index; searches return empty") {
    val spark = TestSpark.spark
    import spark.implicits._
    val corpus = tmp()
    val idx = tmp()
    try {
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
        .write.parquet(s"$corpus/embeddings.parquet")
      val m = AnnIndex.buildLsh(spark, corpus, idx)
      assert(m.dim == 0 && m.n == 0)
      assert(AnnIndex.searchLshAll(spark, idx, corpus, k).count() == 0)
      assert(AnnIndex.searchLshBatch(spark, idx, corpus, Seq(1L), k).count() == 0)
    } finally graft.operators.StreamingOps.deleteRec(corpus, idx)
  }
}
