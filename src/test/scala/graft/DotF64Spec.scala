package graft

import graft.functions.DotF64
import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd dot expression: bit-identity with the
  * higher-order-function form it replaced, SQL registration, and
  * null/length edge cases.
  */
class DotF64Spec extends AnyFunSuite {

  test("bit-identical to aggregate(zip_with(...)) on the embeddings pairs") {
    val spark = TestSpark.spark
    val a = graft.corpus.Corpus.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id").as("i"), col("embedding").as("ea"))
    val b = graft.corpus.Corpus.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id").as("j"), col("embedding").as("eb"))
    val hof = aggregate(
      zip_with(col("ea").cast("array<double>"), col("eb").cast("array<double>"),
        (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val diff = a.crossJoin(b)
      .filter(pmod(col("i") * 31 + col("j"), lit(53)) === 0)
      .select(VectorOps.dotCol(col("ea"), col("eb")).as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0, "DotF64 must be BIT-identical to the HOF form")
  }

  test("registered SQL function graft_dot works and handles nulls") {
    val spark = TestSpark.spark
    DotF64.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d").head()
    assert(r.getDouble(0) == 32.0)
    assert(spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))")
      .head().isNullAt(0))
    // unequal lengths: dot over the common prefix
    assert(spark.sql("SELECT graft_dot(array(2.0d, 9.0d), array(3.0d))")
      .head().getDouble(0) == 6.0)
  }
}
