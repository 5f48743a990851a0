package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import ThetaSketch._

/** KMV/theta sketches: exactness below k, estimation accuracy above k,
  * set-algebra estimators, and single-pass-equals-merged mergeability.
  */
class ThetaSpec extends SparkTestBase {

  private def sketchOf(ids: Seq[Long], k: Int): Array[Byte] = {
    import spark.implicits._
    ids.toDF("id").agg(kmv(col("id"), k).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
  }

  private def est(sk: Array[Byte]): Double = {
    import spark.implicits._
    Seq(1).toDF("x").select(kmvEstimate(lit(sk)).as("e"))
      .collect()(0).getAs[Double]("e")
  }

  private def setEst(f: org.apache.spark.sql.expressions.UserDefinedFunction,
      a: Array[Byte], b: Array[Byte]): Double = {
    import spark.implicits._
    Seq(1).toDF("x").select(f(lit(a), lit(b)).as("e"))
      .collect()(0).getAs[Double]("e")
  }

  test("below k the sketch is exact, including all set operations") {
    val a = sketchOf(0L until 300L, k = 1024)
    val b = sketchOf(200L until 600L, k = 1024)
    assert(est(a) == 300.0 && est(b) == 400.0)
    assert(setEst(kmvIntersectEstimate, a, b) == 100.0)
    assert(setEst(kmvUnionEstimate, a, b) == 600.0)
    assert(setEst(kmvDifferenceEstimate, a, b) == 200.0)
    // duplicates collapse: distinct semantics
    val dup = sketchOf(Seq.fill(50)(77L) ++ (0L until 10L), k = 64)
    assert(est(dup) == 11.0)
  }

  test("above k: distinct and set estimates land within theta bounds") {
    val k = 512
    val a = sketchOf(0L until 30000L, k)
    val b = sketchOf(20000L until 50000L, k)
    assert(math.abs(est(a) - 30000) <= 30000 * 0.15, s"est(a)=${est(a)}")
    val u = setEst(kmvUnionEstimate, a, b)
    val i = setEst(kmvIntersectEstimate, a, b)
    val d = setEst(kmvDifferenceEstimate, a, b)
    assert(math.abs(u - 50000) <= 50000 * 0.15, s"union=$u")
    // intersection/difference error scales with the union
    assert(math.abs(i - 10000) <= 50000 * 0.10, s"inter=$i")
    assert(math.abs(d - 20000) <= 50000 * 0.10, s"diff=$d")
    // inclusion-exclusion coherence of the clipped estimators
    assert(math.abs((i + d) - est(a)) <= 50000 * 0.10)
  }

  test("mergeability: per-slice union is bit-identical to the single pass") {
    import spark.implicits._
    val df = (0L until 20000L).map(i => (i % 4, i)).toDF("slice", "id")
    val single = df.agg(kmv(col("id"), 256).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    val merged = df.groupBy("slice").agg(kmv(col("id"), 256).as("sk"))
      .agg(kmvUnion(col("sk")).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(single, merged),
      "slice-union sketch must equal the single-pass sketch byte-for-byte")
    // pairwise merge UDF agrees with the union aggregate
    val slices = df.groupBy("slice").agg(kmv(col("id"), 256).as("sk"))
      .orderBy("slice").collect().map(_.getAs[Array[Byte]]("sk"))
    val pairwise = slices.reduce { (x, y) =>
      Seq(1).toDF("t").select(kmvMerge(lit(x), lit(y)).as("m"))
        .collect()(0).getAs[Array[Byte]]("m")
    }
    assert(java.util.Arrays.equals(single, pairwise))
  }

  test("empty inputs produce empty sketches with zero estimates") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("id").agg(kmv(col("id"), 64).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    assert(est(empty) == 0.0)
    val a = sketchOf(0L until 10L, 64)
    assert(setEst(kmvIntersectEstimate, a, empty) == 0.0)
    assert(setEst(kmvUnionEstimate, a, empty) == 10.0)
  }
}
