package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Soundness fuzz for planning-time file skipping: across randomized
  * table layouts and a predicate grammar, `readWhere` must NEVER lose a
  * row vs the unpruned filter — pruning may only remove provably-empty
  * files. This is the invariant everything in
  * [[FileStats]]/[[BloomStats]] exists to preserve; a single dropped
  * row here is a correctness bug, not a performance one.
  */
class StatsPropertySpec extends SparkTestBase {

  private def forAll[A](gen: Gen[A], n: Int = 40)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = Seed(0xD1CEBEEFL + i)
      gen.apply(Gen.Parameters.default, seed).foreach(body)
    }

  /** A randomized table: `nBatches` appends of rows over a value domain
    * with overlaps, gaps, duplicates, negatives and nulls.
    */
  private val tableGen: Gen[Seq[Seq[(Option[Long], String)]]] = for {
    nBatches <- Gen.chooseNum(1, 4)
    batches <- Gen.listOfN(nBatches, for {
      lo <- Gen.chooseNum(-50L, 100L)
      span <- Gen.chooseNum(1L, 60L)
      n <- Gen.chooseNum(1, 30)
      rows <- Gen.listOfN(n, for {
        v <- Gen.frequency(
          9 -> Gen.chooseNum(lo, lo + span).map(Some(_)),
          1 -> Gen.const(None))
        s <- Gen.chooseNum(0, 25).map(i => s"s${('a' + i % 26).toChar}$i")
      } yield (v, s))
    } yield rows)
  } yield batches

  private val predGen: Gen[Column] = {
    val long = Gen.chooseNum(-60L, 170L)
    val str = Gen.chooseNum(0, 30).map(i => s"s${('a' + i % 26).toChar}$i")
    val leaf: Gen[Column] = Gen.oneOf(
      long.map(v => col("v") === v),
      long.map(v => col("v") > v),
      long.map(v => col("v") <= v),
      str.map(s => col("s") === s),
      str.map(s => col("s") < s),
      Gen.listOfN(3, long).map(vs => col("v").isin(vs: _*)),
      Gen.listOfN(2, str).map(ss => col("s").isin(ss: _*)),
      long.map(v => col("v") % 3 === v % 3), // undecidable shape
      Gen.const(col("v").isNull),
      Gen.const(col("s").isNotNull))
    for {
      a <- leaf; b <- leaf; c <- leaf
      combine <- Gen.chooseNum(0, 3)
    } yield combine match {
      case 0 => a
      case 1 => a && b
      case 2 => a || b
      case 3 => (a && b) || c
    }
  }

  test("readWhere never loses a row vs the unpruned filter (fuzzed)") {
    import spark.implicits._
    forAll(Gen.zip(tableGen, Gen.listOfN(6, predGen)), n = 12) {
      case (batches, preds) =>
        val t = IcebergLikeTable(spark,
          Files.createTempDirectory("stats_fuzz").toString + "/t",
          "event", Nil, statsColumns = Seq("v", "s"),
          bloomColumns = Seq("s"), bloomExpectedItems = 200L)
        batches.foreach { rows =>
          t.append(rows.toDF("v", "s").withColumn("event", lit("e")).coalesce(1))
        }
        preds.foreach { p =>
          val pruned = t.readWhere(p)
          val full = t.read.filter(p)
          val missing = full.exceptAll(pruned).count()
          val extra = pruned.exceptAll(full).count()
          assert(missing == 0 && extra == 0,
            s"pruning broke predicate $p: missing=$missing extra=$extra " +
              s"files=${t.filesFor(p)} of ${t.filesFor(lit(true))}")
        }
    }
  }
}
