package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: assign documents to
  * fixed-token-budget bins. Packing is per-stratum (e.g. `source`), so
  * the sequential fill logic parallelizes across strata — the shuffle key
  * is the stratum, never the corpus.
  *
  * Two variants:
  *  - [[packGreedy]] — exact greedy fill (a doc that would overflow the
  *    bin starts the next one; an oversized doc gets its own bin).
  *    Sequential per stratum, expressed with the typed
  *    `flatMapSortedGroups` API; bin capacity is a hard invariant.
  *  - [[packByCumsum]] — boundary-straddle packing in one window pass:
  *    bin = floor(exclusive-running-token-sum / budget). A straddling
  *    doc may overflow its bin by up to its own length, but the whole
  *    assignment is a single codegen'd window — and expressible in any
  *    SQL engine, so the gate oracle hash-checks it.
  */
object Packing {

  /** (stratum, doc_id, n_tokens, bin) — exact greedy fill per stratum. */
  def packGreedy(df: DataFrame, strataCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[(String, Long, Long)] = df
      .select(col(strataCol).cast("string"), col(idCol).cast("long"),
        col(tokensCol).cast("long"))
      .as[(String, Long, Long)]
    typed
      .groupByKey(_._1)
      .flatMapSortedGroups(col(idCol)) { (_: String, it: Iterator[(String, Long, Long)]) =>
        var bin = 0L
        var fill = 0L
        it.map { case (st, id, tk) =>
          if (fill > 0 && fill + tk > budget) { bin += 1; fill = 0 }
          fill += tk
          (st, id, tk, bin)
        }
      }
      .toDF(strataCol, idCol, tokensCol, "bin")
  }

  /** (stratum, doc_id, n_tokens, bin) — single window pass; see above. */
  def packByCumsum(df: DataFrame, strataCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(strataCol), col(idCol), col(tokensCol))
      .withColumn("bin",
        floor((sum(col(tokensCol)).over(w) - col(tokensCol)) / lit(budget.toDouble))
          .cast("long"))
  }
}
