package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Locks the [[Tables.spread]] gate (r20, VERDICT r19 what's-wrong #4):
  * the rebalance may only fire when EVERY leaf is a bare file-source
  * relation whose actual file bytes sit under one scan split — plan
  * statistics (garbage for checkpointed plans) must never decide. */
class SpreadSpec extends SparkSpecBase {

  import spark.implicits._

  private def hasShuffle(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.collectFirst {
      case _: ShuffleExchangeExec => ()
    }.isDefined ||
      df.queryExecution.executedPlan.toString.contains("Exchange")

  test("spread fires on a tiny bare file scan") {
    val docs = Tables.documents(spark, sf)
    assert(hasShuffle(Tables.spread(docs)),
      "a sub-split file scan must be rebalanced")
  }

  test("spread is a no-op on checkpointed and local-relation plans") {
    // a localCheckpoint carries the PRE-checkpoint estimate forward —
    // the exact misuse class that made the CC gate read 8.1e17 bytes
    // for a 65 KB edge set; the leaf is a LogicalRDD, not a file scan
    val ckpt = Tables.documents(spark, sf).localCheckpoint(true)
    assert(Tables.spread(ckpt) eq ckpt,
      "a checkpointed plan must never be rebalanced")
    val local = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(Tables.spread(local) eq local,
      "a local relation must never be rebalanced")
    // a join mixing a file leaf with a non-file leaf is also ineligible
    val mixed = Tables.documents(spark, sf)
      .join(local, col("doc_id") === col("k"), "left")
    assert(Tables.spread(mixed) eq mixed,
      "a plan with any non-file leaf must never be rebalanced")
  }
}
