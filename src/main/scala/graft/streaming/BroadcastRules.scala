package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.streaming.DataStreamWriter

/** The broadcast state pattern — a small control/rules stream replicated
  * to every task and applied against a keyed main stream
  * (`DataStream.connect(BroadcastStream)` +
  * `BroadcastProcessFunction`; state descriptor per
  * flink-runtime/…/streaming/api/datastream/BroadcastConnectedStream.java).
  *
  * Spark-first mapping: the rules side is a BROADCAST relation, not keyed
  * state — batch applies one broadcast hash join; streaming refreshes the
  * rules every micro-batch inside `foreachBatch` by re-reading the rules
  * table (the update channel a Flink broadcast stream provides). At 100 TB
  * the main side never shuffles for the rule application — each task holds
  * the full (small) rule set, exactly the reference's replication model.
  */
object BroadcastRules {

  /** Apply the rules relation onto `main` by broadcast join (the
    * BroadcastProcessFunction's processElement side). */
  def apply(main: DataFrame, rules: DataFrame, on: Seq[String],
      how: String = "left"): DataFrame =
    main.join(broadcast(rules), on, how)

  /** Streaming face: every micro-batch re-reads the CURRENT rules via
    * `loadRules` (processBroadcastElement's state update, pulled rather
    * than pushed) and hands the joined batch to `sink`. Start with
    * `.start()` on the returned writer. */
  def stream(
      main: DataFrame,
      loadRules: SparkSession => DataFrame,
      on: Seq[String],
      sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    main.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(apply(batch, loadRules(batch.sparkSession), on), id)
    }
}
