package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Per-partition row counter for STREAMING plans — the role
  * `monotonically_increasing_id()` plays in batch, which Structured
  * Streaming rejects by expression type (its values would differ across
  * micro-batch replays, which Spark conservatively forbids everywhere).
  *
  * Here the nondeterminism is exactly the point and exactly bounded: the
  * CDC decode uses the counter as the topic-offset stand-in ordering
  * envelope rows WITHIN one micro-batch partition
  * ([[graft.sql.StreamingCdc.withArrivalSeq]]), and the consuming MERGE
  * is replay-idempotent BY KEY (keep-last supersedes stored state
  * regardless of the counter's absolute value), so a replayed batch
  * reaches the same final state even if its counters differ — the
  * contract monotonically_increasing_id cannot declare but this tier
  * actually holds.
  *
  * `bound` RAISES (actionably) when a partition exceeds it in one batch:
  * the caller packs the counter into a fixed bit budget, and a silent
  * wrap would misorder same-timestamp envelopes. The check lives INSIDE
  * the expression because a separate guard column would be a second
  * ArrivalId reference — Catalyst deduplicates equal case-class
  * expressions, double-stepping the counter per row.
  *
  * Evaluation is interpreted (CodegenFallback): it sits next to JSON
  * envelope parsing, far off any codegen-hot path. */
case class ArrivalId(bound: Long = Long.MaxValue)
    extends LeafExpression with Nondeterministic with CodegenFallback {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_arrival_id"

  @transient private[this] var count: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    count = 0L

  override protected def evalInternal(input: InternalRow): Long = {
    if (count >= bound) throw new IllegalStateException(
      s"CDC arrival-seq ordering bound exceeded: more than $bound " +
        "envelope rows in one file partition of one micro-batch — " +
        "increase source parallelism or set 'maxFilesPerTrigger' so " +
        "per-partition batch slices stay under the bound")
    val v = count
    count += 1
    v
  }
}
