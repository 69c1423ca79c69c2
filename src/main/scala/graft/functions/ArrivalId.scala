package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Per-partition arrival counter for STREAMING plans:
  * `partitionIndex << 33 | row-number-within-partition` — the same
  * packing as Spark's `monotonically_increasing_id()`, which Structured
  * Streaming rejects by expression type (its values would differ across
  * micro-batch replays, which Spark conservatively forbids everywhere).
  *
  * Here the nondeterminism is exactly the point and exactly bounded: the
  * CDC decode uses the LOW bits as the topic-offset stand-in ordering
  * envelope rows WITHIN one micro-batch partition
  * ([[graft.sql.StreamingCdc.withArrivalSeq]]), and the consuming MERGE
  * is replay-idempotent BY KEY (keep-last supersedes stored state
  * regardless of the counter's absolute value), so a replayed batch
  * reaches the same final state even if its counters differ — the
  * contract monotonically_increasing_id cannot declare but this tier
  * actually holds. Evaluation is interpreted (CodegenFallback): it sits
  * next to JSON envelope parsing, far off any codegen-hot path. */
case class ArrivalId()
    extends LeafExpression with Nondeterministic with CodegenFallback {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_arrival_id"

  @transient private[this] var count: Long = _
  @transient private[this] var partitionMask: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    count = 0L
    partitionMask = partitionIndex.toLong << 33
  }

  override protected def evalInternal(input: InternalRow): Long = {
    val v = count
    count += 1
    partitionMask + v
  }
}
