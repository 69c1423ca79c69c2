package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StructField, StructType}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** AsyncCalc: asynchronous scalar function invocation with bounded
  * in-flight work per partition and ORDERED emission — the reference's
  * async scalar tier (StreamExecAsyncCalc.java,
  * AsyncScalarFunction.java:93). Use for scalar functions that do I/O
  * (HTTP enrichment, KMS decrypt): the partition keeps `maxInFlight`
  * batches running while earlier results emit in input order.
  *
  * The function itself must be pure/deterministic per row for results to
  * be retry-safe (same contract as the reference).
  */
object AsyncCalc {

  def apply(
      df: DataFrame,
      f: Row => Any,
      outField: StructField,
      batchSize: Int = 64,
      maxInFlight: Int = 4): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ outField)
    df.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      val batches = it.grouped(batchSize)
      val inFlight = scala.collection.mutable.Queue.empty[Future[Seq[Row]]]
      def submit(): Unit =
        while (inFlight.size < maxInFlight && batches.hasNext) {
          val batch = batches.next()
          inFlight.enqueue(Future {
            batch.map(r => Row.fromSeq(r.toSeq :+ f(r)))
          })
        }
      new Iterator[Seq[Row]] {
        def hasNext: Boolean = { submit(); inFlight.nonEmpty }
        def next(): Seq[Row] = Await.result(inFlight.dequeue(), Duration.Inf)
      }.flatten
    }(Encoders.row(outSchema))
  }
}
