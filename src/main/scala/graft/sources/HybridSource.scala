package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.StructType

/** HybridSource (FLIP-150; reference
  * flink-connector-base/…/connector/base/source/hybrid/HybridSource.java,
  * docs connectors/datastream/hybridsource.md): read several sources
  * SEQUENTIALLY as one stream — the bootstrap pattern, "several days of
  * bounded history, then the live tail".
  *
  * Spark-first mapping, two spellings:
  *
  *  - [[fileBootstrap]]: the reference's FileSource→FileSource case IS
  *    Spark's file streaming source — `readStream` over a directory
  *    processes the files that already exist (the bounded history, in
  *    modification-time order) in its first micro-batches, then keeps
  *    tailing new arrivals forever. No switching machinery needed: the
  *    engine's own source provides exactly the HybridSource sequencing
  *    guarantee. `maxFilesPerTrigger` bounds each catch-up batch so the
  *    backfill cannot blow a single micro-batch's memory at 100 TB.
  *
  *  - [[builder]]: ordered composition of BOUNDED sources (the batch
  *    shape of the same pipeline): later sources append after earlier
  *    ones with a `_source_index` ordering column, so downstream
  *    sequence-sensitive logic can reproduce the read order without
  *    any global sort.
  *
  *  The arbitrary-streaming-source switch (bounded Kafka range → live
  *  Kafka) is carried by the tail source's own starting-offset options
  *  in Spark (the reference's OffsetsInitializer.timestamp equivalent)
  *  — documented delta: Spark plans one streaming source per query
  *  input, so cross-SYSTEM switching composes at the pipeline level. */
object HybridSource {

  /** Bounded history + live tail over ONE directory tree: Spark's file
    * streaming source reads existing files first, then new arrivals.
    * `schema` is required (streaming file sources do not infer). */
  def fileBootstrap(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      format: String = "parquet",
      maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .format(format)
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("latestFirst", "false") // history in order, then the tail
      .load(dir)

  /** HybridSource.builder(first).addSource(next)….build(): ordered
    * bounded composition. */
  def builder(first: DataFrame): Builder = {
    require(!first.isStreaming,
      "HybridSource.builder composes BOUNDED sources; for the " +
        "bounded-history-then-live-tail shape use fileBootstrap (the " +
        "file streaming source already reads existing files first)")
    new Builder(Vector(first))
  }

  final class Builder private[sources] (sources: Vector[DataFrame]) {
    def addSource(next: DataFrame): Builder = {
      require(!next.isStreaming,
        "all HybridSource.builder sources must be bounded")
      new Builder(sources :+ next)
    }
    /** One DataFrame reading the sources in declaration order; the
      * `_source_index` column carries the sequencing (monotone over
      * the read order — the reference's switch position). */
    def build(): DataFrame =
      sources.zipWithIndex.map { case (df, i) =>
        df.withColumn("_source_index", lit(i))
      }.reduce(_ unionByName _)
  }
}
