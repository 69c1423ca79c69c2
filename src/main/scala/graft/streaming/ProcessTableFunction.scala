package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** The user-extensible stateful operator hook — the reference's
  * ProcessTableFunction (flink-table-common/…/functions/
  * ProcessTableFunction.java:480, planned by
  * StreamExecProcessTableFunction.java:103): user code gets (key, new
  * rows, prior state, current watermark) and returns (new state, output
  * rows, optional event-time wake-up) — table in, table out, with timers.
  *
  * Unified execution: on a stream this runs via `flatMapGroupsWithState`
  * with event-time timeouts (wake-ups fire when the watermark passes the
  * requested time); on a batch input each key is processed once with the
  * watermark at +infinity — the batch-is-a-closed-stream special case.
  */
trait GraftPTF[S] extends Serializable {

  /** @param key         group key values
    * @param rows        new input rows (empty on a timer wake-up)
    * @param state       prior state, None on first call
    * @param watermarkMs current event-time watermark (Long.MaxValue in batch)
    * @return (state to keep — None drops it, output rows, optional
    *         event-time wake-up in ms; ignored in batch)
    */
  def process(
      key: Row,
      rows: Iterator[Row],
      state: Option[S],
      watermarkMs: Long): (Option[S], Seq[Row], Option[Long])
}

object ProcessTableFunction {

  def apply[S](
      df: DataFrame,
      keyCols: Seq[String],
      outSchema: StructType,
      ptf: GraftPTF[S]): DataFrame = {

    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val keySchema = StructType(keyIdx.map(df.schema.fields(_)))
    val kEnc: Encoder[Row] = Encoders.row(keySchema)
    val vEnc: Encoder[Row] = Encoders.row(df.schema)
    val sEnc: Encoder[Option[S]] = Encoders.kryo[Option[S]]
    val oEnc: Encoder[Row] = Encoders.row(outSchema)

    val grouped = df.as[Row](vEnc)
      .groupByKey(r => Row.fromSeq(keyIdx.map(r.get)))(kEnc)

    if (!df.isStreaming) {
      grouped.flatMapGroups { (key: Row, rows: Iterator[Row]) =>
        val (_, out, _) = ptf.process(key, rows, None, Long.MaxValue)
        out.iterator
      }(oEnc)
    } else {
      grouped.flatMapGroupsWithState[Option[S], Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Row, rows: Iterator[Row], state: GroupState[Option[S]]) =>
          val prior = state.getOption.flatten
          val wm = state.getCurrentWatermarkMs()
          val (next, out, wake) =
            ptf.process(key, if (state.hasTimedOut) Iterator.empty else rows,
              prior, wm)
          next match {
            case Some(_) =>
              state.update(next)
              wake.filter(_ > wm).foreach(state.setTimeoutTimestamp)
            case None => state.remove()
          }
          out.iterator
      }(sEnc, oEnc)
    }
  }
}

/** A process table function registered for SQL use — the reference's
  * PTF SQL spelling (ptfs.md; StreamExecProcessTableFunction.java:103):
  * `SELECT * FROM f(input => TABLE t PARTITION BY k,
  * on_time => DESCRIPTOR(ts), threshold => 100)`, positional arguments
  * and `DEFAULT` included. The SQL layer parses the call and hands the
  * resolved pieces here; implementations typically delegate to
  * [[ProcessTableFunction.apply]] with a [[GraftPTF]].
  */
trait SqlPtf extends Serializable {
  def name: String
  def apply(input: DataFrame, call: PtfCall): DataFrame
}

/** A parsed PTF call site: partition columns from the table argument's
  * `PARTITION BY`, per-partition `ORDER BY` columns (when given), the
  * `on_time` DESCRIPTOR column if any, named scalar arguments
  * (lower-cased names, raw literal text with string quotes stripped),
  * positional scalars in order (`DEFAULT`s dropped), and `MAP['k','v',…]`
  * literal arguments by name. */
final case class PtfCall(
    partitionBy: Seq[String],
    onTime: Option[String],
    named: Map[String, String],
    positional: Seq[String],
    orderBy: Seq[String] = Nil,
    maps: Map[String, Seq[(String, String)]] = Map.empty) {
  def arg(name: String, position: Int): Option[String] =
    named.get(name.toLowerCase).orElse(positional.lift(position))
}

/** Registry the SQL entry resolves PTF names against (case-insensitive),
  * like the session's function catalog in the reference. Ships with the
  * built-in changelog PTFs (FROM_CHANGELOG / TO_CHANGELOG). */
object SqlPtfs {
  private val reg =
    scala.collection.concurrent.TrieMap[String, SqlPtf](
      "from_changelog" -> graft.changelog.ChangelogPtfs.FromChangelog,
      "to_changelog" -> graft.changelog.ChangelogPtfs.ToChangelog)
  def register(f: SqlPtf): Unit = reg(f.name.toLowerCase) = f
  def get(name: String): Option[SqlPtf] = reg.get(name.toLowerCase)
}
