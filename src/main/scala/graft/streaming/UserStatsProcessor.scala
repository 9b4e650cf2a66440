package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** §2.L7's modern sibling: per-user running (count, min) on the Spark 4
  * transformWithState API. State is ONE named, typed ValueState cell per
  * key in the state store (schema'd, TTL-capable — TTLConfig.NONE here:
  * counters live for the stream's lifetime); each micro-batch folds its
  * rows into the cell and emits the running total (update mode). At
  * cluster scale the cells shard by the grouping key across executors
  * with checkpointed WALs, exactly like the legacy
  * flatMapGroupsWithState path this modernizes. */
class UserStatsProcessor
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {

  @transient private var state: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Double)]("agg",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
      timers: TimerValues): Iterator[(Long, Long, Double)] = {
    var (n, mn) = if (state.exists()) state.get()
      else (0L, Double.PositiveInfinity)
    rows.foreach { case (_, v) => n += 1; if (v < mn) mn = v }
    state.update((n, mn))
    Iterator((user, n, mn))
  }
}
