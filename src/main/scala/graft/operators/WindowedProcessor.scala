package graft.operators

import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TimerValues}

/** Shared event-time window-close lifecycle for the in-stream
  * per-(window, salt) StatefulProcessors ([[MgStream]] top talkers,
  * [[QdStream]] length quantiles, [[HllStream]] distinct sources,
  * [[ThreatScreenStream]] composite screen). Each previously
  * re-implemented the identical ~12-line late-row guard, close-timer
  * grid, and arming rule; a boundary edit (the exact `>=`/`<` at
  * window end, or the timer re-registration idempotence) had to be
  * applied in four places to stay provably identical. The lifecycle
  * now lives here once:
  *
  *  - [[closeMs]]: the group's close instant is `(win + 1) · winMs` —
  *    window end on the watermark's ms grid;
  *  - [[windowClosed]]: once the watermark reaches that instant the
  *    group's timer fired (or fires this batch) and its state is
  *    gone — late rows must be DRAINED and nothing emitted, never
  *    allowed to resurrect an empty group that downstream max-stamp
  *    filters would then double-count;
  *  - [[armCloseTimer]]: one close timer per group at window end;
  *    re-registering the same (key, expiry) every batch is an
  *    idempotent overwrite.
  *
  * What the timer DOES on expiry stays per-processor (the sketch triad
  * clears state and emits nothing — their last data batch already
  * emitted the final summary; the threat screen emits its finished
  * verdict exactly once), so `handleExpiredTimer` remains abstract.
  * Under `TimeMode.None` (durability-spec replays) the guard and the
  * arming are no-ops, preserving the triad's run-to-completion
  * semantics there.
  */
private[operators] abstract class WindowedProcessor[I, O](winMs: Long)
    extends StatefulProcessor[(Long, Int), I, O] {

  /** Set from init's TimeMode — `TimeMode.None` deployments never
    * guard or arm.
    */
  @transient protected var eventTime: Boolean = false

  protected final def trackTimeMode(timeMode: TimeMode): Unit =
    eventTime = timeMode == TimeMode.EventTime()

  /** Window end on the watermark's ms grid. */
  protected final def closeMs(key: (Long, Int)): Long = (key._1 + 1) * winMs

  /** True → the watermark already closed this window; the caller must
    * drain the late rows and emit nothing.
    */
  protected final def windowClosed(key: (Long, Int), tv: TimerValues): Boolean =
    eventTime && tv.getCurrentWatermarkInMs() >= closeMs(key)

  protected final def armCloseTimer(key: (Long, Int)): Unit =
    if (eventTime) getHandle.registerTimer(closeMs(key))
}
