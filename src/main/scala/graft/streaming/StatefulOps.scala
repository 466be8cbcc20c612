package graft.streaming

import scala.collection.mutable
import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.core.{EventEnvelope, Stamp}

/** One fired window: its id, the merged stamp of its member events
  * (min start / max end — reference NewEventFromOthers,
  * pkg/events/timestamper.go:22-50), and the member contents in order.
  */
final case class WindowBatch[T](windowId: Long, stamp: Stamp, events: Seq[T])

/** Internal state of the counting-window processor. `seen` = total events
  * ever received; `head` = global index of buf(0); `win` = next window id
  * to fire. Gap events of skipping windows (shift > n) are dropped at
  * arrival (reference: updateSelectionForBuffer advancing past pre-window
  * events, selection_policy.go:583-596).
  */
final case class CountingState[T](
    seen: Long, head: Long, win: Long, buf: Seq[EventEnvelope[T]])

/** The genuinely custom stateful operators — the two reference semantics
  * Spark has no built-in for (SURVEY §7.3): counting windows with
  * arbitrary slide, and the streaming first-n Limit.
  *
  * Scale stance: these GLOBAL versions key everything to one group — a
  * deliberate single-writer bottleneck matching the reference's
  * single-process semantics (a global "first 100 events" is inherently
  * sequential). The keyed variants (`countingWindowsByKey`) partition by a
  * user key and scale horizontally; state per key is O(n + shift).
  */
object StatefulOps {

  /** Shared single-pass counting-window engine: ArrayBuffer accumulation
    * (amortized O(1) append — a Seq `:+` loop is O(n²) over a large
    * micro-batch) and ONE physical trim per invocation; per-window work
    * is the O(n) slice that materializes the fired window.
    */
  private def processCounting[T](n: Int, shift: Int,
      st: CountingState[T],
      incoming: Seq[EventEnvelope[T]]): (CountingState[T], Seq[WindowBatch[T]]) = {
    var seen = st.seen
    var win = st.win
    val acc = new mutable.ArrayBuffer[EventEnvelope[T]](
      st.buf.size + incoming.size)
    acc ++= st.buf
    // absolute index of acc(0); only advances at the final trim
    var head0 = st.head
    var headIsSet = acc.nonEmpty
    incoming.foreach { e =>
      val g = seen; seen += 1
      if (g >= win * shift) { // not a gap/late event
        if (!headIsSet) { head0 = g; headIsSet = true }
        acc += e
      }
    }
    val out = mutable.Buffer.empty[WindowBatch[T]]
    while (seen >= win * shift + n) {
      val off = (win * shift - head0).toInt
      val evs = acc.slice(off, off + n).toSeq
      out += WindowBatch(win, Stamp.mergeAll(evs.map(_.stamp)),
        evs.map(_.content))
      win += 1
    }
    // single physical GC: drop everything below the next window start
    val drop = math.min(acc.size.toLong,
      math.max(0L, win * shift - head0)).toInt
    val newBuf = if (drop == 0) acc.toSeq else acc.drop(drop).toSeq
    (CountingState(seen, head0 + drop, win, newBuf), out.toSeq)
  }

  /** Counting windows of size n sliding by shift over a single logical
    * stream (reference: CountingWindowPolicy, selection_policy.go:122-128,
    * 140-176). shift == n tumbles, shift < n re-delivers (overlap), shift
    * > n drops gap events — semantics pinned by
    * selection_policy_test.go:67-95. A window fires as soon as its n-th
    * event arrives (NextSelectionReady, :144-146).
    *
    * Events are processed in event-time order within each micro-batch
    * (the reference's sorted-stream repair, stream.go:279-319); events
    * arriving after their window has fired are skipped, like any late
    * event in the reference.
    */
  def countingWindows[T: TypeTag](n: Int, shift: Int)(
      ds: Dataset[EventEnvelope[T]]): Dataset[WindowBatch[T]] = {
    require(n > 0 && shift > 0)
    implicit val encState: Encoder[CountingState[T]] =
      ExpressionEncoder[CountingState[T]]()
    implicit val encOut: Encoder[WindowBatch[T]] =
      ExpressionEncoder[WindowBatch[T]]()
    implicit val encKey: Encoder[Int] = Encoders.scalaInt

    ds.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[EventEnvelope[T]],
         state: org.apache.spark.sql.streaming.GroupState[CountingState[T]]) =>
          val st = state.getOption.getOrElse(
            CountingState[T](0L, 0L, 0L, Seq.empty))
          val incoming = it.toSeq.sortBy(_.stamp.start_time.getTime)
          val (newState, out) = processCounting(n, shift, st, incoming)
          state.update(newState)
          out.iterator
      }
  }

  /** Keyed counting windows — the horizontally scalable variant: one
    * independent counting window per key, state partitioned across
    * executors.
    */
  def countingWindowsByKey[T: TypeTag](n: Int, shift: Int)(
      key: EventEnvelope[T] => String)(
      ds: Dataset[EventEnvelope[T]]): Dataset[(String, WindowBatch[T])] = {
    require(n > 0 && shift > 0)
    implicit val encState: Encoder[CountingState[T]] =
      ExpressionEncoder[CountingState[T]]()
    implicit val encOut: Encoder[(String, WindowBatch[T])] =
      ExpressionEncoder[(String, WindowBatch[T])]()
    implicit val encKey: Encoder[String] = Encoders.STRING

    ds.groupByKey(key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[EventEnvelope[T]],
         state: org.apache.spark.sql.streaming.GroupState[CountingState[T]]) =>
          val st = state.getOption.getOrElse(
            CountingState[T](0L, 0L, 0L, Seq.empty))
          val incoming = it.toSeq.sortBy(_.stamp.start_time.getTime)
          val (newState, out) = processCounting(n, shift, st, incoming)
          state.update(newState)
          out.iterator.map(k -> _)
      }
  }

  /** Streaming first-n limit (reference: Limit,
    * default_filter_operators.go:55-67). The reference's counter is
    * unsynchronized ("approximately first n"); this is exact-n in
    * event-time order within each micro-batch.
    */
  def limit[T: TypeTag](n: Int)(
      ds: Dataset[EventEnvelope[T]]): Dataset[EventEnvelope[T]] = {
    implicit val encState: Encoder[Long] = Encoders.scalaLong
    implicit val encOut: Encoder[EventEnvelope[T]] =
      ExpressionEncoder[EventEnvelope[T]]()
    implicit val encKey: Encoder[Int] = Encoders.scalaInt

    ds.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[EventEnvelope[T]],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val already = state.getOption.getOrElse(0L)
          val take = math.max(0L, n - already).toInt
          val sorted = it.toSeq.sortBy(_.stamp.start_time.getTime)
          val out = sorted.take(take)
          state.update(already + out.size)
          out.iterator
      }
  }
}
