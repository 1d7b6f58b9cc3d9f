package graft

/** Minimal in-memory GroupState for driving stateful-stream transition
  * functions in specs without a running stream. Shared by the packing
  * specs (PackStreamSpec, PropertySpecs); SessionStreamSpec keeps its
  * own variant because it also records timeout/remove interactions.
  */
class FakeGroupState[S](var v: Option[S])
    extends org.apache.spark.sql.streaming.GroupState[S] {
  override def exists: Boolean = v.isDefined
  override def get: S = v.get
  override def getOption: Option[S] = v
  override def update(s: S): Unit = { v = Some(s) }
  override def remove(): Unit = { v = None }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = {}
  override def setTimeoutDuration(d: String): Unit = {}
  override def setTimeoutTimestamp(t: Long): Unit = {}
  override def setTimeoutTimestamp(t: Long, add: String): Unit = {}
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = {}
  override def setTimeoutTimestamp(t: java.sql.Date,
                                   add: String): Unit = {}
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
