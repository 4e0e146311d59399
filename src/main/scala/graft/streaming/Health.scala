package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

/** R13: the bridge's liveness surface, Spark-native.
  *
  * The reference serves `/healthz` returning 200 while the serve context
  * is live and 503 once shutdown begins
  * (/root/reference/pkg/server/server.go:65-73). A Spark streaming job's
  * equivalent signal is "the query is active AND its micro-batches are
  * still progressing": a query can be `isActive` yet wedged (source stall,
  * state-store corruption), which is exactly what a k8s liveness probe
  * must catch. This listener tracks last-event time per query;
  * `isHealthy` is the probe body (true ⇒ 200 OK, false ⇒ 503) — serve it
  * from any HTTP library; the HTTP layer itself is out of scope here
  * (SURVEY non-goal).
  *
  * Scale notes: listener events are driver-side and O(1) per micro-batch;
  * state is O(|queries|). No executor involvement.
  */
class HealthMonitor private (spark: SparkSession, staleAfterMs: Long)
  extends StreamingQueryListener {

  private val lastSeen = new ConcurrentHashMap[UUID, Long]()

  /** Registration happens here, NOT in the constructor: registering
    * `this` mid-construction leaks a partially-built object to the
    * listener bus (this-escape). Queries already running at attach time
    * are seeded as fresh-now, so a long-idle-but-alive query probes
    * healthy until staleAfterMs elapses instead of reading unhealthy
    * until its next progress event. */
  private def start(): this.type = {
    // Register FIRST, then seed: a query starting between the two steps
    // either delivers its own start event or appears in the active
    // snapshot (a duplicate put is harmless) — the reverse order had a
    // gap where it got neither and read unhealthy until first progress.
    spark.streams.addListener(this)
    val now = System.currentTimeMillis()
    spark.streams.active.foreach(q => lastSeen.put(q.id, now))
    this
  }

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    lastSeen.put(e.id, System.currentTimeMillis())
  override def onQueryProgress(e: QueryProgressEvent): Unit =
    lastSeen.put(e.progress.id, System.currentTimeMillis())
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    lastSeen.remove(e.id)

  /** Liveness of one query: active and progressed within staleAfterMs.
    * (Listener events are async — a just-started query reads unhealthy
    * until its start event lands, i.e. this is also a readiness gate.) */
  def isHealthy(q: StreamingQuery): Boolean =
    q.isActive && Option(lastSeen.get(q.id))
      .exists(System.currentTimeMillis() - _ <= staleAfterMs)

  /** Process-level probe, mirroring the reference's single 200/503 bit:
    * healthy iff at least one streaming query is alive and EVERY active
    * query is fresh. After a drain/stop this flips false, the 503. */
  def isHealthy: Boolean = {
    val active = spark.streams.active
    active.nonEmpty && active.forall(isHealthy)
  }

  def close(): Unit = spark.streams.removeListener(this)
}

object HealthMonitor {
  /** The only way to obtain a monitor: fully construct, seed, register. */
  def attach(spark: SparkSession, staleAfterMs: Long = 60000L): HealthMonitor =
    new HealthMonitor(spark, staleAfterMs).start()
}

/** R16: the process exit-code contract (/root/reference/main.go:61-67) —
  * a shutdown that came from the cancel/drain path exits 0 ("goodbye");
  * any other termination exits 1. `gracefulDrain`'s boolean is exactly
  * that bit. */
object ExitCodes {
  def of(cleanDrain: Boolean): Int = if (cleanDrain) 0 else 1
}
