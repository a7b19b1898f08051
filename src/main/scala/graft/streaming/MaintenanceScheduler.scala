package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** ONE way to run every maintenance policy a deployment carries.
  *
  * The repo has six trigger policies — fragmentation on the five
  * persisted index families ([[graft.operators.Dedup
  * .compactIfFragmentedWith]] over dedup/phash bands, the IVF and PQ
  * code tables, and BM25's marker-fenced fold) and retention on the
  * retract changelog ([[StreamingQueries]]' `LakeRetractStream
  * .compactRetractLogIfLong`). Each is cheap to DECIDE (one file/marker
  * listing) and expensive to FIRE (a fenced rewrite), and each documents
  * the same two execution rules:
  *
  *  1. SINGLE WRITER — a fired repair must never run concurrently with
  *     the stream that appends to the same artifact;
  *  2. COMMITTED OFFSETS — seal/fold only work the writer's checkpoint
  *     has committed (the retract log's explicit-watermark rule).
  *
  * The gates enforce those rules by convention (call the trigger after
  * `processAllAvailable`); this scheduler makes the convention a
  * mechanism. [[maintenanceWindow]] QUIESCES every registered writer
  * first — `processAllAvailable` returns only when all published work's
  * offsets are committed, satisfying rule 2 — then runs the registered
  * triggers one at a time on the calling thread (rule 1: the writers are
  * idle for the whole window, and no two repairs overlap). Policies run
  * in registration order, every decision is logged, and a policy that
  * throws aborts the window — a half-run window is safe because every
  * fold is individually atomic and idempotent, and the next window
  * re-decides from the artifact state.
  *
  * Scale shape: a window's steady-state cost is the sum of the policies'
  * listings — metadata only. The scheduler adds no state of its own; all
  * durability lives in the artifacts (markers, manifests, checkpoints),
  * so a crashed scheduler process needs no recovery protocol beyond
  * restarting the loop.
  */
final class MaintenanceScheduler {

  /** One logged trigger decision: `window` counts [[maintenanceWindow]]
    * calls, `measure` is the policy's probed metric (files-per-bucket,
    * live log count, ...), `fired` whether the repair ran.
    */
  final case class Decision(window: Int, policy: String, measure: Double,
      fired: Boolean)

  private val policies =
    scala.collection.mutable.ArrayBuffer.empty[(String, () => (Double, Boolean))]
  private val log = scala.collection.mutable.ArrayBuffer.empty[Decision]
  private var windows = 0

  /** Register a policy: any `() => (measure, fired)` trigger — the shape
    * every `compactIfFragmentedWith` binding already has; adapt
    * integer-measure triggers (the retract log's live count) with a
    * `.toDouble`.
    */
  def register(name: String)(trigger: () => (Double, Boolean)): this.type =
    synchronized {
      require(!policies.exists(_._1 == name), s"policy $name already registered")
      policies += (name -> trigger)
      this
    }

  /** Run one maintenance window: quiesce every `writer`, then execute
    * all registered triggers serially. Returns this window's decisions.
    */
  def maintenanceWindow(writers: StreamingQuery*): Seq[Decision] =
    synchronized {
      writers.foreach(_.processAllAvailable())
      windows += 1
      val w = windows
      val ds = policies.toList.map { case (name, trigger) =>
        val (measure, fired) = trigger()
        Decision(w, name, measure, fired)
      }
      log ++= ds
      ds
    }

  /** Every decision taken so far, in execution order. */
  def decisions: Seq[Decision] = synchronized { log.toList }
}
