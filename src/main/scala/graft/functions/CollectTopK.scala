package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a native aggregate — THE scalable kNN
  * reduce. Map-side partial aggregation keeps one k-sized heap per
  * query on every partition, so the shuffle carries
  * O(partitions x Q x k) rows instead of the N x Q a
  * sort/row_number() plan would move. This is how a 100 TB scan
  * answers a 10k-query batch with a kilobyte-scale shuffle.
  *
  * Ordering is (score, id) lexicographic — `asc=true` keeps the k
  * smallest (distances), `asc=false` the k largest (similarities);
  * ties always break toward the smaller id, matching the oracle's
  * `ORDER BY score [DESC], id`.
  *
  * Replaces the reference's per-query `kneighbors` scan
  * (bigvectorbench/algorithms/bruteforce/module.py:41-66) with one
  * distributed pass for the whole batch.
  */
case class CollectTopK(
    left: Expression,  // score: Double
    right: Expression, // id: Long
    k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k, asc)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null) {
      CollectTopK.observeRows(1)
      buf.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    // the merge fan-in (deserialized partial buffers) counts against
    // the same per-task budget as update rows — the round-14 OOM
    // surfaced in exactly this path (TopKHeap.fromBytes)
    CollectTopK.observeRows(other.size)
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKHeap): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(id, s)
    })
  }

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(bytes, k, asc)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): CollectTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CollectTopK = copy(left = l, right = r)
  override def prettyName: String = "collect_topk"
}

object CollectTopK {
  /** Rows one task may stream through collect_topk buffers before a
    * sizing warning is logged. The heap buffers are unmanaged JVM
    * objects (TypedImperativeAggregate) that Spark's memory manager
    * cannot see, so a task fed far past the sizing target (~10M
    * rows/task, NnDescent.RowsPerTaskTarget) fails as an OPAQUE
    * executor OOM instead of spilling — the round-14 5M build OOM'd
    * an 80 GB heap at ~44M rows/task with no earlier signal. The
    * aggregate now flags the mis-sizing itself, while the job is
    * still alive and the fix (more shuffle partitions) is actionable.
    * Default 32M: ~3x the safe chunk, under the measured OOM point.
    * Override with GRAFT_TOPK_WARN_ROWS; specs set the var directly.
    */
  @volatile var warnRowsPerTask: Long =
    sys.env.get("GRAFT_TOPK_WARN_ROWS").flatMap(_.trim.toLongOption)
      .getOrElse(32L * 1000 * 1000)

  /** Total sizing warnings logged in this JVM (spec observability). */
  val warningCount = new java.util.concurrent.atomic.AtomicLong(0)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[CollectTopK])

  private final class TaskRows {
    var attempt: Long = Long.MinValue
    var rows: Long = 0L
    var pending: Int = 0
    var warned: Boolean = false
  }
  private val taskRows: ThreadLocal[TaskRows] =
    ThreadLocal.withInitial(() => new TaskRows)

  /** Count `n` rows against the current task's top-k row budget. Hot
    * path (once per update row): one ThreadLocal read plus a field
    * increment; the TaskContext lookup and threshold check amortize
    * over 65,536-row quanta. Tasks run one-per-thread, so a thread
    * switch is a task switch and the attempt-id check below keeps
    * counts per-task (a stale sub-quantum carryover of < 65,536 rows
    * is immaterial against a multi-million-row threshold).
    */
  private[functions] def observeRows(n: Int): Unit = {
    val c = taskRows.get()
    c.pending += n
    if (c.pending >= 65536) flush(c)
  }

  private def flush(c: TaskRows): Unit = {
    val add = c.pending
    c.pending = 0
    val tc = org.apache.spark.TaskContext.get()
    if (tc == null) return
    if (c.attempt != tc.taskAttemptId()) {
      c.attempt = tc.taskAttemptId(); c.rows = 0L; c.warned = false
    }
    c.rows += add
    if (!c.warned && c.rows > warnRowsPerTask) {
      c.warned = true
      warningCount.incrementAndGet()
      log.warn(s"collect_topk: task ${tc.taskAttemptId()} (stage " +
        s"${tc.stageId()}, partition ${tc.partitionId()}) streamed " +
        s"${c.rows} rows through typed top-k buffers (threshold " +
        s"$warnRowsPerTask). These buffers are unmanaged JVM heap — an " +
        "undersized shuffle width fails as an executor OOM, not a " +
        "spill. Raise spark.sql.shuffle.partitions toward ~10M " +
        "rows/task (NnDescent.autoShufflePartitions derives this).")
    }
  }
}

/** Bounded binary heap of (score, id), worst element at root so a
  * better candidate evicts it in O(log k). Flat primitive arrays —
  * no boxing on the hot path.
  */
final class TopKHeap(k: Int, asc: Boolean) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  /** Elements currently held (≤ k) — the merge fan-in unit. */
  def size: Int = n

  /** a strictly worse than b? (worse = later in final ranking) */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    if (asc) s1 > s2 || (s1 == s2 && i1 > i2)
    else s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(s: Double, id: Long): Unit = {
    if (n < k) {
      var i = n
      scores(i) = s; ids(i) = id; n += 1
      // sift up (root holds the WORST of the kept set)
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          swap(i, p); i = p
        } else return
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      swap(i, w); i = w
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  def sortedBestFirst: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    val ord: Ordering[(Double, Long)] =
      if (asc) Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
      else Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
    out.sorted(ord)
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(bytes: Array[Byte], k: Int, asc: Boolean): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val h = new TopKHeap(k, asc)
    var i = 0
    while (i < m) { h.insert(bb.getDouble, bb.getLong); i += 1 }
    h
  }
}
