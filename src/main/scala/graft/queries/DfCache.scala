package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared memo for cached intermediate DataFrames, keyed
  * (session, dataset, kind) — a bounded pool (one entry per dataset a
  * session touches) instead of per-invocation `.cache()` leaks.
  * Shared across query modules so the SAME intermediate (e.g.
  * termCounts, used by both the text and embedding suites) is cached
  * once: two modules caching equal logical plans in private maps made
  * Spark warn "Asked to cache already cached data" and double-tracked
  * the entry.
  *
  * Kind registry — the key namespace is flat across modules, so a
  * reused kind string silently shares the other module's plan:
  *   - shared on purpose: "termCounts" (TextQueries + EmbeddingQueries
  *     — identical plan, that sharing is the point of this object).
  *   - module-private kinds MUST be prefixed with the module name
  *     (e.g. "idx:assigned") when the plan is not the canonical one.
  */
private[queries] object DfCache {
  // lazy holder: TrieMap.getOrElseUpdate may race two builders under
  // Verify's worker pool — both threads then .cache()'d their own
  // frame and the loser leaked an orphan cache entry. The map now
  // races only on the (cheap) holder; the winning holder's lazy val
  // is what every caller forces, so the builder body runs AT MOST
  // ONCE per key. Builders whose side effect targets a FIXED external
  // location (saveAsTable paths etc.) additionally rely on this
  // at-most-once guarantee — keep them behind this memo.
  private final class Memo(f: () => DataFrame) {
    lazy val df: DataFrame = f().cache()
  }
  private val m = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), Memo]

  def apply(s: SparkSession, dir: String, kind: String)(
      f: => DataFrame): DataFrame =
    m.getOrElseUpdate((s, dir, kind), new Memo(() => f)).df
}
