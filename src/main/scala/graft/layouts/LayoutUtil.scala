package graft.layouts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared pieces of the persisted-layout builders ([[IvfIndex]],
  * [[PqIndex]]) — one definition so a hardening fix reaches every
  * layout. */
private[layouts] object LayoutUtil {

  /** Collision-safe cache id for a layout key (the hardened ZOrder
    * convention: a 32-bit String.hashCode collision would silently serve
    * a wrong layout). */
  def cacheId(key: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Dedup a (vec_id, v) corpus to identity-group representatives with
    * their sorted member lists — the index-build precondition both ANN
    * layouts rely on (rows are group-min reps, so a top-k over reps
    * covers the true top-k: the vecGroups proof in LlmOps). */
  def repsWithMembers(corpus: DataFrame): DataFrame =
    corpus.groupBy(col("v"))
      .agg(min(col("vec_id")).as("vec_id"),
        sort_array(collect_list(col("vec_id"))).as("members"))
}
