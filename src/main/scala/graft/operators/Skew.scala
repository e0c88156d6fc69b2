package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overflow a single task
  * (SURVEY §5). AQE's skew-join split handles sort-merge cases
  * adaptively; explicit salting remains the tool when the skewed side
  * must pre-aggregate or the join is key-exploding.
  *
  * `saltedJoin` replicates the (small) right side `saltFactor` times
  * and scatters the left side's hot keys across the replicas with a
  * deterministic per-row salt — each (key, salt) shuffle bucket then
  * holds ~1/saltFactor of a hot key's rows. Inner-join semantics are
  * preserved exactly: every left row meets exactly one replica of each
  * matching right row.
  */
object Skew {

  /** Inner equi-join of `left` and `right` on `key`, with the left
    * side's keys scattered over `saltFactor` salted partitions.
    * `right` is expected to be the bounded side (it is replicated
    * `saltFactor` times before the shuffle). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // salt derived from row CONTENT, never from partition-dependent ids
    // (monotonically_increasing_id under a stage retry reassigns ids →
    // rows change buckets mid-shuffle and the join drops/duplicates
    // rows, the SPARK-23207 failure class); identical rows sharing a
    // salt is harmless for correctness
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltFactor.toLong)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
