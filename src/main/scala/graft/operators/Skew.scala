package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers (north star: "hash-bucket by clip_id with
  * salting for skewed sources"). Sources are Zipf-distributed — src00
  * alone is ~18% of the fixture corpus and worse in production — so any
  * exchange keyed by `source` puts one key's rows on one task.
  *
  * Two standard remedies, both expressed with plain Columns so Catalyst
  * still prunes/pushes around them:
  *
  *  - [[saltedAgg]] — two-phase aggregation: first aggregate on
  *    (key, salt) spreading the hot key over `salts` tasks, then merge
  *    the partials per key. Correct for any algebraic aggregate bundle
  *    (the caller supplies partial + merge forms).
  *  - [[saltedJoin]] — replicate the small side `salts` times so a
  *    skewed big side joins on (key, salt). For broadcastable small
  *    sides prefer `broadcast()`; this is for the mid-size case.
  *
  * Note the main pipeline needs neither (nothing on the hot path keys an
  * exchange by `source` — ARCHITECTURE.md); these exist for the general
  * operator surface and are what we'd reach for if e.g. per-source
  * sessionization landed on a Zipf key. AQE skew-join splitting
  * (spark.sql.adaptive.skewJoin) is the runtime backstop; explicit
  * salting is the plan-level fix that also covers aggregations.
  */
object Skew {

  def saltCol(salts: Int): Column =
    pmod(hash(rand(42) * 1e6), lit(salts)).cast("int")

  /** Deterministic salt from existing row identity (preferred: keeps the
    * computation reproducible, unlike rand-based salts). */
  def saltFrom(idCol: Column, salts: Int): Column =
    pmod(hash(idCol), lit(salts)).cast("int")

  /** Two-phase salted aggregation. `partial` aggregates within
    * (key, salt); `merge` combines the per-salt partials per key.
    * Example (count): partial = count(*) as c, merge = sum(c) as c. */
  def saltedAgg(df: DataFrame, key: Column, salt: Column,
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.groupBy(key.as("k"), salt.as("s"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("k"))
      .agg(merge.head, merge.tail: _*)

  /** Salted equi-join: big side gets a salt from its own row id; small
    * side is replicated once per salt value. */
  def saltedJoin(big: DataFrame, bigKey: String, bigId: String,
      small: DataFrame, smallKey: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", saltFrom(col(bigId), salts))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1)))).withColumn("_salt",
      col("_salt").cast("int"))
    saltedBig.join(replicated,
      saltedBig(bigKey) === replicated(smallKey) &&
        saltedBig("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
