package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing — the batch-prep step that concatenates short
  * documents into fixed-token-budget training sequences (standard in
  * LM pretraining/SFT pipelines: padding waste is proportional to
  * 1 - mean(fill), so packs should run as close to the budget as
  * greedy order allows).
  *
  * Distribution model: packing is inherently sequential, so it runs
  * GREEDILY WITHIN each bucket (`id % numPartitions`), docs in
  * ascending id order; buckets pack independently and in parallel —
  * the universal recipe, since cross-bucket packing would serialize
  * the corpus through one task for at most one partial pack's worth
  * of extra fill per bucket. Pack ids are the first doc id of the
  * pack (globally unique, deterministic — no
  * monotonically_increasing_id, whose values depend on the partition
  * layout).
  *
  * The bucket is `pmod(id, numPartitions)` — plain modular
  * arithmetic, NOT the engine's hash partitioner — so pack
  * composition is a pure function of (ids, token counts, maxTokens,
  * numPartitions) that any engine (or the DuckDB oracle's recursive
  * CTE, see `SparkEntry.oracleSql("pack_sequences")`) reproduces
  * bit-for-bit. Several mod-buckets may co-reside in one Spark
  * partition (the shuffle hashes the bucket column); the packer
  * flushes at bucket boundaries so co-residence never leaks into
  * composition.
  */
object Pack {

  final case class PackRow(
      pack_id: Long,
      doc_ids: Seq[Long],
      n_docs: Int,
      total_tokens: Long,
      oversize: Boolean) // single doc longer than the budget

  /** Pack (id, tokenCount) rows into sequences of ≤ maxTokens.
    * Oversize docs (tokenCount > maxTokens) become singleton packs
    * flagged `oversize` — the caller decides truncate vs drop.
    *
    * `numPartitions` is EXPLICIT (not the session's shuffle-partition
    * config) because pack composition depends on which ids share a
    * mod-bucket: pinning it makes the output deterministic across
    * engines/configs, not merely per-config. */
  def packSequences(docs: Dataset[(Long, Int)],
      maxTokens: Int, numPartitions: Int = 32): Dataset[PackRow] = {
    import docs.sparkSession.implicits._
    docs.toDF("id", "n_tok")
      .withColumn("bucket", pmod(col("id"), lit(numPartitions.toLong)))
      .repartition(numPartitions, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("id"))
      .select(col("bucket"), col("id"), col("n_tok"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[PackRow]
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        var tok = 0L
        var cur = -1L // current bucket; flush when it changes
        def flush(): Unit = if (ids.nonEmpty) {
          out += PackRow(ids.head, ids.toSeq, ids.length, tok,
            oversize = tok > maxTokens)
          ids.clear(); tok = 0L
        }
        it.foreach { case (b, id, n) =>
          if (b != cur) { flush(); cur = b }
          if (ids.nonEmpty && tok + n > maxTokens) flush()
          ids += id; tok += n
          if (tok > maxTokens) flush() // oversize singleton
        }
        flush()
        out.iterator
      }
  }

  /** DataFrame adapter: token counts = whitespace word counts of
    * `textCol` (swap in BPE counts via the same shape). Null AND blank
    * text both count 0 tokens — `size(split(null))` is NULL (rejected by
    * the non-nullable Int encoder) and `split(trim("  "))` is `[""]`
    * (size 1), which would charge empty docs one phantom token each. */
  def packDocuments(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, numPartitions: Int = 32): DataFrame = {
    import df.sparkSession.implicits._
    val trimmed = trim(col(textCol))
    packSequences(
      df.select(col(idCol).cast("long"),
        when(coalesce(length(trimmed), lit(0)) === 0, lit(0))
          .otherwise(size(split(trimmed, "\\s+"))))
        .as[(Long, Int)],
      maxTokens, numPartitions).toDF()
  }
}
