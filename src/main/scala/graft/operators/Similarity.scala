package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small)
  *    query set against the corpus; the dot product is a codegen'd
  *    `aggregate(zip_with(...))` over doubles, no UDF. At 10^12 rows this
  *    is the verification baseline and the final re-rank stage.
  *  - [[lshTopK]] — random-hyperplane LSH (sign sketch): vectors land in
  *    buckets keyed by the sign pattern of `planes` fixed hyperplanes;
  *    queries probe their own bucket only, then re-rank exactly. The
  *    corpus-side work is one narrow map + one shuffle by bucket — the
  *    scale path (recall < 1 by design; bump `planes` down or probe
  *    neighbor buckets for higher recall).
  */
object Similarity {

  /** cos(a,b) as a codegen-friendly Column over two array<double> cols. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, v) => s + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (s, v) => s + v))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query id (excluding self). */
  def bruteForceTopK(vectors: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int = 5): DataFrame = {
    val v = vectors.select(col(idCol).cast("long").as("vid"),
      col(vecCol).cast("array<double>").as("vec"))
    val q = v.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("vec").as("qvec"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("vid") =!= col("qid"))
      .withColumn("sim", round(cosine(col("qvec"), col("vec")), 4))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vid"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim). */
  private def planeComponent(plane: Int, dim: Int): Double = {
    var x = (plane.toLong << 32 | dim.toLong) + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^= (x >>> 31)
    (x.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
  }

  /** Sign-sketch bucket id of a vector under `planes` hyperplanes. */
  def sketchCol(vec: Column, dim: Int, planes: Int): Column = {
    val bits: Seq[Column] = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec,
          array((0 until dim).map(d => lit(planeComponent(p, d))): _*),
          (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: bucket by sign sketch, exact re-rank in-bucket. */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], dim: Int, k: Int = 5, planes: Int = 8): DataFrame = {
    val v = vectors.select(col(idCol).cast("long").as("vid"),
      col(vecCol).cast("array<double>").as("vec"))
      .withColumn("bucket", sketchCol(col("vec"), dim, planes))
    val q = v.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("vec").as("qvec"),
        col("bucket").as("qbucket"))
    val scored = v.join(broadcast(q), col("bucket") === col("qbucket"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("sim", round(cosine(col("qvec"), col("vec")), 4))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vid"), col("sim"))
  }
}
