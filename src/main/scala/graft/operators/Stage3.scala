package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model._

/** Stage 3 — PII/toxicity scrub of surviving transcripts (graft,
  * BASELINE.json.north_star). Narrow map over the kept rows; the compiled
  * regex family is a JVM-static singleton in [[Scrub]], i.e. compiled
  * once per executor. */
object Stage3 {
  def apply(spark: SparkSession,
      decisions: Dataset[DecisionRow]): Dataset[ScrubbedRow] = {
    import spark.implicits._
    decisions
      .filter(_.keep) // predicate runs before the scrub map
      .map { d =>
        val r = Scrub.scrub(d.transcript)
        ScrubbedRow(d.clip_id, d.source, d.lg, r.text,
          r.emails, r.phones, r.ids, r.tox)
      }
  }
}
