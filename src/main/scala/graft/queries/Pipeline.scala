package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline queries — the operators a 100 TB LLM-corpus
  * build needs on top of the reference's own surface: deduplication
  * (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine),
  * similarity search (brute-force + LSH-bucketed ANN), text analysis
  * (stats, language-ID, quality, token counts, fingerprints), and
  * multimodal column plumbing. Naming: d* dedup, n* ANN, t* text,
  * m* multimodal (reserved in SparkEntry since round 1).
  *
  * Oracle policy: everything SQL-expressible has a DuckDB twin computing
  * bit-identical values (see Similarity's scaled-long cosine and Text's
  * md5-based SimHash). The two LSH paths (d2 band misses ~5e-8, so its
  * brute-force oracle still applies; n2 recall < 1 by design, so it is
  * rows-only here and recall-bounded in SimilaritySpec).
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** The family maps concatenate into the single surface SparkEntry
    * consumes — the r14 file split is layout only (PipelineDedup/Ann/
    * Media/Text each keep their oracle twins beside their queries).
    */
  val defs: Map[String, Q] =
    PipelineDedup.defs ++ PipelineAnn.defs ++
    PipelineMedia.defs ++ PipelineText.defs

  val oracles: Map[String, String] =
    PipelineDedup.oracles ++ PipelineAnn.oracles ++
    PipelineMedia.oracles ++ PipelineText.oracles
}
