package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.CorpusGen

/** Offline replacements for the reference's network enrichment lookups
  * (Dimensions/crosscite/abstract/SemanticScholar — SURVEY.md §2.1 rows
  * 6-10, §2.3 row 24): deterministic snapshot tables joined with
  * broadcast-hash LEFT joins (the reference returns None on a miss,
  * /root/reference/src/webscrapers.py:205-206 — left join preserves that).
  *
  * At 100 TB the snapshot side is the small one (an identifier-keyed
  * metadata service dump, ~10^8 rows max) — broadcast when it fits,
  * sort-merge on `doi` otherwise; the fact side never re-shuffles because
  * the join key is produced by the extraction stage itself.
  */
object Enrichment {

  /** Deterministic Dimensions-style snapshot for the synthetic corpus:
    * one row per docId that carries a DOI. Field shapes follow the
    * reference's DIMENSIONS_AI_KEYS remap
    * (/root/reference/src/config.py:107-117). */
  def dimensionsSnapshot(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, nDocs, 1, spark.sparkContext.defaultParallelism)
      .flatMap { id =>
        CorpusGen.doiFor(id).map { doi =>
          (doi,
            math.floorMod(scala.util.hashing.MurmurHash3.stringHash(doi), 500).toLong,
            s"Journal of d${CorpusGen.domainId(id)} Studies",
            s"pub.$id")
        }
      }
      .toDF("doi", "times_cited", "journal_title", "internal_id")
  }

  /** Left broadcast-hash enrichment of extracted docs on `doi`; misses
    * surface as nulls, then filled "N/A" like the reference's export
    * cleanup (/root/reference/src/serials.py:89-106). */
  def enrich(extracted: DataFrame, snapshot: DataFrame): DataFrame = {
    val joined = extracted.join(
      broadcast(snapshot), Seq("doi"), "left")
    Stagers.fillNA(joined, Seq("journal_title", "internal_id"))
  }
}
