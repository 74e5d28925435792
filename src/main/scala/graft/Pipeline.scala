package graft

import graft.model.{EngineConfig, Share}
import graft.operators.{Dedup, FeatureProjection}
import graft.sinks.FeatureCollectionSink
import graft.sources.InReachSource
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.time.Instant

/** The end-to-end reference pipeline, Spark-first (SURVEY.md §3.4):
  *
  *   share config → parallel KML source scan (lookback pushed down)
  *   → wide projection → latest-per-device dedup → FeatureCollection
  *
  * The union across feeds (`task.ts:177-180`) is implicit — feeds are
  * partitions of one Dataset, so there is no explicit union node. The
  * dedup is global post-union rather than per-feed; since the key
  * embeds the globally-unique IMEI this is semantically equivalent
  * and strictly more correct (SURVEY.md §2.4 scope note).
  */
object Pipeline {

  /** Build the (lazy) features DataFrame. */
  def features(
      spark: SparkSession,
      config: EngineConfig,
      fetcher: InReachSource.Fetcher = InReachSource.httpFetcher,
      now: Instant = Instant.now()): DataFrame = {
    val raw = InReachSource.read(spark, config.shares, fetcher, now,
      debug = config.debug)
    val projected = FeatureProjection.project(raw)
    Dedup.latestPerKey(projected, Seq("id"), col("properties").getField("time"))
  }

  /** Full run: source → transform → dedup → submit (entry points A/B,
    * SURVEY.md §3.1-3.2). */
  def run(
      spark: SparkSession,
      config: EngineConfig,
      fetcher: InReachSource.Fetcher = InReachSource.httpFetcher,
      post: String => Unit,
      now: Instant = Instant.now()): Unit =
    FeatureCollectionSink.submit(features(spark, config, fetcher, now))(post)

  /** Schema/capabilities interrogation (entry point C, SURVEY.md
    * §3.3): machine-readable input/output schemas, the Spark analog
    * of the reference's Capabilities API (`task.ts:34-58`). */
  def capabilities: Map[String, String] = Map(
    "input" -> "INREACH_MAP_SHARES: array<struct<ShareId:string,CallSign:string?,Password:string?>>, DEBUG: boolean",
    "output" -> graft.model.Schemas.feature.json)
}
