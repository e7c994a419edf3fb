package graft.etl

import java.sql.{Date, Timestamp}

import graft.io.Sources
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed entity model (SURVEY.md §1.2): case classes + `Dataset[T]`
  * accessors for the core entities, for call sites where compile-time
  * column safety matters. The untyped `DataFrame` API remains the
  * transform-boundary form (schemas are dynamic there by design).
  *
  * Nullability follows the reference's validation contract: keys are
  * non-null (validated on extract), everything else `Option`al.
  */
object Model {

  final case class User(
      user_id: Int,
      user_name: Option[String],
      user_age: Option[Int],
      user_country: Option[String],
      created_at: Option[Date])

  final case class Song(
      id: Int,
      track_id: String,
      artists: Option[String],
      album_name: Option[String],
      track_name: Option[String],
      popularity: Option[Int],
      duration_ms: Option[Int],
      explicit: Option[Boolean],
      danceability: Option[Double],
      energy: Option[Double],
      song_key: Option[Int],
      loudness: Option[Double],
      mode: Option[Int],
      speechiness: Option[Double],
      acousticness: Option[Double],
      instrumentalness: Option[Double],
      liveness: Option[Double],
      valence: Option[Double],
      tempo: Option[Double],
      time_signature: Option[Int],
      track_genre: Option[String])

  final case class StreamEvent(
      user_id: Option[Int],
      track_id: Option[String],
      listen_time: Option[Timestamp])

  final case class GenreKpi(
      track_genre: Option[String],
      date: Option[Date],
      listen_count: Long,
      avg_duration: Option[Double],
      most_popular_track: Option[String])

  final case class HourlyKpi(
      hour: Option[Int],
      unique_listeners: Long,
      top_artists: Option[Seq[String]],
      track_diversity_index: Option[Double])

  def users(spark: SparkSession, path: String): Dataset[User] = {
    import spark.implicits._
    Sources.users(spark, path).as[User]
  }

  def songs(spark: SparkSession, path: String): Dataset[Song] = {
    import spark.implicits._
    Sources.songs(spark, path).as[Song]
  }

  def streams(spark: SparkSession, paths: String*): Dataset[StreamEvent] = {
    import spark.implicits._
    Sources.streams(spark, paths: _*).as[StreamEvent]
  }

  /** Typed views of the KPI outputs (column names must match the
    * MusicKpis call-site aliases, which they do by construction in
    * [[MusicPipeline]]). */
  def genreKpis(df: org.apache.spark.sql.DataFrame)(implicit spark: SparkSession): Dataset[GenreKpi] = {
    import spark.implicits._
    df.select("track_genre", "date", "listen_count", "avg_duration", "most_popular_track")
      .as[GenreKpi]
  }

  def hourlyKpis(df: org.apache.spark.sql.DataFrame)(implicit spark: SparkSession): Dataset[HourlyKpi] = {
    import spark.implicits._
    df.select("hour", "unique_listeners", "top_artists", "track_diversity_index")
      .as[HourlyKpi]
  }
}
