package graft.etl

import graft.SparkSpec
import java.nio.file.Files

class ModelSpec extends SparkSpec {

  test("typed sources round-trip through case-class encoders") {
    val dir = Files.createTempDirectory("graft-model")
    Files.writeString(dir.resolve("users.csv"),
      """user_id,user_name,user_age,user_country,created_at
        |1,Alice,30,US,2024-01-01
        |2,,,,
        |""".stripMargin)
    val users = Model.users(spark, dir.resolve("users.csv").toString).collect()
    assert(users.length == 2)
    val u2 = users.find(_.user_id == 2).get
    assert(u2.user_name.isEmpty && u2.user_age.isEmpty && u2.created_at.isEmpty)
    assert(users.find(_.user_id == 1).get.user_country.contains("US"))
  }

  test("KPI outputs lift into typed datasets") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val streams = Seq(
      (1, "t1", java.sql.Timestamp.valueOf("2024-06-25 10:00:00")))
      .toDF("user_id", "track_id", "listen_time")
    val songs = Seq(("t1", "rock", 200.0, "Song A", "Artist 1"))
      .toDF("track_id", "track_genre", "duration_ms", "track_name", "artists")
    val users = Seq((1, "US")).toDF("user_id", "user_country")
    val enriched = MusicKpis.enrich(streams, songs, "track_id", users, "user_id", "listen_time")
    val genre = Model.genreKpis(MusicKpis.genreKpis(enriched,
      "track_genre", "track_id", "duration_ms", "track_name", "most_popular_track"))
    val g = genre.collect().head
    assert(g.track_genre.contains("rock") && g.listen_count == 1)
    assert(g.most_popular_track.contains("Song A"))
    val hourly = Model.hourlyKpis(MusicKpis.hourlyKpis(enriched,
      "user_id", "artists", "track_id"))
    val h = hourly.collect().head
    assert(h.hour.contains(10) && h.unique_listeners == 1)
    assert(h.top_artists.exists(_ == Seq("Artist 1")))
  }
}
