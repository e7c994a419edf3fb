package graft.etl

import graft.SparkSpec
import graft.pipeline.PipelineFailure
import java.nio.file.{Files, Path}

/** File-to-file e2e over CSV fixtures mirroring the reference's
  * users/songs/streams shapes. */
class MusicPipelineSpec extends SparkSpec {

  private def writeFixtures(dir: Path, badStreams: Boolean = false): PipelineConfig = {
    Files.writeString(dir.resolve("users.csv"),
      """user_id,user_name,user_age,user_country,created_at
        |1,Alice,30,US,2024-01-01
        |2,Bob,25,FR,2024-01-02
        |3,Cara,41,DE,2024-01-03
        |""".stripMargin)
    val songCols = "id,track_id,artists,album_name,track_name,popularity,duration_ms,explicit," +
      "danceability,energy,song_key,loudness,mode,speechiness,acousticness,instrumentalness," +
      "liveness,valence,tempo,time_signature,track_genre"
    Files.writeString(dir.resolve("songs.csv"),
      s"""$songCols
         |1,t1,Artist 1,Alb,Song A,50,200000,false,0.5,0.5,1,-5.0,1,0.1,0.1,0.0,0.1,0.5,120.0,4,rock
         |2,t2,Artist 2,Alb,Song B,40,100000,false,0.5,0.5,1,-5.0,1,0.1,0.1,0.0,0.1,0.5,120.0,4,rock
         |3,t3,Artist 1,Alb,Song C,30,300000,true,0.5,0.5,1,-5.0,1,0.1,0.1,0.0,0.1,0.5,120.0,4,jazz
         |""".stripMargin)
    val streamRows =
      if (badStreams)
        """user_id,track_id,listen_time
          |1,t1,
          |""".stripMargin
      else
        """user_id,track_id,listen_time
          |1,t1,2024-06-25T10:00:00.000Z
          |1,t1,2024-06-25T10:30:00.000Z
          |2,t2,2024-06-25T10:45:00.000Z
          |2,t3,2024-06-25T11:05:00.000Z
          |""".stripMargin
    Files.writeString(dir.resolve("streams1.csv"), streamRows)
    PipelineConfig(
      usersPath = dir.resolve("users.csv").toString,
      songsPath = dir.resolve("songs.csv").toString,
      streamsGlob = dir.resolve("streams*.csv").toString,
      genreKpisOut = dir.resolve("genre_kpis").toString,
      hourlyKpisOut = dir.resolve("hourly_kpis").toString,
      topK = 2, retries = 0)
  }

  test("pipeline runs file-to-file and writes both KPI tables") {
    val dir = Files.createTempDirectory("graft-pipe")
    val cfg = writeFixtures(dir)
    MusicPipeline.run(spark, cfg)

    val genre = spark.read.option("header", "true").csv(cfg.genreKpisOut)
    val g = genre.collect().map(r =>
      r.getAs[String]("track_genre") -> (r.getAs[String]("listen_count"),
        r.getAs[String]("most_popular_track"))).toMap
    assert(g("rock") == (("3", "Song A")))
    assert(g("jazz") == (("1", "Song C")))

    val hourly = spark.read.option("header", "true").csv(cfg.hourlyKpisOut)
    val h = hourly.collect().map(r =>
      r.getAs[String]("hour") -> r.getAs[String]("top_artists")).toMap
    assert(h("10") == "Artist 1,Artist 2")
  }

  test("pipeline fails with named stage when validation trips") {
    val dir = Files.createTempDirectory("graft-pipe-bad")
    val cfg = writeFixtures(dir, badStreams = true)
    val e = intercept[PipelineFailure](MusicPipeline.run(spark, cfg))
    assert(e.stage == "validate_data")
    assert(e.getCause.getMessage.contains("no_nulls"))
  }
}
