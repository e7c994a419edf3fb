package graft.operators

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0)
  ).toDF("id", "name", "bal")

  // key 1: updated twice (v2 wins); key 2: deleted; key 4: fresh insert;
  // key 3: untouched
  private def changes = Seq(
    (1L, "alice2", 11.0, 1L, "u"),
    (1L, "alice3", 12.0, 2L, "u"),
    (2L, "bob", 0.0, 3L, "d"),
    (4L, "dave", 40.0, 4L, "u")
  ).toDF("id", "name", "bal", "version", "op")

  test("applyChanges: latest upsert wins, deletes remove, inserts appear, untouched survive") {
    val out = Cdc.applyChanges(base, changes, Seq("id"), "version", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set(
      (1L, "alice3", 12.0),
      (3L, "carol", 30.0),
      (4L, "dave", 40.0)))
  }

  test("a delete newer than an upsert removes the key; older delete loses") {
    val ch = Seq(
      (1L, "x", 1.0, 5L, "u"), (1L, "y", 2.0, 6L, "d"),   // delete is newest → gone
      (3L, "z", 3.0, 1L, "d"), (3L, "w", 4.0, 2L, "u")    // upsert is newest → wins
    ).toDF("id", "name", "bal", "version", "op")
    val out = Cdc.applyChanges(base, ch, Seq("id"), "version", "op")
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((2L, "bob", 20.0), (3L, "w", 4.0)))
  }

  test("missing changelog columns are rejected") {
    val bad = intercept[IllegalArgumentException] {
      Cdc.applyChanges(base, changes.drop("name"), Seq("id"), "version", "op")
    }
    assert(bad.getMessage.contains("name"))
  }

  test("scd2History builds closed intervals, deletes close but emit nothing") {
    val ch = Seq(
      (1L, "a", 1.0, 10L, "u"), (1L, "b", 2.0, 20L, "u"), (1L, "c", 3.0, 30L, "d"),
      (2L, "x", 5.0, 15L, "u")
    ).toDF("id", "name", "bal", "version", "op")
    val out = Cdc.scd2History(ch, Seq("id"), "version", "op")
      .select("id", "name", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, "a", 10L, Some(20L), false),
      (1L, "b", 20L, Some(30L), false), // closed by the delete tombstone
      (2L, "x", 15L, None, true)))
  }

  test("scd2History current rows agree with applyChanges over an empty base") {
    val empty = base.limit(0)
    val snapshot = Cdc.applyChanges(empty, changes, Seq("id"), "version", "op")
      .collect().map(_.toSeq).toSet
    val current = Cdc.scd2History(changes, Seq("id"), "version", "op")
      .filter($"is_current").select("id", "name", "bal")
      .collect().map(_.toSeq).toSet
    assert(current == snapshot)
  }

  test("idempotent: applying the same changelog twice yields the same snapshot") {
    val once = Cdc.applyChanges(base, changes, Seq("id"), "version", "op")
    val twice = Cdc.applyChanges(once, changes, Seq("id"), "version", "op")
    assert(once.collect().map(_.toString).sorted.toSeq ==
      twice.collect().map(_.toString).sorted.toSeq)
  }
}
