package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups, values overlap across batches on purpose
  private def batch(r: Range) = r.map(i => (s"g${i % 3}", i % 500)).toDF("g", "v")

  test("estimate is within HLL error bounds of the exact distinct count") {
    val est = Sketches.withEstimate(
        Sketches.distinctSketch(batch(1 to 3000), Seq("g"), "v"))
      .select("g", "n_distinct_est").as[(String, Long)].collect().toMap
    val exact = batch(1 to 3000).groupBy("g").agg(countDistinct("v"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.1, s"group $g: est=${est(g)} exact=$n")
    }
  }

  test("merge law: merged batch sketches estimate the union within bounds") {
    // NOT exact equality: sparse→dense promotion points depend on the
    // merge path (see Sketches scaladoc); the guarantee is the error bound
    val whole = Sketches.withEstimate(
        Sketches.distinctSketch(batch(1 to 2000), Seq("g"), "v"))
      .select("g", "n_distinct_est").as[(String, Long)].collect().toMap
    val merged = Sketches.withEstimate(Sketches.mergeSketches(Seq(
        Sketches.distinctSketch(batch(1 to 900), Seq("g"), "v"),
        Sketches.distinctSketch(batch(700 to 2000), Seq("g"), "v")),
      Seq("g")))
      .select("g", "n_distinct_est").as[(String, Long)].collect().toMap
    val exact = batch(1 to 2000).groupBy("g").agg(countDistinct("v"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(merged(g) - n).toDouble / n < 0.1,
        s"merged $g: ${merged(g)} vs exact $n")
      assert(math.abs(merged(g) - whole(g)).toDouble / n < 0.1,
        s"merge-path drift $g: ${merged(g)} vs ${whole(g)}")
    }
  }

  test("quantile summary: rank error bounded vs exact percentiles, under any layout") {
    // per group: values are i % 500 → known distribution of ~1000 rows
    val df = batch(1 to 3000)
    val pcts = Seq(0.1, 0.5, 0.9)
    def ranks(g: String) = df.filter($"g" === g).select("v").as[Int].collect().sorted
    for (reparted <- Seq(df, df.repartition(7))) {
      val approx = Sketches.quantileSummary(reparted, Seq("g"), "v", pcts, accuracy = 1000)
        .select("g", "quantiles_approx").as[(String, Seq[Int])].collect().toMap
      for (g <- Seq("g0", "g1", "g2"); (p, got) <- pcts.zip(approx(g))) {
        val sorted = ranks(g)
        val n = sorted.length
        // rank of the returned value must be within n/accuracy + 1 of p*n
        val lo = sorted.indexWhere(_ >= got)
        val hi = sorted.lastIndexWhere(_ <= got) + 1
        val target = p * n
        val tol = n.toDouble / 1000 + 2
        assert(lo - tol <= target && target <= hi + tol,
          s"group $g p=$p: value $got has rank [$lo,$hi], target $target ± $tol")
      }
    }
  }

  test("count-min: overcount-only bound and EXACT merge/layout independence") {
    val df = batch(1 to 2000) // value i%500: each value ~4 occurrences
    val cms = Sketches.countMin(df, "v")
    val exact = df.groupBy("v").count().as[(Int, Long)].collect().toMap
    exact.foreach { case (v, n) =>
      val est = cms.estimateCount(v)
      assert(est >= n, s"CMS undercounted $v")       // never undercounts
      assert(est <= n + (0.001 * 2000).ceil.toLong + 1, s"$v: $est vs $n")
    }
    // counter matrices add elementwise → layout cannot change estimates
    val relaid = Sketches.countMin(df.repartition(13), "v")
    exact.keys.foreach(v =>
      assert(relaid.estimateCount(v) == cms.estimateCount(v)))
  }

  test("portable HLL: accuracy within ~3σ across cardinalities, layout-invariant") {
    // raw-regime cardinalities for p=8 (m=256, σ = 1.04/√m ≈ 6.5%)
    Seq(1000, 5000, 20000).foreach { n =>
      val df = (1 to n).map(i => s"v$i").toDF("v")
      val est = Sketches.portableDistinctEstimate(df, Seq.empty, "v", p = 8)
        .select("n_est").as[Long].head()
      val err = math.abs(est - n).toDouble / n
      assert(err < 0.20, s"n=$n est=$est err=$err")
      // registers are per-bucket maxima — layout cannot change the answer
      val est2 = Sketches.portableDistinctEstimate(df.repartition(13), Seq.empty, "v", p = 8)
        .select("n_est").as[Long].head()
      assert(est2 == est)
    }
    // duplicates never move the estimate: registers see values, not rows
    val dup = ((1 to 800) ++ (1 to 800)).map(i => s"v$i").toDF("v")
    val base = (1 to 800).map(i => s"v$i").toDF("v")
    def e(df: org.apache.spark.sql.DataFrame) =
      Sketches.portableDistinctEstimate(df, Seq.empty, "v", p = 8)
        .select("n_est").as[Long].head()
    assert(e(dup) == e(base))
  }

  test("histogram quantiles: EXACT merge law and layout independence") {
    val df = (1 to 4000).map(i => (s"g${i % 3}", (i * 37 % 1000) - 200.5)).toDF("g", "v")
    val keys = Seq("g")
    val ps = Seq("p50_lo" -> 500000L, "p90_lo" -> 900000L, "p99_lo" -> 990000L)
    def collect(q: org.apache.spark.sql.DataFrame) =
      q.as[(String, Long, Long, Long)].collect().toSet
    val whole = collect(Sketches.histogramQuantiles(df, keys, "v", 10L, ps))
    // partials over 3 disjoint slices, merged — EXACTLY the whole-input
    // answer (count addition is exact), unlike the GK/HLL tiers' bounds
    val slices = (0 until 3).map(d => df.filter(abs(hash(col("v"))) % 3 === d))
    val merged = collect(Sketches.quantilesFromHistogram(
      Sketches.mergeHistograms(
        slices.map(s => Sketches.histogramPartials(s, keys, "v", 10L)), keys),
      keys, 10L, ps))
    assert(merged == whole, "merged partials must equal the whole-input answer exactly")
    val relayout = collect(Sketches.histogramQuantiles(
      df.repartition(17, col("v")), keys, "v", 10L, ps))
    assert(relayout == whole, "layout must not change a single output bit")
  }

  test("histogram quantiles: lower edge within one bucket width of the exact percentile") {
    val vals = (1 to 5000).map(i => ((i * 97) % 3001) - 1000.25) // negatives included
    val df = vals.map(("g", _)).toDF("g", "v")
    val width = 25L
    val got = Sketches.histogramQuantiles(df, Seq("g"), "v", width,
        Seq("p50_lo" -> 500000L, "p90_lo" -> 900000L, "p99_lo" -> 990000L))
      .as[(String, Long, Long, Long)].collect().head
    val sorted = vals.sorted
    def exact(q: Double): Double = sorted((q * sorted.length).ceil.toInt - 1)
    for ((est, q) <- Seq(got._2 -> 0.5, got._3 -> 0.9, got._4 -> 0.99)) {
      val v = exact(q)
      // trunc-div bucketing widens the 0-straddling bucket, so the bound
      // is one width on each side of the bucket's edge
      assert(est - width <= v && v < est + width,
        s"q=$q: lower-edge $est vs exact $v (width $width)")
    }
  }

  test("DataSketches HLL round-trips through parquet bytes across snapshot days") {
    // the Incremental-style deployment: one sketch row per (key, day)
    // PERSISTED, later days merged via hll_union_agg over the stored bytes
    val dir = java.nio.file.Files.createTempDirectory("graft-hllrt").toString
    val days = Seq(1 to 1200, 800 to 2400, 2000 to 3600)
    days.zipWithIndex.foreach { case (r, d) =>
      Sketches.distinctSketch(batch(r), Seq("g"), "v")
        .write.mode("overwrite").parquet(s"$dir/day=$d")
    }
    val restored = (0 until days.length).map(d => spark.read.parquet(s"$dir/day=$d"))
    val est = Sketches.withEstimate(Sketches.mergeSketches(restored, Seq("g")))
      .select("g", "n_distinct_est").as[(String, Long)].collect().toMap
    val exactMap = days.map(r => batch(r)).reduce(_ unionByName _)
      .groupBy("g").agg(countDistinct("v")).as[(String, Long)].collect().toMap
    exactMap.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.1,
        s"round-tripped union $g: est=${est(g)} exact=$n")
    }
  }

  test("portable CMS: never undercounts, exact merge law, ε·N overcount bound") {
    // skewed stream: key k appears ~3000/k times (Zipf-ish), 60 keys
    val rows = (1 to 60).flatMap(k => Seq.fill(3000 / k)(s"k$k")).toDF("key")
    val depth = 4; val width = 64
    val exact = rows.groupBy("key").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val whole = Sketches.cmsPartials(rows, "key", depth, width)
    // merge law is EXACT: slice registers merged == whole-input registers
    val slices = (0 until 3).map(i =>
      Sketches.cmsPartials(
        rows.filter(pmod(xxhash64(col("key")), lit(3)) === i), "key", depth, width))
    val merged = Sketches.mergeCms(slices)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "merged slice registers must equal whole-input registers exactly")
    val cands = rows.select("key").distinct()
    val est = Sketches.cmsEstimate(merged, cands, "key", depth, width)
      .as[(String, Long)].collect().toMap
    val total = exact.values.sum
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS undercounted $k: ${est(k)} < $n")
      // ε = e/width; with depth=4 a 3× slack on the bound keeps the
      // deterministic-hash test stable while still catching a broken min
      assert(est(k) <= n + 3 * math.E / width * total,
        s"CMS overcount out of bound for $k: ${est(k)} vs $n (N=$total)")
    }
  }

  test("sketch estimates stay within bounds across partition layouts") {
    def run(parts: Int) = Sketches.withEstimate(
        Sketches.distinctSketch(batch(1 to 1500).repartition(parts), Seq("g"), "v"))
      .select("g", "n_distinct_est").as[(String, Long)].collect().toMap
    val exact = batch(1 to 1500).groupBy("g").agg(countDistinct("v"))
      .as[(String, Long)].collect().toMap
    Seq(run(2), run(11)).foreach(est => exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.1, s"$g: ${est(g)} vs $n")
    })
  }

  test("cmsInnerProduct estimates join size: never under, exact when collision-free") {
    val a = (1 to 50).flatMap(k => Seq.fill(k % 5 + 1)(("a", k.toLong)))
      .toDF("g", "v")
    val b = (25 to 75).flatMap(k => Seq.fill(k % 3 + 1)(("b", k.toLong)))
      .toDF("g", "v")
    val exact = a.groupBy("v").count().withColumnRenamed("count", "na")
      .join(b.groupBy("v").count().withColumnRenamed("count", "nb"), "v")
      .agg(sum(col("na") * col("nb"))).as[Long].head()
    def est(width: Int): Long = Sketches.cmsInnerProduct(
      Sketches.cmsPartials(a, "v", depth = 4, width = width),
      Sketches.cmsPartials(b, "v", depth = 4, width = width))
      .as[Long].head()
    val tight = est(4096) // width ≫ keys: collisions vanish, estimate exact
    assert(tight == exact, s"collision-free estimate $tight != exact $exact")
    val loose = est(8) // heavy collisions: still an OVERestimate, never under
    assert(loose >= exact, s"CMS join size must never underestimate ($loose < $exact)")
  }

  test("HLL register merge law: max-merged part registers equal the whole-input sketch") {
    val a = (1 to 500).map(v => Tuple1(v.toLong)).toDF("v")
    val b = (300 to 900).map(v => Tuple1(v.toLong)).toDF("v")
    val whole = (1 to 900).map(v => Tuple1(v.toLong)).toDF("v")
    val merged = Sketches.hllRegisters(a, Seq.empty, "v")
      .unionByName(Sketches.hllRegisters(b, Seq.empty, "v"))
      .groupBy("__b").agg(max(col("__m")).as("__m"))
    val est = Sketches.hllEstimate(merged, Seq.empty).as[Long].head()
    val direct = Sketches.portableDistinctEstimate(whole, Seq.empty, "v")
      .as[Long].head()
    assert(est == direct, s"merged $est != whole-input $direct (must be bit-identical)")
    assert(math.abs(est - 900.0) / 900.0 < 0.25, s"estimate $est implausible for 900")
  }

  test("kmvSketch keeps the k smallest distinct hashes per set, deterministically") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("a", 4L),
        ("b", 1L), ("b", 9L)).toDF("s", "v")
    val sk = Sketches.kmvSketch(df, "s", "v", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // per set: ≤ k rows, distinct hashes, and exactly the smallest ones
    val allHashes = Seq(1L, 2L, 3L, 4L).toDF("v")
      .select(graft.functions.PortableHash.hash60(col("v")))
      .as[Long].collect()
    val aHashes = sk.filter(_._1 == "a").map(_._2).toSet
    assert(aHashes == allHashes.sorted.take(3).toSet)
    assert(sk.count(_._1 == "b") == 2) // fewer values than k → whole set
  }

  test("KMV Jaccard estimate is exact when sketches hold the whole sets") {
    // k larger than any set: the sketch IS the set, so n_both/n_sketch
    // must equal the true Jaccard of the hash-distinct sets
    val df = (1 to 20).map(v => ("x", v.toLong)) ++
      (11 to 30).map(v => ("y", v.toLong)) ++ (1 to 5).map(v => ("z", v.toLong))
    val sk = Sketches.kmvSketch(df.toDF("s", "v"), "s", "v", k = 64)
    val out = Sketches.kmvJaccardPairs(sk, "s", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // |x∩y|=10, |x∪y|=30; |x∩z|=5, |x∪z|=20; |y∩z|=0, |y∪z|=25
    assert(out(("x", "y")) == ((30L, 10L, 333333L)))
    assert(out(("x", "z")) == ((20L, 5L, 250000L)))
    assert(out(("y", "z")) == ((25L, 0L, 0L)))
  }

  test("kmvJaccardPairs gates oversized set domains before collecting") {
    val many = (1 to 30).map(i => (s"set$i", i.toLong)).toDF("s", "v")
    val sk = Sketches.kmvSketch(many, "s", "v", k = 4)
    val e = intercept[IllegalArgumentException] {
      Sketches.kmvJaccardPairs(sk, "s", k = 4, maxSets = 10).collect()
    }
    assert(e.getMessage.contains("pair domain"))
  }

  test("KMV sketches merge: union sketch from parts equals whole-input sketch") {
    val part1 = (1 to 40).map(v => ("u", v.toLong)).toDF("s", "v")
    val part2 = (25 to 60).map(v => ("u", v.toLong)).toDF("s", "v")
    val whole = (1 to 60).map(v => ("u", v.toLong)).toDF("s", "v")
    val k = 8
    // merge = k smallest distinct hashes of the two sketches' union
    val direct = Sketches.kmvSketch(part1, "s", "v", k)
      .unionByName(Sketches.kmvSketch(part2, "s", "v", k))
      .distinct().orderBy(col("__h")).limit(k)
      .select("__h").as[Long].collect().toSet
    val wholeSk = Sketches.kmvSketch(whole, "s", "v", k)
      .select("__h").as[Long].collect().toSet
    assert(direct == wholeSk)
  }
}
