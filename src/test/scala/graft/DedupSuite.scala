package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextAnalysis => TA}

class DedupSuite extends SparkFunSuite {

  private lazy val docs = spark.read.parquet(s"${SparkTestBase.sf0001}/documents.parquet")
    .select(col("doc_id").as("id"), col("text"))
  private lazy val small = docs.filter(col("id") % 10 === 0)
  /** originals + verbatim copies + 80%-prefix near-dups */
  private lazy val corpus = small
    .unionByName(small.select((col("id") + 1000).as("id"), col("text")))
    .unionByName(small.select((col("id") + 2000).as("id"),
      expr("substr(text, 1, CAST(floor(length(text) * 4 / 5) AS INT))").as("text")))

  test("exact dedup finds exactly the verbatim copies") {
    val dups = Dedup.exactDupGroups(corpus, "id", "text", onlyDups = true).collect()
    assert(dups.length == small.count())
    assert(dups.forall(_.getAs[Long]("n") == 2)) // original + verbatim copy
    assert(dups.forall(_.getAs[Long]("keeper") < 1000)) // keeper = original id
  }

  test("jaccard pairs: identical docs at 1.0, prefix copies high, found") {
    val pairs = Dedup.jaccardPairs(corpus, "id", "text", n = 8, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = pairs.filter { case (a, b, _) => a < 1000 && b == a + 1000 }
    assert(exact.length == small.count())
    assert(exact.forall(_._3 == 1.0))
    val prefix = pairs.filter { case (a, b, _) => a < 1000 && b == a + 2000 }
    assert(prefix.length == small.count())
    assert(prefix.forall(p => p._3 > 0.5 && p._3 <= 1.0))
  }

  test("minhash LSH finds the same high-jaccard pairs as the exact join") {
    val lsh = Dedup.minhashLshPairs(corpus, "id", "text",
        n = 8, numHashes = 16, bandRows = 4, minJaccard = 0.5)
      .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(corpus, "id", "text", n = 8, minJaccard = 0.5)
      .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH output is a subset (banding may miss) but must catch every exact copy
    assert(lsh.subsetOf(exact))
    val exactCopies = exact.filter { case (a, b) => a < 1000 && b == a + 1000 }
    assert(exactCopies.subsetOf(lsh), "LSH missed identical documents")
    // and high recall on the near-dups at these parameters
    assert(lsh.size >= (exact.size * 0.8).toInt, s"lsh ${lsh.size} of ${exact.size}")
  }

  test("LSH hot-bucket cap drops boilerplate buckets, keeps normal pairs") {
    // 30 identical boilerplate docs share every band key -> one quadratic
    // hot bucket per band; the cap must drop them without touching the
    // rest of the corpus
    val boiler = spark.range(5000, 5030).select(col("id"),
      lit("the same boilerplate footer text repeated on every single page").as("text"))
    val corpus2 = corpus.unionByName(boiler)
    def run(): Set[(Long, Long)] =
      Dedup.minhashLshPairs(corpus2, "id", "text",
          n = 8, numHashes = 16, bandRows = 4, minJaccard = 0.5)
        .select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = run()
    assert(uncapped.count { case (a, b) => a >= 5000 && b >= 5000 } == 30 * 29 / 2)
    spark.conf.set("spark.graft.lsh.bucketCap", "10")
    try {
      val capped = run()
      assert(!capped.exists { case (a, b) => a >= 5000 && b >= 5000 },
        "boilerplate bucket not dropped")
      // every non-boilerplate pair survives the cap untouched
      assert(capped == uncapped.filterNot { case (a, b) => a >= 5000 && b >= 5000 })
    } finally spark.conf.unset("spark.graft.lsh.bucketCap")
  }

  test("simhash: identical docs collide, near-dups within small hamming") {
    val sk = Dedup.simhash(corpus, "id", "text", n = 8)
    val pairs = Dedup.simhashPairs(sk, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.filter { case (a, b, _) => a < 1000 && b == a + 1000 }
    assert(exact.length == small.count())
    assert(exact.forall(_._3 == 0))
    assert(pairs.exists { case (a, b, h) => b == a + 2000 && h <= 6 })
  }

  test("jaccard df cut: a universal boilerplate shingle never reaches the join") {
    // every doc = one shared 8-char block + a unique tail; the shared
    // shingle has df = 100%, so the default cut (maxDfFrac = 0.5) drops it
    // from every signature and the docs share nothing — on BOTH routes.
    // With the cut off the same corpus pairs quadratically.
    import spark.implicits._
    // tails repeat one per-doc-unique character so no shingle other than
    // the boilerplate block is ever shared across docs
    val boilerDocs = (0 until 40).map { i =>
      (i.toLong, "COMMONXX" + ('A' + i).toChar.toString * 16)
    }.toDF("id", "text")
    def run(frac: Double): Long =
      Dedup.jaccardPairs(boilerDocs, "id", "text", n = 8,
        minJaccard = 0.01, maxDfFrac = frac).count()
    for (route <- Seq("true", "false")) {
      spark.conf.set("spark.graft.localKernel.enabled", route)
      try {
        assert(run(0.5) == 0L, s"df cut failed on localKernel=$route")
        assert(run(1.0) == 40L * 39 / 2, s"uncut baseline wrong on localKernel=$route")
      } finally spark.conf.set("spark.graft.localKernel.enabled", "true")
    }
  }

  test("simhash hot-bucket recursion is lossless on a pathological sketch corpus") {
    import spark.implicits._
    // 50 identical sketches (whose pairs are pure output, no banding) +
    // 30 distinct sketches all sharing band 0's key (a hot bucket of
    // distinct values at cap 10) + a pair (x, y) at hamming exactly 6
    // that agrees ONLY on band 0. A lossy cap would drop (x, y); the
    // recursive sub-band split must keep it.
    val s0 = 0L
    val x = (9 to 30).map(1L << _).reduce(_ | _)
    val y = x ^ Seq(10, 19, 28, 37, 46, 55).map(1L << _).reduce(_ | _)
    val sketches = ((0 until 50).map(i => (i.toLong, s0)) ++
      (1 to 30).map(j => (200L + j, j.toLong << 9)) :+ (100L, x) :+ (101L, y))
      .toDF("id", "simhash")
    val all = sketches.as[(Long, Long)].collect()
    val expected = (for {
      (a, ha) <- all; (b, hb) <- all if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 6
    } yield (a, b, h)).toSet
    assert(expected.contains((100L, 101L, 6)))
    spark.conf.set("spark.graft.simhash.bucketCap", "10")
    try {
      val got = Dedup.simhashPairs(sketches, maxHamming = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    } finally spark.conf.unset("spark.graft.simhash.bucketCap")
  }

  test("text stats: sane ranges on real documents") {
    val stats = docs.select(
      TA.tokenCount(col("text")).as("nt"),
      TA.alphaRatio(col("text")).as("ar"),
      TA.qualityScore(col("text")).as("q"),
      TA.positionalFingerprint(col("text")).as("fp"),
      TA.rollingFingerprint(col("text")).as("rfp"))
    assert(stats.filter(col("nt") <= 0).count() == 0)
    assert(stats.filter(col("ar") < 0 || col("ar") > 1).count() == 0)
    assert(stats.filter(col("q") < 0 || col("q") > 1).count() == 0)
    // fingerprints: deterministic and (near-)unique on distinct texts
    assert(stats.select(countDistinct(col("fp"))).head().getLong(0) >= docs.count() - 2)
    assert(stats.select(countDistinct(col("rfp"))).head().getLong(0) >= docs.count() - 2)
  }

  test("langId: real phrases route to the right language") {
    import spark.implicits._
    val samples = Seq(
      ("the cat is in the house and it is warm", "en"),
      ("der hund ist nicht das problem und die katze", "de"),
      ("el perro es un animal y los gatos", "es"),
      ("le chat est dans les maisons pour vous", "fr"),
      ("zzz qqq xxx", "und")).toDF("text", "expected")
    val got = samples.withColumn("pred", TA.langId(col("text")))
      .filter(col("pred") =!= col("expected")).count()
    assert(got == 0)
  }
}
