package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.operators.{Dedup, TextAnalysis}

class DedupTextSpec extends AnyFunSuite {
  import TestSpark._

  test("minhash-LSH candidates recover every exact near-dup pair") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.ngramJaccardPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH missed ${exact.diff(lsh)}")
  }

  test("simhash recovers most planted near-dups (it hashes token bags, not order)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val pairs = Dedup.simhashPairs(docs, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty)
    val planted = Dedup.ngramJaccardPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // word-level edits flip several bits, so recall < 1; the operator
    // contract is deterministic majority recall with few extras
    assert(pairs.intersect(planted).size * 2 >= planted.size,
      s"recall ${pairs.intersect(planted).size}/${planted.size}")
    val again = Dedup.simhashPairs(docs, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == pairs)
  }

  test("d02 df-cap bounds candidates on a boilerplate-skewed corpus") {
    import spark.implicits._
    // 80 docs all sharing one boilerplate 3-gram; docs 0 and 1 are
    // true near-dups (identical text), the rest are unique
    val docs = (0 until 80).map { i =>
      val uniq = if (i <= 1) "dup dup dup dup" else s"u$i v$i w$i x$i"
      (i.toLong, s"common boiler plate $uniq")
    }.toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    // capped: the df=80 boilerplate shingle is dropped, so candidates
    // are only pairs sharing rare shingles — the one duplicate pair —
    // not the 80*79/2 pairs the hot shingle would generate
    val capped = Dedup.ngramCandidates(sh, maxDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((0L, 1L)), s"got $capped")
    // and the end-to-end result still finds exactly the true pair
    val pairs = Dedup.ngramJaccardPairs(docs, 0.8, maxDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("t08 cross-overlap matches set intersection, eval side broadcast") {
    import spark.implicits._
    // eval doc 0; doc 1 copies a run of eval text (contaminated);
    // doc 2 is clean
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "intro words alpha beta gamma delta epsilon outro"),
      (2L, "totally different content with no overlap at all")
    ).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    val got = Dedup.crossOverlap(sh, col("doc_id") === 0, minShared = 2L)
    // doc1 shares 3-grams: "alpha beta gamma","beta gamma delta",
    // "gamma delta epsilon" = 3; doc2 shares none
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet == Set((1L, 0L, 3L)))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval side not broadcast:\n$plan")
  }

  test("t09 repetition stats on a known-repetitive doc") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a b"), // bigrams: ab,ba,ab,ba,ab -> top (a b,3), all dup
      (1L, "x y z w")      // 3 distinct bigrams, none repeated
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionStats(docs).orderBy("doc_id").collect()
    val r0 = rows(0)
    assert(r0.getLong(1) == 5L)                 // n_bigrams
    assert(r0.getString(2) == "a b")            // top_bigram
    assert(r0.getLong(3) == 3L)                 // top_bigram_n
    assert(r0.getDouble(5) == 1.0)              // dup_bigram_frac
    val r1 = rows(1)
    assert(r1.getLong(1) == 3L && r1.getLong(3) == 1L &&
      r1.getDouble(5) == 0.0)
  }

  test("t10 stratified sample: deterministic, rate-correct, no window") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val s1 = TextAnalysis.stratifiedSample(docs, "lang")
    val rows = s1.collect()
    assert(rows.nonEmpty)
    // deterministic rerun
    assert(TextAnalysis.stratifiedSample(docs, "lang").collect().toSeq ==
      rows.toSeq)
    // every stratum's kept count is <= its rate bound in expectation;
    // hard property: every kept row satisfies the hash threshold
    rows.foreach { r =>
      val h = (r.getLong(0) * 2654435761L + 1013904223L) % 1000000007L % 10000L
      assert(h < r.getLong(2), s"row $r violates its rate")
    }
    // the smallest stratum keeps ~everything (rate 10000 bp)
    assert(rows.map(_.getLong(2)).max == 10000L)
    // scan-local selection: no Window/Sort funneling strata through
    // single tasks
    val plan = s1.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("d07 survivors: one per cluster, a member, member count right") {
    val sf01 = "/root/testdata/sf0.01"
    val surv = SparkEntry.queries("d07_dedup_survivors")(spark, sf01).collect()
    val members = SparkEntry.queries("d06_dedup_clusters")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(surv.length == members.size)
    surv.foreach { r =>
      val (c, sv, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(members(c).contains(sv), s"survivor $sv not in cluster $c")
      assert(members(c).size.toLong == n)
    }
  }

  test("p01 pipeline: every stage's drop rule holds on the survivors") {
    val out = SparkEntry.queries("p01_pipeline")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    // eval split excluded
    assert(ids.forall(_ % 50 != 0))
    // quality gate holds
    assert(rows.forall(_.getDouble(2) >= graft.queries.TextQueries.P01QualityTau))
    // no kept doc is a dropped near-dup cluster member: kept set is
    // disjoint from (members minus survivors)
    val surv = SparkEntry.queries("d07_dedup_survivors")(spark, sf)
      .collect().map(_.getLong(1)).toSet
    val members = SparkEntry.queries("d06_dedup_clusters")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val dropped = members -- surv
    assert(ids.forall(id => !dropped.contains(id)))
  }

  test("q41 hybrid fusion: candidates from the legs, dual hits outrank") {
    val out = SparkEntry.queries("q41_hybrid_search")(spark, sf)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length == 5)
    val bm = SparkEntry.queries("t06_bm25")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val cs = SparkEntry.queries("e03_embed_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // every fused hit came from at least one leg
    rows.foreach { case (q, _, n) => assert(bm((q, n)) || cs((q, n))) }
    // where a dual candidate EXISTS, rank-1 must be one (two RRF
    // terms beat one: worst dual 1/70+1/70 > best single 1/61);
    // held-out queries can have disjoint leg lists, where any
    // single-leg rank-1 is legitimate
    val dualQueries = (bm intersect cs).map(_._1)
    rows.filter(_._2 == 1L).filter(r => dualQueries(r._1))
      .foreach { case (q, _, n) =>
        assert(bm((q, n)) && cs((q, n)), s"rank-1 ($q,$n) not a dual hit") }
    assert(dualQueries.nonEmpty, "no query has any dual-leg candidate")
    // fused list is not just one leg truncated
    val bmTop = SparkEntry.queries("t06_bm25")(spark, sf)
      .filter(col("rank") <= graft.queries.TextQueries.HybridK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet != bmTop.toSet)
  }

  test("d05 blocked join: exact pairs, no cartesian/BNLJ in the plan") {
    import graft.functions._
    val emb = Tables.embeddings(spark, sf)
    val got = Dedup.embeddingNearDups(emb, 0.45)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
    val expected = {
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.crossJoin(b)
        .filter(col("id_a") < col("id_b") &&
          vec_cosine_sim(col("va"), col("vb")) >= 0.45)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val gotSet = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSet == expected,
      s"missing=${expected.diff(gotSet)} extra=${gotSet.diff(expected)}")
  }

  test("LSH near-dup variant: full recall at high tau, no cartesian") {
    import spark.implicits._
    import graft.operators.LshRhp
    // 200 base vectors + 20 planted near-dups at cos ~0.999
    val rng = new scala.util.Random(21)
    def vec() = Array.fill(32)(rng.nextGaussian().toFloat)
    val base = (0 until 200).map(i => (i.toLong, vec()))
    val dups = base.take(20).map { case (i, v) =>
      (i + 1000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val model = LshRhp.train(dim = 32, nTables = 8, nBits = 8, seed = 5)
    val got = Dedup.embeddingNearDupsLsh(emb, 0.95, model)
    assert(!got.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val gotSet = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.embeddingNearDups(emb, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 20) // the planted pairs qualify
    assert(gotSet == exact, // precision 1.0 by construction; recall 1.0
      s"missed=${exact.diff(gotSet)} extra=${gotSet.diff(exact)}")
  }

  test("d06 components: chains collapse transitively, islands stay apart") {
    import spark.implicits._
    // a-b-c chain (a~b, b~c but NOT a~c), a separate pair, a 4-cycle
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 20L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("d06 components of an empty pair set is empty") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(pairs).count() == 0)
  }

  test("driver-resident union-find == distributed label propagation") {
    import spark.implicits._
    // a shape with a long chain (many propagation rounds), a cycle,
    // reversed-order edges and a duplicate edge
    val pairs = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (1L, 0L),
      (30L, 31L), (31L, 30L), (40L, 41L), (41L, 42L), (42L, 40L),
      (40L, 41L)).toDF("doc_a", "doc_b")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = norm(Dedup.connectedComponents(pairs))
    val dist = norm(Dedup.connectedComponents(pairs, localRows = 0L))
    assert(local == dist, s"local $local != distributed $dist")
  }

  test("piiScrub redacts planted PII and counts it, leaves clean text alone") {
    import spark.implicits._
    val docs = Seq(
      (0L, "mail me at a.b-c+x@sub.example.org or 555-123-4567 id 123-45-6789"),
      (1L, "no pii here just words")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[String]("scrubbed") ==
      "mail me at <EMAIL> or <PHONE> id <ID>")
    assert((got(0L).getAs[Long]("n_emails"), got(0L).getAs[Long]("n_phones"),
      got(0L).getAs[Long]("n_ids")) == ((1L, 1L, 1L)))
    assert(got(1L).getAs[String]("scrubbed") == "no pii here just words")
    assert(got(1L).getAs[Long]("n_emails") == 0L)
  }

  test("simhashPairs refuses maxDist the banding cannot guarantee") {
    val docs = Tables.documents(spark, sf)
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, maxDist = 4)
    }
  }

  test("text_fingerprint matches a hand-rolled reference") {
    import spark.implicits._
    val s = "abc"
    val expected = s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)
    val got = Seq(s).toDF("text")
      .select(text_fingerprint(col("text"))).head().getLong(0)
    assert(got == expected)
  }

  test("byte_sum counts unsigned bytes") {
    import spark.implicits._
    val got = Seq("abc").toDF("t")
      .select(byte_sum(encode(col("t"), "UTF-8"))).head().getLong(0)
    assert(got == 'a'.toInt + 'b'.toInt + 'c'.toInt)
  }

  test("exact dedup keeps one row per distinct text") {
    val docs = Tables.documents(spark, sf)
    val n = Dedup.exact(docs).count()
    assert(n == docs.select("text").distinct().count())
  }

  test("tfidf ranks are dense 1..3 per doc") {
    val out = TextAnalysis.tfidfTopTerms(Tables.documents(spark, sf))
    val byDoc = out.groupBy("doc_id").agg(collect_list("rank").as("rs"))
      .select("rs").collect()
    byDoc.foreach(r =>
      assert(r.getSeq[Long](0).sorted == Seq(1L, 2L, 3L)))
  }

  test("t11 two-level prefix sum equals the single-window cumsum") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    // test-only global window — the thing the operator must NEVER do
    val tc = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = tc
      .withColumn("tok_start", coalesce(sum("n_tok").over(w), lit(0L)))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // BOTH prefix-sum paths must reproduce it: nBuckets=7 collects the
    // bucket totals on the driver; nBuckets=8192 (> DriverPrefixBuckets)
    // goes two-level — superbucket driver prefix + per-superbucket
    // windows + a shuffle join of the offsets
    assert(8192 > TextAnalysis.DriverPrefixBuckets)
    Seq(7, 8192).foreach { nb =>
      val got = TextAnalysis
        .sequencePack(docs, seqLen = 64L, nBuckets = nb).collect()
      assert(got.length == expected.size, s"nBuckets=$nb row count")
      got.foreach { r =>
        val (nTok, tokStart) = expected(r.getAs[Long]("doc_id"))
        assert(r.getAs[Long]("n_tok") == nTok, s"nBuckets=$nb")
        assert(r.getAs[Long]("tok_start") == tokStart, s"nBuckets=$nb")
        assert(r.getAs[Long]("seq_first") == tokStart / 64L)
        assert(r.getAs[Long]("seq_last") == (tokStart + nTok - 1) / 64L)
      }
    }
  }

  test("t12 domain mix: sqrt targets hit exactly, copy indexes dense") {
    val docs = Tables.documents(spark, sf)
    val mixed = TextAnalysis.domainMix(docs, "lang")
    val nS = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMax = nS.values.max
    // expected copies per doc, computed independently of the operator
    val perDoc = docs.select("doc_id", "lang").collect().map { r =>
      val (id, lang) = (r.getLong(0), r.getString(1))
      val ts = math.floor(math.sqrt(nS(lang).toDouble * nMax.toDouble)).toLong
      val base = ts / nS(lang)
      val remBp = 10000L * (ts % nS(lang)) / nS(lang)
      val bucket = ((id * 2654435761L + 1013904223L) % 1000000007L) % 10000L
      (id, base + (if (bucket < remBp) 1L else 0L))
    }.toMap
    val got = mixed.groupBy("doc_id").agg(
      count(lit(1)).as("n"), collect_list("copy").as("cs")).collect()
    assert(got.map(_.getAs[Long]("n")).sum == perDoc.values.sum)
    got.foreach { r =>
      val copies = perDoc(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n") == copies)
      assert(r.getSeq[Long](2).sorted == (0L until copies))
    }
    // mixing only ever UPsamples: every stratum at least its own size
    assert(perDoc.values.sum >= docs.count())
  }
}

class SegmentDedupSpec extends AnyFunSuite {
  import TestSpark._

  test("d09 flags corpus-frequent segments and rebuilds cleaned text") {
    import spark.implicits._
    // segment "a b c" occurs 3x corpus-wide (docs 1,2,3) => boilerplate;
    // "x y z" occurs twice => kept; doc 4's "r r r" repeats 3x WITHIN
    // one doc => boilerplate too (C4 counts occurrences, not documents)
    val docs = Seq(
      (1L, "a b c x y z"),
      (2L, "a b c p q r"),
      (3L, "u v w a b c extra"), // 7 tokens -> 2 segments, trailing token dropped
      (4L, "r r r r r r r r r")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentBoilerplate(docs, segTokens = 3, minOcc = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def md5s(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out(1L) == ((2L, 1L, md5s("x y z"))))
    assert(out(2L) == ((2L, 1L, md5s("p q r"))))
    assert(out(3L) == ((2L, 1L, md5s("u v w"))))
    assert(out(4L) == ((3L, 3L, md5s(""))))
  }
}

class ExactSubstringSpec extends AnyFunSuite {
  import TestSpark._

  test("t13 finds planted char-level overlaps with exact window counts") {
    import spark.implicits._
    val evalText = ('a' to 'z').mkString(" ") // 51 chars
    // doc 10 embeds a 60-char window-rich overlap? eval is 51 chars ->
    // windows = 2 (positions 1..2); doc 10 contains the FULL eval text
    // so both windows match; doc 11 shares only 49 chars -> no match
    val corpus = Seq(
      (10L, s"prefix $evalText suffix"),
      (11L, "prefix " + evalText.substring(0, 49)),
      (12L, "unrelated text entirely without overlap at all....")
    ).toDF("doc_id", "text")
    val ev = Seq((50L, evalText)).toDF("eval_id", "text")
    val out = Dedup.exactSubstringOverlap(corpus, ev, winLen = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((10L, 50L, 2L)))
  }

  test("rolling_hash_windows equals per-window refold hashes") {
    import spark.implicits._
    val df = Seq(("abcdefghij", 0), ("abc", 1), ("", 2)).toDF("text", "i")
    val rolled = df.select(col("i"),
      rolling_hash_windows(col("text"), 4, 1000003L).as("h"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    def fold(s: String): Long =
      s.foldLeft(0L)((h, c) => h * 1000003L + c.toInt)
    val expect0 = (0 to 6).map(i => fold("abcdefghij".substring(i, i + 4)))
    assert(rolled(0) == expect0)
    assert(rolled(1).isEmpty && rolled(2).isEmpty)
  }
}

class SemDedupSpec extends AnyFunSuite {
  import TestSpark._

  test("d10 keep rule picks the low-centroid-similarity member") {
    import spark.implicits._
    // one cluster direction (1,0); a=(1,0) sits ON the centroid,
    // b=(0.96,0.28) is 16.26deg off: cos(a,b)=0.96 >= tau groups them,
    // and SemDeDup keeps b (the outlier), not a. c=(0,1) is its own
    // cluster and appears in no pair (singletons are kept implicitly)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.96f, 0.28f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val out = operators.Dedup.semDedup(emb, cents, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 2L)),
      "survivor must be the member FARTHEST from its centroid")
  }

  test("d10 spherical assignment co-clusters every scaled twin") {
    val aug = {
      val emb = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
      emb.unionByName(emb.filter(col("vec_id") % queries.TextQueries.DupMod === 0)
        .select((col("vec_id") + queries.TextQueries.DupIdOffset).as("vec_id"),
          transform(col("embedding"), x => x * lit(0.5f)).as("embedding")))
    }
    val out = queries.TextQueries.d10(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = aug.filter(col("vec_id") >= queries.TextQueries.DupIdOffset)
      .count()
    // every planted (orig, copy) pair is cosine-1.0 and MUST be in a
    // component; twins tie on cent_sim so the id tie-break keeps the
    // original (= the component id for a 2-member planted group)
    val compIds = out.map(_._1).toSet
    val twins = aug.filter(col("vec_id") % queries.TextQueries.DupMod === 0 &&
      col("vec_id") < queries.TextQueries.DupIdOffset)
      .select("vec_id").collect().map(_.getLong(0))
    twins.foreach { id =>
      assert(compIds.contains(id), s"planted pair of $id not grouped")
    }
    assert(planted.toInt == twins.length)
  }
}

class NgramLmSpec extends AnyFunSuite {
  import TestSpark._

  test("t14 perplexity: closed-form tiny-corpus values + fluent-beats-garbled") {
    import spark.implicits._
    // doc 0: repetitive boilerplate (its bigrams are corpus-frequent),
    // doc 1: unique-token soup (every bigram is corpus-hapax),
    // doc 2: shares doc 0's dominant bigram
    val docs = Seq(
      (0L, "a b a b a b"),
      (1L, "q r s t u v"),
      (2L, "a b c a b c")).toDF("doc_id", "text")
    val ppl = operators.TextAnalysis.ngramPerplexity(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hand-built add-one bigram LM over the 3-doc corpus:
    // c2: ab=5 ba=2 bc=2 ca=1 qr=rs=st=tu=uv=1; c1 prefixes: a=5 b=4
    // c=1 q=r=s=t=u=1; V = 9 distinct tokens
    val exp0 = math.exp(-(3 * math.log(6.0 / 14) + 2 * math.log(3.0 / 13)) / 5)
    val exp1 = math.exp(-5 * math.log(2.0 / 10) / 5)
    assert(math.abs(ppl(0L) - exp0) < 1e-9, s"doc0 ${ppl(0L)} vs $exp0")
    assert(math.abs(ppl(1L) - exp1) < 1e-9, s"doc1 ${ppl(1L)} vs $exp1")
    // the LM contract: fluent/boilerplate text scores LOWER perplexity
    // than garbled hapax soup
    assert(ppl(0L) < ppl(2L) && ppl(2L) < ppl(1L), ppl.toString)
  }

  test("t14 exact leg: familiarity/hapax ratios from hand counts") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x y x y"),   // bigrams xy,yx,xy -> cf(xy)=2? (see below)
      (1L, "x y z")).toDF("doc_id", "text")
    // corpus occurrences: doc0 xy,yx,xy; doc1 xy,yz -> cf: xy=3 yx=1 yz=1
    val out = operators.TextAnalysis.ngramLmScore(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0L) == ((3L, 7L, 7.0 / 3, 1.0 / 3)), out(0L).toString)
    assert(out(1L) == ((2L, 4L, 2.0, 0.5)), out(1L).toString)
  }

  test("t14 Zipf-head split routes rows but never changes results") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a b"), (1L, "a b q r"), (2L, "a b c d"))
      .toDF("doc_id", "text")
    def run(hotF: Int) = operators.TextAnalysis.ngramLmScore(docs, hotF)
      .collect().map(_.toSeq).toSet
    val full = run(1000000) // everything lands in the head
    assert(run(1) == full, "head of one")
    assert(run(0) == full, "no head at all")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("t15 chunks tile each doc: starts, counts, hashes recompute exactly") {
    val docs = Tables.documents(spark, sf)
    val toks = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val out = TextAnalysis.chunk(docs, window = 64, stride = 48).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val t = toks(id)
      // chunk ids are dense 0..floor((n-1)/stride)
      assert(rows.map(_.getAs[Long]("chunk_id")).sorted.toSeq ==
        (0L to ((t.length - 1) / 48).toLong), s"doc $id chunk ids")
      rows.foreach { r =>
        val s0 = r.getAs[Long]("tok_start").toInt
        assert(s0 == r.getAs[Long]("chunk_id").toInt * 48)
        val ct = t.slice(s0, s0 + 64)
        assert(r.getAs[Long]("n_tokens") == ct.length, s"doc $id @$s0")
        assert(r.getAs[String]("chunk_hash") == md5hex(ct.mkString(" ")),
          s"doc $id @$s0 hash")
      }
      // full coverage: the union of [start, start+n) is [0, len)
      val covered = rows.flatMap(r => r.getAs[Long]("tok_start") until
        (r.getAs[Long]("tok_start") + r.getAs[Long]("n_tokens"))).toSet
      assert(covered == (0L until t.length.toLong).toSet, s"doc $id coverage")
    }
  }

  test("t15 stride == window produces disjoint chunks") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.chunk(docs, window = 32, stride = 32).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("n_tokens")).sum ==
        rows.map(r => r.getAs[Long]("tok_start") +
          r.getAs[Long]("n_tokens")).max)
    }
  }

  test("t15 plan: scan-local — no Exchange at all (pre-sort)") {
    // the operator itself (no presentation orderBy) must be one
    // codegen'd scan chain: any shuffle here would be a 100 TB bug
    val plan = TextAnalysis.chunk(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"t15 shuffled:\n$plan")
  }

  test("p02 plan: exactly the ONE shard-keyed aggregate exchange") {
    val plan = TextAnalysis.shardManifest(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected 1 shuffle, found $n:\n$plan")
  }

  test("p02 shard manifest: mass conserved, hashes recompute exactly") {
    val docs = Tables.documents(spark, sf)
    val rows = docs.select("doc_id", "n_chars", "text").collect()
    val out = TextAnalysis.shardManifest(docs, nShards = 8).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == rows.length)
    val byShard = rows.map { r =>
      val id = r.getLong(0)
      val h = (id * 2654435761L + 1013904223L) % 1000000007L
      (h % 8L, (h, id, md5hex(r.getString(2)), r.getLong(1)))
    }.groupBy(_._1)
    assert(out.map(_.getAs[Long]("shard")).toSet == byShard.keySet)
    out.foreach { r =>
      val ms = byShard(r.getAs[Long]("shard")).map(_._2)
        .sortBy(x => (x._1, x._2))
      assert(r.getAs[Long]("n_docs") == ms.length)
      assert(r.getAs[Long]("total_chars") == ms.map(_._4).sum)
      assert(r.getAs[String]("content_hash") == md5hex(ms.map(_._3).mkString),
        s"shard ${r.getAs[Long]("shard")} content hash")
    }
  }
}
