package graft

import org.apache.spark.sql.functions._

import graft.datagen.DataGen
import graft.operators.{IvfIndex, KnnSearch, VecMetric}

/** Scale smoke-bench over a GENERATED corpus — the scale-up path the
  * driver's fixed testdata can't exercise. Generates n blob vectors
  * with DataGen (no driver data, pure projections), builds the IVF
  * index, and times: exact brute-force kNN, IVF nprobe search, and
  * the packed-hamming scan, printing one JSON line per stage.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleBench 1000000 64"
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val dims = if (args.length > 1) args(1).toInt else 64
    // optional stage-filter regex: time only matching stages
    val keep: String => Boolean =
      if (args.length > 2) args(2).r.findFirstIn(_).isDefined else _ => true
    val nlist = 64
    val nprobe = 8
    val nq = 100
    // shuffle-partition override for campaign-wide calibration. The
    // NN-descent builds no longer need it: NnDescent.build derives
    // its own width from the structural per-round candidate volume
    // (~10M rows/task — the measured-safe chunk after a 5M round at
    // 32 partitions put ~44M rows/task through the top-k aggregate's
    // unmanaged typed buffers and OOM'd an 80 GB heap). The env var
    // remains the manual override (it wins inside NnDescent too) and
    // still sizes the NON-build stages (searches, dedup legs).
    val spark = GraftSession.create(appName = "graft-scale-bench",
      shufflePartitions =
        sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map(_.trim.toInt))

    def timed(name: String)(f: => Long): Unit = if (keep(name)) {
      val t0 = System.nanoTime()
      val rows = f
      println(f"""{"stage":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$rows,"n":$n,"dims":$dims}""")
    }

    // --- temporal joins + sampling at generated-event scale (pure
    // projections over spark.range — no driver data, any n) ---
    val users = math.max(1000L, n / 100)
    val ev = spark.range(n).select(
      pmod(col("id") * 2654435761L, lit(users)).as("user_id"),
      col("id").as("event_id"),
      pmod(col("id") * 1103515245L + 12345L, lit(86400L * 1000000L)).as("us"),
      when(pmod(col("id"), lit(10)) === 0, lit("error"))
        .otherwise(lit("click")).as("event_type"))
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "us", "event_id")
    timed("asof_join") {
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "us").agg(max("event_id").as("click_id"))
      graft.operators.TemporalJoins
        .asofJoin(errors, clicks, "user_id", "us").count()
    }
    timed("range_join") {
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "us")
      graft.operators.TemporalJoins.rangeJoinCount(errors, clicks,
        "user_id", "us", 1800L * 1000000L,
        Seq("event_id", "user_id", "us")).count()
    }
    def langDocs = spark.range(n).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) < 6, lit("en"))
        .when(pmod(col("id"), lit(10)) < 8, lit("zh"))
        .when(pmod(col("id"), lit(10)) < 9, lit("es"))
        .otherwise(lit("fr")).as("lang"))
    timed("stratified_sample") {
      graft.operators.TextAnalysis.stratifiedSample(langDocs, "lang").count()
    }
    // t12 at generated scale: same skewed strata, sqrt-upsampled —
    // scan-local explode, so the wall should track the output row
    // count (~1.2x input here), not the stratum skew
    timed("domain_mix") {
      graft.operators.TextAnalysis.domainMix(langDocs, "lang").count()
    }
    // t11 at generated scale: two-level prefix sum over variable-width
    // docs; 256 buckets ⇒ no task ever windows more than n/256 rows
    def packDocs = spark.range(n).select(col("id").as("doc_id"),
      expr("repeat('w ', cast(id % 50 + 1 as int))").as("text"))
    timed("sequence_pack") {
      graft.operators.TextAnalysis
        .sequencePack(packDocs, 2048L, nBuckets = 256).count()
    }
    // nBuckets=0 AUTO-SIZING at scale (the production default): bucket
    // count derives from plan stats (~65,536 rows/bucket), so the wall
    // must track sequence_pack above at any n — a fixed count would
    // either starve cores (small n) or blow window tasks (large n)
    timed("sequence_pack_auto") {
      graft.operators.TextAnalysis
        .sequencePack(packDocs, 2048L, nBuckets = 0).count()
    }

    // t15 at generated scale: scan-local slice+hash over variable-
    // width docs (1..200 tokens ⇒ multi-chunk tail docs); no shuffle
    // at any n — the wall must track the output chunk count
    // (~sum(tokens)/stride), not n alone
    def chunkDocs = spark.range(n).select(col("id").as("doc_id"),
      expr("repeat('w ', cast(id % 200 + 1 as int))").as("text"))
    timed("chunk") {
      graft.operators.TextAnalysis.chunk(chunkDocs, 64, 48).count()
    }
    // p02 at generated scale: ONE shard-keyed shuffle; nShards sized
    // to ~65k docs/shard so each shard's digest sort stays one
    // writer-task's worth — the wall must scale with n/shards per
    // task, no hot shard (affine-hash deal is uniform)
    timed("shard_manifest") {
      graft.operators.TextAnalysis.shardManifest(
        chunkDocs.withColumn("n_chars", length(col("text")).cast("long")),
        math.max(32L, n / 65536L).toInt).count()
    }

    // planted-near-dup corpus (pure projections — any n): 32-token
    // docs over a 50k vocab, every 10th doc a near-dup of its
    // predecessor (first 30 tokens shared ⇒ 3-gram shingle jaccard
    // 28/32 = 0.875 ≥ τ=0.8; unrelated docs share ~nothing at this
    // vocab). Planted pair count = n/10, so candidate volume and
    // output are linear in n by construction — the property the d02
    // df-cap, d03 banding and q44's streaming state must preserve.
    def plantedDocs = {
      val docLen = 32
      val shared = 30
      spark.range(n).select(col("id").as("doc_id"))
        .withColumn("text", concat_ws(" ", expr(
          s"""transform(sequence(0, ${docLen - 1}), j -> concat('w',
             |  pmod(xxhash64(CASE WHEN j < $shared AND doc_id % 10 = 9
             |                     THEN (doc_id - 1) * 131 + j
             |                     ELSE doc_id * 131 + j END), 50000)))
             |""".stripMargin.replace('\n', ' '))))
    }

    // t14 at generated scale: bigram-LM familiarity over the planted
    // corpus — ~31 bigram occurrences per doc, so the model groupBy
    // and the AQE-splittable join back each stream ~31n rows; the
    // planted near-dups + shared-prefix structure give the count
    // table a realistic repeated-bigram head
    timed("ngram_lm") {
      graft.operators.TextAnalysis.ngramLmScore(plantedDocs).count()
    }
    // same operator over a natural-language-shaped corpus: half the
    // token slots draw from a 100-word stopword vocab, so ~25% of all
    // bigram occurrences land on ~10k stop-stop keys — the Zipf head
    // the top-F broadcast absorbs before any exchange (plantedDocs
    // above is the adversarial hapax-heavy case: no head, every
    // occurrence cold — the operator's worst input)
    timed("ngram_lm_zipf") {
      // the word-id hash must be independent of the branch-selector
      // hash: 10 divides 50000, so pmod(h, 50000) of a selector-
      // conditioned h would keep only last-digit-5..9 ids — half the
      // claimed vocabulary
      val zdocs = spark.range(n).select(col("id").as("doc_id"))
        .withColumn("text", concat_ws(" ", expr(
          """transform(sequence(0, 31), j -> CASE
            |  WHEN pmod(xxhash64(doc_id * 131 + j), 10) < 5
            |  THEN concat('s', pmod(xxhash64(doc_id * 997 + j), 100))
            |  ELSE concat('w', pmod(xxhash64(doc_id * 131 + j + 777777), 50000))
            |  END)""".stripMargin.replace('\n', ' '))))
      graft.operators.TextAnalysis.ngramLmScore(zdocs).count()
    }

    // --- dedup pipeline at generated-doc scale ---
    if (Seq("dedup_shingles", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_clusters").exists(keep)) {
      val sh = operators.Dedup.shingles(plantedDocs)
      timed("dedup_shingles") { sh.cache().count() }
      timed("dedup_ngram_jaccard") {
        operators.Dedup.ngramJaccardPairsOf(sh, 0.8).count()
      }
      var pairs: org.apache.spark.sql.DataFrame = null
      timed("dedup_minhash_lsh") {
        pairs = operators.Dedup.minhashLshOf(sh, 0.8).localCheckpoint(true)
        pairs.count()
      }
      if (keep("dedup_clusters")) {
        if (pairs == null) // minhash stage was filtered out: untimed build
          pairs = operators.Dedup.minhashLshOf(sh, 0.8).localCheckpoint(true)
        timed("dedup_clusters") {
          operators.Dedup.connectedComponents(pairs).count()
        }
      }
      sh.unpersist()
    }

    // d09 at generated scale: the planted near-dup pairs make their
    // shared-prefix segments repeat (minOcc=2 flags them), so
    // boilerplate volume is n/10-linear; the wall must track the ONE
    // segment-count shuffle + per-doc rebuild, nothing pairwise
    timed("segment_dedup") {
      operators.Dedup.segmentBoilerplate(plantedDocs, 3, 2L).count()
    }
    // d09's HOT-KEY failure mode, planted explicitly: ONE segment (a
    // corpus-wide cookie banner) occurs in 20% of all docs; every
    // other segment is unique. Pre-fix this put 0.2n rows through a
    // single count-window task (the straggler the round-11 rebuild
    // killed); post-fix the head broadcast absorbs the hot key before
    // any exchange, so the wall must stay within a small factor of
    // segment_dedup above and show no single-task straggler.
    timed("segment_dedup_hot") {
      val hotDocs = spark.range(n).select(col("id").as("doc_id"))
        .withColumn("text", concat_ws(" ",
          when(pmod(col("doc_id"), lit(5)) === 0, lit("hot0 hot1 hot2"))
            .otherwise(expr(
              "concat('u', doc_id * 3, ' u', doc_id * 3 + 1, ' u', doc_id * 3 + 2)")),
          expr(
            "concat('v', doc_id * 7, ' v', doc_id * 7 + 1, ' v', doc_id * 7 + 2)")))
      operators.Dedup.segmentBoilerplate(hotDocs, 3, 2L).count()
    }
    // t13 at generated scale: a FIXED 200-doc eval slice against the
    // n-doc corpus — eval windows broadcast (bounded by construction),
    // corpus cost = scan-local rolling hashes + rare candidate
    // verification; planted pair partners (30 shared leading tokens ≈
    // 240 shared chars) are the expected ~200 matches at every n
    timed("exact_substring") {
      val step = math.max(10L, n / 200 / 10 * 10)
      val docs = plantedDocs
      val ev = docs.filter(col("doc_id") % step === 8)
        .select(col("doc_id").as("eval_id"), col("text"))
      val corpus = docs.join(ev.select(col("eval_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      operators.Dedup.exactSubstringOverlap(corpus, ev, 50).count()
    }

    // p01 at generated scale: the COMPLETE composed curation pass —
    // the same set algebra as TextQueries.p01 (d01 exact-dup keep ∩
    // ¬(d03→d06→d07 near-dup drop) ∩ ¬eval ∩ ¬contaminated [t08] ∩
    // quality gate [t01], survivors carrying pred_lang [t03]) — over
    // the planted corpus. Every leg is id-keyed set algebra, so the
    // composition stays one-bounded-shuffle-per-leg at any n; the
    // planted near-dups (n/10 pairs) make the cluster/survivor legs
    // do real work, and the n/50 eval slice drives the decontam leg.
    // Wall must track the sum of the leg walls (no cross-leg
    // multiplication), the composition property this stage gates.
    timed("curation_pipeline") {
      val docs = plantedDocs
      val sh = operators.Dedup.shingles(docs)
      val exactKeep = operators.Dedup.exact(docs).select("doc_id")
      val clusters = operators.Dedup.connectedComponents(
        operators.Dedup.minhashLshOf(sh, 0.8))
      val quality = operators.TextAnalysis.qualityScore(docs)
        .select(col("doc_id"), col("quality"))
      val survivors = clusters.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(max(struct(col("quality"), col("doc_id"))).as("w"))
        .select(col("cluster_id"), col("w.doc_id").as("survivor_id"))
      val nearDupDrop = clusters.join(survivors, "cluster_id")
        .filter(col("doc_id") =!= col("survivor_id"))
        .select("doc_id")
      val contaminated = operators.Dedup.crossOverlap(sh,
        col("doc_id") % 50 === 0, 2L)
        .select("doc_id").distinct()
      val lang = operators.TextAnalysis.langId(docs)
        .select("doc_id", "pred_lang")
      docs.select("doc_id")
        .join(exactKeep, Seq("doc_id"), "left_semi")
        .join(nearDupDrop, Seq("doc_id"), "left_anti")
        .filter(col("doc_id") % 50 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .join(quality, "doc_id")
        .filter(col("quality") >= 0.5)
        .join(lang, "doc_id")
        .select(col("doc_id"), col("pred_lang"), col("quality"))
        .count()
    }

    // --- q44 streaming near-dedup at generated scale: the planted
    // corpus laid out as many single-file slices (doc_id mod nSlices,
    // so a planted pair's members land in DIFFERENT micro-batches and
    // every match crosses trigger boundaries through the
    // (band,bucket) state store), streamed with maxFilesPerTrigger=1.
    // stream_near_dedup's row count must equal the batch d03 count on
    // the same corpus (stream_near_dedup_batch_ref) — both n/10.
    if (Seq("stream_near_dedup_layout", "stream_near_dedup",
        "stream_near_dedup_batch_ref").exists(keep)) {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val tmp = Files.createTempDirectory("graft_q44_scale_").toString
      try {
        val nSlices = 16
        def layout(): Long = {
          for (i <- 0 until nSlices) {
            val stage = s"$tmp/stage_$i"
            plantedDocs.filter(pmod(col("doc_id"), lit(nSlices)) === i)
              .coalesce(1).write.parquet(stage)
            val part = new java.io.File(stage).listFiles()
              .filter(_.getName.endsWith(".parquet")).head.toPath
            val dest = if (i == 0) s"$tmp/documents.parquet"
              else s"$tmp/documents_$i.parquet"
            Files.move(part, Paths.get(dest),
              StandardCopyOption.REPLACE_EXISTING)
          }
          n
        }
        if (keep("stream_near_dedup_layout")) timed("stream_near_dedup_layout")(layout())
        else if (keep("stream_near_dedup")) layout() // stream needs the files
        timed("stream_near_dedup") {
          graft.streaming.DocStream.streamNearDedup(spark, tmp, 0.8,
            maxFilesPerTrigger = Some(1)).count()
        }
        timed("stream_near_dedup_batch_ref") {
          operators.Dedup
            .minhashLshOf(operators.Dedup.shingles(plantedDocs), 0.8)
            .count()
        }
      } finally graft.streaming.Checkpoints.deleteRecursively(tmp)
    }

    // vector stages share the generated corpus; skip the whole block
    // (including the otherwise-unconditional centroid collect) when a
    // stage filter selects none of them
    if (Seq("generate+cache", "exact_knn_100q", "ivf_build",
        "ivf_search_100q", "ivf_range_100q",
        "blocked_pairs_20k", "blocked_batch_knn_20k",
        "packed_hamming_100q", "rp_project", "rp_two_stage_100q",
        "pq_encode", "pq_aniso_encode", "pq_adc_100q",
        "grouped_search_100q", "semdedup",
        "graph_nnd_build", "graph_stack_search_100q",
        "graph_stack_recall_100q", "graph_div_build",
        "graph_div_search_100q", "graph_div_recall_100q",
        "graph_insert", "graph_insert_self", "graph_insert_recall_100q",
        "graph_tombstone_search_100q", "graph_compact",
        "graph_compact_touched")
        .exists(keep)) {
    val corpus = DataGen.randomFloat(spark, n, dims, centers = 32, seed = 7)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    timed("generate+cache") { corpus.cache().count() }
    val queries = corpus.filter(col("id") < nq)
      .select(col("id").as("query_id"), col("vec").as("qvec"))

    timed("exact_knn_100q") {
      KnnSearch.bruteForce(corpus, queries, 10, VecMetric.Euclidean).count()
    }

    // q47 at scale: same scan as exact_knn, but the reduce is the
    // per-(query, group) champion — shuffle rows are Q x 1000 groups
    // x partials, never N; compare wall against exact_knn_100q
    timed("grouped_search_100q") {
      val grouped = corpus.withColumn("grp", pmod(col("id"), lit(1000L)))
      graft.operators.GroupedSearch
        .search(grouped, queries, 10, VecMetric.Euclidean, "grp").count()
    }

    // d10 at scale: SemDeDup over the generated blobs + every 100th
    // id's 0.5x twin. Total cost = assignment n x nlist + in-cluster
    // pairs n x (n/nlist); nlist = sqrt(n) balances the two at
    // n^1.5 — the method's intrinsic curve (the paper pays the same
    // shape on GPUs); the knob trades the two scans, it cannot beat
    // their product.
    timed("semdedup") {
      val twins = corpus.filter(col("id") % 100 === 0)
        .select((col("id") + n).as("id"),
          transform(col("vec"), x => x * lit(0.5f)).as("vec"))
      val aug = corpus.unionByName(twins)
      val nlist = math.max(64, math.sqrt(n.toDouble).toInt)
      val cents = graft.operators.IvfIndex
        .sampleCentroids(aug, "vec", nlist)
      // tau above the blobs' natural in-cluster cosine (~0.97 for
      // shared-center gaussians): the planted cos-1.0 twins are the
      // duplicate set; the measured cost is the real one regardless —
      // every in-cell pair is scored before tau filters it
      graft.operators.Dedup
        .semDedup(aug, cents, 0.999, idCol = "id", vecCol = "vec").count()
    }

    // e04/e05 shape at scale: project once (scan-local), candidate-gen
    // on the 24/64-width reduced vectors, rerank only Q x R rows on
    // full dims — compare wall against exact_knn_100q above
    if (Seq("rp_project", "rp_two_stage_100q").exists(keep)) {
      val reduced = corpus.withColumn("rv",
        graft.queries.EmbeddingQueries.projectExpr(col("vec")))
      timed("rp_project") { reduced.cache().count() }
      timed("rp_two_stage_100q") {
        val qs = reduced.filter(col("id") < nq)
          .select(col("id").as("query_id"), col("vec").as("qvec"),
            col("rv").as("qrv"))
        val cands = KnnSearch.bruteForce(reduced, qs, 100,
          VecMetric.Euclidean, vecCol = "rv", qvecCol = "qrv")
          .select(col("query_id"), col("neighbor_id").as("id"))
        val rr = reduced.select(col("id"), col("vec"))
          .join(broadcast(cands), "id")
          .join(broadcast(qs.select(col("query_id"), col("qvec"))),
            "query_id")
          .select(col("query_id"),
            graft.functions.vec_l2(col("qvec"), col("vec")).as("score"),
            col("id"))
        KnnSearch.topKOf(rr, 10, asc = true).count()
      }
      reduced.unpersist()
    }

    if (Seq("ivf_build", "ivf_search_100q", "ivf_range_100q")
        .exists(keep)) {
      val cents = IvfIndex.sampleCentroids(corpus, "vec", nlist)
      var assigned: org.apache.spark.sql.DataFrame = null
      timed("ivf_build") {
        assigned = IvfIndex.assign(corpus, "vec", cents).cache()
        assigned.count()
      }
      timed("ivf_search_100q") {
        IvfIndex.search(assigned, queries, cents, 10, nprobe,
          VecMetric.Euclidean).count()
      }
      // q52 shape at scale: same probed-cell scan as ivf_search but
      // the reduce is a radius filter (no top-k heaps / final agg) —
      // wall must be at or below ivf_search_100q on the same index
      timed("ivf_range_100q") {
        val probed = IvfIndex.probedQueries(queries, cents, nprobe)
        assigned.join(broadcast(probed), "cluster")
          .select(col("query_id"),
            graft.functions.vec_l2(col("qvec"), col("vec")).as("score"),
            col("id"))
          .filter(col("score") <= 1.25).count()
      }
    }

    // q21/q46 quantized-scan leg at scale: the encode (index build) is
    // one codegen'd scan — plain vs anisotropic at identical bytes —
    // and the MIPS ADC answers a 100-query batch reading m code bytes
    // per row instead of dims floats
    if (Seq("pq_encode", "pq_aniso_encode", "pq_adc_100q").exists(keep)) {
      val pqm = graft.operators.PqIndex.sampleModel(corpus, "vec", 8, 16)
      timed("pq_encode") {
        // aggregate over the codes so column pruning can't skip the
        // encode (count() alone would prune the projection away)
        corpus.select(
          graft.operators.PqIndex.encode(col("vec"), pqm).as("codes"))
          .agg(sum(element_at(col("codes"), 1))).head()
        n
      }
      val coded = corpus.select(col("id"),
        graft.operators.PqIndex.encodeAniso(col("vec"), pqm, 4.0)
          .as("codes"))
      timed("pq_aniso_encode") { coded.cache().count() }
      timed("pq_adc_100q") {
        val qt = queries.withColumn("tbl",
          graft.operators.PqIndex.dotTable(col("qvec"), pqm))
          .select("query_id", "tbl")
        val scored = coded.crossJoin(broadcast(qt))
          .select(col("query_id"),
            graft.functions.pq_adc(col("codes"), col("tbl")).as("score"),
            col("id"))
        KnnSearch.topKOf(scored, 10, asc = false).count()
      }
      coded.unpersist()
    }

    // the blocked grid join (d05/q10 shape) on a 20k slice: 400M pair
    // evaluations through the equi-join path — the workload that a
    // broadcast or cartesian plan could not survive at larger N
    val slice = corpus.filter(col("id") < 20000)
      .withColumnRenamed("id", "vec_id").withColumnRenamed("vec", "embedding")
    timed("blocked_pairs_20k") {
      graft.operators.Dedup
        .embeddingNearDups(slice, 0.995, blockRows = 4096).count()
    }
    timed("blocked_batch_knn_20k") {
      val b = slice.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = slice.select(col("vec_id").as("query_id"),
        col("embedding").as("qvec"))
      KnnSearch.bruteForceBlocked(b, q, 10, VecMetric.Euclidean,
        blockRows = 4096).count()
    }

    // q53/q55 shape at scale: the NO-N² layered-stack builds
    // (NN-descent base; upper layers NN-descent above the 16k
    // exactCap default, exact blocked under it; the `div` variant
    // prunes every layer's candidate lists with the
    // SELECT-NEIGHBORS-HEURISTIC to half degree) + the hierarchical
    // descent with its driver-resident top of stack. Build cost is
    // dominated by the base NN-descent rounds (candidate volume
    // ~ n·(2·wk)² per round); search cost is rounds×(|E|+n) scans —
    // both linear in n, the property these walls gate. Each variant's
    // build/search/recall stages guard their producers: a stage
    // filter keeping only a downstream stage computes the upstream
    // result untimed instead of NPE-ing, and the exact recall
    // baseline is built only when a recall stage actually runs.
    if (Seq("graph_nnd_build", "graph_stack_search_100q",
        "graph_stack_recall_100q", "graph_div_build",
        "graph_div_search_100q", "graph_div_recall_100q",
        "graph_insert", "graph_insert_self", "graph_insert_recall_100q",
        "graph_tombstone_search_100q", "graph_compact",
        "graph_compact_touched")
        .exists(keep)) {
      val lv = graft.queries.IndexQueries.levelsFor(n)
      // convergence knobs, env-overridable for calibration runs: at
      // the gate scales 2 rounds from random init reach the exact
      // build's recall, but random init covers ~wk/n of the corpus
      // per node, so larger n needs more expansion rounds
      val gIters = sys.env.getOrElse("SPARK_GRAFT_GRAPH_ITERS",
        graft.queries.IndexQueries.NndIters.toString).toInt
      val gFactor =
        sys.env.getOrElse("SPARK_GRAFT_GRAPH_FACTOR", "1").toInt
      // Dong et al. sampling at the pair-join key (0 = off): caps
      // candidate volume at n·midCap² per round structurally — the
      // knob that keeps the candidate shuffle inside a fixed scratch
      // budget as n grows past the 1M calibration point
      val gMidCap =
        sys.env.getOrElse("SPARK_GRAFT_NND_MIDCAP", "0").toInt
      // vector-broadcast ceiling (rows): above the 4M default the
      // scoring falls back to shuffle joins, which at >4M rows is
      // the wall — raise it while executor memory holds the table
      val gBcast = sys.env.getOrElse("SPARK_GRAFT_NND_BCAST_ROWS",
        (1L << 22).toString).toLong
      // search-effort sweep over ONE build (HNSW's ef knob: recall is
      // bought by beam width × rounds at query time as much as by
      // build convergence): "beam:rounds,beam:rounds,..."
      val effort = sys.env.getOrElse("SPARK_GRAFT_GRAPH_BEAMS",
        s"${graft.queries.IndexQueries.HierBeam}:" +
          s"${graft.queries.IndexQueries.HierRounds}")
        .split(",").map { s =>
          val Array(b, r) = s.split(":"); (b.trim.toInt, r.trim.toInt)
        }
      lazy val exact = KnnSearch.bruteForce(corpus, queries, 10,
        VecMetric.Euclidean).select("query_id", "neighbor_id")
        .localCheckpoint(true)
      // graph persist/load: an hour-plus 5M build vs a minutes-long
      // beam tier — SPARK_GRAFT_GRAPH_SAVE=dir writes each variant's
      // layered edge list (layer, id, neighbor_id) after its build;
      // SPARK_GRAFT_GRAPH_LOAD=dir reads it back instead of
      // rebuilding, so later search-only sweeps (new beam tiers on an
      // existing build) never pay the build wall again. Loads time
      // under the build stage name if kept — filter build stages out
      // of search-only reruns.
      val graphSave = sys.env.get("SPARK_GRAFT_GRAPH_SAVE")
      val graphLoad = sys.env.get("SPARK_GRAFT_GRAPH_LOAD")
      // one build + sweep pass, shared by the plain and diversified
      // variants (`kind` = "stack" for q53's build, "div" for q55's)
      def graphVariant(kind: String,
          build: () => org.apache.spark.sql.DataFrame): Unit = {
        val buildName =
          if (kind == "stack") "graph_nnd_build" else "graph_div_build"
        val searchPre = s"graph_${kind}_search_100q"
        val recallPre = s"graph_${kind}_recall_100q"
        val wanted = effort.map { case (b, r) =>
          (b, r, if (effort.length == 1) "" else s"_b${b}r$r")
        }.filter { case (_, _, t) =>
          keep(s"$searchPre$t") || keep(s"$recallPre$t") }
        if (!keep(buildName) && wanted.isEmpty) return
        var stack: org.apache.spark.sql.DataFrame = null
        def doBuild(): Long = {
          stack = (graphLoad match {
            case Some(d) => spark.read.parquet(s"$d/$kind")
            case None => build()
          }).localCheckpoint(true)
          stack.count()
        }
        if (keep(buildName)) timed(buildName)(doBuild()) else doBuild()
        if (graphLoad.isEmpty) graphSave.foreach { d =>
          stack.write.mode("overwrite").parquet(s"$d/$kind")
        }
        for ((beam, rounds, tag) <- wanted) {
          var topk: org.apache.spark.sql.DataFrame = null
          def doSearch(): Long = {
            topk = graft.operators.GraphSearch.hierarchicalSearch(
              corpus, stack, queries, 10, beam, rounds, lv,
              graft.queries.IndexQueries.UpperBeam).localCheckpoint(true)
            topk.count()
          }
          if (keep(s"$searchPre$tag")) timed(s"$searchPre$tag")(doSearch())
          else doSearch()
          // quality gate for the approximate build at THIS scale (the
          // sf0.01 spec floor doesn't transfer on its own): rows =
          // hits out of nq*10 vs the exact top-10 — recall = rows/1000
          timed(s"$recallPre$tag") {
            topk.select("query_id", "neighbor_id").intersect(exact).count()
          }
        }
      }
      graphVariant("stack", () =>
        graft.operators.GraphSearch.buildLayeredGraphsNnd(
          corpus, lv, graft.queries.IndexQueries.GraphDeg,
          graft.queries.IndexQueries.UpperDeg,
          gIters, workingDegreeFactor = gFactor,
          midCap = gMidCap, bcastRows = gBcast))
      graphVariant("div", () =>
        graft.operators.GraphSearch.buildLayeredGraphsDiversified(
          corpus, lv, graft.queries.IndexQueries.GraphDeg,
          graft.queries.IndexQueries.DivM,
          graft.queries.IndexQueries.UpperCand,
          graft.queries.IndexQueries.UpperDeg,
          gIters, workingDegreeFactor = gFactor,
          midCap = gMidCap, bcastRows = gBcast))

      // q56 at scale: insertBatch against a SAVED stack
      // (SPARK_GRAFT_GRAPH_LOAD) — wall for the O(batch) insert, then
      // self-findability (each inserted row queried back, sampled) and
      // held-out recall on the merged graph. SPARK_GRAFT_INSERT_N
      // sizes the batch: ≤ driverTopRows (65536) exercises the
      // driver-resident top; above it the all-distributed path with
      // shuffle-joined candidates — the two sides of the flip. The
      // batch extends the generator's id range (per-id hash vectors,
      // so ids 0..n-1 reproduce the saved build's corpus exactly and
      // ids n.. are genuinely new draws from the same distribution).
      if (Seq("graph_insert", "graph_insert_self",
          "graph_insert_recall_100q",
          "graph_tombstone_search_100q", "graph_compact",
        "graph_compact_touched").exists(keep) &&
          // insert-at-scale only makes sense against a SAVED graph;
          // an unfiltered run (keep = everything) without
          // SPARK_GRAFT_GRAPH_LOAD must skip it, not crash mid-bench
          (graphLoad.nonEmpty || {
            System.err.println("graph_insert stages skipped: set " +
              "SPARK_GRAFT_GRAPH_LOAD to a saved stack")
            false
          })) {
        val insN = sys.env.getOrElse("SPARK_GRAFT_INSERT_N", "100000").toInt
        val Array(insBeam, insRounds) =
          sys.env.getOrElse("SPARK_GRAFT_INSERT_BEAM", "32:6")
            .split(":").map(_.trim.toInt)
        // |E|-sized checkpoints are stored SERIALIZED: the default
        // deserialized level kept ~15+ GB of boxed edge rows live,
        // and the insert walk's shuffle pressure evicted them to
        // disk only for every read-back to re-materialize values —
        // the allocation storm that OOM'd the 48 GB insert stages
        // (search-only stages never squeezed storage enough to
        // surface it)
        val SER = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
        val stack = spark.read.parquet(s"${graphLoad.get}/stack")
          .localCheckpoint(true, SER)
        val batch = DataGen.randomFloat(spark, n + insN, dims,
          centers = 32, seed = 7)
          .filter(col("vec_id") >= n)
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
          .localCheckpoint(true)
        var newEdges: org.apache.spark.sql.DataFrame = null
        timed("graph_insert") {
          newEdges = graft.operators.GraphSearch.insertBatch(
            corpus, stack, batch, lv,
            graft.queries.IndexQueries.GraphDeg,
            graft.queries.IndexQueries.DivM,
            graft.queries.IndexQueries.UpperDeg,
            insBeam, insRounds,
            graft.queries.IndexQueries.UpperBeam)
            .localCheckpoint(true, SER)
          newEdges.count()
        }
        // compact-only runs (insert stages filtered out) leave
        // newEdges unset and operate on the LOADED stack itself —
        // compaction is defined on any stack, and this spares a
        // cap-sweep the ~30 min insert prerequisite
        val merged =
          if (newEdges == null) stack
          else stack.unionByName(newEdges).localCheckpoint(true, SER)
        val mergedBase =
          if (newEdges == null) corpus else corpus.unionByName(batch)
        // rows = inserted ids that FIND THEMSELVES in their own top-10
        // (sampled to 100 queries; self-findability = rows / 100)
        timed("graph_insert_self") {
          val sq = batch.filter(col("id") < n + 100)
            .select(col("id").as("query_id"), col("vec").as("qvec"))
          graft.operators.GraphSearch.hierarchicalSearch(
            mergedBase, merged, sq, 10, insBeam, insRounds, lv,
            graft.queries.IndexQueries.UpperBeam)
            .filter(col("neighbor_id") === col("query_id")).count()
        }
        // rows = hits out of nq*10 vs the exact top-10 over the
        // POST-insert corpus (recall = rows / (nq*10))
        timed("graph_insert_recall_100q") {
          val topk = graft.operators.GraphSearch.hierarchicalSearch(
            mergedBase, merged, queries, 10, insBeam, insRounds, lv,
            graft.queries.IndexQueries.UpperBeam)
          val exactM = KnnSearch.bruteForce(mergedBase, queries, 10,
            VecMetric.Euclidean).select("query_id", "neighbor_id")
          topk.select("query_id", "neighbor_id").intersect(exactM).count()
        }
        // q57's delete path at scale: tombstone 1% of the corpus
        // (100k ids at 10M) and search — the filter is one anti-join
        // on the visited set, so rows must stay nq×k (tombstones
        // cannot crowd live answers out) and the wall should sit on
        // top of graph_insert_recall_100q's search leg, not above it
        timed("graph_tombstone_search_100q") {
          val tomb = corpus.filter(pmod(col("id"), lit(100L)) === 7L)
            .select("id")
          graft.operators.GraphSearch.hierarchicalSearch(
            mergedBase, merged, queries, 10, insBeam, insRounds, lv,
            graft.queries.IndexQueries.UpperBeam,
            tombstones = Some(tomb)).count()
        }
        // q58's compaction at scale: re-prune the post-insert merged
        // stack's over-cap nodes back to the symmetrized degree
        // discipline (2×GraphDeg base / 2×UpperDeg upper — HNSW's
        // Mmax0 = 2M convention). The cost claim this wall gates:
        // one degree histogram over |E| plus prune pairs over ONLY
        // the touched nodes (each ≤ degree²) — far below a build
        // round at the same |E|. rows = surviving edge count.
        // graph_compact_touched's rows = over-cap node count, the
        // denominator of the O(touched · cap²) claim.
        if (keep("graph_compact") || keep("graph_compact_touched")) {
          // SPARK_GRAFT_COMPACT_CAP overrides the base cap: touched
          // volume is CAP-RELATIVE (measured at 10M: cap 32 under
          // the i9 graph's 36.7 avg degree touched 3.79M nodes —
          // 38% of the corpus, a rebuild-class prune that exceeded
          // one box's disk; a cap above the degree mode catches
          // only the accreted tail, the operator's intended regime)
          val capB = sys.env.getOrElse("SPARK_GRAFT_COMPACT_CAP",
            (2 * graft.queries.IndexQueries.GraphDeg).toString).toInt
          val capU = 2 * graft.queries.IndexQueries.UpperDeg
          timed("graph_compact_touched") {
            merged.groupBy("layer", "id").count()
              .filter((col("layer") === 0 && col("count") > capB) ||
                (col("layer") > 0 && col("count") > capU))
              .count()
          }
          timed("graph_compact") {
            graft.operators.GraphSearch.compactOverDegree(
              merged, mergedBase,
              l => if (l == 0) capB else capU, lv).count()
          }
        }
      }
    }

    timed("packed_hamming_100q") {
      val packed = corpus.select(col("id"),
        graft.functions.pack_bits(col("vec"), 64).as("bits")).cache()
      packed.count()
      val pq = packed.filter(col("id") < nq)
        .select(col("id").as("query_id"), col("bits").as("qvec"))
      val scored = packed.crossJoin(broadcast(pq))
        .select(col("query_id"),
          graft.functions.packed_hamming(col("qvec"), col("bits"))
            .cast("double").as("score"),
          col("id"))
      KnnSearch.topKOf(scored, 10, asc = true).count()
    }
    } // end vector stages
    spark.stop()
  }
}
