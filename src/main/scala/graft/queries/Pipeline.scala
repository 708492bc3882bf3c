package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Core._
import graft.functions.Text
import graft.operators.{Dedup, Retrieval, Similarity, Tokenize}

/** Training-data pipeline queries — the operators a 100 TB LLM-corpus
  * build needs on top of the reference's own surface: deduplication
  * (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine),
  * similarity search (brute-force + LSH-bucketed ANN), text analysis
  * (stats, language-ID, quality, token counts, fingerprints), and
  * multimodal column plumbing. Naming: d* dedup, n* ANN, t* text,
  * m* multimodal (reserved in SparkEntry since round 1).
  *
  * Oracle policy: everything SQL-expressible has a DuckDB twin computing
  * bit-identical values (see Similarity's scaled-long cosine and Text's
  * md5-based SimHash). The two LSH paths (d2 band misses ~5e-8, so its
  * brute-force oracle still applies; n2 recall < 1 by design, so it is
  * rows-only here and recall-bounded in SimilaritySpec).
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** Typed outputs of the multimodal stages. Since r13 the decode is
    * REAL: m2 synthesizes a deterministic image per doc, encodes it to
    * actual PNG/BMP container bytes and decodes them back through
    * `javax.imageio` (the JDK's standard imaging API — no external
    * libs), emitting the DECODED dims + pixel checksum; m4 runs a real
    * bilinear `Graphics2D` resize. The oracle predicts dims/checksums
    * from the same md5-derived parameters and pins `decode_ok` /
    * `resize_ok` — booleans the query computes by comparing the decoded
    * result against the synthesized ground truth, so a codec regression
    * flips a hash-checked column.
    */
  /** The opaque-binary media column between the encode and decode
    * stages — image/audio/video as `binary` with typed metadata, the
    * brief's literal column shape. `expect_b0` carries the synthesis
    * parameter forward so the decode stage can verify the round-trip
    * without re-hashing the source text.
    */
  final case class MediaPayload(doc_id: Long, codec: String,
                                payload: Array[Byte], expect_b0: Int,
                                expect_w: Int, expect_h: Int)
  final case class MediaDecoded(doc_id: Long, codec: String, width: Long,
                                height: Long, pix_sum: Long,
                                decode_ok: Boolean)
  final case class MediaResized(doc_id: Long, w0: Long, h0: Long,
                                w1: Long, h1: Long, resize_ok: Boolean)
  /** m3's multi-frame container stage pair: an actual animated-GIF
    * payload (one gray frame per synthetic "video" frame) and the
    * per-sampled-frame descriptor decoded back out of it.
    */
  final case class VideoPayload(doc_id: Long, payload: Array[Byte],
                                expect_b0: Int, expect_w: Int,
                                expect_h: Int, expect_frames: Int)
  final case class FrameSampled(doc_id: Long, n_frames: Long,
                                frame_idx: Long, ts_ms: Long,
                                width: Long, height: Long, pix: Long,
                                decode_ok: Boolean)

  val defs: Map[String, Q] = Map(

    // D1: exact dedup — md5-of-normalized-text hash groupBy, keep-first.
    "d1_exact_dedup" -> { (s, d) =>
      Dedup.exactDedup(Tables.documents(s, d))
        .canonOrder(col("keep_doc_id"))
    },

    // D2: MinHash+LSH near-dup (the 100 TB dedup path): banded signatures →
    // bucket equi-join candidates → exact-Jaccard verify. Never O(n²).
    "d2_minhash_neardup" -> { (s, d) =>
      Dedup.minhashNearDup(Tables.documents(s, d), n = 3, theta = 0.8)
        .canonOrder(col("doc_a"), col("doc_b"))
    },

    // D3: SimHash document sketch (32-bit, md5-backed so the oracle can
    // recompute it exactly).
    "d3_simhash" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), Text.simhash32(col("text")).as("simhash"))
        .canonOrder(col("doc_id"))
    },

    // D4: n-gram Jaccard brute force — the correctness baseline d2 is
    // checked against (same pair values, lower threshold).
    "d4_ngram_jaccard" -> { (s, d) =>
      Dedup.jaccardBruteForce(Tables.documents(s, d), n = 3, theta = 0.5)
        .canonOrder(col("doc_a"), col("doc_b"))
    },

    // D5: embedding-cosine near-dup, brute force over the pair space
    // (baseline; n2 is the bucketed scale path).
    "d5_embedding_neardup" -> { (s, d) =>
      Similarity.cosinePairs(Tables.embeddings(s, d), theta = 0.4)
        .canonOrder(col("vec_a"), col("vec_b"))
    },

    // D6: dedup APPLY — the pipeline step that consumes d2's pairs: drop
    // every doc that appears as the non-canonical (higher-id) side of a
    // verified near-dup pair, keeping the earliest copy. The corpus-build
    // shape: detect (d2) then filter (anti-join — one shuffle, no O(n²)).
    "d6_dedup_apply" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val drop = Dedup.minhashNearDup(docs, n = 3, theta = 0.8)
        .select(col("doc_b").as("doc_id")).distinct()
      docs.join(drop, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"))
        .canonOrder(col("doc_id"))
    },

    // D7: decontamination — the corpus-build step that drops training
    // docs near-duplicating a held-out evaluation set (id % 20 == 0 plays
    // the benchmark corpus). Same banded-LSH candidate machinery as d2,
    // consumed cross-corpus: a pair with exactly one eval side names a
    // contaminated train doc; anti-join it away. At 100 TB the eval
    // fingerprints are tiny and broadcast — the train side never
    // self-joins.
    "d7_decontaminate" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDup(docs, n = 3, theta = 0.8)
      val contaminated = pairs
        .filter((col("doc_a") % 20 === 0) =!= (col("doc_b") % 20 === 0))
        .select(when(col("doc_a") % 20 === 0, col("doc_b"))
          .otherwise(col("doc_a")).as("doc_id"))
        .distinct()
      docs.filter(col("doc_id") % 20 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"))
        .canonOrder(col("doc_id"))
    },

    // D11: EMBEDDING-space decontamination — d7's semantic cousin: drop
    // every train doc whose embedding sits within cosine θ of any held-out
    // eval vector (paraphrased benchmark leakage that shingle-Jaccard
    // misses). Scale shape mirrors d7: the eval set is tiny and BROADCAST;
    // the train corpus streams through one scoring pass and never
    // self-joins. Exact scaled-long cosine → full DuckDB oracle.
    "d11_semantic_decontaminate" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      val eval0 = v.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("eid"), col("embedding").as("ee"),
          Similarity.normScaled(col("embedding")).as("en"))
      val train = v.filter(col("vec_id") % 20 =!= 0)
      val contaminated = spreadPartitions(train)
        .select(col("vec_id"), col("embedding"),
          Similarity.normScaled(col("embedding")).as("tn"))
        .join(broadcast(eval0))
        .withColumn("cos", Similarity.cosineFromScaled(
          Similarity.dotScaled(col("embedding"), col("ee")),
          col("tn"), col("en")))
        .filter(col("cos") >= 0.4)
        .select(col("vec_id")).distinct()
      train.join(contaminated, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label").cast("long").as("label"))
        .canonOrder(col("vec_id"))
    },

    // D8: duplicate GROUPS — connected components over d2's verified
    // near-dup pairs (iterative min-label propagation; see
    // Dedup.connectedComponents for the scale story). Pairs alone can't
    // drive a keep-one policy: a chain A-B-C needs the component minimum,
    // not per-pair minima. Output: every doc in a dup group, its group id
    // (= component min doc_id) and the group size.
    "d8_dup_groups" -> { (s, d) =>
      val pairs = Dedup.minhashNearDup(Tables.documents(s, d), n = 3, theta = 0.8)
      val comp = Dedup.connectedComponents(pairs.select(col("doc_a"), col("doc_b")))
      val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("group_size"))
      comp.join(sizes, "comp")
        .select(col("id").as("doc_id"), col("comp").as("group_id"),
          col("group_size"))
        .canonOrder(col("group_id"), col("doc_id"))
    },

    // D10: group-correct dedup APPLY — keep exactly one doc (the minimum
    // id) per CONNECTED COMPONENT of near-dup pairs. d6's pair-based rule
    // (drop every pair's higher side) is not the same set: a doc that is
    // near-dup to the group but never a pair's higher side survives d6
    // (edges A-C, B-C with A<B<C keep both A and B) — components make
    // keep-one exact. Same anti-join shape at scale; the component labels
    // come from the d8 machinery.
    "d10_dedup_apply_groups" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDup(docs, n = 3, theta = 0.8)
      val comp = Dedup.connectedComponents(pairs.select(col("doc_a"), col("doc_b")))
      val drop = comp.filter(col("id") =!= col("comp"))
        .select(col("id").as("doc_id"))
      docs.join(drop, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"))
        .canonOrder(col("doc_id"))
    },

    // D9: SemDeDup-style semantic pruning — cluster the embedding space,
    // drop the higher id of every within-cluster pair with cosine ≥ θ.
    // Centroids here are the deterministic sample n3 uses (NOT trained),
    // which keeps the whole pipeline — assignment, candidate generation,
    // scoring, pruning — SQL-expressible, so this has a full DuckDB
    // oracle (the trained-centroid variant is n4's territory, recall-
    // bounded in ScalaTest). The scale story lives in
    // Similarity.semanticPrune: no global self-join, candidates bounded
    // by cluster occupancy.
    "d9_semantic_prune" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      Similarity.semanticPrune(v, v.filter(col("vec_id") % 50 === 0),
          theta = 0.4)
        .canonOrder(col("vec_id"))
    },

    // D12: bloom-pruned exact decontamination — the 100 TB shape of a
    // fingerprint semi-join. Direct exact decontamination shuffles the
    // whole train corpus by fingerprint; here the eval side's
    // fingerprints aggregate into ONE small bloom binary (Spark's own
    // runtime-filter sketch, lifted through the bridge) that broadcasts
    // and prunes train rows MAP-SIDE, and only the might-contain
    // survivors reach the exact confirm join. Bloom false positives are
    // killed by the confirm; false negatives don't exist — so the result
    // is EXACT and carries a plain SQL oracle, while the shuffled volume
    // tracks the (tiny) contamination rate instead of the corpus size.
    // Fingerprint = md5 of the first 5 normalized words (leading-snippet
    // leakage — quoted openings/headers), which is where this fixture's
    // cross-split duplication actually lives.
    "d12_bloom_decontaminate" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val fp = md5(array_join(slice(Text.words(col("text")), 1, 5),
        " "))
      val evalFps = docs.filter(col("doc_id") % 20 === 0)
        .select(fp.as("fp"))
      // scalar subquery: might_contain requires a constant/scalar bloom —
      // the engine plans the build once and broadcasts the binary, the
      // same shape as its own injected runtime filters
      val bloom = evalFps.agg(graft.plans.Expressions
        .bloomFilterAgg(xxhash64(col("fp")), 1000L, 16384L).as("bf"))
        .scalar()
      val train = docs.filter(col("doc_id") % 20 =!= 0)
        .select(col("doc_id"), col("lang"), col("source"), fp.as("fp"))
      val suspects = train
        .filter(graft.plans.Expressions
          .mightContain(bloom, xxhash64(col("fp"))))
        .select(col("doc_id"), col("fp"))
      // no broadcast hint: the suspects side is already bloom-pruned to
      // ~contamination volume and evalFps grows with the eval battery —
      // AQE broadcasts whichever side is genuinely small at runtime
      val confirmed = suspects
        .join(evalFps, Seq("fp"), "left_semi")
        .select(col("doc_id"))
      train.join(confirmed, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"))
        .canonOrder(col("doc_id"))
    },

    // T6: repetition ratio — Gopher-style boilerplate signal: the
    // fraction of word-trigram occurrences that are repeats of an
    // earlier trigram in the same doc. Both shingle forms come from the
    // codegen'd kernel (ShinglesExpr with/without distinct).
    "t6_repetition" -> { (s, d) =>
      val all = graft.plans.Expressions.shingles(col("text"), 3, distinct = false)
      val uniq = graft.plans.Expressions.shingles(col("text"), 3, distinct = true)
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(all).cast("long").as("n_shingles"),
          size(uniq).cast("long").as("n_unique"))
        .withColumn("rep_ratio",
          when(col("n_shingles") > 0L,
            round4(lit(1d) - col("n_unique").cast("double")
              / col("n_shingles").cast("double")))
            .otherwise(lit(0d)))
        .canonOrder(col("doc_id"))
    },

    // N1: brute-force cosine top-k ANN (probes = vec_id < 10, k = 5).
    "n1_ann_topk" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(v.filter(col("vec_id") < 10), v, k = 5)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N10: SQ8 scalar-quantized ANN — n1's search over a byte-per-
    // dimension index (4× smaller than float32, zero training beyond a
    // per-dim min/max pass); probes stay full-precision, candidates
    // score dequantized (the asymmetric SQ form). Every stage is
    // deterministic integer/IEEE arithmetic → full DuckDB oracle;
    // SimilaritySpec bounds recall vs n1.
    "n10_ann_sq8" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      Similarity.sq8TopK(v.filter(col("vec_id") < 10), v, k = 5)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N2: LSH-bucketed ANN — same output shape as n1, candidates from
    // random-hyperplane buckets only. Recall < 1 by design, but the hash
    // itself is deterministic: plane weights are splitmix64 constants and
    // projections accumulate scaled-long, so the ENTIRE path (codes →
    // buckets → candidates → exact re-rank) has a full DuckDB oracle
    // (sign matrix inlined as literals); SimilaritySpec keeps the recall
    // floor vs n1.
    "n2_ann_lsh" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      Similarity.lshTopK(v.filter(col("vec_id") < 10), v, k = 5)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N5: multi-probe LSH ANN — n2 plus Hamming-1 bucket probing on the
    // query side: recall rises at the SAME corpus-side signature cost
    // (tables cost a corpus-wide column; extra probes only cost the
    // small query side). Hash-verified like n2 (the probe expansion is
    // code XOR 1<<b — SQL-expressible); SimilaritySpec additionally
    // proves multi-probe recall dominates single-probe and clears a
    // floor single-probe doesn't.
    "n5_ann_multiprobe" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      Similarity.lshTopKMultiProbe(v.filter(col("vec_id") < 10), v, k = 5)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N3: IVF-bucketed ANN — centroid assignment + nprobe-bucket search,
    // the TEACHING form of the inverted file (the n8_fixed_bits
    // convention: kept as a labeled counterexample, NOT the geometry
    // you'd deploy): its stride-50 centroids make nlist ∝ n/50, which
    // is measured superlinear one decade up (SCALING r13_n13_ivfsq8 —
    // the production entries are n9/n13/n14, sampled/adaptive
    // training). It stays because every stage is deterministic
    // SQL-expressible arithmetic — unlike the hash-based n2/n5 — so n3
    // carries the family's simplest FULL DuckDB oracle (assignment,
    // probe buckets, candidate join, exact re-rank); SimilaritySpec
    // additionally bounds recall vs n1.
    "n3_ann_ivf" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      Similarity.ivfTopK(v.filter(col("vec_id") < 10), v,
        centroids = v.filter(col("vec_id") % 50 === 0), k = 5, nprobe = 8)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N12: FILTERED ANN — vector search under a metadata predicate, the
    // production "top-k among candidates WHERE label < 3" shape every
    // vector store serves: the predicate prunes candidates BEFORE the
    // bucket search (pre-filter — each probe still gets k results from
    // the filtered universe; post-filtering an unfiltered top-k would
    // return < k whenever the predicate is selective, the classic
    // filtered-search recall bug, demonstrated in SimilaritySpec). The
    // coarse quantizer stays corpus-wide (the index is built once;
    // predicates vary per query) and is the PRODUCTION geometry since
    // r14: adaptive-nlist sampled-trained centroids (nlist = ⌈√n⌉ from
    // one scalar count — the stride-50 demo form was measured
    // superlinear, SCALING r13_n12_filtered). The label predicate
    // reaches the embeddings parquet scan (PushedFilters, lint-pinned)
    // — at 100 TB the filter prunes row groups before any distance
    // math runs.
    "n12_ann_filtered" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      Similarity.ivfTopK(v.filter(col("vec_id") < 10),
        v.filter(col("label") < 3),
        centroids = Similarity.adaptiveTrainCentroids(v), k = 5,
        nprobe = 8)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N13: IVF + SQ8 composite — FAISS's "IVF,SQ8": coarse cells prune
    // candidates (full-precision assignment), byte-per-dim SQ8 values
    // score them — the middle ground of the quantization matrix beside
    // IVF-flat and IVF+PQ (n7). Since r14 the coarse quantizer is the
    // production geometry: sample-trained centroids with nlist = ⌈√n⌉
    // derived from COUNT(*) (Similarity.autoNlist — candidates/probe
    // and the broadcast table both grow as √n; the retired stride-50
    // form was measured superlinear, SCALING r13_n13_ivfsq8). Beside
    // it, n14 pins the fixed-nlist variant of the same composite.
    // Deterministic end to end → full DuckDB oracle (the adaptive-cell
    // CTEs derive the same nlist/moduli from COUNT(*), + n10's dequant
    // CTE).
    "n13_ann_ivfsq8" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      Similarity.ivfSq8TopK(v.filter(col("vec_id") < 10), v,
        centroids = Similarity.adaptiveTrainCentroids(v), k = 5,
        nprobe = 8)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N4: IVF with TRAINED centroids — two deterministic Lloyd iterations
    // over the deterministic sample n3 uses raw, then the same
    // nprobe-bucket search. Training is exact arithmetic (integer-domain
    // assignment, decimal-exact means), so the two iterations UNROLL into
    // SQL CTEs and n4 carries a full DuckDB oracle — the k-means itself
    // is hash-verified, not just recall-bounded (SimilaritySpec keeps the
    // recall floor and determinism checks).
    "n4_ann_ivf_trained" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      val trained = Similarity.kmeansCentroids(
        v, v.filter(col("vec_id") % 50 === 0), iters = 2)
      Similarity.ivfTopK(v.filter(col("vec_id") < 10), v,
        centroids = trained, k = 5, nprobe = 8)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N9: IVF with SAMPLE-BOUNDED training — the production answer to the
    // n4/n6/n7 scaling finding (their oracle-pinned geometry derives the
    // centroid count from n, making Lloyd O(n²)): train the SAME two
    // deterministic Lloyd iterations on a bounded modulus sample
    // (≤ ~2·400 vectors whatever the corpus size) seeded with a FIXED
    // ~16 centroids, then run the same nprobe-bucket search over the
    // full corpus. Training cost is constant in corpus size; assignment
    // and the candidate join are the linear passes IVF always pays
    // (SCALING.json carries the measured slope). Both moduli are pure
    // arithmetic over vec_id, so the whole path — sample, seeds, two
    // Lloyd iterations, full-corpus assignment, pruned search — unrolls
    // into SQL and n9 is hash-verified against a full DuckDB oracle.
    "n9_ann_ivf_sampled" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      val trained = Similarity.sampledTrainCentroids(
        v, targetSample = 400L, kCentroids = 16L, iters = 2)
      Similarity.ivfTopK(v.filter(col("vec_id") < 10), v,
        centroids = trained, k = 5, nprobe = 8)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N14: the PRODUCTION quantized composite — n9's sample-bounded
    // trained centroids (fixed ~16 cells whatever the corpus size; the
    // constant-cost training geometry) pruning candidates for n10's SQ8
    // byte scoring. This is the deployment shape the n12/n13 SCALING
    // notes point at: every training input is corpus-size-independent,
    // assignment is O(n·16) not O(n²/50), and the scored bytes are 4×
    // under float32. Fully deterministic → the oracle composes n9's
    // sampled-Lloyd CTE chain with n10's dequant CTE.
    "n14_ann_sq8_sampled" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      val trained = Similarity.sampledTrainCentroids(
        v, targetSample = 400L, kCentroids = 16L, iters = 2)
      Similarity.ivfSq8TopK(v.filter(col("vec_id") < 10), v,
        centroids = trained, k = 5, nprobe = 8)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N6: product-quantization ANN — the corpus compresses to m codebook
    // ids per vector (64 floats → 8 codes, the RAM-residency lever at
    // 100 TB; IVF prunes candidates, PQ shrinks them); queries score the
    // codes by integer table-lookup (ADC), then exact-re-rank only the
    // surviving shortlist. Codebooks are deterministic Lloyd with
    // SAMPLE-BOUNDED training (r12, closing the r11 weak mark): the
    // n9-style moduli derived from COUNT(*) cap the training set at
    // ~2·400 vectors and the codebook at ~40 codes whatever the corpus
    // size, retiring the measured-O(n²) fixed-stride geometry — and
    // because every stage is integer/decimal-exact arithmetic, the WHOLE
    // path (sampled subspace training, full-corpus encoding, ADC
    // scoring, shortlist, re-rank) unrolls into SQL CTEs: n6 is
    // hash-verified against a full DuckDB oracle that derives the SAME
    // moduli from COUNT(*), with SimilaritySpec keeping code-domain
    // bounds and the recall floor.
    "n6_ann_pq" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      Similarity.pqTopK(v.filter(col("vec_id") < 10), v, k = 5)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N7: IVF+PQ composite — the production serving shape (FAISS
    // IndexIVFPQ minus residual encoding): IVF cells bound how much of
    // the corpus a query touches (~nprobe/nlist), PQ codes make that
    // slice RAM-resident, ADC scores only the pruned candidates, the
    // shortlist re-ranks exactly. Both training stages are
    // sample-bounded since r12: centroids come from sampledTrainCentroids
    // (fixed ~16 trained cells — nlist no longer ∝ n) and the PQ
    // codebook from the sampled moduli (fixed ~40 codes), so in-query
    // training is constant-cost and only encoding/assignment pay the
    // linear pass. Deterministic end to end, so the whole composite
    // (sampled Lloyd ×2 + bucketing + encoding + pruned ADC + re-rank)
    // unrolls into one SQL oracle deriving the same moduli from COUNT(*).
    "n7_ann_ivfpq" -> { (s, d) =>
      val v = Tables.embeddings(s, d)
      Similarity.ivfPqTopK(v.filter(col("vec_id") < 10), v,
        centroids = Similarity.sampledTrainCentroids(
          v, targetSample = 400L, kCentroids = 16L, iters = 2),
        k = 5, nprobe = 8)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // N8: corpus-wide k-NN GRAPH — every vector gets its LSH-bucketed
    // top-k edge list. Unlike the n1-n7 serving paths (small probe
    // batch, broadcast), both join sides here are corpus-scale: the
    // candidate join is a plain shuffled self-equi-join on the bucket
    // key, the shape SemDeDup clustering and graph dedup consume.
    // Deterministic like n2 (same splitmix64 planes, scaled-long
    // projections), so the whole graph carries a full DuckDB oracle.
    // The code width is ADAPTIVE (r11, closing the r10 weak mark): one
    // scalar count() derives bits = autoBits(n) so per-bucket occupancy
    // — and with it the Σ bucket² candidate volume — stays bounded at
    // any corpus size; the fixed 4×6-bit calibration was measured
    // quadratic one decade above its SF (SCALING.json: 1.9 → 151.5 s
    // at 10×) while this rule's widths hold the slope near-linear
    // through 100×. The oracle derives the SAME width from COUNT(*).
    "n8_knn_graph" -> { (s, d) =>
      Similarity.knnGraphAuto(Tables.embeddings(s, d), k = 5)
        .canonOrder(col("probe_id"), col("rank"))
    },

    // T1: per-source corpus stats (doc counts, language spread, length
    // moments) — the triage pass before any filtering decision.
    "t1_text_stats" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("wc", size(Text.words(col("text"))))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("lang")).as("n_langs"),
          round4(davg(col("n_chars"))).as("avg_chars"),
          round4(davg(col("wc"))).as("avg_words"),
          max(col("wc")).cast("long").as("max_words"))
        .canonOrder(col("source"))
    },

    // T2: marker-word language-ID heuristic with fixed-precedence argmax.
    "t2_langid" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("lang_pred", Text.langPredict(col("text")))
        .select(col("doc_id"), col("lang"), col("lang_pred"),
          (col("lang") === col("lang_pred")).as("is_match"))
        .canonOrder(col("doc_id"))
    },

    // T3: rational-arithmetic quality score (stopword ratio + length
    // saturation + alpha ratio).
    "t3_quality_score" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), Text.qualityScore(col("text")).as("quality"))
        .canonOrder(col("doc_id"))
    },

    // T4: token counting — whitespace tokens + BPE-ish greedy chunk count.
    "t4_token_count" -> { (s, d) =>
      val norm = Text.normalize(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(norm).cast("long").as("n_chars_norm"),
          size(Text.words(col("text"))).cast("long").as("ws_tokens"),
          regexp_count(norm, lit("[a-z0-9]{1,3}")).cast("long")
            .as("subword_tokens"))
        .canonOrder(col("doc_id"))
    },

    // T5: document fingerprints — whole-doc md5 + min-shingle-hash
    // (winnowing-style representative hash).
    "t5_fingerprint" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(Text.normalize(col("text"))).as("doc_fp"),
          array_min(transform(Text.shingleSet(col("text"), 3), x => md5(x)))
            .as("min_shingle_fp"))
        .canonOrder(col("doc_id"))
    },

    // T7s: deterministic content-hash sampling — the reproducible
    // corpus-split technique (membership depends only on content, never on
    // partitioning or RNG state): keep docs whose first md5 nibble < 8,
    // i.e. a 50% split stable across runs, engines and cluster sizes.
    "t7_hash_sample" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(substring(md5(Text.normalize(col("text"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"))
        .select(col("doc_id"), col("lang"), col("source"))
        .canonOrder(col("doc_id"))
    },

    // T11: stratified deterministic sampling — the mixture-weighting pass
    // of a corpus build: per-language keep rates (en 100%, de/es 50%,
    // rest 25%), membership decided by a content-hash nibble, never RNG —
    // reproducible across runs, engines and cluster sizes, and nested
    // inside t7's 50% gate (same hash ⇒ the 50% sample of a stratum is a
    // subset of this one where rates allow). Pure map-side filter: no
    // shuffle, full predicate pushdown of the lang column.
    "t11_stratified_sample" -> { (s, d) =>
      val nib = substring(md5(Text.normalize(col("text"))), 1, 1)
      val half = Seq("0", "1", "2", "3", "4", "5", "6", "7")
      val keep = when(col("lang") === "en", lit(true))
        .when(col("lang").isin("de", "es"), nib.isin(half: _*))
        .otherwise(nib.isin("0", "1", "2", "3"))
      Tables.documents(s, d)
        .filter(keep)
        .select(col("doc_id"), col("lang"), col("source"))
        .canonOrder(col("doc_id"))
    },

    // T12: sequence packing — concatenate-and-split into fixed-token-
    // budget training chunks, the layout step between a cleaned corpus
    // and a pretraining dataloader. Docs are ordered by content
    // fingerprint within each (source, shard) — a deterministic global
    // shuffle, no RNG state — then a running token count assigns each
    // doc its chunk and offset: chunk = ⌊(cum-tok)/budget⌋, i.e.
    // documents span chunk boundaries exactly as GPT-style packing
    // concatenates then splits. The SHARD (first fingerprint nibble, 16
    // ways, oracle-expressible) is the 100 TB knob: partitioning the
    // cumsum by source alone makes one dominant source a single sorting
    // task — sharding bounds every window partition at 1/16th of a
    // source, and chunk ids are namespaced per (source, shard), which a
    // dataloader treats as independent pack files. One shuffle+sort, no
    // driver loop, no collect.
    "t12_seq_pack" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val budget = 512L
      val w = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("fp"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(Text.normalize(col("text"))).as("fp"),
          size(Text.words(col("text"))).cast("long").as("tok"))
        .withColumn("shard",
          expr("conv(substring(fp, 1, 1), 16, 10)").cast("long"))
        .withColumn("cum", sum(col("tok")).over(w))
        .select(col("doc_id"), col("source"), col("shard"), col("tok"),
          expr(s"(cum - tok) div $budget").as("chunk_id"),
          expr(s"(cum - tok) % $budget").as("chunk_offset"))
        .canonOrder(col("source"), col("shard"), col("chunk_id"),
          col("chunk_offset"), col("doc_id"))
    },

    // T23: pack MANIFEST — the dataloader-facing artifact t12's per-doc
    // rows feed: one row per packed sequence with its ordered boundary
    // map (offset:doc:tokens triples), doc count, and used-token count —
    // exactly what a training loader needs to build attention masks that
    // stop at document boundaries. The boundary map is a canonical
    // STRING, not an array column: deterministic, and the arrow-level
    // hash compare treats strings identically across engines (list
    // field-name metadata differs). The transform lambda runs per
    // PACKED SEQUENCE (post-aggregate, budget-bounded arrays), never
    // per corpus row, so interpreted-HOF cost is off the hot path.
    "t23_pack_manifest" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val budget = 512L
      val w = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("fp"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(Text.normalize(col("text"))).as("fp"),
          size(Text.words(col("text"))).cast("long").as("tok"))
        .withColumn("shard",
          expr("conv(substring(fp, 1, 1), 16, 10)").cast("long"))
        .withColumn("cum", sum(col("tok")).over(w))
        .withColumn("chunk_id", expr(s"(cum - tok) div $budget"))
        .withColumn("off", expr(s"(cum - tok) % $budget"))
        .groupBy(col("source"), col("shard"), col("chunk_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          max(col("off") + col("tok")).as("used_tokens"),
          expr("concat_ws(',', transform(" +
            "array_sort(collect_list(struct(off, doc_id, tok))), " +
            "s -> concat(cast(s.off as string), ':', " +
            "cast(s.doc_id as string), ':', cast(s.tok as string))))")
            .as("boundaries"))
        .canonOrder(col("source"), col("shard"), col("chunk_id"))
    },

    // T24: dataset card — the one-stop per-(source, lang) corpus report a
    // release ships beside the data: volume (docs, whitespace tokens),
    // quality (mean + gate-pass count reusing t3/t8's exact formula),
    // exact-duplicate exposure (docs whose d1 fingerprint occurs >1×
    // corpus-wide), and the word-count distribution (exact median + max).
    // Scale shape: one shuffle on the fingerprint (d1's), a join back
    // that reuses that partitioning, and a sort-based median via
    // partitioned window row_number — NOT exact `percentile`, whose
    // per-group value buffer is O(group) memory and dies on a
    // billion-doc (source, lang) group; the two middle ranks average in
    // double exactly like DuckDB's interpolation on integer ranks.
    // Batch and streaming share every expression through CorpusCard:
    // signals (wc/quality/fp projection) and the aggregate live there,
    // and Streams.cardMaintenance + CorpusCard.serve reproduce this
    // output bit-identically from accumulated micro-batch slices
    // (StreamingSpec pins the equality).
    "t24_dataset_card" -> { (s, d) =>
      import graft.operators.CorpusCard
      CorpusCard.card(CorpusCard.signals(Tables.documents(s, d)))
        .canonOrder(col("source"), col("lang"))
    },

    // T8s: quality-gate filter — the corpus-cleaning pass that consumes
    // t3's score: keep docs above a quality threshold in an allowed
    // language set, with the reasons projected for audit.
    "t8_quality_gate" -> { (s, d) =>
      val q = Text.qualityScore(col("text"))
      Tables.documents(s, d)
        .withColumn("quality", q)
        .filter(col("quality") >= 40d &&
          col("lang").isin("en", "de", "es"))
        .select(col("doc_id"), col("lang"), col("quality"))
        .canonOrder(col("doc_id"))
    },

    // T9s: character-trigram frequency profile per language — the feature
    // input a statistical language identifier trains on (top-5 trigrams
    // per lang with a deterministic tiebreak). Trigram generation is the
    // codegen'd char_ngrams kernel (plans/CharNgramsExpr): the Column form
    // (transform ∘ sequence ∘ substr) is an interpreted lambda, and
    // explode_outer instead of explode avoids the inferred size(...)>0
    // filter that would re-evaluate the normalize+ngram chain per row.
    "t9_char_ngrams" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val norm = Text.normalize(col("text"))
      val tris = Tables.documents(s, d)
        .select(col("lang"),
          explode_outer(graft.plans.Expressions.charNgrams(norm, 3))
            .as("tri"))
        .filter(col("tri").isNotNull)
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("tri"))
      tris.groupBy(col("lang"), col("tri"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .canonOrder(col("lang"), col("rn"))
    },

    // T13: corpus vocabulary statistics — document frequency per word and
    // an IDF-style rarity ratio, the corpus-level table behind stopword
    // induction and tf-idf quality features. Shape at scale: one explode
    // of per-doc DISTINCT words (array_distinct is map-side; no doc×doc
    // work), one groupBy(word) with map-side partial counts, a scalar
    // doc count broadcast in, top-50 under a total order. rarity is a
    // ratio, not ln(): IEEE division is bit-identical across engines,
    // libm logs are not.
    "t13_doc_freq" -> { (s, d) =>
      val words = Tables.documents(s, d)
        .select(explode_outer(array_distinct(Text.words(col("text"))))
          .as("word"))
      val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      words.groupBy(col("word")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(n))
        .withColumn("rarity",
          round4(col("n_docs").cast("double") / col("df")))
        .select(col("word"), col("df"), col("rarity"))
        .orderBy(col("df").desc, col("word"))
        .limit(50)
    },

    // T15: per-document keyword extraction — top-3 terms per doc under a
    // rarity-weighted score, score = tf × N / df (t13's ratio-form rarity
    // reused as the idf factor: IEEE division is bit-identical across
    // engines, libm logs are not — so this is the hash-verifiable cousin
    // of tf·log(N/df)). 100 TB shape: tf is one (doc, word) aggregate
    // with map-side partials; df aggregates tf again by word; the
    // tf⋈df join is a SHUFFLE join on word — df's cardinality is the
    // vocabulary, an unbounded aggregate, exactly what the r1 review said
    // never to broadcast; only the scalar doc count is broadcast. The
    // per-doc top-3 window partitions by doc_id (already the tf
    // distribution) with a (score desc, word) total order.
    "t15_tfidf_keywords" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val words = Tables.documents(s, d)
        .select(col("doc_id"), explode_outer(Text.words(col("text")))
          .as("word"))
      val tf = words.groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("word"))
      tf.join(df, "word")
        .crossJoin(broadcast(n))
        .withColumn("score",
          (col("tf") * col("n_docs")).cast("double") / col("df"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("word"), col("tf"),
          round4(col("score")).as("score"))
        .canonOrder(col("doc_id"), col("score").desc, col("word"))
    },

    // T14: statistical length-outlier filter — drop docs outside the
    // per-source [P5, P95] token-count band, the corpus-cleaning pass
    // driven by the corpus's OWN distribution instead of fixed cutoffs.
    // The 100 TB shape: pass 1 computes per-source thresholds (one
    // aggregate, rows = |sources|), pass 2 broadcasts them back into a
    // map-side filter — no sort, no window over the full corpus. The
    // thresholds stay internal to the predicate (no float output), and
    // integer token counts compared against interpolated thresholds are
    // ulp-robust across engines.
    "t14_length_outliers" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(Text.words(col("text"))).cast("long").as("tok"))
      val bounds = docs.groupBy(col("source"))
        .agg(expr("percentile(tok, 0.05)").as("lo"),
          expr("percentile(tok, 0.95)").as("hi"))
      docs.join(broadcast(bounds), "source")
        .filter(col("tok") >= col("lo") && col("tok") <= col("hi"))
        .select(col("doc_id"), col("source"), col("tok"))
        .canonOrder(col("doc_id"))
    },

    // M1: multimodal metadata join — documents ⋈ embeddings with an opaque
    // binary payload column (md5 bytes standing in for media bytes) and
    // typed metadata projected out of it.
    "m1_multimodal_meta" -> { (s, d) =>
      val m = md5(col("text"))
      Tables.documents(s, d)
        .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"),
          col("label").cast("long").as("label"),
          length(unhex(m)).cast("long").as("n_bytes"),
          size(col("embedding")).cast("long").as("emb_dim"),
          substring(m, 1, 8).as("header_hex"))
        .canonOrder(col("doc_id"))
    },

    // M2: REAL media decode in the mapPartitions codec shape (batch
    // iteration, one digest/codec instance per partition, typed output).
    // Per doc: synthesize a deterministic image (dims + gradient pattern
    // from the doc's md5 bytes), encode to actual PNG or BMP container
    // bytes, then DECODE those bytes back via javax.imageio.ImageIO and
    // extract features from the DECODED raster — width/height, the
    // pixel-value sum, and decode_ok = pixel-exact equality with the
    // synthesized ground truth. The oracle recomputes dims + pix_sum
    // from the same md5 arithmetic and expects decode_ok = true, so the
    // whole encode→bytes→decode round-trip is hash-verified. At 100 TB
    // the payload column would arrive from storage instead of being
    // synthesized; the decode stage (this one) is unchanged.
    "m2_media_extract" -> { (s, d) =>
      import s.implicits._
      // Stage 1 — ENCODE: synthesize a deterministic md5-parameterized
      // image per doc and emit it as an opaque `payload BINARY` column
      // (real PNG/BMP container bytes) with typed metadata — the
      // brief's literal media-column shape. At 100 TB this stage is a
      // storage read instead of a synthesis; the column shape and the
      // decode stage below are unchanged.
      val encoded = Tables.documents(s, d)
        // a null payload would NPE the codec kernel executor-side; the
        // contract (both engines) is decode-only-present, row-for-row
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          val digest = java.security.MessageDigest.getInstance("MD5")
          it.map { case (id, text) =>
            val p = digest.digest(text.getBytes("UTF-8"))
            val b0 = p(0) & 0xff; val b1 = p(1) & 0xff; val b2 = p(2) & 0xff
            val w = 8 + b1 % 24; val h = 8 + b2 % 24
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = (b0 + 7 * x + 13 * y) % 256
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            val codec = if (b0 % 2 == 0) "png" else "bmp"
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, codec, baos)
            MediaPayload(id, codec, baos.toByteArray, b0, w, h)
          }
        }
      // Stage 2 — DECODE: consume the binary column through ImageIO and
      // extract features from the DECODED raster. A narrow map over
      // stage 1 (no shuffle between them); decode_ok is pixel-exact
      // equality with the synthesis parameters carried in the metadata.
      encoded.mapPartitions { it =>
          it.map { mp =>
            val dec = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(mp.payload))
            val raster = dec.getRaster
            var pixSum = 0L
            var ok = dec.getWidth == mp.expect_w &&
              dec.getHeight == mp.expect_h
            var y = 0
            while (y < dec.getHeight) {
              var x = 0
              while (x < dec.getWidth) {
                val v = raster.getSample(x, y, 0)
                pixSum += v
                ok &&= v == (mp.expect_b0 + 7 * x + 13 * y) % 256
                x += 1
              }
              y += 1
            }
            MediaDecoded(mp.doc_id, mp.codec, dec.getWidth.toLong,
              dec.getHeight.toLong, pixSum, ok)
          }
        }
        .toDF()
        .canonOrder(col("doc_id"))
    },

    // M3: REAL multi-frame container decode + frame sampling (the m2
    // precedent, extended to video shape): every doc synthesizes an
    // ACTUAL animated-GIF payload — (b0 % 48)+2 full frames of
    // md5-derived dims, each a constant gray (b0 + 11·f) % 256 — then
    // the sampling stage opens the container through javax.imageio,
    // reads the REAL frame count back (ImageReader.getNumImages), and
    // decodes ONLY every 8th frame (reader.read(i) — the point of frame
    // sampling: untouched frames stay undecoded), emitting per-frame
    // dims + the decoded pixel value + decode_ok (frame count, dims,
    // and every pixel equal to the synthesis arithmetic). The oracle
    // recomputes the same md5 arithmetic and pins decode_ok = true, so
    // the encode→container→sampled-decode round-trip is hash-verified.
    // At 100 TB the payload column arrives from storage; this decode
    // stage is unchanged (one codec instance per partition, frames
    // sampled not enumerated).
    "m3_frame_sample" -> { (s, d) =>
      import s.implicits._
      val encoded = Tables.documents(s, d)
        .filter(col("text").isNotNull) // null payload contract, as m2
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          val digest = java.security.MessageDigest.getInstance("MD5")
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          it.map { case (id, text) =>
            val p = digest.digest(text.getBytes("UTF-8"))
            val b0 = p(0) & 0xff; val b1 = p(1) & 0xff; val b2 = p(2) & 0xff
            val nFrames = (b0 % 48) + 2
            val w = 8 + b1 % 8; val h = 8 + b2 % 8
            val baos = new java.io.ByteArrayOutputStream()
            val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            var f = 0
            while (f < nFrames) {
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val v = (b0 + 11 * f) % 256
              val raster = img.getRaster
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { raster.setSample(x, y, 0, v); x += 1 }
                y += 1
              }
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), null)
              f += 1
            }
            writer.endWriteSequence(); ios.close()
            VideoPayload(id, baos.toByteArray, b0, w, h, nFrames)
          }
        }
      encoded.mapPartitions { it =>
          val reader = javax.imageio.ImageIO
            .getImageReadersByFormatName("gif").next()
          it.flatMap { vp =>
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(vp.payload))
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true) // the DECODED count
            val out = (0 until n by 8).map { f =>
              val dec = reader.read(f)
              val expect = (vp.expect_b0 + 11 * f) % 256
              var ok = n == vp.expect_frames &&
                dec.getWidth == vp.expect_w && dec.getHeight == vp.expect_h
              var pix = -1L
              var y = 0
              while (y < dec.getHeight) {
                var x = 0
                while (x < dec.getWidth) {
                  val v = dec.getRGB(x, y) & 0xff
                  if (pix < 0) pix = v
                  ok &&= v == expect
                  x += 1
                }
                y += 1
              }
              FrameSampled(vp.doc_id, n.toLong, f.toLong, f * 40L,
                dec.getWidth.toLong, dec.getHeight.toLong, pix, ok)
            }
            iis.close()
            out
          }
        }
        .toDF()
        .canonOrder(col("doc_id"), col("frame_idx"))
    },

    // M4: REAL batched resize — the mapInPandas batch shape in Scala:
    // one codec per partition, frames processed in `grouped(batch)`
    // slices (a real kernel amortizes buffer setup per batch, not per
    // row). Per doc: synthesize the source image at md5-derived dims
    // filled with a constant gray, run an actual bilinear Graphics2D
    // resize fit-to-224 preserving aspect ratio, and read the output
    // dims + a center-pixel probe back from the RESIZED raster
    // (bilinear of a constant is that constant, so the probe verifies
    // the kernel really resampled the source). The oracle recomputes
    // the fit-to-224 arithmetic and pins resize_ok = true.
    "m4_media_resize" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .filter(col("text").isNotNull) // same null contract as m2
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          val digest = java.security.MessageDigest.getInstance("MD5")
          it.grouped(64).flatMap { chunk =>
            chunk.map { case (id, text) =>
              val p = digest.digest(text.getBytes("UTF-8"))
              val fill = p(1) & 0xff
              val w0 = 64 + (p(1) & 0xff) % 192 * 4
              val h0 = 64 + (p(2) & 0xff) % 192 * 4
              val (w1, h1) =
                if (w0 >= h0) (224, math.floor(h0 * 224.0 / w0).toInt)
                else (math.floor(w0 * 224.0 / h0).toInt, 224)
              val src = new java.awt.image.BufferedImage(
                w0, h0, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val buf = src.getRaster.getDataBuffer
                .asInstanceOf[java.awt.image.DataBufferInt].getData
              java.util.Arrays.fill(buf,
                (fill << 16) | (fill << 8) | fill)
              val dst = new java.awt.image.BufferedImage(
                w1, h1, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(src, 0, 0, w1, h1, null)
              g.dispose()
              val ok = dst.getWidth == w1 && dst.getHeight == h1 &&
                dst.getRaster.getSample(w1 / 2, h1 / 2, 0) == fill
              MediaResized(id, w0.toLong, h0.toLong, dst.getWidth.toLong,
                dst.getHeight.toLong, ok)
            }
          }
        }
        .toDF()
        .canonOrder(col("doc_id"))
    },

    // D13: exact n-gram-overlap decontamination — the GPT-3-style rule: a
    // train doc sharing ANY word n-gram with the held-out eval corpus
    // (doc_id % 20 == 0) is dropped. Stricter than d7's Jaccard-θ LSH (one
    // shared shingle suffices, no similarity floor) and wider than d12's
    // leading-snippet fingerprint (every position in the doc is checked).
    // Scale shape: the eval side's distinct n-grams are tiny relative to
    // the corpus and BROADCAST; the train side shingles map-side (codegen'd
    // kernel) into a broadcast semi-join — no shuffle ever carries
    // corpus-sized data, and a wider n (13 in the published recipes; 8
    // here to fit the fixture's 30-60-word docs) only shrinks the match
    // set.
    "d13_ngram_decontaminate" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val train = docs.filter(col("doc_id") % 20 =!= 0)
      val contaminated = Dedup.ngramContaminated(train,
        docs.filter(col("doc_id") % 20 === 0), n = 8)
      train.join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"))
        .canonOrder(col("doc_id"))
    },

    // D14: canonical-doc retention — keep the BEST doc per duplicate
    // group, not the lowest id: within each connected component of
    // verified near-dup pairs the survivor is the longest doc (n_chars
    // desc, doc_id tiebreak). This is the keep-one policy real corpus
    // builds want — truncated/clipped variants of a page often carry
    // LOWER ids than the full crawl, so d10's keep-earliest discards the
    // best copy. The winner per group is a hash aggregate (min_by over
    // the (-n_chars, doc_id) total order — map-side partials, no sort
    // window); group labels come from the d8 CC machinery.
    "d14_canonical_pick" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.canonicalPick(docs,
          Dedup.minhashNearDup(docs, n = 3, theta = 0.8))
        .select(col("doc_id"), col("lang"), col("source"))
        .canonOrder(col("doc_id"))
    },

    // D15: per-source boilerplate profiling — the C4/CCNet cleaning
    // step: non-overlapping 2-word chunks; a chunk repeating in >= 3
    // distinct docs of the SAME source is boilerplate (headers, nav,
    // license banners repeat within a crawl source; body text doesn't).
    // Per-doc chunk/boilerplate counts + ratio + the mostly-boilerplate
    // drop gate. Chunking is the map-side codegen shingle kernel at
    // stride w; the profile is two hash aggregations on (source, chunk)
    // and a shuffled join back — volume tracks token count, never pairs,
    // and nothing broadcasts (a big crawl source's boilerplate set is
    // unbounded).
    "d15_boilerplate" -> { (s, d) =>
      Dedup.boilerplateProfile(Tables.documents(s, d), w = 2, minDocs = 3)
        .canonOrder(col("doc_id"))
    },

    // D16: embedding-space duplicate groups — the SemDeDup-adjacent
    // composition n8's graph exists to feed: knnGraph edges at cosine
    // >= 0.3, kept only when MUTUAL (one-way edges chain a cluster hub
    // to its fringe and beyond; mutuality is the standard asymmetry
    // filter), then connected components. Every stage is deterministic
    // (n2-style LSH buckets, scaled-long cosine, min-label CC), so the
    // whole composition — graph, mutuality, grouping — hash-verifies
    // against one recursive DuckDB oracle.
    // Adaptive width since r11, same rule and rationale as n8 (the
    // fixed 4×6-bit pin measured 3.3 → 140.8 s at 10×).
    "d16_graph_dedup" -> { (s, d) =>
      Dedup.embeddingGraphGroupsAuto(Tables.embeddings(s, d), k = 5,
          theta = 0.3)
        .canonOrder(col("id"))
    },

    // D17: exact duplicated-substring spans — the Lee-et-al suffix-array
    // dedup signal, relationally: doc pairs sharing >= 10 CONSECUTIVE
    // tokens (one verbatim paragraph inside otherwise-different text sits
    // far below any Jaccard θ, yet is exactly the memorization-risk case).
    // Positional 5-grams → gram-hash equi-join → gaps-and-islands run
    // detection per (pair, diagonal). Join volume tracks SHARED grams,
    // never n²; the island window partitions per pair+diagonal.
    "d17_substring_runs" -> { (s, d) =>
      Dedup.substringRuns(Tables.documents(s, d), k = 5, minRun = 10)
        .canonOrder(col("doc_a"), col("doc_b"))
    },

    // T25: content-defined chunking — CDC boundaries from a rolling
    // window hash (see Dedup.cdcChunks): shift-robust variable chunks,
    // the storage-dedup complement to t21's fixed windows. Map-side
    // except one per-doc boundary fold; no cross-doc shuffle.
    "t25_cdc_chunks" -> { (s, d) =>
      Dedup.cdcChunks(Tables.documents(s, d), w = 8)
        .canonOrder(col("doc_id"), col("chunk_ix"))
    },

    // D18: CDC-chunk near-dup pairs — docs sharing >= 3 distinct chunk
    // fingerprints. The candidate generator CDC chunking exists for:
    // join volume tracks SHARED chunks (fingerprint equi-join). The
    // boilerplate cap (<= 16 docs per chunk) is ON and oracle-verified —
    // it is load-bearing: uncapped, stopword-run chunks shared by
    // hundreds of docs turn the self-join quadratic (measured 90 s at
    // 10× vs 3.9 s at 1× before the cap; see Dedup.cdcNearDup).
    "d18_cdc_neardup" -> { (s, d) =>
      Dedup.cdcNearDup(Tables.documents(s, d), w = 8, minShared = 3,
          maxDocsPerChunk = Some(16))
        .canonOrder(col("doc_a"), col("doc_b"))
    },

    // T19: hashed-linear quality classifier — the fastText-style scorer
    // the GPT-3/LLaMA data pipelines run over every candidate doc: each
    // token hashes into one of 1024 weight buckets (md5 → 16-bit → mod),
    // the model is the bucket weight vector (here a deterministic
    // pseudo-random stand-in — the real thing loads trained weights; the
    // scoring plumbing is identical), and the doc score is the mean
    // weight. Weights stay INTEGER milli-units through the aggregation —
    // a float sum would be partition-order-dependent — with ONE exact
    // long/long division at the end, so the score is engine-exact.
    // Map-side explode + one hash aggregate on doc_id: no cross-doc
    // shuffle at any corpus width.
    "t19_quality_classifier" -> { (s, d) =>
      val bkt = expr("conv(substring(md5(tok), 1, 4), 16, 10)")
        .cast("long") % 1024
      Tables.documents(s, d)
        .select(col("doc_id"), explode(Text.words(col("text"))).as("tok"))
        .select(col("doc_id"),
          ((bkt * 2654435761L) % 2001 - 1000).as("w_milli"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(col("w_milli")).as("s_milli"))
        .select(col("doc_id"), col("n_tok"),
          round4(col("s_milli").cast("double") /
            (col("n_tok") * 1000.0)).as("score"),
          (col("s_milli") > 0).as("keep"))
        .canonOrder(col("doc_id"))
    },

    // T20: unigram-surprisal quality filter — the CCNet perplexity gate
    // with the KenLM model replaced by the corpus's own unigram LM, in
    // integer bit-units so both engines agree exactly: a token seen cnt
    // times in a total-token corpus scores floor(log2(total/cnt)) bits
    // (length(bin(total div cnt)) - 1 — integer-only, no float log whose
    // last ulp could differ across libm implementations), and a doc's
    // score is mean bits per token (exact long sum, one IEEE division).
    // Head/middle/tail banding mirrors CCNet's perplexity terciles.
    // Scale: one vocab aggregate + a shuffled join back on the token —
    // the vocab is corpus-dependent and never broadcast (AQE decides).
    "t20_unigram_surprisal" -> { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(Text.words(col("text"))).as("tok"))
      val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val total = vocab.agg(sum(col("cnt")).as("total"))
      val bits = vocab.crossJoin(broadcast(total))
        .select(col("tok"),
          (length(bin(expr("total div cnt"))) - 1)
            .cast("long").as("bits"))
      tok.join(bits, Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(col("bits")).as("bits_sum"))
        .select(col("doc_id"), col("n_tok"), col("bits_sum"),
          round4(col("bits_sum").cast("double") / col("n_tok"))
            .as("avg_bits"),
          when(col("bits_sum") * 100 < col("n_tok") * 405, lit("head"))
            .when(col("bits_sum") * 100 < col("n_tok") * 425,
              lit("middle"))
            .otherwise(lit("tail")).as("band"))
        .canonOrder(col("doc_id"))
    },

    // T26: interpolated BIGRAM surprisal — t20 with conditional context.
    // A self-trained pure bigram LM is degenerate at the tails (a unique
    // context seen once scores 0 bits exactly like verbatim boilerplate),
    // so each token scores under the GEOMETRIC unigram/bigram mixture
    // √(P(w|prev)·P(w)) — in bit-units: ubits(w) + bbits(prev,w), both
    // floor(log2(count ratio)) integers (t20's length(bin(a div b))-1
    // trick — no libm log in a compared value), divided by 2 only in the
    // final per-doc mean. The first token has no context and scores
    // 2·ubits. Repetitive boilerplate scores low on BOTH components;
    // unique prose keeps its unigram mass — the CCNet perplexity shape
    // with a closed-form corpus-trained model. Scale: two shuffled
    // aggregates over transitions (bigram + context counts — the context
    // table derives from the SMALLER bigram table, not the corpus), the
    // t20 vocab aggregate, and shuffled joins back — nothing broadcast
    // except the one-row total; transitions are map-side arrays_zip
    // (codegen'd, no HOF lambda, no per-doc window shuffle).
    "t26_bigram_surprisal" -> { (s, d) =>
      val wl = Tables.documents(s, d)
        .select(col("doc_id"), Text.words(col("text")).as("w"))
      val tk = wl.select(col("doc_id"), posexplode(col("w")))
        .select(col("doc_id"), (col("pos") + 1).as("i"),
          col("col").as("tok"))
      val tr = wl.filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(arrays_zip(
          slice(col("w"), lit(1), size(col("w")) - 1).as("prev"),
          slice(col("w"), lit(2), size(col("w")) - 1).as("tok"))).as("z"))
        .select(col("doc_id"), col("z.prev").as("prev"),
          col("z.tok").as("tok"))
      val bg = tr.groupBy(col("prev"), col("tok"))
        .agg(count(lit(1)).as("c_big"))
      val cx = bg.groupBy(col("prev"))
        .agg(sum(col("c_big")).as("c_ctx"))
      val tb = bg.join(cx, Seq("prev"))
        .select(col("prev"), col("tok"),
          (length(bin(expr("c_ctx div c_big"))) - 1)
            .cast("long").as("bbits"))
      val v = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val tot = v.agg(sum(col("cnt")).as("total"))
      val ub = v.crossJoin(broadcast(tot))
        .select(col("tok"),
          (length(bin(expr("total div cnt"))) - 1)
            .cast("long").as("ubits"))
      val us = tk.join(ub, Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), sum(col("ubits")).as("usum"))
      val fd = tk.filter(col("i") === 1).join(ub, Seq("tok"))
        .select(col("doc_id"), col("ubits").as("u1"))
      val td = tr.join(tb, Seq("prev", "tok"))
        .groupBy(col("doc_id")).agg(sum(col("bbits")).as("bsum"))
      us.join(fd, Seq("doc_id"))
        .join(td, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tok"),
          (col("usum") + col("u1") + coalesce(col("bsum"), lit(0L)))
            .as("bits_sum"))
        .select(col("doc_id"), col("n_tok"), col("bits_sum"),
          round4(col("bits_sum").cast("double") / (col("n_tok") * 2))
            .as("avg_bits"),
          when(col("bits_sum") * 100 < col("n_tok") * 2 * 410, lit("head"))
            .when(col("bits_sum") * 100 < col("n_tok") * 2 * 420,
              lit("middle"))
            .otherwise(lit("tail")).as("band"))
        .canonOrder(col("doc_id"))
    },

    // T27: BPE merge training — the four most-frequent adjacent-symbol
    // merges over the corpus's word-frequency table (operators/Tokenize:
    // one corpus pass, then vocab-sized iterations; self-pairs excluded
    // so application is a pure per-position map). Output carries
    // n_syms_after — the corpus symbol count after EACH rewrite — so the
    // oracle verifies every intermediate application, not just the four
    // argmaxes.
    "t27_bpe_merges" -> { (s, d) =>
      Tokenize.bpeMerges(Tables.documents(s, d), k = 4)
        .canonOrder(col("step"))
    },

    // T27b: the PRODUCTION trainer — one corpus pass collects the
    // bounded (word, freq) vocabulary, the merge loop runs in-process
    // with an incremental pair index (no per-step Spark jobs; a 32k
    // vocab trains in seconds where the distributed loop would pay
    // ~100k serial driver round-trips). Bit-identical to t27 by
    // construction (same counts, same UTF-8 tie order) — the same
    // DuckDB oracle verifies it, and TokenizeSpec pins local ≡
    // distributed on dense-tie corpora.
    "t27b_bpe_local" -> { (s, d) =>
      Tokenize.bpeMergesLocal(Tables.documents(s, d), k = 4)
        .canonOrder(col("step"))
    },

    // T28: corpus encoding under the t27 tokenizer — per-doc BPE token
    // counts via a vocab lookup (doc words ⋈ the trained segmentation),
    // the number a training-budget plan starts from. Verifies the train
    // → apply loop end to end: the oracle re-derives the segmentation
    // through its own four unrolled merge steps.
    "t28_bpe_encode" -> { (s, d) =>
      Tokenize.bpeEncode(Tables.documents(s, d), k = 4)
        .canonOrder(col("doc_id"))
    },

    // T29: DSIR importance weights — data selection via importance
    // resampling (Xie et al. 2023): score every document by how much its
    // hashed n-gram feature distribution looks like a TARGET set (here
    // lang='en', the in-domain proxy) versus the whole corpus. Features
    // are unigrams + space-joined bigrams hashed into 1024 buckets (the
    // t19 md5-nibble bucket, both engines replay it); bucket weight is
    // the add-one-smoothed log-ratio in floor-log2 integer bit-units
    // (flog2(cnt_t+1) + flog2(S+B)) − (flog2(cnt_a+1) + flog2(T+B)) —
    // defined AS the sum of floor-logs, so no product ever overflows
    // Int64 at any corpus size. Scale shape: features are map-side; the
    // bucket table is ≤1024 rows (broadcast hash join, bounded by
    // construction); the only corpus shuffles are the bucket aggregate
    // (1024 groups, map-side partials) and the per-doc sum.
    // (operators/Selection.dsirWeights; the −0.08 bits/feature cut is
    // calibrated — keeps 67% of en vs ~22% of the other langs at sf0.01)
    "t29_dsir_weights" -> { (s, d) =>
      graft.operators.Selection.dsirWeights(
        Tables.documents(s, d), isTarget = col("lang") === "en",
        hash = graft.operators.Selection.md5Bucket(1024))
        .canonOrder(col("doc_id"))
    },

    // T21: retrieval chunking — the RAG indexing step: overlapping
    // fixed-size token windows (16 tokens, stride 12) per doc, each with
    // its ordinal, start offset, token count, and an md5 content
    // fingerprint (the join key a downstream embedding/index stage would
    // carry). Pure map-side sequence + explode + slice — no shuffle at
    // any corpus width; chunk count derives from the doc's own length.
    "t21_chunk_windows" -> { (s, d) =>
      val W = 16; val S = 12
      val base = Tables.documents(s, d)
        .select(col("doc_id"), Text.words(col("text")).as("w"))
        .withColumn("len", size(col("w")).cast("long"))
        .withColumn("nc",
          when(col("len") <= W, lit(1L)).otherwise(
            expr(s"(len - $W + $S - 1) div $S") + 1))
      base.select(col("doc_id"), col("w"), col("len"),
          explode(sequence(lit(0L), col("nc") - 1)).as("ci"))
        .withColumn("start_tok", col("ci") * S)
        .withColumn("n_tok", least(lit(W.toLong), col("len") - col("start_tok")))
        .select(col("doc_id"), col("ci").as("chunk_idx"), col("start_tok"),
          col("n_tok"),
          md5(concat_ws(" ",
            slice(col("w"), (col("start_tok") + 1).cast("int"),
              col("n_tok").cast("int")))).as("chunk_fp"))
        .canonOrder(col("doc_id"), col("chunk_idx"))
    },

    // T22: BM25 document retrieval — relevance-ranked full-text search
    // over the corpus (the serving counterpart of t21's chunk index; the
    // reference's nearest shape is the multi-key exact/ci token lookup,
    // api/util/resolve-token.js:10-28 — lookup, not ranking; relevance
    // ranking is builder-brief scope). Scoring is BM25 with the rational
    // Robertson idf and the k1=6/5, b=3/4 saturation term reduced to
    // L-normalized Int64-safe integer factors combined in a fixed IEEE
    // operation order, so the doubles hash-match DuckDB bit-for-bit (t15/t20
    // precedent: no libm log in a compared value). Scale shape: the tf
    // aggregate sees only `word IN terms` rows (map-side filter before
    // the shuffle); N/L/df are tiny broadcast aggregates; ranking is
    // TakeOrdered(20). The postings-artifact serving twin
    // (Retrieval.buildPostings/bm25FromPostings) is spec-pinned equal
    // and benched separately.
    "t22_bm25_topk" -> { (s, d) =>
      Retrieval.bm25TopK(Tables.documents(s, d),
        Seq("dup", "vector", "merge", "scan"), 20)
    },

    // T32: hybrid retrieval — t22's BM25 leg + n1's cosine leg fused by
    // reciprocal rank (RRF), the standard production RAG-serving
    // combiner: the query is doc 0 (its embedding = the encoded query,
    // the t22 term list = its keywords), each leg ranks its top-50, and
    // the fused score is 1/(60+rank) summed across legs (0 where a leg
    // missed the doc — the full-outer fusion). Rank-based fusion keeps
    // the incomparable BM25/cosine scales apart AND keeps the oracle
    // exact: both addends are one IEEE division of small integers, so
    // the t22 + n1 bit-exactness contracts compose. Scale shape: the
    // corpus-scale work is inside the two legs (each one pass ending in
    // top-50); the fusion join and final top-20 touch ≤100 rows at any
    // corpus size.
    "t32_hybrid_rrf" -> { (s, d) =>
      Retrieval.hybridRrfTopK(Tables.documents(s, d),
        Seq("dup", "vector", "merge", "scan"), Tables.embeddings(s, d),
        probeId = 0L, k = 20)
        .canonOrder(col("doc_id"))
    },

    // API5: search-result facets — the serving composite every search
    // UI pairs with t22's ranked hits (the reference's token list route
    // returns grouped/ranked sections over joined aggregates,
    // api/routes/tokens.js:193-241; facet counts are the corpus
    // analogue): for docs matching
    // ANY query term, doc and char counts per (lang, source). Pure
    // integers (no score in the output), so the oracle is exact. Scale
    // shape: arrays_overlap is a map-side per-row membership test — no
    // explode, no shuffle before the facet aggregate, whose cardinality
    // is |langs|×|sources|, never corpus-scale.
    "api5_search_facets" -> { (s, d) =>
      val terms = Seq("dup", "vector", "merge", "scan")
      Tables.documents(s, d)
        .filter(arrays_overlap(Text.words(col("text")),
          array(terms.map(lit): _*)))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .canonOrder(col("lang"), col("source"))
    },

    // T18: deterministic stratified dataset split — the reproducible
    // train/val/test assignment every corpus release needs: membership
    // by a salted content-independent hash of doc_id (the t7/t11/t17
    // idiom), 80/10/10 via integer byte thresholds (204/230 of 256), so
    // the same doc lands in the same split on any engine, run, or
    // partitioning, and new docs never reshuffle old assignments. Pure
    // map-side projection — no shuffle at any corpus width.
    "t18_split_assign" -> { (s, d) =>
      val b0 = conv(substring(md5(
        concat(lit("split:"), col("doc_id").cast("string"))), 1, 2),
        16, 10).cast("long")
      Tables.documents(s, d)
        .withColumn("split",
          when(b0 < 204, lit("train"))
            .when(b0 < 230, lit("val"))
            .otherwise(lit("test")))
        .select(col("doc_id"), col("lang"), col("split"))
        .canonOrder(col("doc_id"))
    },

    // T16: PII redaction — regex detect-and-mask of emails and IPv4s, the
    // compliance pass before a corpus ships. The fixture text carries no
    // PII, so the entry first INJECTS deterministic synthetic PII (derived
    // from doc_id — both engines build the identical string) and then
    // proves the detector/redactor round-trip: match counts + an md5
    // fingerprint of the redacted text. Pure map-side codegen'd regexp —
    // no shuffle at any corpus width; the patterns stay in the
    // Java∩RE2-compatible subset so the oracle evaluates them verbatim.
    "t16_pii_redact" -> { (s, d) =>
      val id = col("doc_id").cast("string")
      val aug = concat(col("text"), lit(" contact user"), id,
        lit("@example.com"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" cc admin"), id, lit("@mail.example.org")))
          .otherwise(lit("")),
        lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), ((col("doc_id") * 7) % 256).cast("string"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          Text.piiCount(aug, Text.emailPattern).as("n_emails"),
          Text.piiCount(aug, Text.ipv4Pattern).as("n_ips"),
          md5(Text.redactPii(aug)).as("redacted_fp"))
        .canonOrder(col("doc_id"))
    },

    // T17: domain-mixture sampling — downsample each source to a target
    // mixture share (weight = srcNum % 4 + 1) of a global budget (half
    // the corpus). Membership is decided by a content-independent hash of
    // doc_id — reproducible across runs/engines/partitionings like t7/t11,
    // but RATE-DRIVEN: per-source keep thresholds derive from the observed
    // per-source counts (one tiny aggregate, broadcast back to a map-side
    // filter), so the same mixture spec rebalances any corpus snapshot.
    // All threshold math is integer — no float rate can drift between
    // engines — and a source whose target exceeds its count keeps
    // everything (threshold tops out past the 8-bit hash range).
    "t17_domain_mix" -> { (s, d) =>
      // try_cast + uncapped substring: IDENTICAL parse to the oracle's
      // TRY_CAST(substr(source,4)) — a non-'src<digits>' source yields a
      // null weight on BOTH engines (and so is dropped by both), instead
      // of Spark silently nulling where DuckDB errors
      domainMix(Tables.documents(s, d),
          expr("try_cast(substring(source, 4) AS BIGINT)") % 4 + 1)
        .select(col("doc_id"), col("lang"), col("source"))
        .canonOrder(col("doc_id"))
    },

    // PIPE1: the corpus build, COMPOSED — the capstone chain a training-
    // data release actually runs, every stage one of the independently-
    // verified operators, each applied to the SURVIVORS of the previous:
    //   1. exact dedup (d1): keep the first copy of each normalized text
    //   2. boilerplate gate (d15): drop mostly-boilerplate docs (profile
    //      computed over the deduped survivors, not the raw corpus)
    //   3. quality gate (t8): score >= 40 in an allowed language set
    //   4. domain mix (t17): rebalance sources to weight/Σw shares of
    //      half the surviving corpus
    //   5. split assign (t18): salted 80/10/10 train/val/test
    // One declarative plan end to end — Catalyst sees the whole chain
    // (the dedup/boilerplate gates are semi-joins, no materialization
    // barrier between stages) — and every stage is deterministic, so the
    // COMPOSITION hash-verifies against a single DuckDB CTE chain.
    // T30: deterministic EPOCH SHUFFLE — the training-order permutation
    // a dataloader consumes each epoch: global order = (shard, ordinal)
    // where shard is a seeded content-hash bucket and ordinal ranks
    // within the shard by the same hash. Changing the seed permutes the
    // corpus; the same seed reproduces it on any engine/partitioning.
    // The window is PARTITIONED (16 shards) — a single global
    // row_number would be one task; sharded ordinals keep the sort
    // distributed and the (shard, ordinal) pair is still a total order.
    "t30_epoch_shuffle" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val h = md5(concat(lit("ep1:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), h.as("h"))
        .withColumn("shard",
          conv(substring(col("h"), 1, 2), 16, 10).cast("long") % 16)
        .withColumn("ordinal", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("ordinal"))
        .canonOrder(col("shard"), col("ordinal"))
    },

    // T31: fractional SOURCE UPSAMPLING — the Pile/LLaMA-style mixture
    // where a high-quality source runs >1 epoch (possibly fractional,
    // e.g. 1.5): integer part replicates every doc, the half-epoch
    // remainder replicates a deterministic content-hash coin-flip half.
    // Weights here derive from the source id (2..6 half-epochs → 1.0 to
    // 3.0); a real build reads them from config through the same
    // integer plumbing. Pure map-side explode — no shuffle at any
    // corpus width; replica_idx keys downstream dedup-aware stages.
    "t31_source_upsample" -> { (s, d) =>
      val wHalf = expr("try_cast(substring(source, 4) AS BIGINT)") % 5 + 2
      val b0 = conv(substring(md5(
        concat(lit("up:"), col("doc_id").cast("string"))), 1, 2),
        16, 10).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("wh", wHalf)
        .withColumn("n_rep",
          expr("wh div 2")
            + when(col("wh") % 2 === 1 && b0 < 128, 1L).otherwise(0L))
        .select(col("doc_id"), col("source"), col("n_rep"),
          explode(sequence(lit(1L), col("n_rep"))).as("replica_idx"))
        .canonOrder(col("doc_id"), col("replica_idx"))
    },

    // PIPE2: the selection-era corpus build — DSIR importance gate
    // (t29's keep cut) → exact dedup (d1's keep-first rule) → sequence
    // packing (t12's budgeted cumsum). Each stage is individually
    // oracle-green; the composition verifies they COMPOSE (the gate's
    // survivors feed dedup feed packing — chunk offsets depend on every
    // upstream decision). Same scale shape as the stages themselves:
    // the selection model is a ≤1024-row broadcast, dedup is one
    // fingerprint aggregate + semi-join, packing is a partitioned
    // window over (source, 16-way shard).
    "pipe2_select_pack" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val kept = docs.join(
        graft.operators.Selection.dsirWeights(docs,
            isTarget = col("lang") === "en",
            hash = graft.operators.Selection.md5Bucket(1024))
          .filter(col("keep")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      val uniq = kept.join(
        Dedup.exactDedup(kept).select(col("keep_doc_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      val budget = 512L
      val w = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("fp"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      uniq
        .select(col("doc_id"), col("source"),
          md5(Text.normalize(col("text"))).as("fp"),
          size(Text.words(col("text"))).cast("long").as("tok"))
        .withColumn("shard",
          expr("conv(substring(fp, 1, 1), 16, 10)").cast("long"))
        .withColumn("cum", sum(col("tok")).over(w))
        .select(col("doc_id"), col("source"), col("shard"), col("tok"),
          expr(s"(cum - tok) div $budget").as("chunk_id"),
          expr(s"(cum - tok) % $budget").as("chunk_offset"))
        .canonOrder(col("source"), col("shard"), col("chunk_id"),
          col("chunk_offset"), col("doc_id"))
    },

    "pipe1_corpus_build" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val s1 = docs.join(
        Dedup.exactDedup(docs).select(col("keep_doc_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      val s2 = s1.join(
        Dedup.boilerplateProfile(s1, w = 2, minDocs = 3)
          .filter(col("keep")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      val s3 = s2.filter(Text.qualityScore(col("text")) >= 40d &&
        col("lang").isin("en", "de", "es"))
      val s4 = domainMix(s3,
        expr("try_cast(substring(source, 4) AS BIGINT)") % 4 + 1)
      val b0 = conv(substring(md5(
        concat(lit("split:"), col("doc_id").cast("string"))), 1, 2),
        16, 10).cast("long")
      s4.withColumn("split",
          when(b0 < 204, lit("train"))
            .when(b0 < 230, lit("val"))
            .otherwise(lit("test")))
        .select(col("doc_id"), col("lang"), col("source"), col("split"))
        .canonOrder(col("doc_id"))
    }
  )

  /** t17's core, factored for testing with constructed corpora: keep each
    * source's docs at a rate targeting `weight/Σweights` of a global
    * budget (half the corpus), membership by a content-independent md5 of
    * doc_id. Thresholds derive from the observed per-source counts (one
    * tiny aggregate, broadcast back to a map-side filter); all threshold
    * math is integer so no float rate drifts between engines; a source
    * whose target exceeds its count keeps everything.
    */
  def domainMix(docs: DataFrame, weight: org.apache.spark.sql.Column)
      : DataFrame = {
    val cnts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w", weight)
    val tot = cnts.agg(sum(col("cnt")).as("n"), sum(col("w")).as("wsum"))
    val thr = cnts.crossJoin(broadcast(tot))
      .withColumn("thr", expr("(256 * (n div 2) * w) div (wsum * cnt)"))
      .select(col("source"), col("thr"))
    val b0 = expr(
      "conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10)")
      .cast("long")
    docs.join(broadcast(thr), Seq("source"))
      .filter(b0 < col("thr"))
  }

  // ---- oracle SQL ----

  /** t27 twin: k BPE merge steps unrolled into CTE chains (the n4/n6
    * unrolled-Lloyd precedent). Pair extraction is an (i, i+1)
    * positional self-join per word; the rewrite is the same exclusive
    * per-position CASE the Spark transform applies (l ≠ r guarantees
    * non-overlap); every count stays BIGINT.
    */
  private def bpeOracle(k: Int): String = {
    val rows = (1 to k).map { n =>
      s"""SELECT CAST($n AS BIGINT) AS step, l AS "left", r AS "right",
           l || r AS merged, cnt AS pair_count,
           (SELECT n_syms_after FROM s$n) AS n_syms_after FROM m$n"""
    }.mkString(" UNION ALL ")
    s"""WITH ${bpeCtes(k)}
         SELECT * FROM ($rows) ORDER BY step"""
  }

  /** The k-step CTE chain shared by the t27 (merge table) and t28
    * (corpus encode) oracles: wf/w0 initialization plus per-step
    * t/p/m/w/s CTEs; w$k is the final segmentation.
    */
  private def bpeCtes(k: Int): String = {
    val steps = (1 to k).map { n =>
      s"""t$n AS (SELECT word, freq, unnest(s) AS sym,
                  generate_subscripts(s, 1) AS i FROM w${n - 1}),
         p$n AS (SELECT a.sym AS l, b.sym AS r,
                  CAST(sum(a.freq) AS BIGINT) AS cnt
                FROM t$n a JOIN t$n b
                  ON a.word = b.word AND b.i = a.i + 1
                WHERE a.sym <> b.sym GROUP BY 1, 2),
         m$n AS (SELECT l, r, cnt FROM p$n
                 ORDER BY cnt DESC, l, r LIMIT 1),
         w$n AS (SELECT word, freq,
                  list_filter(list_transform(range(1, len(s) + 1), i ->
                    CASE WHEN i < len(s) AND s[i] = l AND s[i+1] = r
                           THEN l || r
                         WHEN i > 1 AND s[i-1] = l AND s[i] = r
                           THEN NULL
                         ELSE s[i] END), x -> x IS NOT NULL) AS s
                FROM w${n - 1}, m$n),
         s$n AS (SELECT CAST(sum(freq * len(s)) AS BIGINT)
                   AS n_syms_after FROM w$n)"""
    }.mkString(",\n         ")
    s"""wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+')) AS word
                 FROM documents)
           WHERE length(word) > 0 GROUP BY 1),
         w0 AS (SELECT word, freq,
                  list_append(list_transform(range(1, length(word) + 1),
                    i -> substring(word, i, 1)), '</w>') AS s
                FROM wf),
         $steps"""
  }

  /** DuckDB twin of `conv(substring(md5(e),1,4),16,10) % 1024` — the
    * t19/t29 hashed-feature bucket (DuckDB has no base-conv; four
    * strpos nibbles rebuild the same 16-bit value).
    */
  private def duckBkt(e: String): String =
    s"""(16*16*16*(strpos('0123456789abcdef', substr(md5($e),1,1))-1)
       +16*16*(strpos('0123456789abcdef', substr(md5($e),2,1))-1)
       +16*(strpos('0123456789abcdef', substr(md5($e),3,1))-1)
       +(strpos('0123456789abcdef', substr(md5($e),4,1))-1)) % 1024"""

  /** t29's CTE chain (through the per-doc sums, `dper`), shared with
    * the pipe2 composition oracle. Occupied-bucket weights only — the
    * Spark side's full-bucket table adds rows no feature joins, so the
    * totals and every joined weight are identical.
    */
  private def dsirCtes: String =
    s"""wl AS (SELECT doc_id, lang,
           regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+') AS w
         FROM documents),
         tkp AS (SELECT doc_id, lang, unnest(w) AS tok,
                   generate_subscripts(w, 1) AS i FROM wl),
         fs AS (SELECT doc_id, lang, tok AS f FROM tkp
                UNION ALL
                SELECT a.doc_id, a.lang, a.tok || ' ' || b.tok AS f
                FROM tkp a JOIN tkp b
                  ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         feats AS (SELECT doc_id, lang, ${duckBkt("f")} AS bkt FROM fs),
         ac AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cnt_a
                FROM feats GROUP BY 1),
         tc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cnt_t
                FROM feats WHERE lang = 'en' GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS s_tot,
                   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                     AS BIGINT) AS t_tot
                 FROM feats),
         bt AS (SELECT ac.bkt,
                  (CAST(length(bin(COALESCE(tc.cnt_t, 0) + 1)) - 1
                     AS BIGINT)
                   + CAST(length(bin(s_tot + 1024)) - 1 AS BIGINT))
                - (CAST(length(bin(ac.cnt_a + 1)) - 1 AS BIGINT)
                   + CAST(length(bin(t_tot + 1024)) - 1 AS BIGINT)) AS sb
                FROM ac LEFT JOIN tc USING (bkt), tot),
         dper AS (SELECT doc_id, count(*) AS n_feat,
                   CAST(sum(sb) AS BIGINT) AS score_bits
                 FROM feats JOIN bt USING (bkt) GROUP BY 1)"""

  /** DuckDB twin of Text.markerCount (space-padded split-count). */
  private def duckMarker(m: String): String =
    s"(len(string_split(' ' || regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+', ' ', 'g') || ' ', ' $m ')) - 1)"

  private def duckLangScore(lang: String): String =
    Text.langMarkers.toMap.apply(lang).map(duckMarker).mkString(" + ")

  /** Fixed-precedence argmax CASE chain mirroring Text.langPredict. */
  private val duckLangCase: String = {
    val langs = Text.langMarkers.map(_._1)
    val branches = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1)
      val cond = rest.map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }
    s"CASE ${branches.mkString(" ")} ELSE '${langs.last}' END"
  }

  private def duckCos(a: String, b: String): String =
    s"CAST(SUM(CAST(floor($a*$b*1e16) AS BIGINT)) AS DOUBLE) / " +
      s"(sqrt(CAST(SUM(CAST(floor($a*$a*1e16) AS BIGINT)) AS DOUBLE)) * " +
      s"sqrt(CAST(SUM(CAST(floor($b*$b*1e16) AS BIGINT)) AS DOUBLE)))"

  private val duckUnnest =
    """SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
       FROM embeddings"""

  /** IVF cell-assignment CTEs (cu/vc/vr) of the stride-50 TEACHING form
    * — n3's oracle only since r14 (n12/n13 moved to the adaptive cells;
    * the shared-owner convention follows lshOracle's for hash-family
    * SQL).
    */
  private val duckIvfAssign =
    s"""cu AS (SELECT vec_id AS cid, x AS cx, i FROM u
                WHERE vec_id % 50 = 0),
         vc AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                FROM u a JOIN cu b ON a.i = b.i GROUP BY 1, 2),
         vr AS (SELECT vec_id, cid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM vc)"""

  /** Shared sampled-Lloyd cell CTEs (prm → vr) — one owner for the
    * n9/n14 oracles: COUNT(*)-derived moduli bound the training sample
    * (~400 vectors) and seed count (~16), two decimal-exact Lloyd
    * iterations over the sample, then the whole corpus assigns to the
    * trained centroids (vr ranks every vector's cells).
    */
  private val duckSampledCells: String = duckLloydCells(
    s"""prm AS (SELECT greatest(1, count(*) // 400) AS md
                 FROM embeddings),
         su AS (SELECT u.* FROM u, prm WHERE u.vec_id % prm.md = 0),
         prm2 AS (SELECT prm.md * greatest(1, count(DISTINCT su.vec_id) // 16)
                    AS sd
                  FROM su, prm GROUP BY prm.md)""")

  /** The ADAPTIVE-nlist prelude (n12/n13 since r14): same sampled-Lloyd
    * chain, but the seed count derives from COUNT(*) via the
    * [[graft.operators.Similarity.autoNlist]] rule — nlist =
    * max(16, ⌈√n⌉), training sample targets 32 points per centroid.
    * ⌈√n⌉ of an exact integer count is the same IEEE double in both
    * engines, so the whole derivation chain (count → nlist → moduli)
    * replays bit-for-bit.
    */
  private val duckAdaptiveCells: String = duckLloydCells(
    s"""nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
         kl AS (SELECT greatest(16, CAST(ceil(sqrt(CAST(n AS DOUBLE)))
                    AS BIGINT)) AS nl FROM nv),
         prm AS (SELECT greatest(1, nv.n // (32 * kl.nl)) AS md
                 FROM nv, kl),
         su AS (SELECT u.* FROM u, prm WHERE u.vec_id % prm.md = 0),
         prm2 AS (SELECT prm.md
                    * greatest(1, count(DISTINCT su.vec_id) // kl.nl) AS sd
                  FROM su, prm, kl GROUP BY prm.md, kl.nl)""")

  /** The Lloyd chain shared by the sampled/adaptive cell preludes: the
    * prelude must define `su` (the training sample) and `prm2.sd` (the
    * seed modulus); the chain runs two decimal-exact iterations over
    * `su`, then assigns the WHOLE corpus to the trained centroids (vr
    * ranks every vector's cells).
    */
  private def duckLloydCells(prelude: String): String =
    s"""$prelude,
         c0 AS (SELECT vec_id AS cid, x AS cx, i FROM u, prm2
                WHERE vec_id % prm2.sd = 0),
         s1 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                FROM su a JOIN c0 b ON a.i = b.i GROUP BY 1, 2),
         a1 AS (SELECT vec_id, cid FROM (
                  SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                  FROM s1) WHERE rn = 1),
         c1 AS (SELECT a1.cid, su.i,
                  CAST(CAST(SUM(CAST(su.x AS DECIMAL(38,6))) AS DOUBLE)
                    / COUNT(*) AS REAL) AS cx
                FROM su JOIN a1 USING (vec_id) GROUP BY 1, 2),
         s2 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                FROM su a JOIN c1 b ON a.i = b.i GROUP BY 1, 2),
         a2 AS (SELECT vec_id, cid FROM (
                  SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                  FROM s2) WHERE rn = 1),
         c2 AS (SELECT a2.cid, su.i,
                  CAST(CAST(SUM(CAST(su.x AS DECIMAL(38,6))) AS DOUBLE)
                    / COUNT(*) AS REAL) AS cx
                FROM su JOIN a2 USING (vec_id) GROUP BY 1, 2),
         s3 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                FROM u a JOIN c2 b ON a.i = b.i GROUP BY 1, 2),
         vr AS (SELECT vec_id, cid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM s3)"""

  /** Shared SQ8 dequantization CTEs (st/dq) — one owner for the n10/n13
    * oracles; mirrors Sq8Kernel's encode floor/clamp + decode, rounded
    * through REAL like the Spark side's float cast.
    */
  private val duckSq8Dequant =
    """st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM u GROUP BY i),
         dq AS (SELECT vec_id, u.i, CAST(CAST(
             CASE WHEN mx = mn THEN mn
                  ELSE mn + least(255, greatest(0,
                    CAST(floor((x - mn) * 255 / (mx - mn)) AS BIGINT)))
                    * (mx - mn) / 255
             END AS REAL) AS DOUBLE) AS xq
           FROM u JOIN st ON u.i = st.i)"""

  /** Full DuckDB twin of lshTopK / lshTopKMultiProbe (n2/n5). The ±1
    * hyperplane weights are data-independent splitmix64 constants
    * (LshKernel.signNeg), so the oracle inlines the IDENTICAL sign matrix
    * as one ±-string literal per (table, bit); projections accumulate in
    * the scaled-long integer domain exactly like the kernel, so code
    * bits — and with them the candidate sets, exact re-rank, and hashes —
    * reproduce bit-for-bit. Multi-probe adds the Hamming-1 bucket
    * expansion on the probe side (code XOR 1<<b per bit).
    */
  private def lshOracle(multiProbe: Boolean, tables: Int = 8, bits: Int = 4,
                        dim: Int = 64, k: Int = 5,
                        probePred: String = "vec_id < 10",
                        adaptiveTarget: Option[Int] = None): String = {
    // the multi-probe flip expansion derives its range from the STATIC
    // `bits` parameter; combining it with an adaptive width would emit a
    // silently wrong oracle (flips past the derived width) — reject the
    // combination until pcx reads its range from the bv CTE
    require(!(multiProbe && adaptiveTarget.isDefined),
      "lshOracle: multiProbe with adaptiveTarget is not implemented")
    // Adaptive mode (n8/d16 since r11): the code width is not a constant
    // of the query but derived from COUNT(*) exactly like
    // Similarity.autoBits — smallest b in 1..24 with target·2^b ≥ n,
    // evaluated in BIGINT so both engines agree at exact powers of two.
    // The sign matrix inlines at the 24-bit cap and the `w` CTE keeps
    // only rows below the derived width.
    val genBits = adaptiveTarget.fold(bits)(_ => 24)
    val signRows = (for { t <- 0 until tables; b <- 0 until genBits } yield {
      val s = (0 until dim).map(d =>
        if (graft.plans.LshKernel.signNeg(t, b, d)) '-' else '+').mkString
      s"($t,$b,'$s')"
    }).mkString(",\n           ")
    val probeBuckets =
      if (multiProbe)
        s"""pcx AS (SELECT probe_id, t, code FROM pc
           UNION
           SELECT probe_id, t, xor(code, CAST(1 AS BIGINT) << fb)
           FROM pc, unnest(generate_series(0, ${bits - 1})) AS f(fb))"""
      else "pcx AS (SELECT probe_id, t, code FROM pc)"
    val widthCtes = adaptiveTarget.fold("") { occ =>
      s"""nv AS (SELECT count(*) AS n FROM embeddings),
       bv AS (SELECT coalesce(min(b), 24) AS bits
              FROM unnest(generate_series(1, 24)) AS g(b), nv
              WHERE (CAST($occ AS BIGINT) << b) >= n),
       """
    }
    val widthPred = adaptiveTarget.fold("")(_ => ", bv WHERE wt.b < bv.bits")
    s"""WITH u AS ($duckUnnest),
       ${widthCtes}wt(t, b, s) AS (VALUES
           $signRows),
       w AS (SELECT t, b, CAST(i AS BIGINT) AS i, substr(s, i, 1) = '-' AS neg
             FROM wt, unnest(generate_series(1, $dim)) AS g(i)$widthPred),
       pj AS (SELECT u.vec_id, w.t, w.b,
                SUM(CAST(floor((CASE WHEN w.neg THEN -u.x ELSE u.x END)*1e16)
                  AS BIGINT)) AS p
              FROM u JOIN w ON u.i = w.i GROUP BY 1, 2, 3),
       cd AS (SELECT vec_id, t,
                CAST(SUM(CASE WHEN p > 0 THEN 1 << b ELSE 0 END) AS BIGINT)
                  AS code
              FROM pj GROUP BY 1, 2),
       pc AS (SELECT vec_id AS probe_id, t, code FROM cd
              WHERE $probePred),
       $probeBuckets,
       ca AS (SELECT DISTINCT p.probe_id, c.vec_id AS cand_id
              FROM pcx p JOIN cd c ON p.t = c.t AND p.code = c.code
              WHERE c.vec_id <> p.probe_id),
       sc AS (SELECT ca.probe_id, ca.cand_id, ${duckCos("a.x", "b.x")} AS cos
              FROM ca JOIN u a ON a.vec_id = ca.probe_id
                      JOIN u b ON b.vec_id = ca.cand_id AND a.i = b.i
              GROUP BY 1, 2),
       r AS (SELECT probe_id, cand_id, cos, row_number() OVER (
               PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rank
             FROM sc)
       SELECT probe_id, rank, cand_id AS neighbor_id, round(cos, 4) AS cosine
       FROM r WHERE rank <= $k ORDER BY probe_id, rank"""
  }

  val oracles: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT md5(regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+', ' ', 'g')) AS fp,
           min(doc_id) AS keep_doc_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keep_doc_id""",
    "d2_minhash_neardup" -> Dedup.jaccardOracleSql(3, 0.8),
    "d11_semantic_decontaminate" ->
      s"""WITH u AS ($duckUnnest),
         e AS (SELECT vec_id AS eid, x AS ex, i FROM u
               WHERE vec_id % 20 = 0),
         t AS (SELECT vec_id, x, i FROM u WHERE vec_id % 20 <> 0),
         sc AS (SELECT t.vec_id, e.eid, ${duckCos("t.x", "e.ex")} AS cos
                FROM t JOIN e ON t.i = e.i GROUP BY 1, 2),
         bad AS (SELECT DISTINCT vec_id FROM sc WHERE cos >= 0.4)
         SELECT v.vec_id, CAST(v.label AS BIGINT) AS label
         FROM embeddings v
         WHERE v.vec_id % 20 <> 0
           AND v.vec_id NOT IN (SELECT vec_id FROM bad)
         ORDER BY v.vec_id""",
    "d3_simhash" -> Text.simhash32OracleSql,
    "n2_ann_lsh" -> lshOracle(multiProbe = false),
    "n5_ann_multiprobe" -> lshOracle(multiProbe = true),
    // n8: same machinery, graph-tuned (4 tables × 6 bits) and EVERY
    // vector is a probe — the oracle is the n2 twin with the probe
    // restriction dropped
    "n8_knn_graph" -> lshOracle(multiProbe = false, tables = 4,
      probePred = "TRUE", adaptiveTarget = Some(32)),
    // the bloom stage is pruning-only (no false negatives + exact
    // confirm), so the oracle is the plain fingerprint anti-join
    "d12_bloom_decontaminate" ->
      """WITH f AS (SELECT doc_id, lang, source,
           md5(array_to_string(
             (regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+'))[1:5], ' '))
             AS fp
         FROM documents),
         ev AS (SELECT DISTINCT fp FROM f WHERE doc_id % 20 = 0)
         SELECT doc_id, lang, source FROM f
         WHERE doc_id % 20 <> 0 AND fp NOT IN (SELECT fp FROM ev)
         ORDER BY doc_id""",
    "d4_ngram_jaccard" -> Dedup.jaccardOracleSql(3, 0.5),
    "d6_dedup_apply" ->
      s"""WITH p AS (${Dedup.jaccardOracleSql(3, 0.8)})
         SELECT doc_id, lang, source FROM documents
         WHERE doc_id NOT IN (SELECT doc_b FROM p)
         ORDER BY doc_id""",
    "d7_decontaminate" ->
      s"""WITH p AS (${Dedup.jaccardOracleSql(3, 0.8)}),
         bad AS (SELECT CASE WHEN doc_a % 20 = 0 THEN doc_b ELSE doc_a END
             AS doc_id
           FROM p WHERE (doc_a % 20 = 0) <> (doc_b % 20 = 0))
         SELECT doc_id, lang, source FROM documents
         WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
         ORDER BY doc_id""",
    "d10_dedup_apply_groups" ->
      s"""WITH RECURSIVE p AS (${Dedup.jaccardOracleSql(3, 0.8)}),
         e AS (SELECT doc_a AS src, doc_b AS dst FROM p
               UNION ALL SELECT doc_b, doc_a FROM p),
         v AS (SELECT DISTINCT src AS id FROM e),
         reach AS (
           SELECT id, id AS r FROM v
           UNION
           SELECT reach.id, e.dst AS r FROM reach JOIN e ON reach.r = e.src
         ),
         comp AS (SELECT id, min(r) AS grp FROM reach GROUP BY id)
         SELECT doc_id, lang, source FROM documents
         WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> grp)
         ORDER BY doc_id""",
    "d9_semantic_prune" ->
      s"""WITH u AS ($duckUnnest),
         c AS (SELECT vec_id AS cid, x, i FROM u WHERE vec_id % 50 = 0),
         sim AS (SELECT a.vec_id AS vec_id, c.cid,
                   ${duckCos("a.x", "c.x")} AS csim
                 FROM u a JOIN c ON a.i = c.i GROUP BY 1, 2),
         asg AS (SELECT vec_id, cid FROM (
                   SELECT vec_id, cid, row_number() OVER (
                     PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                   FROM sim)
                 WHERE rn = 1),
         pr AS (SELECT x.vec_id AS va, y.vec_id AS vb
                FROM asg x JOIN asg y
                ON x.cid = y.cid AND x.vec_id < y.vec_id),
         sc AS (SELECT pr.va, pr.vb, ${duckCos("a.x", "b.x")} AS cos
                FROM pr JOIN u a ON a.vec_id = pr.va
                        JOIN u b ON b.vec_id = pr.vb AND a.i = b.i
                GROUP BY 1, 2),
         dropped AS (SELECT DISTINCT vb FROM sc WHERE cos >= 0.4)
         SELECT a.vec_id, a.cid AS cluster_id FROM asg a
         WHERE a.vec_id NOT IN (SELECT vb FROM dropped)
         ORDER BY a.vec_id""",
    "t14_length_outliers" ->
      """WITH d AS (SELECT doc_id, source,
           len(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+')) AS tok
         FROM documents),
         b AS (SELECT source, quantile_cont(tok, 0.05) AS lo,
                 quantile_cont(tok, 0.95) AS hi
               FROM d GROUP BY source)
         SELECT d.doc_id, d.source, CAST(d.tok AS BIGINT) AS tok
         FROM d JOIN b USING (source)
         WHERE d.tok >= b.lo AND d.tok <= b.hi
         ORDER BY d.doc_id""",
    "t15_tfidf_keywords" ->
      """WITH w AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+')) AS word
         FROM documents),
         tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
         df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         sc AS (SELECT tf.doc_id, tf.word, tf.tf,
                  CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
                FROM tf JOIN df USING (word), n),
         r AS (SELECT doc_id, word, tf, score,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, word) AS rn
               FROM sc)
         SELECT doc_id, word, CAST(tf AS BIGINT) AS tf,
           round(score, 4) AS score
         FROM r WHERE rn <= 3 ORDER BY doc_id, score DESC, word""",
    "t13_doc_freq" ->
      """WITH w AS (SELECT DISTINCT doc_id,
           unnest(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+')) AS word
         FROM documents),
         d AS (SELECT word, count(*) AS df FROM w GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents)
         SELECT word, df, round(CAST(n_docs AS DOUBLE) / df, 4) AS rarity
         FROM d, n ORDER BY df DESC, word LIMIT 50""",
    "d8_dup_groups" ->
      s"""WITH RECURSIVE p AS (${Dedup.jaccardOracleSql(3, 0.8)}),
         e AS (SELECT doc_a AS src, doc_b AS dst FROM p
               UNION ALL SELECT doc_b, doc_a FROM p),
         v AS (SELECT DISTINCT src AS id FROM e),
         reach AS (
           SELECT id, id AS r FROM v
           UNION
           SELECT reach.id, e.dst AS r FROM reach JOIN e ON reach.r = e.src
         ),
         comp AS (SELECT id AS doc_id, min(r) AS group_id
                  FROM reach GROUP BY id),
         gs AS (SELECT group_id, count(*) AS group_size
                FROM comp GROUP BY group_id)
         SELECT c.doc_id, c.group_id, g.group_size
         FROM comp c JOIN gs g USING (group_id)
         ORDER BY c.group_id, c.doc_id""",
    "t11_stratified_sample" ->
      """WITH d AS (SELECT doc_id, lang, source,
           substr(md5(regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+', ' ', 'g')), 1, 1)
             AS nib
         FROM documents)
         SELECT doc_id, lang, source FROM d
         WHERE CASE WHEN lang = 'en' THEN TRUE
           WHEN lang IN ('de','es')
             THEN nib IN ('0','1','2','3','4','5','6','7')
           ELSE nib IN ('0','1','2','3') END
         ORDER BY doc_id""",
    "t12_seq_pack" ->
      """WITH d AS (SELECT doc_id, source,
           md5(regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+', ' ', 'g')) AS fp,
           len(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+')) AS tok
         FROM documents),
         sh AS (SELECT doc_id, source, fp, tok,
           CAST(strpos('0123456789abcdef', substr(fp, 1, 1)) - 1 AS BIGINT)
             AS shard
         FROM d),
         c AS (SELECT doc_id, source, shard, tok,
           sum(tok) OVER (PARTITION BY source, shard ORDER BY fp, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM sh)
         SELECT doc_id, source, shard, CAST(tok AS BIGINT) AS tok,
           CAST((cum - tok) // 512 AS BIGINT) AS chunk_id,
           CAST((cum - tok) % 512 AS BIGINT) AS chunk_offset
         FROM c ORDER BY source, shard, chunk_id, chunk_offset, doc_id""",
    // t23 reuses t12's packing CTE; the boundary string is built with
    // the same (offset, doc_id) total order the Spark array_sort gives
    // (struct sort is field-order lexicographic: off, then doc_id)
    "t23_pack_manifest" ->
      """WITH d AS (SELECT doc_id, source,
           md5(regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+', ' ', 'g')) AS fp,
           len(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+')) AS tok
         FROM documents),
         sh AS (SELECT doc_id, source, fp, tok,
           CAST(strpos('0123456789abcdef', substr(fp, 1, 1)) - 1 AS BIGINT)
             AS shard
         FROM d),
         c AS (SELECT doc_id, source, shard, tok,
           sum(tok) OVER (PARTITION BY source, shard ORDER BY fp, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM sh),
         p AS (SELECT doc_id, source, shard, tok,
           (cum - tok) // 512 AS chunk_id,
           (cum - tok) % 512 AS chunk_offset
         FROM c)
         SELECT source, shard, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(chunk_offset + tok) AS BIGINT) AS used_tokens,
           string_agg(
             CAST(chunk_offset AS VARCHAR) || ':' ||
             CAST(doc_id AS VARCHAR) || ':' || CAST(tok AS VARCHAR),
             ',' ORDER BY chunk_offset, doc_id) AS boundaries
         FROM p GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "t24_dataset_card" -> {
      val stop = Text.stopwords.map(duckMarker).mkString(" + ")
      s"""WITH doc0 AS (SELECT doc_id, source, lang,
           coalesce(text, '') AS text FROM documents),
         d AS (SELECT doc_id, source, lang,
           len(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+')) AS wc,
           ($stop) AS stopc,
           len(list_filter(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+'),
             x -> regexp_full_match(x, '^[a-z]+$$'))) AS alphac,
           md5(regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+', ' ', 'g')) AS fp
         FROM doc0),
         q AS (SELECT doc_id, source, lang, wc, fp,
           round(100.0 * (0.5 * (CAST(stopc AS DOUBLE) / wc)
             + 0.3 * (CAST(least(wc, 50) AS DOUBLE) / 50.0)
             + 0.2 * (CAST(alphac AS DOUBLE) / wc)), 4) AS quality
         FROM d),
         c AS (SELECT fp, count(*) AS n_fp FROM q GROUP BY 1),
         j AS (SELECT q.*, c.n_fp FROM q JOIN c USING (fp)),
         agg AS (SELECT source, lang, count(*) AS n_docs,
           CAST(SUM(wc) AS BIGINT) AS total_tokens,
           round(CAST(SUM(CAST(quality AS DECIMAL(38,6))) AS DOUBLE)
             / count(quality), 4) AS avg_quality,
           count(*) FILTER (WHERE quality >= 40) AS gate_pass,
           count(*) FILTER (WHERE n_fp > 1) AS dup_docs,
           max(wc) AS max_wc
         FROM j GROUP BY 1, 2),
         r AS (SELECT source, lang, wc,
           row_number() OVER (PARTITION BY source, lang
             ORDER BY wc, doc_id) AS rn,
           count(*) OVER (PARTITION BY source, lang) AS n
         FROM q),
         med AS (SELECT source, lang, AVG(wc) AS median_wc
           FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
           GROUP BY 1, 2)
         SELECT agg.*, med.median_wc
         FROM agg JOIN med USING (source, lang)
         ORDER BY source, lang"""
    },
    "t6_repetition" ->
      """WITH t AS (SELECT doc_id,
           regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+') AS w
         FROM documents),
         sh AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
                FROM t, unnest(generate_series(1, len(w)-2)) AS g(i)),
         c AS (SELECT doc_id, count(*) AS n_shingles,
                 count(DISTINCT s) AS n_unique
               FROM sh GROUP BY 1)
         SELECT d.doc_id,
           coalesce(c.n_shingles, 0) AS n_shingles,
           coalesce(c.n_unique, 0) AS n_unique,
           round(CASE WHEN c.n_shingles > 0
             THEN 1 - CAST(c.n_unique AS DOUBLE) / c.n_shingles
             ELSE 0 END, 4) AS rep_ratio
         FROM documents d LEFT JOIN c USING (doc_id)
         ORDER BY doc_id""",
    "d5_embedding_neardup" ->
      s"""WITH u AS ($duckUnnest),
         p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 ${duckCos("a.x", "b.x")} AS cos
               FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
               GROUP BY 1, 2)
         SELECT vec_a, vec_b, round(cos, 4) AS cosine
         FROM p WHERE cos >= 0.4 ORDER BY vec_a, vec_b""",
    // n6: PQ training is restricted to the bounded modulus sample (ss)
    // seeded at the fixed-k modulus (pm2) — both moduli computed from the
    // same counts the Spark driver reads (sampleModuli), as scalar CTEs.
    // Only d3 (final encode) and the probe LUT see the full slice table.
    "n6_ann_pq" ->
      s"""WITH u AS ($duckUnnest),
         sl AS (SELECT vec_id AS id, CAST((i-1)//8 AS BIGINT) AS sub,
                  (i-1)%8 AS pos, x
                FROM u),
         pm AS (SELECT greatest(1, count(*) // 400) AS md
                FROM embeddings),
         ss AS (SELECT sl.* FROM sl, pm WHERE sl.id % pm.md = 0),
         pm2 AS (SELECT pm.md * greatest(1, count(DISTINCT ss.id) // 40)
                   AS sd
                 FROM ss, pm GROUP BY pm.md),
         cb0 AS (SELECT sub, id AS code, pos, x AS cw FROM sl, pm2
                 WHERE id % pm2.sd = 0),
         d1 AS (SELECT s.id, s.sub, c.code,
                  SUM(CAST(floor(c.cw*c.cw*1e16) AS BIGINT))
                    - 2*SUM(CAST(floor(s.x*c.cw*1e16) AS BIGINT)) AS d2
                FROM ss s JOIN cb0 c ON s.sub = c.sub AND s.pos = c.pos
                GROUP BY 1, 2, 3),
         a1 AS (SELECT id, sub, code FROM (
                  SELECT id, sub, code, row_number() OVER (
                    PARTITION BY id, sub ORDER BY d2, code) AS rn FROM d1)
                WHERE rn = 1),
         cb1 AS (SELECT a.sub, a.code, s.pos,
                   CAST(CAST(SUM(CAST(s.x AS DECIMAL(38,6))) AS DOUBLE)
                     / COUNT(*) AS REAL) AS cw
                 FROM ss s JOIN a1 a ON s.id = a.id AND s.sub = a.sub
                 GROUP BY 1, 2, 3),
         d2i AS (SELECT s.id, s.sub, c.code,
                   SUM(CAST(floor(c.cw*c.cw*1e16) AS BIGINT))
                     - 2*SUM(CAST(floor(s.x*c.cw*1e16) AS BIGINT)) AS d2
                 FROM ss s JOIN cb1 c ON s.sub = c.sub AND s.pos = c.pos
                 GROUP BY 1, 2, 3),
         a2 AS (SELECT id, sub, code FROM (
                  SELECT id, sub, code, row_number() OVER (
                    PARTITION BY id, sub ORDER BY d2, code) AS rn FROM d2i)
                WHERE rn = 1),
         cb2 AS (SELECT a.sub, a.code, s.pos,
                   CAST(CAST(SUM(CAST(s.x AS DECIMAL(38,6))) AS DOUBLE)
                     / COUNT(*) AS REAL) AS cw
                 FROM ss s JOIN a2 a ON s.id = a.id AND s.sub = a.sub
                 GROUP BY 1, 2, 3),
         d3 AS (SELECT s.id, s.sub, c.code,
                  SUM(CAST(floor(c.cw*c.cw*1e16) AS BIGINT))
                    - 2*SUM(CAST(floor(s.x*c.cw*1e16) AS BIGINT)) AS d2
                FROM sl s JOIN cb2 c ON s.sub = c.sub AND s.pos = c.pos
                GROUP BY 1, 2, 3),
         enc AS (SELECT id AS cand_id, sub, code FROM (
                   SELECT id, sub, code, row_number() OVER (
                     PARTITION BY id, sub ORDER BY d2, code) AS rn FROM d3)
                 WHERE rn = 1),
         lut AS (SELECT s.id AS probe_id, c.sub, c.code,
                   SUM(CAST(floor(s.x*c.cw*1e16) AS BIGINT)) AS pdot,
                   SUM(CAST(floor(c.cw*c.cw*1e16) AS BIGINT)) AS cn
                 FROM sl s JOIN cb2 c ON s.sub = c.sub AND s.pos = c.pos
                 WHERE s.id < 10 GROUP BY 1, 2, 3),
         pn AS (SELECT vec_id AS probe_id,
                  SUM(CAST(floor(x*x*1e16) AS BIGINT)) AS pn
                FROM u WHERE vec_id < 10 GROUP BY 1),
         adc AS (SELECT l.probe_id, e.cand_id,
                   SUM(l.pdot) AS adot, SUM(l.cn) AS rnorm
                 FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
                 GROUP BY 1, 2),
         acs AS (SELECT a.probe_id, a.cand_id,
                   CAST(a.adot AS DOUBLE) / (sqrt(CAST(p.pn AS DOUBLE))
                     * sqrt(CAST(a.rnorm AS DOUBLE))) AS acos
                 FROM adc a JOIN pn p USING (probe_id)
                 WHERE a.probe_id <> a.cand_id),
         short AS (SELECT probe_id, cand_id FROM (
                     SELECT probe_id, cand_id, row_number() OVER (
                       PARTITION BY probe_id ORDER BY acos DESC, cand_id)
                       AS rn FROM acs) WHERE rn <= 50),
         sc AS (SELECT s.probe_id, s.cand_id,
                  ${duckCos("a.x", "b.x")} AS cos
                FROM short s
                JOIN u a ON a.vec_id = s.probe_id
                JOIN u b ON b.vec_id = s.cand_id AND a.i = b.i
                GROUP BY 1, 2),
         r AS (SELECT probe_id, cand_id, cos, row_number() OVER (
                 PARTITION BY probe_id ORDER BY cos DESC, cand_id)
                 AS rank FROM sc)
         SELECT probe_id, rank, cand_id AS neighbor_id,
           round(cos, 4) AS cosine
         FROM r WHERE rank <= 5 ORDER BY probe_id, rank""",
    // n7 = n9's sampled-trained IVF bucketing CTEs (i-prefixed: the
    // centroid-training moduli iprm/iprm2 mirror sampledTrainCentroids'
    // 400/16 from COUNT(*)) + n6's sampled PQ training/encoding CTEs,
    // with the ADC stage restricted to the IVF-pruned candidate pairs
    "n7_ann_ivfpq" ->
      s"""WITH u AS ($duckUnnest),
         iprm AS (SELECT greatest(1, count(*) // 400) AS md
                  FROM embeddings),
         isu AS (SELECT u.* FROM u, iprm WHERE u.vec_id % iprm.md = 0),
         iprm2 AS (SELECT iprm.md
                     * greatest(1, count(DISTINCT isu.vec_id) // 16) AS sd
                   FROM isu, iprm GROUP BY iprm.md),
         ic0 AS (SELECT vec_id AS cid, x AS cx, i FROM u, iprm2
                 WHERE vec_id % iprm2.sd = 0),
         is1 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                 FROM isu a JOIN ic0 b ON a.i = b.i GROUP BY 1, 2),
         ia1 AS (SELECT vec_id, cid FROM (
                   SELECT vec_id, cid, row_number() OVER (
                     PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                   FROM is1) WHERE rn = 1),
         ic1 AS (SELECT ia1.cid, isu.i,
                   CAST(CAST(SUM(CAST(isu.x AS DECIMAL(38,6))) AS DOUBLE)
                     / COUNT(*) AS REAL) AS cx
                 FROM isu JOIN ia1 USING (vec_id) GROUP BY 1, 2),
         is2 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                 FROM isu a JOIN ic1 b ON a.i = b.i GROUP BY 1, 2),
         ia2 AS (SELECT vec_id, cid FROM (
                   SELECT vec_id, cid, row_number() OVER (
                     PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                   FROM is2) WHERE rn = 1),
         ic2 AS (SELECT ia2.cid, isu.i,
                   CAST(CAST(SUM(CAST(isu.x AS DECIMAL(38,6))) AS DOUBLE)
                     / COUNT(*) AS REAL) AS cx
                 FROM isu JOIN ia2 USING (vec_id) GROUP BY 1, 2),
         is3 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                 FROM u a JOIN ic2 b ON a.i = b.i GROUP BY 1, 2),
         vr AS (SELECT vec_id, cid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM is3),
         vb AS (SELECT vec_id AS cand_id, cid FROM vr WHERE rn = 1),
         pb AS (SELECT vec_id AS probe_id, cid FROM vr
                WHERE rn <= 8 AND vec_id < 10),
         cands AS (SELECT DISTINCT probe_id, cand_id
                   FROM pb JOIN vb USING (cid)
                   WHERE probe_id <> cand_id),
         sl AS (SELECT vec_id AS id, CAST((i-1)//8 AS BIGINT) AS sub,
                  (i-1)%8 AS pos, x
                FROM u),
         pm AS (SELECT greatest(1, count(*) // 400) AS md
                FROM embeddings),
         ss AS (SELECT sl.* FROM sl, pm WHERE sl.id % pm.md = 0),
         pm2 AS (SELECT pm.md * greatest(1, count(DISTINCT ss.id) // 40)
                   AS sd
                 FROM ss, pm GROUP BY pm.md),
         cb0 AS (SELECT sub, id AS code, pos, x AS cw FROM sl, pm2
                 WHERE id % pm2.sd = 0),
         d1 AS (SELECT s.id, s.sub, c.code,
                  SUM(CAST(floor(c.cw*c.cw*1e16) AS BIGINT))
                    - 2*SUM(CAST(floor(s.x*c.cw*1e16) AS BIGINT)) AS d2
                FROM ss s JOIN cb0 c ON s.sub = c.sub AND s.pos = c.pos
                GROUP BY 1, 2, 3),
         a1 AS (SELECT id, sub, code FROM (
                  SELECT id, sub, code, row_number() OVER (
                    PARTITION BY id, sub ORDER BY d2, code) AS rn FROM d1)
                WHERE rn = 1),
         cb1 AS (SELECT a.sub, a.code, s.pos,
                   CAST(CAST(SUM(CAST(s.x AS DECIMAL(38,6))) AS DOUBLE)
                     / COUNT(*) AS REAL) AS cw
                 FROM ss s JOIN a1 a ON s.id = a.id AND s.sub = a.sub
                 GROUP BY 1, 2, 3),
         d2i AS (SELECT s.id, s.sub, c.code,
                   SUM(CAST(floor(c.cw*c.cw*1e16) AS BIGINT))
                     - 2*SUM(CAST(floor(s.x*c.cw*1e16) AS BIGINT)) AS d2
                 FROM ss s JOIN cb1 c ON s.sub = c.sub AND s.pos = c.pos
                 GROUP BY 1, 2, 3),
         a2 AS (SELECT id, sub, code FROM (
                  SELECT id, sub, code, row_number() OVER (
                    PARTITION BY id, sub ORDER BY d2, code) AS rn FROM d2i)
                WHERE rn = 1),
         cb2 AS (SELECT a.sub, a.code, s.pos,
                   CAST(CAST(SUM(CAST(s.x AS DECIMAL(38,6))) AS DOUBLE)
                     / COUNT(*) AS REAL) AS cw
                 FROM ss s JOIN a2 a ON s.id = a.id AND s.sub = a.sub
                 GROUP BY 1, 2, 3),
         d3 AS (SELECT s.id, s.sub, c.code,
                  SUM(CAST(floor(c.cw*c.cw*1e16) AS BIGINT))
                    - 2*SUM(CAST(floor(s.x*c.cw*1e16) AS BIGINT)) AS d2
                FROM sl s JOIN cb2 c ON s.sub = c.sub AND s.pos = c.pos
                GROUP BY 1, 2, 3),
         enc AS (SELECT id AS cand_id, sub, code FROM (
                   SELECT id, sub, code, row_number() OVER (
                     PARTITION BY id, sub ORDER BY d2, code) AS rn FROM d3)
                 WHERE rn = 1),
         lut AS (SELECT s.id AS probe_id, c.sub, c.code,
                   SUM(CAST(floor(s.x*c.cw*1e16) AS BIGINT)) AS pdot,
                   SUM(CAST(floor(c.cw*c.cw*1e16) AS BIGINT)) AS cn
                 FROM sl s JOIN cb2 c ON s.sub = c.sub AND s.pos = c.pos
                 WHERE s.id < 10 GROUP BY 1, 2, 3),
         pn AS (SELECT vec_id AS probe_id,
                  SUM(CAST(floor(x*x*1e16) AS BIGINT)) AS pn
                FROM u WHERE vec_id < 10 GROUP BY 1),
         adc AS (SELECT cd.probe_id, cd.cand_id,
                   SUM(l.pdot) AS adot, SUM(l.cn) AS rnorm
                 FROM cands cd
                 JOIN enc e ON e.cand_id = cd.cand_id
                 JOIN lut l ON l.probe_id = cd.probe_id
                   AND l.sub = e.sub AND l.code = e.code
                 GROUP BY 1, 2),
         acs AS (SELECT a.probe_id, a.cand_id,
                   CAST(a.adot AS DOUBLE) / (sqrt(CAST(p.pn AS DOUBLE))
                     * sqrt(CAST(a.rnorm AS DOUBLE))) AS acos
                 FROM adc a JOIN pn p USING (probe_id)),
         short AS (SELECT probe_id, cand_id FROM (
                     SELECT probe_id, cand_id, row_number() OVER (
                       PARTITION BY probe_id ORDER BY acos DESC, cand_id)
                       AS rn FROM acs) WHERE rn <= 50),
         sc AS (SELECT s.probe_id, s.cand_id,
                  ${duckCos("a.x", "b.x")} AS cos
                FROM short s
                JOIN u a ON a.vec_id = s.probe_id
                JOIN u b ON b.vec_id = s.cand_id AND a.i = b.i
                GROUP BY 1, 2),
         r AS (SELECT probe_id, cand_id, cos, row_number() OVER (
                 PARTITION BY probe_id ORDER BY cos DESC, cand_id)
                 AS rank FROM sc)
         SELECT probe_id, rank, cand_id AS neighbor_id,
           round(cos, 4) AS cosine
         FROM r WHERE rank <= 5 ORDER BY probe_id, rank""",
    "n4_ann_ivf_trained" ->
      s"""WITH u AS ($duckUnnest),
         c0 AS (SELECT vec_id AS cid, x AS cx, i FROM u
                WHERE vec_id % 50 = 0),
         s1 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                FROM u a JOIN c0 b ON a.i = b.i GROUP BY 1, 2),
         a1 AS (SELECT vec_id, cid FROM (
                  SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                  FROM s1) WHERE rn = 1),
         c1 AS (SELECT a1.cid,  u.i,
                  CAST(CAST(SUM(CAST(u.x AS DECIMAL(38,6))) AS DOUBLE)
                    / COUNT(*) AS REAL) AS cx
                FROM u JOIN a1 USING (vec_id) GROUP BY 1, 2),
         s2 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                FROM u a JOIN c1 b ON a.i = b.i GROUP BY 1, 2),
         a2 AS (SELECT vec_id, cid FROM (
                  SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                  FROM s2) WHERE rn = 1),
         c2 AS (SELECT a2.cid, u.i,
                  CAST(CAST(SUM(CAST(u.x AS DECIMAL(38,6))) AS DOUBLE)
                    / COUNT(*) AS REAL) AS cx
                FROM u JOIN a2 USING (vec_id) GROUP BY 1, 2),
         s3 AS (SELECT a.vec_id, b.cid, ${duckCos("a.x", "b.cx")} AS csim
                FROM u a JOIN c2 b ON a.i = b.i GROUP BY 1, 2),
         vr AS (SELECT vec_id, cid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
                FROM s3),
         vb AS (SELECT vec_id AS cand_id, cid FROM vr WHERE rn = 1),
         pb AS (SELECT vec_id AS probe_id, cid FROM vr
                WHERE rn <= 8 AND vec_id < 10),
         cands AS (SELECT DISTINCT probe_id, cand_id
                   FROM pb JOIN vb USING (cid)
                   WHERE probe_id <> cand_id),
         sc AS (SELECT c.probe_id, c.cand_id,
                  ${duckCos("a.x", "b.x")} AS cos
                FROM cands c
                JOIN u a ON a.vec_id = c.probe_id
                JOIN u b ON b.vec_id = c.cand_id AND a.i = b.i
                GROUP BY 1, 2),
         r AS (SELECT probe_id, cand_id, cos, row_number() OVER (
                 PARTITION BY probe_id ORDER BY cos DESC, cand_id)
                 AS rank FROM sc)
         SELECT probe_id, rank, cand_id AS neighbor_id,
           round(cos, 4) AS cosine
         FROM r WHERE rank <= 5 ORDER BY probe_id, rank""",
    // n9: the n4 oracle with training restricted to the bounded modulus
    // sample (su) and seeds to the fixed-k modulus (prm2) — both moduli
    // computed from the same counts the Spark driver reads, as scalar
    // CTEs. Only s3 (final assignment) sees the full corpus.
    "n9_ann_ivf_sampled" ->
      s"""WITH u AS ($duckUnnest),
         $duckSampledCells,
         vb AS (SELECT vec_id AS cand_id, cid FROM vr WHERE rn = 1),
         pb AS (SELECT vec_id AS probe_id, cid FROM vr
                WHERE rn <= 8 AND vec_id < 10),
         cands AS (SELECT DISTINCT probe_id, cand_id
                   FROM pb JOIN vb USING (cid)
                   WHERE probe_id <> cand_id),
         sc AS (SELECT c.probe_id, c.cand_id,
                  ${duckCos("a.x", "b.x")} AS cos
                FROM cands c
                JOIN u a ON a.vec_id = c.probe_id
                JOIN u b ON b.vec_id = c.cand_id AND a.i = b.i
                GROUP BY 1, 2),
         r AS (SELECT probe_id, cand_id, cos, row_number() OVER (
                 PARTITION BY probe_id ORDER BY cos DESC, cand_id)
                 AS rank FROM sc)
         SELECT probe_id, rank, cand_id AS neighbor_id,
           round(cos, 4) AS cosine
         FROM r WHERE rank <= 5 ORDER BY probe_id, rank""",
    "n3_ann_ivf" ->
      s"""WITH u AS ($duckUnnest),
         $duckIvfAssign,
         vb AS (SELECT vec_id AS cand_id, cid FROM vr WHERE rn = 1),
         pb AS (SELECT vec_id AS probe_id, cid FROM vr
                WHERE rn <= 8 AND vec_id < 10),
         cands AS (SELECT DISTINCT probe_id, cand_id
                   FROM pb JOIN vb USING (cid)
                   WHERE probe_id <> cand_id),
         sc AS (SELECT c.probe_id, c.cand_id,
                  ${duckCos("a.x", "b.x")} AS cos
                FROM cands c
                JOIN u a ON a.vec_id = c.probe_id
                JOIN u b ON b.vec_id = c.cand_id AND a.i = b.i
                GROUP BY 1, 2),
         r AS (SELECT probe_id, cand_id, cos, row_number() OVER (
                 PARTITION BY probe_id ORDER BY cos DESC, cand_id)
                 AS rank FROM sc)
         SELECT probe_id, rank, cand_id AS neighbor_id,
           round(cos, 4) AS cosine
         FROM r WHERE rank <= 5 ORDER BY probe_id, rank""",
    // n14: n9's sampled-Lloyd cell chain + n10's dequant CTE — the
    // production quantized composite (fixed cells, byte scoring)
    "n14_ann_sq8_sampled" ->
      s"""WITH u AS ($duckUnnest),
         $duckSampledCells,
         vb AS (SELECT vec_id AS cand_id, cid FROM vr WHERE rn = 1),
         pb AS (SELECT vec_id AS probe_id, cid FROM vr
                WHERE rn <= 8 AND vec_id < 10),
         cands AS (SELECT DISTINCT probe_id, cand_id
                   FROM pb JOIN vb USING (cid)
                   WHERE probe_id <> cand_id),
         $duckSq8Dequant,
         sc AS (SELECT c.probe_id, c.cand_id,
                  ${duckCos("a.x", "b.xq")} AS cos
                FROM cands c
                JOIN u a ON a.vec_id = c.probe_id
                JOIN dq b ON b.vec_id = c.cand_id AND a.i = b.i
                GROUP BY 1, 2),
         r AS (SELECT probe_id, cand_id, cos, row_number() OVER (
                 PARTITION BY probe_id ORDER BY cos DESC, cand_id)
                 AS rank FROM sc)
         SELECT probe_id, rank, cand_id AS neighbor_id,
           round(cos, 4) AS cosine
         FROM r WHERE rank <= 5 ORDER BY probe_id, rank""",
    // n13: the ADAPTIVE-nlist sampled-Lloyd cell CTEs (nlist = ⌈√n⌉
    // derived from COUNT(*)) + n10's SQ8 dequant CTE — cells prune,
    // dequantized bytes score
    "n13_ann_ivfsq8" ->
      s"""WITH u AS ($duckUnnest),
         $duckAdaptiveCells,
         vb AS (SELECT vec_id AS cand_id, cid FROM vr WHERE rn = 1),
         pb AS (SELECT vec_id AS probe_id, cid FROM vr
                WHERE rn <= 8 AND vec_id < 10),
         cands AS (SELECT DISTINCT probe_id, cand_id
                   FROM pb JOIN vb USING (cid)
                   WHERE probe_id <> cand_id),
         $duckSq8Dequant,
         sc AS (SELECT c.probe_id, c.cand_id,
                  ${duckCos("a.x", "b.xq")} AS cos
                FROM cands c
                JOIN u a ON a.vec_id = c.probe_id
                JOIN dq b ON b.vec_id = c.cand_id AND a.i = b.i
                GROUP BY 1, 2),
         r AS (SELECT probe_id, cand_id, cos, row_number() OVER (
                 PARTITION BY probe_id ORDER BY cos DESC, cand_id)
                 AS rank FROM sc)
         SELECT probe_id, rank, cand_id AS neighbor_id,
           round(cos, 4) AS cosine
         FROM r WHERE rank <= 5 ORDER BY probe_id, rank""",
    // n12: the adaptive-cell oracle with the label predicate pruning
    // the candidate assignments (pre-filter); probe assignments and the
    // coarse quantizer stay corpus-wide (the index is built once)
    "n12_ann_filtered" ->
      s"""WITH u AS ($duckUnnest),
         $duckAdaptiveCells,
         vb AS (SELECT vr.vec_id AS cand_id, cid FROM vr
                JOIN embeddings e ON vr.vec_id = e.vec_id
                WHERE rn = 1 AND e.label < 3),
         pb AS (SELECT vec_id AS probe_id, cid FROM vr
                WHERE rn <= 8 AND vec_id < 10),
         cands AS (SELECT DISTINCT probe_id, cand_id
                   FROM pb JOIN vb USING (cid)
                   WHERE probe_id <> cand_id),
         sc AS (SELECT c.probe_id, c.cand_id,
                  ${duckCos("a.x", "b.x")} AS cos
                FROM cands c
                JOIN u a ON a.vec_id = c.probe_id
                JOIN u b ON b.vec_id = c.cand_id AND a.i = b.i
                GROUP BY 1, 2),
         r AS (SELECT probe_id, cand_id, cos, row_number() OVER (
                 PARTITION BY probe_id ORDER BY cos DESC, cand_id)
                 AS rank FROM sc)
         SELECT probe_id, rank, cand_id AS neighbor_id,
           round(cos, 4) AS cosine
         FROM r WHERE rank <= 5 ORDER BY probe_id, rank""",
    "n1_ann_topk" ->
      s"""WITH u AS ($duckUnnest),
         sc AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
                  ${duckCos("a.x", "b.x")} AS cos
                FROM u a JOIN u b
                  ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
                GROUP BY 1, 2),
         r AS (SELECT probe_id, neighbor_id, cos, row_number() OVER (
                 PARTITION BY probe_id ORDER BY cos DESC, neighbor_id)
                 AS rank FROM sc)
         SELECT probe_id, rank, neighbor_id, round(cos, 4) AS cosine
         FROM r WHERE rank <= 5 ORDER BY probe_id, rank""",
    // n10: the SQ8 round-trip (encode floor((x−mn)·255/span) clamped,
    // decode mn + code·span/255, rounded through REAL like the Spark
    // side's float cast) feeding the same scaled-long cosine as n1
    "n10_ann_sq8" ->
      s"""WITH u AS ($duckUnnest),
         $duckSq8Dequant,
         sc AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
                  ${duckCos("a.x", "b.xq")} AS cos
                FROM u a JOIN dq b
                  ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
                GROUP BY 1, 2),
         r AS (SELECT probe_id, neighbor_id, cos, row_number() OVER (
                 PARTITION BY probe_id ORDER BY cos DESC, neighbor_id)
                 AS rank FROM sc)
         SELECT probe_id, rank, neighbor_id, round(cos, 4) AS cosine
         FROM r WHERE rank <= 5 ORDER BY probe_id, rank""",
    "t1_text_stats" ->
      """WITH d AS (SELECT source, lang, n_chars,
           len(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+')) AS wc
         FROM documents)
         SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
           round(CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE)/count(n_chars), 4) AS avg_chars,
           round(CAST(SUM(CAST(wc AS DECIMAL(38,6))) AS DOUBLE)/count(wc), 4) AS avg_words,
           max(wc) AS max_words
         FROM d GROUP BY source ORDER BY source""",
    "t2_langid" -> {
      val scores = Text.langMarkers.map { case (l, _) =>
        s"${duckLangScore(l)} AS s_$l"
      }.mkString(", ")
      s"""WITH sc AS (SELECT doc_id, lang, $scores FROM documents)
         SELECT doc_id, lang, $duckLangCase AS lang_pred,
           lang = $duckLangCase AS is_match
         FROM sc ORDER BY doc_id"""
    },
    "t3_quality_score" -> {
      val stop = Text.stopwords.map(duckMarker).mkString(" + ")
      s"""WITH d AS (SELECT doc_id,
           len(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+')) AS wc,
           ($stop) AS stopc,
           len(list_filter(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+'),
             x -> regexp_full_match(x, '^[a-z]+$$'))) AS alphac
         FROM documents)
         SELECT doc_id,
           round(100.0 * (0.5 * (CAST(stopc AS DOUBLE) / wc)
             + 0.3 * (CAST(least(wc, 50) AS DOUBLE) / 50.0)
             + 0.2 * (CAST(alphac AS DOUBLE) / wc)), 4) AS quality
         FROM d ORDER BY doc_id"""
    },
    "t4_token_count" ->
      """WITH n AS (SELECT doc_id,
           regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+', ' ', 'g') AS t
         FROM documents)
         SELECT doc_id, length(t) AS n_chars_norm,
           len(string_split(t, ' ')) AS ws_tokens,
           len(regexp_extract_all(t, '[a-z0-9]{1,3}')) AS subword_tokens
         FROM n ORDER BY doc_id""",
    "t5_fingerprint" ->
      """WITH t AS (SELECT doc_id, text,
           regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+') AS w
         FROM documents),
         sh AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
                FROM t, unnest(generate_series(1, len(w)-2)) AS g(i)),
         m AS (SELECT doc_id, min(md5(s)) AS min_shingle_fp
               FROM sh GROUP BY 1)
         SELECT d.doc_id,
           md5(regexp_replace(trim(lower(d.text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+', ' ', 'g')) AS doc_fp,
           m.min_shingle_fp
         FROM documents d JOIN m ON d.doc_id = m.doc_id
         ORDER BY d.doc_id""",
    "t9_char_ngrams" ->
      """WITH nrm AS (SELECT lang,
           regexp_replace(regexp_replace(lower(text), '^[\s\x0B]+|[\s\x0B]+$', '', 'g'),
             '[\s\x0B]+', ' ', 'g') AS t
         FROM documents),
         tri AS (SELECT lang, substr(t, i, 3) AS tri
                 FROM nrm, unnest(generate_series(1, length(t)-2)) AS g(i)),
         c AS (SELECT lang, tri, count(*) AS n FROM tri GROUP BY 1, 2),
         r AS (SELECT lang, tri, n, row_number() OVER (
                 PARTITION BY lang ORDER BY n DESC, tri) AS rn FROM c)
         SELECT lang, tri, n, rn FROM r WHERE rn <= 5
         ORDER BY lang, rn""",
    "t7_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE substr(md5(regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+', ' ', 'g')), 1, 1)
           IN ('0','1','2','3','4','5','6','7')
         ORDER BY doc_id""",
    "t8_quality_gate" -> {
      val stop = Text.stopwords.map(duckMarker).mkString(" + ")
      s"""WITH d AS (SELECT doc_id, lang,
           len(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+')) AS wc,
           ($stop) AS stopc,
           len(list_filter(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+'),
             x -> regexp_full_match(x, '^[a-z]+$$'))) AS alphac
         FROM documents),
         q AS (SELECT doc_id, lang,
           round(100.0 * (0.5 * (CAST(stopc AS DOUBLE) / wc)
             + 0.3 * (CAST(least(wc, 50) AS DOUBLE) / 50.0)
             + 0.2 * (CAST(alphac AS DOUBLE) / wc)), 4) AS quality
         FROM d)
         SELECT doc_id, lang, quality FROM q
         WHERE quality >= 40 AND lang IN ('en','de','es')
         ORDER BY doc_id"""
    },
    "m1_multimodal_meta" ->
      """SELECT d.doc_id, d.lang, CAST(e.label AS BIGINT) AS label,
           octet_length(unhex(md5(d.text))) AS n_bytes,
           len(e.embedding) AS emb_dim,
           substr(md5(d.text), 1, 8) AS header_hex
         FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         ORDER BY d.doc_id""",
    // m2: the oracle recomputes the synthesized image's dims + gradient
    // pixel sum from the md5 bytes (x = i % w, y = i // w over one
    // unnest) and pins decode_ok — the Spark side earns `true` only by
    // round-tripping real PNG/BMP bytes through ImageIO pixel-exactly
    "m2_media_extract" ->
      """WITH h AS (SELECT doc_id, md5(text) AS m FROM documents
           WHERE text IS NOT NULL),
         b AS (SELECT doc_id,
           16*(strpos('0123456789abcdef', substr(m, 1, 1))-1)
             + (strpos('0123456789abcdef', substr(m, 2, 1))-1) AS b0,
           16*(strpos('0123456789abcdef', substr(m, 3, 1))-1)
             + (strpos('0123456789abcdef', substr(m, 4, 1))-1) AS b1,
           16*(strpos('0123456789abcdef', substr(m, 5, 1))-1)
             + (strpos('0123456789abcdef', substr(m, 6, 1))-1) AS b2
         FROM h),
         dims AS (SELECT doc_id, b0,
           8 + (b1 % 24) AS w, 8 + (b2 % 24) AS h FROM b),
         px AS (SELECT doc_id, b0, w, h,
           unnest(generate_series(0, w*h - 1)) AS i FROM dims)
         SELECT doc_id,
           CASE WHEN b0 % 2 = 0 THEN 'png' ELSE 'bmp' END AS codec,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(SUM((b0 + 7*(i % w) + 13*(i // w)) % 256) AS BIGINT)
             AS pix_sum,
           TRUE AS decode_ok
         FROM px GROUP BY doc_id, b0, w, h
         ORDER BY doc_id""",
    // m3: the twin recomputes n_frames/dims/pixel from the same md5
    // arithmetic the Spark side SYNTHESIZES with — but the Spark values
    // come back out of an actual GIF decode (and decode_ok pins the
    // round-trip), so a codec that dropped a frame, mis-sized a raster,
    // or perturbed a pixel hash-mismatches here
    "m3_frame_sample" ->
      """WITH h AS (SELECT doc_id, md5(text) AS m FROM documents
           WHERE text IS NOT NULL),
         b AS (SELECT doc_id,
           16*(strpos('0123456789abcdef', substr(m, 1, 1))-1)
             + (strpos('0123456789abcdef', substr(m, 2, 1))-1) AS b0,
           16*(strpos('0123456789abcdef', substr(m, 3, 1))-1)
             + (strpos('0123456789abcdef', substr(m, 4, 1))-1) AS b1,
           16*(strpos('0123456789abcdef', substr(m, 5, 1))-1)
             + (strpos('0123456789abcdef', substr(m, 6, 1))-1) AS b2
         FROM h),
         f AS (SELECT doc_id, b0,
               CAST((b0 % 48) + 2 AS BIGINT) AS n_frames,
               CAST(8 + (b1 % 8) AS BIGINT) AS width,
               CAST(8 + (b2 % 8) AS BIGINT) AS height
               FROM b),
         fr AS (SELECT doc_id, b0, n_frames, width, height,
                  CAST(unnest(generate_series(0, n_frames - 1, 8))
                    AS BIGINT) AS frame_idx
                FROM f)
         SELECT doc_id, n_frames, frame_idx,
           CAST(frame_idx * 40 AS BIGINT) AS ts_ms,
           width, height,
           CAST((b0 + 11 * frame_idx) % 256 AS BIGINT) AS pix,
           TRUE AS decode_ok
         FROM fr ORDER BY doc_id, frame_idx""",
    "m4_media_resize" ->
      """WITH h AS (SELECT doc_id, md5(text) AS m FROM documents
           WHERE text IS NOT NULL),
         b AS (SELECT doc_id,
           16*(strpos('0123456789abcdef', substr(m, 3, 1))-1)
             + (strpos('0123456789abcdef', substr(m, 4, 1))-1) AS b1,
           16*(strpos('0123456789abcdef', substr(m, 5, 1))-1)
             + (strpos('0123456789abcdef', substr(m, 6, 1))-1) AS b2
         FROM h),
         dims AS (SELECT doc_id,
           64 + (b1 % 192)*4 AS w0, 64 + (b2 % 192)*4 AS h0 FROM b)
         SELECT doc_id, CAST(w0 AS BIGINT) AS w0, CAST(h0 AS BIGINT) AS h0,
           CAST(CASE WHEN w0 >= h0 THEN 224
                ELSE floor(w0*224.0/h0) END AS BIGINT) AS w1,
           CAST(CASE WHEN w0 >= h0 THEN floor(h0*224.0/w0)
                ELSE 224 END AS BIGINT) AS h1,
           TRUE AS resize_ok
         FROM dims ORDER BY doc_id""",
    "d13_ngram_decontaminate" ->
      """WITH t AS (SELECT doc_id,
           regexp_split_to_array(trim(lower(text),
             ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
             '[\s\x0B]+') AS w
         FROM documents),
         sh AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g
                FROM t, unnest(generate_series(1, len(w)-7)) AS gs(i)),
         ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 20 = 0),
         bad AS (SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (g)
                 WHERE sh.doc_id % 20 <> 0)
         SELECT doc_id, lang, source FROM documents
         WHERE doc_id % 20 <> 0
           AND doc_id NOT IN (SELECT doc_id FROM bad)
         ORDER BY doc_id""",
    "d14_canonical_pick" ->
      s"""WITH RECURSIVE p AS (${Dedup.jaccardOracleSql(3, 0.8)}),
         e AS (SELECT doc_a AS src, doc_b AS dst FROM p
               UNION ALL SELECT doc_b, doc_a FROM p),
         v AS (SELECT DISTINCT src AS id FROM e),
         reach AS (
           SELECT id, id AS r FROM v
           UNION
           SELECT reach.id, e.dst AS r FROM reach JOIN e ON reach.r = e.src
         ),
         comp AS (SELECT id AS doc_id, min(r) AS group_id
                  FROM reach GROUP BY id),
         mem AS (SELECT c.doc_id, c.group_id, d.n_chars
                 FROM comp c JOIN documents d USING (doc_id)),
         win AS (SELECT doc_id, group_id, row_number() OVER (
                   PARTITION BY group_id ORDER BY n_chars DESC, doc_id)
                   AS rn FROM mem),
         loser AS (SELECT doc_id FROM win WHERE rn > 1)
         SELECT doc_id, lang, source FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM loser)
         ORDER BY doc_id""",
    "t16_pii_redact" ->
      """WITH aug AS (SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
             || '@example.com'
             || CASE WHEN doc_id % 3 = 0
                  THEN ' cc admin' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.org'
                  ELSE '' END
             || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
             || CAST((doc_id * 7) % 256 AS VARCHAR) AS t
         FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
             AS n_ips,
           md5(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'))
             AS redacted_fp
         FROM aug ORDER BY doc_id""",
    "t17_domain_mix" ->
      """WITH c AS (SELECT source, count(*) AS cnt,
           (TRY_CAST(substr(source, 4) AS BIGINT) % 4) + 1 AS w
         FROM documents GROUP BY source),
         t AS (SELECT sum(cnt) AS n, sum(w) AS wsum FROM c),
         thr AS (SELECT source, (256 * (n // 2) * w) // (wsum * cnt) AS thr
                 FROM c, t),
         h AS (SELECT doc_id, lang, source,
                 md5(CAST(doc_id AS VARCHAR)) AS m
               FROM documents),
         b AS (SELECT doc_id, lang, source,
                 16*(strpos('0123456789abcdef', substr(m, 1, 1))-1)
                   + (strpos('0123456789abcdef', substr(m, 2, 1))-1) AS b0
               FROM h)
         SELECT b.doc_id, b.lang, b.source FROM b JOIN thr USING (source)
         WHERE b.b0 < thr.thr ORDER BY doc_id""",
    // two-arg trim: the chunker is the Java-trim shingle kernel (see
    // jaccardOracleSql); chunks are full 2-word windows at stride 2,
    // i.e. shingle positions with (i-1) % 2 = 0, tail dropped
    "d15_boilerplate" ->
      """WITH t AS (SELECT doc_id, source,
           regexp_split_to_array(trim(lower(text),
             ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
             '[\s\x0B]+') AS w
         FROM documents),
         sh AS (SELECT doc_id, source, array_to_string(w[i:i+1], ' ') AS g
                FROM t, unnest(generate_series(1, len(w)-1)) AS gs(i)
                WHERE (i-1) % 2 = 0),
         bp AS (SELECT source, g FROM sh GROUP BY 1, 2
                HAVING count(DISTINCT doc_id) >= 3),
         per AS (SELECT sh.doc_id, count(*) AS n_chunks,
                   count(bp.g) AS n_boiler
                 FROM sh LEFT JOIN bp
                   ON sh.source = bp.source AND sh.g = bp.g
                 GROUP BY 1)
         SELECT doc_id, n_chunks, n_boiler,
           round(CAST(n_boiler AS DOUBLE) / n_chunks, 4) AS boiler_ratio,
           n_boiler * 2 <= n_chunks AS keep
         FROM per ORDER BY doc_id""",
    // d16: the n8 oracle (probe restriction dropped) nested as a CTE —
    // the d14 pattern — then mutual-edge filter + the d8 reach-CTE CC.
    // cosine is the round4'd output column on BOTH engines, so the
    // theta cut can't straddle a representation difference.
    "d16_graph_dedup" ->
      s"""WITH RECURSIVE g AS (${lshOracle(multiProbe = false,
            tables = 4, probePred = "TRUE", adaptiveTarget = Some(32))}),
         m AS (SELECT e.probe_id AS a, e.neighbor_id AS b
               FROM g e JOIN g r ON e.probe_id = r.neighbor_id
                                AND e.neighbor_id = r.probe_id
               WHERE e.cosine >= 0.3 AND r.cosine >= 0.3
                 AND e.probe_id < e.neighbor_id),
         ed AS (SELECT a AS src, b AS dst FROM m
                UNION ALL SELECT b, a FROM m),
         v AS (SELECT DISTINCT src AS id FROM ed),
         reach AS (
           SELECT id, id AS r FROM v
           UNION
           SELECT reach.id, ed.dst AS r
           FROM reach JOIN ed ON reach.r = ed.src
         )
         SELECT id, min(r) AS comp FROM reach GROUP BY id ORDER BY id""",
    "t18_split_assign" ->
      """WITH h AS (SELECT doc_id, lang,
           md5('split:' || CAST(doc_id AS VARCHAR)) AS m
         FROM documents),
         b AS (SELECT doc_id, lang,
             16*(strpos('0123456789abcdef', substr(m, 1, 1))-1)
               + (strpos('0123456789abcdef', substr(m, 2, 1))-1) AS b0
           FROM h)
         SELECT doc_id, lang,
           CASE WHEN b0 < 204 THEN 'train'
                WHEN b0 < 230 THEN 'val'
                ELSE 'test' END AS split
         FROM b ORDER BY doc_id""",
    "d17_substring_runs" -> Dedup.substringRunsOracleSql(5, 10),
    "t25_cdc_chunks" -> Dedup.cdcChunksOracleSql(8),
    "d18_cdc_neardup" -> Dedup.cdcNearDupOracleSql(8, 3, Some(16)),
    // t19/t20/t21 tokenize via the t13 words-twin (plain trim + \s+
    // split — the fixture carries no leading control whitespace, same
    // caveat t13/t12 already document)
    "t19_quality_classifier" ->
      """WITH tok AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+')) AS tok
         FROM documents),
         b AS (SELECT doc_id,
             (16*16*16*(strpos('0123456789abcdef', substr(md5(tok),1,1))-1)
             +16*16*(strpos('0123456789abcdef', substr(md5(tok),2,1))-1)
             +16*(strpos('0123456789abcdef', substr(md5(tok),3,1))-1)
             +(strpos('0123456789abcdef', substr(md5(tok),4,1))-1))
             % 1024 AS bkt
           FROM tok),
         sc AS (SELECT doc_id, count(*) AS n_tok,
             CAST(sum((bkt * 2654435761) % 2001 - 1000) AS BIGINT)
               AS s_milli
           FROM b GROUP BY 1)
         SELECT doc_id, n_tok,
           round(CAST(s_milli AS DOUBLE)/(n_tok*1000.0), 4) AS score,
           s_milli > 0 AS keep
         FROM sc ORDER BY doc_id""",
    "t20_unigram_surprisal" ->
      """WITH tok AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+')) AS tok
         FROM documents),
         v AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v),
         s AS (SELECT tok,
                 CAST(length(bin(total // cnt)) - 1 AS BIGINT) AS bits
               FROM v, tot),
         per AS (SELECT doc_id, count(*) AS n_tok,
                   CAST(sum(bits) AS BIGINT) AS bits_sum
                 FROM tok JOIN s USING (tok) GROUP BY 1)
         SELECT doc_id, n_tok, bits_sum,
           round(CAST(bits_sum AS DOUBLE)/n_tok, 4) AS avg_bits,
           CASE WHEN bits_sum*100 < n_tok*405 THEN 'head'
                WHEN bits_sum*100 < n_tok*425 THEN 'middle'
                ELSE 'tail' END AS band
         FROM per ORDER BY doc_id""",
    // t26: transitions rebuilt by an (i, i+1) self-join over the
    // positioned token list (the set Spark derives map-side from
    // arrays_zip); every count stays integer until the single final
    // division, so the doubles hash-match.
    "t26_bigram_surprisal" ->
      """WITH wl AS (SELECT doc_id,
           regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+') AS w
         FROM documents),
         tk AS (SELECT doc_id, unnest(w) AS tok,
                  generate_subscripts(w, 1) AS i FROM wl),
         tr AS (SELECT a.doc_id, a.tok AS prev, b.tok AS tok
                FROM tk a JOIN tk b
                  ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         bg AS (SELECT prev, tok, count(*) AS c_big FROM tr GROUP BY 1, 2),
         cx AS (SELECT prev, CAST(sum(c_big) AS BIGINT) AS c_ctx
                FROM bg GROUP BY 1),
         tb AS (SELECT prev, tok,
                  CAST(length(bin(c_ctx // c_big)) - 1 AS BIGINT) AS bbits
                FROM bg JOIN cx USING (prev)),
         v AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v),
         ub AS (SELECT tok,
                  CAST(length(bin(total // cnt)) - 1 AS BIGINT) AS ubits
                FROM v, tot),
         us AS (SELECT doc_id, count(*) AS n_tok,
                  CAST(sum(ubits) AS BIGINT) AS usum
                FROM tk JOIN ub USING (tok) GROUP BY 1),
         fd AS (SELECT doc_id, ubits AS u1
                FROM tk JOIN ub USING (tok) WHERE i = 1),
         td AS (SELECT doc_id, CAST(sum(bbits) AS BIGINT) AS bsum
                FROM tr JOIN tb USING (prev, tok) GROUP BY 1),
         per AS (SELECT us.doc_id, us.n_tok,
                   us.usum + fd.u1 + COALESCE(td.bsum, 0) AS bits_sum
                 FROM us JOIN fd USING (doc_id)
                 LEFT JOIN td USING (doc_id))
         SELECT doc_id, n_tok, bits_sum,
           round(CAST(bits_sum AS DOUBLE)/(n_tok*2), 4) AS avg_bits,
           CASE WHEN bits_sum*100 < n_tok*2*410 THEN 'head'
                WHEN bits_sum*100 < n_tok*2*420 THEN 'middle'
                ELSE 'tail' END AS band
         FROM per ORDER BY doc_id""",
    "t27_bpe_merges" -> bpeOracle(4),
    // t27b runs the in-process trainer against the SAME unrolled-merge
    // oracle — identical output contract, different execution path
    "t27b_bpe_local" -> bpeOracle(4),
    // t29: same positioned-token self-join as t26 for the bigram
    // features; bucket weights are pure integer floor-log2 arithmetic
    "t29_dsir_weights" ->
      s"""WITH $dsirCtes
         SELECT doc_id, n_feat, score_bits,
           round(CAST(score_bits AS DOUBLE)/n_feat, 4) AS avg_bits,
           score_bits*100 > n_feat*(-8) AS keep
         FROM dper ORDER BY doc_id""",
    "t30_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id,
           md5('ep1:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
         sh AS (SELECT doc_id, h,
           CAST((16*(strpos('0123456789abcdef', substr(h,1,1))-1)
             + (strpos('0123456789abcdef', substr(h,2,1))-1)) % 16
             AS BIGINT) AS shard
         FROM h)
         SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard
             ORDER BY h, doc_id) AS BIGINT) AS ordinal
         FROM sh ORDER BY shard, ordinal""",
    "t31_source_upsample" ->
      """WITH b AS (SELECT doc_id, source,
           try_cast(substring(source, 4) AS BIGINT) % 5 + 2 AS wh,
           (16*(strpos('0123456789abcdef',
              substr(md5('up:' || CAST(doc_id AS VARCHAR)),1,1))-1)
            + (strpos('0123456789abcdef',
              substr(md5('up:' || CAST(doc_id AS VARCHAR)),2,1))-1))
             AS b0
         FROM documents),
         r AS (SELECT doc_id, source,
           CAST(wh // 2 + CASE WHEN wh % 2 = 1 AND b0 < 128
             THEN 1 ELSE 0 END AS BIGINT) AS n_rep
         FROM b)
         SELECT doc_id, source, n_rep,
           CAST(unnest(generate_series(1, n_rep)) AS BIGINT)
             AS replica_idx
         FROM r ORDER BY doc_id, replica_idx""",
    // pipe2: the t29 CTE chain gates the corpus, d1's keep-first rule
    // dedups the survivors, t12's packing CTEs (renamed p_*) pack them
    "pipe2_select_pack" ->
      s"""WITH $dsirCtes,
         keep0 AS (SELECT doc_id FROM dper
                   WHERE score_bits*100 > n_feat*(-8)),
         kd AS (SELECT d.* FROM documents d JOIN keep0 USING (doc_id)),
         kfp AS (SELECT doc_id,
             md5(regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+', ' ', 'g')) AS xfp
           FROM kd),
         kfirst AS (SELECT xfp, min(doc_id) AS doc_id
                    FROM kfp GROUP BY 1),
         uniq AS (SELECT kd.* FROM kd JOIN kfirst USING (doc_id)),
         p_d AS (SELECT doc_id, source,
           md5(regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+', ' ', 'g')) AS fp,
           len(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+')) AS tok
         FROM uniq),
         p_sh AS (SELECT doc_id, source, fp, tok,
           CAST(strpos('0123456789abcdef', substr(fp, 1, 1)) - 1 AS BIGINT)
             AS shard
         FROM p_d),
         p_c AS (SELECT doc_id, source, shard, tok,
           sum(tok) OVER (PARTITION BY source, shard ORDER BY fp, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM p_sh)
         SELECT doc_id, source, shard, CAST(tok AS BIGINT) AS tok,
           CAST((cum - tok) // 512 AS BIGINT) AS chunk_id,
           CAST((cum - tok) % 512 AS BIGINT) AS chunk_offset
         FROM p_c
         ORDER BY source, shard, chunk_id, chunk_offset, doc_id""",
    // t28: the same four-step chain, then doc words ⋈ w4 segmentation
    "t28_bpe_encode" ->
      s"""WITH ${bpeCtes(4)},
         seg AS (SELECT word, CAST(len(s) AS BIGINT) AS n_syms FROM w4),
         dtok AS (SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+')) AS word
           FROM documents),
         j AS (SELECT doc_id, count(*) AS n_words,
                 CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens
               FROM dtok JOIN seg USING (word)
               WHERE length(word) > 0 GROUP BY 1)
         SELECT doc_id, n_words, n_bpe_tokens,
           round(CAST(n_bpe_tokens AS DOUBLE)/n_words, 4)
             AS tokens_per_word
         FROM j ORDER BY doc_id""",
    "api5_search_facets" ->
      """SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
         FROM documents
         WHERE list_has_any(
           regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+'),
           ['dup', 'vector', 'merge', 'scan'])
         GROUP BY lang, source ORDER BY lang, source""",
    // t22: same L-normalized integer-factor BM25 as Retrieval.scoreCol —
    // BIGINT factors into CAST-to-DOUBLE divisions combined in the same
    // fixed operation order as the Scala expression, the four term
    // scores summed in the same left-assoc order as the reduceLeft, so
    // the doubles are bit-identical.
    "t22_bm25_topk" ->
      """WITH d AS (SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+')) AS BIGINT) AS dl
         FROM documents),
         w AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+')) AS word
         FROM documents),
         tf AS (SELECT doc_id,
             CAST(SUM(CASE WHEN word = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS tf_dup,
             CAST(SUM(CASE WHEN word = 'vector' THEN 1 ELSE 0 END) AS BIGINT) AS tf_vector,
             CAST(SUM(CASE WHEN word = 'merge' THEN 1 ELSE 0 END) AS BIGINT) AS tf_merge,
             CAST(SUM(CASE WHEN word = 'scan' THEN 1 ELSE 0 END) AS BIGINT) AS tf_scan
           FROM w WHERE word IN ('dup', 'vector', 'merge', 'scan')
           GROUP BY doc_id),
         c AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(dl) AS BIGINT) AS l_tot FROM d),
         f AS (SELECT
             CAST(SUM(CASE WHEN tf_dup > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_dup,
             CAST(SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_vector,
             CAST(SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_merge,
             CAST(SUM(CASE WHEN tf_scan > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_scan
           FROM tf),
         s AS (SELECT tf.doc_id, d.dl,
             (CAST(2*n_docs - 2*df_dup + 1 AS DOUBLE) / CAST(2*df_dup + 1 AS DOUBLE))
               * (CAST(44*tf_dup AS DOUBLE) / (CAST(20*tf_dup + 6 AS DOUBLE) + CAST(18*d.dl*n_docs AS DOUBLE) / CAST(l_tot AS DOUBLE)))
             + (CAST(2*n_docs - 2*df_vector + 1 AS DOUBLE) / CAST(2*df_vector + 1 AS DOUBLE))
               * (CAST(44*tf_vector AS DOUBLE) / (CAST(20*tf_vector + 6 AS DOUBLE) + CAST(18*d.dl*n_docs AS DOUBLE) / CAST(l_tot AS DOUBLE)))
             + (CAST(2*n_docs - 2*df_merge + 1 AS DOUBLE) / CAST(2*df_merge + 1 AS DOUBLE))
               * (CAST(44*tf_merge AS DOUBLE) / (CAST(20*tf_merge + 6 AS DOUBLE) + CAST(18*d.dl*n_docs AS DOUBLE) / CAST(l_tot AS DOUBLE)))
             + (CAST(2*n_docs - 2*df_scan + 1 AS DOUBLE) / CAST(2*df_scan + 1 AS DOUBLE))
               * (CAST(44*tf_scan AS DOUBLE) / (CAST(20*tf_scan + 6 AS DOUBLE) + CAST(18*d.dl*n_docs AS DOUBLE) / CAST(l_tot AS DOUBLE)))
             AS raw
           FROM tf JOIN d USING (doc_id), c, f)
         SELECT doc_id, dl, round(raw, 4) AS score
         FROM s ORDER BY score DESC, doc_id LIMIT 20""",
    // t32: the t22 BM25 CTEs (corpus minus the probe doc) + the n1
    // cosine CTEs (probe = vec 0) + rank windows + the RRF fusion —
    // every addend one IEEE division of small integers, so the fused
    // doubles reproduce bit-for-bit
    "t32_hybrid_rrf" ->
      s"""WITH d AS (SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+')) AS BIGINT) AS dl
         FROM documents WHERE doc_id <> 0),
         w AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+')) AS word
         FROM documents WHERE doc_id <> 0),
         tf AS (SELECT doc_id,
             CAST(SUM(CASE WHEN word = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS tf_dup,
             CAST(SUM(CASE WHEN word = 'vector' THEN 1 ELSE 0 END) AS BIGINT) AS tf_vector,
             CAST(SUM(CASE WHEN word = 'merge' THEN 1 ELSE 0 END) AS BIGINT) AS tf_merge,
             CAST(SUM(CASE WHEN word = 'scan' THEN 1 ELSE 0 END) AS BIGINT) AS tf_scan
           FROM w WHERE word IN ('dup', 'vector', 'merge', 'scan')
           GROUP BY doc_id),
         c AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(dl) AS BIGINT) AS l_tot FROM d),
         f AS (SELECT
             CAST(SUM(CASE WHEN tf_dup > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_dup,
             CAST(SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_vector,
             CAST(SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_merge,
             CAST(SUM(CASE WHEN tf_scan > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_scan
           FROM tf),
         s AS (SELECT tf.doc_id, round(
             (CAST(2*n_docs - 2*df_dup + 1 AS DOUBLE) / CAST(2*df_dup + 1 AS DOUBLE))
               * (CAST(44*tf_dup AS DOUBLE) / (CAST(20*tf_dup + 6 AS DOUBLE) + CAST(18*d.dl*n_docs AS DOUBLE) / CAST(l_tot AS DOUBLE)))
             + (CAST(2*n_docs - 2*df_vector + 1 AS DOUBLE) / CAST(2*df_vector + 1 AS DOUBLE))
               * (CAST(44*tf_vector AS DOUBLE) / (CAST(20*tf_vector + 6 AS DOUBLE) + CAST(18*d.dl*n_docs AS DOUBLE) / CAST(l_tot AS DOUBLE)))
             + (CAST(2*n_docs - 2*df_merge + 1 AS DOUBLE) / CAST(2*df_merge + 1 AS DOUBLE))
               * (CAST(44*tf_merge AS DOUBLE) / (CAST(20*tf_merge + 6 AS DOUBLE) + CAST(18*d.dl*n_docs AS DOUBLE) / CAST(l_tot AS DOUBLE)))
             + (CAST(2*n_docs - 2*df_scan + 1 AS DOUBLE) / CAST(2*df_scan + 1 AS DOUBLE))
               * (CAST(44*tf_scan AS DOUBLE) / (CAST(20*tf_scan + 6 AS DOUBLE) + CAST(18*d.dl*n_docs AS DOUBLE) / CAST(l_tot AS DOUBLE)))
             , 4) AS score
           FROM tf JOIN d USING (doc_id), c, f),
         lex AS (SELECT doc_id, CAST(row_number() OVER (
                 ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
               FROM s),
         u AS ($duckUnnest),
         sc AS (SELECT b.vec_id AS doc_id, ${duckCos("a.x", "b.x")} AS cos
                FROM u a JOIN u b
                  ON a.i = b.i AND a.vec_id = 0 AND b.vec_id <> 0
                GROUP BY b.vec_id),
         sem AS (SELECT doc_id, CAST(row_number() OVER (
                 ORDER BY cos DESC, doc_id) AS BIGINT) AS sem_rank
               FROM sc),
         fuse AS (SELECT doc_id, lex_rank, sem_rank,
             round(COALESCE(CAST(1 AS DOUBLE)/(60 + lex_rank), CAST(0 AS DOUBLE))
                 + COALESCE(CAST(1 AS DOUBLE)/(60 + sem_rank), CAST(0 AS DOUBLE)), 6) AS rrf
           FROM (SELECT * FROM lex WHERE lex_rank <= 50) l
           FULL OUTER JOIN (SELECT * FROM sem WHERE sem_rank <= 50) m
             USING (doc_id))
         SELECT doc_id, lex_rank, sem_rank, rrf FROM fuse
         ORDER BY rrf DESC, doc_id LIMIT 20""",
    "t21_chunk_windows" ->
      """WITH d AS (SELECT doc_id,
           regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\s\x0B]+') AS w
         FROM documents),
         c AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS len,
             CASE WHEN len(w) <= 16 THEN 1
                  ELSE (len(w) - 16 + 11) // 12 + 1 END AS nc
           FROM d),
         e AS (SELECT doc_id, w, len, CAST(i AS BIGINT) AS chunk_idx
               FROM c, unnest(generate_series(0, nc - 1)) AS gs(i)),
         f AS (SELECT doc_id, chunk_idx, chunk_idx * 12 AS start_tok,
                 least(16, len - chunk_idx * 12) AS n_tok, w
               FROM e)
         SELECT doc_id, chunk_idx, start_tok, n_tok,
           md5(array_to_string(w[start_tok + 1 : start_tok + n_tok], ' '))
             AS chunk_fp
         FROM f ORDER BY doc_id, chunk_idx""",
    // pipe1: the d1 → d15 → t8 → t17 → t18 twins chained as CTEs, each
    // stage reading the previous stage's survivors — the same composition
    // the Spark entry declares
    "pipe1_corpus_build" -> {
      val stop = Text.stopwords.map(duckMarker).mkString(" + ")
      s"""WITH k1 AS (SELECT min(doc_id) AS doc_id FROM documents
           GROUP BY md5(regexp_replace(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+', ' ', 'g'))),
         s1 AS (SELECT d.* FROM documents d JOIN k1 USING (doc_id)),
         bt AS (SELECT doc_id, source,
             regexp_split_to_array(trim(lower(text),
               ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
               '[\\s\\x0B]+') AS w
           FROM s1),
         sh AS (SELECT doc_id, source, array_to_string(w[i:i+1], ' ') AS g
                FROM bt, unnest(generate_series(1, len(w)-1)) AS gs(i)
                WHERE (i-1) % 2 = 0),
         bp AS (SELECT source, g FROM sh GROUP BY 1, 2
                HAVING count(DISTINCT doc_id) >= 3),
         per AS (SELECT sh.doc_id, count(*) AS n_chunks,
                   count(bp.g) AS n_boiler
                 FROM sh LEFT JOIN bp
                   ON sh.source = bp.source AND sh.g = bp.g
                 GROUP BY 1),
         s2 AS (SELECT s1.* FROM s1 JOIN per USING (doc_id)
                WHERE per.n_boiler * 2 <= per.n_chunks),
         qd AS (SELECT doc_id, lang, source,
             len(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+')) AS wc,
             ($stop) AS stopc,
             len(list_filter(regexp_split_to_array(trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[\\s\\x0B]+'),
               x -> regexp_full_match(x, '^[a-z]+$$'))) AS alphac
           FROM s2),
         s3 AS (SELECT doc_id, lang, source FROM qd
           WHERE round(100.0 * (0.5 * (CAST(stopc AS DOUBLE) / wc)
               + 0.3 * (CAST(least(wc, 50) AS DOUBLE) / 50.0)
               + 0.2 * (CAST(alphac AS DOUBLE) / wc)), 4) >= 40
             AND lang IN ('en','de','es')),
         c AS (SELECT source, count(*) AS cnt,
             (TRY_CAST(substr(source, 4) AS BIGINT) % 4) + 1 AS w
           FROM s3 GROUP BY source),
         t AS (SELECT sum(cnt) AS n, sum(w) AS wsum FROM c),
         thr AS (SELECT source, (256 * (n // 2) * w) // (wsum * cnt) AS thr
                 FROM c, t),
         mb AS (SELECT doc_id, lang, source,
             16*(strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))-1)
               + (strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))-1) AS b0
           FROM s3),
         s4 AS (SELECT mb.doc_id, mb.lang, mb.source
                FROM mb JOIN thr USING (source) WHERE mb.b0 < thr.thr),
         sb AS (SELECT doc_id, lang, source,
             16*(strpos('0123456789abcdef',
                   substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1))-1)
               + (strpos('0123456789abcdef',
                   substr(md5('split:' || CAST(doc_id AS VARCHAR)), 2, 1))-1)
               AS b0
           FROM s4)
         SELECT doc_id, lang, source,
           CASE WHEN b0 < 204 THEN 'train'
                WHEN b0 < 230 THEN 'val'
                ELSE 'test' END AS split
         FROM sb ORDER BY doc_id"""
    }
  )
}
