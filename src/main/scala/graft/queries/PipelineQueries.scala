package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit, lpad, when}
import graft.pipeline.{BpeTrainer, ConnectedComponents, CorpusClean, Decontam, Dedup, Multimodal, Packing, Quantization, Sampling, Similarity, Sketches, TextAnalysis}

/** Training-data pipeline operators (dedup / similarity / text analysis /
  * multimodal) over the driver's `documents` and `embeddings` tables, each
  * with a value-identical DuckDB oracle (portable md5-based hashing, fixed
  * fold order for float reductions).
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** segment-gate corpus: a 10-token boilerplate header planted on every
    * 4th doc (df = n/4, shared by all four segment gates and their
    * DuckDB oracles) */
  private def plantedDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("text",
      when(col("doc_id") % 4 === 0,
        concat(lit("shared header banner intro card segment alpha beta gamma delta "),
          col("text"))).otherwise(col("text")))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d))),
    "pipe_minhash_sig" -> ((s, d) => Dedup.minhashSignatures(docs(s, d))),
    // gates pin (8, 4): the oracle recomputes exactly this banding
    "pipe_minhash_pairs" -> ((s, d) =>
      Dedup.minhashPairs(docs(s, d), numHashes = 8, bands = 4)),
    "pipe_jaccard_pairs" -> ((s, d) => Dedup.jaccardPairs(docs(s, d))),
    // incremental ingest dedup: even doc_ids are the already-ingested
    // corpus (probed via its narrow signature index, text fetched only
    // for verified candidates), odd doc_ids are the arriving batch
    "pipe_dedup_incremental" -> ((s, d) => {
      val all = docs(s, d)
      Dedup.incrementalDedupPairs(all.filter(col("doc_id") % 2 === 0),
        all.filter(col("doc_id") % 2 === 1))
    }),
    // the admitted subset of that batch (no match in corpus or earlier
    // in-batch) — what an ingest appends to the index before the next day
    "pipe_dedup_incr_admit" -> ((s, d) => {
      val all = docs(s, d)
      Dedup.incrementalAdmit(all.filter(col("doc_id") % 2 === 0),
        all.filter(col("doc_id") % 2 === 1))
    }),
    "pipe_simhash" -> ((s, d) => Dedup.simhash(docs(s, d))),
    // SimHash near-dup pairs via the pigeonhole block join — EXACT at
    // hamming <= 3, so the oracle is the plain quadratic reference
    "pipe_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(docs(s, d))),
    // substring-level dedup: duplicated 8-token-span signals per doc
    "pipe_dedup_substring" -> ((s, d) => Dedup.duplicatedSpans(docs(s, d))),
    // C4-style global segment dedup + rebuild: plant a 10-token
    // boilerplate header on every 4th doc; exactly one copy survives
    // corpus-wide and every other planted doc loses its first segment
    "pipe_dedup_segments" -> ((s, d) => Dedup.dedupSegments(plantedDocs(s, d))),
    // df-based boilerplate strip: same planted corpus; the header (df=125)
    // is removed from EVERY planted doc, first occurrence included
    "pipe_strip_boilerplate" -> ((s, d) =>
      Dedup.stripBoilerplate(plantedDocs(s, d), maxDocFreq = 50)),
    // fingerprint-keyed twins (long-segment posture: the content shuffles
    // carry md5(seg), never raw text) — output identity with the
    // text-keyed path is the contract, so they share its oracles verbatim
    "pipe_dedup_segments_fp" -> ((s, d) =>
      Dedup.dedupSegments(plantedDocs(s, d), keyByFingerprint = true)),
    "pipe_strip_boilerplate_fp" -> ((s, d) =>
      Dedup.stripBoilerplate(plantedDocs(s, d), maxDocFreq = 50,
        keyByFingerprint = true)),
    "pipe_sim_topk" -> ((s, d) => Similarity.bruteCosineTopK(emb(s, d))),
    "pipe_sim_lsh" -> ((s, d) => Similarity.lshCosinePairs(emb(s, d),
      rowsPerBand = Similarity.LshRowsPerBand)),
    "pipe_sim_ivf" -> ((s, d) => Similarity.ivfCosineTopK(emb(s, d), nCentroids = 16)),
    "pipe_sim_ivf_kmeans" -> ((s, d) => Similarity.ivfKmeansTopK(emb(s, d), nCentroids = 16)),
    // embedding-cosine near-duplicate detection = LSH pairs at a high
    // threshold (same plan, dedup use-case)
    "pipe_dedup_embedding" -> ((s, d) => Similarity.lshCosinePairs(emb(s, d),
      rowsPerBand = Similarity.LshRowsPerBand, threshold = 0.45)),
    "pipe_text_tokens" -> ((s, d) => TextAnalysis.tokenStats(docs(s, d))),
    "pipe_text_bpe" -> ((s, d) => TextAnalysis.bpeTokens(docs(s, d))),
    "pipe_text_quality" -> ((s, d) => TextAnalysis.quality(docs(s, d))),
    "pipe_text_langid" -> ((s, d) => TextAnalysis.langId(docs(s, d))),
    "pipe_text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(docs(s, d))),
    "pipe_text_repetition" -> ((s, d) => TextAnalysis.repetition(docs(s, d))),
    // corpus-wide boilerplate n-grams (top-20 trigrams by occurrence)
    "pipe_text_topngrams" -> ((s, d) => TextAnalysis.topNgrams(docs(s, d))),
    // recall@5 of the kmeans-IVF index vs exact brute force
    "pipe_sim_recall" -> ((s, d) => Similarity.recallAtK(emb(s, d))),
    // recall@5 of the full IVFADC chain vs exact brute force: probe loss
    // and PQ quantization distortion measured together
    "pipe_sim_recall_ivfadc" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.recallVs(e, Quantization.ivfAdcTopK(e))
    }),
    // KMV distinct-token sketch per source vs the exact count
    "pipe_sketch_kmv" -> ((s, d) => Sketches.distinctTokenKmv(docs(s, d))),
    // count-min sketch: top-20 true heavy hitters with their fixed-memory
    // CM estimates beside the exact counts
    "pipe_sketch_cm" -> ((s, d) => Sketches.countMinHeavyHitters(docs(s, d))),
    // per-doc top-3 tf-idf keywords
    "pipe_text_tfidf" -> ((s, d) => TextAnalysis.tfidfTopTerms(docs(s, d))),
    // strided 64/48 chunking with per-chunk fingerprints
    "pipe_chunk" -> ((s, d) => Packing.chunk(docs(s, d))),
    "pipe_pack" -> ((s, d) => Packing.greedyPack(docs(s, d))),
    "pipe_mm_decode" -> ((s, d) => Multimodal.decoded(s, docs(s, d))),
    // REAL pixel decode (JDK ImageIO): plant 8x8 gray PNGs carrying an
    // arithmetic pattern, decode the actual bytes back to pixels, emit
    // integer-exact luminance sum + aHash fingerprint halves
    "pipe_mm_decode_real" -> ((s, d) => {
      import s.implicits._
      val planted = docs(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.grayPatternPng(id))))
        .toDF("doc_id", "payload")
      Multimodal.decodeImages(s, planted)
    }),
    // REAL multi-frame decode: plant 6-frame animated gray GIFs carrying
    // an arithmetic per-frame pattern, decode the actual container with
    // the JDK reader, sample every 2nd frame, emit integer-exact sums.
    // Codec boundary: GIF is the one container the JRE decodes natively;
    // MP4 et al. need an ffmpeg-class decoder dropped into the same
    // mapPartitions slot — see README "Video-codec boundary" and
    // Multimodal.videoFrames; everything above the frame fingerprint
    // (frameJaccardPairs) is codec-agnostic.
    "pipe_mm_frames_real" -> ((s, d) => {
      import s.implicits._
      val planted = docs(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.grayPatternGif(id))))
        .toDF("doc_id", "payload")
      Multimodal.videoFrameSamples(s, planted)
    }),
    // video near-dup: groups of 5 docs share their first 4 frame seeds,
    // last 2 are per-doc — REAL GIFs decoded, frame-set Jaccard >= 0.45
    // recovers exactly the within-group pairs
    "pipe_mm_video_neardup" -> ((s, d) => {
      import s.implicits._
      val planted = docs(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val seeds = (0 until 4).map(j => (id / 5) * 1000 + j) ++
            (4 until 6).map(j => 700000 + id * 1000 + j)
          (id, Multimodal.grayPatternGifSeeds(seeds.map(_.toLong)))
        }).toDF("doc_id", "payload")
      Multimodal.frameJaccardPairs(
        Multimodal.videoFrameSamples(s, planted, stride = 1))
    }),
    // perceptual image near-dup pairs: groups of 5 docs share a gradient
    // orientation, each member differs by one hot pixel — decode the REAL
    // PNGs, aHash, pigeonhole hamming join at <= 7 bits
    // planted identity space must be collision-resistant (the r7 video
    // lesson): wide co-prime moduli (251/239) keep each GROUP's base
    // pattern distinct, so aHash buckets hold ~one group, not a 10×-corpus
    // flood (narrow %5/%7 coefficients measured 40 s at 10×; wide: ~6 s)
    "pipe_mm_image_neardup" -> ((s, d) => {
      import s.implicits._
      val planted = docs(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val grp = id / 5
          val img = new java.awt.image.BufferedImage(8, 8,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until 8; x <- 0 until 8) {
            val g =
              if (x == (id % 8) && y == ((id / 8) % 8)) 255
              else (((3 + (grp % 251) * 13) * x + (5 + (grp % 239) * 11) * y + grp) % 256).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }).toDF("doc_id", "payload")
      Dedup.ahashPairs(Multimodal.decodeImages(s, planted), maxHamming = 7)
    }),
    // REAL resize of the decoded pixels — nearest-neighbor with the
    // explicit integer mapping src=(dst*srcDim)/dstDim, 8x8 -> 4x3
    "pipe_mm_resize_real" -> ((s, d) => {
      import s.implicits._
      val planted = docs(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.grayPatternPng(id))))
        .toDF("doc_id", "payload")
      Multimodal.resizeImages(s, planted, 4, 3)
    }),
    // the audio twin: WAV (chunk walk past a JUNK chunk) and FLAC
    // (STREAMINFO bit unpacking) headers planted with known stream params
    "pipe_mm_audio_meta" -> ((s, d) => {
      import s.implicits._
      val planted = docs(s, d).select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          val sr = 8000L + (id % 5) * 4000L
          val ch = (nc % 2).toInt + 1
          val bps = if (id % 3 == 0) 24 else 16
          val bytes =
            if (id % 2 == 0) Multimodal.wavHeaderBytes(sr, ch, bps)
            else Multimodal.flacHeaderBytes(sr, ch, bps)
          (id, bytes)
        }).toDF("doc_id", "payload")
      Multimodal.audioMetas(s, planted)
    }),
    // the video twin (What's missing #3's codec-free remainder): plant
    // well-formed ISO-BMFF boxes (ftyp + nested moov/trak/stbl, video
    // trak ± audio trak) with known brand/timescale/duration/dims/codec/
    // keyframe-count, recover them all by walking raw bytes — no codec
    "pipe_mm_video_meta" -> ((s, d) => {
      import s.implicits._
      val planted = docs(s, d).select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          val ts = 600L + (id % 4) * 300L
          val bytes = Multimodal.mp4Bytes(
            brand = if (id % 2 == 0) "isom" else "mp42",
            timescale = ts,
            durationUnits = ts * (id % 30 + 1),
            width = nc % 640 + 16, height = id % 360 + 16,
            codec = (id % 3) match {
              case 0 => "avc1"; case 1 => "hev1"; case _ => "vp09" },
            nKeyframes = (id % 7 + 1).toInt,
            withAudio = id % 2 == 1)
          (id, bytes)
        }).toDF("doc_id", "payload")
      Multimodal.videoMetas(s, planted)
    }),
    // REAL container-header parsing (no codec): plant PNG/JPEG/GIF/BMP
    // headers carrying known dimensions, recover them by parsing bytes
    "pipe_mm_image_meta" -> ((s, d) => {
      import s.implicits._
      val planted = docs(s, d).select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          val (w, h) = (nc % 1000 + 1, id % 500 + 1)
          val bytes = (id % 4) match {
            case 0 => Multimodal.pngHeaderBytes(w, h)
            case 1 => Multimodal.jpegHeaderBytes(w, h)
            case 2 => Multimodal.gifHeaderBytes(w, h)
            case _ => Multimodal.bmpHeaderBytes(w, h)
          }
          (id, bytes)
        }).toDF("doc_id", "payload")
      Multimodal.imageMetas(s, planted)
    }),
    "pipe_mm_resize" -> ((s, d) => Multimodal.resized(s, docs(s, d))),
    "pipe_mm_frames" -> ((s, d) => Multimodal.frameSamples(s, docs(s, d))),
    "pipe_emb_quantize" -> ((s, d) => Quantization.quantizeInt8(emb(s, d))),
    "pipe_emb_pq" -> ((s, d) => Quantization.pqEncode(emb(s, d))),
    "pipe_sim_adc" -> ((s, d) => Quantization.adcTopK(emb(s, d))),
    // IVFADC: ADC search restricted to the query's nProbe k-means buckets
    "pipe_sim_ivfadc" -> ((s, d) => Quantization.ivfAdcTopK(emb(s, d))),
    // two-stage retrieval: IVFADC shortlist (k'=20), exact cosine re-rank
    "pipe_sim_rerank" -> ((s, d) => Quantization.ivfAdcRerankTopK(emb(s, d))),
    // near-dup clustering: connected components over the MinHash-LSH
    // pair set (cluster id = component's minimum doc_id)
    "pipe_dedup_clusters" -> ((s, d) =>
      ConnectedComponents.clusters(
        Dedup.minhashPairs(docs(s, d), numHashes = 8, bands = 4))),
    // quality-aware representative selection: within each near-dup
    // cluster keep the highest-quality member (ties -> lowest doc_id)
    "pipe_dedup_keep_best" -> ((s, d) => CorpusClean.keepBest(docs(s, d))),
    // semantic (embedding-space) dedup groups: the same CC contraction
    // over the SRP-LSH cosine pair set at the near-dup threshold
    "pipe_dedup_emb_clusters" -> ((s, d) =>
      ConnectedComponents
        .clusters(Similarity.lshCosinePairs(emb(s, d),
          rowsPerBand = Similarity.LshRowsPerBand, threshold = 0.45),
          aCol = "id_a", bCol = "id_b")
        .select(col("doc_id").as("vec_id"), col("cluster_id"))),
    // flagship composition: quality -> lang -> exact dedup -> near-dup
    // removal, all from the engine's own operators
    "pipe_corpus_clean" -> ((s, d) => CorpusClean.clean(docs(s, d))),
    // benchmark decontamination: doc_id % 37 == 0 stands in for the
    // (tiny, broadcast) eval set; the rest is the train corpus
    "pipe_decontam" -> ((s, d) => {
      val all = docs(s, d)
      Decontam.ngramOverlap(
        all.filter(col("doc_id") % 37 =!= 0),
        all.filter(col("doc_id") % 37 === 0))
    }),
    // same computation, Bloom-prefiltered membership: broadcast is the
    // fixed-size bitset, exact confirm joins only the survivors — the
    // path for eval sets too large to broadcast as a hash set. Output is
    // row-identical to pipe_decontam (oracle reused verbatim).
    "pipe_decontam_bloom" -> ((s, d) => {
      val all = docs(s, d)
      Decontam.ngramOverlapBloom(
        all.filter(col("doc_id") % 37 =!= 0),
        all.filter(col("doc_id") % 37 === 0))
    }),
    // fuzzy (near-duplicate) decontamination: train docs within MinHash
    // Jaccard 0.5 of ANY eval doc are flagged even with zero exact n-gram
    // overlap — same train/eval split, cross-corpus LSH + exact verify
    "pipe_decontam_fuzzy" -> ((s, d) => {
      val all = docs(s, d)
      Decontam.fuzzyOverlap(
        all.filter(col("doc_id") % 37 =!= 0),
        all.filter(col("doc_id") % 37 === 0))
    }),
    // the whole flow: clean -> repetition gate -> decontaminate against
    // the eval stand-in -> pack survivors into 512-token bins. Train side
    // is the FULL corpus, so the eval docs themselves (self-overlap) are
    // removed by decontamination.
    "pipe_corpus_pipeline" -> ((s, d) => {
      val all = docs(s, d)
      CorpusClean.pipeline(all, all.filter(col("doc_id") % 37 === 0))
    }),
    // synthetic contact string appended so the redaction provably fires
    "pipe_text_redact" -> ((s, d) =>
      TextAnalysis.redact(
        docs(s, d).withColumn("aug",
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@mail.example or +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))),
        textCol = "aug")),
    // training-mix: 90% en, 20% zh, 40% everything else — deterministic
    // seeded hash buckets, reproducible across engines
    "pipe_corpus_mix" -> ((s, d) =>
      Sampling.stratified(docs(s, d), "lang",
        Map("en" -> 0.9, "zh" -> 0.2), defaultRate = 0.4)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))),
    // temperature-based alpha-sampling (XLM/mC4 posture): head languages
    // down-sampled toward p^alpha, smallest language kept whole
    "pipe_temperature_mix" -> ((s, d) =>
      Sampling.temperatureMix(docs(s, d), "lang", alpha = 0.5)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))),
    // balanced shard assignment: snake over the global weight-desc rank,
    // computed distributedly (range sort + zipWithIndex, no global window)
    "pipe_shard_assign" -> ((s, d) => Packing.shardAssign(docs(s, d), 8)),
    // the materialized layout: write shard=N/ partitions, read back, and
    // hash-check the per-shard composition of the files ON DISK
    "pipe_shard_write" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft_shards_")
      graft.TempDirs.register(out)
      Packing.writeShards(docs(s, d), out.toString, 8)
    }),
    // char-bigram LM score: the perplexity-quality-filter proxy
    "pipe_text_ppx" -> ((s, d) => TextAnalysis.charLmScore(docs(s, d))),
    // deterministic growth-stable train/val/test split
    "pipe_split" -> ((s, d) => Sampling.splitAssign(docs(s, d))),
    // weighted reservoir (A-ES): top-5 length-weighted docs per source
    "pipe_weighted_sample" -> ((s, d) => Sampling.weightedSample(docs(s, d))),
    // per-(lang, source) composition rollup
    "pipe_corpus_stats" -> ((s, d) => TextAnalysis.corpusStats(docs(s, d))),
    // BM25 ranked retrieval for a fixed query term set (top-10 docs)
    "pipe_text_bm25" -> ((s, d) => TextAnalysis.bm25TopDocs(docs(s, d))),
    // inverted-index segment build: df/cf + head postings block per term
    "pipe_text_invindex" -> ((s, d) => TextAnalysis.invertedIndex(docs(s, d))),
    // per-language adaptive quality gate: clear your own language's p25
    "pipe_quality_bylang" -> ((s, d) => TextAnalysis.qualityGateByLang(docs(s, d))),
    // per-source token budget: first 40% of each source's tokens in
    // seeded-hash order
    "pipe_token_budget" -> ((s, d) => Sampling.tokenBudgetMix(docs(s, d))),
    // epoch-based upsampling: source weight 1.0/1.5/2.0/2.5 by src number,
    // fractional epochs hash-selected
    "pipe_source_epochs" -> ((s, d) =>
      Sampling.epochUpsample(docs(s, d),
        (0 until 20).map(i => s"src$i" -> (1.0 + (i % 4) * 0.5)).toMap)),
    // SemDeDup: k-means partition -> within-cluster cosine pairs -> CC
    // groups -> keep the member FURTHEST from its centroid
    "pipe_dedup_semantic" -> ((s, d) =>
      Similarity.semanticDedup(emb(s, d), nCentroids = 16)),
    // directed shingle containment (|A∩B|/|A| >= 0.6): subset-dup
    // detection Jaccard misses when sizes differ
    "pipe_containment_pairs" -> ((s, d) => Dedup.containmentPairs(docs(s, d))),
    // the bounded-candidate LSH-Ensemble scale path for directed
    // containment: size strata x per-pairing MinHash banding, exact verify
    "pipe_containment_stratified" -> ((s, d) =>
      Dedup.containmentPairsStratified(docs(s, d))),
    // z-order (Morton) file-group assignment over (length, language)
    "pipe_layout_zorder" -> ((s, d) => Packing.zorderLayout(docs(s, d))),
    // pairwise cross-source vocabulary overlap from KMV sketches alone
    // (theta-sketch set algebra: union/jaccard/intersection estimates)
    "pipe_sketch_overlap" -> ((s, d) => Sketches.kmvOverlap(docs(s, d))),
    // asymmetric int8-SQ search: raw queries vs dequantized corpus
    "pipe_sim_sq8" -> ((s, d) => Quantization.sq8TopK(emb(s, d))),
    // recall@5 of the SQ8 path vs exact — the cheap-compression side of
    // the trade pipe_sim_recall_ivfadc measures for PQ
    "pipe_sim_recall_sq8" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.recallVs(e, Quantization.sq8TopK(e))
    }),
    // embedding-space outliers: cosine-to-own-centroid below the corpus
    // p05 flags junk/noise vectors before they poison training
    "pipe_emb_outliers" -> ((s, d) => Similarity.embeddingOutliers(emb(s, d))),
    // BPE merge-rule TRAINING over the corpus (8 rounds, vocab-sized
    // working set) — the learn side of the tokenizer
    "pipe_bpe_train" -> ((s, d) => BpeTrainer.trainMerges(docs(s, d))),
    // apply the learned merge table and count pieces per doc — the
    // encode side closing the loop. The merge table is memoized per
    // corpus dir (deterministic for immutable input): re-training inside
    // the gate made Bench time TRAINING (8 aggregation rounds, each with
    // a localCheckpoint write) instead of encode — 45.8 s mean vs 1.8 s
    // min in BENCH_r13. A real pipeline trains once and encodes many;
    // the gate now has the same shape.
    "pipe_bpe_encode" -> ((s, d) => {
      val rules = bpeRules.computeIfAbsent(d, dir =>
        BpeTrainer.trainMerges(docs(s, dir)).orderBy("rk").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq)
      BpeTrainer.encodeWithMerges(docs(s, d), rules)
    }))

  private val bpeRules =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  // shared oracle fragments
  private val Toks =
    "toks AS (SELECT doc_id, text, lang, string_split(lower(text), ' ') AS t FROM documents)"
  private val Shingles =
    Toks + ", sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), " +
      "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks WHERE len(t) >= 3)"
  private val Hex60 = (x: String) =>
    s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"
  private[queries] val Sig =
    Shingles + ", sig AS (SELECT doc_id, s, list_transform(range(0, 8), h -> " +
      s"list_min(list_transform(s, x -> ${Hex60("CAST(h AS VARCHAR) || ':' || x")}))) AS g FROM sh)"
  private val EmbNorm =
    "n AS (SELECT vec_id, embedding, sqrt(list_sum(list_transform(range(1, 65), " +
      "k -> embedding[k]::DOUBLE * embedding[k]::DOUBLE))) AS norm FROM embeddings)"
  private def dot(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), k -> $a.embedding[k]::DOUBLE * $b.embedding[k]::DOUBLE))"
  private def dotVC(v: String, c: String) =
    s"list_sum(list_transform(range(1, 65), k -> $v.embedding[k]::DOUBLE * $c.cvec[k]::DOUBLE))"
  private def dotQC(q: String, c: String) =
    s"list_sum(list_transform(range(1, 65), k -> $q.q_emb[k]::DOUBLE * $c.cvec[k]::DOUBLE))"

  /** the Lloyd-step TRAINING subset — mirrors the Spark side's
    * md5-ranked `trainCap` sample (Similarity.kmeansCentroids /
    * Quantization.pqCodebooks) so the oracle replays training verbatim
    * even when the table exceeds the cap. `trn` carries full n-rows (for
    * k-means), `ptrn` just the ids (for PQ subspace training). */
  private val KmTrain =
    "trn AS (SELECT * FROM n ORDER BY md5('7:' || vec_id) LIMIT 100000)"
  private val PqTrain =
    "ptrn AS (SELECT vec_id FROM embeddings ORDER BY md5('7:' || vec_id) LIMIT 100000)"

  /** MinHash-LSH banded candidates + exact-Jaccard scores — shared by
    * the pair gate, the clustering gate and both corpus compositions */
  private val MinhashScored =
    Sig + ", bands AS (SELECT doc_id, s, b.range AS band, " +
      "CAST(g[2*b.range + 1] AS VARCHAR) || ',' || CAST(g[2*b.range + 2] AS VARCHAR) AS bkey " +
      "FROM sig, range(4) b), " +
      "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS s_a, b.s AS s_b " +
      "FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id), " +
      "scored AS (SELECT doc_a, doc_b, " +
      "len(list_intersect(s_a, s_b))::DOUBLE / len(list_distinct(list_concat(s_a, s_b))) AS jac FROM cand)"

  /** connected components over scored pairs >= 0.5 via recursive
    * min-reachability closure (callers must open WITH RECURSIVE):
    * comp(id, root) = every paired doc with its component's minimum id —
    * the unique fixpoint the Spark-side star contraction also reaches */
  private val CcCtes =
    "ccp AS (SELECT doc_a, doc_b FROM scored WHERE jac >= 0.5), " +
      "cce AS (SELECT doc_a AS src, doc_b AS dst FROM ccp UNION SELECT doc_b, doc_a FROM ccp), " +
      "ccn AS (SELECT DISTINCT src AS id FROM cce), " +
      "reach(id, r) AS (SELECT id, id FROM ccn UNION " +
      "SELECT rc.id, cce.dst FROM reach rc JOIN cce ON cce.src = rc.r), " +
      "comp AS (SELECT id, min(r) AS root FROM reach GROUP BY id)"

  /** banded SRP-LSH CTE chain: band keys generated from the SAME seeded
    * plane constants as `Similarity.lshCosinePairs` (see lshBandKeySql),
    * candidate pairs unioned across bands (UNION dedups), exact cosine
    * on the distinct pairs (`p`). Shared by the pair oracles and the
    * embedding-cluster oracle. */
  private def lshCtes: String = {
    val keys = Similarity.lshBandKeySql()
    val keyCols = keys.zipWithIndex
      .map { case (k, t) => s"($k) AS k$t" }.mkString(", ")
    val bandJoins = keys.indices.map { t =>
      s"SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM bk a JOIN bk b" +
        s" ON a.k$t = b.k$t AND a.vec_id < b.vec_id"
    }.mkString(" UNION ")
    s"$EmbNorm, bk AS (SELECT vec_id, embedding, norm, $keyCols FROM n), " +
      s"cand AS ($bandJoins), " +
      s"p AS (SELECT id_a, id_b, ${dot("a", "b")} / (a.norm * b.norm) AS sim " +
      "FROM cand JOIN bk a ON cand.id_a = a.vec_id JOIN bk b ON cand.id_b = b.vec_id)"
  }

  private def lshOracle(threshold: Double): String =
    s"WITH $lshCtes " +
      s"SELECT id_a, id_b, round(sim, 4) AS sim FROM p WHERE round(sim, 6) >= $threshold"

  /** one PQ subspace in DuckDB: slice, one L2 Lloyd step from the shared
    * md5 init sample (ordered member folds, ties to lowest cid, empty
    * buckets keep position), then encode each vector against the refined
    * codebook — the distance is the direct ordered (x−c)² fold, the same
    * float path as the Spark side */
  private def pqSubspaceSql(s: Int, sd: Int): String = {
    val lo = s * sd + 1; val hi = (s + 1) * sd
    def dsq(v: String, c: String) =
      s"list_sum(list_transform(range(1, ${sd + 1}), i -> ($v.sub[i] - $c.cvec[i]) * ($v.sub[i] - $c.cvec[i])))"
    s"sub$s AS (SELECT vec_id, list_transform(embedding[$lo:$hi], x -> x::DOUBLE) AS sub FROM embeddings), " +
      s"c0_$s AS (SELECT p.vec_id AS cid, v.sub AS cvec FROM samp p JOIN sub$s v ON v.vec_id = p.vec_id), " +
      s"a0_$s AS (SELECT vec_id, cid FROM (SELECT v.vec_id, c.cid, row_number() OVER (" +
      s"PARTITION BY v.vec_id ORDER BY round(${dsq("v", "c")}, 6), c.cid) AS rn FROM sub$s v, c0_$s c" +
      s" WHERE v.vec_id IN (SELECT vec_id FROM ptrn)) WHERE rn = 1), " +
      s"m_$s AS (SELECT a.cid, count(*) AS cnt, list(v.sub ORDER BY v.vec_id) AS vs" +
      s" FROM a0_$s a JOIN sub$s v USING (vec_id) GROUP BY a.cid), " +
      s"mv_$s AS (SELECT cid, list_transform(range(1, ${sd + 1}), d -> " +
      s"list_sum(list_transform(vs, x -> x[d])) / cnt) AS mvec FROM m_$s), " +
      s"c1_$s AS (SELECT cid, cvec, row_number() OVER (ORDER BY cid) - 1 AS idx FROM (" +
      s"SELECT c.cid, coalesce(m.mvec, c.cvec) AS cvec FROM c0_$s c LEFT JOIN mv_$s m USING (cid))), " +
      s"e_$s AS (SELECT vec_id, idx, d FROM (SELECT v.vec_id, c.idx, ${dsq("v", "c")} AS d, " +
      s"row_number() OVER (PARTITION BY v.vec_id ORDER BY round(${dsq("v", "c")}, 6), c.cid) AS rn" +
      s" FROM sub$s v, c1_$s c) WHERE rn = 1)"
  }

  /** one Lloyd step in DuckDB: assign every vector to its max-cosine
    * centroid (6-dec rounding, tie to lowest cid — the same rule as the
    * probe), then means with the member fold ORDERED BY vec_id so the
    * non-commutative float sum replays Spark's sorted aggregate exactly;
    * empty buckets keep their previous position */
  private def kmeansIterSql(i: Int): String = {
    val next = s"cent${i + 1}"
    s"ass$i AS (SELECT vec_id, bucket FROM (" +
      s"SELECT v.vec_id, c.cid AS bucket, row_number() OVER (PARTITION BY v.vec_id" +
      s" ORDER BY round(${dotVC("v", "c")} / (v.norm * c.cnorm), 6) DESC, c.cid) AS rn" +
      s" FROM trn v, cent$i c) WHERE rn = 1), " +
      s"m$i AS (SELECT bucket AS cid, count(*) AS cnt, list(v.embedding ORDER BY v.vec_id) AS vs" +
      s" FROM ass$i a JOIN n v ON v.vec_id = a.vec_id GROUP BY bucket), " +
      s"mv$i AS (SELECT cid, list_transform(range(1, 65), d -> " +
      s"list_sum(list_transform(vs, x -> x[d]::DOUBLE)) / cnt) AS mvec FROM m$i), " +
      s"$next AS (SELECT cid, cvec, sqrt(list_sum(list_transform(range(1, 65), d -> cvec[d] * cvec[d]))) AS cnorm" +
      s" FROM (SELECT c.cid, coalesce(m.mvec, c.cvec) AS cvec FROM cent$i c LEFT JOIN mv$i m ON m.cid = c.cid))"
  }

  /** decontamination oracle — ONE string shared by the hash-set gate, the
    * Bloom gate and (via StreamingQueries) the streaming gate: all three
    * implementations must produce identical rows */
  private[queries] val DecontamOracleSql: String =
    "WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents), " +
      "ng AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 3), " +
      "i -> array_to_string(t[i:i+4], ' '))) AS g FROM toks WHERE len(t) >= 5), " +
      "ev AS (SELECT coalesce(list(DISTINCT ng), []) AS evl FROM " +
      "(SELECT unnest(g) AS ng FROM ng WHERE doc_id % 37 = 0)), " +
      "tr AS (SELECT n.doc_id, n.g, len(list_intersect(n.g, ev.evl)) AS hits " +
      "FROM ng n CROSS JOIN ev WHERE n.doc_id % 37 != 0) " +
      "SELECT doc_id, len(g)::BIGINT AS n_ngrams, hits::BIGINT AS hits, " +
      "round(hits::DOUBLE / len(g), 4) AS contam_frac, hits > 0 AS contaminated FROM tr"

  /** the KMV sketch oracle: CTE chain + final projection, with or without
    * the exact countDistinct column (the streaming gate must omit it —
    * holding the distinct set is exactly what the sketch avoids) */
  private[queries] def kmvOracleSql(withExact: Boolean): String = {
    val exactCol = if (withExact) "n_distinct, " else ""
    val exactAgg = if (withExact) "count(*)::BIGINT AS n_distinct, " else ""
    "WITH tw AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents), " +
      s"h AS (SELECT DISTINCT source, ${Hex60("w")} AS h FROM tw), " +
      "r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h), " +
      s"s AS (SELECT source, $exactAgg" +
      "count(*) FILTER (rn <= 16)::BIGINT AS k_used, " +
      "max(CASE WHEN rn <= 16 THEN h END) AS hk FROM r GROUP BY source) " +
      s"SELECT source, ${exactCol}k_used, " +
      "round(CASE WHEN k_used < 16 THEN k_used::DOUBLE " +
      "ELSE (15.0 * 1152921504606846976.0) / hk END, 4) AS kmv_est FROM s"
  }

  /** the count-min oracle: d=4 × w=1024 grid + min-of-cells estimates for
    * the true top-20 terms, with or without the exact column (the
    * streaming gate omits it — the stream holds only the grid) */
  private[queries] def cmOracleSql(withExact: Boolean): String = {
    val exactCol = if (withExact) "top.true_cnt, " else ""
    "WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
      "g AS (SELECT j.range AS j, " +
      s"${Hex60("CAST(j.range AS VARCHAR) || ':' || term")} % 1024 AS cell, " +
      "count(*) AS cnt FROM t, range(4) j GROUP BY 1, 2), " +
      "c AS (SELECT term, count(*)::BIGINT AS true_cnt FROM t GROUP BY term), " +
      "top AS (SELECT term, true_cnt, row_number() OVER (ORDER BY true_cnt DESC, term) AS rk " +
      "FROM c ORDER BY true_cnt DESC, term LIMIT 20), " +
      "p AS (SELECT tt.term, j.range AS j, " +
      s"${Hex60("CAST(j.range AS VARCHAR) || ':' || tt.term")} % 1024 AS cell " +
      "FROM top tt, range(4) j), " +
      "e AS (SELECT p.term, min(g.cnt)::BIGINT AS cm_est FROM p JOIN g ON g.j = p.j AND g.cell = p.cell GROUP BY p.term) " +
      s"SELECT top.term, ${exactCol}e.cm_est, top.rk FROM top JOIN e ON e.term = top.term"
  }

  /** the full kmeans-IVF probe chain (train → assign → probe → rank into
    * `r`), shared by the ivf_kmeans gate and the recall gate */
  private[queries] def kmIvfChain: String =
    s"$EmbNorm, $KmTrain, cent0 AS (SELECT vec_id AS cid, " +
      "list_transform(embedding, x -> x::DOUBLE) AS cvec, norm AS cnorm" +
      " FROM n ORDER BY md5('7:' || vec_id) LIMIT 16), " +
      kmeansIterSql(0) + ", " + kmeansIterSql(1) + ", " +
      "asg AS (SELECT vec_id, bucket FROM (" +
      "SELECT v.vec_id, c.cid AS bucket, row_number() OVER (PARTITION BY v.vec_id" +
      s" ORDER BY round(${dotVC("v", "c")} / (v.norm * c.cnorm), 6) DESC, c.cid) AS rn" +
      " FROM n v, cent2 c) WHERE rn = 1), " +
      "q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm FROM n WHERE vec_id < 10), " +
      "probes AS (SELECT query_id, bucket FROM (" +
      "SELECT q.query_id, c.cid AS bucket, row_number() OVER (PARTITION BY q.query_id" +
      s" ORDER BY round(${dotQC("q", "c")} / (c.cnorm * q.q_norm), 6) DESC, c.cid) AS prk" +
      " FROM q, cent2 c) WHERE prk <= 4), " +
      "cand AS (SELECT q.query_id, v.vec_id, " +
      "list_sum(list_transform(range(1, 65), k -> q.q_emb[k]::DOUBLE * v.embedding[k]::DOUBLE))" +
      " / (v.norm * q.q_norm) AS sim" +
      " FROM probes p JOIN q ON p.query_id = q.query_id" +
      " JOIN asg a ON a.bucket = p.bucket JOIN n v ON v.vec_id = a.vec_id" +
      " WHERE v.vec_id != q.query_id), " +
      "r AS (SELECT query_id, vec_id AS neighbor_id, sim, row_number() OVER (" +
      "PARTITION BY query_id ORDER BY round(sim, 6) DESC, vec_id) AS rk FROM cand)"

  /** the full IVFADC chain (kmeans-IVF probe selection + PQ corpus encode
    * + ADC ranking into `r`), shared by the ivfadc gate and its recall
    * gate */
  private def ivfAdcChain: String =
    s"$EmbNorm, $KmTrain, cent0 AS (SELECT vec_id AS cid, " +
      "list_transform(embedding, x -> x::DOUBLE) AS cvec, norm AS cnorm" +
      " FROM n ORDER BY md5('7:' || vec_id) LIMIT 16), " +
      kmeansIterSql(0) + ", " + kmeansIterSql(1) + ", " +
      "asg AS (SELECT vec_id, bucket FROM (" +
      "SELECT v.vec_id, c.cid AS bucket, row_number() OVER (PARTITION BY v.vec_id" +
      s" ORDER BY round(${dotVC("v", "c")} / (v.norm * c.cnorm), 6) DESC, c.cid) AS rn" +
      " FROM n v, cent2 c) WHERE rn = 1), " +
      "q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm FROM n WHERE vec_id < 10), " +
      "probes AS (SELECT query_id, bucket FROM (" +
      "SELECT q.query_id, c.cid AS bucket, row_number() OVER (PARTITION BY q.query_id" +
      s" ORDER BY round(${dotQC("q", "c")} / (c.cnorm * q.q_norm), 6) DESC, c.cid) AS prk" +
      " FROM q, cent2 c) WHERE prk <= 4), " +
      "samp AS (SELECT vec_id FROM embeddings ORDER BY md5('7:' || vec_id) LIMIT 8), " +
      PqTrain + ", " +
      (0 until 4).map(pqSubspaceSql(_, 16)).mkString(", ") + ", " +
      "cnd AS (SELECT p.query_id, a.vec_id FROM probes p JOIN asg a ON a.bucket = p.bucket" +
      " WHERE a.vec_id != p.query_id), " +
      (0 until 4).map { s =>
        s"adq_$s AS (SELECT cd.query_id, cd.vec_id, " +
          s"list_sum(list_transform(range(1, 17), i -> (qs.sub[i] - c.cvec[i]) * (qs.sub[i] - c.cvec[i]))) AS d" +
          s" FROM cnd cd JOIN sub$s qs ON qs.vec_id = cd.query_id" +
          s" JOIN e_$s e ON e.vec_id = cd.vec_id JOIN c1_$s c ON c.idx = e.idx)"
      }.mkString(", ") + ", " +
      "adc AS (SELECT a0.query_id, a0.vec_id, a0.d + a1.d + a2.d + a3.d AS ad " +
      "FROM adq_0 a0 JOIN adq_1 a1 ON a1.query_id = a0.query_id AND a1.vec_id = a0.vec_id " +
      "JOIN adq_2 a2 ON a2.query_id = a0.query_id AND a2.vec_id = a0.vec_id " +
      "JOIN adq_3 a3 ON a3.query_id = a0.query_id AND a3.vec_id = a0.vec_id), " +
      "r AS (SELECT query_id, vec_id AS neighbor_id, ad, row_number() OVER (" +
      "PARTITION BY query_id ORDER BY round(ad, 6) ASC, vec_id) AS rk FROM adc)"

  /** recall@5 rollup vs exact brute force, appended after any chain that
    * defines `n` (EmbNorm) and `r` (per-query results ranked in `rk`);
    * queries missing entirely from `r` still count 0 via the left join */
  /** the BPE training chain: distinct-word counts, guard-encoded symbol
    * strings, then `merges` rounds of (pair-count → argmax → replace) as
    * chained CTEs — the literal replay of [[graft.pipeline.BpeTrainer]] */
  private def bpeChainSql(merges: Int): String = {
    val sb = new StringBuilder
    sb ++= "wd AS (SELECT w, count(*)::BIGINT AS cnt FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents) GROUP BY w), "
    sb ++= "w0 AS (SELECT w, array_to_string(list_transform(range(1, length(w) + 1), i -> chr(1) || substr(w, i, 1) || chr(2)), '') AS sym, cnt FROM wd)"
    for (k <- 1 to merges) {
      sb ++= s", p$k AS (SELECT pr.l AS l, pr.r AS r, sum(cnt)::BIGINT AS pc FROM ("
      sb ++= "SELECT cnt, unnest(list_transform(range(1, len(s)), i -> {'l': s[i], 'r': s[i+1]})) AS pr FROM ("
      sb ++= s"SELECT cnt, string_split(substring(sym, 2, length(sym) - 2), chr(2) || chr(1)) AS s FROM w${k - 1})) GROUP BY 1, 2)"
      sb ++= s", t$k AS (SELECT l, r, pc FROM p$k ORDER BY pc DESC, l, r LIMIT 1)"
      // LEFT JOIN, not CROSS JOIN: if the corpus exhausts mergeable pairs
      // before round k, t_k is empty and a cross join would wipe the word
      // state for all later rounds; degrade w_k to w_{k-1} instead
      // (mirrors the trainer, which simply records no rule that round).
      sb ++= s", w$k AS (SELECT w, CASE WHEN l IS NULL THEN sym ELSE " +
        s"replace(sym, chr(1) || l || chr(2) || chr(1) || r || chr(2), chr(1) || l || r || chr(2)) END AS sym, cnt " +
        s"FROM w${k - 1} LEFT JOIN t$k ON TRUE)"
    }
    sb.toString
  }

  /** the kmeans assignment chain WITH the raw cosine to the winning
    * centroid (`asgs(vec_id, bucket, rsim)`) — shared by the SemDeDup
    * and embedding-outlier oracles */
  private def kmAsgsChain: String =
    s"$EmbNorm, $KmTrain, cent0 AS (SELECT vec_id AS cid, " +
      "list_transform(embedding, x -> x::DOUBLE) AS cvec, norm AS cnorm" +
      " FROM n ORDER BY md5('7:' || vec_id) LIMIT 16), " +
      kmeansIterSql(0) + ", " + kmeansIterSql(1) + ", " +
      "asgs AS (SELECT vec_id, bucket, rsim FROM (" +
      s"SELECT v.vec_id, c.cid AS bucket, ${dotVC("v", "c")} / (v.norm * c.cnorm) AS rsim, " +
      "row_number() OVER (PARTITION BY v.vec_id" +
      s" ORDER BY round(${dotVC("v", "c")} / (v.norm * c.cnorm), 6) DESC, c.cid) AS rn" +
      " FROM n v, cent2 c) WHERE rn = 1)"

  /** int8-SQ dequantized search chain (quantize → dequantize → rank into
    * `r`), shared by the sq8 top-k gate and its recall gate */
  private def sq8Chain: String =
    s"$EmbNorm, ee AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings), " +
      "sc8 AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS scale FROM ee), " +
      "dqc AS (SELECT vec_id, CASE WHEN scale = 0 THEN list_transform(e, x -> 0.0) " +
      "ELSE list_transform(e, x -> (floor((x * 127.0) / scale + 0.5) * scale) / 127.0) END AS d FROM sc8), " +
      "dqn AS (SELECT vec_id, d, sqrt(list_sum(list_transform(d, x -> x * x))) AS dnorm FROM dqc), " +
      "qn8 AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS qnorm FROM ee WHERE vec_id < 10), " +
      "j8 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
      "list_sum(list_transform(range(1, 65), k -> q.e[k] * c.d[k])) / (c.dnorm * q.qnorm) AS sim " +
      "FROM qn8 q JOIN dqn c ON c.vec_id != q.vec_id), " +
      "r AS (SELECT query_id, neighbor_id, sim, row_number() OVER (" +
      "PARTITION BY query_id ORDER BY round(sim, 6) DESC, neighbor_id) AS rk FROM j8)"

  private def recallTailSql: String =
    "aprx AS (SELECT query_id, neighbor_id FROM r WHERE rk <= 5), " +
      s"bj AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${dot("q", "c")} / (q.norm * c.norm) AS sim " +
      "FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id != q.vec_id), " +
      "br AS (SELECT query_id, neighbor_id, row_number() OVER (" +
      "PARTITION BY query_id ORDER BY round(sim, 6) DESC, neighbor_id) AS rk FROM bj), " +
      "ext AS (SELECT query_id, neighbor_id FROM br WHERE rk <= 5), " +
      "h AS (SELECT e.query_id, count(a.neighbor_id) AS hits FROM ext e " +
      "LEFT JOIN aprx a ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id " +
      "GROUP BY e.query_id) " +
      "SELECT query_id, hits, round(hits / 5.0, 4) AS recall FROM h"

  // `__same_as__<name>` entries alias another gate's oracle verbatim —
  // used by operator twins whose CONTRACT is byte-identical output.
  // (lazy: oracles0 is declared below, a plain val would read null)
  lazy val oracles: Map[String, String] = oracles0.map { case (k, v) =>
    k -> (if (v.startsWith("__same_as__")) oracles0(v.stripPrefix("__same_as__")) else v)
  }

  private val oracles0: Map[String, String] = Map(
    "pipe_emb_pq" ->
      ("WITH samp AS (SELECT vec_id FROM embeddings ORDER BY md5('7:' || vec_id) LIMIT 8), " +
        PqTrain + ", " +
        (0 until 4).map(pqSubspaceSql(_, 16)).mkString(", ") + " " +
        "SELECT v.vec_id, CAST(e_0.idx AS VARCHAR) || ',' || CAST(e_1.idx AS VARCHAR) || ',' || " +
        "CAST(e_2.idx AS VARCHAR) || ',' || CAST(e_3.idx AS VARCHAR) AS code, " +
        "round(sqrt((e_0.d + e_1.d + e_2.d + e_3.d) / 64), 6) AS recon_rmse " +
        "FROM embeddings v JOIN e_0 ON e_0.vec_id = v.vec_id JOIN e_1 ON e_1.vec_id = v.vec_id " +
        "JOIN e_2 ON e_2.vec_id = v.vec_id JOIN e_3 ON e_3.vec_id = v.vec_id"),

    // ADC: queries exact, corpus as PQ codes; approximate distance = sum
    // of per-subspace query-to-coded-centroid distances
    "pipe_sim_adc" ->
      ("WITH samp AS (SELECT vec_id FROM embeddings ORDER BY md5('7:' || vec_id) LIMIT 8), " +
        PqTrain + ", " +
        (0 until 4).map(pqSubspaceSql(_, 16)).mkString(", ") + ", " +
        (0 until 4).map { s =>
          s"ad_$s AS (SELECT q.vec_id AS query_id, e.vec_id, " +
            s"list_sum(list_transform(range(1, 17), i -> (q.sub[i] - c.cvec[i]) * (q.sub[i] - c.cvec[i]))) AS d" +
            s" FROM sub$s q CROSS JOIN e_$s e JOIN c1_$s c ON c.idx = e.idx WHERE q.vec_id < 10)"
        }.mkString(", ") + ", " +
        "adc AS (SELECT a0.query_id, a0.vec_id, a0.d + a1.d + a2.d + a3.d AS ad " +
        "FROM ad_0 a0 JOIN ad_1 a1 ON a1.query_id = a0.query_id AND a1.vec_id = a0.vec_id " +
        "JOIN ad_2 a2 ON a2.query_id = a0.query_id AND a2.vec_id = a0.vec_id " +
        "JOIN ad_3 a3 ON a3.query_id = a0.query_id AND a3.vec_id = a0.vec_id " +
        "WHERE a0.vec_id != a0.query_id), " +
        "r AS (SELECT query_id, vec_id AS neighbor_id, ad, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY round(ad, 6) ASC, vec_id) AS rk FROM adc) " +
        "SELECT query_id, neighbor_id, round(ad, 4) AS adist, rk FROM r WHERE rk <= 5"),

    // IVFADC: the kmeans-IVF CTE chain picks each query's nProbe buckets,
    // the PQ CTE chain encodes the corpus, and the ADC distance is summed
    // per (query, candidate) only for candidates in probed buckets
    "pipe_sim_ivfadc" ->
      (s"WITH $ivfAdcChain " +
        "SELECT query_id, neighbor_id, round(ad, 4) AS adist, rk FROM r WHERE rk <= 5"),

    // recall@5 of the full IVFADC chain vs exact brute force — probe loss
    // and quantization distortion measured together
    "pipe_sim_recall_ivfadc" ->
      (s"WITH $ivfAdcChain, $recallTailSql"),

    // the ADC shortlist (rk <= 20 of the same chain) re-scored with the
    // exact cosine and re-ranked to the final top-5
    "pipe_sim_rerank" ->
      (s"WITH $ivfAdcChain, " +
        "sl AS (SELECT query_id, neighbor_id FROM r WHERE rk <= 20), " +
        s"x AS (SELECT s.query_id, s.neighbor_id, ${dot("q", "c")} / (q.norm * c.norm) AS sim " +
        "FROM sl s JOIN n q ON q.vec_id = s.query_id JOIN n c ON c.vec_id = s.neighbor_id), " +
        "rr AS (SELECT query_id, neighbor_id, sim, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY round(sim, 6) DESC, neighbor_id) AS rk FROM x) " +
        "SELECT query_id, neighbor_id, round(sim, 4) AS sim, rk FROM rr WHERE rk <= 5"),

    // connected components over the >= 0.5 MinHash pair set: recursive
    // min-reachability closure — the same unique fixpoint as the Spark
    // side's large-star/small-star contraction
    "pipe_dedup_clusters" ->
      (s"WITH RECURSIVE $MinhashScored, $CcCtes " +
        "SELECT id AS doc_id, root AS cluster_id FROM comp"),

    // clusters + the quality replay + a per-cluster argmax window
    "pipe_dedup_keep_best" ->
      (s"WITH RECURSIVE $MinhashScored, $CcCtes, " +
        "m AS (SELECT doc_id, len(t)::BIGINT AS n_tokens, " +
        "round((len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE / greatest(len(text), 1), 4) AS punct_ratio " +
        "FROM toks), " +
        "q AS (SELECT doc_id, round(least(1.0, n_tokens::DOUBLE / 50) * (1.0 - punct_ratio), 4) AS quality_score FROM m), " +
        "r AS (SELECT c.id AS doc_id, c.root AS cluster_id, q.quality_score, " +
        "row_number() OVER (PARTITION BY c.root ORDER BY q.quality_score DESC, c.id) AS rk " +
        "FROM comp c JOIN q ON q.doc_id = c.id) " +
        "SELECT doc_id, cluster_id, quality_score, rk = 1 AS keep FROM r"),

    // the same closure over the >= 0.45 SRP-LSH cosine pair set
    "pipe_dedup_emb_clusters" ->
      (s"WITH RECURSIVE $lshCtes, " +
        "lp AS (SELECT id_a, id_b FROM p WHERE round(sim, 6) >= 0.45), " +
        "le AS (SELECT id_a AS src, id_b AS dst FROM lp UNION SELECT id_b, id_a FROM lp), " +
        "ln AS (SELECT DISTINCT src AS id FROM le), " +
        "lreach(id, r) AS (SELECT id, id FROM ln UNION " +
        "SELECT rc.id, le.dst FROM lreach rc JOIN le ON le.src = rc.r) " +
        "SELECT id AS vec_id, min(r) AS cluster_id FROM lreach GROUP BY id"),

    "pipe_sim_ivf_kmeans" ->
      (s"WITH $kmIvfChain " +
        "SELECT query_id, neighbor_id, round(sim, 4) AS sim, rk FROM r WHERE rk <= 5"),

    // recall@5 of the kmeans-IVF index vs exact brute force: replay both
    // chains, count per query how many true neighbors the probed search
    // returned (missing queries count 0 via the left join)
    "pipe_sim_recall" -> (s"WITH $kmIvfChain, $recallTailSql"),

    "pipe_dedup_exact" ->
      """SELECT doc_id, fp, (row_number() OVER (PARTITION BY fp ORDER BY doc_id)) > 1 AS is_dup
        |FROM (SELECT doc_id, md5(text) AS fp FROM documents)""".stripMargin,

    // substring-level dedup signals: every 8-token window fingerprinted,
    // a window is duplicated iff its fingerprint occurs >= 2 times corpus-
    // wide (including within-doc repeats)
    "pipe_dedup_substring" ->
      (s"WITH $Toks, " +
        "base AS (SELECT doc_id, t, greatest(len(t) - 7, 0)::BIGINT AS n_windows FROM toks), " +
        "w AS (SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS fp " +
        "FROM (SELECT doc_id, t, unnest(range(1, n_windows + 1)) AS i FROM base WHERE n_windows > 0)), " +
        "occ AS (SELECT fp FROM w GROUP BY fp HAVING count(*) >= 2), " +
        "d AS (SELECT doc_id, count(*)::BIGINT AS dup_windows FROM w " +
        "WHERE fp IN (SELECT fp FROM occ) GROUP BY doc_id) " +
        "SELECT b.doc_id, b.n_windows, coalesce(d.dup_windows, 0)::BIGINT AS dup_windows, " +
        "round(coalesce(d.dup_windows, 0)::DOUBLE / b.n_windows, 4) AS dup_frac " +
        "FROM base b LEFT JOIN d USING (doc_id) WHERE b.n_windows > 0"),

    // global segment dedup replay: same planting, same 10-token
    // segmentation, first occurrence by (doc_id, seg_idx), rebuild by
    // ordered string_agg of the survivors
    "pipe_dedup_segments" ->
      ("WITH p AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN " +
        "'shared header banner intro card segment alpha beta gamma delta ' || lower(text) " +
        "ELSE lower(text) END AS text FROM documents), " +
        "t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM p), " +
        "sg AS (SELECT doc_id, tk, unnest(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) AS seg_idx FROM t), " +
        "ss AS (SELECT doc_id, seg_idx, " +
        "array_to_string(tk[seg_idx * 10 + 1 : least((seg_idx + 1) * 10, len(tk))], ' ') AS seg FROM sg), " +
        "mk AS (SELECT doc_id, seg_idx, seg, " +
        "row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn FROM ss) " +
        "SELECT doc_id, count(*)::BIGINT AS n_segments, " +
        "sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END)::BIGINT AS n_dropped, " +
        "coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx), '') AS clean_text " +
        "FROM mk GROUP BY doc_id"),

    // boilerplate strip replay: distinct-doc frequency per segment,
    // df >= 50 removed everywhere, ordered rebuild
    "pipe_strip_boilerplate" ->
      ("WITH p AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN " +
        "'shared header banner intro card segment alpha beta gamma delta ' || lower(text) " +
        "ELSE lower(text) END AS text FROM documents), " +
        "t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM p), " +
        "sg AS (SELECT doc_id, tk, unnest(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) AS seg_idx FROM t), " +
        "ss AS (SELECT doc_id, seg_idx, " +
        "array_to_string(tk[seg_idx * 10 + 1 : least((seg_idx + 1) * 10, len(tk))], ' ') AS seg FROM sg), " +
        "bf AS (SELECT seg FROM (SELECT seg, count(DISTINCT doc_id) AS df FROM ss GROUP BY seg) WHERE df >= 50) " +
        "SELECT doc_id, count(*)::BIGINT AS n_segments, " +
        "sum(CASE WHEN seg IN (SELECT seg FROM bf) THEN 1 ELSE 0 END)::BIGINT AS n_boiler, " +
        "coalesce(string_agg(CASE WHEN seg NOT IN (SELECT seg FROM bf) THEN seg END, ' ' ORDER BY seg_idx), '') AS clean_text " +
        "FROM ss GROUP BY doc_id"),

    // fingerprint-keyed twins: identical output by contract, so the
    // text-keyed oracles apply verbatim (self-references resolve below)
    "pipe_dedup_segments_fp" -> "__same_as__pipe_dedup_segments",
    "pipe_strip_boilerplate_fp" -> "__same_as__pipe_strip_boilerplate",

    // KMV distinct sketch: the k minima are order-independent so DuckDB
    // replays the estimator bit-for-bit ((k-1)·2^60 / kth-smallest-hash,
    // one IEEE division); fewer than k distinct values => exact count
    "pipe_sketch_kmv" -> kmvOracleSql(withExact = true),

    // the d=4 × w=1024 counter grid and the min-of-cells estimates,
    // replayed from the same md5 hash stream
    "pipe_sketch_cm" -> cmOracleSql(withExact = true),

    // tf-idf: idf = round(ln N - ln df, 6), both logs over integer
    // arguments (bit-identical across engines; rounding absorbs last-ulp
    // stragglers), score = round(tf * idf, 6), ties rank by term
    "pipe_text_tfidf" ->
      (s"WITH $Toks, " +
        "tw AS (SELECT doc_id, len(t)::BIGINT AS dl, unnest(t) AS term FROM toks), " +
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tc, max(dl) AS dl FROM tw GROUP BY 1, 2), " +
        "dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1), " +
        "nn AS (SELECT count(*)::DOUBLE AS n FROM documents), " +
        "sc AS (SELECT doc_id, term, " +
        "(tc::DOUBLE / dl) * round(ln(n) - ln(df::DOUBLE), 6) AS raw " +
        "FROM tf JOIN dfq USING (term) CROSS JOIN nn), " +
        "r AS (SELECT doc_id, term, raw, row_number() OVER (" +
        "PARTITION BY doc_id ORDER BY round(raw, 6) DESC, term) AS rk FROM sc) " +
        "SELECT doc_id, term, round(raw, 4) AS tfidf, rk FROM r WHERE rk <= 3"),

    // strided chunking: windows of 64 tokens every 48, trailing chunk
    // short; fingerprint = md5 of the space-joined chunk
    "pipe_chunk" ->
      (s"WITH $Toks, " +
        "c AS (SELECT doc_id, t, len(t)::BIGINT AS n FROM toks WHERE len(t) > 0), " +
        "e AS (SELECT doc_id, t, n, unnest(range(0, CAST(ceil(n / 48.0) AS BIGINT))) AS i FROM c) " +
        "SELECT doc_id, i AS chunk_idx, least(64, n - i * 48) AS chunk_len, " +
        "md5(array_to_string(t[i*48+1 : least(i*48+64, n)], ' ')) AS chunk_fp FROM e"),

    // corpus-wide top-20 trigrams (boilerplate detector); ties cut by gram
    "pipe_text_topngrams" ->
      (s"WITH $Toks, " +
        "g AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 1), " +
        "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram FROM toks WHERE len(t) >= 3), " +
        "c AS (SELECT gram, count(*) AS occ, count(DISTINCT doc_id) AS n_docs FROM g GROUP BY gram), " +
        "r AS (SELECT gram, occ, n_docs, row_number() OVER (ORDER BY occ DESC, gram) AS rk FROM c) " +
        "SELECT gram, occ, n_docs, rk FROM r WHERE rk <= 20"),

    "pipe_minhash_sig" ->
      s"WITH $Sig SELECT doc_id, array_to_string(g, ',') AS sig FROM sig",

    "pipe_minhash_pairs" ->
      (s"WITH $MinhashScored " +
        "SELECT doc_a, doc_b, round(jac, 4) AS jac FROM scored WHERE jac >= 0.5"),

    // incremental dedup replayed on the even/odd split: same (8,4)
    // banding as pipe_minhash_pairs, batch side (odd) probes corpus
    // (even) in any order plus EARLIER odd docs, exact-Jaccard verify
    "pipe_dedup_incremental" ->
      (s"WITH $Sig, bands AS (SELECT doc_id, s, b.range AS band, " +
        "CAST(g[2*b.range + 1] AS VARCHAR) || ',' || CAST(g[2*b.range + 2] AS VARCHAR) AS bkey " +
        "FROM sig, range(4) b), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS s_a, b.s AS s_b " +
        "FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey " +
        "WHERE a.doc_id % 2 = 1 AND (b.doc_id % 2 = 0 OR b.doc_id < a.doc_id)), " +
        "scored AS (SELECT doc_a, doc_b, " +
        "len(list_intersect(s_a, s_b))::DOUBLE / len(list_distinct(list_concat(s_a, s_b))) AS jac FROM cand) " +
        "SELECT doc_a, doc_b, round(jac, 4) AS jac, " +
        "CASE WHEN doc_b % 2 = 0 THEN 'corpus' ELSE 'batch' END AS src " +
        "FROM scored WHERE jac >= 0.5"),

    "pipe_dedup_incr_admit" ->
      (s"WITH $Sig, bands AS (SELECT doc_id, s, b.range AS band, " +
        "CAST(g[2*b.range + 1] AS VARCHAR) || ',' || CAST(g[2*b.range + 2] AS VARCHAR) AS bkey " +
        "FROM sig, range(4) b), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS s_a, b.s AS s_b " +
        "FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey " +
        "WHERE a.doc_id % 2 = 1 AND (b.doc_id % 2 = 0 OR b.doc_id < a.doc_id)), " +
        "dup AS (SELECT DISTINCT doc_a FROM cand WHERE " +
        "len(list_intersect(s_a, s_b))::DOUBLE / len(list_distinct(list_concat(s_a, s_b))) >= 0.5) " +
        "SELECT doc_id FROM documents WHERE doc_id % 2 = 1 " +
        "AND doc_id NOT IN (SELECT doc_a FROM dup)"),

    "pipe_jaccard_pairs" ->
      (s"WITH $Shingles, scored AS (" +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) AS jac " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id) " +
        "SELECT doc_a, doc_b, round(jac, 4) AS jac FROM scored WHERE jac >= 0.5"),

    "pipe_simhash" ->
      (s"WITH hs AS (SELECT doc_id, list_transform(string_split(lower(text), ' '), w -> ${Hex60("w")}) AS h FROM documents) " +
        "SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), j -> " +
        "CASE WHEN list_sum(list_transform(h, x -> CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
        "THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS simhash FROM hs"),

    // pigeonhole block join is an EXACT candidate generator at
    // hamming <= k, so the oracle is the brute-force quadratic reference
    // (fine in DuckDB at sf0.01; the ENGINE never goes quadratic)
    "pipe_simhash_pairs" ->
      (s"WITH hs AS (SELECT doc_id, list_transform(string_split(lower(text), ' '), w -> ${Hex60("w")}) AS h FROM documents), " +
        "sig AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), j -> " +
        "CASE WHEN list_sum(list_transform(h, x -> CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
        "THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS sh FROM hs) " +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming " +
        "FROM sig a JOIN sig b ON a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.sh, b.sh)) <= 3"),

    "pipe_sim_topk" ->
      (s"WITH $EmbNorm, j AS (" +
        s"SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${dot("q", "c")} / (q.norm * c.norm) AS sim " +
        "FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id != q.vec_id), " +
        "r AS (SELECT query_id, neighbor_id, sim, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY round(sim, 6) DESC, neighbor_id) AS rk FROM j) " +
        "SELECT query_id, neighbor_id, round(sim, 4) AS sim, rk FROM r WHERE rk <= 5"),

    "pipe_dedup_embedding" -> lshOracle(0.45),

    "pipe_sim_lsh" -> lshOracle(0.35),

    // IVF: portable md5-ranked centroid sample, argmax assignment,
    // nProbe=4 probed buckets, exact cosine top-5 — mirrors every
    // tie-break of Similarity.ivfCosineTopK
    "pipe_sim_ivf" ->
      (s"WITH $EmbNorm, cent AS (SELECT vec_id AS cid, embedding AS cvec, norm AS cnorm" +
        " FROM n ORDER BY md5('7:' || vec_id) LIMIT 16), " +
        "asg AS (SELECT vec_id, bucket FROM (" +
        "SELECT v.vec_id, c.cid AS bucket, row_number() OVER (PARTITION BY v.vec_id" +
        s" ORDER BY round(${dotVC("v", "c")} / (v.norm * c.cnorm), 6) DESC, c.cid) AS rn" +
        " FROM n v, cent c) WHERE rn = 1), " +
        "q AS (SELECT vec_id AS query_id, embedding AS q_emb, norm AS q_norm FROM n WHERE vec_id < 10), " +
        "probes AS (SELECT query_id, bucket FROM (" +
        "SELECT q.query_id, c.cid AS bucket, row_number() OVER (PARTITION BY q.query_id" +
        s" ORDER BY round(${dotQC("q", "c")} / (c.cnorm * q.q_norm), 6) DESC, c.cid) AS prk" +
        " FROM q, cent c) WHERE prk <= 4), " +
        "cand AS (SELECT q.query_id, v.vec_id, " +
        "list_sum(list_transform(range(1, 65), k -> q.q_emb[k]::DOUBLE * v.embedding[k]::DOUBLE))" +
        " / (v.norm * q.q_norm) AS sim" +
        " FROM probes p JOIN q ON p.query_id = q.query_id" +
        " JOIN asg a ON a.bucket = p.bucket JOIN n v ON v.vec_id = a.vec_id" +
        " WHERE v.vec_id != q.query_id), " +
        "r AS (SELECT query_id, vec_id AS neighbor_id, sim, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY round(sim, 6) DESC, vec_id) AS rk FROM cand) " +
        "SELECT query_id, neighbor_id, round(sim, 4) AS sim, rk FROM r WHERE rk <= 5"),

    "pipe_text_tokens" ->
      (s"WITH $Toks SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct, " +
        "round(list_sum(list_transform(t, x -> len(x)))::DOUBLE / len(t), 4) AS avg_token_len FROM toks"),

    // same RE2-safe pre-tokenizer pattern as TextAnalysis.BpePattern
    // (single quote doubled for SQL)
    "pipe_text_bpe" ->
      (s"SELECT doc_id, len(regexp_extract_all(text, '${TextAnalysis.BpePattern.replace("'", "''")}'))" +
        " AS bpe_tokens, CAST(ceil(len(text) / 4.0) AS BIGINT) AS est_tokens FROM documents"),

    "pipe_text_quality" ->
      (s"WITH $Toks, m AS (SELECT doc_id, len(t) AS n_tokens, " +
        "round((len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE / greatest(len(text), 1), 4) AS punct_ratio, " +
        "round(len(list_intersect(t, ['the','a','of','and','in','to','is']))::DOUBLE / greatest(len(t), 1), 4) AS stop_ratio " +
        "FROM toks), q AS (SELECT *, round(least(1.0, n_tokens::DOUBLE / 50) * (1.0 - punct_ratio), 4) AS quality_score FROM m) " +
        "SELECT doc_id, n_tokens, punct_ratio, stop_ratio, quality_score, quality_score >= 0.5 AS passes FROM q"),

    // predicted = argmax over all four scores, ties to the alphabetically
    // first language ('unk' only when every score is zero) — the chained
    // >= CASE implements exactly the engine's (score, -rank) struct-max
    "pipe_text_langid" ->
      (s"WITH $Toks, sc AS (SELECT doc_id, lang, " +
        "len(list_intersect(t, ['der','die','das','und'])) AS score_de, " +
        "len(list_intersect(t, ['the','a','and','of','value','table'])) AS score_en, " +
        "len(list_intersect(t, ['el','la','y','de'])) AS score_es, " +
        "len(list_intersect(t, ['le','la','et','les'])) AS score_fr FROM toks) " +
        "SELECT doc_id, lang, score_de, score_en, score_es, score_fr, " +
        "CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'unk' " +
        "WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de' " +
        "WHEN score_en >= score_es AND score_en >= score_fr THEN 'en' " +
        "WHEN score_es >= score_fr THEN 'es' ELSE 'fr' END AS predicted FROM sc"),

    "pipe_text_fingerprint" ->
      ("WITH nrm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt FROM documents) " +
        s"SELECT doc_id, md5(nt) AS fp, ${Hex60("nt")} AS fp60 FROM nrm"),

    "pipe_mm_decode" ->
      ("SELECT doc_id, len(text)::BIGINT AS byte_len, " +
        "array_to_string(list_transform(range(1, 5), i -> ascii(substr(text, i, 1))), ',') AS head_codes, " +
        "len(text)::BIGINT % 640 AS fake_width, (len(text)::BIGINT * 7) % 480 AS fake_height " +
        "FROM documents"),

    // the planted pattern recomputed arithmetically: luminance of gray
    // (g,g,g) is exactly g under integer Rec.601, aHash bit j set iff
    // g*64 > sum (threshold-by-mean without division)
    "pipe_mm_decode_real" ->
      ("WITH px AS (SELECT doc_id, x.range AS x, y.range AS y, " +
        "(doc_id * 7 + x.range * 3 + y.range * 5) % 256 AS g " +
        "FROM documents, range(8) x, range(8) y), " +
        "s AS (SELECT doc_id, sum(g)::BIGINT AS sum_gray FROM px GROUP BY doc_id), " +
        "b AS (SELECT p.doc_id, " +
        "coalesce(sum(CASE WHEN p.g * 64 > s.sum_gray AND p.y * 8 + p.x < 32 " +
        "THEN (1::BIGINT << (p.y * 8 + p.x)) END), 0)::BIGINT AS ahash_lo, " +
        "coalesce(sum(CASE WHEN p.g * 64 > s.sum_gray AND p.y * 8 + p.x >= 32 " +
        "THEN (1::BIGINT << (p.y * 8 + p.x - 32)) END), 0)::BIGINT AS ahash_hi " +
        "FROM px p JOIN s ON s.doc_id = p.doc_id GROUP BY p.doc_id) " +
        "SELECT b.doc_id, 8::BIGINT AS width, 8::BIGINT AS height, s.sum_gray, " +
        "b.ahash_lo, b.ahash_hi FROM b JOIN s ON s.doc_id = b.doc_id"),

    // the planted animated-GIF pattern recomputed arithmetically for the
    // sampled frames 0, 2, 4
    "pipe_mm_frames_real" ->
      ("WITH fr AS (SELECT doc_id, f.range AS frame_idx FROM documents, range(0, 6, 2) f), " +
        "px AS (SELECT doc_id, frame_idx, " +
        "(doc_id * 7 + frame_idx * 11 + x.range * 3 + y.range * 5) % 256 AS g " +
        "FROM fr, range(8) x, range(8) y), " +
        // row-major gray CSV rebuilt arithmetically (k = y*8+x), then the
        // shared 60-bit md5 prefix — identical to the JVM's frame_fp
        "fp AS (SELECT doc_id, frame_idx, CAST('0x' || substr(md5(array_to_string(" +
        "list_transform(range(0, 64), k -> CAST((doc_id * 7 + frame_idx * 11 + " +
        "(k % 8) * 3 + (k // 8) * 5) % 256 AS VARCHAR)), ',')), 1, 15) AS BIGINT) AS frame_fp " +
        "FROM fr) " +
        "SELECT p.doc_id, p.frame_idx::BIGINT AS frame_idx, 8::BIGINT AS width, " +
        "8::BIGINT AS height, sum(p.g)::BIGINT AS sum_gray, max(fp.frame_fp) AS frame_fp " +
        "FROM px p JOIN fp ON fp.doc_id = p.doc_id AND fp.frame_idx = p.frame_idx " +
        "GROUP BY 1, 2"),

    // frame codes recomputed arithmetically from the planted seeds; the
    // quadratic reference (the engine's candidate index is exact)
    "pipe_mm_video_neardup" ->
      ("WITH fs AS (SELECT doc_id, j.range AS j, " +
        "CASE WHEN j.range < 4 THEN (doc_id // 5) * 1000 + j.range " +
        "ELSE 700000 + doc_id * 1000 + j.range END AS seed " +
        "FROM documents, range(6) j), " +
        "cd AS (SELECT doc_id, j, CAST('0x' || substr(md5(array_to_string(" +
        "list_transform(range(0, 64), k -> CAST((seed * 7 + (seed // 256) * 11 * k + " +
        "(k % 8) * 3 + (k // 8) * 5) % 256 AS VARCHAR)), ',')), 1, 15) AS BIGINT) AS code " +
        "FROM fs), " +
        "st AS (SELECT doc_id, list(DISTINCT code) AS codes FROM cd GROUP BY doc_id), " +
        "pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "len(list_intersect(a.codes, b.codes))::DOUBLE / " +
        "len(list_distinct(list_concat(a.codes, b.codes))) AS jac " +
        "FROM st a JOIN st b ON a.doc_id < b.doc_id) " +
        "SELECT doc_a, doc_b, round(jac, 4) AS jac FROM pr WHERE jac >= 0.45"),

    // aHashes recomputed from the planted patterns, brute-force hamming
    // as halves (the pigeonhole join is a complete generator, so engine
    // output equals the quadratic reference exactly)
    "pipe_mm_image_neardup" ->
      ("WITH d AS (SELECT doc_id, doc_id // 5 AS grp FROM documents), " +
        "px AS (SELECT doc_id, x.range AS x, y.range AS y, " +
        "CASE WHEN x.range = doc_id % 8 AND y.range = (doc_id // 8) % 8 THEN 255 " +
        "ELSE ((3 + (grp % 251) * 13) * x.range + (5 + (grp % 239) * 11) * y.range + grp) % 256 END AS g " +
        "FROM d, range(8) x, range(8) y), " +
        "s AS (SELECT doc_id, sum(g) AS sm FROM px GROUP BY doc_id), " +
        "h AS (SELECT p.doc_id, " +
        "coalesce(sum(CASE WHEN p.g * 64 > s.sm AND p.y * 8 + p.x < 32 " +
        "THEN (1::BIGINT << (p.y * 8 + p.x)) END), 0)::BIGINT AS lo, " +
        "coalesce(sum(CASE WHEN p.g * 64 > s.sm AND p.y * 8 + p.x >= 32 " +
        "THEN (1::BIGINT << (p.y * 8 + p.x - 32)) END), 0)::BIGINT AS hi " +
        "FROM px p JOIN s ON s.doc_id = p.doc_id GROUP BY p.doc_id) " +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming " +
        "FROM h a JOIN h b ON a.doc_id < b.doc_id " +
        "WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 7"),

    // the nearest-neighbor sample replayed: resized pixel (x,y) reads
    // pattern((x*8)/4, (y*8)/3)
    "pipe_mm_resize_real" ->
      ("WITH px AS (SELECT doc_id, x.range AS x, y.range AS y, " +
        "(doc_id * 7 + ((x.range * 8) // 4) * 3 + ((y.range * 8) // 3) * 5) % 256 AS g " +
        "FROM documents, range(4) x, range(3) y) " +
        "SELECT doc_id, 4::BIGINT AS out_w, 3::BIGINT AS out_h, " +
        "sum(g)::BIGINT AS sum_gray FROM px GROUP BY doc_id"),

    // planted stream parameters recomputed arithmetically
    "pipe_mm_audio_meta" ->
      ("SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'flac' END AS format, " +
        "CAST(8000 + (doc_id % 5) * 4000 AS BIGINT) AS sample_rate, " +
        "CAST(n_chars % 2 + 1 AS BIGINT) AS channels, " +
        "CAST(CASE WHEN doc_id % 3 = 0 THEN 24 ELSE 16 END AS BIGINT) AS bits_per_sample " +
        "FROM documents"),

    // planted ISO-BMFF parameters recomputed arithmetically: the engine
    // must round-trip them through a real nested box walk and back
    "pipe_mm_video_meta" ->
      ("SELECT doc_id, 'mp4' AS format, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand, " +
        "CAST(600 + (doc_id % 4) * 300 AS BIGINT) AS timescale, " +
        "CAST((doc_id % 30 + 1) * 1000 AS BIGINT) AS duration_ms, " +
        "CAST(1 + doc_id % 2 AS BIGINT) AS n_tracks, " +
        "CASE doc_id % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1' ELSE 'vp09' END AS video_codec, " +
        "CAST(n_chars % 640 + 16 AS BIGINT) AS width, " +
        "CAST(doc_id % 360 + 16 AS BIGINT) AS height, " +
        "CAST(doc_id % 7 + 1 AS BIGINT) AS n_keyframes " +
        "FROM documents"),

    // planted dimensions recomputed arithmetically: the engine must
    // round-trip them through REAL header bytes and back
    "pipe_mm_image_meta" ->
      ("SELECT doc_id, " +
        "CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif' ELSE 'bmp' END AS format, " +
        "CAST(n_chars % 1000 + 1 AS BIGINT) AS width, " +
        "CAST(doc_id % 500 + 1 AS BIGINT) AS height, " +
        "CAST(CASE WHEN doc_id % 4 = 3 THEN 24 ELSE 8 END AS BIGINT) AS bit_depth " +
        "FROM documents"),

    // fit-within-box resize of the fake decoded dims — integer math only
    "pipe_mm_resize" ->
      ("WITH d AS (SELECT doc_id, len(text)::BIGINT % 640 AS w, (len(text)::BIGINT * 7) % 480 AS h FROM documents) " +
        "SELECT doc_id, w AS src_w, h AS src_h, " +
        "CASE WHEN w <= 0 OR h <= 0 THEN 0 WHEN w * 96 <= h * 128 THEN w * 96 // h ELSE 128 END AS out_w, " +
        "CASE WHEN w <= 0 OR h <= 0 THEN 0 WHEN w * 96 <= h * 128 THEN 96 ELSE h * 128 // w END AS out_h " +
        "FROM d"),

    // every 5th fake frame (100 bytes each), fingerprint = frame's first
    // byte (documents are ASCII so byte == char code)
    "pipe_mm_frames" ->
      ("WITH d AS (SELECT doc_id, text, len(text)::BIGINT // 100 AS n_frames FROM documents) " +
        "SELECT doc_id, 5 * i AS frame_idx, " +
        "ascii(substr(text, CAST(5 * i * 100 + 1 AS INT), 1))::BIGINT AS frame_code " +
        "FROM (SELECT doc_id, text, unnest(range(0, (n_frames + 4) // 5)) AS i FROM d)"),

    // int8 max-abs quantization; floor(x+0.5) rounding and pinned
    // parenthesization mirror Quantization.quantizeInt8 exactly
    "pipe_emb_quantize" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings), " +
        "s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM e), " +
        "q AS (SELECT vec_id, v, scale, list_transform(v, x -> " +
        "CASE WHEN scale = 0 THEN 0 ELSE CAST(floor((x * 127.0) / scale + 0.5) AS BIGINT) END) AS qv FROM s) " +
        "SELECT vec_id, round(scale, 6) AS scale, array_to_string(qv, ',') AS q, " +
        "round(sqrt(list_sum(list_transform(range(1, 65), k -> " +
        "(v[k] - (qv[k] * scale) / 127.0) * (v[k] - (qv[k] * scale) / 127.0))) / 64.0), 6) AS rmse " +
        "FROM q"),

    // contiguous greedy sequence packing per source shard; DuckDB
    // replays the exclusive running token sum
    "pipe_pack" ->
      ("WITH t AS (SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents), " +
        "c AS (SELECT doc_id, source, n_tokens, coalesce(sum(n_tokens) OVER (" +
        "PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM t) " +
        "SELECT doc_id, source, n_tokens, (cb // 512)::BIGINT AS bin FROM c"),

    // Gopher-style repetition signals; DuckDB recomputes the bigram
    // frequency profile per doc
    "pipe_text_repetition" ->
      ("WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents), " +
        "base AS (SELECT doc_id, len(t)::BIGINT AS n_tokens, " +
        "round(len(list_distinct(t))::DOUBLE / len(t), 4) AS uniq_ratio, " +
        "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg " +
        "FROM toks WHERE len(t) >= 2), " +
        "c AS (SELECT doc_id, unnest(bg) AS b FROM base), " +
        "cnts AS (SELECT doc_id, b, count(*) AS cnt FROM c GROUP BY 1, 2), " +
        "agg AS (SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS nbg, " +
        "sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup FROM cnts GROUP BY 1) " +
        "SELECT b.doc_id, b.n_tokens, b.uniq_ratio, " +
        "round(a.top_cnt::DOUBLE / a.nbg, 4) AS top_bigram_frac, " +
        "round(a.dup::DOUBLE / a.nbg, 4) AS dup_bigram_frac " +
        "FROM base b JOIN agg a USING (doc_id)"),

    // decontamination: 5-gram overlap of train docs (doc_id % 37 != 0)
    // against the eval stand-in (doc_id % 37 == 0); DuckDB slicing is
    // inclusive, so t[i:i+4] is the same 5-token window as Spark's
    // slice(__t, i+1, 5)
    "pipe_decontam" -> DecontamOracleSql,

    // the Bloom path must produce the identical rows — ONE shared string,
    // so an oracle edit cannot drift the two gates apart
    "pipe_decontam_bloom" -> DecontamOracleSql,

    // cross-corpus LSH replayed exactly: same md5-derived minhashes, same
    // 4×2 banding, train bands joined to eval bands, exact Jaccard verify
    "pipe_decontam_fuzzy" ->
      (s"WITH $Sig, " +
        "tb AS (SELECT doc_id, s, b.range AS band, " +
        "CAST(g[2*b.range + 1] AS VARCHAR) || ',' || CAST(g[2*b.range + 2] AS VARCHAR) AS bkey " +
        "FROM sig, range(4) b WHERE doc_id % 37 <> 0), " +
        "eb AS (SELECT doc_id, s, b.range AS band, " +
        "CAST(g[2*b.range + 1] AS VARCHAR) || ',' || CAST(g[2*b.range + 2] AS VARCHAR) AS bkey " +
        "FROM sig, range(4) b WHERE doc_id % 37 = 0), " +
        "cand AS (SELECT DISTINCT t.doc_id AS tid, e.doc_id AS eid, t.s AS s_t, e.s AS s_e " +
        "FROM tb t JOIN eb e ON t.band = e.band AND t.bkey = e.bkey), " +
        "scored AS (SELECT tid, eid, " +
        "len(list_intersect(s_t, s_e))::DOUBLE / len(list_distinct(list_concat(s_t, s_e))) AS jac FROM cand), " +
        "hits AS (SELECT tid, count(*)::BIGINT AS n_matches, round(max(jac), 4) AS max_jac " +
        "FROM scored WHERE jac >= 0.5 GROUP BY tid) " +
        "SELECT d.doc_id, coalesce(h.n_matches, 0) AS n_matches, h.max_jac, " +
        "h.n_matches IS NOT NULL AS contaminated " +
        "FROM documents d LEFT JOIN hits h ON h.tid = d.doc_id WHERE d.doc_id % 37 <> 0"),

    // corpus clean = quality >= 0.5 AND predicted 'en' AND canonical copy
    // AND the minimum doc_id of its near-dup connected component
    "pipe_corpus_clean" ->
      (s"WITH RECURSIVE $MinhashScored, $CcCtes, " +
        "m AS (SELECT doc_id, len(t) AS n_tokens, " +
        "round((len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE / greatest(len(text), 1), 4) AS punct_ratio " +
        "FROM toks), " +
        "q AS (SELECT doc_id, round(least(1.0, n_tokens::DOUBLE / 50) * (1.0 - punct_ratio), 4) AS quality_score FROM m), " +
        "lid AS (SELECT doc_id, CASE WHEN len(list_intersect(t, ['the','a','and','of','value','table'])) > 0 THEN 'en' ELSE 'unk' END AS predicted FROM toks), " +
        "canon AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1), " +
        "losers AS (SELECT id AS doc_id FROM comp WHERE root != id) " +
        "SELECT d.doc_id, d.lang, d.n_chars, q.quality_score " +
        "FROM documents d JOIN q USING (doc_id) JOIN lid USING (doc_id) " +
        "JOIN canon USING (doc_id) LEFT JOIN losers r USING (doc_id) " +
        "WHERE r.doc_id IS NULL AND q.quality_score >= 0.5 AND lid.predicted = 'en'"),

    // full pipeline: the corpus_clean CTE chain, then repetition /
    // decontamination gates, then the packing window over survivors
    "pipe_corpus_pipeline" ->
      (s"WITH RECURSIVE $MinhashScored, $CcCtes, " +
        "m AS (SELECT doc_id, len(t) AS n_tokens, " +
        "round((len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE / greatest(len(text), 1), 4) AS punct_ratio " +
        "FROM toks), " +
        "q AS (SELECT doc_id, round(least(1.0, n_tokens::DOUBLE / 50) * (1.0 - punct_ratio), 4) AS quality_score FROM m), " +
        "lid AS (SELECT doc_id, CASE WHEN len(list_intersect(t, ['the','a','and','of','value','table'])) > 0 THEN 'en' ELSE 'unk' END AS predicted FROM toks), " +
        "canon AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1), " +
        "losers AS (SELECT id AS doc_id FROM comp WHERE root != id), " +
        "clean AS (SELECT d.doc_id FROM documents d JOIN q USING (doc_id) JOIN lid USING (doc_id) " +
        "JOIN canon USING (doc_id) LEFT JOIN losers r USING (doc_id) " +
        "WHERE r.doc_id IS NULL AND q.quality_score >= 0.5 AND lid.predicted = 'en'), " +
        // repetition gate (round-4 duplicate-bigram fraction <= 0.7)
        "bgb AS (SELECT doc_id, list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg FROM toks WHERE len(t) >= 2), " +
        "bgc AS (SELECT doc_id, b, count(*) AS cnt FROM (SELECT doc_id, unnest(bg) AS b FROM bgb) GROUP BY 1, 2), " +
        "repok AS (SELECT doc_id FROM (SELECT doc_id, sum(cnt) AS nbg, " +
        "sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup FROM bgc GROUP BY 1) " +
        "WHERE round(dup::DOUBLE / nbg, 4) <= 0.7), " +
        // decontamination gate (any shared 5-gram with the eval stand-in)
        "ng5 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 3), " +
        "i -> array_to_string(t[i:i+4], ' '))) AS g FROM toks WHERE len(t) >= 5), " +
        "ev AS (SELECT coalesce(list(DISTINCT ng), []) AS evl FROM " +
        "(SELECT unnest(g) AS ng FROM ng5 WHERE doc_id % 37 = 0)), " +
        "cont AS (SELECT n.doc_id FROM ng5 n CROSS JOIN ev WHERE len(list_intersect(n.g, ev.evl)) > 0), " +
        "surv AS (SELECT d.doc_id, d.source, d.text FROM documents d " +
        "JOIN clean USING (doc_id) JOIN repok USING (doc_id) " +
        "LEFT JOIN cont USING (doc_id) WHERE cont.doc_id IS NULL), " +
        "pk AS (SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n_tokens FROM surv), " +
        "cb AS (SELECT doc_id, source, n_tokens, coalesce(sum(n_tokens) OVER (" +
        "PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c FROM pk) " +
        "SELECT doc_id, source, n_tokens, (c // 512)::BIGINT AS bin FROM cb"),

    "pipe_text_redact" ->
      ("WITH a AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)" +
        " || '@mail.example or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug" +
        " FROM documents) " +
        "SELECT doc_id, " +
        s"len(regexp_extract_all(aug, '${TextAnalysis.EmailRe}'))::BIGINT AS n_emails, " +
        s"len(regexp_extract_all(aug, '${TextAnalysis.PhoneRe}'))::BIGINT AS n_phones, " +
        s"regexp_replace(regexp_replace(aug, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'), " +
        s"'${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS redacted FROM a"),

    "pipe_corpus_mix" ->
      ("SELECT doc_id, lang, source, n_chars FROM documents " +
        "WHERE CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 1000 < " +
        "(CASE lang WHEN 'en' THEN 900 WHEN 'zh' THEN 200 ELSE 400 END)"),

    // thresholds recomputed from the language counts: floor(1000 *
    // sqrt(n_min/n_g)) — sqrt is IEEE-exact in both engines, so the
    // thresholds (and hence the kept set) are bit-identical
    "pipe_temperature_mix" ->
      ("WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang), " +
        "mn AS (SELECT min(n) AS nmin FROM c), " +
        "th AS (SELECT lang, CAST(floor(sqrt(nmin::DOUBLE / n) * 1000) AS BIGINT) AS t FROM c, mn) " +
        "SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d JOIN th USING (lang) " +
        "WHERE CAST('0x' || substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 1000 < th.t"),

    // the per-shard rollup of the snake assignment — what must be on disk
    "pipe_shard_write" ->
      ("WITH r AS (SELECT doc_id, n_chars::BIGINT AS w, " +
        "row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS rk FROM documents), " +
        "a AS (SELECT doc_id, w, CASE WHEN (rk // 8) % 2 = 0 THEN rk % 8 " +
        "ELSE 7 - (rk % 8) END AS shard FROM r) " +
        "SELECT shard, count(*)::BIGINT AS n_docs, sum(w)::BIGINT AS total_weight " +
        "FROM a GROUP BY shard"),

    // the snake assignment replayed over the same total order
    "pipe_shard_assign" ->
      ("WITH r AS (SELECT doc_id, n_chars::BIGINT AS weight, " +
        "row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS rk FROM documents) " +
        "SELECT doc_id, weight, CASE WHEN (rk // 8) % 2 = 0 THEN rk % 8 " +
        "ELSE 7 - (rk % 8) END AS shard FROM r"),

    // char-bigram LM: per-bigram surprisal is an INTEGER (round((ln total
    // − ln cnt)·1e6), both logs over integer args — bit-identical across
    // engines), per-doc sums are integer arithmetic; one division + 4-dec
    // round at the end. No float accumulates across rows on either side.
    "pipe_text_ppx" ->
      ("WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents WHERE length(text) >= 2), " +
        "bi AS (SELECT doc_id, unnest(list_transform(range(1, length(lt)), " +
        "i -> substr(lt, i, 2))) AS b FROM t), " +
        "db AS (SELECT doc_id, b, count(*)::BIGINT AS occ FROM bi GROUP BY 1, 2), " +
        "c AS (SELECT b, sum(occ)::BIGINT AS cnt FROM db GROUP BY 1), " +
        "tot AS (SELECT sum(cnt)::BIGINT AS total FROM c), " +
        "nll AS (SELECT b, CAST(round((ln(total::DOUBLE) - ln(cnt::DOUBLE)) * 1e6) AS BIGINT) " +
        "AS nll6 FROM c CROSS JOIN tot) " +
        "SELECT doc_id, sum(occ)::BIGINT AS n_bigrams, " +
        "round(sum(occ * nll6)::DOUBLE / 1e6 / sum(occ), 4) AS char_lm_nll " +
        "FROM db JOIN nll USING (b) GROUP BY doc_id"),

    "pipe_split" ->
      ("SELECT doc_id, b AS bucket, CASE WHEN b < 90 THEN 'train' " +
        "WHEN b < 95 THEN 'val' ELSE 'test' END AS split FROM " +
        "(SELECT doc_id, (CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 6) " +
        "AS BIGINT) % 1000) % 100 AS b FROM documents)"),

    // A-ES weighted reservoir: rank by the monotone-equivalent integer-log
    // score (ln(m+1) - 60 ln 2)/w, 6-dec rounded, doc_id tie-break
    "pipe_weighted_sample" ->
      (s"WITH sc AS (SELECT source, doc_id, n_chars, " +
        s"round((ln(${Hex60("'ws:' || CAST(doc_id AS VARCHAR)")} + 1) - 60 * ln(2)) / n_chars, 6) AS s " +
        "FROM documents) " +
        "SELECT source, doc_id, n_chars, rk FROM " +
        "(SELECT source, doc_id, n_chars, row_number() OVER " +
        "(PARTITION BY source ORDER BY s DESC, doc_id) AS rk FROM sc) WHERE rk <= 5"),

    "pipe_corpus_stats" ->
      ("SELECT lang, source, count(*) AS n_docs, " +
        "sum(length(text))::BIGINT AS total_chars, " +
        "sum(len(string_split(text, ' ')))::BIGINT AS total_tokens, " +
        "round(sum(length(text))::DOUBLE / count(*), 2) AS avg_doc_chars " +
        "FROM documents GROUP BY 1, 2"),

    // BM25: idf = ln(2N+2) - ln(2df+1) (integer-arg logs, the tf-idf
    // discipline); per-term contributions fixed to micro-unit LONGs so
    // the cross-term per-doc sum is integer and order-free
    "pipe_text_bm25" ->
      (s"WITH $Toks, " +
        "st AS (SELECT count(*)::BIGINT AS n, sum(len(t))::BIGINT AS tot FROM toks), " +
        "tw AS (SELECT doc_id, len(t)::BIGINT AS dl, unnest(t) AS term FROM toks), " +
        "f AS (SELECT doc_id, term, count(*)::BIGINT AS tc, max(dl) AS dl FROM tw " +
        "WHERE term IN ('table','spark','hash','merge','window') GROUP BY 1, 2), " +
        "dfq AS (SELECT term, count(*)::BIGINT AS df FROM f GROUP BY 1), " +
        "sc AS (SELECT doc_id, CAST(round(" +
        "round(ln((2 * n + 2)::DOUBLE) - ln((df * 2 + 1)::DOUBLE), 6) * " +
        "(tc::DOUBLE * 2.2) / " +
        "(tc::DOUBLE + 1.2 * (0.25 + 0.75 * (dl::DOUBLE * n::DOUBLE / tot::DOUBLE))) " +
        "* 1e6) AS BIGINT) AS c FROM f JOIN dfq USING (term) CROSS JOIN st), " +
        "pd AS (SELECT doc_id, sum(c)::BIGINT AS s, count(*)::BIGINT AS n_terms_hit FROM sc GROUP BY 1), " +
        "r AS (SELECT doc_id, n_terms_hit, s, " +
        "row_number() OVER (ORDER BY s DESC, doc_id) AS rk FROM pd) " +
        "SELECT doc_id, n_terms_hit, round(s::DOUBLE / 1e6, 4) AS bm25, rk " +
        "FROM r WHERE rk <= 10"),

    // inverted index: head postings block = first 32 doc_ids per term
    "pipe_text_invindex" ->
      (s"WITH $Toks, " +
        "tw AS (SELECT doc_id, unnest(t) AS term FROM toks), " +
        "f AS (SELECT term, doc_id, count(*)::BIGINT AS tc FROM tw GROUP BY 1, 2), " +
        "st AS (SELECT term, count(*)::BIGINT AS df, sum(tc)::BIGINT AS cf FROM f GROUP BY 1), " +
        "r AS (SELECT term, doc_id, tc, row_number() OVER " +
        "(PARTITION BY term ORDER BY doc_id) AS rk FROM f), " +
        "hp AS (SELECT term, string_agg(doc_id || ':' || tc, ',' ORDER BY doc_id) " +
        "AS postings FROM r WHERE rk <= 32 GROUP BY term) " +
        "SELECT term, df, cf, postings FROM st JOIN hp USING (term)"),

    // per-language p25 cutoffs; the filter compares against the
    // UNROUNDED interpolated percentile on both sides (quantile_cont ≡
    // Spark percentile, pinned by q_percentile)
    "pipe_quality_bylang" ->
      (s"WITH $Toks, m AS (SELECT doc_id, lang, len(t) AS n_tokens, " +
        "round((len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE / greatest(len(text), 1), 4) AS punct_ratio " +
        "FROM toks), " +
        "q AS (SELECT doc_id, lang, round(least(1.0, n_tokens::DOUBLE / 50) * (1.0 - punct_ratio), 4) AS quality_score FROM m), " +
        "c AS (SELECT lang, quantile_cont(quality_score, 0.25) AS cut FROM q GROUP BY 1) " +
        "SELECT doc_id, lang, quality_score, round(cut, 4) AS lang_cutoff " +
        "FROM q JOIN c USING (lang) WHERE quality_score >= cut"),

    // per-source running token sum in seeded-hash order, cut at 40% of
    // the source's total tokens — integer window sum, exact cut point
    "pipe_token_budget" ->
      ("WITH b AS (SELECT doc_id, source, " +
        "len(string_split(text, ' '))::BIGINT AS n_tokens, " +
        "md5('tb:' || CAST(doc_id AS VARCHAR)) AS h FROM documents), " +
        "tt AS (SELECT source, sum(n_tokens)::BIGINT AS tot FROM b GROUP BY 1), " +
        "r AS (SELECT b.*, tt.tot, sum(n_tokens) OVER (PARTITION BY b.source " +
        "ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens " +
        "FROM b JOIN tt USING (source)) " +
        "SELECT source, doc_id, n_tokens, cum_tokens::BIGINT AS cum_tokens FROM r " +
        "WHERE cum_tokens::DOUBLE <= tot::DOUBLE * 0.4"),

    // SemDeDup replay: the shared kmeans chain assigns buckets (rsim =
    // raw cosine to the winning centroid), within-bucket pairs at >= 0.45
    // feed the recursive min-id closure, and the keep rule ranks
    // round(rsim, 6) ASC with id tie-break
    "pipe_dedup_semantic" ->
      (s"WITH RECURSIVE $kmAsgsChain, " +
        "pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM asgs a " +
        "JOIN asgs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id " +
        "JOIN n va ON va.vec_id = a.vec_id JOIN n vb ON vb.vec_id = b.vec_id " +
        s"WHERE round(${dot("va", "vb")} / (va.norm * vb.norm), 6) >= 0.45), " +
        "se AS (SELECT id_a AS src, id_b AS dst FROM pr UNION SELECT id_b, id_a FROM pr), " +
        "sn AS (SELECT DISTINCT src AS id FROM se), " +
        "sreach(id, r) AS (SELECT id, id FROM sn UNION " +
        "SELECT rc.id, se.dst FROM sreach rc JOIN se ON se.src = rc.r), " +
        "ccg AS (SELECT id AS vec_id, min(r) AS cluster_id FROM sreach GROUP BY id), " +
        "mm AS (SELECT a.vec_id, a.bucket AS cent_id, a.rsim, " +
        "coalesce(ccg.cluster_id, a.vec_id) AS group_id FROM asgs a LEFT JOIN ccg USING (vec_id)), " +
        "rkk AS (SELECT mm.*, row_number() OVER (PARTITION BY group_id " +
        "ORDER BY round(rsim, 6) ASC, vec_id) AS rn FROM mm) " +
        "SELECT vec_id, cent_id, round(rsim, 4) AS cent_sim, group_id, rn = 1 AS keep FROM rkk"),

    // directed containment over the same distinct-shingle sets; the
    // engine's prefix filter is exact, so the quadratic reference matches
    "pipe_containment_pairs" ->
      (s"WITH $Shingles, scored AS (" +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) AS cont " +
        "FROM sh a JOIN sh b ON a.doc_id != b.doc_id) " +
        "SELECT doc_a, doc_b, round(cont, 4) AS containment FROM scored WHERE cont >= 0.6"),

    // LSH-Ensemble stratified containment replay: the pairing table
    // (ga, gb, rowsPerBand, bands) is GENERATED from the same Scala
    // function the engine bands with, so both sides bucket identically;
    // k=64 portable minhash, exact-intersection verify on candidates
    "pipe_containment_stratified" -> {
      val pairings = Dedup.stratumPairings(0.6, 64, 20)
        .map { case (ga, gb, r, b) => s"($ga, $gb, $r, $b)" }.mkString(", ")
      s"WITH $Shingles, " +
        "sz AS (SELECT doc_id, s, len(s) AS n, length(bin(len(s))) - 1 AS g FROM sh WHERE len(s) > 0), " +
        "sig64 AS (SELECT doc_id, g, s, list_transform(range(0, 64), h -> " +
        s"list_min(list_transform(s, x -> ${Hex60("CAST(h AS VARCHAR) || ':' || x")}))) AS q FROM sz), " +
        s"pr AS (SELECT * FROM (VALUES $pairings) AS t(pga, pgb, prr, pb)), " +
        "ak AS (SELECT doc_id AS doc_a, pga, pgb, bd.range AS band, " +
        "array_to_string(list_transform(range(prr * bd.range, prr * bd.range + prr), i -> CAST(q[i + 1] AS VARCHAR)), ',') AS bkey " +
        "FROM sig64 JOIN pr ON g = pga, range(64) bd WHERE bd.range < pb), " +
        "bk AS (SELECT doc_id AS doc_b, pga, pgb, bd.range AS band, " +
        "array_to_string(list_transform(range(prr * bd.range, prr * bd.range + prr), i -> CAST(q[i + 1] AS VARCHAR)), ',') AS bkey " +
        "FROM sig64 JOIN pr ON g = pgb, range(64) bd WHERE bd.range < pb), " +
        "hot AS (SELECT pga, pgb, band, bkey, 1 AS hh FROM bk GROUP BY 1, 2, 3, 4 HAVING count(*) > 32), " +
        "ak2 AS (SELECT ak.* FROM ak LEFT JOIN hot USING (pga, pgb, band, bkey) WHERE hh IS NULL), " +
        "bk2 AS (SELECT bk.* FROM bk LEFT JOIN hot USING (pga, pgb, band, bkey) WHERE hh IS NULL), " +
        "cand AS (SELECT DISTINCT doc_a, doc_b FROM ak2 JOIN bk2 USING (pga, pgb, band, bkey) WHERE doc_a <> doc_b), " +
        "v AS (SELECT c.doc_a, c.doc_b, " +
        "len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) AS cont " +
        "FROM cand c JOIN sz a ON a.doc_id = c.doc_a JOIN sz b ON b.doc_id = c.doc_b) " +
        "SELECT doc_a, doc_b, round(cont, 4) AS containment FROM v WHERE cont >= 0.6"
    },

    // Morton interleave of (length bucket, spread language id), group =
    // zval >> 12 — pure integer bit arithmetic, engine-exact
    "pipe_layout_zorder" ->
      ("WITH z AS (SELECT doc_id, lang, n_chars, " +
        "least(255, n_chars // 64)::BIGINT AS bx, " +
        "((CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2 " +
        "WHEN 'fr' THEN 3 WHEN 'zh' THEN 4 ELSE 5 END) * 42)::BIGINT AS by FROM documents), " +
        "m AS (SELECT *, list_sum(list_transform(range(0, 8), i -> " +
        "(((bx >> i) & 1) << (2 * i)) + (((by >> i) & 1) << (2 * i + 1))))::BIGINT AS zval FROM z) " +
        "SELECT doc_id, lang, n_chars, bx AS len_bucket, by AS lang_bucket, " +
        "zval, (zval >> 12)::BIGINT AS file_group FROM m"),

    // the 8 learned merge rules with their selection-time counts
    "pipe_bpe_train" ->
      (s"WITH ${bpeChainSql(8)} " +
        (1 to 8).map(k =>
          s"""SELECT CAST($k AS BIGINT) AS rk, l AS "left", r AS "right", l || r AS merged, pc AS pair_count FROM t$k""")
          .mkString(" UNION ALL ")),

    // apply the learned table: piece counts per doc from the final
    // word->symbols state joined back to the corpus
    "pipe_bpe_encode" ->
      (s"WITH ${bpeChainSql(8)}, " +
        "dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents) " +
        "SELECT doc_id, sum(len(string_split(substring(w8.sym, 2, length(w8.sym) - 2), chr(2) || chr(1))))::BIGINT AS bpe_pieces " +
        "FROM dw JOIN w8 USING (w) GROUP BY doc_id"),

    // the corpus p05 of cosine-to-own-centroid as the outlier cutoff;
    // verdict compares the UNROUNDED percentile on both sides
    "pipe_emb_outliers" ->
      (s"WITH $kmAsgsChain, ct AS (SELECT quantile_cont(rsim, 0.05) AS cut FROM asgs) " +
        "SELECT vec_id, bucket AS cent_id, round(rsim, 4) AS cent_sim, " +
        "round(cut, 6) AS cutoff6, rsim < cut AS is_outlier " +
        "FROM asgs CROSS JOIN ct"),

    "pipe_sim_sq8" ->
      (s"WITH $sq8Chain " +
        "SELECT query_id, neighbor_id, round(sim, 4) AS sim, rk FROM r WHERE rk <= 5"),

    "pipe_sim_recall_sq8" -> (s"WITH $sq8Chain, $recallTailSql"),

    // the KMV set algebra replayed: per-source 16-minima lists, merged
    // union sketch, membership-fraction jaccard, intersection = j x union
    "pipe_sketch_overlap" ->
      ("WITH tw AS (SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents), " +
        s"h AS (SELECT DISTINCT source, ${Hex60("w")} AS h FROM tw), " +
        "r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h), " +
        "s AS (SELECT source, list(h ORDER BY h) AS mins FROM r WHERE rn <= 16 GROUP BY source), " +
        "p AS (SELECT a.source AS src_a, b.source AS src_b, a.mins AS ma, b.mins AS mb " +
        "FROM s a JOIN s b ON a.source < b.source), " +
        "m AS (SELECT src_a, src_b, ma, mb, " +
        "list_sort(list_distinct(list_concat(ma, mb)))[1:16] AS mu FROM p), " +
        "c AS (SELECT src_a, src_b, ma, mb, mu, len(mu) AS ku, " +
        "len(list_intersect(mu, list_intersect(ma, mb))) AS ic FROM m), " +
        "e AS (SELECT src_a, src_b, ku, ic, " +
        "CASE WHEN ku < 16 THEN ku::DOUBLE ELSE (15.0 * 1152921504606846976.0) / mu[16] END AS eu FROM c) " +
        "SELECT src_a, src_b, ku::BIGINT AS k_used, round(eu, 4) AS est_union, " +
        "round(ic::DOUBLE / ku, 4) AS est_jaccard, " +
        "round(ic::DOUBLE / ku * eu, 4) AS est_intersect FROM e"),

    // weight = 1 + (src# % 4)/2; integer epochs always kept, the
    // fractional epoch hash-selected with the shared bucket rule
    "pipe_source_epochs" ->
      ("WITH w AS (SELECT doc_id, source, " +
        "1.0 + (CAST(substr(source, 4) AS BIGINT) % 4) * 0.5 AS wt FROM documents), " +
        "n AS (SELECT doc_id, source, CAST(floor(wt) AS BIGINT) + " +
        "(CASE WHEN CAST('0x' || substr(md5('ep:' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 1000 < " +
        "CAST(round(wt * 1000) AS BIGINT) % 1000 THEN 1 ELSE 0 END) AS ne FROM w) " +
        "SELECT doc_id, source, unnest(generate_series(1, ne))::BIGINT AS epoch " +
        "FROM n WHERE ne >= 1"))
}
