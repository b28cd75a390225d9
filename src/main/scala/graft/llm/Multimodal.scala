package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, Q}

/** One decoded media unit: fixed-width feature vector + typed metadata. */
case class MediaFeature(
    doc_id: Long,
    chunk_id: Int,
    n_bytes: Int,
    features: Array[Float])

/** Multimodal-column plumbing (`EXT`): image/audio/video modeled as opaque
  * `binary` payloads with typed metadata, processed per-partition in
  * batches — the Scala analog of a `mapInPandas` decode stage.
  *
  * The container has no codec libraries, so [[decodeStub]] is a
  * clearly-marked DETERMINISTIC FAKE (byte statistics standing in for
  * pixel/sample decoding). Everything around it — schema, chunking,
  * partition-batched execution, feature shape — is real and is what a
  * production decode would drop into. At scale, payloads stay columnar in
  * parquet, chunking is a narrow transform, and decode parallelism ==
  * input splits; nothing touches the driver.
  */
object Multimodal {

  val chunkBytes = 256

  /** Binary "media" table derived from documents: payload = utf8 bytes
    * (stands in for an image/audio blob) + typed metadata columns.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Engine.table(s, dir, "documents")
      .select(
        col("doc_id"),
        col("text").cast(BinaryType).as("payload"),
        col("lang").as("media_kind"),
        col("n_chars").cast(LongType).as("declared_bytes"))

  /** STUB decode: a real implementation would decode image frames /
    * audio windows here. The fake derives an 8-dim float feature from
    * byte sums over 8 equal strides — deterministic, codec-free, and
    * shaped exactly like a real embedding batch.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val dims = 8
    val out = new Array[Float](dims)
    if (payload.nonEmpty) {
      var i = 0
      while (i < payload.length) {
        // Long cross-multiplication: i*dims overflows Int at ~256 MB payloads
        out((i.toLong * dims / payload.length).toInt) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Chunk each payload into fixed-size frames and decode per partition —
    * the mapPartitions shape keeps per-batch setup (a real codec handle)
    * amortized across rows, exactly like mapInPandas batches.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec" init would go here (once per batch)
        rows.flatMap { case (docId, payload) =>
          payload.grouped(chunkBytes).zipWithIndex.map { case (chunk, i) =>
            MediaFeature(docId, i, chunk.length, decodeStub(chunk))
          }
        }
      }
  }

  /** Frame sampling: keep every `stride`-th chunk (video frame-sample /
    * audio window-hop analog). A narrow filter on chunk_id — no shuffle,
    * prunes decode work by 1/stride before feature extraction.
    */
  def frameSample(feats: Dataset[MediaFeature], stride: Int): Dataset[MediaFeature] =
    feats.filter(_.chunk_id % stride == 0)

  /** "Resize": project the feature vector to `outDims` by stride-mean
    * pooling (the image-resize analog on the stub features). Deterministic
    * pure function mapped over the Dataset — stays whole-stage narrow.
    */
  def resizeFeatures(feats: Dataset[MediaFeature], outDims: Int): Dataset[MediaFeature] = {
    val spark = feats.sparkSession
    import spark.implicits._
    feats.map { f =>
      val in = f.features
      val out = new Array[Float](outDims)
      val counts = new Array[Int](outDims)
      var i = 0
      while (i < in.length) {
        val j = i * outDims / in.length
        out(j) += in(i); counts(j) += 1
        i += 1
      }
      var j = 0
      while (j < outDims) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
      f.copy(features = out)
    }
  }

  /** Perceptual hash over an opaque payload — the aHash/pHash shape on
    * the stub decode: pool byte values into 64 positional cells, set bit
    * j iff cell j's MEAN byte value exceeds the payload's global mean
    * (compared by integer cross-multiplication, so the signature is
    * integer-exact and platform-independent). A real implementation
    * swaps the byte pooling for decoded-pixel pooling (or a DCT) and
    * keeps everything else — the property that makes it perceptual is
    * LOCALITY: flipping k bytes can change at most the cells containing
    * them plus cells whose mean sits on the moved global threshold, so
    * near-identical payloads land at small Hamming distance while their
    * cryptographic digests diverge completely (pinned in LlmSpec).
    * Empty payloads hash to 0. Integer bound: the cell index is computed
    * in Long (i·64 overflows Int at 2^25-byte ≈ 33.5 MB payloads — the
    * index itself was the binding constraint, not the threshold compare),
    * and the cross-multiplication sums(j)·len ≤ 255·len² stays inside
    * Long for payloads < ~190 MB, which is now the true limit — far above
    * any CHUNKED media blob this pipeline shuffles; a real codec
    * integration re-pools decoded pixels per frame, where the same bound
    * holds per frame by construction.
    */
  def phash64(payload: Array[Byte]): Long = {
    val cells = 64
    if (payload.isEmpty) return 0L
    val sums = new Array[Long](cells)
    val cnts = new Array[Long](cells)
    var total = 0L
    var i = 0
    while (i < payload.length) {
      val j = (i.toLong * cells / payload.length).toInt
      val v = (payload(i) & 0xff).toLong
      sums(j) += v; cnts(j) += 1L; total += v
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < cells) {
      // mean(cell) > mean(payload) ⇔ sum_j · len > total · cnt_j
      if (cnts(j) > 0L && sums(j) * payload.length > total * cnts(j))
        h |= (1L << j)
      j += 1
    }
    h
  }

  val queries: Map[String, Q] = Map(

    // Binary-column metadata: byte length + fixed-size chunk count per
    // payload — the part of the pipeline that IS oracle-expressible.
    "q_mm_bytes" -> Q(
      s"""SELECT doc_id,
         |  cast(octet_length(cast(text as BLOB)) as bigint) AS byte_len,
         |  cast(ceil(octet_length(cast(text as BLOB)) / $chunkBytes.0) as bigint) AS n_chunks,
         |  lang AS media_kind
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      mediaTable(s, dir)
        .select(col("doc_id"),
          length(col("payload")).cast(LongType).as("byte_len"),
          ceil(length(col("payload")) / lit(chunkBytes.toDouble)).cast(LongType)
            .as("n_chunks"),
          col("media_kind"))
        .orderBy(col("doc_id"))
    },

    // Frame sampling, hash-gated: the Spark side counts what the REAL
    // decode → frameSample Dataset pipeline (mapPartitions, typed rows)
    // actually emitted per doc; the oracle derives the same counts from
    // byte arithmetic — ceil(bytes/chunk) chunks, every 4th kept
    // (0-based, so ceil(n_chunks/4)). Any drift in the chunking or
    // sampling plumbing breaks the hash.
    "q_mm_frames" -> Q(
      s"""SELECT doc_id,
         |  cast((octet_length(cast(text as BLOB)) + ${chunkBytes - 1}) // $chunkBytes as bigint)
         |    AS n_chunks,
         |  cast(((octet_length(cast(text as BLOB)) + ${chunkBytes - 1}) // $chunkBytes + 3) // 4 as bigint)
         |    AS n_sampled
         |FROM documents
         |WHERE octet_length(cast(text as BLOB)) > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val feats = decodeFeatures(mediaTable(s, dir))
      val total = feats.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"))
      val sampled = frameSample(feats, stride = 4).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"))
      total.join(sampled, "doc_id")
        .select(col("doc_id"), col("n_chunks"), col("n_sampled"))
        .orderBy(col("doc_id"))
    },

    // The full multimodal pipeline — decode → frame-sample(4) →
    // resize(8→4 stride-mean pooling) — hash-gated end to end: n_sampled
    // must equal the oracle's byte arithmetic, and resize_ok pins pooling
    // energy conservation. With inDims 8 → outDims 4 every output slot
    // pools exactly 2 inputs, so Σ(resized)·2·255 must equal the exact
    // byte sum of the SAMPLED chunks (every 4th) up to float32 error —
    // drift in chunking, sampling stride, pooling fan-in, or the
    // mean division all break the boolean.
    "q_mm_resize" -> Q(
      s"""SELECT doc_id,
         |  cast(((octet_length(cast(text as BLOB)) + ${chunkBytes - 1}) // $chunkBytes + 3) // 4 as bigint)
         |    AS n_sampled,
         |  TRUE AS resize_ok
         |FROM documents WHERE octet_length(cast(text as BLOB)) > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = mediaTable(s, dir)
      val sampledByteSums = media.select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .map { case (id, p) =>
          val sum = p.grouped(chunkBytes).zipWithIndex
            .filter(_._2 % 4 == 0)
            .map(_._1.foldLeft(0L)((a, b) => a + (b & 0xff))).sum
          (id, sum)
        }.toDF("doc_id", "byte_sum")
      resizeFeatures(frameSample(decodeFeatures(media), stride = 4), outDims = 4)
        .toDF()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(aggregate(col("features"), lit(0.0d), (acc, x) => acc + x))
            .as("feat_total"))
        .join(sampledByteSums, "doc_id")
        .select(col("doc_id"), col("n_sampled"),
          (abs(col("feat_total") * lit(2.0 * 255.0) - col("byte_sum")) <=
            col("byte_sum") * lit(0.001) + lit(1.0)).as("resize_ok"))
        .orderBy(col("doc_id"))
    },

    // Decoded-feature rollup (stub decode → per-doc aggregate), fully
    // hash-gated: n_chunks and total_bytes from the REAL Dataset decode
    // pipeline must equal the oracle's byte arithmetic (chunks partition
    // the payload, so Σ n_bytes == octet_length), and feat_ok pins energy
    // conservation — the stub spreads each byte/255 into one feature
    // slot, so Σ(all features)·255 must equal the exact byte sum up to
    // float32 accumulation error (tolerance 0.1% + 1, ~100× the worst
    // observed drift). MultimodalSpec pins chunk shape/determinism.
    "q_mm_features" -> Q(
      s"""SELECT doc_id,
         |  cast((octet_length(cast(text as BLOB)) + ${chunkBytes - 1}) // $chunkBytes as bigint)
         |    AS n_chunks,
         |  cast(octet_length(cast(text as BLOB)) as bigint) AS total_bytes,
         |  TRUE AS feat_ok
         |FROM documents WHERE octet_length(cast(text as BLOB)) > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = mediaTable(s, dir)
      val byteSums = media.select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .map { case (id, p) => (id, p.foldLeft(0L)((a, b) => a + (b & 0xff))) }
        .toDF("doc_id", "byte_sum")
      decodeFeatures(media).toDF()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_bytes")).cast(LongType).as("total_bytes"),
          sum(aggregate(col("features"), lit(0.0d), (acc, x) => acc + x))
            .as("feat_total"))
        .join(byteSums, "doc_id")
        .select(col("doc_id"), col("n_chunks"), col("total_bytes"),
          (abs(col("feat_total") * lit(255.0) - col("byte_sum")) <=
            col("byte_sum") * lit(0.001) + lit(1.0)).as("feat_ok"))
        .orderBy(col("doc_id"))
    },

    // Media-blob exact dedup audit (round 8 continuation): per media
    // kind, how many payloads are byte-identical copies — the digest
    // groupBy a multimodal ingest runs BEFORE any decode work (dedup on
    // the md5 of the raw BLOB skips the expensive codec path for every
    // copy; q_dup_rate_by_source is the text analog with normalization,
    // this is the binary-column form with none). One map-side-combinable
    // digest agg + a kind rollup; the ratio is HUGEINT/decimal(38,0)-
    // lifted floor-ppm. Works on any opaque binary column at any scale —
    // digests shuffle, payloads never do. The Spark side hashes the
    // BINARY payload; DuckDB's md5 is varchar-only, and since the stub
    // payload IS the utf8 text bytes, md5(text) is byte-identical (the
    // q_fingerprint precedent).
    "q_mm_dedup" -> Q(
      """WITH d AS (SELECT lang AS media_kind, md5(text) AS dig
        |           FROM documents),
        |g AS MATERIALIZED (
        |  SELECT media_kind, dig, cast(count(*) as bigint) AS c
        |  FROM d GROUP BY media_kind, dig)
        |SELECT media_kind, cast(sum(c) as bigint) AS n_blobs,
        |  cast(count(*) as bigint) AS n_distinct,
        |  cast((cast(1000000 as hugeint) * (sum(c) - count(*))) // sum(c)
        |       as bigint) AS dup_ppm
        |FROM g GROUP BY media_kind ORDER BY media_kind""".stripMargin) { (s, dir) =>
      mediaTable(s, dir)
        .select(col("media_kind"), md5(col("payload")).as("dig"))
        .groupBy(col("media_kind"), col("dig")).agg(count(lit(1)).as("c"))
        .groupBy(col("media_kind"))
        .agg(sum(col("c")).as("n_blobs"), count(lit(1)).as("n_distinct"))
        .select(col("media_kind"), col("n_blobs"), col("n_distinct"),
          expr("cast((cast(1000000 as decimal(38,0)) * (n_blobs - n_distinct))" +
            " div n_blobs as bigint)").as("dup_ppm"))
        .orderBy(col("media_kind"))
    },

    // Perceptual-hash signature pass (round 9): the near-dup step AFTER
    // q_mm_dedup's exact-digest screen — phash64 over every payload via
    // the real typed map pipeline. The signature itself is engine-local
    // (DuckDB can't fold bytes), so the gate uses the self-verifying
    // shape (CLAUDE.md ANN rule): exact per-kind blob/digest-group
    // counts hash-gate the plumbing, and two invariants the oracle pins
    // TRUE — byte-identical payloads MUST share one phash
    // (phash_consistent: max distinct phash per md5 group = 1) and the
    // perceptual partition can only be COARSER than the cryptographic
    // one (coarser_or_equal). The Hamming-locality property that makes
    // it perceptual is brute-force pinned in LlmSpec on mutated
    // payloads. Scale shape: one narrow map pass emits 8-byte
    // signatures; only (digest, phash) pairs shuffle, payloads never do.
    "q_mm_phash" -> Q(
      """WITH g AS MATERIALIZED (
        |  SELECT lang AS media_kind, md5(text) AS dig,
        |    cast(count(*) as bigint) AS c
        |  FROM documents GROUP BY 1, 2)
        |SELECT media_kind, cast(sum(c) as bigint) AS n_blobs,
        |  cast(count(*) as bigint) AS n_digest_groups,
        |  TRUE AS phash_consistent, TRUE AS coarser_or_equal
        |FROM g GROUP BY media_kind ORDER BY media_kind""".stripMargin) { (s, dir) =>
      import s.implicits._
      val m = mediaTable(s, dir)
      val ph = m.select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) => (id, phash64(p)) })
        .toDF("doc_id", "phash")
      val j = m.select(col("doc_id"), col("media_kind"),
          md5(col("payload")).as("dig"))
        .join(ph, "doc_id")
      val perDig = j.groupBy(col("media_kind"), col("dig"))
        .agg(countDistinct(col("phash")).as("nph"), count(lit(1)).as("c"))
      val perKind = perDig.groupBy(col("media_kind"))
        .agg(sum(col("c")).as("n_blobs"),
          count(lit(1)).as("n_digest_groups"),
          max(col("nph")).as("max_nph"))
      val phGroups = j.groupBy(col("media_kind"))
        .agg(countDistinct(col("phash")).as("n_ph"))
      perKind.join(phGroups, "media_kind")
        .select(col("media_kind"), col("n_blobs"), col("n_digest_groups"),
          (col("max_nph") === 1L).as("phash_consistent"),
          (col("n_ph") <= col("n_digest_groups")).as("coarser_or_equal"))
        .orderBy(col("media_kind"))
    }
  )
}
