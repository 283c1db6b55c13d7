package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 C): images/audio/video are
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batched per partition. The real codec is
  * deliberately a deterministic STUB (`StubDecoder`) — the container
  * has no image/audio libraries — but everything Spark-side is real:
  * schema, binary columns, partition-sized batching, executor-local
  * decode, typed output rows. Swapping `StubDecoder.decode` for a
  * JNI/javacpp codec changes nothing else.
  */
object Multimodal {

  /** typed record for a decoded media asset */
  case class MediaMeta(record_id: Long, media_type: String, nbytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: String)

  /** typed record for one extracted frame/sample */
  case class Frame(record_id: Long, frame_idx: Int, frame_bytes: Int,
      feature: Array[Float])

  /** Deterministic stand-in for an image/audio codec: derives shape
    * and features from the bytes' md5, so outputs are stable across
    * runs/engines. Marked clearly as the swap point for a real codec. */
  object StubDecoder {
    def md5Hex(bytes: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      d.map("%02x".format(_)).mkString
    }
    /** STUB: a real implementation would parse the container format. */
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val h = md5Hex(bytes)
      val w = 16 + Integer.parseInt(h.substring(0, 2), 16) % 240
      val ht = 16 + Integer.parseInt(h.substring(2, 4), 16) % 240
      val f = 1 + Integer.parseInt(h.substring(4, 6), 16) % 8
      (w, ht, f)
    }
    /** STUB feature extractor: 8 floats from the digest. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val h = md5Hex(bytes)
      (0 until 8).map(i =>
        Integer.parseInt(h.substring(i * 4, i * 4 + 4), 16) / 65535.0f).toArray
    }
  }

  /** Attach a synthetic binary payload column (documents stand in for
    * media blobs in the test corpus). */
  def asBinary(df: DataFrame, id: String, payload: String): DataFrame =
    df.select(col(id).cast("long").as("record_id"),
      col(payload).cast("binary").as("payload"),
      lit("application/octet-stream").as("media_type"))

  /** Batched executor-local decode: one `mapPartitions` pass, no
    * shuffle; output is a typed Dataset. */
  /** NULL payloads decode as empty (zero bytes, md5 of nothing) — a
    * degenerate row must never NPE an executor-side decode pass. (A
    * SQL oracle sees md5(NULL)=NULL instead; the test corpus carries
    * no NULLs, and the no-crash guarantee is the production contract.) */
  private def payloadBytes(r: org.apache.spark.sql.Row): Array[Byte] =
    Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)

  def decodeMeta(binDf: DataFrame): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    binDf.select("record_id", "payload", "media_type").mapPartitions { rows =>
      rows.map { r =>
        val bytes = payloadBytes(r)
        val (w, h, f) = StubDecoder.decode(bytes)
        MediaMeta(r.getAs[Long]("record_id"), r.getAs[String]("media_type"),
          bytes.length.toLong, w, h, f, StubDecoder.md5Hex(bytes))
      }
    }
  }

  /** typed record for a resized asset */
  case class Resized(record_id: Long, width: Int, height: Int,
      new_width: Int, new_height: Int, resized_bytes: Long, checksum: String)

  /** Resize-to-fit: scale each asset into a maxDim×maxDim box
    * preserving aspect ratio, never upscaling — the thumbnail /
    * model-input-normalization pass of an image pipeline. All
    * arithmetic is integer (floor division), so the oracle reproduces
    * the target dims exactly; the payload "resize" is the stub step
    * (byte budget scales with pixel count, bytes truncated to it) and
    * the checksum of the resized payload is value-checked digit-level
    * like m3's decode. Partition-local, no shuffle. */
  def resize(binDf: DataFrame, maxDim: Int = 64): Dataset[Resized] = {
    implicit val enc = Encoders.product[Resized]
    binDf.select("record_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val bytes = payloadBytes(r)
        val (w, h, _) = StubDecoder.decode(bytes)
        val m = math.max(w, h)
        val (nw, nh) =
          if (m <= maxDim) (w, h)
          else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
        val rb = math.max(1L,
          bytes.length.toLong * nw * nh / (w.toLong * h))
        Resized(r.getAs[Long]("record_id"), w, h, nw, nh, rb,
          StubDecoder.md5Hex(bytes.take(rb.toInt)))
      }
    }
  }

  /** Perceptual-hash near-dup signature for binary payloads: each
    * 256-byte chunk votes the first 32 bits (8 leading hex digits) of
    * its digest; the per-bit MAJORITY over chunks is the record's
    * signature. Payloads
    * differing in a minority of chunks (re-encoded tail, small patch,
    * appended metadata) still land on equal-or-near signatures, while
    * unrelated payloads differ in ~16 of 32 bits — the image/video
    * near-dup analogue of SimHash, with "feature = chunk digest"
    * standing in for DCT coefficients (swap the feature, keep the
    * plumbing, like [[StubDecoder]]).
    *
    * Shape at scale: explodes |chunks| narrow rows (one md5 + 8 small
    * ints each — never payloads), partial-aggregates the 32 bit-votes
    * per record. Linear in corpus bytes, one narrow shuffle.
    *
    * TOTAL over the input: the chunk count is coalesced so a NULL or
    * empty payload still explodes one row (NULL digest → zero votes →
    * phash 0) — explicitly, not via greatest()'s skip-NULL behavior,
    * so a degenerate row can never silently vanish from the
    * signature table. */
  /** `bits` (default 32, max 60, multiple of 4): signature width. The
    * WIDTH is the near-dup blocking's scale lever — [[phashNearDups]]
    * cuts the signature into 4 pigeonhole bands, so bucket count per
    * band is 2^(bits/4): at 32 bits that is a FIXED 256 buckets
    * (measured quadratic at sf1, r=27 — the d5 trap in multimodal
    * clothing), at 60 bits it is 32768. Grow bits with log₂|corpus|
    * exactly like [[graft.operators.Similarity.corpusBits]]; 60 is
    * the cap because bit 59 is the last that sums into a BIGINT
    * identically on every engine. */
  def phash(binDf: DataFrame, bits: Int = 32): DataFrame = {
    require(bits % 4 == 0 && bits >= 8 && bits <= 60,
      "phash width must be a multiple of 4 in [8, 60]")
    val chunks = binDf.select(col("record_id"),
      explode(sequence(lit(0),
        greatest((ceil(coalesce(octet_length(col("payload")), lit(0)) / 256.0)
          - 1).cast("int"), lit(0)))).as("ci"),
      col("payload"))
      .select(col("record_id"),
        md5(expr("substring(payload, ci * 256 + 1, 256)")).as("hx"))
    val digits = chunks.select(col("record_id") +:
      (0 until bits / 4).map(i =>
        expr(s"instr('0123456789abcdef', substr(hx, ${i + 1}, 1)) - 1")
          .as(s"d$i")): _*)
    val sums = (0 until bits).map { b =>
      expr(s"sum(((d${b / 4} div ${1 << (b % 4)}) % 2) * 2 - 1)").as(s"s$b")
    }
    digits.groupBy(col("record_id")).agg(sums.head, sums.tail: _*)
      .select(col("record_id"),
        (0 until bits).map(b =>
          when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
          .as("phash"))
  }

  /** Perceptual-hash near-dup pairs — the multimodal dedup step over
    * [[phash]]'s 32-bit signatures: two payloads are near-dups when
    * their signatures differ in at most `maxDist` bits. Candidates
    * come from 4 byte-band buckets (pigeonhole: Hamming ≤ 3 ⇒ at
    * least one of 4 bands EQUAL, so for maxDist ≤ 3 the blocking is
    * EXACT — every qualifying pair is found, not sampled); each
    * candidate is verified by the true popcount of the XOR. Scale
    * shape is d11's: band equi-join over narrow (id, sig, band) rows,
    * Σ|bucket|² bounded by signature entropy, never payloads; the
    * verify is one integer op. */
  /** band-colliding candidate pairs with their EXACT Hamming
    * distance — [[phashNearDups]]' candidate stage, exposed because
    * it is the value-checkable artifact (sig construction + banding +
    * popcount all observable even when no pair clears the near-dup
    * threshold, as on a corpus with no payload-level dups). */
  def phashCandidates(sigs: DataFrame, bits: Int = 32): DataFrame = {
    require(bits % 4 == 0 && bits <= 60, "bits must match the phash width")
    // integer `div`, not double division: a 60-bit signature does not
    // round-trip through a double (2^53 mantissa), so floor(x / 2^45)
    // could land one bucket off near boundaries
    val bw = bits / 4
    val banded = sigs.select(col("record_id"), col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("b"),
          pmod(expr(s"phash div ${1L << (bw * b)}"), lit(1L << bw))
            .as("bv"))): _*)).as("bb"))
      .select(col("record_id"), col("phash"),
        col("bb.b").as("b"), col("bb.bv").as("bv"))
    val l = banded.select(col("record_id").as("r1"), col("phash").as("s1"),
      col("b"), col("bv"))
    val r = banded.select(col("record_id").as("r2"), col("phash").as("s2"),
      col("b"), col("bv"))
    l.join(r, Seq("b", "bv")).filter(col("r1") < col("r2"))
      .select(col("r1"), col("r2"), col("s1"), col("s2"))
      .dropDuplicates("r1", "r2")
      .select(col("r1"), col("r2"),
        expr("bit_count(s1 ^ s2)").cast("long").as("dist"))
  }

  def phashNearDups(sigs: DataFrame, maxDist: Int = 3,
      bits: Int = 32): DataFrame = {
    require(maxDist <= 3, "4-band pigeonhole is exact only for maxDist <= 3")
    phashCandidates(sigs, bits).filter(col("dist") <= maxDist)
  }

  /** Frame/sample extraction: explode each asset into its (stub)
    * frames with a per-frame feature vector. Partition-local. */
  def sampleFrames(binDf: DataFrame, stride: Int = 256): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    binDf.select("record_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = payloadBytes(r)
        val id = r.getAs[Long]("record_id")
        bytes.grouped(stride).zipWithIndex.map { case (chunk, i) =>
          Frame(id, i, chunk.length, StubDecoder.features(chunk))
        }
      }
    }
  }
}
