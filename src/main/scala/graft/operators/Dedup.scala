package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, from exact to
  * near-duplicate. Scale design notes:
  *   - exact dedup is a single hash aggregation on the fingerprint (one
  *     shuffle, map-side partial);
  *   - MinHash/SimHash candidate generation is LSH-keyed: pairs meet only
  *     inside a band/chunk bucket, so the shuffle is on bucket keys and the
  *     quadratic blow-up is bounded per bucket — the all-pairs cross join
  *     never materializes;
  *   - verification (exact Jaccard / Hamming) runs only on candidates.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id representative per normalized text.
    * Aggregation (not window) so map-side combine kicks in — at 100 TB the
    * reducer sees one row per distinct fingerprint, not per document.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", TextOps.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Exact duplicate groups (fingerprint, members>1). */
  def duplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", TextOps.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))
      .filter(col("n_copies") > 1)

  // ---- MinHash + LSH --------------------------------------------------

  /** Deterministic universal-hash parameters (a·x + b mod p). Fixed rather
    * than seeded at runtime so signatures are reproducible run-to-run.
    * p = 2^31−1 keeps a·x < 2^62 — no long overflow under ANSI mode.
    */
  private val MersennePrime = (1L << 31) - 1
  private def hashA(i: Int): Long = {
    var x = 0x9E3779B97F4A7C15L * (i + 1)
    x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29
    (x & Long.MaxValue) % (MersennePrime - 1) + 1
  }
  private def hashB(i: Int): Long = {
    var x = 0xC2B2AE3D27D4EB4FL * (i + 1)
    x ^= x >>> 31; x *= 0x94D049BB133111EBL; x ^= x >>> 27
    (x & Long.MaxValue) % MersennePrime
  }

  /** MinHash signature as `numHashes` columns computed in ONE aggregation
    * over exploded (doc, shingle-hash) rows: min(a_i·h + b_i mod p) per i.
    * No UDAF, no per-row arrays — 64 codegen'd min aggregates.
    */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int, numHashes: Int): DataFrame = {
    val shingled = df
      .select(col(idCol), explode(TextOps.shingles(col(textCol), shingleSize)).as("__sh"))
      .withColumn("__h", pmod(xxhash64(col("__sh")), lit(MersennePrime)))
    val minExprs = (0 until numHashes).map { i =>
      min(pmod(col("__h") * lit(hashA(i)) + lit(hashB(i)), lit(MersennePrime))).as(s"mh_$i")
    }
    shingled.groupBy(col(idCol)).agg(minExprs.head, minExprs.tail: _*)
  }

  /** LSH banding: signature columns → (band, bandHash) rows. Docs sharing a
    * band hash are candidate near-duplicates. bandsize r = numHashes/bands.
    */
  def lshBands(sigs: DataFrame, idCol: String, numHashes: Int, bands: Int): DataFrame = {
    val r = numHashes / bands
    require(r * bands == numHashes, "bands must divide numHashes")
    val bandRows = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"mh_$i"))
      sigs.select(col(idCol), lit(b).as("band"), xxhash64(cols: _*).as("band_hash"))
    }
    bandRows.reduce(_.unionByName(_))
  }

  /** Candidate pairs from shared LSH bands: self-join keyed on
    * (band, band_hash) — the shuffle key is the bucket, never all-pairs.
    */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val l = bands.select(col("band"), col("band_hash"), col(idCol).as("id_a"))
    val r = bands.select(col("band"), col("band_hash"), col(idCol).as("id_b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact word-set Jaccard for given pairs, via explode + equi-joins and
    * integer counts (|A∩B|, |A|, |B|) — no floating point until the final
    * ratio, and only candidates are verified.
    */
  def verifyJaccard(df: DataFrame, pairs: DataFrame, idCol: String, textCol: String,
                    shingleSize: Int): DataFrame = {
    val sets = df.select(col(idCol).as("__vid"),
      array_distinct(TextOps.shingles(col(textCol), shingleSize)).as("__set"))
    val sized = sets.select(col("__vid"), col("__set"), size(col("__set")).as("__sz"))
    val a = sized.select(col("__vid").as("id_a"), col("__set").as("set_a"), col("__sz").as("sz_a"))
    val b = sized.select(col("__vid").as("id_b"), col("__set").as("set_b"), col("__sz").as("sz_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        (col("inter").cast("double") / col("uni").cast("double")).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate
    * → exact-verify ≥ threshold.
    */
  def minHashLshNearDups(df: DataFrame, idCol: String, textCol: String,
                         shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
                         threshold: Double = 0.8): DataFrame = {
    val sigs  = minHashSignatures(df, idCol, textCol, shingleSize, numHashes)
    val cands = candidatePairs(lshBands(sigs, idCol, numHashes, bands), idCol)
    verifyJaccard(df, cands, idCol, textCol, shingleSize).filter(col("jaccard") >= threshold)
  }

  // ---- SimHash ---------------------------------------------------------

  /** 64-bit SimHash per document: one aggregation with 64 conditional sums
    * over exploded token hashes; bit j is set when the weighted bit-sum is
    * non-negative.
    */
  def simHash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toked = df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    val bitSums = (0 until 64).map { j =>
      sum(when(col("__h").bitwiseAND(lit(1L << j)) =!= 0L, 1).otherwise(-1)).as(s"bs_$j")
    }
    val agged = toked.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 64).map { j =>
      when(col(s"bs_$j") >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agged.select(col(idCol), hash.as("simhash"))
  }

  /** SimHash near-dups: candidates share one of four 16-bit chunks (any
    * pair within Hamming distance 3 must agree on ≥1 chunk — pigeonhole),
    * verified by exact Hamming distance via bit_count(xor).
    */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val hashed = simHash64(df, idCol, textCol)
    val chunked = (0 until 4).map { c =>
      hashed.select(col(idCol), lit(c).as("chunk"),
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("chunk_val"),
        col("simhash"))
    }.reduce(_.unionByName(_))
    val l = chunked.select(col("chunk"), col("chunk_val"), col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val r = chunked.select(col("chunk"), col("chunk_val"), col(idCol).as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ---- Embedding near-dup ----------------------------------------------

  /** Embedding-cosine near-dup: LSH-bucketed candidate pairs above a cosine
    * threshold (reuses the similarity LSH; the quadratic check stays inside
    * buckets).
    */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                     nPlanes: Int = 8, threshold: Double = 0.95): DataFrame = {
    val bucketed = df.withColumn("__bucket", Similarity.lshBucket(col(vecCol), dim, nPlanes))
    val l = bucketed.select(col("__bucket"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val r = bucketed.select(col("__bucket"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    l.join(r, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(Similarity.cosine(col("vec_a"), col("vec_b")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
      .distinct()
  }
}
