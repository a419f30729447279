package graft.operators

import graft.SparkSpec
import graft.functions.JaroWinkler
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinkler kernel matches the DuckDB-pinned fixtures") {
    // every value below was read straight out of DuckDB's
    // jaro_winkler_similarity — the oracle engine the d18 query compares
    // against — so the pin is to the real oracle, not to a paper formula
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "") == 0.0) // DuckDB: both-empty is 0, not 1
    assert(jw("abc", "abc") == 1.0)
    assert(jw("ab", "ba") == 0.0)              // window 0: no cross match
    assert(math.abs(jw("ax", "ay") - 2.0 / 3) < 1e-15) // jaro <= 0.7: no boost
    assert(math.abs(jw("aaaaab", "aaaaac") - 0.9333333333333333) < 1e-15) // prefix cap 4
    assert(math.abs(jw("héllo", "hello") - 0.8400000000000001) < 1e-13)
    // byte-based like DuckDB: é is 2 UTF-8 bytes, so jaro(6,5 bytes) =
    // (4/6+4/5+1)/3 = 0.8222…, boosted by the 1-byte 'h' common prefix
    // (é's first byte 0xC3 != 'e') to 0.8222 + 0.1·0.1778 = 0.84
  }

  test("recordLinkage links prefix-similar docs through slice blocking") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away"),
      (2L, "the quick brown fox jumps over the hazy dog and runs away"), // 1 edit, char 36 — key identical!
      (3L, "the quick brawn fox jumps over the lazy dog"),               // edit inside slot 1
      (4L, "completely different text with no shared prefix at all"),
      (5L, "the quick brown cat naps under the warm sun every day")      // shares slots 0-1, diverges after
    ).toDF("doc_id", "text")
    val got = Dedup.recordLinkage(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jw")).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 1.0) // keys equal within 32 chars
    assert(got.contains((1L, 3L)) && got((1L, 3L)) >= 0.9) // blocked via unedited slots
    assert(got.keySet.flatMap(p => Set(p._1, p._2)).forall(_ != 4L))
    // every emitted pair is ordered and at/above threshold
    got.foreach { case ((a, b), v) => assert(a < b && v >= 0.9) }
  }

  test("recordLinkage count-gate drops a degenerate hot slice bucket") {
    // 30 docs share every slice (identical 32-char prefix); maxBucket = 10
    // must drop ALL their buckets -> no pairs survive, instead of 435
    val hot = (1L to 30L).map(i => (i, s"identical thirty-two char prefix!! unique tail $i"))
      .toDF("doc_id", "text")
    val gated = Dedup.recordLinkage(hot, "doc_id", "text", maxBucket = Some(10))
    assert(gated.count() == 0L)
    val exact = Dedup.recordLinkage(hot, "doc_id", "text", maxBucket = None)
    assert(exact.count() == 30L * 29 / 2) // exact contract recovers every pair
  }

  test("resolveEntities closes the pair graph transitively, labels singletons, flags min-id canonical") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away"),
      (2L, "the quick brown fox jumps over the hazy dog and runs away"), // links to 1
      (3L, "the quick brawn fox jumps over the lazy dog"),               // links to 1 (and 2)
      (4L, "completely different text with no shared prefix at all"),    // singleton
      (9L, "xz qq ww ee rr tt yy uu ii oo pp")                           // singleton
    ).toDF("doc_id", "text")
    val got = Dedup.resolveEntities(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("entity_id"), r.getAs[Long]("entity_size"),
          r.getAs[Int]("is_canonical"))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 9L)) // every doc labeled
    assert(got(1L) == ((1L, 3L, 1)))              // min id is canonical
    assert(got(2L) == ((1L, 3L, 0)))
    assert(got(3L) == ((1L, 3L, 0)))              // transitive even if only pairwise-linked via 1
    assert(got(4L) == ((4L, 1L, 1)))              // singleton = own entity, canonical
    assert(got(9L) == ((9L, 1L, 1)))
  }

  test("materializeLinkage persists the pair graph; closure from the artifact matches live") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away"),
      (2L, "the quick brown fox jumps over the hazy dog and runs away"),
      (4L, "completely different text with no shared prefix at all")
    ).toDF("doc_id", "text")
    val store = graft.chain.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-linkage").toString)
    val artifact = Dedup.materializeLinkage(store, docs, "doc_id", "text")
    // the artifact plan is a parquet scan, not a re-blocking pass
    assert(artifact.queryExecution.executedPlan.toString.contains("FileScan parquet"))
    val fromArtifact = Dedup.resolveEntitiesFromPairs(docs, artifact, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted.toSeq
    val live = Dedup.resolveEntities(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted.toSeq
    assert(fromArtifact == live)
    assert(fromArtifact.map(_._2).toSet == Set(1L, 4L)) // {1,2} entity + singleton
  }

  test("recordLinkage strips non-ASCII from keys so byte and char views agree") {
    // both docs carry é at the SAME position, so the strip shifts both keys
    // identically and the slice blocking still aligns; the resulting
    // 31-byte pure-ASCII keys differ only in "morn"/"even", giving
    // jw = 29/31 + 4·0.1·(2/31) = 29.8/31 exactly (computable because the
    // stripped keys are ASCII, where bytes == chars)
    val docs = Seq(
      (1L, "café con leche menu for the morning crowd"),
      (2L, "café con leche menu for the evening crowd")
    ).toDF("doc_id", "text")
    val got = Dedup.recordLinkage(docs, "doc_id", "text").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Double]("jw") == math.rint(29.8 / 31 * 1e6) / 1e6)
  }
}
