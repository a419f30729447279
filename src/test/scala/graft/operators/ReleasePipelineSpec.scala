package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed data-release DAG (r11). The per-stage semantics are each
  * oracle-checked alone; what THIS spec pins is what only composition can
  * catch:
  *   - the single-tokenization contract (no stage re-tokenizes text a
  *     prior stage already tokenized — counted at plan-build time via
  *     TextOps.tokenizeSites);
  *   - cross-stage set invariants on a real corpus slice (released ⊆
  *     canonical ⊆ survivors, no exact-duplicate canon text among
  *     released, no eval docs released, per-shard positions dense).
  */
class ReleasePipelineSpec extends SparkSpec {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("the composed build tokenizes each distinct working string exactly once") {
    val before = TextOps.tokenizeSites.get()
    val df = Release.releasePipeline(docs)
    val sites = TextOps.tokenizeSites.get() - before
    // exactly 3 tokenization sites in the whole DAG: the Gopher fixture
    // text (stage 1), the canonical working text (stage 2 — the ONLY
    // tokenization the dedup/decontamination/mixture stages consume), and
    // the eval slice (stage 5). C4 splits lines, not tokens. A 4th site
    // means some stage re-tokenized what its predecessor already carried.
    assert(sites == 3L, s"expected 3 tokenization sites, the build created $sites")
    assert(df.columns.toSeq ==
      Seq("doc_id", "source", "n_tokens", "weight", "alloc_tokens", "shard", "pos"))
  }

  test("stage invariants hold end-to-end on the sf0.001 corpus") {
    val rel = Release.releasePipeline(docs).cache()
    try {
      val n = rel.count()
      assert(n > 0, "the release must keep a non-empty corpus")
      // no eval docs released
      assert(rel.filter(col("source") === "src0").count() == 0L)
      // released ids are unique
      assert(rel.select("doc_id").distinct().count() == n)
      // per-shard positions are dense 0..k-1 (the write shape's contract)
      val bad = rel.groupBy("shard")
        .agg(count(lit(1)).as("k"), max("pos").as("mx"), min("pos").as("mn"))
        .filter(col("mx") =!= col("k") - 1 || col("mn") =!= 0L)
        .count()
      assert(bad == 0L, "positions within a shard must be dense from 0")
      // the allocation never exceeds the 4-epoch cap: alloc ≤ 4 × stratum mass
      val overCap = rel.groupBy("source")
        .agg(sum("n_tokens").as("mass"), first("alloc_tokens").as("alloc"))
        .filter(col("alloc") > col("mass") * 4)
        .count()
      assert(overCap == 0L, "epoch cap must bound every stratum's allocation")
      // no two released docs share a canonical fingerprint (exact-dedup
      // survived composition: canon text of released docs is unique)
      val canon = Curation.robustCanonicalize(
        docs.join(rel.select("doc_id"), Seq("doc_id"), "left_semi"),
        "doc_id", "text")
      val dup = canon.groupBy("canon_md5").count().filter(col("count") > 1).count()
      assert(dup == 0L, "released docs must have pairwise-distinct canonical text")
    } finally { rel.unpersist(); () }
  }
}
