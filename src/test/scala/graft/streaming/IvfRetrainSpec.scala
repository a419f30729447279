package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.chain.TableStore
import org.apache.spark.sql.functions._

/** The quantizer-maintenance loop: drift detection → sampled Lloyd
  * re-training → recall-gated staged swap, plus the crashed-swap
  * convergence path. Fixture: two well-separated 2-D clusters (A around
  * angle 0, B around angle π/2) under a DRIFTED quantizer whose two
  * centroids both point into cluster A — cluster A splits across both
  * cells while all of B lumps into one, exactly the imbalance signature
  * a drifted index shows.
  */
class IvfRetrainSpec extends SparkSpec {
  import spark.implicits._

  // A: ids 0-9, angles 0.00..0.18; B: ids 10-19, angles ~π/2..π/2+0.18
  private def vec(angle: Double) = Array(math.cos(angle).toFloat, math.sin(angle).toFloat)
  private def corpus = (
    (0L until 10L).map(i => (i, vec(0.02 * i))) ++
    (10L until 20L).map(i => (i, vec(math.Pi / 2 + 0.02 * (i - 10))))
  ).toDF("vec_id", "embedding")

  // both centroids inside cluster A's fan: A splits 5/5, B all → 101
  private def badCents = Seq(
    (100L, vec(0.0)), (101L, vec(0.09))).toDF("vec_id", "embedding")

  private def freshStore(): TableStore =
    TableStore(spark, Files.createTempDirectory("graft-retrain").toString)

  private def seed(store: TableStore): Unit = {
    store.replace(IvfRetrain.CentroidsTable, badCents)
    StreamingSimilarity.processEmbeddingBatch(store, badCents)(corpus, 0L)
  }

  test("drift → retrain → recall-checked swap, then steady-state no-op") {
    val store = freshStore()
    seed(store)
    val (n0, cells0, imb0) = IvfRetrain.imbalance(store.readOr(IvfRetrain.PostingsTable, null))
    assert(n0 == 20L && cells0 == 2L)
    assert(imb0 > 1.4, s"the drifted quantizer must show imbalance, got $imb0")

    val rep = IvfRetrain.maybeRetrain(spark, store,
      threshold = 1.4, rounds = 3, samplePermille = 1000,
      nProbes = 8, k = 5, nProbe = 1, auditPermille = 1000)
    assert(rep.triggered && rep.swapped, s"drift must trigger a swap: $rep")
    // the recall gate held: the swapped quantizer grades no worse
    assert(rep.recallAfter.get >= rep.recallBefore.get,
      s"recall must not drop across the swap: $rep")

    // the index re-balanced: A and B each own a cell
    val postings = store.readOr(IvfRetrain.PostingsTable, null)
    val (n1, cells1, imb1) = IvfRetrain.imbalance(postings)
    assert(n1 == 20L && cells1 == 2L, "the rebuild must preserve every vector")
    assert(imb1 < imb0 && imb1 <= 1.4, s"retraining must rebalance the cells: $imb1")
    // the pair is consistent and the layout still partition-prunes
    val cents = store.readOr(IvfRetrain.CentroidsTable, null)
    assert(IvfRetrain.consistent(postings, cents, auditPermille = 1000))
    assert(postings.filter(col("centroid_id") === 100L).count() > 0L)

    // steady state: the next check is a no-op (no drift, consistent)
    val rep2 = IvfRetrain.maybeRetrain(spark, store,
      threshold = 1.4, rounds = 3, samplePermille = 1000,
      nProbes = 8, k = 5, nProbe = 1, auditPermille = 1000)
    assert(!rep2.triggered && !rep2.swapped, s"steady state must not retrain: $rep2")

    // and the maintained index answers through the streaming query face
    val probes = Seq((0L, vec(0.01))).toDF("vec_id", "embedding")
    val res = StreamingSimilarity.ivfTopKFromPostings(store, probes, cents,
      "vec_id", "embedding", k = 5, nProbe = 1)
    assert(res.count() == 5L)
  }

  test("a crashed swap (new centroids over stale postings) converges on the next check") {
    val store = freshStore()
    seed(store)
    // retrain to a consistent steady state first
    IvfRetrain.maybeRetrain(spark, store, threshold = 1.4, rounds = 3,
      samplePermille = 1000, nProbes = 8, k = 5, nProbe = 1, auditPermille = 1000)
    // simulate the crash window: centroids promoted, postings not — swap
    // the two centroid embeddings so every posting's assignment is stale
    val cents = store.readOr(IvfRetrain.CentroidsTable, null)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val crossed = Seq((cents(0)._1, cents(1)._2), (cents(1)._1, cents(0)._2))
      .toDF("vec_id", "embedding")
    store.replace(IvfRetrain.CentroidsTable, crossed)
    val postings = store.readOr(IvfRetrain.PostingsTable, null)
    assert(!IvfRetrain.consistent(postings, crossed, auditPermille = 1000),
      "the crashed pair must read as inconsistent")
    // imbalance is FINE (cells unchanged) — only the consistency audit
    // can see this state, and it must force an unconditional rebuild
    val rep = IvfRetrain.maybeRetrain(spark, store,
      threshold = 1.4, rounds = 2, samplePermille = 1000,
      nProbes = 8, k = 5, nProbe = 1, auditPermille = 1000)
    assert(rep.triggered && rep.swapped, s"a crashed pair must rebuild: $rep")
    assert(IvfRetrain.consistent(
      store.readOr(IvfRetrain.PostingsTable, null),
      store.readOr(IvfRetrain.CentroidsTable, null), auditPermille = 1000))
  }

  test("total collapse — ALL mass in ONE cell — still triggers") {
    // one centroid inside cluster A, the other pointing away from every
    // vector: the whole corpus assigns to cell 100 and cell 101 is EMPTY.
    // Over occupied cells this reads imbalance = 1.0 (perfectly balanced);
    // the centroid-count denominator reads |centroids| = 2.0 — the trigger
    // must fire on exactly this state.
    val store = freshStore()
    val collapsed = Seq((100L, vec(0.0)), (101L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    store.replace(IvfRetrain.CentroidsTable, collapsed)
    val aOnly = (0L until 10L).map(i => (i, vec(0.02 * i))).toDF("vec_id", "embedding")
    StreamingSimilarity.processEmbeddingBatch(store, collapsed)(aOnly, 0L)
    val postings = store.readOr(IvfRetrain.PostingsTable, null)
    val (_, occupied, occImb) = IvfRetrain.imbalance(postings)
    assert(occupied == 1L && occImb == 1.0,
      "the occupied-cell metric is blind to collapse — that is the point of the fixture")
    val (_, _, imb) = IvfRetrain.imbalance(postings, Some(2L))
    assert(imb == 2.0, s"empty cells must drag the mean down: $imb")
    val rep = IvfRetrain.maybeRetrain(spark, store,
      threshold = 1.5, rounds = 2, samplePermille = 1000,
      nProbes = 8, k = 5, nProbe = 1, auditPermille = 1000)
    assert(rep.triggered, s"a collapsed quantizer must trigger maintenance: $rep")
  }

  test("an empty audit sample falls back to a full audit, not a vacuous pass") {
    val store = freshStore()
    seed(store)
    IvfRetrain.maybeRetrain(spark, store, threshold = 1.4, rounds = 2,
      samplePermille = 1000, nProbes = 8, k = 5, nProbe = 1, auditPermille = 1000)
    // cross the centroid embeddings: every posting's assignment is stale
    val cents = store.readOr(IvfRetrain.CentroidsTable, null)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val crossed = Seq((cents(0)._1, cents(1)._2), (cents(1)._1, cents(0)._2))
      .toDF("vec_id", "embedding")
    val postings = store.readOr(IvfRetrain.PostingsTable, null)
    // auditPermille = 0 selects zero rows — the old code reported the
    // crashed pair CONSISTENT (misassigned == 0 over an empty sample)
    assert(!IvfRetrain.consistent(postings, crossed, auditPermille = 0),
      "an empty sample must not grade a crashed pair consistent")
  }

  test("a rebuild dedups vec_ids a crashed replay double-landed") {
    val store = freshStore()
    seed(store)
    IvfRetrain.maybeRetrain(spark, store, threshold = 1.4, rounds = 2,
      samplePermille = 1000, nProbes = 8, k = 5, nProbe = 1, auditPermille = 1000)
    // simulate the crash+replay window: vec_id 0 lands a SECOND copy under
    // the other cell (the replay's anti-join probed only its new-cid
    // partitions, missing the first copy)
    val postings0 = store.readOr(IvfRetrain.PostingsTable, null).localCheckpoint(true)
    val cids = postings0.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val cid0 = postings0.filter(col("vec_id") === 0L)
      .collect().head.getAs[Long]("centroid_id")
    val otherCid = cids.find(_ != cid0).get
    store.appendPartitioned(IvfRetrain.PostingsTable,
      postings0.filter(col("vec_id") === 0L)
        .withColumn("centroid_id", lit(otherCid)),
      "centroid_id")
    val withDup = store.readOr(IvfRetrain.PostingsTable, null)
    assert(withDup.count() == 21L, "the fixture must hold the duplicate")
    // the duplicate sits in the wrong cell → the audit reads inconsistent
    // → unconditional rebuild; the rebuilt index must carry each vec_id once
    val rep = IvfRetrain.maybeRetrain(spark, store,
      threshold = 1.4, rounds = 2, samplePermille = 1000,
      nProbes = 8, k = 5, nProbe = 1, auditPermille = 1000)
    assert(rep.triggered && rep.swapped, s"the inconsistent pair must rebuild: $rep")
    val rebuilt = store.readOr(IvfRetrain.PostingsTable, null)
    assert(rebuilt.count() == 20L &&
      rebuilt.select("vec_id").distinct().count() == 20L,
      "the rebuild must bake in each vec_id exactly once")
  }

  test("lloydRounds reseeds empty cells by holding position") {
    // one centroid far from every vector: it gets no members and must
    // keep its coordinates instead of becoming null/NaN
    val cents = Seq((100L, vec(0.0)), (101L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val vecs = (0L until 6L).map(i => (i, vec(0.02 * i))).toDF("vec_id", "embedding")
    val out = IvfRetrain.lloydRounds(vecs, cents, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(out(101L).sameElements(Array(-1.0f, 0.0f)), "empty cell must hold position")
    assert(math.abs(out(100L)(0) - 1.0f) < 0.01f, "occupied cell must move to its mean")
  }
}
