package graft.chain

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The object-store (rename-free) commit mode: data lands in immutable
  * hidden dirs, an immutable per-version manifest lists the live ones,
  * and the commit point is one overwrite of the tiny `.gen` marker. These
  * tests pin the crash windows that mode exists for — no directory is
  * ever renamed, so every interrupted mutation must leave the previous
  * generation fully readable and converge on the next commit.
  */
class ManifestStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(bucketSize: Long = 10L): TableStore =
    TableStore(spark, Files.createTempDirectory("graft-man").toString,
      bucketSize, manifestCommit = true)

  private def rows(store: TableStore, table: String): Seq[Long] =
    store.readOr(table, null).select("n").collect().map(_.getLong(0)).sorted.toSeq

  private def ls(store: TableStore, table: String): Seq[String] =
    Files.list(Paths.get(store.root, table)).iterator().asScala
      .map(_.getFileName.toString).toSeq.sorted

  test("bucketed append / range delete / range read semantics match rename mode") {
    val store = fresh()
    store.appendBucketed("t", (0L until 100L).toDF("n"), "n")
    store.deleteRange("t", "n", 15L, 74L)
    assert(rows(store, "t") == ((0L to 14L) ++ (75L to 99L)))
    val got = store.readRange("t", "n", 5L, 9L, null)
    assert(got.select("n").collect().map(_.getLong(0)).sorted.toSeq == (5L to 9L))
    // append after delete composes
    store.appendBucketed("t", Seq(1000L).toDF("n"), "n")
    assert(rows(store, "t") == ((0L to 14L) ++ (75L to 99L) :+ 1000L))
    // and the fully-retracted buckets' physical dirs were GC'd: all
    // remaining data dirs hold only live buckets
    val liveBuckets = Set(0L, 1L, 7L, 8L, 9L, 100L)
    Files.walk(Paths.get(store.root, "t")).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("bucket="))
      .foreach { p =>
        val b = p.getFileName.toString.stripPrefix("bucket=").toLong
        assert(liveBuckets.contains(b), s"retracted bucket dir $p must be GC'd")
      }
  }

  test("a crash between stage and promote leaves the old generation live; replay converges") {
    val store = fresh()
    store.replace("t", Seq(1L, 2L).toDF("n"))
    // stage the replacement but "crash" before the promote (marker flip)
    val (stage, _) = store.stageReplaceAll(Seq("t" -> Seq(9L).toDF("n")))
    stage.foreach(_.apply())
    // a reader (fresh store instance = fresh caches, as after a restart)
    // still sees the OLD generation — the staged dir is invisible
    val reader = TableStore(spark, store.root, store.bucketSize, manifestCommit = true)
    assert(rows(reader, "t") == Seq(1L, 2L), "uncommitted stage must stay invisible")
    // the recovery replay re-stages and promotes; the orphan dir is GC'd
    reader.replace("t", Seq(7L, 8L).toDF("n"))
    assert(rows(reader, "t") == Seq(7L, 8L))
    val dataDirs = ls(reader, "t").filter(_.startsWith(".d-"))
    assert(dataDirs.length == 1, s"orphan staging dirs must be GC'd, saw: $dataDirs")
  }

  test("a crash between the manifest write and the marker flip rolls forward") {
    val store = fresh()
    store.replace("t", Seq(1L).toDF("n"))
    store.replace("t", Seq(2L).toDF("n"))
    // simulate the crash: hand-rewind the marker to the previous version
    // (equivalent to dying after .manifest.2 landed but before .gen did)
    val gen = Paths.get(store.root, "t", ".gen")
    assert(Files.readString(gen).trim == "2")
    Files.writeString(gen, "1")
    // the out-of-band rewind invalidates Hadoop LocalFileSystem's crc
    // sidecar — drop it (object stores have no such sidecar)
    Files.deleteIfExists(Paths.get(store.root, "t", "..gen.crc"))
    // version 1's manifest was GC'd at commit 2; readers must NOT
    // resurrect generation 1 — they probe .manifest.2 and roll forward
    val reader = TableStore(spark, store.root, store.bucketSize, manifestCommit = true)
    assert(rows(reader, "t") == Seq(2L),
      "reader must roll forward over a crashed marker write")
    // and the next commit heals the marker
    reader.append("t", Seq(3L).toDF("n"))
    assert(Files.readString(gen).trim == "3")
    assert(rows(reader, "t") == Seq(2L, 3L))
  }

  test("category partitions rebuild their typed column and compact by manifest swap") {
    val store = fresh()
    (1 to 5).foreach { i =>
      store.appendPartitioned("p", Seq((i.toLong, i % 2)).toDF("n", "shard"), "shard")
    }
    val df = store.readOr("p", null)
    assert(df.schema("shard").dataType == org.apache.spark.sql.types.IntegerType,
      "partition column must come back with its sidecar type")
    assert(df.select("n", "shard").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet ==
      (1 to 5).map(i => (i.toLong, i % 2)).toSet)
    assert(store.compactPartitions("p", "shard", maxFiles = 1) > 0)
    assert(store.readOr("p", null).count() == 5L)
  }

  test("empty appends stay absent but typed; replace-from-self reads old files") {
    val store = fresh()
    store.appendBucketed("e", Seq.empty[Long].toDF("n"), "n")
    assert(!store.exists("e"))
    assert(store.read("e", null).schema.fieldNames.sameElements(Array("n")))
    store.replace("s", Seq((1L, "a"), (2L, "b")).toDF("n", "v"))
    store.replace("s", store.readOr("s", null).filter(col("n") === 2L))
    assert(store.readOr("s", null).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("no rename is ever issued: physical dirs are immutable once committed") {
    val store = fresh()
    store.appendBucketed("t", (0L until 30L).toDF("n"), "n")
    val before = ls(store, "t").filter(_.startsWith(".d-")).toSet
    store.deleteRange("t", "n", 3L, 7L) // edge rewrite of bucket 0
    val after = ls(store, "t").filter(_.startsWith(".d-")).toSet
    // the rewrite created a NEW dir; the original top dir survives only
    // while its other buckets are still referenced — nothing was renamed
    // (every surviving name from `before` is still a prefix-stable dir)
    assert(after.nonEmpty)
    assert((after -- before).nonEmpty, "edge rewrite must land in a fresh immutable dir")
    assert(rows(store, "t") == ((0L to 2L) ++ (8L to 29L)))
  }
}
