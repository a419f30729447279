package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextOps}
import graft.sources.Tables

/** Training-data pipeline operators over documents/embeddings: dedup,
  * similarity search, text analysis, multimodal plumbing. Oracle SQL is
  * provided wherever the semantics are ANSI-expressible; LSH internals
  * (engine-private hash functions) get the rows-only check.
  */
object PipelineQueries {

  /** 4-hex-digit → int in portable SQL (DuckDB has no conv()). */
  private def hex4(expr: String): String =
    s"""((instr('0123456789abcdef', substr($expr,1,1)) - 1) * 4096
       | + (instr('0123456789abcdef', substr($expr,2,1)) - 1) * 256
       | + (instr('0123456789abcdef', substr($expr,3,1)) - 1) * 16
       | + (instr('0123456789abcdef', substr($expr,4,1)) - 1))""".stripMargin
  private def hex2(expr: String): String =
    s"""((instr('0123456789abcdef', substr($expr,1,1)) - 1) * 16
       | + (instr('0123456789abcdef', substr($expr,2,1)) - 1))""".stripMargin

  /** Sequential double-precision fold for cosine pieces, identical
    * evaluation order to Similarity.dot/norm2 (left-to-right).
    */
  private def sqlDot(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
  private def sqlNorm2(a: String): String = sqlDot(a, a)
  private def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)} / (sqrt(${sqlNorm2(a)}) * sqrt(${sqlNorm2(b)})))"

  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  val defs: Map[String, QueryDef] = Map(

    // D1 — exact dedup by normalized-content fingerprint
    "d1_dedup_exact" -> QueryDef.sql(
      (s, d) => Dedup.exactDedup(Tables(s, d).documents, "doc_id", "text")
        .orderBy("fp"),
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |   min(doc_id) AS doc_id, count(*) AS n_copies
        | FROM documents GROUP BY 1 ORDER BY fp""".stripMargin
    ),

    // D2 — MinHash + LSH near-dup (banded candidates, exact-Jaccard verify).
    // Engine-private hash family → rows-only check.
    "d2_minhash_lsh" -> QueryDef.rowsOnly(
      (s, d) => Dedup.minHashLshNearDups(
        Tables(s, d).documents, "doc_id", "text",
        shingleSize = 2, numHashes = 64, bands = 32, threshold = 0.2)
        .orderBy("id_a", "id_b")
    ),

    // D3 — SimHash near-dup (chunked candidates, Hamming verify)
    "d3_simhash" -> QueryDef.rowsOnly(
      (s, d) => Dedup.simHashNearDups(Tables(s, d).documents, "doc_id", "text", maxHamming = 16)
        .orderBy("id_a", "id_b")
    ),

    // D4 — exact n-gram Jaccard between consecutive doc pairs: integer
    // intersection/union counts + one final division (IEEE-exact).
    "d4_ngram_jaccard" -> QueryDef.sql(
      (s, d) => {
        val docs  = Tables(s, d).documents
        val pairs = docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
          .join(docs.select(col("doc_id").as("id_b")), "id_b")
        Dedup.verifyJaccard(docs, pairs, "doc_id", "text", shingleSize = 3)
          .orderBy("id_a")
      },
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         | grams AS (SELECT doc_id, unnest(list_distinct(
         |     [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)])) AS gram
         |   FROM toks),
         | sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
         | inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |   FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1 AND a.gram = b.gram
         |   GROUP BY 1, 2)
         | SELECT p.doc_id AS id_a, p.doc_id + 1 AS id_b,
         |   coalesce(i.inter, 0) AS inter,
         |   sa.sz + sb.sz - coalesce(i.inter, 0) AS uni,
         |   CAST(coalesce(i.inter, 0) AS DOUBLE) / CAST(sa.sz + sb.sz - coalesce(i.inter, 0) AS DOUBLE) AS jaccard
         | FROM documents p
         | JOIN sizes sa ON sa.doc_id = p.doc_id
         | JOIN sizes sb ON sb.doc_id = p.doc_id + 1
         | LEFT JOIN inter i ON i.id_a = p.doc_id
         | ORDER BY id_a""".stripMargin
    ),

    // D5 — embedding-cosine similarity on consecutive pairs (the exact
    // kernel under near-dup thresholding), sequential-fold arithmetic
    "d5_cosine_pairs" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
        a.join(b, col("id_b") === col("id_a") + 1)
          .select(col("id_a"), col("id_b"),
            round(Similarity.cosine(col("vec_a"), col("vec_b")), 6).as("cos_sim"))
          .orderBy("id_a")
      },
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |   round(${sqlCosine("a.embedding", "b.embedding")}, 6) AS cos_sim
         | FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
         | ORDER BY id_a""".stripMargin
    ),

    // S1 — brute-force cosine top-k (exact ANN baseline): probes broadcast,
    // corpus scanned once
    "s1_cosine_topk" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
          .select(col("probe_id"), col("rank").as("nn_rank"),
            col("vec_id").as("neighbor_id"), col("sim"))
          .orderBy("probe_id", "nn_rank")
      },
      s"""SELECT probe_id, nn_rank, neighbor_id, sim FROM (
         |   SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |     round(${sqlCosine("p.embedding", "c.embedding")}, 6) AS sim,
         |     row_number() OVER (PARTITION BY p.vec_id
         |       ORDER BY round(${sqlCosine("p.embedding", "c.embedding")}, 6) DESC, c.vec_id) AS nn_rank
         |   FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
         |   WHERE p.vec_id < 5)
         | WHERE nn_rank <= 10 ORDER BY probe_id, nn_rank""".stripMargin
    ),

    // S2 — LSH-bucketed ANN (sign random projection): the 100 TB scale path;
    // bucket assignment is engine-side → rows-only
    "s2_ann_lsh" -> QueryDef.rowsOnly(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.lshTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          dim = 64, nPlanes = 4, k = 10)
          .select(col("probe_id"), col("rank").as("nn_rank"),
            col("vec_id").as("neighbor_id"), col("sim"))
          .orderBy("probe_id", "nn_rank")
      }
    ),

    // T1 — token counting
    "t1_token_count" -> QueryDef.sql(
      (s, d) => Tables(s, d).documents
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id"),
      s"SELECT doc_id, len($toksSql) AS n_tokens FROM documents ORDER BY doc_id"
    ),

    // T2 — quality scoring: length/punct/stopword/token-shape signals
    "t2_quality_score" -> QueryDef.sql(
      (s, d) => {
        val feats = TextOps.qualityFeatures(col("text"))
        Tables(s, d).documents
          .select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
          .orderBy("doc_id")
      },
      s"""SELECT doc_id,
         |   len($toksSql) AS n_tokens,
         |   CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
         |     / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
         |   CAST(len(list_filter($toksSql,
         |       x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) AS DOUBLE)
         |     / greatest(CAST(len($toksSql) AS DOUBLE), 1.0) AS stopword_ratio,
         |   CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
         |     / greatest(CAST(len($toksSql) AS DOUBLE), 1.0) AS avg_token_len
         | FROM documents ORDER BY doc_id""".stripMargin
    ),

    // T3 — stopword-profile language ID (n-gram heuristic)
    "t3_lang_id" -> QueryDef.sql(
      (s, d) => Tables(s, d).documents
        .select(col("doc_id"), TextOps.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id"),
      {
        val score = TextOps.langMarkers.map { case (lang, ms) =>
          val lst = ms.map(m => s"'$m'").mkString("[", ",", "]")
          s"len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> list_contains($lst, x))) AS s_$lang"
        }.mkString(",\n   ")
        val langs = TextOps.langMarkers.map(_._1)
        val best  = s"greatest(${langs.map("s_" + _).mkString(", ")})"
        val cases = langs.map(l => s"WHEN s_$l = $best AND $best > 0 THEN '$l'").mkString(" ")
        s"""SELECT doc_id, CASE $cases ELSE 'und' END AS pred_lang FROM (
           |   SELECT doc_id, $score FROM documents) ORDER BY doc_id""".stripMargin
      }
    ),

    // T4 — document fingerprint over normalized content
    "t4_fingerprint" -> QueryDef.sql(
      (s, d) => Tables(s, d).documents
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        | FROM documents ORDER BY doc_id""".stripMargin
    ),

    // M1 — multimodal asset plumbing: opaque binary payload + typed header
    // metadata (decode itself is the stubbed seam, see Multimodal.decodeStub)
    "m1_multimodal_meta" -> QueryDef.sql(
      (s, d) => {
        val fake = Tables(s, d).documents
          .withColumn("payload", unhex(md5(col("text"))))
        Multimodal.toAssets(fake, "doc_id", "payload", "image")
          .select(col("asset_id"), col("media_type"),
            col("meta.byte_len").as("byte_len"),
            col("meta.width").as("width"),
            col("meta.height").as("height"),
            col("meta.channels").as("channels"))
          .orderBy("asset_id")
      },
      s"""SELECT doc_id AS asset_id, 'image' AS media_type,
         |   16 AS byte_len,
         |   ${hex4("substr(md5(text),1,4)")} % 1920 AS width,
         |   ${hex4("substr(md5(text),5,4)")} % 1080 AS height,
         |   ${hex2("substr(md5(text),9,2)")} % 4 + 1 AS channels
         | FROM documents ORDER BY asset_id""".stripMargin
    )
  )
}
