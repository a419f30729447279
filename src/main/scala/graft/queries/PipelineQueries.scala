package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Flac, Jpeg, Mjpeg, Multimodal, Release, Similarity, Sketches, TextOps}
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

  /** 8 hex digits of an md5 expr (starting after `offset` digits) → BIGINT:
    * the SQL mirror of Dedup.portableHashLo / portableHashHi.
    */
  private def hex8(md5Expr: String, offset: Int): String =
    s"list_reduce(list_transform(range(1,9), i -> CAST(instr('0123456789abcdef', substr($md5Expr, i + $offset, 1)) - 1 AS BIGINT)), (a,b) -> a*16 + b)"

  /** First `n` hex digits of an expr → BIGINT (the SQL mirror of Spark's
    * `conv(substring(x, 1, n), 16, 10)` used by the sketch operators).
    */
  private def hexN(expr: String, n: Int): String =
    s"list_reduce(list_transform(range(1,${n + 1}), i -> CAST(instr('0123456789abcdef', substr($expr, i, 1)) - 1 AS BIGINT)), (a,b) -> a*16 + b)"

  /** The a14/a16 HLL register CTE chain over 5-shingles per lang for a
    * filtered slice of `documents`: yields `<pfx>regs(lang, b, r)`.
    */
  private def hllRegCtes(pred: String, pfx: String): String =
    s"""${pfx}t AS (SELECT lang, $toksSql AS tk FROM documents WHERE $pred),
       | ${pfx}sh AS (SELECT lang, unnest([array_to_string(tk[i:i+4], ' ')
       |     for i in range(1, len(tk) - 3)]) AS s FROM ${pfx}t),
       | ${pfx}hx AS (SELECT lang, md5(s) AS h FROM ${pfx}sh),
       | ${pfx}zd AS (SELECT lang, h,
       |    length(regexp_extract(substr(h, 4, 12), '^(0*)', 1)) AS z FROM ${pfx}hx),
       | ${pfx}br AS (SELECT lang, ${hexN("h", 3)} % 1024 AS b,
       |    CASE WHEN z = 12 THEN 49 ELSE 4 * z
       |      + CASE substr(substr(h, 4, 12), z + 1, 1)
       |          WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
       |          WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
       |          ELSE 0 END + 1 END AS rho
       |   FROM ${pfx}zd),
       | ${pfx}regs AS (SELECT lang, b, max(rho) AS r FROM ${pfx}br GROUP BY 1, 2)""".stripMargin

  /** The HLL estimate tail over a register CTE: yields `<pfx>est(lang, e)`
    * — the identical raw-division + linear-counting branch as a14.
    */
  private def hllEstCtes(regs: String, pfx: String): String =
    s"""${pfx}agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS present,
       |    CAST(sum(CAST(1 AS BIGINT) << (49 - r)) AS BIGINT) AS sp
       |   FROM $regs GROUP BY 1),
       | ${pfx}fin AS (SELECT lang, CAST(1024 - present AS BIGINT) AS n_zero,
       |    CAST(sp + (1024 - present) * (CAST(1 AS BIGINT) << 49) AS BIGINT) AS harmonic
       |   FROM ${pfx}agg),
       | ${pfx}raw AS (SELECT lang, n_zero,
       |    0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0
       |      * 562949953421312.0 / CAST(harmonic AS DOUBLE) AS rr
       |   FROM ${pfx}fin),
       | ${pfx}est AS (SELECT lang,
       |    CASE WHEN n_zero > 0 AND rr <= 2560.0
       |      THEN round(1024.0 * ln(1024.0 / CAST(n_zero AS DOUBLE)), 4)
       |      ELSE round(rr, 4) END AS e
       |   FROM ${pfx}raw)""".stripMargin

  /** Shared CTE chain for the winnowing near-dup graph closed under a
    * recursive CTE (the d6/d10 cluster construction): tokens → 3-gram
    * hashes → window-4 winnowed fingerprints → ≥2-shared edges →
    * connected components as `cc(id, label)`. Callers append their own
    * final SELECT (d6 reads min labels; d10 picks cluster canonicals).
    */
  private def winnowCcCtes: String =
    s"""toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       | grams AS (SELECT doc_id,
       |     [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] AS gs
       |   FROM toks),
       | hs AS (SELECT doc_id,
       |     [${hex8("md5(g)", 0)} % ${Dedup.MersennePrime} for g in gs] AS h
       |   FROM grams),
       | wins AS (SELECT doc_id,
       |     list_distinct([list_min(h[i:i+3]) for i in range(1, len(h) - 2)]) AS fps
       |   FROM hs WHERE len(h) >= 4),
       | wf AS (SELECT doc_id, unnest(fps) AS fp FROM wins),
       | pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |   FROM wf a JOIN wf b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |   GROUP BY 1, 2 HAVING count(*) >= 2),
       | edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |   UNION SELECT id_b, id_a FROM pairs),
       | cc(id, label) AS (
       |   SELECT src, src FROM edges
       |   UNION
       |   SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.id)""".stripMargin

  /** The d18 linkage-pair CTE chain (also the d19 entity-graph input,
    * single-sourced like [[winnowCcCtes]]): normalized 32-char keys,
    * aligned 8-char slice blocking with the [2, 10000] count gate,
    * Jaro-Winkler ≥ 0.9 verified pairs as `lp(id_a, id_b, jw)`.
    */
  private def linkagePairCtes: String =
    """k AS (SELECT doc_id,
      |    regexp_replace(lower(substr(text, 1, 32)), '[^\x20-\x7e]', '', 'g') AS key
      |  FROM documents),
      | slices AS (SELECT doc_id, i, substr(key, 1 + 8 * i, 8) AS sl
      |   FROM k, unnest(range(0, 4)) AS u(i)
      |   WHERE len(substr(key, 1 + 8 * i, 8)) > 0),
      | gated AS (SELECT i, sl FROM slices
      |   GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 10000),
      | cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |   FROM slices a JOIN gated g ON a.i = g.i AND a.sl = g.sl
      |   JOIN slices b ON b.i = a.i AND b.sl = a.sl AND a.doc_id < b.doc_id),
      | lp AS (SELECT id_a, id_b,
      |     round(jaro_winkler_similarity(ka.key, kb.key), 6) AS jw
      |   FROM cand JOIN k ka ON ka.doc_id = id_a JOIN k kb ON kb.doc_id = id_b
      |   WHERE round(jaro_winkler_similarity(ka.key, kb.key), 6) >= 0.9)""".stripMargin

  /** [[winnowCcCtes]] extended with the shared labeling stage (d10/d11):
    * min-label components + the full corpus left-joined so singletons
    * carry their own id — the SQL twin of Dedup.componentLabels, single-
    * sourced for the same reason. `extra` appends pass-through columns
    * to the labeled relation (e.g. ", d.n_chars").
    */
  private def winnowLabeledCtes(extra: String = ""): String =
    s"""$winnowCcCtes,
       | comp AS (SELECT id AS doc_id, min(label) AS component FROM cc GROUP BY id),
       | labeled AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component$extra
       |   FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)""".stripMargin

  /** The r11 composed-release oracle: every stage's established SQL
    * mirror (t29 Gopher, t30 C4, t31 canon, d1 fingerprint dedup, the
    * d6/d10 winnow→CC→canonical chain, d7's 4-gram decontamination, r6's
    * capped mixture, r8's shard shuffle) chained over ONE corpus in the
    * same order as `Release.releasePipeline`. The intermediate CTEs carry
    * the canonical text's token array forward exactly once, mirroring the
    * Spark side's single-tokenization contract.
    */
  private def r11Sql: String = {
    val p = Dedup.MersennePrime
    s"""WITH RECURSIVE
       | gaug AS (SELECT doc_id,
       |    text || repeat(chr(10) || '- ' || substr(h, 2, 4),
       |        (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 2)
       |      || chr(10) || substr(h, 7, 6)
       |      || CASE WHEN substr(h, 6, 1) IN ('0','2','4','6','8','a','c','e')
       |         THEN '...' ELSE '' END AS t
       |  FROM (SELECT doc_id, text, md5(text) AS h FROM documents)),
       | gfl AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS toks,
       |    string_split(t, chr(10)) AS lines, t FROM gaug),
       | gg AS (SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    round(CAST(list_reduce(list_transform(toks, x -> CAST(len(x) AS BIGINT)),
       |        (a, b) -> a + b) AS DOUBLE)
       |      / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS mean_word_len,
       |    round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
       |      / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS frac_alpha_words,
       |    round(CAST(len(regexp_extract_all(t, '#'))
       |        + len(regexp_extract_all(t, '\\.\\.\\.')) AS DOUBLE)
       |      / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS symbol_ratio,
       |    round(CAST(len(list_filter(lines, x -> starts_with(x, '- '))) AS DOUBLE)
       |      / greatest(CAST(len(lines) AS DOUBLE), 1.0), 6) AS frac_bullet_lines,
       |    round(CAST(len(list_filter(lines, x -> ends_with(x, '...'))) AS DOUBLE)
       |      / greatest(CAST(len(lines) AS DOUBLE), 1.0), 6) AS frac_ellipsis_lines,
       |    CAST(len(list_filter(toks, x -> list_contains(
       |      ['the','a','an','and','or','of','to','in','is','it'], x))) AS BIGINT)
       |      AS n_stopwords
       |  FROM gfl),
       | gkeep AS (SELECT doc_id FROM gg
       |   WHERE n_words >= 50 AND n_words <= 100000
       |     AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |     AND symbol_ratio < 0.1 AND frac_bullet_lines <= 0.9
       |     AND frac_ellipsis_lines <= 0.3 AND frac_alpha_words >= 0.8
       |     AND n_stopwords >= 2),
       | caug AS (SELECT doc_id,
       |    (CASE WHEN (instr('0123456789abcdef', substr(h, 1, 1)) - 1) % 2 = 0
       |       THEN text || '.' ELSE text END)
       |    || chr(10) || 'c4 keeps this sentence about ' || substr(h, 1, 6) || ' tokens.'
       |    || chr(10) || substr(h, 7, 4) || ' short.'
       |    || chr(10) || 'this line has five words minimum but no terminal punctuation'
       |    || CASE WHEN (instr('0123456789abcdef', substr(h, 2, 1)) - 1) < 8
       |       THEN chr(10) || 'please enable javascript to view the content here.' ELSE '' END
       |    || CASE WHEN (instr('0123456789abcdef', substr(h, 3, 1)) - 1) = 0
       |       THEN chr(10) || 'lorem ipsum dolor sit amet consectetur.' ELSE '' END
       |    || CASE WHEN (instr('0123456789abcdef', substr(h, 4, 1)) - 1) = 0
       |       THEN chr(10) || 'function f() { return ' || substr(h, 11, 2) || ' }' ELSE '' END
       |    || CASE WHEN (instr('0123456789abcdef', substr(h, 5, 1)) - 1) < 12
       |       THEN chr(10) || 'first sentence here is fine. second sentence also fine. third sentence ends properly.' ELSE '' END
       |      AS t
       |  FROM (SELECT doc_id, text, md5(text) AS h FROM documents)),
       | cfl AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines FROM caug),
       | ckl AS (SELECT doc_id, t,
       |    list_filter(lines, l -> regexp_matches(trim(l), '[.!?"]$$')
       |      AND len(regexp_split_to_array(trim(l), '\\s+')) >= 5
       |      AND NOT contains(lower(trim(l)), 'javascript')) AS kept
       |   FROM cfl),
       | ckeep AS (SELECT doc_id FROM (
       |    SELECT doc_id,
       |      CAST(len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]')) AS BIGINT) AS n_sentences,
       |      CAST(contains(lower(t), 'lorem ipsum') AS INTEGER) AS has_lorem,
       |      CAST(contains(t, '{') AS INTEGER) AS has_brace
       |    FROM ckl)
       |   WHERE n_sentences >= 3 AND has_lorem = 0 AND has_brace = 0),
       | surv AS (SELECT d.doc_id, d.text, d.source, d.n_chars FROM documents d
       |   JOIN gkeep USING (doc_id) JOIN ckeep USING (doc_id)
       |   WHERE d.source <> 'src0'),
       | cz0 AS (SELECT doc_id, source, n_chars, regexp_replace(text,
       |    '[' || chr(8203) || '-' || chr(8207) || chr(8288) || chr(65279) || ']',
       |    '', 'g') AS c0 FROM surv),
       | cf0 AS (SELECT doc_id, source, n_chars,
       |    translate(c0, '${Curation.HomoglyphFrom}', '${Curation.HomoglyphTo}') AS c1
       |   FROM cz0),
       | cq0 AS (SELECT doc_id, source, n_chars,
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      c1, '!{3,}', '!', 'g'), '\\?{3,}', '?', 'g'), '\\.{3,}', '.', 'g'),
       |      ',{3,}', ',', 'g'), '-{3,}', '-', 'g') AS canon
       |   FROM cf0),
       | ctk0 AS (SELECT doc_id, source, n_chars, canon,
       |    regexp_split_to_array(trim(canon), '\\s+') AS t FROM cq0),
       | ctk AS (SELECT *, CAST(len(t) AS BIGINT) AS n_tokens FROM ctk0),
       | freps AS (SELECT md5(regexp_replace(lower(trim(canon)), '\\s+', ' ', 'g')) AS fp,
       |    min(doc_id) AS doc_id FROM ctk GROUP BY 1),
       | ex AS (SELECT c.* FROM ctk c JOIN freps r ON r.doc_id = c.doc_id),
       | grams AS (SELECT doc_id,
       |     [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] AS gs
       |   FROM ex),
       | hss AS (SELECT doc_id,
       |     [${hex8("md5(g)", 0)} % $p for g in gs] AS h
       |   FROM grams),
       | wins AS (SELECT doc_id,
       |     list_distinct([list_min(h[i:i+3]) for i in range(1, len(h) - 2)]) AS fps
       |   FROM hss WHERE len(h) >= 4),
       | wfp AS (SELECT doc_id, unnest(fps) AS fp FROM wins),
       | prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |   FROM wfp a JOIN wfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |   GROUP BY 1, 2 HAVING count(*) >= 2),
       | edges AS (SELECT id_a AS src, id_b AS dst FROM prs
       |   UNION SELECT id_b, id_a FROM prs),
       | cc(id, label) AS (
       |   SELECT src, src FROM edges
       |   UNION
       |   SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.id),
       | comp AS (SELECT id AS doc_id, min(label) AS component FROM cc GROUP BY id),
       | labeled AS (SELECT e.doc_id, coalesce(c.component, e.doc_id) AS component,
       |    e.n_chars
       |   FROM ex e LEFT JOIN comp c ON c.doc_id = e.doc_id),
       | rr AS (SELECT component, doc_id AS rep_id,
       |    row_number() OVER (PARTITION BY component
       |      ORDER BY n_chars DESC, doc_id ASC) AS rn FROM labeled),
       | nreps AS (SELECT rep_id FROM rr WHERE rn = 1),
       | dd AS (SELECT e.* FROM ex e JOIN nreps n ON n.rep_id = e.doc_id),
       | cg AS (SELECT doc_id,
       |     unnest([${hex8("md5(array_to_string(t[j:j+3], ' '))", 0)} % $p
       |             for j in range(1, len(t) - 2)]) AS g
       |   FROM dd),
       | etk AS (SELECT $toksSql AS t FROM documents WHERE source = 'src0'),
       | eg AS (SELECT DISTINCT unnest([${hex8("md5(array_to_string(t[j:j+3], ' '))", 0)} % $p
       |             for j in range(1, len(t) - 2)]) AS g
       |   FROM etk),
       | contam AS (SELECT DISTINCT doc_id FROM cg WHERE g IN (SELECT g FROM eg)),
       | rel AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
       | per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS s_tokens
       |   FROM rel GROUP BY source),
       | ppw AS (SELECT source, s_tokens,
       |    CAST(round(pow(CAST(s_tokens AS DOUBLE), 0.5), 6) AS DECIMAL(28,6)) AS pw
       |   FROM per),
       | tot AS (SELECT sum(pw) AS tt FROM ppw),
       | wts AS (SELECT source, s_tokens,
       |    round(CAST(pw AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS weight
       |   FROM ppw, tot),
       | mix AS (SELECT source, weight,
       |    least(CAST(floor(CAST(weight AS DECIMAL(12,6)) * 1000000) AS BIGINT),
       |      CAST(floor(CAST(s_tokens AS DECIMAL(28,6)) * CAST(4.0 AS DECIMAL(12,6))) AS BIGINT))
       |      AS alloc_tokens
       |   FROM wts),
       | shs AS (SELECT doc_id,
       |    ${hex8("md5(CAST(doc_id AS VARCHAR) || 'release1')", 0)} % $p AS hv
       |   FROM rel)
       | SELECT r.doc_id, r.source, r.n_tokens, m.weight, m.alloc_tokens,
       |   CAST(s.hv % 8 AS INT) AS shard,
       |   CAST(row_number() OVER (PARTITION BY s.hv % 8 ORDER BY s.hv, s.doc_id) - 1
       |     AS BIGINT) AS pos
       | FROM rel r JOIN mix m USING (source) JOIN shs s ON s.doc_id = r.doc_id
       | ORDER BY r.doc_id""".stripMargin
  }

  /** Full MinHash-LSH oracle: the same shingle→hash→sign→band→candidate→
    * verify pipeline as Dedup.minHashLshNearDups, with the hash constants
    * interpolated from the same source (Dedup.hashA/hashB/MersennePrime).
    * Fixed to d2's parameters: shingleSize=2, numHashes=64, bands=16 (r=4),
    * threshold=0.8 — the S-curve midpoint (1/16)^(1/4) ≈ 0.5 admits the
    * ≥0.8-jaccard near-dup band with ~99.98% recall while false candidates
    * collapse (∝ s⁴ per band, vs s² under the old r=2).
    */
  private def d2Sql: String = {
    val p     = Dedup.MersennePrime
    val m     = Dedup.BandFoldMult
    val bands = 16
    val r     = 64 / bands
    val minExprs = (0 until 64)
      .map(i => s"min((h * ${Dedup.hashA(i)} + ${Dedup.hashB(i)}) % $p) AS mh_$i")
      .mkString(",\n    ")
    val bandArr = (0 until bands)
      .map { b =>
        (1 until r).foldLeft(s"mh_${b * r}") { (acc, j) =>
          s"($acc * $m + mh_${b * r + j}) % $p"
        }
      }
      .mkString("[", ",\n    ", "]")
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       | grams AS (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS gram FROM toks),
       | hashed AS (SELECT doc_id, ${hex8("md5(gram)", 0)} % $p AS h FROM grams),
       | sigs AS (SELECT doc_id,
       |    $minExprs
       |  FROM hashed GROUP BY doc_id),
       | br0 AS (SELECT doc_id, unnest(range(0, $bands)) AS band,
       |    $bandArr AS bhs
       |  FROM sigs),
       | bandrows AS (SELECT doc_id, band, bhs[band + 1] AS band_hash FROM br0),
       | cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bandrows a JOIN bandrows b
       |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
       | dg AS (SELECT DISTINCT doc_id, h FROM hashed),
       | sizes AS (SELECT doc_id, count(*) AS sz FROM dg GROUP BY doc_id),
       | inter AS (SELECT c.id_a, c.id_b, count(*) AS inter FROM cands c
       |  JOIN dg a ON a.doc_id = c.id_a
       |  JOIN dg b ON b.doc_id = c.id_b AND b.h = a.h
       |  GROUP BY 1, 2)
       | SELECT id_a, id_b, inter, uni, jaccard FROM (
       |  SELECT c.id_a AS id_a, c.id_b AS id_b, coalesce(i.inter, 0) AS inter,
       |    sa.sz + sb.sz - coalesce(i.inter, 0) AS uni,
       |    CAST(coalesce(i.inter, 0) AS DOUBLE) / CAST(sa.sz + sb.sz - coalesce(i.inter, 0) AS DOUBLE) AS jaccard
       |  FROM cands c
       |  JOIN sizes sa ON sa.doc_id = c.id_a
       |  JOIN sizes sb ON sb.doc_id = c.id_b
       |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b)
       | WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin
  }

  /** SimHash oracle: token→two 32-bit md5 halves→64 bit-sums→half hashes→
    * 16-bit chunk buckets→Hamming verify, mirroring Dedup.simHashNearDups
    * (d3's parameters: maxHamming=3 — the exact pigeonhole regime: any pair
    * within Hamming 3 of 64 bits must agree on one of the four 16-bit
    * chunks, so recall is guaranteed, not probabilistic).
    */
  private def d3Sql: String = {
    def bitSums(src: String, prefix: String) = (0 until 32)
      .map(j => s"sum(CASE WHEN ($src & ${1L << j}) != 0 THEN 1 ELSE -1 END) AS ${prefix}_$j")
    val sums = (bitSums("lo", "bl") ++ bitSums("hi", "bh")).mkString(",\n    ")
    def half(prefix: String) = (0 until 32)
      .map(j => s"(CASE WHEN ${prefix}_$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       | h AS (SELECT doc_id, ${hex8("md5(tok)", 0)} AS lo, ${hex8("md5(tok)", 8)} AS hi FROM toks),
       | bits AS (SELECT doc_id,
       |    $sums
       |  FROM h GROUP BY doc_id),
       | sh AS (SELECT doc_id, ${half("bl")} AS sh_lo, ${half("bh")} AS sh_hi FROM bits),
       | ch AS (SELECT doc_id, sh_lo, sh_hi, unnest(range(0, 4)) AS chunk FROM sh),
       | chunked AS (SELECT doc_id, sh_lo, sh_hi, chunk,
       |    CASE chunk WHEN 0 THEN sh_lo & 65535 WHEN 1 THEN (sh_lo >> 16) & 65535
       |         WHEN 2 THEN sh_hi & 65535 ELSE (sh_hi >> 16) & 65535 END AS chunk_val
       |  FROM ch),
       | cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.sh_lo AS lo_a, a.sh_hi AS hi_a, b.sh_lo AS lo_b, b.sh_hi AS hi_b
       |  FROM chunked a JOIN chunked b
       |    ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id)
       | SELECT id_a, id_b, hamming FROM (
       |  SELECT id_a, id_b, bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b)) AS hamming FROM cands)
       | WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin
  }

  /** Sign-projection bucket oracle for s2: per-plane weights interpolated
    * from Similarity.planeWeight (same integer lattice), sequential
    * left-to-right fold matching lshBucket's reduce order.
    */
  private def s2Sql: String = {
    def proj(plane: Int): String = {
      val ws = (0 until 64).map(i => s"CAST(${Similarity.planeWeight(plane, i).toLong} AS DOUBLE)")
        .mkString("[", ", ", "]")
      s"list_reduce(list_transform(range(1,65), i -> CAST(e.embedding[i] AS DOUBLE) * ($ws)[i]), (x,y) -> x + y)"
    }
    val bucket = (0 until 4)
      .map(pl => s"(CASE WHEN ${proj(pl)} >= 0 THEN ${1L << pl} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH b AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings e)
       | SELECT probe_id, nn_rank, neighbor_id, sim FROM (
       |   SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |     round(${sqlCosine("p.embedding", "c.embedding")}, 6) AS sim,
       |     row_number() OVER (PARTITION BY p.vec_id
       |       ORDER BY round(${sqlCosine("p.embedding", "c.embedding")}, 6) DESC, c.vec_id) AS nn_rank
       |   FROM b p JOIN b c ON c.bucket = p.bucket AND c.vec_id <> p.vec_id
       |   WHERE p.vec_id < 5)
       | WHERE nn_rank <= 10 ORDER BY probe_id, nn_rank""".stripMargin
  }

  /** IVF oracle: same centroid sample, same nearest-centroid assignment,
    * same nProbe=2 probing and exact in-list cosine as Similarity.ivfTopK.
    */
  /** The s3 IVF CTE chain up to the ranked in-list members (also the s19
    * approx side): centroids, nearest-centroid assignment, nProbe=2
    * posting lists, ranked neighbors as `ivf_ranked`.
    */
  private def s3Ctes: String = {
    val cosEC = sqlCosine("e.embedding", "c.cvec")
    val cosPC = sqlCosine("p.embedding", "c.cvec")
    val cosPA = sqlCosine("pl.pvec", "a.embedding")
    s"""cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 97 = 0),
       | assign AS (SELECT vec_id, embedding, cid FROM (
       |   SELECT e.vec_id, e.embedding, c.cid,
       |     row_number() OVER (PARTITION BY e.vec_id
       |       ORDER BY round($cosEC, 6) DESC, c.cid) AS rn
       |   FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
       | plists AS (SELECT probe_id, pvec, cid FROM (
       |   SELECT p.vec_id AS probe_id, p.embedding AS pvec, c.cid,
       |     row_number() OVER (PARTITION BY p.vec_id
       |       ORDER BY round($cosPC, 6) DESC, c.cid) AS rn
       |   FROM embeddings p CROSS JOIN cents c WHERE p.vec_id < 5) WHERE rn <= 2),
       | ivf_ranked AS (
       |   SELECT pl.probe_id, a.vec_id AS neighbor_id,
       |     round($cosPA, 6) AS sim,
       |     row_number() OVER (PARTITION BY pl.probe_id
       |       ORDER BY round($cosPA, 6) DESC, a.vec_id) AS nn_rank
       |   FROM plists pl JOIN assign a ON a.cid = pl.cid
       |   WHERE a.vec_id <> pl.probe_id)""".stripMargin
  }

  private def s3Sql: String =
    s"""WITH $s3Ctes
       | SELECT probe_id, nn_rank, neighbor_id, sim FROM ivf_ranked
       | WHERE nn_rank <= 10 ORDER BY probe_id, nn_rank""".stripMargin

  /** The s12 oracle: s3's cents/assign/plists CTEs composed with s6's
    * packed-code + ADC arithmetic — posting lists join codes by vec_id,
    * probes rank in-list members by the identical lattice ADC distance.
    */
  private def s12Sql: String = {
    val cosEC = sqlCosine("e.embedding", "c.cvec")
    val cosPC = sqlCosine("p.embedding", "c.cvec")
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 97 = 0),
       | assign AS (SELECT vec_id, cid FROM (
       |   SELECT e.vec_id, c.cid,
       |     row_number() OVER (PARTITION BY e.vec_id
       |       ORDER BY round($cosEC, 6) DESC, c.cid) AS rn
       |   FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
       | codes AS (SELECT vec_id, $pqPackedSql AS pq_code FROM embeddings),
       | posted AS (SELECT a.vec_id, a.cid, k.pq_code
       |   FROM assign a JOIN codes k USING (vec_id)),
       | plists AS (SELECT probe_id, pvec, cid FROM (
       |   SELECT p.vec_id AS probe_id, p.embedding AS pvec, c.cid,
       |     row_number() OVER (PARTITION BY p.vec_id
       |       ORDER BY round($cosPC, 6) DESC, c.cid) AS rn
       |   FROM embeddings p CROSS JOIN cents c WHERE p.vec_id < 5) WHERE rn <= 2)
       | SELECT probe_id, nn_rank, neighbor_id, adist FROM (
       |   SELECT pl.probe_id, a.vec_id AS neighbor_id,
       |     ${pqAdcSql("pl.pvec", "a.pq_code")} AS adist,
       |     row_number() OVER (PARTITION BY pl.probe_id
       |       ORDER BY ${pqAdcSql("pl.pvec", "a.pq_code")}, a.vec_id) AS nn_rank
       |   FROM plists pl JOIN posted a ON a.cid = pl.cid
       |   WHERE a.vec_id <> pl.probe_id)
       | WHERE nn_rank <= 10 ORDER BY probe_id, nn_rank""".stripMargin
  }

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
    // The md5-based portable hash family is mirrored stage-for-stage in the
    // oracle (d2Sql) — the whole LSH pipeline is hash-checked, not rows-only.
    "d2_minhash_lsh" -> QueryDef.sql(
      (s, d) => Dedup.minHashLshNearDups(
        Tables(s, d).documents, "doc_id", "text",
        shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.8)
        .orderBy("id_a", "id_b"),
      d2Sql
    ),

    // D3 — SimHash near-dup (chunked candidates, Hamming verify), fully
    // mirrored in SQL via the two-half portable hash
    "d3_simhash" -> QueryDef.sql(
      (s, d) => Dedup.simHashNearDups(Tables(s, d).documents, "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b"),
      d3Sql
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
         | grams AS (SELECT doc_id, unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS gram
         |   FROM toks),
         | dg AS (SELECT DISTINCT doc_id, ${hex8("md5(gram)", 0)} % ${Dedup.MersennePrime} AS h FROM grams),
         | sizes AS (SELECT doc_id, count(*) AS sz FROM dg GROUP BY doc_id),
         | inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |   FROM dg a JOIN dg b ON b.doc_id = a.doc_id + 1 AND a.h = b.h
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

    // D6 — duplicate-CLUSTER assignment: connected components over the
    // near-dup graph (docs sharing ≥2 winnowing fingerprints, the t6/MOSS
    // construction). Pairwise dedup under-retracts — A≈B and B≈C must
    // collapse to ONE cluster even when A≉C — so the min-reachable-id
    // label is the real "keep one per group" key. Oracle: the same graph
    // closed under a recursive CTE.
    "d6_dup_components" -> QueryDef.sql(
      (s, d) => {
        val docs  = Tables(s, d).documents
        val edges = Dedup.winnowEdges(docs, "doc_id", "text",
          shingleSize = 3, window = 4, minShared = 2)
        Dedup.connectedComponents(edges, "id_a", "id_b")
          .select(col("id").as("doc_id"), col("label").as("component"))
          .orderBy("doc_id")
      },
      s"""WITH RECURSIVE
         | $winnowCcCtes
         | SELECT id AS doc_id, min(label) AS component FROM cc
         | GROUP BY id ORDER BY doc_id""".stripMargin
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
    // the integer-lattice plane weights are engine-agnostic, so the bucket
    // assignment (and thus the full ANN result) is oracle-checked too
    "s2_ann_lsh" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.lshTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          dim = 64, nPlanes = 4, k = 10)
          .select(col("probe_id"), col("rank").as("nn_rank"),
            col("vec_id").as("neighbor_id"), col("sim"))
          .orderBy("probe_id", "nn_rank")
      },
      s2Sql
    ),

    // S3 — IVF ANN: coarse centroids (deterministic corpus sample), probes
    // visit only their nProbe nearest posting lists. The data-adaptive
    // counterpart of s2's hash buckets; fully oracle-mirrored.
    "s3_ann_ivf" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 5),
            e.filter(col("vec_id") % 97 === 0), "vec_id", "embedding",
            k = 10, nProbe = 2)
          .select(col("probe_id"), col("rank").as("nn_rank"),
            col("vec_id").as("neighbor_id"), col("sim"))
          .orderBy("probe_id", "nn_rank")
      },
      s3Sql
    ),

    // S19 — recall@10 of the IVF path against the exact brute-force
    // oracle: the acceptance telemetry every ANN deployment reports
    // before swapping exact search out. Composes s1 (truth) and s3
    // (approx) through Similarity.annRecall — per probe, how many of the
    // true top-10 the pruned search kept.
    "s19_ann_recall" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        val exact = Similarity.bruteForceTopK(
            e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
          .select(col("probe_id"), col("vec_id").as("neighbor_id"))
        val approx = Similarity.ivfTopK(e, e.filter(col("vec_id") < 5),
            e.filter(col("vec_id") % 97 === 0), "vec_id", "embedding",
            k = 10, nProbe = 2)
          .select(col("probe_id"), col("vec_id").as("neighbor_id"))
        Similarity.annRecall(exact, approx, "neighbor_id")
          .orderBy("probe_id")
      },
      s"""WITH $s3Ctes,
         | approx AS (SELECT probe_id, neighbor_id FROM ivf_ranked WHERE nn_rank <= 10),
         | ex AS (SELECT probe_id, neighbor_id FROM (
         |   SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |     row_number() OVER (PARTITION BY p.vec_id
         |       ORDER BY round(${sqlCosine("p.embedding", "c.embedding")}, 6) DESC, c.vec_id) AS nn_rank
         |   FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
         |   WHERE p.vec_id < 5) WHERE nn_rank <= 10),
         | hits AS (SELECT e.probe_id, CAST(count(*) AS BIGINT) AS n_hit
         |   FROM ex e JOIN approx a USING (probe_id, neighbor_id) GROUP BY 1),
         | ne AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_exact
         |   FROM ex GROUP BY 1),
         | probes AS (SELECT DISTINCT probe_id FROM ex
         |   UNION SELECT DISTINCT probe_id FROM approx)
         | SELECT p.probe_id, coalesce(ne.n_exact, 0) AS n_exact,
         |   coalesce(h.n_hit, 0) AS n_hit,
         |   CASE WHEN coalesce(ne.n_exact, 0) > 0 THEN
         |     round(CAST(coalesce(h.n_hit, 0) AS DOUBLE)
         |       / CAST(ne.n_exact AS DOUBLE), 6) END AS recall
         | FROM probes p LEFT JOIN ne USING (probe_id) LEFT JOIN hits h USING (probe_id)
         | ORDER BY probe_id""".stripMargin
    ),

    // S12 — IVF-PQ composed search: s3's coarse pruning over s6's packed
    // codes — the posting lists carry (centroid_id, id, 8-byte pq_code)
    // and in-list ranking is asymmetric PQ distance, so query time never
    // touches a raw corpus vector. Same probes/centroids/nProbe as s3,
    // same ADC arithmetic as s6; the oracle composes both CTE stacks.
    "s12_ivf_pq" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 5),
            e.filter(col("vec_id") % 97 === 0), "vec_id", "embedding",
            k = 10, nProbe = 2)
          .select(col("probe_id"), col("rank").as("nn_rank"),
            col("vec_id").as("neighbor_id"), col("adist"))
          .orderBy("probe_id", "nn_rank")
      },
      s12Sql
    ),

    // S4 — IVF quantizer training: one Lloyd M-step over the s3 centroid
    // seed — per (centroid, dim) exact decimal component sums + counts
    // (new centroid = sum/n on the consumer side)
    "s4_kmeans_step" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.kmeansStep(e, e.filter(col("vec_id") % 97 === 0), "vec_id", "embedding")
          .orderBy("centroid_id", "dim")
      },
      {
        val cosEC = sqlCosine("e.embedding", "c.cvec")
        s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 97 = 0),
           | assign AS (SELECT vec_id, embedding, cid FROM (
           |   SELECT e.vec_id, e.embedding, c.cid,
           |     row_number() OVER (PARTITION BY e.vec_id
           |       ORDER BY round($cosEC, 6) DESC, c.cid) AS rn
           |   FROM embeddings e CROSS JOIN cents c) WHERE rn = 1)
           | SELECT cid AS centroid_id, d.i - 1 AS dim,
           |   CAST(sum(CAST(round(CAST(embedding[d.i] AS DOUBLE), 4) AS DECIMAL(38,6))) AS DOUBLE) AS comp_sum,
           |   count(*) AS n
           | FROM assign CROSS JOIN range(1, 65) AS d(i)
           | GROUP BY 1, 2 ORDER BY centroid_id, dim""".stripMargin
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
        val feats = TextOps.qualityFeaturesOfTokens(col("text"), col("__toks"))
        Tables(s, d).documents
          .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("__toks"))
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
        .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("__lt"))
        .select(col("doc_id"), TextOps.langIdOfTokens(col("__lt")).as("pred_lang"))
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

    // T5 — BPE-style token counting (the "LLM token" cost proxy), same
    // RE2-safe regex in both engines
    "t5_bpe_token_count" -> QueryDef.sql(
      (s, d) => Tables(s, d).documents
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("ws_tokens"),
          TextOps.bpeTokenCount(col("text")).as("bpe_tokens"))
        .orderBy("doc_id"),
      s"""SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
         |   len(regexp_extract_all(text, '${TextOps.BpeTokenRegex.replace("'", "''")}')) AS bpe_tokens
         | FROM documents ORDER BY doc_id""".stripMargin
    ),

    // T27 — tokenizer fertility per source: BPE tokens emitted per
    // whitespace word, the tokenizer-health metric a multilingual mix is
    // budgeted with (a high-fertility source burns sequence length; the
    // per-source number is what the mixture weights consume). One
    // combine-friendly aggregation over the t5 token machinery.
    "t27_fertility" -> QueryDef.sql(
      (s, d) => Tables(s, d).documents
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text"))).as("ws_tokens"),
          sum(TextOps.bpeTokenCount(col("text"))).as("bpe_tokens"))
        .withColumn("fertility",
          round(col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"), 6))
        .orderBy("source"),
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS ws_tokens,
         |  CAST(sum(len(regexp_extract_all(text,
         |    '${TextOps.BpeTokenRegex.replace("'", "''")}'))) AS BIGINT) AS bpe_tokens,
         |  round(CAST(sum(len(regexp_extract_all(text,
         |      '${TextOps.BpeTokenRegex.replace("'", "''")}'))) AS DOUBLE)
         |    / CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE), 6)
         |    AS fertility
         | FROM documents GROUP BY source ORDER BY source""".stripMargin
    ),

    // T6 — winnowing fingerprints (rolling k-gram hash, min per window):
    // one row per (doc, fingerprint); shared ≥(w+k−1)-token runs between
    // documents are guaranteed to share a fingerprint
    "t6_winnow_fingerprint" -> QueryDef.sql(
      (s, d) => Tables(s, d).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), TextOps.shingleHashArray(col("__toks"), 3).as("__hs"))
        .select(col("doc_id"),
          explode(TextOps.winnowedFingerprintsOfHashes(col("__hs"), 4)).as("fp"))
        .orderBy("doc_id", "fp"),
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         | grams AS (SELECT doc_id,
         |     [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] AS gs
         |   FROM toks),
         | hs AS (SELECT doc_id,
         |     [${hex8("md5(g)", 0)} % ${Dedup.MersennePrime} for g in gs] AS h
         |   FROM grams),
         | wins AS (SELECT doc_id,
         |     list_distinct([list_min(h[i:i+3]) for i in range(1, len(h) - 2)]) AS fps
         |   FROM hs WHERE len(h) >= 4)
         | SELECT doc_id, unnest(fps) AS fp FROM wins ORDER BY doc_id, fp""".stripMargin
    ),

    // D7 — benchmark decontamination: corpus docs sharing any 4-gram with
    // the held-out set (source src0) are flagged, the screen every
    // training corpus runs before release. Grams compare as portable
    // hashes on both sides (broadcast semi-join on the Spark side).
    "d7_decontaminate" -> QueryDef.sql(
      (s, d) => {
        val docs = Tables(s, d).documents
        Curation.contaminatedIds(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", gramSize = 4)
          .orderBy("doc_id")
      },
      s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
         | grams AS (SELECT doc_id, source,
         |     unnest([${hex8("md5(array_to_string(t[j:j+3], ' '))", 0)} % ${Dedup.MersennePrime}
         |             for j in range(1, len(t) - 2)]) AS g
         |   FROM toks),
         | eval_g AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
         | SELECT DISTINCT doc_id FROM grams
         | WHERE source <> 'src0' AND g IN (SELECT g FROM eval_g)
         | ORDER BY doc_id""".stripMargin
    ),

    // D8 — graded n-gram-overlap decontamination: per corpus doc, the
    // fraction of its distinct 3-gram fingerprints found anywhere in the
    // held-out set (d7's any-single-gram flag, made quantitative — release
    // pipelines threshold on this fraction). Full score table oracle-hashed.
    "d8_contamination_score" -> QueryDef.sql(
      (s, d) => {
        val docs = Tables(s, d).documents
        Dedup.contaminationScores(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", shingleSize = 3)
          .orderBy("doc_id")
      },
      s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
         | grams AS (SELECT doc_id, source,
         |     unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS gram
         |   FROM toks),
         | dg AS (SELECT DISTINCT doc_id, source,
         |     ${hex8("md5(gram)", 0)} % ${Dedup.MersennePrime} AS h FROM grams),
         | bench AS (SELECT DISTINCT h FROM dg WHERE source = 'src0')
         | SELECT c.doc_id, count(*) AS n_grams, count(b.h) AS n_hit,
         |   CAST(count(b.h) AS DOUBLE) / count(*) AS overlap
         | FROM dg c LEFT JOIN bench b ON b.h = c.h
         | WHERE c.source <> 'src0'
         | GROUP BY 1 ORDER BY doc_id""".stripMargin
    ),

    // S9 — radius search: all neighbors within cosine ≥ τ of each probe —
    // the thresholded counterpart of s1's top-k; map-only over the corpus
    "s9_range_search" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.rangeSearch(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          minSim = 0.25)
          .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("sim"))
          .orderBy("probe_id", "neighbor_id")
      },
      s"""SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |   round(${sqlCosine("p.embedding", "c.embedding")}, 6) AS sim
         | FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
         | WHERE p.vec_id < 5 AND round(${sqlCosine("p.embedding", "c.embedding")}, 6) >= 0.25
         | ORDER BY probe_id, neighbor_id""".stripMargin
    ),

    // T9 — characteristic terms: top-3 per doc by (tf desc, df asc, term)
    // — tf-idf's ranking in integer-only arithmetic, bit-stable
    "t9_characteristic_terms" -> QueryDef.sql(
      (s, d) => Curation.characteristicTerms(Tables(s, d).documents, "doc_id", "text", k = 3)
        .orderBy("doc_id", "rk"),
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         | uni AS (SELECT doc_id, unnest(t) AS w FROM toks),
         | tf AS (SELECT doc_id, w, count(*) AS tf FROM uni GROUP BY 1, 2),
         | df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         | ranked AS (SELECT t.doc_id, t.w AS term, t.tf, d.df,
         |     row_number() OVER (PARTITION BY t.doc_id
         |       ORDER BY t.tf DESC, d.df ASC, t.w) AS rk
         |   FROM tf t JOIN df d ON d.w = t.w)
         | SELECT doc_id, rk, term, tf, df FROM ranked WHERE rk <= 3
         | ORDER BY doc_id, rk""".stripMargin
    ),

    // T7 — repetition screens (Gopher-style): distinct-token ratio and
    // top-unigram/bigram fractions, the standard boilerplate filters
    "t7_repetition" -> QueryDef.sql(
      (s, d) => Curation.repetitionStats(Tables(s, d).documents, "doc_id", "text")
        .orderBy("doc_id"),
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         | uni AS (SELECT doc_id, unnest(t) AS w FROM toks),
         | uc AS (SELECT doc_id, w, count(*) AS c FROM uni GROUP BY 1, 2),
         | us AS (SELECT doc_id, max(c) AS topc, sum(c) AS n, count(*) AS nd FROM uc GROUP BY 1),
         | big AS (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS g FROM toks),
         | bc AS (SELECT doc_id, g, count(*) AS c FROM big GROUP BY 1, 2),
         | bs AS (SELECT doc_id, max(c) AS topb, sum(c) AS nb FROM bc GROUP BY 1)
         | SELECT u.doc_id, CAST(u.n AS BIGINT) AS n_tokens,
         |   CAST(u.nd AS DOUBLE) / u.n AS distinct_ratio,
         |   CAST(u.topc AS DOUBLE) / u.n AS top_unigram_frac,
         |   coalesce(CAST(b.topb AS DOUBLE) / b.nb, 0.0) AS top_bigram_frac
         | FROM us u LEFT JOIN bs b ON b.doc_id = u.doc_id ORDER BY u.doc_id""".stripMargin
    ),

    // T8 — sequence packing: cut the id-ordered token stream into fixed
    // 2000-token bins via a DISTRIBUTED two-level prefix sum (the oracle's
    // single global window is exactly the plan the Spark side avoids)
    "t8_sequence_packing" -> QueryDef.sql(
      (s, d) => {
        val docs = Tables(s, d).documents
        Curation.sequencePacking(docs, "doc_id",
          TextOps.tokenCount(col("text")), budget = 2000L, rangeWidth = 100L)
          .orderBy("doc_id")
      },
      s"""WITH n AS (SELECT doc_id, len($toksSql) AS n_tokens FROM documents)
         | SELECT doc_id, n_tokens,
         |   CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2000 AS BIGINT) AS bin
         | FROM n ORDER BY doc_id""".stripMargin
    ),

    // R1 — deterministic stratified sampling by language: portable-hash
    // permille filter, reproducible with no RNG state
    // R8 — deterministic shard-and-shuffle: the final materialization step
    // of every pretraining mix (pseudo-random position in one of N shards,
    // reshuffle = seed change). Pure per-row hash + one shard-key window —
    // the repartition+sortWithinPartitions write shape, no global sort.
    "r8_shard_shuffle" -> QueryDef.sql(
      (s, d) => Curation.shardShuffle(Tables(s, d).documents, "doc_id",
          nShards = 8, seed = "mix1")
        .orderBy("doc_id"),
      s"""WITH h AS (SELECT doc_id,
         |    ${hex8("md5(CAST(doc_id AS VARCHAR) || 'mix1')", 0)} % ${Dedup.MersennePrime} AS hv
         |  FROM documents)
         | SELECT doc_id, CAST(hv % 8 AS INT) AS shard,
         |   CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1
         |     AS BIGINT) AS pos
         | FROM h ORDER BY doc_id""".stripMargin
    ),

    // T28 — BM25 relevance against a fixed probe-term set (the lexical
    // retrieval scorer; Lucene +1 idf so scores stay positive even for
    // terms in most docs). Per-term score rounds at 9 decimals and sums
    // as DECIMAL (the t11 discipline); avgdl is one double division of
    // two exact integer aggregates on both engines.
    "t28_bm25" -> QueryDef.sql(
      (s, d) => Curation.bm25Scores(Tables(s, d).documents, "doc_id", "text",
          Seq("spark", "query", "stream", "window"))
        .orderBy("doc_id"),
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         | lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
         | stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM lens),
         | tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
         |   FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
         |   WHERE tok IN ('spark', 'query', 'stream', 'window') GROUP BY 1, 2),
         | idf AS (SELECT term, round(ln(
         |      (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |        / (CAST(df AS DOUBLE) + 0.5) + 1.0), 9) AS idf
         |   FROM (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1), stats),
         | terms AS (SELECT doc_id, tf, round(idf
         |     * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
         |     / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl)),
         |   9) AS sterm
         |   FROM tf JOIN idf USING (term) JOIN lens USING (doc_id), stats)
         | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
         |   CAST(sum(tf) AS BIGINT) AS n_term_hits,
         |   CAST(sum(CAST(sterm AS DECIMAL(28,9))) AS DOUBLE) AS bm25
         | FROM terms GROUP BY 1 ORDER BY doc_id""".stripMargin
    ),

    // T29 — the Gopher hard-filter rule battery (Rae et al. 2021) over
    // the multi-line fixture (the synthetic corpus is single-line, so the
    // line-structure rules need planted bullet/ellipsis lines — derived
    // from md5(text) like every fixture here, so the oracle rebuilds the
    // identical string). One per-row projection, no join, no shuffle.
    "t29_gopher_rules" -> QueryDef.sql(
      (s, d) => Curation.gopherRules(
          Curation.plantStructuredLines(Tables(s, d).documents, "doc_id", "text"),
          "doc_id", "text")
        .orderBy("doc_id"),
      s"""WITH aug AS (SELECT doc_id,
         |    text || repeat(chr(10) || '- ' || substr(h, 2, 4),
         |        (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 2)
         |      || chr(10) || substr(h, 7, 6)
         |      || CASE WHEN substr(h, 6, 1) IN ('0','2','4','6','8','a','c','e')
         |         THEN '...' ELSE '' END AS t
         |  FROM (SELECT doc_id, text, md5(text) AS h FROM documents)),
         | f AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS toks,
         |    string_split(t, chr(10)) AS lines, t FROM aug),
         | g AS (SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    round(CAST(list_reduce(list_transform(toks, x -> CAST(len(x) AS BIGINT)),
         |        (a, b) -> a + b) AS DOUBLE)
         |      / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS mean_word_len,
         |    round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
         |      / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS frac_alpha_words,
         |    round(CAST(len(regexp_extract_all(t, '#'))
         |        + len(regexp_extract_all(t, '\\.\\.\\.')) AS DOUBLE)
         |      / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS symbol_ratio,
         |    CAST(len(lines) AS BIGINT) AS n_lines,
         |    round(CAST(len(list_filter(lines, x -> starts_with(x, '- '))) AS DOUBLE)
         |      / greatest(CAST(len(lines) AS DOUBLE), 1.0), 6) AS frac_bullet_lines,
         |    round(CAST(len(list_filter(lines, x -> ends_with(x, '...'))) AS DOUBLE)
         |      / greatest(CAST(len(lines) AS DOUBLE), 1.0), 6) AS frac_ellipsis_lines,
         |    CAST(len(list_filter(toks, x -> list_contains(
         |      ['the','a','an','and','or','of','to','in','is','it'], x))) AS BIGINT)
         |      AS n_stopwords
         |  FROM f)
         | SELECT doc_id, n_words, mean_word_len, frac_alpha_words, symbol_ratio,
         |   n_lines, frac_bullet_lines, frac_ellipsis_lines, n_stopwords,
         |   CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
         |     AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |     AND symbol_ratio < 0.1 AND frac_bullet_lines <= 0.9
         |     AND frac_ellipsis_lines <= 0.3 AND frac_alpha_words >= 0.8
         |     AND n_stopwords >= 2 THEN 1 ELSE 0 END AS INTEGER) AS keep
         | FROM g ORDER BY doc_id""".stripMargin
    ),

    // T30 — the C4 cleaning rules (Raffel et al. 2020 §2.2) over the
    // planted multi-line fixture: line-level retention (terminal punct,
    // ≥ 5 words, no javascript) + page-level removal (lorem ipsum, '{',
    // < 3 retained sentences). One per-row projection, no join/shuffle.
    "t30_c4_filters" -> QueryDef.sql(
      (s, d) => Curation.c4Filters(
          Curation.plantC4Lines(Tables(s, d).documents, "doc_id", "text"),
          "doc_id", "text")
        .orderBy("doc_id"),
      s"""WITH aug AS (SELECT doc_id,
         |    (CASE WHEN (instr('0123456789abcdef', substr(h, 1, 1)) - 1) % 2 = 0
         |       THEN text || '.' ELSE text END)
         |    || chr(10) || 'c4 keeps this sentence about ' || substr(h, 1, 6) || ' tokens.'
         |    || chr(10) || substr(h, 7, 4) || ' short.'
         |    || chr(10) || 'this line has five words minimum but no terminal punctuation'
         |    || CASE WHEN (instr('0123456789abcdef', substr(h, 2, 1)) - 1) < 8
         |       THEN chr(10) || 'please enable javascript to view the content here.' ELSE '' END
         |    || CASE WHEN (instr('0123456789abcdef', substr(h, 3, 1)) - 1) = 0
         |       THEN chr(10) || 'lorem ipsum dolor sit amet consectetur.' ELSE '' END
         |    || CASE WHEN (instr('0123456789abcdef', substr(h, 4, 1)) - 1) = 0
         |       THEN chr(10) || 'function f() { return ' || substr(h, 11, 2) || ' }' ELSE '' END
         |    || CASE WHEN (instr('0123456789abcdef', substr(h, 5, 1)) - 1) < 12
         |       THEN chr(10) || 'first sentence here is fine. second sentence also fine. third sentence ends properly.' ELSE '' END
         |      AS t
         |  FROM (SELECT doc_id, text, md5(text) AS h FROM documents)),
         | f AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines FROM aug),
         | k AS (SELECT doc_id, t, CAST(len(lines) AS BIGINT) AS n_lines,
         |    list_filter(lines, l -> regexp_matches(trim(l), '[.!?"]$$')
         |      AND len(regexp_split_to_array(trim(l), '\\s+')) >= 5
         |      AND NOT contains(lower(trim(l)), 'javascript')) AS kept
         |   FROM f),
         | g AS (SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
         |    array_to_string(kept, chr(10)) AS clean_text,
         |    CAST(contains(lower(t), 'lorem ipsum') AS INTEGER) AS has_lorem,
         |    CAST(contains(t, '{') AS INTEGER) AS has_brace
         |   FROM k),
         | z AS (SELECT doc_id, n_lines, n_kept,
         |    CAST(len(regexp_extract_all(clean_text, '[.!?]')) AS BIGINT) AS n_sentences,
         |    has_lorem, has_brace,
         |    CAST(length(clean_text) AS BIGINT) AS clean_len, clean_text
         |   FROM g)
         | SELECT doc_id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
         |   clean_len, clean_text,
         |   CAST(CASE WHEN n_sentences >= 3 AND has_lorem = 0 AND has_brace = 0
         |     THEN 1 ELSE 0 END AS INTEGER) AS keep
         | FROM z ORDER BY doc_id""".stripMargin
    ),

    // T31 — obfuscation-resistant canonicalization: zero-width strip,
    // homoglyph fold, punctuation squeeze — the dedup-prep pass that
    // defeats the cheap evasions (t23 handles Unicode COMPOSITION). The
    // fixture spells the SAME suffix differently per md5 nibble; the
    // canon (and its md5) must come out identical regardless.
    "t31_robust_canon" -> QueryDef.sql(
      (s, d) => Curation.robustCanonicalize(
          Curation.plantObfuscation(Tables(s, d).documents, "doc_id", "text"),
          "doc_id", "text")
        .orderBy("doc_id"),
      s"""WITH aug AS (SELECT doc_id,
         |    text || ' '
         |    || CASE WHEN (instr('0123456789abcdef', substr(h, 1, 1)) - 1) < 8
         |       THEN chr(8203) ELSE '' END
         |    || CASE WHEN (instr('0123456789abcdef', substr(h, 2, 1)) - 1) < 8
         |       THEN chr(1089) || chr(1086) || chr(1088) || chr(1091) ELSE 'copy' END
         |    || CASE WHEN (instr('0123456789abcdef', substr(h, 3, 1)) - 1) < 4
         |       THEN '!!!!' ELSE '!' END AS t
         |  FROM (SELECT doc_id, text, md5(text) AS h FROM documents)),
         | z AS (SELECT doc_id, t, regexp_replace(t,
         |    '[' || chr(8203) || '-' || chr(8207) || chr(8288) || chr(65279) || ']',
         |    '', 'g') AS c0 FROM aug),
         | f AS (SELECT doc_id, t,
         |    translate(c0, '${Curation.HomoglyphFrom}', '${Curation.HomoglyphTo}') AS c1
         |   FROM z),
         | q AS (SELECT doc_id, t,
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |      c1, '!{3,}', '!', 'g'), '\\?{3,}', '?', 'g'), '\\.{3,}', '.', 'g'),
         |      ',{3,}', ',', 'g'), '-{3,}', '-', 'g') AS canon
         |   FROM f)
         | SELECT doc_id, canon,
         |   CAST(CASE WHEN canon <> t THEN 1 ELSE 0 END AS INTEGER) AS changed,
         |   md5(canon) AS canon_md5, CAST(length(canon) AS BIGINT) AS canon_len
         | FROM q ORDER BY doc_id""".stripMargin
    ),

    // A14 — HyperLogLog distinct 5-shingles per lang (Flajolet et al.
    // 2007): the cardinality statistic a dedup pass is SIZED with before
    // it runs. md5-derived registers so the oracle rebuilds the identical
    // sketch; the harmonic sum stays an exact integer (Σ 2^(49−ρ)); the
    // double steps (raw division, sparse-range linear counting) are
    // repeated verbatim in both engines.
    "a14_hll_distinct" -> QueryDef.sql(
      (s, d) => {
        val t = Tables(s, d).documents
          .select(col("lang"), TextOps.tokens(col("text")).as("__toks"))
        val sh = t.select(col("lang"),
          explode(TextOps.shinglesOfTokens(col("__toks"), 5)).as("__s"))
        Sketches.hllDistinct(sh, Seq("lang"), col("__s"), m = 1024)
          .orderBy("lang")
      },
      s"""WITH t AS (SELECT lang, $toksSql AS tk FROM documents),
         | sh AS (SELECT lang, unnest([array_to_string(tk[i:i+4], ' ')
         |     for i in range(1, len(tk) - 3)]) AS s FROM t),
         | hx AS (SELECT lang, md5(s) AS h FROM sh),
         | zd AS (SELECT lang, h,
         |    length(regexp_extract(substr(h, 4, 12), '^(0*)', 1)) AS z FROM hx),
         | br AS (SELECT lang, ${hexN("h", 3)} % 1024 AS b,
         |    CASE WHEN z = 12 THEN 49 ELSE 4 * z
         |      + CASE substr(substr(h, 4, 12), z + 1, 1)
         |          WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
         |          WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
         |          ELSE 0 END + 1 END AS rho
         |   FROM zd),
         | regs AS (SELECT lang, b, max(rho) AS r FROM br GROUP BY 1, 2),
         | agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS present,
         |    CAST(sum(CAST(1 AS BIGINT) << (49 - r)) AS BIGINT) AS sp
         |   FROM regs GROUP BY 1),
         | fin AS (SELECT lang, CAST(1024 AS BIGINT) AS m,
         |    CAST(1024 - present AS BIGINT) AS n_zero,
         |    CAST(sp + (1024 - present) * (CAST(1 AS BIGINT) << 49) AS BIGINT) AS harmonic
         |   FROM agg),
         | raw AS (SELECT lang, m, n_zero, harmonic,
         |    0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0
         |      * 562949953421312.0 / CAST(harmonic AS DOUBLE) AS r
         |   FROM fin)
         | SELECT lang, m, n_zero, harmonic,
         |   CASE WHEN n_zero > 0 AND r <= 2560.0
         |     THEN round(1024.0 * ln(1024.0 / CAST(n_zero AS DOUBLE)), 4)
         |     ELSE round(r, 4) END AS hll_est
         | FROM raw ORDER BY lang""".stripMargin
    ),

    // A16 — sketch-algebra corpus overlap: |A|, |B|, |A∪B| from HLL
    // registers (union = max-merge — no join of the corpora ever
    // happens) and |A∩B| by inclusion–exclusion. The sketch twin of
    // t20's exact overlap; A/B = the one-digit vs two-digit source
    // slices, per-lang 5-shingle vocabularies.
    "a16_sketch_overlap" -> QueryDef.sql(
      (s, d) => {
        val docs = Tables(s, d).documents
        def sh(side: org.apache.spark.sql.DataFrame) = {
          val t = side.select(col("lang"), TextOps.tokens(col("text")).as("__toks"))
          t.select(col("lang"),
            explode(TextOps.shinglesOfTokens(col("__toks"), 5)).as("__s"))
        }
        Sketches.hllOverlap(
            sh(docs.filter(length(col("source")) === 4)),
            sh(docs.filter(length(col("source")) === 5)),
            Seq("lang"), col("__s"), m = 1024)
          .orderBy("lang")
      },
      s"""WITH ${hllRegCtes("length(source) = 4", "a")},
         | ${hllRegCtes("length(source) = 5", "b")},
         | mregs AS (SELECT lang, b, max(r) AS r FROM (
         |    SELECT * FROM aregs UNION ALL SELECT * FROM bregs) GROUP BY 1, 2),
         | ${hllEstCtes("aregs", "ea")},
         | ${hllEstCtes("bregs", "eb")},
         | ${hllEstCtes("mregs", "eu")},
         | ov AS (SELECT u.lang,
         |    coalesce(ea.e, 0.0) AS est_a, coalesce(eb.e, 0.0) AS est_b,
         |    u.e AS est_union,
         |    round(greatest(0.0, coalesce(ea.e, 0.0) + coalesce(eb.e, 0.0) - u.e), 4)
         |      AS est_intersect
         |   FROM euest u LEFT JOIN eaest ea USING (lang)
         |   LEFT JOIN ebest eb USING (lang))
         | SELECT lang, est_a, est_b, est_union, est_intersect,
         |   CASE WHEN est_union > 0.0
         |     THEN round(est_intersect / est_union, 6) END AS jaccard_est
         | FROM ov ORDER BY lang""".stripMargin
    ),

    // A17 — mergeable bottom-k quantile sketch: per-source n_chars
    // quantiles from the k rows with the smallest md5(doc_id) — a
    // deterministic uniform sample kept by Spark's bounded top-k
    // aggregate (per-mapper state ≤ k per group, min-k semilattice
    // merge), so distribution telemetry costs one combine-friendly
    // aggregation instead of t10's corpus sort. Lower order statistics
    // at ⌊(n−1)p/100⌋, integer-exact — the oracle rebuilds the identical
    // sample and indexes.
    "a17_bottomk_quantiles" -> QueryDef.sql(
      (s, d) => Sketches.bottomKQuantiles(Tables(s, d).documents,
          groupCol = "source", valueCol = "n_chars", idCol = "doc_id", k = 64)
        .orderBy("source"),
      s"""WITH s AS (SELECT source, n_chars,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), n_chars) AS rn,
         |    count(*) OVER (PARTITION BY source) AS n_rows
         |   FROM documents),
         | samp AS (SELECT source, n_rows, n_chars FROM s WHERE rn <= 64),
         | ordered AS (SELECT source, n_rows, n_chars,
         |    row_number() OVER (PARTITION BY source ORDER BY n_chars) AS vr,
         |    count(*) OVER (PARTITION BY source) AS n_sample
         |   FROM samp)
         | SELECT source, CAST(max(n_rows) AS BIGINT) AS n_rows,
         |   CAST(max(n_sample) AS INTEGER) AS n_sample,
         |   CAST(max(CASE WHEN vr = (n_sample - 1) * 50 // 100 + 1 THEN n_chars END) AS BIGINT) AS p50,
         |   CAST(max(CASE WHEN vr = (n_sample - 1) * 90 // 100 + 1 THEN n_chars END) AS BIGINT) AS p90,
         |   CAST(max(CASE WHEN vr = (n_sample - 1) * 99 // 100 + 1 THEN n_chars END) AS BIGINT) AS p99
         | FROM ordered GROUP BY source ORDER BY source""".stripMargin
    ),

    // A15 — Count-Min heavy hitters (Cormode & Muthukrishnan 2005) for a
    // fixed probe set at φ = 1%: the frequency sketch a boilerplate /
    // stopword pass consults. The corpus pays one token-keyed rollup; the
    // d×w cell build runs on the bounded vocab relation; est = min over
    // rows is one-sided (overcount ≥ 0 always, shown alongside truth).
    "a15_cms_heavy" -> QueryDef.sql(
      (s, d) => {
        val tok = Tables(s, d).documents
          .select(explode(TextOps.tokens(col("text"))).as("__t"))
        Sketches.cmsHeavyHitters(tok, col("__t"),
            Seq("join", "hash", "dup", "the", "zzzabsent"))
          .orderBy("token")
      },
      s"""WITH tok AS (SELECT unnest($toksSql) AS v FROM documents),
         | counts AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
         | n AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM counts),
         | cells AS (SELECT j, ${hexN("md5(j || ':' || v)", 5)} % 1024 AS cell, c
         |   FROM counts, unnest(range(0, 4)) u(j)),
         | sk AS (SELECT j, cell, CAST(sum(c) AS BIGINT) AS cnt
         |   FROM cells GROUP BY 1, 2),
         | probes AS (SELECT unnest(['join','hash','dup','the','zzzabsent']) AS token),
         | pc AS (SELECT token, j, ${hexN("md5(j || ':' || token)", 5)} % 1024 AS cell
         |   FROM probes, unnest(range(0, 4)) u(j)),
         | est AS (SELECT token, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS cms_est
         |   FROM pc LEFT JOIN sk USING (j, cell) GROUP BY 1),
         | tc AS (SELECT token, CAST(coalesce(c, 0) AS BIGINT) AS true_count
         |   FROM probes LEFT JOIN counts ON v = token)
         | SELECT e.token, e.cms_est, t.true_count,
         |   e.cms_est - t.true_count AS overcount, n.total AS total_n,
         |   CAST(CASE WHEN e.cms_est * 100 >= n.total THEN 1 ELSE 0 END AS INTEGER) AS heavy
         | FROM est e JOIN tc t USING (token), n ORDER BY token""".stripMargin
    ),

    // R9 — DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    // ln(p_target/p_raw) under 1024-bucket hashed-unigram bag models,
    // target = the English slice. Bucket histograms are bounded and
    // broadcast; ln-ratio terms round at 9 decimals and sum as DECIMAL.
    "r9_dsir_weights" -> QueryDef.sql(
      (s, d) => {
        val docs = Tables(s, d).documents
        Curation.dsirWeights(docs, docs.filter(col("lang") === "en"),
            "doc_id", "text")
          .orderBy("doc_id")
      },
      s"""WITH tok AS (SELECT doc_id, lang, unnest($toksSql) AS tok FROM documents),
         | bk AS (SELECT doc_id, lang, ${hex8("md5(tok)", 0)} % 1024 AS b FROM tok),
         | th AS (SELECT b, CAST(count(*) AS BIGINT) AS tcnt FROM bk WHERE lang = 'en' GROUP BY 1),
         | rh AS (SELECT b, CAST(count(*) AS BIGINT) AS rcnt FROM bk GROUP BY 1),
         | tt AS (SELECT CAST(sum(tcnt) AS BIGINT) AS ttot FROM th),
         | rt AS (SELECT CAST(sum(rcnt) AS BIGINT) AS rtot FROM rh),
         | ratios AS (SELECT b, round(
         |     ln((CAST(coalesce(tcnt, 0) AS DOUBLE) + 1.0) / (CAST(ttot AS DOUBLE) + 1024))
         |   - ln((CAST(rcnt AS DOUBLE) + 1.0) / (CAST(rtot AS DOUBLE) + 1024)), 9) AS lnr
         |   FROM rh LEFT JOIN th USING (b), tt, rt),
         | dtf AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS tf FROM bk GROUP BY 1, 2)
         | SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |   CAST(sum(tf * CAST(lnr AS DECIMAL(18,9))) AS DOUBLE) AS log_weight
         | FROM dtf JOIN ratios USING (b)
         | GROUP BY 1 ORDER BY doc_id""".stripMargin
    ),

    "r1_stratified_sample" -> QueryDef.sql(
      (s, d) => Curation.stratifiedSample(Tables(s, d).documents, "doc_id", "lang",
          Map("en" -> 100, "de" -> 300, "fr" -> 300), defaultPermille = 500)
        .select("doc_id", "lang").orderBy("doc_id"),
      s"""SELECT doc_id, lang FROM documents
         | WHERE ${hex8("md5(CAST(doc_id AS VARCHAR))", 0)} % 1000 <
         |   CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 300 WHEN 'fr' THEN 300 ELSE 500 END
         | ORDER BY doc_id""".stripMargin
    ),

    // R3 — corpus mixture sampling: a 3000-token budget drawn per language
    // in hash order (the pretraining data-mixing primitive), distributed
    // two-level prefix sum underneath
    "r3_mixture_sample" -> QueryDef.sql(
      (s, d) => Curation.mixtureSample(Tables(s, d).documents, "doc_id", "lang",
          TextOps.tokenCount(col("text")), tokenBudget = 3000L)
        .orderBy("doc_id"),
      s"""WITH n AS (SELECT doc_id, lang, len($toksSql) AS n_tokens,
         |    ${hex8("md5(CAST(doc_id AS VARCHAR))", 0)} % ${Dedup.MersennePrime} AS h
         |  FROM documents),
         | c AS (SELECT doc_id, lang, n_tokens,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
         |  FROM n)
         | SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
         | FROM c WHERE start < 3000 ORDER BY doc_id""".stripMargin
    ),

    // T10 — per-language exact length quantiles (rank selection,
    // percentile_disc semantics — integer-only, engine-exact)
    "t10_length_quantiles" -> QueryDef.sql(
      (s, d) => {
        val docs = Tables(s, d).documents
          .select(col("doc_id"), col("lang"), TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        Curation.groupQuantiles(docs, "lang", "n_tokens", "doc_id", Seq(0.5, 0.9, 1.0))
          .orderBy("lang")
      },
      s"""WITH n AS (SELECT lang, doc_id, len($toksSql) AS n_tokens FROM documents),
         | rk AS (SELECT lang, n_tokens,
         |    row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS r,
         |    count(*) OVER (PARTITION BY lang) AS cnt
         |  FROM n)
         | SELECT lang,
         |   max(CASE WHEN r = CAST(ceil(cnt * 0.5) AS BIGINT) THEN n_tokens END) AS p50,
         |   max(CASE WHEN r = CAST(ceil(cnt * 0.9) AS BIGINT) THEN n_tokens END) AS p90,
         |   max(CASE WHEN r = CAST(ceil(cnt * 1.0) AS BIGINT) THEN n_tokens END) AS p100
         | FROM rk GROUP BY lang ORDER BY lang""".stripMargin
    ),

    // R2 — deterministic k-per-group sample (reservoir-equivalent draw):
    // 3 customers per nation ranked by portable id-hash
    "r2_group_sample" -> QueryDef.sql(
      (s, d) => Curation.perGroupSample(Tables(s, d).customer,
          Seq("c_nationkey"), "c_custkey", k = 3)
        .select("c_nationkey", "c_custkey", "rk")
        .orderBy("c_nationkey", "rk"),
      s"""SELECT c_nationkey, c_custkey, rk FROM (
         |   SELECT c_nationkey, c_custkey,
         |     row_number() OVER (PARTITION BY c_nationkey
         |       ORDER BY ${hex8("md5(CAST(c_custkey AS VARCHAR))", 0)} % 2147483647, c_custkey) AS rk
         |   FROM customer)
         | WHERE rk <= 3 ORDER BY c_nationkey, rk""".stripMargin
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
    ),

    // M3 — audio framing: overlapping 6-byte windows every 4 bytes of the
    // 16-byte payload (3 windows: starts 0/4/8) — hop < window, the
    // STFT-style overlap sampleFrames' disjoint stride can't express
    "m3_audio_windows" -> QueryDef.sql(
      (s, d) => {
        val fake = Tables(s, d).documents
          .withColumn("payload", unhex(md5(col("text"))))
        val assets = Multimodal.toAssets(fake, "doc_id", "payload", "audio")
        Multimodal.audioWindows(assets, windowSize = 6, hop = 4)
          .select(col("asset_id"), col("win_rank"), col("start_byte"),
            lower(hex(col("window"))).as("window_hex"))
          .orderBy("asset_id", "win_rank")
      },
      """WITH w AS (SELECT doc_id, md5(text) AS m, unnest([0, 1, 2]) AS win_rank FROM documents)
        | SELECT doc_id AS asset_id, win_rank, win_rank * 4 AS start_byte,
        |   substr(m, win_rank * 4 * 2 + 1, 12) AS window_hex
        | FROM w ORDER BY asset_id, win_rank""".stripMargin
    ),

    // M2 — frame sampling: every 2nd 4-byte "frame" of a 16-byte payload,
    // one row per sampled frame. The fan-out (sequence → posexplode +
    // payload slice) is the real video-frame plumbing; the frame bytes are
    // exactly what a codec would decode.
    "m2_frame_sample" -> QueryDef.sql(
      (s, d) => {
        val fake = Tables(s, d).documents
          .withColumn("payload", unhex(md5(col("text"))))
        val assets = Multimodal.toAssets(fake, "doc_id", "payload", "video")
        Multimodal.sampleFrames(assets, frameSize = 4, step = 2)
          .select(col("asset_id"), col("frame_rank"), col("frame_idx"),
            lower(hex(col("frame"))).as("frame_hex"))
          .orderBy("asset_id", "frame_rank")
      },
      """WITH f AS (SELECT doc_id, md5(text) AS m, unnest([0, 1]) AS frame_rank FROM documents)
        | SELECT doc_id AS asset_id, frame_rank, frame_rank * 2 AS frame_idx,
        |   substr(m, frame_rank * 2 * 8 + 1, 8) AS frame_hex
        | FROM f ORDER BY asset_id, frame_rank""".stripMargin
    ),

    // M4 — ViT patch-grid geometry: patches per axis, total patch (token)
    // count, and pad-to-multiple margins from the asset metadata alone —
    // the payload column is pruned out of the scan entirely
    "m4_image_patches" -> QueryDef.sql(
      (s, d) => {
        val fake = Tables(s, d).documents
          .withColumn("payload", unhex(md5(col("text"))))
        val assets = Multimodal.toAssets(fake, "doc_id", "payload", "image")
        Multimodal.patchGrid(assets, patchSize = 16).orderBy("asset_id")
      },
      s"""WITH meta AS (SELECT doc_id AS asset_id,
         |    ${hex4("substr(md5(text),1,4)")} % 1920 AS w,
         |    ${hex4("substr(md5(text),5,4)")} % 1080 AS h
         |  FROM documents),
         | g AS (SELECT asset_id, w, h,
         |    CAST(ceil(CAST(w AS DOUBLE) / 16) AS INTEGER) AS patches_x,
         |    CAST(ceil(CAST(h AS DOUBLE) / 16) AS INTEGER) AS patches_y
         |  FROM meta WHERE w > 0 AND h > 0)
         | SELECT asset_id, patches_x, patches_y,
         |   patches_x * patches_y AS n_patches,
         |   patches_x * 16 - w AS pad_x, patches_y * 16 - h AS pad_y
         | FROM g ORDER BY asset_id""".stripMargin
    ),

    // R4 — temperature-scaled mixture weights (α = 0.5): per-source token
    // mass, upweighted toward rare sources, and the per-source slice of a
    // 1M-token budget. Decimal-carried pow and budget multiply keep the
    // result partition-order-independent and engine-exact.
    "r4_temperature_mix" -> QueryDef.sql(
      (s, d) => Curation.temperatureMixture(Tables(s, d).documents, "source",
          TextOps.tokenCount(col("text")), alpha = 0.5, tokenBudget = 1000000L)
        .orderBy("source"),
      s"""WITH per AS (SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         | p AS (SELECT source, n_tokens,
         |    CAST(round(pow(CAST(n_tokens AS DOUBLE), 0.5), 6) AS DECIMAL(28,6)) AS pp
         |  FROM per),
         | tot AS (SELECT sum(pp) AS tt FROM p),
         | w AS (SELECT source, n_tokens,
         |    round(CAST(pp AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS weight
         |  FROM p, tot),
         | a AS (SELECT source, n_tokens, weight,
         |    CAST(weight AS DECIMAL(12,6)) * 1000000 AS rawd
         |  FROM w),
         | b AS (SELECT source, n_tokens, weight,
         |    CAST(floor(rawd) AS BIGINT) AS raw,
         |    rawd - CAST(floor(rawd) AS BIGINT) AS frac
         |  FROM a),
         | e AS (SELECT greatest(0, CAST(sum(raw) AS BIGINT) - 1000000) AS x,
         |    count(*) AS n FROM b),
         | r AS (SELECT b.*, e.x, e.n,
         |    row_number() OVER (ORDER BY frac ASC, source ASC) AS rk
         |  FROM b, e)
         | SELECT source, n_tokens, weight,
         |   greatest(0, raw - x // n - (CASE WHEN rk <= x % n THEN 1 ELSE 0 END)) AS alloc_tokens
         | FROM r ORDER BY source""".stripMargin
    ),

    // R10 — data-constrained scaling planner (Muennighoff et al. 2023,
    // arXiv:2305.16264): r4's allocation extended with the repeated-epoch
    // value model D' = U·(1 + R*·(1 − e^(−R/R*))), R* = 15.39 — per
    // stratum: implied epochs and the EFFECTIVE tokens the budget buys.
    // The one transcendental (exp) re-enters through a 9-decimal gate.
    "r10_data_budget" -> QueryDef.sql(
      (s, d) => Curation.dataBudgetPlan(Tables(s, d).documents, "source",
          TextOps.tokenCount(col("text")), alpha = 0.5, tokenBudget = 1000000L)
        .orderBy("source"),
      s"""WITH per AS (SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         | p AS (SELECT source, n_tokens,
         |    CAST(round(pow(CAST(n_tokens AS DOUBLE), 0.5), 6) AS DECIMAL(28,6)) AS pp
         |  FROM per),
         | tot AS (SELECT sum(pp) AS tt FROM p),
         | w AS (SELECT source, n_tokens,
         |    round(CAST(pp AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS weight
         |  FROM p, tot),
         | a AS (SELECT source, n_tokens, weight,
         |    CAST(weight AS DECIMAL(12,6)) * 1000000 AS rawd
         |  FROM w),
         | b AS (SELECT source, n_tokens, weight,
         |    CAST(floor(rawd) AS BIGINT) AS raw,
         |    rawd - CAST(floor(rawd) AS BIGINT) AS frac
         |  FROM a),
         | e AS (SELECT greatest(0, CAST(sum(raw) AS BIGINT) - 1000000) AS x,
         |    count(*) AS n FROM b),
         | r AS (SELECT b.*, e.x, e.n,
         |    row_number() OVER (ORDER BY frac ASC, source ASC) AS rk
         |  FROM b, e),
         | al AS (SELECT source, n_tokens, weight,
         |    greatest(0, raw - x // n - (CASE WHEN rk <= x % n THEN 1 ELSE 0 END)) AS alloc_tokens
         |  FROM r),
         | ep AS (SELECT *, round(CAST(alloc_tokens AS DOUBLE)
         |      / CAST(n_tokens AS DOUBLE), 6) AS epochs FROM al),
         | g AS (SELECT *, round(exp(-greatest(0.0, epochs - 1.0) / 15.39), 9) AS e9,
         |    CAST(least(alloc_tokens, n_tokens) AS DOUBLE) AS u FROM ep),
         | f AS (SELECT *, round(u * (1.0 + 15.39 * (1.0 - e9)), 4) AS effective_tokens
         |  FROM g)
         | SELECT source, n_tokens, weight, alloc_tokens, epochs, effective_tokens,
         |   CASE WHEN alloc_tokens > 0 THEN round(effective_tokens
         |     / CAST(alloc_tokens AS DOUBLE), 6) END AS utilization
         | FROM f ORDER BY source""".stripMargin
    ),

    // R5 — leakage-safe train/val/test split: exact-dup groups (md5 of the
    // full text) follow their min-id representative into one split, so a
    // duplicated doc can never train while its twin evaluates
    "r5_leakage_split" -> QueryDef.sql(
      (s, d) => Curation.leakageSafeSplit(Tables(s, d).documents, "doc_id", "text",
          trainPermille = 900, valPermille = 50)
        .orderBy("doc_id"),
      s"""WITH rep AS (SELECT doc_id,
         |    min(doc_id) OVER (PARTITION BY md5(text)) AS rep
         |  FROM documents),
         | h AS (SELECT doc_id, rep,
         |    ${hex8("md5(CAST(rep AS VARCHAR))", 0)} % 1000 AS hv
         |  FROM rep)
         | SELECT doc_id, rep,
         |   CASE WHEN hv < 900 THEN 'train' WHEN hv < 950 THEN 'val' ELSE 'test' END AS split
         | FROM h ORDER BY doc_id""".stripMargin
    ),

    // T11 — unigram log-probability mass under the corpus' own unigram
    // distribution: the cheap perplexity proxy quality screens rank on.
    // ln(p) rounds to 9 decimals into DECIMAL before the per-doc sum
    // (exact, order-independent); the sum ships, not the mean — sum/n
    // lands on rounding half-way points where engines disagree.
    "t11_unigram_logprob" -> QueryDef.sql(
      (s, d) => Curation.unigramLogProb(Tables(s, d).documents, "doc_id", "text")
        .orderBy("doc_id"),
      s"""WITH tf AS (SELECT doc_id, tok AS term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents)
         |  GROUP BY 1, 2),
         | vocab AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY term),
         | tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab)
         | SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |   CAST(sum(tf * CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)), 9)
         |       AS DECIMAL(28,9))) AS DOUBLE) AS sum_logprob
         | FROM tf JOIN vocab USING (term), tot
         | GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ),

    // S5 — product-quantization encoding (the IVF-PQ memory tier): each
    // 64-dim vector splits into 8 subvectors, snaps to the nearest of 16
    // exact-lattice centroids per subspace, and packs nibble-per-subspace
    // into one BIGINT. Ties break to the lowest centroid index on both
    // sides (array_position / lexicographic list_min).
    "s5_pq_encode" -> QueryDef.sql(
      (s, d) => Similarity.pqEncode(Tables(s, d).embeddings, "vec_id", "embedding",
          dim = 64, m = 8, k = 16)
        .orderBy("vec_id"),
      s"""SELECT vec_id, $pqPackedSql AS pq_code
         | FROM embeddings ORDER BY vec_id""".stripMargin
    ),

    // S6 — PQ-approximate ANN by asymmetric distance (the search half of
    // IVF-PQ): the corpus ranks as 8-byte codes, probes stay raw; the
    // exact-lattice codebooks and fixed fold order make the approximate
    // distances — and hence the whole top-k — bit-identical in the oracle
    "s6_pq_adc_topk" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.pqAdcTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
          .select(col("probe_id"), col("rank").as("nn_rank"),
            col("vec_id").as("neighbor_id"), col("adist"))
          .orderBy("probe_id", "nn_rank")
      },
      s"""WITH codes AS (SELECT vec_id, $pqPackedSql AS pq_code FROM embeddings),
         | scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ${pqAdcSql("p.embedding", "c.pq_code")} AS adist
         |  FROM codes c JOIN embeddings p ON c.vec_id <> p.vec_id
         |  WHERE p.vec_id < 5)
         | SELECT probe_id, nn_rank, neighbor_id, adist FROM (
         |   SELECT probe_id, neighbor_id, adist,
         |     row_number() OVER (PARTITION BY probe_id
         |       ORDER BY adist, neighbor_id) AS nn_rank
         |   FROM scored)
         | WHERE nn_rank <= 10 ORDER BY probe_id, nn_rank""".stripMargin
    ),

    // S7 — hard-negative mining for contrastive training: per probe, the
    // top-k most-similar vectors with a DIFFERENT label (the negatives
    // that actually move a triplet/InfoNCE loss). s1's plan shape with a
    // label-inequality join condition.
    "s7_hard_negatives" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.hardNegatives(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", "label", 10)
          .select(col("probe_id"), col("rank").as("neg_rank"),
            col("vec_id").as("neighbor_id"), col("label"), col("sim"))
          .orderBy("probe_id", "neg_rank")
      },
      s"""SELECT probe_id, neg_rank, neighbor_id, label, sim FROM (
         |   SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, c.label,
         |     round(${sqlCosine("p.embedding", "c.embedding")}, 6) AS sim,
         |     row_number() OVER (PARTITION BY p.vec_id
         |       ORDER BY round(${sqlCosine("p.embedding", "c.embedding")}, 6) DESC, c.vec_id) AS neg_rank
         |   FROM embeddings p JOIN embeddings c
         |     ON c.vec_id <> p.vec_id AND c.label <> p.label
         |   WHERE p.vec_id < 5)
         | WHERE neg_rank <= 10 ORDER BY probe_id, neg_rank""".stripMargin
    ),

    // S8 — per-label centroid cohesion scores: the embedding-space quality
    // filter (each vector vs its own label's exact-decimal mean vector).
    // Bounded to vec_id < 500 so the output stays a sample, not a dump.
    "s8_centroid_scores" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.labelCentroidScores(e, "vec_id", "embedding", "label")
          .filter(col("vec_id") < 500)
          .select(col("vec_id"), col("label"), col("centroid_sim"))
          .orderBy("vec_id")
      },
      s"""WITH comps AS (SELECT label, d.i - 1 AS dim,
         |     CAST(sum(CAST(round(CAST(embedding[d.i] AS DOUBLE), 4) AS DECIMAL(38,6))) AS DOUBLE)
         |       / count(*) AS m
         |   FROM embeddings CROSS JOIN range(1, 65) AS d(i) GROUP BY 1, 2),
         | cents AS (SELECT label, list(m ORDER BY dim) AS cvec FROM comps GROUP BY label)
         | SELECT e.vec_id, e.label,
         |   round(${sqlCosine("e.embedding", "c.cvec")}, 6) AS centroid_sim
         | FROM embeddings e JOIN cents c ON e.label = c.label
         | WHERE e.vec_id < 500 ORDER BY e.vec_id""".stripMargin
    ),

    // T12 — one BPE-trainer step: the corpus collapses to a word-frequency
    // vocabulary, adjacent char pairs count weighted by word frequency,
    // and the top pairs (the next merge rules) come back. kmeansStep's
    // role for the tokenizer.
    "t12_bpe_merge_step" -> QueryDef.sql(
      (s, d) => TextOps.bpePairCounts(Tables(s, d).documents, col("text"))
        .orderBy(col("pair_freq").desc, col("pair")).limit(20),
      s"""WITH freqs AS (SELECT w, count(*) AS freq FROM
         |     (SELECT unnest($toksSql) AS w FROM documents) GROUP BY w),
         | pairs AS (SELECT freq, unnest([substr(w, i, 2) for i in range(1, len(w))]) AS pair
         |   FROM freqs WHERE len(w) >= 2)
         | SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_freq FROM pairs
         | GROUP BY pair ORDER BY pair_freq DESC, pair LIMIT 20""".stripMargin
    ),

    // T15 — the full BPE training LOOP (t12 is one step): three merge
    // rounds over the distinct-word vocab, argmax rule per round applied
    // with a greedy leftmost fold. The oracle unrolls the identical three
    // rounds as chained CTEs with the same list-fold merge application.
    "t15_bpe_train" -> QueryDef.sql(
      (s, d) => {
        import s.implicits._
        TextOps.bpeTrain(Tables(s, d).documents, col("text"), nMerges = 3)
          .toDF("step", "lhs", "rhs", "pair_freq").orderBy("step")
      },
      t15Sql
    ),

    // T16 — add-one-smoothed bigram log-prob (the perplexity proxy one
    // model order up from t11): bigram and context counts are corpus
    // re-aggregations of one tokenization; V broadcasts as a scalar.
    "t16_bigram_logprob" -> QueryDef.sql(
      (s, d) => Curation.bigramLogProb(Tables(s, d).documents, "doc_id", "text")
        .orderBy("doc_id"),
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         | bgs AS (SELECT doc_id,
         |    unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS bg
         |  FROM toks),
         | tf AS (SELECT doc_id, bg, count(*) AS tf FROM bgs GROUP BY 1, 2),
         | c2 AS (SELECT bg, CAST(sum(tf) AS BIGINT) AS c2 FROM tf GROUP BY bg),
         | uni AS (SELECT tok AS w, count(*) AS c1
         |   FROM (SELECT unnest($toksSql) AS tok FROM documents) GROUP BY 1),
         | v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
         | scored AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS nb,
         |   CAST(sum(tf * CAST(round(ln((CAST(c2 AS DOUBLE) + 1.0)
         |       / (CAST(c1 AS DOUBLE) + CAST(v AS DOUBLE))), 9)
         |     AS DECIMAL(28,9))) AS DOUBLE) AS lp
         |  FROM tf JOIN c2 USING (bg)
         |  JOIN uni ON uni.w = split_part(bg, ' ', 1), v
         |  GROUP BY doc_id)
         | SELECT d.doc_id, coalesce(s.nb, 0) AS n_bigrams,
         |   coalesce(s.lp, 0.0) AS sum_logprob
         | FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
         | ORDER BY d.doc_id""".stripMargin
    ),

    // S11 — per-dimension corpus moments (whitening/PCA prep, drift
    // monitoring): one posexplode aggregation, 64 rows out.
    // S17 — per-dimension PSI drift between a reference snapshot (even
    // vec_ids) and the current corpus (odd): the shape-change gate s11's
    // moments can't see. Fixed [-1,1) buckets, add-one smoothing, 9-decimal
    // DECIMAL terms — engine-exact.
    "s17_dim_psi" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.dimensionPsi(
          e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
          "embedding", nBuckets = 8)
          .orderBy("dim")
      },
      s"""WITH rb AS (SELECT d.i - 1 AS dim,
         |    least(greatest(CAST(floor((CAST(embedding[d.i] AS DOUBLE) + 1.0) * 4.0)
         |      AS INT), 0), 7) AS b, count(*) AS cr
         |  FROM embeddings CROSS JOIN range(1, 65) AS d(i)
         |  WHERE vec_id % 2 = 0 GROUP BY 1, 2),
         | cb AS (SELECT d.i - 1 AS dim,
         |    least(greatest(CAST(floor((CAST(embedding[d.i] AS DOUBLE) + 1.0) * 4.0)
         |      AS INT), 0), 7) AS b, count(*) AS cc
         |  FROM embeddings CROSS JOIN range(1, 65) AS d(i)
         |  WHERE vec_id % 2 = 1 GROUP BY 1, 2),
         | grid AS (SELECT dm.i - 1 AS dim, CAST(bk.j AS INT) AS b
         |  FROM range(1, 65) dm(i) CROSS JOIN range(0, 8) bk(j)),
         | f AS (SELECT g.dim, g.b,
         |    coalesce(rb.cr, 0) AS cr, coalesce(cb.cc, 0) AS cc
         |  FROM grid g
         |  LEFT JOIN rb ON g.dim = rb.dim AND g.b = rb.b
         |  LEFT JOIN cb ON g.dim = cb.dim AND g.b = cb.b),
         | t AS (SELECT dim, b, cr, cc,
         |    sum(cr) OVER (PARTITION BY dim) + 8 AS nr,
         |    sum(cc) OVER (PARTITION BY dim) + 8 AS nc FROM f),
         | terms AS (SELECT dim, nr, nc,
         |    CAST(round((CAST(cc + 1 AS DOUBLE) / CAST(nc AS DOUBLE)
         |        - CAST(cr + 1 AS DOUBLE) / CAST(nr AS DOUBLE))
         |      * ln(CAST((cc + 1) * nr AS DOUBLE) / CAST((cr + 1) * nc AS DOUBLE)),
         |      9) AS DECIMAL(18,9)) AS term
         |  FROM t)
         | SELECT dim, CAST(nr - 8 AS BIGINT) AS n_ref, CAST(nc - 8 AS BIGINT) AS n_cur,
         |   round(CAST(sum(term) AS DOUBLE), 6) AS psi
         | FROM terms GROUP BY 1, 2, 3 ORDER BY dim""".stripMargin
    ),

    // S18 — dominant Gram direction via two deterministic power-iteration
    // steps (seed e0, no RNG): the anisotropy diagnostic (Ethayarajh
    // 2019) — when mass_frac is large, cosine degrades and whitening is
    // warranted. Every aggregation is exact DECIMAL (components at 4
    // decimals, v1/t/u re-enter through the 9-decimal gate), so partition
    // order moves nothing and the oracle repeats the arithmetic verbatim.
    "s18_power_iteration" -> QueryDef.sql(
      (s, d) => Similarity.powerIterationTop(Tables(s, d).embeddings, "embedding")
        .orderBy("dim"),
      s"""WITH ex AS (SELECT vec_id, d.i - 1 AS dim,
         |    CAST(round(CAST(embedding[d.i] AS DOUBLE), 4) AS DECIMAL(18,4)) AS e4,
         |    CAST(round(CAST(embedding[1] AS DOUBLE), 4) AS DECIMAL(18,4)) AS x0
         |   FROM embeddings CROSS JOIN range(1, 65) AS d(i)),
         | w AS (SELECT dim,
         |    CAST(sum(CAST(e4 * x0 AS DECIMAL(28,8))) AS DECIMAL(19,8)) AS wd,
         |    sum(CAST(e4 * e4 AS DECIMAL(28,8))) AS trd
         |   FROM ex GROUP BY 1),
         | scal AS (SELECT sum(CAST(wd * wd AS DECIMAL(38,16))) AS wn2,
         |    CAST(sum(trd) AS DECIMAL(38,8)) AS trace FROM w),
         | v1 AS (SELECT dim, CAST(CASE WHEN wn2 > 0 THEN round(CAST(wd AS DOUBLE)
         |      / sqrt(CAST(wn2 AS DOUBLE)), 9) ELSE 0.0 END AS DECIMAL(18,9)) AS v1d
         |   FROM w, scal),
         | t AS (SELECT vec_id, CAST(round(CAST(
         |      sum(CAST(e4 * v1d AS DECIMAL(38,13))) AS DOUBLE), 9) AS DECIMAL(18,9)) AS td
         |   FROM ex JOIN v1 USING (dim) GROUP BY 1),
         | u AS (SELECT dim, CAST(round(CAST(
         |      sum(CAST(e4 * td AS DECIMAL(38,13))) AS DOUBLE), 9) AS DECIMAL(18,9)) AS ud
         |   FROM ex JOIN t USING (vec_id) GROUP BY 1),
         | un AS (SELECT sum(CAST(ud * ud AS DECIMAL(38,18))) AS un2 FROM u)
         | SELECT v1.dim, CAST(v1d AS DOUBLE) AS v1,
         |   CASE WHEN un2 > 0 THEN round(CAST(ud AS DOUBLE)
         |     / sqrt(CAST(un2 AS DOUBLE)), 6) END AS v2,
         |   round(sqrt(CAST(un2 AS DOUBLE)), 6) AS lambda,
         |   CASE WHEN trace > 0 THEN round(sqrt(CAST(un2 AS DOUBLE))
         |     / CAST(trace AS DOUBLE), 6) END AS mass_frac
         | FROM v1 JOIN u USING (dim), un, scal ORDER BY dim""".stripMargin
    ),

    "s11_dim_moments" -> QueryDef.sql(
      (s, d) => Similarity.dimensionMoments(Tables(s, d).embeddings, "embedding")
        .orderBy("dim"),
      s"""SELECT d.i - 1 AS dim, CAST(count(*) AS BIGINT) AS n_vecs,
         |  round(CAST(sum(CAST(round(CAST(embedding[d.i] AS DOUBLE), 4)
         |      AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean,
         |  round(CAST(sum(CAST(round(CAST(embedding[d.i] AS DOUBLE), 4)
         |        * round(CAST(embedding[d.i] AS DOUBLE), 4)
         |      AS DECIMAL(28,8))) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    - (CAST(sum(CAST(round(CAST(embedding[d.i] AS DOUBLE), 4)
         |        AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE))
         |      * (CAST(sum(CAST(round(CAST(embedding[d.i] AS DOUBLE), 4)
         |        AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6) AS variance
         | FROM embeddings CROSS JOIN range(1, 65) AS d(i)
         | GROUP BY 1 ORDER BY dim""".stripMargin
    ),

    // T13 — per-doc lexical diversity: type-token ratio + unigram Shannon
    // entropy, the degenerate-text screens length stats miss. Entropy sums
    // carry 9-decimal DECIMAL terms so partition order cannot move the
    // double.
    "t13_lexical_diversity" -> QueryDef.sql(
      (s, d) => Curation.lexicalDiversity(Tables(s, d).documents, "doc_id", "text")
        .orderBy("doc_id"),
      s"""WITH tf AS (SELECT doc_id, tok AS term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents)
         |  GROUP BY 1, 2)
         | SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |   CAST(count(*) AS BIGINT) AS n_types,
         |   round(CAST(count(*) AS DOUBLE) / CAST(sum(tf) AS DOUBLE), 6) AS ttr,
         |   round(ln(CAST(sum(tf) AS DOUBLE))
         |     - CAST(sum(tf * CAST(round(ln(CAST(tf AS DOUBLE)), 9) AS DECIMAL(28,9))) AS DOUBLE)
         |       / CAST(sum(tf) AS DOUBLE), 6) AS entropy
         | FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ),

    // T14 — corpus vocabulary health: vocab size, hapax count, Zipf log-log
    // slope by least squares over the full rank-frequency curve. The Spark
    // side assembles the global rank two-level (per-frequency-class window
    // + spectrum offsets) — no corpus-sized relation crosses a
    // single-partition stage; the oracle's one window is DuckDB-side only.
    "t14_zipf_stats" -> QueryDef.sql(
      (s, d) => Curation.corpusZipfStats(Tables(s, d).documents, "text"),
      s"""WITH vocab AS (SELECT tok AS term, count(*) AS cnt
         |  FROM (SELECT unnest($toksSql) AS tok FROM documents) GROUP BY 1),
         | ranked AS (SELECT cnt,
         |    row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank FROM vocab),
         | terms AS (SELECT cnt,
         |    CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
         |    CAST(round(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y,
         |    CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(18,9)) AS xy,
         |    CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS xx
         |  FROM ranked)
         | SELECT CAST(count(*) AS BIGINT) AS vocab_size,
         |   CAST(sum(cnt) AS BIGINT) AS total_tokens,
         |   CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_terms,
         |   round((CAST(count(*) AS DOUBLE) * CAST(sum(xy) AS DOUBLE)
         |       - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
         |     / (CAST(count(*) AS DOUBLE) * CAST(sum(xx) AS DOUBLE)
         |       - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)), 6) AS zipf_slope
         | FROM terms""".stripMargin
    ),

    // D9 — sub-document chunk dedup: 16-token windows, keep-first-
    // occurrence (earlier doc, then earlier offset), per-doc duplicate
    // fraction. The Spark side never windows or joins on the chunk hash
    // (skew-immune min(struct) aggregation); the oracle says the same
    // thing with a window, which DuckDB may do at sf0.01.
    "d9_chunk_dedup" -> QueryDef.sql(
      (s, d) => Dedup.chunkDedup(Tables(s, d).documents, "doc_id", "text",
          chunkTokens = 16)
        .orderBy("doc_id"),
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         | chunks AS (SELECT doc_id,
         |    unnest(range(0, (len(t) - 1) // 16 + 1)) AS ci, t FROM toks),
         | hashed AS (SELECT doc_id, ci,
         |    md5(array_to_string(t[ci*16+1 : ci*16+16], ' ')) AS h FROM chunks),
         | marked AS (SELECT doc_id, ci,
         |    row_number() OVER (PARTITION BY h ORDER BY doc_id, ci) AS rn FROM hashed)
         | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |   CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
         |   round(CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |     / CAST(count(*) AS DOUBLE), 6) AS dup_fraction
         | FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ),

    // D10 — cluster-canonical selection: the post-clustering step that
    // actually drops duplicates. Every doc gets its d6 cluster (singletons
    // = own id), each cluster keeps its best copy (max n_chars, tie min
    // id). Filter is_canonical = 1 downstream to train on one copy per
    // near-dup family.
    "d10_cluster_canonical" -> QueryDef.sql(
      (s, d) => Dedup.canonicalPerCluster(Tables(s, d).documents,
          "doc_id", "text", "n_chars")
        .orderBy("doc_id"),
      s"""WITH RECURSIVE
         | ${winnowLabeledCtes(", d.n_chars")},
         | rr AS (SELECT component, doc_id AS rep_id,
         |    row_number() OVER (PARTITION BY component
         |      ORDER BY n_chars DESC, doc_id ASC) AS rn FROM labeled),
         | reps AS (SELECT component, rep_id FROM rr WHERE rn = 1)
         | SELECT l.doc_id, l.component, r.rep_id,
         |   CASE WHEN l.doc_id = r.rep_id THEN 1 ELSE 0 END AS is_canonical
         | FROM labeled l JOIN reps r USING (component) ORDER BY l.doc_id""".stripMargin
    ),

    // M5 — REAL WAV/PCM decode, distributed: payloads are valid RIFF files
    // synthesized from the md5 stream (no media fixtures in the container),
    // and the decode — magic validation, every LE header field, peak/RMS
    // over the first 64 int16 samples — is genuine byte parsing as codegen
    // column exprs. The oracle runs the identical parse over the hex
    // representation.
    "m5_wav_decode" -> QueryDef.sql(
      (s, d) => Multimodal.wavPcmStats(
          Multimodal.synthWav(Tables(s, d).documents, "doc_id", "text"),
          idCol = "doc_id", payloadCol = "payload", maxSamples = 64)
        .orderBy("doc_id"),
      m5Sql
    ),

    // M6 — REAL BMP (BI_RGB) decode, distributed: same construction as m5
    // for the image side. The 3×4 bitmap has 3 padding bytes per row, so
    // the channel means are only right if the parser walks the padded
    // bottom-up stride — a flat scan fails the hash.
    "m6_bmp_decode" -> QueryDef.sql(
      (s, d) => Multimodal.bmpPixelStats(
          Multimodal.synthBmp(Tables(s, d).documents, "doc_id", "text"),
          idCol = "doc_id", payloadCol = "payload", maxPixels = 64)
        .orderBy("doc_id"),
      m6Sql
    ),

    // M7 — REAL PNG decode: chunk walk, JDK-Inflater zlib inflate, and
    // full five-filter scanline reconstruction (the synth encoder cycles
    // None/Sub/Up/Average/Paeth per row, and splits the zlib stream over
    // two IDAT chunks). Decode inverts the filtering back to the md5
    // pixel stream, so the oracle derives the expected channel means from
    // md5 hex directly — any chunk/inflate/filter bug diverges the stats.
    "m7_png_decode" -> QueryDef.sql(
      (s, d) => Multimodal.pngPixelStats(
          Multimodal.synthPng(Tables(s, d).documents, "doc_id", "text"),
          idCol = "doc_id", payloadCol = "payload", maxPixels = 64)
        .orderBy("doc_id"),
      m7Sql
    ),

    // M8 — REAL nearest-neighbor resize behind the multimodal seam: the
    // synthesized 3×4 BMP decodes, NN-resamples to 2×2 (integer floor-
    // division sampling), re-encodes as BMP, and the column-expression BMP
    // parser reads the RESULT — so the oracle checks decode → resample →
    // encode → decode end-to-end. The expected means come from the md5
    // data hex directly: target (x,y) reads source (x·3 DIV 2, y·4 DIV 2),
    // addressed through the padded bottom-up stride.
    "m8_resize_nearest" -> QueryDef.sql(
      (s, d) => Multimodal.bmpPixelStats(
          Multimodal.resizeRgbNearest(
            Multimodal.synthBmp(Tables(s, d).documents, "doc_id", "text"),
            "doc_id", "payload", dstW = 2, dstH = 2),
          idCol = "doc_id", payloadCol = "payload", maxPixels = 64)
        .orderBy("doc_id"),
      m8Sql
    ),

    // M9 — REAL baseline JPEG decode: marker walk, canonical Huffman
    // (both Annex-K tables), DC prediction across blocks, dequant, full
    // 2-D IDCT, entropy byte-unstuffing. The synth pins the input to the
    // codec's lossless subspace (flat 8×8 blocks, flat-8 quant table →
    // DC quantizes exactly), so the oracle derives the expected gray
    // statistics straight from the md5 level stream — while the decoder
    // still runs the full transform-decode path to recover them.
    "m9_jpeg_decode" -> QueryDef.sql(
      (s, d) => Jpeg.jpegPixelStats(
          Jpeg.synthJpeg(Tables(s, d).documents, "doc_id", "text"),
          idCol = "doc_id", payloadCol = "payload")
        .orderBy("doc_id"),
      m9Sql
    ),

    // M12 — REAL MP3 (MPEG-1 Layer III) frame-header metadata: payloads
    // are valid streams synthesized from md5 nibbles in the three
    // real-world shapes (bare CBR, ID3v2-prefixed, Xing/VBR-tagged); the
    // parser skips the synchsafe-length ID3 tag, reads sync/version/layer
    // bits, the bitrate/sample-rate tables, channel mode, frame geometry,
    // and takes the frame count from the Xing frames-field when present
    // (division math is wrong on VBR by construction) — pure integer
    // column math, no codec. The oracle rebuilds every field from the
    // SAME md5 arithmetic (ground truth, not a byte re-parse), so a
    // parser bug in any bit offset, table lookup, tag skip, or Xing
    // branch diverges the hash.
    "m12_mp3_meta" -> QueryDef.sql(
      (s, d) => Multimodal.mp3Meta(
          Multimodal.synthMp3(Tables(s, d).documents, "doc_id", "text"),
          idCol = "doc_id", payloadCol = "payload")
        .orderBy("doc_id"),
      m12Sql
    ),

    // M13 — REAL MP4/ISO-BMFF container metadata: the box walk every
    // prober performs (BE sizes, ftyp-leads validation, top-level walk to
    // moov, child walk to mvhd v0/v1 + trak count), against md5-derived
    // fixtures whose free-box size and trak-before-mvhd ordering defeat
    // fixed-offset parsing. The oracle rebuilds every field from the md5
    // arithmetic — the m12 construction applied to the video tier.
    "m13_mp4_meta" -> QueryDef.sql(
      (s, d) => Multimodal.mp4Meta(
          Multimodal.synthMp4(Tables(s, d).documents, "doc_id", "text"),
          idCol = "doc_id", payloadCol = "payload")
        .orderBy("doc_id"),
      m13Sql
    ),

    // M15 — MP4 sample-table frame index: the stts/stsz/stco walk a video
    // sampler performs BEFORE any codec — which bytes are frame i and
    // when it plays. One row per sample with absolute file offset
    // (stco chunk base + running size sum, against REAL synth geometry),
    // dts (running stts deltas over two runs) and integer-exact dts_ms.
    // The oracle rebuilds the whole index arithmetically from md5(text),
    // including the stco base closed form — any box-layout drift in the
    // synth or any walk bug hash-fails here.
    "m15_mp4_samples" -> QueryDef.sql(
      (s, d) => Multimodal.mp4SampleIndex(
          Multimodal.synthMp4(Tables(s, d).documents, "doc_id", "text"),
          idCol = "doc_id", payloadCol = "payload")
        .orderBy("doc_id", "sample_idx"),
      {
        def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
        s"""WITH p AS (SELECT doc_id, md5(text) AS h FROM documents),
           | geo AS (SELECT doc_id, h,
           |    CASE ${nib(9)} % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END AS ts,
           |    2 + ${nib(10)} % 4 AS n1, 1 + ${nib(11)} % 4 AS n2,
           |    100 + 10 * ${nib(12)} AS d1, 100 + 10 * ${nib(13)} AS d2,
           |    408 + ${nib(8)} + 4 * (3 + ${nib(10)} % 4 + ${nib(11)} % 4)
           |      + 100 * (${nib(6)} % 3) AS base
           |   FROM p),
           | sm AS (SELECT doc_id, ts, n1, d1, d2, base, h, i
           |   FROM geo, unnest(range(0, n1 + n2)) u(i)),
           | sz AS (SELECT doc_id, ts, n1, d1, d2, base, i,
           |    64 + 4 * (instr('0123456789abcdef',
           |        substr(h, ((14 + i) % 32) + 1, 1)) - 1) AS size
           |   FROM sm),
           | os AS (SELECT *, base + coalesce(sum(size) OVER (PARTITION BY doc_id
           |      ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
           |    CASE WHEN i < n1 THEN i * d1 ELSE n1 * d1 + (i - n1) * d2 END AS dts
           |   FROM sz)
           | SELECT doc_id, CAST(i AS BIGINT) AS sample_idx, CAST(size AS BIGINT) AS size,
           |   CAST(off AS BIGINT) AS offset, CAST(dts AS BIGINT) AS dts,
           |   CAST(dts * 1000 // ts AS BIGINT) AS dts_ms, CAST(ts AS BIGINT) AS timescale
           | FROM os ORDER BY doc_id, sample_idx""".stripMargin
      }
    ),

    // M16 — REAL compressed-audio → PCM decode: single-frame FLAC streams
    // (fixed-prediction subset — every constant spec-formulaic, unlike the
    // table-bound MP3 synthesis path; see operators/Flac.scala scaladoc)
    // synthesized from md5 nibbles, decoded through the full bitstream
    // machinery (CRC-8/CRC-16 verification, Rice entropy decode,
    // polynomial predictor reconstruction). The oracle re-derives the PCM
    // stats from the SAME md5 arithmetic (ground truth, not a byte
    // re-parse): the weighted checksum pins every sample's position, so a
    // single Rice/prediction/CRC bug anywhere fails the hash.
    "m16_flac_decode" -> QueryDef.sql(
      (s, d) => Flac.flacPcmStats(
          Flac.synthFlac(Tables(s, d).documents, "doc_id", "text"),
          idCol = "doc_id", payloadCol = "payload")
        .orderBy("doc_id"),
      {
        def nib(expr: String) = s"(instr('0123456789abcdef', $expr) - 1)"
        s"""WITH p AS (SELECT doc_id, md5(text) AS h FROM documents),
           | s AS (SELECT doc_id, i,
           |    ${nib("substr(h, CAST(i AS INT) + 1, 1)")} * 4096 - 30000 AS v
           |   FROM p, unnest(range(0, 32)) u(i)),
           | agg AS (SELECT doc_id,
           |    CAST(sum(v) AS BIGINT) AS sum_pcm,
           |    CAST(min(v) AS BIGINT) AS min_pcm,
           |    CAST(max(v) AS BIGINT) AS max_pcm,
           |    CAST(sum((i + 1) * v) AS BIGINT) AS checksum
           |   FROM s GROUP BY doc_id)
           | SELECT p.doc_id, 1 AS valid,
           |   CAST(CASE ${nib("substr(h, 2, 1)")} % 4
           |     WHEN 0 THEN 8000 WHEN 1 THEN 16000
           |     WHEN 2 THEN 32000 ELSE 48000 END AS BIGINT) AS sample_rate,
           |   1 AS channels, 16 AS bps, CAST(32 AS BIGINT) AS n_samples,
           |   sum_pcm, min_pcm, max_pcm, checksum
           | FROM p JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin
      }
    ),

    // M17 — REAL video decode: MJPEG-in-AVI. The RIFF/AVI container walk
    // (chunk sizes, LIST nesting, avih timing/geometry, movi frame chunks
    // with even padding, idx1 cross-check) feeds every frame through the
    // REAL baseline JPEG decoder (m9's machinery — Huffman, dequant,
    // IDCT); per-frame rows carry integer-exact presentation times and
    // gray stats. Frames sit in m9's lossless subspace so the oracle
    // re-derives everything from md5 arithmetic while the engine decodes
    // actual bytes. Closes the video tier of the decode family with zero
    // invented tables (see Mjpeg.scala scaladoc for why H.26x/VPx stay
    // out of honest reach).
    "m17_mjpeg_video" -> QueryDef.sql(
      (s, d) => Mjpeg.mjpegFrameStats(
          Mjpeg.synthMjpegAvi(Tables(s, d).documents, "doc_id", "text"),
          idCol = "doc_id", payloadCol = "payload")
        .orderBy("doc_id", "frame_idx"),
      {
        def nib(expr: String) = s"(instr('0123456789abcdef', $expr) - 1)"
        s"""WITH p AS (SELECT doc_id, text, md5(text || 'v0') AS h FROM documents),
           | geo AS (SELECT doc_id, text,
           |    2 + ${nib("substr(h, 3, 1)")} % 3 AS n_frames,
           |    CASE ${nib("substr(h, 1, 1)")} % 4
           |      WHEN 0 THEN 100000 WHEN 1 THEN 40000
           |      WHEN 2 THEN 33333 ELSE 16666 END AS us
           |   FROM p),
           | fr AS (SELECT doc_id, us, CAST(f AS BIGINT) AS f,
           |    md5(text || 'v' || CAST(f AS VARCHAR)) AS h
           |   FROM geo, unnest(range(0, n_frames)) u(f)),
           | lv AS (SELECT doc_id, us, f,
           |    list_transform(range(0, 4), i ->
           |      ${hex2("substr(h, 2*(i + 1) - 1, 2)")}) AS ls FROM fr)
           | SELECT doc_id, CAST(1 AS INTEGER) AS valid, f AS frame_idx,
           |   CAST(f * us // 1000 AS BIGINT) AS pts_ms,
           |   CAST(1 AS INTEGER) AS frame_valid,
           |   CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
           |   round(CAST(list_reduce(ls, (a, b) -> a + b) AS DOUBLE) / 4.0, 6)
           |     AS mean_gray,
           |   CAST(list_min(ls) AS INTEGER) AS min_gray,
           |   CAST(list_max(ls) AS INTEGER) AS max_gray
           | FROM lv ORDER BY doc_id, frame_idx""".stripMargin
      }
    ),

    // D11 — duplicate-cluster size histogram: the release-report telemetry
    // for how duplicated the corpus is (singletons included) and how much
    // a keep-one pass removes. Same CC closure as d6/d10, two more aggs.
    "d11_cluster_sizes" -> QueryDef.sql(
      (s, d) => Dedup.clusterSizeHistogram(Tables(s, d).documents, "doc_id", "text")
        .orderBy("cluster_size"),
      s"""WITH RECURSIVE
         | ${winnowLabeledCtes()},
         | sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
         |   FROM labeled GROUP BY component)
         | SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |   CAST(cluster_size * count(*) AS BIGINT) AS n_docs
         | FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin
    ),

    // S10 — int8 scalar quantization (the SQ8 tier between raw floats and
    // s5's PQ codes) + per-vector reconstruction error. code_sum is the
    // exact integer checksum of all 64 codes, so a single rounding
    // disagreement anywhere fails the compare.
    "s10_int8_quantize" -> QueryDef.sql(
      (s, d) => Similarity.int8Quantize(Tables(s, d).embeddings, "vec_id", "embedding")
        .orderBy("vec_id"),
      s"""WITH v AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         | s AS (SELECT vec_id, v,
         |    coalesce(list_max(list_transform(v, x -> abs(x))), 0.0) AS maxabs FROM v),
         | q AS (SELECT vec_id, v, maxabs / 127.0 AS scale,
         |    CASE WHEN maxabs = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
         |      ELSE list_transform(v, x -> CAST(greatest(-127.0, least(127.0,
         |        round(x / (maxabs / 127.0), 0))) AS BIGINT)) END AS codes
         |  FROM s)
         | SELECT vec_id, round(scale, 9) AS scale,
         |   CAST(list_reduce(codes, (a, b) -> a + b) AS BIGINT) AS code_sum,
         |   CAST(list_min(codes) AS BIGINT) AS code_min,
         |   CAST(list_max(codes) AS BIGINT) AS code_max,
         |   round(list_reduce(list_transform(range(1, len(v) + 1),
         |       i -> (v[i] - CAST(codes[i] AS DOUBLE) * scale)
         |          * (v[i] - CAST(codes[i] AS DOUBLE) * scale)), (a, b) -> a + b)
         |     / CAST(len(v) AS DOUBLE), 9) AS mse
         | FROM q ORDER BY vec_id""".stripMargin
    ),

    // S13 — sign-quantized Hamming search with exact re-rank: the binary-
    // quantization ANN tier (16 bytes/vector). Hamming shortlists 40
    // candidates per probe over two packed BIGINT halves; exact cosine
    // re-ranks to top-10. Packing, xor, and popcount are integer-exact,
    // so the whole tier is oracle-checked.
    "s13_sign_hamming" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.signHammingTopK(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", dim = 64, rerank = 40, k = 10)
          .select(col("probe_id"), col("rank").as("nn_rank"),
            col("vec_id").as("neighbor_id"), col("hamming"), col("sim"))
          .orderBy("probe_id", "nn_rank")
      },
      s13Sql
    ),

    // S14 — Matryoshka truncation agreement: overlap@10 between the
    // full-64d and prefix-16d cosine rankings per probe, plus the MSE
    // between the similarities — the go/no-go numbers for serving a
    // truncated MRL embedding at a quarter of the index bytes.
    "s14_matryoshka" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.matryoshkaAgreement(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", prefixDim = 16, k = 10)
          .orderBy("probe_id")
      },
      s14Sql
    ),

    // D12 — semantic dedup (SemDeDup): nearest-centroid cells over the s3
    // coarse centroids, within-cell cosine ≥ τ against any smaller id
    // drops the doc. τ = 0.3 sits at this corpus's ~99th pairwise
    // percentile, so the drop set is small but non-empty.
    "d12_semdedup" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Dedup.semanticDedup(e, e.filter(col("vec_id") % 97 === 0),
            "vec_id", "embedding", tau = 0.3)
          .orderBy("vec_id")
      },
      d12Sql
    ),

    // D13 — asymmetric containment (Broder): |A∩B| / |A| over 3-shingle
    // sets for bucket-bounded candidate pairs — the quoted-wholesale
    // relation Jaccard's union denominator hides. Both directions emitted;
    // keep-the-superset dedup filters on the max.
    "d13_containment" -> QueryDef.sql(
      (s, d) => Dedup.containmentPairs(Tables(s, d).documents, "doc_id", "text",
          shingleSize = 3, minShared = 2, threshold = 0.5)
        .orderBy("id_a", "id_b"),
      d13Sql
    ),

    // D14 — chunk-level dedup's REWRITE face: remove every 16-token chunk
    // that is not the corpus-wide first occurrence of its hash, rejoin
    // the survivors in order — the operator that PRODUCES the cleaned
    // corpus where d9 only reports fractions. Exact reassembly is the
    // check: the full cleaned text hashes into the compare.
    "d14_chunk_clean" -> QueryDef.sql(
      (s, d) => Dedup.chunkClean(Tables(s, d).documents, "doc_id", "text",
          chunkTokens = 16)
        .orderBy("doc_id"),
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         | chunks AS (SELECT doc_id,
         |    unnest(range(0, (len(t) - 1) // 16 + 1)) AS ci, t FROM toks),
         | hashed AS (SELECT doc_id, ci,
         |    array_to_string(t[ci*16+1 : ci*16+16], ' ') AS chunk FROM chunks),
         | marked AS (SELECT doc_id, ci, chunk,
         |    row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, ci) AS rn
         |  FROM hashed)
         | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |   coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY ci), '')
         |     AS clean_text
         | FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ),

    // T21 — hashed linear quality-classifier inference (the fasttext-
    // shaped CCNet/FineWeb keep-score): token → feature bucket → weight →
    // sigmoid(mean). Weights are a deterministic formula of the bucket id
    // (no model artifact in the container); the whole pass is per-row
    // codegen column math — no join, no shuffle.
    "t21_quality_classifier" -> QueryDef.sql(
      (s, d) => Curation.linearQualityScore(Tables(s, d).documents, "doc_id", "text")
        .orderBy("doc_id"),
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         | w AS (SELECT doc_id, len(t) AS n,
         |    list_transform(t, tok ->
         |      CAST((${hex8("md5(tok)", 0)} % 1024) * 2654435761 % 2001 - 1000 AS DOUBLE)
         |        / 1000.0) AS ws
         |  FROM toks),
         | m AS (SELECT doc_id, n,
         |    round(list_reduce(ws, (a, b) -> a + b) / CAST(n AS DOUBLE), 9) AS margin
         |  FROM w)
         | SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, margin,
         |   round(1.0 / (1.0 + exp(-margin)), 6) AS quality_prob
         | FROM m ORDER BY doc_id""".stripMargin
    ),

    // T17 — cross-document boilerplate: 3-grams in ≥ 3 distinct docs are
    // boilerplate; per-doc positions covered by one. The template-text
    // screen per-doc quality features can't see.
    "t17_boilerplate" -> QueryDef.sql(
      (s, d) => Curation.boilerplateNgrams(Tables(s, d).documents,
          "doc_id", "text", n = 3, minDocs = 3)
        .orderBy("doc_id"),
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         | grams AS (SELECT doc_id,
         |     unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS gram
         |   FROM toks),
         | boiler AS (SELECT gram FROM (
         |     SELECT gram, count(*) AS doc_freq
         |     FROM (SELECT DISTINCT doc_id, gram FROM grams) GROUP BY 1)
         |   WHERE doc_freq >= 3),
         | perdoc AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY 1),
         | flagged AS (SELECT g.doc_id, count(*) AS boiler_grams
         |   FROM grams g JOIN boiler b USING (gram) GROUP BY 1)
         | SELECT d.doc_id, CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
         |   CAST(coalesce(f.boiler_grams, 0) AS BIGINT) AS boiler_grams,
         |   CASE WHEN coalesce(p.n_grams, 0) > 0
         |     THEN round(CAST(coalesce(f.boiler_grams, 0) AS DOUBLE)
         |       / CAST(p.n_grams AS DOUBLE), 6) END AS boiler_ratio
         | FROM documents d
         | LEFT JOIN perdoc p USING (doc_id) LEFT JOIN flagged f USING (doc_id)
         | ORDER BY doc_id""".stripMargin
    ),

    // T18 — the tokenizer lifecycle's APPLY face: per-doc BPE token count
    // under the 3 merges t15 trains (the number a pipeline budgets by).
    // Rules fold over the distinct-word vocab; the corpus pays one
    // word-keyed join. Oracle re-trains the same 3 rules (the t15 CTE
    // stack, carrying the word key) and applies the identical fold.
    "t18_bpe_apply" -> QueryDef.sql(
      (s, d) => TextOps.bpeApplyCounts(Tables(s, d).documents,
          "doc_id", col("text"), nMerges = 3)
        .orderBy("doc_id"),
      t18Sql
    ),

    // T19 — PII redaction: the pre-release scrub (emails, IPv4s, phone
    // runs → typed tags, fixed order). The corpus carries no real PII, so
    // the fixture PLANTS one of each per document from md5(text) — the
    // synthWav construction for text — and the oracle rebuilds the same
    // augmented string, redacts with the same patterns (RE2 and Java
    // regex agree on this subset), and compares the redacted fingerprint.
    "t19_pii_redact" -> QueryDef.sql(
      (s, d) => Curation.piiRedact(
          Curation.plantPii(Tables(s, d).documents, "doc_id", "text"),
          "doc_id", "text")
        .orderBy("doc_id"),
      t19Sql
    ),

    // T20 — cross-source vocabulary overlap: the mixture-design telemetry
    // (pairwise distinct-token Jaccard between sources). One (source,
    // token) dedup over the exploded corpus, then a token equi-join whose
    // fan-out is #sources² per token — never a document join.
    "t20_source_overlap" -> QueryDef.sql(
      (s, d) => Curation.sourceVocabOverlap(Tables(s, d).documents, "source", "text")
        .orderBy("source_a", "source_b"),
      s"""WITH v AS (SELECT DISTINCT source, unnest($toksSql) AS token FROM documents),
         | sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab_size
         |   FROM v GROUP BY source),
         | pairs AS (SELECT a.source AS source_a, b.source AS source_b,
         |     CAST(count(*) AS BIGINT) AS common
         |   FROM v a JOIN v b USING (token) WHERE a.source < b.source
         |   GROUP BY 1, 2)
         | SELECT source_a, source_b,
         |   sa.vocab_size AS vocab_a, sb.vocab_size AS vocab_b, common,
         |   round(CAST(common AS DOUBLE)
         |     / CAST(sa.vocab_size + sb.vocab_size - common AS DOUBLE), 6) AS jaccard
         | FROM pairs JOIN sizes sa ON sa.source = source_a
         |   JOIN sizes sb ON sb.source = source_b
         | ORDER BY source_a, source_b""".stripMargin
    ),

    // D18 — blocked record linkage: entity-resolution pairs whose
    // normalized 32-char key prefix is Jaro-Winkler ≥ 0.9, candidates from
    // aligned 8-char slice blocking (count-gated), verified by the native
    // codegen'd JaroWinklerExpr whose semantics are pinned byte-for-byte
    // to DuckDB's jaro_winkler_similarity (the oracle engine).
    "d18_record_linkage" -> QueryDef.sql(
      (s, d) => Dedup.recordLinkage(Tables(s, d).documents, "doc_id", "text")
        .orderBy("id_a", "id_b"),
      s"""WITH $linkagePairCtes
         | SELECT id_a, id_b, jw FROM lp ORDER BY id_a, id_b""".stripMargin
    ),

    // D19 — entity resolution: the d18 linkage graph closed into entities
    // (recursive-CTE transitive closure, min-id entity label), every doc
    // labeled (singletons are their own entity), entity sizes, min-id
    // member canonical — the master-record table (the d10 construction
    // over the linkage graph instead of the winnow graph).
    "d19_entity_resolution" -> QueryDef.sql(
      (s, d) => Dedup.resolveEntities(Tables(s, d).documents, "doc_id", "text")
        .orderBy("doc_id"),
      s"""WITH RECURSIVE $linkagePairCtes,
         | edges AS (SELECT id_a AS src, id_b AS dst FROM lp
         |   UNION SELECT id_b, id_a FROM lp),
         | cc(id, label) AS (
         |   SELECT src, src FROM edges
         |   UNION
         |   SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.id),
         | comp AS (SELECT id AS doc_id, min(label) AS entity_id FROM cc GROUP BY id),
         | labeled AS (SELECT d.doc_id, coalesce(c.entity_id, d.doc_id) AS entity_id
         |   FROM documents d LEFT JOIN comp c USING (doc_id)),
         | sizes AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS entity_size
         |   FROM labeled GROUP BY 1)
         | SELECT l.doc_id, l.entity_id, s.entity_size,
         |   CAST(CASE WHEN l.doc_id = l.entity_id THEN 1 ELSE 0 END AS INTEGER)
         |     AS is_canonical
         | FROM labeled l JOIN sizes s USING (entity_id) ORDER BY l.doc_id""".stripMargin
    ),

    // D20 — cluster-quality audit: per multi-member winnow cluster, the
    // verified shingle-Jaccard of each member against the min-id
    // representative (star pairs, n−1 verifications per cluster — never
    // all-pairs). The release telemetry that catches a drifting near-dup
    // pipeline; d11 counts clusters, this grades them.
    "d20_cluster_quality" -> QueryDef.sql(
      (s, d) => Dedup.clusterQuality(Tables(s, d).documents, "doc_id", "text")
        .orderBy("component"),
      s"""WITH RECURSIVE
         | ${winnowLabeledCtes()},
         | sz AS (SELECT component, count(*) AS c FROM labeled GROUP BY 1),
         | pr AS (SELECT l.component, l.doc_id FROM labeled l JOIN sz USING (component)
         |   WHERE c >= 2 AND l.doc_id <> l.component),
         | dg AS (SELECT DISTINCT doc_id,
         |    ${hex8("md5(gram)", 0)} % ${Dedup.MersennePrime} AS h
         |  FROM (SELECT doc_id, unnest([array_to_string(t[i:i+2], ' ')
         |      for i in range(1, len(t) - 1)]) AS gram
         |    FROM (SELECT doc_id, $toksSql AS t FROM documents))),
         | gsz AS (SELECT doc_id, count(*) AS s FROM dg GROUP BY doc_id),
         | iv AS (SELECT p.component, p.doc_id, count(*) AS inter
         |   FROM pr p JOIN dg a ON a.doc_id = p.component
         |   JOIN dg b ON b.doc_id = p.doc_id AND b.h = a.h
         |   GROUP BY 1, 2),
         | j AS (SELECT p.component,
         |    round(CAST(coalesce(i.inter, 0) AS DOUBLE)
         |      / CAST(sa.s + sb.s - coalesce(i.inter, 0) AS DOUBLE), 6) AS j6
         |   FROM pr p
         |   LEFT JOIN iv i ON i.component = p.component AND i.doc_id = p.doc_id
         |   JOIN gsz sa ON sa.doc_id = p.component
         |   JOIN gsz sb ON sb.doc_id = p.doc_id)
         | SELECT component, CAST(count(*) + 1 AS BIGINT) AS n_members,
         |   min(j6) AS min_jaccard,
         |   round(CAST(sum(CAST(j6 AS DECIMAL(18,6))) AS DOUBLE)
         |     / CAST(count(*) AS DOUBLE), 6) AS mean_jaccard
         | FROM j GROUP BY 1 ORDER BY component""".stripMargin
    ),

    // D15 — exact duplicated-SPAN coverage (Lee et al., arXiv:2107.06499):
    // per-doc fraction of characters inside some 20-char window that also
    // occurs in another document, overlapping windows merged to true
    // character coverage (gaps-and-islands). Sees what chunk dedup (d9)
    // can't: duplicated runs that never line up with a chunk boundary.
    "d15_dup_spans" -> QueryDef.sql(
      (s, d) => Dedup.dupSpanCoverage(Tables(s, d).documents, "doc_id", "text", k = 20)
        .orderBy("doc_id"),
      """WITH kg AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |     substr(text, CAST(i AS INT), 20) AS g
        |   FROM documents CROSS JOIN LATERAL unnest(range(1, len(text) - 18)) t(i)
        |   WHERE len(text) >= 20),
        | dg AS (SELECT DISTINCT doc_id, g FROM kg),
        | shared AS (SELECT g FROM (SELECT g, count(*) AS df FROM dg GROUP BY g)
        |   WHERE df >= 2),
        | hits AS (SELECT doc_id, pos, pos + 20 AS e FROM kg JOIN shared USING (g)),
        | isl AS (SELECT doc_id, pos, e,
        |    CASE WHEN max(e) OVER wp IS NULL OR pos > max(e) OVER wp THEN 1 ELSE 0 END AS brk
        |  FROM hits WINDOW wp AS (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        | num AS (SELECT doc_id, pos, e,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
        |  FROM isl),
        | agg AS (SELECT doc_id, isl_id, count(*) AS n, max(e) - min(pos) AS extent
        |  FROM num GROUP BY 1, 2),
        | perdoc AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_shared_grams,
        |    CAST(sum(extent) AS BIGINT) AS covered_chars FROM agg GROUP BY 1)
        | SELECT d.doc_id,
        |   CAST(coalesce(p.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
        |   CAST(coalesce(p.covered_chars, 0) AS BIGINT) AS covered_chars,
        |   round(CAST(coalesce(p.covered_chars, 0) AS DOUBLE)
        |     / greatest(CAST(len(d.text) AS DOUBLE), 1.0), 6) AS dup_span_fraction
        | FROM documents d LEFT JOIN perdoc p USING (doc_id)
        | ORDER BY doc_id""".stripMargin
    ),

    // T22 — fuzzy (edit-distance ≤ 1) self-join on the 16-char title
    // prefix via the SymSpell deletion neighborhood: candidates come from
    // an EQUI-join on deletion variants, then the exact levenshtein
    // verifies — the oracle's all-pairs distance join appears in no Spark
    // plan. Catches the near-identical-title families (re-crawls,
    // trailing-char edits) that exact dedup misses.
    "t22_fuzzy_pairs" -> QueryDef.sql(
      (s, d) => TextOps.editDistanceOnePairs(
          Tables(s, d).documents.select(col("doc_id"), substring(col("text"), 1, 16).as("title")),
          "doc_id", "title")
        .orderBy("id_a", "id_b"),
      """WITH t AS (SELECT doc_id, substr(text, 1, 16) AS ttl FROM documents)
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |   a.ttl AS key_a, b.ttl AS key_b,
        |   CAST(levenshtein(a.ttl, b.ttl) AS INTEGER) AS dist
        | FROM t a JOIN t b ON a.doc_id < b.doc_id AND levenshtein(a.ttl, b.ttl) <= 1
        | ORDER BY id_a, id_b""".stripMargin
    ),

    // M10 — audio sequency-band energies (Walsh–Hadamard filterbank) over
    // the synth WAV's first 64 PCM samples: a REAL spectral decomposition
    // in exact 64-bit integer arithmetic (±1 coefficients — no
    // transcendental ULP drift), all per-row codegen column math. The
    // cheap audio bandwidth/quality screen that runs before any expensive
    // codec work.
    "m10_wht_bands" -> QueryDef.sql(
      (s, d) => Multimodal.whtBandEnergies(
          Multimodal.synthWav(Tables(s, d).documents, "doc_id", "text"),
          idCol = "doc_id", payloadCol = "payload")
        .orderBy("doc_id", "band"),
      m10Sql
    ),

    // T23 — Unicode NFC normalization via the native NfcNormalize
    // Catalyst expression (codegen'd, no UDF): composed/decomposed glyph
    // variants break exact dedup and vocab lookup, so this is the
    // standard first text pass. The corpus is ASCII (already NFC), so the
    // fixture plants md5-derived DECOMPOSED sequences per doc; the oracle
    // rebuilds the identical string with chr() and DuckDB's nfc_normalize.
    "t23_nfc_normalize" -> QueryDef.sql(
      (s, d) => Curation.nfcNormalizeStats(
          Curation.plantDenormalized(Tables(s, d).documents, "doc_id", "text"),
          "doc_id", "text")
        .orderBy("doc_id"),
      {
        def mark(i: Int) =
          s"""CASE WHEN substr(md5(text), $i, 1) IN ('0','2','4','6','8','a','c','e')
             |  THEN 'e' || chr(769) ELSE 'o' || chr(770) END""".stripMargin
        s"""WITH planted AS (SELECT doc_id,
           |    text || ' ' || ${(1 to 4).map(mark).mkString(" || ")} AS t
           |  FROM documents),
           | n AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM planted)
           | SELECT doc_id,
           |   CAST(CASE WHEN nt = t THEN 0 ELSE 1 END AS INTEGER) AS changed,
           |   CAST(len(t) AS BIGINT) AS n_before,
           |   CAST(len(nt) AS BIGINT) AS n_after,
           |   md5(nt) AS norm_fp
           | FROM n ORDER BY doc_id""".stripMargin
      }
    ),

    // M11 — image average-hash + exact-dup grouping: the content
    // fingerprint tier for images (re-encodes/metadata edits collapse to
    // one hash). Integer-exact grayscale/mean/bits; duplicate counts via
    // the d9 groupBy-then-equi-join discipline, never a hash window.
    "m11_image_ahash" -> QueryDef.sql(
      (s, d) => Multimodal.imageAHash(
          Multimodal.synthBmp(Tables(s, d).documents, "doc_id", "text"),
          idCol = "doc_id", payloadCol = "payload")
        .orderBy("doc_id"),
      m11Sql
    ),

    // M14 — image NEAR-dup pairs: the m11 exact-hash story completed for
    // re-encodes that flip a few aHash bits. 8×8 planted ten-doc families
    // (shared base picture + deterministic white-pixel overlays; div-keyed
    // so family size — and pair count — stays constant per row at any
    // scale), pigeonhole chunk buckets + exact bit_count(xor) verify —
    // complete recall for Hamming ≤ 3, so the all-pairs oracle matches.
    "m14_image_neardup" -> QueryDef.sql(
      (s, d) => Multimodal.imageNearDups(
          Multimodal.plantNearDupImages(Tables(s, d).documents, "doc_id"),
          idCol = "doc_id", payloadCol = "payload", maxHamming = 3)
        .orderBy("id_a", "id_b"),
      m14Sql
    ),

    // S16 — IVF posting-list health: per-cell member count and cosine-to-
    // centroid distribution — the balance/tightness telemetry that says
    // when the coarse quantizer needs re-training (s4's kmeansStep).
    "s16_ivf_health" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.postingListStats(e, e.filter(col("vec_id") % 97 === 0),
            "vec_id", "embedding")
          .orderBy("centroid_id")
      },
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cvec
         |    FROM embeddings WHERE vec_id % 97 = 0),
         | assign AS (SELECT vec_id, cid, sim FROM (
         |   SELECT e.vec_id, c.cid, round(${sqlCosine("e.embedding", "c.cvec")}, 6) AS sim,
         |     row_number() OVER (PARTITION BY e.vec_id
         |       ORDER BY round(${sqlCosine("e.embedding", "c.cvec")}, 6) DESC, c.cid) AS rn
         |   FROM embeddings e CROSS JOIN cents c) WHERE rn = 1)
         | SELECT cid AS centroid_id, CAST(count(*) AS BIGINT) AS n_vectors,
         |   min(sim) AS min_sim, max(sim) AS max_sim,
         |   round(CAST(sum(CAST(sim AS DECIMAL(38,6))) AS DOUBLE)
         |     / CAST(count(*) AS DOUBLE), 6) AS avg_sim
         | FROM assign GROUP BY 1 ORDER BY centroid_id""".stripMargin
    ),

    // T26 — Flesch–Kincaid readability with the dictionary-free integer
    // syllable proxy (vowel runs, min 1) — the audience-level screen;
    // exact integer counts under a fixed three-term double formula.
    "t26_readability" -> QueryDef.sql(
      (s, d) => Curation.readabilityStats(Tables(s, d).documents, "doc_id", "text")
        .orderBy("doc_id"),
      s"""WITH s AS (SELECT doc_id, $toksSql AS t,
         |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS ns
         |  FROM documents),
         | m AS (SELECT doc_id,
         |    CAST(len(t) AS BIGINT) AS n_words,
         |    CAST(ns AS BIGINT) AS n_sentences,
         |    CAST(list_reduce(list_transform(t, w ->
         |      greatest(len(regexp_extract_all(w, '[aeiouAEIOU]+')), 1)),
         |      (a, b) -> a + b) AS BIGINT) AS n_syllables
         |  FROM s)
         | SELECT doc_id, n_words, n_sentences, n_syllables,
         |   round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         |     + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         |     - 15.59, 4) AS fk_grade
         | FROM m ORDER BY doc_id""".stripMargin
    ),

    // R6 — epoch-capped mixture allocation: r4's temperature weights
    // under the over-epoching guard (no stratum repeats beyond maxEpochs
    // passes of its own mass); forfeited budget reports as `unfilled`
    // per stratum instead of silently reassigning.
    "r6_epoch_capped_mix" -> QueryDef.sql(
      (s, d) => Curation.epochCappedMixture(Tables(s, d).documents, "source",
          TextOps.tokenCount(col("text")), alpha = 0.5, tokenBudget = 1000000L,
          maxEpochs = 4.0)
        .orderBy("source"),
      s"""WITH per AS (SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         | p AS (SELECT source, n_tokens,
         |    CAST(round(pow(CAST(n_tokens AS DOUBLE), 0.5), 6) AS DECIMAL(28,6)) AS pp
         |  FROM per),
         | tot AS (SELECT sum(pp) AS tt FROM p),
         | w AS (SELECT source, n_tokens,
         |    round(CAST(pp AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS weight
         |  FROM p, tot),
         | a AS (SELECT source, n_tokens, weight,
         |    CAST(floor(CAST(weight AS DECIMAL(12,6)) * 1000000) AS BIGINT) AS raw,
         |    CAST(floor(CAST(n_tokens AS DECIMAL(28,6)) * CAST(4.0 AS DECIMAL(12,6))) AS BIGINT) AS cap_tokens
         |  FROM w)
         | SELECT source, n_tokens, weight, cap_tokens,
         |   least(raw, cap_tokens) AS alloc_tokens,
         |   raw - least(raw, cap_tokens) AS unfilled,
         |   round(CAST(least(raw, cap_tokens) AS DOUBLE)
         |     / CAST(n_tokens AS DOUBLE), 6) AS epochs
         | FROM a ORDER BY source""".stripMargin
    ),

    // R11 — the COMPOSED end-to-end data release: Gopher+C4 quality gates
    // → robust canonicalization (tokenized ONCE) → exact dedup → near-dup
    // clustering with canonical selection → decontamination → epoch-capped
    // temperature mixture → shard-shuffle, as ONE DAG over one corpus (the
    // thing a user actually runs; operators.Release). The oracle mirrors
    // the whole composition stage-for-stage — the d2/d14 discipline at
    // pipeline scope — so a column-contract break between any two stages
    // (double tokenization, renamed ids, raw-text leak past canon) fails
    // the hash, not just a unit test.
    "r11_release_pipeline" -> QueryDef.sql(
      (s, d) => Release.releasePipeline(Tables(s, d).documents).orderBy("doc_id"),
      r11Sql
    ),

    // A18 — full-range uint256 sum + max over big-endian binary values,
    // via the native Uint256SumAgg/Uint256MaxAgg pair (exact decimal-
    // string results at ANY width — the query that retires SURVEY §7's
    // Decimal(38) ceiling). Fixture values are 96-bit md5 slices so the
    // oracle can mirror the arithmetic in HUGEINT (exact ≤ 127 bits);
    // the beyond-128-bit range is covered against BigInteger in
    // Uint256AggSpec, where no SQL engine can follow.
    "a18_uint256_sum" -> QueryDef.sql(
      (s, d) => Tables(s, d).documents
        .select(col("source"), unhex(substring(md5(col("text")), 1, 24)).as("__v"))
        .groupBy("source")
        .agg(graft.functions.Uint256Agg.sum(col("__v")).as("total_dec"),
          graft.functions.Uint256Agg.max(col("__v")).as("max_dec"))
        .orderBy("source"),
      """WITH v AS (SELECT source, list_reduce(list_transform(range(1, 25),
        |    i -> CAST(instr('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS HUGEINT)),
        |    (a, b) -> a * 16 + b) AS val
        |  FROM documents)
        | SELECT source, CAST(sum(val) AS VARCHAR) AS total_dec,
        |   CAST(max(val) AS VARCHAR) AS max_dec
        | FROM v GROUP BY source ORDER BY source""".stripMargin
    ),

    // D17 — canonical-URL dedup over messy provenance URLs (uppercase
    // hosts, utm queries, fragments, trailing slashes — md5-planted):
    // parse_url + canonicalization graded against the oracle's direct
    // ground-truth construction; grouping is one aggregation on the
    // canonical key.
    "d17_url_dedup" -> QueryDef.sql(
      (s, d) => Curation.canonicalUrlDedup(
          Curation.plantMessyUrls(Tables(s, d).documents, "doc_id", "text"),
          "doc_id", "text")
        .orderBy("doc_id"),
      """WITH hosts AS (SELECT doc_id,
        |    'https://site' || substr(md5(text), 1, 1) || '.' ||
        |    CASE WHEN substr(md5(text), 2, 1) IN ('0','2','4','6','8','a','c','e')
        |      THEN 'com' ELSE 'org' END ||
        |    '/p/' || substr(md5(text), 3, 6) AS canon_url
        |  FROM documents),
        | g AS (SELECT canon_url, CAST(count(*) AS BIGINT) AS n_docs,
        |    min(doc_id) AS rep_id FROM hosts GROUP BY 1)
        | SELECT h.doc_id, h.canon_url, g.n_docs, g.rep_id,
        |   CAST(CASE WHEN h.doc_id = g.rep_id THEN 1 ELSE 0 END AS INTEGER) AS is_canonical
        | FROM hosts h JOIN g USING (canon_url) ORDER BY h.doc_id""".stripMargin
    ),

    // D16 — WITHIN-doc repeated-span coverage, d15's self-repetition twin
    // (Lee et al. dedup across AND within documents): chars covered by a
    // 20-char window whose content already occurred earlier in the SAME
    // doc. First occurrence is a (doc, hash)-keyed min — never corpus-
    // global; spans merge via the same single-sort gaps-and-islands.
    "d16_self_repetition" -> QueryDef.sql(
      (s, d) => Dedup.selfRepetitionCoverage(Tables(s, d).documents, "doc_id", "text", k = 20)
        .orderBy("doc_id"),
      """WITH kg AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |     substr(text, CAST(i AS INT), 20) AS g
        |   FROM documents CROSS JOIN LATERAL unnest(range(1, len(text) - 18)) t(i)
        |   WHERE len(text) >= 20),
        | firsts AS (SELECT doc_id, g, min(pos) AS minpos FROM kg GROUP BY 1, 2),
        | hits AS (SELECT k.doc_id, k.pos, k.pos + 20 AS e
        |   FROM kg k JOIN firsts f ON k.doc_id = f.doc_id AND k.g = f.g
        |   WHERE k.pos > f.minpos),
        | isl AS (SELECT doc_id, pos, e,
        |    CASE WHEN max(e) OVER wp IS NULL OR pos > max(e) OVER wp THEN 1 ELSE 0 END AS brk
        |  FROM hits WINDOW wp AS (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        | num AS (SELECT doc_id, pos, e,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
        |  FROM isl),
        | agg AS (SELECT doc_id, isl_id, count(*) AS n, max(e) - min(pos) AS extent
        |  FROM num GROUP BY 1, 2),
        | perdoc AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_repeat_grams,
        |    CAST(sum(extent) AS BIGINT) AS covered_chars FROM agg GROUP BY 1)
        | SELECT d.doc_id,
        |   CAST(coalesce(p.n_repeat_grams, 0) AS BIGINT) AS n_repeat_grams,
        |   CAST(coalesce(p.covered_chars, 0) AS BIGINT) AS covered_chars,
        |   round(CAST(coalesce(p.covered_chars, 0) AS DOUBLE)
        |     / greatest(CAST(len(d.text) AS DOUBLE), 1.0), 6) AS self_rep_fraction
        | FROM documents d LEFT JOIN perdoc p USING (doc_id)
        | ORDER BY doc_id""".stripMargin
    ),

    // S15 — label-retrieval MRR: the embedding-SPACE acceptance metric
    // (first same-label neighbor's reciprocal rank), complementing the
    // index-acceptance annRecall. Broadcast probes, one corpus pass.
    "s15_label_mrr" -> QueryDef.sql(
      (s, d) => {
        val e = Tables(s, d).embeddings
        Similarity.labelMrr(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", "label")
          .orderBy("probe_id")
      },
      s"""WITH cand AS (SELECT p.vec_id AS probe_id, p.label AS probe_label,
         |    c.vec_id AS nid, c.label AS nlabel,
         |    round(${sqlCosine("p.embedding", "c.embedding")}, 6) AS sim
         |  FROM embeddings p JOIN embeddings c ON p.vec_id < 5 AND c.vec_id <> p.vec_id),
         | ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY sim DESC, nid) AS rnk FROM cand)
         | SELECT probe_id, probe_label,
         |   CAST(sum(CASE WHEN nlabel = probe_label THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant,
         |   CAST(min(CASE WHEN nlabel = probe_label THEN rnk END) AS INTEGER) AS first_rank,
         |   round(1.0 / min(CASE WHEN nlabel = probe_label THEN rnk END), 6) AS rr
         | FROM ranked GROUP BY 1, 2 ORDER BY probe_id""".stripMargin
    ),

    // T24 — per-domain rollup over planted provenance URLs: crawl
    // curation keys on the registrable host (blocklists, per-site caps,
    // diversity audits). Spark's parse_url is graded against the oracle's
    // direct md5 host construction — the parser vs the ground truth.
    "t24_domain_stats" -> QueryDef.sql(
      (s, d) => Curation.urlDomainStats(
          Curation.plantUrls(Tables(s, d).documents, "doc_id", "text"),
          "doc_id", "text", "source")
        .orderBy("host"),
      """WITH hosts AS (SELECT doc_id, source,
        |    'site' || substr(md5(text), 1, 1) || '.' ||
        |    CASE WHEN substr(md5(text), 2, 1) IN ('0','2','4','6','8','a','c','e')
        |      THEN 'com' ELSE 'org' END AS host
        |  FROM documents),
        | d AS (SELECT host, count(*) AS n_docs FROM hosts GROUP BY 1),
        | s AS (SELECT host, count(*) AS n_sources
        |   FROM (SELECT DISTINCT host, source FROM hosts) GROUP BY 1)
        | SELECT host, d.n_docs, s.n_sources FROM d JOIN s USING (host)
        | ORDER BY host""".stripMargin
    )
  )

  /** The d13 oracle: the identical 3-shingle hash sets (distinct per
    * doc), pair candidates from shared hashes with the same a < b
    * ordering, containment both ways at round-6, threshold on either
    * direction. Thresholds repeat in the WHERE (no alias references).
    */
  private def d13Sql: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       | grams AS (SELECT doc_id,
       |     [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)] AS gs
       |   FROM toks),
       | sh AS (SELECT DISTINCT doc_id,
       |     unnest([${hex8("md5(g)", 0)} % ${Dedup.MersennePrime} for g in gs]) AS sh
       |   FROM grams),
       | sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
       | shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |     CAST(count(*) AS BIGINT) AS shared
       |   FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |   GROUP BY 1, 2 HAVING count(*) >= 2)
       | SELECT id_a, id_b, shared, sa.sz AS size_a, sb.sz AS size_b,
       |   round(CAST(shared AS DOUBLE) / CAST(sa.sz AS DOUBLE), 6) AS containment_a,
       |   round(CAST(shared AS DOUBLE) / CAST(sb.sz AS DOUBLE), 6) AS containment_b
       | FROM shared JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
       | WHERE round(CAST(shared AS DOUBLE) / CAST(sa.sz AS DOUBLE), 6) >= 0.5
       |    OR round(CAST(shared AS DOUBLE) / CAST(sb.sz AS DOUBLE), 6) >= 0.5
       | ORDER BY id_a, id_b""".stripMargin

  /** The t19 oracle: identical augmentation (bytes of md5(text) as the
    * planted address/IP/phone digits) and identical redaction patterns;
    * DuckDB needs the explicit 'g' flag to match Spark's replace-all.
    */
  private def t19Sql: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\+\\d{7,}"
    def b(i: Int) = s"CAST(${hex2(s"substr(h, $i, 2)")} AS VARCHAR)"
    s"""WITH aug AS (SELECT doc_id,
       |    text || ' contact ' || substr(h, 1, 6) || '@example.com from '
       |      || ${b(7)} || '.' || ${b(9)} || '.0.' || ${b(11)}
       |      || ' call +15550' || lpad(${b(13)}, 3, '0') || lpad(${b(15)}, 3, '0') AS t
       |  FROM (SELECT doc_id, text, md5(text) AS h FROM documents)),
       | staged AS (SELECT doc_id, t,
       |    regexp_replace(t, '$email', '<EMAIL>', 'g') AS t1 FROM aug),
       | staged2 AS (SELECT doc_id, t, t1,
       |    regexp_replace(t1, '$ip', '<IP>', 'g') AS t2 FROM staged)
       | SELECT doc_id,
       |   CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
       |   CAST(len(regexp_extract_all(t1, '$ip')) AS BIGINT) AS n_ips,
       |   CAST(len(regexp_extract_all(t2, '$phone')) AS BIGINT) AS n_phones,
       |   md5(regexp_replace(t2, '$phone', '<PHONE>', 'g')) AS redacted_fp
       | FROM staged2 ORDER BY doc_id""".stripMargin
  }

  /** The t15 oracle: three unrolled BPE merge rounds. Each round's CTEs
    * mirror TextOps.bpeTrain exactly — pair counts over the vocab
    * (len ≥ 2 words only), argmax with lexicographic ties, greedy
    * leftmost merge as a list_reduce fold whose accumulator starts as the
    * first symbol wrapped in a list (equivalent to Spark's empty-init
    * fold, which can never merge into an empty accumulator).
    */
  private def t15Sql: String = {
    def round(k: Int): String = {
      val prev = s"v${k - 1}"
      s"""p$k AS (SELECT p[1] AS a, p[2] AS b, CAST(sum(freq) AS BIGINT) AS pf
         |   FROM (SELECT freq,
         |       unnest(list_transform(range(1, len(syms)), i -> [syms[i], syms[i + 1]])) AS p
         |     FROM $prev WHERE len(syms) >= 2)
         |   GROUP BY 1, 2),
         | b$k AS (SELECT a, b, pf FROM p$k ORDER BY pf DESC, a, b LIMIT 1),
         | v$k AS (SELECT v.freq,
         |     list_reduce(list_transform(v.syms, s -> [s]), (acc, x) ->
         |       CASE WHEN acc[-1] = r.a AND x[1] = r.b
         |         THEN list_append(acc[1:len(acc) - 1], r.a || r.b)
         |         ELSE list_append(acc, x[1]) END) AS syms
         |   FROM $prev v CROSS JOIN b$k r)""".stripMargin
    }
    s"""WITH freqs AS (SELECT w, count(*) AS freq
       |    FROM (SELECT unnest($toksSql) AS w FROM documents) GROUP BY w),
       | v0 AS (SELECT freq,
       |    list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)) AS syms FROM freqs),
       | ${round(1)},
       | ${round(2)},
       | ${round(3)}
       | SELECT 1 AS step, a AS lhs, b AS rhs, pf AS pair_freq FROM b1
       | UNION ALL SELECT 2, a, b, pf FROM b2
       | UNION ALL SELECT 3, a, b, pf FROM b3
       | ORDER BY step""".stripMargin
  }

  /** The t18 oracle: t15's three training rounds with the word key
    * carried through each fold, so v3 is the applied vocabulary; per-doc
    * counts join it on the word.
    */
  private def t18Sql: String = {
    def round(k: Int): String = {
      val prev = s"v${k - 1}"
      s"""p$k AS (SELECT p[1] AS a, p[2] AS b, CAST(sum(freq) AS BIGINT) AS pf
         |   FROM (SELECT freq,
         |       unnest(list_transform(range(1, len(syms)), i -> [syms[i], syms[i + 1]])) AS p
         |     FROM $prev WHERE len(syms) >= 2)
         |   GROUP BY 1, 2),
         | b$k AS (SELECT a, b, pf FROM p$k ORDER BY pf DESC, a, b LIMIT 1),
         | v$k AS (SELECT v.w, v.freq,
         |     list_reduce(list_transform(v.syms, s -> [s]), (acc, x) ->
         |       CASE WHEN acc[-1] = r.a AND x[1] = r.b
         |         THEN list_append(acc[1:len(acc) - 1], r.a || r.b)
         |         ELSE list_append(acc, x[1]) END) AS syms
         |   FROM $prev v CROSS JOIN b$k r)""".stripMargin
    }
    s"""WITH freqs AS (SELECT w, count(*) AS freq
       |    FROM (SELECT unnest($toksSql) AS w FROM documents) GROUP BY w),
       | v0 AS (SELECT w, freq,
       |    list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)) AS syms FROM freqs),
       | ${round(1)},
       | ${round(2)},
       | ${round(3)},
       | wordtok AS (SELECT w, len(syms) AS n_sym FROM v3),
       | wc AS (SELECT doc_id, w, count(*) AS n
       |   FROM (SELECT doc_id, unnest($toksSql) AS w FROM documents) GROUP BY 1, 2)
       | SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words,
       |   CAST(sum(n * n_sym) AS BIGINT) AS n_bpe_tokens,
       |   round(CAST(sum(n * n_sym) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6) AS tokens_per_word
       | FROM wc JOIN wordtok USING (w) GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** One payload byte (1-based position expression `pos`) from the hex
    * mirror column `h` — DuckDB cannot slice blobs, so every binary
    * oracle parses the hex representation: byte p = two hex digits at
    * 2p−1. Shared by the m5/m6 decode oracles. */
  private def hexByteAt(pos: String): String = hex2(s"substr(h, 2*($pos) - 1, 2)")

  /** Little-endian unsigned field of `w` bytes at 1-based `pos` over the
    * hex mirror `h` — the SQL twin of Multimodal.leUInt/leBytes. */
  private def hexLe(pos: Int, w: Int): String = (0 until w)
    .map(i => s"(${hexByteAt((pos + i).toString)}) * ${1L << (8 * i)}")
    .mkString("(", " + ", ")")

  /** The m5 oracle: the IDENTICAL WAV synthesis and parse as
    * Multimodal.synthWav/wavPcmStats, run over the hex representation:
    * little-endian fields as base-256 sums, header data_len clamped to
    * the bytes present, int16 samples sign-corrected, integer-exact sum
    * of squares before the one double sqrt.
    */
  private def m5Sql: String = {
    val hdr = graft.operators.Multimodal.wavHeaderHex(256)
    def le(pos: Int, w: Int) = hexLe(pos, w)
    def sample = s"((${hexByteAt("45 + 2*i")}) + 256 * (${hexByteAt("46 + 2*i")}))"
    s"""WITH phex AS (SELECT doc_id,
       |    '$hdr' || ${(0 until 16).map(i => s"md5(text || '$i')").mkString(" || ")} AS h
       |  FROM documents),
       | fields AS (SELECT doc_id, h,
       |    CASE WHEN substr(h, 1, 8) = '52494646' AND substr(h, 17, 8) = '57415645'
       |      AND substr(h, 25, 8) = '666d7420' AND substr(h, 73, 8) = '64617461'
       |      AND ${le(21, 2)} = 1 AND ${le(35, 2)} = 16
       |      AND ${le(23, 2)} >= 1 THEN 1 ELSE 0 END AS valid,
       |    ${le(21, 2)} AS audio_format, ${le(23, 2)} AS channels,
       |    ${le(25, 4)} AS sample_rate, ${le(35, 2)} AS bit_depth,
       |    least(${le(41, 4)}, greatest(len(h) // 2 - 44, 0)) AS data_len FROM phex),
       | counted AS (SELECT *, CASE WHEN valid = 1
       |     THEN data_len // (channels * 2) ELSE 0 END AS n_samples FROM fields),
       | sampled AS (SELECT *, CASE WHEN n_samples > 0 THEN
       |     list_transform(range(0, least(n_samples, 64)), i ->
       |       CASE WHEN $sample >= 32768 THEN $sample - 65536 ELSE $sample END)
       |     END AS s
       |   FROM counted)
       | SELECT doc_id, valid,
       |   CAST(audio_format AS BIGINT) AS audio_format,
       |   CAST(channels AS BIGINT) AS channels,
       |   CAST(sample_rate AS BIGINT) AS sample_rate,
       |   CAST(bit_depth AS BIGINT) AS bit_depth,
       |   CAST(data_len AS BIGINT) AS data_len,
       |   CAST(n_samples AS BIGINT) AS n_samples,
       |   CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT) AS peak,
       |   round(sqrt(CAST(list_reduce(list_transform(s, x -> x * x),
       |       (a, b) -> a + b) AS DOUBLE)
       |     / CAST(least(n_samples, 64) AS DOUBLE)), 6) AS rms
       | FROM sampled ORDER BY doc_id""".stripMargin
  }

  /** The m12 oracle: ground truth for the MP3 frame-header metadata,
    * rebuilt from the SAME md5 nibble arithmetic the synthesizer used —
    * not a byte re-parse — so a bit-offset or table bug in the Spark
    * parser diverges the hash while a correct parse matches exactly.
    */
  private def m12Sql: String = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(md5(text), $i, 1)) - 1)"
    // mirror of synthMp3's shape arithmetic: shape 0 bare CBR, shape 1
    // the same stream behind an ID3v2 tag of 10 + 20 + 8·nib6 bytes,
    // shape 2 a Xing frame at 320 kbps leading nf CBR data frames (the
    // Xing count nf+1 is the truth; first-frame division math is wrong)
    s"""WITH g AS (SELECT doc_id,
       |    (${nib(1)} % 14) + 1 AS bi,
       |    ${nib(2)} % 3 AS sr,
       |    ${nib(3)} % 4 AS mode,
       |    (${nib(4)} % 6) + 3 AS nf,
       |    ${nib(5)} % 3 AS shape,
       |    ${nib(6)} * 8 + 20 AS id3body
       |  FROM documents),
       | t AS (SELECT doc_id, mode, nf, shape, id3body,
       |    CASE WHEN shape = 2 THEN 320
       |      ELSE list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320], bi)
       |    END AS kbps,
       |    list_extract([44100,48000,32000], sr + 1) AS rate FROM g),
       | u AS (SELECT doc_id, mode, kbps, rate,
       |    CASE WHEN shape = 1 THEN 10 + id3body ELSE 0 END AS id3_len,
       |    CASE WHEN shape = 2 THEN 1 ELSE 0 END AS vbr,
       |    CASE WHEN shape = 2 THEN nf + 1 ELSE nf END AS n_frames
       |  FROM t)
       | SELECT doc_id, CAST(1 AS INT) AS valid,
       |   CAST(1 AS BIGINT) AS mpeg_version,
       |   CAST(3 AS BIGINT) AS layer,
       |   CAST(kbps AS BIGINT) AS bitrate_kbps,
       |   CAST(rate AS BIGINT) AS sample_rate,
       |   CAST(mode AS BIGINT) AS channel_mode,
       |   CAST(0 AS BIGINT) AS padding,
       |   CAST(id3_len AS BIGINT) AS id3_len,
       |   CAST(vbr AS BIGINT) AS vbr,
       |   CAST(144000 * kbps // rate AS BIGINT) AS frame_len,
       |   CAST(n_frames AS BIGINT) AS n_frames,
       |   CAST(n_frames * 1152000 // rate AS BIGINT) AS duration_ms
       | FROM u ORDER BY doc_id""".stripMargin
  }

  /** The m13 oracle: MP4 metadata ground truth from the synthesizer's md5
    * nibble arithmetic — grades the box walk, not a byte re-parse.
    */
  private def m13Sql: String = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(md5(text), $i, 1)) - 1)"
    s"""WITH g AS (SELECT doc_id,
       |    list_extract([600, 1000, 90000], ${nib(1)} % 3 + 1) AS ts,
       |    1000 + ${hex4("substr(md5(text), 2, 4)")} AS dur,
       |    1 + ${nib(6)} % 3 AS nt,
       |    CASE WHEN ${nib(7)} % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand
       |  FROM documents)
       | SELECT doc_id, CAST(1 AS INT) AS valid,
       |   brand AS major_brand,
       |   CAST(ts AS BIGINT) AS timescale,
       |   CAST(dur AS BIGINT) AS duration,
       |   CAST(dur * 1000 // ts AS BIGINT) AS duration_ms,
       |   CAST(nt AS BIGINT) AS n_tracks
       | FROM g ORDER BY doc_id""".stripMargin
  }

  /** The m10 oracle: the identical WAV synthesis as m5, then the same
    * 64-point Walsh–Hadamard transform and 8-band energy rollup in exact
    * integer arithmetic — sign of coefficient (i,k) is (−1)^popcount(i∧k),
    * bit_count on both engines.
    */
  private def m10Sql: String = {
    val hdr = graft.operators.Multimodal.wavHeaderHex(256)
    def sample = s"((${hexByteAt("45 + 2*i")}) + 256 * (${hexByteAt("46 + 2*i")}))"
    s"""WITH phex AS (SELECT doc_id,
       |    '$hdr' || ${(0 until 16).map(i => s"md5(text || '$i')").mkString(" || ")} AS h
       |  FROM documents),
       | sampled AS (SELECT doc_id,
       |    list_transform(range(0, 64), i ->
       |      CASE WHEN $sample >= 32768 THEN $sample - 65536 ELSE $sample END) AS s
       |  FROM phex),
       | wt AS (SELECT doc_id,
       |    list_transform(range(0, 64), k ->
       |      list_reduce(list_transform(range(0, 64), i ->
       |        CASE WHEN bit_count(i & k) % 2 = 0 THEN s[CAST(i AS INT) + 1]
       |             ELSE -s[CAST(i AS INT) + 1] END), (a, b) -> a + b)) AS w
       |  FROM sampled)
       | SELECT doc_id, CAST(b AS INT) AS band,
       |   CAST(list_reduce(list_transform(range(b * 8, b * 8 + 8), k ->
       |     w[CAST(k AS INT) + 1] * w[CAST(k AS INT) + 1]), (a, c) -> a + c) AS BIGINT) AS energy
       | FROM wt CROSS JOIN LATERAL unnest(range(0, 8)) t(b)
       | ORDER BY doc_id, band""".stripMargin
  }

  /** The m11 oracle: the identical BMP synthesis and parse as m6, then
    * the same integer aHash — gray = (b+g+r) // 3 addressed through the
    * padded bottom-up stride, integer mean, bit i set when gray_i > mean,
    * duplicate counts per hash.
    */
  /** The ground-truth aHash CTE chain shared by m11 and m14: the synthBmp
    * payload rebuilt from md5 hex, gray/mean/bit arithmetic mirrored
    * exactly, ending in `hashed(doc_id, ahash)`.
    */
  /** The ground-truth aHash CTE TAIL shared by m11 and m14: given a prior
    * CTE `phex(doc_id, h)` holding the payload hex, mirror the gray/mean/
    * bit arithmetic exactly, ending in `hashed(doc_id, ahash)`. Bit 63
    * accumulates as the two's-complement constant — a literal `1 << 63`
    * overflows DuckDB's checked signed shift.
    */
  private def ahashTail: String = {
    def byteAt(pos: String)  = hexByteAt(pos)
    def le(pos: Int, w: Int) = hexLe(pos, w)
    def s32(pos: Int) =
      s"(CASE WHEN ${le(pos, 4)} >= 2147483648 THEN ${le(pos, 4)} - 4294967296 ELSE ${le(pos, 4)} END)"
    val gray =
      s"""((${byteAt("off + (i // width) * row_size + (i % width) * 3 + 1")})
         | + (${byteAt("off + (i // width) * row_size + (i % width) * 3 + 2")})
         | + (${byteAt("off + (i // width) * row_size + (i % width) * 3 + 3")})) // 3""".stripMargin
    s"""dims AS (SELECT doc_id, h, ${s32(19)} AS width, ${s32(23)} AS height,
       |    (${s32(19)} * 3 + 3) // 4 * 4 AS row_size, ${le(11, 4)} AS off FROM phex),
       | grays AS (SELECT doc_id,
       |    list_transform(range(0, least(width * height, 64)), i -> $gray) AS g,
       |    least(width * height, 64) AS n FROM dims),
       | hashed AS (SELECT doc_id,
       |    list_reduce(list_transform(range(0, n), i ->
       |      CASE WHEN g[CAST(i AS INT) + 1] >
       |        (list_reduce(g, (a, b) -> a + b) // n)
       |      THEN (CASE WHEN CAST(i AS INT) = 63
       |        THEN CAST(-9223372036854775808 AS BIGINT)
       |        ELSE CAST(1 AS BIGINT) << CAST(i AS INT) END)
       |      ELSE CAST(0 AS BIGINT) END),
       |      (a, b) -> a + b) AS ahash
       |  FROM grays)""".stripMargin
  }

  private def m11Sql: String = {
    val hdr = graft.operators.Multimodal.bmpHeaderHex(3, 4)
    s"""WITH phex AS (SELECT doc_id,
       |    '$hdr' || md5(text || 'b0') || md5(text || 'b1') || md5(text || 'b2') AS h
       |  FROM documents),
       | $ahashTail,
       | counts AS (SELECT ahash, CAST(count(*) AS BIGINT) AS n_same_hash
       |  FROM hashed GROUP BY 1)
       | SELECT h.doc_id, h.ahash, c.n_same_hash
       | FROM hashed h JOIN counts c USING (ahash) ORDER BY h.doc_id""".stripMargin
  }

  /** The m14 oracle: rebuild the PLANTED image family construction (8×8
    * payloads keyed on doc_id // 10 so constant-size families exist, with a deterministic
    * white-pixel overlay on every third doc so nonzero-Hamming pairs
    * exist), then all-pairs Hamming over the ground-truth aHashes —
    * complete for the ≤3 threshold, so it equals the pigeonhole-bucketed
    * Spark plan exactly.
    */
  private def m14Sql: String = {
    val hdr = graft.operators.Multimodal.bmpHeaderHex(8, 8)
    val blocks = (0 until 12)
      .map(i => s"md5(CAST(doc_id // 10 AS VARCHAR) || 'b$i')").mkString(" || ")
    s"""WITH phex0 AS (SELECT doc_id,
       |    '$hdr' || $blocks AS h0,
       |    CAST(doc_id % 64 AS INT) AS p
       |  FROM documents),
       | phex AS (SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 1
       |      THEN substr(h0, 1, 108 + p * 6) || 'ffffff' || substr(h0, 108 + p * 6 + 7)
       |      ELSE h0 END AS h
       |  FROM phex0),
       | $ahashTail
       | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |   CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
       | FROM hashed a JOIN hashed b ON a.doc_id < b.doc_id
       | WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
       | ORDER BY id_a, id_b""".stripMargin
  }

  /** The m6 oracle: the identical BMP synthesis and parse as
    * Multimodal.synthBmp/bmpPixelStats over the hex representation —
    * signed LE dimensions, pixel addressing through the padded row
    * stride, integer-exact channel sums.
    */
  private def m6Sql: String = {
    val hdr = graft.operators.Multimodal.bmpHeaderHex(3, 4)
    def byteAt(pos: String)  = hexByteAt(pos)
    def le(pos: Int, w: Int) = hexLe(pos, w)
    def s32(pos: Int) =
      s"(CASE WHEN ${le(pos, 4)} >= 2147483648 THEN ${le(pos, 4)} - 4294967296 ELSE ${le(pos, 4)} END)"
    def mean(ch: Int) =
      s"""round(CAST(list_reduce(list_transform(range(0, least(n_pixels, 64)),
         |    i -> ${byteAt(s"off + (i // width) * row_size + (i % width) * 3 + $ch + 1")}),
         |  (a, b) -> a + b) AS DOUBLE) / CAST(least(n_pixels, 64) AS DOUBLE), 6)""".stripMargin
    s"""WITH phex AS (SELECT doc_id,
       |    '$hdr' || md5(text || 'b0') || md5(text || 'b1') || md5(text || 'b2') AS h
       |  FROM documents),
       | fields AS (SELECT doc_id, h,
       |    CASE WHEN substr(h, 1, 4) = '424d' AND ${le(27, 2)} = 1
       |      AND ${le(29, 2)} = 24 AND ${le(31, 4)} = 0
       |      AND ${s32(19)} > 0 AND ${s32(23)} > 0 THEN 1 ELSE 0 END AS valid,
       |    ${le(29, 2)} AS bpp, ${le(11, 4)} AS off FROM phex),
       | dims AS (SELECT *, CASE WHEN valid = 1 THEN ${s32(19)} ELSE 0 END AS width,
       |    CASE WHEN valid = 1 THEN ${s32(23)} ELSE 0 END AS height FROM fields),
       | geom AS (SELECT *, ((width * 3 + 3) // 4) * 4 AS row_size,
       |    width * height AS n_pixels FROM dims)
       | SELECT doc_id, valid,
       |   CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
       |   CAST(bpp AS BIGINT) AS bpp, CAST(row_size AS BIGINT) AS row_size,
       |   CAST(n_pixels AS BIGINT) AS n_pixels,
       |   CASE WHEN n_pixels > 0 THEN ${mean(0)} END AS mean_b,
       |   CASE WHEN n_pixels > 0 THEN ${mean(1)} END AS mean_g,
       |   CASE WHEN n_pixels > 0 THEN ${mean(2)} END AS mean_r
       | FROM geom ORDER BY doc_id""".stripMargin
  }

  /** The m7 oracle: the decoded PNG pixels ARE the md5 stream the synth
    * encoder filtered (see Multimodal.synthPng), so the expected channel
    * means come straight from the md5 hex — 5×5 RGB = 75 bytes = first
    * 75 of 5 md5 blocks; pixel k's (r, g, b) are 0-based bytes 3k,
    * 3k+1, 3k+2. n_pixels (25) is under the 64-pixel cap, so the means
    * run over every pixel; sums are integer-exact before the one
    * round(…, 6).
    */
  private def m7Sql: String = {
    def mean(ch: Int) =
      s"""round(CAST(list_reduce(list_transform(range(0, 25),
         |    k -> ${hexByteAt(s"3 * k + $ch + 1")}),
         |  (a, b) -> a + b) AS DOUBLE) / 25.0, 6)""".stripMargin
    s"""WITH phex AS (SELECT doc_id,
       |    ${(0 until 5).map(i => s"md5(text || 'p$i')").mkString(" || ")} AS h
       |  FROM documents)
       | SELECT doc_id, CAST(1 AS INTEGER) AS valid,
       |   CAST(5 AS BIGINT) AS width, CAST(5 AS BIGINT) AS height,
       |   CAST(25 AS BIGINT) AS n_pixels,
       |   ${mean(0)} AS mean_r, ${mean(1)} AS mean_g, ${mean(2)} AS mean_b
       | FROM phex ORDER BY doc_id""".stripMargin
  }

  /** The m8 oracle: NN resize of the 3×4 synth BMP to 2×2, restated over
    * the md5 data hex. Target image pixel (x, y) samples source image
    * pixel (x·3 DIV 2, y·4 DIV 2); source image row y lives in stored
    * bottom-up row 3−y, so its channel byte sits at 1-based data position
    * (3−y)·12 + x·3 + ch + 1 (rowSize 12 = 9 pixel bytes + 3 padding).
    * The output BMP is 2×2 (rowSize 8, 4 pixels, all under the 64-pixel
    * cap), and integer sums of ≤4 bytes divide exactly by 4.0.
    */
  private def m8Sql: String = {
    val (srcW, srcH, dstW, dstH, rowSize) = (3, 4, 2, 2, 12)
    def positions(ch: Int): Seq[Int] =
      for (y <- 0 until dstH; x <- 0 until dstW) yield {
        val sy = y * srcH / dstH
        val sx = x * srcW / dstW
        (srcH - 1 - sy) * rowSize + sx * 3 + ch + 1
      }
    def mean(ch: Int) =
      s"""round((${positions(ch).map(p => s"(${hexByteAt(p.toString)})").mkString(" + ")})
         |    / ${dstW * dstH}.0, 6)""".stripMargin
    s"""WITH phex AS (SELECT doc_id,
       |    md5(text || 'b0') || md5(text || 'b1') || md5(text || 'b2') AS h
       |  FROM documents)
       | SELECT doc_id, CAST(1 AS INTEGER) AS valid,
       |   CAST($dstW AS BIGINT) AS width, CAST($dstH AS BIGINT) AS height,
       |   CAST(24 AS BIGINT) AS bpp,
       |   CAST(${(dstW * 3 + 3) / 4 * 4} AS BIGINT) AS row_size,
       |   CAST(${dstW * dstH} AS BIGINT) AS n_pixels,
       |   ${mean(0)} AS mean_b, ${mean(1)} AS mean_g, ${mean(2)} AS mean_r
       | FROM phex ORDER BY doc_id""".stripMargin
  }

  /** The m9 oracle: the synth JPEG's nine 8×8 blocks carry flat gray
    * levels = the first 9 bytes of md5(text ‖ 'j0'), and the flat-8 quant
    * table makes the DC path exactly lossless — so the decoded 24×24
    * image is 64 copies of each level and the statistics restate directly
    * over the md5 hex. The mean divides the integer pixel sum by 576 in
    * the same association the Scala side uses (sum·64 / 576).
    */
  private def m9Sql: String =
    s"""WITH phex AS (SELECT doc_id, md5(text || 'j0') AS h FROM documents),
       | levels AS (SELECT doc_id,
       |    list_transform(range(0, 9), i -> ${hexByteAt("i + 1")}) AS ls FROM phex)
       | SELECT doc_id, CAST(1 AS INTEGER) AS valid,
       |   CAST(24 AS BIGINT) AS width, CAST(24 AS BIGINT) AS height,
       |   CAST(1 AS INTEGER) AS components, CAST(576 AS BIGINT) AS n_pixels,
       |   round(CAST(list_reduce(ls, (a, b) -> a + b) * 64 AS DOUBLE) / 576.0, 6)
       |     AS mean_gray,
       |   CAST(list_min(ls) AS INTEGER) AS min_gray,
       |   CAST(list_max(ls) AS INTEGER) AS max_gray
       | FROM levels ORDER BY doc_id""".stripMargin

  /** SQL mirror of PqEncode.codeWeight's argmin for subspace m over the
    * `embedding` column: lexicographic list_min over [distance, j] pairs —
    * smallest distance, ties to the lowest centroid index, exactly
    * array_position-on-first-min semantics.
    */
  private def pqCodeMSql(m: Int, vecExpr: String): String =
    s"""CAST(list_min(list_transform(range(0, 16), j ->
       |    [list_reduce(list_transform(list_transform(range(0, 8), t ->
       |         CAST($vecExpr[${m * 8} + t + 1] AS DOUBLE)
       |           - CAST((${m * 131} + j*17 + t*7) %% 19 - 9 AS DOUBLE) / 4.0),
       |       x -> x * x), (a, b) -> a + b),
       |     CAST(j AS DOUBLE)]))[2] AS BIGINT)""".stripMargin.replace("%%", "%")

  private def pqPackedSql: String = (0 until 8)
    .map(m => s"(${pqCodeMSql(m, "embedding")}) * ${math.pow(16, m).toLong}")
    .mkString("\n  + ")

  /** SQL mirror of PqEncode.adc: per-subspace inner sums over ascending t,
    * added in ascending subspace order (same FP association as the native
    * kernel's loops).
    */
  private def pqAdcSql(vecExpr: String, codeExpr: String): String =
    s"""list_reduce(list_transform(range(0, 8), m ->
       |    list_reduce(list_transform(list_transform(range(0, 8), t ->
       |        CAST($vecExpr[m*8 + t + 1] AS DOUBLE)
       |          - CAST((m*131 + (($codeExpr // CAST(round(pow(16, m), 0) AS BIGINT)) %% 16)*17 + t*7) %% 19 - 9 AS DOUBLE) / 4.0),
       |      x -> x * x), (a, b) -> a + b)), (a, b) -> a + b)""".stripMargin.replace("%%", "%")

  /** SQL mirror of Similarity.signPackHalf: bit i−`off` of the BIGINT is
    * set iff component i is strictly positive. Two 32-bit halves — a
    * 64th-bit shift range-checks as overflow in DuckDB, and the half form
    * matches the Spark packing exactly.
    */
  private def signHalfSql(vecExpr: String, from: Int, until: Int): String =
    s"""list_reduce(list_transform(range($from, $until), i ->
       |    CASE WHEN CAST($vecExpr[i] AS DOUBLE) > 0
       |      THEN (CAST(1 AS BIGINT) << (i - $from)) ELSE CAST(0 AS BIGINT) END),
       |  (a, b) -> a | b)""".stripMargin

  /** The s13 oracle: sign packing → Hamming shortlist of 40 → exact
    * cosine re-rank to top-10, every stage mirroring the Spark plan's
    * arithmetic (integer popcounts, round-6 cosine, id tiebreaks).
    */
  private def s13Sql: String =
    s"""WITH sig AS (SELECT vec_id,
       |    ${signHalfSql("embedding", 1, 33)} AS slo,
       |    ${signHalfSql("embedding", 33, 65)} AS shi
       |  FROM embeddings),
       | cand AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |    CAST(bit_count(xor(c.slo, p.slo)) + bit_count(xor(c.shi, p.shi)) AS INTEGER) AS hamming
       |  FROM sig c JOIN sig p ON p.vec_id < 5 AND c.vec_id <> p.vec_id),
       | short AS (SELECT probe_id, neighbor_id, hamming FROM (
       |    SELECT probe_id, neighbor_id, hamming,
       |      row_number() OVER (PARTITION BY probe_id ORDER BY hamming, neighbor_id) AS hr
       |    FROM cand) WHERE hr <= 40),
       | rer AS (SELECT s.probe_id, s.neighbor_id, s.hamming,
       |    round(${sqlCosine("pe.embedding", "ce.embedding")}, 6) AS sim
       |  FROM short s
       |  JOIN embeddings pe ON pe.vec_id = s.probe_id
       |  JOIN embeddings ce ON ce.vec_id = s.neighbor_id)
       | SELECT probe_id, nn_rank, neighbor_id, hamming, sim FROM (
       |   SELECT probe_id, neighbor_id, hamming, sim,
       |     row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS nn_rank
       |   FROM rer)
       | WHERE nn_rank <= 10 ORDER BY probe_id, nn_rank""".stripMargin

  /** Cosine over the first `n` dimensions only (the Matryoshka prefix). */
  private def sqlDotPrefix(a: String, b: String, n: Int): String =
    s"list_reduce(list_transform(range(1, ${n + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
  private def sqlCosinePrefix(a: String, b: String, n: Int): String =
    s"(${sqlDotPrefix(a, b, n)} / (sqrt(${sqlDotPrefix(a, a, n)}) * sqrt(${sqlDotPrefix(b, b, n)})))"

  /** The s14 oracle: full-64d and prefix-16d rankings over the same
    * candidates; overlap@10 and a DECIMAL-carried MSE.
    */
  private def s14Sql: String =
    s"""WITH cand AS (SELECT p.vec_id AS probe_id, c.vec_id AS nid,
       |    round(${sqlCosine("p.embedding", "c.embedding")}, 6) AS sim_full,
       |    round(${sqlCosinePrefix("p.embedding", "c.embedding", 16)}, 6) AS sim_trunc
       |  FROM embeddings p JOIN embeddings c ON p.vec_id < 5 AND c.vec_id <> p.vec_id),
       | ranked AS (SELECT probe_id, nid, sim_full, sim_trunc,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY sim_full DESC, nid) AS rf,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY sim_trunc DESC, nid) AS rt
       |  FROM cand)
       | SELECT probe_id, CAST(count(*) AS BIGINT) AS n_pairs,
       |   CAST(sum(CASE WHEN rf <= 10 AND rt <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       |   round(CAST(sum(CASE WHEN rf <= 10 AND rt <= 10 THEN 1 ELSE 0 END) AS DOUBLE) / 10.0, 6) AS overlap_at_k,
       |   round(CAST(sum(CAST(round(pow(sim_full - sim_trunc, 2), 12) AS DECIMAL(28,12))) AS DOUBLE)
       |     / CAST(count(*) AS DOUBLE), 6) AS mse
       | FROM ranked GROUP BY probe_id ORDER BY probe_id""".stripMargin

  /** The d12 oracle: s4's nearest-centroid assignment, then drop any
    * vector with a smaller-id same-cell neighbor at cosine ≥ 0.3.
    */
  private def d12Sql: String = {
    val cosEC = sqlCosine("e.embedding", "c.cvec")
    val cosAB = sqlCosine("a.embedding", "b.embedding")
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 97 = 0),
       | assign AS (SELECT vec_id, embedding, cid FROM (
       |   SELECT e.vec_id, e.embedding, c.cid,
       |     row_number() OVER (PARTITION BY e.vec_id
       |       ORDER BY round($cosEC, 6) DESC, c.cid) AS rn
       |   FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
       | dominated AS (SELECT DISTINCT b.vec_id
       |   FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |   WHERE round($cosAB, 6) >= 0.3)
       | SELECT a.vec_id, a.cid AS centroid_id,
       |   CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_kept
       | FROM assign a LEFT JOIN dominated d ON d.vec_id = a.vec_id
       | ORDER BY a.vec_id""".stripMargin
  }
}
