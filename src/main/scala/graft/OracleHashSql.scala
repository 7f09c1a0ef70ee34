package graft

/** DuckDB oracle SQL for the hash-based dedup/ANN/multimodal queries.
  *
  * These queries were previously rows-only checked because their results
  * depend on 64-bit hash math (FNV-1a, splitmix64, xxhash64, polynomial
  * rolling hash) that plain ANSI SQL cannot express. DuckDB can: UBIGINT
  * carries the values, xor/shift work natively, and the wrap-around 64x64
  * multiply is done in HUGEINT by splitting the left operand into 32-bit
  * halves (products stay < 2^97 < HUGEINT max). Each oracle is a single
  * `execute` payload: a macro prelude followed by the SELECT — a fully
  * independent re-implementation of the whole operator (signatures, LSH
  * banding, bucket caps, k-means, top-k) in SQL, so a hash match checks
  * every stage of the Spark plan against ground truth.
  */
object OracleHashSql {

  /** 64-bit wrap arithmetic + tokenizer/shingle macros (mirrors
    * [[graft.ops.Dedup]] hash64/mix64/shingleHashes semantics).
    */
  val prelude: String = """
CREATE OR REPLACE MACRO g_mulmod(a, b) AS CAST(
  ((CAST(a AS HUGEINT) % 4294967296) * CAST(b AS HUGEINT)
   + (((CAST(a AS HUGEINT) // 4294967296) * CAST(b AS HUGEINT)) % 4294967296) * 4294967296)
  % 18446744073709551616 AS UBIGINT);
CREATE OR REPLACE MACRO g_addmod(a, b) AS CAST(
  (CAST(a AS HUGEINT) + CAST(b AS HUGEINT)) % 18446744073709551616 AS UBIGINT);
CREATE OR REPLACE MACRO g_tosigned(u) AS CAST(
  CASE WHEN CAST(u AS HUGEINT) >= 9223372036854775808
       THEN CAST(u AS HUGEINT) - 18446744073709551616
       ELSE CAST(u AS HUGEINT) END AS BIGINT);
CREATE OR REPLACE MACRO g_tou64(s) AS CAST(
  (CAST(s AS HUGEINT) % 18446744073709551616 + 18446744073709551616)
  % 18446744073709551616 AS UBIGINT);
CREATE OR REPLACE MACRO g_mixa(x) AS g_addmod(x, 11400714819323198485);
CREATE OR REPLACE MACRO g_mixb(x) AS g_mulmod(xor(x, x >> 30), 13787848793156543929);
CREATE OR REPLACE MACRO g_mixc(x) AS g_mulmod(xor(x, x >> 27), 10723151780598845931);
CREATE OR REPLACE MACRO g_mix64(x) AS
  xor(g_mixc(g_mixb(g_mixa(x))), g_mixc(g_mixb(g_mixa(x))) >> 31);
-- BMP-ONLY: folds ord() per CODEPOINT, while the engine's Dedup.hash64
-- folds charAt per UTF-16 CODE UNIT — identical for all Basic-Multilingual-
-- Plane text (the documents fixture is pure ASCII) but divergent on
-- supplementary-plane characters (emoji, rare CJK), where the engine hashes
-- two surrogates per codepoint. Fixtures feeding hash oracles must stay BMP.
CREATE OR REPLACE MACRO g_fnv64(s) AS list_reduce(
  list_prepend(CAST(14695981039346656037 AS UBIGINT),
               list_transform(string_split(s, ''), c -> CAST(ord(c) AS UBIGINT))),
  (h, c) -> g_mulmod(xor(h, c), 1099511628211));
CREATE OR REPLACE MACRO g_toks(t) AS
  list_filter(string_split_regex(lower(t), '\W+'), x -> x <> '');
-- the rolling token hash of AiFunctions.fakeEmbed: h = 31*h + char, from
-- 1125899906842597, per UTF-16 unit (≡ codepoint for the BMP fixtures)
CREATE OR REPLACE MACRO g_embhash(s) AS list_reduce(
  list_prepend(CAST(1125899906842597 AS UBIGINT),
               list_transform(string_split(s, ''), c -> CAST(ord(c) AS UBIGINT))),
  (h, c) -> g_addmod(g_mulmod(h, 31), c));
CREATE OR REPLACE MACRO g_shingles(t, n) AS CASE
  WHEN len(g_toks(t)) = 0 THEN []
  WHEN len(g_toks(t)) < n THEN [array_to_string(g_toks(t), ' ')]
  ELSE list_distinct(list_transform(generate_series(1, len(g_toks(t)) - n + 1),
       i -> array_to_string((g_toks(t))[i:i+n-1], ' ')))
  END;
"""

  /** hash64(src) = mix64(fnv64(src)) as chained SELECT aliases: each mix step
    * is evaluated once instead of the exponential textual expansion a nested
    * macro would produce.
    */
  private def h64Chain(src: String): String =
    s"""g_fnv64($src) AS f0, g_mixa(f0) AS f1, g_mixb(f1) AS f2, g_mixc(f2) AS f3,
       |    xor(f3, f3 >> 31) AS h1""".stripMargin

  /** dot(a, b) over REAL[] columns in DOUBLE (ascending index, like the
    * Spark-side accumulation loops).
    */
  private def dot(n: Int, a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, $n), " +
      s"k -> CAST($a[k] AS DOUBLE) * CAST($b[k] AS DOUBLE)))"

  /** cosine(x, y) with 0.0 on zero norms (mirrors Similarity.cosine). */
  private def cos(n: Int, x: String, y: String): String =
    s"coalesce(((${dot(n, x, y)}) / " +
      s"CASE WHEN (${dot(n, x, x)}) = 0 OR (${dot(n, y, y)}) = 0 THEN NULL ELSE " +
      s"sqrt((${dot(n, x, x)}) * (${dot(n, y, y)})) END), 0.0)"

  /** The literal hyperplanes of [[graft.ops.Similarity.randomPlanes]] as a
    * VALUES CTE — generated from the same code, so they cannot drift.
    * Float.toString round-trips through the SQL double literal + ::REAL cast.
    */
  private def planesCte(numPlanes: Int, dim: Int, seed: Long = 42L): String = {
    val planes = graft.ops.Similarity.randomPlanes(numPlanes, dim, seed)
    val rows = planes.zipWithIndex.map { case (pl, p) =>
      "(" + p + ", [" + pl.map(f => f.toString + "::REAL").mkString(", ") + "])"
    }.mkString(",\n  ")
    s"planes(p, pl) AS (SELECT * FROM (VALUES $rows) t(p, pl))"
  }

  /** The literal ±1 sign matrix of [[graft.ops.Similarity.signProjection]]
    * as a VALUES CTE — generated from the same code, so it cannot drift
    * (the [[planesCte]] pattern).
    */
  private def signsCte(outDim: Int, dim: Int, seed: Long = 42L): String = {
    val m = graft.ops.Similarity.signProjection(outDim, dim, seed)
    val rows = m.zipWithIndex.map { case (row, p) =>
      "(" + p + ", [" + row.map(f => f.toString + "::REAL").mkString(", ") + "])"
    }.mkString(",\n  ")
    s"signs(p, s) AS (SELECT * FROM (VALUES $rows) t(p, s))"
  }

  /** JL sign-projection ANN — [[graft.ops.Similarity.projectedTopK]] end to
    * end: 16 signed dots per vector (double accumulation, REAL cast),
    * projected-space cosine top-40, exact 64-dim cosine top-10 re-rank.
    */
  val embedProjectTopk: String = prelude + "WITH " + signsCte(16, 64) + """,
qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
qp AS (SELECT list(CAST((""" + dot(64, "s", "q") + """) AS REAL) ORDER BY p) AS qp
       FROM signs, qv),
vp AS (
  SELECT e.vec_id, e.embedding,
         list(CAST((""" + dot(64, "s", "e.embedding") + """) AS REAL) ORDER BY p) AS vp
  FROM embeddings e CROSS JOIN signs GROUP BY e.vec_id, e.embedding),
cand AS (
  SELECT vec_id, embedding FROM vp, qp
  ORDER BY """ + cos(16, "vp", "qp.qp") + """ DESC, vec_id LIMIT 40)
SELECT vec_id FROM cand, qv
ORDER BY """ + cos(64, "embedding", "q") + """ DESC, vec_id LIMIT 10
"""

  /** Morton z-value layout key — [[graft.ops.Layout.zValue2]]: the same
    * shift-or-mask spread pyramid in BIGINT arithmetic (identical masks,
    * identical shifts — pure integer math, exact in any engine).
    */
  val zorderLayout: String = """
CREATE OR REPLACE MACRO g_sp0(v) AS v & 65535;
CREATE OR REPLACE MACRO g_sp1(x) AS (x | (x << 8)) & 16711935;
CREATE OR REPLACE MACRO g_sp2(x) AS (x | (x << 4)) & 252645135;
CREATE OR REPLACE MACRO g_sp3(x) AS (x | (x << 2)) & 858993459;
CREATE OR REPLACE MACRO g_sp4(x) AS (x | (x << 1)) & 1431655765;
CREATE OR REPLACE MACRO g_spread2(v) AS g_sp4(g_sp3(g_sp2(g_sp1(g_sp0(v)))));
SELECT o_orderkey,
       g_spread2(CAST(o_custkey AS BIGINT))
       | (g_spread2(CAST(date_diff('day', DATE '1992-01-01',
            CAST(o_orderdate AS DATE)) AS BIGINT)) << 1) AS zval
FROM orders
"""

  /** Multimodal stub decode: FNV-1a over the synthetic payload bytes, then
    * the width/height extraction of [[graft.ops.Multimodal.stubDecodeImage]].
    */
  /** Hybrid retrieval: the BM25 top-`kList` (its full generated SQL as a
    * subquery) and the stub-embedding cosine top-`kList` are each ranked by
    * row_number over (score DESC, id) — the engine's tie-break — then fused
    * by RRF 1/(60 + rank). The fused doubles are exact functions of small
    * integer ranks, so parity reduces to rank parity of the two lists.
    * The query vector is rendered as a REAL[] literal first (shortest-repr
    * float strings round-trip) and widened to DOUBLE[] exactly like the
    * engine widens float vectors.
    */
  def hybridRetrieval(bm25Sql: String, qvec: Array[Float],
                      kList: Int, k: Int): String = {
    val vecLit = qvec.mkString("[", ", ", "]")
    prelude + "WITH " + fakeEmbed + s""",
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ra
  FROM ($bm25Sql)),
sem AS (
  SELECT doc_id, rb FROM (
    SELECT doc_id, row_number() OVER (ORDER BY
      list_cosine_similarity(v::DOUBLE[], $vecLit::REAL[]::DOUBLE[]) DESC, doc_id) AS rb
    FROM emb) WHERE rb <= $kList)
SELECT doc_id,
  (coalesce(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(ra AS DOUBLE)), CAST(0.0 AS DOUBLE))
   + coalesce(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(rb AS DOUBLE)), CAST(0.0 AS DOUBLE))) AS rrf
FROM lex FULL OUTER JOIN sem USING (doc_id)
ORDER BY rrf DESC, doc_id LIMIT $k"""
  }

  val multimodalDecode: String = prelude + """
WITH fnv AS (
  SELECT p_partkey AS asset_id,
         g_fnv64('image-payload-' || CAST(p_partkey AS VARCHAR)) AS h
  FROM part)
SELECT asset_id,
  CAST(64 + (CASE WHEN g_tosigned(h) < 0 THEN -CAST(g_tosigned(h) AS HUGEINT)
             ELSE CAST(g_tosigned(h) AS HUGEINT) END % 1024) AS INTEGER) AS width,
  CAST(64 + ((h >> 16) % 1024) AS INTEGER) AS height,
  CAST(3 AS INTEGER) AS channels
FROM fnv
"""

  /** SimHash candidates: per-occurrence token bit votes -> 64-bit simhash ->
    * 4x16-bit pigeonhole blocks (bucket cap 64) -> pairs with hamming <= 3.
    */
  val dedupSimhash: String = prelude + """
WITH vocab AS (
  SELECT tok, """ + h64Chain("tok") + """
  FROM (SELECT DISTINCT unnest(g_toks(text)) AS tok FROM documents)),
occur AS (
  SELECT doc_id, unnest(g_toks(text)) AS tok FROM documents),
votes AS (
  SELECT o.doc_id, i.i,
         sum(CASE WHEN ((v.h1 >> i.i) & 1) = 1 THEN 1 ELSE -1 END) AS cnt
  FROM occur o JOIN vocab v USING (tok) CROSS JOIN generate_series(0, 63) i(i)
  GROUP BY o.doc_id, i.i),
sims AS (
  SELECT doc_id,
         CAST(coalesce(sum(CASE WHEN cnt > 0 THEN CAST(power(2, i) AS HUGEINT) END), 0)
              AS UBIGINT) AS sim
  FROM votes GROUP BY doc_id),
blocks AS (
  SELECT doc_id, sim, b.b, (sim >> (16 * b.b)) & CAST(65535 AS UBIGINT) AS key
  FROM sims CROSS JOIN generate_series(0, 3) b(b)),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY b, key) AS bsz FROM blocks)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.sim, y.sim)) AS INTEGER) AS hamming
FROM sized x JOIN sized y ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id
WHERE x.bsz BETWEEN 2 AND 64 AND bit_count(xor(x.sim, y.sim)) <= 3
"""

  /** MinHash signature/band CTEs (128 slots via the 2-hash trick, signed
    * mins; 32 LSH band keys) over `rel(doc_id, text)` — the shared front of
    * every minhash oracle.
    */
  private def minhashSigCtes(rel: String): String = """
sh AS (
  SELECT doc_id, """ + h64Chain("shingle") + s""",
         g_mixa(h1) AS g1, g_mixb(g1) AS g2, g_mixc(g2) AS g3,
         xor(g3, g3 >> 31) | 1 AS h2
  FROM (SELECT doc_id, unnest(g_shingles(text, 3)) AS shingle FROM $rel)),""" + """
slots AS (
  SELECT doc_id, i.i,
         min(g_tosigned(g_addmod(h1, g_mulmod(CAST(i.i AS UBIGINT), h2)))) AS slot
  FROM sh CROSS JOIN generate_series(0, 127) i(i)
  GROUP BY doc_id, i.i),
sigl AS (
  SELECT doc_id, list(g_tou64(slot) ORDER BY i) AS sig FROM slots GROUP BY doc_id),
bands AS (
  SELECT doc_id, b.b,
         list_reduce(list_prepend(CAST(b.b AS UBIGINT), sig[b.b*4+1 : b.b*4+4]),
                     (h, s) -> g_mix64(xor(h, s))) AS key
  FROM sigl CROSS JOIN generate_series(0, 31) b(b)),"""

  /** The full [[graft.ops.Dedup.minhashCandidates]] pipeline (bucket cap 64,
    * estimated-jaccard verify) as CTEs ending in `est`.
    */
  private val minhashCands: String = minhashSigCtes("documents") + """
sized AS (
  SELECT *, count(*) OVER (PARTITION BY b, key) AS bsz FROM bands),
rawpairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM sized x JOIN sized y ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id
  WHERE x.bsz BETWEEN 2 AND 64),
est AS (
  SELECT p.a, p.b,
         (count(*) FILTER (sa.slot = sb.slot)) / 128.0 AS est_jaccard
  FROM rawpairs p
  JOIN slots sa ON sa.doc_id = p.a
  JOIN slots sb ON sb.doc_id = p.b AND sb.i = sa.i
  GROUP BY p.a, p.b)
"""

  /** Count-min sketch ([[graft.ops.Sketch]]) replayed bit-for-bit: same
    * word counts, same h1/h2 hash chain (FNV+mix, the 2-hash trick), same
    * power-of-two bucket bits, same min-over-rows estimate — on the exact
    * top-20 vocabulary. A hash match proves the whole sketch (build AND
    * probe) is deterministic and engine-independent.
    */
  val vocabSketch: String = prelude + """WITH words AS (
  SELECT w AS word, count(*) AS freq FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '')) AS w
    FROM documents) GROUP BY w),
h AS (
  SELECT word, freq, """ + h64Chain("word") + """,
         g_mixa(h1) AS g1, g_mixb(g1) AS g2, g_mixc(g2) AS g3,
         xor(g3, g3 >> 31) | 1 AS h2
  FROM words),
pairs AS (
  SELECT word, freq, i.i,
         CAST(g_addmod(h1, g_mulmod(CAST(i.i AS UBIGINT), h2)) & 8191 AS BIGINT) AS bucket
  FROM h CROSS JOIN generate_series(0, 3) i(i)),
sketch AS (
  SELECT i, bucket, sum(freq) AS cnt FROM pairs GROUP BY i, bucket),
top AS (SELECT word, freq FROM words ORDER BY freq DESC, word LIMIT 20)
SELECT t.word, CAST(t.freq AS BIGINT) AS exact_cnt,
       CAST(min(s.cnt) AS BIGINT) AS est_cnt
FROM top t
JOIN pairs p ON p.word = t.word
JOIN sketch s ON s.i = p.i AND s.bucket = p.bucket
GROUP BY t.word, t.freq
"""

  /** Text similarity search ([[graft.ops.Dedup.textTopK]]): top-10 docs by
    * 128-slot MinHash agreement with doc 0's text — the query signature is
    * re-derived in SQL from the same slot CTEs, est = agreeing-slot
    * fraction (n/128, exact in both engines), ties broken by doc_id.
    */
  val textTopk: String = prelude + "WITH " + minhashSigCtes("documents") + """
q AS (SELECT i, slot FROM slots WHERE doc_id = 0),
est AS (
  SELECT s.doc_id, (count(*) FILTER (s.slot = q.slot)) / 128.0 AS est_jaccard
  FROM slots s JOIN q ON q.i = s.i
  WHERE s.doc_id <> 0
  GROUP BY s.doc_id)
SELECT doc_id, est_jaccard FROM est
ORDER BY est_jaccard DESC, doc_id LIMIT 10
"""

  /** Survivors of MinHash-LSH dedup (keep-first greedy: drop every larger id
    * of a verified pair).
    */
  val dedupMinhash: String = prelude + "WITH " + minhashCands + """
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT b FROM est WHERE est_jaccard >= 0.8)
"""

  /** MinHash candidates at est >= 0.5 verified by exact n-gram set Jaccard
    * (string shingle sets stand in for the hashed sets — same Jaccard).
    */
  val dedupNgram: String = prelude + "WITH " + minhashCands + """,
cands AS (SELECT a, b FROM est WHERE est_jaccard >= 0.5),
shs AS (SELECT doc_id, g_shingles(text, 3) AS sh FROM documents),
jac AS (
  SELECT c.a, c.b,
         len(list_filter(x.sh, e -> list_contains(y.sh, e))) AS inter,
         len(x.sh) + len(y.sh) - inter AS uni,
         CASE WHEN len(x.sh) = 0 AND len(y.sh) = 0 THEN 1.0
              ELSE CAST(inter AS DOUBLE) / uni END AS jaccard
  FROM cands c JOIN shs x ON x.doc_id = c.a JOIN shs y ON y.doc_id = c.b)
SELECT a, b, round(jaccard, 4) AS jaccard FROM jac WHERE jaccard >= 0.8
"""

  /** Transitive-closure near-dup clusters ([[graft.ops.Dedup.minhashClusters]]):
    * connected components over the verified candidate pairs as a recursive
    * label walk — min reachable id = cluster id, the same fixpoint the
    * engine's min-label propagation converges to.
    */
  val dedupClusters: String = prelude + "WITH RECURSIVE " + minhashCands + """,
edges AS (
  SELECT a, b FROM est WHERE est_jaccard >= 0.8
  UNION ALL SELECT b, a FROM est WHERE est_jaccard >= 0.8),
walk(id, comp) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, w.comp FROM walk w JOIN edges e ON e.b = w.id)
SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id
"""

  /** Quality-policy cluster representatives: the same transitive-closure
    * clusters, but per cluster the KEPT doc is the longest (n_chars, then
    * lowest id) — the policy-pluggable half of dedup: clustering decides
    * WHO is duplicated, the representative rule decides WHAT survives.
    */
  val dedupBestRep: String = prelude + "WITH RECURSIVE " + minhashCands + """,
edges AS (
  SELECT a, b FROM est WHERE est_jaccard >= 0.8
  UNION ALL SELECT b, a FROM est WHERE est_jaccard >= 0.8),
walk(id, comp) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, w.comp FROM walk w JOIN edges e ON e.b = w.id),
cl AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id)
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
       first(c.doc_id ORDER BY d.n_chars DESC, c.doc_id) AS rep_doc_id
FROM cl c JOIN documents d USING (doc_id)
GROUP BY cluster_id
"""

  /** Leakage-free split ([[graft.ops.Sampling.splitColumn]] keyed by the
    * near-dup cluster id): the cluster walk of [[dedupClusters]] plus the
    * same md5 band bounds as the `q_split` oracle — a whole cluster lands
    * in ONE split, so no eval doc has a train near-dup.
    */
  val splitLeakfree: String = prelude + "WITH RECURSIVE " + minhashCands + """,
edges AS (
  SELECT a, b FROM est WHERE est_jaccard >= 0.8
  UNION ALL SELECT b, a FROM est WHERE est_jaccard >= 0.8),
walk(id, comp) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, w.comp FROM walk w JOIN edges e ON e.b = w.id),
clusters AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id)
SELECT d.doc_id,
  CASE WHEN substring(md5(CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 4) < 'cccd'
         THEN 'train'
       WHEN substring(md5(CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 4) < 'e666'
         THEN 'val'
       ELSE 'test' END AS split
FROM documents d LEFT JOIN clusters c USING (doc_id)
"""

  /** Incremental dedup against the persisted MinHash index
    * ([[graft.ops.Dedup.incrementalCandidates]]): the index is the documents
    * corpus; the new batch is every 25th doc re-appearing (negated id) with
    * a drift suffix. Candidates are new×indexed band collisions (index
    * bucket cap 64, applied at build time), verified at est ≥ 0.8.
    */
  val dedupIncremental: String = prelude + """
WITH all_docs AS (
  SELECT doc_id, text, 0 AS is_new FROM documents
  UNION ALL
  SELECT -doc_id - 1, text || ' planted drift suffix', 1
  FROM documents WHERE doc_id % 25 = 0),""" + minhashSigCtes("all_docs") + """
isized AS (
  SELECT b.b AS b, b.key, count(*) AS bsz
  FROM bands b JOIN all_docs d USING (doc_id) WHERE d.is_new = 0
  GROUP BY b.b, b.key),
pairs AS (
  SELECT DISTINCT n.doc_id AS id, x.doc_id AS dup_of
  FROM bands n
  JOIN all_docs nd ON nd.doc_id = n.doc_id AND nd.is_new = 1
  JOIN bands x ON x.b = n.b AND x.key = n.key
  JOIN all_docs xd ON xd.doc_id = x.doc_id AND xd.is_new = 0
  JOIN isized s ON s.b = n.b AND s.key = n.key AND s.bsz <= 64),
est AS (
  SELECT p.id, p.dup_of,
         (count(*) FILTER (sa.slot = sb.slot)) / 128.0 AS est_jaccard
  FROM pairs p
  JOIN slots sa ON sa.doc_id = p.id
  JOIN slots sb ON sb.doc_id = p.dup_of AND sb.i = sa.i
  GROUP BY p.id, p.dup_of)
SELECT id, dup_of, est_jaccard FROM est WHERE est_jaccard >= 0.8
"""

  /** The GET_EMBEDDING stub ([[graft.functions.AiFunctions.fakeEmbed]]):
    * signed token votes at (polyhash %% 64), L2-normalized, dim 64.
    */
  private val fakeEmbed: String = """
tokh AS (
  SELECT tok,
         list_reduce(list_prepend(CAST(1125899906842597 AS UBIGINT),
           list_transform(string_split(tok, ''), c -> CAST(ord(c) AS UBIGINT))),
           (h, c) -> g_addmod(g_mulmod(h, 31), c)) AS h
  FROM (SELECT DISTINCT unnest(g_toks(text)) AS tok FROM documents)),
votes AS (
  SELECT d.doc_id, CAST(t.h % 64 AS INTEGER) AS idx,
         sum(CASE WHEN ((t.h >> 32) & 1) = 0 THEN 1.0 ELSE -1.0 END) AS cnt
  FROM (SELECT doc_id, unnest(g_toks(text)) AS tok FROM documents) d
  JOIN tokh t USING (tok) GROUP BY d.doc_id, idx),
dense AS (
  SELECT dd.doc_id, i.i, coalesce(v.cnt, 0.0) AS cnt
  FROM (SELECT DISTINCT doc_id FROM documents) dd
  CROSS JOIN generate_series(0, 63) i(i)
  LEFT JOIN votes v ON v.doc_id = dd.doc_id AND v.idx = i.i),
norms AS (
  SELECT doc_id, sqrt(sum(cnt * cnt)) AS nrm FROM dense GROUP BY doc_id),
emb AS (
  SELECT d.doc_id,
         list(CAST(CASE WHEN n.nrm > 0 THEN d.cnt / n.nrm ELSE d.cnt END AS REAL)
              ORDER BY d.i) AS v
  FROM dense d JOIN norms n USING (doc_id) GROUP BY d.doc_id)
"""

  /** Embedding-cosine near-dup pairs: stub embeddings, 16-plane hyperplane
    * LSH buckets (cap 256), cosine >= 0.95 within-bucket.
    */
  val dedupEmbedding: String = prelude + embeddingPairsSelect

  /** SemDeDup survivor set on the same pair semantics: a doc survives iff
    * it is nobody's larger-id near-duplicate.
    */
  val semdedupSurvivors: String = prelude +
    "SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT b FROM (" +
    embeddingPairsSelect + "))"

  private lazy val embeddingPairsSelect: String = "WITH " + fakeEmbed + ",\n" +
    planesCte(16, 64) + """,
sigs AS (
  SELECT e.doc_id, e.v,
         CAST(coalesce(sum(CASE WHEN """ + dot(64, "e.v", "p.pl") + """ >= 0
              THEN CAST(power(2, p.p) AS HUGEINT) END), 0) AS UBIGINT) AS bucket
  FROM emb e CROSS JOIN planes p GROUP BY e.doc_id, e.v),
sized AS (SELECT *, count(*) OVER (PARTITION BY bucket) AS bsz FROM sigs)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM sized x JOIN sized y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
WHERE x.bsz BETWEEN 2 AND 256
  AND (""" + dot(64, "x.v", "y.v") + """) /
      sqrt((""" + dot(64, "x.v", "x.v") + """) *
           (""" + dot(64, "y.v", "y.v") + """)) >= 0.95
"""

  /** LSH top-k: 6-plane buckets over the embeddings table, multi-probe at
    * 1 bit flip, exact cosine rescoring of the probed slice.
    */
  val embedLshTopk: String = prelude + "WITH " + planesCte(6, 64) + """,
sigs AS (
  SELECT e.vec_id, e.embedding AS v,
         CAST(coalesce(sum(CASE WHEN """ + dot(64, "e.embedding", "p.pl") + """ >= 0
              THEN CAST(power(2, p.p) AS HUGEINT) END), 0) AS UBIGINT) AS bucket
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id, e.embedding),
q AS (SELECT v AS qv, bucket AS qb FROM sigs WHERE vec_id = 0),
probes AS (
  SELECT qb AS pb FROM q
  UNION SELECT xor(qb, CAST(power(2, b.b) AS UBIGINT))
  FROM q CROSS JOIN generate_series(0, 5) b(b)),
scored AS (
  SELECT s.vec_id,
         (""" + dot(64, "s.v", "q.qv") + """) /
         sqrt((""" + dot(64, "s.v", "s.v") + """) *
              (""" + dot(64, "q.qv", "q.qv") + """)) AS score
  FROM sigs s, q WHERE s.bucket IN (SELECT pb FROM probes))
SELECT vec_id FROM scored ORDER BY score DESC, vec_id LIMIT 10
"""

  /** Spark `xxhash64(<bigint col>)` (XXH64.hashLong, seed 42) as a CTE over
    * `table`: one 8-byte little-endian block, rotations via wrap-multiply.
    */
  private def xxhashCte(table: String, idCol: String): String = s"""
xxh AS (
  SELECT $idCol,
         g_mulmod(CAST($idCol AS UBIGINT), 14029467366897019727) AS k0,
         g_addmod(g_mulmod(k0, 2147483648), k0 >> 33) AS k1r,
         xor(g_mulmod(k1r, 11400714785074694791),
             g_addmod(42, 2870177450012600269)) AS a0,
         g_addmod(g_mulmod(g_addmod(g_mulmod(a0, 134217728), a0 >> 37),
                  11400714785074694791), 9650029242287828579) AS a1,
         g_mulmod(xor(a1, a1 >> 33), 14029467366897019727) AS a2,
         g_mulmod(xor(a2, a2 >> 29), 1609587929392839161) AS a3,
         xor(a3, a3 >> 32) AS h
  FROM $table)"""

  /** Per-band aggregate invariants of [[graft.ops.Pack.packBins]] that are
    * pure functions of the INPUT whenever the packing is correct — the
    * oracle-gated companion to the rows-only `q_pack_bins` (whose per-band
    * best-fit fold is a sequential argmin chain no SQL can replay). Checked
    * exactly: per xxhash band, the packed doc count, token sum and
    * token-sum-of-squares (the multiset of token counts is preserved —
    * a doc duplicated, dropped, or swapped for a different-length one
    * breaks at least one of the three), plus the count of bins whose token
    * sum exceeds capacity, which the oracle pins to literal 0 — a
    * capacity-arithmetic bug lands in the HARD gate instead of only in
    * PackBinsSpec's replay. No capacity parameter: the oracle pins
    * `n_overfull_bins` to literal 0 REGARDLESS of the capacity, so the
    * engine side derives its overfull predicate from the one shared
    * constant ([[graft.SparkEntry.PackCapacity]]) and a capacity change
    * there cannot drift past this SQL.
    */
  def packBinsAudit(bands: Int): String = prelude + s"""
WITH kept AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS tok
  FROM documents
  WHERE CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(string_split_regex(trim(text), '\\s+')) END > 0),
${xxhashCte("kept", "doc_id")},
banded AS (
  SELECT k.doc_id, CAST(k.tok AS BIGINT) AS tok,
         CAST(((g_tosigned(x.h) % $bands) + $bands) % $bands AS INTEGER) AS band
  FROM kept k JOIN xxh x USING (doc_id))
SELECT band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS sum_tokens,
       CAST(sum(tok * tok) AS BIGINT) AS sum_tokens_sq,
       CAST(0 AS BIGINT) AS n_overfull_bins
FROM banded GROUP BY band"""

  /** Decontamination: distinct-shingle overlap between every training doc
    * and a benchmark built from 12-token snippets of every 20th doc (string
    * shingle sets stand in for the hashed sets — same counts). Mirrors the
    * engine's stop-shingle cap: shingles in more than 1000 bench docs are
    * excluded before counting.
    */
  val decontaminate: String = decontaminateSql(benchMod = 20, tokFrom = 3, tokLen = 12)

  /** The Bloom-prefiltered variant is output-identical to the exact flag by
    * construction (false positives die in the exact join), so its oracle is
    * the SAME exact-overlap SQL at the variant's parameters — a hash match
    * proves the prefilter changed the plan, not the answer.
    */
  val decontaminateBloom: String = decontaminateSql(benchMod = 10, tokFrom = 5, tokLen = 12)

  private def decontaminateSql(benchMod: Int, tokFrom: Int, tokLen: Int): String = prelude + s"""
WITH bench AS (
  SELECT doc_id AS bench_id,
         array_to_string((g_toks(text))[$tokFrom:${tokFrom + tokLen - 1}], ' ') AS btext
  FROM documents WHERE doc_id % $benchMod = 0),
bsh0 AS (SELECT bench_id, g_shingles(btext, 3) AS sh FROM bench),
stoplist AS (
  SELECT coalesce(list(x), []) AS sl FROM (
    SELECT x FROM (SELECT unnest(sh) AS x FROM bsh0)
    GROUP BY x HAVING count(*) > 1000)),
bsh AS (
  SELECT b.bench_id, list_filter(b.sh, x -> NOT list_contains(s.sl, x)) AS sh
  FROM bsh0 b CROSS JOIN stoplist s),
tsh AS (SELECT doc_id AS train_id, g_shingles(text, 3) AS sh FROM documents)
SELECT t.train_id, b.bench_id,
       CAST(len(list_filter(t.sh, x -> list_contains(b.sh, x))) AS BIGINT) AS overlap
FROM tsh t CROSS JOIN bsh b
WHERE len(list_filter(t.sh, x -> list_contains(b.sh, x))) >= 2
"""

  /** Watermark-lateness profile: arrival order = event time + a
    * deterministic 0–2 h xxhash64 jitter (positive modulo, Spark `pmod`),
    * event-time frontier = running max over that arrival order (event_id
    * tie-break — the total order [[graft.operators.Lateness]] requires),
    * lateness histogram against the candidate watermark delays.
    */
  val watermarkLateness: String = prelude + "WITH " +
    xxhashCte("events", "event_id") + """,
x AS (
  SELECT e.event_id, epoch_us(e.ts) AS ts_us,
         epoch_us(e.ts)
           + ((g_tosigned(h) % 7200000000) + 7200000000) % 7200000000 AS arr
  FROM events e JOIN xxh USING (event_id)),
f AS (
  SELECT ts_us, max(ts_us) OVER (ORDER BY arr, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS frontier
  FROM x)
SELECT CASE WHEN frontier - ts_us <= 0 THEN 0
            WHEN frontier - ts_us <= 60000000 THEN 60000000
            WHEN frontier - ts_us <= 600000000 THEN 600000000
            WHEN frontier - ts_us <= 1800000000 THEN 1800000000
            WHEN frontier - ts_us <= 3600000000 THEN 3600000000
            ELSE -1 END AS bucket_le_us,
       count(*) AS cnt
FROM f GROUP BY 1
"""

  /** Deterministic epoch shuffle: exact rank in signed-xxhash64 order. */
  val shuffleDeterministic: String = prelude + "WITH " +
    xxhashCte("documents", "doc_id") + """
SELECT doc_id,
       row_number() OVER (ORDER BY g_tosigned(h), doc_id) - 1 AS shuffle_pos
FROM xxh
"""

  /** SQ8 top-k: per-vector affine uint8 quantization, dequantized
    * approximate dot ranking (`vmin·Σq + scale·Σ(c_i·q_i)`), exact cosine
    * re-rank of the top 40 — [[graft.ops.Similarity.sq8TopK]] end to end.
    * Expression shapes (parenthesization, double casts, ascending sums)
    * mirror the Spark side exactly so scores are bit-identical.
    */
  /** SQ8 quantization + query-vector CTEs (`qv`, `sumq`, `sq8`) and the
    * approximate-dot expression, shared by the flat-SQ8 and IVF-SQ8
    * oracles. Expression shapes mirror [[graft.ops.Similarity.sq8Quant]] /
    * `sq8ApproxDot` exactly.
    */
  private def sq8Ctes(rel: String = "embeddings", idCol: String = "vec_id",
                      qvFrom: String = "SELECT embedding AS q FROM embeddings WHERE vec_id = 0")
      : String = s"""
qv AS ($qvFrom),
sumq AS (SELECT list_sum(list_transform(q, x -> CAST(x AS DOUBLE))) AS sq FROM qv),
sq8 AS (
  SELECT $idCol, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS vmin,
         (CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS scale,
         CASE WHEN list_max(embedding) = list_min(embedding)
              THEN list_transform(generate_series(1, 64), k -> 0)
              ELSE list_transform(generate_series(1, 64), k ->
                CAST(round(((CAST(embedding[k] AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) * 255.0)
                  / (CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE))) AS INTEGER))
         END AS codes
  FROM $rel)"""

  private val sq8ApproxExpr: String =
    """s.vmin * m.sq + s.scale * list_sum(list_transform(generate_series(1, 64),
      |           k -> CAST(s.codes[k] AS DOUBLE) * CAST(qv.q[k] AS DOUBLE)))""".stripMargin

  val embedSq8Topk: String = {
    val c = (x: String, y: String) => cos(64, x, y)
    prelude + "WITH " + sq8Ctes() + """,
approx AS (
  SELECT s.vec_id, s.embedding, """ + sq8ApproxExpr + """ AS a
  FROM sq8 s, qv, sumq m),
cands AS (SELECT vec_id, embedding FROM approx ORDER BY a DESC, vec_id LIMIT 40)
SELECT c.vec_id FROM cands c, qv
ORDER BY """ + c("c.embedding", "qv.q") + """ DESC, c.vec_id LIMIT 10
"""
  }

  /** The probe+approx+rerank tail shared by the IVF-SQ8 oracles (follows
    * `ivfAssignCtes` + `sq8Ctes`): nprobe=4 lists from the final centroids,
    * SQ8 approximate dot over the probed slice only, exact cosine re-rank
    * of the top 40.
    */
  private def ivfSq8ProbeTail(idCol: String = "vec_id",
                              finalSelect: String = "c.vec_id"): String = {
    val c = (x: String, y: String) => cos(64, x, y)
    s""",
probes AS (
  SELECT c.cid FROM cent2 c, qv
  ORDER BY """ + c("qv.q", "c.c") + s""" DESC, c.cid LIMIT 4),
approx AS (
  SELECT s.$idCol, s.embedding, """ + sq8ApproxExpr + s""" AS a
  FROM finalasg f JOIN sq8 s USING ($idCol), qv, sumq m
  WHERE f.cid IN (SELECT cid FROM probes)),
cands AS (SELECT $idCol, embedding FROM approx ORDER BY a DESC, $idCol LIMIT 40)
SELECT $finalSelect FROM cands c, qv
ORDER BY """ + c("c.embedding", "qv.q") + s""" DESC, c.$idCol LIMIT 10
"""
  }

  /** IVF-SQ8 index probe — [[graft.ops.Ivf.topKSq8]] end to end: the IVF
    * train/assign chain picks nprobe=4 lists, the SQ8 approximate dot ranks
    * only the PROBED vectors, and exact cosine re-ranks the top 40.
    */
  val embedIvfSq8Topk: String =
    prelude + ivfAssignCtes() + ",\n" + sq8Ctes() + ivfSq8ProbeTail()

  /** The grown-index lifecycle — base build + append with EXISTING
    * centroids ([[graft.ops.Ivf.appendToIndexSq8]]): training (seeding +
    * both Lloyd passes) sees ONLY the base corpus (vec_id >= 100), but the
    * final assignment covers every vector — exactly what "append assigns
    * with the index's centroids" means, since base-build assignment and
    * append assignment both use the final trained centroids. Compaction
    * rewrites files, not rows, so it is invisible here. The query vector
    * (vec 0) is in the appended batch.
    */
  val embedIvfSq8Incremental: String =
    prelude + ivfAssignCtes(train = "base",
      pre = "base AS (SELECT * FROM embeddings WHERE vec_id >= 100),") +
      ",\n" + sq8Ctes() + ivfSq8ProbeTail()

  /** The deterministic-stub embedding of [[graft.functions.AiFunctions.fakeEmbed]]
    * over `rel($idCol, $textCol)` as CTEs ending in
    * `$outRel($idCol, embedding)`: per-token rolling hash → 64-bucket ±1
    * votes → unit-normalize. Every intermediate is integer-valued (vote
    * sums), so the double norm and the final REAL casts are bit-identical
    * across engines regardless of aggregation order. CTE names are
    * prefixed with `p` so two chains (corpus + query literal) can coexist.
    */
  private def embedCtes(rel: String, idCol: String, textCol: String,
                        outRel: String, p: String): String = s"""
${p}tok AS (SELECT $idCol, unnest(g_toks($textCol)) AS tok FROM $rel),
${p}th AS (SELECT $idCol, g_embhash(tok) AS h FROM ${p}tok),
${p}votes AS (
  SELECT $idCol, CAST(((g_tosigned(h) % 64) + 64) % 64 AS INTEGER) AS idx,
         CAST(sum(CASE WHEN ((h >> 32) & 1) = 0 THEN 1 ELSE -1 END) AS DOUBLE) AS v
  FROM ${p}th GROUP BY $idCol, idx),
${p}allv AS (
  SELECT b.$idCol, i.i, coalesce(v.v, 0.0) AS x
  FROM (SELECT DISTINCT $idCol FROM $rel) b
  CROSS JOIN generate_series(0, 63) i(i)
  LEFT JOIN ${p}votes v ON v.$idCol = b.$idCol AND v.idx = i.i),
${p}nrm AS (SELECT $idCol, sqrt(sum(x * x)) AS nrm FROM ${p}allv GROUP BY $idCol),
$outRel AS (
  SELECT a.$idCol,
         list(CAST(CASE WHEN n.nrm > 0 THEN a.x / n.nrm ELSE a.x END AS REAL)
              ORDER BY a.i) AS embedding
  FROM ${p}allv a JOIN ${p}nrm n ON n.$idCol = a.$idCol
  GROUP BY a.$idCol)"""

  /** The query text of `q_chunk_embed_topk`, shared with the engine side so
    * the two cannot drift.
    */
  val chunkQueryText: String = "hash join shuffle partitions merge sort"

  /** Composed RAG assembly — [[graft.ops.TextAnalysis.chunkText]] →
    * stub-embed each chunk → IVF-SQ8 index → top-k with (doc_id, chunk_ix)
    * provenance: the full downstream story the stable chunk identity
    * exists for. Chunk ids pack as doc_id·2^20 + chunk_ix; the final
    * SELECT unpacks them.
    */
  val chunkEmbedTopk: String = {
    val chunkPre = """
base AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r]+') AS tk
  FROM documents WHERE length(trim(text)) > 0),
nc AS (
  SELECT doc_id, tk,
         CASE WHEN len(tk) <= 8 THEN 1
              ELSE (len(tk) - 8 + 31) // 32 END AS nchunks
  FROM base),
ex AS (
  SELECT doc_id, tk, unnest(generate_series(0, nchunks - 1)) AS chunk_ix
  FROM nc),
chunks AS (
  SELECT doc_id * 1048576 + chunk_ix AS chunk_id,
         array_to_string(tk[chunk_ix*32 + 1 : chunk_ix*32 + 40], ' ') AS chunk
  FROM ex),""" +
      embedCtes("chunks", "chunk_id", "chunk", "vecs", "ce_") + "," + s"""
qsrc AS (SELECT 0 AS qid, '$chunkQueryText' AS qt),""" +
      embedCtes("qsrc", "qid", "qt", "qvec", "qe_") + ","
    prelude + ivfAssignCtes(train = "vecs", pre = chunkPre,
        full = "vecs", idCol = "chunk_id") + ",\n" +
      sq8Ctes(rel = "vecs", idCol = "chunk_id",
        qvFrom = "SELECT embedding AS q FROM qvec") +
      ivfSq8ProbeTail(idCol = "chunk_id",
        finalSelect = "c.chunk_id // 1048576 AS doc_id, c.chunk_id % 1048576 AS chunk_ix")
  }

  /** Product-quantization ADC top-k — [[graft.ops.Pq.topK]] end to end:
    * per-subspace 2-iteration L2 k-means (same xxhash64 seeding rows as the
    * IVF oracle, sliced per subspace), final argmin-L2 encoding, the
    * query's ADC table as per-centroid dots, the approximate score as the
    * ascending-j lookup sum, exact cosine re-rank of the top 40. The whole
    * 8-subspace chain is GENERATED so engine and oracle cannot drift.
    */
  val embedPqTopk: String = {
    val m = 8; val ds = 8; val k = 16
    def lo(j: Int): Int = j * ds + 1
    // squared-L2 of the j-th slice of full vector `a` against ds-dim list
    // `c`, diff*diff like the engine loop (NOT pow)
    def l2(j: Int, a: String, c: String): String =
      s"list_sum(list_transform(generate_series(1, $ds), t -> " +
        s"(CAST($a[${lo(j)} + t - 1] AS DOUBLE) - CAST($c[t] AS DOUBLE)) * " +
        s"(CAST($a[${lo(j)} + t - 1] AS DOUBLE) - CAST($c[t] AS DOUBLE))))"
    def qdot(j: Int, c: String): String =
      s"list_sum(list_transform(generate_series(1, $ds), t -> " +
        s"CAST(q[${lo(j)} + t - 1] AS DOUBLE) * CAST($c[t] AS DOUBLE)))"
    def asg(j: Int, name: String, cents: String): String = s"""
$name AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY ${l2(j, "e.embedding", "c.c")} ASC, c.cid) AS rn
    FROM embeddings e CROSS JOIN $cents c) WHERE rn = 1)"""
    def mean(j: Int, name: String, from: String): String = s"""
$name AS (
  SELECT a.cid, i.i AS i, avg(CAST(e.embedding[${lo(j)} + i.i - 1] AS DOUBLE)) AS mn
  FROM $from a JOIN embeddings e USING (vec_id)
  CROSS JOIN generate_series(1, $ds) i(i) GROUP BY a.cid, i.i)"""
    def cent(name: String, prev: String, means: String): String = s"""
$name AS (
  SELECT p.cid, coalesce(n.c2, p.c) AS c
  FROM $prev p LEFT JOIN (
    SELECT cid, list(CAST(mn AS REAL) ORDER BY i) AS c2 FROM $means GROUP BY cid) n
  USING (cid))"""
    val chains = (0 until m).map { j =>
      s"""
seed_$j AS (SELECT cid, c[${lo(j)}:${lo(j) + ds - 1}] AS c FROM seeds),""" +
        asg(j, s"asg1_$j", s"seed_$j") + "," +
        mean(j, s"mean1_$j", s"asg1_$j") + "," +
        cent(s"cent1_$j", s"seed_$j", s"mean1_$j") + "," +
        asg(j, s"asg2_$j", s"cent1_$j") + "," +
        mean(j, s"mean2_$j", s"asg2_$j") + "," +
        cent(s"cent2_$j", s"cent1_$j", s"mean2_$j") + "," + s"""
enc_$j AS (
  SELECT vec_id, cid AS code FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY ${l2(j, "e.embedding", "c.c")} ASC, c.cid) AS rn
    FROM embeddings e CROSS JOIN cent2_$j c) WHERE rn = 1),
adc_$j AS (SELECT c.cid, ${qdot(j, "c.c")} AS d FROM cent2_$j c, qv)"""
    }.mkString(",")
    val joins = (1 until m).map(j =>
      s"JOIN enc_$j e$j ON e$j.vec_id = e0.vec_id JOIN adc_$j a$j ON a$j.cid = e$j.code")
      .mkString("\n    ")
    val sum = (1 until m).foldLeft("a0.d") { (acc, j) => s"($acc + a$j.d)" }
    prelude + "WITH " + xxhashCte("embeddings", "vec_id") + s""",
seeds AS (
  SELECT row_number() OVER (ORDER BY g_tosigned(x.h)) - 1 AS cid,
         e.embedding AS c
  FROM xxh x JOIN embeddings e USING (vec_id)
  ORDER BY g_tosigned(x.h) LIMIT $k),
qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),""" + chains + s""",
approx AS (
  SELECT e0.vec_id, $sum AS ap
  FROM enc_0 e0 JOIN adc_0 a0 ON a0.cid = e0.code
    $joins),
cand AS (
  SELECT a.vec_id, e.embedding FROM approx a JOIN embeddings e USING (vec_id)
  ORDER BY a.ap DESC, a.vec_id LIMIT 40)
SELECT vec_id FROM cand, qv
ORDER BY """ + cos(64, "embedding", "q") + """ DESC, vec_id LIMIT 10
"""
  }

  /** DSIR importance-resampling selection — [[graft.ops.Dsir.select]] end
    * to end: hashed unigram+bigram buckets (`g_mix64(g_fnv64(gram)) pmod
    * 4096` ≡ the engine's `NgramBuckets`), target (lang='en') vs raw
    * distributions with add-half smoothing, and the per-doc log-weight
    * folded in ascending-bucket order via `list_reduce` — the exact
    * accumulation order of the Spark side's `aggregate` over the
    * bucket-sorted counts array, so weights are bit-identical modulo `ln`
    * rounding (both engines' `ln` is correctly rounded to well under the
    * inter-document weight gaps).
    */
  val dsirSelect: String = prelude + """
WITH toks AS (SELECT doc_id, lang, g_toks(text) AS tk FROM documents),
grams AS (
  SELECT doc_id, lang, unnest(list_concat(tk,
    list_transform(generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1]))) AS gram
  FROM toks),
hashed AS (SELECT doc_id, lang, """ + h64Chain("gram") + """ FROM grams),
fb AS (SELECT doc_id, lang,
       CAST(((g_tosigned(h1) % 4096) + 4096) % 4096 AS INTEGER) AS bucket FROM hashed),
tfit AS (SELECT bucket, count(*) AS tc FROM fb WHERE lang = 'en' GROUP BY bucket),
rfit AS (SELECT bucket, count(*) AS rc FROM fb GROUP BY bucket),
stats AS (
  SELECT coalesce(t.bucket, r.bucket) AS bucket,
         coalesce(t.tc, 0) AS tc, coalesce(r.rc, 0) AS rc
  FROM tfit t FULL OUTER JOIN rfit r ON t.bucket = r.bucket),
tot AS (SELECT CAST(sum(tc) AS DOUBLE) + 0.5 * 4096 AS tt,
               CAST(sum(rc) AS DOUBLE) + 0.5 * 4096 AS rr FROM stats),
perdoc AS (SELECT doc_id, bucket, count(*) AS cnt FROM fb GROUP BY doc_id, bucket),
fs AS (
  SELECT p.doc_id,
         list(struct_pack(bucket := p.bucket, cnt := p.cnt,
              tc := coalesce(s.tc, 0), rc := coalesce(s.rc, 0))
              ORDER BY p.bucket) AS fs
  FROM perdoc p LEFT JOIN stats s ON p.bucket = s.bucket
  GROUP BY p.doc_id),
w AS (
  SELECT doc_id, list_reduce(list_prepend(0.0, list_transform(fs, f ->
           CAST(f.cnt AS DOUBLE) *
           (ln((CAST(f.tc AS DOUBLE) + 0.5) / tot.tt)
            - ln((CAST(f.rc AS DOUBLE) + 0.5) / tot.rr)))),
         (a, x) -> a + x) AS weight
  FROM fs, tot)
SELECT doc_id FROM w ORDER BY weight DESC, doc_id LIMIT 100
"""

  /** CCNet-style bigram-LM head selection — [[graft.ops.LmScore.headSelect]]
    * end to end: hashed conditional bigram LM (`g_mix64(g_fnv64(gram)) pmod
    * 65536` ≡ the engine's `NgramBuckets`) fitted on the lang='en' slice,
    * add-half-smoothed log-probs, and the per-doc nll folded in ascending
    * (b1, b12) order via `list_reduce` — the exact accumulation order of the
    * Spark side's `aggregate` over the sorted counts array ([[dsirSelect]]'s
    * determinism stance). Distinct grams are hashed once in a vocab CTE and
    * mapped back by string join, because the h64 alias chain hashes a single
    * source column.
    */
  val lmHead: String = prelude + """
WITH toks AS (SELECT doc_id, lang, g_toks(text) AS tk FROM documents),
occ AS (
  SELECT doc_id, lang, (p).w1 AS w1, (p).w12 AS w12 FROM (
    SELECT doc_id, lang, unnest(list_transform(generate_series(1, len(tk) - 1),
      i -> struct_pack(w1 := tk[i], w12 := tk[i] || ' ' || tk[i + 1]))) AS p
    FROM toks WHERE len(tk) >= 2)),
vocab AS (
  SELECT gram FROM (SELECT w1 AS gram FROM occ UNION SELECT w12 FROM occ)),
gh0 AS (SELECT gram, """ + h64Chain("gram") + """ FROM vocab),
gh AS (SELECT gram,
       CAST(((g_tosigned(h1) % 65536) + 65536) % 65536 AS INTEGER) AS bucket
       FROM gh0),
c1 AS (
  SELECT g.bucket AS b1, count(*) AS c1
  FROM (SELECT unnest(tk) AS w1 FROM toks WHERE lang = 'en') u
  JOIN gh g ON g.gram = u.w1 GROUP BY g.bucket),
c2 AS (
  SELECT g.bucket AS b12, count(*) AS c2
  FROM occ o JOIN gh g ON g.gram = o.w12 WHERE o.lang = 'en' GROUP BY g.bucket),
perdoc AS (
  SELECT o.doc_id, g1.bucket AS b1, g2.bucket AS b12, count(*) AS cnt
  FROM occ o JOIN gh g1 ON g1.gram = o.w1 JOIN gh g2 ON g2.gram = o.w12
  GROUP BY o.doc_id, g1.bucket, g2.bucket),
fs AS (
  SELECT p.doc_id,
         list(struct_pack(b1 := p.b1, b12 := p.b12, cnt := p.cnt,
              c1 := coalesce(u.c1, 0), c2 := coalesce(b.c2, 0))
              ORDER BY p.b1, p.b12) AS fs
  FROM perdoc p LEFT JOIN c1 u ON u.b1 = p.b1 LEFT JOIN c2 b ON b.b12 = p.b12
  GROUP BY p.doc_id),
w AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(fs, f -> f.cnt)), (a, x) -> a + x) AS n_bigrams,
         -(list_reduce(list_prepend(0.0, list_transform(fs, f ->
             CAST(f.cnt AS DOUBLE) *
             ln((CAST(f.c2 AS DOUBLE) + 0.5) / (CAST(f.c1 AS DOUBLE) + 32768.0)))),
           (a, x) -> a + x))
         / CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(fs, f -> f.cnt)), (a, x) -> a + x) AS DOUBLE) AS nll
  FROM fs)
SELECT doc_id, n_bigrams FROM w ORDER BY nll ASC, doc_id LIMIT 100
"""

  /** fastText-style linear quality scoring — [[graft.ops.QualityModel
    * .logits]] with the deterministic stub model: hashed unigram+bigram
    * buckets (pmod 4096), stub weight `mix64(b+1)/2^63·4` recomputed
    * bit-for-bit, and the per-doc weight sum folded in ascending-bucket
    * order via `list_reduce` — the exact accumulation order of the Spark
    * side's codegen'd BUCKET_WEIGHT_SUM over the sorted bucket array.
    */
  val qualityModel: String = prelude + """
WITH toks AS (SELECT doc_id, g_toks(text) AS tk FROM documents),
grams AS (
  SELECT doc_id, unnest(list_concat(tk,
    list_transform(generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1]))) AS gram
  FROM toks),
hashed AS (SELECT doc_id, """ + h64Chain("gram") + """ FROM grams),
fb AS (SELECT doc_id,
       CAST(((g_tosigned(h1) % 4096) + 4096) % 4096 AS INTEGER) AS bucket FROM hashed),
bs AS (SELECT doc_id, list(bucket ORDER BY bucket) AS bs, count(*) AS n
       FROM fb GROUP BY doc_id)
SELECT doc_id, CAST(n AS BIGINT) AS n_grams,
       0.0 + list_reduce(list_prepend(0.0, list_transform(bs, b ->
           g_tosigned(g_mix64(CAST(b + 1 AS UBIGINT)))
           / 9223372036854775808.0 * 4.0)),
         (a, x) -> a + x) / CAST(n AS DOUBLE) AS logit
FROM bs
"""

  /** IVF top-k: xxhash64(vec_id, seed 42) seeding (Spark XXH64.hashLong,
    * rotations via wrap-multiply), two Lloyd iterations with renormalized
    * float centroids and keep-old-on-empty clusters, nprobe=4 probing,
    * exact cosine top-10 — [[graft.ops.Ivf]] end to end.
    */
  /** The IVF train+assign CTE chain (xxhash64 seeding, two Lloyd
    * iterations, final nearest-centroid assignment) ending in `finalasg` —
    * shared by the top-k and cluster-balance oracles.
    */
  private def ivfAssignCtes(train: String = "embeddings", pre: String = "",
                             full: String = "embeddings",
                             idCol: String = "vec_id"): String = {
    val c = (x: String, y: String) => cos(64, x, y)
    // `train` scopes SEEDING and both Lloyd passes (what Ivf.train saw);
    // finalasg always assigns the FULL embeddings table with the trained
    // centroids — for train == embeddings the two coincide, for a grown
    // index (append with existing centroids) they deliberately differ
    "WITH " + pre + xxhashCte(train, idCol) + s""",
seeds AS (
  SELECT row_number() OVER (ORDER BY g_tosigned(x.h)) - 1 AS cid,
         e.embedding AS c
  FROM xxh x JOIN $train e USING ($idCol)
  ORDER BY g_tosigned(x.h) LIMIT 16),
asg1 AS (
  SELECT $idCol, embedding, cid FROM (
    SELECT e.$idCol, e.embedding, s.cid,
           row_number() OVER (PARTITION BY e.$idCol
             ORDER BY """ + c("e.embedding", "s.c") + s""" DESC, s.cid) AS rn
    FROM $train e CROSS JOIN seeds s) WHERE rn = 1),
mean1 AS (
  SELECT a.cid, i.i, avg(CAST(a.embedding[i.i] AS DOUBLE)) AS m
  FROM asg1 a CROSS JOIN generate_series(1, 64) i(i) GROUP BY a.cid, i.i),
cent1 AS (
  SELECT s.cid, coalesce(n.c2, s.c) AS c
  FROM seeds s LEFT JOIN (
    SELECT cid, list(CAST(CASE WHEN nrm > 0 THEN m / nrm ELSE m END AS REAL) ORDER BY i) AS c2
    FROM (SELECT cid, i, m, sqrt(sum(m * m) OVER (PARTITION BY cid)) AS nrm FROM mean1)
    GROUP BY cid) n ON n.cid = s.cid),
asg2 AS (
  SELECT $idCol, embedding, cid FROM (
    SELECT e.$idCol, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.$idCol
             ORDER BY """ + c("e.embedding", "c.c") + s""" DESC, c.cid) AS rn
    FROM $train e CROSS JOIN cent1 c) WHERE rn = 1),
mean2 AS (
  SELECT a.cid, i.i, avg(CAST(a.embedding[i.i] AS DOUBLE)) AS m
  FROM asg2 a CROSS JOIN generate_series(1, 64) i(i) GROUP BY a.cid, i.i),
cent2 AS (
  SELECT c1.cid, coalesce(n.c2, c1.c) AS c
  FROM cent1 c1 LEFT JOIN (
    SELECT cid, list(CAST(CASE WHEN nrm > 0 THEN m / nrm ELSE m END AS REAL) ORDER BY i) AS c2
    FROM (SELECT cid, i, m, sqrt(sum(m * m) OVER (PARTITION BY cid)) AS nrm FROM mean2)
    GROUP BY cid) n ON n.cid = c1.cid),
finalasg AS (
  SELECT $idCol, embedding, cid FROM (
    SELECT e.$idCol, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.$idCol
             ORDER BY """ + c("e.embedding", "c.c") + s""" DESC, c.cid) AS rn
    FROM $full e CROSS JOIN cent2 c) WHERE rn = 1)"""
  }

  val embedIvfTopk: String = {
    val c = (x: String, y: String) => cos(64, x, y)
    prelude + ivfAssignCtes() + """,
qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
probes AS (
  SELECT c.cid FROM cent2 c, qv
  ORDER BY """ + c("qv.q", "c.c") + """ DESC, c.cid LIMIT 4)
SELECT f.vec_id
FROM finalasg f, qv
WHERE f.cid IN (SELECT cid FROM probes)
ORDER BY """ + c("f.embedding", "qv.q") + """ DESC, f.vec_id LIMIT 10
"""
  }

  /** Bulk k-NN self-join — [[graft.ops.Ivf.knnJoin]] replayed: the same
    * trained centroids (shared CTE chain), per-LEFT-vector nprobe=4
    * probe lists (cos DESC, cid tie-break — the Spark side's
    * (−score, cid) struct sort), candidates from probed lists only,
    * per-left top-5 by the identical cosine shape with ascending
    * neighbor-id tie-break.
    */
  val knnJoin: String = {
    val c = (x: String, y: String) => cos(64, x, y)
    prelude + ivfAssignCtes() + """,
probes AS (
  SELECT vec_id AS lid, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY """ + c("e.embedding", "c.c") + """ DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN cent2 c) WHERE rn <= 4),
cand AS (
  SELECT p.lid, f.vec_id AS rid, l.embedding AS le, f.embedding AS re
  FROM probes p
  JOIN finalasg f ON f.cid = p.cid
  JOIN embeddings l ON l.vec_id = p.lid
  WHERE f.vec_id <> p.lid)
SELECT lid AS vec_id, rid AS nn_id, CAST(rn AS INTEGER) AS rank FROM (
  SELECT lid, rid, row_number() OVER (PARTITION BY lid
           ORDER BY """ + c("le", "re") + """ DESC, rid) AS rn
  FROM cand) WHERE rn <= 5
"""
  }

  /** Retrieval-quality evaluation — [[graft.ops.Retrieval.evalMetrics]]
    * over the IVF index's top-10 (the [[knnJoin]] replay restricted to the
    * 20 query vectors) against brute-force ground truth (exact cosine
    * cross join, per-query top-10): per-query recall@10 / MRR@10 (exact
    * rationals of small integers) and binary-gain nDCG@10 (log2 sums,
    * inside the gate's 1e-6 float tolerance). The IDCG curve is the same
    * ascending partial-sum order as the engine's scanLeft.
    */
  val retrievalEval: String = {
    val c = (x: String, y: String) => cos(64, x, y)
    prelude + ivfAssignCtes() + s""",
probes AS (
  SELECT vec_id AS lid, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY ${c("e.embedding", "c.c")} DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN cent2 c
    WHERE e.vec_id < 20) WHERE rn <= 4),
cand AS (
  SELECT p.lid, f.vec_id AS rid, l.embedding AS le, f.embedding AS re
  FROM probes p
  JOIN finalasg f ON f.cid = p.cid
  JOIN embeddings l ON l.vec_id = p.lid
  WHERE f.vec_id <> p.lid),
candk AS (
  SELECT lid AS q_id, rid AS item, rn AS crank FROM (
    SELECT lid, rid, row_number() OVER (PARTITION BY lid
             ORDER BY ${c("le", "re")} DESC, rid) AS rn
    FROM cand) WHERE rn <= 10),
truthk AS (
  SELECT qid AS q_id, rid AS item FROM (
    SELECT q.vec_id AS qid, e.vec_id AS rid,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY ${c("q.embedding", "e.embedding")} DESC, e.vec_id) AS rn
    FROM embeddings q CROSS JOIN embeddings e
    WHERE q.vec_id < 20 AND e.vec_id <> q.vec_id) WHERE rn <= 10),
tsize AS (SELECT q_id, count(*) AS n FROM truthk GROUP BY q_id),
hits AS (
  SELECT cd.q_id, count(*) AS nhits, min(cd.crank) AS first_rank,
         sum(1.0 / log2(CAST(cd.crank AS DOUBLE) + 1.0)) AS dcg
  FROM candk cd JOIN truthk t ON t.q_id = cd.q_id AND t.item = cd.item
  GROUP BY cd.q_id),
idcg AS (
  SELECT j, sum(g) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING) AS v FROM (
    SELECT i AS j, 1.0 / log2(CAST(i AS DOUBLE) + 1.0) AS g
    FROM generate_series(1, 10) t(i)))
SELECT s.q_id,
       CAST(coalesce(h.nhits, 0) AS DOUBLE) / least(10, s.n) AS recall,
       coalesce(1.0 / h.first_rank, 0.0) AS mrr,
       coalesce(h.dcg, 0.0) / i.v AS ndcg
FROM tsize s
LEFT JOIN hits h ON h.q_id = s.q_id
JOIN idcg i ON i.j = least(10, s.n)"""
  }

  /** The nprobe recall curve — [[retrievalEval]]'s machinery swept over
    * nprobe ∈ {1,2,4,8} against one shared brute-force truth: per-query
    * recall@10 rows keyed by nprobe, every value an exact rational.
    * `allprobes` ranks each query's centroids once (rn ≤ max nprobe);
    * each sweep leg filters `rn <= np` before its own top-10 window.
    */
  val recallCurve: String = {
    val c = (x: String, y: String) => cos(64, x, y)
    val legs = Seq(1, 2, 4, 8).map { np =>
      s"""SELECT $np AS nprobe, s.q_id,
   CAST(coalesce(h.nhits, 0) AS DOUBLE) / least(10, s.n) AS recall
FROM tsize s LEFT JOIN (
  SELECT cd.q_id, count(*) AS nhits FROM (
    SELECT lid AS q_id, rid AS item FROM (
      SELECT cc.lid, cc.rid,
             row_number() OVER (PARTITION BY cc.lid
               ORDER BY ${c("cc.le", "cc.re")} DESC, cc.rid) AS rn2
      FROM (SELECT p.lid, f.vec_id AS rid, l.embedding AS le, f.embedding AS re
            FROM allprobes p
            JOIN finalasg f ON f.cid = p.cid
            JOIN embeddings l ON l.vec_id = p.lid
            WHERE p.rn <= $np AND f.vec_id <> p.lid) cc) WHERE rn2 <= 10) cd
  JOIN truthk t ON t.q_id = cd.q_id AND t.item = cd.item
  GROUP BY cd.q_id) h ON h.q_id = s.q_id"""
    }
    prelude + ivfAssignCtes() + s""",
allprobes AS (
  SELECT vec_id AS lid, cid, rn FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY ${c("e.embedding", "c.c")} DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN cent2 c
    WHERE e.vec_id < 20) WHERE rn <= 8),
truthk AS (
  SELECT qid AS q_id, rid AS item FROM (
    SELECT q.vec_id AS qid, e.vec_id AS rid,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY ${c("q.embedding", "e.embedding")} DESC, e.vec_id) AS rn
    FROM embeddings q CROSS JOIN embeddings e
    WHERE q.vec_id < 20 AND e.vec_id <> q.vec_id) WHERE rn <= 10),
tsize AS (SELECT q_id, count(*) AS n FROM truthk GROUP BY q_id)
""" + legs.mkString("\n", "\nUNION ALL\n", "")
  }

  /** Hard-negative mining — [[graft.ops.Ivf.hardNegatives]] replayed: the
    * knnJoin pipeline with the same-label exclusion applied BEFORE the
    * per-left top-k window (a same-label neighbor must not eat a rank
    * slot), labels joined from the embeddings table on both sides.
    */
  val hardNegatives: String = {
    val c = (x: String, y: String) => cos(64, x, y)
    prelude + ivfAssignCtes() + """,
probes AS (
  SELECT vec_id AS lid, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY """ + c("e.embedding", "c.c") + """ DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN cent2 c) WHERE rn <= 4),
cand AS (
  SELECT p.lid, f.vec_id AS rid, l.embedding AS le, f.embedding AS re
  FROM probes p
  JOIN finalasg f ON f.cid = p.cid
  JOIN embeddings l ON l.vec_id = p.lid
  JOIN embeddings r ON r.vec_id = f.vec_id
  WHERE r.label <> l.label)
SELECT lid AS vec_id, rid AS neg_id, CAST(rn AS INTEGER) AS rank FROM (
  SELECT lid, rid, row_number() OVER (PARTITION BY lid
           ORDER BY """ + c("le", "re") + """ DESC, rid) AS rn
  FROM cand) WHERE rn <= 5
"""
  }

  /** Cluster-balanced curation — [[graft.ops.Ivf.assign]] composed with
    * [[graft.ops.Sampling.rebalance]] to a uniform 1/16 cluster mix: the
    * same budget/rate/threshold math as `q_mix_rebalance`, stratified on
    * the k-means cluster id instead of the language column.
    */
  val clusterBalance: String = prelude + ivfAssignCtes() + """,
cnt AS (SELECT cid, CAST(count(*) AS DOUBLE) AS n FROM finalasg GROUP BY cid),
budget AS (SELECT min(n / (CAST(1 AS DOUBLE) / 16)) AS t FROM cnt),
rates AS (
  SELECT cid, round(least(1.0, (CAST(1 AS DOUBLE) / 16) * b.t / n) * 65536) AS thr
  FROM cnt CROSS JOIN budget b)
SELECT f.vec_id, CAST(f.cid AS BIGINT) AS cid
FROM finalasg f JOIN rates r USING (cid)
WHERE CASE WHEN r.thr >= 65536 THEN TRUE WHEN r.thr <= 0 THEN FALSE
  ELSE substr(md5(CAST(f.vec_id AS VARCHAR)), 1, 4) < printf('%04x', CAST(r.thr AS INTEGER))
  END
"""
}
