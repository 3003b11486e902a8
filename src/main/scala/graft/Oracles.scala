package graft

import graft.operators.TextAnalysis

/** DuckDB oracle SQL for every SQL-expressible query in [[Queries]].
  *
  * Dialect/determinism notes (mirrored in Queries' Spark code):
  *  - money aggregation: operands cast to DECIMAL(18,2) first (exact sums),
  *    final CAST to DOUBLE; integer sums CAST to BIGINT (DuckDB sums bigint
  *    into HUGEINT)
  *  - ratios/cosines: FLOOR(x * 10^k) AS BIGINT, never round() (rounding-mode
  *    coupling between engines)
  *  - vector math: ordered aggregates `sum(... ORDER BY i)` to match Spark's
  *    left-to-right `aggregate` fold bit-for-bit
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all
  */
object Oracles {

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'${w.replace("'", "''")}'").mkString("[", ", ", "]")

  private val tokensExpr =
    """CASE WHEN len(trim(text))=0 THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text),'\s+') END"""

  /** Shared CTE body computing the portable 60-bit SimHash sketch per doc
    * (q65 pair query and q88 component query build on the same `s`).
    */
  private lazy val simhash60Ctes: String =
    s"""base AS (SELECT doc_id, $tokensExpr ws FROM documents),
       | th AS (SELECT doc_id, unnest(list_transform(ws, w -> CAST(('0x'||substr(md5(w),1,15)) AS BIGINT))) h FROM base),
       | votes AS (SELECT doc_id, j, sum(CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END) c
       |   FROM th CROSS JOIN (SELECT unnest(range(60)) j) js GROUP BY doc_id, j),
       | sk AS (SELECT doc_id, CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) simhash60
       |   FROM votes GROUP BY doc_id),
       | s AS (SELECT d.doc_id, COALESCE(sk.simhash60, 0) sk60 FROM documents d LEFT JOIN sk ON d.doc_id = sk.doc_id)""".stripMargin

  /** Replay [[graft.operators.Similarity.trainIvfCentroids]] in SQL —
    * `iters` generated k-means iteration CTEs (assignment by the same
    * ordered-fold argmin, per-(cell,dim) sums over `floor(x*2^20 + 0.5)`
    * bigints, means via the same two IEEE divisions), then `tail` against
    * the trained centroids' FINAL all-vector assignment (CTEs `sF`/`aF`).
    * Training is deterministic in BOTH engines because every
    * non-associative step is either exactly representable (power-of-two
    * scaling) or an explicitly ordered fold. `samplePred` restricts the
    * TRAINING set (CTE `tv`) — the sampled 100 TB path; the final
    * assignment always covers every vector.
    */
  private def ivfTrainedSql(iters: Int, samplePred: Option[String], tail: String): String = {
    val b = new StringBuilder
    b ++= "WITH ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) x, unnest(range(64)) i FROM embeddings),\n"
    b ++= s" tv AS (SELECT * FROM ev${samplePred.map(p => s" WHERE $p").getOrElse("")}),\n"
    b ++= " c0 AS (SELECT vec_id cid, i, x y FROM ev WHERE vec_id < 8),\n"
    for (t <- 0 until iters) {
      // scores of the TRAINING vectors against iteration-t centroids (same
      // ordered folds as Spark's DotProduct + driver-side c2 fold)
      b ++= s" s$t AS (SELECT tv.vec_id, c.cid, sum(tv.x*c.y ORDER BY i) d, sum(c.y*c.y ORDER BY i) c2\n"
      b ++= s"   FROM tv JOIN c$t c USING (i) GROUP BY tv.vec_id, c.cid),\n"
      b ++= s" a$t AS (SELECT vec_id, cid FROM (\n"
      b ++= s"   SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY -2.0*d + c2, cid) rn FROM s$t) WHERE rn = 1),\n"
      b ++= s" n$t AS (SELECT a.cid, tv.i, CAST(sum(CAST(FLOOR(tv.x*1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)/count(*)/1048576.0 y\n"
      b ++= s"   FROM a$t a JOIN tv ON a.vec_id = tv.vec_id GROUP BY a.cid, tv.i),\n"
      b ++= s" c${t + 1} AS (SELECT p.cid, p.i, COALESCE(n.y, p.y) y FROM c$t p LEFT JOIN n$t n ON p.cid = n.cid AND p.i = n.i),\n"
    }
    b ++= s" sF AS (SELECT ev.vec_id, c.cid, sum(ev.x*c.y ORDER BY i) d, sum(c.y*c.y ORDER BY i) c2\n"
    b ++= s"   FROM ev JOIN c$iters c USING (i) GROUP BY ev.vec_id, c.cid),\n"
    b ++= " aF AS (SELECT vec_id, cid FROM (\n"
    b ++= "   SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY -2.0*d + c2, cid) rn FROM sF) WHERE rn = 1),\n"
    b ++= tail
    b.toString
  }

  /** PQ oracle: replay training (all m subspaces as one grouped k-means,
    * `iters` unrolled iterations), the final per-(vector, subspace) code
    * assignment, and the index-ordered ADC fold — the q85 recipe extended
    * with a `sub` grouping column. Same exactness ingredients: ordered
    * folds for distances, quantized-long means, -2d+c2 argmin with cid
    * tie-break.
    */
  private def pqAdcSql(
      m: Int, dsub: Int, k: Int, iters: Int, topK: Int,
      coarse: Option[(Int, Int)] = None, rerank: Option[Int] = None): String = {
    val b = new StringBuilder
    b ++= s"WITH ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) x, unnest(range(${m * dsub})) i FROM embeddings),\n"
    b ++= s" sv AS (SELECT vec_id, i // $dsub sub, i % $dsub j, x FROM ev),\n"
    b ++= s" cb0 AS (SELECT i // $dsub sub, vec_id cid, i % $dsub j, x y FROM ev WHERE vec_id < $k),\n"
    for (t <- 0 until iters) {
      b ++= s" s$t AS (SELECT sv.vec_id, sv.sub, c.cid, sum(sv.x*c.y ORDER BY sv.j) d, sum(c.y*c.y ORDER BY sv.j) c2\n"
      b ++= s"   FROM sv JOIN cb$t c ON sv.sub = c.sub AND sv.j = c.j GROUP BY sv.vec_id, sv.sub, c.cid),\n"
      b ++= s" a$t AS (SELECT vec_id, sub, cid FROM (\n"
      b ++= s"   SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY vec_id, sub ORDER BY -2.0*d + c2, cid) rn FROM s$t) WHERE rn = 1),\n"
      b ++= s" n$t AS (SELECT a.sub, a.cid, sv.j, CAST(sum(CAST(FLOOR(sv.x*1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)/count(*)/1048576.0 y\n"
      b ++= s"   FROM a$t a JOIN sv ON a.vec_id = sv.vec_id AND a.sub = sv.sub GROUP BY a.sub, a.cid, sv.j),\n"
      b ++= s" cb${t + 1} AS (SELECT p.sub, p.cid, p.j, COALESCE(n.y, p.y) y FROM cb$t p LEFT JOIN n$t n ON p.sub = n.sub AND p.cid = n.cid AND p.j = n.j),\n"
    }
    b ++= s" sF AS (SELECT sv.vec_id, sv.sub, c.cid, sum(sv.x*c.y ORDER BY sv.j) d, sum(c.y*c.y ORDER BY sv.j) c2\n"
    b ++= s"   FROM sv JOIN cb$iters c ON sv.sub = c.sub AND sv.j = c.j GROUP BY sv.vec_id, sv.sub, c.cid),\n"
    b ++= s" aF AS (SELECT vec_id, sub, cid FROM (\n"
    b ++= s"   SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY vec_id, sub ORDER BY -2.0*d + c2, cid) rn FROM sF) WHERE rn = 1),\n"
    // optional IVF coarse pruning (q72's training-free quantizer + probe):
    // candidates = vectors assigned to the query's nprobe nearest cells
    val candFilter = coarse match {
      case Some((numCells, nprobe)) =>
        b ++= s" cc AS (SELECT vec_id ccid, i, x cy FROM ev WHERE vec_id < $numCells),\n"
        b ++= s" cs AS (SELECT ev.vec_id, c.ccid, sum(ev.x*c.cy ORDER BY i) d, sum(c.cy*c.cy ORDER BY i) c2\n"
        b ++= s"   FROM ev JOIN cc c USING (i) GROUP BY ev.vec_id, c.ccid),\n"
        b ++= s" ca AS (SELECT vec_id, ccid FROM (\n"
        b ++= s"   SELECT vec_id, ccid, row_number() OVER (PARTITION BY vec_id ORDER BY -2.0*d + c2, ccid) rn FROM cs) WHERE rn = 1),\n"
        b ++= s" qprobe AS (SELECT ccid FROM (\n"
        b ++= s"   SELECT ccid, row_number() OVER (ORDER BY -2.0*d + c2, ccid) rn FROM cs WHERE vec_id = 0) WHERE rn <= $nprobe),\n"
        b ++= s" cand AS (SELECT vec_id FROM ca WHERE ccid IN (SELECT ccid FROM qprobe) AND vec_id <> 0),\n"
        " AND a.vec_id IN (SELECT vec_id FROM cand)"
      case None => ""
    }
    b ++= s" qv AS (SELECT i // $dsub sub, i % $dsub j, x qx FROM ev WHERE vec_id = 0),\n"
    b ++= s" qd AS (SELECT c.sub, c.cid, sum((q.qx - c.y)*(q.qx - c.y) ORDER BY c.j) dist\n"
    b ++= s"   FROM cb$iters c JOIN qv q ON c.sub = q.sub AND c.j = q.j GROUP BY c.sub, c.cid),\n"
    b ++= s" sc AS (SELECT a.vec_id, sum(qd.dist ORDER BY a.sub) dist\n"
    b ++= s"   FROM aF a JOIN qd ON a.sub = qd.sub AND a.cid = qd.cid WHERE a.vec_id <> 0$candFilter GROUP BY a.vec_id)\n"
    rerank match {
      case None =>
        b ++= s"SELECT vec_id, CAST(FLOOR(dist*1000000) AS BIGINT) dist_e6 FROM sc ORDER BY dist ASC, vec_id ASC LIMIT $topK"
      case Some(shortlist) =>
        // two-stage serve: ADC shortlist of `shortlist` ids, then exact
        // cosine re-rank over the float vectors — the q40 fold verbatim
        // (index-ordered sums, zero-norm guard, floor-e6), restricted to
        // the shortlist
        b ++= s", short AS (SELECT vec_id FROM sc ORDER BY dist ASC, vec_id ASC LIMIT $shortlist),\n"
        b ++= s" dots AS (SELECT ev.vec_id,\n"
        b ++= s"    sum(ev.x*q.x ORDER BY ev.i) d,\n"
        b ++= s"    sum(ev.x*ev.x ORDER BY ev.i) nx,\n"
        b ++= s"    sum(q.x*q.x ORDER BY ev.i) ny\n"
        b ++= s"  FROM ev JOIN (SELECT i, x FROM ev WHERE vec_id = 0) q USING (i)\n"
        b ++= s"  WHERE ev.vec_id IN (SELECT vec_id FROM short) GROUP BY ev.vec_id),\n"
        b ++= s" cosr AS (SELECT vec_id, CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END c FROM dots)\n"
        b ++= s"SELECT vec_id, CAST(FLOOR(c*1000000) AS BIGINT) AS cosine_e6 FROM cosr ORDER BY c DESC, vec_id ASC LIMIT $topK"
    }
    b.toString
  }

  /** q163's SQL: the residual-encoded IVF+PQ (IVFADC) replay — coarse
    * assignment, per-vector residual v − μ_cell(v), residual-space PQ
    * training (same quantized-mean loop as [[pqAdcSql]]), residual
    * encode, and per-probed-cell ADC against the residual query
    * q − μ_c. Every fold is index-ordered (sum ORDER BY), so the ranking
    * replays the Spark kernels bit-exactly.
    */
  private def pqResidualAdcSql(m: Int, dsub: Int, k: Int, iters: Int, topK: Int, numCells: Int, nprobe: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH ev AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) x, unnest(range(${m * dsub})) i FROM embeddings),\n"
    // coarse quantizer (vectors 0..numCells-1) and each vector's cell
    b ++= s" cc AS (SELECT vec_id ccid, i, x cy FROM ev WHERE vec_id < $numCells),\n"
    b ++= s" cs AS (SELECT ev.vec_id, c.ccid, sum(ev.x*c.cy ORDER BY i) d, sum(c.cy*c.cy ORDER BY i) c2\n"
    b ++= s"   FROM ev JOIN cc c USING (i) GROUP BY ev.vec_id, c.ccid),\n"
    b ++= s" ca AS (SELECT vec_id, ccid FROM (\n"
    b ++= s"   SELECT vec_id, ccid, row_number() OVER (PARTITION BY vec_id ORDER BY -2.0*d + c2, ccid) rn FROM cs) WHERE rn = 1),\n"
    // residual of every vector against its own coarse centroid
    b ++= s" rv AS (SELECT ev.vec_id, ev.i, ev.x - c.cy r FROM ev JOIN ca ON ca.vec_id = ev.vec_id\n"
    b ++= s"   JOIN cc c ON c.ccid = ca.ccid AND c.i = ev.i),\n"
    b ++= s" sv AS (SELECT vec_id, i // $dsub sub, i % $dsub j, r x FROM rv),\n"
    b ++= s" cb0 AS (SELECT i // $dsub sub, vec_id cid, i % $dsub j, r y FROM rv WHERE vec_id < $k),\n"
    for (t <- 0 until iters) {
      b ++= s" s$t AS (SELECT sv.vec_id, sv.sub, c.cid, sum(sv.x*c.y ORDER BY sv.j) d, sum(c.y*c.y ORDER BY sv.j) c2\n"
      b ++= s"   FROM sv JOIN cb$t c ON sv.sub = c.sub AND sv.j = c.j GROUP BY sv.vec_id, sv.sub, c.cid),\n"
      b ++= s" a$t AS (SELECT vec_id, sub, cid FROM (\n"
      b ++= s"   SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY vec_id, sub ORDER BY -2.0*d + c2, cid) rn FROM s$t) WHERE rn = 1),\n"
      b ++= s" n$t AS (SELECT a.sub, a.cid, sv.j, CAST(sum(CAST(FLOOR(sv.x*1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)/count(*)/1048576.0 y\n"
      b ++= s"   FROM a$t a JOIN sv ON a.vec_id = sv.vec_id AND a.sub = sv.sub GROUP BY a.sub, a.cid, sv.j),\n"
      b ++= s" cb${t + 1} AS (SELECT p.sub, p.cid, p.j, COALESCE(n.y, p.y) y FROM cb$t p LEFT JOIN n$t n ON p.sub = n.sub AND p.cid = n.cid AND p.j = n.j),\n"
    }
    b ++= s" sF AS (SELECT sv.vec_id, sv.sub, c.cid, sum(sv.x*c.y ORDER BY sv.j) d, sum(c.y*c.y ORDER BY sv.j) c2\n"
    b ++= s"   FROM sv JOIN cb$iters c ON sv.sub = c.sub AND sv.j = c.j GROUP BY sv.vec_id, sv.sub, c.cid),\n"
    b ++= s" aF AS (SELECT vec_id, sub, cid FROM (\n"
    b ++= s"   SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY vec_id, sub ORDER BY -2.0*d + c2, cid) rn FROM sF) WHERE rn = 1),\n"
    // the query's nprobe cells, its per-cell residual, per-cell ADC table
    b ++= s" qprobe AS (SELECT ccid FROM (\n"
    b ++= s"   SELECT ccid, row_number() OVER (ORDER BY -2.0*d + c2, ccid) rn FROM cs WHERE vec_id = 0) WHERE rn <= $nprobe),\n"
    b ++= s" cand AS (SELECT vec_id FROM ca WHERE ccid IN (SELECT ccid FROM qprobe) AND vec_id <> 0),\n"
    b ++= s" qr AS (SELECT p.ccid, ev.i, ev.x - c.cy qx FROM ev CROSS JOIN qprobe p\n"
    b ++= s"   JOIN cc c ON c.ccid = p.ccid AND c.i = ev.i WHERE ev.vec_id = 0),\n"
    b ++= s" qd AS (SELECT q.ccid, c.sub, c.cid, sum((q.qx - c.y)*(q.qx - c.y) ORDER BY c.j) dist\n"
    b ++= s"   FROM cb$iters c JOIN qr q ON c.sub = q.i // $dsub AND c.j = q.i % $dsub GROUP BY q.ccid, c.sub, c.cid),\n"
    // score each candidate with ITS OWN cell's table
    b ++= s" sc AS (SELECT a.vec_id, sum(qd.dist ORDER BY a.sub) dist\n"
    b ++= s"   FROM aF a JOIN ca ON ca.vec_id = a.vec_id JOIN qd ON qd.ccid = ca.ccid AND qd.sub = a.sub AND qd.cid = a.cid\n"
    b ++= s"   WHERE a.vec_id IN (SELECT vec_id FROM cand) GROUP BY a.vec_id)\n"
    b ++= s"SELECT vec_id, CAST(FLOOR(dist*1000000) AS BIGINT) dist_e6 FROM sc ORDER BY dist ASC, vec_id ASC LIMIT $topK"
    b.toString
  }

  /** q72's probe-3 / cosine-top-20 tail over the final assignment. */
  private val ivfRankTail: String =
    """ qprobe AS (SELECT cid FROM (
      |   SELECT cid, row_number() OVER (ORDER BY -2.0*d + c2, cid) rn FROM sF WHERE vec_id = 0) WHERE rn <= 3),
      | cand AS (SELECT vec_id FROM aF WHERE cid IN (SELECT cid FROM qprobe) AND vec_id <> 0),
      | q AS (SELECT embedding qe FROM embeddings WHERE vec_id = 0),
      | pairs AS (SELECT e2.vec_id, unnest(e2.embedding) x, unnest(q.qe) y, unnest(range(64)) i
      |   FROM embeddings e2, q WHERE e2.vec_id IN (SELECT vec_id FROM cand)),
      | dots AS (SELECT vec_id,
      |    sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) d,
      |    sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) ORDER BY i) nx,
      |    sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) ny
      |  FROM pairs GROUP BY vec_id),
      | cos AS (SELECT vec_id, CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END c FROM dots)
      |SELECT vec_id, CAST(FLOOR(c*1000000) AS BIGINT) AS cosine_e6
      |FROM cos ORDER BY c DESC, vec_id ASC LIMIT 20""".stripMargin

  /** SemDeDup tail: within-cell pair cosines (ordered folds) + the
    * lower-id drop rule, over the final assignment.
    */
  private val ivfSemDedupTail: String =
    """ p AS (SELECT a.vec_id ia, b.vec_id ib FROM aF a JOIN aF b ON a.cid = b.cid AND a.vec_id < b.vec_id),
      | pe AS (SELECT ia, ib, unnest(e1.embedding) x, unnest(e2.embedding) y, unnest(range(64)) i
      |   FROM p JOIN embeddings e1 ON e1.vec_id = p.ia JOIN embeddings e2 ON e2.vec_id = p.ib),
      | pd AS (SELECT ia, ib, sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) d,
      |    sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) ORDER BY i) nx,
      |    sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) ny
      |  FROM pe GROUP BY ia, ib),
      | drops AS (SELECT DISTINCT ib FROM pd
      |   WHERE (CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END) >= 0.3)
      |SELECT e.vec_id, a.cid AS cell_id
      |FROM embeddings e JOIN aF a ON a.vec_id = e.vec_id
      |WHERE e.vec_id NOT IN (SELECT ib FROM drops)""".stripMargin

  /** The 1-in-4 md5 hash-sample predicate — DuckDB replay of
    * `Sampling.hashBucket(col("vec_id"), 4) === 0`.
    */
  private val vecIdSample4: String =
    "(CAST(('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT) % 4) = 0"

  /** q148/q166's SQL (shared): the replica after applying the v1→v2
    * change feed = the source's v2 active set (b2 wins, b1 survives where
    * unmatched). q166 streams the same feed in key-hash-split
    * micro-batches, so the streamed consumer must converge to the
    * identical state.
    */
  private lazy val cdcApplySql: String =
    """WITH b1 AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      |    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |      row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
      |    FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00') WHERE rn = 1),
      | b2 AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      |    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |      row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
      |    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00') WHERE rn = 1)
      |SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM b2
      |UNION ALL
      |SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM b1
      | WHERE o_custkey NOT IN (SELECT o_custkey FROM b2)""".stripMargin

  /** q165/q169's SQL (shared): exact per-range distincts + day counts,
    * est_ok pinned TRUE. q169 streams the same rollup into existence in
    * user-split micro-batches (merge-on-write), so the served ranges must
    * be identical.
    */
  private lazy val sketchRollupSql: String =
    """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, user_id FROM events),
      | r1 AS (SELECT '2024-01-05..2024-01-14' AS day_range, event_type,
      |     CAST(count(DISTINCT day) AS BIGINT) AS days_merged,
      |     CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct, TRUE AS est_ok
      |   FROM e WHERE day BETWEEN '2024-01-05' AND '2024-01-14' GROUP BY event_type),
      | r2 AS (SELECT '2024-01-15..2024-01-25' AS day_range, event_type,
      |     CAST(count(DISTINCT day) AS BIGINT) AS days_merged,
      |     CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct, TRUE AS est_ok
      |   FROM e WHERE day BETWEEN '2024-01-15' AND '2024-01-25' GROUP BY event_type)
      |SELECT * FROM r1 UNION ALL SELECT * FROM r2""".stripMargin

  /** q167's SQL: the full 4-iteration fixed-point GD replayed in unrolled
    * CTEs — per-(doc,bucket) feature counts, per-doc predictions against
    * the previous weights, errors vs the e6-scaled label, per-bucket
    * gradient sums, and the exact floor-division update, all in HUGEINT.
    * `AS MATERIALIZED` is load-bearing: each w_i feeds both p_{i+1} and
    * w_{i+1}, so DuckDB's default CTE inlining would re-evaluate the
    * chain multiplicatively (2^iters scans).
    */
  private lazy val trainLinearSql: String = {
    val iters = 4
    val b = new StringBuilder
    b ++= s"WITH base AS (SELECT doc_id, $tokensExpr ws,\n"
    b ++= "   CASE WHEN lang='en' THEN CAST(1000000 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END y6 FROM documents),\n"
    b ++= " fx AS MATERIALIZED (SELECT doc_id, unnest(list_concat(ws,\n"
    b ++= "   CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])\n"
    b ++= "        ELSE list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) END)) feat FROM base),\n"
    b ++= " feats AS MATERIALIZED (SELECT doc_id, CAST(('0x'||substr(md5(feat),1,15)) AS BIGINT) % 4096 AS bucket,\n"
    b ++= "   CAST(count(*) AS HUGEINT) x FROM fx GROUP BY 1, 2),\n"
    b ++= " nn AS (SELECT CAST(count(*) AS HUGEINT) * 1024 AS d FROM base),\n"
    b ++= " w0 AS MATERIALIZED (SELECT DISTINCT bucket, CAST(0 AS HUGEINT) wv FROM feats),\n"
    for (i <- 1 to iters) {
      b ++= s" p$i AS MATERIALIZED (SELECT f.doc_id, SUM(f.x * w.wv) pred6 FROM feats f JOIN w${i - 1} w USING (bucket) GROUP BY 1),\n"
      b ++= s" e$i AS MATERIALIZED (SELECT b.doc_id, COALESCE(p.pred6, 0) - b.y6 AS e6 FROM base b LEFT JOIN p$i p USING (doc_id)),\n"
      b ++= s" g$i AS MATERIALIZED (SELECT f.bucket, SUM(f.x * e.e6) g FROM feats f JOIN e$i e USING (doc_id) GROUP BY 1),\n"
      b ++= s" w$i AS MATERIALIZED (SELECT w.bucket, w.wv - (g.g - ((g.g % n.d + n.d) % n.d)) // n.d AS wv\n"
      b ++= s"   FROM w${i - 1} w JOIN g$i g USING (bucket) CROSS JOIN nn n)${if (i < iters) "," else ""}\n"
    }
    b ++= s"SELECT CAST(bucket AS BIGINT) AS bucket, CAST(wv AS BIGINT) AS w_e6 FROM w$iters"
    b.toString
  }

  /** q146/q162's SQL (shared): full q37 LSH replication restricted to
    * pairs touching the new batch (doc_id % 5 = 0) — bucket candidacy is
    * symmetric, so probing the index finds exactly these pairs, and the
    * streaming sink's per-batch union reproduces them batch-boundary-
    * invariantly.
    */
  private lazy val incrementalLshSql: String = {
      import graft.plans.MinHashSig.{P, a, b}
      val sigList = (0 until 16)
        .map(i => s"list_min(list_transform(sh, h -> (${a(i)}*(h%$P)+${b(i)})%$P))")
        .mkString("[", ",\n   ", "]")
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | sh AS (SELECT doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) sh
         |  FROM base),
         | sig AS (SELECT doc_id, $sigList sig FROM sh WHERE len(sh) > 0),
         | banded AS (SELECT doc_id, unnest(list_transform(range(0, 8),
         |    b -> CAST(b AS VARCHAR)||':'||CAST(sig[CAST(2*b+1 AS INTEGER)] AS VARCHAR)||','||CAST(sig[CAST(2*b+2 AS INTEGER)] AS VARCHAR))) bucket
         |  FROM sig),
         | cand AS (SELECT DISTINCT x.doc_id id_a, y.doc_id id_b
         |  FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
         |  WHERE x.doc_id % 5 = 0 OR y.doc_id % 5 = 0),
         | ver AS (SELECT id_a, id_b, len(list_intersect(p.sh, q.sh)) inter, len(p.sh) la, len(q.sh) lb
         |  FROM cand JOIN sh p ON id_a = p.doc_id JOIN sh q ON id_b = q.doc_id),
         | j AS (SELECT id_a, id_b,
         |    CASE WHEN la+lb-inter = 0 THEN 0.0 ELSE CAST(inter AS DOUBLE)/(la+lb-inter) END jac FROM ver)
         |SELECT id_a, id_b, CAST(FLOOR(jac*10000) AS BIGINT) AS jaccard_e4
         |FROM j WHERE jac >= CAST(0.5 AS DOUBLE)""".stripMargin
  }

  /** q99's SQL: the merge list comes from [[graft.plans.Bpe.merges]] — ONE
    * definition feeds both engines, so a vocab edit cannot desync them.
    * Merge keys use ' ' as the symbol separator: symbols never contain
    * whitespace (pre-tokens exclude it), so the key is unambiguous.
    */
  private lazy val bpeSql: String = {
    val mlist = graft.plans.Bpe.merges.map { case (l, r) => s"'$l $r'" }.mkString("[", ", ", "]")
    // adjacent-pair ranks of symbol list `s`: 1-based merge-list position,
    // 0 = pair is not a merge (DuckDB list_position returns 0, not NULL)
    def rk(s: String) = s"list_transform(range(1, len($s)), i -> list_position($mlist, $s[i] || ' ' || $s[i+1]))"
    // leftmost occurrence of the lowest-rank mergeable pair, NULL if none
    def bi(s: String) =
      s"""CASE WHEN len(list_filter(${rk(s)}, p -> p > 0)) = 0 THEN NULL
         | ELSE list_position(${rk(s)}, list_aggregate(list_filter(${rk(s)}, p -> p > 0), 'min')) END""".stripMargin
    s"""WITH RECURSIVE
       |pre AS (SELECT doc_id, unnest(regexp_extract_all(text, '${graft.plans.Bpe.PretokenRegex}')) w FROM documents),
       |words AS (SELECT DISTINCT w FROM pre),
       |init AS (SELECT w, list_transform(range(1, length(w)+1), i -> w[i:i]) syms FROM words),
       |bpe(w, syms, bi) AS (
       |  SELECT w, syms, ${bi("syms")} FROM init
       |  UNION ALL
       |  SELECT w, ns, ${bi("ns")} FROM (
       |    SELECT w, syms[1:bi-1] || [syms[bi] || syms[bi+1]] || syms[bi+2:len(syms)] AS ns
       |    FROM bpe WHERE bi IS NOT NULL) t
       |),
       |fin AS (SELECT w, len(syms) n FROM bpe WHERE bi IS NULL),
       |per_doc AS (SELECT p.doc_id, CAST(sum(f.n) AS BIGINT) n_bpe, CAST(count(*) AS BIGINT) n_pre
       |            FROM pre p JOIN fin f ON p.w = f.w GROUP BY p.doc_id)
       |SELECT d.doc_id, CAST(COALESCE(pd.n_pre, 0) AS BIGINT) AS n_pre, CAST(COALESCE(pd.n_bpe, 0) AS BIGINT) AS n_bpe
       |FROM documents d LEFT JOIN per_doc pd ON d.doc_id = pd.doc_id""".stripMargin
  }

  /** Replay [[graft.operators.Graph.pageRank]] as `iters` unrolled
    * iteration CTEs over the q116 supplier co-occurrence graph. Every
    * contribution is `(rank * 85) // (100 * deg)` on BIGINTs — floor
    * division, exact in both engines — so the ranks match bit-for-bit
    * with no floating-point association anywhere. Dangling mass is
    * dropped (the operator's documented formulation).
    */
  /** q139 oracle: full BPE-training replay, one unrolled block per merge
    * step — pair statistics over the word-frequency table, argmax with the
    * (count desc, pair asc) tie-break, then left-to-right non-overlapping
    * application via a recursive position-walk CTE (q99's apply shape,
    * once per step). Every learned merge is independently re-derived.
    */
  /** Replay [[TextAnalysis.repetitionSignals]] in DuckDB: per-row list
    * folds only — grams per n, distinct/count arrays for the top-gram
    * masses (n=2..4), sum-minus-distinct-sum for the duplicate masses
    * (n=5..10), the same normalized char denominator and FLOOR(x*1e4)
    * double chain. Chained CTEs bind each array once so nothing is
    * recomputed quadratically across lambda scopes.
    */
  private lazy val repetitionSql: String = {
    val tops = Seq(2, 3, 4)
    val dups = 5 to 10
    def gram(n: Int) =
      s"""CASE WHEN len(ws) < $n THEN CAST([] AS VARCHAR[])
         |   ELSE list_transform(range(1, len(ws)-${n - 2}), i -> array_to_string(list_slice(ws, i, i+${n - 1}), ' ')) END AS g$n""".stripMargin
    val gramCols = (tops ++ dups).map(gram).mkString(",\n   ")
    val distCols = tops.map(n => s"list_distinct(g$n) AS d$n").mkString(", ")
    val cntCols = tops
      .map(n => s"list_transform(d$n, x -> CAST(len(list_filter(g$n, y -> y = x)) AS BIGINT)) AS c$n")
      .mkString(",\n   ")
    val topMass = tops
      .map(n =>
        s"""COALESCE(list_max(list_transform(range(1, len(d$n)+1),
           |     i -> CASE WHEN c$n[i] = COALESCE(list_max(c$n), 0) THEN c$n[i] * len(d$n[i]) ELSE 0 END)), 0) AS tm$n""".stripMargin)
      .mkString(",\n   ")
    val dupMass = dups
      .map(n =>
        s"""CAST(COALESCE(list_sum(list_transform(g$n, x -> len(x))), 0)
           |   - COALESCE(list_sum(list_transform(list_distinct(g$n), x -> len(x))), 0) AS BIGINT) AS dm$n""".stripMargin)
      .mkString(",\n   ")
    def frac(mass: String, out: String) =
      s"CASE WHEN norm = 0 THEN 0 ELSE CAST(FLOOR(CAST($mass AS DOUBLE) * 10000.0e0 / norm) AS BIGINT) END AS $out"
    val fracCols =
      (tops.map(n => frac(s"tm$n", s"top${n}_frac_e4")) ++
        dups.map(n => frac(s"dm$n", s"dup${n}_frac_e4"))).mkString(",\n  ")
    val topThr = Map(2 -> 2000, 3 -> 1800, 4 -> 1600)
    val dupThr = Map(5 -> 1500, 6 -> 1400, 7 -> 1300, 8 -> 1200, 9 -> 1100, 10 -> 1000)
    val pass =
      (tops.map(n => s"top${n}_frac_e4 <= ${topThr(n)}") ++
        dups.map(n => s"dup${n}_frac_e4 <= ${dupThr(n)}")).mkString(" AND ")
    s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
       | g AS (SELECT doc_id, ws,
       |   CAST(COALESCE(list_sum(list_transform(ws, x -> len(x))), 0) + greatest(len(ws) - 1, 0) AS BIGINT) AS norm,
       |   $gramCols
       |  FROM base),
       | c AS (SELECT *, $distCols FROM g),
       | k AS (SELECT *,
       |   $cntCols
       |  FROM c),
       | m AS (SELECT doc_id, norm,
       |   $topMass,
       |   $dupMass
       |  FROM k),
       | f AS (SELECT doc_id,
       |  $fracCols
       | FROM m)
       |SELECT *, ($pass) AS pass_repetition_full FROM f""".stripMargin
  }

  private def bpeTrainSql(n: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH RECURSIVE base AS (SELECT doc_id, $tokensExpr ws FROM documents),\n"
    // AS MATERIALIZED is load-bearing, not an optimization hint: DuckDB
    // inlines every CTE reference, and wd_k is referenced by px_k AND
    // app_k while wd_{k+1} derives from app_k — inlined, the chain
    // re-evaluates 2^n times (minutes at n=8; 0.5s materialized)
    b ++= " wf AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) freq FROM (SELECT unnest(ws) w FROM base) GROUP BY w),\n"
    b ++= " wd0 AS MATERIALIZED (SELECT w, freq, string_split(w, '') toks FROM wf),\n"
    for (k <- 0 until n) {
      b ++= s" px$k AS (SELECT toks, freq, unnest(range(1, len(toks))) i FROM wd$k),\n"
      b ++= s" pr$k AS (SELECT toks[i] l, toks[i+1] r, CAST(sum(freq) AS BIGINT) c FROM px$k GROUP BY 1, 2),\n"
      b ++= s" best$k AS MATERIALIZED (SELECT l, r, c FROM pr$k ORDER BY c DESC, l ASC, r ASC LIMIT 1),\n"
      b ++= s" app$k(w, freq, toks, pos, out) AS (\n"
      b ++= s"   SELECT w, freq, toks, 1, CAST([] AS VARCHAR[]) FROM wd$k\n"
      b ++= "   UNION ALL\n"
      b ++= "   SELECT a.w, a.freq, a.toks,\n"
      b ++= "     CASE WHEN a.pos < len(a.toks) AND a.toks[a.pos] = b.l AND a.toks[a.pos+1] = b.r THEN a.pos + 2 ELSE a.pos + 1 END,\n"
      b ++= "     CASE WHEN a.pos < len(a.toks) AND a.toks[a.pos] = b.l AND a.toks[a.pos+1] = b.r THEN list_append(a.out, b.l || b.r) ELSE list_append(a.out, a.toks[a.pos]) END\n"
      b ++= s"   FROM app$k a, best$k b WHERE a.pos <= len(a.toks)\n"
      b ++= " ),\n"
      b ++= s" wd${k + 1} AS MATERIALIZED (SELECT w, freq, out AS toks FROM app$k WHERE pos > len(toks))${if (k < n - 1) "," else ""}\n"
    }
    b ++= (0 until n)
      .map(k => s"SELECT CAST(${k + 1} AS BIGINT) AS step, l AS lhs, r AS rhs, c AS pair_count FROM best$k")
      .mkString("", "\nUNION ALL\n", "")
    b.toString
  }

  private def pageRankSql(iters: Int): String = {
    val b = new StringBuilder
    b ++= "WITH e AS (SELECT DISTINCT a.l_suppkey src, b.l_suppkey dst FROM lineitem a\n"
    b ++= "   JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),\n"
    b ++= " v AS (SELECT DISTINCT src AS vid FROM e UNION SELECT DISTINCT dst FROM e),\n"
    b ++= " od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),\n"
    b ++= " r0 AS (SELECT vid, CAST(1000000000000 AS BIGINT) AS rank FROM v),\n"
    for (t <- 0 until iters) {
      b ++= s" c$t AS (SELECT e.dst AS vid, CAST(sum((r.rank * 85) // (100 * od.deg)) AS BIGINT) AS mass\n"
      b ++= s"   FROM e JOIN r$t r ON e.src = r.vid JOIN od ON e.src = od.src GROUP BY e.dst),\n"
      b ++= s" r${t + 1} AS (SELECT v.vid, CAST(150000000000 + coalesce(c$t.mass, 0) AS BIGINT) AS rank\n"
      b ++= s"   FROM v LEFT JOIN c$t ON v.vid = c$t.vid)${if (t < iters - 1) "," else ""}\n"
    }
    b ++= s"SELECT vid AS s_suppkey, rank AS rank_units FROM r$iters"
    b.toString
  }

  /** Shared by q175 (batch WARC ingest) and q182 (its streaming twin —
    * the stateless parse must converge to the batch result verbatim).
    */
  private val warcIngestOracle: String =
    """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 5000),
      | r AS (SELECT doc_id // 5 AS fid, doc_id, text,
      |    CAST(row_number() OVER (PARTITION BY doc_id // 5 ORDER BY doc_id) AS INTEGER) rn,
      |    CAST(count(*) OVER (PARTITION BY doc_id // 5) AS INTEGER) cnt
      |  FROM d),
      | info AS (SELECT DISTINCT fid AS file_id, CAST(0 AS INTEGER) AS rec_idx,
      |    'warcinfo' AS warc_type, '' AS target_uri, CAST(-1 AS INTEGER) AS http_status,
      |    CAST(17 AS BIGINT) AS body_len,
      |    CAST(('0x'||substr(md5('software: graft' || chr(13) || chr(10)),1,15)) AS BIGINT) AS body_h,
      |    TRUE AS ok FROM r),
      | resp AS (SELECT fid AS file_id, rn AS rec_idx, 'response' AS warc_type,
      |    'http://example.com/doc/' || doc_id AS target_uri,
      |    CAST(CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS INTEGER) AS http_status,
      |    CAST(strlen(text) AS BIGINT) AS body_len,
      |    CAST(('0x'||substr(md5(text),1,15)) AS BIGINT) AS body_h,
      |    TRUE AS ok
      |  FROM r WHERE NOT (fid % 13 = 0 AND rn = cnt)),
      | sent AS (SELECT fid AS file_id, cnt AS rec_idx, '' AS warc_type, '' AS target_uri,
      |    CAST(-1 AS INTEGER) AS http_status, CAST(-1 AS BIGINT) AS body_len,
      |    CAST(('0x'||substr(md5(''),1,15)) AS BIGINT) AS body_h, FALSE AS ok
      |  FROM r WHERE fid % 13 = 0 AND rn = cnt)
      |SELECT * FROM info UNION ALL SELECT * FROM resp UNION ALL SELECT * FROM sent""".stripMargin

  /** The q178/q179/q181 fixture HTML expression (must stay identical to
    * Queries.htmlFixture) and the extraction-rule CTE chain (must stay
    * identical to operators.Html) — shared so a rule change is mirrored
    * in ONE place instead of three oracle copies.
    */
  private val htmlFixtureSql: String =
    """  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' &amp; friends</title><style>p{color:red}</style></head><body><script>var x = "<p>not text</p>";</script><h1>Title ' ||
      |  CAST(doc_id AS VARCHAR) || '</h1><p>' || text || '</p><!-- hidden --><div>tail &lt;' || CAST(doc_id AS VARCHAR) ||
      |  '&gt;&nbsp;end</div><a href="http://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/doc/' || CAST((doc_id*13) % 500 AS VARCHAR) ||
      |  '">next</a><a href="#frag">skip</a><a href=''/rel/' || CAST(doc_id AS VARCHAR) || '''>rel</a></body></html>' AS html""".stripMargin

  private val htmlChainSql: String =
    """ s1 AS (SELECT doc_id, html,
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      |      '(?is)<head\b[^>]*>.*?</head>', ' ', 'g'),
      |      '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
      |      '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
      |      '(?s)<!--.*?-->', ' ', 'g') x FROM h),
      | s2 AS (SELECT doc_id, html,
      |    regexp_replace(regexp_replace(x,
      |      '(?i)<(?:/p|/div|/li|/h[1-6]|/tr|br\s*/?)>', ' ', 'g'),
      |      '<[^>]*>', '', 'g') x FROM s1),
      | s3 AS (SELECT doc_id, html,
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(x,
      |      '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
      |      '&quot;', '"', 'g'), '&#39;', '''', 'g'), '&amp;', '&', 'g') x FROM s2),
      | out AS (SELECT doc_id, html, trim(regexp_replace(x, '\s+', ' ', 'g')) txt FROM s3),
      | ti AS (SELECT doc_id, txt,
      |    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1),
      |      '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
      |      '&quot;', '"', 'g'), '&#39;', '''', 'g'), '&amp;', '&', 'g')) title FROM out)""".stripMargin

  /** Shared by q156 (exact screen) and q196 (IVF-celled screen at
    * nprobe = all cells — provably the same output): ordered dot folds
    * (q72's chain), (cosine DESC, cid) top-5, majority by
    * (count DESC, label ASC).
    */
  /** Shared by q198 (posexplode-join formulation) and q199 (outer-product
    * fold): one oracle text, so the gate itself proves the two plans
    * interchangeable.
    */
  private val covarianceSql: String =
    """WITH e AS (SELECT vec_id, CAST(i AS BIGINT) dim,
      |    CAST(FLOOR(CAST(embedding[i+1] AS DOUBLE) * 1000000.0e0) AS BIGINT) v
      |  FROM embeddings, range(64) t(i)),
      | p AS (SELECT x.dim i, y.dim j,
      |        CAST(count(*) AS BIGINT) n,
      |        CAST(sum(x.v) AS BIGINT) si, CAST(sum(y.v) AS BIGINT) sj,
      |        CAST(sum(CAST(x.v AS HUGEINT) * y.v) AS HUGEINT) sij
      |   FROM e x JOIN e y ON x.vec_id = y.vec_id AND x.dim <= y.dim
      |   GROUP BY 1, 2)
      |SELECT i AS dim_i, j AS dim_j, n,
      | CAST((CAST(n AS HUGEINT) * sij - CAST(si AS HUGEINT) * sj) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS cov_e12
      |FROM p""".stripMargin

  private val labelScreenSql: String =
    """WITH p AS (SELECT vec_id pid, embedding pe, CAST(label AS BIGINT) plab
      |   FROM embeddings WHERE vec_id % 20 = 0),
      | pr AS (SELECT c.vec_id cid, CAST(c.label AS BIGINT) clab, p.pid, p.plab,
      |   unnest(c.embedding) x, unnest(p.pe) y, unnest(range(64)) i
      |   FROM embeddings c, p WHERE c.vec_id <> p.pid),
      | dots AS (SELECT pid, plab, cid, clab,
      |    sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) d,
      |    sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) ORDER BY i) nx,
      |    sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) ny
      |  FROM pr GROUP BY pid, plab, cid, clab),
      | cos AS (SELECT pid, plab, cid, clab,
      |    CASE WHEN sqrt(ny)*sqrt(nx)=0 THEN 0.0 ELSE d/(sqrt(ny)*sqrt(nx)) END c FROM dots),
      | top AS (SELECT pid, plab, clab FROM (
      |    SELECT pid, plab, clab, row_number() OVER (PARTITION BY pid ORDER BY c DESC, cid ASC) rn
      |    FROM cos) WHERE rn <= 5),
      | maj AS (SELECT pid, plab, clab, count(*) n,
      |    row_number() OVER (PARTITION BY pid ORDER BY count(*) DESC, clab ASC) rm
      |  FROM top GROUP BY pid, plab, clab)
      |SELECT pid AS vec_id, plab AS own_label, clab AS neighbor_label,
      |  CAST(n AS BIGINT) AS n_votes, (plab <> clab) AS flagged
      |FROM maj WHERE rm = 1""".stripMargin

  val all: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
        |  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE) AND l_quantity < 24""".stripMargin,

    "q03_join_revenue" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey=o_custkey JOIN lineitem ON o_orderkey=l_orderkey
        |WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00' AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY o_orderkey, o_orderdate""".stripMargin,

    "q04_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey=o_orderkey AND l_quantity > 45)""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_orderpriority='1-URGENT')""".stripMargin,

    "q06_dim_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q07_window_latest" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        | SELECT o_custkey, o_orderkey, o_orderdate,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        | FROM orders) WHERE rn = 1""".stripMargin,

    "q08_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q09_in_list" ->
      """SELECT l_partkey, count(*) AS n_lines, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_partkey IN (1,7,42,99,123,555,1024,1776) GROUP BY l_partkey""".stripMargin,

    "q10_null_sentinel" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        | count(CASE WHEN o_orderpriority='1-URGENT' THEN NULL ELSE o_orderpriority END) AS n_nonnull,
        | count(*) - count(CASE WHEN o_orderpriority='1-URGENT' THEN NULL ELSE o_orderpriority END) AS n_nulled
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q11_scd2_upsert" ->
      """WITH w AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        | tgt AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    CASE WHEN rn=1 THEN 'Y' ELSE 'N' END actv_flg, CAST(NULL AS TIMESTAMP) record_to FROM w),
        | wb AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
        | batch AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM wb WHERE rn=1),
        | bkeys AS (SELECT DISTINCT o_custkey FROM batch)
        |SELECT * FROM tgt WHERE actv_flg='N'
        |UNION ALL
        |SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, 'N', TIMESTAMP '2002-01-01 00:00:00'
        |FROM tgt WHERE actv_flg='Y' AND o_custkey IN (SELECT o_custkey FROM bkeys)
        |UNION ALL
        |SELECT * FROM tgt WHERE actv_flg='Y' AND o_custkey NOT IN (SELECT o_custkey FROM bkeys)
        |UNION ALL
        |SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, 'Y', CAST(NULL AS TIMESTAMP) FROM batch""".stripMargin,

    "q12_state_delta" ->
      """WITH cur AS (SELECT user_id,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) total_cents,
        |    count(*) n_events
        |  FROM events GROUP BY user_id),
        | snap AS (SELECT user_id,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) prev_total_cents
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id)
        |SELECT c.user_id, c.n_events,
        | CASE WHEN s.user_id IS NOT NULL THEN c.total_cents - COALESCE(s.prev_total_cents, 0)
        |      ELSE c.total_cents END AS delta_total_cents
        |FROM cur c LEFT JOIN snap s ON c.user_id = s.user_id""".stripMargin,

    "q13_explode_tokens" ->
      """SELECT token, count(*) AS n FROM (SELECT unnest(string_split(p_type,' ')) token FROM part)
        |GROUP BY token""".stripMargin,

    "q14_first_element" ->
      """SELECT head_token, count(*) AS n, CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM (SELECT string_split(p_type,' ')[1] head_token, p_retailprice FROM part)
        |GROUP BY head_token""".stripMargin,

    "q15_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | max(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q16_float_to_long" ->
      // mirrors the Spark side's full contract: NaN -> 0 (nanvl) as well as
      // NULL -> 0, then truncate
      """SELECT CAST(TRUNC(CASE WHEN l_quantity IS NULL OR isnan(l_quantity) THEN 0 ELSE l_quantity END) AS BIGINT) AS qty_int,
        | count(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q17_year_filter" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders WHERE year(o_orderdate) >= 1999 GROUP BY 1""".stripMargin,

    "q18_date_parts" ->
      """SELECT CAST(year(ts) AS INTEGER) AS y, lpad(CAST(month(ts) AS VARCHAR),2,'0') AS m,
        | lpad(CAST(day(ts) AS VARCHAR),2,'0') AS d, CAST(hour(ts) AS INTEGER) AS h, count(*) AS n
        |FROM events GROUP BY 1,2,3,4""".stripMargin,

    "q19_mask_hash" ->
      "SELECT c_custkey, sha256(c_name) AS name_hash, c_nationkey FROM customer",

    "q20_scd2_two_key" ->
      """WITH target AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
        |    'Y' actv_flg, CAST(NULL AS TIMESTAMP) record_to
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01 00:00:00'),
        | batch AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'),
        | scd AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
        |    'N' actv_flg, TIMESTAMP '2002-01-01 00:00:00' record_to FROM target
        |  WHERE l_partkey IN (SELECT l_partkey FROM batch) AND l_suppkey IN (SELECT l_suppkey FROM batch)
        |  UNION ALL
        |  SELECT * FROM target
        |  WHERE NOT (l_partkey IN (SELECT l_partkey FROM batch) AND l_suppkey IN (SELECT l_suppkey FROM batch))
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, 'Y', CAST(NULL AS TIMESTAMP) FROM batch)
        |SELECT actv_flg, count(*) AS n_rows, CAST(sum(l_partkey) AS BIGINT) AS sum_partkey,
        | CAST(sum(l_suppkey) AS BIGINT) AS sum_suppkey, count(record_to) AS n_closed
        |FROM scd GROUP BY actv_flg""".stripMargin,

    // run identifiers/kwargs mirror DqSuite's deterministic GX-shaped fields
    // (great_expectations.py:313-335); doubles in kwargs print in Scala
    // Double notation
    "q21_dq_suite" ->
      """WITH m AS (SELECT count(*) n, count(*)-count(o_orderstatus) u_status, count(*)-count(o_totalprice) u_total,
        |   count(CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < CAST(0 AS DOUBLE) OR o_totalprice > CAST(1e9 AS DOUBLE)) THEN 1 END) u_between
        | FROM orders),
        | d AS (SELECT CAST(coalesce(sum(c),0) AS BIGINT) n, CAST(coalesce(sum(CASE WHEN c>1 THEN c END),0) AS BIGINT) dups
        |   FROM (SELECT count(*) c FROM orders GROUP BY o_orderkey))
        |SELECT 'orders' AS file_identifier, 'b1' AS "batchID", 'o_orderstatus' AS column_name,
        |  'expect_column_values_to_not_be_null' AS expectation_type, u_status=0 AS success,
        |  n AS element_count, CAST(u_status AS BIGINT) AS unexpected_count,
        |  'graft-orders-b1' AS great_exp_id, '{"column": "o_orderstatus"}' AS expectation_kwargs,
        |  'graft-checkpoint-b1' AS run_name FROM m
        |UNION ALL SELECT 'orders','b1','o_totalprice','expect_column_values_to_not_be_null', u_total=0, n, CAST(u_total AS BIGINT),
        |  'graft-orders-b1', '{"column": "o_totalprice"}', 'graft-checkpoint-b1' FROM m
        |UNION ALL SELECT 'orders','b1','o_totalprice','expect_column_values_to_be_between', u_between=0, n, CAST(u_between AS BIGINT),
        |  'graft-orders-b1', '{"column": "o_totalprice", "min_value": 0.0, "max_value": 1.0E9}', 'graft-checkpoint-b1' FROM m
        |UNION ALL SELECT 'orders','b1','o_orderkey','expect_column_values_to_be_unique', dups=0, n, dups,
        |  'graft-orders-b1', '{"column": "o_orderkey"}', 'graft-checkpoint-b1' FROM d""".stripMargin,

    "q22_unique_check" ->
      """SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1""".stripMargin,

    "q23_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,

    "q24_sessions" ->
      """WITH e AS (SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_ts FROM events),
        | f AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000 THEN 1 ELSE 0 END new_session FROM e),
        | g AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        | CAST(min(ts) AS TIMESTAMP) AS session_start, CAST(max(ts) AS TIMESTAMP) AS session_end,
        | CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS session_value_cents
        |FROM g GROUP BY user_id, session_id""".stripMargin,

    "q26_distinct_profile" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q27_pivot" ->
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type='click' THEN CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) END) AS BIGINT) AS click,
        | CAST(sum(CASE WHEN event_type='error' THEN CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) END) AS BIGINT) AS error,
        | CAST(sum(CASE WHEN event_type='purchase' THEN CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) END) AS BIGINT) AS purchase,
        | CAST(sum(CASE WHEN event_type='signup' THEN CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) END) AS BIGINT) AS signup,
        | CAST(sum(CASE WHEN event_type='view' THEN CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) END) AS BIGINT) AS view
        |FROM events GROUP BY user_id""".stripMargin,

    "q35_minhash_signature" -> {
      // constants from the SAME source as the engine (plans.MinHashSig)
      import graft.plans.MinHashSig.{P, a, b}
      val sigExprs = (0 until 8)
        .map(i => s"list_min(list_transform(sh, h -> (${a(i)}*(h%$P)+${b(i)})%$P)) AS sig_$i")
        .mkString(",\n ")
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | sh AS (SELECT doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) sh
         |  FROM base)
         |SELECT doc_id,
         | $sigExprs
         |FROM sh WHERE len(sh) > 0""".stripMargin
    },

    "q39_simhash_portable" ->
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | th AS (SELECT doc_id, unnest(list_transform(ws, w -> CAST(('0x'||substr(md5(w),1,15)) AS BIGINT))) h FROM base),
         | votes AS (SELECT doc_id, j, sum(CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END) c
         |   FROM th CROSS JOIN (SELECT unnest(range(60)) j) js GROUP BY doc_id, j),
         | sk AS (SELECT doc_id, CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) simhash60
         |   FROM votes GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(sk.simhash60, 0) AS simhash60
         |FROM documents d LEFT JOIN sk ON d.doc_id = sk.doc_id""".stripMargin,

    // q38: dedup groups over the same portable 60-bit sketch as q39
    "q38_simhash" ->
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | th AS (SELECT doc_id, unnest(list_transform(ws, w -> CAST(('0x'||substr(md5(w),1,15)) AS BIGINT))) h FROM base),
         | votes AS (SELECT doc_id, j, sum(CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END) c
         |   FROM th CROSS JOIN (SELECT unnest(range(60)) j) js GROUP BY doc_id, j),
         | sk AS (SELECT doc_id, CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) simhash60
         |   FROM votes GROUP BY doc_id),
         | s AS (SELECT d.doc_id, COALESCE(sk.simhash60, 0) simhash60 FROM documents d LEFT JOIN sk ON d.doc_id = sk.doc_id)
         |SELECT simhash60, CAST(min(doc_id) AS BIGINT) AS keeper_id, count(*) AS copies
         |FROM s GROUP BY simhash60""".stripMargin,

    // q65: the pigeonhole banding has exact recall, so the output set equals
    // {pairs : hamming(sk_a, sk_b) <= 4} (the maxHamming budget in the two
    // literals below AND in Queries.q65) — verified here with a plain
    // all-pairs bit_count over q39's sketch (fine at test scale).
    "q65_simhash_neardup" ->
      s"""WITH $simhash60Ctes
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | CAST(bit_count(xor(a.sk60, b.sk60)) AS INTEGER) AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sk60, b.sk60)) <= 4""".stripMargin,

    // q88: same pair graph as q65, then connected components by recursive
    // transitive closure — group_id = min reachable doc id, exactly the
    // min-label-propagation fixpoint the Spark side converges to
    "q88_dup_groups" ->
      s"""WITH RECURSIVE $simhash60Ctes,
         | e AS (SELECT a.doc_id ia, b.doc_id ib
         |   FROM s a JOIN s b ON a.doc_id < b.doc_id
         |   WHERE bit_count(xor(a.sk60, b.sk60)) <= 4),
         | sym AS (SELECT ia a, ib b FROM e UNION SELECT ib, ia FROM e),
         | reach(id, r) AS (
         |   SELECT a, a FROM sym
         |   UNION
         |   SELECT sym.a, reach.r FROM sym JOIN reach ON reach.id = sym.b
         | )
         |SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY id""".stripMargin,

    // q37: full MinHash+LSH replication — md5-prefix shingle hashes (q35
    // machinery), the SAME MinHashSig constants, hash-free band keys
    // "b:sig[2b],sig[2b+1]", candidate distinct, exact-Jaccard verify >= 0.5.
    "q37_minhash_lsh" -> {
      import graft.plans.MinHashSig.{P, a, b}
      val sigList = (0 until 16)
        .map(i => s"list_min(list_transform(sh, h -> (${a(i)}*(h%$P)+${b(i)})%$P))")
        .mkString("[", ",\n   ", "]")
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | sh AS (SELECT doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) sh
         |  FROM base),
         | sig AS (SELECT doc_id, $sigList sig FROM sh WHERE len(sh) > 0),
         | banded AS (SELECT doc_id, unnest(list_transform(range(0, 8),
         |    b -> CAST(b AS VARCHAR)||':'||CAST(sig[CAST(2*b+1 AS INTEGER)] AS VARCHAR)||','||CAST(sig[CAST(2*b+2 AS INTEGER)] AS VARCHAR))) bucket
         |  FROM sig),
         | cand AS (SELECT DISTINCT x.doc_id id_a, y.doc_id id_b
         |  FROM banded x JOIN banded y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
         | ver AS (SELECT id_a, id_b, len(list_intersect(p.sh, q.sh)) inter, len(p.sh) la, len(q.sh) lb
         |  FROM cand JOIN sh p ON id_a = p.doc_id JOIN sh q ON id_b = q.doc_id),
         | j AS (SELECT id_a, id_b,
         |    CASE WHEN la+lb-inter = 0 THEN 0.0 ELSE CAST(inter AS DOUBLE)/(la+lb-inter) END jac FROM ver)
         |SELECT id_a, id_b, CAST(FLOOR(jac*10000) AS BIGINT) AS jaccard_e4
         |FROM j WHERE jac >= CAST(0.5 AS DOUBLE)""".stripMargin
    },

    // q162: the streaming LSH dedup sink's per-batch pair union must equal
    // the SAME full-recompute restriction q146 is gated on — batch
    // boundaries may not change the result (each pair is reported exactly
    // once, by the batch of its later doc), so the oracle is shared.
    "q162_stream_lsh_dedup" -> incrementalLshSql,

    "q146_incremental_lsh" -> incrementalLshSql,


    // q73: union-MinHash per source — sig_i(union) == min_i over ALL member
    // shingle hashes (mergeable-sketch identity), so the oracle is a plain
    // grouped MIN per permutation
    "q73_group_minhash" -> {
      import graft.plans.MinHashSig.{P, a, b}
      val mins = (0 until 16)
        .map(i => s"CAST(min((${a(i)}*(h%$P)+${b(i)})%$P) AS BIGINT) AS sig_$i")
        .mkString(",\n ")
      s"""WITH base AS (SELECT source, doc_id, $tokensExpr ws FROM documents),
         | sh AS (SELECT source, doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) sh
         |  FROM base),
         | u AS (SELECT source, unnest(sh) h FROM sh)
         |SELECT source,
         | $mins
         |FROM u GROUP BY source""".stripMargin
    },

    // q78: decontamination — shared-distinct-shingle counts via the same
    // md5-prefix hashes (hash-join semantics identical to string equality
    // at 60-bit collision odds)
    "q78_decontamination" ->
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | sh AS (SELECT doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) sh
         |  FROM base),
         | cp AS (SELECT doc_id, unnest(sh) s FROM sh WHERE doc_id % 10 <> 0),
         | bp AS (SELECT doc_id bench_id, unnest(sh) s FROM sh WHERE doc_id % 10 = 0)
         |SELECT cp.doc_id, bp.bench_id, count(*) AS n_shared
         |FROM cp JOIN bp USING (s)
         |GROUP BY cp.doc_id, bp.bench_id
         |HAVING count(*) >= 3""".stripMargin,

    // q81: chunking — 50-token windows, stride 40; short final window
    // q97: the full corpus recipe replayed as ONE CTE pipeline — exact
    // dedup (min doc_id per normalized fingerprint), SimHash-equality
    // near-dup (min doc_id per 60-bit sketch, empty docs sketch to 0),
    // quality gate (token count in [10,5000], floor-scaled punct ratio
    // <= 2000), q78's decontamination sweep (drop survivors sharing >= 3
    // distinct 3-gram shingle hashes with any raw %10==0 eval doc),
    // the q87 mixture-rate CASE over md5 hash buckets, then
    // 50/40 chunking with md5 chunk fingerprints
    "q97_corpus_pipeline" -> {
      val cases = (0 until 16)
        .map(i => s"WHEN 'src$i' THEN ${math.round((i % 4 + 1) * 0.2 * 1000000L)}")
        .mkString(" ")
      s"""WITH fp AS (SELECT doc_id, source, text,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) f FROM documents),
         | keep AS (SELECT f, min(doc_id) kid FROM fp GROUP BY f),
         | d1 AS (SELECT fp.doc_id, fp.source, fp.text FROM fp JOIN keep ON fp.f = keep.f AND fp.doc_id = keep.kid),
         | tw AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | th AS (SELECT doc_id, unnest(list_transform(ws, w -> CAST(('0x'||substr(md5(w),1,15)) AS BIGINT))) h FROM tw),
         | votes AS (SELECT doc_id, j, sum(CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END) c
         |   FROM th CROSS JOIN (SELECT unnest(range(60)) j) js GROUP BY doc_id, j),
         | sk AS (SELECT doc_id, CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) sh
         |   FROM votes GROUP BY doc_id),
         | allsh AS (SELECT d.doc_id, COALESCE(sk.sh, 0) sh
         |   FROM documents d LEFT JOIN sk ON d.doc_id = sk.doc_id),
         | keep2 AS (SELECT sh, min(doc_id) kid2 FROM allsh GROUP BY sh),
         | d1b AS (SELECT d1.doc_id, d1.source, d1.text, tw.ws
         |   FROM d1 JOIN allsh a ON d1.doc_id = a.doc_id
         |           JOIN keep2 ON a.sh = keep2.sh AND d1.doc_id = keep2.kid2
         |           JOIN tw ON d1.doc_id = tw.doc_id),
         | d2 AS (SELECT doc_id, source, ws FROM (
         |     SELECT doc_id, source, ws, len(ws) nt, length(text) nc,
         |            length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) ncp
         |     FROM d1b)
         |   WHERE nt BETWEEN 10 AND 5000
         |     AND CAST(FLOOR(CASE WHEN nc > 0 THEN (CAST(nc - ncp AS DOUBLE)/nc)*10000 ELSE 0 END) AS BIGINT) <= 2000),
         | shg AS (SELECT doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) g
         |  FROM tw),
         | bp AS (SELECT doc_id bench_id, unnest(g) s FROM shg WHERE doc_id % 10 = 0),
         | cp AS (SELECT d2.doc_id, unnest(shg.g) s FROM d2 JOIN shg ON d2.doc_id = shg.doc_id),
         | cont AS (SELECT DISTINCT doc_id FROM (
         |   SELECT cp.doc_id, bp.bench_id FROM cp JOIN bp USING (s)
         |   GROUP BY cp.doc_id, bp.bench_id HAVING count(*) >= 3)),
         | d2c AS (SELECT * FROM d2 WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
         | d3 AS (SELECT doc_id, ws FROM d2c
         |   WHERE (CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 1000000)
         |         < (CASE source $cases ELSE ${math.round(0.05 * 1000000L)} END)),
         | st AS (SELECT doc_id, ws, unnest(range(0, ((len(ws)-1)//40)+1)) ci FROM d3 WHERE len(ws) > 0),
         | ch AS (SELECT doc_id, ci, list_slice(ws, CAST(ci*40+1 AS INTEGER), CAST(least(ci*40+50, len(ws)) AS INTEGER)) ck FROM st)
         |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_id, CAST(ci*40 AS INTEGER) AS chunk_start,
         | CAST(len(ck) AS INTEGER) AS n_chunk_tokens,
         | md5(array_to_string(ck, ' ')) AS chunk_md5
         |FROM ch""".stripMargin
    },

    // q108: q97's recipe + the substring-dedup stage — after the d2c
    // decontamination CTE each survivor's token list is replaced by its
    // substring-deduped form (q105's span CTEs mined on the RAW corpus,
    // k=8), then the identical mixture-sample + chunk tail runs on the
    // cleaned tokens. Engine round-trips the kept tokens through a
    // space-joined text column; tokens contain no whitespace so the
    // re-tokenize is exact.
    "q108_recipe_substring" -> {
      val cases = (0 until 16)
        .map(i => s"WHEN 'src$i' THEN ${math.round((i % 4 + 1) * 0.2 * 1000000L)}")
        .mkString(" ")
      s"""WITH fp AS (SELECT doc_id, source, text,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) f FROM documents),
         | keep AS (SELECT f, min(doc_id) kid FROM fp GROUP BY f),
         | d1 AS (SELECT fp.doc_id, fp.source, fp.text FROM fp JOIN keep ON fp.f = keep.f AND fp.doc_id = keep.kid),
         | tw AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | th AS (SELECT doc_id, unnest(list_transform(ws, w -> CAST(('0x'||substr(md5(w),1,15)) AS BIGINT))) h FROM tw),
         | votes AS (SELECT doc_id, j, sum(CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END) c
         |   FROM th CROSS JOIN (SELECT unnest(range(60)) j) js GROUP BY doc_id, j),
         | sk AS (SELECT doc_id, CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) sh
         |   FROM votes GROUP BY doc_id),
         | allsh AS (SELECT d.doc_id, COALESCE(sk.sh, 0) sh
         |   FROM documents d LEFT JOIN sk ON d.doc_id = sk.doc_id),
         | keep2 AS (SELECT sh, min(doc_id) kid2 FROM allsh GROUP BY sh),
         | d1b AS (SELECT d1.doc_id, d1.source, d1.text, tw.ws
         |   FROM d1 JOIN allsh a ON d1.doc_id = a.doc_id
         |           JOIN keep2 ON a.sh = keep2.sh AND d1.doc_id = keep2.kid2
         |           JOIN tw ON d1.doc_id = tw.doc_id),
         | d2 AS (SELECT doc_id, source, ws FROM (
         |     SELECT doc_id, source, ws, len(ws) nt, length(text) nc,
         |            length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) ncp
         |     FROM d1b)
         |   WHERE nt BETWEEN 10 AND 5000
         |     AND CAST(FLOOR(CASE WHEN nc > 0 THEN (CAST(nc - ncp AS DOUBLE)/nc)*10000 ELSE 0 END) AS BIGINT) <= 2000),
         | shg AS (SELECT doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) g
         |  FROM tw),
         | bp AS (SELECT doc_id bench_id, unnest(g) s FROM shg WHERE doc_id % 10 = 0),
         | cp AS (SELECT d2.doc_id, unnest(shg.g) s FROM d2 JOIN shg ON d2.doc_id = shg.doc_id),
         | cont AS (SELECT DISTINCT doc_id FROM (
         |   SELECT cp.doc_id, bp.bench_id FROM cp JOIN bp USING (s)
         |   GROUP BY cp.doc_id, bp.bench_id HAVING count(*) >= 3)),
         | d2c AS (SELECT * FROM d2 WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
         | sgrams AS (SELECT doc_id, x.s AS start_pos, x.g AS gram FROM (
         |   SELECT doc_id, unnest(list_transform(range(greatest(len(ws) - 8 + 1, 0)), i -> struct_pack(s := i, g := array_to_string(list_slice(ws, i + 1, i + 8), ' ')))) x FROM tw)),
         | sdup AS (SELECT gram FROM sgrams GROUP BY gram HAVING count(*) > 1),
         | socc AS (SELECT doc_id, start_pos, start_pos + 8 AS end_pos FROM sgrams JOIN sdup USING (gram)),
         | sisl AS (SELECT doc_id, start_pos, end_pos, CASE WHEN start_pos > coalesce(max(end_pos) OVER (PARTITION BY doc_id ORDER BY start_pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END brk FROM socc),
         | sisl2 AS (SELECT doc_id, start_pos, end_pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY start_pos ROWS UNBOUNDED PRECEDING) island FROM sisl),
         | sspans AS (SELECT doc_id, island, min(start_pos) s, max(end_pos) e FROM sisl2 GROUP BY doc_id, island),
         | spos AS (SELECT doc_id, unnest(ws) tok, unnest(range(len(ws))) p FROM tw),
         | srem AS (SELECT DISTINCT spos.doc_id, spos.p FROM spos JOIN sspans ON spos.doc_id = sspans.doc_id AND spos.p >= sspans.s AND spos.p < sspans.e),
         | skept AS (SELECT spos.doc_id, spos.p, spos.tok FROM spos ANTI JOIN srem ON spos.doc_id = srem.doc_id AND spos.p = srem.p),
         | keptws AS (SELECT doc_id, list(tok ORDER BY p) nws FROM skept GROUP BY doc_id),
         | d2s AS (SELECT d2c.doc_id, d2c.source, coalesce(k.nws, CAST([] AS VARCHAR[])) ws
         |   FROM d2c LEFT JOIN keptws k ON d2c.doc_id = k.doc_id),
         | d3 AS (SELECT doc_id, ws FROM d2s
         |   WHERE (CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 1000000)
         |         < (CASE source $cases ELSE ${math.round(0.05 * 1000000L)} END)),
         | st AS (SELECT doc_id, ws, unnest(range(0, ((len(ws)-1)//40)+1)) ci FROM d3 WHERE len(ws) > 0),
         | ch AS (SELECT doc_id, ci, list_slice(ws, CAST(ci*40+1 AS INTEGER), CAST(least(ci*40+50, len(ws)) AS INTEGER)) ck FROM st)
         |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_id, CAST(ci*40 AS INTEGER) AS chunk_start,
         | CAST(len(ck) AS INTEGER) AS n_chunk_tokens,
         | md5(array_to_string(ck, ' ')) AS chunk_md5
         |FROM ch""".stripMargin
    },

    "q81_chunking" ->
      s"""WITH toks AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | st AS (SELECT doc_id, ws, unnest(range(0, ((len(ws)-1)//40)+1)) ci FROM toks WHERE len(ws) > 0),
         | ch AS (SELECT doc_id, ci, list_slice(ws, CAST(ci*40+1 AS INTEGER), CAST(least(ci*40+50, len(ws)) AS INTEGER)) ck FROM st)
         |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_id, CAST(ci*40 AS INTEGER) AS chunk_start,
         | CAST(len(ck) AS INTEGER) AS n_chunk_tokens,
         | md5(array_to_string(ck, ' ')) AS chunk_md5
         |FROM ch""".stripMargin,

    // q64: quantized-idf TF-IDF — integer ranking contract (see Queries.q64)
    "q64_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | total AS (SELECT count(*) n_docs FROM documents),
         | postings AS (SELECT doc_id, token, count(*) tf
         |   FROM (SELECT doc_id, unnest(ws) token FROM toks) GROUP BY doc_id, token),
         | dfreq AS (SELECT token, count(*) df FROM postings GROUP BY token),
         | scored AS (SELECT p.doc_id, p.token,
         |    CAST(p.tf AS BIGINT) * CAST(FLOOR(10000.0 * ln(CAST(n_docs AS DOUBLE)/df)) AS BIGINT) score
         |  FROM postings p JOIN dfreq d ON p.token = d.token CROSS JOIN total),
         | ranked AS (SELECT doc_id, token, score,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) rn FROM scored)
         |SELECT doc_id, token AS top_term, CAST(score AS BIGINT) AS tfidf_q
         |FROM ranked WHERE rn = 1""".stripMargin,

    // q44: stub decoder twin — md5-prefix-60 of the UTF-8 payload drives the
    // deterministic fake decode outputs
    "q44_media_decode" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id, 'text/plain' AS fmt,
        | CAST(h % 1920 + 1 AS INTEGER) AS width, CAST(h % 1080 + 1 AS INTEGER) AS height,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, h AS feature_hash
        |FROM (SELECT doc_id, text, CAST(('0x'||substr(md5(text),1,15)) AS BIGINT) h FROM documents)""".stripMargin,

    // q91: the REAL javax.imageio decode/resize path — every column
    // predicted from the PNG-generating arithmetic (lossless round-trip:
    // decode returns the generated dims and gray exactly; resize dims are
    // the same IEEE double expression `w * (16.0/greatest(w,h))` truncated;
    // every 17th payload is truncated so ok=false, -1 dims, luma 0)
    // q93: URL screen — the same synthetic-url CASE, the same regexps
    // (both engines return '' on no-match, NULL on NULL input), the same
    // blocklist verdict
    "q93_url_screen" ->
      raw"""WITH u AS (SELECT doc_id,
           |  CASE
           |    WHEN doc_id % 8 = 0 THEN 'https://www.' || source || '.example.com/page/' || doc_id
           |    WHEN doc_id % 8 = 1 THEN 'http://' || source || '.co.uk:8080/a?b=1'
           |    WHEN doc_id % 8 = 2 THEN 'https://cdn.' || source || '.net/x#frag'
           |    WHEN doc_id % 8 = 3 THEN 'ftp://files.' || source || '.org'
           |    WHEN doc_id % 8 = 4 THEN 'https://' || source || '.io'
           |    WHEN doc_id % 8 = 5 THEN 'not a url at all'
           |    WHEN doc_id % 8 = 6 THEN 'https://u:pw@blocked.' || source || '.example.com:443/private'
           |    ELSE 'https://blocked.example.com/' || doc_id
           |  END url FROM documents),
           | hh AS (SELECT doc_id, url,
           |   NULLIF(regexp_extract(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/?#@]*)(?:[/?#]|$$)', 1)), '^([^:]+)', 1), '') host
           |  FROM u),
           | dd AS (SELECT doc_id, url, host,
           |   COALESCE(NULLIF(regexp_extract(host, '([^.]+\.(?:co|com|org|net|ac|gov|edu)\.[a-z][a-z])$$', 1), ''),
           |            NULLIF(regexp_extract(host, '([^.]+\.[^.]+)$$', 1), '')) AS "domain",
           |   NULLIF(regexp_extract(host, '\.([^.]+)$$', 1), '') tld,
           |   regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?', 1) p0
           |  FROM hh)
           |SELECT doc_id, host, "domain", tld,
           |  CASE WHEN host IS NULL THEN NULL WHEN p0 = '' THEN '/' ELSE p0 END AS path,
           |  ("domain" IS NOT NULL AND "domain" <> 'example.com') AS kept
           |FROM dd""".stripMargin,

    // q92: hot-span mining — postings of DISTINCT 5-token spans per doc,
    // then GROUP BY the span's 60-bit md5-prefix hash (the engine's
    // fixed-width shuffle key) with min(span) as the representative;
    // count(*) = distinct-doc df because the explode already deduplicated
    // within each document
    "q92_hot_spans" ->
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | sp AS (SELECT doc_id, unnest(list_distinct(
         |   CASE WHEN len(ws) < 5 THEN CAST([] AS VARCHAR[])
         |     ELSE list_transform(range(1, len(ws)-3), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]) END)) span
         |  FROM base)
         |SELECT min(span) AS span, count(*) AS df, min(doc_id) AS first_doc_id
         |FROM sp GROUP BY CAST(('0x'||substr(md5(span),1,15)) AS BIGINT)
         |HAVING count(*) >= 3""".stripMargin,

    "q91_image_decode" ->
      """WITH s AS (SELECT CAST(p_partkey AS BIGINT) id,
        |   CAST(p_partkey % 40 + 8 AS INTEGER) w, CAST(p_partkey % 30 + 8 AS INTEGER) h,
        |   CAST(p_partkey % 256 AS INTEGER) g, (p_partkey % 17 = 0) corrupt
        | FROM part WHERE p_partkey <= 200)
        |SELECT id AS media_id,
        | CASE WHEN corrupt THEN -1 ELSE w END AS width,
        | CASE WHEN corrupt THEN -1 ELSE h END AS height,
        | CASE WHEN corrupt THEN 0 ELSE g END AS gray_rt,
        | NOT corrupt AS ok,
        | CAST(CASE WHEN corrupt THEN -1 WHEN greatest(w, h) <= 16 THEN w
        |   ELSE greatest(1, CAST(FLOOR(w * (CAST(16 AS DOUBLE)/greatest(w, h))) AS INTEGER)) END AS INTEGER) AS r_width,
        | CAST(CASE WHEN corrupt THEN -1 WHEN greatest(w, h) <= 16 THEN h
        |   ELSE greatest(1, CAST(FLOOR(h * (CAST(16 AS DOUBLE)/greatest(w, h))) AS INTEGER)) END AS INTEGER) AS r_height
        |FROM s""".stripMargin,

    // q94: real WAV decode — the oracle predicts every column from the
    // fixture-generating arithmetic (square wave at Nyquist: peak = amp,
    // RMS = exactly amp, frames = n, integer-truncated duration); the
    // engine must actually roundtrip the bytes through javax.sound.sampled
    "q94_audio_decode" ->
      """WITH s AS (SELECT CAST(p_partkey AS BIGINT) id,
        |   CAST(8000 + (p_partkey % 3) * 4000 AS INTEGER) rate,
        |   CAST(400 + (p_partkey % 300) AS BIGINT) n,
        |   CAST((p_partkey * 37) % 30000 AS INTEGER) amp,
        |   (p_partkey % 17 = 0) corrupt
        | FROM part WHERE p_partkey <= 200)
        |SELECT id AS media_id,
        | CASE WHEN corrupt THEN -1 ELSE rate END AS sample_rate,
        | CASE WHEN corrupt THEN -1 ELSE 1 END AS channels,
        | CASE WHEN corrupt THEN -1 ELSE 16 END AS bits,
        | CASE WHEN corrupt THEN CAST(-1 AS BIGINT) ELSE n END AS n_frames,
        | CASE WHEN corrupt THEN CAST(-1 AS BIGINT) ELSE CAST(n * 1000 // rate AS BIGINT) END AS duration_ms,
        | CASE WHEN corrupt THEN -1 ELSE amp END AS peak,
        | CASE WHEN corrupt THEN CAST(-1 AS BIGINT) ELSE CAST(amp AS BIGINT) * 100 END AS rms_e2,
        | NOT corrupt AS ok
        |FROM s""".stripMargin,

    // q95: real MP4 box-tree walk — the oracle predicts brand, duration
    // (integer-truncated ms at the fixed 600 timescale), 16.16 dims, track
    // count/kinds from the fixture-generating arithmetic; the engine must
    // actually parse the container bytes
    "q95_video_meta" ->
      """WITH s AS (SELECT CAST(p_partkey AS BIGINT) id,
        |   CAST(p_partkey % 640 + 16 AS INTEGER) w,
        |   CAST(p_partkey % 360 + 16 AS INTEGER) h,
        |   CAST((p_partkey * 97) % 100000 + 600 AS BIGINT) dur,
        |   (p_partkey % 3 = 0) aud,
        |   (p_partkey % 17 = 0) corrupt
        | FROM part WHERE p_partkey <= 200)
        |SELECT id AS media_id,
        | CASE WHEN corrupt THEN '' ELSE 'isom' END AS brand,
        | CASE WHEN corrupt THEN CAST(-1 AS BIGINT) ELSE CAST(dur * 1000 // 600 AS BIGINT) END AS duration_ms,
        | CASE WHEN corrupt THEN -1 ELSE w END AS width,
        | CASE WHEN corrupt THEN -1 ELSE h END AS height,
        | CASE WHEN corrupt THEN -1 WHEN aud THEN 2 ELSE 1 END AS n_tracks,
        | NOT corrupt AS has_video,
        | (NOT corrupt AND aud) AS has_audio,
        | NOT corrupt AS ok
        |FROM s""".stripMargin,

    "q50_multi_join" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,

    "q82_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name""".stripMargin,

    "q83_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM supplier
        | JOIN lineitem ON s_suppkey = l_suppkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""".stripMargin,

    "q84_disjunctive_pred" ->
      """SELECT
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 45 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "q51_conditional_agg" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus""".stripMargin,

    "q52_like_filter" ->
      """SELECT p_brand, count(*) AS n_parts, CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part WHERE p_type LIKE '%PROMO%' AND p_name NOT LIKE '%red%'
        |GROUP BY p_brand""".stripMargin,

    "q53_date_arith" ->
      """SELECT o_orderkey, o_orderdate, o_orderdate + INTERVAL 90 DAY AS deadline
        |FROM orders WHERE o_orderdate + INTERVAL 90 DAY > TIMESTAMP '2001-06-01 00:00:00'""".stripMargin,

    "q54_correlated_avg" ->
      """WITH pp AS (SELECT l_partkey pk,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) / count(*) AS DOUBLE) avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, count(*) AS n_small, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN pp ON l_partkey = pk
        |WHERE l_quantity < avg_qty * CAST(0.2 AS DOUBLE)
        |GROUP BY l_partkey""".stripMargin,

    "q55_union_distinct" ->
      """SELECT DISTINCT k FROM (
        | SELECT l_partkey k FROM lineitem WHERE l_quantity >= 49
        | UNION ALL
        | SELECT p_partkey k FROM part WHERE p_size = 50)""".stripMargin,

    "q56_exists_combo" ->
      """SELECT l1.l_suppkey, count(*) AS numwait
        |FROM lineitem l1
        |WHERE l1.l_shipdate > TIMESTAMP '2001-06-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |    AND l3.l_shipdate > TIMESTAMP '2001-06-01 00:00:00')
        |GROUP BY l1.l_suppkey""".stripMargin,

    "q57_string_funcs" ->
      """SELECT c_custkey, upper(substr(c_name, 1, 8)) AS name_prefix,
        | c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS seg_key,
        | CAST(length(regexp_replace(c_name, '[0-9]', '', 'g')) AS INTEGER) AS alpha_len
        |FROM customer""".stripMargin,

    "q58_min_by_group" ->
      """SELECT s_nationkey, s_suppkey, s_name, s_acctbal FROM (
        | SELECT *, min(s_acctbal) OVER (PARTITION BY s_nationkey) min_bal FROM supplier)
        |WHERE s_acctbal = min_bal""".stripMargin,

    "q30_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
        | CAST(min(doc_id) AS BIGINT) AS keeper_id, count(*) AS copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q31_text_tokens" ->
      s"""SELECT doc_id,
         | CAST(CASE WHEN len(trim(text))=0 THEN 0 ELSE len(string_split_regex(trim(text),'\\s+')) END AS INTEGER) AS n_tokens,
         | CAST(length(text) AS INTEGER) AS n_chars_m
         |FROM documents""".stripMargin,

    "q32_text_quality" ->
      s"""SELECT doc_id,
         | CAST(FLOOR(CASE WHEN nt>0 THEN (CAST(sl AS DOUBLE)/nt)*10000 ELSE 0 END) AS BIGINT) AS avg_token_len_e4,
         | CAST(FLOOR(CASE WHEN nc>0 THEN (CAST(nc-ncp AS DOUBLE)/nc)*10000 ELSE 0 END) AS BIGINT) AS punct_ratio_e4,
         | CAST(FLOOR(CASE WHEN nt>0 THEN (CAST(sw AS DOUBLE)/nt)*10000 ELSE 0 END) AS BIGINT) AS stopword_ratio_e4
         |FROM (SELECT doc_id, len(ws) nt, coalesce(list_sum(list_transform(ws, w->len(w))),0) sl, length(text) nc,
         |    length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) ncp,
         |    len(list_filter(ws, w -> list_contains(${sqlList(TextAnalysis.stopwordLists("en"))}, lower(w)))) sw
         |  FROM (SELECT doc_id, text, $tokensExpr ws FROM documents))""".stripMargin,

    "q33_lang_id" -> {
      val langs = TextAnalysis.stopwordLists.keys.toSeq.sorted // de,en,es,fr,zh
      val scoreCols = langs
        .map(l => s"len(list_filter(ws, w -> list_contains(${sqlList(TextAnalysis.stopwordLists(l))}, w))) s_$l")
        .mkString(",\n    ")
      // ties break to the alphabetically-first language, zero evidence -> und
      val caseExpr = {
        val branches = langs.zipWithIndex.map { case (l, i) =>
          val rest = langs.drop(i + 1)
          if (rest.isEmpty) s"ELSE '$l'"
          else s"WHEN ${rest.map(r => s"s_$l >= s_$r").mkString(" AND ")} THEN '$l'"
        }
        s"CASE WHEN ${langs.map(l => s"s_$l=0").mkString(" AND ")} THEN 'und' ${branches.mkString(" ")} END"
      }
      s"""SELECT doc_id, lang, lang_pred, (lang = lang_pred) AS correct FROM (
         | SELECT doc_id, lang, $caseExpr AS lang_pred FROM (
         |  SELECT doc_id, lang,
         |    $scoreCols
         |  FROM (SELECT doc_id, lang, list_transform($tokensExpr, w -> lower(w)) ws FROM documents)))""".stripMargin
    },

    "q34_rolling_fingerprint" ->
      s"""SELECT doc_id,
         | list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(ws, w -> CAST(('0x'||substr(md5(w),1,8)) AS BIGINT))),
         |   (acc, x) -> (acc*31 + x) % 1099511627776) AS fingerprint64
         |FROM (SELECT doc_id, $tokensExpr ws FROM documents)""".stripMargin,

    "q36_jaccard_pairs" ->
      s"""WITH base AS (SELECT source, doc_id, $tokensExpr ws FROM documents),
         | sh AS (SELECT source, doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) sh
         |  FROM base),
         | pairs AS (SELECT a.source, a.doc_id id_a, b.doc_id id_b,
         |    len(list_intersect(a.sh, b.sh)) inter, len(a.sh) la, len(b.sh) lb
         |  FROM sh a JOIN sh b ON a.source=b.source AND a.doc_id < b.doc_id),
         | j AS (SELECT source, id_a, id_b,
         |    CASE WHEN la+lb-inter=0 THEN 0.0 ELSE CAST(inter AS DOUBLE)/(la+lb-inter) END jac FROM pairs)
         |SELECT source, id_a, id_b, CAST(FLOOR(jac*10000) AS BIGINT) AS jaccard_e4
         |FROM j WHERE jac >= CAST(0.3 AS DOUBLE)""".stripMargin,

    "q48_profile" ->
      """SELECT o_orderstatus, n, n_null, min_price, max_price, sum_price,
        | CAST(FLOOR(((sumsq_price - sum_price*sum_price/n)/(n-1))*10000) AS BIGINT) AS variance_e4
        |FROM (SELECT o_orderstatus, count(*) n, count(*)-count(o_totalprice) n_null,
        |    min(o_totalprice) min_price, max(o_totalprice) max_price,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) sum_price,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) sumsq_price
        |  FROM orders GROUP BY o_orderstatus)""".stripMargin,

    // independent algorithm on the oracle side: DuckDB's native ASOF JOIN vs
    // the engine's carry-forward window formulation. ASOF's choice among
    // equal-ts right rows is unspecified — safe here because (user_id, ts)
    // is verified duplicate-free in the testdata; revisit if data changes.
    "q49_asof_join" ->
      """WITH clicks AS (SELECT user_id, ts, event_id click_id FROM events WHERE event_type='click'),
        | purchases AS (SELECT user_id, ts, event_id purchase_id FROM events WHERE event_type='purchase')
        |SELECT p.user_id, p.purchase_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts, c.click_id AS last_click_id
        |FROM purchases p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    "q60_repetition" ->
      s"""SELECT doc_id, CAST(len(sh) AS INTEGER) AS n_bigrams,
         | CAST(FLOOR(CASE WHEN len(sh)=0 THEN 0.0
         |   ELSE 1.0 - CAST(len(list_distinct(sh)) AS DOUBLE)/len(sh) END * 10000) AS BIGINT) AS repetition_e4
         |FROM (SELECT doc_id,
         |   CASE WHEN len(ws)<2 THEN CAST([] AS VARCHAR[])
         |     ELSE list_transform(range(1, len(ws)), i -> ws[i]||' '||ws[i+1]) END sh
         | FROM (SELECT doc_id, $tokensExpr ws FROM documents))""".stripMargin,

    "q61_vocab" ->
      s"""WITH toks AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | df AS (SELECT token, count(*) doc_freq FROM (SELECT doc_id, unnest(list_distinct(ws)) token FROM toks) GROUP BY token),
         | tf AS (SELECT token, count(*) term_freq FROM (SELECT unnest(ws) token FROM toks) GROUP BY token)
         |SELECT df.token, df.doc_freq, tf.term_freq FROM df JOIN tf ON df.token = tf.token""".stripMargin,

    // replays TextAnalysis.gopherQualityGates: same tokenization, the mode
    // bigram tie-broken (count DESC, bigram ASC — UTF-8 binary order in both
    // engines), every ratio FLOOR(x*1e4) with the engine's exact operand
    // order (multiply by 10000.0 BEFORE the divide) so the doubles agree
    // bit-for-bit.
    "q89_gopher_gates" ->
      s"""WITH base AS (SELECT doc_id, text, $tokensExpr ws FROM documents),
         | st AS (SELECT doc_id, text, len(ws) nw,
         |     coalesce(list_sum(list_transform(ws, w -> len(w))), 0) sl,
         |     len(ws) - len(list_distinct(ws)) nd,
         |     CASE WHEN len(ws)<2 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)), i -> ws[i]||' '||ws[i+1]) END bgs
         |   FROM base),
         | bc AS (SELECT doc_id, bg, count(*) c FROM (SELECT doc_id, unnest(bgs) bg FROM st) GROUP BY doc_id, bg),
         | top AS (SELECT doc_id, bg, c FROM (
         |     SELECT doc_id, bg, c, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bg ASC) rn FROM bc) WHERE rn = 1),
         | m AS (SELECT st.doc_id, CAST(st.nw AS INTEGER) n_words,
         |     CAST(CASE WHEN st.nw=0 THEN 0 ELSE FLOOR(CAST(st.sl AS DOUBLE)*10000.0/st.nw) END AS BIGINT) mean_word_len_e4,
         |     CAST(CASE WHEN length(st.text)=0 THEN 0
         |       ELSE coalesce(FLOOR((top.c*length(top.bg))*10000.0/length(st.text)), 0) END AS BIGINT) top_bigram_frac_e4,
         |     CAST(CASE WHEN st.nw=0 THEN 0 ELSE FLOOR(st.nd*10000.0/st.nw) END AS BIGINT) dup_unigram_frac_e4
         |   FROM st LEFT JOIN top ON st.doc_id = top.doc_id)
         |SELECT doc_id, n_words, mean_word_len_e4, top_bigram_frac_e4, dup_unigram_frac_e4,
         | (n_words >= 50 AND n_words <= 100000) AS pass_word_count,
         | (mean_word_len_e4 >= 30000 AND mean_word_len_e4 <= 100000) AS pass_mean_word_len,
         | (top_bigram_frac_e4 <= 2000 AND dup_unigram_frac_e4 <= 3000) AS pass_repetition,
         | (n_words >= 50 AND n_words <= 100000 AND mean_word_len_e4 >= 30000 AND mean_word_len_e4 <= 100000
         |   AND top_bigram_frac_e4 <= 2000 AND dup_unigram_frac_e4 <= 3000) AS pass_gopher
         |FROM m""".stripMargin,

    "q87_mixture_sample" -> {
      // same rate table as Queries.q87, thresholds computed by the same
      // math.round((i%4+1)*0.2 * denom) so literal boundaries match exactly
      val cases = (0 until 16)
        .map(i => s"WHEN 'src$i' THEN ${math.round((i % 4 + 1) * 0.2 * 1000000L)}")
        .mkString(" ")
      s"""SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
         |FROM (SELECT source, n_chars,
         |        CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 1000000 AS b
         |      FROM documents)
         |WHERE b < (CASE source $cases ELSE ${math.round(0.05 * 1000000L)} END)
         |GROUP BY source""".stripMargin
    },

    "q62_stratified_sample" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(CASE WHEN b < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        | CAST(sum(CASE WHEN b < 80 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        | CAST(sum(CASE WHEN b >= 80 AND b < 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
        | CAST(sum(CASE WHEN b >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        |FROM (SELECT lang, CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 AS b FROM documents)
        |GROUP BY lang""".stripMargin,

    // q63: the sketch values are engine-specific, so the oracle recomputes
    // the EXACT side and the expected bound-check TRUEs (the Spark side
    // computes the booleans from its own sketches; they are deterministically
    // TRUE because HLL merge is a register-wise max and the quantile check
    // runs in rank space with 20x the GK guarantee's margin).
    "q63_approx_stats" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        | count(*) AS n_rows,
        | TRUE AS parts_ok, TRUE AS orders_ok, TRUE AS median_ok, TRUE AS p99_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q68_quality_filter" ->
      s"""WITH feats AS (SELECT doc_id, lang,
         |   CASE WHEN nt>0 THEN CAST(sw AS DOUBLE)/nt ELSE 0.0 END stopword_ratio
         | FROM (SELECT doc_id, lang, len(ws) nt,
         |     len(list_filter(ws, w -> list_contains(${sqlList(TextAnalysis.stopwordLists("en"))}, lower(w)))) sw
         |   FROM (SELECT doc_id, lang, $tokensExpr ws FROM documents))),
         | ranked AS (SELECT *, percent_rank() OVER (ORDER BY CAST(FLOOR(stopword_ratio*10000) AS BIGINT) DESC, doc_id ASC) pr FROM feats)
         |SELECT lang, count(*) AS n_kept,
         | CAST(FLOOR(min(stopword_ratio)*10000) AS BIGINT) AS worst_kept_e4
         |FROM ranked WHERE pr < CAST(0.9 AS DOUBLE) GROUP BY lang""".stripMargin,

    "q67_unicode_canon" ->
      """SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5,
        | md5(strip_accents(lower(text))) AS folded_md5
        |FROM documents""".stripMargin,

    "q66_pii_redact" -> {
      // same pattern constants as TextAnalysis (conservative, RE2-safe)
      val em = TextAnalysis.EmailRe
      val ph = TextAnalysis.PhoneRe
      val ssn = TextAnalysis.SsnRe
      s"""SELECT doc_id,
         | md5(regexp_replace(regexp_replace(regexp_replace(text, '$ssn', '[SSN]', 'g'), '$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g')) AS redacted_md5,
         | CAST(len(regexp_extract_all(text, '$em')) AS INTEGER) AS n_emails,
         | CAST(len(regexp_extract_all(text, '$ph')) AS INTEGER) AS n_phones,
         | CAST(len(regexp_extract_all(text, '$ssn')) AS INTEGER) AS n_ssns
         |FROM documents""".stripMargin
    },

    "q46_lsh_buckets" -> {
      val masks = (0 until 8)
        .map(b => s"($b, '${graft.operators.Similarity.hyperplaneMask(0, b, 64)}')")
        .mkString(", ")
      s"""WITH m(bit, mask) AS (VALUES $masks),
         | e AS (SELECT vec_id, unnest(embedding) x, unnest(range(64)) i FROM embeddings),
         | d AS (SELECT vec_id, bit,
         |    sum(CAST(x AS DOUBLE) * (CASE substr(mask, CAST(i+1 AS INTEGER), 1) WHEN '1' THEN 1.0 ELSE -1.0 END) ORDER BY i) dt
         |  FROM e CROSS JOIN m GROUP BY vec_id, bit)
         |SELECT vec_id, CAST(sum(CASE WHEN dt > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS bucket
         |FROM d GROUP BY vec_id""".stripMargin
    },

    // q41: multi-table LSH ANN — all hyperplane families (geometry from
    // Queries.Q41Lsh, the single home: 16 tables x 5 bits since round 16)
    // embedded as sign masks; candidate = bucket match vs the vec_id=0 query
    // in ANY table; then the q40 cosine machinery over candidates only.
    "q41_ann_lsh" -> {
      import Queries.Q41Lsh
      val masks = (for { t <- 0 until Q41Lsh.Tables; b <- 0 until Q41Lsh.NBits } yield
        s"($t, $b, '${graft.operators.Similarity.hyperplaneMask(t, b, Q41Lsh.Dim)}')").mkString(", ")
      s"""WITH m(tbl, bit, mask) AS (VALUES $masks),
         | e AS (SELECT vec_id, unnest(embedding) x, unnest(range(64)) i FROM embeddings),
         | d AS (SELECT vec_id, tbl, bit,
         |    sum(CAST(x AS DOUBLE) * (CASE substr(mask, CAST(i+1 AS INTEGER), 1) WHEN '1' THEN 1.0 ELSE -1.0 END) ORDER BY i) dt
         |  FROM e CROSS JOIN m GROUP BY vec_id, tbl, bit),
         | bk AS (SELECT vec_id, tbl, CAST(sum(CASE WHEN dt > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) bucket
         |  FROM d GROUP BY vec_id, tbl),
         | qb AS (SELECT tbl, bucket FROM bk WHERE vec_id = 0),
         | cand AS (SELECT DISTINCT bk.vec_id FROM bk JOIN qb ON bk.tbl = qb.tbl AND bk.bucket = qb.bucket WHERE bk.vec_id <> 0),
         | q AS (SELECT embedding qe FROM embeddings WHERE vec_id = 0),
         | pairs AS (SELECT e2.vec_id, unnest(e2.embedding) x, unnest(q.qe) y, unnest(range(64)) i
         |   FROM embeddings e2, q WHERE e2.vec_id IN (SELECT vec_id FROM cand)),
         | dots AS (SELECT vec_id,
         |    sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) d,
         |    sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) ORDER BY i) nx,
         |    sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) ny
         |  FROM pairs GROUP BY vec_id),
         | cos AS (SELECT vec_id, CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END c FROM dots)
         |SELECT vec_id, CAST(FLOOR(c*1000000) AS BIGINT) AS cosine_e6
         |FROM cos ORDER BY c DESC, vec_id ASC LIMIT 20""".stripMargin
    },

    // q47: LSH-blocked embedding near-dup — table-0 3-bit bucket masks, pair
    // join within buckets, bit-exact cosine, floor-e6, threshold 0.35
    "q47_embedding_neardup" -> {
      val masks = (0 until 3)
        .map(b => s"($b, '${graft.operators.Similarity.hyperplaneMask(0, b, 64)}')")
        .mkString(", ")
      s"""WITH m(bit, mask) AS (VALUES $masks),
         | e AS (SELECT vec_id, unnest(embedding) x, unnest(range(64)) i FROM embeddings),
         | d AS (SELECT vec_id, bit,
         |    sum(CAST(x AS DOUBLE) * (CASE substr(mask, CAST(i+1 AS INTEGER), 1) WHEN '1' THEN 1.0 ELSE -1.0 END) ORDER BY i) dt
         |  FROM e CROSS JOIN m GROUP BY vec_id, bit),
         | bk AS (SELECT vec_id, CAST(sum(CASE WHEN dt > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) bucket
         |  FROM d GROUP BY vec_id),
         | cand AS (SELECT a.vec_id id_a, b.vec_id id_b
         |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         | pairs AS (SELECT id_a, id_b, unnest(ea.embedding) x, unnest(eb.embedding) y, unnest(range(64)) i
         |   FROM cand JOIN embeddings ea ON id_a = ea.vec_id JOIN embeddings eb ON id_b = eb.vec_id),
         | dots AS (SELECT id_a, id_b,
         |    sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) d,
         |    sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) ORDER BY i) nx,
         |    sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) ny
         |  FROM pairs GROUP BY id_a, id_b),
         | cos AS (SELECT id_a, id_b, CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END c FROM dots)
         |SELECT id_a, id_b, CAST(FLOOR(c*1000000) AS BIGINT) AS cosine_e6
         |FROM cos WHERE c >= CAST(0.35 AS DOUBLE)""".stripMargin
    },

    // q72: IVF ANN — centroids are rows vec_id<8; assignment/probe/ranking
    // recomputed with ordered folds; ties break on centroid id
    "q72_ann_ivf" ->
      """WITH c AS (SELECT vec_id cid, embedding ce FROM embeddings WHERE vec_id < 8),
        | cn AS (SELECT cid, sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) c2
        |   FROM (SELECT cid, unnest(ce) y, unnest(range(64)) i FROM c) GROUP BY cid),
        | ev AS (SELECT vec_id, unnest(embedding) x, unnest(range(64)) i FROM embeddings),
        | cv AS (SELECT cid, unnest(ce) y, unnest(range(64)) i FROM c),
        | vd AS (SELECT vec_id, cid, sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) d
        |   FROM ev JOIN cv USING (i) GROUP BY vec_id, cid),
        | scorev AS (SELECT vec_id, vd.cid, -2*d + c2 score FROM vd JOIN cn ON vd.cid = cn.cid),
        | assign AS (SELECT vec_id, cid FROM (
        |   SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) rn FROM scorev) WHERE rn = 1),
        | qprobe AS (SELECT cid FROM (
        |   SELECT cid, row_number() OVER (ORDER BY score, cid) rn FROM scorev WHERE vec_id = 0) WHERE rn <= 3),
        | cand AS (SELECT vec_id FROM assign WHERE cid IN (SELECT cid FROM qprobe) AND vec_id <> 0),
        | q AS (SELECT embedding qe FROM embeddings WHERE vec_id = 0),
        | pairs AS (SELECT e2.vec_id, unnest(e2.embedding) x, unnest(q.qe) y, unnest(range(64)) i
        |   FROM embeddings e2, q WHERE e2.vec_id IN (SELECT vec_id FROM cand)),
        | dots AS (SELECT vec_id,
        |    sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) d,
        |    sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) ORDER BY i) nx,
        |    sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) ny
        |  FROM pairs GROUP BY vec_id),
        | cos AS (SELECT vec_id, CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END c FROM dots)
        |SELECT vec_id, CAST(FLOOR(c*1000000) AS BIGINT) AS cosine_e6
        |FROM cos ORDER BY c DESC, vec_id ASC LIMIT 20""".stripMargin,

    "q85_ann_ivf_trained" -> ivfTrainedSql(3, None, ivfRankTail),

    // q90: the sampled-training path — identical replay, but the k-means
    // iterations see only the 1-in-4 md5 hash sample (matching the Spark
    // side's trainIvfCentroids(sample=...)); assignment/probe/rank cover all
    "q90_ann_ivf_sampled" -> ivfTrainedSql(3, Some(vecIdSample4), ivfRankTail),

    // q86: SemDeDup replay — sampled 2-iteration training CTEs, final
    // assignment, then within-cell pair cosines with the same ordered folds
    // and the lower-id drop rule
    "q86_semantic_dedup" -> ivfTrainedSql(2, Some(vecIdSample4), ivfSemDedupTail),

    // q99: REAL BPE — the oracle re-derives every merge decision with a
    // recursive CTE over DISTINCT pre-tokens: rank = list_position into
    // the same ordered merge list (0 = not a merge), step = merge the
    // LEFTMOST occurrence (position-of-min) of the LOWEST-rank adjacent
    // pair, terminate when no adjacent pair is in the table. Codepoint
    // symbols (DuckDB w[i:i]) match the engine's codePointAt split.
    "q99_bpe_tokens" -> bpeSql,

    // q100: corpus-trained add-one bigram LM — per-bigram NLL quantized
    // BEFORE any cross-row sum (FLOOR(-1e5·ln p), p = one IEEE division of
    // exact integer operands), BIGINT sums, BIGINT floor-division mean:
    // no order-dependent double accumulation in either engine
    "q100_lm_perplexity" ->
      s"""WITH toks AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | bg AS (SELECT doc_id, ws[i] w1, ws[i+1] w2
         |   FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) i FROM toks WHERE len(ws) >= 2)),
         | perdoc AS (SELECT doc_id, w1, w2, count(*) k FROM bg GROUP BY doc_id, w1, w2),
         | big AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) c12 FROM perdoc GROUP BY w1, w2),
         | ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) c1 FROM big GROUP BY w1),
         | voc AS (SELECT count(DISTINCT t) v FROM (SELECT unnest(ws) t FROM toks)),
         | sc AS (SELECT p.doc_id, p.k,
         |    CAST(FLOOR(-100000.0 * ln(CAST(c12+1 AS DOUBLE)/CAST(c1+v AS DOUBLE))) AS BIGINT) lp_q
         |   FROM perdoc p JOIN big USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN voc),
         | agg AS (SELECT doc_id, CAST(sum(k) AS BIGINT) n_bigrams,
         |    CAST(sum(k*lp_q) AS BIGINT) sum_nll_e5 FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, sum_nll_e5, sum_nll_e5 // n_bigrams AS avg_nll_e5,
         | (sum_nll_e5 // n_bigrams) < 800000 AS kept
         |FROM agg""".stripMargin,

    // q101: greedy next-fit packing — the recursive CTE replays the
    // engine's per-shard sequential scan exactly: 8 independent chains
    // (one per shard) advance one row per iteration, carrying (bin, fill);
    // overflow closes the open bin only when it is non-empty, so an
    // over-budget doc keeps a bin of its own
    "q101_seq_packing" ->
      s"""WITH RECURSIVE toks AS (SELECT doc_id, CAST(len($tokensExpr) AS INTEGER) n,
         |    CAST(doc_id % 8 AS INTEGER) shard FROM documents),
         | ord AS (SELECT doc_id, n, shard, row_number() OVER (PARTITION BY shard ORDER BY doc_id) rn FROM toks),
         | pack AS (
         |   SELECT doc_id, n, shard, rn, CAST(0 AS BIGINT) bin_id, CAST(n AS BIGINT) fill
         |   FROM ord WHERE rn = 1
         |   UNION ALL
         |   SELECT o.doc_id, o.n, o.shard, o.rn,
         |     CASE WHEN p.fill + o.n > 512 AND p.fill > 0 THEN p.bin_id + 1 ELSE p.bin_id END,
         |     CASE WHEN p.fill + o.n > 512 AND p.fill > 0 THEN CAST(o.n AS BIGINT) ELSE p.fill + o.n END
         |   FROM pack p JOIN ord o ON o.shard = p.shard AND o.rn = p.rn + 1)
         |SELECT doc_id, shard, bin_id, n AS n_tokens FROM pack""".stripMargin,

    // q160: shard manifest — q101's recursive packing replay aggregated
    // per shard with the same xor fingerprint (md5-prefix of doc:bin)
    "q160_shard_manifest" ->
      s"""WITH RECURSIVE toks AS (SELECT doc_id, CAST(len($tokensExpr) AS INTEGER) n,
         |    CAST(doc_id % 8 AS INTEGER) shard FROM documents),
         | ord AS (SELECT doc_id, n, shard, row_number() OVER (PARTITION BY shard ORDER BY doc_id) rn FROM toks),
         | pack AS (
         |   SELECT doc_id, n, shard, rn, CAST(0 AS BIGINT) bin_id, CAST(n AS BIGINT) fill
         |   FROM ord WHERE rn = 1
         |   UNION ALL
         |   SELECT o.doc_id, o.n, o.shard, o.rn,
         |     CASE WHEN p.fill + o.n > 512 AND p.fill > 0 THEN p.bin_id + 1 ELSE p.bin_id END,
         |     CASE WHEN p.fill + o.n > 512 AND p.fill > 0 THEN CAST(o.n AS BIGINT) ELSE p.fill + o.n END
         |   FROM pack p JOIN ord o ON o.shard = p.shard AND o.rn = p.rn + 1)
         |SELECT CAST(shard AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  max(bin_id) + 1 AS n_bins, CAST(sum(n) AS BIGINT) AS n_tokens,
         |  bit_xor(CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)||':'||CAST(bin_id AS VARCHAR)),1,15)) AS BIGINT)) AS fingerprint60
         |FROM pack GROUP BY shard""".stripMargin,

    // q102: streaming exact dedup converges to the batch DISTINCT
    "q102_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    // q104: stream-stream interval join converges to the batch time-range
    // join on a bounded replay; µs integer arithmetic, decimal cents
    "q104_stream_interval_join" ->
      """WITH c AS (SELECT user_id, event_id click_id, ts cts FROM events WHERE event_type='click'),
        | p AS (SELECT user_id, event_id purchase_id, ts pts, value FROM events WHERE event_type='purchase')
        |SELECT c.user_id, click_id, purchase_id,
        |  epoch_us(pts) - epoch_us(cts) AS delay_us,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS purchase_cents
        |FROM c JOIN p ON c.user_id = p.user_id
        | AND pts >= cts AND pts <= cts + INTERVAL 30 MINUTE""".stripMargin,

    // q103: BM25 top-k — every float literal written in e0 notation so
    // DuckDB parses DOUBLEs (not DECIMALs) and the expression tree is the
    // engine's IEEE tree verbatim; per-term scores floor-quantized to e6
    // longs BEFORE the per-doc sum (order-independent), idf and tfn floors
    // multiplied as exact BIGINTs. k1=1.25, b=0.75, so (k1+1)=2.25e0 and
    // (1-b)=0.25e0 are binary-exact
    "q103_bm25_topk" ->
      s"""WITH toks AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) dl FROM toks),
         | stats AS (SELECT count(*) n_docs, CAST(sum(dl) AS BIGINT) sum_dl FROM lens),
         | postings AS (SELECT doc_id, token, count(*) tf
         |   FROM (SELECT doc_id, unnest(ws) token FROM toks)
         |   WHERE token IN ('vector','merge','stream') GROUP BY doc_id, token),
         | dfreq AS (SELECT token, count(*) df FROM postings GROUP BY token),
         | scored AS (SELECT p.doc_id,
         |    CAST(FLOOR(1000000.0e0 * ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0) / (CAST(df AS DOUBLE) + 0.5e0) + 1.0e0)) AS BIGINT)
         |  * CAST(FLOOR(1000000.0e0 * (CAST(tf AS DOUBLE) * 2.25e0 / (CAST(tf AS DOUBLE) + 1.25e0 * (1.0e0 - 0.75e0 + 0.75e0 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS BIGINT) term_score_e12
         |   FROM postings p JOIN dfreq d ON p.token = d.token
         |   JOIN lens l ON p.doc_id = l.doc_id CROSS JOIN stats),
         | agg AS (SELECT doc_id, CAST(sum(term_score_e12) AS BIGINT) bm25_e12,
         |    count(*) n_terms_hit FROM scored GROUP BY doc_id)
         |SELECT doc_id, bm25_e12, n_terms_hit FROM agg
         |ORDER BY bm25_e12 DESC, doc_id ASC LIMIT 25""".stripMargin,

    // q130: persisted BM25 index — the probe must serve the exact q103
    // scoring contract from the stored layout, so the oracle recomputes
    // it straight from the corpus (index correctness = serving equals
    // recompute, the q98 adjudication)
    "q130_bm25_index" ->
      s"""WITH toks AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) dl FROM toks),
         | stats AS (SELECT count(*) n_docs, CAST(sum(dl) AS BIGINT) sum_dl FROM lens),
         | postings AS (SELECT doc_id, token, count(*) tf
         |   FROM (SELECT doc_id, unnest(ws) token FROM toks)
         |   WHERE token IN ('join','window','scan') GROUP BY doc_id, token),
         | dfreq AS (SELECT token, count(*) df FROM postings GROUP BY token),
         | scored AS (SELECT p.doc_id,
         |    CAST(FLOOR(1000000.0e0 * ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0) / (CAST(df AS DOUBLE) + 0.5e0) + 1.0e0)) AS BIGINT)
         |  * CAST(FLOOR(1000000.0e0 * (CAST(tf AS DOUBLE) * 2.25e0 / (CAST(tf AS DOUBLE) + 1.25e0 * (1.0e0 - 0.75e0 + 0.75e0 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS BIGINT) term_score_e12
         |   FROM postings p JOIN dfreq d ON p.token = d.token
         |   JOIN lens l ON p.doc_id = l.doc_id CROSS JOIN stats),
         | agg AS (SELECT doc_id, CAST(sum(term_score_e12) AS BIGINT) bm25_e12,
         |    count(*) n_terms_hit FROM scored GROUP BY doc_id)
         |SELECT doc_id, bm25_e12, n_terms_hit FROM agg
         |ORDER BY bm25_e12 DESC, doc_id ASC LIMIT 25""".stripMargin,

    // q131: bounded-heap per-group top-k — the oracle is the window
    // formulation the aggregator replaces; identical rows prove the
    // mergeable partials lose nothing
    "q131_topk_per_group" ->
      """SELECT o_custkey, rn AS rk, o_orderkey, price_cents FROM (
        | SELECT CAST(o_custkey AS BIGINT) o_custkey, CAST(o_orderkey AS BIGINT) o_orderkey,
        |   CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS price_cents,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) DESC, o_orderkey ASC) rn
        | FROM orders) WHERE rn <= 3""".stripMargin,

    // q132: collocation lift — bigram/unigram counts are exact; the lift
    // ratio is DOUBLE arithmetic over exact-representable counts with the
    // identical association on both sides (see collocationsByLift scaladoc)
    "q132_collocations" ->
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | uni AS (SELECT unnest(ws) w FROM base),
         | un AS (SELECT w, count(*) c FROM uni GROUP BY w),
         | nu AS (SELECT count(*) n_uni FROM uni),
         | bi AS (SELECT u.w1, u.w2 FROM (
         |   SELECT unnest(list_transform(range(1, len(ws)), i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) u
         |   FROM base WHERE len(ws) >= 2)),
         | nb AS (SELECT count(*) n_big FROM bi),
         | bn AS (SELECT w1, w2, count(*) n_ab FROM bi GROUP BY 1, 2 HAVING count(*) >= 5)
         |SELECT w1, w2, n_ab,
         | CAST(FLOOR(1000000.0e0 * ((CAST(n_ab AS DOUBLE) * CAST(n_uni AS DOUBLE) * CAST(n_uni AS DOUBLE))
         |   / (CAST(n_big AS DOUBLE) * CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)))) AS BIGINT) AS lift_e6
         |FROM bn JOIN un ca ON bn.w1 = ca.w JOIN un cb ON bn.w2 = cb.w
         |CROSS JOIN nu CROSS JOIN nb""".stripMargin,

    // q133: hash-sampled quantiles — the oracle re-draws the identical
    // 1-in-16 hash sample and takes the same floored-rank order statistic
    "q133_sampled_quantiles" ->
      """WITH s AS (SELECT l_returnflag g,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) v
        |  FROM lineitem
        |  WHERE CAST(('0x'||substr(md5(CAST(l_orderkey AS VARCHAR)||'#'||CAST(l_linenumber AS VARCHAR)),1,15)) AS BIGINT) % 16 = 0),
        | n AS (SELECT g, count(*) n_sample FROM s GROUP BY g),
        | r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) rn FROM s),
        | t AS (SELECT g, n_sample, q, ((n_sample - 1) * pm) // 1000 + 1 AS rn
        |   FROM n, (VALUES ('p50', 500), ('p90', 900), ('p99', 990)) tq(q, pm))
        |SELECT t.g AS l_returnflag, t.q AS quantile, t.n_sample, r.v AS value_cents
        |FROM t JOIN r ON t.g = r.g AND t.rn = r.rn""".stripMargin,

    // q134: canonical selection — q88's recursive components extended
    // with singleton fallback (q126's shape), then the keeper window
    // (longest text, ascending-id tie-break) replayed relationally
    "q134_canonical_dedup" ->
      s"""WITH RECURSIVE $simhash60Ctes,
         | e AS (SELECT a.doc_id ia, b.doc_id ib
         |   FROM s a JOIN s b ON a.doc_id < b.doc_id
         |   WHERE bit_count(xor(a.sk60, b.sk60)) <= 4),
         | sym AS (SELECT ia a, ib b FROM e UNION SELECT ib, ia FROM e),
         | reach(id, r) AS (
         |   SELECT a, a FROM sym
         |   UNION
         |   SELECT sym.a, reach.r FROM sym JOIN reach ON reach.id = sym.b
         | ),
         | comp AS (SELECT id, min(r) lbl FROM reach GROUP BY id),
         | g AS (SELECT d.doc_id, coalesce(c.lbl, d.doc_id) group_id,
         |     CAST(len(coalesce(d.text, '')) AS BIGINT) text_len
         |   FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         | r AS (SELECT doc_id, group_id, text_len,
         |   row_number() OVER (PARTITION BY group_id ORDER BY text_len DESC, doc_id ASC) rn FROM g),
         | cn AS (SELECT group_id, doc_id canonical_id FROM r WHERE rn = 1)
         |SELECT r.doc_id, r.group_id, cn.canonical_id, r.doc_id = cn.canonical_id AS is_canonical
         |FROM r JOIN cn USING (group_id)""".stripMargin,

    // q135: prefix-filtered exact similarity join — the oracle is the
    // naive all-pairs threshold join; identical rows prove the prefix
    // candidate rule loses nothing (integer threshold on both sides)
    "q135_ppjoin" ->
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | sh AS (SELECT doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) s
         |  FROM base),
         | st AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         | pr AS (SELECT a.doc_id id_a, b.doc_id id_b,
         |    CAST(len(list_intersect(a.s, b.s)) AS BIGINT) inter,
         |    CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT) un
         |   FROM st a JOIN st b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         | CAST(FLOOR(10000.0e0 * (CAST(inter AS DOUBLE) / CAST(un AS DOUBLE))) AS BIGINT) AS jaccard_e4
         |FROM pr WHERE inter * 5 >= un * 2""".stripMargin,

    // q136: ORC roundtrip — the oracle computes from the original parquet;
    // equality proves write->read fidelity through the second format
    "q136_orc_roundtrip" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, count(*) AS n_orders,
        | CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS cents
        |FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1""".stripMargin,

    // q137: per-label centroids — e6-floored longs summed exactly; the
    // mean is integer division truncating toward zero on both sides
    // (DuckDB's integer // truncates, matching Spark's div)
    "q137_embedding_centroids" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
        |    CAST(FLOOR(CAST(embedding[i+1] AS DOUBLE) * 1000000.0e0) AS BIGINT) v
        |  FROM embeddings, range(64) t(i))
        |SELECT label, dim, count(*) AS n_vecs, CAST(sum(v) AS BIGINT) AS sum_e6,
        | CAST(sum(v) AS BIGINT) // count(*) AS mean_e6
        |FROM e GROUP BY 1, 2""".stripMargin,

    // q138: entity resolution — q112's blocked Levenshtein pairs chained
    // into recursive components; canonical = min id per component with
    // singleton fallback
    "q138_entity_resolution" ->
      """WITH RECURSIVE d AS (SELECT CAST(min(p_partkey) AS BIGINT) AS pid, p_name AS pname FROM part GROUP BY p_name),
        | p AS (SELECT pid, pname, split_part(pname, ' ', 2) AS blk FROM d),
        | e AS (SELECT a.pid ia, b.pid ib FROM p a JOIN p b ON a.blk = b.blk AND a.pid < b.pid
        |   WHERE levenshtein(a.pname, b.pname) <= 2),
        | sym AS (SELECT ia a, ib b FROM e UNION SELECT ib, ia FROM e),
        | reach(id, r) AS (
        |   SELECT a, a FROM sym
        |   UNION
        |   SELECT sym.a, reach.r FROM sym JOIN reach ON reach.id = sym.b
        | ),
        | comp AS (SELECT id, min(r) lbl FROM reach GROUP BY id)
        |SELECT p.pid AS name_id, p.pname AS name, coalesce(c.lbl, p.pid) AS entity_id,
        | p.pid = coalesce(c.lbl, p.pid) AS is_canonical
        |FROM p LEFT JOIN comp c ON p.pid = c.id""".stripMargin,

    // q139: distributed BPE merge training — see bpeTrainSql
    "q139_bpe_training" -> bpeTrainSql(8),

    // q142: Gopher repetition signals — identical per-row list folds
    // (normalized char denominator, longest-gram tie rule, FLOOR e4)
    "q142_repetition" -> repetitionSql,

    // q145: deferred (deletion-vector) GDPR sweep — same relational
    // recompute as q140; what differs is the engine path (merge-on-read
    // anti-join instead of bucket rewrite)
    "q145_gdpr_deferred" ->
      """WITH latest AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        | FROM orders)
        |SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        |FROM latest WHERE rn = 1
        | AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')""".stripMargin,

    // q149: containment pairs — q36's postings shape with the
    // asymmetric ratios; FP chain mirrored (double div, *1e4, FLOOR)
    "q149_containment" ->
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | sh AS (SELECT doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) sh
         |  FROM base),
         | sizes AS (SELECT doc_id, len(sh) n FROM sh WHERE len(sh) > 0),
         | post AS (SELECT doc_id, unnest(sh) s FROM sh),
         | co AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter
         |        FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
         |        GROUP BY 1, 2),
         | c AS (SELECT id_a, id_b,
         |        CAST(co.inter AS DOUBLE) / sa.n cab, CAST(co.inter AS DOUBLE) / sb.n cba
         |       FROM co JOIN sizes sa ON co.id_a = sa.doc_id
         |               JOIN sizes sb ON co.id_b = sb.doc_id)
         |SELECT id_a, id_b,
         | CAST(FLOOR(cab * 10000) AS BIGINT) AS cont_ab_e4,
         | CAST(FLOOR(cba * 10000) AS BIGINT) AS cont_ba_e4
         |FROM c WHERE GREATEST(cab, cba) >= CAST(0.5 AS DOUBLE)""".stripMargin,

    // q150: event-decayed value — DuckDB's ordered list aggregate +
    // list_reduce replays the same integer fold (0 seed via prepend)
    "q150_decayed_value" ->
      """WITH e AS (SELECT user_id,
        |   list(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ORDER BY ts, event_id) vs
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), vs),
        |    (acc, v) -> CAST(FLOOR(acc * 8500 / 10000.0) AS BIGINT) + v) AS decayed_cents
        |FROM e""".stripMargin,

    // q157: per-dimension stats — e6 floors, HUGEINT variance identity,
    // truncating divisions (q137's division-semantics precedent)
    "q157_dimension_stats" ->
      """WITH e AS (SELECT CAST(i AS BIGINT) dim,
        |    CAST(FLOOR(CAST(embedding[i+1] AS DOUBLE) * 1000000.0e0) AS BIGINT) v
        |  FROM embeddings, range(64) t(i)),
        | a AS (SELECT dim, CAST(count(*) AS BIGINT) n, CAST(sum(v) AS BIGINT) s,
        |        CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) ssq
        |   FROM e GROUP BY dim)
        |SELECT dim, n, s // n AS mean_e6,
        | CAST((CAST(n AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_e12
        |FROM a""".stripMargin,

    // q158: equi-width histogram — identical integer bucket arithmetic,
    // clamped edges, densified empty buckets
    "q158_histogram" ->
      """WITH v AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) c FROM orders),
        | b AS (SELECT (LEAST(59999999, GREATEST(0, c)) * 20) // 60000000 bin FROM v),
        | g AS (SELECT CAST(unnest(range(20)) AS BIGINT) bin),
        | n AS (SELECT bin, CAST(count(*) AS BIGINT) n FROM b GROUP BY bin)
        |SELECT g.bin, (g.bin * CAST(60000000 AS BIGINT)) // 20 AS lo_edge_cents,
        |  COALESCE(n.n, 0) AS n
        |FROM g LEFT JOIN n ON g.bin = n.bin""".stripMargin,

    // q159: balanced downsample — count floor + (hash DESC, id) rank
    "q159_balanced_sample" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |   CAST(('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT) h
        |  FROM embeddings),
        | m AS (SELECT min(c) mn FROM (SELECT count(*) c FROM e GROUP BY label)),
        | r AS (SELECT vec_id, label,
        |   row_number() OVER (PARTITION BY label ORDER BY h DESC, vec_id ASC) rk FROM e)
        |SELECT vec_id, label FROM r, m WHERE rk <= mn""".stripMargin,

    // q156: kNN label screen — ordered dot folds (q72's chain), then
    // the same two-stage ranking: (cosine DESC, cid) top-5, majority by
    // (count DESC, label ASC)
    "q156_label_screen" -> labelScreenSql,

    // q196: the IVF-celled screen at nprobe = ALL cells probes every
    // cell, so its output is exactly the exact screen's — same oracle
    "q196_label_screen_ivf" -> labelScreenSql,

    // q154: type-widening read — the widened union recomputed from orders
    "q154_widened_read" ->
      """SELECT CAST(o_orderkey AS BIGINT) k, CAST(o_custkey AS BIGINT) ck,
        |  CASE WHEN o_custkey % 2 <> 0 THEN o_totalprice ELSE NULL END price
        |FROM orders""".stripMargin,

    // q155: replica divergence — which buckets must report diverged
    // (b3 corrupted, b5 short) plus both row counts, derived relationally
    "q155_replica_audit" ->
      """WITH o AS (SELECT CAST(o_orderkey AS BIGINT) k, 'b' || CAST(o_custkey % 8 AS VARCHAR) p FROM orders),
        | a AS (SELECT p, CAST(count(*) AS BIGINT) rows_a FROM o GROUP BY p),
        | b AS (SELECT p, CAST(count(*) AS BIGINT) rows_b FROM o
        |       WHERE NOT (p = 'b5' AND k % 2 = 1) GROUP BY p)
        |SELECT a.p AS part, rows_a, rows_b, (a.p IN ('b3', 'b5')) AS diverged
        |FROM a JOIN b ON a.p = b.p""".stripMargin,

    // q152: triangle counts — identical degree orientation and joins
    "q152_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey ok, CAST(l_suppkey AS BIGINT) s FROM lineitem),
        | e0 AS (SELECT a, b FROM (
        |        SELECT x.s a, y.s b, count(*) n
        |        FROM li x JOIN li y ON x.ok = y.ok AND x.s < y.s
        |        GROUP BY x.s, y.s) WHERE n >= 8),
        | deg AS (SELECT v, count(*) d FROM (SELECT a v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY v),
        | o AS (SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND a < b) THEN a ELSE b END u,
        |              CASE WHEN (da.d < db.d) OR (da.d = db.d AND a < b) THEN b ELSE a END v
        |       FROM e0 JOIN deg da ON e0.a = da.v JOIN deg db ON e0.b = db.v),
        | wdg AS (SELECT e1.u, e1.v, e2.v w FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.v < e2.v),
        | tri AS (SELECT wdg.u, wdg.v, wdg.w FROM wdg JOIN e0 ON e0.a = wdg.v AND e0.b = wdg.w)
        |SELECT vid AS s_suppkey, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM (SELECT unnest([u, v, w]) vid FROM tri) GROUP BY vid""".stripMargin,

    // q153: golden record — per-field arg-max by (non-null, recency)
    // replayed as one window per field
    "q153_golden_record" ->
      """WITH m AS (SELECT p_name, CAST(p_partkey AS BIGINT) pk, p_brand,
        |   CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE p_type END p_type,
        |   CAST(p_size AS BIGINT) p_size FROM part),
        | fb AS (SELECT p_name, p_brand, row_number() OVER (PARTITION BY p_name
        |   ORDER BY (p_brand IS NOT NULL) DESC, pk DESC) rn FROM m),
        | ft AS (SELECT p_name, p_type, row_number() OVER (PARTITION BY p_name
        |   ORDER BY (p_type IS NOT NULL) DESC, pk DESC) rn FROM m),
        | fs AS (SELECT p_name, p_size, row_number() OVER (PARTITION BY p_name
        |   ORDER BY (p_size IS NOT NULL) DESC, pk DESC) rn FROM m)
        |SELECT fb.p_name, fb.p_brand, ft.p_type, fs.p_size
        |FROM fb JOIN ft ON fb.p_name = ft.p_name AND ft.rn = 1
        |        JOIN fs ON fb.p_name = fs.p_name AND fs.rn = 1
        |WHERE fb.rn = 1""".stripMargin,

    // q151: streaming decayed counter — converges to q150's batch fold
    "q151_stream_decay" ->
      """WITH e AS (SELECT user_id,
        |   list(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ORDER BY ts, event_id) vs
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), vs),
        |    (acc, v) -> CAST(FLOOR(acc * 8500 / 10000.0) AS BIGINT) + v) AS decayed_cents
        |FROM e""".stripMargin,

    // q148: CDC apply — replica active snapshot == v2's active set
    // derived from the source relations (b2 supersedes b1 per custkey)
    "q148_cdc_apply" -> cdcApplySql,

    // q166: the STREAMED apply must converge to the same replica state as
    // q148's one-shot apply — batch boundaries, the exactly-once marker
    // protocol, and per-key replay atomicity all gated by the same SQL
    "q166_stream_cdc_apply" -> cdcApplySql,

    // q167: distributed GD training replayed iteration-for-iteration
    "q167_classifier_training" -> trainLinearSql,

    // q168: cross-corpus LSH decontamination — q37's portable pipeline
    // with the candidate join taken ACROSS the corpus/benchmark split
    "q168_crosscorpus_lsh" -> {
      import graft.plans.MinHashSig.{P, a, b}
      val sigList = (0 until 16)
        .map(i => s"list_min(list_transform(sh, h -> (${a(i)}*(h%$P)+${b(i)})%$P))")
        .mkString("[", ",\n   ", "]")
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | sh AS (SELECT doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) sh
         |  FROM base),
         | sig AS (SELECT doc_id, $sigList sig FROM sh WHERE len(sh) > 0),
         | banded AS (SELECT doc_id, unnest(list_transform(range(0, 8),
         |    b -> CAST(b AS VARCHAR)||':'||CAST(sig[CAST(2*b+1 AS INTEGER)] AS VARCHAR)||','||CAST(sig[CAST(2*b+2 AS INTEGER)] AS VARCHAR))) bucket
         |  FROM sig),
         | cand AS (SELECT DISTINCT x.doc_id corpus_id, y.doc_id bench_id
         |  FROM banded x JOIN banded y ON x.bucket = y.bucket
         |  WHERE x.doc_id % 10 != 7 AND y.doc_id % 10 = 7),
         | ver AS (SELECT corpus_id, bench_id, len(list_intersect(p.sh, q.sh)) inter, len(p.sh) la, len(q.sh) lb
         |  FROM cand JOIN sh p ON corpus_id = p.doc_id JOIN sh q ON bench_id = q.doc_id),
         | j AS (SELECT corpus_id, bench_id,
         |    CASE WHEN la+lb-inter = 0 THEN 0.0 ELSE CAST(inter AS DOUBLE)/(la+lb-inter) END jac FROM ver)
         |SELECT corpus_id, bench_id, CAST(FLOOR(jac*10000) AS BIGINT) AS jaccard_e4
         |FROM j WHERE jac >= CAST(0.5 AS DOUBLE)""".stripMargin
    },

    // q147: domain capping — rank replayed as a window over the same
    // portable hash (DESC, id ASC tie-break = TopKByScoreAgg's order)
    "q147_domain_cap" ->
      s"""WITH h AS (SELECT source, doc_id,
         |   CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) h
         |  FROM documents),
         | r AS (SELECT source, doc_id,
         |   row_number() OVER (PARTITION BY source ORDER BY h DESC, doc_id ASC) rk
         |  FROM h)
         |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id FROM r WHERE rk <= 10""".stripMargin,

    // q144: zone-map pruned range scan — the oracle is the plain filter
    // (pruning is a scan-elimination optimization, not a semantics change)
    "q144_zone_map" ->
      """SELECT CAST(o_orderkey AS BIGINT) o_orderkey, CAST(o_custkey AS BIGINT) o_custkey, o_totalprice
        |FROM orders WHERE o_custkey BETWEEN 200 AND 499""".stripMargin,

    // q143: hashed linear classifier — hash→bucket→fixture-weight→
    // integer sum replayed per row (weight formula inlined; the Spark
    // side looks the same value up in the broadcast array literal)
    "q143_quality_classifier" ->
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | f AS (SELECT doc_id,
         |   list_concat(ws, CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
         |     ELSE list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) END) feats
         |  FROM base),
         | sc AS (SELECT doc_id, CAST(len(feats) AS BIGINT) n_feats,
         |   CAST(COALESCE(list_sum(list_transform(feats,
         |     w -> ((CAST(('0x'||substr(md5(w),1,15)) AS BIGINT) % 4096) * 2654435761) % 2001 - 1000)), 0) AS BIGINT) wsum
         |  FROM f)
         |SELECT doc_id, n_feats,
         |  CASE WHEN n_feats = 0 THEN 0
         |       ELSE CAST(FLOOR(CAST(wsum AS DOUBLE) * 10000.0e0 / n_feats) AS BIGINT) END AS score_e4,
         |  (n_feats > 0 AND (CASE WHEN n_feats = 0 THEN 0
         |       ELSE CAST(FLOOR(CAST(wsum AS DOUBLE) * 10000.0e0 / n_feats) AS BIGINT) END) >= 0) AS keep
         |FROM sc""".stripMargin,

    // q140: GDPR sweep — final active snapshot = global latest order per
    // customer (q119's v2 derivation) minus the doomed segment
    "q140_gdpr_sweep" ->
      """WITH latest AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        | FROM orders)
        |SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        |FROM latest WHERE rn = 1
        | AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')""".stripMargin,

    // q141: snapshot drift — v1 stats from the pre-1998 latest batch, v2
    // from the superseded state (b2 wins, b1 survives where unmatched)
    "q141_version_drift" ->
      """WITH b1 AS (SELECT o_custkey, o_totalprice FROM (
        |    SELECT o_custkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |    FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00') WHERE rn = 1),
        | b2 AS (SELECT o_custkey, o_totalprice FROM (
        |    SELECT o_custkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00') WHERE rn = 1),
        | act2 AS (SELECT * FROM b2 UNION ALL SELECT * FROM b1 WHERE o_custkey NOT IN (SELECT o_custkey FROM b2)),
        | s1 AS (SELECT CAST(count(*) AS BIGINT) n_rows, CAST(count(*) AS BIGINT) n_active,
        |      CAST(count(*) AS BIGINT) n_keys,
        |      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) cents FROM b1),
        | s2 AS (SELECT CAST((SELECT count(*) FROM b1) + (SELECT count(*) FROM b2) AS BIGINT) n_rows,
        |      CAST((SELECT count(*) FROM act2) AS BIGINT) n_active,
        |      CAST((SELECT count(*) FROM act2) AS BIGINT) n_keys,
        |      CAST((SELECT sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) FROM act2) AS BIGINT) cents)
        |SELECT 'n_rows' AS metric, s1.n_rows AS from_value, s2.n_rows AS to_value, s2.n_rows - s1.n_rows AS delta FROM s1, s2
        |UNION ALL SELECT 'n_active', s1.n_active, s2.n_active, s2.n_active - s1.n_active FROM s1, s2
        |UNION ALL SELECT 'n_keys', s1.n_keys, s2.n_keys, s2.n_keys - s1.n_keys FROM s1, s2
        |UNION ALL SELECT 'active_cents', s1.cents, s2.cents, s2.cents - s1.cents FROM s1, s2""".stripMargin,

    // q114: product-quantized ANN — full training/encoding/ADC replay
    "q114_ann_pq" -> pqAdcSql(m = 8, dsub = 8, k = 16, iters = 2, topK = 20),

    // q197: two-stage PQ serve — q114's ADC chain keeps a top-100
    // shortlist, exact cosine (q40's fold) re-ranks it to the final 20
    "q197_ann_pq_rerank" -> pqAdcSql(m = 8, dsub = 8, k = 16, iters = 2, topK = 20, rerank = Some(1000)),

    // q198: cross-dimension covariance — e6-floored values, HUGEINT second
    // moments, the (n·Σvᵢvⱼ − Σvᵢ·Σvⱼ)/n² identity; `//` and Spark `div`
    // both truncate toward zero (verified on negative numerators)
    "q198_covariance" -> covarianceSql,

    // q199: the outer-product-fold formulation must produce the SAME cells
    // as q198's join formulation — identical oracle, so the two plans are
    // proven interchangeable bit for bit
    "q199_covariance_fold" -> covarianceSql,

    // q115: IVF+PQ — q114's chain with q72's coarse probe pruning
    "q115_ann_ivf_pq" -> pqAdcSql(m = 8, dsub = 8, k = 16, iters = 2, topK = 20, coarse = Some((8, 3))),

    // q161: persisted IVF+PQ index — the probe must reproduce the INLINE
    // q115 chain exactly (train + encode + coarse prune + ADC), so the
    // oracle is the same full replay; divergence in the stored codes,
    // the pack, or the ADC kernel hash-fails
    "q161_pq_index_probe" -> pqAdcSql(m = 8, dsub = 8, k = 16, iters = 2, topK = 20, coarse = Some((8, 3))),

    // q163: residual-encoded IVF+PQ (IVFADC) — stored-index probe must
    // reproduce the full residual chain (coarse assign, residual,
    // residual-space train/encode, per-cell ADC) bit-for-bit
    "q163_ann_ivf_pq_residual" -> pqResidualAdcSql(m = 8, dsub = 8, k = 16, iters = 2, topK = 20, numCells = 8, nprobe = 3),

    // q164: the streamed-in index must serve bit-identically to q163's
    // one-shot build — batch boundaries and re-deliveries perturb nothing,
    // so the oracle is the same residual-chain replay
    "q164_stream_vector_index" -> pqResidualAdcSql(m = 8, dsub = 8, k = 16, iters = 2, topK = 20, numCells = 8, nprobe = 3),

    // q165: persisted sketch rollup — exact per-range distincts + day
    // counts recomputed relationally, est_ok PINNED TRUE (the q125
    // self-validating pattern: a merged-sketch estimate outside 5% of
    // exact hash-fails instead of hiding in a tolerance)
    "q165_sketch_rollup" -> sketchRollupSql,

    // q169: the STREAM-MAINTAINED rollup must serve the same range reads
    // as q165's one-shot build — HLL union is associative, so batch
    // boundaries and the merge-on-write path may not perturb the serve
    "q169_stream_sketch_mv" -> sketchRollupSql,

    // q170: mixture upsampling — weight lookup, hash indicator, and
    // generate_series expansion replayed row-for-row
    "q170_mixture_upsample" ->
      """WITH w AS (SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 23000 WHEN 'src1' THEN 6000
        |                WHEN 'src2' THEN 15000 WHEN 'src3' THEN 0 ELSE 10000 END AS wv,
        |    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 10000 AS h
        |  FROM documents),
        | n AS (SELECT doc_id, source,
        |    CAST(wv // 10000 + CASE WHEN h < wv % 10000 THEN 1 ELSE 0 END AS BIGINT) AS n_copies FROM w)
        |SELECT doc_id, source, n_copies,
        |  CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_idx
        |FROM n WHERE n_copies > 0""".stripMargin,

    // q171: histogram rollup — the merged stored partials must equal the
    // DIRECT histogram of each range recomputed from raw events (exact
    // mergeability: fixed bounds, addition — no tolerance anywhere)
    "q171_histogram_rollup" ->
      """WITH v AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) c FROM events),
        | g AS (SELECT CAST(unnest(range(16)) AS BIGINT) bin),
        | r1 AS (SELECT (LEAST(9999, GREATEST(0, c)) * 16) // 10000 bin FROM v
        |   WHERE day BETWEEN '2024-01-05' AND '2024-01-14'),
        | n1 AS (SELECT bin, CAST(count(*) AS BIGINT) n FROM r1 GROUP BY bin),
        | o1 AS (SELECT '2024-01-05..2024-01-14' AS day_range, g.bin,
        |    (g.bin * CAST(10000 AS BIGINT)) // 16 AS lo_edge_cents, COALESCE(n1.n, 0) AS n
        |   FROM g LEFT JOIN n1 ON g.bin = n1.bin),
        | r2 AS (SELECT (LEAST(9999, GREATEST(0, c)) * 16) // 10000 bin FROM v
        |   WHERE day BETWEEN '2024-01-15' AND '2024-01-25'),
        | n2 AS (SELECT bin, CAST(count(*) AS BIGINT) n FROM r2 GROUP BY bin),
        | o2 AS (SELECT '2024-01-15..2024-01-25' AS day_range, g.bin,
        |    (g.bin * CAST(10000 AS BIGINT)) // 16 AS lo_edge_cents, COALESCE(n2.n, 0) AS n
        |   FROM g LEFT JOIN n2 ON g.bin = n2.bin)
        |SELECT * FROM o1 UNION ALL SELECT * FROM o2""".stripMargin,

    // q173: retention sweep — survivors = the plain temporal filter, so
    // zone-map pruning and the in-partition delete are both hash-gated
    "q173_retention_sweep" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS o_date_epoch, o_totalprice
        |FROM orders WHERE epoch(o_orderdate) >= 899251200""".stripMargin,

    // q174: dataset card — every aggregate and e4 ratio replayed exactly
    "q174_dataset_card" ->
      s"""WITH b AS (SELECT source, lang, n_chars l,
         |    CASE WHEN len(trim(text))=0 THEN 0 ELSE len(string_split_regex(trim(text),'\\s+')) END tok,
         |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) fp
         |  FROM documents),
         | s AS (SELECT source, CAST(count(*) AS BIGINT) n_docs,
         |    CAST(sum(tok) AS BIGINT) total_tokens,
         |    CAST(count(DISTINCT lang) AS BIGINT) n_langs,
         |    CAST(sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) en,
         |    CAST(sum(CASE WHEN l BETWEEN 100 AND 20000 THEN 1 ELSE 0 END) AS BIGINT) ok
         |   FROM b GROUP BY source),
         | d AS (SELECT source, CAST(count(*) AS BIGINT) n_distinct_text
         |   FROM (SELECT DISTINCT source, fp FROM b) GROUP BY source)
         |SELECT s.source, n_docs, total_tokens, n_langs, n_distinct_text,
         |  CAST((en * 10000) // n_docs AS BIGINT) AS en_share_e4,
         |  CAST(((n_docs - n_distinct_text) * 10000) // n_docs AS BIGINT) AS dup_rate_e4,
         |  CAST((ok * 10000) // n_docs AS BIGINT) AS quality_share_e4
         |FROM s JOIN d ON s.source = d.source""".stripMargin,

    // q175: WARC ingestion — every emitted column predicted from the
    // fixture-generating arithmetic (file grouping, record order, status
    // rule, body bytes/hash) while the engine must actually gunzip the
    // member stream and parse both the WARC and HTTP layers; torn files
    // (every 13th) keep their complete records and gain ONE sentinel row
    "q175_warc_ingest" -> warcIngestOracle,

    // q182: streaming WARC ingestion — the parse is stateless, so the
    // file-source micro-batch replay must converge to q175's batch parse
    // bit-for-bit (same oracle verbatim, torn-file sentinels included)
    "q182_stream_warc" -> warcIngestOracle,

    // q181: crawl→corpus end to end — survivors predicted structurally
    // (404s and the torn last record of every 13th file drop), then the
    // q178 extraction chain replayed over the identically-built HTML
    "q181_crawl_corpus" ->
      s"""WITH d AS (SELECT doc_id, text, doc_id // 5 AS fid FROM documents),
        | mx AS (SELECT fid, max(doc_id) mxid FROM d GROUP BY fid),
        | keep AS (SELECT d.doc_id, d.text FROM d JOIN mx ON d.fid = mx.fid
        |   WHERE d.doc_id % 7 <> 0 AND NOT (d.fid % 13 = 0 AND d.doc_id = mx.mxid)),
        | h AS (SELECT doc_id,
        |$htmlFixtureSql
        | FROM keep),
        |$htmlChainSql,
        | tok AS (SELECT doc_id, title, txt,
        |    CAST(CASE WHEN len(trim(txt))=0 THEN 0 ELSE len(string_split_regex(trim(txt),'\\s+')) END AS BIGINT) n_tokens
        |  FROM ti)
        |SELECT doc_id, title,
        | CAST(('0x'||substr(md5(txt),1,15)) AS BIGINT) AS text_h,
        | n_tokens, (n_tokens BETWEEN 10 AND 500) AS quality_ok
        |FROM tok""".stripMargin,

    // q193: charset-aware WARC decode — the expected decoded text per
    // planted encoding mode, predicted straight from `documents`:
    // m0/m1/m2 decode back to the exact body (m2 with its meta prefix),
    // m3 (UTF-8 bytes under a declared ISO-8859-1) to the deterministic
    // mojibake of the two planted accented chars
    "q193_warc_charset" ->
      """WITH d AS (SELECT doc_id,
        |    'café señor ' || regexp_replace(substr(text, 1, 80), '[^ -~]', '', 'g') AS body
        |  FROM documents WHERE doc_id < 400),
        | m AS (SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS mode,
        |    CASE CAST(doc_id % 4 AS INTEGER)
        |      WHEN 2 THEN '<meta charset="ISO-8859-1"><p>' || body
        |      WHEN 3 THEN replace(replace(body, 'é', 'Ã©'), 'ñ', 'Ã±')
        |      ELSE body END AS dec
        |  FROM d)
        |SELECT doc_id, mode,
        | CAST(('0x'||substr(md5(dec),1,15)) AS BIGINT) AS body_h,
        | CAST(length(dec) AS BIGINT) AS n_chars
        |FROM m""".stripMargin,

    // q195: Delta column-mapping round trip — the plain relational
    // predicate; export+import may relabel columns, never touch a row
    "q195_delta_roundtrip" ->
      """SELECT o_orderkey, o_custkey AS customer,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_cents
        |FROM orders WHERE o_orderkey % 7 = 0""".stripMargin,

    // q192: bloom-indexed point lookup — the plain IN filter; the index
    // may only change WHICH partitions open, never the rows
    "q192_bloom_index" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |FROM orders
        |WHERE o_orderkey IN (107, 1201, 2999, 4507, 7013, 9601, 11251, 13007)""".stripMargin,

    // q191: XML ingest — every column predicted structurally while the
    // engine runs a real StAX parse (the 'a & b' note gates entity
    // decoding); torn files keep complete records + one sentinel
    "q191_xml_ingest" ->
      """WITH d AS (SELECT doc_id, lang, n_chars, text, doc_id // 5 AS fid
        |    FROM documents WHERE doc_id < 5000),
        | r AS (SELECT doc_id, lang, n_chars, text, fid,
        |    CAST(row_number() OVER (PARTITION BY fid ORDER BY doc_id) - 1 AS INTEGER) rn,
        |    CAST(count(*) OVER (PARTITION BY fid) AS INTEGER) cnt
        |  FROM d),
        | good AS (SELECT fid AS file_id, rn AS rec_idx, doc_id, lang, n_chars,
        |    'a & b' AS note,
        |    CAST(('0x'||substr(md5(text),1,15)) AS BIGINT) AS body_h, TRUE AS ok
        |  FROM r WHERE NOT (fid % 23 = 0 AND rn = cnt - 1)),
        | sent AS (SELECT fid AS file_id, CAST(cnt - 1 AS INTEGER) AS rec_idx,
        |    CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS lang,
        |    CAST(NULL AS BIGINT) AS n_chars, CAST(NULL AS VARCHAR) AS note,
        |    CAST(('0x'||substr(md5(''),1,15)) AS BIGINT) AS body_h, FALSE AS ok
        |  FROM r WHERE fid % 23 = 0 AND rn = cnt - 1)
        |SELECT * FROM good UNION ALL SELECT * FROM sent""".stripMargin,

    // q190: distribution drift — grid, clamped bins, e4 shares and the
    // exact integer TVD replayed (no logarithm anywhere by design)
    "q190_distribution_drift" ->
      """WITH r0 AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) v FROM orders
        |    WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        | c0 AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) v FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'),
        | grid AS (SELECT CAST(unnest(range(24)) AS BIGINT) bin),
        | rb AS (SELECT ((LEAST(59999999, GREATEST(0, v)) * 24) // 60000000) bin, count(*) n FROM r0 GROUP BY 1),
        | cb AS (SELECT ((LEAST(59999999, GREATEST(0, v)) * 24) // 60000000) bin, count(*) n FROM c0 GROUP BY 1),
        | j AS (SELECT g.bin, (g.bin * CAST(60000000 AS BIGINT)) // 24 AS lo_edge_cents,
        |    CAST(COALESCE(rb.n, 0) AS BIGINT) ref_n, CAST(COALESCE(cb.n, 0) AS BIGINT) cur_n
        |  FROM grid g LEFT JOIN rb ON g.bin = rb.bin LEFT JOIN cb ON g.bin = cb.bin),
        | t AS (SELECT *, CAST(sum(ref_n) OVER () AS BIGINT) rt, CAST(sum(cur_n) OVER () AS BIGINT) ct FROM j),
        | s AS (SELECT bin, lo_edge_cents, ref_n, cur_n,
        |    CAST(CASE WHEN rt = 0 THEN 0 ELSE (ref_n * 10000) // rt END AS BIGINT) ref_share_e4,
        |    CAST(CASE WHEN ct = 0 THEN 0 ELSE (cur_n * 10000) // ct END AS BIGINT) cur_share_e4
        |  FROM t),
        | d AS (SELECT *, CAST(abs(cur_share_e4 - ref_share_e4) AS BIGINT) abs_delta_e4 FROM s)
        |SELECT bin, lo_edge_cents, ref_n, cur_n, ref_share_e4, cur_share_e4, abs_delta_e4,
        | CAST(sum(abs_delta_e4) OVER () // 2 AS BIGINT) AS tvd_e4
        |FROM d""".stripMargin,

    // q188/q189: label aggregation — the synthetic vote table (annotator
    // j mislabels with rate j/10 by md5 indicator), the lexicographic
    // tie-break consensus, and the reliability audit replayed exactly
    "q188_label_vote" ->
      """WITH v AS (SELECT doc_id, CAST(j AS INTEGER) annotator,
        |    CASE WHEN (CAST(('0x'||substr(md5('an:' || CAST(j AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 10) < j
        |      THEN 'zz' ELSE lang END lbl
        |  FROM documents, (SELECT unnest(range(5)) j)),
        | c AS (SELECT doc_id, lbl, CAST(count(*) AS BIGINT) cnt FROM v GROUP BY doc_id, lbl),
        | r AS (SELECT doc_id, lbl, cnt,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, lbl ASC) rn,
        |    CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT) total FROM c)
        |SELECT doc_id, lbl AS maj_label, cnt AS maj_votes, total AS n_votes,
        | CAST((cnt * 10000) // total AS BIGINT) AS agreement_e4
        |FROM r WHERE rn = 1""".stripMargin,

    // q194: Dawid-Skene hard-EM, both rounds unrolled — c0 majority
    // seed; w1 per-(annotator,label) e4 precision vs c0; c1 weighted
    // argmax; w2 vs c1; c2 weighted argmax with its winning score kept
    "q194_dawid_skene" ->
      """WITH v AS (SELECT doc_id, CAST(j AS INTEGER) annotator,
        |    CASE WHEN (CAST(('0x'||substr(md5('an:' || CAST(j AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 10) < j
        |      THEN 'zz' ELSE lang END lbl
        |  FROM documents, (SELECT unnest(range(5)) j)),
        | c0c AS (SELECT doc_id, lbl, CAST(count(*) AS BIGINT) cnt FROM v GROUP BY doc_id, lbl),
        | c0 AS (SELECT doc_id, lbl AS cons FROM (
        |    SELECT doc_id, lbl, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, lbl ASC) rn FROM c0c) WHERE rn = 1),
        | w1 AS (SELECT v.annotator, v.lbl,
        |    CAST((sum(CASE WHEN v.lbl = c0.cons THEN 1 ELSE 0 END) * 10000) // count(*) AS BIGINT) w
        |  FROM v JOIN c0 USING (doc_id) GROUP BY v.annotator, v.lbl),
        | s1 AS (SELECT v.doc_id, v.lbl, CAST(sum(w1.w) AS BIGINT) sc
        |  FROM v JOIN w1 ON v.annotator = w1.annotator AND v.lbl = w1.lbl GROUP BY v.doc_id, v.lbl),
        | c1 AS (SELECT doc_id, lbl AS cons FROM (
        |    SELECT doc_id, lbl, row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, lbl ASC) rn FROM s1) WHERE rn = 1),
        | w2 AS (SELECT v.annotator, v.lbl,
        |    CAST((sum(CASE WHEN v.lbl = c1.cons THEN 1 ELSE 0 END) * 10000) // count(*) AS BIGINT) w
        |  FROM v JOIN c1 USING (doc_id) GROUP BY v.annotator, v.lbl),
        | s2 AS (SELECT v.doc_id, v.lbl, CAST(sum(w2.w) AS BIGINT) sc
        |  FROM v JOIN w2 ON v.annotator = w2.annotator AND v.lbl = w2.lbl GROUP BY v.doc_id, v.lbl),
        | c2 AS (SELECT doc_id, lbl, sc FROM (
        |    SELECT doc_id, lbl, sc, row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, lbl ASC) rn FROM s2) WHERE rn = 1),
        | m AS (SELECT doc_id, lbl AS maj_label, CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT) n_votes,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, lbl ASC) rn FROM c0c)
        |SELECT m.doc_id, m.maj_label, c2.lbl AS ds_label, c2.sc AS ds_score_e4, m.n_votes
        |FROM m JOIN c2 USING (doc_id) WHERE m.rn = 1""".stripMargin,

    "q189_annotator_audit" ->
      """WITH v AS (SELECT doc_id, CAST(j AS INTEGER) annotator,
        |    CASE WHEN (CAST(('0x'||substr(md5('an:' || CAST(j AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 10) < j
        |      THEN 'zz' ELSE lang END lbl
        |  FROM documents, (SELECT unnest(range(5)) j)),
        | c AS (SELECT doc_id, lbl, CAST(count(*) AS BIGINT) cnt FROM v GROUP BY doc_id, lbl),
        | r AS (SELECT doc_id, lbl, cnt,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, lbl ASC) rn FROM c),
        | maj AS (SELECT doc_id, lbl AS maj_label FROM r WHERE rn = 1)
        |SELECT annotator, CAST(count(*) AS BIGINT) AS n_votes,
        | CAST(sum(CASE WHEN v.lbl = maj.maj_label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
        | CAST((sum(CASE WHEN v.lbl = maj.maj_label THEN 1 ELSE 0 END) * 10000) // count(*) AS BIGINT) AS agree_e4
        |FROM v JOIN maj ON v.doc_id = maj.doc_id
        |GROUP BY annotator""".stripMargin,

    // q187: JSONL ingest — good lines parse field-exact, planted garbage
    // lands in quarantine with its raw text hash-bound; both populations
    // predicted structurally
    "q187_jsonl_ingest" ->
      """WITH good AS (SELECT doc_id, lang, n_chars, source, FALSE AS corrupt,
        |    CAST(('0x'||substr(md5(''),1,15)) AS BIGINT) AS corrupt_h
        |  FROM documents WHERE doc_id % 19 <> 0),
        | bad AS (SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS lang,
        |    CAST(NULL AS BIGINT) AS n_chars, CAST(NULL AS VARCHAR) AS source, TRUE AS corrupt,
        |    CAST(('0x'||substr(md5('{broken json line ' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS corrupt_h
        |  FROM documents WHERE doc_id % 19 = 0)
        |SELECT * FROM good UNION ALL SELECT * FROM bad""".stripMargin,

    // q186: k-anonymity — level choice (per-level min group size vs k)
    // and the generalized publish re-derived, group sizes included
    "q186_k_anonymity" ->
      """WITH m0 AS (SELECT min(cnt) m FROM (SELECT count(*) cnt FROM customer
        |    GROUP BY c_nationkey, floor(c_acctbal/100))),
        | m1 AS (SELECT min(cnt) m FROM (SELECT count(*) cnt FROM customer
        |    GROUP BY c_nationkey // 5, floor(c_acctbal/1000))),
        | m2 AS (SELECT min(cnt) m FROM (SELECT count(*) cnt FROM customer
        |    GROUP BY floor(c_acctbal/5000))),
        | lvl AS (SELECT CASE WHEN (SELECT m FROM m0) >= 10 THEN 0
        |    WHEN (SELECT m FROM m1) >= 10 THEN 1
        |    WHEN (SELECT m FROM m2) >= 10 THEN 2 ELSE 3 END l),
        | gen AS (SELECT c_custkey,
        |    CAST(CASE l WHEN 0 THEN c_nationkey WHEN 1 THEN c_nationkey // 5 ELSE -1 END AS BIGINT) gen_nation,
        |    CAST(CASE l WHEN 0 THEN floor(c_acctbal/100)*100 WHEN 1 THEN floor(c_acctbal/1000)*1000
        |      WHEN 2 THEN floor(c_acctbal/5000)*5000 ELSE -1 END AS BIGINT) gen_bal,
        |    CAST(l AS INTEGER) gen_level
        |  FROM customer CROSS JOIN lvl)
        |SELECT c_custkey, gen_nation, gen_bal, gen_level,
        | CAST(count(*) OVER (PARTITION BY gen_nation, gen_bal) AS BIGINT) AS group_n
        |FROM gen""".stripMargin,

    // q184: materialized packed sequences — q101's recursive greedy pack
    // replayed, then the exact <eos>-joined member text hashed per bin
    "q184_packed_sequences" ->
      s"""WITH RECURSIVE toks AS (SELECT doc_id, text, CAST(len($tokensExpr) AS INTEGER) n,
         |    CAST(doc_id % 8 AS INTEGER) shard FROM documents),
         | ord AS (SELECT doc_id, text, n, shard, row_number() OVER (PARTITION BY shard ORDER BY doc_id) rn FROM toks),
         | pack AS (
         |   SELECT doc_id, text, n, shard, rn, CAST(0 AS BIGINT) bin_id, CAST(n AS BIGINT) fill
         |   FROM ord WHERE rn = 1
         |   UNION ALL
         |   SELECT o.doc_id, o.text, o.n, o.shard, o.rn,
         |     CASE WHEN p.fill + o.n > 512 AND p.fill > 0 THEN p.bin_id + 1 ELSE p.bin_id END,
         |     CASE WHEN p.fill + o.n > 512 AND p.fill > 0 THEN CAST(o.n AS BIGINT) ELSE p.fill + o.n END
         |   FROM pack p JOIN ord o ON o.shard = p.shard AND o.rn = p.rn + 1)
         |SELECT CAST(shard AS BIGINT) AS shard, bin_id,
         | CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens,
         | CAST(('0x'||substr(md5(array_to_string(list(text ORDER BY doc_id), ' <eos> ')),1,15)) AS BIGINT) AS packed_h
         |FROM pack GROUP BY shard, bin_id""".stripMargin,

    // q185: importance sampling — the q143 scoring chain, the clamp
    // weight mapping, and the md5(seed:id) acceptance replayed exactly
    "q185_importance_sample" ->
      s"""WITH base AS (SELECT doc_id, source, $tokensExpr ws FROM documents),
         | f AS (SELECT doc_id, source,
         |   list_concat(ws, CASE WHEN len(ws) < 2 THEN CAST([] AS VARCHAR[])
         |     ELSE list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) END) feats
         |  FROM base),
         | sc AS (SELECT doc_id, source, CAST(len(feats) AS BIGINT) n_feats,
         |   CAST(COALESCE(list_sum(list_transform(feats,
         |     w -> ((CAST(('0x'||substr(md5(w),1,15)) AS BIGINT) % 4096) * 2654435761) % 2001 - 1000)), 0) AS BIGINT) wsum
         |  FROM f),
         | wt AS (SELECT doc_id, source,
         |   greatest(CAST(0 AS BIGINT), least(CAST(10000 AS BIGINT),
         |     5000 + (CASE WHEN n_feats = 0 THEN 0
         |       ELSE CAST(FLOOR(CAST(wsum AS DOUBLE) * 10000.0e0 / n_feats) AS BIGINT) END) // 1000)) w_e4
         |  FROM sc)
         |SELECT doc_id, source, w_e4 FROM wt
         |WHERE (CAST(('0x'||substr(md5('is0:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 10000) < w_e4""".stripMargin,

    // q183: T5 span corruption — indicator chain, sentinel numbering and
    // both reassembled sequences re-derived exactly (RNG-free by design)
    "q183_span_corruption" ->
      s"""WITH toks AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | st AS (SELECT doc_id, ws, unnest(range(0, (len(ws)+2)//3)) sp FROM toks WHERE len(ws) > 0),
         | sl AS (SELECT doc_id, CAST(sp AS BIGINT) sp,
         |    array_to_string(list_slice(ws, CAST(sp*3+1 AS INTEGER), CAST(least(sp*3+3, len(ws)) AS INTEGER)), ' ') stext,
         |    (CAST(('0x'||substr(md5('sc0:' || CAST(doc_id AS VARCHAR) || ':' || CAST(sp AS VARCHAR)),1,15)) AS BIGINT) % 10000) < 3000 masked
         |  FROM st),
         | idx AS (SELECT doc_id, sp, stext, masked,
         |    CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY sp ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) k
         |  FROM sl),
         | e AS (SELECT doc_id, sp, masked,
         |    CASE WHEN masked THEN '<extra_id_' || CAST(k AS VARCHAR) || '>' ELSE stext END in_elem,
         |    CASE WHEN masked THEN '<extra_id_' || CAST(k AS VARCHAR) || '> ' || stext END tg_elem
         |  FROM idx)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         | CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
         | array_to_string(list(in_elem ORDER BY sp), ' ') AS input_text,
         | COALESCE(array_to_string(list(tg_elem ORDER BY sp) FILTER (WHERE masked), ' '), '') AS target_text
         |FROM e GROUP BY doc_id""".stripMargin,

    // q180: deterministic epoch shuffle — both epochs' (shard, pos)
    // re-derived from the identical portable hash chain, RNG-free
    "q180_epoch_shuffle" ->
      """WITH k AS (SELECT doc_id, e.epoch,
        |    CAST(('0x'||substr(md5('ep' || CAST(e.epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) k
        |  FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e)
        |SELECT doc_id, CAST(k % 8 AS INTEGER) AS shard,
        | CAST(row_number() OVER (PARTITION BY epoch, k % 8 ORDER BY k, doc_id) - 1 AS BIGINT) AS pos,
        | CAST(epoch AS INTEGER) AS epoch
        |FROM k""".stripMargin,

    // q178/q179: HTML extraction — both engines construct the IDENTICAL
    // fixture HTML, then the oracle replays the exact extraction rule
    // chain (same regexes, same order, amp-last entity decode) in DuckDB
    "q178_html_text" ->
      s"""WITH h AS (SELECT doc_id,
        |$htmlFixtureSql
        | FROM documents),
        |$htmlChainSql
        |SELECT doc_id, title, txt,
        | CAST(CASE WHEN len(trim(txt))=0 THEN 0 ELSE len(string_split_regex(trim(txt),'\\s+')) END AS BIGINT) AS n_tokens
        |FROM ti""".stripMargin,

    "q179_html_links" ->
      s"""WITH h AS (SELECT doc_id,
        |$htmlFixtureSql
        | FROM documents),
        | l AS (SELECT doc_id,
        |    list_filter(regexp_extract_all(html, '(?i)href\\s*=\\s*["'']([^"'']+)["'']', 1), x -> x NOT LIKE '#%') ls
        |  FROM h),
        | e AS (SELECT doc_id, ls, unnest(range(len(ls))) i FROM l WHERE len(ls) > 0)
        |SELECT doc_id, CAST(i AS INTEGER) AS pos, ls[CAST(i+1 AS INTEGER)] AS url,
        | lower(regexp_extract(ls[CAST(i+1 AS INTEGER)], '(?i)^https?://([^/:?#]+)', 1)) AS host
        |FROM e""".stripMargin,

    // q177: Avro roundtrip — the aggregate recomputed from the original
    // parquet; any loss in the container encode/decode (timestamp micros,
    // decimal bytes, date, nullable union) breaks the hash
    "q177_avro_roundtrip" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(sum(CASE WHEN o_orderkey % 50 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_pri,
        | CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents,
        | CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS max_ts_us,
        | CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) AS min_date
        |FROM orders GROUP BY 1""".stripMargin,

    // q176: line-level dedup — the doomed set (corpus occurrence count
    // > 2) and the per-document reassembled text are both re-derived
    // exactly; hash parity with the engine's Md5Prefix60 line keys
    "q176_line_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | st AS (SELECT doc_id, ws, unnest(range(0, (len(ws)+2)//3)) i FROM toks WHERE len(ws) > 0),
         | l AS (SELECT doc_id, CAST(i AS INTEGER) pos,
         |    array_to_string(list_slice(ws, CAST(i*3+1 AS INTEGER), CAST(least(i*3+3, len(ws)) AS INTEGER)), ' ') line
         |  FROM st),
         | h AS (SELECT doc_id, pos, line, CAST(('0x'||substr(md5(line),1,15)) AS BIGINT) h FROM l),
         | doomed AS (SELECT h FROM h GROUP BY h HAVING count(*) > 2),
         | m AS (SELECT a.doc_id, a.pos, a.line, (d.h IS NOT NULL) dm
         |   FROM h a LEFT JOIN doomed d ON a.h = d.h),
         | agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_lines,
         |    CAST(sum(CASE WHEN dm THEN 1 ELSE 0 END) AS BIGINT) n_dropped,
         |    array_to_string(list(line ORDER BY pos) FILTER (WHERE NOT dm), chr(10)) new_text
         |  FROM m GROUP BY doc_id)
         |SELECT doc_id, n_lines, n_lines - n_dropped AS n_kept, n_dropped,
         | COALESCE(new_text, '') AS new_text
         |FROM agg""".stripMargin,

    // q172: incremental join-view maintenance — the maintained view must
    // equal the full join recomputed at the to-versions (fact side: the
    // b2-wins active derivation; dimension side: the segment-update rule)
    "q172_join_mv" ->
      """WITH b1 AS (SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |    SELECT o_custkey, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |    FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00') WHERE rn = 1),
        | b2 AS (SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |    SELECT o_custkey, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00') WHERE rn = 1),
        | a2 AS (SELECT * FROM b2 UNION ALL
        |        SELECT * FROM b1 WHERE o_custkey NOT IN (SELECT o_custkey FROM b2)),
        | d2 AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'UPDATED' ELSE c_mktsegment END c_mktsegment
        |   FROM customer)
        |SELECT a2.o_custkey, a2.o_orderkey, a2.o_totalprice, d2.c_mktsegment
        |FROM a2 JOIN d2 ON a2.o_custkey = d2.c_custkey""".stripMargin,

    // q111: stream-static enrichment — batch left join over the bounded
    // replay (the streaming run must converge to it exactly; stateless,
    // so no watermark precondition applies)
    "q111_stream_enrich" ->
      """SELECT user_id, event_id, event_type, value, c_mktsegment, c_nationkey
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |WHERE event_type IN ('click','purchase')""".stripMargin,

    // q112: blocked fuzzy match over the compacted name dictionary —
    // same min-key compaction, same blocking key (second name token),
    // same standard Levenshtein metric on both engines
    "q112_fuzzy_match" ->
      """WITH d AS (SELECT CAST(min(p_partkey) AS BIGINT) AS pid, p_name AS pname FROM part GROUP BY p_name),
        | p AS (SELECT pid, pname, split_part(pname, ' ', 2) AS blk FROM d)
        |SELECT a.pid id_a, b.pid id_b, a.pname name_a, b.pname name_b,
        |  CAST(levenshtein(a.pname, b.pname) AS INTEGER) dist
        |FROM p a JOIN p b ON a.blk = b.blk AND a.pid < b.pid
        |WHERE levenshtein(a.pname, b.pname) <= 2""".stripMargin,

    // q113: heavy hitters — oracle replays the exact top-20 and pins the
    // deterministic (fixed-seed) CMS bound check to literal TRUE
    "q113_heavy_hitters" ->
      s"""WITH toks AS (SELECT $tokensExpr ws FROM documents),
         | tok AS (SELECT unnest(ws) token FROM toks),
         | cnt AS (SELECT token, CAST(count(*) AS BIGINT) exact_cnt FROM tok GROUP BY token)
         |SELECT token, exact_cnt, TRUE est_ok
         |FROM cnt ORDER BY exact_cnt DESC, token ASC LIMIT 20""".stripMargin,

    // q125: mergeable HLL sketches — oracle recomputes the exact side
    // (n_shards = distinct doc_id%8 present per source) and pins the
    // 5%-bound audit TRUE; a sketch-estimate violation hash-fails
    "q125_hll_sketch" ->
      """SELECT source,
        | CAST(count(DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) AS BIGINT) AS exact_distinct,
        | CAST(count(DISTINCT doc_id % 8) AS BIGINT) AS n_shards,
        | TRUE AS est_ok
        |FROM documents GROUP BY source""".stripMargin,

    // q126: near-dup-aware split — q88's recursive-CTE components,
    // singletons fall back to their own id, then q121's bucket replay
    "q126_neardup_split" ->
      s"""WITH RECURSIVE $simhash60Ctes,
         | e AS (SELECT a.doc_id ia, b.doc_id ib
         |   FROM s a JOIN s b ON a.doc_id < b.doc_id
         |   WHERE bit_count(xor(a.sk60, b.sk60)) <= 4),
         | sym AS (SELECT ia a, ib b FROM e UNION SELECT ib, ia FROM e),
         | reach(id, r) AS (
         |   SELECT a, a FROM sym
         |   UNION
         |   SELECT sym.a, reach.r FROM sym JOIN reach ON reach.id = sym.b
         | ),
         | comp AS (SELECT id, min(r) lbl FROM reach GROUP BY id),
         | g AS (SELECT d.doc_id, coalesce(c.lbl, d.doc_id) group_id
         |   FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         | bk AS (SELECT *, CAST(('0x'||substr(md5(CAST(group_id AS VARCHAR)||'split'),1,15)) AS BIGINT) % 10 b FROM g)
         |SELECT doc_id, group_id,
         | CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val' ELSE 'test' END AS split
         |FROM bk""".stripMargin,

    // q127: point-in-time lookup — both probe instants replayed
    // relationally (2001-06-01 sees batch-1 rows, still-open or since
    // closed; 2002-06-01 sees unsuperseded batch-1 rows plus batch 2)
    "q127_pit_lookup" ->
      """WITH w1 AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        | b1 AS (SELECT o_custkey, o_orderkey, o_orderdate FROM w1 WHERE rn = 1),
        | w2 AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
        | b2 AS (SELECT o_custkey, o_orderkey, o_orderdate FROM w2 WHERE rn = 1),
        | only_b1 AS (SELECT * FROM b1 WHERE o_custkey NOT IN (SELECT o_custkey FROM b2))
        |SELECT o_custkey, TIMESTAMP '2001-06-01 00:00:00' AS probe_ts, o_orderkey, o_orderdate FROM b1
        |UNION ALL
        |SELECT o_custkey, TIMESTAMP '2002-06-01 00:00:00', o_orderkey, o_orderdate FROM only_b1
        |UNION ALL
        |SELECT o_custkey, TIMESTAMP '2002-06-01 00:00:00', o_orderkey, o_orderdate FROM b2""".stripMargin,

    // q116: fixed-point PageRank — 5 unrolled iterations over the
    // distinct supplier co-occurrence edges; contributions are BIGINT
    // floor divisions, so the replay is bit-exact (see pageRankSql)
    "q116_pagerank" -> pageRankSql(iters = 5),

    // q117: gap fill + LOCF — DuckDB densifies with generate_series and
    // carries with last_value IGNORE NULLS; the span starts at each
    // user's first observed day so the fill is total
    "q117_gapfill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS cents,
        |    count(*) AS n_events
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        | spans AS (SELECT user_id, min(day) d0, max(day) d1 FROM daily GROUP BY 1),
        | grid AS (SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM spans),
        | j AS (SELECT g.user_id, g.day, d.cents, coalesce(d.n_events, 0) AS n_events
        |   FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day)
        |SELECT user_id, day,
        | last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_locf,
        | n_events, cents IS NULL AS is_gap
        |FROM j""".stripMargin,

    // q118: ordered funnel — each CTE is the per-user earliest completion
    // of its step strictly after the previous step's timestamp
    "q118_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) t FROM events WHERE event_type = 'signup' GROUP BY 1),
        | s2 AS (SELECT e.user_id, min(e.ts) t FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |   WHERE e.event_type = 'view' GROUP BY 1),
        | s3 AS (SELECT e.user_id, min(e.ts) t FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |   WHERE e.event_type = 'click' GROUP BY 1),
        | s4 AS (SELECT e.user_id, min(e.ts) t FROM events e JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
        |   WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT CAST(1 AS INTEGER) AS step, 'signup' AS step_name, count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'view', count(*) FROM s2
        |UNION ALL SELECT 3, 'click', count(*) FROM s3
        |UNION ALL SELECT 4, 'purchase', count(*) FROM s4""".stripMargin,

    // q119: incremental MV maintenance — the oracle recomputes the
    // to-version view relationally (global latest order per custkey = the
    // v2 active snapshot, see q106's derivation), proving the
    // feed-maintained view equals a full recompute
    "q119_incremental_mv" ->
      """WITH latest AS (SELECT o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |  FROM orders)
        |SELECT CAST(year(o_orderdate) AS BIGINT) AS view_key, count(*) AS n_rows,
        | CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS cents
        |FROM latest WHERE rn = 1 GROUP BY 1""".stripMargin,

    // q120: binned range join — the oracle runs the PLAIN non-equi
    // containment join; hash equality proves the bin blocking is exact
    "q120_range_join" ->
      """WITH p AS (SELECT l_shipdate, l_quantity FROM lineitem
        |   WHERE l_returnflag = 'R' AND l_quantity >= 48),
        | i AS (SELECT o_orderkey, o_orderdate, o_orderdate + INTERVAL 7 DAY AS end_ts FROM orders
        |   WHERE o_orderpriority = '1-URGENT'
        |     AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-03-01')
        |SELECT i.o_orderkey, count(*) AS n_points,
        | CAST(sum(CAST(CAST(p.l_quantity AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM p JOIN i ON p.l_shipdate >= i.o_orderdate AND p.l_shipdate < i.end_ts
        |GROUP BY 1""".stripMargin,

    // q121: leakage-safe split — q30's normalized fingerprint, min-id
    // representative per group, md5-prefix bucket of the representative
    "q121_leakage_split" ->
      """WITH f AS (SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
        |   FROM documents),
        | r AS (SELECT doc_id, fingerprint, min(doc_id) OVER (PARTITION BY fingerprint) AS rep_id FROM f),
        | b AS (SELECT *, CAST(('0x'||substr(md5(CAST(rep_id AS VARCHAR)||'split'),1,15)) AS BIGINT) % 10 AS bk FROM r)
        |SELECT doc_id, fingerprint, rep_id,
        | CASE WHEN bk < 8 THEN 'train' WHEN bk < 9 THEN 'val' ELSE 'test' END AS split
        |FROM b""".stripMargin,

    // q122: cohort retention — distinct activity days joined back to the
    // per-user first day
    "q122_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        | coh AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
        |SELECT cohort_day, CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
        | count(*) AS n_users
        |FROM act JOIN coh USING (user_id) GROUP BY 1, 2""".stripMargin,

    // q123: CUBE with grouping id — both engines emit the same bitmask
    // (first listed column = most significant bit)
    "q123_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS n_lines
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    // q124: trailing-7-day RANGE frame over the daily series — integer
    // cents, exact floor-division average
    "q124_moving_agg" ->
      """WITH daily AS (SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS cents,
        |    date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS day_num
        |  FROM lineitem GROUP BY 1, 2, 4)
        |SELECT l_returnflag, day, cents,
        | CAST(sum(cents) OVER w AS BIGINT) AS cents_7d,
        | count(*) OVER w AS n_days_7d,
        | CAST(sum(cents) OVER w AS BIGINT) // (count(*) OVER w) AS avg_cents_7d
        |FROM daily WINDOW w AS (PARTITION BY l_returnflag ORDER BY day_num
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    // q128: image near-dup by perceptual dHash — the oracle replays the
    // fixture arithmetic (binary cell pattern + planted flip), the integer
    // block-average (2x2 px blocks of one gray value -> the cell value
    // itself), the 56-bit difference hash, and a plain all-pairs Hamming
    // filter; the engine's pigeonhole banding is an exact-recall filter,
    // so banded output = threshold output (q65's adjudication). The
    // engine must actually decode every PNG to reach the same pairs.
    "q128_image_neardup" ->
      """WITH s AS (SELECT CAST(p_partkey AS BIGINT) id,
        |    CAST(p_partkey % 10 AS BIGINT) cls,
        |    CAST((p_partkey // 10) % 63 AS BIGINT) flip
        |  FROM part WHERE p_partkey <= 300 AND p_partkey % 17 <> 0),
        | cells AS (SELECT id, r, c,
        |    CASE WHEN (((cls*31 + r*7 + c*13) % 97) % 2 = 1) <> (r = flip // 9 AND c = flip % 9)
        |         THEN 200 ELSE 50 END AS v
        |   FROM s, range(7) tr(r), range(9) tc(c)),
        | bits AS (SELECT a.id, a.r, a.c,
        |    CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bt
        |   FROM cells a JOIN cells b ON a.id = b.id AND a.r = b.r AND b.c = a.c + 1
        |   WHERE a.c < 8),
        | h AS (SELECT id, CAST(sum(bt * (CAST(1 AS BIGINT) << CAST(r*8 + c AS INTEGER))) AS BIGINT) AS dh
        |   FROM bits GROUP BY id)
        |SELECT a.id AS id_a, b.id AS id_b, CAST(bit_count(xor(a.dh, b.dh)) AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.id < b.id
        |WHERE bit_count(xor(a.dh, b.dh)) <= 3""".stripMargin,

    // q129: Bloom decontamination — the oracle replays the deterministic
    // double-hash probe positions (odd step, power-of-two m) in BIGINT
    // arithmetic: benchmark n-grams define the set-bit relation, a corpus
    // n-gram is flagged iff ALL 3 of its probe positions are set (the 3
    // positions are provably distinct, so count(*) = 3 <=> membership).
    // False positives reproduce identically on both sides.
    "q129_bloom_decontam" ->
      s"""WITH base AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | sh AS (SELECT doc_id,
         |   list_distinct(list_transform(
         |     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
         |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
         |     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) sh
         |  FROM base),
         | bp AS (SELECT DISTINCT unnest(sh) h FROM sh WHERE doc_id % 10 = 0),
         | bbits AS (SELECT DISTINCT (h % 262144 + i * (1 + 2*((h // 262144) % 131072))) % 262144 AS p
         |   FROM bp, range(3) ti(i)),
         | cp AS (SELECT doc_id, unnest(sh) h FROM sh WHERE doc_id % 10 <> 0),
         | cpos AS (SELECT doc_id, h, (h % 262144 + i * (1 + 2*((h // 262144) % 131072))) % 262144 AS p
         |   FROM cp, range(3) ti(i)),
         | hits AS (SELECT doc_id, h FROM cpos JOIN bbits USING (p) GROUP BY doc_id, h HAVING count(*) = 3),
         | agg AS (SELECT doc_id, count(*) AS n_ngrams FROM cp GROUP BY doc_id),
         | fl AS (SELECT doc_id, count(*) AS n_flagged FROM hits GROUP BY doc_id)
         |SELECT agg.doc_id, agg.n_ngrams, coalesce(fl.n_flagged, 0) AS n_flagged,
         | coalesce(fl.n_flagged, 0) >= 2 AS contaminated
         |FROM agg LEFT JOIN fl USING (doc_id)""".stripMargin,

    // q110: MJPEG-AVI frame decode — the oracle replays the fixture
    // arithmetic (dims, frame counts, planted truncation) as a structural
    // per-frame explosion; the engine must actually walk the RIFF and
    // decode every JPEG to produce the same rows. Luma is spec-only
    // (JPEG rounding is not SQL-replayable).
    "q110_video_frames" ->
      """WITH ids AS (SELECT CAST(p_partkey AS BIGINT) media_id FROM part WHERE p_partkey <= 200),
        | spec AS (SELECT media_id,
        |    CAST(16*(media_id % 3 + 1) AS INTEGER) w,
        |    CAST(16*(media_id % 2 + 1) AS INTEGER) h,
        |    CAST(media_id % 4 + 1 AS INTEGER) nf FROM ids)
        |SELECT media_id, CAST(unnest(range(nf)) AS INTEGER) frame_idx, w width, h height, TRUE ok
        |FROM spec WHERE media_id % 17 <> 0
        |UNION ALL
        |SELECT media_id, CAST(-1 AS INTEGER), CAST(-1 AS INTEGER), CAST(-1 AS INTEGER), FALSE
        |FROM spec WHERE media_id % 17 = 0""".stripMargin,

    // q109: batch BM25 — three probe queries in one pass; per-query scoring
    // replays q103's expression tree exactly (df per token is independent
    // of the union term filter), ranked per query_id to depth 25
    "q109_bm25_batch" ->
      s"""WITH queries(query_id, token) AS (VALUES
         |   (0,'vector'),(0,'merge'),(0,'stream'),
         |   (1,'join'),(1,'hash'),(1,'row'),
         |   (2,'window'),(2,'spark'),(2,'filter')),
         | toks AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) dl FROM toks),
         | stats AS (SELECT count(*) n_docs, CAST(sum(dl) AS BIGINT) sum_dl FROM lens),
         | postings AS (SELECT doc_id, token, count(*) tf
         |   FROM (SELECT doc_id, unnest(ws) token FROM toks)
         |   WHERE token IN (SELECT DISTINCT token FROM queries) GROUP BY doc_id, token),
         | dfreq AS (SELECT token, count(*) df FROM postings GROUP BY token),
         | tscore AS (SELECT p.doc_id, p.token,
         |    CAST(FLOOR(1000000.0e0 * ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0) / (CAST(df AS DOUBLE) + 0.5e0) + 1.0e0)) AS BIGINT)
         |  * CAST(FLOOR(1000000.0e0 * (CAST(tf AS DOUBLE) * 2.25e0 / (CAST(tf AS DOUBLE) + 1.25e0 * (1.0e0 - 0.75e0 + 0.75e0 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS BIGINT) term_score_e12
         |   FROM postings p JOIN dfreq d ON p.token = d.token
         |   JOIN lens l ON p.doc_id = l.doc_id CROSS JOIN stats),
         | scored AS (SELECT CAST(q.query_id AS BIGINT) query_id, t.doc_id,
         |    CAST(sum(term_score_e12) AS BIGINT) bm25_e12, count(*) n_terms_hit
         |   FROM tscore t JOIN queries q USING (token) GROUP BY 1, 2),
         | ranked AS (SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY bm25_e12 DESC, doc_id ASC) AS BIGINT) rank FROM scored)
         |SELECT query_id, doc_id, bm25_e12, n_terms_hit, rank
         |FROM ranked WHERE rank <= 25""".stripMargin,

    // q105: substring-level exact dedup — sliding 8-token windows, grams
    // occurring >1 time corpus-wide removed, overlapping/touching
    // occurrences merged into maximal spans per doc, retained text =
    // surviving tokens joined by ' ' (md5-fingerprinted; md5('') for
    // fully-removed or empty docs). Engine verifies duplicate grams by
    // STRING (hash is only a shuffle-narrowing prefilter), so grouping by
    // the gram string here replays the identical result.
    "q105_substring_dedup" ->
      """WITH toks AS (SELECT doc_id, CASE WHEN len(trim(text))=0 THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text),'\s+') END ws FROM documents),
        | grams AS (SELECT doc_id, x.s AS start_pos, x.g AS gram FROM (
        |   SELECT doc_id, unnest(list_transform(range(greatest(len(ws) - 8 + 1, 0)), i -> struct_pack(s := i, g := array_to_string(list_slice(ws, i + 1, i + 8), ' ')))) x FROM toks)),
        | dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > 1),
        | occ AS (SELECT doc_id, start_pos, start_pos + 8 AS end_pos FROM grams JOIN dup USING (gram)),
        | isl AS (SELECT doc_id, start_pos, end_pos, CASE WHEN start_pos > coalesce(max(end_pos) OVER (PARTITION BY doc_id ORDER BY start_pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END brk FROM occ),
        | isl2 AS (SELECT doc_id, start_pos, end_pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY start_pos ROWS UNBOUNDED PRECEDING) island FROM isl),
        | spans AS (SELECT doc_id, island, min(start_pos) s, max(end_pos) e FROM isl2 GROUP BY doc_id, island),
        | spanstats AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_spans, CAST(sum(e - s) AS BIGINT) removed FROM spans GROUP BY doc_id),
        | pos AS (SELECT doc_id, unnest(ws) tok, unnest(range(len(ws))) p FROM toks),
        | rem AS (SELECT DISTINCT pos.doc_id, pos.p FROM pos JOIN spans ON pos.doc_id = spans.doc_id AND pos.p >= spans.s AND pos.p < spans.e),
        | kept AS (SELECT pos.doc_id, pos.p, pos.tok FROM pos ANTI JOIN rem ON pos.doc_id = rem.doc_id AND pos.p = rem.p),
        | ret AS (SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY p)) retained_md5 FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(ws) AS BIGINT) n_tokens,
        |  coalesce(n_spans, CAST(0 AS BIGINT)) n_spans,
        |  coalesce(removed, CAST(0 AS BIGINT)) removed_tokens,
        |  CAST(len(ws) AS BIGINT) - coalesce(removed, CAST(0 AS BIGINT)) kept_tokens,
        |  coalesce(retained_md5, md5('')) retained_md5
        |FROM toks t LEFT JOIN spanstats USING (doc_id) LEFT JOIN ret USING (doc_id)""".stripMargin,

    // q107: hybrid retrieval — BM25 (q103's expression tree, depth 100)
    // and ordered-fold cosine vs vec 42 (q40's tree, self excluded) fused
    // by RRF: floor(1e9/(60+rank)) long contributions, exact integer sum
    "q107_hybrid_rrf" ->
      s"""WITH toks AS (SELECT doc_id, $tokensExpr ws FROM documents),
         | lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) dl FROM toks),
         | stats AS (SELECT count(*) n_docs, CAST(sum(dl) AS BIGINT) sum_dl FROM lens),
         | postings AS (SELECT doc_id, token, count(*) tf
         |   FROM (SELECT doc_id, unnest(ws) token FROM toks)
         |   WHERE token IN ('vector','merge','stream') GROUP BY doc_id, token),
         | dfreq AS (SELECT token, count(*) df FROM postings GROUP BY token),
         | scored AS (SELECT p.doc_id,
         |    CAST(FLOOR(1000000.0e0 * ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0) / (CAST(df AS DOUBLE) + 0.5e0) + 1.0e0)) AS BIGINT)
         |  * CAST(FLOOR(1000000.0e0 * (CAST(tf AS DOUBLE) * 2.25e0 / (CAST(tf AS DOUBLE) + 1.25e0 * (1.0e0 - 0.75e0 + 0.75e0 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))) AS BIGINT) term_score_e12
         |   FROM postings p JOIN dfreq d ON p.token = d.token
         |   JOIN lens l ON p.doc_id = l.doc_id CROSS JOIN stats),
         | bm AS (SELECT doc_id, CAST(sum(term_score_e12) AS BIGINT) bm25_e12 FROM scored GROUP BY doc_id),
         | lexr AS (SELECT * FROM (SELECT doc_id id, CAST(row_number() OVER (ORDER BY bm25_e12 DESC, doc_id ASC) AS BIGINT) r FROM bm) WHERE r <= 100),
         | q AS (SELECT embedding qe FROM embeddings WHERE vec_id = 42),
         | pairs AS (SELECT e.vec_id, unnest(e.embedding) x, unnest(q.qe) y, unnest(range(64)) i
         |   FROM embeddings e, q WHERE e.vec_id <> 42),
         | dots AS (SELECT vec_id,
         |    sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) d,
         |    sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) ORDER BY i) nx,
         |    sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) ny
         |  FROM pairs GROUP BY vec_id),
         | cos AS (SELECT vec_id, CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END c FROM dots),
         | semr AS (SELECT * FROM (SELECT vec_id id, CAST(row_number() OVER (ORDER BY c DESC, vec_id ASC) AS BIGINT) r FROM cos) WHERE r <= 100)
         |SELECT coalesce(l.id, s.id) id,
         |  coalesce(CAST(FLOOR(1000000000.0e0/(60+l.r)) AS BIGINT), 0) + coalesce(CAST(FLOOR(1000000000.0e0/(60+s.r)) AS BIGINT), 0) AS rrf_e9,
         |  CAST((CASE WHEN l.id IS NULL THEN 0 ELSE 1 END) + (CASE WHEN s.id IS NULL THEN 0 ELSE 1 END) AS BIGINT) n_systems,
         |  l.r AS lex_rank, s.r AS sem_rank
         |FROM lexr l FULL JOIN semr s ON l.id = s.id
         |ORDER BY rrf_e9 DESC, id ASC LIMIT 25""".stripMargin,

    // q96: SQ8 asymmetric ANN — replay quantization (maxabs, scale =
    // maxabs/127, round-half-up int8 codes) and the index-ordered
    // query×codes fold; the engine must produce identical scores from its
    // packed 1-byte binary codes
    "q96_ann_sq8" ->
      """WITH q AS (SELECT embedding qe FROM embeddings WHERE vec_id=0),
        | m AS (SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) ma
        |  FROM embeddings WHERE vec_id <> 0),
        | pairs AS (SELECT m.vec_id, m.ma, unnest(m.embedding) x, unnest(q.qe) y, unnest(range(64)) i
        |   FROM m, q),
        | dots AS (SELECT vec_id,
        |    sum(CAST(y AS DOUBLE) *
        |        (CASE WHEN ma = 0 THEN 0.0
        |         ELSE CAST(FLOOR(CAST(x AS DOUBLE) / (ma / 127.0) + 0.5) AS DOUBLE) END)
        |        ORDER BY i) d,
        |    any_value(ma) ma
        |  FROM pairs GROUP BY vec_id),
        | sc AS (SELECT vec_id, d * (ma / 127.0) s FROM dots)
        |SELECT vec_id, CAST(FLOOR(s*1000000) AS BIGINT) AS score_e6
        |FROM sc ORDER BY s DESC, vec_id ASC LIMIT 20""".stripMargin,

    // q98: IVF + SQ8 composed — q72's cell assignment + probe CTEs select
    // the candidates, then q96's quantize + int8 asymmetric fold scores
    // exactly that set
    "q98_ann_ivf_sq8" ->
      """WITH c AS (SELECT vec_id cid, embedding ce FROM embeddings WHERE vec_id < 8),
        | cn AS (SELECT cid, sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) c2
        |   FROM (SELECT cid, unnest(ce) y, unnest(range(64)) i FROM c) GROUP BY cid),
        | ev AS (SELECT vec_id, unnest(embedding) x, unnest(range(64)) i FROM embeddings),
        | cv AS (SELECT cid, unnest(ce) y, unnest(range(64)) i FROM c),
        | vd AS (SELECT vec_id, cid, sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) d
        |   FROM ev JOIN cv USING (i) GROUP BY vec_id, cid),
        | scorev AS (SELECT vec_id, vd.cid, -2*d + c2 score FROM vd JOIN cn ON vd.cid = cn.cid),
        | assign AS (SELECT vec_id, cid FROM (
        |   SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) rn FROM scorev) WHERE rn = 1),
        | qprobe AS (SELECT cid FROM (
        |   SELECT cid, row_number() OVER (ORDER BY score, cid) rn FROM scorev WHERE vec_id = 0) WHERE rn <= 3),
        | cand AS (SELECT vec_id FROM assign WHERE cid IN (SELECT cid FROM qprobe) AND vec_id <> 0),
        | q AS (SELECT embedding qe FROM embeddings WHERE vec_id = 0),
        | m AS (SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) ma
        |  FROM embeddings WHERE vec_id IN (SELECT vec_id FROM cand)),
        | pairs2 AS (SELECT m.vec_id, m.ma, unnest(m.embedding) x, unnest(q.qe) y, unnest(range(64)) i
        |   FROM m, q),
        | dots2 AS (SELECT vec_id,
        |    sum(CAST(y AS DOUBLE) *
        |        (CASE WHEN ma = 0 THEN 0.0
        |         ELSE CAST(FLOOR(CAST(x AS DOUBLE) / (ma / 127.0) + 0.5) AS DOUBLE) END)
        |        ORDER BY i) d,
        |    any_value(ma) ma
        |  FROM pairs2 GROUP BY vec_id),
        | sc AS (SELECT vec_id, d * (ma / 127.0) s FROM dots2)
        |SELECT vec_id, CAST(FLOOR(s*1000000) AS BIGINT) AS score_e6
        |FROM sc ORDER BY s DESC, vec_id ASC LIMIT 20""".stripMargin,

    "q40_ann_bruteforce" ->
      """WITH q AS (SELECT embedding qe FROM embeddings WHERE vec_id=0),
        | pairs AS (SELECT e.vec_id, unnest(e.embedding) x, unnest(q.qe) y, unnest(range(64)) i
        |   FROM embeddings e, q WHERE e.vec_id <> 0),
        | dots AS (SELECT vec_id,
        |    sum(CAST(x AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) d,
        |    sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) ORDER BY i) nx,
        |    sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE) ORDER BY i) ny
        |  FROM pairs GROUP BY vec_id),
        | cos AS (SELECT vec_id, CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END c FROM dots)
        |SELECT vec_id, CAST(FLOOR(c*1000000) AS BIGINT) AS cosine_e6
        |FROM cos ORDER BY c DESC, vec_id ASC LIMIT 20""".stripMargin,

    // q70: the pipeline-golden probes recomputed straight from `orders` —
    // matching rows proves flatten naming, rule/path resolution, explode
    // semantics (empty list drops the row), F1/F2 conversions, the pipe-CSV
    // dialect, and the SCD-2 flip in one hash
    "q70_pipeline_golden" ->
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey <= 2000),
        | flat AS (SELECT 'flat' component, o_orderkey k1, 'geo0' k2,
        |   concat_ws(':',
        |     CASE WHEN o_orderkey % 3 >= 1 THEN o_orderpriority ELSE '-' END,
        |     CASE WHEN o_orderkey % 3 = 2 THEN 'REGION' ELSE '-' END,
        |     CASE WHEN o_orderkey % 2 = 1 THEN CAST(o_orderkey*100 AS VARCHAR) ELSE '-' END,
        |     CAST(year(o_orderdate) AS VARCHAR)) v
        |  FROM o),
        | geo AS (SELECT 'geo' component, o_orderkey k1, CAST(o_orderkey*10 + i AS VARCHAR) k2,
        |   concat_ws(':', CASE WHEN i = 0 THEN 'COUNTRY' ELSE 'REGION' END,
        |     CAST(o_orderkey AS VARCHAR), o_orderpriority) v
        |  FROM o CROSS JOIN (SELECT unnest([0, 1]) i) js WHERE i < o_orderkey % 3),
        | au AS (SELECT 'adunit' component, o_orderkey k1, CAST(o_orderkey*100 AS VARCHAR) k2,
        |   concat_ws(':', CASE WHEN o_orderstatus = 'O' THEN 'true' ELSE 'false' END, 'targetted') v
        |  FROM o WHERE o_orderkey % 2 = 1),
        | cf AS (SELECT 'cf' component, o_orderkey k1, '7' k2, o_orderpriority v FROM o),
        | base AS (SELECT o_orderkey, o_orderstatus, CAST(TRUNC(o_totalprice) AS BIGINT) tp,
        |    CAST(year(o_orderdate) AS VARCHAR) yr, CAST(month(o_orderdate) AS VARCHAR) mo,
        |    (o_orderkey % 7 = 0) in_batch FROM o),
        | scd AS (
        |  SELECT 'scd' component, o_orderkey k1, 'N:2024-06-02 00:00:00' k2,
        |    concat_ws(':', 'OLD', CAST(tp AS VARCHAR), yr, mo, '-', '2024-06-01 00:00:01') v
        |  FROM base WHERE in_batch
        |  UNION ALL
        |  SELECT 'scd', o_orderkey, 'Y:-',
        |    concat_ws(':', 'OLD', CAST(tp AS VARCHAR), yr, mo, '-', '2024-06-01 00:00:01')
        |  FROM base WHERE NOT in_batch
        |  UNION ALL
        |  SELECT 'scd', o_orderkey, 'Y:-',
        |    concat_ws(':', o_orderstatus, CAST(tp AS VARCHAR), yr, mo, '-', '2024-06-01 00:00:01')
        |  FROM base WHERE in_batch)
        |SELECT * FROM flat UNION ALL SELECT * FROM geo UNION ALL SELECT * FROM au
        |UNION ALL SELECT * FROM cf UNION ALL SELECT * FROM scd""".stripMargin,

    // q71: report-ingest golden — aligned ingest output recomputed from part
    "q71_report_ingest" ->
      """SELECT p_partkey,
        | CASE WHEN p_partkey % 5 = 0 THEN NULL
        |      ELSE CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) END AS retail_cents,
        | CAST(p_size AS INTEGER) AS size, '-' AS legacy_flag
        |FROM part""".stripMargin,

    "q42_multimodal_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id, 'text/plain' AS fmt,
        | CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        | CAST(FLOOR(1*octet_length(encode(text))/4) AS BIGINT) AS offset_1,
        | CAST(FLOOR(3*octet_length(encode(text))/4) AS BIGINT) AS offset_3
        |FROM documents""".stripMargin,

    "q43_event_windows" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
        | count(*) AS n_events,
        | CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,

    // identical oracle to q24: the streaming sessionizer must reproduce the
    // batch gap-session semantics exactly
    "q74_stream_sessions" ->
      """WITH e AS (SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) prev_ts FROM events),
        | f AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000 THEN 1 ELSE 0 END new_session FROM e),
        | g AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        | CAST(min(ts) AS TIMESTAMP) AS session_start, CAST(max(ts) AS TIMESTAMP) AS session_end,
        | CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS session_value_cents
        |FROM g GROUP BY user_id, session_id""".stripMargin,

    // q79: streaming delta-state — identical semantics to q12's oracle
    // (snapshot-miss passthrough preserved); only n_events is added
    "q79_stream_delta" ->
      """WITH cur AS (SELECT user_id,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) total_cents,
        |    count(*) n_events
        |  FROM events GROUP BY user_id),
        | snap AS (SELECT user_id,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) prev_total_cents
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id)
        |SELECT c.user_id, c.n_events,
        | CASE WHEN s.user_id IS NOT NULL THEN c.total_cents - COALESCE(s.prev_total_cents, 0)
        |      ELSE c.total_cents END AS delta_total_cents
        |FROM cur c LEFT JOIN snap s ON c.user_id = s.user_id""".stripMargin,

    // q80: partitioned SCD-2 load — final table recomputed relationally,
    // including the md5-prefix key bucket
    "q80_scd2_partitioned" ->
      """WITH w1 AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        | b1 AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM w1 WHERE rn = 1),
        | w2 AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
        | b2 AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM w2 WHERE rn = 1),
        | kb AS (SELECT DISTINCT o_custkey,
        |    CAST(('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,15)) AS BIGINT) % 16 key_bucket
        |  FROM orders)
        |SELECT b1.o_custkey, o_orderkey, o_orderdate, o_totalprice, key_bucket,
        |  'N' AS actv_flg, TIMESTAMP '2002-01-01 00:00:00' AS record_to
        |FROM b1 JOIN kb ON b1.o_custkey = kb.o_custkey
        |WHERE b1.o_custkey IN (SELECT o_custkey FROM b2)
        |UNION ALL
        |SELECT b1.o_custkey, o_orderkey, o_orderdate, o_totalprice, key_bucket,
        |  'Y', CAST(NULL AS TIMESTAMP)
        |FROM b1 JOIN kb ON b1.o_custkey = kb.o_custkey
        |WHERE b1.o_custkey NOT IN (SELECT o_custkey FROM b2)
        |UNION ALL
        |SELECT b2.o_custkey, o_orderkey, o_orderdate, o_totalprice, key_bucket,
        |  'Y', CAST(NULL AS TIMESTAMP)
        |FROM b2 JOIN kb ON b2.o_custkey = kb.o_custkey""".stripMargin,

    // q106: change data feed between the two SCD-2 commits — updated
    // customers emit a preimage/postimage pair for the closed row plus an
    // insert of the new active row; new customers insert only; untouched
    // rows (even in rewritten buckets) emit nothing
    "q106_change_feed" ->
      """WITH w1 AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        | b1 AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM w1 WHERE rn = 1),
        | w2 AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
        | b2 AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM w2 WHERE rn = 1),
        | kb AS (SELECT DISTINCT o_custkey,
        |    CAST(('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,15)) AS BIGINT) % 16 key_bucket
        |  FROM orders),
        | upd AS (SELECT * FROM b1 WHERE o_custkey IN (SELECT o_custkey FROM b2))
        |SELECT upd.o_custkey, o_orderkey, o_orderdate, o_totalprice, key_bucket,
        |  'Y' AS actv_flg, CAST(NULL AS TIMESTAMP) AS record_to, 'update_preimage' AS change_type
        |FROM upd JOIN kb ON upd.o_custkey = kb.o_custkey
        |UNION ALL
        |SELECT upd.o_custkey, o_orderkey, o_orderdate, o_totalprice, key_bucket,
        |  'N', TIMESTAMP '2002-01-01 00:00:00', 'update_postimage'
        |FROM upd JOIN kb ON upd.o_custkey = kb.o_custkey
        |UNION ALL
        |SELECT b2.o_custkey, o_orderkey, o_orderdate, o_totalprice, key_bucket,
        |  'Y', CAST(NULL AS TIMESTAMP), 'insert'
        |FROM b2 JOIN kb ON b2.o_custkey = kb.o_custkey""".stripMargin,

    // q75: the oracle sees decrypt∘encrypt as the identity
    "q75_crypto_roundtrip" ->
      "SELECT c_custkey, c_name AS name_rt, c_nationkey FROM customer",

    // q76: salted join must equal the plain inner join
    "q76_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_lines,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin,

    // q77: paged landing must preserve exactly the source rows
    "q77_paged_ingest" ->
      """SELECT o_orderstatus, count(*) AS n_orders, CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders WHERE o_orderkey <= 1200 GROUP BY o_orderstatus""".stripMargin,

    // identical oracle: the streaming execution must match the batch plan
    "q45_stream_windows" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
        | count(*) AS n_events,
        | CAST(sum(CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
