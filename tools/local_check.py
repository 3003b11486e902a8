#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads Verify's parquet outputs from OUTDIR, runs each oracle SQL from
oracle_sql.json in DuckDB against the sf parquet tables, and compares:
schema (column names), row count, and values (sorted by all columns,
exact equality; float columns must be bit-identical by design).

Usage: python3 tools/local_check.py /root/testdata/sf0.01 /tmp/graft_verify
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# --scale swaps these in: result-identical twins of oracles whose DEFAULT
# formulation is deliberately naive-independent (all-pairs) and therefore
# quadratic — fine at the sf0.01 driver gate, infeasible at sf1. The twin
# below is the inverted-index formulation: for minJaccard > 0 it is
# result-identical to the naive join (a pair with empty shingle
# intersection has J = 0 < threshold and appears in neither), verified by
# running BOTH at sf0.01 before first use. Everything else about the
# comparison (schema, row, value strictness) is unchanged.
_TOKENS = r"""CASE WHEN len(trim(text))=0 THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text),'\s+') END"""
SCALE_ORACLES = {
    "q36_jaccard_pairs": f"""
WITH base AS (SELECT source, doc_id, {_TOKENS} ws FROM documents),
 sh AS (SELECT source, doc_id,
   list_distinct(list_transform(
     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) sh
  FROM base),
 sizes AS (SELECT source, doc_id, len(sh) n FROM sh),
 post AS (SELECT source, doc_id, unnest(sh) s FROM sh),
 co AS (SELECT a.source source, a.doc_id id_a, b.doc_id id_b, count(*) inter
        FROM post a JOIN post b ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3),
 j AS (SELECT co.source, id_a, id_b,
       CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) jac
       FROM co JOIN sizes sa ON co.source = sa.source AND co.id_a = sa.doc_id
               JOIN sizes sb ON co.source = sb.source AND co.id_b = sb.doc_id)
SELECT source, id_a, id_b, CAST(FLOOR(jac*10000) AS BIGINT) AS jaccard_e4
FROM j WHERE jac >= CAST(0.3 AS DOUBLE)""",
    # Same quadratic story, different axis: the naive q47 oracle unnests 64
    # dims PER CANDIDATE PAIR (candidate pairs are quadratic within LSH
    # buckets -> 1.6e9 intermediate rows at sf1). list_dot_product on
    # DOUBLE[] folds sequentially in index order — verified bit-identical
    # to sum(x*y ORDER BY i) — so the twin keeps IEEE-exact results with a
    # per-pair (not per-pair-per-dim) intermediate.
    # q142's scale twin: the default oracle computes the top-gram masses
    # with list_transform(distinct, x -> list_filter(g, y = x)) — a per-row
    # QUADRATIC in interpreted lambdas that is fine for the 500-doc driver
    # gate and infeasible at sf1 (the same quadratic the Spark side designed
    # out twice). The twin computes the SAME top masses relationally
    # (unnest -> GROUP BY (doc, n, gram) -> max by (count, len)) and keeps
    # the linear list forms for the dup masses and norm. Verified equal to
    # the default oracle at sf0.01 before first use.
    "q142_repetition": f"""
WITH base AS (SELECT doc_id, {_TOKENS} ws FROM documents),
 g AS (SELECT doc_id, ws,
   CAST(COALESCE(list_sum(list_transform(ws, x -> len(x))), 0) + greatest(len(ws) - 1, 0) AS BIGINT) AS norm,
   {', '.join(
     f"CASE WHEN len(ws) < {n} THEN CAST([] AS VARCHAR[]) ELSE list_transform(range(1, len(ws)-{n-2}), i -> array_to_string(list_slice(ws, i, i+{n-1}), ' ')) END AS g{n}"
     for n in range(2, 11))}
  FROM base),
 ex AS ({' UNION ALL '.join(
     f"SELECT doc_id, {n} AS n, unnest(g{n}) gram FROM g" for n in (2, 3, 4))}),
 cnt AS (SELECT doc_id, n, gram, count(*) c FROM ex GROUP BY doc_id, n, gram),
 tr AS (SELECT doc_id, n, c * len(gram) mass,
    row_number() OVER (PARTITION BY doc_id, n ORDER BY c DESC, len(gram) DESC) rn FROM cnt),
 tm AS (SELECT doc_id, n, mass FROM tr WHERE rn = 1),
 m AS (SELECT g.doc_id, g.norm,
   {', '.join(
     f"COALESCE(t{n}.mass, 0) AS tm{n}" for n in (2, 3, 4))},
   {', '.join(
     f"CAST(COALESCE(list_sum(list_transform(g{n}, x -> len(x))), 0) - COALESCE(list_sum(list_transform(list_distinct(g{n}), x -> len(x))), 0) AS BIGINT) AS dm{n}"
     for n in range(5, 11))}
  FROM g {' '.join(
     f"LEFT JOIN tm t{n} ON t{n}.doc_id = g.doc_id AND t{n}.n = {n}" for n in (2, 3, 4))}),
 f AS (SELECT doc_id,
  {', '.join(
     f"CASE WHEN norm = 0 THEN 0 ELSE CAST(FLOOR(CAST(tm{n} AS DOUBLE) * 10000.0e0 / norm) AS BIGINT) END AS top{n}_frac_e4"
     for n in (2, 3, 4))},
  {', '.join(
     f"CASE WHEN norm = 0 THEN 0 ELSE CAST(FLOOR(CAST(dm{n} AS DOUBLE) * 10000.0e0 / norm) AS BIGINT) END AS dup{n}_frac_e4"
     for n in range(5, 11))}
 FROM m)
SELECT *, (top2_frac_e4 <= 2000 AND top3_frac_e4 <= 1800 AND top4_frac_e4 <= 1600
  AND dup5_frac_e4 <= 1500 AND dup6_frac_e4 <= 1400 AND dup7_frac_e4 <= 1300
  AND dup8_frac_e4 <= 1200 AND dup9_frac_e4 <= 1100 AND dup10_frac_e4 <= 1000) AS pass_repetition_full FROM f""",
    "q47_embedding_neardup": None,  # filled below (needs the hyperplane masks from oracle_sql.json)
    # q135's scale twin: candidates from shingle co-occurrence postings
    # (q36's twin shape) instead of the all-pairs list_intersect — result-
    # identical for t > 0 (a pair at J >= 2/5 shares >= 1 shingle).
    # Verified equal to the all-pairs oracle at sf0.01 before first use.
    "q135_ppjoin": f"""
WITH base AS (SELECT doc_id, {_TOKENS} ws FROM documents),
 sh AS (SELECT doc_id,
   list_distinct(list_transform(
     CASE WHEN len(ws)<3 THEN CAST([] AS VARCHAR[])
       ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END,
     s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) sh
  FROM base),
 sizes AS (SELECT doc_id, len(sh) n FROM sh WHERE len(sh) > 0),
 post AS (SELECT doc_id, unnest(sh) s FROM sh),
 co AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) inter
        FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
 j AS (SELECT id_a, id_b, CAST(inter AS BIGINT) inter,
       CAST(sa.n + sb.n - inter AS BIGINT) un
       FROM co JOIN sizes sa ON co.id_a = sa.doc_id
               JOIN sizes sb ON co.id_b = sb.doc_id)
SELECT id_a, id_b,
 CAST(FLOOR(10000.0e0 * (CAST(inter AS DOUBLE) / CAST(un AS DOUBLE))) AS BIGINT) AS jaccard_e4
FROM j WHERE inter * 5 >= un * 2""",
}

# q47/q86 twins are REWRITES of the dumped oracle text (the mask literals /
# k-means training CTEs are generated Scala-side and must stay verbatim):
# cut at the marker, splice the list-based tail.
SCALE_REWRITES = {
    # q41's scale twin (r16: the 16-table promotion doubled the mask set to
    # 80 hyperplanes; the generated ordered-sum oracle built 80 x 1.28M
    # unnested rows of non-spillable ORDER BY i aggregate buffers and
    # OOM-killed DuckDB at sf1). list_dot_product on DOUBLE[] folds
    # sequentially in index order — the same primitive the q47/q86/q156
    # twins use, bit-equality proven against the ordered folds in r15 —
    # so the bucket signs, the candidate set, and the cosine ranking are
    # bit-identical with per-(vec, plane) intermediates instead of
    # per-(vec, plane, dim). Verified row-identical to the generated
    # oracle at sf0.01 before first use (r16).
    "q41_ann_lsh": (
        " e AS (",
        """ mv AS (SELECT tbl, bit, list_transform(range(1, 65),
        i -> CASE substr(mask, CAST(i AS INTEGER), 1) WHEN '1' THEN 1.0 ELSE -1.0 END) pm FROM m),
 ed AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) ev FROM embeddings),
 d AS (SELECT vec_id, tbl, bit, list_dot_product(ev, pm) dt FROM ed CROSS JOIN mv),
 bk AS (SELECT vec_id, tbl, CAST(sum(CASE WHEN dt > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) bucket
  FROM d GROUP BY vec_id, tbl),
 qb AS (SELECT tbl, bucket FROM bk WHERE vec_id = 0),
 cand AS (SELECT DISTINCT bk.vec_id FROM bk JOIN qb ON bk.tbl = qb.tbl AND bk.bucket = qb.bucket WHERE bk.vec_id <> 0),
 q AS (SELECT ev qe FROM ed WHERE vec_id = 0),
 dots AS (SELECT e2.vec_id, list_dot_product(e2.ev, q.qe) d,
    list_dot_product(e2.ev, e2.ev) nx, list_dot_product(q.qe, q.qe) ny
  FROM ed e2, q WHERE e2.vec_id IN (SELECT vec_id FROM cand)),
 cos AS (SELECT vec_id, CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END c FROM dots)
SELECT vec_id, CAST(FLOOR(c*1000000) AS BIGINT) AS cosine_e6
FROM cos ORDER BY c DESC, vec_id ASC LIMIT 20""",
    ),
    "q47_embedding_neardup": (
        " cand AS (",
        """ ed AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) ev FROM embeddings),
 cand AS (SELECT a.vec_id id_a, b.vec_id id_b
  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
 dots AS (SELECT id_a, id_b, list_dot_product(ea.ev, eb.ev) d,
    list_dot_product(ea.ev, ea.ev) nx, list_dot_product(eb.ev, eb.ev) ny
   FROM cand JOIN ed ea ON id_a = ea.vec_id JOIN ed eb ON id_b = eb.vec_id),
 cos AS (SELECT id_a, id_b, CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END c FROM dots)
SELECT id_a, id_b, CAST(FLOOR(c*1000000) AS BIGINT) AS cosine_e6
FROM cos WHERE c >= CAST(0.35 AS DOUBLE)""",
    ),
    "q86_semantic_dedup": (
        " p AS (",
        """ ed AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) ev FROM embeddings),
 p AS (SELECT a.vec_id ia, b.vec_id ib FROM aF a JOIN aF b ON a.cid = b.cid AND a.vec_id < b.vec_id),
 pd AS (SELECT ia, ib, list_dot_product(e1.ev, e2.ev) d,
    list_dot_product(e1.ev, e1.ev) nx, list_dot_product(e2.ev, e2.ev) ny
   FROM p JOIN ed e1 ON e1.vec_id = p.ia JOIN ed e2 ON e2.vec_id = p.ib),
 drops AS (SELECT DISTINCT ib FROM pd
   WHERE (CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END) >= 0.3)
SELECT e.vec_id, a.cid AS cell_id
FROM embeddings e JOIN aF a ON a.vec_id = e.vec_id
WHERE e.vec_id NOT IN (SELECT ib FROM drops)""",
    ),
}
# SimHash near-dup family (q65/q88/q126/q134): the generated oracle pairs
# sketches with an ALL-PAIRS inequality join (`s a JOIN s b ON a.doc_id <
# b.doc_id WHERE bit_count(...) <= 4`) — 1.25B pair evaluations at sf1
# (slow but feasible), 11.25B at sf3 (a single query ran 3h without
# finishing). The scale twin is the pigeonhole banding the Spark side
# itself uses (Dedup.simhashNearDup60 / bandedSketchPairs): hamming <= 4
# over 60 bits split into 5 DISJOINT 12-bit chunks forces at least one
# chunk with zero differing bits, so candidates from a chunk-equality
# equi-join have full recall; DISTINCT collapses multi-chunk candidates
# and the bit_count verify is unchanged — result-identical by the same
# argument the Spark operator's spec pins. Verified equal to the all-pairs
# oracle at sf0.01 before first use (r17).
_SIMHASH_BANDED_CH = (
    " ch AS (SELECT doc_id, sk60, j, (sk60 >> (j*12)) & 4095 cv"
    " FROM s CROSS JOIN (SELECT unnest(range(5)) j) js),\n")
# q88/q126/q134 share one generated e-CTE verbatim; q65 inlines the join
# in its final SELECT. Literal-substring substitution, applied before the
# MATERIALIZED pass (which then also covers the new ch CTE); .index()
# raises if the generated SQL drifts — good.
SCALE_SUBS = {
    "q65_simhash_neardup": (
        """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
 CAST(bit_count(xor(a.sk60, b.sk60)) AS INTEGER) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sk60, b.sk60)) <= 4""",
        ","
        + _SIMHASH_BANDED_CH
        + """ pruned AS (SELECT DISTINCT a.doc_id ia, a.sk60 sa, b.doc_id ib, b.sk60 sb
   FROM ch a JOIN ch b ON a.j = b.j AND a.cv = b.cv AND a.doc_id < b.doc_id)
SELECT ia AS id_a, ib AS id_b,
 CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM pruned
WHERE bit_count(xor(sa, sb)) <= 4""",
    ),
}
_E_CTE_ALLPAIRS = """ e AS (SELECT a.doc_id ia, b.doc_id ib
   FROM s a JOIN s b ON a.doc_id < b.doc_id
   WHERE bit_count(xor(a.sk60, b.sk60)) <= 4),"""
_E_CTE_BANDED = (
    _SIMHASH_BANDED_CH
    + """ e AS (SELECT DISTINCT a.doc_id ia, b.doc_id ib
   FROM ch a JOIN ch b ON a.j = b.j AND a.cv = b.cv AND a.doc_id < b.doc_id
   WHERE bit_count(xor(a.sk60, b.sk60)) <= 4),""")
for _q in ("q88_dup_groups", "q126_neardup_split", "q134_canonical_dedup"):
    SCALE_SUBS[_q] = (_E_CTE_ALLPAIRS, _E_CTE_BANDED)

# The recursive `reach` closure enumerates EVERY (node, reachable-node)
# pair — Σ component² rows with edges×frontier intermediates per
# iteration; at sf3 (3.04M near-dup edges) a count over it ran 9+ min
# without finishing standalone. The scale twin computes the SAME
# components (min-member label per connected component) with a THIRD
# independent implementation — union-find with path compression over the
# banded edge list, driver-side — registered as __simhash_comp and
# consumed by the spliced SQL. Verified equal to the recursive original
# at sf0.01 before first use (r17); the edge list it folds is itself the
# equality-proven banded twin above.
_REACH_Q88_TAIL = """ sym AS (SELECT ia a, ib b FROM e UNION SELECT ib, ia FROM e),
 reach(id, r) AS (
   SELECT a, a FROM sym
   UNION
   SELECT sym.a, reach.r FROM sym JOIN reach ON reach.id = sym.b
 )
SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY id"""
_REACH_COMP_CTE = """ sym AS (SELECT ia a, ib b FROM e UNION SELECT ib, ia FROM e),
 reach(id, r) AS (
   SELECT a, a FROM sym
   UNION
   SELECT sym.a, reach.r FROM sym JOIN reach ON reach.id = sym.b
 ),
 comp AS (SELECT id, min(r) lbl FROM reach GROUP BY id),"""
# banded-edges SQL (reach text intact) per closure-substituted query,
# filled by apply_scale for register_simhash_comp to cut at ' sym AS ('
PRECOMPUTE_SRC = {}
SCALE_CLOSURE_SUBS = {
    "q126_neardup_split": (_REACH_COMP_CTE,
                           " comp AS (SELECT id, lbl FROM __simhash_comp),"),
    "q134_canonical_dedup": (_REACH_COMP_CTE,
                             " comp AS (SELECT id, lbl FROM __simhash_comp),"),
}
# q88: the closure IS the whole query — every downstream column comes from
# __simhash_comp, so after the precompute there is nothing left for the SQL
# chain to contribute. DuckDB 1.0 EVALUATES unreferenced MATERIALIZED CTEs
# (measured: an unreferenced 400M-row CTE costs 5.5 s), so r17's tail-only
# splice kept the full simhash + banded-join chain in the final query and
# re-ran it a second time at sf3 — for nothing. Guard the expected reach
# tail (drift check), then replace the ENTIRE query with the comp SELECT;
# the chain still runs exactly once, inside register_simhash_comp.
SCALE_CLOSURE_FULL = {
    "q88_dup_groups": (",\n" + _REACH_Q88_TAIL,
                       "SELECT id AS doc_id, lbl AS group_id FROM __simhash_comp"),
}


# q88/q126/q134 share the generated simhash chain verbatim, so their edge
# SQL is byte-identical — cache the union-find result keyed by that SQL
# (scale mode opens a FRESH connection per query, so only the fetch+fold
# can be reused, not the registration).
_COMP_CACHE = {}


def register_simhash_comp(con, scaled_sql):
    """Run the banded edge stage of `scaled_sql`, union-find the components
    driver-side, and register the (id, lbl=min member) table the closure
    substitution consumes."""
    idx = scaled_sql.index(" sym AS (")
    edges_sql = scaled_sql[:idx].rstrip().rstrip(",") + "\nSELECT ia, ib FROM e"
    if edges_sql not in _COMP_CACHE:
        edges = con.sql(edges_sql).fetchall()
        parent = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = set()
        for a, b in edges:
            nodes.add(a)
            nodes.add(b)
        _COMP_CACHE[edges_sql] = [(n, find(n)) for n in sorted(nodes)]
    # explicit int64: an EMPTY edge list otherwise registers object-dtype
    # columns and the BIGINT join/comparison downstream can fail
    comp_df = pd.DataFrame(_COMP_CACHE[edges_sql], columns=["id", "lbl"]).astype("int64")
    try:
        con.unregister("__simhash_comp")
    except Exception:
        pass
    con.register("__simhash_comp", comp_df)

# Label screens (q156 exact, q196 IVF-celled at nprobe=all — identical
# output by construction): the generated ordered-sum oracle builds 20M
# pair-groups of 64 unnested rows whose ORDER BY i aggregate buffers
# cannot spill — the kernel OOM-killed DuckDB at 130GB RSS replaying it
# at sf1 (r15). The scale twin computes the same doubles streaming:
# list_dot_product per pair row (the q47/q86 rewrite primitive, plus a
# direct bit-equality proof this round: all 199,900 sf0.1 pair dots and
# all 2,000 norms exactly equal the ordered folds, and the full oracle
# output is row-identical at sf0.1).
_LABEL_SCREEN_SCALE = """
WITH ed AS (SELECT vec_id, CAST(label AS BIGINT) lab, list_transform(embedding, v -> CAST(v AS DOUBLE)) ev FROM embeddings),
 n AS (SELECT vec_id, sqrt(list_dot_product(ev, ev)) nrm FROM ed),
 p AS (SELECT ed.vec_id pid, ed.lab plab, ed.ev pe, n.nrm pn FROM ed JOIN n USING (vec_id) WHERE vec_id % 20 = 0),
 cos AS (SELECT p.pid, p.plab, c.vec_id cid, c.lab clab,
    CASE WHEN p.pn * cn.nrm = 0 THEN 0.0 ELSE list_dot_product(c.ev, p.pe) / (p.pn * cn.nrm) END c
   FROM ed c JOIN n cn ON cn.vec_id = c.vec_id JOIN p ON c.vec_id <> p.pid),
 top AS (SELECT pid, plab, clab FROM (
    SELECT pid, plab, clab, row_number() OVER (PARTITION BY pid ORDER BY c DESC, cid ASC) rn
    FROM cos) WHERE rn <= 5),
 maj AS (SELECT pid, plab, clab, count(*) n,
    row_number() OVER (PARTITION BY pid ORDER BY count(*) DESC, clab ASC) rm
  FROM top GROUP BY pid, plab, clab)
SELECT pid AS vec_id, plab AS own_label, clab AS neighbor_label,
  CAST(n AS BIGINT) AS n_votes, (plab <> clab) AS flagged
FROM maj WHERE rm = 1"""
SCALE_ORACLES["q156_label_screen"] = _LABEL_SCREEN_SCALE
SCALE_ORACLES["q196_label_screen_ivf"] = _LABEL_SCREEN_SCALE

del SCALE_ORACLES["q47_embedding_neardup"]


def apply_scale(oracles):
    import re
    out = dict(oracles)
    out.update(SCALE_ORACLES)
    for name, (marker, tail) in SCALE_REWRITES.items():
        base = oracles[name]
        cut = base.index(marker)  # raises if the generated SQL drifts — good
        out[name] = base[:cut] + tail
    for name, (old, new) in SCALE_SUBS.items():
        base = out[name]
        base.index(old)  # raises if the generated SQL drifts — good
        out[name] = base.replace(old, new)
    for name, (old, new) in SCALE_CLOSURE_SUBS.items():
        base = out[name]
        base.index(old)  # raises if the generated SQL drifts — good
        # the precompute step needs the banded-edges version WITH the
        # original reach text still present (it cuts at ' sym AS (')
        PRECOMPUTE_SRC[name] = base
        out[name] = base.replace(old, new)
    for name, (old, new) in SCALE_CLOSURE_FULL.items():
        base = out[name]
        base.index(old)  # raises if the generated SQL drifts — good
        PRECOMPUTE_SRC[name] = base
        out[name] = new  # whole query replaced — see SCALE_CLOSURE_FULL
    # DuckDB 1.0 INLINES every CTE reference; the chained k-means iteration
    # CTEs (c1 <- c0 twice, c2 <- c1 twice, ...) therefore re-evaluate
    # exponentially — irrelevant at the sf0.01 gate, an 80GB OOM at sf1.
    # Forcing MATERIALIZED on each CTE restores the evaluate-once semantics
    # the SQL was written with. Result-identical by definition.
    for name in ("q72_ann_ivf", "q85_ann_ivf_trained", "q86_semantic_dedup",
                 "q90_ann_ivf_sampled", "q65_simhash_neardup", "q88_dup_groups",
                 "q98_ann_ivf_sq8",
                 # q97's pipeline CTEs (fp, q, shd) are each referenced
                 # twice — inlining re-tokenizes the corpus 4x at sf1
                 "q97_corpus_pipeline",
                 # q116's unrolled iteration chain re-evaluates the edge
                 # CTE once per rank step when inlined; q126 chains the
                 # simhash CTEs into a recursive reachability (q88's shape)
                 "q116_pagerank", "q126_neardup_split", "q134_canonical_dedup",
                 # q163's residual chain shares ev/rv/cs across many
                 # consumers (coarse assign, residual, training, query
                 # side) — inlined, the training chain re-evaluates
                 # multiplicatively and OOMs at sf1
                 "q163_ann_ivf_pq_residual", "q164_stream_vector_index"):
        if name in out:
            out[name] = re.sub(r"\b(AS)\s*\(\s*SELECT", r"AS MATERIALIZED (SELECT",
                               out[name], flags=re.IGNORECASE)
    # q86's pair stage is evaluated CELL BY CELL (r18): the monolithic
    # rewrite's within-cell pair join carries two 64-double lists per row
    # — ~27 GB at sf1, ~250 GB at sf3 — and r17's un-materialize mitigation
    # still spilled past the DISK budget at sf3 (41+ GB written before
    # "No space left on device"). The pair set partitions EXACTLY by cell
    # id, so the precompute runs the k-means chain once (registering the
    # aF assignment), then one bounded per-cell query for the drop set —
    # identical per-pair arithmetic (same list_dot_product projection,
    # same threshold), with per-cell peak ~1/k of the monolith and nothing
    # quadratic materialized. Verified equal to the monolithic rewrite at
    # sf0.01 before first use (r18). The final SQL reads only the two
    # registered tables — the chain runs exactly once, in the precompute
    # (the q88 lesson: DuckDB 1.0 evaluates unreferenced MATERIALIZED CTEs).
    if "q86_semantic_dedup" in out:
        q86 = out["q86_semantic_dedup"]
        q86.index(" ed AS MATERIALIZED (SELECT vec_id, list_transform")  # drift guard
        PRECOMPUTE_SRC["q86_semantic_dedup"] = q86
        out["q86_semantic_dedup"] = """SELECT e.vec_id, a.cid AS cell_id
FROM embeddings e JOIN __semdedup_assign a ON a.vec_id = e.vec_id
WHERE e.vec_id NOT IN (SELECT ib FROM __semdedup_drops)"""
    return out


def register_semdedup_drops(con, scaled_sql):
    """q86's celled precompute: run the k-means chain once for the cell
    assignment, then the drop set one cell at a time — the pair join
    partitions exactly by cell, so the union of per-cell DISTINCT drop
    sets IS the monolithic drop set, at 1/k the peak footprint."""
    idx = scaled_sql.index(" ed AS MATERIALIZED (SELECT vec_id, list_transform")
    assign_sql = scaled_sql[:idx].rstrip().rstrip(",") + "\nSELECT vec_id, cid FROM aF"
    assign = con.sql(assign_sql).df().astype("int64")
    try:
        con.unregister("__semdedup_assign")
    except Exception:
        pass
    con.register("__semdedup_assign", assign)
    drops = set()
    for c in sorted(assign["cid"].unique()):
        # per-pair arithmetic verbatim from the monolithic rewrite: ev is
        # the same double-cast list, d/nx/ny the same list_dot_product
        # calls with ia on the left, the same CASE'd cosine and threshold
        cell_sql = f"""
WITH ed AS (SELECT e.vec_id, list_transform(e.embedding, v -> CAST(v AS DOUBLE)) ev
            FROM embeddings e JOIN __semdedup_assign a ON a.vec_id = e.vec_id WHERE a.cid = {c}),
 pd AS (SELECT a.vec_id ia, b.vec_id ib, list_dot_product(a.ev, b.ev) d,
        list_dot_product(a.ev, a.ev) nx, list_dot_product(b.ev, b.ev) ny
        FROM ed a JOIN ed b ON a.vec_id < b.vec_id)
SELECT DISTINCT ib FROM pd
WHERE (CASE WHEN sqrt(nx)*sqrt(ny)=0 THEN 0.0 ELSE d/(sqrt(nx)*sqrt(ny)) END) >= 0.3"""
        drops.update(r[0] for r in con.sql(cell_sql).fetchall())
    drops_df = pd.DataFrame(sorted(drops), columns=["ib"]).astype("int64")
    try:
        con.unregister("__semdedup_drops")
    except Exception:
        pass
    con.register("__semdedup_drops", drops_df)


def connect(sf_dir, scale=False):
    con = duckdb.connect()
    import os
    if scale:
        # DuckDB's bundled jemalloc retains tens of thousands of VM
        # mappings under the ordered-aggregate allocation pattern: at sf3
        # the q86 k-means chain alone needs ~117k maps, and the kernel
        # default vm.max_map_count=65530 makes a 16 KB block allocation
        # fail at ~5 GB RSS with "Out of Memory Error ... (bad
        # allocation)" — the true face of the r17 q86/q88 sf3 DNFs (NOT
        # the 80 GB data volume; measured r18 with a /proc/self/maps
        # monitor: fail at maps=65531, pass at maps=116918 once raised).
        # Raise it when we can (root in the build container); best-effort
        # — the run proceeds either way and a genuine failure is still
        # recorded honestly.
        try:
            with open("/proc/sys/vm/max_map_count") as f:
                cur = int(f.read())
            if cur < 1048576:
                with open("/proc/sys/vm/max_map_count", "w") as f:
                    f.write("1048576")
        except (OSError, ValueError):
            pass
        # big-SF runs: bound the allocator and spill to disk instead of
        # dying; one fresh connection per query (a DuckDB OOM poisons the
        # connection for every later query)
        os.makedirs("/tmp/duckdb_spill", exist_ok=True)
        con.sql("SET memory_limit='80GB'")
        con.sql("SET temp_directory='/tmp/duckdb_spill'")
        # ordered aggregates and hash-join builds hold per-thread buffers
        # that cannot spill; at 32 threads the big replay oracles
        # (q114/q115 PQ chains) OOM where 8 threads fit, and at sf3 the
        # SimHash banded-join replays (q86/q88) OOM at 8 threads where 4
        # fit (r17) — trade parallelism for bound
        con.sql("SET threads=4")
    for t in TABLES:
        # driver testdata = single parquet file; ScaleGen output = a Spark
        # parquet DIRECTORY of part files — glob in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def load(sf_dir, out_dir, scale=False):
    con = connect(sf_dir, scale)
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    return con, oracles


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    # usage: local_check.py SF_DIR OUT_DIR [JSON_ARTIFACT] [--scale] [--only REGEX]
    # Queries with no parquet dump under OUT_DIR are skipped (Verify's
    # optional name-filter dumps a subset; oracle_sql.json is always full).
    # With an existing JSON_ARTIFACT and --only, untouched results are kept
    # (incremental re-runs after a fix).
    import re
    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = re.compile(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--scale"]
    scale = "--scale" in argv
    sf_dir, out_dir = args[0], args[1]
    artifact = args[2] if len(args) > 2 else None
    con, oracles = load(sf_dir, out_dir, scale)
    if scale:
        oracles = apply_scale(oracles)
    n_pass = n_fail = 0
    results = {}
    import os
    if artifact and only and os.path.isfile(artifact):
        with open(artifact) as f:
            results = json.load(f).get("results", {})
    for name, sql in sorted(oracles.items()):
        if only and not only.search(name):
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            if only:
                # targeted re-runs legitimately dump a subset
                continue
            # full run: a query whose dump step failed must be a FAILURE,
            # not silently neither-pass-nor-fail
            print(f"FAIL {name}: missing dump under {out_dir}")
            results[name] = {"pass": False, "why": "missing_dump"}
            n_fail += 1
            continue
        try:
            if scale:
                # a poisoned connection can refuse even close() after a
                # hard allocator error — never let teardown kill the run
                try:
                    con.close()
                except Exception:
                    pass
                con = connect(sf_dir, scale)
            if scale and name in PRECOMPUTE_SRC:
                fn = (register_semdedup_drops if name == "q86_semantic_dedup"
                      else register_simhash_comp)
                fn(con, PRECOMPUTE_SRC[name])
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            g, w = normalize(got), normalize(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                results[name] = {"pass": False, "why": "schema"}
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                results[name] = {"pass": False, "why": "rows"}
                n_fail += 1
                continue
            if not g.equals(w):
                neq = (g != w) & ~(g.isna() & w.isna())
                bad_cols = [c for c in g.columns if neq[c].any()]
                print(f"FAIL {name}: value mismatch in {bad_cols}")
                for c in bad_cols[:2]:
                    idx = neq[c].idxmax()
                    print(f"  {c}[{idx}]: got={g[c][idx]!r} want={w[c][idx]!r}")
                results[name] = {"pass": False, "why": f"values:{bad_cols}"}
                n_fail += 1
                continue
            print(f"PASS {name} ({len(g)} rows)")
            results[name] = {"pass": True, "rows": int(len(g))}
            n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {str(e).splitlines()[0][:200]}")
            results[name] = {"pass": False, "why": f"error:{str(e).splitlines()[0][:120]}"}
            n_fail += 1
        finally:
            # persist INCREMENTALLY: a DuckDB allocator abort can take the
            # whole interpreter down mid-run (seen at the r16 sf1 re-cut),
            # and the end-of-run write would lose an hour of green rows
            sys.stdout.flush()
            if artifact:
                with open(artifact, "w") as f:
                    json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1, sort_keys=True)
    if artifact:
        with open(artifact, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1, sort_keys=True)
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
