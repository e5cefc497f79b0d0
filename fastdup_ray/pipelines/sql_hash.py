"""DuckDB-SQL twins of the engine's own hash kernels.

The simhash queries were `no_oracle` in round 2 ("hash-defined, not
SQL-expressible"). They ARE expressible: DuckDB has 128-bit HUGEINT, so
mod-2^64 wrapping arithmetic — the only non-SQL ingredient of
`functions/hashing.hash64_segmented` and `functions/simhash.simhash64`
— can be written as split 32x32-bit multiplies. This module GENERATES
that SQL from the same constants the numpy kernels use, so the oracle
can never drift from the implementation silently (same pattern as the
stopword-dict-generated SQL_TEXT_QUALITY).

Cost model: the fingerprint CTE is byte-level rows (~len(text) rows per
doc), fine at the sf0.01 correctness-gate scale the driver runs; these
oracles exist for the gate, not for production.
"""

from __future__ import annotations

_B = 0x100000001B3            # FNV-64 prime (polynomial base)
_M1 = 0xFF51AFD7ED558CCD      # fmix64 multipliers
_M2 = 0xC4CEB9FE1A85EC53
_FNV = 0xCBF29CE484222325     # FNV offset basis (length salt)
_TWO64 = 1 << 64


def _mul(a: str, b: str) -> str:
    """mod-2^64 product of two UBIGINT SQL expressions: split each into
    32-bit halves so every HUGEINT intermediate stays < 2^97."""
    return (
        "CAST((("
        f"CAST(({a}) % 4294967296 AS HUGEINT) * CAST(({b}) % 4294967296 AS HUGEINT)"
        f" + ((CAST(({a}) // 4294967296 AS HUGEINT) * CAST(({b}) % 4294967296 AS HUGEINT)"
        f" + CAST(({a}) % 4294967296 AS HUGEINT) * CAST(({b}) // 4294967296 AS HUGEINT))"
        f" % 4294967296) * CAST(4294967296 AS HUGEINT)"
        f") % CAST('{_TWO64}' AS HUGEINT)) AS UBIGINT)"
    )


def _xs33(x: str) -> str:
    """One xorshift step of fmix64: x ^ (x >> 33)."""
    return f"xor({x}, ({x}) >> 33)"


def simhash_fp_ctes(doc_table: str = "documents") -> str:
    """CTE chain (for a WITH RECURSIVE): {doc_table}(doc_id, text) ->
    fp(doc_id, simhash BIGINT), reproducing simhash64 exactly —
    whitespace tokens, per-token polynomial byte hash with the FNV-64
    prime, xor'd with fmix64(len + offset), fmix64-finished, then 64
    per-bit majority votes in the unpackbits byte-order layout
    (fingerprint bit c <- hash bit 8*(c//8)+7-c%8), reinterpreted as
    int64 like the signatures table's simhash column.
    """
    vote_cols = ",\n      ".join(
        f"SUM(CAST((h >> {8 * (c // 8) + 7 - c % 8}) & 1 AS BIGINT)) AS s{c}"
        for c in range(64)
    )
    fp_expr = " + ".join(
        f"CASE WHEN 2*s{c} > n THEN CAST('{1 << c}' AS HUGEINT) ELSE 0 END"
        for c in range(64)
    )
    return f"""
  pows(e, p) AS (
    SELECT 0, CAST(1 AS UBIGINT)
    UNION ALL SELECT e + 1, {_mul('p', str(_B))} FROM pows WHERE e < 600
  ),
  tl AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {doc_table}),
  tok AS (
    SELECT doc_id, r.i AS tpos, toks[r.i + 1] AS tok,
           length(toks[r.i + 1]) AS tlen
    FROM tl, unnest(range(len(toks))) AS r(i)
    WHERE length(toks[r.i + 1]) > 0
  ),
  tbytes AS (
    SELECT doc_id, tpos, tlen, b.j AS j,
           CAST(ord(substring(tok, CAST(b.j AS INTEGER) + 1, 1)) AS UBIGINT) AS byte
    FROM tok, unnest(range(tlen)) AS b(j)
  ),
  tpoly AS (
    SELECT doc_id, tpos, any_value(tlen) AS tlen,
           CAST(SUM(CAST({_mul('byte', 'p')} AS HUGEINT)) % CAST('{_TWO64}' AS HUGEINT) AS UBIGINT) AS poly
    FROM tbytes JOIN pows ON pows.e = tlen - 1 - j
    GROUP BY doc_id, tpos
  ),
  m0 AS (SELECT doc_id, tpos, poly,
                CAST((CAST(tlen AS HUGEINT) + CAST('{_FNV}' AS HUGEINT)) % CAST('{_TWO64}' AS HUGEINT) AS UBIGINT) AS x
         FROM tpoly),
  m1 AS (SELECT doc_id, tpos, poly, {_xs33('x')} AS x FROM m0),
  m2 AS (SELECT doc_id, tpos, poly, {_mul('x', str(_M1))} AS x FROM m1),
  m3 AS (SELECT doc_id, tpos, poly, {_xs33('x')} AS x FROM m2),
  m4 AS (SELECT doc_id, tpos, poly, {_mul('x', str(_M2))} AS x FROM m3),
  m5 AS (SELECT doc_id, tpos, xor(poly, {_xs33('x')}) AS x FROM m4),
  h1 AS (SELECT doc_id, tpos, {_xs33('x')} AS x FROM m5),
  h2 AS (SELECT doc_id, tpos, {_mul('x', str(_M1))} AS x FROM h1),
  h3 AS (SELECT doc_id, tpos, {_xs33('x')} AS x FROM h2),
  h4 AS (SELECT doc_id, tpos, {_mul('x', str(_M2))} AS x FROM h3),
  th AS (SELECT doc_id, tpos, {_xs33('x')} AS h FROM h4),
  votes AS (
    SELECT doc_id, COUNT(*) AS n,
      {vote_cols}
    FROM th GROUP BY doc_id
  ),
  fp AS (
    SELECT doc_id,
      CAST(CASE WHEN fpu >= CAST('{1 << 63}' AS HUGEINT)
                THEN fpu - CAST('{_TWO64}' AS HUGEINT) ELSE fpu END AS BIGINT) AS simhash
    FROM (
      -- docs with zero tokens vote nothing -> fingerprint 0
      SELECT d.doc_id, COALESCE(v.f, 0) AS fpu
      FROM {doc_table} d LEFT JOIN (
        SELECT doc_id, ({fp_expr}) AS f FROM votes
      ) v ON d.doc_id = v.doc_id
    )
  )"""


SQL_SIMHASH_FINGERPRINTS = (
    "WITH RECURSIVE" + simhash_fp_ctes() + "\nSELECT doc_id, simhash FROM fp"
)

# Pair-list twin of stages/simhash_pairs.simhash_candidate_pairs for the
# non-pathological case the fixtures are in (identical-fingerprint groups
# <= max_bucket_pairs, distinct values per quarter bucket <=
# simhash_value_cap — both asserted by the r2 fixture's max group size 2):
# intra-value cliques at hamming 0 plus canon-to-canon edges for distinct
# values within hamming <= 3 (pigeonhole-exact, so "shares a quarter" and
# "hamming <= 3" coincide).
def _gram_poly_ctes(k: int, doc_table: str = "documents") -> str:
    """Shared CTE chain: every k-byte window of every doc -> wm4(doc_id,
    p, x) one xorshift short of the finished mix64. winnow truncates it
    to 32 bits (gh), the HLL twin keeps all 64 (gh64). ASCII-only like
    the simhash twin (chars == utf-8 bytes on the test tables)."""
    return f"""
  pw(e, pp) AS (
    SELECT 0, CAST(1 AS UBIGINT)
    UNION ALL SELECT e + 1, {_mul('pp', str(_B))} FROM pw WHERE e < {k - 1}
  ),
  dd AS (SELECT doc_id, text, length(text) AS n FROM {doc_table}),
  gpos AS (
    SELECT doc_id, text, r.i AS p
    FROM dd, unnest(range(n - {k} + 1)) AS r(i) WHERE n >= {k}
  ),
  gbyte AS (
    SELECT doc_id, p, b.j AS j,
           CAST(ord(substring(text, CAST(p + b.j AS INTEGER) + 1, 1)) AS UBIGINT) AS byte
    FROM gpos, unnest(range({k})) AS b(j)
  ),
  gpoly AS (
    SELECT doc_id, p,
           CAST(SUM(CAST({_mul('byte', 'pp')} AS HUGEINT)) % CAST('{_TWO64}' AS HUGEINT) AS UBIGINT) AS x
    FROM gbyte JOIN pw ON pw.e = {k} - 1 - j
    GROUP BY doc_id, p
  ),
  wm1 AS (SELECT doc_id, p, {_xs33('x')} AS x FROM gpoly),
  wm2 AS (SELECT doc_id, p, {_mul('x', str(_M1))} AS x FROM wm1),
  wm3 AS (SELECT doc_id, p, {_xs33('x')} AS x FROM wm2),
  wm4 AS (SELECT doc_id, p, {_mul('x', str(_M2))} AS x FROM wm3)"""


def winnow_ctes(k: int, w: int, doc_table: str = "documents") -> str:
    """CTE chain reproducing stages/winnow.py exactly: rolling k-byte
    polynomial hash (same base), fmix64 finisher, >> 32 to uint32, then
    rightmost-min winnowing over windows of `w` hashes (docs with fewer
    than w hashes get one window over all of them), DISTINCT selected
    positions. Ends with fph(doc_id, p, h)."""
    return _gram_poly_ctes(k, doc_table) + f""",
  gh AS (SELECT doc_id, p, CAST(({_xs33('x')}) >> 32 AS BIGINT) AS h FROM wm4),
  gm AS (SELECT doc_id, COUNT(*) AS m FROM gh GROUP BY doc_id),
  wins AS (
    SELECT doc_id, r.i AS s, LEAST(m, {w}) AS weff
    FROM gm, unnest(range(GREATEST(m - {w} + 1, 1))) AS r(i)
  ),
  wh AS (
    SELECT wn.doc_id, wn.s, g.p, g.h
    FROM wins wn JOIN gh g
      ON g.doc_id = wn.doc_id AND g.p >= wn.s AND g.p < wn.s + wn.weff
  ),
  wmin AS (SELECT doc_id, s, MIN(h) AS mh FROM wh GROUP BY doc_id, s),
  wsel AS (
    SELECT wh.doc_id, wh.s, MAX(wh.p) AS p
    FROM wh JOIN wmin
      ON wh.doc_id = wmin.doc_id AND wh.s = wmin.s AND wh.h = wmin.mh
    GROUP BY wh.doc_id, wh.s
  ),
  fpsel AS (SELECT DISTINCT doc_id, p FROM wsel),
  fph AS (
    SELECT f.doc_id, f.p, g.h
    FROM fpsel f JOIN gh g ON g.doc_id = f.doc_id AND g.p = f.p
  )"""


def sql_winnow_fingerprints(k: int, w: int) -> str:
    return ("WITH RECURSIVE" + winnow_ctes(k, w)
            + "\nSELECT doc_id, p AS pos, h AS fp FROM fph")


def sql_winnow_dup_pairs(k: int, w: int, min_shared: int, max_df: int) -> str:
    return ("WITH RECURSIVE" + winnow_ctes(k, w) + f""",
  docfp AS (SELECT DISTINCT doc_id, h FROM fph),
  live AS (
    SELECT h FROM docfp GROUP BY h
    HAVING COUNT(*) >= 2 AND COUNT(*) <= {max_df}
  ),
  pr AS (
    SELECT a.doc_id AS src, b.doc_id AS dst, COUNT(*) AS n_shared
    FROM docfp a
    JOIN docfp b ON a.h = b.h AND a.doc_id < b.doc_id
    JOIN live ON live.h = a.h
    GROUP BY a.doc_id, b.doc_id
  )
SELECT src, dst, n_shared FROM pr WHERE n_shared >= {min_shared}""")


def sql_hll_distinct_grams(k: int = 5, doc_table: str = "documents") -> str:
    """Twin of stages/sketches.hll_distinct (p=10, m=1024): registers from
    the full-64-bit gram hash (top 10 bits = register, rank = leftmost
    set bit of the low 54, 55 when zero), estimate from the exact HUGEINT
    harmonic sum S = sum(2^(55-rank)) so float summation order cannot
    differ from the numpy side; the double arithmetic below is written
    term-for-term as in sketches._estimate. pow(2.0, n) is exact for
    n <= 1023, and bin() emits no leading zeros, so length(bin(r))-1 is
    an exact floor-log2 at 54 bits (float log2 is not)."""
    return ("WITH RECURSIVE" + _gram_poly_ctes(k, doc_table) + f""",
  gh64 AS (SELECT doc_id, {_xs33('x')} AS h FROM wm4),
  gsrc AS (SELECT d.source, g.h FROM gh64 g JOIN {doc_table} d USING (doc_id)),
  regs AS (
    SELECT source, CAST(h >> 54 AS BIGINT) AS reg,
           MAX(CASE WHEN (h % 18014398509481984) = 0 THEN 55
                    ELSE 54 - (length(bin(h % 18014398509481984)) - 1)
               END) AS rank
    FROM gsrc GROUP BY source, reg
  ),
  hsum AS (
    SELECT source,
           SUM(CAST(pow(2.0, 55 - rank) AS HUGEINT))
             + CAST(1024 - COUNT(*) AS HUGEINT)
               * CAST(pow(2.0, 55) AS HUGEINT) AS s,
           1024 - COUNT(*) AS v
    FROM regs GROUP BY source
  ),
  raws AS (
    SELECT source, v,
           (0.7213 / (1.0 + 1.079 / 1024.0)) * 1048576.0
             * 36028797018963968.0 / CAST(s AS DOUBLE) AS raw
    FROM hsum
  )
SELECT source,
       ROUND(CASE WHEN raw <= 2560.0 AND v > 0
                  THEN 1024.0 * ln(1024.0 / v) ELSE raw END, 4) AS est_distinct
FROM raws""")


SQL_SIMHASH_NEAR_DUP_PAIRS = (
    "WITH RECURSIVE" + simhash_fp_ctes() + """,
  vals AS (SELECT simhash, MIN(doc_id) AS canon FROM fp GROUP BY simhash),
  intra AS (
    SELECT a.doc_id AS src, b.doc_id AS dst, CAST(0 AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
  ),
  cross_e AS (
    SELECT LEAST(a.canon, b.canon) AS src, GREATEST(a.canon, b.canon) AS dst,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM vals a JOIN vals b ON a.simhash < b.simhash
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
  )
  SELECT src, dst, hamming, 1.0 - hamming / 64.0 AS distance
  FROM (SELECT DISTINCT * FROM (SELECT * FROM intra UNION ALL SELECT * FROM cross_e))
"""
)


def sql_doc_embeddings(dim: int, seed: int,
                       doc_table: str = "documents") -> str:
    """Twin of stages/embed.TextEmbedStage(weights="hash_sign"), exploded
    to (doc_id, j, val) scalar rows: FNV-1a over every char-3-gram
    (h ^= byte; h *= prime, three interleaved steps — NOT the polynomial
    hash the other gram twins use) -> bucket = h % 2^16 -> per-doc bucket
    counts L2-normalized -> dot with the Rademacher +-1 matrix whose
    entry (b, j) is the low bit of mix64((b*dim + j) ^ seed). The only
    float ops are sqrt / divide / sum of identical rational doubles, so
    4-dp rounding hash-matches; `+ 0.0` normalizes IEEE -0.0 on both
    sides. Docs shorter than 3 chars embed to zeros. ASCII-only like the
    other byte-level twins (chars == utf-8 bytes on the test tables)."""
    fnv = "WITH " + _fnv_embed_chain(dim, seed, doc_table) + f""",
  alljd AS (SELECT d.doc_id, CAST(r.j AS BIGINT) AS j
            FROM {doc_table} d, unnest(range({dim})) AS r(j))
SELECT a.doc_id, a.j, ROUND(COALESCE(e.v, 0.0), 4) + 0.0 AS val
FROM alljd a LEFT JOIN femb e ON e.doc_id = a.doc_id AND e.j = a.j"""
    return fnv


def _fnv_embed_chain(dim: int, seed: int, doc_table: str) -> str:
    """Shared CTE chain for the hash_sign text encoder twins: `femb` ends
    with (doc_id, j, v) — the UNROUNDED projection of each document's
    L2-normalized FNV-1a char-3-gram bucket counts onto the Rademacher
    matrix. Used by sql_doc_embeddings and sql_zero_shot."""
    buckets = 1 << 16
    return f"""
  fdd AS (SELECT doc_id, text, length(text) AS n FROM {doc_table}),
  fpos AS (
    SELECT doc_id, text, r.i AS p
    FROM fdd, unnest(range(n - 2)) AS r(i) WHERE n >= 3
  ),
  fbyt AS (
    SELECT doc_id, p,
           CAST(ord(substring(text, CAST(p AS INTEGER) + 1, 1)) AS UBIGINT) AS b0,
           CAST(ord(substring(text, CAST(p AS INTEGER) + 2, 1)) AS UBIGINT) AS b1,
           CAST(ord(substring(text, CAST(p AS INTEGER) + 3, 1)) AS UBIGINT) AS b2
    FROM fpos
  ),
  fh1 AS (SELECT doc_id, p, b1, b2,
          {_mul(f"xor(CAST('{_FNV}' AS UBIGINT), b0)", f"CAST('{_B}' AS UBIGINT)")} AS h
          FROM fbyt),
  fh2 AS (SELECT doc_id, p, b2,
          {_mul("xor(h, b1)", f"CAST('{_B}' AS UBIGINT)")} AS h FROM fh1),
  fh3 AS (SELECT doc_id, p,
          {_mul("xor(h, b2)", f"CAST('{_B}' AS UBIGINT)")} AS h FROM fh2),
  fcnt AS (
    SELECT doc_id, CAST(h % {buckets} AS BIGINT) AS bucket,
           COUNT(*) AS c
    FROM fh3 GROUP BY doc_id, bucket
  ),
  fnrm AS (
    SELECT doc_id, sqrt(SUM(CAST(c AS DOUBLE) * CAST(c AS DOUBLE))) AS nrm
    FROM fcnt GROUP BY doc_id
  ),
  sb AS (SELECT DISTINCT bucket FROM fcnt),
  sbj AS (SELECT bucket, CAST(r.j AS BIGINT) AS j
          FROM sb, unnest(range({dim})) AS r(j)),
  {mix64_ctes(f"bucket * {dim} + j", ["bucket", "j"], "sbj", salt=seed)},
  sgn AS (SELECT bucket, j,
          CASE WHEN h5 % 2 = 1 THEN 1.0 ELSE -1.0 END AS s
          FROM mx5),
  femb AS (
    SELECT f.doc_id, s.j,
           SUM((CAST(f.c AS DOUBLE) / n.nrm) * s.s) AS v
    FROM fcnt f JOIN fnrm n USING (doc_id)
    JOIN sgn s ON s.bucket = f.bucket
    GROUP BY f.doc_id, s.j
  )"""


def sql_zero_shot(labels: list[str], protos_normed, dim: int, seed: int,
                  doc_table: str = "documents") -> str:
    """Twin of stages/enrich.ZeroShotLabelStage(weights="hash_sign"):
    document embeddings via the shared `femb` chain, unit-normalized
    (GREATEST(norm, 1e-12) mirrors the stage's np.maximum guard), then
    cosine against the UNIT-NORM prototype matrix inlined as VALUES
    constants (repr() round-trips each double exactly). Best label =
    max score, first-label tie-break (numpy argmax). Docs too short to
    embed (n < 3 chars) score 0.0 with the first label, exactly like
    the stage's zero-vector rows."""
    rows = ",\n        ".join(
        f"({li}, '{labels[li]}', {j}, {v!r})"
        for li in range(len(labels))
        for j, v in enumerate(protos_normed[li])
    )
    return "WITH " + _fnv_embed_chain(dim, seed, doc_table) + f""",
  dnrm AS (SELECT doc_id, GREATEST(sqrt(SUM(v * v)), 1e-12) AS nv
           FROM femb GROUP BY doc_id),
  evec AS (SELECT f.doc_id, f.j, f.v / n.nv AS e
           FROM femb f JOIN dnrm n USING (doc_id)),
  proto(lidx, label, j, p) AS (VALUES
        {rows}),
  scores AS (
    SELECT e.doc_id, p.lidx, p.label, SUM(e.e * p.p) AS s
    FROM evec e JOIN proto p ON p.j = e.j
    GROUP BY e.doc_id, p.lidx, p.label
  ),
  best AS (
    SELECT doc_id, label, s,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY s DESC, lidx ASC) AS rn
    FROM scores
  )
SELECT d.doc_id,
       COALESCE(b.label, '{labels[0]}') AS zs_label,
       ROUND(COALESCE(b.s, 0.0), 4) + 0.0 AS zs_score
FROM {doc_table} d
LEFT JOIN (SELECT doc_id, label, s FROM best WHERE rn = 1) b USING (doc_id)"""


def mix64_ctes(key_expr: str, carry_cols: list[str], src: str,
               salt: int = 0) -> str:
    """CTE chain computing `functions.hashing.mix64(key ^ salt)` bit-exactly
    in DuckDB: mx5 has columns (carry_cols..., h5 UBIGINT). Chained CTEs
    (one fmix64 step each) keep the generated SQL linear in size instead
    of exponentiating through nested xorshift/multiply expansion."""
    carry = ", ".join(carry_cols)
    h0 = f"xor(CAST({key_expr} AS UBIGINT), CAST('{salt % _TWO64}' AS UBIGINT))"
    steps = [
        _xs33("h0"),
        _mul("h1", f"CAST('{_M1}' AS UBIGINT)"),
        _xs33("h2"),
        _mul("h3", f"CAST('{_M2}' AS UBIGINT)"),
        _xs33("h4"),
    ]
    ctes = [f"mx0 AS (SELECT {carry}, {h0} AS h0 FROM {src})"]
    for i, expr in enumerate(steps, 1):
        ctes.append(f"mx{i} AS (SELECT {carry}, {expr} AS h{i} FROM mx{i-1})")
    return ",\n".join(ctes)


def sql_ann_ivf_topk(n_centroids: int = 16, n_queries: int = 5, k: int = 10,
                     nprobe: int = 6, iters: int = 5,
                     sample_rows: int = 20_000, salt: int = 0xA11CE,
                     scale: int = 1_000_000) -> str:
    """Full SQL twin of `q_ann_ivf_topk` with the PINNED seeded-Lloyd
    trainer (`stages/ann.train_ivf_centroids_pinned`): the training
    sample is the `sample_rows` smallest `mix64(vec_id ^ salt)` rows,
    init = first `n_centroids` of them in (hash, vec_id) order, vectors
    are L2-normalized then quantized to an integer grid so each unrolled
    Lloyd iteration (argmin of ||c||^2 - 2<e,c>, round-half-up integer
    mean update) is EXACT arithmetic on both engines. The probe/top-k
    tail is the SQL_IVF_PROBE_TOPK shape over the trained centroids
    (list_cosine_similarity is norm-invariant, so the un-normalized
    integer-grid centroids give the same ordering as the normalized
    float centroids the Ray side hands to ivf_assign/ivf_topk)."""
    parts = [mix64_ctes("vec_id", ["vec_id"], "embeddings", salt)]
    parts.append(f"""samp AS MATERIALIZED (
  SELECT vec_id, h5 FROM mx5 ORDER BY h5 ASC, vec_id ASC LIMIT {sample_rows}
),
sampo AS MATERIALIZED (
  SELECT s.vec_id, row_number() OVER (ORDER BY s.h5, s.vec_id) - 1 AS rn,
         e.embedding
  FROM samp s JOIN embeddings e USING (vec_id)
),
ev AS MATERIALIZED (
  SELECT vec_id, rn, generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding)::DOUBLE AS val
  FROM sampo
),
nrm AS MATERIALIZED (SELECT vec_id, sqrt(sum(val*val)) AS n FROM ev GROUP BY vec_id),
eq AS MATERIALIZED (
  SELECT ev.vec_id, ev.rn, ev.dim,
         CAST(floor(ev.val / (CASE WHEN n.n = 0 THEN 1 ELSE n.n END)
                    * {scale} + 0.5) AS BIGINT) AS q
  FROM ev JOIN nrm n USING (vec_id)
),
c0 AS MATERIALIZED (SELECT rn AS cell, dim, q AS cq FROM eq WHERE rn < {n_centroids})""")
    for i in range(iters):
        parts.append(f"""d{i} AS MATERIALIZED (
  SELECT e.vec_id, c.cell, sum(e.q * c.cq) AS dt
  FROM eq e JOIN c{i} c USING (dim) GROUP BY 1, 2
),
n{i} AS MATERIALIZED (SELECT cell, sum(cq*cq) AS c2 FROM c{i} GROUP BY 1),
a{i} AS MATERIALIZED (
  SELECT d.vec_id, d.cell
  FROM d{i} d JOIN n{i} n USING (cell)
  QUALIFY row_number() OVER (
    PARTITION BY d.vec_id ORDER BY n.c2 - 2*d.dt ASC, d.cell ASC) = 1
),
u{i} AS MATERIALIZED (
  SELECT a.cell, e.dim,
         CAST(floor((2.0*sum(e.q) + count(*)) / (2.0*count(*))) AS BIGINT)
           AS cq
  FROM a{i} a JOIN eq e USING (vec_id) GROUP BY 1, 2
),
c{i+1} AS MATERIALIZED (
  SELECT p.cell, p.dim, COALESCE(u.cq, p.cq) AS cq
  FROM c{i} p LEFT JOIN u{i} u ON u.cell = p.cell AND u.dim = p.dim
)""")
    parts.append(f"""cent AS MATERIALIZED (
  SELECT cell, list(cq / {scale}.0 ORDER BY dim) AS embedding
  FROM c{iters} GROUP BY cell
),
q AS MATERIALIZED (SELECT vec_id AS query_id, embedding FROM embeddings
      WHERE vec_id < {n_queries}),
assigned AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, c.cell
  FROM embeddings e JOIN cent c ON TRUE
  QUALIFY row_number() OVER (
    PARTITION BY e.vec_id
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding) DESC,
             c.cell ASC
  ) = 1
),
probes AS MATERIALIZED (
  SELECT q.query_id, c.cell
  FROM q JOIN cent c ON TRUE
  QUALIFY row_number() OVER (
    PARTITION BY q.query_id
    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding) DESC,
             c.cell ASC
  ) <= {nprobe}
)""")
    body = ",\n".join(parts)
    return f"""WITH
{body}
SELECT p.query_id, a.vec_id AS neighbor_id,
       ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                    a.embedding::DOUBLE[]), 5) AS cosine
FROM probes p
JOIN assigned a ON a.cell = p.cell
JOIN q ON q.query_id = p.query_id
WHERE a.vec_id != p.query_id
QUALIFY row_number() OVER (
  PARTITION BY p.query_id
  ORDER BY ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                        a.embedding::DOUBLE[]), 5) DESC,
           a.vec_id ASC
) <= {k}"""
