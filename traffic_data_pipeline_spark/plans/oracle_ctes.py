"""Shared DuckDB-oracle CTE strings over `documents`, in a module with
NO plans-package imports: both plans/extensions.py and
plans/analysis_ops.py compose oracles from these, and keeping them here
makes the strings importable regardless of which plans module the
interpreter happens to load first (plans/queries.py's tail imports every
registration module, so a user importing plans.extensions directly would
otherwise hit a partially-initialized sibling)."""

_DOC_CTES = """
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
  FROM documents),
toks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
    FROM documents)
  WHERE token != ''),
sh AS (
  SELECT DISTINCT doc_id, substr(norm, g, 5) AS shingle
  FROM norm, unnest(generate_series(1, greatest(length(norm) - 4, 1))) t(g))
"""

_MINHASH_CTES = _DOC_CTES + """,
sigs AS (
  SELECT doc_id, s.i,
         MIN(md5(CAST(s.i AS VARCHAR) || ':' || shingle)) AS h
  FROM sh, (SELECT unnest(generate_series(0, 7)) AS i) s
  GROUP BY 1, 2),
wide AS (
  SELECT doc_id,
         MIN(CASE WHEN i = 0 THEN h END) AS h0, MIN(CASE WHEN i = 1 THEN h END) AS h1,
         MIN(CASE WHEN i = 2 THEN h END) AS h2, MIN(CASE WHEN i = 3 THEN h END) AS h3,
         MIN(CASE WHEN i = 4 THEN h END) AS h4, MIN(CASE WHEN i = 5 THEN h END) AS h5,
         MIN(CASE WHEN i = 6 THEN h END) AS h6, MIN(CASE WHEN i = 7 THEN h END) AS h7
  FROM sigs GROUP BY 1),
band_long AS (
  SELECT doc_id, h0, h1, h2, h3, h4, h5, h6, h7,
         unnest([md5(concat_ws('|', 'b0', h0, h1)),
                 md5(concat_ws('|', 'b1', h2, h3)),
                 md5(concat_ws('|', 'b2', h4, h5)),
                 md5(concat_ws('|', 'b3', h6, h7))]) AS band_key
  FROM wide)
"""

# DuckDB twin of functions.text.token_array (per-doc token LIST, in-row)
_TOK_LIST_CTE = """
tl AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') AS l
  FROM documents)
"""

# 8-token-gram shingle stream over the token lists — shared by the exact
# decontamination oracle (plans/llm_ops.py) and its Bloom scale twin
# (plans/analysis_ops.py), so a tokenizer or gram-width change can never
# silently diverge the pair that is property-tested against each other.
_GRAMS8_CTE = _TOK_LIST_CTE + """,
grams AS (
  SELECT DISTINCT doc_id, array_to_string(l[g:g+7], ' ') AS gram
  FROM tl, unnest(generate_series(1, greatest(len(l) - 7, 0))) s(g))
"""


def mh_eq_sum(a: str = "a", b: str = "b") -> str:
    """The 8-term MinHash agreement sum between two band_long aliases —
    the ONE spelling of 'how many signature components agree', shared by
    every LSH-family oracle so an N_MINHASH change edits one site."""
    return " + ".join(f"CAST({a}.h{i} = {b}.h{i} AS INTEGER)" for i in range(8))


# Standard corpus self-pairing over the banded index: one row per
# candidate pair with its raw agreement count. Consumers derive
# est_sim = agree / 8.0 and filter at their threshold.
_MH_PAIRS_CTE = f"""
mpairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ({mh_eq_sum()}) AS agree
  FROM band_long a JOIN band_long b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
"""


# Embedding spread + norms: elems = (vec_id, pos, val) with decimal-exact
# norm accumulation — composed by every embedding oracle in extensions.py
# AND the staged PQ/margin oracles (staged_ops.py), so a change to the
# DECIMAL(30,12) accumulation edits one site and neither module needs to
# import the other (that edge would close an import cycle through
# queries.py's tail).
_EMB_CTES = """
elems AS (
  SELECT vec_id, t.i AS pos, CAST(embedding[t.i] AS DOUBLE) AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)),
norms AS (
  SELECT vec_id, CAST(SUM(CAST(val * val AS DECIMAL(30,12))) AS DOUBLE) AS norm_sq
  FROM elems GROUP BY 1)
"""

# Full doc_lm_score oracle (CCNet-style add-one-smoothed bigram LM mean
# log-prob per doc) — registered verbatim by plans/llm_ops.py and
# composed as a subquery by the staged perplexity-tercile oracle
# (staged_ops.py), which previously read ORACLES["doc_lm_score"] at
# module-body time and broke when llm_ops was the first plans module
# imported (its registrations land only after its own body resumes).
_LM_SCORE_SQL = f"""
WITH {_TOK_LIST_CTE},
big AS (
  SELECT doc_id, array_to_string(l[g:g+1], ' ') AS bigram
  FROM tl, unnest(generate_series(1, greatest(len(l) - 1, 0))) s(g)),
bgc AS (SELECT bigram, COUNT(*) AS c_bg FROM big GROUP BY 1),
pre AS (
  SELECT split_part(bigram, ' ', 1) AS w1, CAST(SUM(c_bg) AS BIGINT) AS c_pre
  FROM bgc GROUP BY 1),
vocab AS (
  SELECT CAST(COUNT(DISTINCT u.token) AS BIGINT) AS v
  FROM (SELECT unnest(l) AS token FROM tl) u),
probs AS (
  SELECT b.bigram, ln((b.c_bg + 1.0) / (p.c_pre + v.v)) AS logp
  FROM bgc b
  JOIN pre p ON p.w1 = split_part(b.bigram, ' ', 1)
  CROSS JOIN vocab v)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(CAST(pr.logp AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS lm_score
FROM big g JOIN probs pr ON pr.bigram = g.bigram
GROUP BY 1
"""


# BM25 constants + base CTE text — shared by the live BM25 oracle
# (plans/search_ops.py) and the staged RRF-fusion oracle
# (plans/staged_ops.py), which builds its oracle at module-body time and
# therefore cannot import search_ops (partially initialized when
# search_ops itself is the first plans module imported).
BM25_TERMS = ("spark", "join", "vector", "stream")
BM25_K1 = 1.2
BM25_B = 0.75

_BM25_BASE_SQL = """
tl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
base AS (
  SELECT doc_id, len(l) AS doclen,
         {tf_cols}
  FROM tl),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(doclen) AS DOUBLE) / COUNT(*) AS avgdl,
         {df_cols}
  FROM base)
"""


# Brute-force query-vs-corpus cosine CTEs over the _EMB_CTES frames
# (moved from plans/extensions.py in round 6 so staged-module oracle
# builders can import them without the extensions -> queries ->
# staged_ops_r6 circular-import hazard).
KNN_QUERY_IDS = list(range(10))

# 8-plane hyperplane-LSH bucket codes over the _EMB_CTES frames — the
# plane weights mirror functions/similarity._plane_dot exactly. Spelled
# ONCE here; plans/extensions.py re-exports it (the _EMB_CTES pattern).
_LSH_CODES_CTES = """pd AS (
  SELECT e.vec_id, p.p,
         CAST(SUM(CAST(e.val * (((p.p * 73856093 + e.pos * 19349663) % 1000003)
                                / 1000003.0 - 0.5) AS DECIMAL(30,12))) AS DOUBLE) AS dot
  FROM elems e, (SELECT unnest(generate_series(0, 7)) AS p) p
  GROUP BY 1, 2),
codes AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
  FROM pd GROUP BY 1)"""


# _EMB_CTES is single-sourced in plans/oracle_ctes.py and re-exported via
# the `# noqa: F401` import block at the top of this module (ADVICE r5:
# the former self-assignment here was a no-op).

# Brute-force query-vs-corpus cosine CTEs (q/dots/cos) and the 4x16-bit
# hyperplane code CTEs (pd/codes[/cand/cdots]) — each spelled ONCE and
# composed by every embedding oracle, so a change to the plane constants,
# the DECIMAL(30,12) accumulation, or the tie-break edits one site
# (the _MH_PAIRS_CTE/_GRAMS8_CTE precedent).
_COS_CTES = f"""q AS (SELECT * FROM elems WHERE vec_id IN ({", ".join(map(str, KNN_QUERY_IDS))})),
dots AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         CAST(SUM(CAST(q.val * c.val AS DECIMAL(30,12))) AS DOUBLE) AS dot
  FROM q JOIN elems c ON q.pos = c.pos
  GROUP BY 1, 2),
cos AS (
  SELECT d.q_id, d.c_id,
         d.dot / (sqrt(qn.norm_sq) * sqrt(cn.norm_sq)) AS cosine
  FROM dots d
  JOIN norms qn ON qn.vec_id = d.q_id
  JOIN norms cn ON cn.vec_id = d.c_id
  WHERE d.q_id != d.c_id)"""


# Full doc_lang_id oracle (stopword-vote language heuristic) — registered
# verbatim by plans/extensions.py and composed as a subquery by the
# round-6 confusion-matrix oracle (staged_ops_r6.py), which previously
# read ORACLES["doc_lang_id"] at module-body time and broke when
# extensions was the first plans module imported (the _LM_SCORE_SQL
# precedent, same fix). functions.text is not a plans module, so the
# no-plans-imports rule holds.
from traffic_data_pipeline_spark.functions.text import (  # noqa: E402
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_ES,
)


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


_LANG_ID_SQL = f"""
WITH {_DOC_CTES}
SELECT doc_id,
       CAST(SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_EN)}) THEN 1 ELSE 0 END) AS BIGINT) AS en_hits,
       CAST(SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_ES)}) THEN 1 ELSE 0 END) AS BIGINT) AS es_hits,
       CAST(SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_DE)}) THEN 1 ELSE 0 END) AS BIGINT) AS de_hits,
       CASE WHEN SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_EN)}) THEN 1 ELSE 0 END) = 0
             AND SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_ES)}) THEN 1 ELSE 0 END) = 0
             AND SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_DE)}) THEN 1 ELSE 0 END) = 0 THEN 'und'
            WHEN SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_EN)}) THEN 1 ELSE 0 END)
                 >= SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_ES)}) THEN 1 ELSE 0 END)
             AND SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_EN)}) THEN 1 ELSE 0 END)
                 >= SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_DE)}) THEN 1 ELSE 0 END) THEN 'en'
            WHEN SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_ES)}) THEN 1 ELSE 0 END)
                 >= SUM(CASE WHEN token IN ({_sql_list(STOPWORDS_DE)}) THEN 1 ELSE 0 END) THEN 'es'
            ELSE 'de' END AS lang_pred
FROM toks GROUP BY doc_id
"""
