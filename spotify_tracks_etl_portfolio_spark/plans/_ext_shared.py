"""Shared plumbing for the extension query families: session/artifact
scratch roots, bucketed-table naming, and the oracle SQL fragments more
than one family replays."""



from __future__ import annotations



import os

import tempfile

import uuid

from pyspark.sql import DataFrame, SparkSession

from spotify_tracks_etl_portfolio_spark.operators import dedup as _dd  # noqa: E402

from spotify_tracks_etl_portfolio_spark.operators import text as _tx  # noqa: E402



def _session_scratch(spark: SparkSession, name: str) -> str:
    """Session-scoped scratch dir for queries that must materialize an
    intermediate sink (streaming gates, interchange round-trips). Keyed
    by Spark application id under the OS temp root, so the written data
    outlives the query call and the result can be returned as a LAZY
    ``spark.read`` — no ``.collect()`` through the driver. On a cluster
    this would be a warehouse/object-store path; the whole tree dies
    with the OS temp dir."""
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_scratch",
        spark.sparkContext.applicationId,
    )
    path = os.path.join(base, f"{name}_{uuid.uuid4().hex[:8]}")
    os.makedirs(path, exist_ok=True)
    return path



def _artifact_root(spark: SparkSession, name: str, key: str) -> str:
    """DETERMINISTIC per-(session, artifact, key) path — unlike
    ``_session_scratch`` there is no per-call uuid, so build-once/
    query-many reuse actually fires: the same session asking for the
    same artifact over the same input gets the same directory. ``key``
    must pin everything the artifact derives from (for the persisted
    indexes: the resolved sf_dir — driver testdata is immutable per
    scale factor, and the applicationId prefix fences off any cross-
    session staleness). The dir itself is NOT created here: callers
    build into a temp sibling and atomically ``os.rename`` onto this
    path, so a half-built artifact is never observable at the root."""
    import hashlib

    digest = hashlib.sha1(key.encode("utf-8")).hexdigest()[:12]
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_scratch",
        spark.sparkContext.applicationId,
    )
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, f"{name}_{digest}")



def _build_artifact_once(root: str, marker: str, build) -> None:
    """Run ``build(tmp_path)`` then atomically publish ``tmp_path`` at
    ``root`` — unless ``root/marker`` already exists (reuse). A lost
    rename race (concurrent builder won) discards our copy; the winner's
    artifact is equivalent by construction (deterministic build). Any
    OTHER rename failure (EXDEV, permissions) re-raises instead of
    silently swallowing the artifact, and a failed ``build`` never
    leaks its tmp tree."""
    import shutil

    if os.path.isdir(os.path.join(root, marker)):
        return
    tmp = f"{root}.build_{uuid.uuid4().hex[:8]}"
    try:
        build(tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.rename(tmp, root)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        # a lost race is the only benign cause: the winner's equivalent
        # artifact must now be present — otherwise this was a genuine
        # failure (cross-device rename, permissions) and hiding it would
        # surface later as an unreadable index
        if not os.path.isdir(os.path.join(root, marker)):
            raise



#: Shared DuckDB CTEs: whitespace tokens → per-token rolling char hash →
#: k-shingle hash = polynomial combine of the k token hashes (mirrors
#: operators/dedup.py shingle_hash_arrays — SAME constants, SAME fold).
_B = _dd.SHINGLE_B



_M = 1_000_000_007  # FINGERPRINT_MOD



_SHINGLE_CTES = f"""
toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
),
th AS (
  SELECT doc_id,
         list_transform(w, t -> list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(t, ''),
                                       c -> CAST(ascii(c) AS BIGINT))),
           (a, b) -> (a * 31 + b) % {_M})) AS th
  FROM toks
),
shh AS (
  SELECT DISTINCT doc_id, h FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(th) >= {_dd.SHINGLE_K}
                  THEN list_distinct(
                    [((th[i] * {_B} + th[i+1]) % {_M} * {_B} + th[i+2]) % {_M}
                     for i in range(1, len(th) - 1)])
                  ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT), th),
                                    (a, b) -> (a * {_B} + b) % {_M})]
                  END) AS h
    FROM th
  )
)
"""



_JACCARD_CTES = f"""
{_SHINGLE_CTES},
sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b,
         round(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
  FROM pairs
  JOIN sizes sa ON id_a = sa.doc_id
  JOIN sizes sb ON id_b = sb.doc_id
)
"""



JACCARD_THRESHOLD = 0.5



def _minhash_sig_sql() -> str:
    cols = ", ".join(
        f"min((h * {a} + {b}) % {_dd.MINHASH_P}) AS mh_{i}"
        for i, (a, b) in enumerate(_dd.MINHASH_COEFFS)
    )
    return f"sigs AS (SELECT doc_id, {cols} FROM shh GROUP BY doc_id)"



def _minhash_bands_sql() -> str:
    selects = []
    for bi in range(_dd.LSH_BANDS):
        sig = " || '_' || ".join(
            f"CAST(mh_{bi * _dd.LSH_ROWS + r} AS VARCHAR)"
            for r in range(_dd.LSH_ROWS)
        )
        selects.append(f"SELECT doc_id, {bi} AS band, {sig} AS sig FROM sigs")
    return "bands AS (" + " UNION ALL ".join(selects) + ")"



def _sql_cos(ae: str, be: str) -> str:
    """6-dp-rounded cosine in DuckDB, clamped denominators — mirrors
    ``functions.cosine_similarity`` + the probe's 1e-12 norm clamp."""
    return (
        f"round(list_dot_product({ae}, {be}) / "
        f"(greatest(sqrt(list_dot_product({ae}, {ae})), 1e-12) * "
        f"greatest(sqrt(list_dot_product({be}, {be})), 1e-12)), 6)"
    )



def _kmeans_cent_ctes(
    k: int | str,
    iters: int,
    src: str = "v",
    prefix: str = "",
    asg_src: str | None = None,
) -> tuple[list[str], str]:
    """SQL replay of the engine's deterministic Lloyd's k-means
    (``operators/similarity.py::kmeans_centroids``) — possible because
    it has NO RNG anywhere (smallest-id seed rows, 6-dp-rounded cosine
    assignment with smallest-cell ties, per-dimension mean update,
    empty cells keep their centroid). The iteration count is a
    compile-time constant, so the loop unrolls into a CTE chain
    cent0 → (asg_t, means_t, cent_t)×iters. Returns (ctes,
    final_cent_name); callers append their own consumers. Assumes a
    CTE ``{src}(vec_id, e)`` with DOUBLE[] embeddings; ``prefix``
    namespaces the chain so several replays (e.g. one per PQ subspace)
    coexist in one statement.

    ``k`` may be an int literal OR an SQL scalar expression string
    (e.g. a subquery replaying ``auto_semdedup_k(COUNT(*))``): every
    CTE after cent0 is k-agnostic — it operates per cell — so a
    data-derived k only changes the seed filter (round-7 verdict
    item 1: the recorded auto-geometry plan replays exactly because
    the auto formula is a deterministic closed form).

    ``asg_src``: optional distinct source for the FINAL assignment CTE
    only — the incremental-index replay (train on the frozen base,
    assign the base+appended union against the frozen centroids);
    training iterations always run over ``src``."""

    def argmax_cell(cent: str, out: str, over: str = src) -> str:
        return f"""{out} AS MATERIALIZED (
  SELECT vec_id, e, cell FROM (
    SELECT v.vec_id, v.e, ct.cell,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_sql_cos('v.e', 'ct.c')} DESC,
                                       ct.cell ASC) AS rn
    FROM {over} v, {cent} ct) WHERE rn = 1
)"""

    if isinstance(k, int):
        seed = f"""{prefix}cent0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, e AS c
  FROM {src} ORDER BY vec_id LIMIT {k}
)"""
    else:
        seed = f"""{prefix}cent0 AS MATERIALIZED (
  SELECT cell, c FROM (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, e AS c
    FROM {src}) WHERE cell < ({k})
)"""
    ctes = [seed]
    prev = f"{prefix}cent0"
    for t in range(1, iters + 1):
        ctes.append(argmax_cell(prev, f"{prefix}asg{t}"))
        # mean update sums 9-dp FIXED-POINT BIGINTs — mirrors the
        # engine's partition-order-independent Lloyd mean
        # (operators/similarity.py::_fixed_point_mean; round-7 advice
        # item). Op order matches the engine verbatim:
        # sum(long) → double, / scale, / count — all IEEE-exact
        # replayable steps.
        ctes.append(f"""{prefix}means{t} AS MATERIALIZED (
  SELECT cell, d,
         CAST(SUM(CAST(round(e[d] * 1000000000) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / count(*) AS m
  FROM {prefix}asg{t}, unnest(range(1, len(e) + 1)) AS t(d)
  GROUP BY cell, d
)""")
        ctes.append(f"""{prefix}cent{t} AS MATERIALIZED (
  SELECT p.cell, coalesce(m.c, p.c) AS c
  FROM {prev} p LEFT JOIN (
    SELECT cell, list(m ORDER BY d) AS c FROM {prefix}means{t} GROUP BY cell
  ) m USING (cell)
)""")
        prev = f"{prefix}cent{t}"
    ctes.append(argmax_cell(prev, f"{prefix}final_asg", asg_src or src))
    return ctes, prev



def _lang_sql() -> tuple[str, str]:
    scores = []
    for lang, markers in _tx.LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        scores.append(
            f"len(list_filter(w, t -> t IN ({lst}))) AS s_{lang}"
        )
    best = ", ".join(f"s_{lang}" for lang in _tx.LANG_MARKERS)
    whens = " ".join(
        f"WHEN s_{lang} = best AND best > 0 THEN '{lang}'"
        for lang in _tx.LANG_MARKERS
    )
    return (
        f"scored AS (SELECT doc_id, lang, {', '.join(scores)} FROM toks2),\n"
        f"best AS (SELECT *, greatest({best}) AS best FROM scored)",
        f"CASE {whens} ELSE 'und' END",
    )



_LANG_CTES, _LANG_CASE = _lang_sql()



def _quality_ctes(src: str) -> str:
    """f/g/h quality-feature CTE block over any (doc_id, text) source —
    shared between the standalone scoring query and the curation
    pipeline so the formula exists exactly once."""
    return f"""
f AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS w,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit
  FROM {src}
),
g AS (
  SELECT doc_id,
         len(w) AS n_tok,
         len(list_filter(w, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
         n_chars, n_punct, n_digit
  FROM f
),
h AS (
  SELECT doc_id,
         CAST(n_tok AS BIGINT) AS n_tokens,
         round(n_stop * 1.0 / greatest(n_tok, 1), 6) AS stopword_ratio,
         round(n_punct * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
         round(n_digit * 1.0 / greatest(n_chars, 1), 6) AS digit_ratio
  FROM g
)"""



_QUALITY_EXPR = (
    "round((CASE WHEN n_tokens >= 5 AND n_tokens <= 5000 THEN 1.0 ELSE 0.3 END) * 0.5"
    " + least(stopword_ratio * 4.0, 1.0) * 0.3"
    " + (1.0 - least((punct_ratio + digit_ratio) * 2.0, 1.0)) * 0.2, 6)"
)



def _utf8_bytes_sql(txt: str) -> str:
    """DuckDB list of the UTF-8 BYTE values of a string column.

    The multimodal encoders operate on ``text.encode('utf-8')`` — i.e.
    bytes — while DuckDB's ``ascii(c)`` yields the CODE POINT per
    character, which only coincides with the byte value for pure-ASCII
    input (round-3 advice). Expanding each code point into its UTF-8
    byte sequence makes the oracle's byte geometry (sums, slices,
    lengths) exact for ANY input, so ``len(<this>)`` also equals
    ``octet_length(encode(text))``."""
    u = "unicode(c)"
    return f"""flatten(list_transform(
      list_filter(string_split({txt}, ''), c -> c != ''), c ->
      CASE
        WHEN {u} < 128 THEN [CAST({u} AS BIGINT)]
        WHEN {u} < 2048 THEN [
          CAST(192 + ({u} // 64) AS BIGINT),
          CAST(128 + ({u} % 64) AS BIGINT)]
        WHEN {u} < 65536 THEN [
          CAST(224 + ({u} // 4096) AS BIGINT),
          CAST(128 + (({u} // 64) % 64) AS BIGINT),
          CAST(128 + ({u} % 64) AS BIGINT)]
        ELSE [
          CAST(240 + ({u} // 262144) AS BIGINT),
          CAST(128 + (({u} // 4096) % 64) AS BIGINT),
          CAST(128 + (({u} // 64) % 64) AS BIGINT),
          CAST(128 + ({u} % 64) AS BIGINT)]
      END))"""



#: DuckDB form of functions.rolling_hash — same constants (31, 1e9+7).
_FP_SQL = """list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000000007
       )"""



def _gopher_sig_sql(src: str = "documents") -> str:
    """The Gopher rule-signal CTE chain (``base`` → ``sig``) over any
    ``(doc_id, text)`` source — shared by the standalone gate query and
    the curation-v3 composition."""
    return f"""base AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS w,
         string_split(text, chr(10)) AS l,
         CAST(len(regexp_extract_all(text, '#')) AS BIGINT) AS n_hash,
         CAST(len(regexp_extract_all(text, '\\.\\.\\.')) +
              len(regexp_extract_all(text, '…')) AS BIGINT) AS n_ellsym
  FROM {src}
),
sig AS (
  SELECT doc_id, n_hash, n_ellsym,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(w,
              x -> CAST(length(x) AS BIGINT))), 0) AS BIGINT) AS csum,
         CAST(len(l) AS BIGINT) AS n_lines,
         CAST(len(list_filter(l,
              x -> regexp_matches(x, '^\\s*[-*•]'))) AS BIGINT) AS n_bullet,
         CAST(len(list_filter(l,
              x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$'))) AS BIGINT) AS n_ell,
         CAST(len(list_filter(w,
              x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
         CAST(len(list_filter(
              ['the','be','to','of','and','that','have','with'],
              s -> list_contains(list_transform(w, x -> lower(x)), s)))
           AS BIGINT) AS n_stop
  FROM base
)"""



def _gopher_pass_sql(stopword_min: int = 2) -> str:
    """The composite pass predicate over the ``sig`` CTE's columns
    (``stopword_min`` mirrors ``gopher_rules``'s knob)."""
    return f"""(n_words BETWEEN 50 AND 100000)
         AND (n_words > 0 AND 3 * n_words <= csum AND csum <= 10 * n_words)
         AND (10 * n_hash <= n_words AND 10 * n_ellsym <= n_words)
         AND (10 * n_bullet <= 9 * n_lines)
         AND (10 * n_ell <= 3 * n_lines)
         AND (5 * n_alpha >= 4 * n_words)
         AND (n_stop >= {stopword_min})"""



def _dup_ngram_sql(n: int) -> str:
    return f"""CASE WHEN len(w) - {n} + 1 >= 1 THEN
      round(1.0 - len(list_distinct(list_transform(
                range(1, len(w) - {n} + 2),
                i -> array_to_string(w[i:(i+{n}-1)], ' '))))
            * 1.0 / (len(w) - {n} + 1), 6)
    ELSE 0.0 END"""



_XS = _dd.EXACT_SUBSTR_TOKENS



#: Shared oracle CTE chain for the ExactSubstr family: stride-1 k-token
#: windows, global first-occurrence via an unordered struct-min window
#: (DuckDB struct comparison is field-order lexicographic, same as
#: Spark's), gaps-and-islands merge of flagged starts (equal-width spans
#: merge iff the start gap <= k).
_XGRAM_CTES = f"""
tb AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
),
g AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:(i+{_XS}-1)], ' ') AS kg
  FROM tb, unnest(range(1, len(w) - {_XS} + 2)) AS t(i)
  WHERE len(w) >= {_XS}
)"""



#: Island merge given a ``flagged(doc_id, pos)`` CTE — the SQL twin of
#: operators/dedup.py::_flagged_to_spans.
_XSPAN_MERGE_CTES = f"""
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {_XS} THEN 0 ELSE 1 END AS b
  FROM flagged
),
isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS island
  FROM brk
),
spans AS (
  SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(pos) + {_XS} - 1 AS BIGINT) AS span_end
  FROM isl GROUP BY doc_id, island
)"""



_XSUBSTR_CTES = f"""{_XGRAM_CTES},
flagged AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           min(struct_pack(d := doc_id, p := pos)) OVER (PARTITION BY kg) AS f
    FROM g)
  WHERE struct_pack(d := doc_id, p := pos) <> f
),{_XSPAN_MERGE_CTES}"""



def _bucketed_table_name(spark: SparkSession, prefix: str, key: str) -> str:
    """Deterministic per-(application, key) catalog-table name for a
    bucketed serve artifact. The applicationId is part of the digest —
    the table's data lives under the applicationId-scoped
    ``_artifact_root``, so under a PERSISTENT metastore (hive support)
    a name scoped only by key could pass ``tableExists`` while pointing
    at a prior application's vanished temp directory (round-11 advice).
    App-scoping the name makes ``tableExists`` a sound build-once
    marker in every catalog implementation."""
    import hashlib

    app = spark.sparkContext.applicationId
    digest = hashlib.sha1(f"{key}|{app}".encode()).hexdigest()[:12]
    return f"{prefix}_{digest}"



#: Per-token polynomial rolling hash (DuckDB side) — shared expression.
_TOKEN_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({t}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    "(a, b) -> (a * 31 + b) % 1000000007)"
)


