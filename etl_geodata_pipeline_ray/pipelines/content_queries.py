"""Training-data / content operators catalog: text analysis, dedup
family, similarity search, multimodal plumbing — over ``documents`` /
``embeddings`` (+ media derived from them). Nearly every entry carries
a DuckDB oracle — including brute-force ground-truth oracles for the
LSH dedup paths (q25/q29) and a deterministic SQL reproduction of the
langid heuristic (q27); the few rows-only entries (simhash histogram,
fingerprints, decode-stub features, CC clusters) are verified by
property tests in tests/test_content_ops.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Mean

from ..stages.dedup import (
    embedding_near_dupes,
    exact_dedup,
    minhash_dedup_groups,
    simhash_near_dupes,
)
from ..stages.similarity import cosine_topk, ivf_topk
from ..stages.text import Fingerprinter, LangId, QualityScorer, token_stats


def _docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    from ..io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def _embs(sf_dir: str) -> ray.data.Dataset:
    from ..io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------- q21
def q21_token_stats(sf_dir: str) -> pd.DataFrame:
    """Token counting (whitespace) per language — one vectorized regex
    kernel per batch, partial sums before the tiny groupby."""
    ds = _docs(sf_dir, ["lang", "text"])
    return token_stats(ds, "text", "lang").to_pandas()


Q21_SQL = r"""
SELECT lang,
       CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
       count(*) AS n_docs
FROM documents GROUP BY 1
"""

# ---------------------------------------------------------------- q22
def q22_doc_quality(sf_dir: str) -> pd.DataFrame:
    """Quality scoring per source: avg tokens + avg chars-per-token."""
    ds = _docs(sf_dir, ["source", "text"])
    scored = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=(1, 8))
    out = (
        scored.groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Mean("n_tokens", alias_name="avg_tokens"),
            Mean("chars_per_token", alias_name="avg_cpt"),
        )
        .to_pandas()
    )
    out["avg_tokens"] = (out["avg_tokens"] + 0.0).round(4)
    out["avg_cpt"] = (out["avg_cpt"] + 0.0).round(4)
    return out


Q22_SQL = r"""
WITH q AS (
  SELECT source,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         length(replace(text, ' ', '')) AS dense
  FROM documents)
SELECT source, count(*) AS n_docs,
       round(avg(n_tokens), 4) AS avg_tokens,
       round(avg(round(dense / n_tokens, 4)), 4) AS avg_cpt
FROM q GROUP BY 1
"""

# ---------------------------------------------------------------- q23
def q23_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup (hash-partitioned keep-min-id) then per-lang counts
    of surviving docs."""
    ds = _docs(sf_dir, ["doc_id", "lang", "text"])
    kept = exact_dedup(ds, "text", "doc_id")
    return kept.groupby("lang").aggregate(Count(alias_name="n_unique")).to_pandas()


Q23_SQL = """
WITH kept AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                 FROM documents) WHERE rn = 1)
SELECT lang, count(*) AS n_unique FROM kept GROUP BY 1
"""

# ---------------------------------------------------------------- q24
_ANN_QUERY_IDS = [0, 1, 2]


def q24_ann_cosine(sf_dir: str) -> pd.DataFrame:
    """Exact brute-force cosine top-10 per query vector (broadcast
    query matrix, per-batch float64 matmul, per-batch local top-k)."""
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mask = np.isin(np.asarray(qt["vec_id"]), _ANN_QUERY_IDS)
    qrows = qt.filter(pa.array(mask)).sort_by("vec_id")
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qrows["embedding"].to_pylist()])
    return cosine_topk(
        _embs(sf_dir), Q, list(np.asarray(qrows["vec_id"])), k=10, dim=Q.shape[1]
    )


Q24_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id IN (0, 1, 2))
SELECT query_id, vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[])), 4) AS cos
FROM embeddings, q
WHERE vec_id != query_id
QUALIFY row_number() OVER (PARTITION BY query_id
    ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[])) DESC, vec_id) <= 10
"""

def q25_minhash_near_dupes(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH near-dup PAIRS with exact word-3-shingle Jaccard ≥
    0.8: LSH banding proposes candidates distributed, verification is
    a distributed shuffle_join back to texts + exact set Jaccard. The
    oracle brute-forces the same exact Jaccard in SQL — a full
    value-hash check of candidate recall AND verification."""
    from ..stages.dedup import minhash_near_dup_pairs

    ds = _docs(sf_dir, ["doc_id", "text"])
    out = minhash_near_dup_pairs(ds, threshold=0.8).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q25_SQL = r"""
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
s AS (SELECT doc_id,
        list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
          ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
        END) AS sh
      FROM w)
SELECT a, b, jac AS jaccard FROM (
  SELECT x.doc_id AS a, y.doc_id AS b,
         round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
               (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 4) AS jac
  FROM s x JOIN s y ON x.doc_id < y.doc_id)
WHERE jac >= 0.8 ORDER BY 1, 2
"""


def q26_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    """SimHash banded near-dup pairs (Hamming ≤ 3) over a stable doc
    slice, summarized as a per-distance histogram. Token hashes use
    md5 (little-endian first 8 bytes == DuckDB ``md5_number_upper``),
    so the oracle recomputes the full 64-bit simhash AND the
    brute-force pair histogram in SQL — any pair within Hamming ≤ 3
    shares ≥1 exact 16-bit band (pigeonhole), so the banded engine
    output must equal brute force exactly. The slice (doc_id < 200)
    bounds the quadratic bucket verify on this shared-vocabulary
    corpus where Hamming ≤ 3 is non-selective."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.filter(pa.compute.less(t["doc_id"], pa.scalar(200))),
        batch_format="pyarrow",
    )
    # simhash_near_dupes returns a Dataset (no driver gather of the
    # unbounded pair set); the distributed histogram is the only thing
    # that reaches the driver
    pairs = simhash_near_dupes(ds, max_hamming=3, hash_fn="md5")
    out = pairs.groupby("hamming").aggregate(Count(alias_name="n_pairs")).to_pandas()
    out = out.sort_values("hamming").reset_index(drop=True)
    return out.astype({"hamming": "int64", "n_pairs": "int64"})


Q26_SQL = r"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM d),
h AS (SELECT doc_id, md5_number_upper(w) AS hv FROM tok),
bits AS (
  SELECT doc_id, b.x AS bit,
         sum(CASE WHEN (hv >> b.x) & 1 = 1 THEN 1 ELSE -1 END) AS score
  FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS x) b GROUP BY 1, 2),
sh AS (SELECT doc_id,
              CAST(sum(CASE WHEN score > 0 THEN CAST(1 AS UBIGINT) << CAST(bit AS INTEGER)
                            ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS s
       FROM bits GROUP BY 1)
SELECT CAST(hamming AS BIGINT) AS hamming, count(*) AS n_pairs FROM (
  SELECT bit_count(xor(x.s, y.s)) AS hamming FROM sh x JOIN sh y ON x.doc_id < y.doc_id)
WHERE hamming <= 3 GROUP BY 1 ORDER BY 1
"""


def q27_langid(sf_dir: str) -> pd.DataFrame:
    """Heuristic language-ID distribution (marker lexicons). The
    heuristic is deterministic, so the oracle reproduces it in SQL:
    same word regex, same marker sets, same argmax tie order."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    pred = ds.map_batches(LangId, batch_format="pandas", concurrency=(1, 8))
    return pred.groupby("lang_pred").aggregate(Count(alias_name="n")).to_pandas()


def _sql_marker_list(lang: str) -> str:
    from ..stages.text import _LANG_MARKERS

    return ", ".join(f"'{w}'" for w in sorted(_LANG_MARKERS[lang]))


Q27_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[^\W\d_]+') AS t FROM documents),
sc AS (
  SELECT doc_id,
    CAST(len(list_filter(t, x -> x IN ({_sql_marker_list("en")}))) AS DOUBLE) / greatest(len(t), 1) AS s_en,
    CAST(len(list_filter(t, x -> x IN ({_sql_marker_list("fr")}))) AS DOUBLE) / greatest(len(t), 1) AS s_fr,
    CAST(len(list_filter(t, x -> x IN ({_sql_marker_list("es")}))) AS DOUBLE) / greatest(len(t), 1) AS s_es,
    CAST(len(list_filter(t, x -> x IN ({_sql_marker_list("de")}))) AS DOUBLE) / greatest(len(t), 1) AS s_de
  FROM toks)
SELECT CASE WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'und'
            WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
            WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
            WHEN s_es >= s_de THEN 'es'
            ELSE 'de' END AS lang_pred,
       count(*) AS n
FROM sc GROUP BY 1
"""


def q28_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowing fingerprints as equality classes: fp_group = min
    doc_id sharing the same 64-bit fingerprint (one bucketed shuffle
    on the fingerprint). Oracle: text-equality classes — identical
    texts MUST collide (determinism) and distinct texts must not
    (64-bit injectivity on this corpus; a single edit perturbs ≥1
    window minimum), so the two partitions coincide. Raw fingerprint
    values are pinned by test_fingerprint_stability_and_sensitivity."""
    from ..stages.bucketed import bucketed_apply

    ds = _docs(sf_dir, ["doc_id", "text"])
    fp = ds.map_batches(Fingerprinter, batch_format="pandas", concurrency=(1, 4))

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["doc_id", "fingerprint"]].copy()
        g["fp_group"] = g.groupby("fingerprint")["doc_id"].transform("min")
        return g[["doc_id", "fp_group"]]

    return (
        bucketed_apply(fp, ["fingerprint"], grp, n_buckets=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


Q28_SQL = """
SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS fp_group
FROM documents ORDER BY 1
"""


def q29_embedding_near_dupes(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs via banded hyperplane LSH
    (auto-tuned OR-construction) + distributed exact-cosine verify.
    Threshold 0.45 is the non-vacuous setting for this synthetic
    corpus (max pairwise cosine ≈ 0.6; nothing exists at the 0.95
    dedup threshold — the brute-force oracle proves the empty result
    there too). The oracle brute-forces all pairs in SQL, so the
    value-hash checks LSH recall AND the verification kernel."""
    out = embedding_near_dupes(_embs(sf_dir), threshold=0.45).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q29_SQL = """
SELECT a, b, c AS cos FROM (
  SELECT x.vec_id AS a, y.vec_id AS b,
         round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                      CAST(y.embedding AS DOUBLE[])), 4) AS c,
         list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                CAST(y.embedding AS DOUBLE[])) AS craw
  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id)
WHERE craw >= 0.45 ORDER BY 1, 2
"""


def q30_ivf_recall(sf_dir: str) -> pd.DataFrame:
    """IVF approximate ANN vs exact brute force: recall@10 per query —
    the scale path self-scored against the baseline."""
    exact = q24_ann_cosine(sf_dir)
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mask = np.isin(np.asarray(qt["vec_id"]), _ANN_QUERY_IDS)
    qrows = qt.filter(pa.array(mask)).sort_by("vec_id")
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qrows["embedding"].to_pylist()])
    approx = ivf_topk(
        _embs(sf_dir), Q, list(np.asarray(qrows["vec_id"])), k=10, dim=Q.shape[1], nprobe=8, spill=3
    )
    rows = []
    for qid in _ANN_QUERY_IDS:
        want = set(exact[exact.query_id == qid]["vec_id"])
        got = set(approx[approx.query_id == qid]["vec_id"])
        recall = len(want & got) / max(1, len(want))
        rows.append({"query_id": qid, "recall_ok": bool(recall >= 0.8)})
    return pd.DataFrame(rows).astype({"query_id": "int64", "recall_ok": "bool"})


Q30_SQL = """
SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings
WHERE vec_id IN (0, 1, 2) ORDER BY 1
"""


def q48_ngram_jaccard(sf_dir: str) -> pd.DataFrame:
    """Exact word-3-gram Jaccard pairs WITHIN a blocking key (lang) —
    the exact counterpart MinHash approximates (D-family; catalog
    entry for ``stages.dedup.ngram_jaccard_pairs``). The oracle
    recomputes the same blocked exact Jaccard in SQL."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])
    out = ngram_jaccard_pairs(ds, block_col="lang", n=3, threshold=0.5).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q48_SQL = r"""
WITH w AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
s AS (SELECT doc_id, lang,
        list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
          ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
        END) AS sh
      FROM w)
SELECT a, b, jac AS jaccard FROM (
  SELECT x.doc_id AS a, y.doc_id AS b,
         round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
               (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 4) AS jac,
         len(list_intersect(x.sh, y.sh)) AS inter
  FROM s x JOIN s y ON x.lang = y.lang AND x.doc_id < y.doc_id)
WHERE jac >= 0.5 AND inter > 0 ORDER BY 1, 2
"""


def q49_minhash_clusters(sf_dir: str) -> pd.DataFrame:
    """MinHash near-duplicate CLUSTERS: exact-Jaccard-verified edges →
    Dataset-resident min-label-propagation connected components
    (rows-only: transitive closure is not SQL-expressible; the edge
    set itself is oracle-checked by q25). The operator returns a
    Dataset end to end (sinkable via ``write_groups_lake`` at scale);
    this small catalog result is gathered only for the driver check."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = minhash_dedup_groups(ds, threshold=0.8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q31_media_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal decode plumbing, oracle-checked: binary payloads are
    built DETERMINISTICALLY from document text bytes (GIMG header with
    dims derived from doc_id + the utf-8 text as the 'pixel' buffer),
    decoded by the real actor-pool DecodeImage stage, and the emitted
    features (header dims, mean byte value, aspect) are recomputed by
    the oracle from the same text in SQL. px_std stays engine-only
    (Welford vs two-pass float drift) and is covered by pytest."""
    import struct

    from ..stages.multimodal import _MAGIC, DecodeImage

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.filter(pa.compute.less(t["doc_id"], pa.scalar(64))),
        batch_format="pyarrow",
    )

    def to_media(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        # per-row struct.pack over a 64-row slice — payload assembly is
        # inherently per-blob (a real encoder would be too)
        payloads = [
            _MAGIC
            + struct.pack("<HHB", 8 + int(i) % 16, 8 + int(i) % 8, 1)
            + s.encode("utf-8")
            for i, s in zip(ids, texts)
        ]
        return pd.DataFrame({"media_id": ids, "payload": payloads})

    out = (
        docs.map_batches(to_media, batch_format="pyarrow")
        .map_batches(DecodeImage, batch_format="pandas", batch_size=16, concurrency=(1, 4))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    return out[["media_id", "dec_width", "dec_height", "px_mean", "aspect"]]


Q31_SQL = """
WITH m AS (
  SELECT doc_id AS media_id,
         8 + doc_id % 16 AS w, 8 + doc_id % 8 AS h, text
  FROM documents WHERE doc_id < 64),
b AS (
  SELECT media_id, w, h,
         list_transform(range(1, length(text) + 1), i -> ascii(text[i])) AS bytes
  FROM m)
SELECT media_id,
       CAST(w AS INTEGER) AS dec_width,
       CAST(h AS INTEGER) AS dec_height,
       round(CAST(list_sum(bytes) AS DOUBLE) / len(bytes), 4) AS px_mean,
       round(CAST(w AS DOUBLE) / h, 4) AS aspect
FROM b ORDER BY 1
"""


def q32_frame_sampling(sf_dir: str) -> pd.DataFrame:
    """Video-path frame sampling layout (one row per sampled frame,
    stride 2). The media rows derive DETERMINISTICALLY from the
    documents table (media_id = doc_id < 64; images get 1 frame,
    audio/video get (doc_id % 6) + 2), so the expansion is fully
    SQL-checkable via generate_series."""
    from ..stages.multimodal import FrameSampler

    docs = _docs(sf_dir, ["doc_id"]).map_batches(
        lambda t: t.filter(pa.compute.less(t["doc_id"], pa.scalar(64))),
        batch_format="pyarrow",
    )

    def to_media(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy()
        kind_image = (ids % 5) < 3
        n_frames = np.where(kind_image, 1, (ids % 6) + 2).astype(np.int64)
        return pd.DataFrame({"media_id": ids, "n_frames": n_frames})

    out = docs.map_batches(to_media, batch_format="pyarrow").map_batches(
        FrameSampler(stride=2), batch_format="pandas"
    )
    return out.to_pandas().sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


Q32_SQL = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 5 IN (0, 1, 2) THEN 1 ELSE (doc_id % 6) + 2 END AS n_frames
  FROM documents WHERE doc_id < 64)
SELECT media_id,
       unnest(list_transform(range(0, (n_frames + 1) // 2), x -> x * 2)) AS frame_idx
FROM m ORDER BY 1, 2
"""


CONTENT_QUERIES = {
    "q21_token_stats": (q21_token_stats, Q21_SQL),
    "q22_doc_quality": (q22_doc_quality, Q22_SQL),
    "q23_exact_dedup": (q23_exact_dedup, Q23_SQL),
    "q24_ann_cosine": (q24_ann_cosine, Q24_SQL),
    "q25_minhash_near_dupes": (q25_minhash_near_dupes, Q25_SQL),
    "q26_simhash_pairs": (q26_simhash_pairs, Q26_SQL),
    "q27_langid": (q27_langid, Q27_SQL),
    "q28_fingerprints": (q28_fingerprints, Q28_SQL),
    "q29_embedding_near_dupes": (q29_embedding_near_dupes, Q29_SQL),
    "q30_ivf_recall": (q30_ivf_recall, Q30_SQL),
    "q31_media_features": (q31_media_features, Q31_SQL),
    "q32_frame_sampling": (q32_frame_sampling, Q32_SQL),
    "q48_ngram_jaccard": (q48_ngram_jaccard, Q48_SQL),
    "q49_minhash_clusters": (q49_minhash_clusters, None),
}


# ---------------------------------------------------------------- q55
def q55_vocab_topk(sf_dir: str) -> pd.DataFrame:
    """Corpus vocabulary top-20 by token frequency (vectorized explode
    + partial counts + groupby-sum + deterministic top-k) — the
    vocab-building aggregation of a training-data pipeline."""
    from ..stages.text import vocab_counts

    ds = _docs(sf_dir, ["text"])
    out = vocab_counts(ds).to_pandas().rename(columns={"sum(cnt)": "n"})
    out = out.sort_values(["n", "token"], ascending=[False, True]).head(20)
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


Q55_SQL = r"""
SELECT token, count(*) AS n FROM (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents)
GROUP BY 1 ORDER BY n DESC, token LIMIT 20
"""

CONTENT_QUERIES["q55_vocab_topk"] = (q55_vocab_topk, Q55_SQL)
