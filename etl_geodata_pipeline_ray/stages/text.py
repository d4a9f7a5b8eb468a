"""Text-analysis stages for large-scale training-data pipelines:
token counting, quality scoring, language-ID, document fingerprinting.

All are actor-pool ``map_batches`` stages (callable classes): regexes
compile once per actor in ``__init__`` (ST-pattern; the reference
builds its graph/sindex once per run, ``generate_h3_advanced_maps.py:
350-385``), per-batch work is vectorized pandas/pyarrow string
kernels — no Python row loops in the hot path except the per-document
numpy fingerprint kernel, which is O(doc_len) C work per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_WS_TOKEN = r"\S+"
# Unicode-aware punctuation class: RE2's \w is ASCII-only, so the old
# [^\w\s] counted every non-ASCII LETTER as punctuation — a QA
# threshold on punct_ratio would junk essentially all non-English
# text. \pL/\pN are RE2's Unicode letter/number classes.
_PUNCT = r"[^\pL\pN\s_]"

# tiny per-language marker lexicons for the heuristic language-ID;
# scoring = fraction of tokens that are markers, argmax wins.
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "que"},
    "es": {"el", "la", "los", "las", "de", "y", "un", "una", "es", "que"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "nicht", "mit", "zu"},
}


def token_count_batch(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace-token count via one vectorized regex kernel."""
    return pc.count_substring_regex(texts, _WS_TOKEN)


class QualityScorer:
    """Per-document quality features: n_chars, n_tokens, punct ratio,
    chars-per-token — the reference's QA-threshold idea
    (``docs/data_layers.md:259-264``) turned into scored columns."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch[self.text_col]
        n_chars = pc.utf8_length(txt)
        n_tokens = pc.count_substring_regex(txt, _WS_TOKEN)
        n_punct = pc.count_substring_regex(txt, _PUNCT)
        # ASCII-space-only on purpose: the q22 oracle's
        # replace(text, ' ', '') defines "dense" chars the same way
        n_spaces = pc.subtract(n_chars, pc.utf8_length(pc.replace_substring(txt, " ", "")))
        tok = pc.max_element_wise(n_tokens, pa.scalar(1, type=pa.int32()))
        dense_chars = pc.subtract(n_chars, n_spaces)
        cpt = pc.round(
            pc.divide(pc.cast(dense_chars, pa.float64()), pc.cast(tok, pa.float64())),
            ndigits=4,
        )
        # max(n_chars, 1): an empty doc must score 0, not NaN (NaN
        # silently fails every downstream threshold comparison)
        chars = pc.max_element_wise(n_chars, pa.scalar(1, type=pa.int32()))
        pr = pc.round(
            pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(chars, pa.float64())),
            ndigits=4,
        )
        batch = batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
        batch = batch.append_column("chars_per_token", cpt)
        batch = batch.append_column("punct_ratio", pr)
        return batch


class LangId:
    """Heuristic marker-lexicon language-ID (n-gram-free variant; the
    full n-gram profile approach is Cavnar–Trenkle 1994). Emits
    ``lang_pred`` + ``lang_score``; 'und' when nothing matches."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.word = re.compile(r"[^\W\d_]+", re.U)
        self.langs = list(_LANG_MARKERS)
        self.markers = [_LANG_MARKERS[l] for l in self.langs]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)  # explode/reindex need unique labels
        # null text scores 0 → 'und' (unguarded, NaN token counts made
        # argmax pick index 0 = 'en' with lang_score=NaN)
        toks = batch[self.text_col].fillna("").str.lower().str.findall(self.word)
        n = toks.str.len().to_numpy(dtype=np.float64)
        n[n == 0] = 1.0
        # vectorized scoring: explode tokens once, one isin() pass per
        # language, C-level groupby-sum back to the document (no
        # Python set lookups per token)
        ex = toks.explode()
        valid = ex.notna()
        ex = ex[valid]
        counts = np.zeros((len(batch), len(self.markers)), dtype=np.float64)
        if len(ex):
            pos = pd.Series(np.arange(len(batch)), index=batch.index)
            ex_pos = pos.reindex(ex.index).to_numpy()
            for j, m in enumerate(self.markers):
                hits = ex.isin(m).to_numpy()
                np.add.at(counts[:, j], ex_pos[hits], 1.0)
        scores = counts / n[:, None]
        best = scores.argmax(axis=1)
        best_score = scores[np.arange(len(best)), best]
        pred = np.array(self.langs, dtype=object)[best]
        pred[best_score == 0.0] = "und"
        batch["lang_pred"] = pred
        batch["lang_score"] = np.round(best_score, 4)
        return batch


class Fingerprinter:
    """Winnowing-style document fingerprint (Schleimer et al., 2003,
    'Winnowing: Local Algorithms for Document Fingerprinting'):
    rolling polynomial hash over byte k-grams, keep the minimum hash in
    each window, fingerprint = 64-bit mix of the selected minima.
    Deterministic; robust to small local edits."""

    K = 8       # k-gram length in bytes
    W = 16      # winnowing window
    _B = np.uint64(1000003)

    def __init__(self, text_col: str = "text", output: str = "fingerprint"):
        self.text_col = text_col
        self.output = output
        # precompute B^(K-1) for rolling updates
        p = np.uint64(1)
        for _ in range(self.K - 1):
            p = np.uint64(p * self._B)
        self.pk = p

    def _doc_fp(self, data: bytes) -> int:
        with np.errstate(over="ignore"):
            b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
            if len(b) < self.K:
                h = np.uint64(1469598103934665603)
                for x in b:
                    h = np.uint64((h ^ x) * np.uint64(1099511628211))
                return int(h)
            # all k-gram hashes via cumulative polynomial trick (vectorized)
            n = len(b) - self.K + 1
            H = np.zeros(n, dtype=np.uint64)
            for i in range(self.K):  # K=8 vectorized passes, not a row loop
                H = H * self._B + b[i : i + n]
            # winnowing: min per sliding window, then fold ALL selected
            # minima (in positional order) into one 64-bit FNV mix —
            # any local edit perturbs at least one window minimum.
            m = len(H) - self.W + 1
            if m <= 1:
                mins = np.array([H.min()], dtype=np.uint64)
            else:
                # zero-copy sliding windows: the explicit m×W index
                # matrix + gather allocated ~256 bytes per input byte
                # (1.3 GB of transient int64 for a 10 MB document)
                mins = np.lib.stride_tricks.sliding_window_view(
                    H, self.W
                ).min(axis=1)
            idxs = np.arange(len(mins), dtype=np.uint64)
            v = (mins ^ (idxs * np.uint64(0x9E3779B97F4A7C15))) * np.uint64(1099511628211)
            return int(np.bitwise_xor.reduce(v) ^ np.uint64(len(mins)))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            # null text fingerprints as the empty document (a constant)
            # instead of crashing the task with AttributeError
            batch[self.output] = [
                self._doc_fp((t if isinstance(t, str) else "").encode("utf-8", "ignore"))
                for t in batch[self.text_col]
            ]
        batch[self.output] = batch[self.output].astype(np.uint64).astype(np.int64)
        return batch


def token_stats(ds: ray.data.Dataset, text_col: str, group: str) -> ray.data.Dataset:
    """Per-group token totals (whitespace tokenization)."""
    from ray.data.aggregate import Count, Sum

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_tokens", pc.cast(token_count_batch(batch[text_col]), pa.int64())
        )

    return (
        ds.map_batches(add, batch_format="pyarrow")
        .groupby(group)
        .aggregate(Sum("n_tokens", alias_name="total_tokens"), Count(alias_name="n_docs"))
    )


def vocab_counts(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Corpus vocabulary: (token, count) via vectorized explode +
    per-batch partial counts (the combiner pattern) → one small
    groupby-sum. The whitespace tokenizer matches token_count_batch /
    the q21 oracle. Vocabulary building is the classic corpus-level
    aggregation of a training-data pipeline."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # split on ASCII \s+ only (NO unicode trim): boundary empties
        # are dropped by the "" filter below, and a unicode trim would
        # DISAGREE with token_count_batch's ASCII \S+ on documents
        # padded with unicode whitespace (NBSP counts as one token in
        # both tokenizers this way)
        toks = pc.split_pattern_regex(pc.fill_null(batch[text_col], ""), r"\s+")
        flat = pc.list_flatten(toks)
        # split of an empty/whitespace-only doc yields [""] — drop it,
        # or the vocabulary gains a phantom ''-token row and its total
        # disagrees with token_count_batch / any \S+-based oracle
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pa.table({"token": flat}).group_by("token").aggregate([("token", "count")])
        return pa.table(
            {"token": vc["token"], "cnt": pc.cast(vc["token_count"], pa.int64())}
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby("token").sum("cnt")
