"""Text-analysis operators for training-data pipelines over the `documents`
table: token counting, quality scoring, language ID, fingerprinting.

All are stateless-per-batch but hold compiled regexes / stopword sets, so
they run as actor-pool ``map_batches`` stages (compile once per actor).
Token/char semantics are deliberately ASCII-regex based so the DuckDB oracle
(RE2) computes the identical result.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = r"[A-Za-z0-9_]+"        # ASCII \w+ — identical under Python re and RE2
ALPHA_RE = r"[A-Za-z]"
DIGIT_RE = r"[0-9]"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pas", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
}


class TokenStats:
    """token_count + char ratios per document.  SQL twin in
    :func:`token_stats_sql` — identical regexes and divisions."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        n_chars = t.str.len().astype("int64")
        n_tokens = t.str.count(TOKEN_RE).astype("int64")
        n_alpha = t.str.count(ALPHA_RE).astype("int64")
        n_digit = t.str.count(DIGIT_RE).astype("int64")
        denom = n_chars.replace(0, np.nan)
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "alpha_ratio": (n_alpha / denom).fillna(0.0),
            "digit_ratio": (n_digit / denom).fillna(0.0),
        })


def token_stats_sql(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    n = f"length({text_col})"
    return f"""
SELECT {id_col},
       length({text_col})::BIGINT AS n_chars,
       array_length(regexp_extract_all({text_col}, '{TOKEN_RE}'))::BIGINT AS n_tokens,
       CASE WHEN {n} = 0 THEN 0.0 ELSE
         length(regexp_replace({text_col}, '[^A-Za-z]', '', 'g'))::DOUBLE / {n} END AS alpha_ratio,
       CASE WHEN {n} = 0 THEN 0.0 ELSE
         length(regexp_replace({text_col}, '[^0-9]', '', 'g'))::DOUBLE / {n} END AS digit_ratio
FROM {table}
""".strip()


class QualityScore:
    """Heuristic document-quality scoring: length band + punctuation-run +
    stopword presence (the classic C4/Gopher-style cheap filters).  Score in
    [0,1]; purely deterministic."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.tok = re.compile(TOKEN_RE)
        self.stops = set().union(*_STOPWORDS.values())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        n = t.str.len()
        toks = t.str.lower().str.findall(self.tok)
        n_tok = toks.map(len)
        stop_ratio = toks.map(
            lambda ws: sum(w in self.stops for w in ws) / len(ws) if ws else 0.0)
        mean_tok_len = toks.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        len_score = np.clip(n / 200.0, 0.0, 1.0)
        tok_score = np.clip(mean_tok_len / 5.0, 0.0, 1.0) \
            * (mean_tok_len < 15).astype(float)
        score = 0.4 * len_score + 0.3 * np.clip(stop_ratio * 5, 0, 1) + 0.3 * tok_score
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "n_tokens": n_tok.astype("int64"),
            "stop_ratio": stop_ratio.astype(float),
            "quality": score.astype(float),
        })


class LangId:
    """n-gram/stopword-heuristic language ID: argmax of per-language stopword
    hit ratio; 'und' (undetermined) when nothing matches."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.tok = re.compile(TOKEN_RE)
        self.langs = sorted(_STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].fillna("").str.lower().str.findall(self.tok)
        preds = []
        for ws in toks:
            wset = set(ws)
            best, best_n = "und", 0
            for lang in self.langs:
                hits = len(wset & _STOPWORDS[lang])
                if hits > best_n:
                    best, best_n = lang, hits
            preds.append(best)
        return pd.DataFrame({self.id_col: batch[self.id_col],
                             "pred_lang": preds})


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


class Fingerprint:
    """Order-sensitive document fingerprint: polynomial rolling hash of the
    token sequence mod 2^61-1 (same doc text => same fingerprint on every
    worker / every run)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.tok = re.compile(TOKEN_RE)

    @staticmethod
    def _fp(tokens: list[str]) -> int:
        h = 0
        for t in tokens:
            th = 2166136261
            for ch in t.encode():
                th = ((th ^ ch) * 16777619) & 0xFFFFFFFF
            h = (h * _FP_BASE + th) % _FP_MOD
        return h

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].fillna("").str.findall(self.tok)
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "fingerprint": toks.map(self._fp).astype("int64"),
        })
