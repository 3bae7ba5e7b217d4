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

from ..functions.hashing import segment_reduce_poly, token_hashes

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


def _flat_tokens(toks: pd.Series) -> tuple[list, np.ndarray, np.ndarray]:
    """Token lists -> (flat list, per-doc counts, per-token doc starts)."""
    n = len(toks)
    counts = np.fromiter(map(len, toks), dtype=np.int64, count=n)
    flat = [t for ws in toks for t in ws]
    starts = np.cumsum(counts) - counts
    return flat, counts, starts


def _segment_sums(vals: np.ndarray, counts: np.ndarray,
                  starts: np.ndarray) -> np.ndarray:
    out = np.zeros(len(counts), dtype=np.float64)
    ne = counts > 0
    if ne.any():
        out[ne] = np.add.reduceat(vals.astype(np.float64), starts[ne])
    return out


class QualityScore:
    """Heuristic document-quality scoring: length band + stopword presence +
    token-length band (the classic C4/Gopher-style cheap filters).  Score in
    [0,1]; purely deterministic.  Per-token work is one factorize + one
    ``np.isin`` over the batch VOCABULARY plus segment reductions — no
    per-document Python."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.tok = re.compile(TOKEN_RE)
        self.stops = np.sort(np.array(
            sorted(set().union(*_STOPWORDS.values()))))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        n = t.str.len()
        toks = t.str.lower().str.findall(self.tok)
        flat, counts, starts = _flat_tokens(toks)
        codes, vocab = pd.factorize(np.asarray(flat, dtype=object))
        if len(vocab):
            is_stop = np.isin(vocab.astype("U"), self.stops)[codes]
            tlen = np.char.str_len(vocab.astype("U"))[codes]
        else:
            is_stop = np.empty(0, dtype=bool)
            tlen = np.empty(0, dtype=np.int64)
        denom = np.where(counts > 0, counts, 1).astype(np.float64)
        stop_ratio = np.where(counts > 0,
                              _segment_sums(is_stop, counts, starts) / denom,
                              0.0)
        mean_tok_len = np.where(counts > 0,
                                _segment_sums(tlen, counts, starts) / denom,
                                0.0)
        len_score = np.clip(n / 200.0, 0.0, 1.0)
        tok_score = np.clip(mean_tok_len / 5.0, 0.0, 1.0) \
            * (mean_tok_len < 15).astype(float)
        score = 0.4 * len_score + 0.3 * np.clip(stop_ratio * 5, 0, 1) + 0.3 * tok_score
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "n_tokens": pd.Series(counts, index=batch.index).astype("int64"),
            "stop_ratio": stop_ratio.astype(float),
            "quality": score.astype(float),
        })


def quality_score_sql(table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """DuckDB twin of :class:`QualityScore` — identical regex token model,
    stopword set and float expression order (clips spelled as
    least/greatest; the mean-token-length band uses the same division)."""
    stops = sorted(set().union(*_STOPWORDS.values()))
    stop_list = ", ".join(f"'{w}'" for w in stops)
    return f"""
WITH toks AS (
  SELECT {id_col}, length({text_col}) AS n_chars,
         regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS ws
  FROM {table}
), agg AS (
  SELECT {id_col}, n_chars, len(ws)::BIGINT AS n_tokens,
         CASE WHEN len(ws) = 0 THEN 0.0 ELSE
           (SELECT count(*) FROM unnest(ws) AS u(w)
            WHERE w IN ({stop_list}))::DOUBLE / len(ws) END AS stop_ratio,
         CASE WHEN len(ws) = 0 THEN 0.0 ELSE
           (SELECT sum(length(w)) FROM unnest(ws) AS u(w))::DOUBLE / len(ws)
         END AS mean_tok_len
  FROM toks
)
SELECT {id_col}, n_tokens, stop_ratio,
       0.4 * least(greatest(n_chars / 200.0, 0.0), 1.0)
       + 0.3 * least(greatest(stop_ratio * 5, 0.0), 1.0)
       + 0.3 * (least(greatest(mean_tok_len / 5.0, 0.0), 1.0)
                * CASE WHEN mean_tok_len < 15 THEN 1.0 ELSE 0.0 END)
       AS quality
FROM agg
""".strip()


class LangId:
    """Stopword-heuristic language ID: argmax of per-language DISTINCT
    stopword hits; 'und' (undetermined) when nothing matches.  Vectorized:
    batch-vocabulary factorize, per-(doc, vocab-id) dedup via np.unique,
    4 small bincounts — no per-document Python loop."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.tok = re.compile(TOKEN_RE)
        self.langs = sorted(_STOPWORDS)
        self.lang_stops = [np.sort(np.array(sorted(_STOPWORDS[l])))
                           for l in self.langs]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].fillna("").str.lower().str.findall(self.tok)
        n = len(toks)
        flat, counts, _ = _flat_tokens(toks)
        codes, vocab = pd.factorize(np.asarray(flat, dtype=object))
        preds = np.full(n, "und", dtype=object)
        if len(vocab):
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
            # distinct (doc, token) pairs — LangId counts SET hits
            pair = np.unique(doc_idx * np.int64(len(vocab)) + codes)
            pdoc = pair // len(vocab)
            pcode = (pair % len(vocab)).astype(np.int64)
            vu = vocab.astype("U")
            hits = np.stack([
                np.bincount(pdoc, weights=np.isin(vu, s)[pcode],
                            minlength=n)
                for s in self.lang_stops])            # (n_langs, n_docs)
            best = np.argmax(hits, axis=0)            # first max wins (sorted)
            best_n = hits[best, np.arange(n)]
            m = best_n > 0
            preds[m] = np.array(self.langs, dtype=object)[best[m]]
        return pd.DataFrame({self.id_col: batch[self.id_col],
                             "pred_lang": preds})


def lang_id_sql(table: str = "documents", text_col: str = "text",
                id_col: str = "doc_id") -> str:
    """DuckDB twin of :class:`LangId`: distinct-stopword hit counts per
    language (list_distinct + list_intersect — integer-exact), first-max
    argmax over the sorted language order, 'und' when all counts are 0."""
    langs = sorted(_STOPWORDS)

    def lst(lang):
        return "[" + ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang])) \
            + "]"

    hit_cols = ",\n         ".join(
        f"len(list_intersect(ws, {lst(l)})) AS h_{l}" for l in langs)
    all_zero = " AND ".join(f"h_{l} = 0" for l in langs)
    whens = []
    for i, l in enumerate(langs[:-1]):
        conds = " AND ".join(f"h_{l} >= h_{r}" for r in langs[i + 1:])
        whens.append(f"WHEN {conds} THEN '{l}'")
    chain = "\n           ".join(whens)
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_distinct(regexp_extract_all(lower({text_col}),
                                          '{TOKEN_RE}')) AS ws
  FROM {table}
), h AS (
  SELECT {id_col},
         {hit_cols}
  FROM toks
)
SELECT {id_col},
       CASE WHEN {all_zero} THEN 'und'
           {chain}
           ELSE '{langs[-1]}' END AS pred_lang
FROM h
""".strip()


_FP_BASE = np.uint64(0x100000001B3)  # odd base; doc-level polynomial mod 2^64


class Fingerprint:
    """Order-sensitive document fingerprint: polynomial combine (mod 2^64)
    of the per-token hashes of the token sequence (same doc text => same
    fingerprint on every worker / every run).  Fully vectorized: one flat
    byte-buffer token-hash pass + one segment polynomial reduction
    (:mod:`..functions.hashing`) — no per-character Python."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].fillna("").str.findall(self.tok)
        flat, counts, _ = _flat_tokens(toks)
        th = token_hashes(flat)
        fp = segment_reduce_poly(th, counts, _FP_BASE)
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "fingerprint": pd.Series(fp.view(np.int64), index=batch.index),
        })


def word_counts(ds, *, text_col: str = "text") -> "ray.data.Dataset":
    """Corpus-wide word frequency (the canonical training-data vocabulary
    scan): tokens (``TOKEN_RE``, lowercased) counted with PER-BATCH partial
    value counts — the shuffle moves one row per (batch, distinct word),
    bounded by the vocabulary, never by the token count.  DuckDB
    ``unnest(regexp_extract_all(...))`` reproduces it exactly."""
    import ray.data

    from .shuffle import sorted_block_reduce
    tok = re.compile(TOKEN_RE)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok)
        flat, _, _ = _flat_tokens(toks)
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"word": vc.index.astype(str),
                             "n_": vc.to_numpy().astype(np.int64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", sort=False)["n_"].sum().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=None)
    return sorted_block_reduce(partials, "word", combine)


class RepetitionRatio:
    """Gopher-style repetition quality signal: per document, the fraction
    of duplicate tokens ``1 - n_distinct / n_tokens`` (0.0 for empty docs).
    Vectorized: one exploded (doc, token) frame per batch, pandas
    drop_duplicates + groupby sizes — no per-doc Python loop."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].fillna("").str.lower() \
            .str.findall(self.tok)
        flat, counts, _ = _flat_tokens(toks)
        doc_idx = np.repeat(np.arange(len(batch)), counts)
        fr = pd.DataFrame({"d": doc_idx, "t": flat})
        nd = fr.drop_duplicates().groupby("d", sort=True).size()
        n_distinct = np.zeros(len(batch), dtype=np.int64)
        n_distinct[nd.index.to_numpy()] = nd.to_numpy()
        n_tokens = counts.astype(np.int64)
        ratio = np.where(n_tokens > 0,
                         1.0 - n_distinct / np.maximum(n_tokens, 1), 0.0)
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "n_tokens": pd.Series(n_tokens, index=batch.index),
            "n_distinct": pd.Series(n_distinct, index=batch.index),
            "dup_ratio": pd.Series(ratio, index=batch.index),
        })


def word_counts_sql(table: str = "documents", text_col: str = "text") -> str:
    return f"""
SELECT word, count(*)::BIGINT AS n
FROM (SELECT unnest(regexp_extract_all(lower({text_col}), '{TOKEN_RE}'))
      AS word FROM {table})
GROUP BY word ORDER BY word
"""


def repetition_ratio_sql(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    return f"""
WITH t AS (
  SELECT {id_col},
         regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS ws
  FROM {table}
)
SELECT {id_col},
       array_length(ws)::BIGINT AS n_tokens,
       array_length(list_distinct(ws))::BIGINT AS n_distinct,
       CASE WHEN array_length(ws) = 0 THEN 0.0
            ELSE 1.0 - array_length(list_distinct(ws))::BIGINT
                 / greatest(array_length(ws)::BIGINT, 1)
       END AS dup_ratio
FROM t
"""


def tfidf_top_terms(ds, *, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Top-k most DISTINCTIVE terms per document — the TF-IDF extraction
    every curation pipeline runs, with the idf weight expressed as the
    exact rational ``tf / df`` (one f64 division, bit-identical in numpy
    and DuckDB; ``tf * ln(N/df)`` would hang the hash gate on libm
    rounding and ranks identically for fixed tf).

    Fully distributed: (1) per-batch exact (doc, term, tf) explode (a doc
    lives in one row, so term counts never cross batches); (2) document
    frequency via per-batch partials + a term-keyed reduce (shuffle rows
    bounded by vocabulary, not token count); (3) df re-attached by a
    partitioned sorted equi-join on term (no broadcast — the vocabulary
    of a 100-TB corpus is itself a big table); (4) per-doc top-k via the
    grouped_topk partial-reduce.  Ties rank alphabetically."""
    import ray.data

    from .agg import grouped_topk
    from .join import sorted_join
    from .shuffle import sorted_block_reduce
    tok = re.compile(TOKEN_RE)

    def tf_explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok)
        flat, counts, _ = _flat_tokens(toks)
        ids = np.repeat(batch[id_col].to_numpy(), counts)
        df = pd.DataFrame({id_col: ids,
                           "term": np.asarray(flat, dtype=object)})
        out = df.groupby([id_col, "term"], sort=False).size() \
            .reset_index(name="tf")
        out["tf"] = out["tf"].astype(np.int64)
        return out

    tf_rows = ds.map_batches(tf_explode, batch_format="pandas",
                             batch_size=None)

    def df_partial(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["term"].value_counts()
        return pd.DataFrame({"term": vc.index.astype(object),
                             "df_": vc.to_numpy().astype(np.int64)})

    def df_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", sort=False)["df_"].sum().reset_index(name="df")
        out["df"] = out["df"].astype(np.int64)
        return out

    df_tbl = sorted_block_reduce(
        tf_rows.map_batches(df_partial, batch_format="pandas",
                            batch_size=None),
        "term", df_combine)

    joined = sorted_join(
        tf_rows, df_tbl, left_on="term", right_on="term",
        left_fields={id_col: pa.int64(), "term": pa.string(),
                     "tf": pa.int64()},
        right_fields={"term": pa.string(), "df": pa.int64()},
        coalesce_right=8)

    def score(b: pa.Table) -> pa.Table:
        tf = b["tf"].to_numpy().astype(np.float64)
        dfv = b["df"].to_numpy().astype(np.float64)
        return b.append_column("score", pa.array(tf / dfv, pa.float64()))

    scored = joined.map_batches(score, batch_format="pyarrow")
    out = grouped_topk(scored, group_col=id_col, order_col="score", k=k,
                       descending=True, tie_col="term")
    return out.select_columns([id_col, "rank", "term", "tf", "df", "score"])


def tfidf_top_terms_sql(k: int = 3, table: str = "documents",
                        text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(regexp_extract_all(lower({text_col}),
         '{TOKEN_RE}')) AS term FROM {table}
), tf AS (
  SELECT {id_col}, term, count(*)::BIGINT AS tf
  FROM toks GROUP BY {id_col}, term
), df AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), s AS (
  SELECT tf.{id_col}, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) / df.df AS score
  FROM tf JOIN df USING (term)
), r AS (
  SELECT *, (row_number() OVER (PARTITION BY {id_col}
             ORDER BY score DESC, term) - 1)::INTEGER AS rank
  FROM s
)
SELECT {id_col}, rank, term, tf, df, score FROM r WHERE rank < {k}
"""


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (fixed query set against the corpus)
# ---------------------------------------------------------------------------

BM25_QUANT = 1_000_000_000.0   # per-term score quantum (1e-9 resolution)


def bm25_topk(ds, queries: dict, *, top_n: int = 10,
              text_col: str = "text", id_col: str = "doc_id"):
    """Okapi BM25 top-``top_n`` documents per query (k1=1.2, b=0.75) —
    the standard retrieval ranking a curation/eval pipeline runs against
    its corpus.  ``queries``: {query_id: (lowercase terms...)}, a SMALL
    fixed set (terms broadcast into the map; the corpus itself streams).

    Hash-gate design: per-(doc, term) scores are computed with ONE fixed
    IEEE expression order (idf = (2(N-df)+1)/(2df+1), the +0.5 Robertson
    smoothing scaled to integers; satf with dl*N/totL replacing dl/avgdl
    so the only inputs are exact int64 scalars), then QUANTIZED to int64
    at 1e-9 (floor(x*1e9+0.5)) BEFORE the per-document sum — integer
    sums are order-independent where float sums are not, so the engine
    and the DuckDB twin agree bit-for-bit.

    Distributed shape: one tokenize pass emits matched (doc, term, tf,
    dl) rows (pruned to query terms AT THE MAP — vocabulary never
    shuffles) plus per-batch (N, totL) partials; df is a tiny term-keyed
    reduce (≤ |terms| rows); scoring is a stateless map; the per-query
    ranking is grouped_topk's partial+reduce.  Nothing materializes the
    corpus."""
    import ray.data

    from .agg import grouped_topk
    from .shuffle import sorted_block_reduce
    tok = re.compile(TOKEN_RE)
    term_qids: dict[str, list] = {}
    for qid, terms in queries.items():
        for t in terms:
            term_qids.setdefault(t, []).append(qid)
    term_set = frozenset(term_qids)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok)
        flat, counts, _ = _flat_tokens(toks)
        ids = np.repeat(batch[id_col].to_numpy(), counts)
        dl = pd.Series(counts, index=batch[id_col].to_numpy())
        df = pd.DataFrame({id_col: ids,
                           "term": np.asarray(flat, dtype=object)})
        df = df[df["term"].isin(term_set)]
        out = df.groupby([id_col, "term"], sort=False).size() \
            .reset_index(name="tf")
        out["tf"] = out["tf"].astype(np.int64)
        out["dl"] = dl.reindex(out[id_col].to_numpy()).to_numpy() \
            .astype(np.int64)
        stats = pd.DataFrame({id_col: [np.int64(-1)], "term": [""],
                              "tf": [np.int64(len(batch))],
                              "dl": [np.int64(int(counts.sum()))]})
        return pd.concat([out, stats], ignore_index=True)

    rows = ds.map_batches(explode, batch_format="pandas",
                          batch_size=None).materialize()

    import pyarrow.compute as _pc

    def _only(eq: bool):
        def f(b: pa.Table) -> pa.Table:
            m = _pc.equal(b["term"], "")
            return b.filter(m if eq else _pc.invert(m))
        return f

    stats = rows.map_batches(_only(True), batch_format="pyarrow") \
        .to_pandas()
    n_docs = int(stats["tf"].sum())
    tot_len = int(stats["dl"].sum())
    matched = rows.map_batches(_only(False), batch_format="pyarrow")

    def df_partial(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["term"].value_counts()
        return pd.DataFrame({"term": vc.index.astype(object),
                             "df_": vc.to_numpy().astype(np.int64)})

    df_tbl = sorted_block_reduce(
        matched.map_batches(df_partial, batch_format="pandas",
                            batch_size=None),
        "term", lambda g: g.groupby("term", sort=False)["df_"].sum()
        .astype(np.int64).reset_index(name="df")).to_pandas()
    df_map = dict(zip(df_tbl["term"], df_tbl["df"].astype(np.int64)))

    def score(g: pd.DataFrame) -> pd.DataFrame:
        if "term" not in g.columns or not len(g):
            return pd.DataFrame({"query_id": np.empty(0, np.int64),
                                 id_col: np.empty(0, np.int64),
                                 "q": np.empty(0, np.int64)})
        tf = g["tf"].to_numpy().astype(np.float64)
        dl = g["dl"].to_numpy().astype(np.int64)
        dfv = np.array([df_map.get(t, 0) for t in g["term"]], np.float64)
        # FIXED expression order — mirrored verbatim in bm25_sql
        idf = (2.0 * (n_docs - dfv) + 1.0) / (2.0 * dfv + 1.0)
        satf = (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75
                                         * ((dl * n_docs) / tot_len)))
        q = np.floor(idf * satf * BM25_QUANT + 0.5).astype(np.int64)
        reps = np.fromiter((len(term_qids[t]) for t in g["term"]),
                           dtype=np.int64, count=len(g))
        qids = np.fromiter((q_ for t in g["term"] for q_ in term_qids[t]),
                           dtype=np.int64, count=int(reps.sum()))
        return pd.DataFrame({"query_id": qids,
                             id_col: np.repeat(g[id_col].to_numpy(), reps),
                             "q": np.repeat(q, reps)})

    per_term = matched.map_batches(score, batch_format="pandas",
                                   batch_size=None)

    def doc_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["query_id", id_col], sort=False)["q"].sum() \
            .reset_index(name="score_q")
        out["score_q"] = out["score_q"].astype(np.int64)
        return out

    summed = sorted_block_reduce(per_term, ["query_id", id_col], doc_sum)
    out = grouped_topk(summed, group_col="query_id", order_col="score_q",
                       k=top_n, descending=True, tie_col=id_col)
    return out.select_columns(["query_id", "rank", id_col, "score_q"])


def bm25_sql(queries: dict, top_n: int = 10, table: str = "documents",
             text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`bm25_topk` — identical IEEE expression order
    and the same 1e-9 int64 quantization before the per-document sum."""
    vals = ", ".join(f"({qid}, '{t}')" for qid, ts in queries.items()
                     for t in ts)
    return f"""
WITH qt(query_id, term) AS (VALUES {vals}),
toks AS (
  SELECT {id_col}, unnest(regexp_extract_all(lower({text_col}),
         '{TOKEN_RE}')) AS term FROM {table}
),
stats AS (
  SELECT (SELECT count(*) FROM {table})::BIGINT AS n,
         (SELECT count(*) FROM toks)::BIGINT AS tot
),
dl AS (SELECT {id_col}, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
tf AS (
  SELECT {id_col}, term, count(*)::BIGINT AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
per_term AS (
  SELECT q.query_id, tf.{id_col},
         CAST(floor(
           ((2.0 * (s.n - df.df) + 1.0) / (2.0 * df.df + 1.0))
           * ((tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75
                * ((dl.dl * s.n) / s.tot))))
           * {BM25_QUANT} + 0.5) AS BIGINT) AS q
  FROM qt q JOIN tf USING (term) JOIN df USING (term)
       JOIN dl ON tf.{id_col} = dl.{id_col}, stats s
),
summed AS (
  SELECT query_id, {id_col}, sum(q)::BIGINT AS score_q
  FROM per_term GROUP BY 1, 2
),
r AS (
  SELECT *, (row_number() OVER (PARTITION BY query_id
             ORDER BY score_q DESC, {id_col}) - 1)::INTEGER AS rank
  FROM summed
)
SELECT query_id, rank, {id_col}, score_q FROM r WHERE rank < {top_n}
"""


# ---------------------------------------------------------------------------
# PII redaction (email / phone scrub — the standard curation scrubber)
# ---------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{4}"


def plant_pii(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Deterministically derive a PII-bearing variant of the corpus (the
    test tables are clean word soup): docs with id%7==0 get a synthetic
    email, id%11==0 a phone — modular arithmetic reproducible in SQL
    (:func:`plant_pii_sql_cte`), the same derived-input pattern as
    synth.derive_points."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        email = np.where(ids % 7 == 0,
                         ["contact user%d@example.com " % i for i in ids],
                         "").astype(object)
        phone = np.where(ids % 11 == 0,
                         ["call 555-%d " % (1000 + i % 9000) for i in ids],
                         "").astype(object)
        out = batch.copy()
        out[text_col] = email + phone \
            + batch[text_col].fillna("").to_numpy(dtype=object)
        return out

    return ds.map_batches(f, batch_format="pandas")


def plant_pii_sql_cte(table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    return f"""
WITH aug AS (
  SELECT {id_col},
    CASE WHEN {id_col} % 7 = 0 THEN 'contact user' ||
         CAST({id_col} AS VARCHAR) || '@example.com ' ELSE '' END ||
    CASE WHEN {id_col} % 11 = 0 THEN 'call 555-' ||
         CAST(1000 + {id_col} % 9000 AS VARCHAR) || ' ' ELSE '' END ||
    {text_col} AS {text_col}
  FROM {table}
)
"""


def pii_redact(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Count and redact PII patterns: emails -> ``<EMAIL>``, phones ->
    ``<PHONE>`` (compiled-regex vectorized ``.str`` kernels, counts taken
    BEFORE replacement; both regexes match identically under Python re and
    RE2, so DuckDB ``regexp_replace(..., 'g')`` reproduces the output
    byte-for-byte)."""
    email = re.compile(EMAIL_RE)
    phone = re.compile(PHONE_RE)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        n_e = t.str.count(email).astype(np.int64)
        n_p = t.str.count(phone).astype(np.int64)
        red = t.str.replace(email, "<EMAIL>", regex=True) \
            .str.replace(phone, "<PHONE>", regex=True)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "n_emails": n_e.to_numpy(),
                             "n_phones": n_p.to_numpy(),
                             "redacted": red.to_numpy()})

    return ds.map_batches(f, batch_format="pandas")


def pii_redact_sql(table: str = "documents", text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    return plant_pii_sql_cte(table, text_col, id_col) + f"""
SELECT {id_col},
  coalesce(array_length(regexp_extract_all({text_col},
      '{EMAIL_RE}')), 0)::BIGINT AS n_emails,
  coalesce(array_length(regexp_extract_all({text_col},
      '{PHONE_RE}')), 0)::BIGINT AS n_phones,
  regexp_replace(regexp_replace({text_col}, '{EMAIL_RE}', '<EMAIL>', 'g'),
      '{PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM aug
"""


# ---------------------------------------------------------------------------
# sequence packing (distributed ordered prefix scan) + dataset split
# ---------------------------------------------------------------------------

def pack_sequences(ds, *, budget: int, text_col: str = "text",
                   id_col: str = "doc_id",
                   range_size: int = 4096):
    """GPT-style sequence packing: concatenate the corpus in ``id_col``
    order and slice fixed ``budget``-token training windows; each doc gets
    its global token offset and the [first, last] window it lands in.

    This is a distributed ORDERED PREFIX SCAN, two-pass (the classic
    scan-then-propagate shape — no sequential dependency):

    1. tokenize once into a narrow ``(id, n_tokens, coarse=id//range_size)``
       table (``TOKEN_RE`` counts, identical to the SQL twin), materialized
       so the scan passes don't re-tokenize (2 ints/row; Ray spills if it
       outgrows memory — at extreme scale write this projection to parquet
       instead);
    2. per-coarse-range token totals (per-batch partial aggregation -> one
       tiny table), exclusive-scanned on the driver (O(n/range_size) rows)
       and broadcast;
    3. range-partition the narrow table by ``coarse`` and emit each doc's
       offset = range base + within-range exclusive cumsum
       (:func:`..stages.shuffle.sorted_block_reduce` — only the narrow
       rows move).

    All arithmetic is int64 — bit-exact against the SQL window-cumsum
    twin.  A doc may straddle window boundaries (seq_first < seq_last),
    exactly as in packed pretraining batches."""
    import ray as _ray
    from .shuffle import sorted_block_reduce

    tok = re.compile(TOKEN_RE)

    def tokenize(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        return pd.DataFrame({
            id_col: ids,
            "n_tokens": b[text_col].fillna("").str.count(tok)
            .astype(np.int64).to_numpy(),
            "coarse": ids // range_size,
        })

    narrow = ds.map_batches(tokenize, batch_format="pandas").materialize()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("coarse", sort=False)["n_tokens"].sum()
        return pd.DataFrame({"coarse": g.index.to_numpy(),
                             "tot": g.to_numpy()})

    parts = narrow.map_batches(partial, batch_format="pandas").to_pandas()
    totals = parts.groupby("coarse")["tot"].sum().sort_index()
    bases = totals.cumsum().shift(fill_value=0).astype(np.int64)
    base_ref = _ray.put((bases.index.to_numpy(), bases.to_numpy()))

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        keys, base_vals = _ray.get(base_ref)
        b = b.sort_values([id_col])
        coarse = b["coarse"].to_numpy()
        n = b["n_tokens"].to_numpy()
        # within-range exclusive cumsum with a reset at each range start
        cum = np.cumsum(n) - n
        starts = np.flatnonzero(np.r_[True, coarse[1:] != coarse[:-1]])
        cum = cum - np.repeat(cum[starts], np.diff(np.r_[starts, len(n)]))
        off = cum + base_vals[np.searchsorted(keys, coarse)]
        first = off // budget
        last = np.maximum(first, (off + n - 1) // budget)
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             "n_tokens": n, "token_offset": off,
                             "seq_first": first, "seq_last": last})

    return sorted_block_reduce(narrow, "coarse", scan)


SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 5


def split_assign(ds, *, id_col: str = "doc_id",
                 train_pct: int = SPLIT_TRAIN_PCT,
                 val_pct: int = SPLIT_VAL_PCT):
    """Deterministic hash-based train/val/test split: splitmix64(id) % 100
    against the percentage thresholds — stable across runs, machines and
    partitionings (the property a reproducible corpus split needs), and
    reproduced exactly by the SQL twin."""
    from ..functions.hashing import splitmix64

    def f(b: pa.Table) -> pa.Table:
        h = splitmix64(b[id_col].to_numpy().astype(np.uint64))
        bucket = (h % np.uint64(100)).astype(np.int64)
        split = np.where(bucket < train_pct, "train",
                         np.where(bucket < train_pct + val_pct,
                                  "val", "test"))
        return pa.table({id_col: b[id_col],
                         "bucket": pa.array(bucket),
                         "split": pa.array(split)})

    return ds.map_batches(f, batch_format="pyarrow")


def pack_sequences_sql(budget: int, table: str = "documents",
                       text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """Window-cumsum twin of :func:`pack_sequences` (int64 throughout)."""
    return f"""
WITH tk AS (
  SELECT {id_col},
         coalesce(array_length(regexp_extract_all(coalesce({text_col}, ''),
             '{TOKEN_RE}')), 0)::BIGINT AS n_tokens
  FROM {table}
), o AS (
  SELECT {id_col}, n_tokens,
         (sum(n_tokens) OVER (ORDER BY {id_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_tokens)::BIGINT AS token_offset
  FROM tk
)
SELECT {id_col}, n_tokens, token_offset,
       (token_offset // {budget})::BIGINT AS seq_first,
       greatest(token_offset // {budget},
                (token_offset + n_tokens - 1) // {budget})::BIGINT AS seq_last
FROM o
"""


def split_assign_sql(table: str = "documents", id_col: str = "doc_id",
                     train_pct: int = SPLIT_TRAIN_PCT,
                     val_pct: int = SPLIT_VAL_PCT) -> str:
    """SQL twin of :func:`split_assign` (splitmix64 emitters)."""
    from ..functions.hashing import splitmix64_sql_cols
    return f"""
WITH h0 AS (SELECT {id_col}, {id_col}::HUGEINT AS u FROM {table}),
sm AS (
  SELECT {id_col},
    {splitmix64_sql_cols('u')}
  FROM h0
)
SELECT {id_col}, (h % 100)::BIGINT AS bucket,
       CASE WHEN h % 100 < {train_pct} THEN 'train'
            WHEN h % 100 < {train_pct + val_pct} THEN 'val'
            ELSE 'test' END AS split
FROM sm
"""


# ---------------------------------------------------------------------------
# corpus bigram-familiarity score (model fit -> broadcast -> score)
# ---------------------------------------------------------------------------


def _doc_bigram_hashes(texts: pd.Series,
                       tok) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc bigram hashes: ``splitmix64(h(w_i)·P + h(w_{i+1}) mod 2^64)``
    over the token sequence (same polynomial base as the token hash).
    Returns ``(flat uint64 bigram hashes, per-doc bigram counts)`` — one
    vectorized pass, no per-token Python."""
    from ..functions.hashing import _P, splitmix64
    toks = texts.fillna("").str.findall(tok)
    flat, counts, starts = _flat_tokens(toks)
    nb = np.maximum(counts - 1, 0)
    th = token_hashes(flat)
    if len(th) == 0:
        return np.empty(0, np.uint64), nb
    pos = np.arange(len(th), dtype=np.int64) - np.repeat(starts, counts)
    keep = pos < np.repeat(counts, counts) - 1  # not last-of-doc
    i1 = np.nonzero(keep)[0]
    return splitmix64(th[i1] * _P + th[i1 + 1]), nb


def bigram_model(ds, *, text_col: str = "text") -> "ray.data.Dataset":
    """Corpus-wide bigram-hash counts — the 2-gram vocabulary scan.
    Per-batch partial value counts bound the shuffle at one row per
    (batch, distinct bigram), never the token count."""
    from .shuffle import sorted_block_reduce
    tok = re.compile(TOKEN_RE)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bh, _ = _doc_bigram_hashes(b[text_col], tok)
        k, c = np.unique(bh, return_counts=True)
        return pd.DataFrame({"bh": k.view(np.int64),
                             "n_": c.astype(np.int64)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("bh", sort=False)["n_"].sum().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    return sorted_block_reduce(
        ds.map_batches(partial, batch_format="pandas", batch_size=None),
        "bh", combine)


def bigram_familiarity(ds, *, id_col: str = "doc_id",
                       text_col: str = "text") -> "ray.data.Dataset":
    """Per-document corpus-familiarity signal — the integer-exact stand-in
    for an n-gram LM quality score: for each document, the number of
    bigrams, the number of DISTINCT bigrams, and ``familiarity`` = the sum
    over its bigram occurrences of that bigram's corpus-wide count.
    Boilerplate and templated text score high; unique/garbled text scores
    low.  All-int64 sums are order-independent, so the result is
    bit-identical to the SQL twin (:func:`bigram_familiarity_sql`) with no
    float tolerance.

    Two passes: (1) :func:`bigram_model` fits the global counts
    (vocabulary-bounded shuffle); (2) the model is broadcast once via
    ``ray.put`` as two sorted int64 arrays and each batch scores itself
    with one ``searchsorted`` lookup.  At a vocabulary too large to
    broadcast (100-TB corpora), pass 2 becomes a sorted join of bigram
    rows against the model on ``bh`` (stages/join.sorted_join) — same
    output, shuffle-sized by occurrences instead."""
    import ray as _ray

    tok = re.compile(TOKEN_RE)
    model = bigram_model(ds, text_col=text_col).to_pandas()
    order = np.argsort(model["bh"].to_numpy(), kind="stable")
    ref = _ray.put((model["bh"].to_numpy()[order],
                    model["n"].to_numpy()[order]))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        keys, cnts = _ray.get(ref)
        bh, nb = _doc_bigram_hashes(b[text_col], tok)
        bhv = bh.view(np.int64)
        occ = cnts[np.searchsorted(keys, bhv)] if len(bh) else \
            np.empty(0, np.int64)
        starts = np.concatenate(([0], np.cumsum(nb)))[:-1]
        fam = np.zeros(len(nb), np.int64)
        ne = nb > 0
        if ne.any():
            fam[ne] = np.add.reduceat(occ, starts[ne])
        didx = np.repeat(np.arange(len(nb)), nb)
        nu = np.zeros(len(nb), np.int64)
        if len(bhv):
            o = np.lexsort((bhv, didx))
            ds_, bs_ = didx[o], bhv[o]
            first = np.ones(len(o), bool)
            first[1:] = (ds_[1:] != ds_[:-1]) | (bs_[1:] != bs_[:-1])
            np.add.at(nu, ds_[first], 1)
        return pd.DataFrame({id_col: b[id_col],
                             "n_bigrams": nb.astype(np.int64),
                             "n_unique_bigrams": nu,
                             "familiarity": fam})

    return ds.map_batches(score, batch_format="pandas", batch_size=None)


def bigram_familiarity_sql(table: str = "documents",
                           id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    """DuckDB twin of :func:`bigram_familiarity` (token-hash CTE + the
    same mulmod/splitmix bigram combine), bit-exact."""
    from ..functions import hashing
    mod = 1 << 64
    return ("WITH " + hashing.token_hash_cte_sql(
        table, id_col, f"coalesce({text_col}, '')") + f""",
bgu AS (
  SELECT a.{id_col},
         (({hashing.mulmod_sql('a.h', int(hashing._P))}) + b.h)
           % {mod}::HUGEINT AS u
  FROM sm a JOIN sm b ON b.{id_col} = a.{id_col} AND b.pos = a.pos + 1
),
bh AS (SELECT {id_col}, {hashing.splitmix64_sql_cols('u')} FROM bgu),
model AS (SELECT h, count(*)::HUGEINT AS c FROM bh GROUP BY h),
perdoc AS (
  SELECT b.{id_col}, count(*) AS nb, count(DISTINCT b.h) AS nu,
         sum(m.c) AS fam
  FROM bh b JOIN model m ON m.h = b.h
  GROUP BY b.{id_col})
SELECT d.{id_col},
       coalesce(s.nb, 0)::BIGINT AS n_bigrams,
       coalesce(s.nu, 0)::BIGINT AS n_unique_bigrams,
       coalesce(s.fam, 0)::BIGINT AS familiarity
FROM {table} d LEFT JOIN perdoc s ON s.{id_col} = d.{id_col}
""")


class TypeTokenRatio:
    """Lexical diversity (type/token ratio) per document — the cheap
    repetition/quality signal complementary to the Gopher repetition
    fractions.  Vectorized: one regex findall + factorize over the BATCH
    vocabulary, then distinct-per-doc via np.unique on (doc, code) pairs
    — no per-document Python.  ttr = n_distinct / n_tokens (single float
    division; 0.0 for empty docs), bit-equal to the DuckDB
    list_distinct twin."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        toks = t.str.lower().str.findall(self.tok)
        flat, counts, starts = _flat_tokens(toks)
        codes, _ = pd.factorize(np.asarray(flat, dtype=object))
        seg = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        pairs = seg * np.int64(len(codes) + 1) + codes
        uniq_seg = seg[np.unique(pairs, return_index=True)[1]] \
            if len(pairs) else np.empty(0, np.int64)
        n_distinct = np.bincount(uniq_seg, minlength=len(counts)) \
            .astype(np.int64)
        denom = counts.astype(np.float64)
        ttr = np.where(counts > 0, n_distinct / np.where(counts > 0,
                                                         denom, 1.0), 0.0)
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "n_tokens": pd.Series(counts, index=batch.index),
            "n_distinct": pd.Series(n_distinct, index=batch.index),
            "ttr": ttr,
        })


def type_token_ratio_sql(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """DuckDB twin of :class:`TypeTokenRatio` (same regex and division)."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS ws
  FROM {table}
)
SELECT {id_col}, len(ws)::BIGINT AS n_tokens,
       len(list_distinct(ws))::BIGINT AS n_distinct,
       CASE WHEN len(ws) = 0 THEN 0.0
            ELSE len(list_distinct(ws))::DOUBLE / len(ws) END AS ttr
FROM toks
""".strip()


def heavy_hitters(ds, *, k: int, text_col: str = "text") -> pd.DataFrame:
    """EXACT corpus heavy hitters — every word with frequency strictly
    above N/k tokens — without ever shuffling the full vocabulary.

    Two streaming passes (the classic sketch-prefilter + exact-verify
    shape, same family as decontaminate_bloom):

    1. candidate scan: each batch emits its LOCAL heavy hitters
       (``k·count_b(w) > n_b``, ≤ k-1 words per batch) plus its token
       total.  Pigeonhole guarantees the union is a SUPERSET of the
       global answer: if ``k·count_b ≤ n_b`` in every batch, summing
       gives ``k·N_w ≤ N``.  Candidate rows ≤ (k-1)·batches — tiny;
       deduped via one range shuffle, then broadcast (``ray.put``).
    2. verify scan: exact counts restricted to candidate words
       (vectorized ``Series.isin``), summed in a candidate-sized
       shuffle; filter ``k·N_w > N`` with the exact global N from
       pass 1.

    A full word_counts shuffle moves one row per (batch, distinct word)
    — fine for bounded vocabularies, quadratic pain for web-scale text
    with ~10^9 distinct tokens; this moves O(k·batches).  Result is
    EXACT (not approximate), so the DuckDB oracle matches bit-for-bit.
    """
    import ray
    import ray.data

    from .shuffle import sorted_block_reduce
    tok = re.compile(TOKEN_RE)
    kk = np.int64(k)

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(tok)
        flat, _, _ = _flat_tokens(toks)
        vc = pd.Series(flat).value_counts()
        n_b = np.int64(len(flat))
        local = vc[kk * vc.to_numpy() > n_b]
        # token-total marker rows ride along as word="" (TOKEN_RE never
        # matches an empty string, so "" cannot collide with a word)
        return pd.DataFrame({"word": np.append(
            local.index.to_numpy().astype(str), ""),
            "n_": np.append(local.to_numpy().astype(np.int64), n_b)})

    cand = sorted_block_reduce(
        ds.map_batches(scan, batch_format="pandas", batch_size=None),
        "word", lambda g: g.groupby("word", as_index=False)["n_"].sum()) \
        .to_pandas()
    total = np.int64(cand.loc[cand["word"] == "", "n_"].sum())
    words = cand.loc[cand["word"] != "", "word"].to_numpy()
    if not len(words):
        return pd.DataFrame({"word": np.empty(0, str),
                             "n": np.empty(0, np.int64)})
    wref = ray.put(set(words.tolist()))

    def exact(batch: pd.DataFrame) -> pd.DataFrame:
        wset = ray.get(wref)
        toks = batch[text_col].fillna("").str.lower().str.findall(tok)
        flat, _, _ = _flat_tokens(toks)
        vc = pd.Series(flat).value_counts()
        vc = vc[vc.index.isin(wset)]
        return pd.DataFrame({"word": vc.index.to_numpy().astype(str),
                             "n_": vc.to_numpy().astype(np.int64)})

    counts = sorted_block_reduce(
        ds.map_batches(exact, batch_format="pandas", batch_size=None),
        "word", lambda g: g.groupby("word", as_index=False)["n_"].sum()) \
        .to_pandas()
    out = counts[kk * counts["n_"].to_numpy() > total]
    return pd.DataFrame({"word": out["word"].to_numpy(),
                         "n": out["n_"].to_numpy().astype(np.int64)}) \
        .sort_values("word").reset_index(drop=True)


def heavy_hitters_sql(k: int, table: str = "documents",
                      text_col: str = "text") -> str:
    return f"""
WITH w AS (SELECT unnest(regexp_extract_all(lower({text_col}),
                                            '{TOKEN_RE}')) AS word
           FROM {table}),
c AS (SELECT word, count(*)::BIGINT AS n FROM w GROUP BY word),
t AS (SELECT count(*)::BIGINT AS total FROM w)
SELECT word, n FROM c, t WHERE n * {k} > total ORDER BY word
"""


SENT_RE = r"[^.!?\t\n\r\f\v ][^.!?]*"   # maximal non-terminator runs with
TERM_RE = r"[.!?]"                       # content; ASCII spaces explicit so
                                         # Python re and DuckDB RE2 agree


class SentenceStats:
    """Per-document sentence segmentation stats — the readability /
    quality-scoring companion of TokenStats, all vectorized ``str.count``
    (no per-doc Python):

    - n_sentences: maximal ``[.!?]``-free runs containing a non-space;
    - n_terms: terminator characters;
    - avg_sentence_chars: n_chars / n_sentences (one exact f64 division;
      0.0 for sentence-less docs) — raw-run length incl. spaces, a
      defined, SQL-reproducible metric."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        n_chars = t.str.len().astype("int64")
        n_sent = t.str.count(SENT_RE).astype("int64")
        n_terms = t.str.count(TERM_RE).astype("int64")
        avg = np.where(n_sent > 0,
                       n_chars.to_numpy().astype(np.float64)
                       / np.maximum(n_sent.to_numpy(), 1), 0.0)
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "n_sentences": n_sent,
            "n_terms": n_terms,
            "avg_sentence_chars": avg,
        })


def sentence_stats_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    return f"""
SELECT {id_col},
  array_length(regexp_extract_all({text_col},
      '[^.!?\\t\\n\\r\\f\\v ][^.!?]*'))::BIGINT AS n_sentences,
  length({text_col}) - length(replace(replace(replace(
      {text_col}, '.', ''), '!', ''), '?', '')) AS n_terms,
  CASE WHEN array_length(regexp_extract_all({text_col},
           '[^.!?\\t\\n\\r\\f\\v ][^.!?]*')) = 0 THEN 0.0
       ELSE length({text_col})::DOUBLE
            / array_length(regexp_extract_all({text_col},
                '[^.!?\\t\\n\\r\\f\\v ][^.!?]*')) END AS avg_sentence_chars
FROM {table}
""".strip()


def chunk_texts(ds, *, width: int = 256, stride: int = 192,
                id_col: str = "doc_id", text_col: str = "text"):
    """Sliding-window document chunking — the context-window preparation
    step of an LLM training pipeline: chunk j of a document covers
    codepoints ``[j·stride, j·stride + width)`` (``stride < width`` ⇒
    overlapping windows), a doc of length L yields ``ceil(L / stride)``
    chunks (empty docs none), the final chunk may be short.

    Vectorized by chunk ORDINAL, not by row: one arrow
    ``utf8_slice_codeunits`` kernel call per ordinal j over the (shrinking)
    subset of docs long enough to own chunk j — the per-batch loop length
    is max-chunks-per-doc, independent of row count.  Output
    ``(id, chunk_idx, chunk, chunk_len)``; codepoint semantics match
    DuckDB ``substr``/``length`` exactly."""
    import pyarrow.compute as pc

    def chunks(b: pa.Table) -> pa.Table:
        texts = b[text_col].combine_chunks()
        ids = b[id_col].combine_chunks()
        lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        parts = []
        j = 0
        alive = np.flatnonzero(lens > 0)
        while len(alive):
            sub = pa.array(alive.astype(np.int64))
            parts.append(pa.table({
                id_col: ids.take(sub),
                "chunk_idx": pa.array(np.full(len(alive), j, np.int64)),
                "chunk": pc.utf8_slice_codeunits(
                    texts.take(sub), start=j * stride,
                    stop=j * stride + width)}))
            j += 1
            alive = alive[lens[alive] > j * stride]
        if not parts:
            return pa.table({id_col: pa.array([], ids.type),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk": pa.array([], pa.string()),
                             "chunk_len": pa.array([], pa.int64())})
        out = pa.concat_tables(parts)
        return out.append_column(
            "chunk_len", pc.utf8_length(out["chunk"]).cast(pa.int64()))

    return ds.map_batches(chunks, batch_format="pyarrow")
