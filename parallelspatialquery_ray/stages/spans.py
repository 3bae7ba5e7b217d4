"""Span-level operators over the interleaved text+media document table.

The engine's authoritative input shape (driver ``input_hint``) is
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)`` —
one row per document, the payload an ORDERED span sequence mixing text and
media.  The reference carries no such payload (its rows are bare id/x/y
points, PlaneSweepParallel/AllKnnProblem.h); these operators are the
"wide interleaved rows" half of the graft: every transform must preserve
per-row span-sequence equality (kind, text, media_ref, order).

All operators are vectorized Arrow: the list column is flattened ONCE per
batch with ``pc.list_parent_indices`` + ``ListArray.flatten()`` (zero-copy
into the struct children), never a Python loop over rows or spans.

- :func:`explode_spans` — list<struct> -> one flat row per span, with the
  span's 0-based position (``span_idx``) preserved so order survives the
  relational detour.
- :func:`reassemble_spans` — the exact inverse: flat span rows back to the
  input_hint list<struct> layout, re-ordered by ``span_idx``.  explode ∘
  reassemble is the identity on span sequences (property-tested).
- :func:`span_kind_stats` — grouped aggregate over span kinds with
  per-batch partial combine (shuffle moves one row per kind per batch).
- :func:`span_dedup` — exact span-content dedup (normalize -> group ->
  keep first), the paragraph-level analogue of document ``exact_dedup``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .shuffle import sorted_block_reduce

SPAN_FIELDS = ("kind", "text", "media_ref", "offset")


def _flatten_block(b: pa.Table, spans_col: str, id_col: str):
    """(parent-row indices, flat struct array) for one batch — vectorized."""
    spans = b[spans_col].combine_chunks()
    par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = spans.flatten()  # honors list offsets/slices
    return par, flat


def _span_positions(par: np.ndarray) -> np.ndarray:
    """0-based position of each span within its parent doc, from the
    nondecreasing parent-index array (run-relative arange)."""
    n = len(par)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    idx = np.arange(n, dtype=np.int64)
    change = np.concatenate([[True], par[1:] != par[:-1]])
    run_starts = idx[change]
    run_lens = np.diff(np.concatenate([run_starts, [n]]))
    return (idx - np.repeat(run_starts, run_lens)).astype(np.int32)


def explode_spans(ds: ray.data.Dataset, *, spans_col: str = "spans",
                  id_col: str = "doc_id",
                  keep_cols: tuple = ()) -> ray.data.Dataset:
    """One output row per span: ``(doc_id, span_idx, kind, text, media_ref,
    span_offset, *keep_cols)``.  ``span_idx`` is the span's position in the
    document's sequence — the order half of the span-sequence invariant.
    (``offset`` is renamed ``span_offset`` on the flat side: it stays a
    reserved word in the oracle dialect otherwise.)"""

    def f(b: pa.Table) -> pa.Table:
        par, flat = _flatten_block(b, spans_col, id_col)
        par_idx = pa.array(par, pa.int64())
        cols = {
            id_col: pc.take(b[id_col].combine_chunks(), par_idx),
            "span_idx": pa.array(_span_positions(par), pa.int32()),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "span_offset": flat.field("offset"),
        }
        for c in keep_cols:
            cols[c] = pc.take(b[c].combine_chunks(), par_idx)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def reassemble_spans(ds: ray.data.Dataset, *, id_col: str = "doc_id",
                     spans_col: str = "spans") -> ray.data.Dataset:
    """Inverse of :func:`explode_spans`: flat span rows -> one row per doc
    with the input_hint ``list<struct>`` column, spans re-ordered by
    ``span_idx``.  Range-shuffles on ``id_col`` so each block holds every
    span of any doc it holds, then rebuilds the list layout vectorized
    (argsort + ListArray.from_arrays — no per-doc Python)."""

    def rebuild(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(b, sort_keys=[(id_col, "ascending"),
                                              ("span_idx", "ascending")])
        b = b.take(order)
        ids = b[id_col].combine_chunks()
        enc = ids.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        # run starts over the sorted doc ids -> list offsets
        n = len(b)
        change = np.concatenate([[True], enc[1:] != enc[:-1]])
        starts = np.arange(n, dtype=np.int64)[change]
        offsets = pa.array(np.concatenate([starts, [n]]).astype(np.int32))
        struct = pa.StructArray.from_arrays(
            [b["kind"].combine_chunks(), b["text"].combine_chunks(),
             b["media_ref"].combine_chunks(),
             b["span_offset"].combine_chunks()],
            names=list(SPAN_FIELDS))
        spans = pa.ListArray.from_arrays(offsets, struct)
        doc_ids = ids.take(pa.array(starts))
        return pa.table({id_col: doc_ids, spans_col: spans})

    return sorted_block_reduce(ds, id_col, rebuild, batch_format="pyarrow")


def span_kind_stats(ds: ray.data.Dataset, *, spans_col: str = "spans",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-kind span statistics over the whole corpus: span count, total
    text chars, mean stored offset.  Partial-aggregated per batch (the
    tumbling-window combiner shape): the shuffle moves <= |kinds| rows per
    batch regardless of corpus size."""
    flat = explode_spans(ds, spans_col=spans_col, id_col=id_col)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(n_chars=g["text"].str.len().astype(np.int64),
                     off=g["span_offset"].astype(np.int64))
        out = g.groupby("kind", sort=False).agg(
            n_spans=("kind", "size"), total_text_chars=("n_chars", "sum"),
            sum_offset=("off", "sum")).reset_index()
        out["n_spans"] = out["n_spans"].astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("kind", sort=False).agg(
            n_spans=("n_spans", "sum"),
            total_text_chars=("total_text_chars", "sum"),
            sum_offset=("sum_offset", "sum")).reset_index()
        out["avg_offset"] = (out["sum_offset"] / out["n_spans"]).round(6)
        return out[["kind", "n_spans", "total_text_chars", "avg_offset"]]

    partials = flat.map_batches(partial, batch_format="pandas",
                                batch_size=None)
    return sorted_block_reduce(partials, "kind", final)


def span_dedup(ds: ray.data.Dataset, *, spans_col: str = "spans",
               id_col: str = "doc_id", kind: str = "text",
               normalize_sep: str = " token ") -> ray.data.Dataset:
    """Exact span-level dedup (paragraph dedup): text spans normalized
    (content before ``normalize_sep``), grouped by normalized content,
    keeping the FIRST occurrence (min ``doc_id||span_idx`` key) and the
    duplicate count.  Per-batch partials: each batch ships one row per
    distinct content, so a million-way-duplicated span moves one row per
    batch, not every row into one block (the r1-verdict exact_dedup fix,
    applied here from the start)."""
    flat = explode_spans(ds, spans_col=spans_col, id_col=id_col)
    flat = flat.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], kind)),
        batch_format="pyarrow")

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        # span_idx < 2**31; a fixed-width decimal render keeps the compound
        # first-occurrence key ordered lexicographically == numerically
        key = g[id_col] + ":" + g["span_idx"].astype(np.int64) \
            .astype(str).str.zfill(10)
        content = g["text"].str.split(normalize_sep, n=1).str[0]
        out = pd.DataFrame({"content": content, "first_ref": key})
        return out.groupby("content", sort=False).agg(
            n_spans=("content", "size"),
            first_ref=("first_ref", "min")).reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("content", sort=False).agg(
            n_spans=("n_spans", "sum"),
            first_ref=("first_ref", "min")).reset_index()
        out["n_spans"] = out["n_spans"].astype(np.int64)
        return out

    partials = flat.map_batches(partial, batch_format="pandas",
                                batch_size=None)
    return sorted_block_reduce(partials, "content", final)
