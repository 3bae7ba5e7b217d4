"""Span-sequence operators over the interleaved document table.

The north-rule invariant: every transform preserves per-row span-sequence
equality (kind, text, media_ref, order).  The round-trip test proves it
directly — explode to flat relational rows, shuffle, reassemble, and the
list<struct> payload is value-identical to the input."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from parallelspatialquery_ray.sources import synth
from parallelspatialquery_ray.stages import spans


def _sorted_table(t: pa.Table) -> pa.Table:
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


def test_explode_reassemble_roundtrip(ray_session):
    geo = synth.geo_doc_table(400, seed=7, family="clustered")
    ds = rd.from_arrow(geo).select_columns(["doc_id", "spans"])
    flat = spans.explode_spans(ds)
    back = spans.reassemble_spans(flat)
    got = _sorted_table(pa.Table.from_pandas(
        back.to_pandas(), preserve_index=False))
    want = _sorted_table(geo.select(["doc_id", "spans"]))
    # span-sequence equality: same docs, same spans, same order
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["spans"].to_pylist() == want["spans"].to_pylist()


def test_explode_positions_and_fields(ray_session):
    geo = synth.geo_doc_table(50, family="derived")
    flat = spans.explode_spans(rd.from_arrow(geo)).to_pandas()
    # doc i has i % 5 + 1 spans with span_idx 0..n-1
    for doc_id, g in flat.groupby("doc_id"):
        i = int(doc_id[1:])
        assert sorted(g["span_idx"]) == list(range(i % 5 + 1))
    # text spans carry text and no media_ref; media spans the reverse
    txt = flat[flat["kind"] == "text"]
    med = flat[flat["kind"] != "text"]
    assert (txt["text"].str.len() > 0).all() and (txt["media_ref"] == "").all()
    assert (med["media_ref"].str.startswith("ref://")).all() and \
        (med["text"] == "").all()


def test_span_kind_stats_matches_numpy(ray_session):
    geo = synth.geo_doc_table(300, family="derived")
    got = spans.span_kind_stats(rd.from_arrow(geo)).to_pandas() \
        .sort_values("kind").reset_index(drop=True)
    flat = spans.explode_spans(rd.from_arrow(geo)).to_pandas()
    want = flat.assign(n_chars=flat["text"].str.len()) \
        .groupby("kind").agg(n_spans=("kind", "size"),
                             total_text_chars=("n_chars", "sum"),
                             avg_offset=("span_offset", "mean")) \
        .reset_index().sort_values("kind").reset_index(drop=True)
    assert got["kind"].tolist() == want["kind"].tolist()
    assert got["n_spans"].tolist() == want["n_spans"].tolist()
    assert got["total_text_chars"].tolist() == want["total_text_chars"].tolist()
    np.testing.assert_allclose(got["avg_offset"], want["avg_offset"].round(6))


def test_span_dedup_first_occurrence(ray_session):
    geo = synth.geo_doc_table(200, family="derived")
    got = spans.span_dedup(rd.from_arrow(geo)).to_pandas()
    flat = spans.explode_spans(rd.from_arrow(geo)).to_pandas()
    txt = flat[flat["kind"] == "text"].copy()
    txt["content"] = txt["text"].str.split(" token ").str[0]
    txt["key"] = txt["doc_id"] + ":" + \
        txt["span_idx"].astype(str).str.zfill(10)
    want = txt.groupby("content").agg(n_spans=("content", "size"),
                                      first_ref=("key", "min")).reset_index()
    merged = got.sort_values("content").reset_index(drop=True)
    wanted = want.sort_values("content").reset_index(drop=True)
    assert merged["content"].tolist() == wanted["content"].tolist()
    assert merged["n_spans"].tolist() == wanted["n_spans"].tolist()
    assert merged["first_ref"].tolist() == wanted["first_ref"].tolist()
    # counts sum to the number of text spans
    assert merged["n_spans"].sum() == len(txt)


def test_derived_family_sql_exact():
    """The derived interleaved table regenerates bit-exactly in DuckDB."""
    import duckdb
    tbl = synth.geo_doc_table(120, family="derived")
    cte = synth.interleaved_sql_cte(120)
    docs = duckdb.sql(cte + "SELECT doc_id, x, y FROM docs ORDER BY doc_id") \
        .fetchall()
    want = sorted(zip(tbl["doc_id"].to_pylist(), tbl["x"].to_pylist(),
                      tbl["y"].to_pylist()))
    assert [tuple(r) for r in docs] == [tuple(w) for w in want]
    n_sql = duckdb.sql(cte + "SELECT count(*) FROM doc_spans").fetchone()[0]
    assert n_sql == sum(len(s) for s in tbl["spans"].to_pylist())
