"""Edge hardening for the round-2 training-data operators: empty and
token-less corpora must not crash and must yield zero rows. (Ray Data
itself drops the schema of fully-empty datasets and `to_pandas()` on
an all-empty dataset returns a column-less frame — the assertions below
use Dataset.schema()/count(), which do keep the contract visible.)"""

from __future__ import annotations

import pyarrow as pa
import pytest


def _empty_docs():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
    }))


def _tokenless_docs():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["!!!", "…—…"], type=pa.string()),
    }))


def test_token_pack_empty_corpus(ray_session):
    from semantic_pdf_search_engine_ray.pipelines.packing import token_pack

    out = token_pack(_empty_docs(), capacity=64)
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "n_tokens", "start_pos",
                                  "seq_first", "seq_last"]


def test_token_pack_tokenless_docs(ray_session):
    from semantic_pdf_search_engine_ray.pipelines.packing import token_pack

    out = token_pack(_tokenless_docs(), capacity=64)
    assert out.count() == 0  # token-less docs occupy no stream positions
    assert out.schema().names == ["doc_id", "n_tokens", "start_pos",
                                  "seq_first", "seq_last"]


@pytest.mark.parametrize("docs_fn", [_empty_docs, _tokenless_docs])
def test_heavy_hitters_degenerate(ray_session, docs_fn):
    from semantic_pdf_search_engine_ray.pipelines.sketch import (
        heavy_hitter_terms,
    )

    out = heavy_hitter_terms(docs_fn(), k=5)
    assert out.num_rows == 0
    assert out.schema.names == ["rank", "term", "count"]


@pytest.mark.parametrize("docs_fn", [_empty_docs, _tokenless_docs])
def test_contamination_degenerate(ray_session, docs_fn):
    from semantic_pdf_search_engine_ray.pipelines.dedup import (
        contamination_hits,
    )

    assert contamination_hits(docs_fn(), benchmark_mod=7).count() == 0


def test_gopher_and_pii_tokenless(ray_session):
    from semantic_pdf_search_engine_ray.pipelines.textstats import (
        gopher_repetition,
        pii_redact,
    )

    g = gopher_repetition(_tokenless_docs()).to_pandas()
    assert g["top_bigram_count"].tolist() == [0, 0]
    assert g["n_lines"].tolist() == [1, 1]
    p = pii_redact(_tokenless_docs()).to_pandas()
    assert p["n_emails"].tolist() == [0, 0]


def test_semdedup_no_pairs_schema(ray_session, tmp_path):
    """Orthogonal vectors: zero pairs, stable empty-table schema."""
    import numpy as np
    import pyarrow.parquet as pq

    from semantic_pdf_search_engine_ray.pipelines.similarity import (
        semdedup_pairs,
    )

    vecs = np.eye(6, 8).tolist()
    path = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(6), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
    }), path)
    out = semdedup_pairs(path, n_clusters=3, threshold=0.9)
    assert out.num_rows == 0
    assert out.schema.names == ["cluster", "vec_id_a", "vec_id_b",
                                "cosine"]


def test_gopher_and_dedup_lines_on_multiline_docs(ray_session):
    """The sf fixtures contain no newlines, so the driver gate only
    trivially exercises the line-based signals; this pins the real
    multi-line behavior against DuckDB inline."""
    import duckdb

    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines import (
        conformance as cf,
    )
    from semantic_pdf_search_engine_ray.pipelines.textstats import (
        dedup_lines,
        gopher_repetition,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "subscribe now\nreal content one\nsubscribe now\nmore...",
            "a\n\na\nb\nb\nb",
            "no repeats here\njust two lines",
        ], type=pa.string()),
    })
    ds = rd.from_arrow(docs)

    con = duckdb.connect()
    con.register("documents", docs)
    for name, fn in (("gopher_repetition", gopher_repetition),
                     ("dedup_lines", dedup_lines)):
        mine = (fn(ds).to_pandas().sort_values("doc_id")
                .reset_index(drop=True))
        ref = (con.execute(cf.ORACLE_SQL[name]).df()
               .sort_values("doc_id").reset_index(drop=True))
        mine = mine[sorted(mine.columns)]
        ref = ref[sorted(ref.columns)]
        assert mine.columns.tolist() == ref.columns.tolist(), name
        assert mine.equals(ref.astype(mine.dtypes.to_dict())), (
            name, mine, ref)
    # spot-check the semantics directly
    g = gopher_repetition(ds).to_pandas().set_index("doc_id")
    assert g.loc[0, "dup_line_chars"] == 2 * len("subscribe now")
    assert g.loc[0, "n_ellipsis_lines"] == 1
    assert g.loc[1, "dup_line_chars"] == 5  # 'a','a','b','b','b'
    d = dedup_lines(ds).to_pandas().set_index("doc_id")
    assert d.loc[0, "n_lines_kept"] == 3
    assert d.loc[1, "n_lines_kept"] == 3  # 'a', '', 'b'
    assert d.loc[2, "n_lines_kept"] == 2


def test_curation_report_null_source_is_a_group(ray_session):
    from semantic_pdf_search_engine_ray.pipelines.textstats import (
        CurationReportStage,
    )

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["good enough text " * 10] * 3,
                         type=pa.string()),
        "source": pa.array(["web", None, "web"], type=pa.string()),
    })
    out = CurationReportStage()(batch)
    by_src = {r["source"]: r for r in out.to_pylist()}
    assert by_src["web"]["n_docs"] == 2
    assert by_src[None]["n_docs"] == 1


# --- round-3 wave 3: TPC-H Q3/Q6 + deterministic split ----------------

def test_split_assign_contract(ray_session):
    import ray.data as rd
    from semantic_pdf_search_engine_ray.pipelines.sampling import split_assign

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(1000)), type=pa.int64()),
    }))
    out = split_assign(docs).to_pandas()
    assert len(out) == 1000
    frac = out["split"].value_counts(normalize=True)
    # hash buckets over 1000 keys: proportions near 80/10/10
    assert abs(frac["train"] - 0.80) < 0.05
    assert abs(frac["val"] - 0.10) < 0.04
    assert abs(frac["test"] - 0.10) < 0.04
    # parallelism invariance: same assignment regardless of block count
    out8 = split_assign(docs.repartition(8)).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out8.sort_values("doc_id").reset_index(drop=True)
    assert (a["split"].values == b["split"].values).all()
    with pytest.raises(ValueError):
        split_assign(docs, pcts=(90, 5, 10))


def test_revenue_forecast_empty_filter(ray_session):
    import numpy as np
    import ray.data as rd
    from semantic_pdf_search_engine_ray.pipelines.relational import (
        revenue_forecast,
    )

    # every row outside the shipdate year -> zero revenue, zero items
    li = rd.from_arrow(pa.table({
        "l_shipdate": pa.array(
            [np.datetime64("1995-01-01T00:00:00", "us")] * 3),
        "l_discount": pa.array([0.05, 0.06, 0.07]),
        "l_quantity": pa.array([1.0, 2.0, 3.0]),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0]),
    }))
    out = revenue_forecast(li)
    assert out.column("revenue_c").to_pylist() == [0]
    assert out.column("n_items").to_pylist() == [0]


def test_shipping_priority_parallelism_invariant(ray_session):
    import os

    import ray.data as rd
    from semantic_pdf_search_engine_ray.pipelines.relational import (
        shipping_priority,
    )

    sf = "/root/testdata/sf0.001"
    def load(n_parts):
        c = rd.read_parquet(os.path.join(sf, "customer.parquet"),
                            columns=["c_custkey", "c_mktsegment"])
        o = rd.read_parquet(os.path.join(sf, "orders.parquet"),
                            columns=["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_orderpriority"])
        l = rd.read_parquet(os.path.join(sf, "lineitem.parquet"),
                            columns=["l_orderkey", "l_extendedprice",
                                     "l_discount", "l_shipdate"])
        if n_parts:
            c, o, l = (d.repartition(n_parts) for d in (c, o, l))
        return shipping_priority(c, o, l).to_pandas()

    a = load(0).reset_index(drop=True)
    b = load(7).reset_index(drop=True)
    assert len(a) == 10
    assert (a["l_orderkey"].values == b["l_orderkey"].values).all()
    assert (a["revenue_c"].values == b["revenue_c"].values).all()


def test_boolean_must_not_contract(ray_session):
    from semantic_pdf_search_engine_ray.pipelines import conformance as cf
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    index_dir = cf.ensure_index("/root/testdata/sf0.001")
    r = IndexReader(index_dir)
    head = cf.derive_query_table(index_dir).column("query").to_pylist()
    a, b = head[0], head[1]
    # only negations -> no positive terms -> empty
    assert r.top_k_boolean(f"-{a}", 5) == []
    # unknown negated term excludes nothing
    assert r.top_k_boolean(f"{a} -zzzznotaterm", 5) == \
        r.top_k_exhaustive(a, 5)
    # every surviving hit must NOT contain the negated term
    excluded_ids = set(r._term_postings(b)[0].tolist())
    hits = r.top_k_boolean(f"{a} -{b}", 20)
    assert hits, "positive head term must match something"
    assert all(d not in excluded_ids for d, _ in hits)


def test_decontaminate_bloom_equals_exact(ray_session, tmp_path):
    import ray.data as rd
    from semantic_pdf_search_engine_ray.pipelines import dedup as dd

    # doc 0 is "benchmark" (mod 7); docs 3 and 5 share its 13-gram;
    # doc 1 is clean
    phrase = " ".join(f"w{i}" for i in range(13))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 3, 5], type=pa.int64()),
        "text": pa.array([
            f"intro {phrase} outro",
            "totally unrelated text with many words here",
            f"prefix {phrase} suffix",
            f"{phrase}",
        ], type=pa.string()),
    }))
    exact = dd.contamination_hits(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bloom = dd.contamination_hits_bloom(
        docs, spill_dir=str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert exact.equals(bloom)
    assert set(bloom["doc_id"]) == {3, 5}


def test_link_graph_invariants(ray_session):
    import ray.data as rd
    from semantic_pdf_search_engine_ray.pipelines import graph as gr

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(50)), type=pa.int64()),
    }))
    deg = gr.degree_table(docs, n_docs=50).to_pandas()
    assert len(deg) == 50
    # every edge has one src and one dst endpoint
    assert deg["out_deg"].sum() == deg["in_deg"].sum()
    # out-degree bounded by the derivation rule (1 + d % 3, self-loops dropped)
    assert deg["out_deg"].max() <= 3

    pr = gr.pagerank(docs, n_docs=50, n_iters=3).to_pandas()
    assert len(pr) == 50
    assert (pr["rank_micro"] > 0).all()
    # floor-division only loses mass: total rank never exceeds SCALE
    assert pr["rank_micro"].sum() <= gr.SCALE
    # parallelism invariance: integer arithmetic, any block layout
    pr8 = gr.pagerank(docs.repartition(8), n_docs=50, n_iters=3).to_pandas()
    a = pr.sort_values("doc_id").reset_index(drop=True)
    b = pr8.sort_values("doc_id").reset_index(drop=True)
    assert (a["rank_micro"].values == b["rank_micro"].values).all()


def test_pagerank_plans_bit_equal(ray_session):
    import ray.data as rd
    from semantic_pdf_search_engine_ray.pipelines import graph as gr

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(80)), type=pa.int64()),
    }))
    fn = gr.pagerank(docs, 80, n_iters=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    jn = gr.pagerank(docs, 80, n_iters=4,
                     functional_edges=False).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (fn["rank_micro"].values == jn["rank_micro"].values).all()


def test_hits_plans_bit_equal(ray_session):
    import pytest

    import ray.data as rd
    from semantic_pdf_search_engine_ray.pipelines import graph as gr

    # > 1 chunk would need > PR_CHUNK docs (32,768) — too slow for a
    # unit test; the chunk-boundary path is covered by the 1M-node soak
    # (BASELINE.md) and the sf0.01 driver oracle.
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(90)), type=pa.int64()),
    }))
    fn = gr.hits_scores(docs, 90, n_iters=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    jn = gr.hits_scores(docs, 90, n_iters=3,
                        functional_edges=False).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (fn["authority_micro"].values
            == jn["authority_micro"].values).all()
    assert (fn["hub_micro"].values == jn["hub_micro"].values).all()
    with pytest.raises(ValueError):
        gr.hits_scores(docs, 90, n_iters=0)


def test_rollup_levels_consistent(ray_session):
    import ray.data as rd
    from semantic_pdf_search_engine_ray.pipelines.windows import (
        rollup_events,
    )

    events = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                             columns=["ts", "event_type", "value"])
    out = rollup_events(events).to_pandas()
    detail = out[out["hour"].notna() & out["event_type"].notna()]
    per_key = out[out["hour"].isna() & out["event_type"].notna()]
    total = out[out["event_type"].isna()]
    assert len(total) == 1
    # every level must re-add to the same grand totals
    assert detail["n_events"].sum() == total["n_events"].iloc[0]
    assert per_key["n_events"].sum() == total["n_events"].iloc[0]
    assert detail["value_c"].sum() == total["value_c"].iloc[0]


def test_global_quantiles_bracket_the_distribution(ray_session):
    import ray.data as rd
    from semantic_pdf_search_engine_ray.pipelines.windows import (
        global_quantiles_histogram,
    )

    events = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                             columns=["value"])
    out = global_quantiles_histogram(events).to_pandas()
    v = dict(zip(out["q"], out["value"]))
    assert v[0.5] <= v[0.95] <= v[0.99]
    raw = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                          columns=["value"]).to_pandas()["value"]
    assert raw.min() <= v[0.5] <= raw.max()


def test_value_moments_nonnegative_variance(ray_session):
    import ray.data as rd
    from semantic_pdf_search_engine_ray.pipelines.windows import (
        value_moments,
    )

    events = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                             columns=["event_type", "value"])
    out = value_moments(events).to_pandas()
    assert (out["var_r"] >= 0).all()
    # std is rounded at 6 dp, so std^2 carries ~2*std*1e-6 of rounding
    tol = 2 * out["std_r"] * 1e-6 + 1e-6
    assert ((out["std_r"] ** 2 - out["var_r"]).abs() <= tol).all()


def test_curation_pipeline_rerun_stable(ray_session):
    from semantic_pdf_search_engine_ray.pipelines import conformance as cf

    a = cf.QUERIES["curation_pipeline"]("/root/testdata/sf0.001") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = cf.QUERIES["curation_pipeline"]("/root/testdata/sf0.001") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # survivors are a strict, non-empty subset of the corpus
    assert 0 < len(a) < 500


def test_static_rank_blending_reorders(ray_session):
    """The PageRank prior must actually influence ranking (not a
    vacuous pass-through) while never admitting non-matching docs."""
    import numpy as np

    from semantic_pdf_search_engine_ray.pipelines import conformance as cf
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    index_dir = cf.ensure_index("/root/testdata/sf0.001")
    r = IndexReader(index_dir)
    head = cf.derive_query_table(index_dir).column("query").to_pylist()
    prior = np.zeros(len(r.doc_len))
    # adversarial prior: strongly boost odd doc_ids
    prior[1::2] = 100.0
    changed = False
    for q in head[:10]:
        plain = [d for d, _ in r.top_k_exhaustive(q, 5)]
        blend = [d for d, _ in r.top_k_blended(q, 5, prior)]
        matched = {d for d, _ in r.top_k_exhaustive(q, 10_000)}
        assert set(blend) <= matched
        if blend != plain:
            changed = True
    assert changed
