"""Property-based testing of the round-3 operators (hypothesis): random
inputs, results must equal a straightforward single-process Python
reference — beyond the reference repo's test strategy (SURVEY.md §5 has
no randomized testing)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def doc_corpus(draw):
    n = draw(st.integers(1, 30))
    return [
        (i, draw(st.lists(st.integers(0, 99), min_size=0, max_size=12)))
        for i in range(n)
    ]


@given(docs=doc_corpus(), max_len=st.integers(2, 17))
@settings(**_SETTINGS)
def test_pack_sequences_property(spark, docs, max_len):
    from upgini_spark.functions.tokens import pack_sequences

    df = spark.createDataFrame(docs, "doc_id int, toks array<int>")
    got = {
        r["chunk_id"]: (list(r["tokens"]), r["n_docs"])
        for r in pack_sequences(df, "doc_id", "toks", max_len).collect()
    }
    stream, owners = [], []
    for i, toks in docs:
        stream += toks
        owners += [i] * len(toks)
    want = {
        c // max_len: (stream[c:c + max_len], len(set(owners[c:c + max_len])))
        for c in range(0, len(stream), max_len)
    }
    assert got == want


@st.composite
def edge_list(draw):
    n_nodes = draw(st.integers(2, 40))
    n_edges = draw(st.integers(1, 60))
    return [
        (draw(st.integers(0, n_nodes - 1)), draw(st.integers(0, n_nodes - 1)))
        for _ in range(n_edges)
    ]


def _py_components(edges):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@given(edges=edge_list())
@settings(**_SETTINGS)
def test_connected_components_property(spark, edges):
    from upgini_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {r["node"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == _py_components(edges)


@given(
    n=st.integers(1, 200),
    rate_a=st.floats(0.0, 1.0),
    rate_b=st.floats(0.0, 1.0),
)
@settings(**_SETTINGS)
def test_sample_by_rates_property(spark, n, rate_a, rate_b):
    import hashlib

    from upgini_spark.functions.sampling import sample_by_rates

    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")).alias("g"),
    )
    kept = {r["id"] for r in
            sample_by_rates(df, "g", {"a": rate_a, "b": rate_b}, ["id"]).collect()}
    for i in range(n):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) / float(1 << 60)
        rate = rate_a if i % 2 == 0 else rate_b
        assert (i in kept) == (u < rate)
