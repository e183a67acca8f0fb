"""Hypothesis property tests (SURVEY §5: the reference's test strategy
includes randomized invariants): codec round-trips over arbitrary
payload shapes, varint edge cases, and binary graph-format round-trips
over random edge lists."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from icebug_spark.llm import codecs
from icebug_spark.sources import readers3


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ppm_bmp_roundtrip_any_shape(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (codecs.decode_netpbm(codecs.encode_ppm(px)) == px).all()
    assert (codecs.decode_bmp(codecs.encode_bmp(px)) == px).all()
    assert (codecs.decode_image(codecs.encode_ppm(px)) == px).all()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=5000),
    sr=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_any_length(n, sr, seed):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n) * 10000).astype(np.int16)
    y, sr2 = codecs.decode_wav(codecs.encode_wav(x, sr))
    assert sr2 == sr and len(y) == n
    if n:
        assert np.allclose(y * 32768.0, x, atol=0.51)


@settings(max_examples=50, deadline=None)
@given(x=st.integers(min_value=0, max_value=2**63 - 1))
def test_varint_roundtrip(x):
    buf = readers3._varint_encode(x)
    # decode inline (mirror of read_thrill_binary's loop)
    val = shift = pos = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    assert val == x and pos == len(buf)


@settings(max_examples=10, deadline=None)
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=300),
            st.integers(min_value=0, max_value=300),
        ).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=60,
    ),
    directed=st.booleans(),
)
def test_graphtool_binary_roundtrip_random(spark, edges, directed):
    from icebug_spark.graph.core import Graph

    rows = sorted({(u, v) if directed else (min(u, v), max(u, v)) for u, v in edges})
    g = Graph.from_edge_list(spark, rows, directed=directed)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.gt")
        readers3.write_graphtool_binary(g, p)
        g2 = readers3.read_graphtool_binary(spark, p)
    assert g2.directed == directed
    got = sorted((r["src"], r["dst"]) for r in g2.edges.collect())
    assert got == rows
