"""Gephi graph-streaming export: protocol shape + round-trip."""

import json

from pyspark.sql import functions as F

from icebug_spark.sources.gephi import (
    gephi_events,
    read_gephi_stream,
    write_gephi_stream,
)


def test_gephi_event_protocol_shape(spark):
    e = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 1.0)], "src BIGINT, dst BIGINT, weight DOUBLE"
    )
    events = [r["event"] for r in gephi_events(e).collect()]
    parsed = [json.loads(x) for x in events]
    an = [p for p in parsed if "an" in p]
    ae = [p for p in parsed if "ae" in p]
    assert len(an) == 3 and len(ae) == 2
    # nodes precede edges in the stream (plugin requirement)
    assert all("an" in p for p in parsed[:3])
    edge = ae[0]["ae"]
    (eid, payload), = edge.items()
    assert payload["source"] + "-" + payload["target"] == eid
    assert payload["directed"] is False
    assert isinstance(payload["weight"], float)


def test_gephi_round_trip(spark, tmp_path):
    e = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 1.0), (2, 3, 4.0)],
        "src BIGINT, dst BIGINT, weight DOUBLE",
    )
    p = str(tmp_path / "gephi_stream")
    write_gephi_stream(e, p)
    back = read_gephi_stream(spark, p)
    got = sorted((r["src"], r["dst"], r["weight"]) for r in back.collect())
    assert got == [(0, 1, 2.5), (1, 2, 1.0), (2, 3, 4.0)]


def test_gephi_delete_events_win(spark, tmp_path):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src BIGINT, dst BIGINT, weight DOUBLE"
    )
    p = str(tmp_path / "gephi_stream2")
    write_gephi_stream(e, p)
    # append a delete event for edge 1-2, as the live plugin would emit
    extra = spark.createDataFrame([('{"de": {"1-2": "1-2"}}',)], "value STRING")
    extra.write.mode("append").text(p)
    back = read_gephi_stream(spark, p)
    got = sorted((r["src"], r["dst"]) for r in back.collect())
    assert got == [(0, 1)]


def test_gephi_node_attrs(spark):
    e = spark.createDataFrame([(0, 1)], "src BIGINT, dst BIGINT")
    attrs = spark.createDataFrame([(0, 0.7), (1, 0.2)], "id BIGINT, score DOUBLE")
    events = [r["event"] for r in gephi_events(e, node_attrs=attrs).collect()]
    an = [json.loads(x)["an"] for x in events if "an" in json.loads(x)]
    payloads = {k: v for d in an for k, v in d.items()}
    assert payloads["0"]["score"] == 0.7 and payloads["1"]["score"] == 0.2


def test_gephi_duplicate_ae_collapses(spark, tmp_path):
    e = spark.createDataFrame([(0, 1, 1.0)], "src BIGINT, dst BIGINT, weight DOUBLE")
    p = str(tmp_path / "gephi_dup")
    write_gephi_stream(e, p)
    write_gephi_stream(e, p + "2")
    # append a duplicate ae event (same id, higher weight)
    extra = spark.createDataFrame(
        [('{"ae": {"0-1": {"source": "0", "target": "1", "directed": false, "weight": 3.0}}}',)],
        "value STRING",
    )
    extra.write.mode("append").text(p)
    back = read_gephi_stream(spark, p).collect()
    assert len(back) == 1 and back[0]["weight"] == 3.0


def _live_server():
    """Minimal Streaming-plugin master stand-in: captures every POST body
    and its query string on a real socket."""
    import http.server
    import threading

    captured: list[tuple[str, str]] = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            captured.append((self.path, body.decode("utf-8")))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"{}")

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, captured


def test_gephi_live_client_export_over_http(spark):
    from icebug_spark.sources.gephi import GephiLiveClient

    srv, captured = _live_server()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/workspace0"
        client = GephiLiveClient(url, batch_lines=3)
        e = spark.createDataFrame(
            [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 1.0)],
            "src BIGINT, dst BIGINT, weight DOUBLE",
        )
        sent = client.export_graph(e)
        assert sent == 4 + 3  # 4 an + 3 ae
        assert all(p.endswith("?operation=updateGraph") for p, _ in captured)
        lines = [
            json.loads(ln)
            for _, body in captured
            for ln in body.strip().splitlines()
        ]
        # first POST is the clean
        assert lines[0] == {"dn": {"filter": "ALL"}}
        ans = [ln for ln in lines if "an" in ln]
        aes = [ln for ln in lines if "ae" in ln]
        assert len(ans) == 4 and len(aes) == 3
        # nodes stream strictly before edges
        order = ["an" if "an" in ln else "ae" for ln in lines[1:] if ("an" in ln or "ae" in ln)]
        assert order == ["an"] * 4 + ["ae"] * 3
        ae_payload = {k: v for ln in aes for k, v in ln["ae"].items()}
        assert ae_payload["0-1"]["weight"] == 2.0
        assert ae_payload["0-1"]["directed"] is False

        # attribute push (cn) + single-edge ops, reference streaming.py:93,116
        vals = spark.createDataFrame([(0, 0.5), (1, 0.25)], "id BIGINT, value DOUBLE")
        assert client.export_node_values(vals, "rank") == 2
        client.export_additional_edge(3, 0)
        client.remove_exported_edge(3, 0)
        lines = [
            json.loads(ln)
            for _, body in captured
            for ln in body.strip().splitlines()
        ]
        cns = {k: v for ln in lines if "cn" in ln for k, v in ln["cn"].items()}
        assert cns["0"]["rank"] == 0.5 and cns["1"]["rank"] == 0.25
        assert any("ae" in ln and "0-3" in ln.get("ae", {}) for ln in lines)
        assert any("de" in ln and "0-3" in ln.get("de", {}) for ln in lines)
    finally:
        srv.shutdown()


def test_gephi_live_client_injected_transport(spark):
    """Offline path: injected http_post sees batched CRLF-joined lines."""
    from icebug_spark.sources.gephi import GephiLiveClient

    posts: list[str] = []
    client = GephiLiveClient(
        "http://example.invalid/ws0",
        batch_lines=2,
        http_post=lambda url, data: posts.append(data),
    )
    vals = spark.createDataFrame(
        [(i, float(i)) for i in range(5)], "id BIGINT, value DOUBLE"
    )
    assert client.export_node_values(vals, "v") == 5
    # 5 events at batch_lines=2 → 3 POSTs (2+2+1), every line valid JSON
    assert len(posts) == 3
    assert [len(p.strip().splitlines()) for p in posts] == [2, 2, 1]
    for p in posts:
        for ln in p.strip().splitlines():
            assert "cn" in json.loads(ln)
