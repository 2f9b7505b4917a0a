"""Prometheus export (operators/prometheus.py) — text exposition format,
pushgateway protocol against an in-process HTTP server, textfile sink,
and the Spark-accumulator bridge. Reference: stats/PrometheusStats.java."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from planetiler_spark.operators import prometheus as pm


def test_sanitize_metric_name():
    assert pm.sanitize_metric_name("a.b-c d") == "a_b_c_d"
    assert pm.sanitize_metric_name("9lives") == "_9lives"
    assert pm.sanitize_metric_name("ok_name:x") == "ok_name:x"


def test_text_format_counters_and_labels():
    reg = pm.Registry()
    reg.processed_element("node", "water", 7)
    reg.processed_element("node", "water", 7)
    reg.emitted_features(3, "poi", 12)
    reg.data_error("osm_invalid_multipolygon")
    text = reg.render()
    assert ("# TYPE planetiler_renderer_elements_processed counter\n"
            in text)
    assert ('planetiler_renderer_elements_processed'
            '{type="node",layer="water",zoom="7"} 2\n') in text
    assert ('planetiler_renderer_features_emitted'
            '{zoom="3",layer="poi"} 12\n') in text
    assert ('planetiler_bad_input_data'
            '{type="osm_invalid_multipolygon"} 1\n') in text


def test_label_escaping_and_value_spelling():
    reg = pm.Registry()
    reg.counter("weird", label="type", labels={'a"b\\c\nd': 3})
    reg.gauge("ratio", 0.25)
    text = reg.render()
    assert 'planetiler_weird{type="a\\"b\\\\c\\nd"} 3\n' in text
    assert "planetiler_ratio 0.25\n" in text


def test_gauge_supplier_timer_and_file(tmp_path):
    reg = pm.Registry()
    vals = {"x": 5}
    reg.gauge("live", lambda: vals["x"])
    stop = reg.timer("osm_pass2")
    p = tmp_path / "archive.mbtiles"
    p.write_bytes(b"x" * 1234)
    reg.monitor_file("mbtiles", str(p))
    text = reg.render()
    assert "planetiler_live 5\n" in text
    assert "planetiler_osm_pass2_running 1\n" in text
    assert "planetiler_file_mbtiles_size_bytes 1234\n" in text
    vals["x"] = 9
    stop()
    text = reg.render()
    assert "planetiler_live 9\n" in text
    assert "planetiler_osm_pass2_running 0\n" in text


class _Gateway(BaseHTTPRequestHandler):
    received: list = []

    def do_PUT(self):  # pushgateway wire: PUT /metrics/job/<job>
        body = self.rfile.read(int(self.headers["Content-Length"]))
        type(self).received.append((self.path, body.decode()))
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):  # quiet
        pass


def test_pushgateway_protocol_roundtrip():
    srv = HTTPServer(("127.0.0.1", 0), _Gateway)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        reg = pm.Registry()
        reg.counter("pushed", value=7)
        reg.push(f"http://127.0.0.1:{srv.server_port}", job="my job")
        path, body = _Gateway.received[-1]
        assert path == "/metrics/job/my%20job"
        assert "planetiler_pushed 7\n" in body
    finally:
        srv.shutdown()


def test_textfile_sink_and_counters_bridge(tmp_path, spark):
    from planetiler_spark.operators.progress import Counters

    c = Counters(spark.sparkContext, ["features", "tiles"])
    c.add("features", 41)
    c.add("features", 1)
    c.add("tiles", 7)
    reg = pm.from_counters(c)
    out = tmp_path / "metrics.prom"
    reg.write_textfile(str(out))
    text = out.read_text()
    assert "planetiler_features_total 42\n" in text
    assert "planetiler_tiles_total 7\n" in text
    assert "# TYPE planetiler_features_total counter\n" in text
