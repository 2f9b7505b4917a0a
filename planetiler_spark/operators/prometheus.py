"""Prometheus stats export — stats/PrometheusStats.java:41-356 re-expressed.

The reference pushes its metric registry to a Prometheus pushgateway on an
interval. This module implements the same surface from scratch against the
PUBLIC wire formats (no client library):

  - the Prometheus/OpenMetrics TEXT EXPOSITION FORMAT (`# HELP` / `# TYPE` /
    `name{label="v"} value` lines, label-value escaping per the spec);
  - the pushgateway protocol (PUT /metrics/job/<job> with the text body);
  - a node_exporter-style TEXTFILE sink (write <path>.prom atomically) for
    air-gapped runs — this sandbox has no network, so the push client is
    exercised against an in-process HTTP server in tests.

Metric names and label sets mirror the reference exactly
(PrometheusStats.java:115-143):

  planetiler_renderer_elements_processed{type,layer,zoom}   counter
  planetiler_renderer_features_emitted{zoom,layer}          counter
  planetiler_bad_input_data{type}                           counter
  planetiler_<task>_running / _elapsed_time_seconds         gauges (timers)
  planetiler_file_<name>_size_bytes                         gauge
  planetiler_<name>                                         user gauges/counters

Spark integration: `from_counters` snapshots an operators.progress.Counters
(Spark accumulators) into counter metrics, so a driver loop can push live
job progress exactly like the reference's `prometheus-pusher` thread.
"""

from __future__ import annotations

import os
import re
import threading
import time
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

BASE = "planetiler_"

_INVALID = re.compile(r"[^a-zA-Z0-9:_]")


def sanitize_metric_name(name: str) -> str:
    """Collector.sanitizeMetricName semantics: every invalid char -> '_',
    and a leading digit gets a '_' prefix."""
    out = _INVALID.sub("_", name)
    if out and out[0].isdigit():
        out = "_" + out
    return out


def _escape_label(v: str) -> str:
    """Label-value escaping per the text-format spec: backslash, quote, LF."""
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _fmt(v: float) -> str:
    """Prometheus value spelling: integral values without the trailing .0
    (what the simpleclient's DoubleUtil.doubleToGoString emits)."""
    f = float(v)
    if f != f:
        return "NaN"
    if f in (float("inf"), float("-inf")):
        return "+Inf" if f > 0 else "-Inf"
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


@dataclass
class _Family:
    name: str
    kind: str                 # 'counter' | 'gauge'
    help: str = ""
    # label-tuple -> value; () for unlabeled
    label_names: tuple = ()
    samples: dict = field(default_factory=dict)


class Registry:
    """Metric registry + text-format renderer (the Stats surface)."""

    def __init__(self):
        self._fams: dict[str, _Family] = {}
        self._gauge_fns: dict[str, tuple[str, object]] = {}
        self._timers: dict[str, dict] = {}
        self._files: dict[str, str] = {}
        self._lock = threading.Lock()
        # the reference's three built-ins (PrometheusStats.java:115-143)
        self._family("renderer_elements_processed", "counter",
                     "Number of source elements processed",
                     ("type", "layer", "zoom"))
        self._family("bad_input_data", "counter",
                     "Number of data inconsistencies encountered in source data",
                     ("type",))
        self._family("renderer_features_emitted", "counter",
                     "Features enqueued for writing to feature DB",
                     ("zoom", "layer"))

    def _family(self, name: str, kind: str, help: str = "",
                label_names: tuple = ()) -> _Family:
        key = BASE + sanitize_metric_name(name)
        fam = self._fams.get(key)
        if fam is None:
            fam = _Family(key, kind, help, label_names)
            self._fams[key] = fam
        return fam

    # --- Stats interface analogs -------------------------------------------

    def processed_element(self, elem_type: str, layer: str, zoom: int,
                          n: int = 1):
        self._inc("renderer_elements_processed",
                  (elem_type, layer, str(zoom)), n)

    def emitted_features(self, zoom: int, layer: str, n: int):
        self._inc("renderer_features_emitted", (str(zoom), layer), n)

    def data_error(self, error_code: str, n: int = 1):
        self._inc("bad_input_data", (error_code,), n)

    def counter(self, name: str, value: float = None, label: str = None,
                labels: dict | None = None):
        """Register/add a user counter; `labels` {label_value: count} with a
        `label` name mirrors counter(name, label, values) at :193."""
        with self._lock:
            if labels is not None:
                fam = self._family(name, "counter", "", (label or "label",))
                for lv, v in labels.items():
                    fam.samples[(str(lv),)] = fam.samples.get((str(lv),), 0) + v
            else:
                fam = self._family(name, "counter")
                fam.samples[()] = fam.samples.get((), 0) + (value or 0)

    def gauge(self, name: str, value):
        """Gauge: a number, or a 0-arg callable polled at render time
        (PrometheusStats.gauge:106)."""
        with self._lock:
            if callable(value):
                self._gauge_fns[BASE + sanitize_metric_name(name)] = ("", value)
            else:
                fam = self._family(name, "gauge")
                fam.samples[()] = float(value)

    def timer(self, task: str):
        """Start a task timer -> gauges <task>_running/_elapsed_time_seconds
        (InProgressTasks collector, :224-240). Returns a stop() callable."""
        t0 = time.monotonic()
        rec = {"t0": t0, "running": True, "elapsed": 0.0}
        with self._lock:
            self._timers[sanitize_metric_name(task)] = rec

        def stop():
            rec["elapsed"] = time.monotonic() - rec["t0"]
            rec["running"] = False
        return stop

    def monitor_file(self, name: str, path: str):
        """planetiler_file_<name>_size_bytes gauge (FileSizeCollector)."""
        self._files[sanitize_metric_name(name)] = path

    def _inc(self, name: str, label_values: tuple, n: float):
        with self._lock:
            fam = self._fams[BASE + sanitize_metric_name(name)]
            fam.samples[label_values] = fam.samples.get(label_values, 0) + n

    # --- render --------------------------------------------------------------

    def render(self) -> str:
        """The full text-format payload (PrometheusStats.getMetricsAsString:146
        analog)."""
        with self._lock:
            out = []
            for fam in self._fams.values():
                out.append(f"# HELP {fam.name} {fam.help}\n"
                           f"# TYPE {fam.name} {fam.kind}\n")
                for lv, v in sorted(fam.samples.items()):
                    if lv:
                        lbl = ",".join(
                            f'{n}="{_escape_label(x)}"'
                            for n, x in zip(fam.label_names, lv))
                        out.append(f"{fam.name}{{{lbl}}} {_fmt(v)}\n")
                    else:
                        out.append(f"{fam.name} {_fmt(v)}\n")
            for name, (help_, fn) in self._gauge_fns.items():
                out.append(f"# HELP {name} {help_}\n# TYPE {name} gauge\n"
                           f"{name} {_fmt(float(fn()))}\n")
            now = time.monotonic()
            for task, rec in self._timers.items():
                running = rec["running"]
                elapsed = (now - rec["t0"]) if running else rec["elapsed"]
                for suffix, v in ((f"{task}_running", 1.0 if running else 0.0),
                                  (f"{task}_elapsed_time_seconds", elapsed)):
                    out.append(f"# HELP {BASE}{suffix} {BASE}{suffix} value\n"
                               f"# TYPE {BASE}{suffix} gauge\n"
                               f"{BASE}{suffix} {_fmt(v)}\n")
            for name, path in self._files.items():
                try:
                    size = os.path.getsize(path)
                except OSError:
                    size = 0
                m = f"{BASE}file_{name}_size_bytes"
                out.append(f"# HELP {m} Size of {name} in bytes\n"
                           f"# TYPE {m} gauge\n{m} {_fmt(size)}\n")
            return "".join(out)

    # --- sinks ---------------------------------------------------------------

    def push(self, gateway: str, job: str = "planetiler", timeout: float = 10.0):
        """Pushgateway protocol: PUT /metrics/job/<job> with the text body."""
        url = f"{gateway.rstrip('/')}/metrics/job/{urllib.parse.quote(job, safe='')}"
        req = urllib.request.Request(
            url, data=self.render().encode(),
            headers={"Content-Type": "text/plain; version=0.0.4"},
            method="PUT")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if resp.status // 100 != 2:
                raise IOError(f"pushgateway returned {resp.status}")

    def write_textfile(self, path: str):
        """node_exporter textfile-collector sink: atomic write of the same
        payload (the no-network twin of push())."""
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(self.render())
        os.replace(tmp, path)


def from_counters(counters, registry: Registry | None = None) -> Registry:
    """Snapshot an operators.progress.Counters (Spark accumulators) into
    counters named planetiler_<name>_total — the bridge that lets a driver
    loop push live Spark job progress like the reference's pusher thread."""
    reg = registry or Registry()
    snap = counters.snapshot()
    with reg._lock:
        for name, v in snap.items():
            fam = reg._family(f"{name}_total", "counter",
                              f"Spark accumulator {name}")
            fam.samples[()] = float(v)
    return reg


class Pusher:
    """The reference's `prometheus-pusher` daemon thread
    (PrometheusStats.java:77-87): push every `interval` seconds (min 5),
    once more on close."""

    def __init__(self, registry: Registry, gateway: str,
                 job: str = "planetiler", interval: float = 15.0):
        self.registry = registry
        self.gateway = gateway
        self.job = job
        self.interval = max(interval, 5.0)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="prometheus-pusher")

    def _run(self):
        while not self._stop.wait(self.interval):
            try:
                self.registry.push(self.gateway, self.job)
            except Exception:  # same swallow-and-log as the reference :101
                pass

    def __enter__(self):
        try:
            self.registry.push(self.gateway, self.job)  # initial push, :77
        except Exception:
            pass
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)
        try:
            self.registry.push(self.gateway, self.job)  # final push, :216
        except Exception:
            pass
