"""The weather_api Python DataSource: executor-side HTTP ingestion.

Covers the connector mechanics the oracle-checked query
(`http_api_source_scan`) can't see from its aggregate: the fetch plan's
partition enumeration, bounded retry on transient 5xx, skip-vs-fail on
window rejection (the reference skips a 400'd window and continues,
nws_api_fetcher_v2.py:108-113), and the streaming reader's
one-day-per-micro-batch offset walk.
"""

from __future__ import annotations

import json
import threading
from datetime import date
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from end_to_end_database_pipeline_project_spark.sources.api_source import (
    WeatherApiDataSource,
    _ApiBatchReader,
    register,
)


class _Api(BaseHTTPRequestHandler):
    # class-level knobs reset per test via _serve()
    hits: list[str] = []
    flaky_remaining: dict[str, int] = {}
    reject: set[str] = set()

    def do_GET(self):  # noqa: N802 (stdlib handler name)
        _, station, start, end = self.path.rstrip("/").rsplit("/", 3)
        type(self).hits.append(f"{station}/{start}/{end}")
        if station in type(self).reject:
            self.send_error(400, "window rejected")
            return
        left = type(self).flaky_remaining.get(station, 0)
        if left > 0:
            type(self).flaky_remaining[station] = left - 1
            self.send_error(503, "transient")
            return
        days = (date.fromisoformat(end) - date.fromisoformat(start)).days + 1
        body = "\n".join(
            json.dumps(
                {
                    "station": station,
                    "obs_ts": f"{start}T00:00:0{i}",
                    "value": float(i),
                }
            )
            for i in range(days)
        ).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


def _serve(**knobs):
    _Api.hits = []
    _Api.flaky_remaining = dict(knobs.get("flaky", {}))
    _Api.reject = set(knobs.get("reject", ()))
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Api)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{server.server_address[1]}/obs", server


def _opts(base_url, **over):
    o = {
        "base_url": base_url,
        "stations": "A,B",
        "start": "2024-01-01",
        "end": "2024-01-10",
        "chunk_days": "7",
        "max_retries": "3",
    }
    o.update({k: str(v) for k, v in over.items()})
    return o


def test_fetch_plan_partitions():
    # 2 stations x ceil(10/7)=2 windows -> 4 independently fetchable tasks
    reader = _ApiBatchReader(_opts("http://x/obs"))
    parts = [p.value for p in reader.partitions()]
    assert parts == [
        ("A", "2024-01-01", "2024-01-07"),
        ("A", "2024-01-08", "2024-01-10"),
        ("B", "2024-01-01", "2024-01-07"),
        ("B", "2024-01-08", "2024-01-10"),
    ]


def test_batch_read_and_retry(spark):
    url, server = _serve(flaky={"B": 2})  # B 503s twice, then recovers
    try:
        register(spark)
        df = (
            spark.read.format("weather_api")
            .options(**_opts(url))
            .load()
        )
        rows = df.collect()
        # 7-day window yields 7 rows, 3-day window 3 -> 10/station
        assert len(rows) == 20
        assert {r.station for r in rows} == {"A", "B"}
        assert all(r.obs_ts is not None and r.value >= 0.0 for r in rows)
        # the flaky station was retried, not dropped
        assert sum(h.startswith("B/") for h in _Api.hits) >= 4
    finally:
        server.shutdown()


def test_rejected_window_skips_when_asked(spark):
    url, server = _serve(reject={"A"})
    try:
        register(spark)
        base = spark.read.format("weather_api")
        ok = base.options(**_opts(url, skip_failed="true")).load()
        got = ok.groupBy("station").count().collect()
        # A's windows were 400'd and skipped; B landed whole
        assert {(r.station, r["count"]) for r in got} == {("B", 10)}
    finally:
        server.shutdown()


def test_streaming_day_per_microbatch(spark, tmp_path):
    url, server = _serve()
    try:
        register(spark)
        stream = (
            spark.readStream.format("weather_api")
            .options(**_opts(url, end="2024-01-03"))
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("api_stream")
            .option(
                "checkpointLocation", str(tmp_path / "ckpt")
            )
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            import time

            deadline = time.time() + 60
            # 3 days x 2 stations x 1 row/day-window
            while time.time() < deadline:
                if spark.sql("SELECT count(*) FROM api_stream").first()[0] >= 6:
                    break
                time.sleep(0.5)
            got = spark.sql(
                "SELECT station, count(*) n FROM api_stream GROUP BY 1"
            ).collect()
            assert {(r.station, r.n) for r in got} == {("A", 3), ("B", 3)}
            # the cursor walked single-day windows, never re-reading a day
            day_hits = [h for h in _Api.hits if h.split("/")[1] == h.split("/")[2]]
            assert len(day_hits) == len(set(day_hits))
        finally:
            q.stop()
    finally:
        server.shutdown()


def test_source_name_contract():
    assert WeatherApiDataSource.name() == "weather_api"
