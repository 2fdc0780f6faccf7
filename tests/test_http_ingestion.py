"""S1-S6 live-socket ingestion: the rate-limited backfill loop against
a real HTTP endpoint.

The reference's fetcher walks per-day windows against a JSON API with a
sleep between requests and skips failed windows (HTTP 400). The engine
models ingestion as a landing-zone read, so this test stands up an
actual ``http.server`` and drives ``backfill_bronze_days`` with a
``fetch_day`` that does a real GET -> landing file -> ``spark.read.json``
-> bronze day-partition, proving the loop against a live socket:
every healthy day lands, the poisoned day is skipped without aborting,
and the rate limiter sleeps between consecutive requests.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.request import urlopen

from pyspark.sql import functions as F

from end_to_end_database_pipeline_project_spark.pipeline.medallion import (
    backfill_bronze_days,
)

SF = "/root/testdata/sf0.001"


class _ObsApi(BaseHTTPRequestHandler):
    requests_seen: list[str] = []
    poison_day: str = ""

    def do_GET(self):  # noqa: N802 (stdlib handler name)
        day = self.path.rsplit("/", 1)[-1]
        type(self).requests_seen.append(day)
        if day == type(self).poison_day:
            self.send_error(400, "window rejected")
            return
        body = "\n".join(
            json.dumps(
                {"obs_day": day, "station": f"ST{i}", "value": float(i) + 0.5}
            )
            for i in range(3)
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # keep pytest output clean
        pass


def test_backfill_over_live_http(spark, tmp_path):
    server = ThreadingHTTPServer(("127.0.0.1", 0), _ObsApi)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    landing = tmp_path / "landing"
    landing.mkdir()
    sleeps: list[float] = []

    def fetch_day(spark_, sf_dir, day):
        # real socket round-trip -> landing-zone file -> JSON source read
        with urlopen(f"http://127.0.0.1:{port}/obs/{day.isoformat()}") as resp:
            payload = resp.read()
        f = landing / f"{day.isoformat()}.json"
        f.write_bytes(payload)
        return spark_.read.json(str(f))

    try:
        # poison the second-newest day: the loop must skip it and go on
        import duckdb

        days = [
            str(r[0])
            for r in duckdb.sql(
                f"SELECT DISTINCT CAST(ts AS DATE) d FROM '{SF}/events.parquet' "
                "ORDER BY d DESC LIMIT 3"
            ).fetchall()
        ]
        _ObsApi.poison_day = days[1]
        landed = backfill_bronze_days(
            spark,
            SF,
            str(tmp_path / "bronze"),
            max_days=3,
            rate_limit_s=0.25,
            fetch_day=fetch_day,
            sleep=sleeps.append,
        )
    finally:
        server.shutdown()

    assert landed == [days[0], days[2]], "poisoned window must be skipped"
    assert _ObsApi.requests_seen == days, "one GET per day window, newest first"
    assert sleeps == [0.25, 0.25], "rate limiter must sleep between requests"
    # the landed partitions are readable bronze with the fetched payload
    got = spark.read.parquet(str(tmp_path / "bronze" / f"day={days[0]}"))
    assert got.count() == 3
    assert got.where(F.col("obs_day") == days[0]).count() == 3
