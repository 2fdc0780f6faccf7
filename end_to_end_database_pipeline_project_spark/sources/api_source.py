"""Live HTTP API ingestion as a Spark Python DataSource (Spark 4).

The reference ingests by driving a single-threaded HTTP client from the
orchestrator process: per-station, 7-day-chunked GETs with a courtesy
sleep and retry/skip on failure (nws_api_fetcher_v2.py:21-119), landing
JSON into Mongo.  That shape caps ingest throughput at one Python
process.  The Spark-native answer is the DataSource API
(``pyspark.sql.datasource``): the fetch plan becomes *input
partitions* — one per (station, day-window) chunk — and the HTTP GETs
execute inside executor tasks, so a 1000-executor cluster fetches 1000
windows concurrently while keeping the reference's per-connection
politeness (rate limit, bounded retry with backoff, optional
skip-on-failure) inside each task.

Two readers over the same endpoint contract:

- ``WeatherApiDataSource`` (batch): ``spark.read.format("weather_api")``
  with ``stations``/``start``/``end``/``chunk_days`` options — the
  backfill path.
- the simple stream reader (``readStream``): one day-window per
  micro-batch with a replayable offset (the day cursor), giving the
  reference's "poll the API on an interval" scheduler exactly-once
  semantics through checkpointed offsets.

Endpoint contract (mirrored by ``serve_events_api`` below and the mock
server in ``tests/test_api_datasource.py``):
``GET {base_url}/{station}/{start_date}/{end_date}`` returning ND-JSON
lines ``{"station": .., "obs_ts": iso8601, "value": float}``.
"""

from __future__ import annotations

import json
import time
from datetime import date, datetime, timedelta
from typing import Iterator, Tuple
from urllib.error import HTTPError, URLError
from urllib.request import urlopen

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SCHEMA = "station string, obs_ts timestamp, value double"


def _fetch_window(
    base_url: str,
    station: str,
    start: str,
    end: str,
    rate_limit_s: float,
    max_retries: int,
    skip_failed: bool,
) -> Iterator[Tuple]:
    """One window GET with bounded retry/backoff — runs INSIDE an
    executor task. Mirrors the reference fetcher's politeness
    (nws_api_fetcher_v2.py:79-119): sleep between requests, retry
    transient failures, optionally skip a rejected window instead of
    failing the ingest."""
    url = f"{base_url}/{station}/{start}/{end}"
    attempt = 0
    while True:
        if rate_limit_s > 0:
            time.sleep(rate_limit_s)
        try:
            with urlopen(url, timeout=30) as resp:
                payload = resp.read()
            break
        except (HTTPError, URLError) as exc:
            # 4xx = the API rejected this window (reference: log + skip);
            # 5xx / socket errors = transient, retry with backoff
            rejected = isinstance(exc, HTTPError) and 400 <= exc.code < 500
            attempt += 1
            if rejected or attempt > max_retries:
                if skip_failed:
                    return
                raise
            time.sleep(min(0.05 * (2**attempt), 1.0))
    for line in payload.splitlines():
        if not line.strip():
            continue
        rec = json.loads(line)
        yield (
            rec["station"],
            datetime.fromisoformat(rec["obs_ts"]),
            float(rec["value"]),
        )


class _Options:
    def __init__(self, options: dict):
        self.base_url = options["base_url"].rstrip("/")
        self.stations = [s for s in options["stations"].split(",") if s]
        self.start = date.fromisoformat(options["start"])
        self.end = date.fromisoformat(options["end"])
        self.chunk_days = int(options.get("chunk_days", "7"))
        self.rate_limit_s = float(options.get("rate_limit_s", "0.0"))
        self.max_retries = int(options.get("max_retries", "3"))
        self.skip_failed = options.get("skip_failed", "false") == "true"

    def windows(self):
        d = self.start
        while d <= self.end:
            e = min(d + timedelta(days=self.chunk_days - 1), self.end)
            yield d.isoformat(), e.isoformat()
            d = e + timedelta(days=1)


class _ApiBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.opts = _Options(options)

    def partitions(self):
        # the fetch plan: (station x day-window) chunks — this is what
        # the cluster parallelizes over. The reference's sequential
        # station/chunk loops (nws_api_fetcher_v2.py:93-107) become the
        # partition enumeration; the loop body becomes the task.
        return [
            InputPartition((st, s, e))
            for st in self.opts.stations
            for (s, e) in self.opts.windows()
        ]

    def read(self, partition) -> Iterator[Tuple]:
        st, s, e = partition.value
        yield from _fetch_window(
            self.opts.base_url,
            st,
            s,
            e,
            self.opts.rate_limit_s,
            self.opts.max_retries,
            self.opts.skip_failed,
        )


class _ApiStreamReader(SimpleDataSourceStreamReader):
    """One day per micro-batch, cursor = the next unread day.

    The offset dict is checkpointed by Structured Streaming, so a
    restart resumes from the committed day — the exactly-once version
    of the reference's cron-style re-poll.  ``readBetweenOffsets``
    replays a committed range deterministically for recovery."""

    def __init__(self, options: dict):
        self.opts = _Options(options)

    def initialOffset(self) -> dict:
        return {"day": self.opts.start.isoformat()}

    def _read_day(self, day: str) -> Iterator[Tuple]:
        for st in self.opts.stations:
            yield from _fetch_window(
                self.opts.base_url,
                st,
                day,
                day,
                self.opts.rate_limit_s,
                self.opts.max_retries,
                self.opts.skip_failed,
            )

    def read(self, start: dict):
        day = date.fromisoformat(start["day"])
        if day > self.opts.end:  # caught up: empty batch, cursor holds
            return iter(()), start
        # materialized (not a generator): the prefetch cache copies the
        # iterator for offset replay, which a generator can't survive
        return iter(list(self._read_day(day.isoformat()))), {
            "day": (day + timedelta(days=1)).isoformat()
        }

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        d = date.fromisoformat(start["day"])
        stop = date.fromisoformat(end["day"])
        while d < stop:
            yield from self._read_day(d.isoformat())
            d += timedelta(days=1)


class WeatherApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_api"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _ApiBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _ApiStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WeatherApiDataSource)


# ------------------------------------------------------------------ server
#
# A deterministic observation API over the events fixture, for the
# registered query and tests: station B<k> serves the events of users
# with user_id % n_buckets == k, as ND-JSON. Daemon-threaded so a
# lazily-evaluated DataFrame can still fetch when the driver collects.


def serve_events_api(parquet_path: str, n_buckets: int = 10):
    """Start a localhost ND-JSON observation API over ``events``.

    Returns ``(base_url, server)``; the server runs on a daemon thread
    until process exit (callers may ``server.shutdown()`` earlier)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=["user_id", "ts", "value"])
    users = tbl.column("user_id").to_pylist()
    tss = tbl.column("ts").to_pylist()
    vals = tbl.column("value").to_pylist()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib handler name)
            try:
                _, station, start, end = self.path.rstrip("/").rsplit("/", 3)
                bucket = int(station.lstrip("B"))
                lo = date.fromisoformat(start)
                hi = date.fromisoformat(end)
            except ValueError:
                self.send_error(400, "bad window")
                return
            lines = [
                json.dumps(
                    {
                        "station": station,
                        "obs_ts": ts.isoformat(),
                        "value": v,
                    }
                )
                for u, ts, v in zip(users, tss, vals)
                if u % n_buckets == bucket and lo <= ts.date() <= hi
            ]
            body = ("\n".join(lines)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # keep driver/pytest output clean
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{server.server_address[1]}/obs", server
