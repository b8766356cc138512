"""HTTP transport for the ingest edge: gzipped-XML config fetch (S1) and
the retry-on-empty pull wrapper (S5).

Reference semantics:
- S1 `GetHistoricalData` downloads a URL to a temp file and reads it
  through a gzip stream (/root/reference/R/_pull_data.R:5-8). Here the
  fetch returns the decoded XML text directly; parsing stays in
  sources/config_xml.flatten_config_xml.
- S5 re-requests a sensor-day while the API returns an all-NA frame
  (2880 NA volumes or occupancies), at most 5 tries total with a 10 ms
  pause (/root/reference/R/_pull_data.R:420-433). The generic wrapper
  below keeps exactly that loop shape: it returns the last (still-empty)
  result after the tries run out — the reference does the same and lets
  the downstream pct-null filter drop the day.

Scale shape: the reference forks 5 OS processes, each fetching one
sensor-day at a time. Here fetching is an EXECUTOR-side operation:
``distributed_pull`` maps a (sensor, date) worklist through
``mapInPandas``, so a 1000-executor cluster issues pulls with cluster
parallelism, retries are per-row inside the task, and a failed row
surfaces as an empty frame rather than a dead process. The transport is
injectable (any ``url -> bytes`` callable), which is also what the tests
use — the build sandbox has no network, so CI drives the whole path
through file:// URLs and fake transports; the live-HTTP default is one
``urllib`` call.
"""

from __future__ import annotations

import gzip
import io
import time
import urllib.request
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

GZIP_MAGIC = b"\x1f\x8b"


def default_transport(url: str, timeout: float = 30.0) -> bytes:
    """One urllib GET. Swap for requests/aiohttp freely — everything else
    only sees ``url -> bytes``."""
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.read()


def fetch_gzipped_xml(url: str,
                      transport: Callable[[str], bytes] | None = None,
                      encoding: str = "utf-8") -> str:
    """S1: fetch a (possibly gzipped) XML document and return its text.

    Gzip is detected from the payload magic, not the URL suffix — the
    reference's server serves `.xml.gz` but a mirror may not preserve the
    name.
    """
    raw = (transport or default_transport)(url)
    if raw[:2] == GZIP_MAGIC:
        raw = gzip.decompress(raw)
    return raw.decode(encoding)


def retry_on_empty(pull: Callable[[], pd.DataFrame],
                   is_empty: Callable[[pd.DataFrame], bool],
                   max_tries: int = 5,
                   sleep_s: float = 0.01) -> pd.DataFrame:
    """S5: call ``pull`` until ``is_empty`` is false or ``max_tries`` total
    attempts have been made; return the last result either way (the
    reference keeps the all-NA frame and lets the pct-null filter drop
    it)."""
    out = pull()
    tries = 1
    while is_empty(out) and tries < max_tries:
        time.sleep(sleep_s)
        out = pull()
        tries += 1
    return out


def all_na_sensor_day(pdf: pd.DataFrame) -> bool:
    """The reference's emptiness test: every volume OR every occupancy of
    the day's 2880 30-sec rows is NA (R/_pull_data.R:426-427) — the API's
    'failed but 200' shape."""
    if len(pdf) == 0:
        return True
    return bool(pdf["volume"].isna().all() or pdf["occupancy"].isna().all())


def distributed_pull(worklist: DataFrame,
                     fetch_sensor_day: Callable[[str, str], pd.DataFrame],
                     schema: str,
                     max_tries: int = 5,
                     sleep_s: float = 0.01,
                     is_empty: Callable[[pd.DataFrame], bool] | None = None,
                     ) -> DataFrame:
    """Fan a (sensor, date) worklist out to the executors; each row pulls
    its day with the S5 retry loop and yields the day's readings.

    ``worklist`` is the J7 interval cross-join output (plans/queries.py
    sensor_worklist) — repartition it before calling if the fixture scan
    collapsed it to few partitions. ``fetch_sensor_day`` must be
    serializable (top-level function or closure over plain data): it runs
    inside the task.
    """
    empty_test = is_empty or all_na_sensor_day

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for sensor, day in zip(pdf["sensor"], pdf["date"]):
                frames.append(retry_on_empty(
                    lambda s=sensor, d=day: fetch_sensor_day(str(s), str(d)),
                    empty_test, max_tries=max_tries, sleep_s=sleep_s,
                ))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return worklist.select("sensor", "date").mapInPandas(gen, schema)


def read_local_gz_xml(path: str) -> str:
    """Convenience for tests/fixtures: file:// round trip through the same
    fetch path."""
    return fetch_gzipped_xml("file://" + path)


def gzip_bytes(text: str) -> bytes:
    """Inverse helper (fixture builders, tests)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(text.encode("utf-8"))
    return buf.getvalue()
