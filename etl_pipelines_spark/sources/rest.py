"""REST API source adapter (SURVEY.md §2.1 S10, §2.9 I5).

The reference's ingestion functions poll rate-limited APIs with
exponential backoff (coingecko_market_data.py:232-267 backs off 1->32 s
on 429/5xx; geckoterminal_market_data.py:238-288 uses stepped 15/30/60 s
waits). The transport is injected (`fetch`) so the engine code has no
HTTP dependency and tests drive it exactly like the reference's
unittest.mock suite (tests/test_geckoterminal_etls.py:79-312).

Driver-side by design: API pagination is a control-plane concern. The
records land via spark.createDataFrame with an explicit schema; at real
scale a URL-per-row frame + mapInPandas fan-out does the same thing
executor-side.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

RETRYABLE_STATUSES = (429, 500, 502, 503)


class RetriesExhausted(Exception):
    def __init__(self, url: str, attempts: int, last_status: int):
        super().__init__(f"{url}: {attempts} attempts, last status {last_status}")
        self.last_status = last_status


def fetch_with_backoff(
    fetch: Callable[[str], tuple[int, object]],
    url: str,
    max_retries: int = 5,
    base_delay: float = 1.0,
    max_delay: float = 32.0,
    sleep: Callable[[float], None] = time.sleep,
) -> object:
    """Call `fetch(url)` until success, backing off exponentially
    (base_delay * 2^attempt, capped) on retryable statuses. Non-
    retryable errors raise immediately; exhausted retries raise
    RetriesExhausted."""
    last_status = -1
    for attempt in range(max_retries + 1):
        status, payload = fetch(url)
        if status == 200:
            return payload
        if status not in RETRYABLE_STATUSES:
            raise RuntimeError(f"{url}: non-retryable status {status}")
        last_status = status
        if attempt < max_retries:
            sleep(min(base_delay * (2**attempt), max_delay))
    raise RetriesExhausted(url, max_retries + 1, last_status)


def paginated_records(
    fetch: Callable[[str], tuple[int, object]],
    url_for_page: Callable[[int], str],
    max_pages: int = 1000,
    **backoff_kw,
) -> Iterable[dict]:
    """Pull pages until an empty page (the reference's markets-pages
    loop, coingecko_all_coins_market_summary.py:137-167)."""
    for page in range(1, max_pages + 1):
        batch = fetch_with_backoff(fetch, url_for_page(page), **backoff_kw)
        if not batch:
            return
        yield from batch


def land_records(
    spark: SparkSession, records: Iterable[dict], schema: StructType | str
) -> DataFrame:
    """API records -> DataFrame with an explicit landing schema
    (inference over API JSON is how silent type drift starts)."""
    return spark.createDataFrame(list(records), schema)
