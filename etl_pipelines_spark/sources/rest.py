"""REST API source adapter (SURVEY.md §2.1 S10, §2.9 I5).

The reference's ingestion functions poll rate-limited APIs with
exponential backoff (coingecko_market_data.py:232-267 backs off 1->32 s
on 429/5xx; geckoterminal_market_data.py:238-288 uses stepped 15/30/60 s
waits). The transport is injected (`fetch`) so the engine code has no
HTTP dependency and tests drive it exactly like the reference's
unittest.mock suite (tests/test_geckoterminal_etls.py:79-312).

Two tiers share one transport + backoff implementation:

- driver-side (`paginated_records` + `land_records`): pagination is a
  control-plane concern; fine while one process can walk the pages
  (the reference's common case).
- executor-side (`fetch_distributed`): when the URL list itself is
  big (per-entity endpoints — the reference's thread-pooled pull,
  coingecko_market_data.py:71-87, geckoterminal_market_data.py:148-189),
  a URL-per-row frame fans the fetches out via mapInPandas. Each URL
  is fetched once inside its task with the same exponential backoff;
  records land under the same explicit schema, with optional
  passthrough columns copied from the URL row (the per-coin tagging
  pattern). `num_slots` caps concurrent fetchers via repartition so a
  1000-executor cluster doesn't become a rate-limit DDoS.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

RETRYABLE_STATUSES = (429, 500, 502, 503)


def urllib_transport(
    timeout: float = 30.0,
    headers: dict[str, str] | None = None,
) -> Callable[[str], tuple[int, object]]:
    """Default REAL transport: stdlib urllib returning
    (status, parsed-JSON payload) in the injected-transport contract.
    HTTP error statuses come back AS statuses (never exceptions), and
    transient NETWORK-level faults (DNS failure, connection reset,
    socket timeout) come back as a retryable pseudo-503, so
    `fetch_with_backoff` can retry both classes exactly as it does
    against the test transports. The returned callable closes over
    plain values only, so it pickles onto executors for
    `fetch_distributed`; each call builds its own connection (never a
    captured socket). Injection remains the test seam — pass
    fetch=None to any entry point to get this transport."""
    hdrs = dict(headers or {})

    def fetch(url: str) -> tuple[int, object]:
        import json as _json
        import ssl as _ssl
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers=hdrs)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                status = resp.status
                body = resp.read()
        except urllib.error.HTTPError as e:
            e.close()
            return e.code, None
        except (urllib.error.URLError, TimeoutError, OSError) as e:
            # URLError wraps the real fault in .reason; unwrap so the
            # classification and the carried text name the cause
            reason = getattr(e, "reason", e) or e
            detail = {"_transport_error": f"{type(reason).__name__}: {reason}"}
            if isinstance(reason, _ssl.SSLCertVerificationError):
                # hopeless, not transient: retrying a bad certificate
                # for the full backoff schedule cannot succeed — map
                # to non-retryable 495 (nginx's SSL-cert-error code)
                # so fetch_with_backoff fails fast with the cause
                return 495, detail
            # transient network fault (no HTTP status to report):
            # surface as retryable 503 carrying the cause so
            # RetriesExhausted can name it instead of a bare "503"
            return 503, detail
        return status, _json.loads(body) if body else None

    return fetch


def _transport_detail(payload: object) -> str | None:
    """Cause text a transport attached to an error response (the
    urllib transport's `_transport_error` channel), if any."""
    if isinstance(payload, dict):
        detail = payload.get("_transport_error")
        if isinstance(detail, str):
            return detail
    return None


class RetriesExhausted(Exception):
    def __init__(
        self, url: str, attempts: int, last_status: int,
        detail: str | None = None,
    ):
        msg = f"{url}: {attempts} attempts, last status {last_status}"
        if detail:
            msg += f" ({detail})"
        super().__init__(msg)
        self.last_status = last_status
        self.detail = detail


def fetch_with_backoff(
    fetch: Callable[[str], tuple[int, object]] | None,
    url: str,
    max_retries: int = 5,
    base_delay: float = 1.0,
    max_delay: float = 32.0,
    sleep: Callable[[float], None] = time.sleep,
) -> object:
    """Call `fetch(url)` until success, backing off exponentially
    (base_delay * 2^attempt, capped) on retryable statuses. Non-
    retryable errors raise immediately; exhausted retries raise
    RetriesExhausted. fetch=None selects the default urllib
    transport."""
    if fetch is None:
        fetch = urllib_transport()
    last_status = -1
    last_detail: str | None = None
    for attempt in range(max_retries + 1):
        status, payload = fetch(url)
        if status == 200:
            return payload
        if status not in RETRYABLE_STATUSES:
            detail = _transport_detail(payload)
            raise RuntimeError(
                f"{url}: non-retryable status {status}"
                + (f" ({detail})" if detail else "")
            )
        last_status = status
        last_detail = _transport_detail(payload) or last_detail
        if attempt < max_retries:
            sleep(min(base_delay * (2**attempt), max_delay))
    raise RetriesExhausted(url, max_retries + 1, last_status, last_detail)


def paginated_records(
    fetch: Callable[[str], tuple[int, object]] | None,
    url_for_page: Callable[[int], str],
    max_pages: int = 1000,
    **backoff_kw,
) -> Iterable[dict]:
    """Pull pages until an empty page (the reference's markets-pages
    loop, coingecko_all_coins_market_summary.py:137-167). fetch=None
    selects the default urllib transport."""
    if fetch is None:
        fetch = urllib_transport()
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


def fetch_distributed(
    urls: DataFrame,
    fetch: Callable[[str], tuple[int, object]] | None,
    schema: StructType | str,
    url_col: str = "url",
    passthrough_cols: list[str] | None = None,
    num_slots: int | None = None,
    max_retries: int = 5,
    base_delay: float = 1.0,
    max_delay: float = 32.0,
) -> DataFrame:
    """Executor-side REST fan-out: one backoff-guarded fetch per row of
    the URL frame, records landed under `schema` (+ any
    `passthrough_cols` copied from the URL row onto its records).

    `fetch` is the same injected transport the driver path uses — it
    is shipped to executors via task serialization, so it must be
    picklable and must carry its own auth/session construction (build
    clients lazily inside the callable, never capture sockets). A
    payload must be a list of dict records; empty/None means no rows
    for that URL. Failures follow `fetch_with_backoff` semantics and
    fail the task loudly — a silent partial land is how ingestion
    gaps start. `num_slots` bounds TOTAL in-flight fetch concurrency
    (repartition to that many tasks) independent of cluster size;
    leave None to inherit the frame's partitioning. fetch=None selects
    the default urllib transport (built on the driver, pickled out).
    """
    import pandas as pd
    from pyspark.sql.types import _parse_datatype_string

    if fetch is None:
        fetch = urllib_transport()

    if isinstance(schema, str):
        schema = _parse_datatype_string(schema)
    record_fields = [f.name for f in schema.fields]
    passthrough = list(passthrough_cols or [])
    out_schema = StructType(
        [urls.schema[c] for c in passthrough] + schema.fields
    )
    if num_slots is not None:
        urls = urls.repartition(num_slots)
    backoff_kw = dict(
        max_retries=max_retries, base_delay=base_delay, max_delay=max_delay
    )

    def pull(batches):
        for pdf in batches:
            for d in pdf.to_dict("records"):
                payload = fetch_with_backoff(fetch, d[url_col], **backoff_kw)
                if not payload:
                    continue
                out = pd.DataFrame(
                    [
                        {k: rec.get(k) for k in record_fields}
                        for rec in payload
                    ]
                )
                for c in passthrough:
                    out[c] = d[c]
                yield out[passthrough + record_fields]

    return urls.select(*(passthrough + [url_col])).mapInPandas(pull, out_schema)
